"""Unit tests for training-data pipeline ops, sketches, bloom join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators.joins import bloom_pruned_join
from knn_using_hadoop_spark.operators.pipeline import (
    chunk_windows,
    dedup_incremental,
    pack_greedy,
)
from knn_using_hadoop_spark.operators.sketches import kmv_distinct

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_chunk_windows_exact(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g", "en", "s"),  # 7 tokens
            (2, "x", "en", "s"),  # 1 token -> one short chunk
        ],
    )
    out = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
        for r in chunk_windows(docs, size=4, overlap=2).collect()
    }
    # step=2: starts 0,2,4,6 for 7 tokens
    assert out == {
        (1, 0): ("a b c d", 4),
        (1, 1): ("c d e f", 4),
        (1, 2): ("e f g", 3),
        (1, 3): ("g", 1),
        (2, 0): ("x", 1),
    }


def test_chunk_windows_validates_overlap(spark):
    docs = _docs(spark, [(1, "a b", "en", "s")])
    with pytest.raises(ValueError, match="overlap"):
        chunk_windows(docs, size=4, overlap=4)


def test_pack_greedy_offsets_and_straddle(spark):
    docs = _docs(
        spark,
        [
            (1, " ".join(["t"] * 6), "en", "s1"),  # 6 tokens
            (2, " ".join(["t"] * 6), "en", "s1"),  # starts at 6, straddles
            (3, " ".join(["t"] * 2), "en", "s1"),  # starts at 12 -> pack 1
            (4, " ".join(["t"] * 3), "en", "s2"),  # separate stream
        ],
    )
    out = {
        r.doc_id: (r.start_offset, r.pack_id)
        for r in pack_greedy(docs, capacity=10).collect()
    }
    assert out == {1: (0, 0), 2: (6, 0), 3: (12, 1), 4: (0, 0)}


def test_dedup_incremental_drops_known_texts(spark):
    corpus = _docs(spark, [(1, "seen text", "en", "s")])
    incoming = _docs(
        spark,
        [(10, "seen text", "en", "s"), (11, "fresh text", "en", "s")],
    )
    kept = dedup_incremental(corpus, incoming).collect()
    assert [r.doc_id for r in kept] == [11]


def test_kmv_exact_below_k_and_close_above(spark):
    rows = [("small", i) for i in range(10)]
    rows += [("big", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r.g: (r.est_distinct, r.n_kept) for r in
           kmv_distinct(df, "g", "v", k=64).collect()}
    assert out["small"] == (10.0, 10)  # < k distinct -> exact
    est, kept = out["big"]
    assert kept == 64
    assert abs(est - 1000) / 1000 < 0.25  # KMV rel-err ~1/sqrt(k)


def test_bloom_pruned_join_equals_plain_join(spark):
    probe = spark.createDataFrame(
        [(i, i * 10) for i in range(200)], "k bigint, v bigint"
    )
    build = spark.createDataFrame(
        [(i, f"x{i}") for i in range(0, 200, 20)], "k bigint, name string"
    )
    got = sorted(
        tuple(r) for r in bloom_pruned_join(probe, build, "k").collect()
    )
    want = sorted(tuple(r) for r in probe.join(build, "k").collect())
    assert got == want and len(got) == 10


def test_bloom_pruned_join_rejects_unsound_how(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="sound"):
        bloom_pruned_join(df, df, "k", how="left")


def test_star_components_match_union_find(spark):
    import random

    from knn_using_hadoop_spark.operators.dedup import (
        neardup_components,
        neardup_components_star,
    )

    rng = random.Random(7)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    # long chain: forces multi-round convergence (diameter 30)
    chain_lo = 1000
    edges += [(chain_lo + i, chain_lo + i + 1) for i in range(30)]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    star = {
        r.doc_id: r.component
        for r in neardup_components_star(pairs).collect()
    }
    prop = {
        r.doc_id: r.component
        for r in neardup_components(pairs).collect()
    }
    assert star == want
    assert prop == want


def test_udtf_chunker_matches_native_chunking(spark):
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.udtf_ops import register_udtfs
    from knn_using_hadoop_spark.sources.tables import load_table

    register_udtfs(spark)
    docs = load_table(spark, "documents", SF).filter(
        F.col("doc_id") % 50 == 0
    )
    docs.createOrReplaceTempView("t_udtf_docs")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk, r.n_tokens)
        for r in spark.sql(
            """SELECT d.doc_id, c.chunk, c.chunk_idx, c.n_tokens
               FROM t_udtf_docs d, LATERAL chunk_doc(d.text, 7) c"""
        ).collect()
    }
    # trusted replica: pure Python on the collected docs
    expect = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        for i in range(0, len(toks), 7):
            w = toks[i : i + 7]
            expect[(r.doc_id, i // 7)] = (" ".join(w), len(w))
    assert got == expect
    assert len(got) > 0


def test_observation_metrics_free_of_second_scan(spark):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF)
    obs = Observation("li_metrics")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # metrics ride the SAME job that produced `out` — no second scan
    m = obs.get
    assert m["n_rows"] == sum(r["n"] for r in out)
    expect_qty = li.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(m["total_qty"] - expect_qty) < 1e-6
