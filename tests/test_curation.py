"""Curation-operator semantics the SQL oracle can't express:
stability properties, invariants under corpus growth, masking
round-trips.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import curation
from knn_using_hadoop_spark.sources.tables import load_table


def test_split_stable_under_corpus_growth(spark, sf_dir):
    """A doc's split must not change when other docs are added —
    the property that prevents eval contamination on re-snapshot."""
    docs = load_table(spark, "documents", sf_dir)
    full = {
        r["doc_id"]: r["split"]
        for r in curation.split_assign(docs).select("doc_id", "split").collect()
    }
    half = {
        r["doc_id"]: r["split"]
        for r in curation.split_assign(docs.filter(F.col("doc_id") % 2 == 0))
        .select("doc_id", "split")
        .collect()
    }
    assert half  # non-empty subset
    for doc_id, split in half.items():
        assert full[doc_id] == split


def test_split_covers_and_partitions(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = curation.split_assign(docs)
    assert out.count() == docs.count()
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # 80/10/10 buckets: train must dominate
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_reservoir_exact_k_and_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    s1 = curation.reservoir_per_group(docs, "source", "doc_id", k=3)
    s2 = curation.reservoir_per_group(docs, "source", "doc_id", k=3)
    rows1 = sorted((r["source"], r["doc_id"]) for r in s1.collect())
    rows2 = sorted((r["source"], r["doc_id"]) for r in s2.collect())
    assert rows1 == rows2  # hash-ranked, no RNG
    per_group = s1.groupBy("source").count().collect()
    group_sizes = dict(
        docs.groupBy("source").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    for r in per_group:
        assert r["count"] == min(3, group_sizes[r["source"]])


def test_pii_masking_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.user@site.org or call 5551234 x12"),
            (2, "no pii here"),
            (3, "a@b.io and c.d@e.f.com plus 999"),
        ],
        ["id", "t"],
    )
    out = {r["id"]: r for r in curation.pii_redact(df, "t").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_numbers"] == 1
    assert "<EMAIL>" in out[1]["masked"] and "<NUM>" in out[1]["masked"]
    assert "jo.user" not in out[1]["masked"]
    assert "5551234" not in out[1]["masked"]
    assert out[2]["n_emails"] == 0 and out[2]["n_numbers"] == 0
    assert out[2]["masked"] == "no pii here"
    assert out[3]["n_emails"] == 2 and out[3]["n_numbers"] == 1


def test_quantize_errors_bounded_by_grid_step(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    stats = curation.quantize_embeddings_int8(emb)
    rows = stats.collect()
    assert len(rows) == 64
    for r in rows:
        span = r["vmax"] - r["vmin"]
        # midpoint reconstruction: |err| <= span / (2*255) + rounding slack
        assert r["max_abs_err"] <= span / 510.0 + 1e-6
        assert 0.0 <= r["avg_abs_err"] <= r["max_abs_err"] + 1e-9


def test_repetition_flags_degenerate_doc(spark):
    rows = [(1, "spam " * 50 + "spam"), (2, " ".join(f"w{i}" for i in range(60)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curation.repetition_metrics(df).collect()}
    assert out[1]["keep"] == 0 and out[1]["top_token_frac"] == 1.0
    assert out[2]["keep"] == 1 and out[2]["dup_bigram_frac"] == 0.0


def test_decontaminate_catches_planted_copy(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (10, base),               # benchmark (doc_id % 10 == 0)
        (11, base + " extra1"),   # near-copy of benchmark -> contaminated
        (12, " ".join(f"other{i}" for i in range(40))),  # clean
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curation.decontaminate(df).collect()}
    assert set(out) == {11, 12}  # benchmark docs excluded from report
    assert out[11]["contaminated"] == 1 and out[11]["overlap_frac"] > 0.9
    assert out[12]["contaminated"] == 0 and out[12]["n_overlap"] == 0


def test_pq_recall_beats_unrefined_and_floor(spark, sf_dir):
    """Lloyd refinement must earn its cost: refined recall@10 >= the
    seed-codebook recall, and above an absolute floor."""
    from knn_using_hadoop_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    ex = S.l2_topk(emb, queries, 10)
    ex.cache().count()

    def recall(pq):
        ov = (
            pq.join(ex, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        qs = queries.select(F.col("vec_id").alias("query_id"))
        return (
            qs.join(ov, "query_id", "left")
            .agg(F.avg(F.coalesce(F.col("c"), F.lit(0)) / 10.0))
            .collect()[0][0]
        )

    r0 = recall(S.pq_topk(emb, queries, 10, dim=64, iters=0))
    r1 = recall(S.pq_topk(emb, queries, 10, dim=64, iters=1))
    assert r1 >= r0
    assert r1 >= 0.5


def test_pq_recall_registry_knobs_floor(spark):
    """The registry knobs (m=64 scalar subquantizers, ks=64, one
    Lloyd iteration — VERDICT r4 ask #5) must hold recall@10 >= 0.65
    on the sf0.01 gate corpus (measured 0.88, NOTES r5; floor leaves
    headroom for driver testdata regeneration)."""
    from knn_using_hadoop_spark.contract.bpe_sql_incr import (
        _PQ_KS_Q,
        _PQ_M_Q,
    )
    from knn_using_hadoop_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    ex = S.l2_topk(emb, queries, 10)
    ex.cache().count()
    pq = S.pq_topk(
        emb, queries, 10, m=_PQ_M_Q, ks=_PQ_KS_Q, dim=64, iters=1
    )
    nq = queries.count()
    hits = pq.join(ex, ["query_id", "vec_id"]).count()
    assert hits / (10.0 * nq) >= 0.65


def test_pq_encode_is_total_and_bounded(spark, sf_dir):
    """Every vector gets exactly m codes, all in [0, ks)."""
    from knn_using_hadoop_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", sf_dir)
    cb = S.pq_codebook(emb, dim=64)
    codes = S.pq_encode(emb, cb, dim=64)
    n_vecs = emb.count()
    per_vec = codes.groupBy("vec_id").count()
    assert per_vec.filter(F.col("count") != S.PQ_M).count() == 0
    assert per_vec.count() == n_vecs
    bad = codes.filter(
        (F.col("code") < 0) | (F.col("code") >= S.PQ_KS)
    ).count()
    assert bad == 0


def test_token_budget_allocations_sum_exactly(spark):
    from knn_using_hadoop_spark.contract import REGISTRY

    rows = REGISTRY["corpus_token_budget_plan"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert sum(r["final_alloc"] for r in rows) == 1000000
    # largest-remainder never moves an allocation by more than 1
    for r in rows:
        assert r["final_alloc"] - r["base_alloc"] in (0, 1)


# ---------------------------------------------------------------------------
# SemDeDup (semantic dedup over embeddings)
# ---------------------------------------------------------------------------


def test_semdedup_planted_duplicates(spark):
    """Exact duplicate vectors collapse to one kept representative,
    distinct vectors all survive, and the keep order prefers the
    point FARTHEST from its centroid (the paper's diversity policy).
    """
    from knn_using_hadoop_spark.operators.similarity import (
        semdedup_prune,
    )

    # Two well-separated directions; ids 1/2/3 are copies of one
    # direction (scaled — cosine ignores magnitude), 10/11 are copies
    # of another, 20 is alone.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),
        (3, [3.0, 0.0, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 5.0, 0.0, 0.0]),
        (20, [0.0, 0.0, 1.0, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semdedup_prune(
        corpus, n_centroids=2, iters=1, threshold=0.95
    ).collect()
    keep = {r.vec_id: r.keep for r in out}
    assert len(keep) == 6
    # each duplicate family keeps exactly one member
    assert sum(keep[i] for i in (1, 2, 3)) == 1
    assert sum(keep[i] for i in (10, 11)) == 1
    assert keep[20] is True


def test_semdedup_orthogonal_all_kept(spark):
    from knn_using_hadoop_spark.operators.similarity import (
        semdedup_prune,
    )

    rows = [
        (i, [1.0 if j == i else 0.0 for j in range(4)])
        for i in range(4)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = semdedup_prune(
        corpus, n_centroids=2, iters=1, threshold=0.9
    ).collect()
    assert all(r.keep for r in out)


def _decon_rows(df):
    return sorted(
        (
            r["doc_id"],
            r["n_grams"],
            r["n_overlap"],
            r["overlap_frac"],
            r["contaminated"],
        )
        for r in df.collect()
    )


def test_decontaminate_collapse_equals_direct(spark):
    """The content-collapsed plan is an exact rewrite of the direct
    per-doc plan — pinned on a hostile corpus: duplicate piles that
    straddle the bench/train boundary (same text as both a benchmark
    doc and training docs), piles entirely in train, partial-overlap
    near-copies, clean docs, and zero-gram (short) docs."""
    bench_text = " ".join(f"tok{i}" for i in range(40))
    clean = " ".join(f"other{i}" for i in range(40))
    near = bench_text + " extra1 extra2"
    rows = [
        (10, bench_text),  # benchmark
        (11, bench_text),  # train copy of a benchmark text
        (21, bench_text),  # second member of that pile
        (12, near),        # near-copy -> contaminated
        (13, near),        # pile of near-copies
        (14, clean),       # clean
        (15, clean),       # clean pile
        (16, "too short"), # < n tokens -> zero grams -> no output row
        (20, "tiny"),      # zero-gram BENCHMARK doc
        (17, " ".join(f"third{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    direct = _decon_rows(curation.decontaminate(df, collapse=False))
    collapsed = _decon_rows(curation.decontaminate(df, collapse=True))
    auto = _decon_rows(curation.decontaminate(df, collapse="auto"))
    assert collapsed == direct
    assert auto == direct
    ids = [t[0] for t in collapsed]
    assert 16 not in ids and 20 not in ids and 10 not in ids
    by_id = {t[0]: t for t in collapsed}
    # exact train copies of benchmark text: overlap_frac == 1.0
    assert by_id[11][3] == 1.0 and by_id[21][3] == 1.0
    assert by_id[14][4] == 0 and by_id[15][4] == 0


def test_decontaminate_collapse_equals_direct_on_testdata(spark, sf_dir):
    from knn_using_hadoop_spark.contract.knn_core import load_docs_wide

    docs = load_docs_wide(spark, sf_dir)
    direct = _decon_rows(curation.decontaminate(docs, collapse=False))
    collapsed = _decon_rows(curation.decontaminate(docs, collapse=True))
    assert collapsed == direct and len(collapsed) > 0


def test_decontaminate_auto_probe_both_regimes(spark, sf_dir):
    """collapse="auto" (r5 verdict #1): the HLL probe picks a plan
    by duplication ratio — output must equal BOTH explicit modes in
    both regimes (mostly-distinct corpus -> direct; 10x piles ->
    collapsed), with and without a precomputed content_keys
    relation."""
    from pyspark.sql import Window as W

    from knn_using_hadoop_spark.contract.knn_core import load_docs_wide
    from knn_using_hadoop_spark.functions.hashing import portable_hash64

    docs = load_docs_wide(spark, sf_dir).select("doc_id", "text").limit(60)
    # 10x pile-up: replicate every doc under fresh non-bench-aligned
    # ids (id*10+offset keeps bench membership of originals intact)
    piled = docs
    for i in range(1, 10):
        piled = piled.union(
            docs.select(
                (F.col("doc_id") * 1000 + i).alias("doc_id"), "text"
            )
        )
    for corpus in (docs, piled):
        ck = (
            corpus.select(
                "doc_id",
                portable_hash64(F.col("text")).alias("k1"),
                portable_hash64(F.col("text"), pos=17).alias("k2"),
            )
            .withColumn(
                "crep",
                F.min("doc_id").over(W.partitionBy("k1", "k2")),
            )
            .select("doc_id", "crep")
            .localCheckpoint(eager=True)
        )
        direct = _decon_rows(
            curation.decontaminate(corpus, collapse=False)
        )
        assert (
            _decon_rows(curation.decontaminate(corpus, collapse="auto"))
            == direct
        )
        assert (
            _decon_rows(
                curation.decontaminate(
                    corpus, collapse="auto", content_keys=ck
                )
            )
            == direct
        )
