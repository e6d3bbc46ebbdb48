"""BM25 + RRF retrieval operators (`operators/retrieval.py`).

Pins: exact replication of a pure-Python Okapi/Lucene BM25 reference
(same formula, 6dp rounding, id tie-breaks); relevance orderings a
search engine must get right; the max_df stop-term cap prunes the
match without touching idf; RRF fusion against hand-computed
reciprocal sums; and a hybrid BM25+cosine smoke over the sf0.001
documents/embeddings tables.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators.retrieval import (
    bm25_topk,
    rrf_fuse,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog runs fast"),
    (2, "the cat sleeps on the warm mat"),
    (3, "zebra stripes are black and white"),
    (4, "the zebra runs with the quick fox"),
    (5, "white noise and warm tea on a lazy afternoon"),
]


def _bm25_ref(docs, queries, k, k1=1.2, b=0.75, max_df=None,
              min_match=1):
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, qt in queries:
        scores = {}
        for d, t in toks.items():
            s = 0.0
            matched = 0
            for term in set(qt.split(" ")):
                if term not in df:
                    continue
                if max_df is not None and df[term] > max_df:
                    continue
                tf = float(t.count(term))
                if tf == 0.0:
                    continue
                matched += 1
                idf = math.log(
                    1.0 + (n - df[term] + 0.5) / (df[term] + 0.5)
                )
                s += (
                    idf
                    * tf
                    * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * len(t) / avgdl))
                )
            if matched >= max(min_match, 1):
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out += [
            (qid, i + 1, d, s)
            for i, (d, s) in enumerate(ranked[:k])
        ]
    return sorted(out)


def _spark_docs(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_bm25_matches_python_reference(spark):
    queries = [(100, "quick fox"), (101, "zebra"), (102, "warm lazy")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = sorted(
        map(
            tuple,
            bm25_topk(_spark_docs(spark), qdf, 4).collect(),
        )
    )
    assert got == _bm25_ref(DOCS, queries, 4)
    # zero-match queries yield zero rows, never null scores
    q0 = spark.createDataFrame(
        [(9, "xylophone")], "query_id long, text string"
    )
    assert bm25_topk(_spark_docs(spark), q0, 3).count() == 0


def test_bm25_relevance_orderings(spark):
    qdf = spark.createDataFrame(
        [(1, "zebra")], "query_id long, text string"
    )
    got = bm25_topk(_spark_docs(spark), qdf, 6).collect()
    ids = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    # only the two zebra docs match; the shorter doc (3) scores the
    # same single occurrence higher than the longer doc (4)
    assert set(ids) == {3, 4} and ids[0] == 3


def test_max_df_caps_the_match_join_only(spark):
    queries = [(1, "the zebra")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = sorted(
        map(
            tuple,
            bm25_topk(_spark_docs(spark), qdf, 6, max_df=2).collect(),
        )
    )
    # "the" (df=3) is dropped from the match; the python reference
    # with the same cap agrees exactly (idf of surviving terms uses
    # TRUE df, so zebra contributions are identical)
    assert got == _bm25_ref(DOCS, queries, 6, max_df=2)
    assert {r[2] for r in got} == {3, 4}  # the-only docs are gone


def test_bm25_min_match(spark, tmp_path):
    """Lucene minimum_should_match: docs matching fewer than m
    distinct query terms drop out; stop-terms dropped by max_df
    cannot count toward the minimum. Pinned against the python
    reference on both the inline and the indexed path."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    queries = [(1, "quick brown dog"), (2, "the zebra")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = sorted(
        map(
            tuple,
            bm25_topk(
                _spark_docs(spark), qdf, 6, min_match=2
            ).collect(),
        )
    )
    want = _bm25_ref(DOCS, queries, 6, min_match=2)
    assert got == want and got
    # docs 0 and 1 match all of quick+brown+dog; no single-term doc
    q1 = {r[2] for r in got if r[0] == 1}
    assert q1 == {0, 1}
    # max_df interplay: "the" (df=3) is capped out of the match, so
    # the zebra docs have only 1 countable term -> min_match=2 empty
    got2 = sorted(
        map(
            tuple,
            bm25_topk(
                _spark_docs(spark), qdf, 6, min_match=2, max_df=2
            ).collect(),
        )
    )
    assert got2 == _bm25_ref(DOCS, queries, 6, min_match=2, max_df=2)
    assert not {r for r in got2 if r[0] == 2}
    # indexed path: same contract
    path = str(tmp_path / "tidx")
    build_text_index(_spark_docs(spark), path, n_buckets=8)
    got3 = sorted(
        map(
            tuple,
            query_text_index(
                spark, path, qdf, 6, min_match=2
            ).collect(),
        )
    )
    assert got3 == want


def test_text_index_streaming_ingest(spark, tmp_path):
    """append_text_index_stream == batch append of the same rows,
    searchable without compaction — the effectively-once foreachBatch
    contract of the IVF stream twin."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        append_text_index_stream,
        build_text_index,
        query_text_index,
    )

    base = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    extra = spark.createDataFrame(
        DOCS[4:], "doc_id long, text string"
    )
    p_stream = str(tmp_path / "t_stream")
    p_batch = str(tmp_path / "t_batch")
    build_text_index(base, p_stream, n_buckets=8)
    build_text_index(base, p_batch, n_buckets=8)
    append_text_index(spark, p_batch, extra)

    src = tmp_path / "src"
    src.mkdir()
    extra.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src) + "/*")
    q = (
        append_text_index_stream(stream, p_stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    qdf = spark.createDataFrame(
        [(100, "quick fox"), (102, "warm lazy")],
        "query_id long, text string",
    )
    got = sorted(
        map(
            tuple,
            query_text_index(spark, p_stream, qdf, 6).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            query_text_index(spark, p_batch, qdf, 6).collect(),
        )
    )
    assert got == want and got
    # and both equal one-corpus inline bm25
    inline = sorted(
        map(tuple, bm25_topk(_spark_docs(spark), qdf, 6).collect())
    )
    assert got == inline


def test_bm25_plan_is_jvm_only(spark):
    """The repo's anti-pattern pin extended to the new module: no
    row-Python anywhere, and the top-k window planned as a group
    limit (rank pushed below the full sort)."""
    qdf = spark.createDataFrame(
        [(1, "quick fox")], "query_id long, text string"
    )
    plan = (
        bm25_topk(_spark_docs(spark), qdf, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "WindowGroupLimit" in plan


def test_text_index_plan_is_jvm_only(spark, tmp_path):
    """Same anti-pattern pin for the persisted-index query path: no
    row-Python, top-k window planned as a group limit — pinned on
    all three plan shapes: the plain path (auto pruning stays off
    below the 100k-doc threshold), the forced max-score-pruned
    path, and the phrase path (higher-order adjacency functions are
    JVM expressions, not Python)."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(
        _spark_docs(spark), path, n_buckets=8, positions=True
    )
    qdf = spark.createDataFrame(
        [(1, "quick fox")], "query_id long, text string"
    )
    for kw in (
        {},
        {"prune": True},
        {"phrase": True},
        {"phrase": True, "slop": 2},
    ):
        plan = (
            query_text_index(spark, path, qdf, 3, **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan, kw
        assert "WindowGroupLimit" in plan, kw


def test_bm25_one_corpus_scan(spark, tmp_path):
    """r6 verdict #3: BM25 reads/tokenizes the corpus ONCE. The old
    shape derived doc lengths (for the stats AND the score join) and
    the posting explode as three lineages off the tokenized
    projection — three full corpus passes at 100 TB. Executed-scan
    counter: a mapInPandas wrapper spills each partition's row count
    to a file; after bm25_topk (the checkpoint pass) plus full
    materialization of the result, the corpus rows seen must equal
    the corpus size exactly once."""
    import os

    marker = str(tmp_path / "scan_counts")
    os.makedirs(marker, exist_ok=True)

    def counted(it):
        import os as _os
        import uuid as _uuid

        rows = 0
        for pdf in it:
            rows += len(pdf)
            yield pdf
        with open(
            _os.path.join(marker, _uuid.uuid4().hex), "w"
        ) as fh:
            fh.write(str(rows))

    docs = _spark_docs(spark).mapInPandas(
        counted, "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [(1, "quick fox"), (2, "zebra")],
        "query_id long, text string",
    )
    got = bm25_topk(docs, qdf, 3).collect()
    assert got
    seen = sum(
        int(open(os.path.join(marker, f)).read())
        for f in os.listdir(marker)
    )
    assert seen == len(DOCS), (
        f"corpus scanned {seen / len(DOCS):.1f}x, want exactly 1x"
    )


def test_text_index_matches_inline_bm25(spark, tmp_path):
    """The persisted inverted index reproduces bm25_topk exactly —
    same scores, ranks, and ties, with and without max_df, including
    the corpus statistics a null-text (termless) document shifts —
    while never touching the raw corpus at query time."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs = spark.createDataFrame(
        list(DOCS) + [(6, None)], "doc_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(docs, path, n_buckets=8)
    queries = [(100, "quick fox"), (101, "zebra"), (102, "warm lazy")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    want = sorted(map(tuple, bm25_topk(docs, qdf, 4).collect()))
    got = sorted(
        map(tuple, query_text_index(spark, path, qdf, 4).collect())
    )
    assert got == want and got
    # max_df flows through the persisted df store identically
    want2 = sorted(
        map(tuple, bm25_topk(docs, qdf, 6, max_df=2).collect())
    )
    got2 = sorted(
        map(
            tuple,
            query_text_index(spark, path, qdf, 6, max_df=2)
            .collect(),
        )
    )
    assert got2 == want2
    # zero-match queries yield zero rows
    q0 = spark.createDataFrame(
        [(9, "xylophone")], "query_id long, text string"
    )
    assert query_text_index(spark, path, q0, 3).count() == 0
    # id_col pass-through, as in bm25_topk
    assert "doc_id" in query_text_index(spark, path, qdf, 3).columns


def test_text_index_prunes_to_probed_buckets(spark, tmp_path):
    """The probed-cells discipline on the lexical store: a query's
    terms map to hash buckets, and the postings/terms scans read
    ONLY those partition directories."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(_spark_docs(spark), path, n_buckets=16)
    import os

    on_disk = {
        e
        for e in os.listdir(f"{path}/postings")
        if e.startswith("bucket=")
    }
    assert len(on_disk) > 2  # the fixture spreads over buckets
    qdf = spark.createDataFrame(
        [(1, "zebra")], "query_id long, text string"
    )
    out = query_text_index(spark, path, qdf, 6)
    expected_bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("zebra")), F.lit(16)).cast("int")
    ).collect()[0][0]
    import re

    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    pfs = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    pruned = [
        pf
        for pf in pfs
        if f"= {expected_bucket})" in pf
        or f"IN ({expected_bucket})" in pf
    ]
    # both the postings scan and the terms scan carry the static
    # single-bucket filter (a 1-element isin plans as equality)
    assert len(pruned) >= 2, (pfs, expected_bucket)
    # and the result is still the right ranking
    ids = [
        r["doc_id"]
        for r in sorted(out.collect(), key=lambda r: r["rank"])
    ]
    assert set(ids) == {3, 4} and ids[0] == 3


def _drop_doomed_and_rerank(full_rows, doomed, k):
    """Reference semantics: a query's FULL ranking minus doomed ids,
    renumbered, cut to k — scores of survivors unchanged (the
    Lucene deleted-docs statistics contract)."""
    out = []
    byq: dict = {}
    for r in sorted(
        map(tuple, full_rows), key=lambda r: (r[0], r[1])
    ):
        if r[2] in doomed:
            continue
        n = byq.get(r[0], 0) + 1
        byq[r[0]] = n
        if n <= k:
            out.append((r[0], n, r[2], r[3]))
    return sorted(out)


def test_text_index_lifecycle_append_delete_compact(spark, tmp_path):
    """The lexical store's lifecycle mirrors the IVF one: segment
    appends are searchable immediately with EXACT bm25_topk parity
    (df and corpus stats combine across base + segments at query
    time); tombstoned docs leave the match but not the statistics
    (Lucene deleted-docs semantics — survivor scores unchanged);
    compaction folds everything, snaps statistics to exactly-live,
    and clears both debt gauges."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        describe_text_index,
        query_text_index,
    )
    import os

    base_docs = spark.createDataFrame(
        DOCS[:4], "doc_id long, text string"
    )
    extra_docs = spark.createDataFrame(
        DOCS[4:], "doc_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(base_docs, path, n_buckets=8)
    append_text_index(spark, path, extra_docs)

    queries = [(100, "quick fox"), (101, "zebra"), (102, "warm lazy")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")
    got = sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    )
    want = sorted(
        map(tuple, bm25_topk(_spark_docs(spark), qdf, 6).collect())
    )
    assert got == want and got  # appended segment == one corpus

    d0 = describe_text_index(spark, path).collect()[0]
    assert d0["n_docs"] == 6 and d0["n_segments"] == 1
    assert d0["n_dead_docs"] == 0

    # tombstone one doc: it leaves every ranking, survivors keep
    # their scores (stats still count the physical rows)
    pre_full = query_text_index(spark, path, qdf, 100).collect()
    assert delete_from_text_index(spark, path, [0]) == 1
    post = sorted(
        map(
            tuple,
            query_text_index(spark, path, qdf, 100).collect(),
        )
    )
    assert post == _drop_doomed_and_rerank(pre_full, {0}, 100)
    assert describe_text_index(spark, path).collect()[0][
        "n_dead_docs"
    ] == 1

    # predicate delete: every doc CONTAINING a term
    assert (
        delete_from_text_index(spark, path, where="term = 'zebra'")
        == 2
    )

    compact_text_index(spark, path)
    assert not os.path.isdir(f"{path}/postings_seg")
    assert not os.path.isdir(f"{path}/tombstones")
    d1 = describe_text_index(spark, path).collect()[0]
    assert d1["n_docs"] == 3 and d1["n_segments"] == 0
    assert d1["n_dead_docs"] == 0
    # post-compact statistics snap to exactly-live: parity with a
    # fresh bm25 over the surviving docs
    live = spark.createDataFrame(
        [DOCS[1], DOCS[2], DOCS[5]], "doc_id long, text string"
    )
    got2 = sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    )
    want2 = sorted(map(tuple, bm25_topk(live, qdf, 6).collect()))
    assert got2 == want2


def test_text_index_replay_and_tombstone_mask(spark, tmp_path):
    """Replay idempotence (same batch_id overwrites its segment)
    and the tombstone-masks-the-ID contract: a re-appended deleted
    doc stays invisible until a compact clears the tombstone."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        describe_text_index,
        query_text_index,
    )

    base_docs = spark.createDataFrame(
        DOCS[:4], "doc_id long, text string"
    )
    extra_docs = spark.createDataFrame(
        DOCS[4:], "doc_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(base_docs, path, n_buckets=8)
    for _replay in range(2):
        append_text_index(spark, path, extra_docs, batch_id=0)
    d = describe_text_index(spark, path).collect()[0]
    assert d["n_docs"] == 6 and d["n_segments"] == 1  # not 8/2

    qdf = spark.createDataFrame(
        [(102, "warm lazy")], "query_id long, text string"
    )

    def visible():
        return {
            r[2]
            for r in query_text_index(
                spark, path, qdf, 100
            ).collect()
        }

    assert 5 in visible()
    delete_from_text_index(spark, path, [5])
    assert 5 not in visible()
    # re-append the tombstoned id: still masked
    doc5 = spark.createDataFrame(
        [DOCS[5]], "doc_id long, text string"
    )
    append_text_index(spark, path, doc5)
    assert 5 not in visible()
    compact_text_index(spark, path)  # clears the tombstone...
    append_text_index(spark, path, doc5)  # ...fresh append lives
    assert 5 in visible()


def test_text_index_doc_filter(spark, tmp_path):
    """Filtered lexical search (the text twin of the IVF store's
    member_filter): attribute columns persisted at build, a
    metadata predicate applied to the postings scan (parquet
    pushdown), results = the exact top-k among the filter's
    survivors scored with CORPUS-WIDE statistics — i.e. the FULL
    ranking post-filtered and re-ranked, no rank-k starvation. The
    filter follows appended segments too."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        query_text_index,
    )

    langs = ["en", "de"]
    docs = spark.createDataFrame(
        [(d, t, langs[d % 2]) for d, t in DOCS],
        "doc_id long, text string, lang string",
    )
    path = str(tmp_path / "tidx")
    build_text_index(
        docs.filter(F.col("doc_id") <= 3),
        path,
        n_buckets=8,
        attribute_cols=["lang"],
    )
    append_text_index(spark, path, docs.filter(F.col("doc_id") > 3))
    queries = [(1, "quick fox"), (2, "zebra"), (3, "warm lazy")]
    qdf = spark.createDataFrame(queries, "query_id long, text string")

    full = query_text_index(spark, path, qdf, 100).collect()
    non_en = {d for d, _t in DOCS if d % 2 == 1}
    for k in (1, 2, 6):
        got = sorted(
            map(
                tuple,
                query_text_index(
                    spark, path, qdf, k, doc_filter="lang = 'en'"
                ).collect(),
            )
        )
        assert got == _drop_doomed_and_rerank(full, non_en, k)
    # k=1 above IS the starvation case: zebra's top-1 overall (doc
    # 3, de) is filtered, and the en runner-up (doc 4) must surface
    got1 = {
        r[0]: r[2]
        for r in map(
            tuple,
            query_text_index(
                spark, path, qdf, 1, doc_filter="lang = 'en'"
            ).collect(),
        )
    }
    assert got1[2] == 4
    # the predicate reaches the postings scan as a pushed filter
    out = query_text_index(
        spark, path, qdf, 3, doc_filter="lang = 'en'"
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("lang" in pf for pf in pushed), pushed


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, doc_id long, rank int",
    )
    got = {
        r["doc_id"]: (r["rank"], r["rrf"])
        for r in rrf_fuse([a, b], 4).collect()
    }
    exp = {
        10: round(1 / 61 + 1 / 63, 6),
        11: round(1 / 62 + 1 / 61, 6),
        12: round(1 / 63, 6),
        13: round(1 / 62, 6),
    }
    assert {d: s for d, (_, s) in got.items()} == exp
    order = [
        d for d, _ in sorted(
            got.items(), key=lambda kv: kv[1][0]
        )
    ]
    # 11 (ranks 2+1) beats 10 (ranks 1+3); 13 (rank 2) beats 12
    # (rank 3) on the single-list sums
    assert order == [11, 10, 13, 12]
    with pytest.raises(ValueError):
        rrf_fuse([], 3)


def test_hybrid_bm25_cosine_smoke(spark):
    """The RAG recipe end-to-end on the synthetic tables: lexical
    ranking over documents + vector ranking over embeddings, fused
    by RRF. Shape pins only — the two tables are independent
    synthetics joined by id convention."""
    from knn_using_hadoop_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lex = bm25_topk(docs, queries, 10)
    vq = emb.filter(F.col("vec_id") % 100 == 0)
    vec = cosine_topk(emb, vq, 10, 64).select(
        "query_id",
        "rank",
        F.col("vec_id").alias("doc_id"),
    )
    fused = rrf_fuse([lex, vec], 10)
    rows = fused.collect()
    assert rows
    # per query: ranks contiguous from 1, scores non-increasing
    byq: dict = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    for q, rs in byq.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i]["rrf"] >= rs[i + 1]["rrf"]
            for i in range(len(rs) - 1)
        )
    # self-retrieval (the query IS the doc's text) lands the doc in
    # its own BM25 top-10 for most queries — not all: the synthetic
    # docs share phrases and BM25's length normalization can rank a
    # shorter phrase-mate above a long self (observed: 4/5 at
    # sf0.001, the miss being the longest doc)
    lex_rows = lex.collect()
    lq = {r["query_id"] for r in lex_rows}
    self_hits = sum(
        1
        for q in lq
        if any(
            r["doc_id"] == q
            for r in lex_rows
            if r["query_id"] == q
        )
    )
    assert self_hits * 2 > len(lq)


def test_rank_eval_hand_computed(spark):
    """trec_eval replica on a hand-worked case: graded gains
    (2^rel - 1, log2(rank+1) discount), judged-queries-only macro
    average, a judged query with no retrieved rows scoring zero,
    unjudged retrieved items counting as non-relevant, map_cut.k
    (``ap``) and judged@k, duplicate qrel rows collapsing to their
    max grade, and a no-relevant-judgments query (rel=0 only)
    excluded from the macro averages but kept as a per-query row
    (r7 verdict #6 + ADVICE #3)."""
    import math as m

    from knn_using_hadoop_spark.operators.retrieval import (
        rank_eval,
    )

    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (1, 12, 1), (2, 20, 1), (3, 30, 1),
         # duplicate judgment for (1, 10) at a lower grade — the
         # max-collapse must keep rel=2 and count the hit once
         (1, 10, 1),
         # query 4 is judged but has NO relevant docs (rel=0): its
         # row appears, the summary averages skip it
         (4, 40, 0)],
        "query_id long, doc_id long, rel int",
    )
    ranking = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 99), (1, 3, 11),
         (2, 1, 21), (2, 2, 22), (2, 3, 20),
         (4, 1, 40)],
        "query_id long, rank int, doc_id long",
    )
    got = {
        r["query_id"]: r
        for r in rank_eval(ranking, qrels, 3).collect()
    }
    ndcg1 = round(
        (3.0 / m.log2(2) + 1.0 / m.log2(4))
        / (3.0 / m.log2(2) + 1.0 / m.log2(3) + 1.0 / m.log2(4)),
        6,
    )
    assert (
        got[1]["n_rel"], got[1]["hits"], got[1]["recall"],
        got[1]["precision"], got[1]["rr"], got[1]["ndcg"],
    ) == (3, 2, 0.666667, 0.666667, 1.0, ndcg1)
    # AP (map_cut.3): relevant at ranks 1 and 3 -> (P@1 + P@3)/n_rel
    ap1 = round((1.0 + 2.0 / 3.0) / 3.0, 6)
    assert got[1]["ap"] == ap1
    # judged@3: ranks 1 and 3 carry judgments, rank 2 (doc 99) none
    assert got[1]["judged"] == 0.666667
    assert (
        got[2]["recall"], got[2]["precision"], got[2]["rr"],
        got[2]["ndcg"],
    ) == (1.0, 0.333333, 0.333333, 0.5)
    assert got[2]["ap"] == 0.333333  # P@3 = 1/3, n_rel = 1
    assert got[2]["judged"] == 0.333333
    # judged, nothing retrieved -> zeros (counted in the macro avg)
    assert (
        got[3]["hits"], got[3]["recall"], got[3]["ndcg"],
        got[3]["ap"], got[3]["judged"],
    ) == (0, 0.0, 0.0, 0.0, 0.0)
    # judged with NO relevant docs: per-query row present, zeros,
    # judged@k still reports the pool coverage of what it retrieved
    assert (
        got[4]["n_rel"], got[4]["hits"], got[4]["recall"],
        got[4]["ap"], got[4]["judged"],
    ) == (0, 0, 0.0, 0.0, 1.0)
    s = got[None]
    assert s["n_rel"] == 5 and s["hits"] == 3
    # macro averages over the 3 scorable queries — query 4 (no
    # relevant judgments) is excluded, trec_eval-style: including
    # it would e.g. lift judged to (2/3+1/3+0+1)/4 = 0.5
    assert s["recall"] == round((0.666667 + 1.0 + 0.0) / 3, 6)
    assert s["rr"] == round((1.0 + 0.333333 + 0.0) / 3, 6)
    assert s["ap"] == round((ap1 + 0.333333 + 0.0) / 3, 6)
    assert s["ndcg"] == round((ndcg1 + 0.5 + 0.0) / 3, 6)
    assert s["judged"] == round(
        (0.666667 + 0.333333 + 0.0) / 3, 6
    )

    # a perfect ranking scores 1.0 on recall/rr/ndcg
    perfect = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 11), (1, 3, 12), (2, 1, 20),
         (3, 1, 30)],
        "query_id long, rank int, doc_id long",
    )
    ps = {
        r["query_id"]: r
        for r in rank_eval(perfect, qrels, 3).collect()
    }
    assert (
        ps[None]["recall"], ps[None]["rr"], ps[None]["ap"],
        ps[None]["ndcg"],
    ) == (1.0, 1.0, 1.0, 1.0)


def test_rank_eval_composes_with_text_index(spark, tmp_path):
    """End-to-end: self-retrieval qrels (each query's own document
    is its single relevant item) over the persisted index — the
    evaluation loop a deployment runs after every index change.
    The smoke's observed property: most queries retrieve self in
    the top-10, so MRR is high but not 1.0."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
        rank_eval,
    )

    docs = _spark_docs(spark)
    path = str(tmp_path / "tidx")
    build_text_index(docs, path, n_buckets=8)
    queries = docs.select(
        F.col("doc_id").alias("query_id"), "text"
    )
    ranking = query_text_index(spark, path, queries, 10)
    qrels = docs.select(
        F.col("doc_id").alias("query_id"),
        F.col("doc_id"),
        F.lit(1).alias("rel"),
    )
    s = {
        r["query_id"]: r
        for r in rank_eval(ranking, qrels, 10).collect()
    }[None]
    assert s["n_rel"] == 6
    assert s["rr"] > 0.5 and s["recall"] > 0.5
    assert 0.0 < s["ndcg"] <= 1.0


def test_maxp_doc_topk_hand_computed(spark):
    from knn_using_hadoop_spark.operators.retrieval import (
        maxp_doc_topk,
    )

    ranking = spark.createDataFrame(
        [
            (1, 100, 1, 5.5),
            (1, 101, 2, 4.0),
            (1, 102, 3, 3.0),
            (1, 103, 4, 2.0),
        ],
        "query_id long, chunk_id long, rank int, bm25 double",
    )
    cmap = spark.createDataFrame(
        # chunks 100,103 -> doc 7; 101 -> doc 8; 102 -> doc 9
        [(100, 7), (101, 8), (102, 9), (103, 7), (999, 99)],
        "chunk_id long, doc_id long",
    )
    got = sorted(
        map(tuple, maxp_doc_topk(ranking, cmap, 3).collect())
    )
    # max: doc 7 = max(5.5, 2.0) = 5.5; doc 8 = 4.0; doc 9 = 3.0
    assert got == [(1, 1, 7, 5.5), (1, 2, 8, 4.0), (1, 3, 9, 3.0)]
    got_sum = sorted(
        map(
            tuple,
            maxp_doc_topk(ranking, cmap, 3, agg="sum").collect(),
        )
    )
    # sum: doc 7 = 7.5 — multi-hit doc rewarded
    assert got_sum == [(1, 1, 7, 7.5), (1, 2, 8, 4.0), (1, 3, 9, 3.0)]
    import pytest as _pt

    with _pt.raises(ValueError):
        maxp_doc_topk(ranking, cmap, 3, agg="median")


def test_maxp_composes_with_chunked_bm25(spark):
    """The long-document recipe end-to-end: chunk_windows -> BM25
    over chunks -> MaxP back to docs. A long document whose single
    relevant passage sits mid-document must WIN under chunked MaxP
    scoring (BM25's length normalization buries it at whole-doc
    granularity: its one passage competes against the full doc
    length)."""
    from knn_using_hadoop_spark.operators.pipeline import (
        chunk_windows,
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_topk,
        maxp_doc_topk,
    )

    filler = " ".join(f"w{i % 7}" for i in range(400))
    needle = "quantum flux capacitor alignment"
    long_doc = filler + " " + needle + " " + filler
    docs = spark.createDataFrame(
        [
            (0, long_doc),
            (1, "short note on flux only"),
            (2, filler),
        ],
        "doc_id long, text string",
    )
    # with_key=True (r6 verdict #5): chunk_windows emits the
    # globally-unique chunk_key, so the composition needs no
    # hand-derived doc_id*K+chunk_id arithmetic
    chunks = chunk_windows(
        docs, size=64, overlap=16, with_key=True
    ).localCheckpoint(eager=True)
    # the key is unique across documents and deterministic
    assert (
        chunks.select("chunk_key").distinct().count()
        == chunks.count()
    )
    q = spark.createDataFrame(
        [(1, needle)], "query_id long, text string"
    )
    chunk_rank = bm25_topk(
        chunks.select(
            "chunk_key", F.col("chunk_text").alias("text")
        ),
        q,
        10,
        id_col="chunk_key",
    )
    # bm25_topk passes the caller's id column name through
    assert "chunk_key" in chunk_rank.columns
    got = maxp_doc_topk(
        chunk_rank,
        chunks.select("chunk_key", "doc_id"),
        3,
        chunk_col="chunk_key",
    ).collect()
    top = min(got, key=lambda r: r["rank"])
    assert top["doc_id"] == 0


def test_text_index_lifecycle_on_file_uri(spark, tmp_path):
    """r7 verdict #1, the text-store half: before r8 the lifecycle
    probed segments/tombstones with os.path.isdir/os.listdir and
    compacted with shutil.rmtree — silently blind on any
    scheme-prefixed store (file://, hdfs://, s3a://): appended docs
    VANISHED from queries and deleted docs CAME BACK, no error. All
    probes now route through the Hadoop FileSystem API
    (sources/index_store); file:// is the in-container stand-in for
    the remote schemes. Build -> append -> query -> delete ->
    describe -> compact on the URI, with bm25_topk parity at each
    visible state."""
    import os

    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        describe_text_index,
        query_text_index,
    )

    base_docs = spark.createDataFrame(
        DOCS[:4], "doc_id long, text string"
    )
    extra_docs = spark.createDataFrame(
        DOCS[4:], "doc_id long, text string"
    )
    path = f"file://{tmp_path}/tidx"
    build_text_index(base_docs, path, n_buckets=8)
    append_text_index(spark, path, extra_docs)

    qdf = spark.createDataFrame(
        [(100, "quick fox"), (101, "zebra"), (102, "warm lazy")],
        "query_id long, text string",
    )
    got = sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    )
    want = sorted(
        map(tuple, bm25_topk(_spark_docs(spark), qdf, 6).collect())
    )
    assert got == want and got  # the segment is VISIBLE via the URI
    d0 = describe_text_index(spark, path).collect()[0]
    assert d0["n_docs"] == 6 and d0["n_segments"] == 1

    assert delete_from_text_index(spark, path, [4]) == 1
    post = {
        r["doc_id"]
        for r in query_text_index(spark, path, qdf, 100).collect()
    }
    assert 4 not in post  # the tombstone is VISIBLE via the URI
    assert describe_text_index(spark, path).collect()[0][
        "n_dead_docs"
    ] == 1

    compact_text_index(spark, path)
    assert not os.path.isdir(f"{tmp_path}/tidx/postings_seg")
    assert not os.path.isdir(f"{tmp_path}/tidx/tombstones")
    d1 = describe_text_index(spark, path).collect()[0]
    assert d1["n_docs"] == 5 and d1["n_segments"] == 0
    assert d1["n_dead_docs"] == 0
    live = spark.createDataFrame(
        [d for d in DOCS if d[0] != 4], "doc_id long, text string"
    )
    got2 = sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    )
    want2 = sorted(map(tuple, bm25_topk(live, qdf, 6).collect()))
    assert got2 == want2  # post-compact stats snap to exactly-live


def test_null_text_doc_counts_as_empty_in_stats(spark, tmp_path):
    """r7 ADVICE #2: a null-text document used to carry
    dl = size(split(null)) = -1, SUBTRACTING a token from avgdl
    while still adding one to n_docs. It must count as an EMPTY
    document: dl=0, n_docs+1 — pinned on the persisted stats store
    (the same clamp runs in bm25_topk's inline scan; the two paths'
    exact parity is pinned in test_text_index_matches_inline_bm25)."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f"), (2, None)],
        "doc_id long, text string",
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        _read_stats,
    )

    path = str(tmp_path / "tidx")
    build_text_index(docs, path, n_buckets=4)
    # r9: the stats store is per-bucket partials; _read_stats sums
    st = _read_stats(spark, path).collect()[0]
    assert st["n_docs"] == 3.0
    assert st["sum_dl"] == 6.0  # 4 + 2 + 0, not 4 + 2 - 1
    assert abs(st["avgdl"] - 2.0) < 1e-12


def test_bm25_materialize_modes(spark, tmp_path):
    """r7 verdict #2 / ADVICE #4: the eager localCheckpoint is the
    right 100 TB default but a pure tax on small or cached corpora
    and a semantics surprise for plan-only callers. The knob:
    identical results across checkpoint/persist/none; 'checkpoint'
    scans the corpus AT CALL TIME (the documented eagerness);
    'persist' and 'none' run NOTHING until an action."""
    import os

    def counted_docs(marker):
        os.makedirs(marker, exist_ok=True)

        def counted(it):
            import os as _os
            import uuid as _uuid

            rows = 0
            for pdf in it:
                rows += len(pdf)
                yield pdf
            with open(
                _os.path.join(marker, _uuid.uuid4().hex), "w"
            ) as fh:
                fh.write(str(rows))

        return _spark_docs(spark).mapInPandas(
            counted, "doc_id long, text string"
        )

    qdf = spark.createDataFrame(
        [(1, "quick fox"), (2, "zebra"), (3, "warm lazy")],
        "query_id long, text string",
    )
    results = {}
    for mode in ("checkpoint", "persist", "none"):
        marker = str(tmp_path / f"scan_{mode}")
        df = bm25_topk(
            counted_docs(marker), qdf, 4, materialize=mode
        )
        scans_at_call = len(os.listdir(marker))
        if mode == "checkpoint":
            assert scans_at_call > 0  # eager: scan ran at call time
        else:
            assert scans_at_call == 0  # lazy: nothing ran yet
        results[mode] = sorted(map(tuple, df.collect()))
        assert results[mode]
    assert results["checkpoint"] == results["persist"]
    assert results["checkpoint"] == results["none"]
    # cleanup: persist mode documents caller-owned unpersist; the
    # test session drops any cache it pinned
    spark.catalog.clearCache()

    with pytest.raises(ValueError):
        bm25_topk(_spark_docs(spark), qdf, 3, materialize="disk")


def _zipfy_corpus(seed=7, n_docs=150):
    """Deterministic mixed-df corpus: 10 common terms in most docs,
    10 rare terms each in a handful — the Zipf shape max-score
    pruning exploits (rare terms decide rankings, common terms pay
    the pair volume)."""
    import random

    rng = random.Random(seed)
    common = [f"c{i}" for i in range(10)]
    rare = [f"r{i}" for i in range(10)]
    docs = []
    for d in range(n_docs):
        words = [rng.choice(common) for _ in range(rng.randint(8, 24))]
        if rng.random() < 0.25:
            words.append(rng.choice(rare))
        rng.shuffle(words)
        docs.append((d, " ".join(words)))
    queries = []
    for q in range(8):
        qt = [rng.choice(rare)] + [rng.choice(common) for _ in range(3)]
        if q % 3 == 0:
            qt.append(rng.choice(rare))
        queries.append((100 + q, " ".join(qt)))
    # one query with NO rare terms: theta's df cap selects nothing,
    # pruning must degenerate to the exact unpruned answer
    queries.append((199, " ".join(common[:4])))
    return docs, queries


def test_text_index_prune_parity(spark, tmp_path):
    """Max-score pruning is EXACT: prune=True == prune=False ==
    inline bm25_topk on a mixed-df corpus, across k, under a
    doc_filter, and with max_df forced on top (r7 verdict #3)."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs, queries = _zipfy_corpus()
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    for k in (1, 5, 20):
        un = sorted(map(tuple, query_text_index(
            spark, path, qdf, k, prune=False).collect()))
        pr = sorted(map(tuple, query_text_index(
            spark, path, qdf, k, prune=True).collect()))
        auto = sorted(map(tuple, query_text_index(
            spark, path, qdf, k).collect()))
        assert pr == un and auto == un and un
    want = sorted(map(tuple, bm25_topk(ddf, qdf, 5).collect()))
    assert sorted(map(tuple, query_text_index(
        spark, path, qdf, 5).collect())) == want
    # forced pruning under the stop-term guard
    a = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, max_df=60, prune=True).collect()))
    b = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, max_df=60, prune=False).collect()))
    assert a == b and a
    # and under a metadata-free doc_filter over doc_id
    a = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, doc_filter="doc_id % 2 = 0",
        prune=True).collect()))
    b = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, doc_filter="doc_id % 2 = 0",
        prune=False).collect()))
    assert a == b and a
    with pytest.raises(ValueError):
        query_text_index(
            spark, path, qdf, 5, min_match=2, prune=True
        )
    # auto mode silently declines to prune under min_match
    mm = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, min_match=2).collect()))
    assert mm == sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, min_match=2, prune=False).collect()))


def test_text_index_prune_parity_with_lifecycle(spark, tmp_path):
    """Pruning stays exact across the segment/tombstone lifecycle:
    stored base bounds fold with query-time segment bounds, and
    tombstoned docs can't resurface through the candidate pass."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    docs, queries = _zipfy_corpus(seed=11)
    base = docs[:100]
    extra = docs[100:]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(
        spark.createDataFrame(base, "doc_id long, text string"),
        path,
        n_buckets=8,
    )
    append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    delete_from_text_index(spark, path, [d for d, _ in docs[:15]])
    un = sorted(map(tuple, query_text_index(
        spark, path, qdf, 6, prune=False).collect()))
    pr = sorted(map(tuple, query_text_index(
        spark, path, qdf, 6, prune=True).collect()))
    assert pr == un and un
    assert not {t[2] for t in pr} & {d for d, _ in docs[:15]}


def test_text_index_prune_legacy_store(spark, tmp_path):
    """A store built before the bound columns existed still prunes
    exactly: bounds derive from the matched postings at query time."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs, queries = _zipfy_corpus(seed=23)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    # rewrite the terms store in the r7 (pre-bounds) layout
    legacy = (
        spark.read.parquet(f"{path}/terms")
        .select("bucket", "term", "df")
        .localCheckpoint(eager=True)
    )
    legacy.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/terms"
    )
    assert "max_tf" not in spark.read.parquet(
        f"{path}/terms"
    ).columns
    un = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, prune=False).collect()))
    pr = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, prune=True).collect()))
    assert pr == un and un


def test_bm25_inline_prune_parity(spark):
    """Inline bm25_topk shares the max-score machinery: on a
    mixed-df corpus (rare terms under the 10% df cap, so pruning
    genuinely engages) the auto-pruned default, the forced modes,
    and the pure-Python reference all agree exactly."""
    docs, queries = _zipfy_corpus(seed=31)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    want = _bm25_ref(docs, queries, 5)
    auto = sorted(map(tuple, bm25_topk(ddf, qdf, 5).collect()))
    off = sorted(map(tuple, bm25_topk(
        ddf, qdf, 5, prune=False).collect()))
    forced = sorted(map(tuple, bm25_topk(
        ddf, qdf, 5, prune=True).collect()))
    assert auto == want and off == want and forced == want
    # persist/none stay auto-off (lazy contract) but prune=True
    # still matches
    lazy = sorted(map(tuple, bm25_topk(
        ddf, qdf, 5, materialize="none", prune=True).collect()))
    assert lazy == want
    with pytest.raises(ValueError):
        bm25_topk(ddf, qdf, 5, min_match=2, prune=True)


def _phrase_ref(docs, queries, k, k1=1.2, b=0.75):
    """Pure-Python Lucene PhraseQuery reference: tf = exact
    (overlap-counting) phrase occurrences, idf = sum over phrase
    positions of member-term idfs, BM25 saturation, 6dp/lowest-id
    protocol."""
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    out = []
    for qid, qt in queries:
        pt = qt.split(" ")
        if any(t not in df for t in pt):
            continue
        qidf = sum(idf(t) for t in pt)
        scores = {}
        for d, tks in toks.items():
            ptf = float(sum(
                1
                for j in range(len(tks) - len(pt) + 1)
                if tks[j : j + len(pt)] == pt
            ))
            if ptf:
                scores[d] = round(
                    qidf * ptf * (k1 + 1.0)
                    / (ptf + k1 * (1 - b + b * len(tks) / avgdl)),
                    6,
                )
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out += [
            (qid, i + 1, d, s)
            for i, (d, s) in enumerate(ranked[:k])
        ]
    return sorted(out)


PHRASE_DOCS = list(DOCS) + [
    (6, "buffalo buffalo buffalo fish"),
    (7, "the quick brown fox met a quick brown dog"),
]


def test_text_index_phrase_matches_reference(spark, tmp_path):
    """Exact-phrase search over the positional index == the
    pure-Python Lucene PhraseQuery reference: adjacency (not bag
    overlap), overlap-counted phrase tf (the buffalo doc), repeated
    phrase occurrences in one doc, single-token phrases, and
    zero-result phrases whose words all exist but never adjacently."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(
        _spark_docs(spark, PHRASE_DOCS), path, n_buckets=8,
        positions=True,
    )
    queries = [
        (100, "quick brown"),
        (101, "the quick brown fox"),
        (102, "buffalo buffalo"),
        (103, "zebra"),
        (104, "fox the"),        # words exist, never adjacent
        (105, "warm xylophone"),  # unseen word -> no rows
    ]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    got = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, phrase=True).collect()))
    want = _phrase_ref(PHRASE_DOCS, queries, 5)
    assert got == want and got
    # the buffalo phrase counted overlapping occurrences (ptf=2)
    assert any(q == 102 for q, *_ in got)
    assert not any(q in (104, 105) for q, *_ in got)
    # guards
    for kw in (
        {"max_df": 2},
        {"min_match": 2},
        {"prune": True},
    ):
        with pytest.raises(ValueError):
            query_text_index(
                spark, path, qdf, 5, phrase=True, **kw
            )
    # a non-positional store refuses phrase queries
    path2 = str(tmp_path / "tidx2")
    build_text_index(
        _spark_docs(spark, PHRASE_DOCS), path2, n_buckets=8
    )
    with pytest.raises(ValueError):
        query_text_index(spark, path2, qdf, 5, phrase=True)


def test_text_index_phrase_lifecycle_and_filter(spark, tmp_path):
    """Phrase search composes with the store lifecycle: appended
    segments carry positions (meta manifest), tombstoned docs never
    match, survivors keep pre-delete scores (Lucene deleted-docs
    statistics), and doc_filter post-filters the exact ranking."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    base, extra = PHRASE_DOCS[:6], PHRASE_DOCS[6:]
    path = str(tmp_path / "tidx")
    build_text_index(
        spark.createDataFrame(base, "doc_id long, text string"),
        path, n_buckets=8, positions=True,
    )
    append_text_index(
        spark, path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    queries = [(100, "quick brown"), (102, "buffalo buffalo")]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    got = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, phrase=True).collect()))
    assert got == _phrase_ref(PHRASE_DOCS, queries, 5)
    # doc_filter: exact ranking post-filtered and re-ranked
    feven = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, phrase=True,
        doc_filter="doc_id % 2 = 0").collect()))
    full = query_text_index(
        spark, path, qdf, 100, phrase=True
    ).collect()
    want_even = _drop_doomed_and_rerank(
        full, {d for d, _ in PHRASE_DOCS if d % 2 == 1}, 5
    )
    assert feven == want_even
    # tombstones: deleted docs never match, survivors keep scores
    delete_from_text_index(spark, path, [1, 7])
    after = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, phrase=True).collect()))
    assert after == _drop_doomed_and_rerank(full, {1, 7}, 5)


def _bucket_files(root, prefix="bucket="):
    """{bucket_dir: {file: (size, mtime)}} for a bucketed store
    (``prefix="dbucket="`` for the r10 doc-keyed forward store)."""
    import os

    out = {}
    for d in os.listdir(root):
        if not d.startswith(prefix):
            continue
        p = os.path.join(root, d)
        out[d] = {
            f: (
                os.path.getsize(os.path.join(p, f)),
                os.path.getmtime(os.path.join(p, f)),
            )
            for f in os.listdir(p)
        }
    return out


def test_text_index_selective_compact(spark, tmp_path):
    """r8: compaction is PARTITION-SELECTIVE — folding a one-term
    segment (and later a one-doc tombstone) rewrites only the
    affected bucket; every other bucket's parquet files stay
    byte-identical (same names, sizes, mtimes) across the postings,
    terms AND (r9) the per-bucket stats-partials stores. Query
    parity with inline bm25_topk is asserted after each compact, so
    selectiveness never trades correctness."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(_spark_docs(spark), path, n_buckets=16)
    zb = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("zebra")), F.lit(16)).cast("int")
    ).collect()[0][0]
    # the appended doc's forward rows land in its id-hash dbucket
    zdb = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(100).cast("long")), F.lit(16))
        .cast("int")
    ).collect()[0][0]
    before = _bucket_files(f"{path}/postings")
    tbefore = _bucket_files(f"{path}/terms")
    sbefore = _bucket_files(f"{path}/stats")
    bbefore = _bucket_files(f"{path}/blocks")
    dvbefore = _bucket_files(f"{path}/docvecs", "dbucket=")

    # segment append touching exactly the zebra bucket
    append_text_index(
        spark,
        path,
        spark.createDataFrame(
            [(100, "zebra")], "doc_id long, text string"
        ),
    )
    compact_ = __import__(
        "knn_using_hadoop_spark.operators.retrieval",
        fromlist=["compact_text_index"],
    ).compact_text_index
    compact_(spark, path)
    after = _bucket_files(f"{path}/postings")
    tafter = _bucket_files(f"{path}/terms")
    safter = _bucket_files(f"{path}/stats")
    bafter = _bucket_files(f"{path}/blocks")
    dvafter = _bucket_files(f"{path}/docvecs", "dbucket=")
    for d, files in before.items():
        if d != f"bucket={zb}":
            assert after[d] == files, f"{d} was rewritten"
            assert tafter[d] == tbefore[d], f"terms {d} rewritten"
            assert bafter[d] == bbefore[d], f"blocks {d} rewritten"
    for d, files in sbefore.items():
        if d != f"bucket={zb}":
            assert safter[d] == files, f"stats {d} rewritten"
    # r10: the forward store folds selectively too — only the
    # appended doc's dbucket is rewritten
    for d, files in dvbefore.items():
        if d != f"dbucket={zdb}":
            assert dvafter[d] == files, f"docvecs {d} rewritten"
    assert after[f"bucket={zb}"] != before[f"bucket={zb}"]
    # the appended doc's head row lands in the zebra bucket, so its
    # stats partial must have been rewritten (and only it)
    assert safter[f"bucket={zb}"] != sbefore.get(f"bucket={zb}")
    docs_plus = list(DOCS) + [(100, "zebra")]
    qdf = spark.createDataFrame(
        [(1, "zebra stripes"), (2, "quick fox")],
        "query_id long, text string",
    )
    assert sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    ) == sorted(map(tuple, bm25_topk(
        _spark_docs(spark, docs_plus), qdf, 6).collect()))

    # tombstone the appended doc: only its (single-term) bucket is
    # rewritten again
    mid = _bucket_files(f"{path}/postings")
    smid = _bucket_files(f"{path}/stats")
    dvmid = _bucket_files(f"{path}/docvecs", "dbucket=")
    delete_from_text_index(spark, path, [100])
    compact_(spark, path)
    final = _bucket_files(f"{path}/postings")
    sfinal = _bucket_files(f"{path}/stats")
    dvfinal = _bucket_files(f"{path}/docvecs", "dbucket=")
    for d, files in mid.items():
        if d != f"bucket={zb}":
            assert final[d] == files, f"{d} rewritten by delete"
    for d, files in smid.items():
        if d != f"bucket={zb}":
            assert sfinal[d] == files, f"stats {d} rewritten"
    for d, files in dvmid.items():
        if d != f"dbucket={zdb}":
            assert dvfinal[d] == files, f"docvecs {d} rewritten"
    # the deleted doc's dbucket directory is gone (it held only
    # that doc's forward rows)
    assert f"dbucket={zdb}" not in dvfinal or dvfinal[
        f"dbucket={zdb}"
    ] != dvmid.get(f"dbucket={zdb}")
    assert sorted(
        map(tuple, query_text_index(spark, path, qdf, 6).collect())
    ) == sorted(map(tuple, bm25_topk(
        _spark_docs(spark), qdf, 6).collect()))


def test_text_index_compact_emptied_store(spark, tmp_path):
    """Deleting every document and compacting empties the store
    cleanly: emptied bucket directories are removed (dynamic
    overwrite cannot delete what it does not write) and the stats
    row zeroes instead of the recompute failing on a partitionless
    parquet root."""
    import os

    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        compact_text_index,
        delete_from_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(
        spark.createDataFrame(
            [(0, "only doc here")], "doc_id long, text string"
        ),
        path,
        n_buckets=8,
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        _read_stats,
    )

    delete_from_text_index(spark, path, [0])
    compact_text_index(spark, path)
    assert not [
        e
        for e in os.listdir(f"{path}/postings")
        if e.startswith("bucket=")
    ]
    s = _read_stats(spark, path).collect()[0]
    assert s["n_docs"] == 0.0
    assert not os.path.isdir(f"{path}/tombstones")


def test_text_index_compact_migrates_legacy_layouts(spark, tmp_path):
    """r9 (r8 ADVICE #1): the first compact over a store with legacy
    layouts migrates them WHOLESALE — a pre-r8 terms store (no
    max_tf/min_dl) is rebuilt for all buckets (a delta rewrite would
    leave a mixed-schema store whose schema-merged NULL bounds read
    as prunable-to-zero in the max-score essential sum, silently
    dropping docs from the exact top-k), and a pre-r9 one-row stats
    store is rebuilt into the bucketed-partials layout. Query parity
    (pruned AND unpruned) is asserted against inline bm25_topk over
    the post-compact corpus."""
    from knn_using_hadoop_spark.operators.retrieval import (
        _read_stats,
        append_text_index,
        build_text_index,
        compact_text_index,
        query_text_index,
    )

    docs, queries = _zipfy_corpus(seed=41)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    # rewrite terms in the r7 (pre-bounds) layout and stats in the
    # r8 (one-row) layout
    legacy_terms = (
        spark.read.parquet(f"{path}/terms")
        .select("bucket", "term", "df")
        .localCheckpoint(eager=True)
    )
    legacy_terms.write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/terms")
    st = _read_stats(spark, path).localCheckpoint(eager=True)
    import shutil

    shutil.rmtree(f"{path}/stats")
    st.write.parquet(f"{path}/stats")
    assert "bucket" not in spark.read.parquet(
        f"{path}/stats"
    ).columns

    # a small append, then compact: the migration round
    extra = [(900, "c0 c1 r3"), (901, "r5 c2")]
    append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    compact_text_index(spark, path)

    terms = spark.read.parquet(f"{path}/terms")
    assert "max_tf" in terms.columns
    # the whole store migrated: no NULL bounds anywhere
    assert (
        terms.filter(
            F.col("max_tf").isNull() | F.col("min_dl").isNull()
        ).count()
        == 0
    )
    stats = spark.read.parquet(f"{path}/stats")
    assert "bucket" in stats.columns
    s = _read_stats(spark, path).collect()[0]
    assert s["n_docs"] == float(len(docs) + len(extra))

    docs_plus = docs + extra
    want = sorted(map(tuple, bm25_topk(
        spark.createDataFrame(
            docs_plus, "doc_id long, text string"
        ), qdf, 5).collect()))
    got_pruned = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, prune=True).collect()))
    got_plain = sorted(map(tuple, query_text_index(
        spark, path, qdf, 5, prune=False).collect()))
    assert got_pruned == want and got_plain == want


def test_text_index_compact_noop_delete_is_free(spark, tmp_path):
    """r10 (r9 What's-wrong #2): tombstones that match nothing in
    base or segments, with no crash manifest present, are a GENUINE
    no-op delete — a crashed compact always leaves its write-ahead
    manifest until every derived store is rewritten, so absence
    proves nothing is stale. The compact clears the tombstone dir
    and rewrites NOTHING: every postings/terms/blocks/stats/docvecs
    file stays byte-identical (r9 paid an all-bucket stats rebuild
    here). The store stays exactly consistent and queryable."""
    import os

    from knn_using_hadoop_spark.operators.retrieval import (
        _read_stats,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        query_text_index,
    )

    path = str(tmp_path / "tidx")
    build_text_index(_spark_docs(spark), path, n_buckets=8)
    before = _read_stats(spark, path).collect()[0]
    snap = {
        s: _bucket_files(f"{path}/{s}")
        for s in ("postings", "terms", "blocks", "stats")
    }
    snap["docvecs"] = _bucket_files(f"{path}/docvecs", "dbucket=")
    delete_from_text_index(spark, path, [777, 778])  # never present
    compact_text_index(spark, path)
    assert not os.path.isdir(f"{path}/tombstones")
    for s in ("postings", "terms", "blocks", "stats"):
        assert _bucket_files(f"{path}/{s}") == snap[s], (
            f"no-op delete rewrote {s}"
        )
    assert (
        _bucket_files(f"{path}/docvecs", "dbucket=")
        == snap["docvecs"]
    )
    after = _read_stats(spark, path).collect()[0]
    assert after == before
    qdf = spark.createDataFrame(
        [(1, "quick fox")], "query_id long, text string"
    )
    assert sorted(map(tuple, query_text_index(
        spark, path, qdf, 3).collect())) == sorted(map(
            tuple, bm25_topk(_spark_docs(spark), qdf, 3).collect()))


def test_pruned_queries_leave_no_cached_relations(spark, tmp_path):
    """r9 (r8 verdict #4 / ADVICE #2): the max-score pruner's bound
    relation must not accumulate in the session cacheManager across
    queries — a long-lived serving session issuing thousands of
    pruned queries used to stack one persisted relation per query
    (LRU kept it correct but churned the block manager). The bound
    relation is now an eager localCheckpoint (GC-cleaned), so the
    cacheManager stays EMPTY after any number of pruned queries."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs, queries = _zipfy_corpus(seed=53)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    for _ in range(3):
        query_text_index(spark, path, qdf, 5, prune=True).count()
        bm25_topk(ddf, qdf, 5, prune=True).count()
    assert cm.isEmpty(), "pruned queries left persisted relations"


def _sloppy_ref(docs, queries, k, slop, k1=1.2, b=0.75):
    """Pure-Python reference for the r9 sloppy-phrase contract:
    anchors = occurrences of the offset-0 term; displacement(p) =
    sum over offsets i>0 of min over the member's positions q of
    |q - (p+i)|; tf = sum over anchors with displacement <= slop of
    1/(1+displacement); idf/saturation/rounding/ties = the exact
    phrase protocol. slop=0 reduces to the exact-phrase reference."""
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    out = []
    for qid, qt in queries:
        pt = qt.split(" ")
        if any(t not in df for t in pt):
            continue
        qidf = sum(idf(t) for t in pt)
        scores = {}
        for d, tks in toks.items():
            pos = {}
            for j, t in enumerate(tks):
                pos.setdefault(t, []).append(j)
            if any(t not in pos for t in pt):
                continue
            ptf = 0.0
            for p in pos[pt[0]]:
                disp = sum(
                    min(abs(q - (p + i)) for q in pos[pt[i]])
                    for i in range(1, len(pt))
                )
                if disp <= slop:
                    ptf += 1.0 / (1.0 + disp)
            if ptf > 0:
                scores[d] = round(
                    qidf * ptf * (k1 + 1.0)
                    / (ptf + k1 * (1 - b + b * len(tks) / avgdl)),
                    6,
                )
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out += [
            (qid, i + 1, d, s)
            for i, (d, s) in enumerate(ranked[:k])
        ]
    return sorted(out)


def test_text_index_sloppy_phrase(spark, tmp_path):
    """r9 sloppy phrase: engine == the pure-Python reference across
    slops; slop=0 == the exact phrase path bit-for-bit; a slop wide
    enough to absorb an inserted word matches where exact does not;
    validation raises on slop without phrase and negative slop."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        query_text_index,
    )

    docs = PHRASE_DOCS + [
        # one word inserted inside the phrase: exact misses,
        # slop>=1 catches ("quick [red] brown fox")
        (8, "a quick red brown fox in the field"),
        # transposed members: "brown quick fox"
        (9, "brown quick fox runs away"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8, positions=True)
    queries = [
        (1, "quick brown fox"),
        (2, "buffalo buffalo"),
        (3, "lazy dog"),
        (4, "zebra"),
    ]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    for slop in (0, 1, 2, 4):
        got = sorted(map(tuple, query_text_index(
            spark, path, qdf, 10, phrase=True, slop=slop
        ).collect()))
        assert got == _sloppy_ref(docs, queries, 10, slop), (
            f"slop={slop}"
        )
    # slop=0 == the exact phrase scorer, bit for bit
    exact = sorted(map(tuple, query_text_index(
        spark, path, qdf, 10, phrase=True).collect()))
    assert sorted(map(tuple, query_text_index(
        spark, path, qdf, 10, phrase=True, slop=0
    ).collect())) == exact
    # the inserted-word doc appears only once slop allows it
    q1 = spark.createDataFrame(
        [(1, "quick brown fox")], "query_id long, text string"
    )
    exact_docs = {r[2] for r in query_text_index(
        spark, path, q1, 10, phrase=True).collect()}
    sloppy_docs = {r[2] for r in query_text_index(
        spark, path, q1, 10, phrase=True, slop=2).collect()}
    assert 8 not in exact_docs and 8 in sloppy_docs
    with pytest.raises(ValueError):
        query_text_index(spark, path, qdf, 5, slop=1)
    with pytest.raises(ValueError):
        query_text_index(
            spark, path, qdf, 5, phrase=True, slop=-1
        )


def test_text_index_sloppy_phrase_lifecycle(spark, tmp_path):
    """Sloppy phrase composes with segments, tombstones, and
    doc_filter exactly as the exact phrase path does: results always
    equal the reference over the VISIBLE corpus."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
        query_text_index,
    )

    base = PHRASE_DOCS
    extra = [(20, "the quick tan brown fox"), (21, "quick brown")]
    ddf = spark.createDataFrame(base, "doc_id long, text string")
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8, positions=True)
    append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    delete_from_text_index(spark, path, [7])
    queries = [(1, "quick brown fox"), (2, "quick brown")]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    visible = [d for d in base + extra if d[0] != 7]
    got = sorted(map(tuple, query_text_index(
        spark, path, qdf, 10, phrase=True, slop=1
    ).collect()))
    # statistics lag physical state pre-compact (Lucene semantics):
    # df/N/avgdl count the tombstoned doc until compaction, so
    # compare MATCHED DOC SETS here and exact scores post-compact
    assert {t[2] for t in got} == {
        t[2] for t in _sloppy_ref(visible, queries, 10, 1)
    }
    assert 7 not in {t[2] for t in got}
    from knn_using_hadoop_spark.operators.retrieval import (
        compact_text_index,
    )

    compact_text_index(spark, path)
    got = sorted(map(tuple, query_text_index(
        spark, path, qdf, 10, phrase=True, slop=1
    ).collect()))
    assert got == _sloppy_ref(visible, queries, 10, 1)
    # doc_filter composes: CORPUS-WIDE statistics, ranking
    # post-filtered and re-ranked (the Lucene filtered-query
    # contract pinned for the non-phrase path too)
    flt = sorted(map(tuple, query_text_index(
        spark, path, qdf, 10, phrase=True, slop=1,
        doc_filter="doc_id % 2 = 0",
    ).collect()))
    full = _sloppy_ref(visible, queries, 100, 1)
    want = []
    for qid in {q for q, _ in queries}:
        kept = [t for t in full if t[0] == qid and t[2] % 2 == 0]
        kept.sort(key=lambda t: (-t[3], t[2]))
        want += [
            (qid, i + 1, t[2], t[3])
            for i, t in enumerate(kept[:10])
        ]
    assert flt == sorted(want)


def _rm3_ref(docs, queries, k, fb_docs, fb_terms, alpha,
             k1=1.2, b=0.75):
    """Pure-Python mirror of bm25_rm3_topk: first pass = the rounded
    BM25 reference; score-normalized feedback; RM1 = sum of
    score_norm * P(t|d); top fb_terms (weight desc, term asc)
    renormalized; w = alpha*MLE(q) + (1-alpha)*rm1; final = weighted
    BM25 with true corpus idf; 6dp, lowest-id ties."""
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    first = _bm25_ref(docs, queries, fb_docs)
    out = []
    for qid, qt in queries:
        fb = [(d, s) for (q, _, d, s) in first if q == qid]
        # RM1 over feedback docs
        rm1: dict = {}
        if fb:
            tot = sum(s for _, s in fb)
            for d, s in fb:
                tk = toks[d]
                for term in set(tk):
                    rm1[term] = rm1.get(term, 0.0) + (
                        s / tot
                    ) * tk.count(term) / len(tk)
        sel = sorted(rm1.items(), key=lambda kv: (-kv[1], kv[0]))[
            :fb_terms
        ]
        w: dict = {}
        if sel:
            st = sum(v for _, v in sel)
            for term, v in sel:
                w[term] = (1.0 - alpha) * v / st
        qtk = qt.split(" ")
        for term in set(qtk):
            w[term] = w.get(term, 0.0) + alpha * qtk.count(
                term
            ) / len(qtk)
        scores: dict = {}
        for d, tk in toks.items():
            s = 0.0
            for term, wt in w.items():
                tf = float(tk.count(term))
                if tf:
                    s += (
                        wt
                        * idf(term)
                        * tf
                        * (k1 + 1.0)
                        / (
                            tf
                            + k1
                            * (1 - b + b * len(tk) / avgdl)
                        )
                    )
            if s > 0:
                scores[d] = round(s, 6)
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out += [
            (qid, i + 1, d, s)
            for i, (d, s) in enumerate(ranked[:k])
        ]
    return sorted(out)


def test_bm25_rm3_matches_python_reference(spark):
    """r9 RM3 pseudo-relevance feedback == the pure-Python mirror
    across alphas and feedback depths; alpha=1 (no expansion)
    preserves the plain BM25 ranking for duplicate-free queries;
    the expansion genuinely recalls docs sharing no query term."""
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_rm3_topk,
    )

    docs, _ = _zipfy_corpus(seed=61)
    queries = [(100, "r0 c1"), (101, "c2 c3 r4"), (102, "r7")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    for fb_d, fb_t, a in (
        (5, 5, 0.5),
        (3, 8, 0.3),
        (10, 10, 0.9),
    ):
        got = sorted(map(tuple, bm25_rm3_topk(
            ddf, qdf, 8, fb_docs=fb_d, fb_terms=fb_t, alpha=a
        ).collect()))
        want = _rm3_ref(docs, queries, 8, fb_d, fb_t, a)
        assert got == want, (fb_d, fb_t, a)
    # alpha=1: same RANKING as plain bm25 (scores scale by 1/|q|)
    plain = sorted(
        (r[0], r[1], r[2])
        for r in bm25_topk(ddf, qdf, 8).collect()
    )
    noexp = sorted(
        (r[0], r[1], r[2])
        for r in bm25_rm3_topk(
            ddf, qdf, 8, alpha=1.0
        ).collect()
    )
    assert noexp == plain
    with pytest.raises(ValueError):
        bm25_rm3_topk(ddf, qdf, 5, alpha=1.5)


def test_bm25_rm3_expands_recall(spark):
    """The point of RM3: a doc sharing ZERO terms with the query
    surfaces because feedback docs bridge the vocabulary. Hand-built
    corpus: query 'jaguar' -> feedback docs pair it with 'feline';
    doc 30 is feline-only and unreachable by plain BM25."""
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_rm3_topk,
    )

    docs = [
        (0, "jaguar feline cat jungle"),
        (1, "jaguar feline predator"),
        (2, "jaguar car engine"),
        (30, "feline predator hunts at night"),
        (31, "car engine parts"),
        (32, "weather today is warm"),
        (33, "cooking pasta with sauce"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "jaguar feline")], "query_id long, text string"
    )
    plain_ids = {r[2] for r in bm25_topk(ddf, qdf, 7).collect()}
    assert 30 in plain_ids  # matches 'feline' directly
    # query with only the bridge-free term
    qdf2 = spark.createDataFrame(
        [(1, "jaguar")], "query_id long, text string"
    )
    plain_ids = {r[2] for r in bm25_topk(ddf, qdf2, 7).collect()}
    assert 30 not in plain_ids
    rm3_ids = {r[2] for r in bm25_rm3_topk(
        ddf, qdf2, 7, fb_docs=3, fb_terms=5, alpha=0.4
    ).collect()}
    assert 30 in rm3_ids  # recalled through the feedback expansion
    assert rm3_ids == {
        t[2] for t in _rm3_ref(docs, [(1, "jaguar")], 7, 3, 5, 0.4)
    }
    # first_pass composition hook: feeding the internal pass's own
    # output must reproduce the default exactly
    fp = bm25_topk(ddf, qdf2, 3)
    a = sorted(map(tuple, bm25_rm3_topk(
        ddf, qdf2, 7, fb_docs=3, fb_terms=5, alpha=0.4,
        first_pass=fp).collect()))
    bdef = sorted(map(tuple, bm25_rm3_topk(
        ddf, qdf2, 7, fb_docs=3, fb_terms=5, alpha=0.4
    ).collect()))
    assert a == bdef


def test_query_text_index_rm3_matches_inline(spark, tmp_path):
    """r9 index-backed RM3 == bm25_rm3_topk over the same corpus,
    bit for bit (fresh store): feedback LMs derive from the stored
    (tf, dl) instead of re-tokenizing, the weighted final pass runs
    through the bucket-pruned match machinery, and both equal the
    pure-Python reference."""
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_rm3_topk,
        build_text_index,
        query_text_index_rm3,
    )

    docs, _ = _zipfy_corpus(seed=67)
    queries = [(100, "r1 c0"), (101, "c4 c5 r2"), (102, "r9")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    for fb_d, fb_t, a in ((5, 5, 0.5), (3, 8, 0.3)):
        idx = sorted(map(tuple, query_text_index_rm3(
            spark, path, qdf, 8,
            fb_docs=fb_d, fb_terms=fb_t, alpha=a,
        ).collect()))
        inline = sorted(map(tuple, bm25_rm3_topk(
            ddf, qdf, 8, fb_docs=fb_d, fb_terms=fb_t, alpha=a
        ).collect()))
        assert idx == inline and idx
        assert idx == _rm3_ref(docs, queries, 8, fb_d, fb_t, a)
        # r9 weighted max-score pruning: forced pruning of the
        # expanded final pass is EXACT on both variants
        for fn, src in (
            (query_text_index_rm3, path),
            (bm25_rm3_topk, ddf),
        ):
            if fn is query_text_index_rm3:
                pr = fn(spark, src, qdf, 8, fb_docs=fb_d,
                        fb_terms=fb_t, alpha=a, prune=True)
            else:
                pr = fn(src, qdf, 8, fb_docs=fb_d,
                        fb_terms=fb_t, alpha=a, prune=True)
            assert sorted(map(tuple, pr.collect())) == idx
    # max_df composes identically on both variants (both passes)
    a = sorted(map(tuple, query_text_index_rm3(
        spark, path, qdf, 8, fb_docs=5, fb_terms=5, alpha=0.5,
        max_df=60,
    ).collect()))
    bq = sorted(map(tuple, bm25_rm3_topk(
        ddf, qdf, 8, fb_docs=5, fb_terms=5, alpha=0.5, max_df=60
    ).collect()))
    assert a == bq and a
    with pytest.raises(ValueError):
        query_text_index_rm3(spark, path, qdf, 5, alpha=-0.1)


def test_query_text_index_rm3_lifecycle(spark, tmp_path):
    """Index-backed RM3 composes with the store lifecycle: segment
    appends keep EXACT parity with the inline path over the grown
    corpus (segment df/stats derive exactly); a delete + compact
    snaps back to exact parity over the visible corpus; doc_filter
    follows the corpus-wide-statistics contract of pass 1 + final
    pass."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        bm25_rm3_topk,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        query_text_index_rm3,
    )

    docs, _ = _zipfy_corpus(seed=71)
    base, extra = docs[:120], docs[120:]
    queries = [(100, "r3 c2"), (101, "c1 c6")]
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(
        spark.createDataFrame(base, "doc_id long, text string"),
        path,
        n_buckets=8,
    )
    append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    got = sorted(map(tuple, query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6, alpha=0.5
    ).collect()))
    want = sorted(map(tuple, bm25_rm3_topk(
        spark.createDataFrame(docs, "doc_id long, text string"),
        qdf, 6, fb_docs=4, fb_terms=6, alpha=0.5,
    ).collect()))
    assert got == want and got

    doomed = [d for d, _ in docs[:10]]
    delete_from_text_index(spark, path, doomed)
    # pre-compact: tombstoned docs may not appear (statistics lag is
    # the documented Lucene semantics, so compare doc sets)
    pre = query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6, alpha=0.5
    ).collect()
    assert not {r[2] for r in pre} & set(doomed)
    compact_text_index(spark, path)
    visible = [d for d in docs if d[0] not in set(doomed)]
    got = sorted(map(tuple, query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6, alpha=0.5
    ).collect()))
    want = sorted(map(tuple, bm25_rm3_topk(
        spark.createDataFrame(
            visible, "doc_id long, text string"
        ),
        qdf, 6, fb_docs=4, fb_terms=6, alpha=0.5,
    ).collect()))
    assert got == want and got


def _highlight_ref(docs, queries, pairs, window):
    """Brute-force best-window reference: anchor at every hit
    position, count query-term occurrences in [p, p+window), max
    hits then earliest start."""
    out = []
    qterms = {qid: set(qt.split(" ")) for qid, qt in queries}
    toks = {d: t.split(" ") for d, t in docs}
    for qid, d in pairs:
        hits = [
            i
            for i, t in enumerate(toks[d])
            if t in qterms[qid]
        ]
        if not hits:
            continue
        best = max(
            hits,
            key=lambda p: (
                sum(1 for q in hits if p <= q < p + window),
                -p,
            ),
        )
        cnt = sum(1 for q in hits if best <= q < best + window)
        out.append((qid, d, best, cnt))
    return sorted(out)


def test_highlight_text_index(spark, tmp_path):
    """r9 best-passage selection == the brute-force reference
    (anchored windows, earliest-start ties), incl. a hand-computed
    case where the dense late cluster beats the early scattered
    hits; composes with query_text_index output and segments;
    raises without a positional store."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        highlight_text_index,
        query_text_index,
    )

    docs = [
        # hits at 0 and 9 (scattered) vs 20,21,23 (dense cluster):
        # window=4 must pick start=20 with 3 hits
        (0, " ".join(
            ["fox"] + ["x"] * 8 + ["dog"] + ["y"] * 10
            + ["fox", "dog", "z", "fox"] + ["w"] * 3
        )),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "nothing relevant here at all"),
    ]
    queries = [(1, "fox dog"), (2, "quick")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8, positions=True)
    rank = query_text_index(spark, path, qdf, 5)
    got = sorted(map(tuple, highlight_text_index(
        spark, path, qdf, rank, window=4
    ).collect()))
    pairs = [(r[0], r[2]) for r in rank.collect()]
    assert got == _highlight_ref(docs, queries, pairs, 4)
    assert (1, 0, 20, 3) in got  # the dense cluster wins
    # segment-appended docs highlight too
    append_text_index(
        spark,
        path,
        spark.createDataFrame(
            [(10, "fox dog fox")], "doc_id long, text string"
        ),
    )
    rank = query_text_index(spark, path, qdf, 5)
    got = sorted(map(tuple, highlight_text_index(
        spark, path, qdf, rank, window=4
    ).collect()))
    assert (1, 10, 0, 3) in got
    # non-positional store raises
    path2 = str(tmp_path / "tidx2")
    build_text_index(ddf, path2, n_buckets=8)
    with pytest.raises(ValueError):
        highlight_text_index(spark, path2, qdf, rank)


def test_text_index_compact_crash_before_stats_heals(
    spark, tmp_path, monkeypatch
):
    """Crash-ordering pin (r9, tightened r10): a compact that dies
    AFTER the postings rewrite but BEFORE the stats rewrite leaves
    segments+tombstones in place (removal is ordered last) AND its
    write-ahead manifest (removed only after every derived store is
    rewritten). The re-run — whose tombstones now match nothing in
    the rewritten base — unions the manifest's buckets into its
    affected sets, so statistics snap to exactly-live via the
    O(delta) manifest path (no all-bucket heal) and queries match
    inline bm25 over the visible corpus."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    docs, _ = _zipfy_corpus(seed=83)
    base, extra = docs[:100], docs[100:]
    path = str(tmp_path / "tidx")
    R.build_text_index(
        spark.createDataFrame(base, "doc_id long, text string"),
        path,
        n_buckets=8,
    )
    R.append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    doomed = [d for d, _ in base[:7]]
    R.delete_from_text_index(spark, path, doomed)

    real = R._rewrite_stats

    def boom(*a, **k):
        raise RuntimeError("injected crash before stats rewrite")

    monkeypatch.setattr(R, "_rewrite_stats", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R, "_rewrite_stats", real)

    # the crash window: postings already rewritten (doomed gone),
    # maintenance state still present, stats stale, and the
    # write-ahead manifest still on disk (r10)
    assert os.path.isdir(f"{path}/postings_seg")
    assert os.path.isdir(f"{path}/tombstones")
    assert os.path.isdir(f"{path}/_compact_manifest")
    stale = R._read_stats(spark, path).collect()[0]
    assert stale["n_docs"] == float(len(base))  # pre-crash partials

    R.compact_text_index(spark, path)  # re-run: manifest heal path
    assert not os.path.isdir(f"{path}/postings_seg")
    assert not os.path.isdir(f"{path}/tombstones")
    assert not os.path.isdir(f"{path}/_compact_manifest")
    visible = [d for d in docs if d[0] not in set(doomed)]
    healed = R._read_stats(spark, path).collect()[0]
    assert healed["n_docs"] == float(len(visible))
    qdf = spark.createDataFrame(
        [(1, "r1 c0 c3")], "query_id long, text string"
    )
    assert sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 6).collect())) == sorted(map(
            tuple, bm25_topk(
                spark.createDataFrame(
                    visible, "doc_id long, text string"
                ), qdf, 6).collect()))


# ---------------------------------------------------------------
# r10: doc-keyed forward store, write-ahead compact manifest,
# block-max bounds
# ---------------------------------------------------------------


def _docvec_ref(docs, ids):
    """(doc_id, term, tf, dl) rows a forward fetch must return."""
    out = []
    for d, t in docs:
        if d not in ids:
            continue
        toks = t.split(" ")
        for term in set(toks):
            out.append(
                (d, term, float(toks.count(term)), float(len(toks)))
            )
    return sorted(out)


def test_doc_vectors_api(spark, tmp_path):
    """r10: ``doc_vectors`` returns the exact stored term vectors
    for a bounded id set — base rows from the dbucket-pruned
    forward store (partition pruning pinned via the files the scan
    actually reads), segment rows unioned in, tombstoned ids
    masked."""
    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
        doc_vectors,
    )

    path = str(tmp_path / "tidx")
    build_text_index(_spark_docs(spark), path, n_buckets=16)
    got = sorted(
        map(tuple, doc_vectors(spark, path, [0, 3]).collect())
    )
    assert got == _docvec_ref(DOCS, {0, 3})

    # partition pruning: the fetch's docvecs scan must carry the
    # static dbucket filter for EXACTLY the two ids' partitions
    # (PartitionFilters in the executed plan — the same pin
    # technique as test_text_index_prunes_to_probed_buckets)
    import re

    want_db = {
        r["_db"]
        for r in spark.createDataFrame(
            [(0,), (3,)], "doc_id long"
        )
        .select(
            F.pmod(F.xxhash64("doc_id"), F.lit(16))
            .cast("int")
            .alias("_db")
        )
        .collect()
    }
    out = doc_vectors(spark, path, [0, 3])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    pfs = [
        pf
        for pf in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "dbucket" in pf
    ]
    assert pfs, plan
    assert any(
        all(str(b) in pf for b in want_db) for pf in pfs
    ), (pfs, want_db)

    # segment rows serve immediately (no docvecs segment needed —
    # segments are O(delta) postings scans)
    append_text_index(
        spark,
        path,
        spark.createDataFrame(
            [(50, "zebra zebra fox")], "doc_id long, text string"
        ),
    )
    got = sorted(
        map(tuple, doc_vectors(spark, path, [50, 3]).collect())
    )
    assert got == _docvec_ref(
        list(DOCS) + [(50, "zebra zebra fox")], {50, 3}
    )

    # a deleted doc has no term vector
    delete_from_text_index(spark, path, [3])
    got = sorted(
        map(tuple, doc_vectors(spark, path, [50, 3]).collect())
    )
    assert got == _docvec_ref(
        list(DOCS) + [(50, "zebra zebra fox")], {50}
    )


def test_rm3_feedback_fetch_is_partition_pruned(spark, tmp_path):
    """r10 (the r9 verdict's single ``weak``): RM3's feedback LM
    fetch must read only the feedback ids' dbucket partitions of
    the forward store — never the term-bucketed postings store
    (O(fb_docs), not O(store)). Pinned on the same helper the
    serving path calls, plus end-to-end parity of the served RM3
    (already exercised against inline in the r9 pins, which now
    route through docvecs)."""
    from knn_using_hadoop_spark.operators.retrieval import (
        _fetch_doc_vectors,
        build_text_index,
    )

    docs, _ = _zipfy_corpus(seed=97)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=16)
    ids = spark.createDataFrame([(5,), (9,)], "doc_id long")
    rows = _fetch_doc_vectors(spark, path, ids, None)
    # the rows themselves are the exact stored vectors
    assert sorted(map(tuple, rows.collect())) == _docvec_ref(
        docs, {5, 9}
    )
    # the ONLY file scan in the plan is the docvecs store (so the
    # term-bucketed postings store is never read — O(fb_docs), not
    # O(store)), and it carries the static dbucket partition filter
    # for exactly the two ids' buckets. (Scan locations truncate in
    # the plan string, so the pin counts FileScans and checks the
    # dbucket filter rather than grepping paths.)
    import re

    plan = (
        rows._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("FileScan") == 1, plan
    pfs = [
        pf
        for pf in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "dbucket" in pf
    ]
    want_db = {
        r["_db"]
        for r in ids.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(16))
            .cast("int")
            .alias("_db")
        ).collect()
    }
    assert pfs and any(
        all(str(b) in pf for b in want_db) for pf in pfs
    ), (pfs, want_db)


def test_compact_crash_manifest_scopes_heal(spark, tmp_path,
                                            monkeypatch):
    """r10: a tombstone-only compact that crashes between the
    postings rewrite and the stats rewrite heals via the manifest
    with ZERO unaffected-bucket rewrites — the re-run's stats/terms
    rewrites touch exactly the crashed run's affected buckets
    (byte-identity on every other bucket), closing the r9 verdict's
    'conservative all-bucket heal' cost."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=16)
    # doc 3's terms: zebra stripes are black and white (6 buckets
    # of 16 at most)
    aff_b = {
        r["b"]
        for r in spark.createDataFrame(
            [(t,) for t in
             "zebra stripes are black and white".split()],
            "term string",
        )
        .select(
            F.pmod(F.xxhash64("term"), F.lit(16))
            .cast("int")
            .alias("b")
        )
        .collect()
    }
    assert len(aff_b) < 16, "fixture degenerate: all buckets hit"
    R.delete_from_text_index(spark, path, [3])

    real = R._rewrite_stats

    def boom(*a, **k):
        raise RuntimeError("injected crash before stats rewrite")

    monkeypatch.setattr(R, "_rewrite_stats", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R, "_rewrite_stats", real)
    assert os.path.isdir(f"{path}/_compact_manifest")

    s_stale = _bucket_files(f"{path}/stats")
    t_stale = _bucket_files(f"{path}/terms")
    R.compact_text_index(spark, path)
    assert not os.path.isdir(f"{path}/_compact_manifest")
    s_new = _bucket_files(f"{path}/stats")
    t_new = _bucket_files(f"{path}/terms")
    for d in s_stale:
        if int(d.split("=")[1]) not in aff_b:
            assert s_new.get(d) == s_stale[d], (
                f"unaffected stats {d} rewritten by the heal"
            )
    for d in t_stale:
        if int(d.split("=")[1]) not in aff_b:
            assert t_new.get(d) == t_stale[d], (
                f"unaffected terms {d} rewritten by the heal"
            )
    healed = R._read_stats(spark, path).collect()[0]
    assert healed["n_docs"] == float(len(DOCS) - 1)


def test_compact_crash_mixed_tombstones_heals_exactly(
    spark, tmp_path, monkeypatch
):
    """r10 (r9 ADVICE, medium): tombstones mixing BASE-doc and
    SEGMENT-doc deletes, crashing after the postings rewrite but
    before the stats rewrite. Under the r9 any-hit heal predicate
    the re-run saw the still-present segment rows, set tomb_hit,
    and skipped the heal — the base-deleted docs' stats partials
    kept counting them forever. The manifest heals exactly: n_docs
    and every BM25 score snap to the visible corpus."""
    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=8)
    extra = [(100, "quick zebra runs"), (101, "warm mat tea")]
    R.append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    # base doc 2 + segment doc 100: the mixed set
    R.delete_from_text_index(spark, path, [2, 100])

    real = R._rewrite_stats

    def boom(*a, **k):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(R, "_rewrite_stats", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R, "_rewrite_stats", real)

    R.compact_text_index(spark, path)
    visible = [d for d in list(DOCS) + extra if d[0] not in (2, 100)]
    healed = R._read_stats(spark, path).collect()[0]
    assert healed["n_docs"] == float(len(visible))
    qdf = spark.createDataFrame(
        [(1, "quick fox"), (2, "warm tea")],
        "query_id long, text string",
    )
    assert sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5).collect())) == sorted(map(
            tuple, bm25_topk(
                spark.createDataFrame(
                    visible, "doc_id long, text string"
                ), qdf, 5).collect()))


def test_compact_crash_before_terms_heals_df(spark, tmp_path,
                                             monkeypatch):
    """r10 (r9 ADVICE, low): a compact that dies between the
    postings rewrite and the TERMS rewrite must not leave stale
    df/max_tf/min_dl behind — the manifest re-run rewrites the
    terms (and blocks, docvecs, stats) for the affected buckets, so
    every derived store equals a from-scratch recompute."""
    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=8)
    R.delete_from_text_index(spark, path, [0, 4])

    real = R._rewrite_terms

    def boom(*a, **k):
        raise RuntimeError("injected crash before terms rewrite")

    monkeypatch.setattr(R, "_rewrite_terms", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R, "_rewrite_terms", real)

    R.compact_text_index(spark, path)
    post = spark.read.parquet(f"{path}/postings")
    want_terms = sorted(
        map(
            tuple,
            post.filter(F.col("tf") > 0)
            .groupBy("bucket", "term")
            .agg(
                F.count(F.lit(1)).cast("double").alias("df"),
                F.max("tf").alias("max_tf"),
                F.min("dl").alias("min_dl"),
            )
            .collect(),
        )
    )
    got_terms = sorted(
        map(
            tuple,
            spark.read.parquet(f"{path}/terms")
            .select("bucket", "term", "df", "max_tf", "min_dl")
            .collect(),
        )
    )
    assert got_terms == want_terms
    # forward store consistent too: no rows for the deleted ids
    dv = spark.read.parquet(f"{path}/docvecs")
    assert dv.filter(F.col("doc_id").isin([0, 4])).count() == 0
    visible = [d for d in DOCS if d[0] not in (0, 4)]
    healed = R._read_stats(spark, path).collect()[0]
    assert healed["n_docs"] == float(len(visible))


def test_block_bounds_store_and_refinement(spark, tmp_path):
    """r10 block-max: the ``blocks`` store holds the exact
    per-(term, doc-hash-block) max_tf/min_dl; the per-(query,
    block) essential partition yields a candidate set that is a
    SUBSET of the global partition's (strictly smaller on a corpus
    where one block carries an outlier tf), and the pruned ranking
    stays bit-identical to unpruned/inline. Legacy stores (no
    blocks / no n_blocks in meta) fall back to the global path."""
    import shutil

    from knn_using_hadoop_spark.operators import retrieval as R

    # 120 ~12-token docs. 'rr' (df=4) sets theta via the seed pass;
    # 'm' (df=13, just above the 10% theta-seed cap) matches 13
    # docs. Doc 7 carries an outlier tf=31 burst of 'm': the GLOBAL
    # ub(m) saturates on that burst and crosses theta, so the
    # global partition makes every m-matcher a candidate — but only
    # doc 7's block sees that bound locally; the per-block
    # partition drops m everywhere else and the candidate set
    # shrinks to the rr docs plus doc 7's block's m-matchers.
    docs = []
    for d in range(120):
        words = ["f%d" % (d % 7)] * 12
        if d in (1, 2, 3, 5):
            words[0] = "rr"
        if d % 10 == 4 or d == 7:  # 12 docs + doc 7 -> df(m)=13
            words[1] = "m"
        if d == 7:
            words += ["m"] * 30
        docs.append((d, " ".join(words)))
    queries = [(0, "rr m")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    R.build_text_index(ddf, path, n_buckets=8, n_blocks=4)

    # store contents == exact per-(term, blk) bounds of the corpus
    blk_of = {
        r["doc_id"]: r["blk"]
        for r in ddf.select(
            "doc_id",
            F.pmod(F.xxhash64("doc_id"), F.lit(4))
            .cast("int")
            .alias("blk"),
        ).collect()
    }
    want: dict = {}
    for d, t in docs:
        toks = t.split(" ")
        for term in set(toks):
            key = (term, blk_of[d])
            tf, dl = float(toks.count(term)), float(len(toks))
            mx, mn = want.get(key, (0.0, float("inf")))
            want[key] = (max(mx, tf), min(mn, dl))
    got = {
        (r["term"], r["blk"]): (r["max_tf"], r["min_dl"])
        for r in spark.read.parquet(f"{path}/blocks").collect()
    }
    assert got == want

    # candidate refinement: block candidates ⊂ global candidates
    qset = qdf.select(
        F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    posts, dfreq, stats, tb, tbb, n_blocks = R._index_match(
        spark, path, qset, with_bounds=True
    )
    assert tbb is not None and n_blocks == 4
    pair_src = (
        qdf.select(
            F.col("query_id"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .distinct()
        .join(dfreq, "term")
    )
    cand_global = set(
        map(
            tuple,
            R._maxscore_candidates(
                posts, pair_src, stats, tb, 3, 1.2, 0.75, 8
            ).collect(),
        )
    )
    cand_block = set(
        map(
            tuple,
            R._maxscore_candidates(
                posts,
                pair_src,
                stats,
                tb,
                3,
                1.2,
                0.75,
                8,
                tbb=tbb,
                n_blocks=n_blocks,
            ).collect(),
        )
    )
    assert cand_block <= cand_global
    assert len(cand_block) < len(cand_global), (
        "block bounds refined nothing on the outlier-tf corpus"
    )

    # exactness: pruned == unpruned == inline, block path active
    want_rank = sorted(map(tuple, bm25_topk(ddf, qdf, 5).collect()))
    assert sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5, prune=True).collect())) == want_rank
    assert sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5, prune=False).collect())) == want_rank

    # mid-crash shape: meta records blocks but the store is gone —
    # query falls back to the global path (still exact), compact
    # rebuilds the store wholesale
    shutil.rmtree(f"{path}/blocks")
    assert sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5, prune=True).collect())) == want_rank
    R.append_text_index(
        spark,
        path,
        spark.createDataFrame(
            [(500, "c0 rr")], "doc_id long, text string"
        ),
    )
    R.compact_text_index(spark, path)
    rebuilt = spark.read.parquet(f"{path}/blocks")
    assert rebuilt.filter(F.col("term") == "rr").count() > 0
    # legacy meta (pre-r10, no n_blocks): global path, still exact
    legacy = str(tmp_path / "tidx_legacy")
    R.build_text_index(ddf, legacy, n_buckets=8)
    shutil.rmtree(f"{legacy}/blocks")
    spark.createDataFrame(
        [(8, [], False)],
        "n_buckets int, attribute_cols array<string>, "
        "positions boolean",
    ).write.mode("overwrite").parquet(f"{legacy}/meta")
    assert sorted(map(tuple, R.query_text_index(
        spark, legacy, qdf, 5, prune=True).collect())) == want_rank


def test_rm3_score_col_validation(spark):
    """r10 (r9 ADVICE, low): the feedback-score column is never
    inferred positionally — a first_pass with a trailing extra
    column still reads the known score name; ambiguous/unknown
    layouts raise; explicit score_col wins; non-numeric raises."""
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_rm3_topk,
    )

    docs, _ = _zipfy_corpus(seed=13)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "r1 c0 c2")], "query_id long, text string"
    )
    base = bm25_rm3_topk(ddf, qdf, 5, fb_docs=4, fb_terms=5)
    want = sorted(map(tuple, base.collect()))

    fp = bm25_topk(ddf, qdf, 4)
    # trailing junk column after the score: known-name lookup must
    # still pick 'bm25' (the r9 positional code fed '_junk' into
    # the RM1 weights silently)
    fp_junk = fp.withColumn("_junk", F.lit("x"))
    got = sorted(map(tuple, bm25_rm3_topk(
        ddf, qdf, 5, fb_docs=4, fb_terms=5, first_pass=fp_junk
    ).collect()))
    assert got == want

    # no known score name -> explicit score_col required
    fp_odd = fp.withColumnRenamed("bm25", "my_score")
    with pytest.raises(ValueError, match="score_col"):
        bm25_rm3_topk(
            ddf, qdf, 5, fb_docs=4, fb_terms=5, first_pass=fp_odd
        )
    got = sorted(map(tuple, bm25_rm3_topk(
        ddf, qdf, 5, fb_docs=4, fb_terms=5, first_pass=fp_odd,
        score_col="my_score",
    ).collect()))
    assert got == want

    # explicit but absent / non-numeric raise
    with pytest.raises(ValueError, match="not in"):
        bm25_rm3_topk(
            ddf, qdf, 5, first_pass=fp, score_col="nope"
        )
    fp_str = fp.withColumn("bm25", F.col("bm25").cast("string"))
    with pytest.raises(ValueError, match="not numeric"):
        bm25_rm3_topk(ddf, qdf, 5, first_pass=fp_str)


def _mlt_ref(docs, src_ids, k, mqt=25, min_tf=1, min_df=2,
             max_df=None, k1=1.2, b=0.75):
    """Pure-Python MoreLikeThis reference: tf*idf term selection
    (6dp-rounded weights, weight desc / term asc, zero-weight
    dropped), weighted BM25 over the survivors, self excluded,
    6dp scores, lowest-id ties."""
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    out = []
    for q in src_ids:
        if q not in toks:
            continue
        cand = []
        for term in set(toks[q]):
            tf = toks[q].count(term)
            if tf < min_tf or df.get(term, 0) < min_df:
                continue
            if max_df is not None and df[term] > max_df:
                continue
            w0 = round(tf * idf(term), 6)
            if w0 > 0:
                cand.append((term, w0))
        cand.sort(key=lambda x: (-x[1], x[0]))
        sel = cand[:mqt]
        scores = {}
        for d, t in toks.items():
            if d == q:
                continue
            s, matched = 0.0, False
            for term, w0 in sel:
                tf = float(t.count(term))
                if tf == 0.0:
                    continue
                matched = True
                s += (
                    w0
                    * idf(term)
                    * tf
                    * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * len(t) / avgdl))
                )
            if matched:
                scores[d] = round(s, 6)
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )[:k]
        out += [(q, i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    return sorted(out)


def test_more_like_this_matches_reference(spark, tmp_path):
    """r10 MoreLikeThis == the pure-Python reference: stored-term-
    vector query terms, tf*idf selection with min_tf/min_df/max_df
    gates and the max_query_terms cut, weighted BM25, self
    excluded; forced weighted pruning (the k+1 trick keeps theta
    valid with self in the ranking) is bit-identical; absent
    source ids yield no rows."""
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        more_like_this,
    )

    docs, _ = _zipfy_corpus(seed=101)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "tidx")
    build_text_index(ddf, path, n_buckets=8)
    src = [0, 7, 33, 999_999]  # last one absent from the store
    for kw in (
        {},
        {"max_query_terms": 4},
        {"min_df": 3, "max_df": 140},
        {"min_tf": 2},
    ):
        got = sorted(map(tuple, more_like_this(
            spark, path, src, 6, **kw).collect()))
        want = _mlt_ref(docs, src, 6, mqt=kw.get(
            "max_query_terms", 25), min_tf=kw.get("min_tf", 1),
            min_df=kw.get("min_df", 2), max_df=kw.get("max_df"))
        assert got == want
        assert got or kw.get("max_df"), kw  # gated case may empty
        assert not any(r[0] == 999_999 for r in got)
        assert not any(r[0] == r[2] for r in got)  # self excluded
        pruned = sorted(map(tuple, more_like_this(
            spark, path, src, 6, prune=True, **kw).collect()))
        assert pruned == want


def test_more_like_this_lifecycle(spark, tmp_path):
    """MLT composes with the store lifecycle: segment-appended docs
    both serve as sources (their vectors come from the segment
    postings) and appear as results; deleting a doc removes it from
    sources AND results; post-compact equals the reference over the
    visible corpus."""
    from knn_using_hadoop_spark.operators import retrieval as R

    docs, _ = _zipfy_corpus(seed=103)
    base, extra = docs[:120], docs[120:]
    path = str(tmp_path / "tidx")
    R.build_text_index(
        spark.createDataFrame(base, "doc_id long, text string"),
        path,
        n_buckets=8,
    )
    R.append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    src = [0, extra[0][0]]
    got = sorted(map(tuple, R.more_like_this(
        spark, path, src, 5).collect()))
    assert got == _mlt_ref(docs, src, 5) and got

    doomed = [docs[3][0], extra[1][0]]
    R.delete_from_text_index(spark, path, doomed)
    R.compact_text_index(spark, path)
    visible = [d for d in docs if d[0] not in set(doomed)]
    got = sorted(map(tuple, R.more_like_this(
        spark, path, src + [doomed[0]], 5).collect()))
    want = _mlt_ref(visible, src, 5)
    assert got == want and got
    assert not any(r[0] == doomed[0] for r in got)


def test_docvecs_legacy_fallback_and_migration(spark, tmp_path):
    """r10: a pre-docvecs store (emulated by deleting the forward
    store) still serves doc-keyed reads — ``doc_vectors`` and RM3's
    feedback fetch fall back to the postings scan with identical
    results — and the store's first compact migrates the forward
    store wholesale, after which the pruned fetch returns the same
    rows again."""
    import os
    import shutil

    from knn_using_hadoop_spark.operators import retrieval as R

    docs, _ = _zipfy_corpus(seed=107)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(1, "r2 c1 c4"), (2, "r7 c0")], "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    R.build_text_index(ddf, path, n_buckets=8)
    want_tv = sorted(map(tuple, R.doc_vectors(
        spark, path, [3, 11]).collect()))
    want_rm3 = sorted(map(tuple, R.query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6).collect()))
    assert want_tv and want_rm3

    shutil.rmtree(f"{path}/docvecs")  # emulate a pre-r10 store
    assert not R._has_docvecs(spark, path)
    assert sorted(map(tuple, R.doc_vectors(
        spark, path, [3, 11]).collect())) == want_tv
    assert sorted(map(tuple, R.query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6
    ).collect())) == want_rm3

    # first compact migrates the forward store wholesale
    extra = [(900, "c0 r3 c2")]
    R.append_text_index(
        spark,
        path,
        spark.createDataFrame(extra, "doc_id long, text string"),
    )
    R.compact_text_index(spark, path)
    assert R._has_docvecs(spark, path)
    assert os.path.isdir(f"{path}/docvecs")
    got_tv = sorted(map(tuple, R.doc_vectors(
        spark, path, [3, 11, 900]).collect()))
    assert got_tv == _docvec_ref(docs + extra, {3, 11, 900})
    # post-migration RM3 equals inline over the grown corpus
    got = sorted(map(tuple, R.query_text_index_rm3(
        spark, path, qdf, 6, fb_docs=4, fb_terms=6).collect()))
    want = sorted(map(tuple, R.bm25_rm3_topk(
        spark.createDataFrame(
            docs + extra, "doc_id long, text string"
        ), qdf, 6, fb_docs=4, fb_terms=6,
    ).collect()))
    assert got == want and got


# ---------------------------------------------------------------
# r11: within-bucket reads are term/doc-selective (the r10 verdict's
# top ask — scan cost proportional to the posting list, not the
# 1/n_buckets corpus shard)
# ---------------------------------------------------------------


def _rg_stats(path_glob, col):
    """Per-file parquet row-group (min, max) stats for ``col`` —
    the footer metadata the reader's row-group skipping runs on."""
    import glob

    import pyarrow.parquet as pq

    out = {}
    for f in sorted(glob.glob(path_glob)):
        pf = pq.ParquetFile(f)
        md = pf.metadata
        idx = {
            md.row_group(0).column(j).path_in_schema: j
            for j in range(md.row_group(0).num_columns)
        }[col]
        out[f] = [
            (
                md.row_group(i).column(idx).statistics.min,
                md.row_group(i).column(idx).statistics.max,
            )
            for i in range(md.num_row_groups)
        ]
    return out


def _selective_corpus(seed=23, n_docs=1200, vocab=300):
    import random

    rng = random.Random(seed)
    words = [f"w{i:03d}" for i in range(vocab)]
    docs = [
        (
            d,
            " ".join(
                rng.choice(words)
                for _ in range(rng.randint(8, 14))
            ),
        )
        for d in range(n_docs)
    ]
    return docs, words


def test_text_index_reads_are_term_selective(spark, tmp_path):
    """r11 pin (closing the r10 verdict's one ``weak``): a text
    index's within-bucket reads must cost the matched posting
    lists, not the probed bucket. Three pinned surfaces on a
    multi-row-group store (small parquet.block.size at build):

    1. LAYOUT — every postings file is (term, doc_id)-sorted: the
       per-row-group footer (min, max) stats on ``term`` are
       non-overlapping ascending runs, so a pushed term predicate
       can skip every non-matching group.
    2. SKIPPING — for a single query term the matching row groups
       (footer ranges containing the term, the reader's own
       skip criterion) are a minority of the bucket's row groups:
       the read is list-sized where the pre-r11 layout (unsorted
       files, no pushed predicate) always cost the whole bucket.
    3. PLAN — the query's postings scan carries the bounded term
       set in PushedFilters (the predicate reaches parquet; the
       broadcast term join alone left the scan predicate-free).
       Same for the docvecs fetch on doc_id.

    Ranking parity vs the unindexed ``bm25_topk`` stays bit-exact,
    and a delete + compact (the dynamic-overwrite rewrite path)
    preserves the sorted layout.
    """
    import re

    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
        compact_text_index,
        delete_from_text_index,
        doc_vectors,
        query_text_index,
    )

    docs, _ = _selective_corpus()
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "tsel")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size", None)
    hconf.set("parquet.block.size", "2048")
    try:
        build_text_index(ddf, path, n_buckets=2)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    # ---- 1. layout: term-sorted files, disjoint ascending runs
    stats = _rg_stats(f"{path}/postings/bucket=0/*.parquet", "term")
    assert stats, "no postings files written"
    total_rgs = sum(len(v) for v in stats.values())
    assert total_rgs >= 8, (
        "need multi-row-group files to pin skipping",
        total_rgs,
    )
    for f, rgs in stats.items():
        for i, (lo, hi) in enumerate(rgs):
            assert lo <= hi, (f, i)
            if i:
                assert rgs[i - 1][1] <= lo, (
                    "row-group term runs overlap — file not "
                    "term-sorted",
                    f,
                    rgs,
                )

    # ---- 2. skipping: a single term's matching row groups are a
    # minority (this is exactly the reader's skip criterion)
    # pick a term that actually lives in bucket 0
    from pyspark.sql import functions as _F

    b0_terms = {
        r["term"]
        for r in spark.read.parquet(f"{path}/terms")
        .filter(_F.col("bucket") == 0)
        .select("term")
        .collect()
    }
    term = sorted(b0_terms)[len(b0_terms) // 2]
    matching = sum(
        1
        for rgs in stats.values()
        for (lo, hi) in rgs
        if lo <= term <= hi
    )
    assert matching >= 1
    assert matching <= total_rgs / 2, (
        "single-term read touches most of the bucket",
        matching,
        total_rgs,
    )

    # ---- 3. plan: pushed term predicate on the postings scan
    qdf = spark.createDataFrame(
        [(1, f"{term} {sorted(b0_terms)[0]}")],
        "query_id long, text string",
    )
    res = query_text_index(spark, path, qdf, 5)
    plan = (
        res._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(
        ("In(term" in pf) or ("EqualTo(term" in pf) for pf in pushed
    ), plan

    # parity with the unindexed scorer (the push is redundant with
    # the broadcast term join — results bit-identical)
    queries = [(1, f"{term} {sorted(b0_terms)[0]}")]
    want = _bm25_ref(docs, queries, 5)
    got = sorted(map(tuple, res.collect()))
    assert got == want

    # ---- docvecs twin: doc-sorted files + pushed id predicate
    dstats = _rg_stats(
        f"{path}/docvecs/dbucket=0/*.parquet", "doc_id"
    )
    assert dstats
    for f, rgs in dstats.items():
        for i, (lo, hi) in enumerate(rgs):
            assert lo <= hi, (f, i)
            if i:
                assert rgs[i - 1][1] <= lo, (
                    "docvecs file not doc-sorted",
                    f,
                    rgs,
                )
    dv = doc_vectors(spark, path, [7, 21])
    dplan = (
        dv._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    dpushed = re.findall(r"PushedFilters: \[([^\]]*)\]", dplan)
    assert any(
        ("In(doc_id" in pf) or ("EqualTo(doc_id" in pf)
        for pf in dpushed
    ), dplan

    # ---- compact preserves the sorted layout on rewritten buckets
    delete_from_text_index(spark, path, [3])
    compact_text_index(spark, path)
    stats2 = _rg_stats(
        f"{path}/postings/bucket=0/*.parquet", "term"
    )
    assert stats2
    for f, rgs in stats2.items():
        for i, (lo, hi) in enumerate(rgs):
            if i:
                assert rgs[i - 1][1] <= lo, (
                    "compact rewrite lost the term sort",
                    f,
                    rgs,
                )


def test_compact_manifest_torn_dir_heals_defensively(
    spark, tmp_path
):
    """r11 (r10 ADVICE #2, first half): a manifest directory left
    TORN by a legacy in-place write crash (only ``_temporary``
    staging, no committed part files) must not brick later compacts
    — and because the lost manifest could have named any bucket,
    the re-run falls back to a defensive ALL-bucket heal: a
    hand-staled terms store snaps back to the from-scratch
    recompute and the debris is cleared."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=8)
    # stale the terms store by hand (df off by +5 everywhere) —
    # the damage a lost recovery set would have left behind
    bogus = (
        spark.read.parquet(f"{path}/terms")
        .withColumn("df", F.col("df") + 5.0)
        .localCheckpoint(eager=True)
    )
    bogus.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/terms"
    )
    # torn manifest: _temporary only, no committed content — the
    # pre-r11 reader threw here, bricking every subsequent compact
    os.makedirs(f"{path}/_compact_manifest/_temporary")

    R.compact_text_index(spark, path)

    assert not os.path.isdir(f"{path}/_compact_manifest")
    post = spark.read.parquet(f"{path}/postings")
    want = sorted(
        map(
            tuple,
            post.filter(F.col("tf") > 0)
            .groupBy("bucket", "term")
            .agg(F.count(F.lit(1)).cast("double").alias("df"))
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(f"{path}/terms")
            .select("bucket", "term", "df")
            .collect(),
        )
    )
    assert got == want, "torn-manifest heal left stale df behind"


def test_compact_manifest_swap_never_loses_recovery_set(
    spark, tmp_path, monkeypatch
):
    """r11 (r10 ADVICE #2, second half): the manifest is replaced
    by write-tmp-then-RENAME, so a crash inside a RECOVERY
    compact's own manifest write can no longer lose the prior
    crashed run's bucket set. Construction: crash 1 dies after the
    postings rewrite (manifest M1 is then the ONLY record of the
    stale buckets — the tombstone matches nothing anymore); a
    second delete's compact then dies between the manifest remove
    and the rename (the exact window the in-place overwrite made
    lossy). The committed tmp carries M1 ∪ M2; the re-run heals
    everything: stats, terms and query parity all snap to the
    visible corpus."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=8)

    # crash 1: after postings rewrite, before stats — manifest M1
    # becomes the only record of doc 3's affected buckets
    R.delete_from_text_index(spark, path, [3])
    real_stats = R._rewrite_stats

    def boom_stats(*a, **k):
        raise RuntimeError("crash 1: before stats rewrite")

    monkeypatch.setattr(R, "_rewrite_stats", boom_stats)
    with pytest.raises(RuntimeError, match="crash 1"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R, "_rewrite_stats", real_stats)

    # crash 2: a new delete's compact dies between the manifest
    # remove and the rename — mdir is gone, the committed tmp holds
    # M1 ∪ M2 (the writer unions the prior manifest in)
    R.delete_from_text_index(spark, path, [5])
    real_rename = R.store.rename_dir

    def boom_rename(*a, **k):
        raise RuntimeError("crash 2: manifest swap window")

    monkeypatch.setattr(R.store, "rename_dir", boom_rename)
    with pytest.raises(RuntimeError, match="crash 2"):
        R.compact_text_index(spark, path)
    monkeypatch.setattr(R.store, "rename_dir", real_rename)
    assert not os.path.isdir(f"{path}/_compact_manifest")
    man_b, man_d, damaged = R._read_manifest(spark, path)
    assert man_b and not damaged, (
        "committed tmp must read as the recovery set"
    )

    # the re-run heals M1's buckets too (n_docs counts BOTH deletes
    # out), and ranking parity holds against the visible corpus
    R.compact_text_index(spark, path)
    assert not os.path.isdir(f"{path}/_compact_manifest_tmp")
    visible = [d for d in DOCS if d[0] not in (3, 5)]
    healed = R._read_stats(spark, path).collect()[0]
    assert healed["n_docs"] == float(len(visible))
    qdf = spark.createDataFrame(
        [(1, "zebra runs"), (2, "warm lazy tea")],
        "query_id long, text string",
    )
    assert sorted(
        map(
            tuple,
            R.query_text_index(spark, path, qdf, 5).collect(),
        )
    ) == sorted(
        map(
            tuple,
            bm25_topk(
                spark.createDataFrame(
                    visible, "doc_id long, text string"
                ),
                qdf,
                5,
            ).collect(),
        )
    )


def test_manifest_write_crash_keeps_prior_manifest(
    spark, tmp_path
):
    """r11: a crash INSIDE the tmp parquet write (tmp torn, prior
    manifest committed) reads as the prior manifest, not damaged —
    the swap's first window is loss-free too."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    path = str(tmp_path / "tidx")
    R.build_text_index(_spark_docs(spark), path, n_buckets=8)
    R._write_manifest(spark, path, {1, 4}, {2})
    # torn tmp beside the committed manifest
    os.makedirs(f"{path}/_compact_manifest_tmp/_temporary")
    man_b, man_d, damaged = R._read_manifest(spark, path)
    assert man_b == {1, 4} and man_d == {2} and not damaged
    # a successful swap replaces it and clears the debris
    R._write_manifest(spark, path, {1, 4, 7}, {2})
    man_b, man_d, damaged = R._read_manifest(spark, path)
    assert man_b == {1, 4, 7} and man_d == {2} and not damaged
    assert not os.path.isdir(f"{path}/_compact_manifest_tmp")
    R._clear_manifest(spark, path)
    assert R._read_manifest(spark, path) == (set(), set(), False)


def test_compact_retrofit_blocks_on_legacy_store(spark, tmp_path):
    """r11 (r10 verdict #4): a legacy store (no ``blocks`` store,
    no ``n_blocks`` in meta — the one store a pre-r10 index could
    never gain) opts into block bounds at compact via
    ``retrofit_blocks=N``: the blocks store appears with exactly
    the from-scratch per-(term, blk) bounds, meta records N through
    the crash-safe swap, weighted/pruned serving over the
    retrofitted store stays bit-identical to unpruned, and a
    crashed meta swap (committed meta_tmp, meta gone) still serves
    queries and heals at the next compact. Retrofitting a store
    that already has blocks raises."""
    import os

    from knn_using_hadoop_spark.operators import retrieval as R

    docs, queries = _zipfy_corpus(seed=31)
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(
        queries, "query_id long, text string"
    )
    path = str(tmp_path / "tidx")
    R.build_text_index(ddf, path, n_buckets=8)

    # ---- forge the legacy layout: drop blocks, strip n_blocks
    import shutil

    shutil.rmtree(f"{path}/blocks")
    md = R._read_meta(spark, path)
    spark.createDataFrame(
        [(int(md["n_buckets"]), [], False)],
        "n_buckets int, attribute_cols array<string>, "
        "positions boolean",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    assert R._read_meta(spark, path).get("n_blocks") is None

    # ---- retrofit at compact (a no-work compact: no seg/tomb)
    R.compact_text_index(spark, path, retrofit_blocks=4)
    assert R._read_meta(spark, path)["n_blocks"] == 4
    want_blocks = sorted(
        map(
            tuple,
            spark.read.parquet(f"{path}/postings")
            .filter(F.col("tf") > 0)
            .groupBy(
                "bucket",
                "term",
                F.pmod(F.xxhash64("doc_id"), F.lit(4))
                .cast("int")
                .alias("blk"),
            )
            .agg(
                F.max("tf").alias("max_tf"),
                F.min("dl").alias("min_dl"),
            )
            .collect(),
        )
    )
    got_blocks = sorted(
        map(
            tuple,
            spark.read.parquet(f"{path}/blocks")
            .select("bucket", "term", "blk", "max_tf", "min_dl")
            .collect(),
        )
    )
    assert got_blocks == want_blocks

    # pruned serving on the retrofitted store is exact (weighted
    # RM3 takes the block path; plain takes term-granularity)
    p = sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5, prune=True).collect()))
    u = sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5, prune=False).collect()))
    assert p == u and p
    pr = sorted(map(tuple, R.query_text_index_rm3(
        spark, path, qdf, 5, fb_docs=3, fb_terms=5,
        prune=True).collect()))
    ur = sorted(map(tuple, R.query_text_index_rm3(
        spark, path, qdf, 5, fb_docs=3, fb_terms=5,
        prune=False).collect()))
    assert pr == ur and pr

    # double-retrofit raises
    with pytest.raises(ValueError, match="already has block"):
        R.compact_text_index(spark, path, retrofit_blocks=4)

    # ---- crashed meta swap: committed tmp, meta gone — queries
    # still read the store, and the next compact re-swaps it
    os.rename(f"{path}/meta", f"{path}/meta_tmp")
    assert R._read_meta(spark, path)["n_blocks"] == 4
    q2 = sorted(map(tuple, R.query_text_index(
        spark, path, qdf, 5).collect()))
    assert q2 == u
    R.compact_text_index(spark, path)
    assert os.path.isdir(f"{path}/meta")
    assert not os.path.isdir(f"{path}/meta_tmp")
    assert R._read_meta(spark, path)["n_blocks"] == 4
