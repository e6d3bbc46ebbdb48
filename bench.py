"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is total wall-clock over the query set — the
engine twin of the reference's job wall-clock printout
(``Hadoop.java:310-316``). KNN runs with a test fraction scaled so the
distance-eval count at sf0.1 (~360M pairs) comfortably exceeds the
reference's largest committed workload (~53M pairs, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from knn_using_hadoop_spark import contract  # noqa: E402
from knn_using_hadoop_spark.operators.knn import knn_predict  # noqa: E402
from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Queries timed from the contract registry (full materialization via
# a count over the result — no driver-side collect of payloads).
# NOTE: the contract's knn_* queries use a 1% test fraction sized for
# the sf0.01 correctness gate; at sf0.1 that would be ~3.5B distance
# evals. Bench times the flagship KNN separately at mod=1000 (~360M
# evals — still ~7x the reference's largest committed workload).
BENCH_QUERIES = [
    "groupby_agg",
    "topk_per_group",
    "join_agg",
    "tpch_q5_revenue",
    "window_analytics",
    "events_windowed_agg",
    "scan_filter_project",
    "sessionization",
    "dedup_minhash_lsh_pairs",
    # the 100 TB dedup path: fixed-width signature-only estimate, no
    # exact-Jaccard verify re-join — benched next to the exact variant
    # so the crossover is recorded (NOTES.md)
    "dedup_minhash_sigonly_pairs",
    "dedup_simhash",
    "similarity_topk",
    "doc_quality_score",
    # training-data pipeline headliners (round 2)
    "doc_chunk_windows",
    "doc_pack_greedy",
    # round-2 surface: window family, sequence match, LM scoring,
    # sketch+exact-rescue, skew join, iterative graph, shingle audit
    "orders_rank_surface",
    "events_sequence_match",
    "doc_unigram_logprob",
    "token_heavy_hitters",
    "skew_salted_join",
    "graph_pagerank",
    "doc_dup_ngram_rate",
    # session-4 surface: decimal-exact wide-agg scan, single-pass
    # covariance (O(d^2) shuffle), bounded-fanout rolling distinct
    "tpch_q1_pricing_summary",
    "embedding_covariance",
    "events_rolling_distinct_users",
    # session-5 surface: iterative GD (3 aggregate scans), sliding-
    # window Expand fan-out, bounded self-join basket pairs
    "lineitem_logreg_returnflag",
    "events_sliding_windowed_agg",
    "lineitem_brand_affinity",
    # round-3 surface: semantic dedup (k-means cells + within-cell
    # cosine prune), positional substring dedup, and the end-to-end
    # curation pipeline (5 stages, one plan)
    "embedding_semdedup_prune",
    "doc_shared_passage_spans",
    "corpus_curation_pipeline",
    # round-5 surface: the ANN ladder's kernel-backed legs (per-cell
    # candidate kernel; fused encode+ADC scan)
    "similarity_topk_ivf_probe",
    "similarity_topk_pq",
    # round-6: LSH leg now that its bucket stage is the Arrow sign
    # kernel (r5 verdict #4) — wall-clocked per round like its
    # IVF/PQ siblings
    "similarity_topk_lsh",
]


def _hybrid_retrieval(spark, sf_dir: str):
    """The retrieval surface composed end-to-end (r6 verdict #4):
    chunk_windows -> BM25 over chunks -> MaxP back to documents,
    fused with the cosine vector ranking by RRF. Not a registry
    query (the registry is frozen at 210); benched here so the
    retrieval operators get wall-clocked per round like their ANN
    siblings. max_df is 10% of the corpus — the same stop-term
    guard ratio the 500k scale ceiling runs (the synthetic
    vocabulary makes every term a stop term)."""
    from knn_using_hadoop_spark.operators.pipeline import (
        chunk_windows,
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        bm25_topk,
        maxp_doc_topk,
        rrf_fuse,
    )
    from knn_using_hadoop_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    chunks = chunk_windows(docs, size=64, overlap=16, with_key=True)
    chunk_rank = bm25_topk(
        chunks.select(
            "chunk_key", F.col("chunk_text").alias("text")
        ),
        queries,
        10,
        id_col="chunk_key",
        max_df=500,
    )
    lex = maxp_doc_topk(
        chunk_rank,
        chunks.select("chunk_key", "doc_id"),
        10,
        chunk_col="chunk_key",
    )
    qv = emb.filter(F.col("vec_id") % 100 == 0)
    vec = cosine_topk(emb, qv, 10, 64).select(
        "query_id", "rank", F.col("vec_id").alias("doc_id")
    )
    return rrf_fuse([lex, vec], 10)


def _hybrid_retrieval_indexed(spark, sf_dir: str, idx_path: str):
    """Index-backed hybrid serving (r8 verdict #5): the same
    composition as ``_hybrid_retrieval``, but the chunk-level BM25
    leg queries the PERSISTED chunk index (built once in setup,
    before the warm barrier) instead of re-tokenizing the chunked
    corpus every batch — the serving architecture the text store
    exists for, A/B-benched against the inline leg (NOTES r9). The
    chunk->doc map derives from the chunk_key itself
    (``doc_id:chunk_id``), so only retrieved chunks are mapped."""
    from knn_using_hadoop_spark.operators.retrieval import (
        maxp_doc_topk,
        query_text_index,
        rrf_fuse,
    )
    from knn_using_hadoop_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    chunk_rank = query_text_index(
        spark, idx_path, queries, 10, max_df=500,
        id_col="chunk_key",
    )
    cmap = chunk_rank.select("chunk_key").distinct().select(
        "chunk_key",
        F.split("chunk_key", ":")[0].cast("long").alias("doc_id"),
    )
    lex = maxp_doc_topk(
        chunk_rank, cmap, 10, chunk_col="chunk_key"
    )
    qv = emb.filter(F.col("vec_id") % 100 == 0)
    vec = cosine_topk(emb, qv, 10, 64).select(
        "query_id", "rank", F.col("vec_id").alias("doc_id")
    )
    return rrf_fuse([lex, vec], 10)


def _build_chunk_text_index(spark, sf_dir: str, path: str) -> None:
    """One-time setup for the indexed hybrid leg: chunk the corpus
    and persist the BM25 index AT CHUNK GRANULARITY (chunk_key as
    the doc id) — what a RAG serving stack builds offline."""
    import shutil

    from knn_using_hadoop_spark.operators.pipeline import (
        chunk_windows,
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
    )

    shutil.rmtree(path, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = chunk_windows(docs, size=64, overlap=16, with_key=True)
    build_text_index(
        chunks.select(
            "chunk_key", F.col("chunk_text").alias("text")
        ),
        path,
        n_buckets=64,
        id_col="chunk_key",
    )


def _text_index_query(spark, sf_dir: str, path: str, **kw):
    """Query serving over the persisted text index (r7): the index
    is (re)built once per bench process BEFORE the warm barrier
    (build_text_index is the one-time cost the artifact exists to
    amortize); the timed leg measures steady-state query batches —
    bucket-pruned postings/terms scans, no corpus tokenize. Same
    query sample and stop-term guard as the hybrid leg. ``kw``
    variants: the r8 legs reuse this body for the live
    (segments+tombstones) store and the exact unguarded
    (max-score-pruned) path."""
    from knn_using_hadoop_spark.operators.retrieval import (
        query_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return query_text_index(spark, path, queries, 10, **kw)


def _build_live_text_index(spark, sf_dir: str, path: str) -> None:
    """The lifecycle-serving regime (r7 verdict #4): a store with
    LIVE maintenance debt — 90% of the corpus in the base, the rest
    split across two appended segments, ~2.7% of ids tombstoned —
    so the timed query pays the segment df/stats derivation and the
    tombstone anti-join, not the pristine single-store fast path."""
    import shutil

    from knn_using_hadoop_spark.operators.retrieval import (
        append_text_index,
        build_text_index,
        delete_from_text_index,
    )

    shutil.rmtree(path, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_text_index(
        docs.filter(F.col("doc_id") % 10 < 8), path, n_buckets=64
    )
    for m in (8, 9):
        append_text_index(
            spark, path, docs.filter(F.col("doc_id") % 10 == m)
        )
    delete_from_text_index(spark, path, where="doc_id % 37 = 0")


def _build_live_ivf_index(spark, sf_dir: str, path: str) -> None:
    """IVF twin of `_build_live_text_index` (r7 verdict #4): 80% of
    the vectors in the base cell store, two appended batches
    assigned against the STORED centroids, ~2.7% tombstoned — the
    query pays the segment union + tombstone anti-join."""
    import shutil

    from knn_using_hadoop_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        delete_from_ivf_index,
    )

    shutil.rmtree(path, ignore_errors=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ivf_index(emb.filter(F.col("vec_id") % 10 < 8), path)
    for m in (8, 9):
        append_ivf_index(
            spark, path, emb.filter(F.col("vec_id") % 10 == m)
        )
    delete_from_ivf_index(spark, path, where="vec_id % 37 = 0")


def _build_live_dedup_index(spark, sf_dir: str, path: str) -> None:
    """Dedup-store twin of the live text/IVF fixtures (r11): most of
    the corpus in the base fingerprint store, one appended batch,
    a slice tombstoned — the query pays segment union + tombstone
    anti-join on both stores."""
    import shutil

    from knn_using_hadoop_spark.operators.dedup import (
        append_dedup_index,
        build_dedup_index,
        delete_from_dedup_index,
    )

    shutil.rmtree(path, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    build_dedup_index(
        docs.filter(
            (F.col("doc_id") % 7 != 3) & (F.col("doc_id") % 10 < 8)
        ),
        path,
    )
    append_dedup_index(
        spark,
        path,
        docs.filter(
            (F.col("doc_id") % 7 != 3) & (F.col("doc_id") % 10 >= 8)
        ),
    )
    delete_from_dedup_index(
        spark,
        path,
        docs.filter(
            (F.col("doc_id") % 7 != 3) & (F.col("doc_id") % 97 == 0)
        ).select("doc_id"),
    )


def _dedup_index_query_live(spark, sf_dir: str, path: str):
    from knn_using_hadoop_spark.operators.dedup import (
        query_dedup_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    return query_dedup_index(spark, path, batch, threshold=0.5)


def _ivf_index_query_live(spark, sf_dir: str, path: str):
    from knn_using_hadoop_spark.operators.similarity import (
        query_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return query_ivf_index(spark, path, q, 10, nprobe=4)


def _materialize(df) -> None:
    """Execute a result fully via the noop sink.

    NOT ``df.count()``: under count() Catalyst prunes any computed
    column nothing references (window_analytics' row_number/lag,
    scan_filter_project's net_price, ...), so the timing would measure
    little more than the scan (ADVICE r1). The noop sink consumes
    every column of every row and discards them — the standard Spark
    benchmarking sink."""
    df.write.format("noop").mode("overwrite").save()


def _sf_from_dir(d: str) -> float:
    tag = os.path.basename(d.rstrip("/"))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    # codegen cache sized to the leg list: the interleaved schedule
    # (r6 verdict #1) runs ~38 distinct plans per round, each with
    # several generated classes — Spark's default 100-entry codegen
    # cache thrashes between two samples of the same leg, charging
    # every sub-second leg a ~0.1-0.6s recompile that consecutive
    # best-of-5 never paid (measured: first interleaved snapshot ran
    # 1.5-2x on sub-second legs, 1.0x on multi-second ones — a fixed
    # per-sample constant, not a scaling change). A serving cluster
    # sizes this cache to its workload; the bench does the same so
    # min-of-rounds keeps measuring warm-JIT execution.
    spark = get_spark(
        "bench",
        extra_conf={"spark.sql.codegen.cache.maxEntries": "4096"},
    )
    # untimed warmup: JVM/codegen/parquet-footer init shouldn't be
    # attributed to the first query
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    qs = contract.queries()
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    # best-of-N rounds per query (default 5): later rounds reuse
    # compiled codegen and warm parquet footers, so min-of-rounds
    # strips the ±3s JIT noise (NOTES.md) without changing what is
    # measured — each sample still plans + executes the full query
    # cold of any result cache. With 5 rounds the per-query
    # min/median/max in "stats" are variance-pinned by default
    # (VERDICT r3 ask #2); "queries" stays min-of-rounds for
    # cross-round comparability.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    # Every timed leg as a (name, thunk) pair so ALL legs — registry
    # queries, the two KNN workloads, and the composed retrieval
    # pipeline — share one warm barrier and one interleaved schedule.
    def _knn_large():
        train, test = contract.knn_tables(spark, SF_DIR, mod=1000)
        # flagship KNN (mod=1000 at sf0.1 -> ~600 queries x ~600k
        # train = ~360M distance evals)
        return knn_predict(
            train, test, contract.KNN_K, dim=len(contract.KNN_FEATURES)
        )

    legs: list = [
        (name, (lambda nm=name: qs[nm](spark, SF_DIR)))
        for name in BENCH_QUERIES
    ]
    legs.append(
        ("hybrid_retrieval", lambda: _hybrid_retrieval(spark, SF_DIR))
    )
    # r9: the same hybrid composition served from the persisted
    # chunk-granularity index (build untimed, like the doc index)
    chunk_idx = (
        f"/tmp/spark_graft_chunk_index_bench_{_sf_from_dir(SF_DIR)}"
    )
    _build_chunk_text_index(spark, SF_DIR, chunk_idx)
    legs.append(
        (
            "hybrid_retrieval_indexed",
            lambda: _hybrid_retrieval_indexed(
                spark, SF_DIR, chunk_idx
            ),
        )
    )
    from knn_using_hadoop_spark.operators.retrieval import (
        build_text_index,
    )

    tidx_path = (
        f"/tmp/spark_graft_text_index_bench_{_sf_from_dir(SF_DIR)}"
    )
    build_text_index(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"),
        tidx_path,
        n_buckets=64,
        positions=True,  # r8: non-phrase legs column-prune this
    )
    legs.append(
        (
            "text_index_query",
            lambda: _text_index_query(
                spark, SF_DIR, tidx_path, max_df=500
            ),
        )
    )
    # r8: the exact unguarded path — no max_df, max-score pruning
    # auto-on (r7 verdict #3)
    legs.append(
        (
            "text_index_query_exact",
            lambda: _text_index_query(spark, SF_DIR, tidx_path),
        )
    )
    # r8/r10: exact-phrase serving over the positional store —
    # 6-token verbatim document slices, two-rarest-member candidate
    # intersection. r10 (r9 verdict #4): the fixture is now a
    # REALISTIC Zipf(1) vocabulary (the testdata documents table is
    # a 31-word corpus, so every phrase member was a stop term and
    # the leg measured a degenerate corpus-sized intersection, not
    # the plan; the degenerate shape lives on as the hostile-corpus
    # --run-scale pin in tests/test_scale.py). Deterministic
    # inverse-CDF Zipf generation, 10x the documents row count,
    # 20k-term vocabulary; corpus + positional index build are
    # untimed setup like every other serving-index leg.
    def _build_zipf_phrase_index(path: str):
        import shutil

        from knn_using_hadoop_spark.operators.retrieval import (
            build_text_index,
        )

        n_docs = 10 * spark.read.parquet(
            f"{SF_DIR}/documents.parquet"
        ).count()
        V = 20_000
        zdocs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        (
                            40 + F.pmod(F.xxhash64("id"), F.lit(80))
                        ).cast("int"),
                    ),
                    lambda pos: F.concat(
                        F.lit("t"),
                        F.floor(
                            F.pow(
                                F.lit(float(V)),
                                F.pmod(
                                    F.xxhash64(F.col("id"), pos),
                                    F.lit(1_000_000),
                                )
                                / 1_000_000.0,
                            )
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        ).localCheckpoint(eager=True)
        shutil.rmtree(path, ignore_errors=True)
        build_text_index(
            zdocs, path, n_buckets=64, positions=True
        )
        return zdocs

    zphr_path = (
        f"/tmp/spark_graft_zipf_phrase_idx_{_sf_from_dir(SF_DIR)}"
    )
    zphr_docs = _build_zipf_phrase_index(zphr_path)

    def _phrase_leg():
        from knn_using_hadoop_spark.operators.retrieval import (
            query_text_index,
        )

        q = zphr_docs.filter(F.col("doc_id") % 1000 == 3).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(F.split("text", " "), 3, 6), " "
            ).alias("text"),
        )
        return query_text_index(
            spark, zphr_path, q, 10, phrase=True
        )

    legs.append(("text_index_query_phrase", _phrase_leg))

    # r9: RM3 pseudo-relevance feedback served from the same store
    # (two retrieval passes + index-derived feedback LMs)
    def _rm3_leg():
        from knn_using_hadoop_spark.operators.retrieval import (
            query_text_index_rm3,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        q = docs.filter(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        # same stop-term guard convention as the other serving legs
        # (the sf0.1 fixture's 31-word vocabulary makes every term a
        # stop term; unguarded RM3 here measures the fixture, not
        # the operator — ~10s vs ~4s, NOTES r9)
        return query_text_index_rm3(
            spark, tidx_path, q, 10, fb_docs=5, fb_terms=10,
            max_df=500,
        )

    legs.append(("text_index_query_rm3", _rm3_leg))

    # r10: MoreLikeThis — stored term vectors (forward store) as a
    # weighted query; the zero-text "documents like these" serving op
    def _mlt_leg():
        from knn_using_hadoop_spark.operators.retrieval import (
            more_like_this,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ids = docs.filter(F.col("doc_id") % 500 == 3).select(
            "doc_id"
        )
        return more_like_this(spark, tidx_path, ids, 10)

    legs.append(("text_index_mlt", _mlt_leg))
    # r8: serving with live segments + tombstones (r7 verdict #4)
    tidx_live = (
        f"/tmp/spark_graft_text_index_live_{_sf_from_dir(SF_DIR)}"
    )
    _build_live_text_index(spark, SF_DIR, tidx_live)
    legs.append(
        (
            "text_index_query_live",
            lambda: _text_index_query(
                spark, SF_DIR, tidx_live, max_df=500
            ),
        )
    )
    ivf_live = (
        f"/tmp/spark_graft_ivf_index_live_{_sf_from_dir(SF_DIR)}"
    )
    _build_live_ivf_index(spark, SF_DIR, ivf_live)
    legs.append(
        (
            "ivf_index_query_live",
            lambda: _ivf_index_query_live(spark, SF_DIR, ivf_live),
        )
    )
    dedup_live = (
        f"/tmp/spark_graft_dedup_index_live_{_sf_from_dir(SF_DIR)}"
    )
    _build_live_dedup_index(spark, SF_DIR, dedup_live)
    legs.append(
        (
            "dedup_index_query_live",
            lambda: _dedup_index_query_live(spark, SF_DIR, dedup_live),
        )
    )
    legs.append(("knn_predict_large", _knn_large))

    # the reference's own largest committed workload (BASELINE.md: large
    # ARFF, 30,803 train x 1,718 test, k=3, ~52.9M distance evals) run
    # end-to-end on this engine — the directly comparable number
    ref = "/root/reference/datasets"
    if os.path.isdir(ref):
        from knn_using_hadoop_spark.sources.arff import read_arff_features

        par = spark.sparkContext.defaultParallelism

        def _knn_ref_arff():
            # a small single-file ARFF is one input split; spread the
            # train side so the cross join parallelizes. sample=512 is
            # the measured prefilter optimum for this workload shape
            # (1718 test x 31k train) — knn.py sizing note
            train = read_arff_features(
                spark, f"{ref}/large-train.arff"
            ).repartition(par)
            test = read_arff_features(spark, f"{ref}/large-test.arff")
            return knn_predict(
                train, test, 3, dim=11, prefilter_sample=512
            )

        legs.append(("knn_reference_large_arff", _knn_ref_arff))

    # Warm-all barrier (default on; SPARK_GRAFT_BENCH_WARMUP=0 skips):
    # one untimed pass over every bench leg before ANY timing starts.
    # Without it, each leg's first timed run carries whatever
    # JIT/codegen/shuffle warmth the legs BEFORE it happened to
    # build, so adding/reordering bench entries shifts every
    # downstream min — three rounds of review cycles went to
    # adjudicating exactly that noise (VERDICT r4 "what's wrong" #2).
    # After the barrier all timed runs measure the same warm-state
    # regime regardless of position in the list.
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for _, thunk in legs:
            _materialize(thunk())
        print("# warm-all barrier complete", file=sys.stderr)

    # Interleaved rounds (r6 verdict #1): one pass over the FULL leg
    # list per round, `runs` rounds, min over rounds. With the old
    # consecutive best-of-5 per query, a transient host load spike
    # landed on ALL of one query's samples and survived min-of-5 —
    # the driver's r6 artifact printed a false 15x regression on
    # events_windowed_agg exactly that way (3.887s min-of-5 vs 0.158s
    # quiet-box, zero commits on its path). Round-robin spreads any
    # spike across at most one sample of each leg, so min-over-rounds
    # sheds it. What is measured per sample is unchanged: plan +
    # execute the full query, warm of JIT but cold of any result
    # cache.
    samples: dict[str, list[float]] = {name: [] for name, _ in legs}
    for _ in range(runs):
        for name, thunk in legs:
            t0 = time.perf_counter()
            _materialize(thunk())
            samples[name].append(time.perf_counter() - t0)

    for name, thunk in legs:
        s = sorted(samples[name])
        timings[name] = round(s[0], 3)
        stats[name] = {
            "min": round(s[0], 3),
            "med": round(s[len(s) // 2], 3),
            "max": round(s[-1], 3),
        }
        n = thunk().count()  # untimed, for the report line
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # The driver captures only the last ~2000 bytes of stdout and
    # json.loads them; the combined stats payload outgrew that window
    # in r3 and BENCH_r03/r04 recorded "parsed": null (VERDICT r4
    # "what's wrong" #1). So: full min/med/max stats go to stderr and
    # a sidecar file; the FINAL stdout line is the compact summary
    # only, with a hard byte guard that drops per-query detail before
    # ever exceeding the driver's window.
    full = {
        "metric": "total_wall_clock_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "stats": stats,
        "runs": runs,
        "sf": _sf_from_dir(SF_DIR),
    }
    print("# stats: " + json.dumps(full), file=sys.stderr)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_STATS.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    compact = {
        "metric": "total_wall_clock_headline_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": _sf_from_dir(SF_DIR),
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # never outgrow the driver's 2000-byte tail
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
