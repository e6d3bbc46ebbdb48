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
    spark = get_spark("bench")
    # untimed warmup: JVM/codegen/parquet-footer init shouldn't be
    # attributed to the first query
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    qs = contract.queries()
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    # best-of-N per query (default 5): later runs reuse compiled
    # codegen and warm parquet footers, so min-of-runs strips the ±3s
    # JIT noise (NOTES.md) without changing what is measured — each
    # run still plans + executes the full query cold of any result
    # cache. With 5 runs the per-query min/median/max in "stats" are
    # variance-pinned by default (VERDICT r3 ask #2: runs=2 made
    # "med" the cold run); "queries" stays min-of-runs for
    # cross-round comparability.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

    # Warm-all barrier (default on; SPARK_GRAFT_BENCH_WARMUP=0 skips):
    # one untimed pass over every bench query before ANY timing starts.
    # Without it, each query's first timed run carries whatever
    # JIT/codegen/shuffle warmth the queries BEFORE it happened to
    # build, so adding/reordering bench entries shifts every
    # downstream min — three rounds of review cycles went to
    # adjudicating exactly that noise (VERDICT r4 "what's wrong" #2).
    # After the barrier all timed runs measure the same warm-state
    # regime regardless of position in the list.
    if os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0":
        for name in BENCH_QUERIES:
            _materialize(qs[name](spark, SF_DIR))
        print("# warm-all barrier complete", file=sys.stderr)

    def record(name: str, samples: list[float]) -> None:
        samples = sorted(samples)
        timings[name] = round(samples[0], 3)
        stats[name] = {
            "min": round(samples[0], 3),
            "med": round(samples[len(samples) // 2], 3),
            "max": round(samples[-1], 3),
        }

    for name in BENCH_QUERIES:
        fn = qs[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            _materialize(df)
            samples.append(time.perf_counter() - t0)
        record(name, samples)
        n = fn(spark, SF_DIR).count()  # untimed, for the report line
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    # flagship KNN (mod=1000 at sf0.1 -> ~600 queries x ~600k train =
    # ~360M distance evals)
    samples, n = [], -1
    for _ in range(runs):
        t0 = time.perf_counter()
        train, test = contract.knn_tables(spark, SF_DIR, mod=1000)
        df = knn_predict(
            train, test, contract.KNN_K, dim=len(contract.KNN_FEATURES)
        )
        _materialize(df)
        samples.append(time.perf_counter() - t0)
    n = df.count()
    record("knn_predict_large", samples)
    print(
        f"# knn_predict_large: {n} rows in {timings['knn_predict_large']}s",
        file=sys.stderr,
    )

    # the reference's own largest committed workload (BASELINE.md: large
    # ARFF, 30,803 train x 1,718 test, k=3, ~52.9M distance evals) run
    # end-to-end on this engine — the directly comparable number
    ref = "/root/reference/datasets"
    if os.path.isdir(ref):
        from knn_using_hadoop_spark.sources.arff import read_arff_features

        par = spark.sparkContext.defaultParallelism
        # a small single-file ARFF is one input split; spread the
        # train side so the cross join parallelizes
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            train = read_arff_features(
                spark, f"{ref}/large-train.arff"
            ).repartition(par)
            test = read_arff_features(spark, f"{ref}/large-test.arff")
            # sample=512 is the measured prefilter optimum for this
            # workload shape (1718 test x 31k train) — knn.py sizing note
            df = knn_predict(
                train, test, 3, dim=11, prefilter_sample=512
            )
            _materialize(df)
            samples.append(time.perf_counter() - t0)
        n = df.count()
        record("knn_reference_large_arff", samples)
        print(
            f"# knn_reference_large_arff: {n} predictions in "
            f"{timings['knn_reference_large_arff']}s",
            file=sys.stderr,
        )

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
