"""Run headline queries against the 10x skewed corpus and report
which scale/skew guards fire (VERDICT r2 ask #4).

For each query: wall time (noop-sink materialization, same protocol
as bench.py), result row count, and executed-plan evidence — AQE
skew-split markers, join strategies, Exchange count. Queries that
are DOCUMENTED non-scale baselines (exact brute-force similarity)
run under a timeout note instead of being silently skipped.

Usage: python tools/stress_skew.py [query ...]
  (default: the stress set below; data from tools/gen_skew_data.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_using_hadoop_spark import contract  # noqa: E402
from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SKEW_DIR = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew10")

STRESS_SET = [
    # documents: hot shingle + dup clusters + elephant docs
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_sigonly_pairs",
    "doc_dup_ngram_rate",
    "token_heavy_hitters",
    "doc_unigram_logprob",
    "doc_chunk_windows",
    # events: hot user + hot hour group
    "sessionization",
    "events_rolling_distinct_users",
    "skew_salted_join",
    "graph_pagerank",
    # lineitem/orders: hot part + 6M rows
    "tpch_q1_pricing_summary",
    "tpch_q5_revenue",
    "lineitem_brand_affinity",
    "lineitem_logreg_returnflag",
    # embeddings: 10x duplicate points in every bucket
    "embedding_covariance",
    "similarity_topk_lsh",
]


def main() -> None:
    names = sys.argv[1:] or STRESS_SET
    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    print(f"# corpus: {SKEW_DIR}")
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SKEW_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        n = df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        markers = []
        low = plan.lower()
        if "skew=true" in low or "skewed" in low:
            markers.append("AQE-skew-split")
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "BroadcastNestedLoopJoin",
            "ShuffledHashJoin",
        ):
            k = plan.count(j)
            if k:
                markers.append(f"{j}x{k}")
        markers.append(f"Exchange x{plan.count('Exchange')}")
        if "MapInPandas" in plan:
            markers.append("MapInPandas")
        print(
            f"{name}: {dt:.2f}s, {n} rows | " + ", ".join(markers),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
