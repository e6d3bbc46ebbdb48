"""Larger-scale spot-check bench (r12, VERDICT r11 #7).

At sf0.1 the batch-analytics legs are fixed-overhead-bound: the
driver's own scaling block shows 8 cores ~= 32 cores on 43 of 46
legs, so executor-side optimizations are invisible in the headline
bench. This tool restores measurement power WITHOUT touching
``bench.py`` (whose stdout contract the driver parses): it runs a
small set of heavy batch legs against the uniform Nx corpus that
``tools/gen_scale_data.py`` synthesizes (distinct-entity key
remapping — real growth shape, not duplicate explosions), with the
same methodology as the bench (noop sink, warm-all barrier,
interleaved rounds, min-of-rounds), and prints ONE JSON line.

Run once per optimization round next to the sf0.1 series; commit
the line (plans/<round>/SPOT_*.json) as the executor-side evidence.

Usage:
  python tools/gen_scale_data.py 10 /root/testdata/sf0.1 /tmp/spark_graft_scale10
  SPARK_GRAFT_SPOT_DIR=/tmp/spark_graft_scale10 python tools/spot_bench.py [leg ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from knn_using_hadoop_spark import contract  # noqa: E402
from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SPOT_DIR = os.environ.get(
    "SPARK_GRAFT_SPOT_DIR", "/tmp/spark_graft_scale10"
)

# Heavy BATCH legs — the ones whose sf0.1 wall-clock no longer
# discriminates (serving legs are driver-latency paths; the
# profiler, not this tool, is their instrument).
DEFAULT_LEGS = [
    "corpus_curation_pipeline",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_sigonly_pairs",
    "tpch_q1_pricing_summary",
    "graph_pagerank",
    "embedding_semdedup_prune",
    "token_heavy_hitters",
    "doc_unigram_logprob",
    "embedding_covariance",
]


def main() -> None:
    if not os.path.isdir(SPOT_DIR):
        print(
            f"spot corpus missing: {SPOT_DIR} — generate it with "
            "tools/gen_scale_data.py first",
            file=sys.stderr,
        )
        sys.exit(2)
    wanted = sys.argv[1:] or DEFAULT_LEGS
    runs = int(os.environ.get("SPARK_GRAFT_SPOT_RUNS", "3"))
    spark = get_spark(
        "spot_bench",
        extra_conf={"spark.sql.codegen.cache.maxEntries": "4096"},
    )
    qs = contract.queries()
    missing = [w for w in wanted if w not in qs]
    if missing:
        print(f"unknown legs: {missing}", file=sys.stderr)
        sys.exit(2)

    def _materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-all barrier, then interleaved min-of-rounds (the bench
    # methodology, unchanged)
    for w in wanted:
        spark.sparkContext.setJobDescription(f"warm:{w}")
        _materialize(qs[w](spark, SPOT_DIR))
    samples: dict[str, list[float]] = {w: [] for w in wanted}
    for _ in range(runs):
        for w in wanted:
            spark.sparkContext.setJobDescription(f"spot:{w}")
            t0 = time.perf_counter()
            _materialize(qs[w](spark, SPOT_DIR))
            samples[w].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    timings = {w: round(min(s), 3) for w, s in samples.items()}
    print(
        json.dumps(
            {
                "metric": "spot_bench_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "dir": SPOT_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
