"""100x follow-up: operators whose SCALE KNOB must grow with the
corpus, run at corpus-appropriate parameters.

The registry queries pin small demo parameters (16 IVF/semdedup
centroids) so the sf0.01 oracle stays cheap; at 100x those constants
are the wrong operating point — cells of ~12.5k members make the
within-cell stages quadratic-heavy. The honest 100x claim is
"the operator is linear WHEN its knob scales with n" (both papers'
own guidance: cluster count grows with corpus). This runs the
knob-scaled variants and reports wall time + output size, next to
the fixed-knob numbers tools/stress_skew.py records.

Usage: python tools/stress_scale_params.py [dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knn_using_hadoop_spark.operators import graph as _graph  # noqa: E402
from knn_using_hadoop_spark.operators import (  # noqa: E402
    similarity as _sim,
)
from knn_using_hadoop_spark.session import get_spark  # noqa: E402

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale100"


def timed(name, thunk):
    # thunk, not DataFrame: operators with eager localCheckpoints
    # (pagerank) do their work at CONSTRUCTION time, which must land
    # inside the timer
    t0 = time.perf_counter()
    df = thunk()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    n = df.count()
    print(f"{name}: {dt:.2f}s, {n} rows", flush=True)


def main() -> None:
    spark = get_spark("stress-params")
    spark.sparkContext.setLogLevel("ERROR")
    embs = spark.read.parquet(f"{DIR}/embeddings.parquet")
    events = spark.read.parquet(f"{DIR}/events.parquet")

    # 200k vectors -> C=256 keeps cells ~800 (vs 12.5k at the demo 16)
    timed(
        "semdedup_prune_C256",
        lambda: _sim.semdedup_prune(embs, n_centroids=256, iters=1,
                            threshold=0.35),
    )
    # same, with the statically-unrolled dot (bit-identical results,
    # JVM codegen instead of the interpreted HOF fold)
    timed(
        "semdedup_prune_C256_dim64",
        lambda: _sim.semdedup_prune(embs, n_centroids=256, iters=1,
                            threshold=0.35, dim=64),
    )
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    timed(
        "ivf_topk_C256",
        lambda: _sim.ivf_topk(embs, queries, 5, n_centroids=256),
    )
    timed(
        "ivf_topk_C256_dim64",
        lambda: _sim.ivf_topk(embs, queries, 5, n_centroids=256, dim=64),
    )
    # pagerank after the sampling-cap fix: the graph survives 100x
    timed(
        "graph_pagerank_sampled_cap",
        lambda: _graph.pagerank(
            _graph.cooccurrence_edges(events, min_count=3), iters=3
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
