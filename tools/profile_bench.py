"""Per-leg job decomposition profiler for the bench legs (r11 opt).

Runs a chosen subset of bench legs once warm + once measured with the
Spark event log enabled and a per-leg job description, then parses
the event log into, per leg:

  wall      the measured pass's wall-clock for the leg
  jobs      number of Spark jobs the leg launched
  job_sum   total wall time inside jobs (submission -> completion)
  gap       wall - job_sum: driver-only time (planning, py4j hops,
            filesystem probes, result handling between jobs)

The gap and the job count are the direct evidence for the
driver-round-trip consolidation work (guide section 1: measure
first; section 5: the driver should do almost no data work).

Usage: python tools/profile_bench.py [leg ...]   (default: big legs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from knn_using_hadoop_spark import contract  # noqa: E402
from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark_graft_profile_events"

DEFAULT_LEGS = [
    "knn_predict_large",
    "knn_reference_large_arff",
    "text_index_query",
    "text_index_query_exact",
    "text_index_query_phrase",
    "text_index_query_rm3",
    "text_index_mlt",
    "text_index_query_live",
    "dedup_index_query_live",
    "ivf_index_query_live",
    "hybrid_retrieval_indexed",
    "corpus_curation_pipeline",
    "graph_pagerank",
    "embedding_semdedup_prune",
    "dedup_minhash_lsh_pairs",
    "similarity_topk_pq",
    "similarity_topk_ivf_probe",
    "lineitem_brand_affinity",
    "tpch_q1_pricing_summary",
]


def build_legs(spark):
    qs = contract.queries()
    legs: dict = {}
    for name in bench.BENCH_QUERIES:
        legs[name] = lambda nm=name: qs[nm](spark, SF_DIR)
    legs["hybrid_retrieval"] = lambda: bench._hybrid_retrieval(
        spark, SF_DIR
    )
    chunk_idx = (
        f"/tmp/spark_graft_chunk_index_bench_{bench._sf_from_dir(SF_DIR)}"
    )
    if not os.path.isdir(chunk_idx):
        bench._build_chunk_text_index(spark, SF_DIR, chunk_idx)
    legs["hybrid_retrieval_indexed"] = (
        lambda: bench._hybrid_retrieval_indexed(spark, SF_DIR, chunk_idx)
    )
    tidx = f"/tmp/spark_graft_text_index_bench_{bench._sf_from_dir(SF_DIR)}"
    if not os.path.isdir(tidx):
        from knn_using_hadoop_spark.operators.retrieval import (
            build_text_index,
        )

        build_text_index(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            tidx,
            n_buckets=64,
            positions=True,
        )
    legs["text_index_query"] = lambda: bench._text_index_query(
        spark, SF_DIR, tidx, max_df=500
    )
    legs["text_index_query_exact"] = lambda: bench._text_index_query(
        spark, SF_DIR, tidx
    )

    def _rm3():
        from knn_using_hadoop_spark.operators.retrieval import (
            query_text_index_rm3,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        q = docs.filter(F.col("doc_id") % 100 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        return query_text_index_rm3(
            spark, tidx, q, 10, fb_docs=5, fb_terms=10, max_df=500
        )

    legs["text_index_query_rm3"] = _rm3

    def _mlt():
        from knn_using_hadoop_spark.operators.retrieval import (
            more_like_this,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ids = docs.filter(F.col("doc_id") % 500 == 3).select("doc_id")
        return more_like_this(spark, tidx, ids, 10)

    legs["text_index_mlt"] = _mlt

    # phrase leg: needs the zipf corpus; rebuild is deterministic
    zphr = f"/tmp/spark_graft_zipf_phrase_idx_{bench._sf_from_dir(SF_DIR)}"
    zdocs_holder = {}

    def _ensure_zipf():
        if "docs" not in zdocs_holder:
            # the builder checkpoints the corpus; index build skipped
            # if present (still needs the docs df for queries)
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
                            (40 + F.pmod(F.xxhash64("id"), F.lit(80))).cast(
                                "int"
                            ),
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
            if not os.path.isdir(zphr):
                shutil.rmtree(zphr, ignore_errors=True)
                build_text_index(zdocs, zphr, n_buckets=64, positions=True)
            zdocs_holder["docs"] = zdocs
        return zdocs_holder["docs"]

    def _phrase():
        from knn_using_hadoop_spark.operators.retrieval import (
            query_text_index,
        )

        zdocs = _ensure_zipf()
        q = zdocs.filter(F.col("doc_id") % 1000 == 3).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(F.split("text", " "), 3, 6), " ").alias(
                "text"
            ),
        )
        return query_text_index(spark, zphr, q, 10, phrase=True)

    legs["text_index_query_phrase"] = _phrase

    tlive = f"/tmp/spark_graft_text_index_live_{bench._sf_from_dir(SF_DIR)}"
    if not os.path.isdir(tlive):
        bench._build_live_text_index(spark, SF_DIR, tlive)
    legs["text_index_query_live"] = lambda: bench._text_index_query(
        spark, SF_DIR, tlive, max_df=500
    )
    ivfl = f"/tmp/spark_graft_ivf_index_live_{bench._sf_from_dir(SF_DIR)}"
    if not os.path.isdir(ivfl):
        bench._build_live_ivf_index(spark, SF_DIR, ivfl)
    legs["ivf_index_query_live"] = lambda: bench._ivf_index_query_live(
        spark, SF_DIR, ivfl
    )
    dlive = f"/tmp/spark_graft_dedup_index_live_{bench._sf_from_dir(SF_DIR)}"
    if not os.path.isdir(dlive):
        bench._build_live_dedup_index(spark, SF_DIR, dlive)
    legs["dedup_index_query_live"] = lambda: bench._dedup_index_query_live(
        spark, SF_DIR, dlive
    )

    def _knn_large():
        from knn_using_hadoop_spark.operators.knn import knn_predict

        train, test = contract.knn_tables(spark, SF_DIR, mod=1000)
        return knn_predict(
            train, test, contract.KNN_K, dim=len(contract.KNN_FEATURES)
        )

    legs["knn_predict_large"] = _knn_large

    ref = "/root/reference/datasets"
    if os.path.isdir(ref):
        from knn_using_hadoop_spark.operators.knn import knn_predict
        from knn_using_hadoop_spark.sources.arff import (
            read_arff_features,
        )

        par = spark.sparkContext.defaultParallelism

        def _knn_ref():
            train = read_arff_features(
                spark, f"{ref}/large-train.arff"
            ).repartition(par)
            test = read_arff_features(spark, f"{ref}/large-test.arff")
            return knn_predict(train, test, 3, dim=11, prefilter_sample=512)

        legs["knn_reference_large_arff"] = _knn_ref
    return legs


def parse_events(evdir: str):
    """[(desc, job_id, submit_ms, complete_ms)] from the event log."""
    out = []
    paths = []
    for root, _dirs, files in os.walk(evdir):
        for fn in files:
            if "appstatus" not in fn:
                paths.append(os.path.join(root, fn))
    for path in paths:
        starts = {}
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    starts[ev["Job ID"]] = (
                        props.get("spark.job.description", ""),
                        ev["Submission Time"],
                    )
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        desc, sub = starts[jid]
                        out.append(
                            (desc, jid, sub, ev["Completion Time"])
                        )
    return out


def main() -> None:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.sql.codegen.cache.maxEntries": "4096",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
            # the box has no zstd bindings to parse a compressed log
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    legs = build_legs(spark)
    wanted = sys.argv[1:] or DEFAULT_LEGS
    missing = [w for w in wanted if w not in legs]
    if missing:
        print(f"unknown legs: {missing}", file=sys.stderr)
        sys.exit(2)
    # warm pass (unlabelled)
    spark.sparkContext.setJobDescription("warm")
    for w in wanted:
        bench._materialize(legs[w]())
    # measured pass
    walls = {}
    for w in wanted:
        spark.sparkContext.setJobDescription(f"leg:{w}")
        t0 = time.perf_counter()
        bench._materialize(legs[w]())
        walls[w] = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    # flush the event log
    spark.stop()
    time.sleep(1)
    jobs = parse_events(EVDIR)
    print(f"{'leg':32s} {'wall':>7s} {'jobs':>5s} {'job_sum':>8s} {'gap':>7s}")
    for w in wanted:
        mine = [j for j in jobs if j[0] == f"leg:{w}"]
        jsum = sum((c - s) for _, _, s, c in mine) / 1000.0
        print(
            f"{w:32s} {walls[w]:7.2f} {len(mine):5d} {jsum:8.2f} "
            f"{walls[w] - jsum:7.2f}"
        )
        for _, jid, s, c in sorted(mine, key=lambda x: x[2]):
            print(f"    job {jid:4d}  {(c - s) / 1000.0:7.3f}s")


if __name__ == "__main__":
    main()
