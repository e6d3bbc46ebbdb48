"""SparkSession construction tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set per
executor; the scale-relevant knobs (AQE, shuffle partitions, Arrow)
are the same ones you'd set on a 1000-executor cluster — only the
master URL and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "knn_using_hadoop_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    * AQE on (runtime coalesce, skew-join handling, broadcast demotion)
    * shuffle partitions sized to cores for local mode — on a real
      cluster you'd size to ~2-3x total executor cores or let AQE
      coalesce from a high initial number.
    * Arrow enabled so pandas-UDF paths are vectorized.
    * UTC session timezone so timestamps compare cleanly against the
      DuckDB oracle (duckdb timestamps are UTC-naive).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events.parquet stores TIMESTAMP(NANOS); read the
        # raw int64 and convert in the loader (Spark has no nanos type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # static conf: keep managed/bucketed tables out of the repo dir
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
