"""Parquet table catalog over the driver's TPC-H-ish testdata.

Plain ``spark.read.parquet`` — columnar scan with predicate pushdown
and column pruning for free. At 100 TB these would be partitioned
datasets (e.g. orders by o_orderdate) and the same loaders apply; the
engine never assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def ensure_engine_confs(spark: SparkSession) -> None:
    """Pin the runtime-settable confs the engine's semantics need.

    The harness may hand us a SparkSession built without
    ``session.py`` (the driver creates its own): without these,
    events.parquet (TIMESTAMP(NANOS)) fails to scan at all, and a
    non-UTC session timezone shifts every collected timestamp
    relative to the DuckDB oracle. Both are runtime-settable SQL
    confs, so pin them at every table load — idempotent and cheap.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, name: str, base_dir: str | None = None) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_engine_confs(spark)
    base = base_dir or sf_dir()
    df = spark.read.parquet(f"{base}/{name}.parquet")
    # Normalize timestamp physical encodings to TimestampType. The
    # driver's generator has shipped events.ts as TIMESTAMP(NANOS)
    # (reads as int64 under nanosAsLong) and as plain micros with
    # isAdjustedToUTC=false (reads as TIMESTAMP_NTZ). Both are naive
    # wall-clock instants that DuckDB treats as UTC; with the session
    # timezone pinned to UTC above, casting to TimestampType is
    # bit-identical to the oracle's epoch semantics — and NTZ would
    # otherwise reject the cast-to-double the time-series operators
    # use. Integer DIV, not /: ns-since-epoch overflows double's
    # 53-bit mantissa.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and isinstance(
            field.dataType, T.LongType
        ):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast(T.TimestampType())
            )
    return df


def register_views(spark: SparkSession, base_dir: str | None = None) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, name, base_dir).createOrReplaceTempView(name)
