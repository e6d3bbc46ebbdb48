"""Sinks: the reference's output surface, generalized.

The reference writes predictions as tab-separated ``(test_id \\t
class)`` text via a single reducer (``Hadoop.java:270,308``; SURVEY.md
S4) and then re-reads that file from the driver to score it (S5). The
engine keeps results as DataFrames end-to-end — the driver contract
consumes DataFrames — but provides the same sink formats for users of
the reference switching over, plus the columnar sink any 100 TB
deployment actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(
    df: DataFrame, path: str, *, single_file: bool = False, header: bool = False
) -> None:
    """Tab-separated text sink (reference ``predictions/part-r-00000``).

    ``single_file=True`` reproduces the reference's one-reducer layout
    (coalesce(1)) — a deliberate serial bottleneck, only for small
    outputs / golden-file comparison. Default keeps one file per
    partition like any sane distributed sink.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").option(
        "header", str(header).lower()
    ).csv(path)


def write_parquet(
    df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> None:
    """Columnar sink (the scale default: splittable, pushdown-friendly)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# Formats beyond the reference's ARFF-only surface (SURVEY.md §2.1:
# "No Parquet/ORC/JSON/JDBC/Avro"). parquet/orc/json/csv ship with
# Spark; jdbc needs a driver jar and a database, avro the spark-avro
# package — neither is in this container, so those two raise with a
# clear message instead of failing deep in the JVM.
SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise NotImplementedError(
            f"format {fmt!r}: jdbc/avro need driver jars not present in "
            f"this environment; supported here: {SUPPORTED_FORMATS}"
        )
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_format(spark, path: str, fmt: str, schema=None) -> DataFrame:
    if fmt not in SUPPORTED_FORMATS:
        raise NotImplementedError(
            f"format {fmt!r}: jdbc/avro need driver jars not present in "
            f"this environment; supported here: {SUPPORTED_FORMATS}"
        )
    r = spark.read.format(fmt)
    if fmt == "csv":
        # header must be declared even with an explicit schema, else
        # the header line parses as a (null-filled) data row
        r = r.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("inferSchema", "true")
    return r.load(path)


def read_parquet_evolved(spark, path: str) -> DataFrame:
    """Read a parquet directory whose files have EVOLVED schemas.

    ``mergeSchema=true``: the footer schemas of every file are merged
    into the superset (new columns backfill as null in old files) —
    the standard posture for long-lived ingestion directories where
    producers add columns over time. Merge is a planning-time footer
    scan; the data read stays columnar and pruned.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark, path: str, target_files: int, out_path: str
) -> None:
    """Rewrite a small-files parquet directory into ``target_files``
    larger files.

    The small-file problem is the silent killer of 100 TB table
    health: a directory of 10k tiny files costs 10k task launches and
    footer reads per scan. Compaction = read + coalesce(n) + write;
    ``coalesce`` (not ``repartition``) merges partitions WITHOUT a
    shuffle — each output task just concatenates input splits.
    Run per-partition-directory in production so the rewrite
    parallelizes across partitions.
    """
    spark.read.parquet(path).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(out_path)


def write_globally_sorted(
    df: DataFrame, path: str, sort_col: str, n_files: int = 8
) -> None:
    """Totally-ordered parquet output WITHOUT a single-partition sort.

    ``repartitionByRange`` samples the sort key to build range
    boundaries, so file i's keys all precede file i+1's, and
    ``sortWithinPartitions`` orders inside each file — a global total
    order across n_files files with per-partition sorts only. This is
    the terasort shape, and the only way a 100 TB sorted export can
    exist (a global ``orderBy`` into one writer is the anti-pattern
    the repo bans; TakeOrderedAndProject only covers top-k).
    Lexicographic file naming preserves the order for readers.
    """
    (
        df.repartitionByRange(n_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )
