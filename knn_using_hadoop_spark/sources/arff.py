"""ARFF source: header-aware reader for numeric ARFF files.

The reference consumes ARFF two ways (SURVEY.md §2.1): Weka's
``ArffReader`` for the test set (``Hadoop.java:66-71``) and a naive
"skip lines starting with '@', split on comma" stream for the train
set (``Hadoop.java:88-100``). Spark has no ARFF connector, so this
module parses the ``@attribute`` header into a ``StructType`` and
delegates the data section to the CSV reader with ``comment='@'`` —
the header filter (P1) and tokenize/cast projection (P2) happen
inside the scan, and the file splits/parallelizes like any text
source (the reference's eager whole-file read does not).

NUMERIC/REAL/INTEGER attributes map to double columns; nominal
(``{a,b,c}``) and ``string`` attributes map to string columns;
``date [format]`` attributes map to timestamp columns (read as
string at the scan, parsed with ``to_timestamp`` per column so each
date attribute keeps its own Weka SimpleDateFormat pattern — the
subset of patterns Weka actually emits, ``yyyy MM dd HH mm ss`` plus
quoted literals, is valid Spark ``DateTimeFormatter`` syntax too).
This matches Weka's ``ArffReader`` surface — though the reference's
distance math assumes numeric (``Hadoop.java:155-165``), so the
feature projection (``read_arff_features``) rejects non-numeric
columns with a clear error. ``relational`` attributes raise (no
counterpart in Weka's own flat-file pipeline either).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ArffFormatError(ValueError):
    pass


# Weka's default date pattern (ISO-8601); valid for both Java's
# SimpleDateFormat (what Weka uses) and Spark's DateTimeFormatter.
WEKA_DEFAULT_DATE_FORMAT = "yyyy-MM-dd'T'HH:mm:ss"


def parse_arff_schema(header_lines: list[str]) -> T.StructType:
    """StructType from ``@attribute`` declarations.

    NUMERIC/REAL/INTEGER -> double; ``{a,b,c}`` nominal and
    ``string`` -> string (Weka's reader parses these too,
    ``Hadoop.java:66-71``); ``date [format]`` -> timestamp, with the
    declared format kept in the field metadata under
    ``arff_date_format`` (Weka default ISO-8601 when omitted);
    ``relational`` raises.
    """
    fields = []
    for line in header_lines:
        s = line.strip()
        if not s.lower().startswith("@attribute"):
            continue
        parts = s.split(None, 2)
        if len(parts) != 3:
            raise ArffFormatError(f"malformed attribute line: {line!r}")
        _, name, typ = parts
        typ = typ.strip()
        metadata: dict | None = None
        if typ.upper() in ("NUMERIC", "REAL", "INTEGER"):
            dtype: T.DataType = T.DoubleType()
        elif typ.startswith("{") and typ.endswith("}") or (
            typ.upper() == "STRING"
        ):
            dtype = T.StringType()
        elif typ.lower() == "date" or typ.lower().startswith("date "):
            dtype = T.TimestampType()
            fmt = typ[4:].strip().strip('"') or WEKA_DEFAULT_DATE_FORMAT
            metadata = {"arff_date_format": fmt}
        else:
            raise ArffFormatError(
                f"unsupported ARFF type {typ!r} for {name!r}: numeric, "
                "nominal {...}, string and date attributes are supported"
            )
        fields.append(
            T.StructField(name, dtype, nullable=False, metadata=metadata)
        )
    if not fields:
        raise ArffFormatError("no @attribute declarations found")
    return T.StructType(fields)


def read_arff(spark: SparkSession, path: str) -> DataFrame:
    """Read a numeric ARFF file into a typed DataFrame.

    The header scan collects only ``@attribute`` lines (schema
    metadata, not data) to the driver; the data section streams
    through the distributed CSV scan.
    """
    header = (
        spark.read.text(path)
        .filter(F.lower(F.col("value")).startswith("@attribute"))
        .collect()
    )
    schema = parse_arff_schema([r.value for r in header])
    # date columns scan as string (each keeps its own declared
    # format) and parse per-column below; under Spark 4's default
    # ANSI mode to_timestamp throws on malformed input, preserving
    # the fail-fast contract through the conversion.
    date_formats = {
        f.name: f.metadata["arff_date_format"]
        for f in schema.fields
        if isinstance(f.dataType, T.TimestampType)
    }
    scan_schema = T.StructType(
        [
            T.StructField(f.name, T.StringType(), False)
            if f.name in date_formats
            else f
            for f in schema.fields
        ]
    )
    # FAILFAST: the schema declares nullable=False, and PERMISSIVE
    # mode would contradict it by turning malformed/short data lines
    # into nulls that flow on into distance arithmetic (ADVICE r1) —
    # error at the scan instead.
    # quote="'" — ARFF quotes values Weka-style with SINGLE quotes
    # (write_arff emits them for values containing separators); the
    # default escape char is already backslash, matching Weka's \'
    df = spark.read.csv(
        path, schema=scan_schema, comment="@", mode="FAILFAST",
        quote="'",
    )
    for name, fmt in date_formats.items():
        df = df.withColumn(name, F.to_timestamp(F.col(name), fmt))
    return df


def read_arff_features(
    spark: SparkSession, path: str
) -> DataFrame:
    """ARFF -> (id, features array<double>, label int).

    The reference's positional contract (``Hadoop.java:123,159,325``):
    last attribute is the integer-truncated class label, the rest are
    features. Row ids follow file order (the reference keys its
    output by test-row position), which is well-defined here because
    an ARFF file is a single ordered text file — at engine scale you
    would carry an explicit key column instead.
    """
    df = read_arff(spark, path)
    non_numeric = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, T.DoubleType)
    ]
    if non_numeric:
        raise ArffFormatError(
            "feature projection needs numeric attributes, but "
            f"{non_numeric} are nominal/string — like the reference's "
            "distance math (Hadoop.java:155-165), KNN is numeric-only; "
            "index nominal columns upstream first"
        )
    cols = df.columns
    feature_cols, label_col = cols[:-1], cols[-1]
    return _with_file_order_id(df).select(
        "id",
        F.array(*[F.col(c) for c in feature_cols]).alias("features"),
        F.col(label_col).cast("int").alias("label"),
    )


def _with_file_order_id(df: DataFrame) -> DataFrame:
    """Add an ``id`` column numbering rows in file order — without a
    global sort.

    zipWithIndex pattern, two passes over the scan:

    1. count rows per input partition (a tiny pre-aggregated shuffle:
       one row per partition reaches the driver), take a running sum
       in partition order -> each partition's starting offset;
    2. id = offset[partition] + record-number-within-partition.

    The within-partition record number comes from
    ``monotonically_increasing_id``'s documented layout (partition id
    in the upper bits, a 33-bit per-partition counter from 0 in the
    lower bits), so no row ever crosses a partition boundary: no
    WindowExec, no single-partition sort — the anti-pattern the
    round-1 bench tail flagged. File splits are deterministic, so the
    two passes see identical partitioning. The offsets relation is one
    row per partition; it broadcast-joins.
    """
    if df.rdd.getNumPartitions() == 1:
        # single input split (the common ARFF case): the per-partition
        # record counter IS the file-order id — no counting pass, no
        # join, metadata-only check
        return df.withColumn(
            "id", F.monotonically_increasing_id().cast("int")
        )
    base = df.withColumn("_pid", F.spark_partition_id())
    counts = (
        base.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in sorted((r["_pid"], r["_cnt"]) for r in counts):
        offsets.append((pid, acc))
        acc += cnt
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _off long"
    )
    return (
        base.withColumn("_mid", F.monotonically_increasing_id())
        .join(F.broadcast(off_df), "_pid")
        # low 33 bits of _mid = record number within the partition
        .withColumn(
            "id",
            (F.col("_off") + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)))
            .cast("int"),
        )
        .drop("_pid", "_mid", "_off")
    )


def write_arff(
    df: DataFrame,
    path: str,
    relation: str = "spark",
    *,
    single_file: bool = True,
) -> None:
    """ARFF sink: the write half of the connector (Weka interchange).

    Emits ``@relation`` / ``@attribute`` header lines followed by the
    CSV data section. Type mapping inverts the reader's: double ->
    NUMERIC (integral doubles print without a trailing ``.0`` like
    Weka's own writer), int/long -> NUMERIC, string -> string,
    timestamp -> ``date`` with the Weka default ISO-8601 format.
    The header rides as ordered rows unioned ahead of the data
    relation, so the file is produced by the distributed text sink —
    no driver-side buffering of data rows. ``single_file=True``
    (default) coalesces to Weka's one-file expectation; with it off
    you get a part-file directory where only part-00000 carries the
    header (concatenate to feed Weka).

    Weka-conformant value encoding (ADVICE r3 #1): string values
    containing separators (comma, whitespace, quotes, braces, ``%``,
    backslash — all legal inside Weka string attributes) are wrapped
    in single quotes with backslash-escaped quotes/backslashes, and
    NULL fields are written as ARFF's missing marker ``?`` — unquoted
    nulls would otherwise be silently DROPPED by concat_ws, shifting
    every later column one slot left. Note this module's own reader
    deliberately rejects missing values (nullable=False + FAILFAST,
    ADVICE r1), so files written from null-bearing frames are for
    Weka interchange; round-tripping through ``read_arff`` requires
    null-free input.
    """
    header_lines = [f"@relation {relation}"]
    cols = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn in ("double", "float", "integer", "long", "short", "byte"):
            atype = "NUMERIC"
            # Weka prints integral numerics without the double
            # suffix; format_number would add commas, so strip the
            # trailing '.0' textually.
            cexpr = F.regexp_replace(
                F.col(f.name).cast("double").cast("string"),
                r"\.0$",
                "",
            )
        elif tn == "string":
            atype = "string"
            v = F.col(f.name)
            # escape chain per Weka Utils.backQuoteChars: backslash
            # first, then quote, then newline/CR as literal \n / \r
            # (they would break the line-oriented format otherwise)
            esc = F.regexp_replace(
                F.regexp_replace(v, r"\\", r"\\\\"), "'", r"\\'"
            )
            esc = F.regexp_replace(esc, "\n", r"\\n")
            esc = F.regexp_replace(esc, "\r", r"\\r")
            escaped = F.concat(F.lit("'"), esc, F.lit("'"))
            # quote triggers: separators/specials, empty, and the
            # literal '?' — unquoted it reads back as the missing
            # marker, making a real "?" string and NULL
            # indistinguishable (Weka quotes it too; ADVICE r4 #1)
            cexpr = F.when(
                (v == "")
                | (v == "?")
                | v.rlike("[ ,\t'\"{}%\n\r\\\\]"),
                escaped,
            ).otherwise(v)
        elif tn == "timestamp":
            atype = f"date \"{WEKA_DEFAULT_DATE_FORMAT}\""
            cexpr = F.date_format(f.name, WEKA_DEFAULT_DATE_FORMAT)
        else:
            raise ArffFormatError(
                f"cannot write column {f.name!r} of type {tn} to ARFF"
            )
        header_lines.append(f"@attribute {f.name} {atype}")
        cols.append(F.coalesce(cexpr, F.lit("?")))  # ARFF missing mark
    header_lines.append("@data")

    spark = df.sparkSession
    header = spark.createDataFrame(
        [(i, line) for i, line in enumerate(header_lines)],
        "ord long, value string",
    )
    # ord is TOTAL over data rows (header offset + the partition-major
    # monotonic id), not one shared constant: sortWithinPartitions is
    # not stable, so a shared ord left the single-file row order
    # unspecified while the reader assigns doc ids BY file order
    # (ADVICE r3 #3)
    data = df.select(
        (
            F.lit(len(header_lines))
            + F.monotonically_increasing_id()
        ).alias("ord"),
        F.concat_ws(",", *cols).alias("value"),
    )
    out = header.unionByName(data)
    if single_file:
        out = out.coalesce(1)
    (
        out.sortWithinPartitions("ord")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )
