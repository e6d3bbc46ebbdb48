"""ARFF as a first-class Spark data source: ``spark.read.format("arff")``.

Spark 4's Python Data Source API (SPARK-44076) lets the engine expose
the reference's input format (SURVEY.md §2.1, Hadoop.java:66-100) as a
real connector instead of a helper function: schema inference from the
``@attribute`` header at planning time, then parallel byte-range reads
of the data section — the same split model Hadoop's TextInputFormat
gives the reference's mapper, re-expressed for Spark's planner.

Split protocol (the classic text-split alignment): partition i covers
bytes [start, end); a reader whose range starts mid-file skips the
remainder of the line it lands in (that line belongs to partition
i-1), then reads whole lines until it crosses ``end``. Every byte is
owned by exactly one partition, so rows are read exactly once without
any coordination.

The function-style reader (``sources/arff.py``, CSV-scan based) stays
the hot path — JVM-side parsing beats per-row Python. This connector
is the API-surface form: it composes with everything that takes a
format name, and its read path is the template for formats Spark has
no scan for at all.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from knn_using_hadoop_spark.sources.arff import parse_arff_schema


class _ArffRange(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ArffDataSourceReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("arff source requires a path")
        self.n_parts = int(options.get("numPartitions", "4"))
        self.schema = schema

    def partitions(self):
        import os

        size = os.path.getsize(self.path)
        n = max(1, min(self.n_parts, size))
        step = size // n
        cuts = [i * step for i in range(n)] + [size]
        return [
            _ArffRange(self.path, cuts[i], cuts[i + 1]) for i in range(n)
        ]

    def read(self, partition: _ArffRange):
        import datetime

        def _date_cast(java_fmt: str):
            # The SimpleDateFormat subset Weka emits -> strptime.
            py_fmt = java_fmt
            for j, p in (
                ("yyyy", "%Y"),
                ("MM", "%m"),
                ("dd", "%d"),
                ("HH", "%H"),
                ("mm", "%M"),
                ("ss", "%S"),
                ("'T'", "T"),
            ):
                py_fmt = py_fmt.replace(j, p)
            return lambda v: datetime.datetime.strptime(
                v.strip("'\""), py_fmt
            )

        casts = []
        for f in self.schema.fields:
            tn = f.dataType.typeName()
            if tn == "double":
                casts.append(float)
            elif tn == "timestamp":
                casts.append(_date_cast(f.metadata["arff_date_format"]))
            else:
                casts.append(str)
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            if partition.start > 0:
                fh.readline()  # partial line belongs to the previous split
            while fh.tell() <= partition.end:
                raw = fh.readline()
                if not raw:
                    break
                line = raw.decode("utf-8").strip()
                if not line or line.startswith(("@", "%")):
                    continue
                vals = line.split(",")
                yield tuple(c(v.strip()) for c, v in zip(casts, vals))


class ArffDataSource(DataSource):
    """``spark.dataSource.register(ArffDataSource)`` then
    ``spark.read.format("arff").option("numPartitions", 8).load(p)``."""

    @classmethod
    def name(cls) -> str:
        return "arff"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("arff source requires a path")
        header: list[str] = []
        with open(path, "rb") as fh:
            for raw in fh:
                line = raw.decode("utf-8").strip()
                if line.lower().startswith("@data"):
                    break
                if line.lower().startswith("@attribute"):
                    header.append(line)
        return parse_arff_schema(header)

    def reader(self, schema) -> DataSourceReader:
        return ArffDataSourceReader(self.options, schema)
