"""Sources: parquet table catalog + ARFF reader + sinks."""

from knn_using_hadoop_spark.sources.sinks import (
    merge_into_parquet,
    write_parquet,
    write_tsv,
)
from knn_using_hadoop_spark.sources.tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "merge_into_parquet",
    "write_parquet",
    "write_tsv",
]
