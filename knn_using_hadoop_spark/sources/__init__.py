"""Sources: parquet table catalog + ARFF reader."""

from knn_using_hadoop_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
