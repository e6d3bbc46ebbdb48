"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact-KNN classification on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the north-star extension ops, backed
by ``knn_using_hadoop_spark.contract``'s registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knn_using_hadoop_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact KNN classification (k=3) over sf0.001 lineitem.

    The reference's one query (SURVEY.md §2): broadcast cross join ->
    squared-Euclidean distance -> per-test-row top-k (WindowGroupLimit)
    -> majority vote with deterministic tie-breaks.
    """
    return contract.q_knn_predict(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
