"""Driver-contract query registry: Spark callable + DuckDB oracle per op.

Every operator claimed in SURVEY.md §2 (plus the north-star extension
ops) gets a named entry here: a ``(spark, sf_dir) -> DataFrame``
callable exercising the engine's DataFrame code path, and an
ANSI-SQL twin that DuckDB runs on the same parquet tables. The driver
compares row count + schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* floating aggregates over unordered groups are rounded (sum order is
  nondeterministic across engines; rounding absorbs the ulp noise);
* sequential float expressions (the KNN distance) are written with
  the same left-to-right association in both engines so they are
  bit-exact un-rounded;
* ties are always broken by a unique key so rankings are stable.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.features import assemble_features
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.operators.topk import top_k_per_group
from knn_using_hadoop_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible (rows-only check)


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle)
        return fn

    return deco


