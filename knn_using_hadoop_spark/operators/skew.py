"""Skew-handling utilities: salted aggregation and salted joins.

At 100 TB, hot keys (a viral user, an empty-string token, a default
timestamp) turn one shuffle partition into the whole job's critical
path. Two standard remedies, both pure DataFrame:

* AQE skew-join splitting (on by default in session.py) — handles
  skewed JOIN partitions at runtime;
* explicit SALTING (here) — for aggregations and joins where the
  skew is known or measured: spread each hot key over ``n_salts``
  sub-keys, combine per sub-key (map-side-heavy), then combine the
  sub-aggregates.

Salting a well-distributed key is pure overhead — measure first.
Results are identical to the unsalted op (the oracle for the salted
contract query IS the plain aggregate), only the shuffle layout
changes: the hot key's rows land on n_salts partitions instead of 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage count+sum aggregate with a salted first stage.

    Stage 1 groups on (group_cols..., salt) — the hot key fans out
    over ``n_salts`` reducers; stage 2 combines the (at most
    n_salts) partial rows per key. Output: (group_cols..., cnt, total).

    The salt must be deterministic per ROW, not per key — a random
    salt breaks retry/speculation determinism; we derive it from a
    hash of the whole row's sum value and a monotonic component is
    unnecessary since only the DISTRIBUTION matters, not which salt a
    row gets. spark_partition_id is used: already uniform over input
    splits and costs nothing.
    """
    salted = df.withColumn(
        "_salt", F.spark_partition_id() % F.lit(n_salts)
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(sum_col).alias("_sum"),
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum").alias("total"),
    )


def salted_join_big_to_skewed(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed.

    Salts the big side's rows and EXPLODES the small side n_salts
    ways so every (key, salt) pair can meet its partner. Equivalent
    rows to ``big.join(small, key)``; the hot key's probe rows spread
    over n_salts partitions. Use when AQE's skew splitting can't help
    (e.g., the skew is in an aggregation feeding the join).
    """
    salted_big = big.withColumn(
        "_salt", F.spark_partition_id() % F.lit(n_salts)
    )
    exploded_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    out = salted_big.join(exploded_small, [key, "_salt"])
    return out.drop("_salt")


def key_skew_profile(
    df: DataFrame, key_cols: Sequence[str | Column], top: int = 10
) -> DataFrame:
    """Top-N heaviest keys with their share of all rows.

    The measurement step that should precede any salting decision.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return (
        counts.withColumn(
            "share", F.round(F.col("n") / F.lit(float(total)), 6)
        )
        .orderBy(F.col("n").desc())
        .limit(top)
    )
