"""Per-group top-k — the reference's core operator, generalized.

The reference hand-rolls this twice: a map-side sorted-insert combiner
(``Hadoop.java:102-142``) and a single-reducer positional merge
(``Hadoop.java:194-239``, buggy for >1 map task). In Spark it is one
window-rank; InferWindowGroupLimit (Spark >= 3.5) plants a partial
top-k below the shuffle automatically, so the map-side-combine effect
is planner-derived.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top k rows per group under the given ordering (row_number semantics).

    Include a unique column last in ``order_cols`` for deterministic
    output under ties.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
