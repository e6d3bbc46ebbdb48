"""Feature-vector assembly helpers.

The reference's schema contract is positional — last ARFF column is
the label, the rest are features, parsed into a ``double[]``
(``Hadoop.java:93-100,123,159``). Here features are an explicit
``array<double>`` column assembled from named columns, which keeps the
label/feature split declarative and lets Catalyst prune unused source
columns at the parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assemble_features(cols: Sequence[str | Column]) -> Column:
    """``array<double>`` column from numeric columns (cast to double)."""
    return F.array(
        *[
            (F.col(c) if isinstance(c, str) else c).cast("double")
            for c in cols
        ]
    )


def with_features(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str | None = None,
    id_col: str | Column | None = None,
    out: str = "features",
) -> DataFrame:
    """Project a table to ``(id?, features, label?)``.

    Column pruning: only the named columns survive, so the parquet
    scan's ReadSchema shrinks accordingly.
    """
    proj: list[Column] = []
    if id_col is not None:
        proj.append(
            (F.col(id_col) if isinstance(id_col, str) else id_col).alias("id")
        )
    proj.append(assemble_features(feature_cols).alias(out))
    if label_col is not None:
        proj.append(F.col(label_col).cast("int").alias("label"))
    return df.select(*proj)
