"""Z-order (Morton) codes for multi-dimensional clustering.

The data-skipping layout trick behind Delta/Iceberg ``OPTIMIZE
ZORDER``: interleaving the bits of two bucketed dimensions gives a
1-D sort key whose contiguous ranges are small rectangles in 2-D —
so files/row-groups written in Z-order carry tight min/max stats on
BOTH dimensions, and a scan filtering on either (or both) prunes
most of them. A plain sort clusters only its leading column; Z-order
shares the clustering budget.

Everything here is integer shift/mask arithmetic inside whole-stage
codegen (one static expression per bit), deterministic, and exactly
reproducible in the DuckDB oracle via the generated SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i holds b's bit i, bit 2i+1 holds a's bit i."""
    code: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return code


def morton_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin of ``morton_code`` (same shifts, same masks).

    Every term is FULLY parenthesized: DuckDB gives `|`, `&`, `<<`
    the same precedence with left associativity, so an unparenthesized
    `t1 | x << 3` parses as `(t1 | x) << 3` and the accumulated OR
    gets shifted into overflow.
    """
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({b_expr}) >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    zcode: Column,
    path: str,
    n_files: int = 8,
) -> None:
    """Write parquet clustered by Z-order code.

    ``repartitionByRange`` on the code splits the Z-curve into
    contiguous segments (one per output file), and the within-
    partition sort keeps row groups tight too — together they give
    every file a small bounding box in the original dimensions, which
    is what makes min/max pruning effective. At table scale this is
    the per-partition OPTIMIZE job, not a full-table rewrite.
    """
    (
        df.withColumn("_z", zcode)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
