"""Join-side pruning: a deterministic Bloom-style runtime filter.

At 100 TB the expensive part of a selective fact⋈dim join is shuffling
fact rows that will never match. Spark's AQE can inject runtime bloom
filters; this operator is the explicit, engine-owned version — and
because Bloom false positives are eliminated by the exact join that
follows, the RESULT is identical to the plain join, so the operator
gets a full DuckDB oracle (the plain-join SQL) even though the filter
itself is approximate.

The filter is a plain relational construction (no sketch jars, no
RNG): the build side's join keys are hashed to ``n_hashes`` bit
positions in an ``m``-bit space; the distinct positions are collected
into ONE array row and broadcast; the probe side keeps rows whose
every position is present (``array_contains`` AND-chain). False-
positive rate follows the standard Bloom bound (~(1-e^{-kn/m})^k).
The broadcast payload is at most m distinct ints — fixed-size,
independent of build-side row count, which is the point: a semi-join
would broadcast the full key set.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import portable_hash32


def _positions(key, m: int, n_hashes: int):
    # independent hash slices via salted md5; modulo folds to [0, m)
    return [
        portable_hash32(F.concat(key.cast("string"), F.lit(f"#{i}"))) % m
        for i in range(n_hashes)
    ]


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    *,
    m: int = 8192,
    n_hashes: int = 2,
    how: str = "inner",
) -> DataFrame:
    """``probe ⋈ build`` with a Bloom pre-filter on the probe side.

    Result is EXACTLY ``probe.join(build, key, how)`` — the filter
    only removes rows the join would drop anyway. ``how`` must be a
    join type where pruning the probe side is sound (inner/left_semi).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom pruning the probe side is only sound for "
            f"inner/left_semi joins, got {how!r}"
        )
    bits = (
        build.select(
            F.explode(F.array(*_positions(F.col(key), m, n_hashes))).alias(
                "bit"
            )
        )
        .distinct()
        .agg(F.collect_set("bit").alias("bits"))
    )
    probe_pos = _positions(F.col(key), m, n_hashes)
    keep = reduce(
        lambda a, b: a & b,
        [F.array_contains(F.col("bits"), p) for p in probe_pos],
    )
    pruned = (
        probe.join(F.broadcast(bits))  # 1-row broadcast, no shuffle
        .filter(keep)
        .drop("bits")
    )
    return pruned.join(build, key, how)


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr,
    max_edit: int = 3,
) -> DataFrame:
    """Blocked fuzzy self-match: name pairs within edit distance
    ``max_edit``, candidate-limited to a blocking key.

    The entity-resolution staple. All-pairs Levenshtein is O(n^2)
    string compares — never viable; the blocking key (caller-chosen,
    e.g. a token, a phonetic code, a length band) turns it into a
    per-block self-join, so cost is Σ block² like the LSH band joins.
    Both engines implement standard (unit-cost) Levenshtein, so the
    distance is integer-exact cross-engine — no rounding protocol
    needed.
    """
    keyed = df.select(
        F.col(id_col), F.col(name_col), block_expr.alias("blk")
    )
    a = keyed.select(
        F.col("blk"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = keyed.select(
        F.col("blk"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_edit)
    )
