"""Time-series operators: calendar gap-filling and first-seen cohorts.

Analytics-engine staples the reference lacks entirely (SURVEY.md §2.9
lists no date/time operators). Both are pure DataFrame compositions:
Catalyst handles pushdown, and the only shuffles are keyed
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    count_col: str = "n_events",
) -> DataFrame:
    """Zero-filled daily counts per key over the global date span.

    Returns (key_col, day, count_col) with one row for EVERY
    (key, day) in [min(ts)::date, max(ts)::date] — missing days get 0.
    The dense grid is built from two tiny aggregates (global bounds x
    distinct keys), so the cross join is broadcast-sized regardless of
    fact-table volume; the fact table itself is touched once by a
    partial+final count aggregation. At 100 TB the grid is still
    |keys| x |days| — explode the calendar, never the facts.
    """
    day = F.to_date(F.col(ts_col))
    counts = (
        df.groupBy(F.col(key_col), day.alias("day"))
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    bounds = df.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    grid = df.select(key_col).distinct().crossJoin(F.broadcast(calendar))
    return grid.join(counts, [key_col, "day"], "left").select(
        key_col,
        "day",
        F.coalesce(F.col(count_col), F.lit(0).cast("bigint")).alias(
            count_col
        ),
    )


def new_keys_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    out_col: str = "n_new",
) -> DataFrame:
    """First-seen cohort sizes: (day, out_col) = keys first observed
    that day. One min-aggregate per key, then a count per day —
    both map-side-combinable."""
    first = df.groupBy(key_col).agg(
        F.min(F.to_date(F.col(ts_col))).alias("day")
    )
    return first.groupBy("day").agg(
        F.count(F.lit(1)).alias(out_col)
    )


def rolling_distinct_daily(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing N-day distinct-key count per day (rolling actives).

    COUNT(DISTINCT) over a sliding window has no window-function form,
    and the naive range self-join (days x pairs) is a nested-loop join.
    The scale formulation is pure equi-shuffle: dedup to (day, key)
    pairs, then each pair EMITS the <= N days it contributes to via
    explode(sequence(day, day+N-1)) — bounded fan-out N — followed by
    a broadcast-semi filter to observed days and one distinct-agg
    shuffle keyed by day. No nested-loop join, no O(days x pairs)
    intermediate; every shuffle key is a calendar day.
    """
    pairs = events.select(
        F.to_date(ts_col).alias("day"), F.col(key).alias("k")
    ).distinct()
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", window_days - 1))
        ).alias("day"),
        "k",
    )
    return (
        contrib.join(F.broadcast(days), "day", "semi")
        .groupBy("day")
        .agg(F.countDistinct("k").alias(f"{key}s_{window_days}d"))
    )
