"""Advanced analytic-window and modeling operators.

Round-2 additions to the SQL surface beyond the reference's MapReduce
scope (SURVEY.md §2.9): the full ranking-function family, IGNORE-NULLS
forward fill, SCD2 history construction, rolling-frame anomaly
detection, and closed-form distributed OLS. All stay JVM-side
(whole-stage codegen; no Python UDFs) and shuffle at most once per
window partition key — window functions over the same
(PARTITION BY, ORDER BY) spec share a single sort, which the plan
tests pin.

Scale notes (100 TB framing): every window here is PARTITIONED — no
global-order window anywhere (the single-partition anti-pattern the
repo's contract.py docstring calls out). OLS reduces to a 6-number
aggregate per group (map-side partial, fixed-width shuffle rows), the
same shape Spark MLlib uses for its normal-equation solvers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_surface(
    df: DataFrame,
    part: str,
    rank_col: Column,
    tie: str,
    n_tiles: int = 4,
) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist / ntile over one
    shuffle.

    Two window specs with the same PARTITION BY but different ORDER
    BY: the rank family orders by the (deliberately coarse, tied)
    ``rank_col`` only — rank/dense_rank/percent_rank/cume_dist are
    functions of the order VALUES, so ties keep them deterministic
    and the tie semantics are actually exercised. ntile is a function
    of row POSITION, so it gets a fully-ordered spec (tie broken by a
    unique key) or its output would depend on engine-internal row
    order. Same partition key → Catalyst plans ONE Exchange feeding
    both Window nodes (pinned by the plan test); only the local sort
    runs twice.
    """
    w_rank = Window.partitionBy(part).orderBy(F.desc(rank_col))
    w_pos = Window.partitionBy(part).orderBy(F.desc(rank_col), F.asc(tie))
    return df.select(
        F.col(part),
        F.col(tie),
        rank_col.alias("rank_val"),
        F.rank().over(w_rank).alias("rnk"),
        F.dense_rank().over(w_rank).alias("dense_rnk"),
        F.round(F.percent_rank().over(w_rank), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_rank), 6).alias("cume"),
        F.ntile(n_tiles).over(w_pos).alias("tile"),
    )


def forward_fill(
    events: DataFrame,
    value_when: Column,
    part: str = "user_id",
) -> DataFrame:
    """Last-observation-carried-forward (gap-carry) per partition key.

    ``value_when`` is an expression that is non-null only on rows that
    carry an observation (e.g. the purchase amount on purchase
    events); every event row gets the latest preceding observation via
    ``last(..., ignorenulls=True)`` over an unbounded-preceding ROWS
    frame — the canonical sensor/price forward-fill. Runs in one
    partitioned window (no global sort); rows before the first
    observation stay null, exactly like SQL ``LAST_VALUE ...
    IGNORE NULLS``.
    """
    w = (
        Window.partitionBy(part)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        part,
        "ts",
        "event_type",
        F.round(
            F.last(value_when, ignorenulls=True).over(w), 2
        ).alias("carried_value"),
    )


def scd2_history(events: DataFrame, attr: str = "event_type") -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log.

    Per user, ordered by (ts, event_id): keep only rows where ``attr``
    differs from the previous row's (the change points), then
    valid_from = that row's ts and valid_to = the next change's ts
    (null = current version). Two window passes over the SAME
    partition+order spec — Catalyst evaluates both in a single sort.
    This is the standard warehouse pattern for dimension versioning
    from CDC streams; at scale the shuffle key is the dimension's
    natural key, so it partitions evenly.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_attr", F.lag(attr).over(w))
        .filter(
            F.col("prev_attr").isNull() | (F.col(attr) != F.col("prev_attr"))
        )
        .drop("prev_attr")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col(attr).alias("attr_value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def rolling_anomaly(
    events: DataFrame,
    frame: int = 9,
    min_n: int = 5,
    z_thr: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly flags over a bounded ROWS frame.

    Per user, each event's value is scored against the mean/stddev of
    the previous ``frame`` rows plus itself. ROWS (not RANGE) keeps
    the frame O(1) memory; rows with fewer than ``min_n`` observations
    or near-zero spread are unscored (stddev floor 0.01 — a z-score
    against noise-level spread is meaningless and numerically
    unstable). z rounded to 3 dp: the frame holds ≤10 doubles, so
    cross-engine summation-order noise is ~1e-11, far inside the
    rounding grid.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-frame, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    mean = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.when(
        (n >= min_n) & (sd > 0.01),
        F.round((F.col("value") - mean) / sd, 3),
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > z_thr)
        .withColumn("value", F.round("value", 2))
    )


def attribution_join(
    events: DataFrame,
    effect_type: str = "purchase",
    cause_type: str = "click",
    window_minutes: int = 10,
) -> DataFrame:
    """Interval (attribution) join: each effect event paired with
    every cause event by the same user in the preceding window.

    The product-analytics workhorse (click→purchase attribution,
    error→deploy correlation). Spark plans this as an equi-join on
    user_id with the time predicates as join filters — the range
    never becomes a cartesian product, and the shuffle key is the
    user, so it partitions like any large-large join. This batch form
    is the oracle twin of the stream-stream interval join in
    streaming/events.py (same predicate, watermark-bounded state).
    """
    # distinct column names on each side: a self-join on the shared
    # lineage would otherwise hit Spark's ambiguous-attribute
    # resolution (the "trivially true predicate" trap)
    causes = events.filter(F.col("event_type") == cause_type).select(
        F.col("event_id").alias("cause_id"),
        F.col("user_id").alias("cause_user"),
        F.col("ts").alias("cause_ts"),
    )
    effects = events.filter(F.col("event_type") == effect_type).select(
        F.col("event_id").alias("effect_id"),
        "user_id",
        F.col("ts").alias("effect_ts"),
    )
    return effects.join(
        causes,
        (F.col("user_id") == F.col("cause_user"))
        & (F.col("cause_ts") <= F.col("effect_ts"))
        & (
            F.col("cause_ts")
            > F.col("effect_ts")
            - F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    ).select(
        "effect_id",
        "cause_id",
        "user_id",
        F.round(
            F.col("effect_ts").cast("double")
            - F.col("cause_ts").cast("double"),
            3,
        ).alias("lag_secs"),
    )


def ols_trend(
    events: DataFrame,
    group: str = "event_type",
    scale_seconds: float = 86400.0,
) -> DataFrame:
    """Per-group closed-form OLS of value against event time.

    Distributed linear regression as a pure aggregate: slope =
    (nΣxy − ΣxΣy) / (nΣxx − (Σx)²) over x = days since the group's
    first event. Centering x at the group min before squaring is what
    makes this numerically sound — raw epoch seconds (~1.7e9) would
    cancel catastrophically in the denominator; centered day offsets
    (0..~30) keep every sum well inside double precision. The whole
    job is one partial-aggregated shuffle of 6 numbers per group —
    the same shape MLlib's normal-equation solver produces, and the
    scalable way to fit millions of per-key trends.
    """
    x_raw = F.col("ts").cast("double")
    wmin = Window.partitionBy(group)
    x = (x_raw - F.min(x_raw).over(wmin)) / F.lit(scale_seconds)
    base = events.select(
        F.col(group), x.alias("x"), F.col("value").alias("y")
    )
    agg = base.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        group,
        F.col("n"),
        F.round(slope, 6).alias("slope_per_day"),
        F.round(intercept, 4).alias("intercept"),
    )


def mad_outliers(
    events: DataFrame,
    group: str = "event_type",
    value: str = "value",
    mz_thr: float = 3.5,
    id_col: str = "event_id",
) -> DataFrame:
    """Robust outlier detection via median absolute deviation.

    The modified z-score 0.6745*(x - median)/MAD (Iglewicz & Hoaglin)
    is the standard robust alternative to mean/stddev z-scores — a
    single wild value cannot shift the threshold the way it inflates
    a standard deviation. Two grouped exact-percentile aggregates
    (median, then median of |x - median|) and a broadcast join back;
    both engines compute interpolated percentiles identically, so the
    scores need only output rounding. Groups with MAD = 0 (over half
    the values identical) are unscored rather than divided by zero.
    """
    med = events.groupBy(group).agg(
        F.expr(f"percentile({value}, 0.5)").alias("med")
    )
    with_med = events.join(F.broadcast(med), group)
    mad = with_med.groupBy(group).agg(
        F.expr(f"percentile(abs({value} - med), 0.5)").alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), group).withColumn(
        "mz",
        F.when(
            F.col("mad") > 0,
            F.round(
                0.6745 * (F.col(value) - F.col("med")) / F.col("mad"), 6
            ),
        ),
    )
    return scored.filter(F.abs(F.col("mz")) > mz_thr).select(
        id_col,
        group,
        value,
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "mz",
    )
