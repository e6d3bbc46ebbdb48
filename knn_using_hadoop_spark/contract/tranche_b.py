"""Session 4-5 tranches: stats, timeseries, streaming twins, TPC-H family, text/embedding surfaces (part B).

Split from the former monolithic contract.py (round 3); original lines 6116-7466. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import graph as _graph  # noqa: E402
from knn_using_hadoop_spark.operators import text as _text  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.graph_queries import (_EDGES_SQL, _edges)

# noqa: E402  (split module: original source follows)


@_register(
    "tpch_q4_late_orders",
    """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
)
def q_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least
    one late lineitem (shipped >60 days after the order; the
    synthetic lineitem has no commit/receipt dates, so lateness is
    ship-vs-order-date — same EXISTS-decorrelation shape).

    The correlated EXISTS becomes a LEFT SEMI join on the order key
    with the lateness comparison as a join-side predicate; the date
    range pushes to the orders scan first, so the semi join probes
    only the quarter's orders. Semi stops at first match per order —
    no dedup pass, no row multiplication.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (
                li.l_shipdate
                > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "events_time_weighted_avg",
    """WITH seq AS (
  SELECT user_id, value, epoch(ts) AS t,
         lead(epoch(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
  FROM events)
SELECT user_id,
       count(*) AS n_intervals,
       round(sum(value * (t_next - t)) / sum(t_next - t), 6) AS twap,
       round(avg(value), 6) AS plain_avg
FROM seq WHERE t_next IS NOT NULL
GROUP BY user_id""",
)
def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each reading holds until the next
    one, so its weight is the interval length — the correct mean for
    irregularly-sampled series (plain_avg is emitted alongside to show
    the sampling bias). Financial OHLC/TWAP and sensor-rollup shape.

    One user-partitioned window (lead) feeding one partial-agg
    groupBy on the same key — Catalyst reuses the window's Exchange
    for the aggregate, so the whole query is a single shuffle.
    epoch seconds are bit-identical cross-engine (micros/1e6 in
    both); the weighted sums are order-nondeterministic doubles, so
    only the final ratio is compared, rounded to 6dp (relative ulp
    noise ~1e-15 cannot survive into 1e-6).
    """
    ev = load_table(spark, "events", sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("double")
    seq = ev.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lead(t).over(wu).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twap"),
        F.round(F.avg("value"), 6).alias("plain_avg"),
    )


@_register(
    "events_max_concurrency",
    """WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
                > 1800000000
         THEN 1 ELSE 0 END AS is_start
  FROM events),
sess AS (
  SELECT user_id, t,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked),
iv AS (
  SELECT user_id, session_no, min(t) AS t0, max(t) AS t1
  FROM sess GROUP BY user_id, session_no),
clipped AS (
  SELECT greatest(t0, day_idx * 86400000000) AS lo,
         least(t1, (day_idx + 1) * 86400000000) AS hi,
         day_idx
  FROM (SELECT *, unnest(generate_series(t0 // 86400000000,
                                         t1 // 86400000000)) AS day_idx
        FROM iv) d),
b AS (
  SELECT day_idx, lo AS t, 1 AS delta FROM clipped
  UNION ALL
  SELECT day_idx, hi AS t, -1 AS delta FROM clipped),
run AS (
  SELECT day_idx,
         sum(delta) OVER (PARTITION BY day_idx
                          ORDER BY t ASC, delta DESC
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cur
  FROM b)
SELECT make_timestamp(day_idx * 86400000000) AS day,
       max(cur) AS max_concurrent
FROM run GROUP BY day""",
)
def q_events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap sweep
    (capacity planning / peak-load shape): sessionize per user
    (30-min gap), clip each session interval to the days it spans
    (bounded fan-out, same trick as the rolling-distinct explode),
    then a +1/-1 boundary sweep with a running sum per day; the
    day's max prefix sum is its peak concurrency.

    All arithmetic is INTEGER microseconds (`unix_micros` /
    `epoch_us`) — no float time anywhere, so the sweep is exact
    cross-engine. Ends sort after starts at equal timestamps
    (delta DESC), i.e. intervals are closed: a 1-event session still
    registers, and back-to-back sessions touching at an instant
    count as concurrent. The sweep windows partition by DAY — the
    global-window anti-pattern never appears; per-day boundary counts
    are 2x the day's sessions, which is the quantity a 1000-executor
    cluster can always hold per partition.
    """
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_t = F.lag(us).over(wu)
    marked = ev.select(
        "user_id",
        "event_id",
        us.alias("t"),
        F.when(
            lag_t.isNull() | ((us - lag_t) > 1800000000), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    sess = marked.select(
        "user_id",
        "t",
        F.sum("is_start")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_no"),
    )
    day_us = F.lit(86400000000)
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    clipped = iv.select(
        F.explode(
            F.sequence(
                F.expr("t0 div 86400000000"), F.expr("t1 div 86400000000")
            )
        ).alias("day_idx"),
        "t0",
        "t1",
    ).select(
        "day_idx",
        F.greatest("t0", F.col("day_idx") * day_us).alias("lo"),
        F.least("t1", (F.col("day_idx") + 1) * day_us).alias("hi"),
    )
    b = clipped.select(
        "day_idx", F.col("lo").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        clipped.select(
            "day_idx", F.col("hi").alias("t"), F.lit(-1).alias("delta")
        )
    )
    run = b.select(
        "day_idx",
        F.sum("delta")
        .over(
            Window.partitionBy("day_idx")
            .orderBy(F.col("t").asc(), F.col("delta").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cur"),
    )
    return run.groupBy(
        F.timestamp_micros(F.col("day_idx") * day_us).alias("day")
    ).agg(F.max("cur").alias("max_concurrent"))


@_register(
    "orders_gaps_islands",
    """WITH days AS (
  SELECT DISTINCT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS day_idx
  FROM orders),
isl AS (
  SELECT o_custkey, day_idx,
         day_idx - row_number() OVER
           (PARTITION BY o_custkey ORDER BY day_idx) AS grp
  FROM days),
streaks AS (
  SELECT o_custkey, grp, count(*)::BIGINT AS streak_days,
         min(day_idx) AS start_day
  FROM isl GROUP BY o_custkey, grp)
SELECT o_custkey,
       count(*) AS n_streaks,
       max(streak_days) AS longest_streak,
       sum(streak_days)::BIGINT AS active_days
FROM streaks
WHERE o_custkey % 20 = 0
GROUP BY o_custkey""",
)
def q_orders_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-order-day streaks per customer
    (retention/engagement-streak shape). The classic trick — on
    consecutive days, day_index and row_number advance in lockstep,
    so their DIFFERENCE is constant per island and becomes the
    island's group key; no self-join, no recursion.

    Day arithmetic is integer microseconds div 86.4e9 — exact in
    both engines. Both windows and both aggregates partition on
    o_custkey, so after the distinct's shuffle everything is
    partition-local; the customer filter pushes to the scan.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_custkey") % 20 == 0
    )
    days = o.select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias(
            "day_idx"
        ),
    ).distinct()
    wc = Window.partitionBy("o_custkey").orderBy("day_idx")
    isl = days.select(
        "o_custkey",
        "day_idx",
        (F.col("day_idx") - F.row_number().over(wc)).alias("grp"),
    )
    streaks = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return streaks.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
        F.sum("streak_days").cast("bigint").alias("active_days"),
    )


@_register(
    "lineitem_abc_classification",
    """WITH pr AS (
  SELECT l_partkey,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
         sum(revenue) OVER () AS total_rev
  FROM pr),
classed AS (
  SELECT l_partkey, revenue,
         CASE WHEN cum_rev::DOUBLE / total_rev::DOUBLE <= 0.7 THEN 'A'
              WHEN cum_rev::DOUBLE / total_rev::DOUBLE <= 0.9 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class,
       count(*) AS n_parts,
       sum(revenue)::DECIMAL(38,8) AS class_revenue
FROM classed GROUP BY abc_class""",
)
def q_lineitem_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, bucketed
    by cumulative revenue share (A = first 70%, B = to 90%, C = tail).

    The cumulative window is global BY DEFINITION (a total ordering
    of parts) but runs over the already-aggregated part relation —
    dimension-sized, 1/30-1/50 of the fact rows, the
    post-aggregation global window this registry's protocol allows.
    Cumulative revenue stays decimal-EXACT through the window; the
    share division is one IEEE double op on exact inputs, identical
    in both engines, so class boundaries cannot flip — no rounding
    protocol needed anywhere.
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    pr = li.groupBy("l_partkey").agg(
        F.sum(price * disc1).cast("decimal(38,8)").alias("revenue")
    )
    wcum = Window.orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast(
        "double"
    )
    classed = pr.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum_rev"),
        F.sum("revenue").over(wall).alias("total_rev"),
    ).select(
        "l_partkey",
        "revenue",
        F.when(share <= 0.7, "A")
        .when(share <= 0.9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").cast("decimal(38,8)").alias("class_revenue"),
    )


@_register(
    "orders_yoy_growth",
    """WITH m AS (
  SELECT (year(o_orderdate) * 100 + month(o_orderdate))::INT AS ym,
         sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY ym)
SELECT cur.ym, cur.revenue, cur.n_orders,
       prev.revenue AS revenue_prev_year,
       round((cur.revenue::DOUBLE - prev.revenue::DOUBLE)
             / prev.revenue::DOUBLE, 6) AS yoy_growth
FROM m cur JOIN m prev ON prev.ym = cur.ym - 100""",
)
def q_orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month — the reporting staple. The
    calendar join (ym vs ym-100) is a self-join of the MONTH-sized
    aggregate, not a window lag (lag-12-rows silently lies when a
    month is missing from the series; the equi-join is
    correct-by-construction). Both sides broadcast at any SF —
    months don't scale with data. Revenue is decimal-exact; growth
    is the one double division, rounded.
    """
    o = load_table(spark, "orders", sf_dir)
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
            "ym"
        )
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return cur.join(
        F.broadcast(prev), F.col("prev.ym") == F.col("cur.ym") - 100
    ).select(
        F.col("cur.ym").alias("ym"),
        F.col("cur.revenue").alias("revenue"),
        F.col("cur.n_orders").alias("n_orders"),
        F.col("prev.revenue").alias("revenue_prev_year"),
        F.round(
            (
                F.col("cur.revenue").cast("double")
                - F.col("prev.revenue").cast("double")
            )
            / F.col("prev.revenue").cast("double"),
            6,
        ).alias("yoy_growth"),
    )


from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    countmin_estimates,
    countmin_oracle_sql,
)


@_register(
    "token_countmin_freq",
    countmin_oracle_sql(
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents",
        "tok",
    ),
)
def q_token_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch token-frequency estimates vs exact counts for
    the top-20 tokens (operators/sketches.py::countmin_estimates).
    The 192-counter sketch is built from the vocab-sized count
    relation (identical counters to hashing the raw stream, at
    O(|vocab|*depth) explode cost); overestimate >= 0 is the CMS
    one-sided error, exposed per probe."""
    toks = load_docs_wide(spark, sf_dir).select(
        F.explode(_text.tokens("text")).alias("tok")
    )
    return countmin_estimates(toks, "tok")


from knn_using_hadoop_spark.operators.linalg import (  # noqa: E402
    logreg_gd,
    logreg_gd_oracle_sql,
)

_LOGREG_FEATS_SQL = """SELECT l_quantity / 50 AS x1,
       l_discount * 10 AS x2,
       l_tax * 10 AS x3,
       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
FROM lineitem"""


@_register(
    "lineitem_logreg_returnflag",
    logreg_gd_oracle_sql(_LOGREG_FEATS_SQL, ["x1", "x2", "x3"], "y"),
)
def q_lineitem_logreg_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iterative ML training as aggregates: 3 rounds of full-batch
    logistic-regression gradient descent predicting returnflag='R'
    from scaled (quantity, discount, tax) —
    operators/linalg.py::logreg_gd. Each round is one
    partial-aggregated scan; weights are driver-side literals
    (constant plan depth); sigmoid/gradient rounding keeps both
    engines bit-identical round over round (PageRank protocol).
    The synthetic label is ~independent of the features, so the
    learned weights hover near the prior's logit — the point is the
    distributed-GD mechanics, not the fit."""
    feats = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_quantity") / 50).alias("x1"),
        (F.col("l_discount") * 10).alias("x2"),
        (F.col("l_tax") * 10).alias("x3"),
        F.when(F.col("l_returnflag") == "R", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    return logreg_gd(feats, ["x1", "x2", "x3"], "y")


# EWMA coefficients alpha*(1-alpha)^k, computed ONCE in Python and
# inlined as literals on BOTH sides (repr round-trips doubles exactly,
# so each engine parses the identical IEEE value — neither engine
# recomputes the power chain).
_EWMA_ALPHA = 0.3
_EWMA_K = 10
_EWMA_COEFS = [
    _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k for k in range(_EWMA_K + 1)
]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w * {c!r}, 0.0)"
        if k
        else f"value * {c!r}"
        for k, c in enumerate(_EWMA_COEFS)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL"
        f" THEN {c!r} ELSE 0.0 END"
        if k
        else f"{c!r}"
        for k, c in enumerate(_EWMA_COEFS)
    )
    return f"""SELECT user_id, event_id, ts, value,
       round(({num}) / ({den}), 6) AS ewma
FROM events WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


@_register("events_ewma", _ewma_oracle())
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback EWMA (alpha=0.3, K=10 lags) — exponential
    smoothing as a pure window expression. True EWMA is an infinite
    recursion no window function expresses; truncating at K=10 drops
    (1-alpha)^11 ≈ 2% of the mass, which the denominator renormalizes
    over the PRESENT terms (so early rows in each series are exact
    partial-mass averages, not biased toward zero).

    One user-partitioned window feeds all 11 lags — a single
    Exchange + sort, then branch-free projection. The whole
    expression is deterministic IEEE arithmetic on literal
    coefficients (inlined from one Python computation on both
    sides), left-to-right association matched — bit-exact
    cross-engine before the cosmetic 6dp rounding."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 25 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value") * F.lit(_EWMA_COEFS[0])
    den = F.lit(_EWMA_COEFS[0])
    for k in range(1, _EWMA_K + 1):
        lagk = F.lag("value", k).over(w)
        num = num + F.coalesce(
            lagk * F.lit(_EWMA_COEFS[k]), F.lit(0.0)
        )
        den = den + F.when(
            lagk.isNotNull(), F.lit(_EWMA_COEFS[k])
        ).otherwise(F.lit(0.0))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


@_register(
    "events_welch_ttest",
    """WITH s AS (
  SELECT count(*) FILTER (WHERE event_type = 'click') AS n1,
         count(*) FILTER (WHERE event_type = 'purchase') AS n2,
         round(avg(value) FILTER (WHERE event_type = 'click'), 6) AS m1,
         round(avg(value) FILTER (WHERE event_type = 'purchase'), 6)
           AS m2,
         round(var_samp(value) FILTER (WHERE event_type = 'click'), 6)
           AS v1,
         round(var_samp(value) FILTER (WHERE event_type = 'purchase'), 6)
           AS v2
  FROM events)
SELECT n1, n2, m1, m2,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS df_welch
FROM s""",
)
def q_events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase
    spend — the A/B-test primitive as ONE conditional-aggregate scan
    (no per-group subqueries, no second pass).

    Determinism: the five sufficient statistics are rounded to 6dp
    FIRST (absorbing summation-order and Welford-vs-sum-of-squares
    ulp differences between engines), then the t statistic and
    Welch-Satterthwaite df are pure IEEE arithmetic on those rounded
    stats — identical in both engines by construction. sqrt is an
    IEEE-exact operation (unlike exp/ln, it needs no extra guard).
    """
    ev = load_table(spark, "events", sf_dir)
    click = F.when(F.col("event_type") == "click", F.col("value"))
    purch = F.when(F.col("event_type") == "purchase", F.col("value"))
    s = ev.agg(
        F.count(click).alias("n1"),
        F.count(purch).alias("n2"),
        F.round(F.avg(click), 6).alias("m1"),
        F.round(F.avg(purch), 6).alias("m2"),
        F.round(F.var_samp(click), 6).alias("v1"),
        F.round(F.var_samp(purch), 6).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return s.select(
        "n1",
        "n2",
        "m1",
        "m2",
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 4
        ).alias("t_stat"),
        F.round(
            (se1 + se2)
            * (se1 + se2)
            / (
                se1 * se1 / (F.col("n1") - 1)
                + se2 * se2 / (F.col("n2") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@_register(
    "sql_lateral_topk",
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c
JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
WHERE c.c_custkey % 100 = 0""",
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    the SQL-native top-N-per-group, planned by Catalyst's lateral
    decorrelation (DecorrelateInnerQuery rewrites it to a join +
    per-key limit, the same shape as the window-rank form — no
    per-customer re-execution). Exercises the SQL entry path end to
    end; ties broken by the unique order key so the LIMIT-2 set is
    cross-engine deterministic."""
    sf = sf_dir
    for t in ("customer", "orders"):
        load_table(spark, t, sf).createOrReplaceTempView(t)
    return spark.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           FROM customer c
           JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                         WHERE o_custkey = c.c_custkey
                         ORDER BY o_totalprice DESC, o_orderkey
                         LIMIT 2) t
           WHERE c.c_custkey % 100 = 0"""
    )


@_register(
    "doc_zipf_slope",
    """WITH vocab AS (
  SELECT tok, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok),
pts AS (
  SELECT round(ln(row_number() OVER (ORDER BY cnt DESC, tok)), 6) AS lx,
         round(ln(cnt::DOUBLE), 6) AS ly
  FROM vocab),
s AS (
  SELECT count(*)::BIGINT AS n, sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * lx) AS sxx, sum(ly * ly) AS syy, sum(lx * ly) AS sxy
  FROM pts)
SELECT n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s""",
)
def q_doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log(freq) ~ log(rank) (natural Zipf slope ≈ -1; the synthetic
    corpus's flat token distribution yields a shallower tail — the
    diagnostic is exactly what the number is for).

    The rank window is global but runs over the VOCAB relation
    (sublinear in corpus size — post-aggregation global windows are
    this registry's allowed shape). ln() is libm, NOT IEEE-exact
    cross-engine, so both coordinates are rounded to 6dp BEFORE the
    sums; the closed-form OLS then rounds its three outputs (the
    log-log points are O(1-10), no catastrophic cancellation — the
    epoch-seconds centering lesson from events_ols_trend does not
    bite here)."""
    vocab = (
        load_docs_wide(spark, sf_dir)
        .select(F.explode(_text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wr = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    pts = vocab.select(
        F.round(F.log(F.row_number().over(wr).cast("double")), 6).alias(
            "lx"
        ),
        F.round(F.log(F.col("cnt").cast("double")), 6).alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@_register(
    "events_sliding_windowed_agg",
    """WITH assigned AS (
  SELECT event_type, value,
         make_timestamp(((epoch_us(ts) // 1800000000) - k) * 1800000000)
           AS window_start
  FROM events, unnest(generate_series(0, 1)) AS t(k)
  WHERE epoch_us(ts)
        < (((epoch_us(ts) // 1800000000) - k) + 2) * 1800000000
    AND ((epoch_us(ts) // 1800000000) - k) >= 0)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM assigned GROUP BY window_start, event_type""",
)
def q_events_sliding_windowed_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding (hopping) window aggregate: 1-hour windows every 30
    minutes — each event contributes to window/slide = 2 overlapping
    windows. Spark's F.window(slide) expands the assignment at plan
    time (an Expand node, factor 2 — bounded fan-out, not a join);
    the oracle states the same two-starts-per-event expansion
    explicitly: starts are the epoch-aligned 30-min marks s with
    s <= ts < s + 1h. Streaming twin:
    streaming/events.py::streaming_sliding_counts (same agg under a
    watermark; verified row-equal in test_streaming.py).

    All window arithmetic is integer microseconds — exact; the value
    sum is rounded (unordered float sum), count is exact.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_register(
    "orders_winsorized_stats",
    """WITH bounds AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.05)::DOUBLE, 6) AS p05,
         round(quantile_cont(o_totalprice, 0.95)::DOUBLE, 6) AS p95
  FROM orders GROUP BY o_orderpriority)
SELECT o.o_orderpriority,
       count(*) AS n,
       sum(CASE WHEN o_totalprice < p05 OR o_totalprice > p95
                THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
       round(avg(o_totalprice), 4) AS raw_mean,
       round(avg(least(greatest(o_totalprice, p05), p95)), 4)
         AS winsorized_mean
FROM orders o JOIN bounds b ON b.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority""",
)
def q_orders_winsorized_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized mean per priority — the robust-stats answer to
    heavy-tailed spend (clip at p5/p95, then average; compare against
    raw_mean to read the tail's pull).

    Two passes by necessity (bounds, then clip) but the bounds
    relation is GROUP-sized and broadcasts back — the fact table is
    scanned twice, shuffled on the same key once each, never joined
    wide. Percentile bounds are rounded to 6dp BEFORE clipping so
    the exact-interpolation ulp between engines can't reclassify a
    row at the boundary; the clipped values themselves are then
    exact doubles and only the final means need rounding.
    """
    o = load_table(spark, "orders", sf_dir)
    bounds = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
    )
    outside = (F.col("o_totalprice") < F.col("p05")) | (
        F.col("o_totalprice") > F.col("p95")
    )
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(outside.cast("int")).cast("bigint").alias("n_clipped"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        )
    )


@_register(
    "tpch_q7_trade_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INT AS l_year,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS volume
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year — the same dimension (nation) joined TWICE under different
    roles, with a cross-role disjunctive filter.

    Both nation legs broadcast (the dim appears twice in the plan,
    once per alias); supplier and customer broadcast at this SF but
    shuffle-join at 100 TB — either way the residual OR over
    (supp_nation, cust_nation) is evaluated after both legs resolve,
    and Catalyst pushes the derived IN('NATION_3','NATION_7') filter
    into EACH nation scan, so the fact join only sees rows from the
    two nations rather than filtering post-hoc.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(price * disc1).cast("decimal(38,8)").alias("volume"))
    )


@_register(
    "graph_bfs_depths",
    _graph.bfs_oracle_sql(_EDGES_SQL, rounds=3),
)
def q_graph_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distances (3 levels) from the minimum-id node of the
    co-occurrence graph — reachability/radius analytics
    (operators/graph.py::bfs_depths). Integer distances make this
    the one iterative-graph op with NO float protocol: the unrolled
    relaxations are exact in both engines by construction."""
    return _graph.bfs_depths(_edges(spark, sf_dir), rounds=3)


@_register(
    "events_moving_median",
    """SELECT user_id, event_id, ts, value,
       round(CASE WHEN len(arr) % 2 = 1
                  THEN arr[(len(arr) + 1) // 2]
                  ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1])
                       / 2 END, 6) AS med7
FROM (
  SELECT user_id, event_id, ts, value,
         list_sort(list(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM events WHERE user_id % 25 = 0) t""",
)
def q_events_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a trailing 7-row window — the robust
    smoother (rolling mean breaks on spikes; median doesn't). No
    engine exposes percentile as a window function portably, so the
    frame's values are collected, sorted, and indexed: both engines
    then compute the SAME (a+b)/2 midpoint association for even
    frames — deterministic without trusting each engine's
    quantile-interpolation arithmetic. Frame size is a 7-element
    array per row — bounded state, unlike an unbounded collect.
    """
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 25 == 0
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2).cast("int") + 1)
    ) / 2
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(
            F.when(n % 2 == 1, odd).otherwise(even), 6
        ).alias("med7"),
    )


@_register(
    "events_key_skew_profile",
    """WITH per_key AS (
  SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY user_id)
SELECT length(cnt::VARCHAR)::INT AS digits,
       count(*) AS n_keys,
       min(cnt) AS min_cnt,
       max(cnt) AS max_cnt,
       sum(cnt)::BIGINT AS total_rows
FROM per_key GROUP BY digits""",
)
def q_events_key_skew_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shuffle-key skew diagnosis: per-key row counts histogrammed by
    decimal magnitude (digit count — integer-exact in both engines,
    no libm log) — the first query to run before picking a salt
    factor or trusting AQE's skew threshold on a new key. Two
    partial-aggregated shuffles, the second over the key-sized count
    relation."""
    ev = load_table(spark, "events", sf_dir)
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_key.groupBy(
        F.length(F.col("cnt").cast("string")).alias("digits")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
    )


@_register(
    "lineitem_brand_affinity",
    """WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey),
n_orders AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM ob),
brand_cnt AS (
  SELECT p_brand, count(*)::BIGINT AS cnt FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         count(*)::BIGINT AS both_cnt
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                     AND a.p_brand < b.p_brand
  GROUP BY brand_a, brand_b
  HAVING count(*) >= 20)
SELECT brand_a, brand_b, both_cnt,
       round(both_cnt / n::DOUBLE, 6) AS support,
       round(both_cnt / ca.cnt::DOUBLE, 6) AS confidence_a_b,
       round(both_cnt * n::DOUBLE / (ca.cnt * cb.cnt), 6) AS lift
FROM pairs
JOIN brand_cnt ca ON ca.p_brand = brand_a
JOIN brand_cnt cb ON cb.p_brand = brand_b
CROSS JOIN n_orders""",
)
def q_lineitem_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brands co-purchased in an
    order: support / confidence / lift — the A-priori first pass.

    The pair build self-joins the (order, brand) relation on the
    order key: fan-out is bounded by per-order DISTINCT brands
    (<= lines per order, ~7 here — the same bounded-group argument
    as the co-occurrence graph; a pathological mega-order would need
    the graph builder's group cap). Brand marginals and the order
    count are tiny relations broadcast into the final projection.
    Counts are exact; the three ratios are single IEEE divisions on
    exact integers (n*both_cnt fits bigint), rounded for repr.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    # the order count rides as a broadcast one-row relation (exactly
    # the oracle's n_orders CTE cross join) instead of an eager
    # .count() — the r11 shape paid a separate full
    # lineitem-join-distinct job per invocation BEFORE the real one;
    # as a relation, Catalyst's ReuseExchange shares ob's distinct
    # across the count, the marginals and both self-join sides
    # (r11 optimization round; same IEEE divisions, values unchanged)
    nrel = F.broadcast(
        ob.agg(
            F.count_distinct(F.col("l_orderkey")).alias("_n")
        )
    )
    brand_cnt = ob.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("both_cnt"))
        .filter(F.col("both_cnt") >= 20)
    )
    ca = F.broadcast(
        brand_cnt.select(
            F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
        )
    )
    cb = F.broadcast(
        brand_cnt.select(
            F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
        )
    )
    return (
        pairs.join(ca, "brand_a")
        .join(cb, "brand_b")
        .crossJoin(nrel)
        .select(
            "brand_a",
            "brand_b",
            "both_cnt",
            F.round(
                F.col("both_cnt") / F.col("_n").cast("double"), 6
            ).alias("support"),
            F.round(
                F.col("both_cnt") / F.col("cnt_a").cast("double"), 6
            ).alias("confidence_a_b"),
            F.round(
                F.col("both_cnt") * F.col("_n").cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


@_register(
    "events_cusum_changepoint",
    """WITH daily AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         round(avg(value), 6) AS day_mean
  FROM events GROUP BY day),
base AS (SELECT round(avg(day_mean), 6) AS mu FROM daily),
cusum AS (
  SELECT day, day_mean,
         round(sum(day_mean - mu) OVER
           (ORDER BY day ROWS UNBOUNDED PRECEDING), 6) AS drift
  FROM daily, base)
SELECT day, day_mean, drift
FROM cusum
ORDER BY abs(drift) DESC, day
LIMIT 10""",
)
def q_events_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM change-point surface: cumulative drift of daily means
    from the global mean; the top-|drift| days bracket the likeliest
    level shift. The cumulative window is global but over the
    DAY-sized relation (post-aggregation). Both the daily means and
    the global mean round BEFORE the cumulative sum, so the window
    adds identical doubles in identical order cross-engine (running
    sums are order-deterministic — only the ordering key must be
    unique, and day is). Final drift re-rounds only to absorb the
    accumulated-sum's last-ulp."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("day_mean"))
    base = daily.agg(F.round(F.avg("day_mean"), 6).alias("mu"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cusum = daily.join(F.broadcast(base)).select(
        "day",
        "day_mean",
        F.round(
            F.sum(F.col("day_mean") - F.col("mu")).over(w), 6
        ).alias("drift"),
    )
    return cusum.orderBy(F.abs(F.col("drift")).desc(), "day").limit(10)


@_register(
    "events_weekly_seasonality",
    """WITH base AS (
  SELECT value, dayofweek(ts)::INT AS dow FROM events),
dow_means AS (
  SELECT dow, round(avg(value), 6) AS dow_mean, count(*) AS n
  FROM base GROUP BY dow),
stats AS (
  SELECT round(var_samp(value), 6) AS var_total FROM base),
resid AS (
  SELECT round(var_samp(b.value - m.dow_mean), 6) AS var_resid
  FROM base b JOIN dow_means m ON m.dow = b.dow)
SELECT m.dow, m.dow_mean, m.n,
       round(1 - (SELECT var_resid FROM resid)
                 / (SELECT var_total FROM stats), 6) AS var_explained
FROM dow_means m""",
)
def q_events_weekly_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly seasonal profile + variance explained: day-of-week mean
    spend, and how much of total variance the weekly pattern removes
    (1 - var(residual)/var(total)) — the go/no-go check before
    fitting any seasonal model.

    dayofweek: Spark and DuckDB disagree on numbering (Sun=1 vs
    Sun=0), so the Spark side subtracts 1 to match DuckDB's 0-based
    convention. The dow-mean relation (7 rows) broadcasts back for
    the residual pass; all variances round at 6dp before the final
    ratio. The two variance scalars ride as ONE-ROW BROADCAST
    relations (r12 opt, the brand-affinity treatment): the r11
    shape paid two eager ``.collect()`` jobs — two full extra
    passes over events — before the real query, every invocation;
    as columns the whole thing is one action and the arithmetic is
    the same IEEE division on the same 6dp-rounded doubles."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "value", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    )
    dow_means = base.groupBy("dow").agg(
        F.round(F.avg("value"), 6).alias("dow_mean"),
        F.count(F.lit(1)).alias("n"),
    )
    var_total = base.agg(
        F.round(F.var_samp("value"), 6).alias("_vt")
    )
    resid = (
        base.join(F.broadcast(dow_means.select("dow", "dow_mean")), "dow")
        .agg(
            F.round(
                F.var_samp(F.col("value") - F.col("dow_mean")), 6
            ).alias("_vr")
        )
    )
    return (
        dow_means.crossJoin(F.broadcast(resid))
        .crossJoin(F.broadcast(var_total))
        .select(
            "dow",
            "dow_mean",
            "n",
            F.round(
                F.lit(1.0) - F.col("_vr") / F.col("_vt"), 6
            ).alias("var_explained"),
        )
    )


@_register(
    "events_conversion_latency",
    """WITH first_click AS (
  SELECT user_id, min(ts) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id),
conv AS (
  SELECT e.user_id,
         min(epoch(e.ts) - epoch(f.t_click)) AS latency_s
  FROM events e JOIN first_click f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= f.t_click
  GROUP BY e.user_id)
SELECT count(*) AS n_converted,
       round(quantile_cont(latency_s, 0.5)::DOUBLE, 4) AS p50_s,
       round(quantile_cont(latency_s, 0.9)::DOUBLE, 4) AS p90_s,
       round(avg(latency_s), 4) AS mean_s
FROM conv""",
)
def q_events_conversion_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion-latency distribution: per user, time from FIRST
    click to the EARLIEST subsequent purchase; p50/p90/mean across
    converters — the product-analytics companion to the funnel count
    (which says how many convert; this says how fast).

    Two partial-aggregated passes on the same user key (first-click,
    then min-latency) — the join and both groupBys share one
    partitioning. Latencies are epoch differences (micros/1e6,
    bit-exact cross-engine); percentiles are exact interpolation on
    those exact values, rounded 4dp for repr."""
    ev = load_table(spark, "events", sf_dir)
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purch = ev.filter(F.col("event_type") == "purchase")
    conv = (
        purch.join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.col("ts").cast("double")
                - F.col("t_click").cast("double")
            ).alias("latency_s")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 4).alias("p90_s"),
        F.round(F.avg("latency_s"), 4).alias("mean_s"),
    )


@_register(
    "lineitem_shipping_delay",
    """SELECT o_orderpriority,
       count(*) AS n_lines,
       min(datediff('day', o_orderdate, l_shipdate))::INT AS min_days,
       max(datediff('day', o_orderdate, l_shipdate))::INT AS max_days,
       round(avg(datediff('day', o_orderdate, l_shipdate)), 4)
         AS avg_days,
       round(quantile_cont(datediff('day', o_orderdate, l_shipdate),
                           0.9)::DOUBLE, 4) AS p90_days
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority""",
)
def q_lineitem_shipping_delay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipping-delay SLA profile per priority: order-to-ship day
    deltas (integer datediff — exact cross-engine), with exact p90.
    The orders join shuffles on the order key at scale (both fact
    relations); everything downstream is one partial-aggregated
    groupBy on the 5-value priority."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(delay).cast("int").alias("min_days"),
            F.max(delay).cast("int").alias("max_days"),
            F.round(F.avg(delay), 4).alias("avg_days"),
            F.round(
                F.expr(
                    "percentile(datediff(l_shipdate, o_orderdate), 0.9)"
                ),
                4,
            ).alias("p90_days"),
        )
    )


@_register(
    "tpch_q8_market_share",
    """WITH vol AS (
  SELECT year(o_orderdate)::INT AS o_year,
         l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA')
SELECT o_year,
       sum(CASE WHEN supp_nation = 'NATION_2' THEN volume END)
         ::DECIMAL(38,8) AS nation_volume,
       sum(volume)::DECIMAL(38,8) AS total_volume,
       round(coalesce(sum(CASE WHEN supp_nation = 'NATION_2'
                     THEN volume END), 0)::DOUBLE
             / sum(volume)::DOUBLE, 6) AS mkt_share
FROM vol GROUP BY o_year""",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of the ASIA
    customer-market by year — nation joined twice (customer-side
    routes through region for the market filter; supplier-side feeds
    the share CASE), share as a conditional-agg ratio.

    The region filter prunes the customer-side nation broadcast to 5
    rows BEFORE the fact join (semi-join pushdown through two dim
    hops); the supplier-nation CASE rides the aggregate — one scan,
    no second pass for the numerator. Volumes decimal-exact; the
    share is one double division. nation_volume is NULL (not 0) for
    years the nation sold nothing, matching SQL CASE semantics in
    both engines; the share coalesces to 0 explicitly.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (price * disc1).alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
    nat_sum = F.sum(nat).cast("decimal(38,8)")
    tot_sum = F.sum("volume").cast("decimal(38,8)")
    zero = F.lit(0).cast("decimal(38,8)")
    return vol.groupBy("o_year").agg(
        nat_sum.alias("nation_volume"),
        tot_sum.alias("total_volume"),
        F.round(
            F.coalesce(nat_sum, zero).cast("double")
            / tot_sum.cast("double"),
            6,
        ).alias("mkt_share"),
    )
