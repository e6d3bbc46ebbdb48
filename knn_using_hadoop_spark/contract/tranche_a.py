"""Session 4-5 tranches: stats, timeseries, streaming twins, TPC-H family, text/embedding surfaces (part A).

Split from the former monolithic contract.py (round 3); original lines 4775-6115. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.functions.hashing import (  # noqa: E402
    portable_hash64,
)
from knn_using_hadoop_spark.operators import analytics as _an  # noqa: E402
from knn_using_hadoop_spark.operators import pipeline as _pipeline  # noqa: E402
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (
    KNN_FEATURES,
    KNN_K,
    knn_tables,
)
from knn_using_hadoop_spark.contract.text_dedup import (_EMB_DIM)

# noqa: E402  (split module: original source follows)


# --------------------------------------------------------------------------
# k-fold cross-validation over the exact-KNN flagship
# --------------------------------------------------------------------------

_CV_FOLDS = 3
_CV_SUB_MOD = 16  # deterministic 1/16 subsample: CV is a model-
# selection loop, not a scoring pass — a hash subsample keeps the 3x
# repeated cross join inside the same budget as one flagship run


def _cv_fold_sql(f: int) -> str:
    return f"""pairs{f} AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label, te.label AS truth,
         (te.f1-tr.f1)*(te.f1-tr.f1) + (te.f2-tr.f2)*(te.f2-tr.f2)
       + (te.f3-tr.f3)*(te.f3-tr.f3) + (te.f4-tr.f4)*(te.f4-tr.f4) AS dist
  FROM (SELECT * FROM sub WHERE fold = {f}) te
  CROSS JOIN (SELECT * FROM sub WHERE fold <> {f}) tr),
knn{f} AS (
  SELECT test_id, truth, label FROM (
    SELECT p.*, row_number() OVER (PARTITION BY test_id
                                   ORDER BY dist, train_id) AS rank
    FROM pairs{f} p) r
  WHERE rank <= {KNN_K}),
pred{f} AS (
  SELECT test_id, truth, label AS prediction FROM (
    SELECT test_id, truth, label, count(*) AS cnt
    FROM knn{f} GROUP BY test_id, truth, label) v
  QUALIFY row_number() OVER (PARTITION BY test_id
                             ORDER BY cnt DESC, label ASC) = 1),
acc{f} AS (
  SELECT {f}::INT AS fold, count(*)::BIGINT AS n_test,
         round(avg(CASE WHEN prediction = truth THEN 1.0 ELSE 0.0 END),
               6) AS accuracy
  FROM pred{f})"""


@_register(
    "knn_cv_accuracy",
    f"""WITH base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
sub AS (SELECT *, (id // {_CV_SUB_MOD}) % {_CV_FOLDS} AS fold
        FROM base WHERE id % {_CV_SUB_MOD} = 0),
{",".join(_cv_fold_sql(f) for f in range(_CV_FOLDS))}
SELECT * FROM acc0 UNION ALL SELECT * FROM acc1
UNION ALL SELECT * FROM acc2""",
)
def q_knn_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold cross-validation of the exact-KNN flagship: 3 folds
    over a deterministic hash subsample (id % 8 = 0; fold =
    (id div 8) % 3 — no RNG, so folds reproduce across engines and
    retries). Each fold is a full train/predict/score pass of the
    production operator (prefilter and all); output = per-fold
    accuracy, the model-selection loop every ML pipeline runs."""
    train_all, test_all = knn_tables(spark, sf_dir, mod=1)  # mod=1: all
    sub = (
        train_all.unionAll(test_all)
        .filter(F.col("id") % _CV_SUB_MOD == 0)
        .withColumn(
            # integer div, NOT `/`: Spark's `/` is double division and
            # a 60-bit id doesn't fit a double's 53-bit mantissa
            "fold",
            F.expr(f"(id div {_CV_SUB_MOD}) % {_CV_FOLDS}"),
        )
    )
    outs = []
    for f in range(_CV_FOLDS):
        te = sub.filter(F.col("fold") == f).drop("fold")
        tr = sub.filter(F.col("fold") != f).drop("fold")
        # prefilter stays ON: A/B at sf0.01 (best-of-2, controlled)
        # measured 5.9-6.6s with it vs 11.6-12.8s without — even at
        # fold size the window sort it prunes dominates the extra
        # sample/threshold passes
        preds = knn_predict(tr, te, KNN_K, dim=len(KNN_FEATURES))
        truth = te.select("id", "label")
        acc = (
            preds.join(
                truth.select(F.col("id").alias("test_id"), "label"),
                "test_id",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_test"),
                F.round(
                    F.avg(
                        (F.col("prediction") == F.col("label")).cast(
                            "double"
                        )
                    ),
                    6,
                ).alias("accuracy"),
            )
            .select(
                F.lit(f).cast("int").alias("fold"), "n_test", "accuracy"
            )
        )
        outs.append(acc)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@_register(
    "events_user_journey",
    """SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '>')
         AS journey,
       count(*)::BIGINT AS n_events
FROM events GROUP BY user_id""",
)
def q_events_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event sequences (the sequence-modeling /
    journey-analysis prep): collect_list is order-nondeterministic in
    a plain groupBy, so the struct-sort idiom pins it — collect
    (ts, event_id, event_type) structs, sort_array (structs compare
    field-by-field, so (ts, event_id) totally orders), then project
    the types. All inside one aggregate; no window, no second
    shuffle."""
    e = load_table(spark, "events", sf_dir)
    seq = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(seq, lambda s: s["event_type"]), ">"
        ).alias("journey"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@_register(
    "events_markov_transitions",
    """WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM trans""",
)
def q_events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag() pairs consecutive events, the transition counts
    row-normalize via a window sum over the (tiny) prev_type
    partition — the user-behavior model a ranking/anomaly system
    bootstraps from. One partitioned sort + one partial-aggregated
    shuffle."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wnorm), 6
        ).alias("p"),
    )


from knn_using_hadoop_spark.functions.zorder import (  # noqa: E402
    morton_code,
    morton_sql,
)

_Z_A = "floor(l_quantity)::BIGINT"
_Z_B = "floor(l_extendedprice / 100)::BIGINT"


@_register(
    "lineitem_zorder_profile",
    f"""WITH z AS (
  SELECT {morton_sql(_Z_A, _Z_B)} AS zcode FROM lineitem)
SELECT (zcode >> 16)::BIGINT AS zprefix, count(*)::BIGINT AS n_rows,
       min(zcode) AS z_lo, max(zcode) AS z_hi
FROM z GROUP BY zprefix""",
)
def q_lineitem_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes over (quantity, price
    bucket): the OPTIMIZE ZORDER layout key, profiled by 16-bit curve
    segment. Pure shift/mask arithmetic in codegen — the code column
    an ingest job would sort by so parquet min/max stats prune on
    BOTH dimensions (functions/zorder.py; write_zordered is the
    layout writer, pytest-verified for bounding-box tightness)."""
    li = load_table(spark, "lineitem", sf_dir)
    z = li.select(
        morton_code(
            F.floor(F.col("l_quantity")),
            F.floor(F.col("l_extendedprice") / 100),
        ).alias("zcode")
    )
    return z.groupBy(
        F.shiftright(F.col("zcode"), 16).alias("zprefix")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("zcode").alias("z_lo"),
        F.max("zcode").alias("z_hi"),
    )


@_register(
    "events_incremental_days",
    """WITH processed AS (
  SELECT DISTINCT ts::DATE AS day FROM events
  WHERE ts < TIMESTAMP '2024-01-20'),
new_days AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS n_events,
         round(sum(value), 2) AS total_value
  FROM events
  GROUP BY ts::DATE)
SELECT n.day, n.n_events, n.total_value
FROM new_days n
WHERE NOT EXISTS (SELECT 1 FROM processed p WHERE p.day = n.day)""",
)
def q_events_incremental_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch orchestration: aggregate ONLY the day
    partitions not yet in the processed-watermark relation (here: the
    days before Jan 20 stand in for the checkpoint table). The
    anti-join on day keys is tiny and broadcast; at 100 TB this is
    the difference between a nightly full recompute and touching one
    day of partitions — partition pruning does the rest when the
    source is day-partitioned."""
    ev = load_table(spark, "events", sf_dir)
    processed = (
        ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )
    new_days = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return new_days.join(F.broadcast(processed), "day", "left_anti")


@_register(
    "orders_null_semantics",
    """WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         nullif(o_orderstatus, 'O') AS status_n
  FROM orders)
SELECT o_orderpriority, status_n,
       count(*)::BIGINT AS n,
       sum((status_n IS NOT DISTINCT FROM NULL)::INT)::BIGINT
         AS n_null_safe_eq,
       min(o_orderkey) FILTER (WHERE status_n IS NULL) AS first_null_key
FROM o
GROUP BY o_orderpriority, status_n""",
)
def q_orders_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: nullif-derived nulls grouped AS KEYS
    (both engines group nulls together), null-safe equality (Spark
    <=> == SQL IS NOT DISTINCT FROM), and FILTERed aggregation over
    the null stratum. The cross-engine traps this pins: default null
    SORT order differs between engines (Spark ASC = NULLS FIRST,
    DuckDB = NULLS LAST) so no bare ORDER BY on nullable keys ever
    reaches a contract result — aggregation keys, which agree, do."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("nullif(o_orderstatus, 'O')").alias("status_n"),
    )
    return o.groupBy("o_orderpriority", "status_n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr("cast(status_n <=> NULL as int)")
        ).cast("bigint").alias("n_null_safe_eq"),
        F.min(F.when(F.col("status_n").isNull(), F.col("o_orderkey"))).alias(
            "first_null_key"
        ),
    )


@_register(
    "table_fingerprints",
    f"""SELECT 'orders' AS table_name, count(*)::BIGINT AS n_rows,
       bit_xor(('0x' || substr(md5(o_orderkey || '|' || o_custkey || '|'
               || o_orderstatus || '|' || o_totalprice || '|'
               || o_orderpriority), 1, 15))::BIGINT) AS fingerprint
FROM orders
UNION ALL
SELECT 'customer', count(*)::BIGINT,
       bit_xor(('0x' || substr(md5(c_custkey || '|' || c_name || '|'
               || c_nationkey || '|' || c_acctbal || '|'
               || c_mktsegment), 1, 15))::BIGINT)
FROM customer""",
)
def q_table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprints: XOR of per-row 60-bit
    content hashes — one 8-byte digest per table that any engine can
    reproduce (this repo's own oracle gate, distilled into a single
    number). XOR is commutative/associative with no overflow, so the
    aggregate is partial-combinable and partitioning-independent; a
    migration validates by comparing fingerprints, not rows."""

    def fp(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
        key = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in cols]
        )
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor(portable_hash64(key)).alias("fingerprint"),
        ).select(
            F.lit(name).alias("table_name"), "n_rows", "fingerprint"
        )

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return fp(
        orders,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    ).unionAll(
        fp(
            cust,
            "customer",
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"],
        )
    )


@_register(
    "orders_snapshot_diff",
    """WITH s1 AS (
  SELECT o_orderkey, round(o_totalprice, 0) AS val
  FROM orders WHERE o_orderkey % 7 <> 0),
s2 AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS val
  FROM orders WHERE o_orderkey % 5 <> 0)
SELECT coalesce(s1.o_orderkey, s2.o_orderkey) AS o_orderkey,
       CASE WHEN s1.o_orderkey IS NULL THEN 'added'
            WHEN s2.o_orderkey IS NULL THEN 'removed'
            WHEN s1.val <> s2.val THEN 'changed' END AS status,
       s1.val AS v1, s2.val AS v2
FROM s1 FULL OUTER JOIN s2 ON s1.o_orderkey = s2.o_orderkey
WHERE (CASE WHEN s1.o_orderkey IS NULL THEN 'added'
            WHEN s2.o_orderkey IS NULL THEN 'removed'
            WHEN s1.val <> s2.val THEN 'changed' END) IS NOT NULL""",
)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (added / removed / changed by key) between two
    derived order snapshots — the table-comparison primitive behind
    migration validation and CDC synthesis; only differing keys
    survive the full outer join
    (operators/pipeline.py::table_diff)."""
    o = load_table(spark, "orders", sf_dir)
    s1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.round("o_totalprice", 0).alias("val")
    )
    s2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("val")
    )
    return _pipeline.table_diff(s1, s2, "o_orderkey", "val")


@_register(
    "events_holt_forecast",
    """WITH daily AS (
  SELECT event_type, ts::DATE AS day, round(sum(value), 2) AS y
  FROM events GROUP BY event_type, ts::DATE),
ser AS (
  SELECT event_type, list(y ORDER BY day) AS ys
  FROM daily GROUP BY event_type),
fold AS (
  SELECT event_type, len(ys)::INT AS n_days,
         list_reduce(
           list_transform(ys, y -> [y::DOUBLE, 0.0::DOUBLE]),
           (acc, x) -> [
             round(0.5*x[1] + 0.5*(acc[1]+acc[2]), 6),
             round(0.3*(round(0.5*x[1] + 0.5*(acc[1]+acc[2]), 6)
                        - acc[1]) + 0.7*acc[2], 6)]) AS lt
  FROM ser)
SELECT event_type, n_days, lt[1] AS level, lt[2] AS trend,
       round(lt[1] + lt[2], 6) AS forecast_next
FROM fold""",
)
def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing per event type over
    the daily-total series, one-step-ahead forecast. The sequential
    recurrence runs as an array fold (collect the ~30-point rounded
    daily series per group, F.aggregate the tail with (level, trend)
    as the accumulator) — per-key state stays inside one task, no
    cross-row dependency leaks into the shuffle. Per-step 6dp
    rounding keeps the fold bit-identical to DuckDB's list_reduce
    twin (same protocol as the iterative-algorithm oracles)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    ys = F.col("ys")
    rest = F.slice(ys, F.lit(2), F.greatest(F.size(ys) - 1, F.lit(0)))

    def step(acc, x):
        level = F.round(
            0.5 * x + 0.5 * (acc.getItem(0) + acc.getItem(1)), 6
        )
        trend = F.round(
            0.3 * (level - acc.getItem(0)) + 0.7 * acc.getItem(1), 6
        )
        return F.array(level, trend)

    lt = F.aggregate(
        rest,
        F.array(F.element_at(ys, 1), F.lit(0.0)),
        step,
    )
    return ser.select(
        "event_type",
        F.size(ys).alias("n_days"),
        lt.getItem(0).alias("level"),
        lt.getItem(1).alias("trend"),
        F.round(lt.getItem(0) + lt.getItem(1), 6).alias("forecast_next"),
    )


from knn_using_hadoop_spark.operators import linalg as _linalg  # noqa: E402
from knn_using_hadoop_spark.operators.timeseries import (  # noqa: E402
    rolling_distinct_daily,
)


@_register(
    "tpch_q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(12,2))::DECIMAL(38,2) AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2)
         AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8)
         AS sum_disc_price,
       sum(l_extendedprice::DECIMAL(18,2)
           * ((1 - l_discount) * (1 + l_tax))::DECIMAL(12,8))
         ::DECIMAL(38,6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 6)
         AS avg_price,
       round(sum(l_discount::DECIMAL(9,6))::DOUBLE / count(*), 6)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the pricing summary report — one full scan,
    grouped on two low-cardinality flags, eight aggregates.

    The canonical partial-aggregation showcase: map-side combine
    collapses every partition to <= 6 groups before a 6-row shuffle,
    so the plan's cost is the scan regardless of cluster size. Money
    sums use the decimal-exact protocol (cast each INPUT once — the
    sources sit on 2dp/2dp/2dp grids, so products are exact on a 6dp
    grid and the final scale-6/scale-2 casts never round); averages
    divide an exact decimal sum (as double) by the group count — one
    float op, bit-identical in both engines. avg(l_quantity) needs no
    protocol at all: integer-valued doubles sum exactly in any order.
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    # (1-d)(1+t) sits on an exact 4dp grid, so one scale-8 cast of the
    # double product is exact — and keeps DuckDB's decimal multiply
    # inside int128 (a 3-factor decimal chain overflows its rescaler).
    n = F.count(F.lit(1))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(price * disc1).cast("decimal(38,8)").alias(
                "sum_disc_price"
            ),
            F.sum(
                price
                * (
                    (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                ).cast("decimal(12,8)")
            )
            .cast("decimal(38,6)")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(9,6)")).cast(
                    "double"
                )
                / n,
                6,
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@_register(
    "tpch_q3_topn_revenue",
    """SELECT l_orderkey,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def q_tpch_q3_topn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue.

    Both predicates push to the parquet scans; customer broadcasts
    into orders; the surviving orders x lineitem join shuffles on the
    order key. The global top-10 runs as TakeOrderedAndProject
    (per-partition heaps, no global sort). LIMIT makes the result SET
    order-sensitive, so ordering must be cross-engine deterministic:
    revenue is decimal-exact (no float summation noise) and ties
    break on the unique order key.
    """
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(price * disc1).cast("decimal(38,8)").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_register(
    "tpch_q6_promo_revenue",
    """SELECT sum(l_extendedprice::DECIMAL(18,2)
           * l_discount::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24""",
)
def q_tpch_q6_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — a pure scan query.

    Every predicate (date range, discount band, quantity cap) reaches
    the parquet reader as a pushed filter over exactly four read
    columns; the aggregate is a single map-side-combined row per
    partition. At 100 TB with date-partitioned lineitem the date range
    also prunes partitions — the I/O, not the CPU, is the whole query.
    The discount band compares doubles against the same literals in
    both engines (the source grid is exact-representable 0.01 steps,
    so the comparison is unambiguous).
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(9,6)")
        )
        .cast("decimal(38,8)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "tpch_q18_large_orders",
    """WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       total_qty
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20""",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (the HAVING-filtered
    aggregate as a join input).

    The lineitem aggregate runs first and its HAVING clause slashes
    the relation before either join — so the orders join is shuffled
    only on the survivors, and customer broadcasts. total_qty sums
    integer-valued doubles (exact in any order); the top-20 ordering
    is on 2dp o_totalprice with the order key as tiebreak.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@_register(
    "events_rolling_distinct_users",
    """WITH pairs AS (
  SELECT DISTINCT ts::DATE AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM pairs)
SELECT d.day AS day, count(DISTINCT p.user_id) AS users_7d
FROM days d
JOIN pairs p ON p.day <= d.day AND p.day >= d.day - 6
GROUP BY d.day""",
)
def q_events_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing 7-day distinct active users per day — the rolling-
    actives KPI that COUNT(DISTINCT) over a window frame cannot
    express.

    The oracle states the semantics as a range join; the engine runs
    the scale formulation instead (operators/timeseries.py::
    rolling_distinct_daily): dedup to (day, user) pairs, explode each
    pair into the <= 7 later days it counts toward (bounded fan-out),
    broadcast-semi filter to observed days, one distinct-agg keyed by
    day. Pure equi-shuffles — no nested-loop join at any scale.
    """
    ev = load_table(spark, "events", sf_dir)
    return rolling_distinct_daily(ev, key="user_id", window_days=7).select(
        "day", F.col("user_ids_7d").alias("users_7d")
    )


@_register(
    "embedding_covariance",
    f"""WITH flat AS (
  SELECT vec_id, g.i::INT AS i, embedding[g.i]::DOUBLE AS x
  FROM embeddings, generate_series(1, {_EMB_DIM}) g(i)),
m AS (SELECT i, round(avg(x), 6) AS m FROM flat GROUP BY i),
c AS (SELECT vec_id, f.i, x - m.m AS cx
      FROM flat f JOIN m ON m.i = f.i)
SELECT a.i AS i, b.i AS j, round(avg(a.cx * b.cx), 6) AS cov
FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i""",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding corpus — the
    single-pass distributed Gram/covariance primitive behind PCA and
    whitening (operators/linalg.py::covariance_upper).

    The oracle self-joins the exploded relation (fine for DuckDB);
    the engine instead emits each row's d(d+1)/2 centered pair
    products through nested HOF transforms and lets partial
    aggregation collapse every partition to d(d+1)/2 sums — the
    shuffle is O(d^2) per partition, independent of corpus size.
    """
    embs = load_table(spark, "embeddings", sf_dir)
    return _linalg.covariance_upper(embs, "embedding", _EMB_DIM)


@_register(
    "embedding_power_iteration_pc1",
    _linalg.power_iteration_oracle_sql(_EMB_DIM, rounds=3),
)
def q_embedding_power_iteration_pc1(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First principal component of the embedding corpus by 3 rounds
    of power iteration on the (single-pass, 6dp-rounded) covariance
    matrix — distributed iterative linear algebra with the PageRank
    cross-engine protocol: round the renormalized vector to 8 dp every
    round so both engines re-enter each round bit-identical, 6 dp at
    output, sign pinned so v[1] >= 0
    (operators/linalg.py::power_iteration_pc1)."""
    embs = load_table(spark, "embeddings", sf_dir)
    return _linalg.power_iteration_pc1(embs, "embedding", _EMB_DIM, rounds=3)


@_register(
    "events_mad_outliers",
    """WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
wm AS (
  SELECT e.event_id, e.event_type, e.value, med.med
  FROM events e JOIN med ON med.event_type = e.event_type),
mad AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM wm GROUP BY event_type),
scored AS (
  SELECT wm.event_id, wm.event_type, wm.value,
         round(wm.med, 6) AS med, round(mad.mad, 6) AS mad,
         CASE WHEN mad.mad > 0
              THEN round(0.6745 * (wm.value - wm.med) / mad.mad, 6)
         END AS mz
  FROM wm JOIN mad ON mad.event_type = wm.event_type)
SELECT event_id, event_type, value, med, mad, mz
FROM scored WHERE abs(mz) > 3.5""",
)
def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier detection (modified z-score > 3.5) per event
    type — the median-based alternative to `events_rolling_anomaly`'s
    mean/stddev scoring, immune to the outliers it is hunting
    (operators/analytics.py::mad_outliers). Two exact-percentile
    aggregates + broadcast joins back; no window, no sort of the full
    relation."""
    ev = load_table(spark, "events", sf_dir)
    return _an.mad_outliers(ev)


@_register(
    "events_chi2_dayofweek",
    """WITH obs AS (
  SELECT event_type, dayofweek(ts)::INT AS dow,
         count(*)::DOUBLE AS o
  FROM events GROUP BY event_type, dayofweek(ts)),
tot AS (SELECT sum(o) AS n FROM obs),
rows_ AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY event_type),
cols_ AS (SELECT dow, sum(o) AS ct FROM obs GROUP BY dow)
SELECT obs.event_type, obs.dow, obs.o::BIGINT AS observed,
       round(rows_.rt * cols_.ct / tot.n, 6) AS expected,
       round((obs.o - rows_.rt * cols_.ct / tot.n)
             / sqrt(rows_.rt * cols_.ct / tot.n), 6) AS std_resid
FROM obs
JOIN rows_ ON rows_.event_type = obs.event_type
JOIN cols_ ON cols_.dow = obs.dow
CROSS JOIN tot""",
)
def q_events_chi2_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence surface: the event_type x day-of-week
    contingency table with expected counts and standardized residuals
    (the per-cell chi-square contributions) — seasonality testing as
    pure relational algebra. One grouped count, two marginal rollups
    of THAT tiny relation (not rescans), broadcast-joined back; every
    input to the float math is an exact integer count, so only output
    rounding is needed. DuckDB's dayofweek == Spark's dayofweek - 1
    (Sunday = 0 vs 1) — aligned explicitly."""
    ev = load_table(spark, "events", sf_dir)
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    exp = F.col("rt") * F.col("ct") / F.col("n")
    return (
        obs.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.col("o").cast("bigint").alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round((F.col("o") - exp) / F.sqrt(exp), 6).alias(
                "std_resid"
            ),
        )
    )


@_register(
    "nation_revenue_share",
    """WITH rev AS (
  SELECT n_name,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name)
SELECT n_name, revenue,
       round(revenue::DOUBLE
             / (sum(revenue) OVER ())::DOUBLE, 6) AS share,
       rank() OVER (ORDER BY revenue DESC)::INT AS rnk
FROM rev""",
)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report / contribution analysis: each nation's share of
    total revenue plus its rank — the percent-of-total window pattern.

    The unpartitioned window runs over the ALREADY-AGGREGATED 25-row
    relation, not the fact table — the distinction that makes a
    global window acceptable at any scale (contract.py's own global-
    window warning applies to pre-aggregation relations). Revenue is
    decimal-exact; share divides two exact decimals as doubles — one
    float op, then rounding. rank() on exact decimals needs no
    tiebreak (and inherits determinism from exact revenue).
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
            )
            .cast("decimal(38,8)")
            .alias("revenue")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "revenue",
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(w).cast("double"),
            6,
        ).alias("share"),
        F.rank().over(Window.orderBy(F.col("revenue").desc())).alias(
            "rnk"
        ),
    )


@_register(
    "orders_status_listagg",
    """SELECT o_custkey,
       count(*) AS n_orders,
       string_agg(o_orderstatus || ':' || o_orderkey, ','
                  ORDER BY o_orderkey) AS order_log
FROM orders WHERE o_custkey % 100 = 0
GROUP BY o_custkey""",
)
def q_orders_status_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg) — the audit-
    log rollup. collect_list order is nondeterministic under parallel
    aggregation, so the engine collects (key, text) structs and
    array_sorts BEFORE joining — same protocol as events_user_journey;
    the oracle's string_agg(... ORDER BY) is its SQL-native twin."""
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_custkey") % 100 == 0
    )
    entry = F.struct(
        F.col("o_orderkey").alias("k"),
        F.concat_ws(":", "o_orderstatus", "o_orderkey").alias("s"),
    )
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)),
                lambda e: e.getField("s"),
            ),
            ",",
        ).alias("order_log"),
    )


@_register(
    "customer_name_parse",
    """SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)$', 1) AS id_str,
       try_cast(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
         AS id_num,
       (try_cast(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
        = c_custkey) AS id_matches,
       regexp_matches(c_name, '^Customer#[0-9]{9}$') AS well_formed
FROM customer WHERE c_custkey % 7 = 0""",
)
def q_customer_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + validation surface (regexp_extract with a
    capture group, anchored regexp match, try_cast) — the schema-on-
    read parsing every ingest pipeline does. The regex dialect subset
    here (anchors, classes, quantifiers, groups) behaves identically
    in Spark's Java regex and DuckDB's RE2."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_custkey") % 7 == 0
    )
    id_str = F.regexp_extract("c_name", r"([0-9]+)$", 1)
    id_num = id_str.try_cast("bigint")
    return c.select(
        "c_custkey",
        id_str.alias("id_str"),
        id_num.alias("id_num"),
        (id_num == F.col("c_custkey")).alias("id_matches"),
        F.col("c_name").rlike(r"^Customer#[0-9]{9}$").alias(
            "well_formed"
        ),
    )


@_register(
    "orders_conditional_agg",
    """SELECT o_orderpriority,
       count(*) AS n,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       sum(o_totalprice::DECIMAL(18,2))
         FILTER (WHERE o_orderstatus = 'F')::DECIMAL(38,2)
         AS finished_value,
       round(count(*) FILTER (WHERE o_orderstatus = 'F')
             / count(*)::DOUBLE, 6) AS finished_rate
FROM orders GROUP BY o_orderpriority""",
)
def q_orders_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause) — pivot-lite KPI
    rollups in one scan. Spark expresses FILTER as count/sum over
    CASE; both collapse to the same partial-aggregated single pass.
    The decimal sum FILTER returns NULL (not 0) for empty groups in
    both engines."""
    o = load_table(spark, "orders", sf_dir)
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(fin, 1)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias(
            "n_big"
        ),
        F.sum(
            F.when(fin, F.col("o_totalprice").cast("decimal(18,2)"))
        )
        .cast("decimal(38,2)")
        .alias("finished_value"),
        F.round(
            F.count(F.when(fin, 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("finished_rate"),
    )


@_register(
    "events_session_running_spend",
    """WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800 OR lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events),
sess AS (
  SELECT *, sum(is_start) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM marked)
SELECT user_id, session_no, event_id, ts,
       round(sum(value) OVER
         (PARTITION BY user_id, session_no ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING), 6) AS running_spend
FROM sess WHERE user_id % 50 = 0""",
)
def q_events_session_running_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conditional-reset cumulative sum: a running total that resets
    at every session boundary (30-min gap) — the classic 'cumulative
    sum with reset' that needs session numbering first (gap flag →
    running count of flags → cumsum within (user, session)).

    All three windows share ONE partitioning ancestry (user_id, then
    user_id+session_no which Catalyst satisfies with a local re-sort,
    no second Exchange). The user filter pushes below every window to
    the scan because it is on the partition key — pruning-compatible
    analytics."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 50 == 0
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(wu).cast(
        "double"
    )
    is_start = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    marked = ev.select(
        "user_id", "event_id", "ts", "value", is_start.alias("is_start")
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("is_start").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sess.select(
        "user_id",
        "session_no",
        "event_id",
        "ts",
        F.round(F.sum("value").over(ws), 6).alias("running_spend"),
    )


from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    kmv_jaccard_oracle_sql,
    kmv_jaccard_pairs,
)


@_register(
    "events_user_jaccard_kmv",
    kmv_jaccard_oracle_sql("events", "event_type", "user_id::VARCHAR", 64),
)
def q_events_user_jaccard_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap (Jaccard) estimates between event
    types from mergeable KMV sketches — deterministic sketch algebra
    with a bit-exact oracle (operators/sketches.py::
    kmv_jaccard_pairs). The only corpus-sized pass is the per-group
    k-smallest (partial top-k below the shuffle); the pairwise stage
    touches <= k rows per group, so adding groups scales as
    O(pairs * k), never as set sizes."""
    return kmv_jaccard_pairs(
        load_table(spark, "events", sf_dir), "event_type", "user_id", k=64
    )


@_register(
    "tpch_q10_returned_items",
    """SELECT c_custkey, c_name,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in a two-quarter window.

    The returnflag and date-range predicates push to the lineitem and
    orders scans before the fact-fact shuffle join on the order key;
    nation broadcasts. The per-customer aggregate then ranks via
    TakeOrderedAndProject (decimal-exact revenue ordering, unique
    custkey tiebreak) — never a global sort of all customers.
    """
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(price * disc1).cast("decimal(38,8)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "tpch_q14_promo_share",
    """SELECT (year(l_shipdate) * 100 + month(l_shipdate))::INT AS ym,
       coalesce(sum(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice::DECIMAL(18,2)
                  * (1 - l_discount)::DECIMAL(9,6) END),
           0)::DECIMAL(38,8) AS promo_revenue,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       round(coalesce(sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice::DECIMAL(18,2)
                        * (1 - l_discount)::DECIMAL(9,6) END),
                 0)::DOUBLE
             / sum(l_extendedprice::DECIMAL(18,2)
                   * (1 - l_discount)::DECIMAL(9,6))::DOUBLE,
             6) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY ym""",
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO parts.

    part broadcasts into the lineitem scan (dimension ~1/300 of the
    fact at any SF — at 100 TB the part side is still MBs after
    projecting (p_partkey, p_type)); the month rollup partially
    aggregates map-side. Both revenue columns are decimal-exact; the
    share is the one float op, then rounded. The conditional-agg CASE
    collapses to a single pass — no second join or self-union.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    promo = F.when(F.col("p_type") == "PROMO", price * disc1)
    zero = F.lit(0).cast("decimal(38,8)")
    promo_rev = F.coalesce(F.sum(promo).cast("decimal(38,8)"), zero)
    rev = F.sum(price * disc1).cast("decimal(38,8)")
    ym = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(ym)
        .agg(
            promo_rev.alias("promo_revenue"),
            rev.alias("revenue"),
            F.round(
                promo_rev.cast("double") / rev.cast("double"), 6
            ).alias("promo_share"),
        )
    )


@_register(
    "tpch_q16_supplier_counts",
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)
def q_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding a supplier denylist (negative balance stands in
    for the reference's complaint-comment filter; the synthetic
    supplier table has no comment column).

    The denylist is a broadcast ANTI join (NOT IN with guaranteed
    non-null keys = anti semantics); part attribute predicates push
    to the broadcast-side scan. COUNT(DISTINCT) expands to the
    two-phase partial-distinct aggregate: dedup on (bucket, suppkey)
    shuffles first, so the wide shuffle carries already-deduped rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q19_disjunctive_revenue",
    """SELECT sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 11 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 26 AND 50
       AND l_quantity BETWEEN 20 AND 35)""",
)
def q_tpch_q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    predicate mixing join-side columns.

    The canonical disjunctive-pushdown test: Catalyst factors the
    lineitem-only disjunction l_quantity BETWEEN 1 AND 35 out of the
    OR and pushes it to the fact scan (so the join never sees rows no
    branch can accept), and p_size BETWEEN 1 AND 50 likewise to the
    part side; the residual mixed OR evaluates post-join. part
    broadcasts — the whole query is one fact scan, zero shuffles.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & sz.between(1, 10)
            & q.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & sz.between(11, 25)
            & q.between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & sz.between(26, 50)
            & q.between(20, 35)
        )
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(price * disc1).cast("decimal(38,8)").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "tpch_q22_dormant_customers",
    """WITH thr AS (
  SELECT round(avg(c_acctbal), 2) AS avg_bal
  FROM customer
  WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
SELECT (c_custkey % 10)::INT AS bucket,
       count(*) AS n_custs,
       round(sum(c_acctbal), 4) AS total_bal
FROM customer, thr
WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
  AND c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY bucket""",
)
def q_tpch_q22_dormant_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered
    (custkey bucket stands in for the reference's phone-prefix
    country code — the synthetic customer table has no phone).

    The scalar threshold is a 1-row aggregate broadcast-cross-joined
    into the filter (Catalyst plans DuckDB's correlated-free scalar
    subquery the same way). The no-orders test is a shuffle-free
    broadcast... no — orders is the BIG side, so the anti join
    shuffles on custkey; at 100 TB you'd pre-project orders to its
    distinct custkeys (already grouped by the same key) to shrink the
    anti build. avg threshold is rounded to 2dp in BOTH engines
    before comparing, so float summation-order ulp can never flip a
    row across the threshold. sum(c_acctbal) adds 2dp-grid doubles —
    noise ~1e-10 around a grid point, absorbed by round(...,4).
    """
    c = load_table(spark, "customer", sf_dir).filter(
        (F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9)
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    o = load_table(spark, "orders", sf_dir).select("o_custkey").distinct()
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )
