"""Relational parity ops, generalized (SURVEY.md §2.2-2.7).

Split from the former monolithic contract.py (round 3); original lines 201-490. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from collections.abc import Callable
from knn_using_hadoop_spark.operators.topk import top_k_per_group
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (REGISTRY, _register)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Relational parity ops, generalized (SURVEY.md §2.2-2.7)
# --------------------------------------------------------------------------


@_register(
    "scan_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 25""",
)
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: predicate + computed projection, pushed to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 25)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_price"
        ),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
    )


@_register(
    "groupby_agg",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus""",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg (A4 generalized)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_register(
    "topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         (row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey))::INT AS rank
  FROM orders) t WHERE rank <= 3""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3/O1 generalized: per-group top-k via WindowGroupLimit."""
    orders = load_table(spark, "orders", sf_dir)
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@_register(
    "argmax_per_group",
    """SELECT c_nationkey, c_custkey AS top_custkey, c_acctbal AS top_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) t WHERE rn = 1""",
)
def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 generalized: deterministic argmax via max_by over a struct."""
    c = load_table(spark, "customer", sf_dir)
    return c.groupBy("c_nationkey").agg(
        F.max_by(
            F.col("c_custkey"),
            F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("neg")),
        ).alias("top_custkey"),
        F.max("c_acctbal").alias("top_acctbal"),
    )


@_register(
    "join_agg",
    """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 generalized: multi-way equi-join (broadcast dims) + agg."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_register(
    "cross_join",
    "SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 standalone: broadcast nested-loop cross join."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return nation.crossJoin(F.broadcast(region)).select("n_name", "r_name")


@_register(
    "order_by_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q_order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 + global top-k (TakeOrderedAndProject, no full sort)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@_register(
    "join_anti_semi",
    """SELECT
  (SELECT count(*) FROM customer
   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
   AS n_customers_without_orders,
  (SELECT count(*) FROM customer
   WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
   AS n_customers_with_orders""",
)
def q_join_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (absent in the reference, §2.9 — engine adds them)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey")
    anti = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    semi = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    return anti.crossJoin(semi)


@_register(
    "set_ops",
    """WITH u AS (SELECT c_nationkey AS nationkey FROM customer
           UNION SELECT s_nationkey FROM supplier),
     i AS (SELECT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier),
     e AS (SELECT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier)
SELECT 'union' AS op, nationkey FROM u
UNION ALL SELECT 'intersect' AS op, nationkey FROM i
UNION ALL SELECT 'except' AS op, nationkey FROM e""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (engine completeness, §2.9)."""
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
    i = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
    e = c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
    return u.union(i).union(e)


@_register(
    "window_analytics",
    """SELECT o_custkey, o_orderkey,
       (row_number() OVER w)::INT AS seq,
       round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2)
         AS running_spend,
       lag(o_orderkey) OVER w AS prev_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: row_number / running sum / lag (§2.9 gap filled)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@_register(
    "distinct_agg",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority""",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_register(
    "rollup_agg",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / rollup (§2.9 gap filled)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_register(
    "events_windowed_agg",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2""",
)
def q_events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window agg (batch twin of the streaming op)."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


