"""Skew utilities: salted ops must be result-identical to plain ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import skew
from knn_using_hadoop_spark.sources import load_table


def test_salted_count_sum_equals_plain(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    plain = {
        r.o_orderpriority: (r.cnt, round(r.total, 6))
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_totalprice").alias("total"),
        )
        .collect()
    }
    salted = {
        r.o_orderpriority: (r.cnt, round(r.total, 6))
        for r in skew.salted_count_sum(
            orders, ["o_orderpriority"], "o_totalprice"
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").count()
    salted = skew.salted_join_big_to_skewed(
        orders, customer, "o_custkey"
    ).count()
    assert salted == plain


def test_key_skew_profile(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    prof = skew.key_skew_profile(li, ["l_returnflag"], top=3).collect()
    assert len(prof) == 3
    assert prof[0].n >= prof[1].n >= prof[2].n
    assert abs(sum(r.share for r in prof) - 1.0) < 0.01  # 3 flags cover all


def test_aqe_skew_join_splits_hot_partition(spark):
    """Pin that AQE's skew-join handling FIRES on a hot key when the
    thresholds say so — the runtime safety net behind the manual
    salting operators (which remain the deterministic-layout path).
    """
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "65536",
        )
        conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536"
        )
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        # 400k rows on ONE key vs a near-uniform remainder
        left = spark.range(500_000).select(
            F.when(F.col("id") < 400_000, F.lit(7))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(200).select(
            (F.col("id") % 100).alias("k"),
            (F.col("id") * 10).alias("w"),
        )
        joined = left.join(right, "k")
        n = len(joined.collect())
        # hot key 7 matches 2 right rows; each other k in 0..96
        # matches 2 of the 200 right rows
        assert n == 400_000 * 2 + 100_000 * 2
        plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert "skew=true" in plan or "skewed" in plan.lower(), plan[
            :2000
        ]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
