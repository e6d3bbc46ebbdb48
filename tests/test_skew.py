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
