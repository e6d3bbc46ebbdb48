"""Bucketing: pre-shuffled tables make later joins exchange-free.

The 100 TB pattern for repeated joins on the same key (SURVEY.md §1.5
partitioning notes): pay the shuffle once at write time
(``bucketBy``), then every subsequent join on that key co-locates
without an Exchange.
"""

from __future__ import annotations

def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    from knn_using_hadoop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    # warehouse dir is a static conf, set in session.py (outside repo)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketed layout: no shuffle exchange on either join input
        assert "Exchange hashpartitioning" not in plan
        # and results are right
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
