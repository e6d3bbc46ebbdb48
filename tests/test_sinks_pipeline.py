"""Sinks (S4/S5 parity) + MLlib text pipeline."""

from __future__ import annotations

import os
import tempfile


def test_write_tsv_single_file_roundtrip(spark):
    from knn_using_hadoop_spark.sources.sinks import write_tsv

    df = spark.createDataFrame(
        [(0, 3), (1, 5), (2, 1)], "test_id int, prediction int"
    )
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "preds")
        write_tsv(df.orderBy("test_id"), out, single_file=True)
        parts = [f for f in os.listdir(out) if f.startswith("part-")]
        assert len(parts) == 1  # the reference's one-reducer layout
        lines = open(os.path.join(out, parts[0])).read().splitlines()
        assert lines == ["0\t3", "1\t5", "2\t1"]
        back = spark.read.option("sep", "\t").csv(
            out, schema="test_id int, prediction int"
        )
        assert back.count() == 3


def test_write_parquet_partitioned(spark, sf_dir):
    from knn_using_hadoop_spark.sources import load_table
    from knn_using_hadoop_spark.sources.sinks import write_parquet

    ev = load_table(spark, "events", sf_dir)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "ev")
        write_parquet(ev, out, partition_by=["event_type"])
        dirs = [f for f in os.listdir(out) if f.startswith("event_type=")]
        assert len(dirs) == 5
        back = spark.read.parquet(out)
        assert back.count() == ev.count()
        # partition pruning: reading one type scans one directory
        one = back.filter(back.event_type == "click")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert one.count() == ev.filter(ev.event_type == "click").count()
        assert "PartitionFilters" in plan


def test_multi_format_roundtrip(spark, sf_dir):
    import pytest

    from knn_using_hadoop_spark.sources import load_table
    from knn_using_hadoop_spark.sources.sinks import (
        read_format,
        write_format,
    )

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    expected = sorted(map(tuple, orders.collect()))
    with tempfile.TemporaryDirectory() as d:
        for fmt in ("parquet", "orc", "json", "csv"):
            out = os.path.join(d, fmt)
            write_format(orders, out, fmt)
            back = read_format(spark, out, fmt, schema=orders.schema)
            assert sorted(map(tuple, back.collect())) == expected, fmt
        with pytest.raises(NotImplementedError, match="jdbc"):
            write_format(orders, os.path.join(d, "x"), "jdbc")


def test_mllib_tfidf_pipeline(spark, sf_dir):
    from knn_using_hadoop_spark.operators.text import mllib_tfidf
    from knn_using_hadoop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = mllib_tfidf(docs, num_features=256).collect()
    assert len(out) == docs.count()
    r = out[0]
    assert r.tfidf.size == 256
    # L2 normalization: unit norm (where the vector is nonzero)
    norm = sum(v * v for v in r.tfidf_norm.values) ** 0.5
    assert abs(norm - 1.0) < 1e-9


def test_schema_evolution_merge(spark, tmp_path):
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.sources.sinks import read_parquet_evolved

    base = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id"), F.lit("a").alias("source"))
    v1.write.parquet(base + "/batch=1")
    v2 = spark.range(3, 6).select(
        F.col("id"),
        F.lit("b").alias("source"),
        F.lit(1.5).alias("quality"),  # column added later
    )
    v2.write.parquet(base + "/batch=2")
    got = read_parquet_evolved(spark, base)
    assert set(got.columns) >= {"id", "source", "quality"}
    rows = {r["id"]: r["quality"] for r in got.collect()}
    assert rows[0] is None  # old files backfill the new column as null
    assert rows[5] == 1.5
    assert got.count() == 6


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import glob

    from knn_using_hadoop_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    spark.range(1000).repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 64
    out = str(tmp_path / "compacted")
    compact_parquet(spark, src, target_files=4, out_path=out)
    assert len(glob.glob(out + "/part-*")) == 4
    # content preserved exactly
    assert (
        spark.read.parquet(out).selectExpr("sum(id)").collect()[0][0]
        == 1000 * 999 / 2
    )


def test_write_globally_sorted_total_order(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.sources.sinks import write_globally_sorted

    random.seed(11)
    vals = [(random.randrange(10**9),) for _ in range(20_000)]
    df = spark.createDataFrame(vals, "k long")
    out = str(tmp_path / "sorted")
    write_globally_sorted(df, out, "k", n_files=8)

    # per-file ranges are disjoint and ordered by file name...
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("f")
        .collect()
    )
    assert len(per_file) == 8
    for prev, nxt in zip(per_file, per_file[1:]):
        assert prev["hi"] <= nxt["lo"]
    # ...and rows inside each file are sorted, so reading files in
    # name order yields the fully sorted dataset
    pdf = (
        spark.read.parquet(out)
        .select("k", F.input_file_name().alias("f"))
        .toPandas()
    )
    for _, grp in pdf.groupby("f", sort=True):
        ks = grp["k"].tolist()
        assert ks == sorted(ks)
    assert sorted(v[0] for v in vals) == sorted(pdf["k"].tolist())
