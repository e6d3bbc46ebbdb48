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


def test_merge_into_parquet_roundtrip(spark, tmp_path):
    """Insert/update/delete in one MERGE batch, including a key that
    MOVES partitions and a partition emptied by deletes."""
    from knn_using_hadoop_spark.sources.sinks import merge_into_parquet

    path = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 20.0, "a"),
            (3, 30.0, "b"),
            (4, 40.0, "c"),  # 'c' will be emptied by the delete
        ],
        "k long, v double, part string",
    )
    target.write.partitionBy("part").parquet(path)

    source = spark.createDataFrame(
        [
            (2, 21.0, "b", "U"),   # update + MOVE partition a -> b
            (4, 0.0, "c", "D"),    # delete (empties partition c)
            (5, 50.0, "a", "U"),   # insert
            (6, 0.0, "b", "D"),    # unmatched delete -> no-op
        ],
        "k long, v double, part string, op string",
    )
    touched = merge_into_parquet(
        spark, path, source, keys=["k"], partition_col="part",
        op_col="op",
    )
    assert set(touched) == {"a", "b", "c"}

    got = {
        (r.k, r.v, r.part)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, 10.0, "a"),   # untouched row survives
        (2, 21.0, "b"),   # updated AND moved: no stale twin in 'a'
        (3, 30.0, "b"),
        (5, 50.0, "a"),   # inserted
    }
    # the emptied partition directory is gone, not a zero-row husk
    assert not os.path.isdir(os.path.join(path, "part=c"))


def test_merge_into_parquet_untouched_partition_not_rewritten(
    spark, tmp_path
):
    """Partition-overwrite scope: files of untouched partitions must
    be byte-identical after the merge (cost ∝ touched, not table)."""
    from knn_using_hadoop_spark.sources.sinks import merge_into_parquet

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 1.0, "hot"), (2, 2.0, "cold")],
        "k long, v double, part string",
    ).write.partitionBy("part").parquet(path)

    cold_dir = os.path.join(path, "part=cold")
    before = {
        f: os.path.getmtime(os.path.join(cold_dir, f))
        for f in os.listdir(cold_dir)
    }
    source = spark.createDataFrame(
        [(1, 9.0, "hot")], "k long, v double, part string"
    )
    touched = merge_into_parquet(
        spark, path, source, keys=["k"], partition_col="part"
    )
    assert touched == ["hot"]
    after = {
        f: os.path.getmtime(os.path.join(cold_dir, f))
        for f in os.listdir(cold_dir)
    }
    assert after == before
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (1, 9.0), (2, 2.0)
    }


# ---------------------------------------------------------------------------
# versioned table (time travel)
# ---------------------------------------------------------------------------


def test_versioned_table_time_travel(spark, tmp_path):
    import os

    from knn_using_hadoop_spark.sources.sinks import (
        read_table_version,
        table_history,
        write_table_version,
    )

    path = str(tmp_path / "vt")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    delta = spark.createDataFrame([(3, "c")], "id long, v string")
    fresh = spark.createDataFrame([(9, "z")], "id long, v string")

    assert write_table_version(spark, base, path, "overwrite") == 0
    assert write_table_version(spark, delta, path, "append") == 1
    # record v0's data files before further commits
    v0_files = {
        f: os.path.getmtime(os.path.join(path, "v0", f))
        for f in os.listdir(os.path.join(path, "v0"))
    }
    assert write_table_version(spark, fresh, path, "overwrite") == 2

    assert read_table_version(spark, path, 0).count() == 2
    got_v1 = {
        (r.id, r.v) for r in read_table_version(spark, path, 1).collect()
    }
    assert got_v1 == {(1, "a"), (2, "b"), (3, "c")}
    # overwrite starts a fresh visible set; latest == explicit v2
    got_latest = {
        (r.id, r.v) for r in read_table_version(spark, path).collect()
    }
    assert got_latest == {(9, "z")}
    # copy-on-write: v0's files untouched by later commits
    for f, mt in v0_files.items():
        assert os.path.getmtime(os.path.join(path, "v0", f)) == mt
    hist = table_history(spark, path).collect()
    assert [r.version for r in hist] == [0, 1, 2]
    assert [r.mode for r in hist] == ["overwrite", "append", "overwrite"]
    assert list(hist[1].dirs) == ["v0", "v1"]


def test_versioned_table_errors(spark, tmp_path):
    import pytest

    from knn_using_hadoop_spark.sources.sinks import (
        read_table_version,
        write_table_version,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(FileNotFoundError):
        read_table_version(spark, str(tmp_path / "missing"))
    p = str(tmp_path / "vt2")
    write_table_version(spark, df, p, "overwrite")
    with pytest.raises(ValueError, match="version 7 not found"):
        read_table_version(spark, p, 7)
    with pytest.raises(ValueError, match="unsupported"):
        write_table_version(spark, df, p, "merge")
