"""ARFF Python Data Source: format("arff") parity with the CSV-scan
reader, exactly-once byte-range splits."""

from __future__ import annotations

import pytest

REF_SMALL = "/root/reference/datasets/small-train.arff"


@pytest.fixture(scope="module")
def registered(spark):
    from knn_using_hadoop_spark.sources.arff_datasource import (
        ArffDataSource,
    )

    spark.dataSource.register(ArffDataSource)
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_format_arff_matches_csv_reader(registered, spark):
    from knn_using_hadoop_spark.sources.arff import read_arff

    via_source = spark.read.format("arff").load(REF_SMALL)
    via_csv = read_arff(spark, REF_SMALL)
    # the Python DataSource API normalizes nullability; names + types
    # are the contract
    assert [(f.name, f.dataType) for f in via_source.schema.fields] == [
        (f.name, f.dataType) for f in via_csv.schema.fields
    ]
    assert _rows(via_source) == _rows(via_csv)


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_split_alignment_exactly_once(registered, spark, n_parts):
    """Any split count yields every row exactly once (boundary lines
    are owned by exactly one byte range)."""
    from knn_using_hadoop_spark.sources.arff import read_arff

    df = (
        spark.read.format("arff")
        .option("numPartitions", str(n_parts))
        .load(REF_SMALL)
    )
    assert df.rdd.getNumPartitions() == n_parts
    assert _rows(df) == _rows(read_arff(spark, REF_SMALL))
