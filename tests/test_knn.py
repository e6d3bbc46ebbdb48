"""Exact-KNN operator vs a brute-force NumPy oracle (FIXTURES.md F1/F2).

Oracle semantics = the documented (bug-free) reference semantics:
squared Euclidean over features, k smallest with (dist, train_id)
tie-break, majority vote with (count desc, label asc) tie-break.
"""

from __future__ import annotations

import numpy as np
import pytest

from knn_using_hadoop_spark.functions.features import with_features
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
)


def _numpy_knn(train_x, train_y, test_x, k):
    """Brute-force oracle: returns (neighbor_idx[test,k], pred[test])."""
    preds = []
    neigh = []
    for q in test_x:
        d = ((train_x - q) ** 2).sum(axis=1)
        # deterministic tie-break: (dist, train_id) — lexsort is stable
        order = np.lexsort((np.arange(len(d)), d))[:k]
        neigh.append(order)
        labels = train_y[order]
        vals, counts = np.unique(labels, return_counts=True)
        # max count, then lowest label
        best = vals[np.lexsort((vals, -counts))][0]
        preds.append(best)
    return np.array(neigh), np.array(preds)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    rng = np.random.default_rng(42)
    n_train, n_test, n_feat, n_class = 400, 50, 7, 4
    centers = rng.normal(0, 10, size=(n_class, n_feat))
    train_y = rng.integers(0, n_class, size=n_train)
    test_y = rng.integers(0, n_class, size=n_test)
    train_x = centers[train_y] + rng.normal(0, 3, size=(n_train, n_feat))
    test_x = centers[test_y] + rng.normal(0, 3, size=(n_test, n_feat))
    # quantize so distance ties actually occur (exercises tie-break)
    train_x = np.round(train_x, 1)
    test_x = np.round(test_x, 1)

    rows_tr = [
        (int(i), [float(v) for v in train_x[i]], int(train_y[i]))
        for i in range(n_train)
    ]
    rows_te = [
        (int(i), [float(v) for v in test_x[i]], int(test_y[i]))
        for i in range(n_test)
    ]
    schema = "id long, features array<double>, label int"
    train = spark.createDataFrame(rows_tr, schema)
    test = spark.createDataFrame(rows_te, schema)
    return train, test, train_x, train_y, test_x, test_y


def test_knn_neighbors_matches_numpy(fixture_dfs):
    train, test, train_x, train_y, test_x, _ = fixture_dfs
    k = 5
    got = (
        knn_neighbors(train, test, k)
        .orderBy("test_id", "rank")
        .collect()
    )
    expected_idx, _ = _numpy_knn(train_x, train_y, test_x, k)
    by_test = {}
    for r in got:
        by_test.setdefault(r.test_id, []).append(r)
    assert len(by_test) == len(test_x)
    for tid, rows in by_test.items():
        assert [r.train_id for r in rows] == [int(i) for i in expected_idx[tid]]
        # dist values match the float64 brute force
        d = ((train_x - test_x[tid]) ** 2).sum(axis=1)
        for r in rows:
            assert r.dist == pytest.approx(d[r.train_id], rel=1e-12)
        # ranks are 1..k ascending by dist
        assert [r.rank for r in rows] == list(range(1, k + 1))


def test_knn_predict_matches_numpy(fixture_dfs):
    train, test, train_x, train_y, test_x, _ = fixture_dfs
    k = 5
    got = {r.test_id: r.prediction for r in knn_predict(train, test, k).collect()}
    _, expected = _numpy_knn(train_x, train_y, test_x, k)
    assert got == {i: int(expected[i]) for i in range(len(test_x))}


def test_knn_accuracy(fixture_dfs):
    train, test, train_x, train_y, test_x, test_y = fixture_dfs
    k = 5
    preds = knn_predict(train, test, k)
    acc = knn_accuracy(preds, test).collect()[0].accuracy
    _, expected = _numpy_knn(train_x, train_y, test_x, k)
    assert acc == pytest.approx(float((expected == test_y).mean()))
    assert acc > 0.5  # clustered fixture should be learnable


def test_knn_on_parquet_features(spark, sf_dir):
    """End-to-end over the driver's lineitem table (FIXTURES.md F5)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.orderBy(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    )
    li = li.withColumn("row_id", F.row_number().over(w))
    base = with_features(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        label_col="l_linenumber",
        id_col="row_id",
    )
    test = base.filter(base.id % 100 == 0)
    train = base.filter(base.id % 100 != 0)
    out = knn_predict(train, test, 3).collect()
    assert len(out) == test.count()
    assert all(1 <= r.prediction <= 7 for r in out)
