"""Approximate KNN (MLlib LSH): recall + contract shape vs exact KNN."""

from __future__ import annotations

import numpy as np
import pytest

from knn_using_hadoop_spark.operators.knn import knn_neighbors
from knn_using_hadoop_spark.operators.knn_approx import (
    knn_approx_neighbors,
    knn_approx_predict,
)


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    n_train, n_test, dim = 500, 40, 6
    centers = rng.normal(0, 20, size=(5, dim))
    ytr = rng.integers(0, 5, n_train)
    yte = rng.integers(0, 5, n_test)
    xtr = centers[ytr] + rng.normal(0, 2, (n_train, dim))
    xte = centers[yte] + rng.normal(0, 2, (n_test, dim))
    mk = lambda x, y: spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]], int(y[i])) for i in range(len(x))],
        "id long, features array<double>, label int",
    )
    return mk(xtr, ytr), mk(xte, yte)


def test_approx_recall_vs_exact(clustered):
    train, test = clustered
    k = 5
    exact = {
        (r.test_id, r.train_id)
        for r in knn_neighbors(train, test, k).collect()
    }
    approx = {
        (r.test_id, r.train_id)
        for r in knn_approx_neighbors(
            train, test, k, bucket_length=8.0, num_hash_tables=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.8, f"LSH recall too low: {recall}"


def test_approx_predict_contract(clustered):
    train, test = clustered
    preds = knn_approx_predict(
        train, test, 5, bucket_length=8.0
    ).collect()
    assert 0 < len(preds) <= 40
    assert all(0 <= r.prediction <= 4 for r in preds)
    # deterministic under a fixed seed
    again = knn_approx_predict(train, test, 5, bucket_length=8.0).collect()
    assert sorted(map(tuple, preds)) == sorted(map(tuple, again))
