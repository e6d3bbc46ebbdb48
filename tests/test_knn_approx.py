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


# ---------------------------------------------------------------------------
# persisted IVF index (build once / query many)
# ---------------------------------------------------------------------------


def test_ivf_index_equals_inline_and_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
        query_ivf_index,
    )

    rows = [
        (i, [float((i * 13 + j * 5) % 23) + 0.5 for j in range(8)])
        for i in range(300)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "ivfidx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)

    got = query_ivf_index(spark, path, queries, 5, nprobe=2)
    want = ivf_probe_topk(
        corpus, queries, 5, n_centroids=8, iters=1, nprobe=2
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the probed-cell filter reaches the scan as a partition filter:
    # only the probed cell directories are read
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)


def test_ivf_index_single_probe_subset(spark, tmp_path):
    """nprobe=1 candidates are a subset of nprobe=2's."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    rows = [
        (i, [float((i * 7 + j * 11) % 19) + 1.0 for j in range(6)])
        for i in range(200)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "ivfidx1")
    build_ivf_index(corpus, path, n_centroids=6, iters=1)
    one = query_ivf_index(spark, path, queries, 200, nprobe=1)
    two = query_ivf_index(spark, path, queries, 200, nprobe=2)
    s1 = {(r.query_id, r.vec_id) for r in one.collect()}
    s2 = {(r.query_id, r.vec_id) for r in two.collect()}
    assert s1 <= s2 and len(s2) > len(s1)
