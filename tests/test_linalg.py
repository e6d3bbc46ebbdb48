"""Covariance matrix + power-iteration PC1 vs NumPy, and the
rolling-distinct formulation vs brute force."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import linalg
from knn_using_hadoop_spark.operators.timeseries import (
    rolling_distinct_daily,
)
from knn_using_hadoop_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, "embeddings", SF)


def _numpy_matrix(embs):
    rows = embs.select("vec_id", "embedding").collect()
    return np.array(
        [r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype=np.float64,
    )


def test_covariance_matches_numpy(spark, embs):
    X = _numpy_matrix(embs)
    mu = np.round(X.mean(axis=0), 6)  # the 6dp protocol rounding
    C = (X - mu).T @ (X - mu) / X.shape[0]
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in linalg.covariance_upper(embs, dim=X.shape[1]).collect()
    }
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - C[i - 1, j - 1]) < 2e-6, (i, j)


def test_power_iteration_converges_toward_pc1(spark, embs):
    X = _numpy_matrix(embs)
    mu = np.round(X.mean(axis=0), 6)
    C = (X - mu).T @ (X - mu) / X.shape[0]
    # NumPy reference: same power iteration, same per-round rounding
    v = np.ones(X.shape[1]) / np.sqrt(X.shape[1])
    Cr = np.round(C, 6)  # engine aggregates round cov to 6dp
    for _ in range(3):
        w = Cr @ v
        v = np.round(w / np.linalg.norm(w), 8)
    if v[0] < 0:
        v = -v
    got = linalg.power_iteration_pc1(embs, dim=X.shape[1], rounds=3)
    got_v = np.array(
        [r["v"] for r in sorted(got.collect(), key=lambda r: r["i"])]
    )
    # bit-level parity with the NumPy replica of the same iteration
    # (the synthetic corpus is near-isotropic — lambda2/lambda1 ~ 0.93
    # — so closeness to the TRUE pc1 after 3 rounds is not the
    # operator's contract; see test below for convergence on
    # anisotropic data)
    assert np.abs(got_v - v).max() < 1e-5


def test_power_iteration_converges_on_anisotropic_data(spark):
    rng = np.random.RandomState(7)
    d, n = 16, 400
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    X = rng.randn(n, d) * 0.05 + np.outer(rng.randn(n) * 3.0, direction)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    got = linalg.power_iteration_pc1(df, dim=d, rounds=5)
    got_v = np.array(
        [r["v"] for r in sorted(got.collect(), key=lambda r: r["i"])]
    )
    Xf = X.astype(np.float32).astype(np.float64)  # engine stores float32
    mu = np.round(Xf.mean(axis=0), 6)
    C = (Xf - mu).T @ (Xf - mu) / n
    pc1 = np.linalg.eigh(C)[1][:, -1]
    cos = abs(float(got_v @ pc1) / np.linalg.norm(got_v))
    assert cos > 0.999


def test_rolling_distinct_matches_bruteforce(spark):
    ev = load_table(spark, "events", SF)
    got = {
        r["day"]: r["user_ids_7d"]
        for r in rolling_distinct_daily(ev, window_days=7).collect()
    }
    pairs = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct().collect()
    by_day = {}
    for r in pairs:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    for d in days:
        expect = set()
        for back in range(7):
            expect |= by_day.get(d - dt.timedelta(days=back), set())
        assert got[d] == len(expect), d
    assert set(got) == set(days)


def test_rolling_distinct_plan_has_no_nlj(spark):
    ev = load_table(spark, "events", SF)
    plan = rolling_distinct_daily(ev)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _round_half_up(x: float, nd: int) -> float:
    # Spark's F.round / DuckDB round use HALF_UP, not Python's
    # banker's rounding.
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-nd),
            rounding=decimal.ROUND_HALF_UP,
        )
    )


def test_logreg_gd_matches_numpy_replica(spark):
    li = load_table(spark, "lineitem", SF)
    feats = li.select(
        (F.col("l_quantity") / 50).alias("x1"),
        (F.col("l_discount") * 10).alias("x2"),
        (F.col("l_tax") * 10).alias("x3"),
        F.when(F.col("l_returnflag") == "R", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    row = linalg.logreg_gd(feats, ["x1", "x2", "x3"], "y").collect()[0]

    pdf = feats.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.x1, pdf.x2, pdf.x3]
    ).astype(np.float64)
    y = pdf.y.to_numpy(dtype=np.float64)
    w = np.zeros(4)
    for _ in range(3):
        p = np.array(
            [
                _round_half_up(v, 6)
                for v in 1.0 / (1.0 + np.exp(-(X @ w)))
            ]
        )
        g = np.array(
            [
                _round_half_up(v, 6)
                for v in (X.T @ (p - y)) / len(y)
            ]
        )
        w = w - g
    # rounding every round makes the replica near-bit-identical; the
    # only slack is summation order inside one aggregate (<= 1 ulp of
    # the 6dp grid)
    for j in range(4):
        assert abs(row[f"w{j}"] - w[j]) < 2e-6, (j, row[f"w{j}"], w[j])
    p = np.array(
        [_round_half_up(v, 6) for v in 1.0 / (1.0 + np.exp(-(X @ w)))]
    )
    assert row["n_rows"] == len(y)
    assert row["n_pred_pos"] == int((p > 0.5).sum())
    assert row["n_correct"] == int(((p > 0.5) == (y == 1.0)).sum())


def test_logreg_gd_learns_separable_data(spark):
    # planted signal: y depends on x1 -> GD must beat the prior
    rows = [(float(i % 40) / 40.0, 1.0 if i % 40 >= 20 else 0.0)
            for i in range(400)]
    feats = spark.createDataFrame(rows, "x1 double, y double")
    got = linalg.logreg_gd(feats, ["x1"], "y", rounds=8).collect()[0]
    assert got["w1"] > 0.5  # positive slope learned
    assert got["n_correct"] > 300  # >75% on linearly-separable data
