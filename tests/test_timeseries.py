"""Calendar gap-fill and first-seen cohort operators."""

from __future__ import annotations

import datetime

from knn_using_hadoop_spark.operators import timeseries as ts


def _events(spark):
    d = datetime.datetime
    rows = [
        (1, d(2024, 3, 1, 10)),
        (1, d(2024, 3, 1, 11)),
        (1, d(2024, 3, 3, 9)),
        (2, d(2024, 3, 2, 8)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_gap_fill_daily_dense_grid(spark):
    out = ts.gap_fill_daily(_events(spark), "user_id", "ts").collect()
    # 2 users x 3 days (Mar 1-3) — every cell present
    assert len(out) == 6
    got = {(r.user_id, r.day.isoformat()): r.n_events for r in out}
    assert got[(1, "2024-03-01")] == 2
    assert got[(1, "2024-03-02")] == 0  # gap zero-filled
    assert got[(1, "2024-03-03")] == 1
    assert got[(2, "2024-03-01")] == 0
    assert got[(2, "2024-03-02")] == 1
    assert got[(2, "2024-03-03")] == 0


def test_new_keys_daily(spark):
    out = {
        r.day.isoformat(): r.n_new
        for r in ts.new_keys_daily(_events(spark), "user_id", "ts").collect()
    }
    # user 1 first seen Mar 1, user 2 Mar 2; Mar 3 adds nobody
    assert out == {"2024-03-01": 1, "2024-03-02": 1}


def test_ewma_matches_python_replica(spark):
    from knn_using_hadoop_spark.contract import (
        REGISTRY,
        _EWMA_COEFS,
        _EWMA_K,
    )
    from knn_using_hadoop_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_id"]: r["ewma"]
        for r in REGISTRY["events_ewma"].spark_fn(spark, sf).collect()
    }
    ev = sorted(
        load_table(spark, "events", sf)
        .filter("user_id % 25 = 0")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    series = {}
    for r in ev:
        series.setdefault(r["user_id"], []).append(r)
    n_checked = 0
    for rows in series.values():
        for i, r in enumerate(rows):
            num = den = 0.0
            for k in range(min(i, _EWMA_K) + 1):
                num += rows[i - k]["value"] * _EWMA_COEFS[k]
                den += _EWMA_COEFS[k]
            assert abs(got[r["event_id"]] - num / den) < 1e-5
            n_checked += 1
    assert n_checked == len(got) > 0
