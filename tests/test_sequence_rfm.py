"""Semantics + plan checks for sequence match, rank-ties, RFM, fuzzy."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from knn_using_hadoop_spark import contract

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sequence_match_semantics(spark, monkeypatch):
    def _ev(eid, uid, day_hour, etype):
        d, h = day_hour
        return (
            eid, uid, dt.datetime(2024, 1, d, h), etype, 1.0, "{}"
        )

    rows = [
        # user 1: signup -> purchase next day, no error: MATCH
        _ev(1, 1, (1, 0), "signup"), _ev(2, 1, (2, 0), "purchase"),
        # user 2: signup -> error -> purchase: NO match
        _ev(3, 2, (1, 0), "signup"), _ev(4, 2, (2, 0), "error"),
        _ev(5, 2, (3, 0), "purchase"),
        # user 3: signup, purchase 8 days later: NO match (window)
        _ev(6, 3, (1, 0), "signup"), _ev(7, 3, (9, 1), "purchase"),
        # user 4: signup, nothing after: NO match
        _ev(8, 4, (1, 0), "signup"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    import knn_using_hadoop_spark.contract as c
    # patch the DEFINING module: after the contract split, each
    # submodule binds load_table in its own globals
    from knn_using_hadoop_spark.contract import sequences_rfm

    monkeypatch.setattr(
        sequences_rfm, "load_table", lambda spark, name, sf_dir: ev
    )
    got = {
        r["signup_id"]: (r["matched"], r["hours_to_purchase"])
        for r in c.q_events_sequence_match(spark, SF).collect()
    }
    assert got[1] == (1, 24.0)
    assert got[3][0] == 0 and got[3][1] is None
    assert got[6][0] == 0
    assert got[8][0] == 0


def test_topk_with_ties_keeps_all_tied_rows(spark):
    df = contract.q_topk_with_ties(spark, SF)
    rows = df.collect()
    # with rank semantics, every returned row's band is within the
    # top-3 distinct bands of its group
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["o_orderpriority"], set()).add(r["price_band"])
    for bands in by_grp.values():
        assert len(bands) <= 3
    assert "WindowGroupLimit" in _plan(df)


def test_rfm_quartiles_balanced(spark):
    rows = contract.q_customer_rfm_quartiles(spark, SF).collect()
    from collections import Counter

    seg_sizes = Counter(r["c_mktsegment"] for r in rows)
    for col in ("r_q", "f_q", "m_q"):
        per = Counter((r["c_mktsegment"], r[col]) for r in rows)
        for (seg, q), n in per.items():
            # ntile balance: sizes differ by at most 1
            assert abs(n - seg_sizes[seg] / 4) <= 1
            assert 1 <= q <= 4


def test_fuzzy_matches_blocked_join_plan(spark):
    df = contract.q_part_fuzzy_matches(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every surfaced pair shares the blocking noun and is within 3 edits
    for r in df.limit(50).collect():
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1]
        assert r["edit_dist"] <= 3
