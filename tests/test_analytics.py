"""Unit + plan tests for the round-2 analytic operators.

Semantics on small synthetic frames (known answers), plus the plan
shapes the 100 TB design depends on: one Exchange for the rank
surface's two window specs, equi-join (never cartesian) for the
interval join, broadcast vocab for the LM scorer, and
partition-independence for the Misra-Gries heavy hitters.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from knn_using_hadoop_spark import contract
from knn_using_hadoop_spark.operators import analytics as an
from knn_using_hadoop_spark.operators.sketches import mg_heavy_hitters

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )


def test_rank_surface_single_exchange(spark):
    """Two window specs (rank family + ntile) share one shuffle."""
    df = contract.q_orders_rank_surface(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 2


def test_rank_surface_tie_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1, 30), ("a", 2, 30), ("a", 3, 10)],
        "part string, id long, v long",
    )
    out = {
        r["id"]: r
        for r in an.rank_surface(
            df, "part", F.col("v"), "id", n_tiles=3
        ).collect()
    }
    assert out[1]["rnk"] == out[2]["rnk"] == 1  # tied at the top
    assert out[3]["rnk"] == 3  # rank skips, dense_rank doesn't
    assert out[3]["dense_rnk"] == 2
    assert {out[1]["tile"], out[2]["tile"], out[3]["tile"]} == {1, 2, 3}


def test_forward_fill_carries_and_leads_null(spark):
    ev = _events(
        spark,
        [
            (1, 7, _ts(1), "view", 9.0),
            (2, 7, _ts(2), "purchase", 5.0),
            (3, 7, _ts(3), "view", 9.0),
            (4, 7, _ts(4), "purchase", 6.0),
            (5, 7, _ts(5), "error", 9.0),
        ],
    )
    got = {
        r["event_id"]: r["carried_value"]
        for r in an.forward_fill(
            ev, F.when(F.col("event_type") == "purchase", F.col("value"))
        ).collect()
    }
    assert got == {1: None, 2: 5.0, 3: 5.0, 4: 6.0, 5: 6.0}


def test_scd2_intervals_chain(spark):
    ev = _events(
        spark,
        [
            (1, 7, _ts(1), "trial", 0.0),
            (2, 7, _ts(2), "trial", 0.0),  # no change -> absorbed
            (3, 7, _ts(3), "paid", 0.0),
            (4, 7, _ts(4), "churned", 0.0),
        ],
    )
    hist = sorted(
        an.scd2_history(ev).collect(), key=lambda r: r["version"]
    )
    assert [r["attr_value"] for r in hist] == ["trial", "paid", "churned"]
    # each version's valid_to is the next version's valid_from
    for prev, nxt in zip(hist, hist[1:]):
        assert prev["valid_to"] == nxt["valid_from"]
    assert hist[-1]["valid_to"] is None  # current version open-ended


def test_rolling_anomaly_flags_planted_outlier(spark):
    rows = [
        (i, 7, _ts(1, i), "view", 100.0 + (i % 3)) for i in range(1, 12)
    ]
    rows.append((12, 7, _ts(1, 12), "view", 500.0))  # the anomaly
    flagged = an.rolling_anomaly(_events(spark, rows)).collect()
    assert [r["event_id"] for r in flagged] == [12]
    assert abs(flagged[0]["z"]) > 2


def test_ols_recovers_planted_line(spark):
    # y = 2.5 * days + 10, exact: slope/intercept recovered to 1e-6
    rows = [
        (i, 7, _ts(1 + i), "m", 10.0 + 2.5 * i) for i in range(10)
    ]
    out = an.ols_trend(_events(spark, rows)).collect()[0]
    assert out["n"] == 10
    assert abs(out["slope_per_day"] - 2.5) < 1e-6
    assert abs(out["intercept"] - 10.0) < 1e-3


def test_attribution_join_is_equi_not_cartesian(spark):
    df = contract.q_events_click_purchase_join(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_window_boundaries(spark):
    ev = _events(
        spark,
        [
            (1, 7, dt.datetime(2024, 1, 1, 10, 0, 0), "click", 0.0),
            (2, 7, dt.datetime(2024, 1, 1, 10, 9, 59), "click", 0.0),
            (3, 7, dt.datetime(2024, 1, 1, 10, 15, 0), "purchase", 1.0),
            (4, 8, dt.datetime(2024, 1, 1, 10, 14, 0), "click", 0.0),
        ],
    )
    pairs = an.attribution_join(ev).collect()
    # click 1 is 15 min before the purchase (outside 10-min window),
    # click 2 is 5:01 before (inside); user 8's click never matches
    assert [(r["effect_id"], r["cause_id"]) for r in pairs] == [(3, 2)]
    assert pairs[0]["lag_secs"] == 301.0


def test_unigram_logprob_broadcasts_vocab(spark):
    df = contract.q_doc_unigram_logprob(spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_mg_heavy_hitters_partition_independent(spark):
    # zipf-ish: 'a' x 60, 'b' x 25, tail of 15 singletons; n=100, k=10
    # threshold n/k = 10 -> exactly {a, b} qualify
    vals = ["a"] * 60 + ["b"] * 25 + [f"t{i}" for i in range(15)]
    df = spark.createDataFrame([(v,) for v in vals], "item string")
    for parts in (1, 7):
        out = {
            r["item"]: r["cnt"]
            for r in mg_heavy_hitters(
                df.repartition(parts), "item", k=10
            ).collect()
        }
        assert out == {"a": 60, "b": 25}


def test_mg_matches_plain_groupby_on_corpus(spark):
    toks = contract.load_docs_wide(spark, SF).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    k = 40
    got = {
        (r["tok"], r["cnt"])
        for r in mg_heavy_hitters(toks, "tok", k=k).collect()
    }
    n = toks.count()
    want = {
        (r["tok"], r["cnt"])
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > n)
        .collect()
    }
    assert got == want and len(want) > 0


def test_mad_outliers_flags_planted_point_not_inliers(spark):
    # 40 values tightly around 100 plus one wild point; a mean/stddev
    # z-score would be dragged by the outlier, MAD must not be
    rows = [
        (i, 7, _ts(1, i % 20 + 1), "view", 100.0 + (i % 5) * 0.5)
        for i in range(40)
    ]
    rows.append((99, 7, _ts(2, 1), "view", 10_000.0))
    out = an.mad_outliers(_events(spark, rows)).collect()
    assert [r["event_id"] for r in out] == [99]
    assert abs(out[0]["mz"]) > 100


def test_mad_outliers_zero_mad_group_unscored(spark):
    # all-identical group: MAD = 0 -> no rows flagged, no div-by-zero
    rows = [(i, 7, _ts(1, i + 1), "click", 5.0) for i in range(10)]
    assert an.mad_outliers(_events(spark, rows)).count() == 0


def test_kmv_jaccard_estimates_close_to_truth(spark):
    from knn_using_hadoop_spark.operators.sketches import (
        kmv_jaccard_pairs,
    )
    from knn_using_hadoop_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    est = {
        (r["t1"], r["t2"]): (r["jaccard_est"], r["est_intersection"])
        for r in kmv_jaccard_pairs(
            ev, "event_type", "user_id", k=64
        ).collect()
    }
    sets = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    assert len(est) == len(sets) * (len(sets) - 1) // 2
    for (t1, t2), (jac_e, int_e) in est.items():
        a, b = sets[t1], sets[t2]
        true_j = len(a & b) / len(a | b)
        # k=64 -> typical sketch error ~1/sqrt(64); allow 3 sigma
        assert abs(jac_e - true_j) < 0.40, (t1, t2, jac_e, true_j)
        if len(a & b):
            assert abs(int_e - len(a & b)) < 0.75 * len(a & b) + 5, (
                t1, t2,
            )


def test_countmin_overestimates_only_and_exact_when_sparse(spark):
    from knn_using_hadoop_spark.operators.sketches import (
        countmin_estimates,
    )

    # dense case: top tokens of a real corpus — CMS may overcount but
    # never undercounts
    from knn_using_hadoop_spark.sources.tables import load_table

    toks = (
        load_table(spark, "documents", SF)
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    for r in countmin_estimates(toks, "tok").collect():
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overestimate"] == r["cms_est"] - r["exact_cnt"]

    # sparse case: 3 items cannot collide into wrong MIN across 3
    # independent rows unless all 3 rows collide — with 64 buckets
    # that is effectively impossible; estimates are exact
    small = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "tok string"
    )
    got = {
        r["item"]: (r["exact_cnt"], r["cms_est"])
        for r in countmin_estimates(small, "tok").collect()
    }
    assert got == {"a": (5, 5), "b": (3, 3), "c": (2, 2)}


# ---------------------------------------------------------------------------
# grid quantile sketch
# ---------------------------------------------------------------------------


def test_grid_quantiles_error_bound_and_merge(spark):
    """abs_err <= err_bound is structural (the rank statistic falls
    in the selected bin), and the sketch is partition-independent
    (bin counts merge by summation)."""
    from knn_using_hadoop_spark.operators.sketches import grid_quantiles

    rows = [(float(v),) for v in [1, 1, 2, 3, 5, 8, 13, 21, 34, 55,
                                  89, 144, 233, 377, 610, 987]]
    df = spark.createDataFrame(rows, "x double")
    out = {r.p: r for r in grid_quantiles(df, "x", width=8).collect()}
    assert len(out) == 5
    for r in out.values():
        assert r.abs_err <= r.err_bound + 1e-9
    # heavily skewed data: the exact rank stats are correct
    assert out[0.5].exact == 21.0  # rank ceil(0.5*16) = 8 -> 8th value
    assert out[0.99].exact == 987.0
    # partition independence
    again = {
        r.p: r
        for r in grid_quantiles(
            df.repartition(7), "x", width=8
        ).collect()
    }
    assert {p: (v.grid_est, v.exact) for p, v in out.items()} == {
        p: (v.grid_est, v.exact) for p, v in again.items()
    }


def test_grid_quantiles_constant_column(spark):
    from knn_using_hadoop_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame([(42.0,)] * 9, "x double")
    for r in grid_quantiles(df, "x", width=16).collect():
        assert r.exact == 42.0
        assert r.abs_err == 0.0 and r.err_bound == 0.0


def test_mg_weighted_equals_unweighted(spark):
    """Weighted MG over collapsed (item, pile-weight) rows returns
    exactly the unweighted answer over the expanded stream (r5):
    counts are additive, and the weighted-MG overflow rule keeps the
    candidate-superset guarantee (undercount <= W_p/(k+1))."""
    vals = (
        ["a"] * 60 + ["b"] * 25 + [f"t{i}" for i in range(15)]
    ) * 3
    flat = spark.createDataFrame([(v,) for v in vals], "item string")
    piled = flat.groupBy("item").agg(F.count(F.lit(1)).alias("w"))

    def key(df):
        return sorted(
            (r["item"], r["cnt"], r["n_total"]) for r in df.collect()
        )

    want = key(mg_heavy_hitters(flat, "item", k=10))
    for parts in (1, 7):
        got = key(
            mg_heavy_hitters(
                piled.repartition(parts), "item", k=10, weight_col="w"
            )
        )
        assert got == want
    # piles split across rows (same item appears with several
    # weights) must still sum correctly through the sketch + rescue
    split = flat.groupBy(
        "item", (F.crc32(F.col("item")) % 2).alias("half")
    ).agg(F.count(F.lit(1)).alias("w"))
    assert key(
        mg_heavy_hitters(split, "item", k=10, weight_col="w")
    ) == want


def test_mg_update_superset_guarantee_property():
    """Pure-Python property pin of the weighted-MG guarantee that
    makes mg_heavy_hitters' exact rescue complete: for ANY weighted
    stream, ANY batch split, and ANY partitioning, every item whose
    global weight strictly exceeds W/k survives in the union of
    per-partition candidate sets (undercount <= W_p/(k+1) per
    partition + pigeonhole across partitions)."""
    from hypothesis import given, settings, strategies as st

    from knn_using_hadoop_spark.operators.sketches import _mg_update

    stream = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # item
            st.integers(min_value=1, max_value=9),   # weight
        ),
        min_size=1,
        max_size=120,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        pairs=stream,
        k=st.integers(min_value=1, max_value=6),
        n_parts=st.integers(min_value=1, max_value=4),
        batch=st.integers(min_value=1, max_value=7),
    )
    def check(pairs, k, n_parts, batch):
        total: dict = {}
        for v, w in pairs:
            total[v] = total.get(v, 0) + w
        W = sum(total.values())
        heavy = {v for v, c in total.items() if c * k > W}

        candidates: set = set()
        for p in range(n_parts):
            part = [vw for i, vw in enumerate(pairs) if i % n_parts == p]
            counters: dict = {}
            for i in range(0, len(part), batch):
                _mg_update(counters, part[i : i + batch], k)
            candidates |= set(counters)
        assert heavy <= candidates

    check()
