"""Property-based tests (SURVEY.md §5 strategy: randomized invariants).

hypothesis generates small datasets; one shared SparkSession keeps
example cost ~100ms. Invariants:

* engine KNN == brute-force NumPy oracle under documented semantics
* predictions always land in the train-label domain
* duplicating every train row never changes predictions for the same
  k-multiplicity (vote ratios preserved: k doubles with copies)
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knn_using_hadoop_spark.operators.knn import knn_neighbors, knn_predict

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, x, y):
    return spark.createDataFrame(
        [
            (int(i), [float(v) for v in x[i]], int(y[i]))
            for i in range(len(x))
        ],
        "id long, features array<double>, label int",
    )


def _numpy_predict(train_x, train_y, test_x, k):
    preds = []
    for q in test_x:
        d = ((train_x - q) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d)), d))[:k]
        vals, cnts = np.unique(train_y[order], return_counts=True)
        preds.append(int(vals[np.lexsort((vals, -cnts))][0]))
    return preds


@given(seed=st.integers(0, 10_000), k=st.integers(1, 7))
@settings(**_SETTINGS)
def test_knn_matches_numpy_oracle(spark, seed, k):
    rng = np.random.default_rng(seed)
    n_train = int(rng.integers(k, 40))
    n_test = int(rng.integers(1, 6))
    dim = int(rng.integers(1, 5))
    # quantized values force distance ties -> exercises tie-breaks
    train_x = np.round(rng.normal(0, 2, (n_train, dim)), 1)
    test_x = np.round(rng.normal(0, 2, (n_test, dim)), 1)
    train_y = rng.integers(0, 3, n_train)
    train = _mk(spark, train_x, train_y)
    test = _mk(spark, test_x, np.zeros(n_test, dtype=int))
    got = {
        r.test_id: r.prediction
        for r in knn_predict(train, test, k).collect()
    }
    expected = _numpy_predict(train_x, train_y, test_x, k)
    assert got == {i: expected[i] for i in range(n_test)}
    assert set(got.values()) <= set(int(v) for v in train_y)


@given(seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_duplicated_train_rows_scale_votes(spark, seed):
    rng = np.random.default_rng(seed)
    n, dim, k = 20, 3, 3
    x = np.round(rng.normal(0, 2, (n, dim)), 1)
    y = rng.integers(0, 3, n)
    q = np.round(rng.normal(0, 2, (2, dim)), 1)
    train = _mk(spark, x, y)
    test = _mk(spark, q, np.zeros(2, dtype=int))
    base = {
        r.test_id: r.prediction
        for r in knn_predict(train, test, k).collect()
    }
    # duplicate every train row (fresh ids), double k: same neighbor
    # multiset per test row at 2x multiplicity -> same majority vote
    dup = _mk(spark, np.vstack([x, x]), np.concatenate([y, y]))
    doubled = {
        r.test_id: r.prediction
        for r in knn_predict(dup, test, 2 * k).collect()
    }
    assert base == doubled


@given(k=st.integers(1, 5))
@settings(**_SETTINGS)
def test_neighbors_sorted_and_unique(spark, k):
    rng = np.random.default_rng(k)
    x = np.round(rng.normal(0, 1, (15, 2)), 1)
    y = rng.integers(0, 2, 15)
    train = _mk(spark, x, y)
    test = _mk(spark, x[:3], y[:3])
    rows = knn_neighbors(train, test, k).collect()
    by_test: dict[int, list] = {}
    for r in rows:
        by_test.setdefault(r.test_id, []).append(r)
    for tid, rs in by_test.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.dist for r in rs]
        assert dists == sorted(dists)
        assert len({r.train_id for r in rs}) == len(rs)
        # test rows are drawn from train -> rank 1 is the row itself
        assert rs[0].train_id == tid and rs[0].dist == 0.0


@given(seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_gap_fill_dense_and_count_preserving(spark, seed):
    """gap_fill_daily: output is always the dense |keys| x |days| grid
    and the zero-fill never changes total event counts."""
    import datetime

    from knn_using_hadoop_spark.operators.timeseries import gap_fill_daily

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    base = datetime.datetime(2024, 5, 1)
    rows = [
        (
            int(rng.integers(0, 5)),
            base + datetime.timedelta(
                days=int(rng.integers(0, 10)),
                seconds=int(rng.integers(0, 86400)),
            ),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = gap_fill_daily(df, "user_id", "ts").collect()

    days = {r[1].date() for r in rows}
    span = (max(days) - min(days)).days + 1
    keys = {r[0] for r in rows}
    assert len(out) == len(keys) * span
    assert sum(r.n_events for r in out) == n
    assert all(r.n_events >= 0 for r in out)


# ---------------------------------------------------------------------------
# shared_passage_spans == pure-Python replica
# ---------------------------------------------------------------------------


def _py_spans(docs, win, cap):
    from collections import defaultdict

    occ = defaultdict(list)
    for doc_id, text in docs:
        t = text.split(" ")
        for i in range(len(t) - win + 1):
            occ[" ".join(t[i : i + win])].append((doc_id, i))
    diag = defaultdict(list)
    for g, o in occ.items():
        if len({d for d, _ in o}) < 2 or len(o) > cap:
            continue
        for da, pa in o:
            for db, pb in o:
                if da < db:
                    diag[(da, db, pa - pb)].append((pa, pb))
    out = []
    for (da, db, d), ps in diag.items():
        ps = sorted(set(p for p, _ in ps))
        start = prev = ps[0]
        for p in ps[1:]:
            if p == prev + 1:
                prev = p
            else:
                out.append((da, db, start, start - d, prev - start + win))
                start = prev = p
        out.append((da, db, start, start - d, prev - start + win))
    return sorted(out)


@given(seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_shared_passage_spans_match_python_replica(spark, seed):
    """Random tiny-alphabet corpora (collisions + real shared runs
    arise naturally): the operator's maximal spans equal a
    brute-force positional replica, island-for-island."""
    from knn_using_hadoop_spark.operators.dedup import (
        shared_passage_spans,
    )

    rng = np.random.default_rng(seed)
    docs = [
        (
            i,
            " ".join(
                rng.choice(list("abcd"), size=rng.integers(4, 25))
            ),
        )
        for i in range(int(rng.integers(2, 6)))
    ]
    win, cap = 3, 50
    got = sorted(
        (r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_tokens)
        for r in shared_passage_spans(
            spark.createDataFrame(docs, "doc_id long, text string"),
            win=win,
            max_occurrences=cap,
        ).collect()
    )
    assert got == _py_spans(docs, win, cap)


# ---------------------------------------------------------------------------
# grid_quantiles == pure-Python replica
# ---------------------------------------------------------------------------


def _py_grid_quantiles(vals, probs, width):
    import math

    n = len(vals)
    lo, hi = min(vals), max(vals)
    bw = (hi - lo) / width
    buckets = [
        0 if hi == lo else min(math.floor((v - lo) / bw), width - 1)
        for v in vals
    ]
    s = sorted(vals)
    out = {}
    for p in probs:
        k = math.ceil(p * n)
        cum = 0
        for b in range(width):
            cum += sum(1 for x in buckets if x == b)
            if cum >= k:
                est = lo + (b + 0.5) * bw
                break
        exact = s[k - 1]
        out[p] = (round(est, 6), round(exact, 6))
    return out


@given(seed=st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_grid_quantiles_match_python_replica(spark, seed):
    from knn_using_hadoop_spark.operators.sketches import grid_quantiles

    rng = np.random.default_rng(seed)
    vals = [
        float(v)
        for v in rng.integers(-50, 5_000, size=int(rng.integers(3, 60)))
    ]
    probs = (0.25, 0.5, 0.9)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.p: (r.grid_est, r.exact)
        for r in grid_quantiles(df, "x", probs=probs, width=16).collect()
    }
    assert got == _py_grid_quantiles(vals, probs, 16)


# ---------------------------------------------------------------------------
# minhash_sig_est_pruned == distinct doc_b of minhash_sig_est_pairs
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@given(
    data=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(_WORDS), min_size=0, max_size=8
            ),
            st.integers(0, 3),  # number of extra copies of this doc
        ),
        min_size=1,
        max_size=10,
    ),
    threshold=st.sampled_from([0.25, 0.5, 1.0]),
)
@settings(**_SETTINGS)
def test_sig_est_pruned_equals_pairs_property(spark, data, threshold):
    """The signature-group-collapsed pruned set is an exact rewrite
    of 'distinct doc_b of the pair operator' for ANY corpus —
    including empty docs, sub-shingle-width docs, and duplicate
    piles with arbitrary id interleavings."""
    from knn_using_hadoop_spark.operators import dedup

    rows = []
    i = 0
    for words, copies in data:
        text = " ".join(words)
        for _ in range(copies + 1):
            rows.append((i, text))
            i += 7  # non-contiguous ids: rep/min arithmetic must not
            # depend on density
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r.doc_b
        for r in dedup.minhash_sig_est_pairs(docs, threshold=threshold)
        .select("doc_b")
        .distinct()
        .collect()
    }
    got = {
        r.doc_id
        for r in dedup.minhash_sig_est_pruned(
            docs, threshold=threshold
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# decontaminate(collapse=True) == decontaminate(collapse=False)
# ---------------------------------------------------------------------------


@given(
    data=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(_WORDS), min_size=0, max_size=10
            ),
            st.integers(0, 3),  # extra copies of this text
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_decontaminate_collapse_property(spark, data):
    """Content-collapsed decontamination is an exact rewrite of the
    direct per-doc plan for ANY corpus — duplicate piles that land on
    either side of the doc_id%bench_mod boundary, zero-gram docs,
    empty texts (r5; same contract as the sig_est_pruned rewrite)."""
    from knn_using_hadoop_spark.operators import curation

    rows = []
    i = 0
    for words, copies in data:
        text = " ".join(words)
        for _ in range(copies + 1):
            rows.append((i, text))
            i += 3  # ids stride across the bench_mod classes
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def key(df):
        return sorted(
            (
                r["doc_id"],
                r["n_grams"],
                r["n_overlap"],
                r["overlap_frac"],
                r["contaminated"],
            )
            for r in df.collect()
        )

    direct = key(curation.decontaminate(docs, n=2, collapse=False))
    collapsed = key(curation.decontaminate(docs, n=2, collapse=True))
    assert collapsed == direct
