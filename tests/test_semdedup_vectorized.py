"""Equality pin: semdedup's Arrow pair-stage kernel is bit-identical
to the SQL self-join plan, for both keep policies.

``_semdedup_stats_vectorized`` claims exact parity with the
declarative within-cell pair join + threat aggregation (BLAS screen
under a rigorous error bound, exact-fold borderline recompute,
BigDecimal-HALF_UP replica at the 6dp threshold boundary, Spark
NaN-greatest / NaN==NaN comparison semantics). Pinned on the driver-
gate shape (sf0.01, the registry's exact knobs), on pile-up corpora
that exercise the collapse, on NaN members, and on hypothesis-random
corpora with threshold values straddling typical sims.
"""

from __future__ import annotations

import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knn_using_hadoop_spark.operators import similarity as sim

EMB = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _keyset(rows):
    import math

    def c(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    return {
        (r["vec_id"], r["cell"], c(r["centroid_sim"]), r["keep"])
        for r in rows
    }


def _cmp(
    spark,
    df,
    *,
    threshold,
    collapse,
    n_centroids=4,
    iters=1,
    dim=None,
):
    a = sim.semdedup_prune(
        df,
        n_centroids=n_centroids,
        iters=iters,
        threshold=threshold,
        collapse=collapse,
        dim=dim,
        impl="sql",
    ).collect()
    b = sim.semdedup_prune(
        df,
        n_centroids=n_centroids,
        iters=iters,
        threshold=threshold,
        collapse=collapse,
        dim=dim,
        impl="vectorized",
    ).collect()
    assert _keyset(a) == _keyset(b)
    assert len(a) == len(b)
    return a


def test_gate_shape_sf001(spark):
    """The registry oracle's exact configuration (C=16, iters=1,
    threshold=0.35) — both collapse modes."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    for collapse in (False, True):
        _cmp(
            spark,
            embs,
            threshold=0.35,
            collapse=collapse,
            n_centroids=16,
        )


def test_pile_up_corpus(spark):
    """Interleaved exact-duplicate piles: the collapse path's
    within-pile / cross-pile logic, both impls equal."""
    base = (
        spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        .select("vec_id", "embedding")
        .limit(40)
    )
    piled = base.union(
        base.select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    ).union(
        base.select(
            (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
        )
    )
    for collapse in (False, True):
        for thr in (0.35, 0.95, 1.5):
            _cmp(spark, piled, threshold=thr, collapse=collapse)


def test_nan_members(spark):
    """NaN vectors: NaN pair sims QUALIFY (Spark NaN >= t) and NaN
    centroid_sims follow the NaN-greatest keep order."""
    nan = float("nan")
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [nan, 1.0, 0.0]),
        (4, [nan, 2.0, 0.0]),
        (5, [0.0, 1.0, 0.0]),
        (6, [1.0, 0.0, 1e-3]),
    ]
    df = spark.createDataFrame(rows, EMB)
    out = _cmp(spark, df, threshold=0.9, collapse=False)
    assert len(out) == 6


def test_threshold_exact_one(spark):
    """threshold=1.0: only exact (post-rounding) duplicates are
    pruned; identical vectors' sims round to exactly 1.0 and hit the
    kernel's memoized Decimal boundary path for every pair."""
    base = [1.0, 2.0, 3.0]
    rows = [(i, base) for i in range(10)] + [
        (100, [1.0, 2.0, 3.0000001]),
        (101, [-1.0, -2.0, -3.0]),
    ]
    df = spark.createDataFrame(rows, EMB)
    out = _cmp(spark, df, threshold=1.0, collapse=False)
    kept = {r["vec_id"] for r in out if r["keep"]}
    # one survivor of the identical pile; near-identical and the
    # antipode survive iff their rounded sim < 1.0
    assert 0 in kept and 101 in kept


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False),
            min_size=3,
            max_size=3,
        ),
        min_size=4,
        max_size=14,
    ),
    thr=st.sampled_from([0.0, 0.5, 0.9, 0.999999, 1.0]),
    collapse=st.booleans(),
)
def test_property_random(spark, data, thr, collapse):
    def sqn(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return acc

    assume(all(sqn(v) != 0.0 for v in data))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], EMB
    )
    # no ANSI-raise scoping (r5 verdict #2): a kmeans centroid whose
    # 6dp-rounded components collapse to the zero vector now yields
    # null centroid_sims (nullif'd norm product), not DIVIDE_BY_ZERO
    # — both impls keep such members, compared like any other draw.
    _cmp(spark, df, threshold=thr, collapse=collapse)


def test_dim_mixed_overlength_corpus(spark):
    """dim set on a mixed/over-length corpus (ADVICE r5 #2): the SQL
    pair sim is _dot(av, bv, dim) = element_at 1..dim, so pairs of
    rows BOTH >= dim qualify on their prefix dots even when their
    full lengths differ — the kernel must slice every clean row to
    dim and compare them in one group, not group by full length."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 99.0]),  # prefix-identical to 1
        (3, [0.0, 1.0, 0.0, -5.0, 7.0]),
        (4, [0.0, 1.0, 0.0]),  # prefix-identical to 3
        (5, [0.9, 0.1, 0.0, 1.0]),
        (6, [-1.0, -1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, EMB)
    for collapse in (False, True):
        for thr in (0.5, 1.0):
            out = _cmp(
                spark,
                df,
                threshold=thr,
                collapse=collapse,
                n_centroids=2,
                dim=3,
            )
            if thr == 1.0:
                kept = {r["vec_id"] for r in out if r["keep"]}
                # prefix-identical cross-length pairs dedup iff they
                # share a cell; full-length grouping would keep both
                rem = {1, 2, 3, 4} - kept
                assert rem, (
                    "cross-length prefix duplicates never compared"
                )


def test_degenerate_zero_centroid(spark):
    """A cell whose mean rounds to the zero vector at 6dp: the ANSI
    plan used to raise DIVIDE_BY_ZERO in the centroid_sim projection
    (r5 verdict #2); now every member gets a null centroid_sim, a
    null keep order removes nobody, and all impl x collapse paths
    agree."""
    rows = [
        (1, [1e-8, -1e-8, 1e-8]),
        (2, [-1e-8, 1e-8, -1e-8]),
        (3, [2e-8, -2e-8, 2e-8]),
        (4, [-2e-8, 2e-8, -2e-8]),
    ]
    df = spark.createDataFrame(rows, EMB)
    for collapse in (False, True):
        out = _cmp(
            spark, df, threshold=0.5, collapse=collapse,
            n_centroids=1,
        )
        assert all(r["centroid_sim"] is None for r in out)
        assert all(r["keep"] for r in out)


def test_null_bearing_duplicates_stay_singletons(spark):
    """Null-array / null-element duplicates (ADVICE r5 #3): their
    pair sims are null under the HOF fold and never qualify, so the
    uncollapsed plan keeps every copy — the collapse path must NOT
    pool them into a content pile (whose within-pile rule would
    remove the non-rep copies)."""
    nul = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField(
                "embedding", T.ArrayType(T.DoubleType(), True), True
            ),
        ]
    )
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [None, 1.0, 0.0]),
        (4, [None, 1.0, 0.0]),  # exact copy of 3: same content key
        (5, None),
        (6, None),  # exact copy of 5
        (7, [0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, nul)
    for thr in (0.35, 1.0):
        out_c = _cmp(
            spark, df, threshold=thr, collapse=True, n_centroids=2
        )
        out_u = _cmp(
            spark, df, threshold=thr, collapse=False, n_centroids=2
        )
        # collapsed == uncollapsed on null-bearing piles (the ADVICE
        # r5 #3 regression: collapse used to pool them and drop the
        # non-rep copies)
        assert _keyset(out_c) == _keyset(out_u)
        kept = {r["vec_id"] for r in out_c if r["keep"]}
        assert {3, 4, 5, 6} <= kept
    # exact real-vector duplicates still dedup through the pile rule
    assert 2 not in kept and 1 in kept  # thr=1.0: only sim==1 pairs
