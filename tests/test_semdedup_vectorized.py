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
from pyspark.errors import ArithmeticException
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
    reject_ansi_error=False,
):
    try:
        a = sim.semdedup_prune(
            df,
            n_centroids=n_centroids,
            iters=iters,
            threshold=threshold,
            collapse=collapse,
            impl="sql",
        ).collect()
    except ArithmeticException:
        if not reject_ansi_error:
            raise
        # a kmeans centroid's 6dp-rounded components collapsed to the
        # zero vector, so the ANSI plan cannot evaluate centroid_sim
        # at all (DIVIDE_BY_ZERO before either impl's pair stage).
        # The parity claim is scoped to inputs the SQL plan evaluates
        # — reject the example, don't compare.
        assume(False)
    b = sim.semdedup_prune(
        df,
        n_centroids=n_centroids,
        iters=iters,
        threshold=threshold,
        collapse=collapse,
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
    _cmp(
        spark,
        df,
        threshold=thr,
        collapse=collapse,
        reject_ansi_error=True,
    )
