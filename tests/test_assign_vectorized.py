"""Equality pin: the Arrow-vectorized IVF cell assignment is
bit-identical to the SQL plan it replaces.

The vectorized kernel (similarity._assign_cells_vectorized) claims
bit-exact parity with the declarative crossJoin + 6dp-rounded-cosine
+ window plan, including Spark's NaN/null total-order edge semantics.
These tests pin that claim on the driver-gate shape (sf0.01, C=16 —
the registry oracles' exact configuration), on crafted edge corpora
(NaN components, zero norms, null vectors/elements, ragged lengths,
rounding near-ties), and on hypothesis-random corpora.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
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


def _both(spark, vec_rows, cent_rows, dim=None):
    vecs = spark.createDataFrame(vec_rows, EMB)
    cents = spark.createDataFrame(
        cent_rows,
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    a = sim.ivf_assign_cells(vecs, cents, dim=dim, impl="sql").collect()
    b = sim.ivf_assign_cells(
        vecs, cents, dim=dim, impl="vectorized"
    ).collect()
    da = {r["vec_id"]: r["cell"] for r in a}
    db = {r["vec_id"]: r["cell"] for r in b}
    return da, db


def test_gate_shape_sf001(spark):
    """The registry oracles' exact configuration: sf0.01, C=16."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    cents = (
        embs.orderBy(F.col("vec_id").asc())
        .limit(16)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    a = sim.ivf_assign_cells(embs, cents, impl="sql").collect()
    b = sim.ivf_assign_cells(embs, cents, impl="vectorized").collect()
    assert {(r[0], r[1]) for r in a} == {(r[0], r[1]) for r in b}
    assert len(a) == embs.count()


def test_edge_rows(spark):
    """NaN components, zero norms, null vector, null element, ragged
    length, exact-duplicate vectors: same cells as the SQL plan."""
    nan = float("nan")
    vec_rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [nan, 1.0, 0.0]),  # NaN dot -> NaN greatest
        (4, None),  # null vector -> null dots, nulls last
        (5, [1.0, None, 0.0]),  # null element -> null dots
        (6, [1.0, 0.0]),  # ragged vs centroid dim -> null dots
        (7, [0.0, 1.0, 0.0]),
        (8, [0.0, 1.0, 0.0]),  # duplicate of 7
        (9, [-1.0, -1.0, -1.0]),
    ]
    cent_rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),
        (12, [0.7, 0.7, 0.0]),
    ]
    da, db = _both(spark, vec_rows, cent_rows)
    assert da == db
    assert set(da) == {1, 2, 4, 5, 6, 7, 8, 9}
    # the null/NaN rows land on the lowest centroid_id, as the
    # window's (desc nulls-last / NaN-greatest, id asc) order demands
    for vid in (2, 4, 5, 6):
        assert da[vid] == 10


def test_zero_norm_ieee_vs_ansi_error(spark):
    """Zero-norm vectors: the ANSI SQL plan raises DIVIDE_BY_ZERO
    (Spark 4 default); the kernel follows the module's documented
    IEEE protocol instead — 0/0 sims are NaN, NaN ranks greatest,
    ties to the lowest centroid_id. Pinned directly, not vs SQL."""
    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], EMB
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    b = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_assign_cells(
            vecs, cents, impl="vectorized"
        ).collect()
    }
    assert b == {1: 10, 2: 10}
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        sim.ivf_assign_cells(vecs, cents, impl="sql").collect()


def test_nan_centroid(spark):
    """A NaN centroid makes ONE column NaN for every row; NaN ranks
    greatest, so every row must pick it (lowest NaN id on ties)."""
    nan = float("nan")
    vec_rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    cent_rows = [(10, [1.0, 0.0]), (11, [nan, 0.0])]
    da, db = _both(spark, vec_rows, cent_rows)
    assert da == db
    assert da[1] == 11 and da[2] == 11


def test_rounding_near_tie(spark):
    """Two centroids whose sims agree to <1e-6 force the kernel's
    Decimal HALF_UP tie path; winner must match the SQL window."""
    base = [1.0, 2.0, 3.0, 4.0]
    eps_variants = [
        [1.0, 2.0, 3.0, 4.0 + 4e-7],
        [1.0, 2.0, 3.0 + 3e-7, 4.0],
        [1.0 + 1e-7, 2.0, 3.0, 4.0],
        [1.0, 2.0, 3.0, 4.0],
    ]
    vec_rows = [(i, base) for i in range(1, 4)] + [
        (i + 10, v) for i, v in enumerate(eps_variants)
    ]
    cent_rows = [(100 + j, v) for j, v in enumerate(eps_variants)]
    da, db = _both(spark, vec_rows, cent_rows)
    assert da == db


def test_empty_centroids(spark):
    vecs = spark.createDataFrame([(1, [1.0, 2.0])], EMB)
    cents = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    a = sim.ivf_assign_cells(vecs, cents, impl="sql").collect()
    b = sim.ivf_assign_cells(vecs, cents, impl="vectorized").collect()
    assert a == [] and b == []


def test_dim_given_expanded_fold(spark):
    """dim=N picks the unrolled fold (bare-p0 start); the kernel
    replicates that start too."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    cents = (
        embs.orderBy(F.col("vec_id").asc())
        .limit(8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    d = len(embs.select("embedding").first()[0])
    a = sim.ivf_assign_cells(embs, cents, dim=d, impl="sql").collect()
    b = sim.ivf_assign_cells(
        embs, cents, dim=d, impl="vectorized"
    ).collect()
    assert {(r[0], r[1]) for r in a} == {(r[0], r[1]) for r in b}


def test_dim_overlength_rows_use_prefix_sims(spark):
    """dim set + rows LONGER than dim (ADVICE r5 #1): the SQL plan's
    _dot_expanded reads element_at 1..dim only, so over-length rows
    compute real prefix sims — the kernel must slice them to the
    first dim elements, not dump them on the lowest centroid. Null
    elements BEYOND dim are invisible to both plans."""
    vec_rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 99.0]),  # prefix == row 1
        (3, [0.0, 1.0, 0.0, -5.0, 7.0]),  # prefix == centroid 11
        (4, [0.0, 1.0, 0.0, None]),  # null beyond dim: clean
        (5, [0.7, 0.7, 0.0, float("nan")]),  # NaN beyond dim: clean
        (6, [1.0, None, 0.0, 2.0]),  # null INSIDE dim -> null dots
    ]
    cent_rows = [
        (10, [1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0]),
        (12, [0.7, 0.7, 0.0]),
    ]
    da, db = _both(spark, vec_rows, cent_rows, dim=3)
    assert da == db
    assert da[2] == da[1] == 10
    assert da[3] == da[4] == 11
    assert da[5] == 12
    assert da[6] == 10  # null dot -> nulls-last tie -> lowest id


def test_dim_short_rows_are_divergence_domain(spark):
    """Rows SHORTER than dim make the ANSI SQL plan raise
    (element_at out of bounds); the kernel follows the documented
    null-sim protocol -> lowest centroid_id."""
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0])], EMB
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        T.StructType(
            [
                T.StructField("centroid_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    out = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_assign_cells(
            vecs, cents, dim=3, impl="vectorized"
        ).collect()
    }
    assert out == {1: 10, 2: 10}


def test_plan_has_no_window_or_join(spark):
    """The vectorized plan must not materialize the pair relation:
    no Window, no join — that is the point of the kernel."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    cents = (
        embs.orderBy(F.col("vec_id").asc())
        .limit(8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    df = sim.ivf_assign_cells(embs, cents, impl="vectorized")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.one_of(
                st.floats(
                    min_value=-10, max_value=10, allow_nan=False
                ),
                st.just(float("nan")),
                st.just(0.0),
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=3,
        max_size=12,
    )
)
def test_property_random_corpora(spark, data):
    from hypothesis import assume

    # exact-zero-norm vectors (including squared-underflow, e.g.
    # 1e-259^2 -> 0.0) make the ANSI SQL arm raise DIVIDE_BY_ZERO
    # (see test_zero_norm_ieee_vs_ansi_error) — keep the property on
    # the domain where both impls are defined
    def sqn(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return acc

    assume(all(sqn(v) != 0.0 for v in data))
    vec_rows = [(i, v) for i, v in enumerate(data)]
    cent_rows = [(100 + i, v) for i, v in enumerate(data[:3])]
    da, db = _both(spark, vec_rows, cent_rows)
    assert da == db
