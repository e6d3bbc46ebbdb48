"""Equality pins: the per-cell top-k Arrow kernel
(``_cell_topk_candidates`` via ``ivf_topk``/``ivf_probe_topk``) and
the vectorized per-group mean (``mean_vectors``) match their SQL
plans.

The top-k kernel claims bit-identical output to the declarative pair
join + window (exact fold-order dots, BigDecimal-HALF_UP rounding,
NaN-greatest ordering, null sims last, self-exclusion). Pinned on
the driver-gate shape (sf0.01, registry knobs), NaN / ragged / null
members, k larger than the cell, and hypothesis-random corpora.
``mean_vectors`` is deterministic-modulo-rounding-grain (different
summation order than Spark's avg, same protocol as the DuckDB
oracles), so its pin is exact equality of the ROUNDED outputs on
real and hostile corpora — the same claim the registry oracle makes.
"""

from __future__ import annotations

import math

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


def _canon(rows):
    def c(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return repr(v) if isinstance(v, float) else v

    return sorted(
        (r["query_id"], r["rank"], r["vec_id"], c(r["sim"]))
        for r in rows
    )


def _cmp_topk(df, queries, k, *, nc=16, dim=None, probe=None):
    if probe is None:
        a = sim.ivf_topk(
            df, queries, k, n_centroids=nc, dim=dim, impl="sql"
        ).collect()
        b = sim.ivf_topk(
            df, queries, k, n_centroids=nc, dim=dim, impl="vectorized"
        ).collect()
    else:
        a = sim.ivf_probe_topk(
            df, queries, k, n_centroids=nc, nprobe=probe, dim=dim,
            impl="sql",
        ).collect()
        b = sim.ivf_probe_topk(
            df, queries, k, n_centroids=nc, nprobe=probe, dim=dim,
            impl="vectorized",
        ).collect()
    assert _canon(a) == _canon(b)
    return a


def test_gate_shape_sf001(spark):
    """The registry oracle's exact configuration, both operators,
    both dot forms."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    _cmp_topk(embs, queries, 5, nc=16)
    _cmp_topk(embs, queries, 5, nc=16, dim=64)
    _cmp_topk(embs, queries, 5, nc=16, probe=2)
    _cmp_topk(embs, queries, 5, nc=16, dim=64, probe=3)


def test_k_exceeds_cell_and_null_fill(spark):
    """k larger than any cell: the window keeps null-sim rows
    (ragged + null vectors) after the real ones — the kernel must
    emit them in the same order (nulls last, vec_id asc)."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.5, 0.5]),  # ragged -> null sim vs 3-dim
        (5, None),  # null vector -> null sim
        (6, [0.1, None, 0.2]),  # null element -> null sim
        (7, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, EMB)
    out = _cmp_topk(df, df, 6, nc=2)
    assert len(out) > 0


def test_nan_members_rank_first(spark):
    """NaN sims are greatest in the window's desc order; ties by
    vec_id asc."""
    nan = float("nan")
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [nan, 1.0]),
        (4, [nan, 2.0]),
        (5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, EMB)
    out = _cmp_topk(df, df, 3, nc=1)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # for non-NaN queries, the NaN-vector members (3, 4) produce NaN
    # sims and occupy the top ranks in id order; NaN queries see NaN
    # against EVERY member, so their ranking is pure vec_id asc
    for qid in (1, 2, 5):
        rs = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rs[:2]] == [3, 4]
    for qid in (3, 4):
        rs = sorted(by_q[qid], key=lambda r: r["rank"])
        expect = [i for i in (1, 2, 3, 4, 5) if i != qid][:3]
        assert [r["vec_id"] for r in rs] == expect


def test_duplicate_pile_ties(spark):
    """Exact-duplicate piles: identical rounded sims, ties broken by
    vec_id asc — boundary of the kernel's tie-capped selection."""
    base = [1.0, 2.0, 3.0]
    rows = [(i, base) for i in range(20)] + [
        (100, [1.0, 2.0, 3.1]),
        (101, [3.0, 2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, EMB)
    queries = df.filter(F.col("vec_id").isin(0, 100, 101))
    _cmp_topk(df, queries, 5, nc=3)
    _cmp_topk(df, queries, 5, nc=3, probe=2)


def test_lsh_bucket_topk_parity(spark):
    """The LSH rerank through the shared kernel (bucket = cell):
    registry shape + a hostile corpus (null vector, NaN vector,
    ragged length — null-sim fill across the shared bucket 0)."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    for npl in (6, None):
        a = sim.lsh_bucket_topk(
            embs, queries, 5, 64, n_planes=npl, impl="sql"
        ).collect()
        b = sim.lsh_bucket_topk(
            embs, queries, 5, 64, n_planes=npl, impl="vectorized"
        ).collect()
        assert _canon(a) == _canon(b)
    nan = float("nan")
    rows = [
        (1, [1.0] * 64),
        (2, [0.9] * 64),
        (3, None),
        (4, [nan] * 64),
        (5, [1.0] * 32),
        (6, [-1.0] * 64),
    ]
    df = spark.createDataFrame(rows, EMB)
    a = sim.lsh_bucket_topk(df, df, 4, 64, n_planes=4, impl="sql").collect()
    b = sim.lsh_bucket_topk(
        df, df, 4, 64, n_planes=4, impl="vectorized"
    ).collect()
    assert _canon(a) == _canon(b)
    # the null-vector and ragged rows share bucket 0 and pair up
    # with null sims — the kernel's cross-length fill path
    assert {(r["query_id"], r["vec_id"]) for r in b} == {
        (3, 5),
        (5, 3),
    }


def test_lsh_bucket_ids_bit_parity(spark):
    """Direct bucket-id pin for the sign kernel (r5 verdict #4):
    kernel buckets == the interpreted bucket_expr on the registry
    corpus AND a hostile one (null vector / null element / NaN /
    ±Inf cancellation / ragged short AND long / all-zero / exact
    boundary projections). End-to-end top-k parity alone could mask
    a bucket flip that happens not to change any top-k set."""
    import hashlib

    from pyspark.sql import types as T

    def plane_sign(p, i):
        h = int(
            hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16
        )
        return 1.0 if h % 2 == 0 else -1.0

    def bucket_expr(vec, n_planes, dim):
        total = None
        for p in range(n_planes):
            signs = F.array(
                *[F.lit(plane_sign(p, i)) for i in range(1, dim + 1)]
            )
            proj = F.aggregate(
                F.zip_with(
                    signs, vec, lambda s, x: s * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            total = bit if total is None else total + bit
        return total

    import numpy as np

    nan, inf = float("nan"), float("inf")
    for dim, n_planes, df in (
        (
            64,
            8,
            spark.read.parquet(
                "/root/testdata/sf0.01/embeddings.parquet"
            ).select("vec_id", "embedding"),
        ),
        (
            3,
            5,
            spark.createDataFrame(
                [
                    (1, [1.0, 2.0, 3.0]),  # exact-zero projections
                    (2, [nan, 1.0, 1.0]),
                    (3, [1.0, None, 1.0]),
                    (4, None),
                    (5, [1.0, 2.0]),  # short
                    (6, [1.0, 2.0, 3.0, 4.0]),  # long
                    (7, [inf, 1.0, -inf]),  # Inf-Inf cancellation
                    (8, [0.0, 0.0, 0.0]),
                    (9, [-1e-300, 1e-300, 0.0]),  # subnormal-scale
                ],
                EMB,
            ),
        ),
    ):
        Snp = np.array(
            [
                [plane_sign(p, i) for i in range(1, dim + 1)]
                for p in range(n_planes)
            ]
        )
        want = {
            (r["vec_id"], r["b"])
            for r in df.select(
                "vec_id",
                bucket_expr(
                    F.col("embedding"), n_planes, dim
                ).alias("b"),
            ).collect()
        }
        got = {
            (r["vec_id"], r["bucket"])
            for r in sim._lsh_buckets_vectorized(
                df, "vec_id", "vec_id", "embedding", Snp,
                n_planes, dim,
            ).collect()
        }
        assert got == want


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.one_of(
                st.floats(
                    min_value=-6, max_value=6, allow_nan=False
                ),
                st.just(float("nan")),
                st.just(0.0),
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=10,
    ),
    n_planes=st.sampled_from([3, 6]),
)
def test_lsh_bucket_ids_property(spark, data, n_planes):
    """Hypothesis twin of the crafted bucket-id pin: random corpora
    (NaN components, exact zeros, near-boundary sums) — kernel
    buckets == the interpreted fold expression, bit for bit."""
    import hashlib

    import numpy as np

    dim = 3

    def plane_sign(p, i):
        h = int(
            hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16
        )
        return 1.0 if h % 2 == 0 else -1.0

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], EMB
    )
    total = None
    for p in range(n_planes):
        signs = F.array(
            *[F.lit(plane_sign(p, i)) for i in range(1, dim + 1)]
        )
        proj = F.aggregate(
            F.zip_with(
                signs,
                F.col("embedding"),
                lambda s, x: s * x.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        total = bit if total is None else total + bit
    want = {
        (r["vec_id"], r["b"])
        for r in df.select("vec_id", total.alias("b")).collect()
    }
    Snp = np.array(
        [
            [plane_sign(p, i) for i in range(1, dim + 1)]
            for p in range(n_planes)
        ]
    )
    got = {
        (r["vec_id"], r["bucket"])
        for r in sim._lsh_buckets_vectorized(
            df, "vec_id", "vec_id", "embedding", Snp, n_planes, dim
        ).collect()
    }
    assert got == want


def test_cosine_topk_parity(spark):
    """The zero-shuffle brute-force kernel vs the broadcast-NL pair
    plan: registry shape (both dot forms, both self-exclusion modes)
    and a hostile corpus (null / NaN / ragged / null-element
    members)."""
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    for expand in (False, True):
        for ex_self in (True, False):
            a = sim.cosine_topk(
                embs, queries, 10, 64, expand=expand,
                exclude_self=ex_self, impl="sql",
            ).collect()
            b = sim.cosine_topk(
                embs, queries, 10, 64, expand=expand,
                exclude_self=ex_self, impl="vectorized",
            ).collect()
            assert _canon(a) == _canon(b)
    nan = float("nan")
    rows = [
        (1, [1.0] * 64),
        (2, [0.9] * 64),
        (3, None),
        (4, [nan] * 64),
        (5, [1.0] * 32),
        (6, [-1.0] * 64),
        (7, [0.5, None] + [0.1] * 62),
    ]
    df = spark.createDataFrame(rows, EMB)
    qs = df.filter(F.col("vec_id").isin(1, 6))
    a = sim.cosine_topk(df, qs, 5, 64, impl="sql").collect()
    b = sim.cosine_topk(df, qs, 5, 64, impl="vectorized").collect()
    assert _canon(a) == _canon(b)


def test_l2_topk_parity(spark):
    """The squared-L2 brute-force kernel (asc window: nulls FIRST,
    NaN last) vs the pair plan — registry shape + hostile corpus."""

    def canon_d(rows):
        def c(v):
            if isinstance(v, float) and math.isnan(v):
                return "NaN"
            return repr(v) if isinstance(v, float) else v

        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], c(r["dist"]))
            for r in rows
        )

    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    queries = embs.filter(F.col("vec_id") % 50 == 0)
    a = sim.l2_topk(embs, queries, 10, impl="sql").collect()
    b = sim.l2_topk(embs, queries, 10, impl="vectorized").collect()
    assert canon_d(a) == canon_d(b)
    nan = float("nan")
    rows = [
        (1, [1.0] * 8),
        (2, [0.9] * 8),
        (3, None),
        (4, [nan] * 8),
        (5, [1.0] * 4),
        (6, [-1.0] * 8),
        (7, [0.5, None] + [0.1] * 6),
    ]
    df = spark.createDataFrame(rows, EMB)
    qs = df.filter(F.col("vec_id").isin(1, 6))
    a = sim.l2_topk(df, qs, 4, impl="sql").collect()
    b = sim.l2_topk(df, qs, 4, impl="vectorized").collect()
    assert canon_d(a) == canon_d(b)
    # null-dist partners (3, 5, 7) occupy the TOP ranks under asc
    for qid in (1, 6):
        rs = sorted(
            (r for r in b if r["query_id"] == qid),
            key=lambda r: r["rank"],
        )
        assert [r["vec_id"] for r in rs[:3]] == [3, 5, 7]


def test_mean_vectors_real_corpus(spark):
    embs = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    )
    a = sim.mean_vectors(
        embs, "label", "embedding", out_vec="c", impl="sql"
    ).collect()
    b = sim.mean_vectors(
        embs, "label", "embedding", out_vec="c", impl="vectorized"
    ).collect()
    ka = sorted((r["label"], tuple(r["c"])) for r in a)
    kb = sorted((r["label"], tuple(r["c"])) for r in b)
    assert ka == kb


def test_mean_vectors_hostile(spark):
    """Ragged lengths, null arrays, null elements, empty arrays,
    NaN components, all-null positions — the posexplode semantics."""
    S = T.StructType(
        [
            T.StructField("g", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    nan = float("nan")
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (1, [4.0, 5.0]),
        (1, None),
        (1, []),
        (2, [None, 7.0]),
        (2, [1.0, None, 9.0]),
        (3, None),
        (3, []),  # group vanishes entirely
        (4, [nan, 1.0]),
        (4, [2.0, 3.0]),
        (5, [None, None]),  # all-null positions -> null components
    ]
    df = spark.createDataFrame(rows, S)
    a = sim.mean_vectors(df, "g", "v", out_vec="c", impl="sql").collect()
    b = sim.mean_vectors(
        df, "g", "v", out_vec="c", impl="vectorized"
    ).collect()

    def c2(rows_):
        out = []
        for r in rows_:
            vv = (
                None
                if r["c"] is None
                else tuple(
                    "NaN"
                    if (x is not None and math.isnan(x))
                    else x
                    for x in r["c"]
                )
            )
            out.append((r["g"], vv))
        return sorted(out)

    assert c2(a) == c2(b)
    assert 3 not in {r["g"] for r in b}


def test_mean_vectors_rounding_boundary_adversarial(spark):
    """Means landing EXACTLY on a 6dp HALF_UP boundary (ADVICE r5
    #4): the vectorized kernel sums in column-sorted pairwise order,
    the SQL plan in Spark's partial-aggregation order — the module's
    claim is that both land on the same rounded value. Two-row
    groups make every summation order bitwise identical (a+b is
    commutative in IEEE), so this pins the ROUNDING replica exactly
    at the boundary, where a 1-ulp sum divergence would flip the
    grain: HALF_UP away from zero (2.5e-6 -> 3e-6, -2.5e-6 ->
    -3e-6), against HALF_EVEN's 2e-6. A failure here means the
    kernel's boundary arithmetic diverged — the flip the docstring
    promises is absorbed would be silently reshaping centroids."""
    S = T.StructType(
        [
            T.StructField("g", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    vec = [2.5e-6, -2.5e-6, 1.5e-6, -1.5e-6, 0.1234565, -0.1234565]
    rows = [(1, vec), (1, list(vec)), (2, [3.5e-6] * 2), (2, [4.5e-6] * 2)]
    df = spark.createDataFrame(rows, S)
    a = sim.mean_vectors(df, "g", "v", out_vec="c", impl="sql").collect()
    b = sim.mean_vectors(
        df, "g", "v", out_vec="c", impl="vectorized"
    ).collect()
    ka = sorted((r["g"], tuple(r["c"])) for r in a)
    kb = sorted((r["g"], tuple(r["c"])) for r in b)
    assert ka == kb
    asmap = dict(ka)
    assert asmap[1] == (3e-6, -3e-6, 2e-6, -2e-6, 0.123457, -0.123457)
    assert asmap[2] == (4e-6, 4e-6)


@settings(max_examples=8, deadline=None)
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
    k=st.sampled_from([1, 3, 7]),
    probe=st.sampled_from([None, 2]),
)
def test_property_random(spark, data, k, probe):
    def sqn(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return acc

    assume(all(sqn(v) != 0.0 for v in data))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], EMB
    )
    from pyspark.errors import ArithmeticException

    try:
        _cmp_topk(df, df, k, nc=3, probe=probe)
    except ArithmeticException:
        # a kmeans centroid rounded to the zero vector: the ANSI
        # plan raises before either impl's pair stage (same scoping
        # as test_semdedup_vectorized)
        assume(False)
