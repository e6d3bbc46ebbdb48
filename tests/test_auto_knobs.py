"""Data-dependent ANN/cluster knob defaults (r3 verdict ask #1).

The r3 100x stress proved FIXED knobs (IVF n_centroids, LSH plane
count, semdedup cells) are a scale bug: cells/buckets grow linearly
with n, so the "bucketed" operators degrade back to all-pairs. The
operators now derive the knob from a corpus count when the caller
leaves it unset. These tests pin, at 1x (sf0.1 embeddings) and a
replicated 10x:

- the structural invariant that motivated the change: cell count
  tracks sqrt(n) and LSH bucket occupancy stays in its designed band
  as n grows 10x;
- recall floors: >= 0.8 at 10x (clustered data — the case ANN
  exists for); a documented >= 0.2 floor for IVF at 1x. The sf0.1
  synthetic embeddings are near-uniform, the worst case for ANY
  sublinear ANN at ANY knob setting (measured: sign-LSH recall is
  ~0.01-0.06 for every plane count 4..8; IVF recall tracks the
  candidate fraction) — for such corpora the exact operators are the
  right tool, and no fixed-knob default did better (fixed nc=16
  scans 12.5% of the corpus to reach 0.43).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.1"
DIM = 64


@pytest.fixture(scope="module")
def emb_1x(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_10x(spark, emb_1x):
    """gen_scale_data's recipe: id-shifted copies, first component
    nudged so points are distinct but the distribution is unchanged."""
    copies = spark.range(10).select(F.col("id").alias("c"))
    return (
        emb_1x.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("c") * 1_000_000).alias("vec_id"),
            F.concat(
                F.array(
                    (
                        F.element_at("embedding", 1) + F.col("c") * 1e-3
                    ).cast("float")
                ),
                F.slice("embedding", 2, DIM - 1),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )


def _recall_at_10(corpus, approx_thunk, query_mod=500):
    q = corpus.filter(F.col("vec_id") % query_mod == 0)
    nq = q.count()
    exact = sim.cosine_topk(corpus, q, 10, DIM).localCheckpoint(
        eager=True
    )
    hits = approx_thunk(q).join(exact, ["query_id", "vec_id"]).count()
    return hits / (10.0 * nq)


def test_auto_knob_values_track_sqrt_n(emb_1x, emb_10x):
    n1, n10 = emb_1x.count(), emb_10x.count()
    c1 = sim._auto_n_centroids(emb_1x)
    c10 = sim._auto_n_centroids(emb_10x)
    assert c1 == math.isqrt(n1) and c10 == math.isqrt(n10)
    # 10x data -> ~sqrt(10) more cells, NOT 10x more per-cell work
    assert 2.5 <= c10 / c1 <= 4.0
    # LSH: expected occupancy n/2^p stays inside the designed band
    for corpus, n in ((emb_1x, n1), (emb_10x, n10)):
        p = sim._auto_n_planes(corpus, k=10)
        occ = n / (1 << p)
        target = max(32, 4 * 10)
        assert target / 2 <= occ <= target * 2


def test_precomputed_n_skips_the_count_job(spark):
    """r5 verdict #3: passing ``n=`` must short-circuit the knob's
    corpus count() entirely — on a derived-lineage corpus that count
    re-executes the full upstream plan per operator call. Pinned by
    handing the knob helpers a corpus whose count() raises."""

    class _Boom:
        def count(self):
            raise AssertionError(
                "auto knob executed corpus.count() despite n="
            )

    assert sim._auto_n_centroids(_Boom(), n=250_000) == 500
    assert sim._auto_n_planes(_Boom(), k=10, n=40_960) == 10
    # end-to-end: the public operators accept and forward n=
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(50)
        .localCheckpoint(eager=True)
    )
    n = emb.count()
    q = emb.limit(5)
    a = sim.ivf_topk(emb, q, 3).collect()
    b = sim.ivf_topk(emb, q, 3, n=n).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    a = sim.ivf_probe_topk(emb, q, 3, nprobe=2).collect()
    b = sim.ivf_probe_topk(emb, q, 3, nprobe=2, n=n).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    a = sim.lsh_bucket_topk(emb, q, 3, DIM).collect()
    b = sim.lsh_bucket_topk(emb, q, 3, DIM, n=n).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    a = sim.semdedup_prune(emb, threshold=0.9, collapse=False).collect()
    b = sim.semdedup_prune(
        emb, threshold=0.9, collapse=False, n=n
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    # collapse="auto" with BOTH n and n_distinct precomputed: probe
    # runs no job, output equals the probed auto mode
    nd = emb.select("embedding").distinct().count()
    c1 = sim.semdedup_prune(emb, threshold=0.9).collect()
    c2 = sim.semdedup_prune(
        emb, threshold=0.9, n=n, n_distinct=nd
    ).collect()
    assert {tuple(r) for r in c1} == {tuple(r) for r in c2}


def test_ivf_auto_cells_stay_sqrt_sized_at_10x(emb_10x):
    """The actual r3 regression: fixed C made cells n/16-sized. Under
    the auto knob the assignment's cells stay O(sqrt(n))."""
    n = emb_10x.count()
    c = sim._auto_n_centroids(emb_10x)
    cents = emb_10x.orderBy("vec_id").limit(c).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    sizes = (
        sim.ivf_assign_cells(emb_10x, cents)
        .groupBy("cell")
        .count()
        .agg(F.max("count"), F.count(F.lit(1)))
        .collect()[0]
    )
    max_cell, n_cells = sizes[0], sizes[1]
    # cells exist in ~C distinct buckets and even the biggest is far
    # below the n/16 (=1250) a fixed knob would allow; the 10 nudged
    # twins per point cluster together, so allow ~10x mean occupancy
    assert n_cells >= c * 0.5
    assert max_cell <= 12 * (n / c)


def test_auto_recall_floor_10x(emb_10x):
    r_ivf = _recall_at_10(
        emb_10x, lambda q: sim.ivf_probe_topk(emb_10x, q, 10, nprobe=2)
    )
    r_lsh = _recall_at_10(
        emb_10x, lambda q: sim.lsh_bucket_topk(emb_10x, q, 10, DIM)
    )
    assert r_ivf >= 0.8  # measured 0.91
    assert r_lsh >= 0.8  # measured 0.90


def test_auto_recall_floor_1x(emb_1x):
    r_ivf = _recall_at_10(
        emb_1x,
        lambda q: sim.ivf_probe_topk(emb_1x, q, 10, nprobe=2),
        query_mod=200,
    )
    assert r_ivf >= 0.2  # measured 0.27 on the near-uniform corpus


def test_semdedup_auto_runs_and_prunes_twins(emb_10x):
    """Auto-knob semdedup on the 10x corpus: the 10 nudged twins of
    each point are ~cosine-1 to each other, so the prune must remove
    the bulk of them while keeping at least one per twin family."""
    out = sim.semdedup_prune(emb_10x, iters=1, threshold=0.999)
    agg = out.agg(
        F.count(F.lit(1)), F.sum(F.col("keep").cast("int"))
    ).collect()[0]
    total, kept = agg[0], agg[1]
    assert total == emb_10x.count()
    # 10 twins/family -> keeping everything would be 20k, keeping one
    # per family ~2k; cell-boundary splits leave some extra
    assert kept <= total * 0.35
    assert kept >= total * 0.08


def test_auto_knobs_degenerate_corpora(spark):
    """Auto derivation must not crash on tiny/empty corpora: the
    clamp floors keep C/planes valid and the operators return
    well-formed (possibly empty) results."""
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert sim._auto_n_centroids(empty) == 4
    assert sim._auto_n_planes(empty, k=10) == 3
    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    assert sim._auto_n_centroids(tiny) == 4
    out = sim.ivf_topk(tiny, tiny, 2)  # auto knob on a 3-row corpus
    assert out.count() >= 0 and out.columns == [
        "query_id", "rank", "vec_id", "sim",
    ]
    pruned = sim.semdedup_prune(tiny, iters=1, threshold=0.999)
    assert pruned.count() == 3  # one row per corpus vector
