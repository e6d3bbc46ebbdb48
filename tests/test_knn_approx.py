"""Approximate KNN (MLlib LSH): recall + contract shape vs exact KNN."""

from __future__ import annotations

import numpy as np
import pytest

from knn_using_hadoop_spark.operators.knn import knn_neighbors
from knn_using_hadoop_spark.operators.knn_approx import (
    knn_approx_neighbors,
    knn_approx_predict,
)


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    n_train, n_test, dim = 500, 40, 6
    centers = rng.normal(0, 20, size=(5, dim))
    ytr = rng.integers(0, 5, n_train)
    yte = rng.integers(0, 5, n_test)
    xtr = centers[ytr] + rng.normal(0, 2, (n_train, dim))
    xte = centers[yte] + rng.normal(0, 2, (n_test, dim))
    mk = lambda x, y: spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]], int(y[i])) for i in range(len(x))],
        "id long, features array<double>, label int",
    )
    return mk(xtr, ytr), mk(xte, yte)


def test_approx_recall_vs_exact(clustered):
    train, test = clustered
    k = 5
    exact = {
        (r.test_id, r.train_id)
        for r in knn_neighbors(train, test, k).collect()
    }
    approx = {
        (r.test_id, r.train_id)
        for r in knn_approx_neighbors(
            train, test, k, bucket_length=8.0, num_hash_tables=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.8, f"LSH recall too low: {recall}"


def test_approx_predict_contract(clustered):
    train, test = clustered
    preds = knn_approx_predict(
        train, test, 5, bucket_length=8.0
    ).collect()
    assert 0 < len(preds) <= 40
    assert all(0 <= r.prediction <= 4 for r in preds)
    # deterministic under a fixed seed
    again = knn_approx_predict(train, test, 5, bucket_length=8.0).collect()
    assert sorted(map(tuple, preds)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# persisted IVF index (build once / query many)
# ---------------------------------------------------------------------------


def test_ivf_index_equals_inline_and_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
        query_ivf_index,
    )

    rows = [
        (i, [float((i * 13 + j * 5) % 23) + 0.5 for j in range(8)])
        for i in range(300)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "ivfidx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)

    got = query_ivf_index(spark, path, queries, 5, nprobe=2)
    want = ivf_probe_topk(
        corpus, queries, 5, n_centroids=8, iters=1, nprobe=2
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )

    # the probed-cell filter reaches the scan as a partition filter:
    # only the probed cell directories are read
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1)


def test_ivfpq_index_roundtrip_equals_inline(spark, tmp_path):
    """build_ivf_index(pq=True) + query_ivfpq_index == inline
    ivfpq_topk with the same knobs (r5 verdict #5): nprobe=1 probes
    the query's own stored cell by protocol determinism; ADC runs
    from persisted codes + codebook — raw vectors untouched. Also
    pins partition pruning on the code store and the sql twin."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_topk,
        query_ivfpq_index,
    )

    rows = [
        (
            i,
            [
                float((i * 13 + j * 7) % 29) / 29.0 + 0.1
                for j in range(16)
            ],
        )
        for i in range(400)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "ivfpqidx")
    build_ivf_index(
        corpus, path, n_centroids=8, iters=1,
        pq=True, m=4, ks=8, pq_iters=1, dim=16,
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                corpus, queries, 5, n_centroids=8, m=4, ks=8,
                dim=16, iters=1,
            ).collect(),
        )
    )
    got = query_ivfpq_index(spark, path, queries, 5)
    assert sorted(map(tuple, got.collect())) == want
    # the sql twin agrees
    got_sql = query_ivfpq_index(
        spark, path, queries, 5, impl="sql"
    )
    assert sorted(map(tuple, got_sql.collect())) == want
    # probed-cell filter reaches the code-store scan: partition
    # pruning, the reason query cost is corpus-size independent
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    mm = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert mm and "cell" in mm.group(1)
    # raw vector store is NOT on the query path (inputFiles, not the
    # plan string — long pytest tmp paths get truncated there)
    files = got.inputFiles()
    assert files and all("/pq_codes/" in f for f in files)
    assert not any("/cells/" in f for f in files)


def test_ivfpq_index_residual_roundtrip(spark, tmp_path):
    """Residual manifest round-trip (r6): build with kmeans iters=0
    (seed centroids == the inline operator's quantizer) and
    pq_residual=True; the persisted query path re-centers queries on
    their probed cell and must equal inline
    ivfpq_topk(residual=True) — vectorized AND sql twins."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_topk,
        query_ivfpq_index,
    )

    rows = [
        (
            i,
            [
                float((i * 11 + j * 5) % 23) / 23.0 - 0.4
                for j in range(16)
            ],
        )
        for i in range(360)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 45 == 0)
    path = str(tmp_path / "ivfpqres")
    build_ivf_index(
        corpus, path, n_centroids=6, iters=0,
        pq=True, m=4, ks=8, pq_iters=1, pq_residual=True, dim=16,
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                corpus, queries, 5, n_centroids=6, m=4, ks=8,
                dim=16, iters=1, residual=True,
            ).collect(),
        )
    )
    got = query_ivfpq_index(spark, path, queries, 5)
    assert sorted(map(tuple, got.collect())) == want
    got_sql = query_ivfpq_index(
        spark, path, queries, 5, impl="sql"
    )
    assert sorted(map(tuple, got_sql.collect())) == want


def test_probe_rank_survives_degenerate_centroid(spark, tmp_path):
    """r6: a kmeans cell whose 6dp-rounded centroid collapses to the
    zero vector must not crash the probe rankings (nullif'd norm
    product — null psim ranks last, the cell is simply never
    probed). Exercises ivf_probe_topk and the persisted-index query
    path end-to-end."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_topk,
        query_ivf_index,
    )

    # seed 0 is a tiny-component vector alone in its cell -> its
    # refined centroid rounds to the zero vector at 6dp
    rows = [(0, [1e-9, -1e-9, 1e-9, -1e-9])] + [
        (i, [float((i * 7 + j * 3) % 11) + 1.0 for j in range(4)])
        for i in range(1, 60)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id").isin(5, 10))
    out = ivf_probe_topk(
        corpus, queries, 3, n_centroids=2, iters=1, nprobe=2
    ).collect()
    assert {r["query_id"] for r in out} == {5, 10}
    path = str(tmp_path / "degidx")
    build_ivf_index(corpus, path, n_centroids=2, iters=1)
    got = query_ivf_index(spark, path, queries, 3, nprobe=2)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, out)
    )


def test_append_ivf_index_equals_frozen_rebuild(spark, tmp_path):
    """Incremental maintenance (r6): appending batch B to an index
    built on A == rebuilding on A UNION B under the same frozen
    quantizer/codebook (iters=0 seeds by low ids), for the raw IVF
    query path AND the PQ path (residual manifest included); the
    summary introspection sees the new rows."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        describe_ivf_index,
        query_ivf_index,
        query_ivfpq_index,
    )

    def vec(i):
        return [
            float((i * 13 + j * 7) % 29) / 29.0 + 0.1
            for j in range(16)
        ]

    a_rows = [(i, vec(i)) for i in range(300)]
    b_rows = [(i, vec(i)) for i in range(300, 360)]
    A = spark.createDataFrame(
        a_rows, "vec_id long, embedding array<double>"
    )
    B = spark.createDataFrame(
        b_rows, "vec_id long, embedding array<double>"
    )
    AB = A.union(B)
    queries = AB.filter(F.col("vec_id") % 45 == 0)
    for residual in (False, True):
        p_inc = str(tmp_path / f"inc{int(residual)}")
        p_full = str(tmp_path / f"full{int(residual)}")
        kw = dict(
            n_centroids=6, iters=0, pq=True, m=4, ks=8,
            pq_iters=0, pq_residual=residual, dim=16,
        )
        build_ivf_index(A, p_inc, **kw)
        append_ivf_index(spark, p_inc, B)
        # frozen rebuild: seeds/codebook come from ids < C / < ks,
        # identical between A and A UNION B
        build_ivf_index(AB, p_full, **kw)
        for k in (5,):
            gi = sorted(
                map(
                    tuple,
                    query_ivf_index(
                        spark, p_inc, queries, k, nprobe=2
                    ).collect(),
                )
            )
            gf = sorted(
                map(
                    tuple,
                    query_ivf_index(
                        spark, p_full, queries, k, nprobe=2
                    ).collect(),
                )
            )
            assert gi == gf and gi
            pi = sorted(
                map(
                    tuple,
                    query_ivfpq_index(
                        spark, p_inc, queries, k
                    ).collect(),
                )
            )
            pf = sorted(
                map(
                    tuple,
                    query_ivfpq_index(
                        spark, p_full, queries, k
                    ).collect(),
                )
            )
            assert pi == pf and pi
        desc = describe_ivf_index(spark, p_inc).collect()
        total = [r for r in desc if r["cell"] is None]
        assert total and total[0]["n_rows"] == 360


def test_ivfpq_index_refine_roundtrip(spark, tmp_path):
    """Persisted two-stage refine (r6): query_ivfpq_index(refine_k)
    == inline ivfpq_topk(refine_k) under the frozen quantizer
    (iters=0), and the refine join stays under the probed-cell
    partition filter."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_topk,
        query_ivfpq_index,
    )

    rows = [
        (
            i,
            [
                float((i * 17 + j * 3) % 31) / 31.0
                for j in range(16)
            ],
        )
        for i in range(360)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 60 == 0)
    path = str(tmp_path / "refidx")
    build_ivf_index(
        corpus, path, n_centroids=6, iters=0,
        pq=True, m=4, ks=8, pq_iters=1, dim=16,
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                corpus, queries, 5, n_centroids=6, m=4, ks=8,
                dim=16, iters=1, refine_k=40,
            ).collect(),
        )
    )
    got = query_ivfpq_index(spark, path, queries, 5, refine_k=40)
    assert sorted(map(tuple, got.collect())) == want
    got_sql = query_ivfpq_index(
        spark, path, queries, 5, refine_k=40, impl="sql"
    )
    assert sorted(map(tuple, got_sql.collect())) == want
    # both stores are on the query path now (codes for ADC, cells
    # for the refine join), each behind a cell partition filter
    files = got.inputFiles()
    assert any("/pq_codes/" in f for f in files)
    assert any("/cells/" in f for f in files)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and all("cell" in x for x in pf if x.strip())


def test_ivf_index_filtered_search(spark, tmp_path):
    """Filtered vector search (r6): attribute columns persisted in
    the cell store + a query-time predicate — the result is the
    exact top-k among the filter's survivors within probed cells
    (pre-filtering semantics), and the predicate reaches the parquet
    scan as a pushed filter."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    rows = [
        (
            i,
            [float((i * 13 + j * 5) % 23) + 0.5 for j in range(8)],
            ["en", "de", "fr"][i % 3],
            i % 7,
        )
        for i in range(300)
    ]
    corpus = spark.createDataFrame(
        rows,
        "vec_id long, embedding array<double>, "
        "lang string, quality int",
    )
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "fidx")
    build_ivf_index(
        corpus, path, n_centroids=8, iters=1,
        attribute_cols=["lang", "quality"],
    )
    pred = "lang = 'en' AND quality >= 3"
    got = query_ivf_index(
        spark, path, queries, 5, nprobe=2, member_filter=pred
    )
    got_rows = got.collect()
    # reference: unfiltered candidates at k=infinity, filtered by
    # the same predicate, re-ranked per query
    allc = query_ivf_index(
        spark, path, queries, 10**6, nprobe=2
    ).collect()
    keep = {
        r["vec_id"]
        for r in corpus.filter(pred).select("vec_id").collect()
    }
    byq = {}
    for r in allc:
        if r["vec_id"] in keep:
            byq.setdefault(r["query_id"], []).append(r)
    want = set()
    for qid, lst in byq.items():
        lst.sort(
            key=lambda r: (
                -(r["sim"] if r["sim"] is not None else -9e99),
                r["vec_id"],
            )
        )
        for rank, r in enumerate(lst[:5], start=1):
            want.add((qid, rank, r["vec_id"], r["sim"]))
    assert {
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in got_rows
    } == want
    # every survivor satisfies the predicate, none are self-matches
    assert {r["vec_id"] for r in got_rows} <= keep
    # predicate reaches the scan (data filters, beyond the cell
    # partition filter)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    mm = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert mm and "lang" in mm.group(1) and "quality" in mm.group(1)
    # sql twin agrees
    got_sql = query_ivf_index(
        spark, path, queries, 5, nprobe=2, member_filter=pred,
        impl="sql",
    ).collect()
    assert {
        (r["query_id"], r["rank"], r["vec_id"], r["sim"])
        for r in got_sql
    } == want


def test_ivf_index_single_probe_subset(spark, tmp_path):
    """nprobe=1 candidates are a subset of nprobe=2's."""
    from pyspark.sql import functions as F

    from knn_using_hadoop_spark.operators.similarity import (
        build_ivf_index,
        query_ivf_index,
    )

    rows = [
        (i, [float((i * 7 + j * 11) % 19) + 1.0 for j in range(6)])
        for i in range(200)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") % 50 == 0)
    path = str(tmp_path / "ivfidx1")
    build_ivf_index(corpus, path, n_centroids=6, iters=1)
    one = query_ivf_index(spark, path, queries, 200, nprobe=1)
    two = query_ivf_index(spark, path, queries, 200, nprobe=2)
    s1 = {(r.query_id, r.vec_id) for r in one.collect()}
    s2 = {(r.query_id, r.vec_id) for r in two.collect()}
    assert s1 <= s2 and len(s2) > len(s1)
