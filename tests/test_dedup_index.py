"""Persisted dedup-fingerprint index (r11): lifecycle + scan pins.

The incremental near-dup store (`operators/dedup.py::build_dedup_index`
family) — third store family on the shared `sources/index_store`
machinery. Parity oracle is the registered inline estimator
(`minhash_sig_est_pairs`): the served path must reproduce its
cross-side pairs bit-for-bit from the parquet artifact alone.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import dedup as D
from knn_using_hadoop_spark.sources import index_store as store


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def corpus(docs):
    return docs.filter(F.col("doc_id") % 7 != 3)


@pytest.fixture(scope="module")
def batch(docs):
    return docs.filter(F.col("doc_id") % 7 == 3)


def _ref_pairs(union_docs, threshold=0.5):
    """Cross-side (batch -> corpus) pairs via the registered inline
    estimator over the union."""
    out = {}
    for r in D.minhash_sig_est_pairs(union_docs, threshold).collect():
        for q, c in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if q % 7 == 3 and c % 7 != 3:
                out[(q, c)] = (r.n_agree, round(r.est_jaccard, 6))
    return out


def _got_pairs(df):
    return {
        (r.doc_id, r.corpus_id): (r.n_agree, round(r.est_jaccard, 6))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_idx") / "store")
    D.build_dedup_index(corpus, path, n_buckets=8)
    return path


def test_dedup_index_query_matches_inline(
    spark, built, corpus, batch
):
    got = _got_pairs(
        D.query_dedup_index(spark, built, batch, threshold=0.5)
    )
    ref = _ref_pairs(corpus.unionByName(batch))
    assert got == ref
    assert got, "fixture must produce at least one near-dup pair"


def test_dedup_index_scans_are_pruned_and_pushed(
    spark, built, batch
):
    md = D._read_dedup_meta(spark, built)
    qsigs = D.minhash_signatures(batch, md["n"]).localCheckpoint(
        eager=True
    )
    qbands = (
        D.minhash_band_buckets(qsigs)
        .withColumn("bbucket", D._band_bucket(md["n_buckets"]))
        .localCheckpoint(eager=True)
    )
    cand = D._dedup_candidates(spark, built, qbands)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    bands_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln
    ]
    assert len(bands_scans) == 1
    ln = bands_scans[0]
    part = ln.split("PartitionFilters")[1]
    assert "bbucket" in part[:160]
    assert "sig0" in ln.split("PushedFilters")[1][:400]

    full = D.query_dedup_index(spark, built, batch, threshold=0.5)
    plan2 = full._jdf.queryExecution().executedPlan().toString()
    sig_scans = [
        ln
        for ln in plan2.splitlines()
        if "FileScan" in ln and "minhash" in ln
    ]
    assert len(sig_scans) == 1
    ln2 = sig_scans[0]
    assert "sbucket" in ln2.split("PartitionFilters")[1][:160]
    assert "doc_id" in ln2.split("PushedFilters")[1][:400]


def test_dedup_index_store_files_are_key_sorted(spark, built):
    import pyarrow.parquet as pq

    checked = 0
    for bucket_dir in sorted(os.listdir(f"{built}/bands")):
        if not bucket_dir.startswith("bbucket="):
            continue
        d = f"{built}/bands/{bucket_dir}"
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(f"{d}/{f}", columns=["sig0"])
            vals = t.column("sig0").to_pylist()
            assert vals == sorted(vals)
            checked += 1
    assert checked > 0


def test_dedup_index_append_delete_compact(
    spark, corpus, batch, tmp_path
):
    path = str(tmp_path / "store")
    D.build_dedup_index(corpus, path, n_buckets=8)
    base = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    fp = {
        r.doc_id
        for r in D.minhash_signatures(batch)
        .select("doc_id")
        .distinct()
        .collect()
    }

    # append: every fingerprinted batch doc matches its shifted twin
    newdocs = batch.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    bid = D.append_dedup_index(spark, path, newdocs)
    assert bid == 0
    after_append = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    twins = {(d, d + 1000000): (8, 1.0) for d in fp}
    assert after_append == {**base, **twins}

    # replaying the same batch id replaces, never duplicates
    D.append_dedup_index(spark, path, newdocs, batch_id=bid)
    assert _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    ) == {**base, **twins}

    # delete hides a corpus doc immediately
    victim = next(iter(base))[1]
    D.delete_from_dedup_index(spark, path, [victim])
    expected = {
        k: v
        for k, v in {**base, **twins}.items()
        if k[1] != victim
    }
    assert (
        _got_pairs(
            D.query_dedup_index(spark, path, batch, threshold=0.5)
        )
        == expected
    )

    # compact folds segments + tombstones; results invariant
    D.compact_dedup_index(spark, path)
    assert (
        _got_pairs(
            D.query_dedup_index(spark, path, batch, threshold=0.5)
        )
        == expected
    )
    assert not store.has_segments(spark, f"{path}/bands_seg")
    assert not store.has_segments(spark, f"{path}/sigs_seg")
    assert not store.has_children(spark, f"{path}/tombstones")
    row = D.describe_dedup_index(spark, path).head()
    assert row.n_segments == 0 and row.n_dead == 0

    # compacting a clean store is a no-op
    D.compact_dedup_index(spark, path)
    assert (
        _got_pairs(
            D.query_dedup_index(spark, path, batch, threshold=0.5)
        )
        == expected
    )


def test_dedup_index_compact_rewrites_only_affected_buckets(
    spark, corpus, batch, tmp_path
):
    """Selective compaction: buckets untouched by the delta keep
    their files byte-identical."""
    path = str(tmp_path / "store")
    D.build_dedup_index(corpus, path, n_buckets=8)

    def snapshot(sub):
        out = {}
        root = f"{path}/{sub}"
        for bdir in os.listdir(root):
            full = f"{root}/{bdir}"
            if not os.path.isdir(full):
                continue
            for f in os.listdir(full):
                if f.endswith(".parquet"):
                    p = f"{full}/{f}"
                    out[p] = (os.path.getsize(p), open(p, "rb").read())
        return out

    before_b, before_s = snapshot("bands"), snapshot("sigs")
    # tombstone ONE doc -> its sbucket and its bands' bbuckets only
    victim = int(
        D.minhash_signatures(corpus)
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .head()
        .doc_id
    )
    D.delete_from_dedup_index(spark, path, [victim])
    md = D._read_dedup_meta(spark, path)
    vb = (
        D.minhash_band_buckets(
            D.minhash_signatures(
                corpus.filter(F.col("doc_id") == victim)
            )
        )
        .withColumn("bbucket", D._band_bucket(md["n_buckets"]))
        .select("bbucket")
        .distinct()
    )
    aff_b = {r.bbucket for r in vb.collect()}
    aff_s = {
        r.sb
        for r in spark.createDataFrame([(victim,)], "doc_id bigint")
        .select(D._sig_bucket("doc_id", md["n_buckets"]).alias("sb"))
        .collect()
    }
    D.compact_dedup_index(spark, path)
    after_b, after_s = snapshot("bands"), snapshot("sigs")
    for p, content in before_b.items():
        bucket = int(p.split("bbucket=")[1].split("/")[0])
        if bucket not in aff_b:
            assert after_b.get(p) == content, p
    for p, content in before_s.items():
        bucket = int(p.split("sbucket=")[1].split("/")[0])
        if bucket not in aff_s:
            assert after_s.get(p) == content, p
    # and the victim is gone from results against a batch containing it
    got = D.query_dedup_index(
        spark,
        path,
        corpus.filter(F.col("doc_id") == victim),
        threshold=0.0,
    )
    assert all(r.corpus_id != victim for r in got.collect())


def test_dedup_index_duplicate_rows_cannot_inflate_estimate(
    spark, corpus, batch, tmp_path
):
    """The compact crash window can briefly leave a segment's rows in
    both base and segment; DISTINCT-h_idx agreement keeps est <= 1."""
    path = str(tmp_path / "store")
    D.build_dedup_index(corpus, path, n_buckets=8)
    base = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    # simulate the window: re-append the CORPUS docs of known pairs
    dup_ids = sorted({c for _, c in base})
    dups = corpus.filter(F.col("doc_id").isin(dup_ids))
    D.append_dedup_index(spark, path, dups)
    got = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    assert got == base  # identical rows, identical estimates
    assert all(v[0] <= 8 and v[1] <= 1.0 for v in got.values())


def test_dedup_index_short_doc_and_empty_batch(spark, corpus, built):
    short = corpus.sparkSession.createDataFrame(
        [(999999901, "one two")], "doc_id bigint, text string"
    )
    out = D.query_dedup_index(spark, built, short, threshold=0.0)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "corpus_id",
        "n_agree",
        "est_jaccard",
    ]


@pytest.mark.scale
def test_dedup_index_at_500k(spark):
    """100x scale: fingerprint the 500k Zipf corpus once, then dedup
    a 5k incoming batch (4,096 near-dup perturbations of corpus
    docs + ~1k genuinely new docs) at batch cost. Asserts recall of
    the planted near-dups (each perturbed doc keeps Jaccard ~0.95
    to its source, so the 8-perm estimate clears 0.5 w.h.p.), zero
    false corpus attribution for the new docs beyond estimator
    noise, and wall ceilings on build and query."""
    import time as _t

    zdir = "/tmp/spark_graft_zipf500k"
    if not os.path.isdir(zdir):
        pytest.skip(
            "zipf corpus not generated yet (run "
            "test_text_index_exact_prune_at_100x first)"
        )
    zdocs = spark.read.parquet(f"{zdir}/documents.parquet")
    path = "/tmp/spark_graft_dedup_index_zipf"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    t0 = _t.perf_counter()
    D.build_dedup_index(zdocs, path, n_buckets=64)
    t_build = _t.perf_counter() - t0

    # batch: perturbed corpus docs (near-dups to find) + new docs
    perturbed = (
        zdocs.filter(F.col("doc_id") % 122 == 7)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzznovel")).alias(
                "text"
            ),
        )
    )
    fresh = (
        spark.range(1000)
        .select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            F.concat(
                F.lit("q"),
                F.col("id").cast("string"),
                F.lit(" fresh unseen tokens only "),
                F.col("id").cast("string"),
                F.lit("x qq zz yy ww vv uu tt ss rr"),
            ).alias("text"),
        )
    )
    batch = perturbed.unionByName(fresh).localCheckpoint(eager=True)
    n_planted = perturbed.count()

    got = D.query_dedup_index(
        spark, path, batch, threshold=0.5
    ).localCheckpoint(eager=True)  # warm
    t0 = _t.perf_counter()
    rows = D.query_dedup_index(spark, path, batch, threshold=0.5)
    n_pairs = rows.count()
    t_query = _t.perf_counter() - t0

    found = {
        r.doc_id
        for r in got.filter(
            F.col("corpus_id") == F.col("doc_id") - 10_000_000
        ).collect()
    }
    recall = len(found) / n_planted
    fresh_hits = got.filter(F.col("doc_id") >= 20_000_000).count()
    print(
        f"\ndedup index 500k: build {t_build:.1f}s, 5k-batch query "
        f"{t_query:.1f}s, planted recall {recall:.3f} "
        f"({len(found)}/{n_planted}), fresh-doc hits {fresh_hits}, "
        f"pairs {n_pairs}"
    )
    assert recall >= 0.95
    assert fresh_hits == 0
    assert t_build < 180, f"500k fingerprint build: {t_build:.0f}s"
    assert t_query < 60, f"5k-batch query: {t_query:.0f}s"


def test_dedup_index_streaming_ingest(spark, corpus, batch, tmp_path):
    """append_dedup_index_stream == batch append of the same rows,
    searchable without compaction — the effectively-once
    foreachBatch contract of the text/IVF stream twins."""
    path = str(tmp_path / "store")
    D.build_dedup_index(corpus, path, n_buckets=8)
    newdocs = batch.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)

    p_batch = str(tmp_path / "store_batch")
    D.build_dedup_index(corpus, p_batch, n_buckets=8)
    D.append_dedup_index(spark, p_batch, newdocs)

    src = tmp_path / "src"
    src.mkdir()
    newdocs.coalesce(1).write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src) + "/*")
    q = (
        D.append_dedup_index_stream(stream, path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    want = _got_pairs(
        D.query_dedup_index(spark, p_batch, batch, threshold=0.5)
    )
    assert got == want
    assert any(c >= 1000000 for _, c in got), (
        "streamed rows must be searchable"
    )


def test_dedup_index_compact_crash_converges(
    spark, corpus, batch, tmp_path
):
    """A compaction that dies between the bands fold and the sigs
    fold leaves every query correct and a re-run converges to the
    clean-compact state (the no-manifest argument in the
    compact_dedup_index docstring, exercised)."""
    path = str(tmp_path / "store")
    clean = str(tmp_path / "clean")
    for p in (path, clean):
        D.build_dedup_index(corpus, p, n_buckets=8)
    newdocs = batch.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    for p in (path, clean):
        D.append_dedup_index(spark, p, newdocs)
    base = _got_pairs(
        D.query_dedup_index(spark, path, batch, threshold=0.5)
    )
    victim = next(iter(base))[1]
    for p in (path, clean):
        D.delete_from_dedup_index(spark, p, [victim])
    expected = {k: v for k, v in base.items() if k[1] != victim}

    # simulate the mid-compact crash: run ONLY the bands half of
    # compact (fold + segment removal), leaving sigs_seg and
    # tombstones behind — exactly the state a death between the two
    # folds produces
    md = D._read_dedup_meta(spark, path)
    n_buckets = md["n_buckets"]
    tomb = store.read_tombstones(
        spark, f"{path}/tombstones", "doc_id", distinct=True
    ).localCheckpoint(eager=True)
    bseg = store.read_segments(spark, f"{path}/bands_seg")
    aff_b = {
        r.bbucket
        for r in bseg.select("bbucket").distinct().collect()
    }
    tsigs = spark.read.parquet(f"{path}/sigs").join(tomb, "doc_id")
    tb = D.minhash_band_buckets(tsigs).withColumn(
        "bbucket", D._band_bucket(n_buckets)
    )
    aff_b |= {r.bbucket for r in tb.select("bbucket").distinct().collect()}
    base_b = spark.read.parquet(f"{path}/bands").filter(
        F.col("bbucket").isin(sorted(aff_b))
    )
    live_b = store.mask_tombstones(
        spark,
        f"{path}/tombstones",
        base_b.unionByName(bseg),
        "doc_id",
    ).dropDuplicates(["doc_id", "band"])
    store.fold_partitions(
        spark, live_b, "bbucket", f"{path}/bands", aff_b,
        order=("sig0", "sig1", "band", "doc_id"),
    )
    store.remove_dir(spark, f"{path}/bands_seg")
    # crashed here: sigs_seg + tombstones still present

    # queries in the crash window are still correct
    assert (
        _got_pairs(
            D.query_dedup_index(spark, path, batch, threshold=0.5)
        )
        == expected
    )
    # re-running compact converges to the clean-compact results
    D.compact_dedup_index(spark, path)
    D.compact_dedup_index(spark, clean)
    assert (
        _got_pairs(
            D.query_dedup_index(spark, path, batch, threshold=0.5)
        )
        == _got_pairs(
            D.query_dedup_index(spark, clean, batch, threshold=0.5)
        )
        == expected
    )
    assert not store.has_segments(spark, f"{path}/sigs_seg")
    assert not store.has_children(spark, f"{path}/tombstones")


def test_dedup_incremental_near_filters_matches(
    spark, built, corpus, batch
):
    """The ingest filter drops exactly the batch docs with a pair
    >= threshold; unfingerprintable (short) docs pass through."""
    pairs = _got_pairs(
        D.query_dedup_index(spark, built, batch, threshold=0.5)
    )
    matched = {d for d, _ in pairs}
    short = corpus.sparkSession.createDataFrame(
        [(999999902, "tiny doc")], "doc_id bigint, text string"
    )
    incoming = batch.unionByName(short)
    kept = {
        r.doc_id
        for r in D.dedup_incremental_near(
            spark, built, incoming, threshold=0.5
        ).collect()
    }
    all_in = {r.doc_id for r in incoming.select("doc_id").collect()}
    assert kept == all_in - matched
    assert 999999902 in kept
    assert matched and matched.isdisjoint(kept)


def test_evaluate_dedup_index_threshold_sweep(
    spark, built, corpus, batch
):
    """The operating-point report: 9 threshold rows (estimator
    granularity 1/8), pair counts monotone in threshold, and
    precision/recall at t=0.5 equal to a pure-Python recompute of
    exact Jaccard over the candidate pairs."""
    rep = {
        r.threshold: r
        for r in D.evaluate_dedup_index(
            spark, built, corpus, batch, exact_threshold=0.5
        ).collect()
    }
    ts = sorted(rep)
    assert ts == [round(i / 8, 6) for i in range(9)]
    counts = [rep[t].n_pairs for t in ts]
    assert counts == sorted(counts, reverse=True)
    assert rep[ts[0]].recall == 1.0  # all candidates predicted at 0

    # pure-Python reference at t=0.5
    est = {
        (r.doc_id, r.corpus_id): r.est_jaccard
        for r in D.query_dedup_index(
            spark, built, batch, threshold=0.0
        ).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in corpus.unionByName(batch).collect()
    }

    def sh(t):
        w = t.split(" ")
        return {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }

    truth = {
        p: (
            len(sh(texts[p[0]]) & sh(texts[p[1]]))
            / len(sh(texts[p[0]]) | sh(texts[p[1]]))
            >= 0.5
        )
        for p in est
    }
    pred = {p for p, e in est.items() if e >= 0.5}
    tp = sum(1 for p in pred if truth[p])
    n_true = sum(1 for v in truth.values() if v)
    row = rep[0.5]
    assert row.n_pairs == len(pred)
    assert row.n_true == n_true
    assert row.tp == tp
    assert row.precision == round(tp / len(pred), 6)
    assert row.recall == round(tp / n_true, 6)


def test_tune_dedup_threshold_picks_lowest_clearing_point(
    spark, built, corpus, batch
):
    rep = {
        r.threshold: r
        for r in D.evaluate_dedup_index(
            spark, built, corpus, batch, exact_threshold=0.5
        ).collect()
    }
    # a reachable bar: the best precision in the sweep
    precs = {
        t: (1.0 if r.precision is None else r.precision)
        for t, r in rep.items()
    }
    best = max(precs.values())
    got = D.tune_dedup_threshold(
        spark, built, corpus, batch, best, exact_threshold=0.5
    )
    expect_t = min(t for t, p in precs.items() if p >= best)
    assert got["threshold"] == expect_t
    assert got["precision"] == precs[expect_t]
    assert got["recall"] == rep[expect_t].recall
    assert [t for t, _, _ in got["swept"]] == sorted(precs)
    # an unreachable bar returns None with the t=1.0 row
    assert (
        D.tune_dedup_threshold(
            spark, built, corpus, batch, 1.1
        )["threshold"]
        is None
    )


def test_dedup_index_bands_rowgroup_skipping(spark, tmp_path):
    """The within-bucket selectivity contract, pinned at the footer
    level (the text index's term-selective pin, applied to bands):
    on a multi-row-group store the per-file (min, max) stats on
    sig0 are disjoint ascending runs, and a small batch's sig0 key
    set matches a strict minority of the probed buckets' row groups
    — the bands read is key-run-sized, not bucket-sized."""
    import glob

    import pyarrow.parquet as pq

    docs = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(10)),
                lambda p: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.xxhash64(F.col("id"), p), F.lit(5000)
                    ).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    path = str(tmp_path / "store")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size", None)
    hconf.set("parquet.block.size", "2048")
    try:
        D.build_dedup_index(docs, path, n_buckets=8)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    def rg_ranges(bucket):
        out = []
        for f in sorted(
            glob.glob(f"{path}/bands/bbucket={bucket}/*.parquet")
        ):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.row_group(0).column(j).path_in_schema: j
                for j in range(md.row_group(0).num_columns)
            }["sig0"]
            runs = [
                (
                    md.row_group(i).column(idx).statistics.min,
                    md.row_group(i).column(idx).statistics.max,
                )
                for i in range(md.num_row_groups)
            ]
            # disjoint ascending runs within each file
            for i, (lo, hi) in enumerate(runs):
                assert lo <= hi
                if i:
                    assert runs[i - 1][1] <= lo
            out.extend(runs)
        return out

    batch = docs.filter(F.col("doc_id") % 6000 == 17)
    md = D._read_dedup_meta(spark, path)
    qb = D.minhash_band_buckets(
        D.minhash_signatures(batch, md["n"])
    ).withColumn("bbucket", D._band_bucket(md["n_buckets"]))
    rows = qb.select("bbucket", "sig0").collect()
    sig0s = {r.sig0 for r in rows}
    probed = {r.bbucket for r in rows}
    assert sig0s and probed

    total = matched = 0
    for b in probed:
        for lo, hi in rg_ranges(b):
            total += 1
            if any(lo <= s <= hi for s in sig0s):
                matched += 1
    assert total >= 20, ("need multi-row-group buckets", total)
    assert matched < total / 2, (
        "pushed sig0 set must skip a majority of row groups",
        matched,
        total,
    )


def test_dedup_index_member_filter(spark, docs, batch, tmp_path):
    """Attribute-filtered near-dup search: build persists the
    attribute beside each band row, member_filter drops corpus rows
    at the scan (PushedFilters), and the pairs equal post-filtering
    the unfiltered result on the same predicate."""
    full = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    corpus = full.filter(F.col("doc_id") % 7 != 3)
    qbatch = full.filter(F.col("doc_id") % 7 == 3).select(
        "doc_id", "text"
    )
    path = str(tmp_path / "store")
    D.build_dedup_index(
        corpus, path, n_buckets=8, attribute_cols=["lang"]
    )
    unfiltered = _got_pairs(
        D.query_dedup_index(spark, path, qbatch, threshold=0.5)
    )
    en_ids = {
        r.doc_id
        for r in corpus.filter(F.col("lang") == "en")
        .select("doc_id")
        .collect()
    }
    got = _got_pairs(
        D.query_dedup_index(
            spark, path, qbatch, threshold=0.5,
            member_filter="lang = 'en'",
        )
    )
    want = {
        k: v for k, v in unfiltered.items() if k[1] in en_ids
    }
    assert got == want
    assert got != unfiltered, "fixture must actually filter"

    # the predicate reaches the bands scan
    md = D._read_dedup_meta(spark, path)
    assert md["attribute_cols"] == ["lang"]
    qb = (
        D.minhash_band_buckets(
            D.minhash_signatures(qbatch, md["n"])
        )
        .withColumn("bbucket", D._band_bucket(md["n_buckets"]))
        .localCheckpoint(eager=True)
    )
    cand = D._dedup_candidates(
        spark, path, qb, member_filter="lang = 'en'"
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 1
    assert "lang" in scans[0].split("PushedFilters")[1][:500]

    # append inherits the stored attribute columns
    extra = full.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        "lang",
    )
    D.append_dedup_index(spark, path, extra)
    twins = D.query_dedup_index(
        spark, path, qbatch, threshold=0.5,
        member_filter="lang = 'en'",
    )
    twin_pairs = {
        (r.doc_id, r.corpus_id) for r in twins.collect()
    }
    en_batch = {
        r.doc_id
        for r in full.filter(
            (F.col("doc_id") % 7 == 3) & (F.col("lang") == "en")
        ).collect()
    }
    fp = {
        r.doc_id
        for r in D.minhash_signatures(qbatch)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert {
        (d, d + 1000000) for d in en_batch & fp
    } <= twin_pairs
    assert all(
        c - 1000000 in en_batch
        for _, c in twin_pairs
        if c >= 1000000
    )

    # compact folds the attribute-carrying segments; filter invariant
    before = _got_pairs(
        D.query_dedup_index(
            spark, path, qbatch, threshold=0.5,
            member_filter="lang = 'en'",
        )
    )
    D.compact_dedup_index(spark, path)
    assert (
        _got_pairs(
            D.query_dedup_index(
                spark, path, qbatch, threshold=0.5,
                member_filter="lang = 'en'",
            )
        )
        == before
    )
