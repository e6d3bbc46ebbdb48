"""Extension operators: dedup, text analysis, similarity search."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import dedup as dd
from knn_using_hadoop_spark.operators import similarity as sim
from knn_using_hadoop_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and looked at the dog", "en", "s", 44),
        (1, "the cat sat on the mat and looked at the dog", "en", "s", 44),  # exact dup of 0
        (2, "the cat sat on the mat and stared at the dog", "en", "s", 44),  # near dup
        (3, "der hund und die katze sind gute freunde geworden heute", "de", "s", 55),
        (4, "le chat et le chien sont les meilleurs amis du monde", "fr", "s", 52),
        (5, "completely different text about spark query engines here", "en", "s", 56),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_dedup_exact(docs):
    out = dd.dedup_exact(docs).collect()
    assert len(out) == 5  # 6 docs, one exact dup collapses
    by_id = {r.doc_id: r.n_copies for r in out}
    assert by_id[0] == 2  # min(0,1)=0 keeps 2 copies
    assert 1 not in by_id


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in found  # exact dup: jaccard 1.0
    assert (0, 2) in found or (1, 2) in found  # near dup
    for r in pairs:
        assert 0.5 <= r.jaccard <= 1.0


def test_minhash_sigonly_estimates(docs):
    est = {
        (r.doc_a, r.doc_b): (r.n_agree, r.est_jaccard)
        for r in dd.minhash_sig_est_pairs(docs, threshold=0.5).collect()
    }
    # exact dup: identical signatures -> estimator exactly 1.0
    assert est[(0, 1)] == (dd.NUM_HASHES, 1.0)
    # near dup (true jaccard ~0.55): estimate must land in-band and
    # above the 0.5 threshold to be emitted at all
    if (0, 2) in est:
        assert 0.5 <= est[(0, 2)][1] <= 1.0
    # never emits pairs below threshold, granularity 1/NUM_HASHES
    for n_agree, ej in est.values():
        assert ej == n_agree / dd.NUM_HASHES
        assert ej >= 0.5


def test_ngram_jaccard_exact_pairs(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # near-dup differs in 1 of 11 tokens -> 3 of 9 shingles change
    assert 0.4 < pairs[(0, 2)] < 1.0


def test_simhash_similarity(docs):
    h = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    assert h[0] == h[1]  # identical text -> identical simhash
    ham_near = bin(h[0] ^ h[2]).count("1")
    ham_far = bin(h[0] ^ h[5]).count("1")
    assert ham_near < ham_far  # near-dup closer in hamming space
    assert all(0 <= v < 2**32 for v in h.values())


def test_lang_id(docs):
    out = {r.doc_id: r.pred_lang for r in tx.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[4] == "fr"


def test_quality_score_monotone_in_length(docs):
    out = {r.doc_id: r for r in tx.quality_score(docs).collect()}
    assert all(0.0 <= r.quality <= 1.0 for r in out.values())
    # the all-stopword-free doc 5 scores higher than stopword-heavy 0
    assert out[5].stop_ratio < out[0].stop_ratio


def test_token_stats(docs):
    r = {x.doc_id: x for x in tx.token_stats(docs).collect()}
    assert r[0].n_tokens == 11
    assert r[0].n_chars == len("the cat sat on the mat and looked at the dog")
    assert r[0].n_distinct_tokens == 9  # 'the' x3, 'at' via looked? no: the,cat,sat,on,mat,and,looked,at,dog
    assert r[0].avg_token_len == pytest.approx(
        sum(map(len, "the cat sat on the mat and looked at the dog".split())) / 11
    )


def test_neardup_components_chain(spark):
    # chain 1-2-3 plus isolated pair 10-11: transitive closure matters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    comp = {
        r.doc_id: r.component
        for r in dd.neardup_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_approx_count_distinct_bounds(spark, sf_dir):
    """Approximate aggregates (HLL sketch): error within rsd bound.

    Sketch internals differ per engine, so this is test-verified
    rather than oracle-checked (the one intentionally non-oracle op).
    """
    from knn_using_hadoop_spark.sources import load_table

    li = load_table(spark, "lineitem", sf_dir)
    exact = li.select("l_partkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact < 0.1


@pytest.fixture(scope="module")
def emb_dfs(spark):
    rng = np.random.default_rng(7)
    n, dim = 200, 16
    x = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, size=n)
    rows = [
        (int(i), [float(v) for v in x[i]], int(labels[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return df, x


def test_cosine_topk_matches_numpy(emb_dfs):
    df, x = emb_dfs
    q = df.filter(F.col("vec_id") % 40 == 0)
    got = sim.cosine_topk(df, q, 5, 16).collect()
    xd = x.astype(np.float64)
    norms = np.linalg.norm(xd, axis=1)
    for qid in range(0, 200, 40):
        sims = (xd @ xd[qid]) / (norms * norms[qid])
        sims[qid] = -np.inf  # exclude self
        expect = np.argsort(-np.round(sims, 6), kind="stable")[:5]
        mine = [r.vec_id for r in got if r.query_id == qid]
        assert sorted(mine) == sorted(int(i) for i in expect)


def test_lsh_topk_recall(emb_dfs):
    df, _ = emb_dfs
    q = df.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r.query_id, r.vec_id)
        for r in sim.cosine_topk(df, q, 5, 16).collect()
    }
    # 4 planes -> 16 buckets over 200 vectors, so buckets are populated
    # (8 planes would make most buckets singletons at this tiny scale)
    approx = {
        (r.query_id, r.vec_id)
        for r in sim.lsh_bucket_topk(df, q, 5, 16, n_planes=4).collect()
    }
    # approximate: must return only same-bucket candidates, and any
    # returned pair must be a genuine corpus pair; recall is data
    # dependent but must be nonzero on clustered-by-chance buckets
    assert len(approx) > 0
    # every approx hit at rank 1 that is also in exact confirms overlap
    assert len(exact & approx) > 0


def test_jaccard_prefix_pairs_equal_bruteforce(spark):
    """Prefix filtering is lossless: result == all-candidates verify."""
    from knn_using_hadoop_spark import contract
    from knn_using_hadoop_spark.operators import dedup

    docs = contract.load_docs_wide(spark, "/root/testdata/sf0.001")
    got = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in dedup.jaccard_prefix_pairs(docs, threshold=0.5).collect()
    }
    sh = dedup.shingle_sets(docs, 3)
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    all_cands = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    want = {
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in dedup.jaccard_verify(all_cands, sh)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want and len(want) > 0


def test_data_quality_report_flags_planted_violations(spark, monkeypatch):
    import datetime as dt

    from knn_using_hadoop_spark import contract as c

    tables = {
        "orders": spark.createDataFrame(
            [(1, 10, 5.0), (2, 99, 6.0)],  # custkey 99 dangles
            "o_orderkey long, o_custkey long, o_totalprice double",
        ),
        "customer": spark.createDataFrame(
            [(10,)], "c_custkey long"
        ),
        "documents": spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
        ),
        "lineitem": spark.createDataFrame(
            [(1.0, 0.5), (0.0, 1.5), (-2.0, 0.1)],
            "l_quantity double, l_discount double",
        ),
        "events": spark.createDataFrame(
            [
                (1.0, dt.datetime(2024, 1, 1)),
                (-1.0, dt.datetime(2035, 1, 1)),
                (None, dt.datetime(2019, 1, 1)),
            ],
            "value double, ts timestamp",
        ),
    }
    # patch the DEFINING module: after the contract split, each
    # submodule binds load_table in its own globals
    from knn_using_hadoop_spark.contract import sequences_rfm

    monkeypatch.setattr(
        sequences_rfm, "load_table", lambda spark, name, sf_dir: tables[name]
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in c.q_data_quality_report(spark, "unused").collect()
    }
    assert got == {
        "orders_dangling_custkey": 1,
        "documents_dup_doc_id": 1,
        "lineitem_qty_nonpositive": 2,
        "lineitem_discount_out_of_range": 1,
        "events_value_null_or_negative": 2,
        "events_ts_out_of_range": 2,
    }


# ---------------------------------------------------------------------------
# Exact shared-passage spans
# ---------------------------------------------------------------------------


def test_shared_passage_spans_planted(spark):
    """A passage copied between two docs is reported once, maximal,
    with exact 0-based token offsets in both documents."""
    from knn_using_hadoop_spark.operators.dedup import (
        shared_passage_spans,
    )

    passage = " ".join(f"p{i}" for i in range(7))  # 7 shared tokens
    docs = spark.createDataFrame(
        [
            (1, "a b c " + passage + " x y z"),  # passage at tokens 3..9
            (2, passage + " q r s t u v w"),  # passage at tokens 0..6
            (3, "entirely different words here only once ok"),
        ],
        "doc_id long, text string",
    )
    out = shared_passage_spans(docs, win=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.a_start, r.b_start, r.span_tokens) == (3, 0, 7)


def test_shared_passage_spans_two_diagonals(spark):
    """The same passage appearing twice in one doc yields one span
    per alignment (both positions are real matches)."""
    from knn_using_hadoop_spark.operators.dedup import (
        shared_passage_spans,
    )

    p = "m n o p q"
    docs = spark.createDataFrame(
        [
            (1, p + " gap1 gap2 " + p),
            (2, "lead " + p + " tail"),
        ],
        "doc_id long, text string",
    )
    out = shared_passage_spans(docs, win=5).collect()
    got = sorted((r.a_start, r.b_start, r.span_tokens) for r in out)
    assert got == [(0, 1, 5), (7, 1, 5)]


def test_shared_passage_spans_cap_drops_boilerplate(spark):
    from knn_using_hadoop_spark.operators.dedup import (
        shared_passage_spans,
    )

    boiler = "same four tokens here"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10)],
        "doc_id long, text string",
    )
    # 10 occurrences > cap 5: the window is background, no pairs
    assert shared_passage_spans(docs, win=4, max_occurrences=5).count() == 0
    # raising the cap surfaces all 45 pairs
    assert shared_passage_spans(docs, win=4, max_occurrences=50).count() == 45


def test_sig_est_pruned_equals_pairs_doc_b(spark):
    """minhash_sig_est_pruned is an exact rewrite of 'distinct doc_b
    of minhash_sig_est_pairs' — on the real corpus AND on a
    duplicate-pile-up corpus (the case it exists for)."""
    from knn_using_hadoop_spark import contract
    from knn_using_hadoop_spark.operators import dedup

    docs = contract.load_docs_wide(spark, "/root/testdata/sf0.001")
    for t in (0.5, 0.75, 1.0):
        want = {
            r.doc_b
            for r in dedup.minhash_sig_est_pairs(docs, threshold=t)
            .select("doc_b")
            .distinct()
            .collect()
        }
        got = {
            r.doc_id
            for r in dedup.minhash_sig_est_pruned(
                docs, threshold=t
            ).collect()
        }
        assert got == want, f"threshold {t}"

    # hostile: every doc gets 5 exact copies (ids interleaved so reps
    # and externals mix), plus a near-dup variant
    piles = (
        docs.crossJoin(
            spark.range(5).select(F.col("id").alias("c"))
        )
        .select(
            (F.col("doc_id") * 5 + F.col("c")).alias("doc_id"),
            "text",
        )
    )
    want = {
        r.doc_b
        for r in dedup.minhash_sig_est_pairs(piles, threshold=0.5)
        .select("doc_b")
        .distinct()
        .collect()
    }
    got = {
        r.doc_id
        for r in dedup.minhash_sig_est_pruned(
            piles, threshold=0.5
        ).collect()
    }
    assert got == want

    # degenerate threshold > 1.0 (ADVICE r4 #2): sig_est_pairs
    # returns nothing, so the pruned set must be empty too — the
    # same-signature `doc_id > rep` branch must not fire
    assert (
        dedup.minhash_sig_est_pairs(piles, threshold=1.5).count() == 0
    )
    assert (
        dedup.minhash_sig_est_pruned(piles, threshold=1.5).count() == 0
    )


def test_lsh_pairs_content_collapse_equals_uncollapsed(spark):
    """The content-collapsed minhash_lsh_pairs (r4) returns EXACTLY
    the uncollapsed plan's pairs — cross-content, within-pile
    (jaccard 1.0, n_common = set size), and the no-shingle-pile
    exclusion — on a corpus with interleaved duplicate piles."""
    from knn_using_hadoop_spark import contract
    from knn_using_hadoop_spark.operators import dedup
    from knn_using_hadoop_spark.operators.dedup import (
        _lsh_candidates,
        _signatures_from_h32,
        hashed_shingle_sets,
        jaccard_verify,
    )

    base = contract.load_docs_wide(spark, "/root/testdata/sf0.001")
    piles = (
        base.limit(60)
        .crossJoin(spark.range(4).select(F.col("id").alias("c")))
        # copies 0-2 keep the text verbatim (piles of 3); copy 3 is
        # perturbed (near-dup of its pile, distinct content)
        .select(
            (F.col("doc_id") * 4 + F.col("c")).alias("doc_id"),
            F.when(
                F.col("c") < 3, F.col("text")
            ).otherwise(F.concat(F.col("text"), F.lit(" tail"))).alias(
                "text"
            ),
        )
    )
    # short/no-shingle pile: 2 copies of a 2-word doc (3-shingles
    # need >= 3 tokens -> must NOT appear in the output)
    extra = spark.createDataFrame(
        [(100001, "too short"), (100002, "too short")],
        "doc_id long, text string",
    )
    docs = piles.unionByName(extra)

    def uncollapsed(d, threshold):
        hs = hashed_shingle_sets(d, 3)
        sigs = _signatures_from_h32(
            hs.select("doc_id", F.shiftright("h", 28).alias("h"))
        )
        return jaccard_verify(
            _lsh_candidates(sigs), hs.withColumnRenamed("h", "shingle")
        ).filter(F.col("jaccard") >= threshold)

    for t in (0.5, 1.0):
        want = {
            (r.doc_a, r.doc_b, r.n_common, round(r.jaccard, 9))
            for r in uncollapsed(docs, t).collect()
        }
        got = {
            (r.doc_a, r.doc_b, r.n_common, round(r.jaccard, 9))
            for r in dedup.minhash_lsh_pairs(docs, threshold=t).collect()
        }
        assert got == want, f"threshold {t}"
    assert all(
        r.doc_id not in (100001, 100002)
        for r in dedup.minhash_lsh_pairs(docs, 0.5)
        .selectExpr("doc_a as doc_id")
        .union(
            dedup.minhash_lsh_pairs(docs, 0.5).selectExpr(
                "doc_b as doc_id"
            )
        )
        .collect()
    )


def test_semdedup_collapse_equals_uncollapsed(spark):
    """semdedup_prune(collapse=True) is an exact rewrite of the
    direct within-cell pair plan (r5): duplicate piles share cell and
    centroid_sim by determinism, so a pile's threat to any member is
    (cs, rep) — pinned on the real corpus, a 3x interleaved-id
    pile-up, and the degenerate threshold > 1.0 (within-pile branch
    must gate off)."""
    from knn_using_hadoop_spark.operators import similarity as S
    from knn_using_hadoop_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")

    def key(df):
        return sorted(
            (r["vec_id"], r["cell"], r["centroid_sim"], r["keep"])
            for r in df.collect()
        )

    def run(src, t, collapse):
        return key(
            S.semdedup_prune(
                src, n_centroids=8, iters=1, threshold=t,
                collapse=collapse,
            )
        )

    assert run(emb, 0.35, True) == run(emb, 0.35, False)

    piled = emb.crossJoin(
        spark.range(3).select(F.col("id").alias("cc"))
    ).select(
        (F.col("vec_id") * 3 + F.col("cc")).alias("vec_id"), "embedding"
    )
    d = run(piled, 0.35, False)
    c = run(piled, 0.35, True)
    assert c == d
    # "auto" probes the duplication ratio: 3x piles -> collapse fires;
    # either way the output is pinned equal above
    assert run(piled, 0.35, "auto") == d
    # piles actually exercised: at least the non-rep members of every
    # pile must be pruned (identical vectors are 1.0-similar)
    assert sum(1 for t_ in d if t_[3]) < len(d) / 2
    assert run(piled, 1.5, True) == run(piled, 1.5, False)
    # the collapsed plan stays JVM-side end to end
    plan = (
        S.semdedup_prune(
            piled, n_centroids=8, iters=1, threshold=0.35, collapse=True
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
