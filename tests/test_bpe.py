"""BPE fold semantics + induction invariants (the properties the SQL
oracle reproduces but doesn't independently justify)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import bpe


def _segment_one(spark, text: str, merges: list[tuple[str, str]]) -> list[str]:
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    sym = bpe._char_symbols(
        bpe.word_freq(df)
    )
    s = F.col("s")
    for left, right in merges:
        s = bpe._apply_merge(s, left, right)
    return sym.select(s.alias("out")).collect()[0]["out"]


def test_greedy_fold_handles_runs(spark):
    # 'aaaa' with merge (a,a) must give ['aa','aa'] — the left-to-right
    # greedy semantics; a non-overlapping string replace would
    # under-merge to ['aa','a','a']
    assert _segment_one(spark, "aaaa", [("a", "a")]) == ["aa", "aa"]
    assert _segment_one(spark, "aaa", [("a", "a")]) == ["aa", "a"]


def test_greedy_fold_handles_alternation(spark):
    # 'banana': merge (a,n) twice-applicable at non-adjacent sites
    assert _segment_one(spark, "banana", [("a", "n")]) == [
        "b", "an", "an", "a",
    ]
    # chained merges apply in order
    assert _segment_one(spark, "banana", [("a", "n"), ("an", "an")]) == [
        "b", "anan", "a",
    ]


def test_learn_monotone_compression(spark, sf_dir):
    from knn_using_hadoop_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    merges, totals = bpe.bpe_learn(spark, docs, k=2)
    mrows = merges.orderBy("merge_rank").collect()
    trows = totals.orderBy("round").collect()
    assert len(mrows) == 2 and len(trows) == 3
    # each merge strictly reduces the corpus symbol count by its freq
    for i, m in enumerate(mrows):
        assert m["freq"] > 0
        drop = trows[i]["total_symbols"] - trows[i + 1]["total_symbols"]
        assert drop == m["freq"]
    # merge freqs are non-increasing in learning order... not
    # guaranteed in general BPE (a merge can create a new frequent
    # pair), but each freq must be positive and <= round-0 symbols
    assert all(m["freq"] <= trows[0]["total_symbols"] for m in mrows)


def test_segment_matches_vocab_replay(spark, sf_dir):
    from knn_using_hadoop_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir).limit(50)
    merges_df, _ = bpe.bpe_learn(spark, docs, k=2)
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    seg = bpe.bpe_segment(docs, merges)
    # token count after merges == char count - per-doc applied merges;
    # sanity: strictly fewer symbols than characters, at least one per word
    base = docs.select(
        "doc_id",
        F.aggregate(
            F.transform(
                F.split("text", " "), lambda w: F.length(w)
            ),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("n_chars_in_words"),
        F.size(F.split("text", " ")).alias("n_words"),
    )
    j = seg.join(base, "doc_id").collect()
    assert len(j) == 50
    for r in j:
        assert r["n_words"] <= r["n_tokens_bpe"] <= r["n_chars_in_words"]
