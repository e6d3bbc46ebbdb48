"""Text-analysis operators for LLM-training-data pipelines.

North-star extensions beyond the reference surface (SURVEY.md §2.11):
language ID, quality scoring, token counting, document
fingerprinting — all as pure Catalyst expressions over the
``documents`` table (no Python in the hot path), so they run inside
whole-stage codegen and scale linearly with input splits. Every
operator is deterministic and oracle-checkable: no transcendental
functions (libm results could differ across engines), hashing via the
portable md5 scheme (functions.hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import (
    MERSENNE_PRIME,
    portable_hash64,
)

# Small fixed stopword list (deliberately tiny + frozen: it is part of
# the operator's contract and mirrored in the oracle SQL).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "that")

# Marker vocabularies for the n-gram/marker-word language-ID heuristic.
# Tie-break = dict order (en > de > fr > es); no marker hit => 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space contract of the corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_distinct_tokens, avg_token_len)."""
    t = tokens("text")
    n_tokens = F.size(t)
    total_tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        (total_tok_chars.cast("double") / n_tokens).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic doc-quality score in [0, 1].

    Components (all rational arithmetic — no exp/log, so the oracle
    matches bit-for-bit): length saturation (docs >= 100 tokens get
    full credit), stopword ratio, punctuation density.
    """
    t = tokens("text")
    n_tokens = F.size(t)
    n_chars = F.length("text")
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), PUNCT_CLASS, "")
    )
    punct_ratio = n_punct.cast("double") / n_chars
    score = (
        F.least(n_tokens, F.lit(100)).cast("double")
        / 100.0
        * (1.0 - stop_ratio * 0.5)
        * (1.0 - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: (doc_id, pred_lang, lang, is_match).

    Distinct-token overlap with per-language marker lists; argmax with
    deterministic dict-order tie-break; 'und' when nothing matches.
    """
    dt = F.array_distinct(tokens("text"))

    def marker_count(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(dt, lambda x: x.isin(*markers)))

    scores = {
        lang: marker_count(markers)
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred: Column = F.lit("und")
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    out = docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
        F.col("lang"),
    )
    return out.withColumn(
        "is_match", (F.col("pred_lang") == F.col("lang")).cast("int")
    )


def doc_fingerprint(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, fp64, min_shingle_hash): whole-doc + content hashes.

    ``fp64`` = portable 60-bit hash of the raw text (exact-dedup key);
    ``min_shingle_hash`` = min over word-``shingle_n``-gram hashes — a
    1-permutation MinHash usable as a cheap near-dup blocking key.
    """
    # two-step projection: bind the token array to a column before the
    # n-gram lambda reads it element-wise (see shingles_from_tokens on
    # the inline-lambda re-evaluation trap)
    staged = docs.select(
        "doc_id",
        portable_hash64(F.col("text")).alias("fp64"),
        tokens("text").alias("__toks"),
    )
    min_h = F.array_min(
        F.transform(
            shingles_from_tokens(F.col("__toks"), shingle_n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
                "bigint"
            ),
        )
    )
    return staged.select(
        "doc_id", "fp64", min_h.alias("min_shingle_hash")
    )


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Word n-grams from an ALREADY-BOUND token-array column.

    ``t`` must be a projected attribute (``tokens(text).alias(...)``
    in a prior select), not an inline ``tokens(text)`` expression:
    Catalyst does not hoist loop-invariant subexpressions out of
    higher-order-function lambdas, so an inline form re-evaluates the
    tokenizing split once per element access — O(words x doc_len) per
    doc. On a heavy-tailed corpus (10x skew stress, NOTES r3) that
    quadratic costs 176s where the bound-column form takes 2.6s (68x).
    Use ``exploded_shingles`` for the common docs -> (id, shingle)
    shape.

    Spark's ``sequence(1, k)`` counts DOWN when k < 1, so the
    short-doc case must be guarded explicitly (DuckDB's
    generate_series just returns empty).
    """
    size = F.size(t)
    idx = F.when(
        size >= n, F.sequence(F.lit(1), size - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(n)]
        ),
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Array of word n-gram strings (empty when the doc is too short).

    Inline-expression form: ONLY for one-shot array contexts on short
    texts. Anything that explodes shingles over a corpus must go
    through ``exploded_shingles`` (see ``shingles_from_tokens`` for
    the quadratic re-tokenize trap this avoids).
    """
    return shingles_from_tokens(tokens(text), n)


def exploded_shingles(
    docs: DataFrame,
    n: int = 3,
    out: str = "shingle",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """docs -> (*keep, <out>): one row per word n-gram occurrence.

    Tokenizes ONCE into a bound column, then builds + explodes the
    n-grams from it — the linear-time shape (the inline-expression
    form re-tokenizes per element; 68x slower on a heavy-tailed
    corpus, NOTES r3)."""
    tk = docs.select(*keep, tokens("text").alias("__toks"))
    return tk.select(
        *keep,
        F.explode(shingles_from_tokens(F.col("__toks"), n)).alias(out),
    )


def minhash_permuted(shingle: Column, a: int, b: int) -> Column:
    """(a * h32(shingle) + b) mod p — one MinHash permutation."""
    h = F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("bigint")
    return (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_PRIME)


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram log-probability (perplexity proxy).

    The classic cheap LM-quality filter (used before real-LM scoring
    in pipelines like CCNet): fit a unigram model on the corpus itself
    — p(w) = count(w)/total — then score each document by the mean
    ln p of its tokens. Low scores = rare-token-heavy / off-
    distribution documents.

    Shape: one explode + groupBy builds the vocab (map-side partial),
    the vocab re-joins the token stream BROADCAST (a natural-language
    vocab is millions of rows ~ MBs at 100 TB corpus scale, always
    broadcastable), and the per-doc agg shuffles (doc_id, double)
    pairs only. ln(count) − ln(total) per token is bit-exact across
    engines; only the per-doc mean needs rounding (summation order).
    """
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("tok_total"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (
                F.log(F.col("tok_cnt").cast("double"))
                - F.log(F.col("tok_total").cast("double"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def mllib_tfidf(
    docs: DataFrame, num_features: int = 1 << 10, normalize: bool = True
) -> DataFrame:
    """MLlib text featurization: Tokenizer -> HashingTF -> IDF [-> Normalizer].

    The SURVEY.md §2.11 pipeline feeding vector distance ops (the
    murmur-hashed MLlib twin of the oracle-checkable
    ``text_hashed_tfidf`` contract query). Returns
    (doc_id, tfidf vector[, tfidf_norm]); fit state = the IDF
    statistics, learned with one pass.
    """
    from pyspark.ml.feature import IDF, HashingTF, Normalizer, Tokenizer

    tok = Tokenizer(inputCol="text", outputCol="_words")
    tf = HashingTF(
        inputCol="_words", outputCol="_tf", numFeatures=num_features
    )
    words = tf.transform(tok.transform(docs.select("doc_id", "text")))
    idf_model = IDF(inputCol="_tf", outputCol="tfidf").fit(words)
    out = idf_model.transform(words).select("doc_id", "tfidf")
    if normalize:
        out = Normalizer(
            inputCol="tfidf", outputCol="tfidf_norm", p=2.0
        ).transform(out)
    return out
