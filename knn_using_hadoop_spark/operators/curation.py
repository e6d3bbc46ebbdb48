"""Training-data curation operators: the pipeline stages between a raw
crawl and a training shard.

North-star extensions beyond the reference surface (SURVEY.md §2.11):
repetition-based quality filtering (Gopher-style), deterministic
train/val/test splitting, temperature-scaled domain mixture weights,
per-source reservoir sampling, PII redaction, int8 embedding
quantization, and benchmark decontamination. Design rules shared with
operators/text.py:

* pure Catalyst expressions / relational ops — no Python in the hot
  path, everything whole-stage-codegen'd and split-parallel;
* determinism: sampling and splitting decisions come from the
  portable md5 hash (functions.hashing), never an RNG, so every
  decision is reproducible row-locally across runs AND engines;
* cross-engine exactness: the only non-rational function used is
  sqrt (correctly rounded by IEEE 754 in both JVM and C, unlike pow/
  exp/log which carry ulp slack), and unordered float aggregates are
  rounded before comparison.

Scale notes are on each operator; none of them shuffles more than
once beyond what the semantics require, and all per-group limits
plan as WindowGroupLimit partial top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import (
    portable_hash32,
    portable_hash64,
)
from knn_using_hadoop_spark.operators.text import (
    exploded_shingles,
    tokens,
)


def repetition_metrics(
    docs: DataFrame,
    max_top_token_frac: float = 0.15,
    max_dup_bigram_frac: float = 0.08,
    min_tokens: int = 20,
) -> DataFrame:
    """Gopher-style repetition quality metrics + keep flag per doc.

    (doc_id, n_tokens, top_token_frac, dup_token_frac,
    dup_bigram_frac, keep) where

    * ``top_token_frac``  = count of the most frequent token / total
      tokens (catches "word word word ..." degenerate docs);
    * ``dup_token_frac``  = 1 - distinct/total tokens;
    * ``dup_bigram_frac`` = 1 - distinct/total word bigrams (catches
      copy-paste loops that token-level stats miss).

    Thresholds default to the corpus p95s (measured in FIXTURES.md
    testdata); callers tune per corpus.

    Scale: two explode→partial-agg passes (tokens, bigrams) joined on
    doc_id. Both aggregates are map-side combinable and keyed on
    (doc_id, gram) then doc_id — no skew beyond document length, no
    global state. The gram shuffles as a short raw string: at ~13
    bytes/key that is cheaper than md5-hashing every gram first (the
    hash-first trade only wins for long shingles, cf. dedup.py).
    """
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    )
    per_tok = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    tok_m = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.max("c").alias("top_c"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    big = exploded_shingles(docs, 2, out="bg")
    per_big = big.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    big_m = per_big.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
    )
    m = tok_m.join(big_m, "doc_id")
    top_frac = F.col("top_c").cast("double") / F.col("n_tokens")
    dup_tok = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    dup_big = (
        1.0
        - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams")
    )
    return m.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(top_frac, 6).alias("top_token_frac"),
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(dup_big, 6).alias("dup_bigram_frac"),
        (
            (top_frac <= max_top_token_frac)
            & (dup_big <= max_dup_bigram_frac)
            & (F.col("n_tokens") >= min_tokens)
        )
        .cast("int")
        .alias("keep"),
    )


def split_assign(
    docs: DataFrame,
    salt: str = ":split",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-hash bucket.

    Adds a ``split`` column ('train' | 'val' | 'test') from
    ``hash32(doc_id || salt) % 100``. Hash-based (never RNG) so the
    assignment is stable under re-runs, engine changes, and corpus
    growth — a doc's split never changes when other docs are added,
    which is the property that prevents silent eval contamination
    when a corpus is re-snapshotted.

    Scale: row-local (narrow), zero shuffles.
    """
    bucket = portable_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit(salt))
    ) % 100
    return docs.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Temperature-scaled domain mixture weights (alpha = 0.5).

    (source, n_docs, n_tokens, weight) with
    ``weight = sqrt(n_tokens_i) / sum_j sqrt(n_tokens_j)`` — the
    standard sampling-temperature reweighting that upsamples small
    domains relative to proportional sampling. alpha is fixed at 0.5
    because sqrt is correctly rounded in IEEE 754 (bit-identical
    across engines); a general pow(x, alpha) carries 1-ulp slack that
    a cross-engine gate would have to round away.

    Scale: one partial agg by source (|sources| rows), then a 1-row
    total broadcast back — no data-sized shuffle.
    """
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    total = per_src.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z")
    )
    return (
        per_src.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.sqrt(F.col("n_tokens").cast("double")) / F.col("z"), 6
            ).alias("weight"),
        )
    )


def reservoir_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int, salt: str = ":rsv"
) -> DataFrame:
    """Deterministic fixed-size sample of ``k`` rows per group.

    The distributed stand-in for reservoir sampling: rank rows within
    each group by a content hash and keep the k smallest. Same
    uniform-without-replacement guarantee as a seeded reservoir, but
    order-independent (no sequential scan state), reproducible, and
    mergeable — the property that matters when the input arrives as
    10k parquet splits in arbitrary order.

    Scale: plans as WindowGroupLimit — each task keeps only its local
    top-k per group before the shuffle, so the exchange carries
    O(groups x k) rows per task, not the full table.
    """
    hv = portable_hash32(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(group_col).orderBy(
        hv.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


# PII patterns: simple character-class regexes chosen to parse
# identically under Java regex (Spark) and RE2 (DuckDB) — no
# backrefs, no lookaround, no \d-style classes (RE2 and Java agree
# on them, but explicit classes leave nothing to dialect).
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[.][a-z]+"
DIGITS_RE = "[0-9][0-9][0-9]+"


def pii_redact(df: DataFrame, text_col: str) -> DataFrame:
    """Mask emails and long digit runs; count what was masked.

    Adds ``masked`` (text with emails -> '<EMAIL>', 3+ digit runs ->
    '<NUM>'), ``n_emails``, ``n_numbers``. Redaction before training
    is a one-pass, row-local narrow transform — this is the cheapest
    stage of any pipeline and the one you never skip.
    """
    c = F.col(text_col)
    return df.withColumn(
        "n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0))
    ).withColumn(
        "n_numbers",
        F.size(
            F.regexp_extract_all(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
                F.lit(DIGITS_RE),
                0,
            )
        ),
    ).withColumn(
        "masked",
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
            DIGITS_RE,
            "<NUM>",
        ),
    )


def quantize_embeddings_int8(emb: DataFrame) -> DataFrame:
    """Per-dimension int8 scalar quantization + reconstruction error.

    (pos, vmin, vmax, avg_abs_err, max_abs_err): computes global
    per-dimension [min, max], maps each value to the 0..255 grid with
    ``floor((v - vmin) * 255 / span)`` (floor, not round: floor is
    exactly specified for doubles in both engines, round's half-case
    tie rule is not), reconstructs at the bucket midpoint, and
    reports the per-dimension error profile — the go/no-go report for
    shipping a quantized ANN index.

    Scale: posexplode -> partial min/max agg (|dims| rows, broadcast
    back) -> one more partial agg. The explode multiplies rows by
    |dims| but carries only (pos, value) — fixed-width, column-pruned
    at the scan.
    """
    v = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    stats = v.groupBy("pos").agg(
        F.min("val").alias("vmin"), F.max("val").alias("vmax")
    )
    span = F.col("vmax") - F.col("vmin")
    q = (
        v.join(F.broadcast(stats), "pos")
        .withColumn(
            "qv",
            F.when(span == 0.0, F.lit(0)).otherwise(
                F.least(
                    F.lit(255),
                    F.floor(
                        (F.col("val") - F.col("vmin")) * 255.0 / span
                    ),
                )
            ),
        )
        .withColumn(
            "recon",
            F.col("vmin")
            + (F.col("qv").cast("double") + 0.5) * span / 255.0,
        )
    )
    return (
        q.groupBy("pos")
        .agg(
            F.round(F.min("val"), 6).alias("vmin"),
            F.round(F.max("val"), 6).alias("vmax"),
            F.round(F.avg(F.abs(F.col("val") - F.col("recon"))), 6).alias(
                "avg_abs_err"
            ),
            F.round(F.max(F.abs(F.col("val") - F.col("recon"))), 6).alias(
                "max_abs_err"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    n: int = 5,
    bench_mod: int = 10,
    min_frac: float = 0.2,
    collapse: bool | str = "auto",
    content_keys: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination by n-gram overlap.

    Treats docs with ``doc_id % bench_mod == 0`` as the held-out
    benchmark; for every remaining training doc, computes the
    fraction of its distinct word ``n``-grams that also occur in any
    benchmark doc, and flags docs at or above ``min_frac`` as
    contaminated (the near-dup copies of eval data that survive exact
    dedup). Returns (doc_id, n_grams, n_overlap, overlap_frac,
    contaminated).

    Scale: grams are hashed BEFORE any shuffle (fixed-width keys);
    the benchmark side is tiny by construction, so the overlap join
    broadcasts it — per-task hash-probe, no repartition of the
    training corpus. Left join + count keeps zero-overlap docs.

    ``collapse=True`` shingles only DISTINCT texts: the
    per-doc output row depends only on the doc's text (its distinct
    gram set) and the global benchmark gram set, which itself is a
    union over the texts of benchmark docs — so docs are collapsed
    onto a content representative (the ``dedup_exact`` 120-bit key,
    same argument as dedup's ``_content_collapse``), the shingle
    explode + distinct + overlap count run per REP, and two
    fixed-width joins reconstitute per-doc rows. Under heavy
    duplication (the 100 TB regime that matters: the scale100 corpus
    has 500k docs over 98k distinct texts) the shuffled gram volume
    drops by the duplication factor. Output is provably identical:
    a rep has >=1 gram iff each of its member docs does (same text),
    and the benchmark gram union over member-bearing reps equals the
    union over benchmark docs. ``collapse=False`` keeps the direct
    per-doc plan.

    ``collapse="auto"`` (the default, r5 verdict #1 — mirrors
    ``semdedup_prune``'s probe): one (count, HLL approx-distinct)
    aggregate over the content keys picks the plan. The r5 crossover
    table (NOTES: direct 6.2s vs collapsed 7.7s at ~5x duplication;
    collapsed 2.0x faster at ~20x, 3.6x at 200x) puts the break-even
    between 5x and 20x, and the mistakes are asymmetric — collapsing
    too early costs a bounded ~10-25%, collapsing too late costs an
    unbounded pile-up factor — so the probe collapses at rows /
    distinct-texts >= 8. Both plans are output-identical (pytest-
    pinned), the probe only picks wall-clock. When ``content_keys``
    is supplied the probe aggregates that fixed-width (usually
    checkpointed) relation instead of re-hashing the corpus;
    otherwise it executes the docs lineage once extra — pipeline
    composers should pass content_keys, explicit True/False, or
    checkpoint first (same caveat as the auto ANN knobs).

    ``content_keys`` (r5): a precomputed (doc_id, crep) relation —
    crep = min doc_id per exact text content — lets a caller that
    already paid for content keys (the curation pipeline computes
    them for its exact-dup stage, same 120-bit md5 slices) share ONE
    relation instead of hashing + windowing the corpus twice. The
    caller should eagerly checkpoint it if it feeds other consumers
    too; this function uses it as-is (with ``collapse=False`` it is
    ignored; with ``"auto"`` it feeds the probe and, if the probe
    picks collapse, the rep joins).
    """
    is_bench = F.col("doc_id") % bench_mod == 0
    if collapse == "auto":
        if content_keys is not None:
            n_rows, n_distinct = (
                content_keys.agg(
                    F.count(F.lit(1)),
                    F.approx_count_distinct("crep"),
                ).first()
            )
        else:
            n_rows, n_distinct = (
                docs.agg(
                    F.count(F.lit(1)),
                    F.approx_count_distinct(
                        portable_hash64(F.col("text"))
                    ),
                ).first()
            )
        collapse = n_distinct > 0 and n_rows / n_distinct >= 8.0
    if not collapse:
        grams = exploded_shingles(docs, n, out="g").select(
            "doc_id", portable_hash32(F.col("g")).alias("h")
        )
        grams = grams.distinct()
        bench = grams.filter(is_bench).select("h").distinct()
        train = grams.filter(~is_bench)
        hit = (
            train.join(
                F.broadcast(bench.withColumn("hit", F.lit(1))),
                "h",
                "left",
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias(
                    "n_overlap"
                ),
            )
        )
        frac = F.col("n_overlap").cast("double") / F.col("n_grams")
        return hit.select(
            "doc_id",
            "n_grams",
            "n_overlap",
            F.round(frac, 6).alias("overlap_frac"),
            (frac >= min_frac).cast("int").alias("contaminated"),
        )
    # content collapse: doc -> content representative (min doc_id per
    # 120-bit text key). ck is doc-level fixed-width and feeds three
    # consumers (rep filter, bench-flag agg, expansion join) — one
    # eager checkpoint, the dedup module's sig-relation pattern.
    if content_keys is not None:
        ck = content_keys.select("doc_id", "crep")
    else:
        ck = (
            docs.select(
                "doc_id",
                portable_hash64(F.col("text")).alias("k1"),
                portable_hash64(F.col("text"), pos=17).alias("k2"),
            )
            .withColumn(
                "crep",
                F.min("doc_id").over(Window.partitionBy("k1", "k2")),
            )
            .select("doc_id", "crep")
            .localCheckpoint(eager=True)
        )
    reps = docs.join(
        ck.filter(F.col("doc_id") == F.col("crep")).select("doc_id"),
        "doc_id",
    )
    # per-rep distinct hashed grams; feeds both the benchmark union
    # and the per-rep overlap count -> checkpoint once
    rep_grams = (
        exploded_shingles(reps, n, out="g")
        .select(
            F.col("doc_id").alias("crep"),
            portable_hash32(F.col("g")).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    has_bench = ck.groupBy("crep").agg(
        F.max(is_bench.cast("int")).alias("has_bench")
    )
    bench = (
        rep_grams.join(
            has_bench.filter(F.col("has_bench") == 1).select("crep"),
            "crep",
        )
        .select("h")
        .distinct()
    )
    rep_stats = (
        rep_grams.join(
            F.broadcast(bench.withColumn("hit", F.lit(1))), "h", "left"
        )
        .groupBy("crep")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
    )
    frac = F.col("n_overlap").cast("double") / F.col("n_grams")
    # inner join: zero-gram docs drop exactly as their zero-gram reps
    # do in the uncollapsed plan
    return (
        ck.filter(~is_bench)
        .join(rep_stats, "crep")
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            F.round(frac, 6).alias("overlap_frac"),
            (frac >= min_frac).cast("int").alias("contaminated"),
        )
    )
