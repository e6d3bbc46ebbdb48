"""Training-data pipeline ops (chunking, packing, incremental dedup) + curation II (repetition, splits, mixtures).

Split from the former monolithic contract.py (round 3); original lines 2754-3233. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.text_dedup import (_EMB_DIM)
from knn_using_hadoop_spark.contract.knn_variants import (_LSH_PAIRS_CTE)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Round 2: training-data pipeline ops (chunking, packing, incremental
# dedup), oracle-checked sketching, bloom-pruned join, CUBE, bigram LM
# counts. The reference has none of these (SURVEY.md §2.9/§2.11); they
# are the ops a pretraining pipeline actually runs.
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import pipeline as _pipeline  # noqa: E402
from knn_using_hadoop_spark.operators.joins import (  # noqa: E402
    bloom_pruned_join,
)
from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    kmv_distinct,
    kmv_distinct_oracle_sql,
)


@_register(
    "doc_chunk_windows",
    """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
nz AS (SELECT * FROM toks WHERE len(t) > 0),
st AS (SELECT doc_id, t, unnest(range(0, len(t), 40)) AS start FROM nz)
SELECT doc_id, (start // 40)::INT AS chunk_id,
       array_to_string(t[start + 1 : start + 50], ' ') AS chunk_text,
       least(50, len(t) - start)::INT AS n_tokens
FROM st""",
)
def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (size=50, overlap=10) — the
    RAG/embedding-indexing preprocessor. Scan + generate only, no
    shuffle; see operators/pipeline.py::chunk_windows."""
    return _pipeline.chunk_windows(
        load_table(spark, "documents", sf_dir), size=50, overlap=10
    )


@_register(
    "doc_pack_greedy",
    """WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' '))::INT AS n_tokens
  FROM documents),
pref AS (
  SELECT source, doc_id, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY source
                              ORDER BY doc_id))::BIGINT - n_tokens
           AS start_offset
  FROM toks)
SELECT source, doc_id, n_tokens, start_offset,
       (start_offset // 512)::INT AS pack_id
FROM pref""",
)
def q_doc_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate per-source token
    streams in doc_id order, chop every 512 tokens; a doc's pack is
    where its first token lands. Window sum PARTITIONED BY source —
    no global order (pipeline.py::pack_greedy)."""
    return _pipeline.pack_greedy(
        load_table(spark, "documents", sf_dir), capacity=512
    )


@_register(
    "dedup_incremental",
    """WITH inc AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
corp AS (SELECT * FROM documents WHERE doc_id % 10 <> 0)
SELECT i.doc_id, i.lang, i.source
FROM inc i
WHERE NOT EXISTS (
  SELECT 1 FROM corp c
  WHERE ('0x' || substr(md5(c.text), 1, 15))::BIGINT
          = ('0x' || substr(md5(i.text), 1, 15))::BIGINT
    AND ('0x' || substr(md5(c.text), 17, 15))::BIGINT
          = ('0x' || substr(md5(i.text), 17, 15))::BIGINT)""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: incoming batch (doc_id % 10 = 0) anti-
    joined against the standing corpus on the 120-bit content key —
    16-byte shuffle keys, never document bodies
    (pipeline.py::dedup_incremental)."""
    docs = load_table(spark, "documents", sf_dir)
    return _pipeline.dedup_incremental(
        corpus=docs.filter(F.col("doc_id") % 10 != 0),
        incoming=docs.filter(F.col("doc_id") % 10 == 0),
    )


@_register(
    "distinct_kmv",
    kmv_distinct_oracle_sql("events", "event_type", "user_id::VARCHAR", 64),
)
def q_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event type — the oracle-checkable
    approximate-distinct (HLL can't cross-engine-match; k smallest
    md5 hashes can). Planner turns the per-group k-smallest into a
    partial top-k below the shuffle, i.e. fixed-size sketch merges
    (operators/sketches.py)."""
    return kmv_distinct(
        load_table(spark, "events", sf_dir), "event_type", "user_id", k=64
    )


@_register(
    "events_cube",
    """SELECT event_type, dayname(ts) AS dow, count(*) AS n_events,
       round(sum(value)::DOUBLE, 2) AS total_value
FROM events
GROUP BY CUBE (event_type, dayname(ts))""",
)
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping
    granularities in one shared scan + Expand — completes the
    rollup/grouping-sets family (events_multi_rollup) with the full
    lattice."""
    e = load_table(spark, "events", sf_dir)
    return e.cube(
        F.col("event_type"), F.date_format("ts", "EEEE").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@_register(
    "doc_bigram_counts",
    """WITH nz AS (
  SELECT string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM nz)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram HAVING count(*) >= 20""",
)
def q_doc_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts (the n-gram LM / contamination-check
    primitive): per-doc bigram generation is scan-local, one shuffle
    on the bigram for the count, threshold n >= 20."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.col("text"), " ")
    bg = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', "
                    "element_at(t, i + 1)))"
                )
            ).alias("bigram")
        )
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


@_register(
    "join_bloom_pruned",
    """SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount))::DOUBLE, 2)
         AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 450000
GROUP BY o.o_orderpriority""",
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈dim join behind an explicit Bloom runtime
    filter (operators/joins.py). Bloom false positives die in the
    exact join that follows, so the oracle is the PLAIN join SQL —
    an approximate technique with an exact contract."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") > 450000
    ).select("o_orderkey", "o_orderpriority")
    joined = bloom_pruned_join(li, o, "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "dedup_components_star",
    f"""WITH RECURSIVE {_LSH_PAIRS_CTE},
edges AS (SELECT doc_a AS s, doc_b AS t FROM neardup
          UNION ALL SELECT doc_b, doc_a FROM neardup),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t)
SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc""",
)
def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star —
    the O(log n)-round formulation for planet-scale dedup graphs,
    same contract (and same recursive-CTE oracle) as the min-label
    propagation in ``dedup_components``."""
    docs = load_docs_wide(spark, sf_dir)
    pairs = _dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return _dedup.neardup_components_star(pairs)


# --------------------------------------------------------------------------
# Training-data curation II: repetition filters, splits, mixtures,
# sampling, PII, quantization, decontamination (SURVEY.md §2.11)
# --------------------------------------------------------------------------
from knn_using_hadoop_spark.operators import curation as _cur  # noqa: E402


@_register(
    "doc_repetition_filter",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
ptok AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
tm AS (SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_c,
              count(*) AS n_distinct
       FROM ptok GROUP BY doc_id),
w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
big AS (SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(t) - 1, 0)),
                 i -> t[i] || ' ' || t[i + 1])) AS bg
        FROM w),
pbig AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
bm AS (SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct_bigrams
       FROM pbig GROUP BY doc_id),
m AS (SELECT tm.*, bm.n_bigrams, bm.n_distinct_bigrams
      FROM tm LEFT JOIN bm USING (doc_id))
SELECT doc_id,
       n_tokens::BIGINT AS n_tokens,
       round(top_c::DOUBLE / n_tokens, 6) AS top_token_frac,
       round(1.0 - n_distinct::DOUBLE / n_tokens, 6) AS dup_token_frac,
       round(CASE WHEN n_bigrams > 0
                  THEN 1.0 - n_distinct_bigrams::DOUBLE / n_bigrams
                  ELSE 0.0 END, 6) AS dup_bigram_frac,
       CASE WHEN top_c::DOUBLE / n_tokens <= 0.15
             AND (CASE WHEN n_bigrams > 0
                       THEN 1.0 - n_distinct_bigrams::DOUBLE / n_bigrams
                       ELSE 0.0 END) <= 0.08
             AND n_tokens >= 20
            THEN 1 ELSE 0 END AS keep
FROM m""",
)
def q_doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: top-token fraction,
    duplicate token/bigram fractions, keep flag at the corpus-p95
    thresholds. The repetition signals exact-dedup can't see."""
    return _cur.repetition_metrics(load_docs_wide(spark, sf_dir))


@_register(
    "corpus_split_counts",
    """WITH s AS (
  SELECT source,
         CASE WHEN ('0x' || substr(md5(doc_id || ':split'), 1, 8))::BIGINT
                   % 100 < 80 THEN 'train'
              WHEN ('0x' || substr(md5(doc_id || ':split'), 1, 8))::BIGINT
                   % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(text, ' ')) AS n_tok
  FROM documents)
SELECT source, split, count(*) AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens
FROM s GROUP BY source, split""",
)
def q_corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket train/val/test split, audited as
    per-(source, split) doc and token counts. Hash-stable: a doc's
    split never changes when the corpus grows."""
    from knn_using_hadoop_spark.operators.text import tokens

    docs = _cur.split_assign(load_table(spark, "documents", sf_dir))
    return docs.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
    )


@_register(
    "domain_mixture_weights",
    """WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(sqrt(n_tokens::DOUBLE)) AS z FROM per_src)
SELECT source, n_docs, n_tokens,
       round(sqrt(n_tokens::DOUBLE) / z, 6) AS weight
FROM per_src CROSS JOIN tot""",
)
def q_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) domain mixture weights: the
    sampling distribution over sources for training-shard assembly.
    sqrt (IEEE-correctly-rounded) keeps the oracle bit-exact where a
    general pow() would not be."""
    return _cur.mixture_weights(load_table(spark, "documents", sf_dir))


@_register(
    "sample_reservoir_per_source",
    """WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id || ':rsv'), 1, 8))::BIGINT,
                    doc_id) AS rk
  FROM documents)
SELECT source, doc_id FROM r WHERE rk <= 10""",
)
def q_sample_reservoir_per_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic 10-per-source sample (distributed reservoir
    stand-in): hash-ranked, order-independent, mergeable. Plans as
    WindowGroupLimit partial top-k."""
    docs = load_table(spark, "documents", sf_dir)
    return _cur.reservoir_per_group(
        docs, "source", "doc_id", k=10
    ).select("source", "doc_id")


@_register(
    "pii_redact_stats",
    """WITH card AS (
  SELECT c_mktsegment,
         c_name || ' <user' || c_custkey || '@mail.example.com> acct '
           || (c_custkey * 7) AS contact
  FROM customer),
m AS (
  SELECT c_mktsegment,
         len(regexp_extract_all(contact,
             '[a-z0-9._]+@[a-z0-9.]+[.][a-z]+')) AS n_emails,
         len(regexp_extract_all(
             regexp_replace(contact, '[a-z0-9._]+@[a-z0-9.]+[.][a-z]+',
                            '<EMAIL>', 'g'),
             '[0-9][0-9][0-9]+')) AS n_numbers,
         regexp_replace(
           regexp_replace(contact, '[a-z0-9._]+@[a-z0-9.]+[.][a-z]+',
                          '<EMAIL>', 'g'),
           '[0-9][0-9][0-9]+', '<NUM>', 'g') AS masked
  FROM card)
SELECT c_mktsegment, count(*) AS n_cards,
       sum(n_emails)::BIGINT AS n_emails,
       sum(n_numbers)::BIGINT AS n_numbers,
       sum(('0x' || substr(md5(masked), 1, 8))::BIGINT)::BIGINT
         AS masked_checksum
FROM m GROUP BY c_mktsegment""",
)
def q_pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails -> <EMAIL>, 3+ digit runs -> <NUM>) over
    synthesized contact cards, audited per segment with a checksum of
    the masked text — proves the masking, not just the counts. The
    regexes are dialect-neutral (no \\d, no lookaround) so Java regex
    and RE2 agree."""
    from knn_using_hadoop_spark.functions.hashing import portable_hash32

    cust = load_table(spark, "customer", sf_dir)
    card = cust.select(
        "c_mktsegment",
        F.concat(
            F.col("c_name"),
            F.lit(" <user"),
            F.col("c_custkey").cast("string"),
            F.lit("@mail.example.com> acct "),
            (F.col("c_custkey") * 7).cast("string"),
        ).alias("contact"),
    )
    red = _cur.pii_redact(card, "contact")
    return red.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cards"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_numbers").alias("n_numbers"),
        F.sum(portable_hash32(F.col("masked"))).alias("masked_checksum"),
    )


@_register(
    "embedding_quantize_int8",
    f"""WITH v AS (
  SELECT vec_id, (g.i - 1)::INT AS pos, embedding[g.i]::DOUBLE AS val
  FROM embeddings, generate_series(1, {_EMB_DIM}) g(i)),
st AS (SELECT pos, min(val) AS vmin, max(val) AS vmax
       FROM v GROUP BY pos),
q AS (
  SELECT v.pos, v.val, st.vmin, st.vmax,
         CASE WHEN st.vmax - st.vmin = 0 THEN 0
              ELSE least(255, floor((v.val - st.vmin) * 255.0
                                    / (st.vmax - st.vmin)))
         END AS qv
  FROM v JOIN st ON st.pos = v.pos),
r AS (
  SELECT pos, val, vmin, vmax,
         vmin + (qv::DOUBLE + 0.5) * (vmax - vmin) / 255.0 AS recon
  FROM q)
SELECT pos, round(min(val), 6) AS vmin, round(max(val), 6) AS vmax,
       round(avg(abs(val - recon)), 6) AS avg_abs_err,
       round(max(abs(val - recon)), 6) AS max_abs_err
FROM r GROUP BY pos""",
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization with reconstruction
    error profile — the go/no-go report before shipping a quantized
    ANN index. floor()-based grid (exactly specified for doubles in
    both engines, unlike round's tie rule)."""
    return _cur.quantize_embeddings_int8(
        load_table(spark, "embeddings", sf_dir)
    )


@_register(
    "decontaminate_overlap",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (SELECT DISTINCT doc_id,
             ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len(t) - 4, 0)),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                          || t[i+3] || ' ' || t[i+4])) AS gram
            FROM w) u),
bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 10 = 0),
train AS (SELECT * FROM g WHERE doc_id % 10 <> 0),
hit AS (
  SELECT t.doc_id, count(*) AS n_grams,
         sum(CASE WHEN b.h IS NULL THEN 0 ELSE 1 END)::BIGINT AS n_overlap
  FROM train t LEFT JOIN bench b ON b.h = t.h
  GROUP BY t.doc_id)
SELECT doc_id, n_grams, n_overlap,
       round(n_overlap::DOUBLE / n_grams, 6) AS overlap_frac,
       CASE WHEN n_overlap::DOUBLE / n_grams >= 0.2 THEN 1 ELSE 0 END
         AS contaminated
FROM hit""",
)
def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 5-gram overlap of every training doc
    against the held-out slice (doc_id % 10 = 0). Catches the near-dup
    copies of eval data that exact dedup misses; the benchmark side is
    broadcast, grams are hashed before any shuffle."""
    return _cur.decontaminate(load_docs_wide(spark, sf_dir))


@_register(
    "unpivot_source_stats",
    """WITH wide AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
         sum(length(text))::BIGINT AS n_chars
  FROM documents GROUP BY source)
SELECT source, 'n_docs' AS metric, n_docs AS value FROM wide
UNION ALL SELECT source, 'n_tokens', n_tokens FROM wide
UNION ALL SELECT source, 'n_chars', n_chars FROM wide""",
)
def q_unpivot_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (unpivot/stack) of per-source corpus stats —
    the inverse of pivot, via Spark's native unpivot (Expand node:
    one pass, no join, |metrics| rows out per input row)."""
    from knn_using_hadoop_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    wide = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    return wide.unpivot(
        ["source"], ["n_docs", "n_tokens", "n_chars"], "metric", "value"
    )


