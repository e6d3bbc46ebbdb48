"""Product quantization ANN, analytic-window surface, modeling, sketch rescue, LM scoring.

Split from the former monolithic contract.py (round 3); original lines 3666-3961. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import text as _text  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (REGISTRY, _register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.text_dedup import (
    _DOC_CTE,
    _EMB_DIM,
    _lang_case_sql,
    _lang_scores_sql,
)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Round 2: analytic-window surface, modeling, sketch rescue, LM scoring
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import analytics as _an  # noqa: E402
from knn_using_hadoop_spark.functions.hashing import (  # noqa: E402
    portable_hash64,
)
from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    mg_heavy_hitters,
    mg_heavy_hitters_oracle_sql,
)


@_register(
    "orders_rank_surface",
    """WITH b AS (
  SELECT o_orderpriority, o_orderkey,
         floor(o_totalprice / 10000)::BIGINT AS rank_val
  FROM orders)
SELECT o_orderpriority, o_orderkey, rank_val,
       (rank() OVER w1)::INT AS rnk,
       (dense_rank() OVER w1)::INT AS dense_rnk,
       round(percent_rank() OVER w1, 6) AS pct_rank,
       round(cume_dist() OVER w1, 6) AS cume,
       (ntile(4) OVER w2)::INT AS tile
FROM b
WINDOW w1 AS (PARTITION BY o_orderpriority ORDER BY rank_val DESC),
       w2 AS (PARTITION BY o_orderpriority
              ORDER BY rank_val DESC, o_orderkey ASC)""",
)
def q_orders_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function family (rank/dense_rank/percent_rank/
    cume_dist/ntile) over price buckets per priority. The bucket is
    deliberately coarse so tie semantics are exercised; see
    operators/analytics.py::rank_surface for the one-Exchange /
    two-sort determinism design."""
    orders = load_table(spark, "orders", sf_dir)
    return _an.rank_surface(
        orders,
        part="o_orderpriority",
        rank_col=F.floor(F.col("o_totalprice") / 10000),
        tie="o_orderkey",
        n_tiles=4,
    )


@_register(
    "events_forward_fill",
    """SELECT event_id, user_id, ts, event_type,
       round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS carried_value
FROM events""",
)
def q_events_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE-NULLS forward fill: every event carries the user's most
    recent purchase amount (null before the first purchase) — the
    canonical LAST_VALUE ... IGNORE NULLS gap-carry, partitioned per
    user (analytics.py::forward_fill)."""
    events = load_table(spark, "events", sf_dir)
    return _an.forward_fill(
        events,
        value_when=F.when(F.col("event_type") == "purchase", F.col("value")),
    )


@_register(
    "events_scd2_history",
    """WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_attr
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_attr IS NULL OR event_type <> prev_attr)
SELECT user_id, event_type AS attr_value, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS valid_to,
       (row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id))::INT AS version
FROM chg""",
)
def q_events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history build from a change log: change-point
    detection via lag(), validity intervals via lead(), version via
    row_number() — all in one partitioned sort
    (analytics.py::scd2_history)."""
    return _an.scd2_history(load_table(spark, "events", sf_dir))


@_register(
    "events_rolling_anomaly",
    """WITH sc AS (
  SELECT event_id, user_id, ts, value,
         count(*) OVER w AS n,
         avg(value) OVER w AS mean,
         stddev_samp(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, ts, round(value, 2) AS value,
       round((value - mean) / sd, 3) AS z
FROM sc
WHERE n >= 5 AND sd > 0.01
  AND abs(round((value - mean) / sd, 3)) > 2.0""",
)
def q_events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over a 10-row ROWS frame per
    user: O(1)-memory sliding stats, stddev floor + min-observation
    guard (analytics.py::rolling_anomaly)."""
    return _an.rolling_anomaly(load_table(spark, "events", sf_dir))


@_register(
    "events_ols_trend",
    """WITH xs AS (
  SELECT event_type,
         (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY event_type))
           / 86400.0 AS x,
         value AS y
  FROM events),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM xs GROUP BY event_type)
SELECT event_type, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS slope_per_day,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             4) AS intercept
FROM agg""",
)
def q_events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed closed-form OLS per event type (value vs days since
    the group's first event): a 6-number partial aggregate per group —
    the normal-equation shape that fits millions of per-key trends in
    one shuffle (analytics.py::ols_trend; centering rationale there)."""
    return _an.ols_trend(load_table(spark, "events", sf_dir))


@_register(
    "events_click_purchase_join",
    """WITH c AS (
  SELECT event_id AS cause_id, user_id, ts AS cause_ts
  FROM events WHERE event_type = 'click'),
p AS (
  SELECT event_id AS effect_id, user_id, ts AS effect_ts
  FROM events WHERE event_type = 'purchase')
SELECT p.effect_id, c.cause_id, p.user_id,
       round(epoch(p.effect_ts) - epoch(c.cause_ts), 3) AS lag_secs
FROM p JOIN c ON p.user_id = c.user_id
 AND c.cause_ts <= p.effect_ts
 AND c.cause_ts > p.effect_ts - INTERVAL 10 MINUTE""",
)
def q_events_click_purchase_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval attribution join: purchases paired with same-user
    clicks in the preceding 10 minutes. Equi-join on user_id with the
    time range as join filter (analytics.py::attribution_join); batch
    twin of the watermarked stream-stream join in streaming/."""
    return _an.attribution_join(load_table(spark, "events", sf_dir))


@_register(
    "doc_unigram_logprob",
    """WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
vocab AS (SELECT tok, count(*)::BIGINT AS tok_cnt FROM tk GROUP BY tok),
tot AS (SELECT count(*)::BIGINT AS tok_total FROM tk)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(ln(tok_cnt::DOUBLE) - ln(tok_total::DOUBLE)), 6)
         AS avg_logprob
FROM tk JOIN vocab USING (tok), tot
GROUP BY doc_id""",
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM mean log-probability per document — the cheap
    perplexity-proxy quality filter (CCNet-style) fit on the corpus
    itself; broadcast vocab re-join, (doc_id, double) shuffle only
    (operators/text.py::unigram_logprob)."""
    return _text.unigram_logprob(load_docs_wide(spark, sf_dir))


@_register(
    "token_heavy_hitters",
    mg_heavy_hitters_oracle_sql(
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents",
        "tok",
        k=40,
    ),
)
def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (freq > n/40) with exact counts, via
    bounded-memory Misra-Gries candidates + broadcast-semi-join exact
    rescue — the output provably equals the plain groupBy-filter the
    oracle runs (operators/sketches.py::mg_heavy_hitters).

    Measured r5: the sketch's per-batch ``value_counts`` collapse cut
    the 100x wall 8.4-8.7s -> 4.9-5.4s; a distinct-text pile collapse
    ahead of the explode was REJECTED — it shuffles the full text
    strings for nothing on the (typical) mostly-distinct corpus
    (10.0-11.6s at 100x) and only ties the direct plan at 5x pile-up.
    Callers with known-heavy duplication can collapse themselves and
    pass ``weight_col``."""
    toks = load_docs_wide(spark, sf_dir).select(
        F.explode(_text.tokens("text")).alias("tok")
    )
    return mg_heavy_hitters(toks, "tok", k=40)


@_register(
    "doc_langid_confusion",
    f"""WITH {_DOC_CTE},
scored AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM toks),
pred AS (SELECT lang, {_lang_case_sql()} AS pred_lang FROM scored)
SELECT lang, pred_lang, count(*)::BIGINT AS n_docs
FROM pred GROUP BY lang, pred_lang""",
)
def q_doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (labeled lang × predicted lang) —
    the eval harness for the classifier-quality side of corpus
    curation; one extra groupBy over lang_id's scan."""
    return (
        _text.lang_id(load_table(spark, "documents", sf_dir))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@_register(
    "dedup_consensus_pairs",
    f"""WITH tok_h AS (
  SELECT doc_id, (('0x' || substr(md5(tok), 1, 8))::BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents) u),
bs AS (
  SELECT doc_id, j AS bit,
         sum(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok_h, generate_series(0, 31) g(j)
  GROUP BY doc_id, j),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN power(2, bit)::BIGINT ELSE 0 END)::BIGINT
           AS simhash
  FROM bs GROUP BY doc_id),
shp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash))::INT AS hamming
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 4),
pe AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS av, b.embedding AS bv
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
sums AS (
  SELECT vec_a, vec_b,
         sum(av[i]::DOUBLE * bv[i]::DOUBLE) AS dot,
         sum(av[i]::DOUBLE * av[i]::DOUBLE) AS aa,
         sum(bv[i]::DOUBLE * bv[i]::DOUBLE) AS bb
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY vec_a, vec_b),
ep AS (
  SELECT vec_a, vec_b, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS sim
  FROM sums
  WHERE round(dot / (sqrt(aa) * sqrt(bb)), 6) >= 0.4)
SELECT coalesce(s.doc_a, e.vec_a) AS doc_a,
       coalesce(s.doc_b, e.vec_b) AS doc_b,
       s.hamming, e.sim,
       ((s.doc_a IS NOT NULL)::INT + (e.vec_a IS NOT NULL)::INT)
         AS n_signals
FROM shp s FULL OUTER JOIN ep e
  ON s.doc_a = e.vec_a AND s.doc_b = e.vec_b""",
)
def q_dedup_consensus_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup audit: the union of text-signal (SimHash
    Hamming <= 4) and embedding-signal (cosine >= 0.4) candidate
    pairs, with an agreement count — the multi-signal triage view a
    curation pipeline reviews before choosing kill thresholds.
    Reuses both registered pair relations (doc_id and vec_id share
    the corpus id space); FULL OUTER on the (a, b) pair key."""
    shp = REGISTRY["dedup_simhash_pairs"].spark_fn(spark, sf_dir)
    ep = REGISTRY["embedding_neardup_pairs"].spark_fn(spark, sf_dir)
    joined = shp.join(
        ep,
        (shp.doc_a == ep.vec_a) & (shp.doc_b == ep.vec_b),
        "full_outer",
    )
    return joined.select(
        F.coalesce(shp.doc_a, ep.vec_a).alias("doc_a"),
        F.coalesce(shp.doc_b, ep.vec_b).alias("doc_b"),
        "hamming",
        "sim",
        (
            shp.doc_a.isNotNull().cast("int")
            + ep.vec_a.isNotNull().cast("int")
        ).alias("n_signals"),
    )


