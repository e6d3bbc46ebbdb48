"""Sequence matching, rank-with-ties, RFM, fuzzy match.

Split from the former monolithic contract.py (round 3); original lines 4067-4774. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.functions.hashing import (  # noqa: E402
    portable_hash64,
)
from knn_using_hadoop_spark.operators import analytics as _an  # noqa: E402
from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.operators import skew as _skew  # noqa: E402
from knn_using_hadoop_spark.operators import text as _text  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.relational import (queries)
from knn_using_hadoop_spark.contract.text_dedup import (
    _DOC_CTE,
    _EMB_DIM,
    _JACCARD_TAIL_SQL,
    _SIM_QUERY_MOD,
    _sim_queries,
)
from knn_using_hadoop_spark.contract.featurization_ann import (
    _IVF_CELLS_SQL,
    _IVF_NC,
)
from knn_using_hadoop_spark.contract.bpe_sql_incr import (
    _PQ_CTES,
    _PQ_KS_Q,
    _PQ_M_Q,
)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Round 2 (cont.): sequence matching, rank-with-ties, RFM, fuzzy match
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators.joins import fuzzy_pairs  # noqa: E402

_WEEK_US = 7 * 86400 * 1_000_000


@_register(
    "events_sequence_match",
    f"""WITH e AS (
  SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS ts_us
  FROM events),
scored AS (
  SELECT event_id, user_id, event_type, ts,  ts_us,
         min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER w
           AS next_purchase_us,
         min(CASE WHEN event_type = 'error' THEN ts_us END) OVER w
           AS next_error_us
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 1 FOLLOWING AND {_WEEK_US} FOLLOWING))
SELECT event_id AS signup_id, user_id, ts AS signup_ts,
       (next_purchase_us IS NOT NULL
        AND (next_error_us IS NULL
             OR next_purchase_us < next_error_us))::INT AS matched,
       CASE WHEN next_purchase_us IS NOT NULL
            AND (next_error_us IS NULL
                 OR next_purchase_us < next_error_us)
            THEN round((next_purchase_us - ts_us) / 3600000000.0, 4)
       END AS hours_to_purchase
FROM scored WHERE event_type = 'signup'""",
)
def q_events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-class sequence pattern with a negative
    condition: signup followed by a purchase within 7 days with NO
    error in between. One RANGE window over event-time epoch
    (microseconds) computes both the next-purchase and next-error
    lookaheads in a single partitioned sort — no self-join, no
    per-user collect."""
    e = load_table(spark, "events", sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, _WEEK_US)
    )
    nxt_p = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts_us"))
    ).over(w)
    nxt_e = F.min(
        F.when(F.col("event_type") == "error", F.col("ts_us"))
    ).over(w)
    scored = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "ts_us",
        nxt_p.alias("next_purchase_us"),
        nxt_e.alias("next_error_us"),
    )
    ok = F.col("next_purchase_us").isNotNull() & (
        F.col("next_error_us").isNull()
        | (F.col("next_purchase_us") < F.col("next_error_us"))
    )
    return scored.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("signup_ts"),
        ok.cast("int").alias("matched"),
        F.when(
            ok,
            F.round(
                (F.col("next_purchase_us") - F.col("ts_us"))
                / 3_600_000_000.0,
                4,
            ),
        ).alias("hours_to_purchase"),
    )


@_register(
    "topk_with_ties",
    """WITH r AS (
  SELECT o_orderpriority, o_orderkey,
         floor(o_totalprice / 1000)::BIGINT AS price_band,
         (rank() OVER (PARTITION BY o_orderpriority
                       ORDER BY floor(o_totalprice / 1000) DESC))::INT
           AS rnk
  FROM orders)
SELECT o_orderpriority, o_orderkey, price_band, rnk
FROM r WHERE rnk <= 3""",
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group with RANK semantics: every row tied into the
    top 3 price bands survives (row_number would arbitrarily cut
    ties). rank() depends only on the ORDER BY values, so ties are
    deterministic without a tie-break key — and the planner still
    derives a WindowGroupLimit partial top-k below the shuffle."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc(F.floor(F.col("o_totalprice") / 1000))
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.floor(F.col("o_totalprice") / 1000).alias("price_band"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@_register(
    "customer_rfm_quartiles",
    """WITH rfm AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*)::BIGINT AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey),
seg AS (
  SELECT c.c_custkey, c.c_mktsegment, r.last_order, r.frequency,
         r.monetary
  FROM rfm r JOIN customer c ON r.o_custkey = c.c_custkey)
SELECT c_custkey, c_mktsegment, frequency, monetary,
       (ntile(4) OVER (PARTITION BY c_mktsegment
                       ORDER BY last_order DESC, c_custkey))::INT AS r_q,
       (ntile(4) OVER (PARTITION BY c_mktsegment
                       ORDER BY frequency DESC, c_custkey))::INT AS f_q,
       (ntile(4) OVER (PARTITION BY c_mktsegment
                       ORDER BY monetary DESC, c_custkey))::INT AS m_q
FROM seg""",
)
def q_customer_rfm_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary,
    quartiled WITHIN market segment — the partitioned form of the
    classic scoring (a global ntile would be a single-partition sort,
    the 100 TB anti-pattern; per-segment windows scale with the
    segment count). Three orders over one partition key = one
    Exchange, three local sorts; ntile ordering is made total with
    the custkey tie-break."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    seg = rfm.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        rfm.o_custkey == F.col("c_custkey"),
    )

    def q(order_cols):
        return F.ntile(4).over(
            Window.partitionBy("c_mktsegment").orderBy(*order_cols)
        )

    return seg.select(
        "c_custkey",
        "c_mktsegment",
        "frequency",
        "monetary",
        q([F.desc("last_order"), F.asc("c_custkey")])
        .cast("int")
        .alias("r_q"),
        q([F.desc("frequency"), F.asc("c_custkey")])
        .cast("int")
        .alias("f_q"),
        q([F.desc("monetary"), F.asc("c_custkey")])
        .cast("int")
        .alias("m_q"),
    )


@_register(
    "part_fuzzy_matches",
    """WITH keyed AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[2] AS blk
  FROM part)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name)::INT AS edit_dist
FROM keyed a JOIN keyed b
  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3""",
)
def q_part_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching: part names within Levenshtein 3,
    candidates limited to the same noun block (second token) — the
    entity-resolution staple as a per-block self-join; unit-cost edit
    distance is integer-exact cross-engine
    (operators/joins.py::fuzzy_pairs)."""
    parts = load_table(spark, "part", sf_dir)
    return fuzzy_pairs(
        parts,
        "p_partkey",
        "p_name",
        block_expr=F.split(F.col("p_name"), " ").getItem(1),
        max_edit=3,
    )


@_register(
    "skew_salted_join",
    """WITH dim AS (
  SELECT DISTINCT l_returnflag, 'flag-' || l_returnflag AS flag_label
  FROM lineitem)
SELECT flag_label, count(*)::BIGINT AS n_rows,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
GROUP BY flag_label""",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join against a pathologically hot key (3 distinct
    values over the whole fact table): the big side is salted by
    partition id, the small side exploded n_salts ways, so the probe
    rows for one hot key spread across n_salts reducers instead of
    one. Result identical to the plain join (the oracle); completes
    the skew family next to skew_salted_agg
    (operators/skew.py::salted_join_big_to_skewed)."""
    li = load_table(spark, "lineitem", sf_dir)
    dim = (
        li.select("l_returnflag")
        .distinct()
        .withColumn(
            "flag_label", F.concat(F.lit("flag-"), F.col("l_returnflag"))
        )
    )
    joined = _skew.salted_join_big_to_skewed(
        li.select("l_returnflag", "l_extendedprice"), dim,
        key="l_returnflag", n_salts=8,
    )
    return joined.groupBy("flag_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@_register(
    "doc_dup_ngram_rate",
    """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
shs AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 4),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                     || t[i+3] || ' ' || t[i+4])) AS shingle
  FROM toks),
ds AS (SELECT DISTINCT doc_id, shingle FROM shs),
dfq AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle)
SELECT doc_id, count(*)::BIGINT AS n_shingles,
       round(avg((df > 1)::INT), 6) AS dup_rate
FROM ds JOIN dfq USING (shingle)
GROUP BY doc_id""",
)
def q_doc_dup_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk score: the fraction of a document's distinct
    word 5-grams that also appear in some OTHER document (doc-
    frequency > 1 over distinct doc-shingle pairs). The per-doc
    number a curation pipeline thresholds before training. Shuffle
    keys are shingles (the df count) then doc_ids (the final agg) —
    both partial-aggregated; nothing is broadcast because an n-gram
    vocabulary at corpus scale isn't broadcastable."""
    ds = _dedup.shingle_sets(load_docs_wide(spark, sf_dir), n=5)
    dfq = ds.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        ds.join(dfq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(F.avg((F.col("df") > 1).cast("int")), 6).alias(
                "dup_rate"
            ),
        )
    )


@_register(
    "dedup_jaccard_prefix_pairs",
    f"""WITH {_DOC_CTE},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ds a JOIN ds b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
{_JACCARD_TAIL_SQL.format(thr=0.5)}""",
)
def q_dedup_jaccard_prefix_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (AllPairs /
    PPJoin): candidates share a rarest-first PREFIX shingle, then
    exact verify — provably equal to the all-pairs join, so the
    oracle is the plain exact SQL (no cap, no probabilistic recall).
    The lossless sub-quadratic leg of the dedup family next to
    freq-capped ngram and MinHash-LSH
    (operators/dedup.py::jaccard_prefix_pairs)."""
    return _dedup.jaccard_prefix_pairs(
        load_docs_wide(spark, sf_dir), threshold=0.5
    )


@_register(
    "data_quality_report",
    """SELECT 'orders_dangling_custkey' AS check_name,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))::BIGINT
         AS n_violations
UNION ALL
SELECT 'documents_dup_doc_id',
       (SELECT count(*) FROM (SELECT doc_id FROM documents
                              GROUP BY doc_id HAVING count(*) > 1) t)
         ::BIGINT
UNION ALL
SELECT 'lineitem_qty_nonpositive',
       (SELECT count(*) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity <= 0)::BIGINT
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       (SELECT count(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1)::BIGINT
UNION ALL
SELECT 'events_value_null_or_negative',
       (SELECT count(*) FROM events
        WHERE value IS NULL OR value < 0)::BIGINT
UNION ALL
SELECT 'events_ts_out_of_range',
       (SELECT count(*) FROM events
        WHERE ts < TIMESTAMP '2020-01-01'
           OR ts >= TIMESTAMP '2030-01-01')::BIGINT""",
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite (the dbt-test / Deequ shape):
    referential integrity via LEFT ANTI join, uniqueness via
    groupBy-HAVING, domain/range checks via conditional counts — one
    (check_name, n_violations) row per constraint. Each check is a
    column-pruned scan-aggregate or a broadcast anti join; violation
    counts, not violating rows, so the result is driver-safe at any
    scale."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    ev = load_table(spark, "events", sf_dir)

    dangling = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(
            F.lit("orders_dangling_custkey").alias("check_name"),
            "n_violations",
        )
    )
    dup_docs = (
        docs.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(
            F.lit("documents_dup_doc_id").alias("check_name"),
            "n_violations",
        )
    )

    def cond_count(name: str, df: DataFrame, cond) -> DataFrame:
        return df.agg(
            F.sum(cond.cast("bigint")).cast("bigint").alias("n_violations")
        ).select(F.lit(name).alias("check_name"), "n_violations")

    qty = cond_count(
        "lineitem_qty_nonpositive",
        li.select("l_quantity"),
        F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0),
    )
    disc = cond_count(
        "lineitem_discount_out_of_range",
        li.select("l_discount"),
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1),
    )
    val = cond_count(
        "events_value_null_or_negative",
        ev.select("value"),
        F.col("value").isNull() | (F.col("value") < 0),
    )
    ts = cond_count(
        "events_ts_out_of_range",
        ev.select("ts"),
        (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
        | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp")),
    )
    return dangling.unionAll(dup_docs).unionAll(qty).unionAll(
        disc
    ).unionAll(val).unionAll(ts)


@_register(
    "doc_bigram_logprob",
    """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bi AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks),
c2 AS (SELECT bg, count(*)::BIGINT AS cnt2 FROM bi GROUP BY bg),
c1 AS (SELECT string_split(bg, ' ')[1] AS w1, count(*)::BIGINT AS cnt1
       FROM bi GROUP BY 1),
vv AS (SELECT count(DISTINCT tok)::BIGINT AS v
       FROM (SELECT unnest(string_split(text, ' ')) AS tok
             FROM documents) u)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln((cnt2 + 1)::DOUBLE / (cnt1 + v)::DOUBLE)), 6)
         AS avg_logprob
FROM bi JOIN c2 USING (bg)
JOIN c1 ON string_split(bi.bg, ' ')[1] = c1.w1, vv
GROUP BY doc_id""",
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM scoring per document: p(w2|w1) =
    (c(w1 w2)+1)/(c(w1·)+V), fit on the corpus itself — the next rung
    of the perplexity-proxy ladder above doc_unigram_logprob.
    Shuffle join on the bigram vocabulary (NOT broadcastable at
    corpus scale), broadcast join on the unigram context counts
    (vocab-sized, always broadcastable)."""
    docs = load_docs_wide(spark, sf_dir)
    bi = _text.exploded_shingles(docs, 2, out="bg")
    c2 = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = (
        bi.select(F.split("bg", " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cnt1"))
    )
    vv = (
        docs.select(F.explode(_text.tokens("text")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    scored = (
        bi.join(c2, "bg")
        .join(F.broadcast(c1), F.split("bg", " ").getItem(0) == F.col("w1"))
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            F.log(
                (F.col("cnt2") + 1).cast("double")
                / (F.col("cnt1") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


@_register(
    "part_entity_resolution",
    """WITH RECURSIVE keyed AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[2] AS blk
  FROM part),
fp AS (
  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
  FROM keyed a JOIN keyed b
    ON a.blk = b.blk AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 3),
edges AS (SELECT id_a AS s, id_b AS t FROM fp
          UNION ALL SELECT id_b, id_a FROM fp),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t),
comp AS (SELECT doc, min(r) AS entity_id FROM reach GROUP BY doc)
SELECT p.p_partkey, coalesce(c.entity_id, p.p_partkey) AS entity_id
FROM part p LEFT JOIN comp c ON p.p_partkey = c.doc""",
)
def q_part_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked fuzzy matching
    (joins.py::fuzzy_pairs) -> O(log n) connected components
    (dedup.py::neardup_components_star) -> canonical entity id per
    part (singletons map to themselves). The match-then-cluster
    composition every MDM/record-linkage pipeline runs."""
    parts = load_table(spark, "part", sf_dir)
    pairs = fuzzy_pairs(
        parts,
        "p_partkey",
        "p_name",
        block_expr=F.split(F.col("p_name"), " ").getItem(1),
        max_edit=3,
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = _dedup.neardup_components_star(pairs)
    return parts.select("p_partkey").join(
        comp, parts.p_partkey == comp.doc_id, "left"
    ).select(
        "p_partkey",
        F.coalesce("component", "p_partkey").alias("entity_id"),
    )


@_register(
    "orders_equidepth_bins",
    """WITH bs AS (
  SELECT quantile_cont(o_totalprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS b
  FROM orders)
SELECT len(list_filter((SELECT b FROM bs),
                       x -> o_totalprice > round(x::DOUBLE, 6)))::INT
         AS bin,
       count(*)::BIGINT AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY bin""",
)
def q_orders_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) binning: one percentile aggregate produces
    the 9 boundaries (a single tiny row, broadcast), then every row's
    bin is a fold over the boundary array — completes the histogram
    family next to the fixed-width price_histogram. Boundaries are
    rounded to the same 6 dp grid on both engines BEFORE comparison
    so binning decisions agree exactly."""
    o = load_table(spark, "orders", sf_dir)
    bounds = o.agg(
        F.expr(
            "percentile(o_totalprice,"
            " array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"
        ).alias("bs")
    )
    binned = o.crossJoin(F.broadcast(bounds)).select(
        "o_totalprice",
        F.aggregate(
            F.transform("bs", lambda x: F.round(x, 6)),
            F.lit(0),
            lambda acc, x: acc
            + (F.col("o_totalprice") > x).cast("int"),
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@_register(
    "embedding_vector_stats",
    """SELECT vec_id,
       len(embedding)::INT AS dim,
       round(sqrt(list_sum(list_transform(embedding,
                                          x -> x::DOUBLE * x::DOUBLE))), 6)
         AS l2_norm,
       round(list_aggregate(list_transform(embedding, x -> x::DOUBLE),
                            'min'), 6) AS min_c,
       round(list_aggregate(list_transform(embedding, x -> x::DOUBLE),
                            'max'), 6) AS max_c,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE))
             / len(embedding), 6) AS mean_c
FROM embeddings""",
)
def q_embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface: per-vector L2 norm, min /
    max / mean component — all computed inside whole-stage codegen
    (transform + aggregate + array_min/max), zero shuffles, zero
    Python. Both engines fold the array left-to-right, so the sums
    are bit-exact before the cosmetic rounding."""
    e = load_table(spark, "embeddings", sf_dir)
    arr = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x * x
    )
    total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.array_min(arr), 6).alias("min_c"),
        F.round(F.array_max(arr), 6).alias("max_c"),
        F.round(total / F.size("embedding"), 6).alias("mean_c"),
    )


@_register(
    "events_scd2_lookup",
    """WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_attr
  FROM events),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_attr IS NULL OR event_type <> prev_attr),
dim AS (
  SELECT user_id, event_type AS attr_value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg),
facts AS (
  SELECT event_id, user_id, ts, round(value, 2) AS value
  FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.ts, f.value, d.attr_value,
       d.valid_from
FROM facts f JOIN dim d
  ON f.user_id = d.user_id
 AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)""",
)
def q_events_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup: each purchase fact joined to the
    SCD2 version valid AT the fact's event time (valid_from <= ts <
    valid_to) — the point-in-time join every warehouse runs against
    versioned dimensions. Equi-join on the natural key with the
    validity range as join filter; composes the scd2_history
    operator with the interval-join machinery."""
    ev = load_table(spark, "events", sf_dir)
    dim = _an.scd2_history(ev).select(
        F.col("user_id").alias("d_user"),
        "attr_value",
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("value")
    )
    return facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select(
        "event_id", "user_id", "ts", "value", "attr_value", "valid_from"
    )


@_register(
    "orders_weighted_sample",
    f"""WITH mx AS (SELECT max(o_totalprice) AS m FROM orders)
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders, mx
WHERE (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT)
        ::DOUBLE / {float(1 << 60)}
      < o_totalprice / m""",
)
def q_orders_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sampling WITHOUT an RNG:
    keep each row iff hash(key)/2^60 < weight/max_weight — inclusion
    probability proportional to o_totalprice, yet fully reproducible
    across engines, retries, and partitionings (the property
    rand()-based sampling loses on every recompute). The same
    hash-threshold trick as the KMV sketch, pointed at sampling."""
    o = load_table(spark, "orders", sf_dir)
    mx = o.agg(F.max("o_totalprice").alias("m"))
    u = portable_hash64(
        F.col("o_orderkey").cast("string")
    ).cast("double") / F.lit(float(1 << 60))
    return (
        o.crossJoin(F.broadcast(mx))
        .filter(u < F.col("o_totalprice") / F.col("m"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


@_register(
    "similarity_topk_ivfpq",
    f"""WITH {_IVF_CELLS_SQL},
{_PQ_CTES},
qc AS (SELECT vec_id AS query_id, cell AS qcell FROM cells
       WHERE vec_id % {_SIM_QUERY_MOD} = 0),
ivfadc AS (
  SELECT a.query_id, a.vec_id, a.adc_dist
  FROM adc a
  JOIN cells cv ON cv.vec_id = a.vec_id
  JOIN qc ON qc.query_id = a.query_id AND qc.qcell = cv.cell),
ranked AS (
  SELECT query_id, vec_id, adc_dist,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY adc_dist ASC, vec_id ASC))::INT
           AS rank
  FROM ivfadc)
SELECT query_id, rank, vec_id, adc_dist FROM ranked WHERE rank <= 10""",
)
def q_similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVFPQ (FAISS's billion-scale index shape): IVF coarse
    cells prune candidates to the query's cell, PQ/ADC scores the
    survivors through m-byte codes — completing the ANN ladder
    (brute -> LSH -> IVF -> IVF+kmeans -> PQ -> IVFPQ) as one
    relational composition (operators/similarity.py::ivfpq_topk)."""
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.ivfpq_topk(
        corpus, queries, 10, n_centroids=_IVF_NC, m=_PQ_M_Q,
        ks=_PQ_KS_Q, dim=_EMB_DIM, iters=1,
    )
