"""Vocabulary analysis + training-data curation (sampling, quality filtering).

Split from the former monolithic contract.py (round 3); original lines 2100-2753. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.text_dedup import (_EMB_DIM)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Vocabulary analysis
# --------------------------------------------------------------------------


@_register(
    "vocab_top_terms",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
freq AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM tok GROUP BY term)
SELECT term, tf, df FROM (
  SELECT f.*, (row_number() OVER (ORDER BY tf DESC, term ASC))::INT AS rk
  FROM freq f) r
WHERE rk <= 20""",
)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-20 terms by frequency with doc frequency.

    The exploratory first query of any text pipeline; global top-k via
    TakeOrderedAndProject after a two-level aggregate.
    """
    docs = load_docs_wide(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    freq = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # orderBy+limit (not a global row_number window): plans as
    # TakeOrderedAndProject — per-partition partial top-20 merged on
    # the driver, no single-partition sort. The term tie-break makes
    # the ordering total, so the row set matches the oracle's
    # row_number() formulation exactly.
    return (
        freq.orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(20)
        .select("term", "tf", "df")
    )

# --------------------------------------------------------------------------
# Training-data curation: stratified sampling + quality filtering
# --------------------------------------------------------------------------


@_register(
    "stratified_sample",
    f"""WITH h AS (
  SELECT o_orderkey, o_orderpriority,
         ('0x' || substr(md5(o_orderkey || ':strat'), 1, 8))::BIGINT AS hv
  FROM orders)
SELECT o_orderpriority, count(*) AS n_sampled
FROM h
WHERE hv % 100 < CASE o_orderpriority
                   WHEN '1-URGENT' THEN 100
                   WHEN '2-HIGH' THEN 50
                   ELSE 20 END
GROUP BY o_orderpriority""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling (class rebalancing).

    The training-pipeline downsampler: per-stratum keep-rates applied
    via the portable content hash — reproducible across runs/engines
    (unlike ``df.sampleBy``'s RNG), embarrassingly parallel, and the
    keep decision can be recomputed row-locally forever after.
    """
    orders = load_table(spark, "orders", sf_dir)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":strat"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 100)
        .when(F.col("o_orderpriority") == "2-HIGH", 50)
        .otherwise(20)
    )
    return (
        orders.withColumn("hv", hv)
        .filter(F.col("hv") % 100 < rate)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@_register(
    "corpus_quality_filter",
    f"""WITH q AS (
  SELECT doc_id, lang, length(text)::INT AS n_chars,
         round(least(len(string_split(text, ' ')), 100)::DOUBLE / 100.0
           * (1.0 - len(list_filter(string_split(text, ' '),
                        x -> x IN ({", ".join(f"'{s}'" for s in ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'on', 'for', 'that'))})))::DOUBLE
                    / len(string_split(text, ' ')) * 0.5)
           * (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
                    / length(text)), 6) AS quality
  FROM documents),
bounds AS (
  SELECT quantile_cont(n_chars, 0.05)::DOUBLE AS lo,
         quantile_cont(n_chars, 0.99)::DOUBLE AS hi
  FROM q)
SELECT q.doc_id, q.lang, q.n_chars, q.quality
FROM q CROSS JOIN bounds
WHERE q.quality >= 0.3 AND q.n_chars >= bounds.lo AND q.n_chars <= bounds.hi""",
)
def q_corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation: quality threshold + length-percentile trim.

    Composes the quality score with exact-percentile outlier bounds
    (computed over the corpus itself, one broadcast row) — the
    standard 'drop junk + truncate the length tails' cleaning pass.
    """
    from knn_using_hadoop_spark.operators.text import quality_score

    docs = load_table(spark, "documents", sf_dir)
    q = quality_score(docs).select("doc_id", "quality")
    enriched = docs.select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    ).join(q, "doc_id")
    bounds = enriched.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.99)").alias("hi"),
    )
    return (
        enriched.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("quality") >= 0.3)
            & (F.col("n_chars") >= F.col("lo"))
            & (F.col("n_chars") <= F.col("hi"))
        )
        .select("doc_id", "lang", "n_chars", "quality")
    )


@_register(
    "dedup_simhash_pairs",
    """WITH tok_h AS (
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
  FROM bs GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4""",
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance <= 4 over 32-bit sigs.

    All-pairs here (exact audit form); the sub-quadratic scale path
    joins on signature bands (split the 32 bits into 4 bytes: any
    pair within Hamming 4 shares at least one exact byte — pigeonhole)
    before verifying, exactly like the MinHash banding.
    """
    sigs = _dedup.simhash(load_docs_wide(spark, sf_dir))
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb")
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 4)
    )


@_register(
    "stats_agg",
    """SELECT l_returnflag,
       round(avg(l_quantity), 6) AS avg_qty,
       round(stddev_samp(l_quantity), 6) AS std_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag""",
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev / variance / covariance / corr.

    Both engines use single-pass (Welford/M2-style) accumulation whose
    merge order is nondeterministic — rounding absorbs the ulps, same
    protocol as the float sums.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "funnel_conversion",
    """WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT count(*) AS n_users,
       count(t_signup) AS n_signed_up,
       sum(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END)::BIGINT
         AS n_clicked_after_signup,
       sum(CASE WHEN t_purchase > t_click AND t_click > t_signup
                THEN 1 ELSE 0 END)::BIGINT AS n_full_funnel
FROM firsts""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup -> first click -> first purchase, in order.

    One conditional-min aggregate per stage (single shuffle on
    user_id), then ordered-stage counts. NULL first-touch timestamps
    fall out of the > comparisons naturally (3-valued logic) in both
    engines.
    """
    events = load_table(spark, "events", sf_dir)

    def first_ts(t: str):
        return F.min(
            F.when(F.col("event_type") == t, F.col("ts"))
        ).alias(f"t_{t}")

    firsts = events.groupBy("user_id").agg(
        first_ts("signup"), first_ts("click"), first_ts("purchase")
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signed_up"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_signup"), 1).otherwise(0)
        ).alias("n_clicked_after_signup"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )


@_register(
    "rolling_window_range",
    """SELECT event_id, user_id,
       count(*) OVER w AS n_events_1h,
       round(sum(value) OVER w, 4) AS value_1h
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events) e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def q_rolling_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user rolling 1-hour count and sum.

    A true RANGE frame over event-time (microsecond epoch) — unlike a
    ROWS frame, the window widens/narrows with event density. The
    running sum accumulates in frame order, but RANGE frames with
    duplicate ts_us values make per-row sums order-sensitive only
    within exact-timestamp ties (none at microsecond resolution);
    rounding covers the residual.
    """
    events = load_table(spark, "events", sf_dir)
    e = events.select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 4).alias("value_1h"),
    )


from knn_using_hadoop_spark.operators import timeseries as _ts  # noqa: E402


@_register(
    "events_gap_fill_daily",
    """WITH counts AS (
  SELECT user_id, ts::DATE AS day, count(*) AS n_events
  FROM events GROUP BY user_id, ts::DATE),
bounds AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
calendar AS (
  SELECT unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                INTERVAL 1 DAY))::DATE AS day
  FROM bounds),
grid AS (
  SELECT u.user_id, c.day
  FROM (SELECT DISTINCT user_id FROM events) u, calendar c)
SELECT g.user_id, g.day, coalesce(cn.n_events, 0)::BIGINT AS n_events
FROM grid g
LEFT JOIN counts cn ON cn.user_id = g.user_id AND cn.day = g.day""",
)
def q_events_gap_fill_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dense per-user daily counts with missing days zero-filled —
    the calendar gap-fill every time-series pipeline needs (the grid
    comes from tiny aggregates, never from exploding the fact table).
    """
    return _ts.gap_fill_daily(
        load_table(spark, "events", sf_dir), "user_id", "ts"
    )


@_register(
    "events_new_users_daily",
    """SELECT day, count(*) AS n_new
FROM (SELECT user_id, min(ts::DATE) AS day FROM events GROUP BY user_id) f
GROUP BY day""",
)
def q_events_new_users_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-seen cohort sizes per day (new-vs-returning split)."""
    return _ts.new_keys_daily(
        load_table(spark, "events", sf_dir), "user_id", "ts"
    )


@_register(
    "events_multi_rollup",
    """SELECT event_type,
       date_trunc('hour', ts) AS bucket_hour,
       date_trunc('day', ts)::TIMESTAMP AS bucket_day,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY GROUPING SETS (
  (event_type, date_trunc('hour', ts)),
  (event_type, date_trunc('day', ts)::TIMESTAMP))""",
)
def q_events_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups
    of the same fact scan in ONE pass via GROUPING SETS.

    At 100 TB this halves the fact-table reads vs two separate
    rollup jobs: one shared scan feeds an Expand (2 rows per input,
    one per grouping set) and a single shared partial+final aggregate
    (verified: 1 parquet scan, Expand, partial HashAggregate).
    """
    events = load_table(spark, "events", sf_dir)
    events.createOrReplaceTempView("events_mr")
    return spark.sql(
        """SELECT event_type,
       date_trunc('hour', ts) AS bucket_hour,
       date_trunc('day', ts) AS bucket_day,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events_mr
GROUP BY event_type, GROUPING SETS (
  (date_trunc('hour', ts)), (date_trunc('day', ts)))"""
    )


@_register(
    "embedding_label_centroids",
    f"""WITH comp AS (
  SELECT label, g.i, round(avg(embedding[g.i]::DOUBLE), 6) AS av
  FROM embeddings, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY label, g.i),
cents AS (
  SELECT label, list(av ORDER BY i) AS centroid FROM comp GROUP BY label),
sz AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label)
SELECT c.label, s.n_vecs, c.centroid
FROM cents c JOIN sz s ON s.label = c.label""",
)
def q_embedding_label_centroids(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label mean embedding (class prototypes / quantizer
    codebook) via the shared mean_vectors operator."""
    embs = load_table(spark, "embeddings", sf_dir)
    cents = _sim.mean_vectors(embs, "label", "embedding", out_vec="centroid")
    sizes = embs.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return cents.join(sizes, "label").select("label", "n_vecs", "centroid")


@_register(
    "tpch_q5_revenue",
    """SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name""",
)
def q_tpch_q5_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with a LARGE-LARGE fact join.

    lineitem x orders is the one join here that can't broadcast at
    scale — it shuffles on the order key (AQE picks sort-merge /
    shuffled-hash from runtime stats) while supplier/nation/region
    and the date filter broadcast and push down. The Q5 local-supplier
    predicate (s_nationkey = c_nationkey) makes it a genuine multi-way
    constraint, not a star lookup.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "price_histogram",
    """WITH b AS (
  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
  FROM lineitem),
x AS (
  SELECT least(floor((l_extendedprice - mn) / ((mx - mn) / 20)),
               19)::INT AS bucket,
         mn, mx
  FROM lineitem, b)
SELECT bucket,
       round(mn + bucket * ((mx - mn) / 20), 4) AS lo,
       round(mn + (bucket + 1) * ((mx - mn) / 20), 4) AS hi,
       count(*) AS n
FROM x GROUP BY bucket, mn, mx""",
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bucket histogram of l_extendedprice.

    The binning op behind every profiling/EDA pass: global bounds from
    one tiny aggregate (broadcast back), bucket = floor((x-mn)/w)
    clamped to the last bucket — identical float expression order in
    both engines, so bucket edges are bit-exact. One scan + one
    partial+final aggregate; no sort.
    """
    li = load_table(spark, "lineitem", sf_dir)
    b = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    w = (F.col("mx") - F.col("mn")) / F.lit(20)
    bucket = F.least(
        F.floor((F.col("l_extendedprice") - F.col("mn")) / w), F.lit(19)
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.col("mn") + F.col("bucket") * w, 4).alias("lo"),
            F.round(F.col("mn") + (F.col("bucket") + 1) * w, 4).alias("hi"),
            "n",
        )
    )


@_register(
    "feature_zscore",
    """SELECT o_orderkey, o_orderpriority,
       round((o_totalprice - avg(o_totalprice) OVER w)
             / stddev_samp(o_totalprice) OVER w, 6) AS z
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority)""",
)
def q_feature_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization (feature-pipeline staple).

    Whole-partition analytic window (unbounded frame): one shuffle on
    the group key computes mean and stddev and standardizes in the
    same pass — no second scan, no driver-side stats. Rounded to 6dp
    to absorb cross-engine summation-order noise in the moments.
    """
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(
            (F.col("o_totalprice") - F.avg("o_totalprice").over(w))
            / F.stddev_samp("o_totalprice").over(w),
            6,
        ).alias("z"),
    )


@_register(
    "events_category_counts",
    """WITH cat(event_type, category) AS (
  VALUES ('click', 'engagement'), ('view', 'engagement'),
         ('purchase', 'conversion'), ('signup', 'conversion'),
         ('error', 'ops'))
SELECT date_trunc('hour', ts) AS hour_start, category,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events JOIN cat USING (event_type)
GROUP BY date_trunc('hour', ts), category""",
)
def q_events_category_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dimension-enriched hourly rollup — batch twin of the
    stream-static join (``streaming.events.streaming_category_counts``):
    fact join to a broadcast static lookup, then windowed agg."""
    from knn_using_hadoop_spark.streaming.events import EVENT_CATEGORIES

    events = load_table(spark, "events", sf_dir)
    cats = spark.createDataFrame(
        list(EVENT_CATEGORIES), "event_type string, category string"
    )
    return (
        events.join(F.broadcast(cats), "event_type")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "category",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@_register(
    "decimal_exact_totals",
    """SELECT l_returnflag,
       sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2) AS gross,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS net
FROM lineitem GROUP BY l_returnflag""",
)
def q_decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL accounting totals — no float rounding protocol.

    Every other aggregate in the registry rounds doubles to absorb
    summation-order noise; this one casts each INPUT to decimal once
    (the source doubles sit on exact 2dp/6dp grids, so the cast is
    rounding-rule-neutral) and then multiplies and sums entirely in
    fixed-point — bit-exact in any partitioning/order, the correct
    pattern for money at any scale. Casting the double PRODUCT
    per-row instead would diverge: Spark rounds half-up, DuckDB
    half-even, and 60k rows of cent-rounding drift add up.
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(38,2)").alias("gross"),
        F.sum(price * disc).cast("decimal(38,8)").alias("net"),
    )


@_register(
    "orders_cohort_retention",
    """WITH firsts AS (
  SELECT o_custkey, min(date_trunc('month', o_orderdate)::TIMESTAMP)
           AS cohort
  FROM orders GROUP BY o_custkey)
SELECT f.cohort,
       date_diff('month', f.cohort,
                 date_trunc('month', o.o_orderdate)::TIMESTAMP)::INT
         AS months_since,
       count(DISTINCT o.o_custkey) AS n_active
FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
GROUP BY f.cohort, months_since""",
)
def q_orders_cohort_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohort retention matrix: customers active N months after their
    first-order month.

    The standard growth-analytics pivot input: first-seen month per
    key (one aggregate), re-join to facts, distinct-count per
    (cohort, month offset). The distinct agg is the expensive step at
    scale — Spark plans partial distinct aggregation before the final
    shuffle.
    """
    o = load_table(spark, "orders", sf_dir)
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort")
    )
    joined = o.join(firsts, "o_custkey")
    months_since = (
        F.months_between(
            F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
        )
    ).cast("int")
    return joined.groupBy(
        "cohort", months_since.alias("months_since")
    ).agg(F.count_distinct(F.col("o_custkey")).alias("n_active"))


