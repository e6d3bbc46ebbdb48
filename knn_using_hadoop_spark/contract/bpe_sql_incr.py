"""BPE tokenizer induction, SQL entry path, incremental maintenance + CDC/MERGE.

Split from the former monolithic contract.py (round 3); original lines 3234-3665. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
import os
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.relational import (queries)
from knn_using_hadoop_spark.contract.text_dedup import (
    _EMB_DIM,
    _SIM_QUERY_MOD,
    _sim_queries,
)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# BPE tokenizer induction (SURVEY.md §2.11 north-star: distributed
# subword-vocabulary training over the corpus)
# --------------------------------------------------------------------------
from knn_using_hadoop_spark.operators import bpe as _bpe  # noqa: E402

_BPE_K = 3


@_register("bpe_learn_merges", _bpe.bpe_oracle_sql(_BPE_K, "merges"))
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 3 BPE merge rules from the corpus: per round one
    distributed pair-count aggregate + a 1-row argmax collect
    (iteration control only). Oracle = chained recursive-CTE stages
    implementing the identical left-to-right greedy fold."""
    merges, _ = _bpe.bpe_learn(
        spark, load_table(spark, "documents", sf_dir), k=_BPE_K
    )
    return merges


@_register("bpe_compression_curve", _bpe.bpe_oracle_sql(_BPE_K, "totals"))
def q_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus symbol count after each BPE merge round (round 0 =
    characters) — the compression curve that decides how many merges
    a vocabulary budget buys."""
    _, totals = _bpe.bpe_learn(
        spark, load_table(spark, "documents", sf_dir), k=_BPE_K
    )
    return totals


@_register(
    "bpe_segment_counts",
    _bpe.bpe_oracle_sql(_BPE_K, "merges").replace(
        "SELECT merge_rank, l AS merge_left, r AS merge_right, freq FROM m1"
        " UNION ALL "
        "SELECT merge_rank, l AS merge_left, r AS merge_right, freq FROM m2"
        " UNION ALL "
        "SELECT merge_rank, l AS merge_left, r AS merge_right, freq FROM m3",
        """, tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       FROM documents)
SELECT tok.doc_id, sum(len(sym3.s))::INT AS n_tokens_bpe
FROM tok JOIN sym3 ON sym3.w = tok.w
GROUP BY tok.doc_id""",
    ),
)
def q_bpe_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges (inference
    path: pure row-local fold chain, map-only — no shuffle) and count
    tokens per doc. The oracle segments via the vocabulary table the
    training stages already produced; both sides replay the merges in
    learning order, so the counts agree exactly."""
    docs = load_table(spark, "documents", sf_dir)
    merges_df, _ = _bpe.bpe_learn(spark, docs, k=_BPE_K)
    merges = [
        (r["merge_left"], r["merge_right"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    return _bpe.bpe_segment(docs, merges).select(
        "doc_id", F.col("n_tokens_bpe").cast("int").alias("n_tokens_bpe")
    )


# --------------------------------------------------------------------------
# SQL entry path: spark.sql over parquet files (correlated subqueries,
# EXISTS — the surface the DataFrame queries don't exercise)
# --------------------------------------------------------------------------


@_register(
    "sql_correlated_subquery",
    """SELECT c_nationkey, count(*) AS n_above
FROM customer c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey""",
)
def q_sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL entry path
    (``spark.sql`` on files). Catalyst decorrelates it to an
    aggregate + join — same plan a hand-written window/join would
    give; the point is the SQL surface, which the DataFrame-built
    registry otherwise doesn't exercise."""
    from knn_using_hadoop_spark.sources.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    return spark.sql(
        f"""SELECT c_nationkey, count(*) AS n_above
FROM parquet.`{sf_dir}/customer.parquet` c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal)
                   FROM parquet.`{sf_dir}/customer.parquet` c2
                   WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey"""
    )


@_register(
    "sql_exists_scalar",
    """SELECT n.n_name,
       (SELECT count(*) FROM customer c
        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000)
         AS n_rich
FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_nationkey = n.n_nationkey
                AND c.c_acctbal > 5000)""",
)
def q_sql_exists_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + correlated scalar COUNT through the SQL
    entry path: planned as a semi join + aggregate-left-join, both
    broadcast at dimension scale."""
    from knn_using_hadoop_spark.sources.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    return spark.sql(
        f"""SELECT n.n_name,
       (SELECT count(*) FROM parquet.`{sf_dir}/customer.parquet` c
        WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000)
         AS n_rich
FROM parquet.`{sf_dir}/nation.parquet` n
WHERE EXISTS (SELECT 1 FROM parquet.`{sf_dir}/customer.parquet` c
              WHERE c.c_nationkey = n.n_nationkey
                AND c.c_acctbal > 5000)"""
    )


# --------------------------------------------------------------------------
# Incremental maintenance + CDC compaction (the ingestion-side ops a
# continuously-fed training corpus needs)
# --------------------------------------------------------------------------

_INCR_CUTOFF = "2024-01-20"


@_register(
    "events_incremental_rollup",
    f"""WITH old_part AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
         count(*)::BIGINT AS n, sum(value) AS sv
  FROM events WHERE ts < TIMESTAMP '{_INCR_CUTOFF}'
  GROUP BY 1, 2),
new_part AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
         count(*)::BIGINT AS n, sum(value) AS sv
  FROM events WHERE ts >= TIMESTAMP '{_INCR_CUTOFF}'
  GROUP BY 1, 2)
SELECT day, event_type, sum(n)::BIGINT AS n_events,
       round(sum(sv), 4) AS sum_value
FROM (SELECT * FROM old_part UNION ALL SELECT * FROM new_part) u
GROUP BY day, event_type""",
)
def q_events_incremental_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized
    partial states merged with the new batch's partials — the
    lambda-architecture op that keeps a 100 TB rollup fresh without
    full recompute. count/sum states are mergeable (algebraic aggs);
    the merged result provably equals the full recompute, which is
    exactly what the oracle computes via the same two-part split.
    """
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        )

    old_part = partial(ev.filter(F.col("ts") < cutoff))
    new_part = partial(ev.filter(F.col("ts") >= cutoff))
    return (
        old_part.unionAll(new_part)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("sv"), 4).alias("sum_value"),
        )
    )


@_register(
    "events_upsert_latest",
    """SELECT user_id, event_type AS last_event_type,
       value AS last_value, n_versions
FROM (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk,
         (count(*) OVER (PARTITION BY user_id))::BIGINT AS n_versions
  FROM events) r
WHERE rk = 1""",
)
def q_events_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction / latest-wins upsert: collapse an event stream
    to current state per key (newest row by (ts, event_id)).

    Deliberately NOT one window with an added count-over: a count
    window needs every row per key, which would disable the partial
    top-1 pruning. Instead the top-1 window (WindowGroupLimit: each
    task forwards one candidate per key) joins a separately
    map-side-combined count aggregate — both shuffles key on user_id,
    so the join is co-partitioned. This is the merge-on-read shape of
    a lakehouse MERGE at scale."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )
    versions = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions")
    )
    return latest.join(versions, "user_id")


@_register(
    "events_merge_upsert",
    f"""WITH base AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events WHERE ts < TIMESTAMP '{_INCR_CUTOFF}') r WHERE rk = 1),
d AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events WHERE ts >= TIMESTAMP '{_INCR_CUTOFF}') r WHERE rk = 1),
merged AS (
  SELECT user_id, event_type, value FROM d WHERE event_type <> 'error'
  UNION ALL
  SELECT b.user_id, b.event_type, b.value FROM base b
  WHERE b.user_id NOT IN (SELECT user_id FROM d))
SELECT user_id, event_type AS last_event_type, value AS last_value
FROM merged""",
)
def q_events_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on plain parquet, verified end-to-end through the
    filesystem (VERDICT r2 ask #5 / "What's missing" #1).

    Physically: the pre-cutoff per-user latest state is written as a
    hive-partitioned parquet table (partition col = event_type), the
    post-cutoff latest per user becomes the MERGE source (op = DELETE
    when the user's newest action is an 'error', else UPSERT), and
    ``sinks.merge_into_parquet`` runs the partition-overwrite upsert:
    touched-partition probe, pruned re-read, anti-join + union,
    dynamic-overwrite write, empty-partition cleanup. The returned
    DataFrame is the table READ BACK FROM DISK, so the oracle checks
    the whole physical round-trip — keys that moved partitions
    (user's latest event_type changed) would leave a duplicate twin
    behind if the touched-partition logic were wrong, and deleted
    users would resurrect if empty partitions weren't cleaned.
    """
    from knn_using_hadoop_spark.sources.sinks import merge_into_parquet

    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "value", "event_type")
        )

    base = latest(ev.filter(F.col("ts") < cutoff))
    delta = latest(ev.filter(F.col("ts") >= cutoff))

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = f"/tmp/spark_graft_merge/{tag}/user_state"
    base.write.mode("overwrite").partitionBy("event_type").parquet(path)

    source = delta.withColumn(
        "op",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
            F.lit("U")
        ),
    )
    merge_into_parquet(
        spark, path, source, keys=["user_id"],
        partition_col="event_type", op_col="op",
    )
    return spark.read.parquet(path).select(
        "user_id",
        F.col("event_type").cast("string").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


# --------------------------------------------------------------------------
# Product quantization ANN (compressed scoring; composes with IVF)
# --------------------------------------------------------------------------

# Registry PQ knobs (round 5, VERDICT r4 ask #5). The r1-r4 setting
# m=32/ks=32/iters=1 measured recall@10 = 0.65 on the sf0.01 gate
# corpus; the measured sweep (NOTES r5) found 1-D subspaces with the
# same single Lloyd iteration reach 0.88: at dim=64, m=64 makes each
# subquantizer a SCALAR quantizer (sub-width 1), and ks=64 levels
# per scalar cuts quantization error far faster than extra Lloyd
# rounds on 2-D cells (iters=3 plateaued at 0.69). Storage: 64 codes
# x 6 bits = 48 B/vec vs 256 B float32 — less compressed than the
# old 20 B but retrieval-grade; callers wanting the old point pass
# m/ks explicitly.
_PQ_M_Q = 64
_PQ_KS_Q = 64
_PQ_SUBW = _EMB_DIM // _PQ_M_Q  # = 1

_PQ_CTES = f"""
cb0 AS (SELECT s.sub, e.vec_id AS code, e.embedding AS v
        FROM embeddings e, generate_series(0, {_PQ_M_Q - 1}) s(sub)
        WHERE e.vec_id < {_PQ_KS_Q}),
d0 AS (
  SELECT v.vec_id, cb0.sub, cb0.code,
         round(sum((v.embedding[cb0.sub*{_PQ_SUBW}+i]::DOUBLE - cb0.v[cb0.sub*{_PQ_SUBW}+i]::DOUBLE)
                 * (v.embedding[cb0.sub*{_PQ_SUBW}+i]::DOUBLE - cb0.v[cb0.sub*{_PQ_SUBW}+i]::DOUBLE)),
               6) AS d
  FROM embeddings v, cb0, generate_series(1, {_PQ_SUBW}) g(i)
  GROUP BY v.vec_id, cb0.sub, cb0.code),
a0 AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d, code) AS rn
    FROM d0) r WHERE rn = 1),
comp AS (
  SELECT a0.sub, a0.code, g.i AS pos,
         round(avg(v.embedding[a0.sub*{_PQ_SUBW}+g.i]::DOUBLE), 6) AS a
  FROM a0 JOIN embeddings v ON v.vec_id = a0.vec_id,
       generate_series(1, {_PQ_SUBW}) g(i)
  GROUP BY a0.sub, a0.code, g.i),
cb AS (SELECT sub, code, list(a ORDER BY pos) AS cv
       FROM comp GROUP BY sub, code),
encd AS (
  SELECT v.vec_id, cb.sub, cb.code,
         round(sum((v.embedding[cb.sub*{_PQ_SUBW}+i]::DOUBLE - cb.cv[i])
                 * (v.embedding[cb.sub*{_PQ_SUBW}+i]::DOUBLE - cb.cv[i])), 6) AS d
  FROM embeddings v, cb, generate_series(1, {_PQ_SUBW}) g(i)
  GROUP BY v.vec_id, cb.sub, cb.code),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d, code) AS rn
    FROM encd) r WHERE rn = 1),
qadc AS (
  SELECT q.vec_id AS query_id, cb.sub, cb.code,
         round(sum((q.embedding[cb.sub*{_PQ_SUBW}+i]::DOUBLE - cb.cv[i])
                 * (q.embedding[cb.sub*{_PQ_SUBW}+i]::DOUBLE - cb.cv[i])), 6) AS qd
  FROM embeddings q, cb, generate_series(1, {_PQ_SUBW}) g(i)
  WHERE q.vec_id % {_SIM_QUERY_MOD} = 0
  GROUP BY q.vec_id, cb.sub, cb.code),
adc AS (
  SELECT a.query_id, c.vec_id, round(sum(a.qd), 6) AS adc_dist
  FROM codes c JOIN qadc a ON a.sub = c.sub AND a.code = c.code
  WHERE c.vec_id <> a.query_id
  GROUP BY a.query_id, c.vec_id),
pq_ranked AS (
  SELECT query_id, vec_id, adc_dist,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY adc_dist ASC, vec_id ASC))::INT AS rank
  FROM adc)"""


@_register(
    "similarity_topk_pq",
    f"""WITH {_PQ_CTES}
SELECT query_id, rank, vec_id, adc_dist
FROM pq_ranked WHERE rank <= 10""",
)
def q_similarity_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k: corpus compressed to m scalar codes
    per vector (m=64 x 6-bit codes = 48 B vs 256 B float32), queries
    scored through per-subspace lookup tables. The compression leg of
    the ANN family (brute -> LSH -> IVF -> PQ); composes with the IVF
    cell filter for the full IVFPQ shape. Knob rationale at
    ``_PQ_M_Q`` above (recall@10 0.65 -> 0.88, NOTES r5)."""
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.pq_topk(
        corpus, queries, 10, m=_PQ_M_Q, ks=_PQ_KS_Q, dim=_EMB_DIM,
        iters=1,
    )


@_register(
    "pq_recall_at_10",
    f"""WITH {_PQ_CTES},
pe AS (SELECT e.vec_id, q.vec_id AS query_id, e.embedding AS cv,
              q.embedding AS qv
       FROM embeddings e, embeddings q
       WHERE q.vec_id % {_SIM_QUERY_MOD} = 0 AND e.vec_id <> q.vec_id),
exd AS (
  SELECT query_id, vec_id,
         round(sum((qv[i]::DOUBLE - cv[i]::DOUBLE)
                 * (qv[i]::DOUBLE - cv[i]::DOUBLE)), 6) AS dist
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
ex_ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM exd),
ov AS (
  SELECT p.query_id, count(*) AS n_common
  FROM pq_ranked p JOIN ex_ranked x
    ON x.query_id = p.query_id AND x.vec_id = p.vec_id
  WHERE p.rank <= 10 AND x.rank <= 10
  GROUP BY p.query_id),
qs AS (SELECT vec_id AS query_id FROM embeddings
       WHERE vec_id % {_SIM_QUERY_MOD} = 0)
SELECT round(avg(coalesce(n_common, 0) / 10.0), 6) AS recall_at_10,
       count(*)::BIGINT AS n_queries
FROM qs LEFT JOIN ov USING (query_id)""",
)
def q_pq_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measuring PQ quality gate: recall@10 of the ADC ranking
    against the exact squared-L2 ground truth, averaged over the
    query set — the number that decides whether m/ks are adequate
    before an index ships."""
    corpus, queries = _sim_queries(spark, sf_dir)
    pq = _sim.pq_topk(
        corpus, queries, 10, m=_PQ_M_Q, ks=_PQ_KS_Q, dim=_EMB_DIM,
        iters=1,
    )
    ex = _sim.l2_topk(corpus, queries, 10)
    ov = (
        pq.join(ex, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    qs = queries.select(F.col("vec_id").alias("query_id"))
    return qs.join(ov, "query_id", "left").agg(
        F.round(
            F.avg(F.coalesce(F.col("n_common"), F.lit(0)) / 10.0), 6
        ).alias("recall_at_10"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )


