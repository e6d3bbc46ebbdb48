"""Driver-contract query registry: Spark callable + DuckDB oracle per op.

Every operator claimed in SURVEY.md §2 (plus the north-star extension
ops) gets a named entry here: a ``(spark, sf_dir) -> DataFrame``
callable exercising the engine's DataFrame code path, and an
ANSI-SQL twin that DuckDB runs on the same parquet tables. The driver
compares row count + schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* floating aggregates over unordered groups are rounded (sum order is
  nondeterministic across engines; rounding absorbs the ulp noise);
* sequential float expressions (the KNN distance) are written with
  the same left-to-right association in both engines so they are
  bit-exact un-rounded;
* ties are always broken by a unique key so rankings are stable.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.features import assemble_features
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.operators.topk import top_k_per_group
from knn_using_hadoop_spark.sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible (rows-only check)


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle)
        return fn

    return deco


# --------------------------------------------------------------------------
# KNN family (reference parity: SURVEY.md §2 J1, A1-A6, O1-O2)
#
# Feature table: lineitem projected to 4 numeric features + l_linenumber
# as the class label (FIXTURES.md F5). (l_orderkey, l_linenumber) is NOT
# unique in the synthetic data, so row ids come from a deterministic
# row_number over the full feature ordering — mirrored exactly in the
# oracle SQL. Every 100th row is the test set, the rest train; k=3 like
# the reference's run scripts (run-hadoop-*.sh).
# --------------------------------------------------------------------------

KNN_FEATURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_KNN_ORDER = ["l_orderkey", "l_linenumber", *KNN_FEATURES]
KNN_K = 3
KNN_TEST_MOD = 100


def load_docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` spread across all cores before heavy fan-out.

    The sf0.1 documents parquet is ONE input split, so without this
    every shingle/token explode (50-200x per row) runs on a single
    task until the first shuffle. One upfront round-robin shuffle of
    the small source buys full parallelism for the expensive stage —
    measured 2.2x end-to-end on dedup_minhash_lsh_pairs at sf0.1.
    Only used by the explode-heavy queries: for scan-local ops
    (chunking, per-row stats) the added exchange would cost more than
    it saves. At real scale a 100 TB source has thousands of splits
    and needs no such spread.
    """
    return load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )


def knn_tables(
    spark: SparkSession, sf_dir: str, mod: int = KNN_TEST_MOD
) -> tuple[DataFrame, DataFrame]:
    """(train, test) feature tables derived from lineitem.

    Row ids: the synthetic data has no unique key, but full rows ARE
    unique (verified at every SF), so the id is the portable 60-bit
    content hash of the 6 identifying columns — embarrassingly
    parallel (a global ``row_number()`` window would serialize the
    whole table through one partition, the 100 TB anti-pattern) and
    reproduced exactly by the oracle. The hash-mod test split doubles
    as deterministic ~1/mod sampling. Engines print doubles with the
    same shortest-repr rules, so the concatenated key matches.
    """
    li = load_table(spark, "lineitem", sf_dir)
    key = F.concat_ws(",", *[F.col(c).cast("string") for c in _KNN_ORDER])
    base = li.select(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
        .cast("bigint")
        .alias("id"),
        assemble_features(KNN_FEATURES).alias("features"),
        F.col("l_linenumber").cast("int").alias("label"),
    )
    # the single sf0.1 parquet file is ~11MB = one input split; spread
    # the big (train) side so the cross join parallelizes
    par = spark.sparkContext.defaultParallelism
    return (
        base.filter(F.col("id") % mod != 0).repartition(par),
        base.filter(F.col("id") % mod == 0),
    )


# Shared oracle CTEs. The distance expression associates left-to-right,
# matching functions.distance.sq_euclidean's fold order => bit-exact.
_KNN_CTE = f"""
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         (te.f1-tr.f1)*(te.f1-tr.f1) + (te.f2-tr.f2)*(te.f2-tr.f2)
       + (te.f3-tr.f3)*(te.f3-tr.f3) + (te.f4-tr.f4)*(te.f4-tr.f4) AS dist
  FROM test te CROSS JOIN train tr),
knn AS (
  SELECT test_id, rank, train_id, label, dist FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label),
predictions AS (
  SELECT test_id, label AS prediction FROM (
    SELECT v.*, row_number() OVER (PARTITION BY test_id
                                   ORDER BY cnt DESC, label ASC) AS rn
    FROM votes v) q
  WHERE rn = 1)
"""


@_register(
    "knn_neighbors",
    f"WITH {_KNN_CTE} SELECT test_id, rank, train_id, label, dist FROM knn",
)
def q_knn_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = knn_tables(spark, sf_dir)
    return knn_neighbors(train, test, KNN_K, dim=len(KNN_FEATURES))


@_register(
    "knn_vote_histogram",
    f"WITH {_KNN_CTE} SELECT test_id, label, cnt FROM votes",
)
def q_knn_vote_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = knn_tables(spark, sf_dir)
    return knn_vote_histogram(
        knn_neighbors(train, test, KNN_K, dim=len(KNN_FEATURES))
    )


@_register(
    "knn_predict",
    f"WITH {_KNN_CTE} SELECT test_id, prediction FROM predictions",
)
def q_knn_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = knn_tables(spark, sf_dir)
    return knn_predict(train, test, KNN_K, dim=len(KNN_FEATURES))


@_register(
    "knn_accuracy",
    f"""WITH {_KNN_CTE}
SELECT avg(CASE WHEN p.prediction = te.label THEN 1.0 ELSE 0.0 END) AS accuracy
FROM predictions p JOIN test te ON p.test_id = te.id""",
)
def q_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, test = knn_tables(spark, sf_dir)
    truth = test.select("id", "label")
    return knn_accuracy(
        knn_predict(train, test, KNN_K, dim=len(KNN_FEATURES)), truth
    )


# --------------------------------------------------------------------------
# Relational parity ops, generalized (SURVEY.md §2.2-2.7)
# --------------------------------------------------------------------------


@_register(
    "scan_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_quantity > 25""",
)
def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: predicate + computed projection, pushed to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 25)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net_price"
        ),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
    )


@_register(
    "groupby_agg",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag, l_linestatus""",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash agg (A4 generalized)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_register(
    "topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         (row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey))::INT AS rank
  FROM orders) t WHERE rank <= 3""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3/O1 generalized: per-group top-k via WindowGroupLimit."""
    orders = load_table(spark, "orders", sf_dir)
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


@_register(
    "argmax_per_group",
    """SELECT c_nationkey, c_custkey AS top_custkey, c_acctbal AS top_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) t WHERE rn = 1""",
)
def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 generalized: deterministic argmax via max_by over a struct."""
    c = load_table(spark, "customer", sf_dir)
    return c.groupBy("c_nationkey").agg(
        F.max_by(
            F.col("c_custkey"),
            F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("neg")),
        ).alias("top_custkey"),
        F.max("c_acctbal").alias("top_acctbal"),
    )


@_register(
    "join_agg",
    """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 generalized: multi-way equi-join (broadcast dims) + agg."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_register(
    "cross_join",
    "SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 standalone: broadcast nested-loop cross join."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return nation.crossJoin(F.broadcast(region)).select("n_name", "r_name")


@_register(
    "order_by_limit",
    """SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q_order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 + global top-k (TakeOrderedAndProject, no full sort)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@_register(
    "join_anti_semi",
    """SELECT
  (SELECT count(*) FROM customer
   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
   AS n_customers_without_orders,
  (SELECT count(*) FROM customer
   WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
   AS n_customers_with_orders""",
)
def q_join_anti_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (absent in the reference, §2.9 — engine adds them)."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey")
    anti = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    semi = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    return anti.crossJoin(semi)


@_register(
    "set_ops",
    """WITH u AS (SELECT c_nationkey AS nationkey FROM customer
           UNION SELECT s_nationkey FROM supplier),
     i AS (SELECT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier),
     e AS (SELECT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier)
SELECT 'union' AS op, nationkey FROM u
UNION ALL SELECT 'intersect' AS op, nationkey FROM i
UNION ALL SELECT 'except' AS op, nationkey FROM e""",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (engine completeness, §2.9)."""
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
    i = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
    e = c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
    return u.union(i).union(e)


@_register(
    "window_analytics",
    """SELECT o_custkey, o_orderkey,
       (row_number() OVER w)::INT AS seq,
       round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2)
         AS running_spend,
       lag(o_orderkey) OVER w AS prev_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: row_number / running sum / lag (§2.9 gap filled)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("seq"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@_register(
    "distinct_agg",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority""",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_register(
    "rollup_agg",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / rollup (§2.9 gap filled)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_register(
    "events_windowed_agg",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2""",
)
def q_events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window agg (batch twin of the streaming op)."""
    events = load_table(spark, "events", sf_dir)
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


# --------------------------------------------------------------------------
# North-star extension ops (SURVEY.md §2.11): text analysis, dedup,
# similarity search. Shared DuckDB CTEs for tokenized / shingled docs.
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.operators import text as _text  # noqa: E402

_STOP_SQL = ", ".join(f"'{s}'" for s in _text.STOPWORDS)

_DOC_CTE = """
toks AS (SELECT doc_id, text, lang, string_split(text, ' ') AS t
         FROM documents),
shs AS (SELECT doc_id,
               list_transform(generate_series(1, len(t)-2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 AS sh
        FROM toks),
ds AS (SELECT DISTINCT doc_id, shingle FROM
        (SELECT doc_id, unnest(sh) AS shingle FROM shs))
"""

_H32 = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"
_H64 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


@_register(
    "doc_token_stats",
    f"""WITH {_DOC_CTE}
SELECT doc_id, length(text)::INT AS n_chars, len(t)::INT AS n_tokens,
       len(list_distinct(t))::INT AS n_distinct_tokens,
       list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
         / len(t) AS avg_token_len
FROM toks""",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.token_stats(load_table(spark, "documents", sf_dir))


@_register(
    "doc_quality_score",
    f"""WITH {_DOC_CTE}
SELECT doc_id, len(t)::INT AS n_tokens,
  round(len(list_filter(t, x -> x IN ({_STOP_SQL})))::DOUBLE / len(t), 6)
    AS stop_ratio,
  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        ::DOUBLE / length(text), 6) AS punct_ratio,
  round(least(len(t), 100)::DOUBLE / 100.0
        * (1.0 - len(list_filter(t, x -> x IN ({_STOP_SQL})))::DOUBLE
                 / len(t) * 0.5)
        * (1.0 - (length(text)
                  - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 ::DOUBLE / length(text)), 6) AS quality
FROM toks""",
)
def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.quality_score(load_table(spark, "documents", sf_dir))


def _lang_scores_sql() -> str:
    parts = []
    for lang, markers in _text.LANG_MARKERS.items():
        marks = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"len(list_filter(list_distinct(t), x -> x IN ({marks})))"
            f"::INT AS score_{lang}"
        )
    return ", ".join(parts)


def _lang_case_sql() -> str:
    langs = list(_text.LANG_MARKERS)
    whens = []
    for idx, lang in enumerate(langs):
        conds = [f"score_{lang} > 0"]
        for jdx, other in enumerate(langs):
            if jdx < idx:
                conds.append(f"score_{lang} > score_{other}")
            elif jdx > idx:
                conds.append(f"score_{lang} >= score_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


@_register(
    "doc_lang_id",
    f"""WITH {_DOC_CTE},
scored AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM toks)
SELECT doc_id, score_en, score_de, score_fr, score_es,
       {_lang_case_sql()} AS pred_lang, lang,
       ({_lang_case_sql()} = lang)::INT AS is_match
FROM scored""",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.lang_id(load_table(spark, "documents", sf_dir))


@_register(
    "doc_fingerprint",
    f"""WITH {_DOC_CTE}
SELECT toks.doc_id, {_H64.format(x='text')} AS fp64,
       list_aggregate(list_transform(sh, s -> {_H32.format(x='s')}), 'min')
         AS min_shingle_hash
FROM toks JOIN shs ON toks.doc_id = shs.doc_id""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.doc_fingerprint(load_table(spark, "documents", sf_dir))


@_register(
    "dedup_exact",
    f"""SELECT min(doc_id) AS doc_id, fp64, count(*) AS n_copies
FROM (SELECT doc_id, {_H64.format(x='text')} AS fp64,
             (('0x' || substr(md5(text), 17, 15))::BIGINT) AS fp64b
      FROM documents) h
GROUP BY fp64, fp64b""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.dedup_exact(load_table(spark, "documents", sf_dir))


_MINHASH_SQL = f"""
sigs AS (
  SELECT doc_id, j::INT AS h_idx,
         list_aggregate(
           list_transform(sh, s ->
             ({list(_dedup.MINHASH_A)}[j+1] * {_H32.format(x='s')}
              + {list(_dedup.MINHASH_B)}[j+1]) % 2147483647),
           'min') AS minhash
  FROM shs, generate_series(0, {_dedup.NUM_HASHES - 1}) g(j)
  WHERE len(sh) >= 1)
"""


@_register(
    "dedup_minhash_signatures",
    f"WITH {_DOC_CTE}, {_MINHASH_SQL} "
    "SELECT doc_id, h_idx, minhash FROM sigs",
)
def q_dedup_minhash_signatures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.minhash_signatures(
        load_docs_wide(spark, sf_dir)
    )


_JACCARD_TAIL_SQL = """
sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN ds x ON x.doc_id = c.doc_a
  JOIN ds y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b, n_common,
       n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {thr}
"""


_LSH_CAND_SQL = f"""
bands AS (
  SELECT doc_id, h_idx // {_dedup.BAND_ROWS} AS band,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 0 THEN minhash END)
           AS sig0,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 1 THEN minhash END)
           AS sig1
  FROM sigs GROUP BY doc_id, h_idx // {_dedup.BAND_ROWS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig0 = b.sig0 AND a.sig1 = b.sig1
   AND a.doc_id < b.doc_id)
"""


@_register(
    "dedup_minhash_lsh_pairs",
    f"""WITH {_DOC_CTE}, {_MINHASH_SQL}, {_LSH_CAND_SQL},
{_JACCARD_TAIL_SQL.format(thr=0.5)}""",
)
def q_dedup_minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.minhash_lsh_pairs(
        load_docs_wide(spark, sf_dir), threshold=0.5
    )


@_register(
    "dedup_minhash_sigonly_pairs",
    f"""WITH {_DOC_CTE}, {_MINHASH_SQL}, {_LSH_CAND_SQL},
agree AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN x.minhash = y.minhash THEN 1 ELSE 0 END)::BIGINT
           AS n_agree
  FROM cand c
  JOIN sigs x ON x.doc_id = c.doc_a
  JOIN sigs y ON y.doc_id = c.doc_b AND y.h_idx = x.h_idx
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, n_agree,
       n_agree::DOUBLE / {_dedup.NUM_HASHES} AS est_jaccard
FROM agree
WHERE n_agree::DOUBLE / {_dedup.NUM_HASHES} >= 0.5""",
)
def q_dedup_minhash_sigonly_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Signature-only near-dup pairs: the fixed-width-shuffle scale
    path (no O(total shingles) verification re-join)."""
    return _dedup.minhash_sig_est_pairs(
        load_docs_wide(spark, sf_dir), threshold=0.5
    )


@_register(
    "dedup_ngram_jaccard_pairs",
    f"""WITH {_DOC_CTE},
freq AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle),
gen AS (SELECT ds.doc_id, ds.shingle
        FROM ds JOIN freq USING (shingle) WHERE df <= 50),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM gen a JOIN gen b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
{_JACCARD_TAIL_SQL.format(thr=0.5)}""",
)
def q_dedup_ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.ngram_jaccard_pairs(
        load_docs_wide(spark, sf_dir),
        threshold=0.5,
        max_shingle_freq=50,
    )


@_register(
    "dedup_simhash",
    f"""WITH tok_h AS (
  SELECT doc_id, {_H32.format(x='tok')} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents) u),
bs AS (
  SELECT doc_id, j AS bit,
         sum(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok_h, generate_series(0, 31) g(j)
  GROUP BY doc_id, j)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN power(2, bit)::BIGINT ELSE 0 END)::BIGINT
         AS simhash
FROM bs GROUP BY doc_id""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash(load_docs_wide(spark, sf_dir))


_EMB_DIM = 64
_SIM_QUERY_MOD = 50

_SIM_SUMS_SQL = f"""
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % {_SIM_QUERY_MOD} = 0),
pe AS (SELECT e.vec_id, q.query_id, e.embedding AS cv, q.qv
       FROM embeddings e, q WHERE e.vec_id <> q.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (SELECT query_id, vec_id,
                  round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
           FROM sums),
ranked AS (
  SELECT query_id, vec_id, sim,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored)
"""


def _sim_queries(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    embs = load_table(spark, "embeddings", sf_dir)
    return embs, embs.filter(F.col("vec_id") % _SIM_QUERY_MOD == 0)


@_register(
    "similarity_topk",
    f"WITH {_SIM_SUMS_SQL} "
    "SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 10",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.cosine_topk(corpus, queries, 10, _EMB_DIM)


@_register(
    "similarity_classify",
    f"""WITH {_SIM_SUMS_SQL},
votes AS (
  SELECT r.query_id, e.label AS nbr_label, count(*) AS cnt
  FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
  WHERE r.rank <= 5
  GROUP BY r.query_id, e.label)
SELECT query_id, nbr_label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cnt DESC, nbr_label ASC) AS rn
  FROM votes v) t
WHERE rn = 1""",
)
def q_similarity_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.cosine_classify(corpus, queries, 5, _EMB_DIM)


_LSH_SIGN_SQL = (
    "CASE WHEN (('0x' || substr(md5(p || ':' || i), 1, 8))::BIGINT % 2) = 0 "
    "THEN 1.0 ELSE -1.0 END"
)

_LSH_BUCKETS_SQL = f"""
allb AS (
  SELECT vec_id,
         sum(CASE WHEN proj > 0 THEN power(2, p)::BIGINT ELSE 0 END)
           ::BIGINT AS bucket
  FROM (
    SELECT vec_id, p, sum({_LSH_SIGN_SQL} * embedding[i]::DOUBLE) AS proj
    FROM embeddings, generate_series(0, 7) gp(p),
         generate_series(1, {_EMB_DIM}) gi(i)
    GROUP BY vec_id, p) pr
  GROUP BY vec_id)
"""


@_register(
    "similarity_topk_lsh",
    f"""WITH {_LSH_BUCKETS_SQL},
q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
      FROM embeddings e JOIN allb b ON b.vec_id = e.vec_id
      WHERE e.vec_id % {_SIM_QUERY_MOD} = 0),
pe AS (SELECT e.vec_id, q.query_id, e.embedding AS cv, q.qv
       FROM embeddings e
       JOIN allb b ON b.vec_id = e.vec_id
       JOIN q ON q.bucket = b.bucket
       WHERE e.vec_id <> q.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (SELECT query_id, vec_id,
                  round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
           FROM sums)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT s.*, (row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored s) r
WHERE rank <= 5""",
)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket join + exact rerank (scale path).

    Hyperplanes are derived from the portable hash, so the approximate
    candidate set itself is deterministic and oracle-checkable — rare
    for an ANN method.
    """
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.lsh_bucket_topk(corpus, queries, 5, _EMB_DIM)


# --------------------------------------------------------------------------
# Sessionization + multimodal plumbing
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import multimodal as _mm  # noqa: E402


@_register(
    "sessionization",
    """WITH e AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events),
flags AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM e),
sess AS (
  SELECT user_id, event_id, ts,
         (sum(is_new) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW))::BIGINT AS session_id
  FROM flags)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id""",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumsum.

    The batch twin of streaming session_window(); one shuffle on
    user_id serves both window passes and the final aggregate.
    """
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double")
                - F.lag("ts").over(w).cast("double")
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@_register(
    "multimodal_binary_stats",
    """SELECT doc_id, length(text)::BIGINT AS n_bytes,
       list_aggregate(list_transform(string_split_regex(text, ''),
                                     c -> ascii(c)), 'sum')::BIGINT
         AS byte_sum,
       substr(text, 1, 8) AS head8
FROM documents""",
)
def q_multimodal_binary_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary-column plumbing through a real mapInPandas stage.

    The corpus is ASCII, so byte arithmetic on the encoded payload is
    SQL-expressible — the oracle checks the Arrow batch path end to
    end (schema, batching, decode) even though the 'media' is text.
    """
    docs = load_table(spark, "documents", sf_dir)
    return _mm.binary_stats(_mm.attach_binary(docs))


@_register(
    "multimodal_frame_sample",
    """SELECT doc_id,
       unnest(generate_series(0, least(length(text) // 100, 5) - 1))::INT
         AS frame_idx
FROM documents
WHERE length(text) // 100 >= 1""",
)
def q_multimodal_frame_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frame-sampling plumbing (mapInPandas row expansion)."""
    docs = load_table(spark, "documents", sf_dir)
    return _mm.frame_sample(_mm.attach_binary(docs)).select(
        "doc_id", "frame_idx"
    )


@_register(
    "multimodal_decode_stats",
    """WITH b AS (
  SELECT doc_id, length(text)::BIGINT AS len,
         list_transform(string_split_regex(text, ''), c -> ascii(c)) AS bs
  FROM documents),
img AS (
  SELECT doc_id, 'image' AS kind, 16::INT AS width,
         least(len // 16, 32)::INT AS height, 1::INT AS channels,
         NULL::INT AS sample_rate,
         bs[1:16 * least(len // 16, 32)] AS units
  FROM b WHERE doc_id % 2 = 0),
aud AS (
  SELECT doc_id, 'audio' AS kind, NULL::INT AS width, NULL::INT AS height,
         1::INT AS channels, 8000::INT AS sample_rate,
         list_transform(bs[1:least(len, 512)], x -> (x - 128) * 256) AS units
  FROM b WHERE doc_id % 2 = 1),
u AS (SELECT * FROM img UNION ALL SELECT * FROM aud)
SELECT doc_id, kind, width, height, channels, sample_rate,
       len(units)::BIGINT AS n_units,
       list_aggregate(units, 'sum')::BIGINT AS unit_sum,
       list_aggregate(units, 'min')::BIGINT AS unit_min,
       list_aggregate(units, 'max')::BIGINT AS unit_max,
       list_aggregate(units, 'sum')::DOUBLE / len(units) AS mean_unit
FROM u""",
)
def q_multimodal_decode_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL media decode through mapInPandas (VERDICT r2 ask #1).

    attach_media synthesizes genuine BMP (8-bit palettized, bottom-up
    padded raster) and WAV (RIFF chunk stream, PCM16 mono) containers
    from the corpus bytes; decode_media struct-parses the headers and
    payloads back out and emits per-item channel stats. The oracle is
    the byte-arithmetic twin on the original text — if any header
    field, row order, palette offset, or sample scaling were wrong,
    the stats would not match. Plan: Scan -> MapInPandas (encode) ->
    MapInPandas (decode); no shuffle, no row-Python.
    """
    docs = load_table(spark, "documents", sf_dir)
    return _mm.decode_media(_mm.attach_media(docs))


# --------------------------------------------------------------------------
# Engine completeness: JSON, pivot, as-of join, percentiles, string/date
# functions (all absent from the reference, SURVEY.md §2.9 — the new
# engine provides them as first-class relational ops)
# --------------------------------------------------------------------------


@_register(
    "json_extract_agg",
    """SELECT event_type,
       count(*) AS n,
       sum(json_extract_string(props, '$.k')::INTEGER)::BIGINT AS sum_k,
       avg(json_extract_string(props, '$.k')::INTEGER) AS avg_k
FROM events GROUP BY event_type""",
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (events.props) + aggregation."""
    events = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.avg(k).alias("avg_k"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@_register(
    "pivot_event_counts",
    f"""SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       {", ".join(f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY date_trunc('day', ts)""",
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) on a fixed value list."""
    events = load_table(spark, "events", sf_dir)
    piv = (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    # pivot yields NULL for absent combos; align with the oracle's 0s
    return piv.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in _EVENT_TYPES
        ],
    )


@_register(
    "asof_join",
    """WITH ordered AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events WHERE event_type IN ('click', 'purchase'))
SELECT event_id, user_id, ts, last_click_ts
FROM ordered WHERE event_type = 'purchase'""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (each purchase -> the user's most recent prior click).

    Spark has no native as-of join; the idiomatic scale formulation is
    the union-stream + IGNORE NULLS last_value window: one shuffle on
    user_id, no range explosion — versus pd.merge_asof per group
    (applyInPandas) which this avoids entirely.
    """
    events = load_table(spark, "events", sf_dir)
    mixed = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastc = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")),
        ignorenulls=True,
    ).over(w)
    return (
        mixed.withColumn("last_click_ts", lastc)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@_register(
    "percentile_agg",
    """SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25)::DOUBLE, 6) AS p25,
       round(quantile_cont(l_quantity, 0.5)::DOUBLE, 6) AS median,
       round(quantile_cont(l_quantity, 0.75)::DOUBLE, 6) AS p75,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag""",
)
def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation, matching quantile_cont)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "string_date_funcs",
    """SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 8)) AS prio_u,
       concat(o_orderstatus, '-', o_orderpriority) AS tag,
       length(o_orderpriority)::INT AS prio_len,
       year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start
FROM orders WHERE o_orderkey % 10 = 0""",
)
def q_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date scalar function surface (reference has none)."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_u"),
        F.concat_ws(
            "-", F.col("o_orderstatus"), F.col("o_orderpriority")
        ).alias("tag"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


# --------------------------------------------------------------------------
# Skew handling + further text/embedding ops
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import skew as _skew  # noqa: E402


@_register(
    "skew_salted_agg",
    """SELECT o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderpriority""",
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a low-cardinality (hot) key.

    The oracle is the PLAIN aggregate — salting must not change
    results, only the shuffle layout (each hot key fans out over 16
    sub-keys before the final combine).
    """
    orders = load_table(spark, "orders", sf_dir)
    out = _skew.salted_count_sum(
        orders, ["o_orderpriority"], "o_totalprice", n_salts=16
    )
    return out.select(
        "o_orderpriority", "cnt", F.round("total", 2).alias("total")
    )


@_register(
    "doc_bpe_token_count",
    r"""SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::INT AS n_bpe_tokens,
       len(string_split(text, ' '))::INT AS n_ws_tokens
FROM documents""",
)
def q_doc_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace + BPE-ish regex pretokenizer.

    The regex splits letter runs, digit runs, and individual other
    symbols — the shape of a GPT-style pretokenizer (the real BPE
    merge table would then apply within each pretoken; that lookup is
    a dictionary join, not implemented here).
    """
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
            )
        ).alias("n_bpe_tokens"),
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
    )


@_register(
    "embedding_neardup_pairs",
    f"""WITH pe AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS av, b.embedding AS bv
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
sums AS (
  SELECT vec_a, vec_b,
         sum(av[i]::DOUBLE * bv[i]::DOUBLE) AS dot,
         sum(av[i]::DOUBLE * av[i]::DOUBLE) AS aa,
         sum(bv[i]::DOUBLE * bv[i]::DOUBLE) AS bb
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY vec_a, vec_b)
SELECT vec_a, vec_b, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS sim
FROM sums
WHERE round(dot / (sqrt(aa) * sqrt(bb)), 6) >= 0.4""",
)
def q_embedding_neardup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs).

    O(n^2) by construction — correct at corpus sizes where an exact
    audit is wanted; the LSH-bucketed variants (similarity_topk_lsh /
    MLlib) are the sub-quadratic scale path.
    """
    embs = load_table(spark, "embeddings", sf_dir)
    a = embs.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("av")
    )
    b = embs.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("bv")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = F.round(
        _sim._dot_hof(F.col("av"), F.col("bv"))
        / (
            F.sqrt(_sim._sqnorm_hof(F.col("av")))
            * F.sqrt(_sim._sqnorm_hof(F.col("bv")))
        ),
        6,
    )
    return pairs.select("vec_a", "vec_b", sim.alias("sim")).filter(
        F.col("sim") >= 0.4
    )


# --------------------------------------------------------------------------
# Text featurization: hashed TF-IDF + winnowing fingerprints
# --------------------------------------------------------------------------

_TF_DIM = 64


@_register(
    "text_hashed_tfidf",
    f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
bucketed AS (
  SELECT doc_id, {_H32.format(x='tok')} % {_TF_DIM} AS bucket
  FROM tok),
tf AS (
  SELECT doc_id, bucket, count(*) AS tf
  FROM bucketed GROUP BY doc_id, bucket),
df AS (
  SELECT bucket, count(DISTINCT doc_id) AS df FROM bucketed
  GROUP BY bucket),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.bucket, tf.tf,
       round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.bucket = df.bucket CROSS JOIN n""",
)
def q_text_hashed_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed TF-IDF (feature hashing into 64 buckets, portable hash).

    The engine twin of MLlib's HashingTF+IDF, but with the md5-based
    bucket hash so the whole featurization is oracle-checkable.
    Long format (doc_id, bucket, tf, tfidf) — the sparse-vector form
    a downstream distance op consumes directly. ln() is the one
    transcendental in the contract; rounding absorbs libm ulps.
    """
    docs = load_docs_wide(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    bucketed = tok.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % _TF_DIM
        ).alias("bucket"),
    )
    tf = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = bucketed.groupBy("bucket").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    return (
        tf.join(F.broadcast(df_), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "bucket",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@_register(
    "doc_winnow_fingerprints",
    f"""WITH grams AS (
  SELECT doc_id,
         unnest(generate_series(1, length(text) - 7)) AS i,
         text
  FROM documents),
hashed AS (
  SELECT doc_id, i,
         {_H32.format(x="substr(text, i::INT, 8)")} AS h,
         max(i) OVER (PARTITION BY doc_id) AS max_i
  FROM grams),
wins AS (
  SELECT doc_id, i, max_i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed)
SELECT DISTINCT doc_id, fp FROM wins WHERE i <= max_i - 3""",
)
def q_doc_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash, window-min).

    Schleimer/Wilkerson/Aiken winnowing: hash every char 8-gram, keep
    the minimum of each sliding window of 4 hashes, dedupe — a
    compact, position-robust fingerprint set for near-dup and
    containment detection. Pure relational: posexplode + two windows;
    the gram hash is computed once per position (an array formulation
    would re-inline the md5 subtree per window slot).
    """
    docs = load_docs_wide(spark, sf_dir)
    grams = docs.select(
        "doc_id",
        F.posexplode(
            # sequence(1, 0) counts DOWN in Spark — guard short docs
            F.expr(
                "CASE WHEN length(text) >= 8 THEN "
                "transform(sequence(1, length(text) - 7),"
                " i -> substring(text, i, 8)) "
                "ELSE array() END"
            )
        ).alias("pos", "g"),
    )
    hashed = grams.select(
        "doc_id",
        (F.col("pos") + 1).alias("i"),
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    wdoc = Window.partitionBy("doc_id")
    wroll = (
        Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    )
    wins = hashed.select(
        "doc_id",
        "i",
        F.max("i").over(wdoc).alias("max_i"),
        F.min("h").over(wroll).alias("fp"),
    )
    return (
        wins.filter(F.col("i") <= F.col("max_i") - 3)
        .select("doc_id", "fp")
        .distinct()
    )


# --------------------------------------------------------------------------
# IVF approximate nearest neighbors (nprobe=1, corpus-point centroids)
# --------------------------------------------------------------------------

_IVF_NC = 16

_IVF_CELLS_SQL = f"""
cents AS (
  SELECT vec_id AS centroid_id, embedding AS centv
  FROM embeddings ORDER BY vec_id LIMIT {_IVF_NC}),
csums AS (
  SELECT e.vec_id, c.centroid_id,
         sum(e.embedding[i]::DOUBLE * c.centv[i]::DOUBLE) AS dot,
         sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE) AS vv,
         sum(c.centv[i]::DOUBLE * c.centv[i]::DOUBLE) AS cc
  FROM embeddings e, cents c, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY e.vec_id, c.centroid_id),
cells AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (
             PARTITION BY vec_id
             ORDER BY round(dot / (sqrt(vv) * sqrt(cc)), 6) DESC,
                      centroid_id ASC) AS rn
    FROM csums) r
  WHERE rn = 1)
"""


@_register(
    "similarity_topk_ivf",
    f"""WITH {_IVF_CELLS_SQL},
q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, cl.cell
      FROM embeddings e JOIN cells cl ON cl.vec_id = e.vec_id
      WHERE e.vec_id % {_SIM_QUERY_MOD} = 0),
pe AS (SELECT e.vec_id, q.query_id, e.embedding AS cv, q.qv
       FROM embeddings e
       JOIN cells cl ON cl.vec_id = e.vec_id
       JOIN q ON q.cell = cl.cell
       WHERE e.vec_id <> q.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (SELECT query_id, vec_id,
                  round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
           FROM sums)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT s.*, (row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored s) r
WHERE rank <= 5""",
)
def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: cell assignment + same-cell rerank."""
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.ivf_topk(corpus, queries, 5, n_centroids=_IVF_NC)


# IVF with one deterministic Lloyd refinement round and nprobe=2.
# The oracle unrolls the k-means iteration as CTE stages: seed cells
# (a0), refined centroids = round(avg, 6) per component (cents1),
# re-assignment (cells), per-query top-2 cell probes, exact rerank.
# Queries are corpus members, so the probe ranking reuses the a1s
# similarity sums instead of recomputing them.
_IVF_KMEANS_SQL = f"""WITH
cents0 AS (
  SELECT vec_id AS centroid_id, embedding AS centv
  FROM embeddings ORDER BY vec_id LIMIT {_IVF_NC}),
a0s AS (
  SELECT e.vec_id, c.centroid_id,
         sum(e.embedding[i]::DOUBLE * c.centv[i]::DOUBLE) AS dot,
         sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE) AS vv,
         sum(c.centv[i]::DOUBLE * c.centv[i]::DOUBLE) AS cc
  FROM embeddings e, cents0 c, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY e.vec_id, c.centroid_id),
a0 AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(dot / (sqrt(vv) * sqrt(cc)), 6) DESC,
                      centroid_id ASC) AS rn
    FROM a0s) r
  WHERE rn = 1),
cents1 AS (
  SELECT centroid_id, list(av ORDER BY i) AS centv FROM (
    SELECT a.cell AS centroid_id, g.i,
           round(avg(e.embedding[g.i]::DOUBLE), 6) AS av
    FROM a0 a JOIN embeddings e ON e.vec_id = a.vec_id,
         generate_series(1, {_EMB_DIM}) g(i)
    GROUP BY a.cell, g.i) c
  GROUP BY centroid_id),
a1s AS (
  SELECT e.vec_id, c.centroid_id,
         sum(e.embedding[i]::DOUBLE * c.centv[i]) AS dot,
         sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE) AS vv,
         sum(c.centv[i] * c.centv[i]) AS cc
  FROM embeddings e, cents1 c, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY e.vec_id, c.centroid_id),
cells AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY round(dot / (sqrt(vv) * sqrt(cc)), 6) DESC,
                      centroid_id ASC) AS rn
    FROM a1s) r
  WHERE rn = 1),
probes AS (
  SELECT query_id, centroid_id AS cell FROM (
    SELECT s.vec_id AS query_id, s.centroid_id,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY round(s.dot / (sqrt(s.vv) * sqrt(s.cc)), 6) DESC,
                      s.centroid_id ASC) AS rn
    FROM a1s s WHERE s.vec_id % {_SIM_QUERY_MOD} = 0) r
  WHERE rn <= 2),
pe AS (
  SELECT e.vec_id, p.query_id, e.embedding AS cv, qe.embedding AS qv
  FROM embeddings e
  JOIN cells cl ON cl.vec_id = e.vec_id
  JOIN probes p ON p.cell = cl.cell
  JOIN embeddings qe ON qe.vec_id = p.query_id
  WHERE e.vec_id <> p.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (
  SELECT query_id, vec_id,
         round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
  FROM sums)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT s.*, (row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored s) r
WHERE rank <= 5"""


@_register("similarity_topk_ivf_probe", _IVF_KMEANS_SQL)
def q_similarity_topk_ivf_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF ANN, k-means-refined cells + nprobe=2 multi-probe search.

    The real scale path past nprobe=1 (NOTES.md): refined centroids
    fit the data distribution, and probing the 2 nearest cells
    recovers neighbors that sit across a Voronoi boundary.
    """
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.ivf_probe_topk(
        corpus, queries, 5, n_centroids=_IVF_NC, iters=1, nprobe=2
    )


@_register(
    "knn_predict_manhattan",
    f"""WITH
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         abs(te.f1-tr.f1) + abs(te.f2-tr.f2)
       + abs(te.f3-tr.f3) + abs(te.f4-tr.f4) AS dist
  FROM test te CROSS JOIN train tr),
knn AS (
  SELECT test_id, train_id, label FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
SELECT test_id, label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY test_id
                                 ORDER BY cnt DESC, label ASC) AS rn
  FROM votes v) q
WHERE rn = 1""",
)
def q_knn_predict_manhattan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The same KNN pipeline under the pluggable L1 metric."""
    train, test = knn_tables(spark, sf_dir)
    return knn_predict(
        train, test, KNN_K, metric="manhattan", dim=len(KNN_FEATURES)
    )


# --------------------------------------------------------------------------
# k-sweep evaluation (SURVEY.md §2.11: majority-vote classifier with a
# CrossValidator-style hyperparameter sweep, vectorized over k)
# --------------------------------------------------------------------------

_SWEEP_KS = (1, 3, 5)


def _sweep_vote_sql(k: int) -> str:
    return f"""
votes_{k} AS (
  SELECT test_id, label, count(*) AS cnt FROM knn
  WHERE rank <= {k} GROUP BY test_id, label),
pred_{k} AS (
  SELECT test_id, label AS prediction FROM (
    SELECT v.*, row_number() OVER (PARTITION BY test_id
                                   ORDER BY cnt DESC, label ASC) AS rn
    FROM votes_{k} v) q
  WHERE rn = 1),
acc_{k} AS (
  SELECT {k} AS k,
         avg(CASE WHEN p.prediction = te.label THEN 1.0 ELSE 0.0 END)
           AS accuracy
  FROM pred_{k} p JOIN test te ON p.test_id = te.id)"""


@_register(
    "knn_k_sweep",
    "WITH "
    + _KNN_CTE.replace(
        f"rank <= {KNN_K}", f"rank <= {max(_SWEEP_KS)}"
    ).rstrip()
    + ","
    + ",".join(_sweep_vote_sql(k) for k in _SWEEP_KS)
    + " "
    + " UNION ALL ".join(f"SELECT k, accuracy FROM acc_{k}" for k in _SWEEP_KS),
)
def q_knn_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy as a function of k — one neighbor pass, many votes.

    The top-(max k) neighbor relation is computed ONCE; each k's vote
    is a filter + aggregate over it (no re-scan, no re-join). The
    reference would need one full MapReduce job per k.
    """
    train, test = knn_tables(spark, sf_dir)
    nbrs = knn_neighbors(
        train, test, max(_SWEEP_KS), dim=len(KNN_FEATURES)
    )
    truth = test.select(F.col("id").alias("test_id"), "label")
    parts = []
    for k in _SWEEP_KS:
        votes = (
            nbrs.filter(F.col("rank") <= k)
            .groupBy("test_id", F.col("label").alias("nbr_label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pred = votes.groupBy("test_id").agg(
            F.max_by(
                F.col("nbr_label"),
                F.struct(F.col("cnt"), (-F.col("nbr_label")).alias("neg")),
            ).alias("prediction")
        )
        acc = (
            pred.join(truth, "test_id")
            .agg(
                F.avg(
                    (F.col("prediction") == F.col("label")).cast("double")
                ).alias("accuracy")
            )
            .select(F.lit(k).alias("k"), "accuracy")
        )
        parts.append(acc)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# --------------------------------------------------------------------------
# Dedup end-game: components + filtered corpus
# --------------------------------------------------------------------------

_LSH_PAIRS_CTE = f"""{_DOC_CTE}, {_MINHASH_SQL},
bands AS (
  SELECT doc_id, h_idx // {_dedup.BAND_ROWS} AS band,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 0 THEN minhash END)
           AS sig0,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 1 THEN minhash END)
           AS sig1
  FROM sigs GROUP BY doc_id, h_idx // {_dedup.BAND_ROWS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig0 = b.sig0 AND a.sig1 = b.sig1
   AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN ds x ON x.doc_id = c.doc_a
  JOIN ds y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY c.doc_a, c.doc_b),
neardup AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5)
"""


@_register(
    "dedup_components",
    f"""WITH RECURSIVE {_LSH_PAIRS_CTE},
edges AS (SELECT doc_a AS s, doc_b AS t FROM neardup
          UNION ALL SELECT doc_b, doc_a FROM neardup),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t)
SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over verified LSH pairs.

    Spark side: iterative min-label propagation to fixpoint (an
    iterative distributed algorithm — driver controls iteration
    count only). Oracle: recursive-CTE transitive closure. Both
    converge to component = min reachable doc_id.
    """
    docs = load_docs_wide(spark, sf_dir)
    pairs = _dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return _dedup.neardup_components(pairs)


@_register(
    "dedup_filtered_corpus",
    f"""WITH RECURSIVE {_LSH_PAIRS_CTE},
edges AS (SELECT doc_a AS s, doc_b AS t FROM neardup
          UNION ALL SELECT doc_b, doc_a FROM neardup),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t),
comp AS (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN comp ON comp.doc_id = d.doc_id
WHERE comp.doc_id IS NULL OR comp.component = d.doc_id""",
)
def q_dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline end-product: corpus minus near-duplicates.

    Keeps every document that is either not in any near-dup cluster
    or is its cluster's representative (min doc_id) — the standard
    'keep one per cluster' training-data dedup policy.
    """
    docs = load_docs_wide(spark, sf_dir)
    comp = _dedup.neardup_components(
        _dedup.minhash_lsh_pairs(docs, threshold=0.5)
    )
    return (
        docs.join(F.broadcast(comp), "doc_id", "left")
        .filter(
            F.col("component").isNull()
            | (F.col("component") == F.col("doc_id"))
        )
        .select("doc_id", "lang", "source")
    )


# --------------------------------------------------------------------------
# Range join (absent from the reference, §2.9): time-proximity join
# via bucketized equi-join + residual predicate
# --------------------------------------------------------------------------


@_register(
    "range_join_counts",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, count(c.ts) AS clicks_30m_before
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
GROUP BY p.event_id, p.user_id""",
)
def q_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within 30 min before each purchase.

    Spark has no native range join. The naive plan is a per-user
    theta join (quadratic in events-per-user); the scale formulation
    here buckets time into 30-minute cells and equi-joins on
    (user_id, cell) for the purchase's cell and its predecessor, then
    applies the exact range predicate — candidate fan-out is bounded
    by 2 buckets instead of the whole user history. DuckDB's oracle
    uses its native inequality join; results are identical.
    """
    events = load_table(spark, "events", sf_dir)
    bucket_s = 1800
    cell = (F.unix_timestamp("ts") / bucket_s).cast("long")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        cell.alias("cell"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), cell.alias("c_cell")
    )
    # each purchase probes its own cell and the one before
    p2 = p.withColumn(
        "probe_cell", F.explode(F.array(F.col("cell") - 1, F.col("cell")))
    )
    joined = p2.join(
        c,
        (p2.user_id == c.user_id) & (p2.probe_cell == c.c_cell),
        "left",
    ).select(
        "event_id",
        p2.user_id.alias("uid"),
        "p_ts",
        F.when(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
            & (F.col("c_ts") < F.col("p_ts")),
            1,
        ).alias("hit"),
    )
    return (
        joined.groupBy("event_id", F.col("uid").alias("user_id"))
        .agg(F.count("hit").alias("clicks_30m_before"))
    )

# --------------------------------------------------------------------------
# Normalized-feature KNN: min-max scaling from train statistics.
# (z-score would need stddev, whose unordered float sum is not
# bit-reproducible cross-engine; min/max are exact, and the scaling
# expression uses one fixed operand order on both sides.)
# --------------------------------------------------------------------------

_MINMAX_CTE = f"""
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
stats AS (
  SELECT min(f1) AS mn1, max(f1) AS mx1, min(f2) AS mn2, max(f2) AS mx2,
         min(f3) AS mn3, max(f3) AS mx3, min(f4) AS mn4, max(f4) AS mx4
  FROM train),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         ((te.f1-s.mn1)/(s.mx1-s.mn1) - (tr.f1-s.mn1)/(s.mx1-s.mn1))
       * ((te.f1-s.mn1)/(s.mx1-s.mn1) - (tr.f1-s.mn1)/(s.mx1-s.mn1))
       + ((te.f2-s.mn2)/(s.mx2-s.mn2) - (tr.f2-s.mn2)/(s.mx2-s.mn2))
       * ((te.f2-s.mn2)/(s.mx2-s.mn2) - (tr.f2-s.mn2)/(s.mx2-s.mn2))
       + ((te.f3-s.mn3)/(s.mx3-s.mn3) - (tr.f3-s.mn3)/(s.mx3-s.mn3))
       * ((te.f3-s.mn3)/(s.mx3-s.mn3) - (tr.f3-s.mn3)/(s.mx3-s.mn3))
       + ((te.f4-s.mn4)/(s.mx4-s.mn4) - (tr.f4-s.mn4)/(s.mx4-s.mn4))
       * ((te.f4-s.mn4)/(s.mx4-s.mn4) - (tr.f4-s.mn4)/(s.mx4-s.mn4))
           AS dist
  FROM test te CROSS JOIN train tr CROSS JOIN stats s),
knn AS (
  SELECT test_id, train_id, label FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
"""


@_register(
    "knn_predict_minmax",
    f"""WITH {_MINMAX_CTE}
SELECT test_id, label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY test_id
                                 ORDER BY cnt DESC, label ASC) AS rn
  FROM votes v) q
WHERE rn = 1""",
)
def q_knn_predict_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN on min-max-normalized features (train-statistics scaling).

    Unnormalized squared-Euclidean is dominated by l_extendedprice
    (range ~1e5 vs l_tax's 0.08); scaling each feature to [0,1] from
    TRAIN min/max (never test — no leakage) makes all four features
    contribute.

    The stats pass is a one-row driver collect (metadata-scale, like
    the ARFF header read) so the scaling becomes plan-time LITERALS.
    Round 1 joined the 1-row stats relation instead, and the stats
    aggregate + scaling subtree were re-evaluated inside BOTH of the
    prefilter's scoring branches — 15.3s vs ~6s for the same workload
    (VERDICT r1 #3). Same IEEE doubles either way (min/max are exact,
    mx-mn is one double subtraction on either engine), so the oracle
    hash is unchanged.
    """
    train, test = knn_tables(spark, sf_dir)
    s = train.agg(
        *[
            f(F.element_at("features", i + 1)).alias(f"{n}{i}")
            for i in range(len(KNN_FEATURES))
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    ).first()

    def scale(side: DataFrame) -> DataFrame:
        exprs = [
            (F.element_at("features", i + 1) - F.lit(s[f"mn{i}"]))
            / F.lit(s[f"mx{i}"] - s[f"mn{i}"])
            for i in range(len(KNN_FEATURES))
        ]
        return side.select(
            "id", F.array(*exprs).alias("features"), "label"
        )

    return knn_predict(
        scale(train), scale(test), KNN_K, dim=len(KNN_FEATURES)
    )

# --------------------------------------------------------------------------
# Approximate Euclidean KNN with a full oracle: random-projection
# buckets over min-max-scaled features. Projection signs are derived
# from the portable md5 hash at PLAN-BUILD time (hashlib == Spark md5
# == DuckDB md5), and the projection is a fixed-order 4-term sum, so
# the approximate candidate set itself is bit-reproducible — unlike
# MLlib's RNG-seeded BucketedRandomProjectionLSH (operators/
# knn_approx.py), which stays test-verified.
# --------------------------------------------------------------------------

import hashlib as _hashlib

_BKT_PLANES = 2
_BKT_WIDTH = 0.5


def _bkt_sign(p: int, i: int) -> int:
    h = int(_hashlib.md5(f"knn:{p}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _bkt_proj_sql(prefix: str, p: int) -> str:
    terms = []
    for i in range(1, len(KNN_FEATURES) + 1):
        sgn = "+" if _bkt_sign(p, i) > 0 else "-"
        terms.append(
            f"{sgn} ({prefix}.f{i} - s.mn{i}) / (s.mx{i} - s.mn{i})"
        )
    return " ".join(terms)


@_register(
    "knn_predict_bucketed",
    f"""WITH
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
stats AS (
  SELECT min(f1) AS mn1, max(f1) AS mx1, min(f2) AS mn2, max(f2) AS mx2,
         min(f3) AS mn3, max(f3) AS mx3, min(f4) AS mn4, max(f4) AS mx4
  FROM train),
tr_b AS (
  SELECT t.id, t.label,
         (t.f1-s.mn1)/(s.mx1-s.mn1) AS g1, (t.f2-s.mn2)/(s.mx2-s.mn2) AS g2,
         (t.f3-s.mn3)/(s.mx3-s.mn3) AS g3, (t.f4-s.mn4)/(s.mx4-s.mn4) AS g4,
         floor(({_bkt_proj_sql('t', 0)}) / {_BKT_WIDTH})::BIGINT AS b0,
         floor(({_bkt_proj_sql('t', 1)}) / {_BKT_WIDTH})::BIGINT AS b1
  FROM train t CROSS JOIN stats s),
te_b AS (
  SELECT t.id, t.label,
         (t.f1-s.mn1)/(s.mx1-s.mn1) AS g1, (t.f2-s.mn2)/(s.mx2-s.mn2) AS g2,
         (t.f3-s.mn3)/(s.mx3-s.mn3) AS g3, (t.f4-s.mn4)/(s.mx4-s.mn4) AS g4,
         floor(({_bkt_proj_sql('t', 0)}) / {_BKT_WIDTH})::BIGINT AS b0,
         floor(({_bkt_proj_sql('t', 1)}) / {_BKT_WIDTH})::BIGINT AS b1
  FROM test t CROSS JOIN stats s),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         (te.g1-tr.g1)*(te.g1-tr.g1) + (te.g2-tr.g2)*(te.g2-tr.g2)
       + (te.g3-tr.g3)*(te.g3-tr.g3) + (te.g4-tr.g4)*(te.g4-tr.g4) AS dist
  FROM te_b te JOIN tr_b tr ON te.b0 = tr.b0 AND te.b1 = tr.b1),
knn AS (
  SELECT test_id, train_id, label FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
SELECT test_id, label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY test_id
                                 ORDER BY cnt DESC, label ASC) AS rn
  FROM votes v) q
WHERE rn = 1""",
)
def q_knn_predict_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate KNN: random-projection buckets replace the cross join.

    Candidates = train rows sharing BOTH projection buckets with the
    test row (equi-join on (b0, b1) — sub-quadratic, the scale path
    for exact-ish KNN). Projections are fixed-order sums over min-max-
    scaled features, so even this approximate operator is fully
    oracle-checked. Test rows whose bucket holds no train row get no
    prediction (standard LSH recall loss).
    """
    train, test = knn_tables(spark, sf_dir)
    nf = len(KNN_FEATURES)
    # one-row stats collect -> plan-time literals (same rationale and
    # bit-exactness argument as knn_predict_minmax above)
    s = train.agg(
        *[
            f(F.element_at("features", i + 1)).alias(f"{n}{i + 1}")
            for i in range(nf)
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    ).first()

    def prep(side: DataFrame) -> DataFrame:
        scaled = [
            (
                (F.element_at("features", i) - F.lit(s[f"mn{i}"]))
                / F.lit(s[f"mx{i}"] - s[f"mn{i}"])
            ).alias(f"g{i}")
            for i in range(1, nf + 1)
        ]
        x = side.select("id", "label", *scaled)
        for p in range(_BKT_PLANES):
            proj: Column | None = None
            for i in range(1, nf + 1):
                t = F.lit(float(_bkt_sign(p, i))) * F.col(f"g{i}")
                proj = t if proj is None else proj + t
            x = x.withColumn(
                f"b{p}",
                F.floor(proj / F.lit(_BKT_WIDTH)).cast("bigint"),
            )
        return x

    tr = prep(train)
    te = prep(test)
    d: Column | None = None
    for i in range(1, nf + 1):
        t = (F.col(f"te.g{i}") - F.col(f"tr.g{i}")) * (
            F.col(f"te.g{i}") - F.col(f"tr.g{i}")
        )
        d = t if d is None else d + t
    pairs = (
        te.alias("te")
        .join(
            tr.alias("tr"),
            [
                F.col(f"te.b{p}") == F.col(f"tr.b{p}")
                for p in range(_BKT_PLANES)
            ],
        )
        .select(
            F.col("te.id").alias("test_id"),
            F.col("tr.id").alias("train_id"),
            F.col("tr.label").alias("label"),
            d.alias("dist"),
        )
    )
    w = Window.partitionBy("test_id").orderBy(
        F.col("dist").asc(), F.col("train_id").asc()
    )
    knn = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    votes = knn.groupBy("test_id", "label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        votes.groupBy("test_id")
        .agg(
            F.max_by(
                F.col("label"),
                F.struct(F.col("cnt"), (-F.col("label")).alias("neg")),
            ).alias("prediction")
        )
        .orderBy("test_id")
    )

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

_PQ_CTES = f"""
cb0 AS (SELECT s.sub, e.vec_id AS code, e.embedding AS v
        FROM embeddings e, generate_series(0, 31) s(sub)
        WHERE e.vec_id < 32),
d0 AS (
  SELECT v.vec_id, cb0.sub, cb0.code,
         round(sum((v.embedding[cb0.sub*2+i]::DOUBLE - cb0.v[cb0.sub*2+i]::DOUBLE)
                 * (v.embedding[cb0.sub*2+i]::DOUBLE - cb0.v[cb0.sub*2+i]::DOUBLE)),
               6) AS d
  FROM embeddings v, cb0, generate_series(1, 2) g(i)
  GROUP BY v.vec_id, cb0.sub, cb0.code),
a0 AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d, code) AS rn
    FROM d0) r WHERE rn = 1),
comp AS (
  SELECT a0.sub, a0.code, g.i AS pos,
         round(avg(v.embedding[a0.sub*2+g.i]::DOUBLE), 6) AS a
  FROM a0 JOIN embeddings v ON v.vec_id = a0.vec_id,
       generate_series(1, 2) g(i)
  GROUP BY a0.sub, a0.code, g.i),
cb AS (SELECT sub, code, list(a ORDER BY pos) AS cv
       FROM comp GROUP BY sub, code),
encd AS (
  SELECT v.vec_id, cb.sub, cb.code,
         round(sum((v.embedding[cb.sub*2+i]::DOUBLE - cb.cv[i])
                 * (v.embedding[cb.sub*2+i]::DOUBLE - cb.cv[i])), 6) AS d
  FROM embeddings v, cb, generate_series(1, 2) g(i)
  GROUP BY v.vec_id, cb.sub, cb.code),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d, code) AS rn
    FROM encd) r WHERE rn = 1),
qadc AS (
  SELECT q.vec_id AS query_id, cb.sub, cb.code,
         round(sum((q.embedding[cb.sub*2+i]::DOUBLE - cb.cv[i])
                 * (q.embedding[cb.sub*2+i]::DOUBLE - cb.cv[i])), 6) AS qd
  FROM embeddings q, cb, generate_series(1, 2) g(i)
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
    """PQ/ADC approximate top-k: corpus compressed to m=8 codes per
    vector (32x smaller than float32 dim=64), queries scored through
    per-subspace lookup tables. The compression leg of the ANN family
    (brute -> LSH -> IVF -> PQ); composes with the IVF cell filter
    for the full IVFPQ shape."""
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.pq_topk(corpus, queries, 10, dim=_EMB_DIM, iters=1)


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
    pq = _sim.pq_topk(corpus, queries, 10, dim=_EMB_DIM, iters=1)
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
    oracle runs (operators/sketches.py::mg_heavy_hitters)."""
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


# --------------------------------------------------------------------------
# Graph family: co-occurrence edges -> degrees -> triangles -> PageRank
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import graph as _graph  # noqa: E402

_EDGES_SQL = """SELECT a.user_id AS src, b.user_id AS dst
FROM (SELECT m.* FROM
        (SELECT DISTINCT event_type, date_trunc('hour', ts) AS grp_ts,
                user_id
         FROM events) m
      JOIN (SELECT event_type, grp_ts, count(*) AS g
            FROM (SELECT DISTINCT event_type,
                         date_trunc('hour', ts) AS grp_ts, user_id
                  FROM events) x
            GROUP BY event_type, grp_ts) s
        ON m.event_type = s.event_type AND m.grp_ts = s.grp_ts
       AND s.g <= 200) a
JOIN (SELECT m.* FROM
        (SELECT DISTINCT event_type, date_trunc('hour', ts) AS grp_ts,
                user_id
         FROM events) m
      JOIN (SELECT event_type, grp_ts, count(*) AS g
            FROM (SELECT DISTINCT event_type,
                         date_trunc('hour', ts) AS grp_ts, user_id
                  FROM events) x
            GROUP BY event_type, grp_ts) s
        ON m.event_type = s.event_type AND m.grp_ts = s.grp_ts
       AND s.g <= 200) b
  ON a.event_type = b.event_type AND a.grp_ts = b.grp_ts
 AND a.user_id < b.user_id
GROUP BY a.user_id, b.user_id
HAVING count(*) >= 3"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_count=3: repeated co-occurrence only — denoises the graph
    # and keeps density sub-quadratic as the corpus grows (see
    # operators/graph.py::cooccurrence_edges)
    return _graph.cooccurrence_edges(
        load_table(spark, "events", sf_dir), min_count=3
    )


@_register(
    "graph_cooccurrence_edges",
    f"WITH e AS ({_EDGES_SQL}) SELECT src, dst FROM e",
)
def q_graph_cooccurrence_edges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User co-occurrence edge construction (same event_type + day),
    with the g<=200 group cap bounding the O(g^2) pair fan-out — the
    skew guard every 100 TB graph build needs
    (operators/graph.py::cooccurrence_edges)."""
    return _edges(spark, sf_dir)


@_register(
    "graph_degree_distribution",
    f"""WITH e AS ({_EDGES_SQL}),
deg AS (SELECT node, count(*)::BIGINT AS degree
        FROM (SELECT src AS node FROM e
              UNION ALL SELECT dst AS node FROM e) u
        GROUP BY node)
SELECT degree, count(*)::BIGINT AS n_nodes
FROM deg GROUP BY degree""",
)
def q_graph_degree_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree histogram of the co-occurrence graph — two partial-
    aggregated shuffles (node degrees, then histogram)."""
    return (
        _graph.degree_counts(_edges(spark, sf_dir))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )


@_register(
    "graph_triangle_count",
    f"""WITH e AS ({_EDGES_SQL})
SELECT count(*)::BIGINT AS n_triangles
FROM e e1 JOIN e e2 ON e1.dst = e2.src
JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst""",
)
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once triangle counting via the ordered node-iterator
    join (i<j<k; Suri & Vassilvitskii WWW'11) — two equi-joins, no
    vertex runtime (operators/graph.py::triangle_count)."""
    return _graph.triangle_count(_edges(spark, sf_dir))


@_register(
    "graph_pagerank",
    _graph.pagerank_oracle_sql(_EDGES_SQL, iters=3),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, 3 unrolled damped rounds over the undirected edge
    relation; 8 dp per-round rounding keeps the cross-engine CTE twin
    bit-identical round over round (operators/graph.py::pagerank)."""
    return _graph.pagerank(_edges(spark, sf_dir), iters=3)


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
    bi = docs.select(
        "doc_id", F.explode(_text.shingles("text", 2)).alias("bg")
    )
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
        corpus, queries, 10, n_centroids=_IVF_NC, dim=_EMB_DIM, iters=1
    )


# --------------------------------------------------------------------------
# k-fold cross-validation over the exact-KNN flagship
# --------------------------------------------------------------------------

_CV_FOLDS = 3
_CV_SUB_MOD = 16  # deterministic 1/16 subsample: CV is a model-
# selection loop, not a scoring pass — a hash subsample keeps the 3x
# repeated cross join inside the same budget as one flagship run


def _cv_fold_sql(f: int) -> str:
    return f"""pairs{f} AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label, te.label AS truth,
         (te.f1-tr.f1)*(te.f1-tr.f1) + (te.f2-tr.f2)*(te.f2-tr.f2)
       + (te.f3-tr.f3)*(te.f3-tr.f3) + (te.f4-tr.f4)*(te.f4-tr.f4) AS dist
  FROM (SELECT * FROM sub WHERE fold = {f}) te
  CROSS JOIN (SELECT * FROM sub WHERE fold <> {f}) tr),
knn{f} AS (
  SELECT test_id, truth, label FROM (
    SELECT p.*, row_number() OVER (PARTITION BY test_id
                                   ORDER BY dist, train_id) AS rank
    FROM pairs{f} p) r
  WHERE rank <= {KNN_K}),
pred{f} AS (
  SELECT test_id, truth, label AS prediction FROM (
    SELECT test_id, truth, label, count(*) AS cnt
    FROM knn{f} GROUP BY test_id, truth, label) v
  QUALIFY row_number() OVER (PARTITION BY test_id
                             ORDER BY cnt DESC, label ASC) = 1),
acc{f} AS (
  SELECT {f}::INT AS fold, count(*)::BIGINT AS n_test,
         round(avg(CASE WHEN prediction = truth THEN 1.0 ELSE 0.0 END),
               6) AS accuracy
  FROM pred{f})"""


@_register(
    "knn_cv_accuracy",
    f"""WITH base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
sub AS (SELECT *, (id // {_CV_SUB_MOD}) % {_CV_FOLDS} AS fold
        FROM base WHERE id % {_CV_SUB_MOD} = 0),
{",".join(_cv_fold_sql(f) for f in range(_CV_FOLDS))}
SELECT * FROM acc0 UNION ALL SELECT * FROM acc1
UNION ALL SELECT * FROM acc2""",
)
def q_knn_cv_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-fold cross-validation of the exact-KNN flagship: 3 folds
    over a deterministic hash subsample (id % 8 = 0; fold =
    (id div 8) % 3 — no RNG, so folds reproduce across engines and
    retries). Each fold is a full train/predict/score pass of the
    production operator (prefilter and all); output = per-fold
    accuracy, the model-selection loop every ML pipeline runs."""
    train_all, test_all = knn_tables(spark, sf_dir, mod=1)  # mod=1: all
    sub = (
        train_all.unionAll(test_all)
        .filter(F.col("id") % _CV_SUB_MOD == 0)
        .withColumn(
            # integer div, NOT `/`: Spark's `/` is double division and
            # a 60-bit id doesn't fit a double's 53-bit mantissa
            "fold",
            F.expr(f"(id div {_CV_SUB_MOD}) % {_CV_FOLDS}"),
        )
    )
    outs = []
    for f in range(_CV_FOLDS):
        te = sub.filter(F.col("fold") == f).drop("fold")
        tr = sub.filter(F.col("fold") != f).drop("fold")
        # prefilter stays ON: A/B at sf0.01 (best-of-2, controlled)
        # measured 5.9-6.6s with it vs 11.6-12.8s without — even at
        # fold size the window sort it prunes dominates the extra
        # sample/threshold passes
        preds = knn_predict(tr, te, KNN_K, dim=len(KNN_FEATURES))
        truth = te.select("id", "label")
        acc = (
            preds.join(
                truth.select(F.col("id").alias("test_id"), "label"),
                "test_id",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_test"),
                F.round(
                    F.avg(
                        (F.col("prediction") == F.col("label")).cast(
                            "double"
                        )
                    ),
                    6,
                ).alias("accuracy"),
            )
            .select(
                F.lit(f).cast("int").alias("fold"), "n_test", "accuracy"
            )
        )
        outs.append(acc)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@_register(
    "events_user_journey",
    """SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '>')
         AS journey,
       count(*)::BIGINT AS n_events
FROM events GROUP BY user_id""",
)
def q_events_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event sequences (the sequence-modeling /
    journey-analysis prep): collect_list is order-nondeterministic in
    a plain groupBy, so the struct-sort idiom pins it — collect
    (ts, event_id, event_type) structs, sort_array (structs compare
    field-by-field, so (ts, event_id) totally orders), then project
    the types. All inside one aggregate; no window, no second
    shuffle."""
    e = load_table(spark, "events", sf_dir)
    seq = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return e.groupBy("user_id").agg(
        F.array_join(
            F.transform(seq, lambda s: s["event_type"]), ">"
        ).alias("journey"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@_register(
    "events_markov_transitions",
    """WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, next_type, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM trans""",
)
def q_events_markov_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag() pairs consecutive events, the transition counts
    row-normalize via a window sum over the (tiny) prev_type
    partition — the user-behavior model a ranking/anomaly system
    bootstraps from. One partitioned sort + one partial-aggregated
    shuffle."""
    e = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wnorm = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wnorm), 6
        ).alias("p"),
    )


from knn_using_hadoop_spark.functions.zorder import (  # noqa: E402
    morton_code,
    morton_sql,
)

_Z_A = "floor(l_quantity)::BIGINT"
_Z_B = "floor(l_extendedprice / 100)::BIGINT"


@_register(
    "lineitem_zorder_profile",
    f"""WITH z AS (
  SELECT {morton_sql(_Z_A, _Z_B)} AS zcode FROM lineitem)
SELECT (zcode >> 16)::BIGINT AS zprefix, count(*)::BIGINT AS n_rows,
       min(zcode) AS z_lo, max(zcode) AS z_hi
FROM z GROUP BY zprefix""",
)
def q_lineitem_zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering codes over (quantity, price
    bucket): the OPTIMIZE ZORDER layout key, profiled by 16-bit curve
    segment. Pure shift/mask arithmetic in codegen — the code column
    an ingest job would sort by so parquet min/max stats prune on
    BOTH dimensions (functions/zorder.py; write_zordered is the
    layout writer, pytest-verified for bounding-box tightness)."""
    li = load_table(spark, "lineitem", sf_dir)
    z = li.select(
        morton_code(
            F.floor(F.col("l_quantity")),
            F.floor(F.col("l_extendedprice") / 100),
        ).alias("zcode")
    )
    return z.groupBy(
        F.shiftright(F.col("zcode"), 16).alias("zprefix")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("zcode").alias("z_lo"),
        F.max("zcode").alias("z_hi"),
    )


@_register(
    "events_incremental_days",
    """WITH processed AS (
  SELECT DISTINCT ts::DATE AS day FROM events
  WHERE ts < TIMESTAMP '2024-01-20'),
new_days AS (
  SELECT ts::DATE AS day, count(*)::BIGINT AS n_events,
         round(sum(value), 2) AS total_value
  FROM events
  GROUP BY ts::DATE)
SELECT n.day, n.n_events, n.total_value
FROM new_days n
WHERE NOT EXISTS (SELECT 1 FROM processed p WHERE p.day = n.day)""",
)
def q_events_incremental_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch orchestration: aggregate ONLY the day
    partitions not yet in the processed-watermark relation (here: the
    days before Jan 20 stand in for the checkpoint table). The
    anti-join on day keys is tiny and broadcast; at 100 TB this is
    the difference between a nightly full recompute and touching one
    day of partitions — partition pruning does the rest when the
    source is day-partitioned."""
    ev = load_table(spark, "events", sf_dir)
    processed = (
        ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        .select(F.to_date("ts").alias("day"))
        .distinct()
    )
    new_days = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return new_days.join(F.broadcast(processed), "day", "left_anti")


@_register(
    "orders_null_semantics",
    """WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         nullif(o_orderstatus, 'O') AS status_n
  FROM orders)
SELECT o_orderpriority, status_n,
       count(*)::BIGINT AS n,
       sum((status_n IS NOT DISTINCT FROM NULL)::INT)::BIGINT
         AS n_null_safe_eq,
       min(o_orderkey) FILTER (WHERE status_n IS NULL) AS first_null_key
FROM o
GROUP BY o_orderpriority, status_n""",
)
def q_orders_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: nullif-derived nulls grouped AS KEYS
    (both engines group nulls together), null-safe equality (Spark
    <=> == SQL IS NOT DISTINCT FROM), and FILTERed aggregation over
    the null stratum. The cross-engine traps this pins: default null
    SORT order differs between engines (Spark ASC = NULLS FIRST,
    DuckDB = NULLS LAST) so no bare ORDER BY on nullable keys ever
    reaches a contract result — aggregation keys, which agree, do."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("nullif(o_orderstatus, 'O')").alias("status_n"),
    )
    return o.groupBy("o_orderpriority", "status_n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr("cast(status_n <=> NULL as int)")
        ).cast("bigint").alias("n_null_safe_eq"),
        F.min(F.when(F.col("status_n").isNull(), F.col("o_orderkey"))).alias(
            "first_null_key"
        ),
    )


@_register(
    "table_fingerprints",
    f"""SELECT 'orders' AS table_name, count(*)::BIGINT AS n_rows,
       bit_xor(('0x' || substr(md5(o_orderkey || '|' || o_custkey || '|'
               || o_orderstatus || '|' || o_totalprice || '|'
               || o_orderpriority), 1, 15))::BIGINT) AS fingerprint
FROM orders
UNION ALL
SELECT 'customer', count(*)::BIGINT,
       bit_xor(('0x' || substr(md5(c_custkey || '|' || c_name || '|'
               || c_nationkey || '|' || c_acctbal || '|'
               || c_mktsegment), 1, 15))::BIGINT)
FROM customer""",
)
def q_table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprints: XOR of per-row 60-bit
    content hashes — one 8-byte digest per table that any engine can
    reproduce (this repo's own oracle gate, distilled into a single
    number). XOR is commutative/associative with no overflow, so the
    aggregate is partial-combinable and partitioning-independent; a
    migration validates by comparing fingerprints, not rows."""

    def fp(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
        key = F.concat_ws(
            "|", *[F.col(c).cast("string") for c in cols]
        )
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor(portable_hash64(key)).alias("fingerprint"),
        ).select(
            F.lit(name).alias("table_name"), "n_rows", "fingerprint"
        )

    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return fp(
        orders,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    ).unionAll(
        fp(
            cust,
            "customer",
            ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"],
        )
    )


@_register(
    "orders_snapshot_diff",
    """WITH s1 AS (
  SELECT o_orderkey, round(o_totalprice, 0) AS val
  FROM orders WHERE o_orderkey % 7 <> 0),
s2 AS (
  SELECT o_orderkey, round(o_totalprice, 2) AS val
  FROM orders WHERE o_orderkey % 5 <> 0)
SELECT coalesce(s1.o_orderkey, s2.o_orderkey) AS o_orderkey,
       CASE WHEN s1.o_orderkey IS NULL THEN 'added'
            WHEN s2.o_orderkey IS NULL THEN 'removed'
            WHEN s1.val <> s2.val THEN 'changed' END AS status,
       s1.val AS v1, s2.val AS v2
FROM s1 FULL OUTER JOIN s2 ON s1.o_orderkey = s2.o_orderkey
WHERE (CASE WHEN s1.o_orderkey IS NULL THEN 'added'
            WHEN s2.o_orderkey IS NULL THEN 'removed'
            WHEN s1.val <> s2.val THEN 'changed' END) IS NOT NULL""",
)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (added / removed / changed by key) between two
    derived order snapshots — the table-comparison primitive behind
    migration validation and CDC synthesis; only differing keys
    survive the full outer join
    (operators/pipeline.py::table_diff)."""
    o = load_table(spark, "orders", sf_dir)
    s1 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.round("o_totalprice", 0).alias("val")
    )
    s2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("val")
    )
    return _pipeline.table_diff(s1, s2, "o_orderkey", "val")


@_register(
    "events_holt_forecast",
    """WITH daily AS (
  SELECT event_type, ts::DATE AS day, round(sum(value), 2) AS y
  FROM events GROUP BY event_type, ts::DATE),
ser AS (
  SELECT event_type, list(y ORDER BY day) AS ys
  FROM daily GROUP BY event_type),
fold AS (
  SELECT event_type, len(ys)::INT AS n_days,
         list_reduce(
           list_transform(ys, y -> [y::DOUBLE, 0.0::DOUBLE]),
           (acc, x) -> [
             round(0.5*x[1] + 0.5*(acc[1]+acc[2]), 6),
             round(0.3*(round(0.5*x[1] + 0.5*(acc[1]+acc[2]), 6)
                        - acc[1]) + 0.7*acc[2], 6)]) AS lt
  FROM ser)
SELECT event_type, n_days, lt[1] AS level, lt[2] AS trend,
       round(lt[1] + lt[2], 6) AS forecast_next
FROM fold""",
)
def q_events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing per event type over
    the daily-total series, one-step-ahead forecast. The sequential
    recurrence runs as an array fold (collect the ~30-point rounded
    daily series per group, F.aggregate the tail with (level, trend)
    as the accumulator) — per-key state stays inside one task, no
    cross-row dependency leaks into the shuffle. Per-step 6dp
    rounding keeps the fold bit-identical to DuckDB's list_reduce
    twin (same protocol as the iterative-algorithm oracles)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("ys")
    )
    ys = F.col("ys")
    rest = F.slice(ys, F.lit(2), F.greatest(F.size(ys) - 1, F.lit(0)))

    def step(acc, x):
        level = F.round(
            0.5 * x + 0.5 * (acc.getItem(0) + acc.getItem(1)), 6
        )
        trend = F.round(
            0.3 * (level - acc.getItem(0)) + 0.7 * acc.getItem(1), 6
        )
        return F.array(level, trend)

    lt = F.aggregate(
        rest,
        F.array(F.element_at(ys, 1), F.lit(0.0)),
        step,
    )
    return ser.select(
        "event_type",
        F.size(ys).alias("n_days"),
        lt.getItem(0).alias("level"),
        lt.getItem(1).alias("trend"),
        F.round(lt.getItem(0) + lt.getItem(1), 6).alias("forecast_next"),
    )


from knn_using_hadoop_spark.operators import linalg as _linalg  # noqa: E402
from knn_using_hadoop_spark.operators.timeseries import (  # noqa: E402
    rolling_distinct_daily,
)


@_register(
    "tpch_q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       sum(l_quantity::DECIMAL(12,2))::DECIMAL(38,2) AS sum_qty,
       sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2)
         AS sum_base_price,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8)
         AS sum_disc_price,
       sum(l_extendedprice::DECIMAL(18,2)
           * ((1 - l_discount) * (1 + l_tax))::DECIMAL(12,8))
         ::DECIMAL(38,6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(sum(l_extendedprice::DECIMAL(18,2))::DOUBLE / count(*), 6)
         AS avg_price,
       round(sum(l_discount::DECIMAL(9,6))::DOUBLE / count(*), 6)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the pricing summary report — one full scan,
    grouped on two low-cardinality flags, eight aggregates.

    The canonical partial-aggregation showcase: map-side combine
    collapses every partition to <= 6 groups before a 6-row shuffle,
    so the plan's cost is the scan regardless of cluster size. Money
    sums use the decimal-exact protocol (cast each INPUT once — the
    sources sit on 2dp/2dp/2dp grids, so products are exact on a 6dp
    grid and the final scale-6/scale-2 casts never round); averages
    divide an exact decimal sum (as double) by the group count — one
    float op, bit-identical in both engines. avg(l_quantity) needs no
    protocol at all: integer-valued doubles sum exactly in any order.
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    # (1-d)(1+t) sits on an exact 4dp grid, so one scale-8 cast of the
    # double product is exact — and keeps DuckDB's decimal multiply
    # inside int128 (a 3-factor decimal chain overflows its rescaler).
    n = F.count(F.lit(1))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(price * disc1).cast("decimal(38,8)").alias(
                "sum_disc_price"
            ),
            F.sum(
                price
                * (
                    (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax"))
                ).cast("decimal(12,8)")
            )
            .cast("decimal(38,6)")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, 6).alias("avg_price"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(9,6)")).cast(
                    "double"
                )
                / n,
                6,
            ).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@_register(
    "tpch_q3_topn_revenue",
    """SELECT l_orderkey,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def q_tpch_q3_topn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue.

    Both predicates push to the parquet scans; customer broadcasts
    into orders; the surviving orders x lineitem join shuffles on the
    order key. The global top-10 runs as TakeOrderedAndProject
    (per-partition heaps, no global sort). LIMIT makes the result SET
    order-sensitive, so ordering must be cross-engine deterministic:
    revenue is decimal-exact (no float summation noise) and ties
    break on the unique order key.
    """
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(price * disc1).cast("decimal(38,8)").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_register(
    "tpch_q6_promo_revenue",
    """SELECT sum(l_extendedprice::DECIMAL(18,2)
           * l_discount::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24""",
)
def q_tpch_q6_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — a pure scan query.

    Every predicate (date range, discount band, quantity cap) reaches
    the parquet reader as a pushed filter over exactly four read
    columns; the aggregate is a single map-side-combined row per
    partition. At 100 TB with date-partitioned lineitem the date range
    also prunes partitions — the I/O, not the CPU, is the whole query.
    The discount band compares doubles against the same literals in
    both engines (the source grid is exact-representable 0.01 steps,
    so the comparison is unambiguous).
    """
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(9,6)")
        )
        .cast("decimal(38,8)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@_register(
    "tpch_q18_large_orders",
    """WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       total_qty
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20""",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (the HAVING-filtered
    aggregate as a join input).

    The lineitem aggregate runs first and its HAVING clause slashes
    the relation before either join — so the orders join is shuffled
    only on the survivors, and customer broadcasts. total_qty sums
    integer-valued doubles (exact in any order); the top-20 ordering
    is on 2dp o_totalprice with the order key as tiebreak.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@_register(
    "events_rolling_distinct_users",
    """WITH pairs AS (
  SELECT DISTINCT ts::DATE AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM pairs)
SELECT d.day AS day, count(DISTINCT p.user_id) AS users_7d
FROM days d
JOIN pairs p ON p.day <= d.day AND p.day >= d.day - 6
GROUP BY d.day""",
)
def q_events_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing 7-day distinct active users per day — the rolling-
    actives KPI that COUNT(DISTINCT) over a window frame cannot
    express.

    The oracle states the semantics as a range join; the engine runs
    the scale formulation instead (operators/timeseries.py::
    rolling_distinct_daily): dedup to (day, user) pairs, explode each
    pair into the <= 7 later days it counts toward (bounded fan-out),
    broadcast-semi filter to observed days, one distinct-agg keyed by
    day. Pure equi-shuffles — no nested-loop join at any scale.
    """
    ev = load_table(spark, "events", sf_dir)
    return rolling_distinct_daily(ev, key="user_id", window_days=7).select(
        "day", F.col("user_ids_7d").alias("users_7d")
    )


@_register(
    "embedding_covariance",
    f"""WITH flat AS (
  SELECT vec_id, g.i::INT AS i, embedding[g.i]::DOUBLE AS x
  FROM embeddings, generate_series(1, {_EMB_DIM}) g(i)),
m AS (SELECT i, round(avg(x), 6) AS m FROM flat GROUP BY i),
c AS (SELECT vec_id, f.i, x - m.m AS cx
      FROM flat f JOIN m ON m.i = f.i)
SELECT a.i AS i, b.i AS j, round(avg(a.cx * b.cx), 6) AS cov
FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i""",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding corpus — the
    single-pass distributed Gram/covariance primitive behind PCA and
    whitening (operators/linalg.py::covariance_upper).

    The oracle self-joins the exploded relation (fine for DuckDB);
    the engine instead emits each row's d(d+1)/2 centered pair
    products through nested HOF transforms and lets partial
    aggregation collapse every partition to d(d+1)/2 sums — the
    shuffle is O(d^2) per partition, independent of corpus size.
    """
    embs = load_table(spark, "embeddings", sf_dir)
    return _linalg.covariance_upper(embs, "embedding", _EMB_DIM)


@_register(
    "embedding_power_iteration_pc1",
    _linalg.power_iteration_oracle_sql(_EMB_DIM, rounds=3),
)
def q_embedding_power_iteration_pc1(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First principal component of the embedding corpus by 3 rounds
    of power iteration on the (single-pass, 6dp-rounded) covariance
    matrix — distributed iterative linear algebra with the PageRank
    cross-engine protocol: round the renormalized vector to 8 dp every
    round so both engines re-enter each round bit-identical, 6 dp at
    output, sign pinned so v[1] >= 0
    (operators/linalg.py::power_iteration_pc1)."""
    embs = load_table(spark, "embeddings", sf_dir)
    return _linalg.power_iteration_pc1(embs, "embedding", _EMB_DIM, rounds=3)


@_register(
    "events_mad_outliers",
    """WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
wm AS (
  SELECT e.event_id, e.event_type, e.value, med.med
  FROM events e JOIN med ON med.event_type = e.event_type),
mad AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM wm GROUP BY event_type),
scored AS (
  SELECT wm.event_id, wm.event_type, wm.value,
         round(wm.med, 6) AS med, round(mad.mad, 6) AS mad,
         CASE WHEN mad.mad > 0
              THEN round(0.6745 * (wm.value - wm.med) / mad.mad, 6)
         END AS mz
  FROM wm JOIN mad ON mad.event_type = wm.event_type)
SELECT event_id, event_type, value, med, mad, mz
FROM scored WHERE abs(mz) > 3.5""",
)
def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier detection (modified z-score > 3.5) per event
    type — the median-based alternative to `events_rolling_anomaly`'s
    mean/stddev scoring, immune to the outliers it is hunting
    (operators/analytics.py::mad_outliers). Two exact-percentile
    aggregates + broadcast joins back; no window, no sort of the full
    relation."""
    ev = load_table(spark, "events", sf_dir)
    return _an.mad_outliers(ev)


@_register(
    "events_chi2_dayofweek",
    """WITH obs AS (
  SELECT event_type, dayofweek(ts)::INT AS dow,
         count(*)::DOUBLE AS o
  FROM events GROUP BY event_type, dayofweek(ts)),
tot AS (SELECT sum(o) AS n FROM obs),
rows_ AS (SELECT event_type, sum(o) AS rt FROM obs GROUP BY event_type),
cols_ AS (SELECT dow, sum(o) AS ct FROM obs GROUP BY dow)
SELECT obs.event_type, obs.dow, obs.o::BIGINT AS observed,
       round(rows_.rt * cols_.ct / tot.n, 6) AS expected,
       round((obs.o - rows_.rt * cols_.ct / tot.n)
             / sqrt(rows_.rt * cols_.ct / tot.n), 6) AS std_resid
FROM obs
JOIN rows_ ON rows_.event_type = obs.event_type
JOIN cols_ ON cols_.dow = obs.dow
CROSS JOIN tot""",
)
def q_events_chi2_dayofweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence surface: the event_type x day-of-week
    contingency table with expected counts and standardized residuals
    (the per-cell chi-square contributions) — seasonality testing as
    pure relational algebra. One grouped count, two marginal rollups
    of THAT tiny relation (not rescans), broadcast-joined back; every
    input to the float math is an exact integer count, so only output
    rounding is needed. DuckDB's dayofweek == Spark's dayofweek - 1
    (Sunday = 0 vs 1) — aligned explicitly."""
    ev = load_table(spark, "events", sf_dir)
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    exp = F.col("rt") * F.col("ct") / F.col("n")
    return (
        obs.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.col("o").cast("bigint").alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round((F.col("o") - exp) / F.sqrt(exp), 6).alias(
                "std_resid"
            ),
        )
    )


@_register(
    "nation_revenue_share",
    """WITH rev AS (
  SELECT n_name,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name)
SELECT n_name, revenue,
       round(revenue::DOUBLE
             / (sum(revenue) OVER ())::DOUBLE, 6) AS share,
       rank() OVER (ORDER BY revenue DESC)::INT AS rnk
FROM rev""",
)
def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report / contribution analysis: each nation's share of
    total revenue plus its rank — the percent-of-total window pattern.

    The unpartitioned window runs over the ALREADY-AGGREGATED 25-row
    relation, not the fact table — the distinction that makes a
    global window acceptable at any scale (contract.py's own global-
    window warning applies to pre-aggregation relations). Revenue is
    decimal-exact; share divides two exact decimals as doubles — one
    float op, then rounding. rank() on exact decimals needs no
    tiebreak (and inherits determinism from exact revenue).
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
            )
            .cast("decimal(38,8)")
            .alias("revenue")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "revenue",
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(w).cast("double"),
            6,
        ).alias("share"),
        F.rank().over(Window.orderBy(F.col("revenue").desc())).alias(
            "rnk"
        ),
    )


@_register(
    "orders_status_listagg",
    """SELECT o_custkey,
       count(*) AS n_orders,
       string_agg(o_orderstatus || ':' || o_orderkey, ','
                  ORDER BY o_orderkey) AS order_log
FROM orders WHERE o_custkey % 100 = 0
GROUP BY o_custkey""",
)
def q_orders_status_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg) — the audit-
    log rollup. collect_list order is nondeterministic under parallel
    aggregation, so the engine collects (key, text) structs and
    array_sorts BEFORE joining — same protocol as events_user_journey;
    the oracle's string_agg(... ORDER BY) is its SQL-native twin."""
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_custkey") % 100 == 0
    )
    entry = F.struct(
        F.col("o_orderkey").alias("k"),
        F.concat_ws(":", "o_orderstatus", "o_orderkey").alias("s"),
    )
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)),
                lambda e: e.getField("s"),
            ),
            ",",
        ).alias("order_log"),
    )


@_register(
    "customer_name_parse",
    """SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)$', 1) AS id_str,
       try_cast(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
         AS id_num,
       (try_cast(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT)
        = c_custkey) AS id_matches,
       regexp_matches(c_name, '^Customer#[0-9]{9}$') AS well_formed
FROM customer WHERE c_custkey % 7 = 0""",
)
def q_customer_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + validation surface (regexp_extract with a
    capture group, anchored regexp match, try_cast) — the schema-on-
    read parsing every ingest pipeline does. The regex dialect subset
    here (anchors, classes, quantifiers, groups) behaves identically
    in Spark's Java regex and DuckDB's RE2."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_custkey") % 7 == 0
    )
    id_str = F.regexp_extract("c_name", r"([0-9]+)$", 1)
    id_num = id_str.try_cast("bigint")
    return c.select(
        "c_custkey",
        id_str.alias("id_str"),
        id_num.alias("id_num"),
        (id_num == F.col("c_custkey")).alias("id_matches"),
        F.col("c_name").rlike(r"^Customer#[0-9]{9}$").alias(
            "well_formed"
        ),
    )


@_register(
    "orders_conditional_agg",
    """SELECT o_orderpriority,
       count(*) AS n,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       sum(o_totalprice::DECIMAL(18,2))
         FILTER (WHERE o_orderstatus = 'F')::DECIMAL(38,2)
         AS finished_value,
       round(count(*) FILTER (WHERE o_orderstatus = 'F')
             / count(*)::DOUBLE, 6) AS finished_rate
FROM orders GROUP BY o_orderpriority""",
)
def q_orders_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause) — pivot-lite KPI
    rollups in one scan. Spark expresses FILTER as count/sum over
    CASE; both collapse to the same partial-aggregated single pass.
    The decimal sum FILTER returns NULL (not 0) for empty groups in
    both engines."""
    o = load_table(spark, "orders", sf_dir)
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(fin, 1)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias(
            "n_big"
        ),
        F.sum(
            F.when(fin, F.col("o_totalprice").cast("decimal(18,2)"))
        )
        .cast("decimal(38,2)")
        .alias("finished_value"),
        F.round(
            F.count(F.when(fin, 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("finished_rate"),
    )


@_register(
    "events_session_running_spend",
    """WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))
              > 1800 OR lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events),
sess AS (
  SELECT *, sum(is_start) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM marked)
SELECT user_id, session_no, event_id, ts,
       round(sum(value) OVER
         (PARTITION BY user_id, session_no ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING), 6) AS running_spend
FROM sess WHERE user_id % 50 = 0""",
)
def q_events_session_running_spend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conditional-reset cumulative sum: a running total that resets
    at every session boundary (30-min gap) — the classic 'cumulative
    sum with reset' that needs session numbering first (gap flag →
    running count of flags → cumsum within (user, session)).

    All three windows share ONE partitioning ancestry (user_id, then
    user_id+session_no which Catalyst satisfies with a local re-sort,
    no second Exchange). The user filter pushes below every window to
    the scan because it is on the partition key — pruning-compatible
    analytics."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 50 == 0
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(wu).cast(
        "double"
    )
    is_start = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    marked = ev.select(
        "user_id", "event_id", "ts", "value", is_start.alias("is_start")
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("is_start").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sess.select(
        "user_id",
        "session_no",
        "event_id",
        "ts",
        F.round(F.sum("value").over(ws), 6).alias("running_spend"),
    )


from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    kmv_jaccard_oracle_sql,
    kmv_jaccard_pairs,
)


@_register(
    "events_user_jaccard_kmv",
    kmv_jaccard_oracle_sql("events", "event_type", "user_id::VARCHAR", 64),
)
def q_events_user_jaccard_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap (Jaccard) estimates between event
    types from mergeable KMV sketches — deterministic sketch algebra
    with a bit-exact oracle (operators/sketches.py::
    kmv_jaccard_pairs). The only corpus-sized pass is the per-group
    k-smallest (partial top-k below the shuffle); the pairwise stage
    touches <= k rows per group, so adding groups scales as
    O(pairs * k), never as set sizes."""
    return kmv_jaccard_pairs(
        load_table(spark, "events", sf_dir), "event_type", "user_id", k=64
    )


@_register(
    "tpch_q10_returned_items",
    """SELECT c_custkey, c_name,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items in a two-quarter window.

    The returnflag and date-range predicates push to the lineitem and
    orders scans before the fact-fact shuffle join on the order key;
    nation broadcasts. The per-customer aggregate then ranks via
    TakeOrderedAndProject (decimal-exact revenue ordering, unique
    custkey tiebreak) — never a global sort of all customers.
    """
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(price * disc1).cast("decimal(38,8)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "tpch_q14_promo_share",
    """SELECT (year(l_shipdate) * 100 + month(l_shipdate))::INT AS ym,
       coalesce(sum(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice::DECIMAL(18,2)
                  * (1 - l_discount)::DECIMAL(9,6) END),
           0)::DECIMAL(38,8) AS promo_revenue,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       round(coalesce(sum(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice::DECIMAL(18,2)
                        * (1 - l_discount)::DECIMAL(9,6) END),
                 0)::DOUBLE
             / sum(l_extendedprice::DECIMAL(18,2)
                   * (1 - l_discount)::DECIMAL(9,6))::DOUBLE,
             6) AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY ym""",
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO parts.

    part broadcasts into the lineitem scan (dimension ~1/300 of the
    fact at any SF — at 100 TB the part side is still MBs after
    projecting (p_partkey, p_type)); the month rollup partially
    aggregates map-side. Both revenue columns are decimal-exact; the
    share is the one float op, then rounded. The conditional-agg CASE
    collapses to a single pass — no second join or self-union.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    promo = F.when(F.col("p_type") == "PROMO", price * disc1)
    zero = F.lit(0).cast("decimal(38,8)")
    promo_rev = F.coalesce(F.sum(promo).cast("decimal(38,8)"), zero)
    rev = F.sum(price * disc1).cast("decimal(38,8)")
    ym = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(ym)
        .agg(
            promo_rev.alias("promo_revenue"),
            rev.alias("revenue"),
            F.round(
                promo_rev.cast("double") / rev.cast("double"), 6
            ).alias("promo_share"),
        )
    )


@_register(
    "tpch_q16_supplier_counts",
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)
def q_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding a supplier denylist (negative balance stands in
    for the reference's complaint-comment filter; the synthetic
    supplier table has no comment column).

    The denylist is a broadcast ANTI join (NOT IN with guaranteed
    non-null keys = anti semantics); part attribute predicates push
    to the broadcast-side scan. COUNT(DISTINCT) expands to the
    two-phase partial-distinct aggregate: dedup on (bucket, suppkey)
    shuffles first, so the wide shuffle carries already-deduped rows.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q19_disjunctive_revenue",
    """SELECT sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 11 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 26 AND 50
       AND l_quantity BETWEEN 20 AND 35)""",
)
def q_tpch_q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    predicate mixing join-side columns.

    The canonical disjunctive-pushdown test: Catalyst factors the
    lineitem-only disjunction l_quantity BETWEEN 1 AND 35 out of the
    OR and pushes it to the fact scan (so the join never sees rows no
    branch can accept), and p_size BETWEEN 1 AND 50 likewise to the
    part side; the residual mixed OR evaluates post-join. part
    broadcasts — the whole query is one fact scan, zero shuffles.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & sz.between(1, 10)
            & q.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & sz.between(11, 25)
            & q.between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & sz.between(26, 50)
            & q.between(20, 35)
        )
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(price * disc1).cast("decimal(38,8)").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "tpch_q22_dormant_customers",
    """WITH thr AS (
  SELECT round(avg(c_acctbal), 2) AS avg_bal
  FROM customer
  WHERE c_acctbal > 0 AND c_custkey % 10 IN (1, 3, 5, 7, 9))
SELECT (c_custkey % 10)::INT AS bucket,
       count(*) AS n_custs,
       round(sum(c_acctbal), 4) AS total_bal
FROM customer, thr
WHERE c_custkey % 10 IN (1, 3, 5, 7, 9)
  AND c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY bucket""",
)
def q_tpch_q22_dormant_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered
    (custkey bucket stands in for the reference's phone-prefix
    country code — the synthetic customer table has no phone).

    The scalar threshold is a 1-row aggregate broadcast-cross-joined
    into the filter (Catalyst plans DuckDB's correlated-free scalar
    subquery the same way). The no-orders test is a shuffle-free
    broadcast... no — orders is the BIG side, so the anti join
    shuffles on custkey; at 100 TB you'd pre-project orders to its
    distinct custkeys (already grouped by the same key) to shrink the
    anti build. avg threshold is rounded to 2dp in BOTH engines
    before comparing, so float summation-order ulp can never flip a
    row across the threshold. sum(c_acctbal) adds 2dp-grid doubles —
    noise ~1e-10 around a grid point, absorbed by round(...,4).
    """
    c = load_table(spark, "customer", sf_dir).filter(
        (F.col("c_custkey") % 10).isin(1, 3, 5, 7, 9)
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    o = load_table(spark, "orders", sf_dir).select("o_custkey").distinct()
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@_register(
    "tpch_q4_late_orders",
    """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
)
def q_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least
    one late lineitem (shipped >60 days after the order; the
    synthetic lineitem has no commit/receipt dates, so lateness is
    ship-vs-order-date — same EXISTS-decorrelation shape).

    The correlated EXISTS becomes a LEFT SEMI join on the order key
    with the lateness comparison as a join-side predicate; the date
    range pushes to the orders scan first, so the semi join probes
    only the quarter's orders. Semi stops at first match per order —
    no dedup pass, no row multiplication.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (
                li.l_shipdate
                > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "events_time_weighted_avg",
    """WITH seq AS (
  SELECT user_id, value, epoch(ts) AS t,
         lead(epoch(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
  FROM events)
SELECT user_id,
       count(*) AS n_intervals,
       round(sum(value * (t_next - t)) / sum(t_next - t), 6) AS twap,
       round(avg(value), 6) AS plain_avg
FROM seq WHERE t_next IS NOT NULL
GROUP BY user_id""",
)
def q_events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each reading holds until the next
    one, so its weight is the interval length — the correct mean for
    irregularly-sampled series (plain_avg is emitted alongside to show
    the sampling bias). Financial OHLC/TWAP and sensor-rollup shape.

    One user-partitioned window (lead) feeding one partial-agg
    groupBy on the same key — Catalyst reuses the window's Exchange
    for the aggregate, so the whole query is a single shuffle.
    epoch seconds are bit-identical cross-engine (micros/1e6 in
    both); the weighted sums are order-nondeterministic doubles, so
    only the final ratio is compared, rounded to 6dp (relative ulp
    noise ~1e-15 cannot survive into 1e-6).
    """
    ev = load_table(spark, "events", sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("double")
    seq = ev.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lead(t).over(wu).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twap"),
        F.round(F.avg("value"), 6).alias("plain_avg"),
    )


@_register(
    "events_max_concurrency",
    """WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CASE WHEN lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)
                > 1800000000
         THEN 1 ELSE 0 END AS is_start
  FROM events),
sess AS (
  SELECT user_id, t,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked),
iv AS (
  SELECT user_id, session_no, min(t) AS t0, max(t) AS t1
  FROM sess GROUP BY user_id, session_no),
clipped AS (
  SELECT greatest(t0, day_idx * 86400000000) AS lo,
         least(t1, (day_idx + 1) * 86400000000) AS hi,
         day_idx
  FROM (SELECT *, unnest(generate_series(t0 // 86400000000,
                                         t1 // 86400000000)) AS day_idx
        FROM iv) d),
b AS (
  SELECT day_idx, lo AS t, 1 AS delta FROM clipped
  UNION ALL
  SELECT day_idx, hi AS t, -1 AS delta FROM clipped),
run AS (
  SELECT day_idx,
         sum(delta) OVER (PARTITION BY day_idx
                          ORDER BY t ASC, delta DESC
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cur
  FROM b)
SELECT make_timestamp(day_idx * 86400000000) AS day,
       max(cur) AS max_concurrent
FROM run GROUP BY day""",
)
def q_events_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap sweep
    (capacity planning / peak-load shape): sessionize per user
    (30-min gap), clip each session interval to the days it spans
    (bounded fan-out, same trick as the rolling-distinct explode),
    then a +1/-1 boundary sweep with a running sum per day; the
    day's max prefix sum is its peak concurrency.

    All arithmetic is INTEGER microseconds (`unix_micros` /
    `epoch_us`) — no float time anywhere, so the sweep is exact
    cross-engine. Ends sort after starts at equal timestamps
    (delta DESC), i.e. intervals are closed: a 1-event session still
    registers, and back-to-back sessions touching at an instant
    count as concurrent. The sweep windows partition by DAY — the
    global-window anti-pattern never appears; per-day boundary counts
    are 2x the day's sessions, which is the quantity a 1000-executor
    cluster can always hold per partition.
    """
    ev = load_table(spark, "events", sf_dir)
    us = F.unix_micros(F.col("ts"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_t = F.lag(us).over(wu)
    marked = ev.select(
        "user_id",
        "event_id",
        us.alias("t"),
        F.when(
            lag_t.isNull() | ((us - lag_t) > 1800000000), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    sess = marked.select(
        "user_id",
        "t",
        F.sum("is_start")
        .over(
            Window.partitionBy("user_id")
            .orderBy("t", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_no"),
    )
    day_us = F.lit(86400000000)
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    clipped = iv.select(
        F.explode(
            F.sequence(
                F.expr("t0 div 86400000000"), F.expr("t1 div 86400000000")
            )
        ).alias("day_idx"),
        "t0",
        "t1",
    ).select(
        "day_idx",
        F.greatest("t0", F.col("day_idx") * day_us).alias("lo"),
        F.least("t1", (F.col("day_idx") + 1) * day_us).alias("hi"),
    )
    b = clipped.select(
        "day_idx", F.col("lo").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        clipped.select(
            "day_idx", F.col("hi").alias("t"), F.lit(-1).alias("delta")
        )
    )
    run = b.select(
        "day_idx",
        F.sum("delta")
        .over(
            Window.partitionBy("day_idx")
            .orderBy(F.col("t").asc(), F.col("delta").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cur"),
    )
    return run.groupBy(
        F.timestamp_micros(F.col("day_idx") * day_us).alias("day")
    ).agg(F.max("cur").alias("max_concurrent"))


@_register(
    "orders_gaps_islands",
    """WITH days AS (
  SELECT DISTINCT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS day_idx
  FROM orders),
isl AS (
  SELECT o_custkey, day_idx,
         day_idx - row_number() OVER
           (PARTITION BY o_custkey ORDER BY day_idx) AS grp
  FROM days),
streaks AS (
  SELECT o_custkey, grp, count(*)::BIGINT AS streak_days,
         min(day_idx) AS start_day
  FROM isl GROUP BY o_custkey, grp)
SELECT o_custkey,
       count(*) AS n_streaks,
       max(streak_days) AS longest_streak,
       sum(streak_days)::BIGINT AS active_days
FROM streaks
WHERE o_custkey % 20 = 0
GROUP BY o_custkey""",
)
def q_orders_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-order-day streaks per customer
    (retention/engagement-streak shape). The classic trick — on
    consecutive days, day_index and row_number advance in lockstep,
    so their DIFFERENCE is constant per island and becomes the
    island's group key; no self-join, no recursion.

    Day arithmetic is integer microseconds div 86.4e9 — exact in
    both engines. Both windows and both aggregates partition on
    o_custkey, so after the distinct's shuffle everything is
    partition-local; the customer filter pushes to the scan.
    """
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_custkey") % 20 == 0
    )
    days = o.select(
        "o_custkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias(
            "day_idx"
        ),
    ).distinct()
    wc = Window.partitionBy("o_custkey").orderBy("day_idx")
    isl = days.select(
        "o_custkey",
        "day_idx",
        (F.col("day_idx") - F.row_number().over(wc)).alias("grp"),
    )
    streaks = isl.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return streaks.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("streak_days").alias("longest_streak"),
        F.sum("streak_days").cast("bigint").alias("active_days"),
    )


@_register(
    "lineitem_abc_classification",
    """WITH pr AS (
  SELECT l_partkey,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS revenue
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
         sum(revenue) OVER () AS total_rev
  FROM pr),
classed AS (
  SELECT l_partkey, revenue,
         CASE WHEN cum_rev::DOUBLE / total_rev::DOUBLE <= 0.7 THEN 'A'
              WHEN cum_rev::DOUBLE / total_rev::DOUBLE <= 0.9 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM ranked)
SELECT abc_class,
       count(*) AS n_parts,
       sum(revenue)::DECIMAL(38,8) AS class_revenue
FROM classed GROUP BY abc_class""",
)
def q_lineitem_abc_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, bucketed
    by cumulative revenue share (A = first 70%, B = to 90%, C = tail).

    The cumulative window is global BY DEFINITION (a total ordering
    of parts) but runs over the already-aggregated part relation —
    dimension-sized, 1/30-1/50 of the fact rows, the
    post-aggregation global window this registry's protocol allows.
    Cumulative revenue stays decimal-EXACT through the window; the
    share division is one IEEE double op on exact inputs, identical
    in both engines, so class boundaries cannot flip — no rounding
    protocol needed anywhere.
    """
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    pr = li.groupBy("l_partkey").agg(
        F.sum(price * disc1).cast("decimal(38,8)").alias("revenue")
    )
    wcum = Window.orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    ).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    share = F.col("cum_rev").cast("double") / F.col("total_rev").cast(
        "double"
    )
    classed = pr.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum_rev"),
        F.sum("revenue").over(wall).alias("total_rev"),
    ).select(
        "l_partkey",
        "revenue",
        F.when(share <= 0.7, "A")
        .when(share <= 0.9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("revenue").cast("decimal(38,8)").alias("class_revenue"),
    )


@_register(
    "orders_yoy_growth",
    """WITH m AS (
  SELECT (year(o_orderdate) * 100 + month(o_orderdate))::INT AS ym,
         sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY ym)
SELECT cur.ym, cur.revenue, cur.n_orders,
       prev.revenue AS revenue_prev_year,
       round((cur.revenue::DOUBLE - prev.revenue::DOUBLE)
             / prev.revenue::DOUBLE, 6) AS yoy_growth
FROM m cur JOIN m prev ON prev.ym = cur.ym - 100""",
)
def q_orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month — the reporting staple. The
    calendar join (ym vs ym-100) is a self-join of the MONTH-sized
    aggregate, not a window lag (lag-12-rows silently lies when a
    month is missing from the series; the equi-join is
    correct-by-construction). Both sides broadcast at any SF —
    months don't scale with data. Revenue is decimal-exact; growth
    is the one double division, rounded.
    """
    o = load_table(spark, "orders", sf_dir)
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
            "ym"
        )
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return cur.join(
        F.broadcast(prev), F.col("prev.ym") == F.col("cur.ym") - 100
    ).select(
        F.col("cur.ym").alias("ym"),
        F.col("cur.revenue").alias("revenue"),
        F.col("cur.n_orders").alias("n_orders"),
        F.col("prev.revenue").alias("revenue_prev_year"),
        F.round(
            (
                F.col("cur.revenue").cast("double")
                - F.col("prev.revenue").cast("double")
            )
            / F.col("prev.revenue").cast("double"),
            6,
        ).alias("yoy_growth"),
    )


from knn_using_hadoop_spark.operators.sketches import (  # noqa: E402
    countmin_estimates,
    countmin_oracle_sql,
)


@_register(
    "token_countmin_freq",
    countmin_oracle_sql(
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents",
        "tok",
    ),
)
def q_token_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch token-frequency estimates vs exact counts for
    the top-20 tokens (operators/sketches.py::countmin_estimates).
    The 192-counter sketch is built from the vocab-sized count
    relation (identical counters to hashing the raw stream, at
    O(|vocab|*depth) explode cost); overestimate >= 0 is the CMS
    one-sided error, exposed per probe."""
    toks = load_docs_wide(spark, sf_dir).select(
        F.explode(_text.tokens("text")).alias("tok")
    )
    return countmin_estimates(toks, "tok")


from knn_using_hadoop_spark.operators.linalg import (  # noqa: E402
    logreg_gd,
    logreg_gd_oracle_sql,
)

_LOGREG_FEATS_SQL = """SELECT l_quantity / 50 AS x1,
       l_discount * 10 AS x2,
       l_tax * 10 AS x3,
       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
FROM lineitem"""


@_register(
    "lineitem_logreg_returnflag",
    logreg_gd_oracle_sql(_LOGREG_FEATS_SQL, ["x1", "x2", "x3"], "y"),
)
def q_lineitem_logreg_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iterative ML training as aggregates: 3 rounds of full-batch
    logistic-regression gradient descent predicting returnflag='R'
    from scaled (quantity, discount, tax) —
    operators/linalg.py::logreg_gd. Each round is one
    partial-aggregated scan; weights are driver-side literals
    (constant plan depth); sigmoid/gradient rounding keeps both
    engines bit-identical round over round (PageRank protocol).
    The synthetic label is ~independent of the features, so the
    learned weights hover near the prior's logit — the point is the
    distributed-GD mechanics, not the fit."""
    feats = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_quantity") / 50).alias("x1"),
        (F.col("l_discount") * 10).alias("x2"),
        (F.col("l_tax") * 10).alias("x3"),
        F.when(F.col("l_returnflag") == "R", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    return logreg_gd(feats, ["x1", "x2", "x3"], "y")


# EWMA coefficients alpha*(1-alpha)^k, computed ONCE in Python and
# inlined as literals on BOTH sides (repr round-trips doubles exactly,
# so each engine parses the identical IEEE value — neither engine
# recomputes the power chain).
_EWMA_ALPHA = 0.3
_EWMA_K = 10
_EWMA_COEFS = [
    _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** k for k in range(_EWMA_K + 1)
]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(value, {k}) OVER w * {c!r}, 0.0)"
        if k
        else f"value * {c!r}"
        for k, c in enumerate(_EWMA_COEFS)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL"
        f" THEN {c!r} ELSE 0.0 END"
        if k
        else f"{c!r}"
        for k, c in enumerate(_EWMA_COEFS)
    )
    return f"""SELECT user_id, event_id, ts, value,
       round(({num}) / ({den}), 6) AS ewma
FROM events WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""


@_register("events_ewma", _ewma_oracle())
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback EWMA (alpha=0.3, K=10 lags) — exponential
    smoothing as a pure window expression. True EWMA is an infinite
    recursion no window function expresses; truncating at K=10 drops
    (1-alpha)^11 ≈ 2% of the mass, which the denominator renormalizes
    over the PRESENT terms (so early rows in each series are exact
    partial-mass averages, not biased toward zero).

    One user-partitioned window feeds all 11 lags — a single
    Exchange + sort, then branch-free projection. The whole
    expression is deterministic IEEE arithmetic on literal
    coefficients (inlined from one Python computation on both
    sides), left-to-right association matched — bit-exact
    cross-engine before the cosmetic 6dp rounding."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 25 == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.col("value") * F.lit(_EWMA_COEFS[0])
    den = F.lit(_EWMA_COEFS[0])
    for k in range(1, _EWMA_K + 1):
        lagk = F.lag("value", k).over(w)
        num = num + F.coalesce(
            lagk * F.lit(_EWMA_COEFS[k]), F.lit(0.0)
        )
        den = den + F.when(
            lagk.isNotNull(), F.lit(_EWMA_COEFS[k])
        ).otherwise(F.lit(0.0))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


@_register(
    "events_welch_ttest",
    """WITH s AS (
  SELECT count(*) FILTER (WHERE event_type = 'click') AS n1,
         count(*) FILTER (WHERE event_type = 'purchase') AS n2,
         round(avg(value) FILTER (WHERE event_type = 'click'), 6) AS m1,
         round(avg(value) FILTER (WHERE event_type = 'purchase'), 6)
           AS m2,
         round(var_samp(value) FILTER (WHERE event_type = 'click'), 6)
           AS v1,
         round(var_samp(value) FILTER (WHERE event_type = 'purchase'), 6)
           AS v2
  FROM events)
SELECT n1, n2, m1, m2,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS df_welch
FROM s""",
)
def q_events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase
    spend — the A/B-test primitive as ONE conditional-aggregate scan
    (no per-group subqueries, no second pass).

    Determinism: the five sufficient statistics are rounded to 6dp
    FIRST (absorbing summation-order and Welford-vs-sum-of-squares
    ulp differences between engines), then the t statistic and
    Welch-Satterthwaite df are pure IEEE arithmetic on those rounded
    stats — identical in both engines by construction. sqrt is an
    IEEE-exact operation (unlike exp/ln, it needs no extra guard).
    """
    ev = load_table(spark, "events", sf_dir)
    click = F.when(F.col("event_type") == "click", F.col("value"))
    purch = F.when(F.col("event_type") == "purchase", F.col("value"))
    s = ev.agg(
        F.count(click).alias("n1"),
        F.count(purch).alias("n2"),
        F.round(F.avg(click), 6).alias("m1"),
        F.round(F.avg(purch), 6).alias("m2"),
        F.round(F.var_samp(click), 6).alias("v1"),
        F.round(F.var_samp(purch), 6).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return s.select(
        "n1",
        "n2",
        "m1",
        "m2",
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 4
        ).alias("t_stat"),
        F.round(
            (se1 + se2)
            * (se1 + se2)
            / (
                se1 * se1 / (F.col("n1") - 1)
                + se2 * se2 / (F.col("n2") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@_register(
    "sql_lateral_topk",
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c
JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
WHERE c.c_custkey % 100 = 0""",
)
def q_sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    the SQL-native top-N-per-group, planned by Catalyst's lateral
    decorrelation (DecorrelateInnerQuery rewrites it to a join +
    per-key limit, the same shape as the window-rank form — no
    per-customer re-execution). Exercises the SQL entry path end to
    end; ties broken by the unique order key so the LIMIT-2 set is
    cross-engine deterministic."""
    sf = sf_dir
    for t in ("customer", "orders"):
        load_table(spark, t, sf).createOrReplaceTempView(t)
    return spark.sql(
        """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           FROM customer c
           JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                         WHERE o_custkey = c.c_custkey
                         ORDER BY o_totalprice DESC, o_orderkey
                         LIMIT 2) t
           WHERE c.c_custkey % 100 = 0"""
    )


@_register(
    "doc_zipf_slope",
    """WITH vocab AS (
  SELECT tok, count(*)::BIGINT AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
  GROUP BY tok),
pts AS (
  SELECT round(ln(row_number() OVER (ORDER BY cnt DESC, tok)), 6) AS lx,
         round(ln(cnt::DOUBLE), 6) AS ly
  FROM vocab),
s AS (
  SELECT count(*)::BIGINT AS n, sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * lx) AS sxx, sum(ly * ly) AS syy, sum(lx * ly) AS sxy
  FROM pts)
SELECT n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
             6) AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s""",
)
def q_doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log(freq) ~ log(rank) (natural Zipf slope ≈ -1; the synthetic
    corpus's flat token distribution yields a shallower tail — the
    diagnostic is exactly what the number is for).

    The rank window is global but runs over the VOCAB relation
    (sublinear in corpus size — post-aggregation global windows are
    this registry's allowed shape). ln() is libm, NOT IEEE-exact
    cross-engine, so both coordinates are rounded to 6dp BEFORE the
    sums; the closed-form OLS then rounds its three outputs (the
    log-log points are O(1-10), no catastrophic cancellation — the
    epoch-seconds centering lesson from events_ols_trend does not
    bite here)."""
    vocab = (
        load_docs_wide(spark, sf_dir)
        .select(F.explode(_text.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wr = Window.orderBy(F.col("cnt").desc(), F.col("tok"))
    pts = vocab.select(
        F.round(F.log(F.row_number().over(wr).cast("double")), 6).alias(
            "lx"
        ),
        F.round(F.log(F.col("cnt").cast("double")), 6).alias("ly"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@_register(
    "events_sliding_windowed_agg",
    """WITH assigned AS (
  SELECT event_type, value,
         make_timestamp(((epoch_us(ts) // 1800000000) - k) * 1800000000)
           AS window_start
  FROM events, unnest(generate_series(0, 1)) AS t(k)
  WHERE epoch_us(ts)
        < (((epoch_us(ts) // 1800000000) - k) + 2) * 1800000000
    AND ((epoch_us(ts) // 1800000000) - k) >= 0)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM assigned GROUP BY window_start, event_type""",
)
def q_events_sliding_windowed_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding (hopping) window aggregate: 1-hour windows every 30
    minutes — each event contributes to window/slide = 2 overlapping
    windows. Spark's F.window(slide) expands the assignment at plan
    time (an Expand node, factor 2 — bounded fan-out, not a join);
    the oracle states the same two-starts-per-event expansion
    explicitly: starts are the epoch-aligned 30-min marks s with
    s <= ts < s + 1h. Streaming twin:
    streaming/events.py::streaming_sliding_counts (same agg under a
    watermark; verified row-equal in test_streaming.py).

    All window arithmetic is integer microseconds — exact; the value
    sum is rounded (unordered float sum), count is exact.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@_register(
    "orders_winsorized_stats",
    """WITH bounds AS (
  SELECT o_orderpriority,
         round(quantile_cont(o_totalprice, 0.05)::DOUBLE, 6) AS p05,
         round(quantile_cont(o_totalprice, 0.95)::DOUBLE, 6) AS p95
  FROM orders GROUP BY o_orderpriority)
SELECT o.o_orderpriority,
       count(*) AS n,
       sum(CASE WHEN o_totalprice < p05 OR o_totalprice > p95
                THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
       round(avg(o_totalprice), 4) AS raw_mean,
       round(avg(least(greatest(o_totalprice, p05), p95)), 4)
         AS winsorized_mean
FROM orders o JOIN bounds b ON b.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority""",
)
def q_orders_winsorized_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized mean per priority — the robust-stats answer to
    heavy-tailed spend (clip at p5/p95, then average; compare against
    raw_mean to read the tail's pull).

    Two passes by necessity (bounds, then clip) but the bounds
    relation is GROUP-sized and broadcasts back — the fact table is
    scanned twice, shuffled on the same key once each, never joined
    wide. Percentile bounds are rounded to 6dp BEFORE clipping so
    the exact-interpolation ulp between engines can't reclassify a
    row at the boundary; the clipped values themselves are then
    exact doubles and only the final means need rounding.
    """
    o = load_table(spark, "orders", sf_dir)
    bounds = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95")
    )
    outside = (F.col("o_totalprice") < F.col("p05")) | (
        F.col("o_totalprice") > F.col("p95")
    )
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(outside.cast("int")).cast("bigint").alias("n_clipped"),
            F.round(F.avg("o_totalprice"), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
        )
    )


@_register(
    "tpch_q7_trade_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INT AS l_year,
       sum(l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6))::DECIMAL(38,8) AS volume
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year — the same dimension (nation) joined TWICE under different
    roles, with a cross-role disjunctive filter.

    Both nation legs broadcast (the dim appears twice in the plan,
    once per alias); supplier and customer broadcast at this SF but
    shuffle-join at 100 TB — either way the residual OR over
    (supp_nation, cust_nation) is evaluated after both legs resolve,
    and Catalyst pushes the derived IN('NATION_3','NATION_7') filter
    into EACH nation scan, so the fact join only sees rows from the
    two nations rather than filtering post-hoc.
    """
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("cust_nation"),
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(price * disc1).cast("decimal(38,8)").alias("volume"))
    )


@_register(
    "graph_bfs_depths",
    _graph.bfs_oracle_sql(_EDGES_SQL, rounds=3),
)
def q_graph_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS distances (3 levels) from the minimum-id node of the
    co-occurrence graph — reachability/radius analytics
    (operators/graph.py::bfs_depths). Integer distances make this
    the one iterative-graph op with NO float protocol: the unrolled
    relaxations are exact in both engines by construction."""
    return _graph.bfs_depths(_edges(spark, sf_dir), rounds=3)


@_register(
    "events_moving_median",
    """SELECT user_id, event_id, ts, value,
       round(CASE WHEN len(arr) % 2 = 1
                  THEN arr[(len(arr) + 1) // 2]
                  ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1])
                       / 2 END, 6) AS med7
FROM (
  SELECT user_id, event_id, ts, value,
         list_sort(list(value) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM events WHERE user_id % 25 = 0) t""",
)
def q_events_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a trailing 7-row window — the robust
    smoother (rolling mean breaks on spikes; median doesn't). No
    engine exposes percentile as a window function portably, so the
    frame's values are collected, sorted, and indexed: both engines
    then compute the SAME (a+b)/2 midpoint association for even
    frames — deterministic without trusting each engine's
    quantile-interpolation arithmetic. Frame size is a 7-element
    array per row — bounded state, unlike an unbounded collect.
    """
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 25 == 0
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2).cast("int") + 1)
    ) / 2
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.round(
            F.when(n % 2 == 1, odd).otherwise(even), 6
        ).alias("med7"),
    )


@_register(
    "events_key_skew_profile",
    """WITH per_key AS (
  SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY user_id)
SELECT length(cnt::VARCHAR)::INT AS digits,
       count(*) AS n_keys,
       min(cnt) AS min_cnt,
       max(cnt) AS max_cnt,
       sum(cnt)::BIGINT AS total_rows
FROM per_key GROUP BY digits""",
)
def q_events_key_skew_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shuffle-key skew diagnosis: per-key row counts histogrammed by
    decimal magnitude (digit count — integer-exact in both engines,
    no libm log) — the first query to run before picking a salt
    factor or trusting AQE's skew threshold on a new key. Two
    partial-aggregated shuffles, the second over the key-sized count
    relation."""
    ev = load_table(spark, "events", sf_dir)
    per_key = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_key.groupBy(
        F.length(F.col("cnt").cast("string")).alias("digits")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("cnt").alias("min_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
    )


@_register(
    "lineitem_brand_affinity",
    """WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey),
n_orders AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM ob),
brand_cnt AS (
  SELECT p_brand, count(*)::BIGINT AS cnt FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         count(*)::BIGINT AS both_cnt
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                     AND a.p_brand < b.p_brand
  GROUP BY brand_a, brand_b
  HAVING count(*) >= 20)
SELECT brand_a, brand_b, both_cnt,
       round(both_cnt / n::DOUBLE, 6) AS support,
       round(both_cnt / ca.cnt::DOUBLE, 6) AS confidence_a_b,
       round(both_cnt * n::DOUBLE / (ca.cnt * cb.cnt), 6) AS lift
FROM pairs
JOIN brand_cnt ca ON ca.p_brand = brand_a
JOIN brand_cnt cb ON cb.p_brand = brand_b
CROSS JOIN n_orders""",
)
def q_lineitem_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over brands co-purchased in an
    order: support / confidence / lift — the A-priori first pass.

    The pair build self-joins the (order, brand) relation on the
    order key: fan-out is bounded by per-order DISTINCT brands
    (<= lines per order, ~7 here — the same bounded-group argument
    as the co-occurrence graph; a pathological mega-order would need
    the graph builder's group cap). Brand marginals and the order
    count are tiny relations broadcast into the final projection.
    Counts are exact; the three ratios are single IEEE divisions on
    exact integers (n*both_cnt fits bigint), rounded for repr.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    ob = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.select("l_orderkey").distinct().count()
    brand_cnt = ob.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("both_cnt"))
        .filter(F.col("both_cnt") >= 20)
    )
    ca = F.broadcast(
        brand_cnt.select(
            F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
        )
    )
    cb = F.broadcast(
        brand_cnt.select(
            F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
        )
    )
    return (
        pairs.join(ca, "brand_a")
        .join(cb, "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "both_cnt",
            F.round(F.col("both_cnt") / F.lit(float(n)), 6).alias(
                "support"
            ),
            F.round(
                F.col("both_cnt") / F.col("cnt_a").cast("double"), 6
            ).alias("confidence_a_b"),
            F.round(
                F.col("both_cnt") * F.lit(float(n))
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


@_register(
    "events_cusum_changepoint",
    """WITH daily AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         round(avg(value), 6) AS day_mean
  FROM events GROUP BY day),
base AS (SELECT round(avg(day_mean), 6) AS mu FROM daily),
cusum AS (
  SELECT day, day_mean,
         round(sum(day_mean - mu) OVER
           (ORDER BY day ROWS UNBOUNDED PRECEDING), 6) AS drift
  FROM daily, base)
SELECT day, day_mean, drift
FROM cusum
ORDER BY abs(drift) DESC, day
LIMIT 10""",
)
def q_events_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM change-point surface: cumulative drift of daily means
    from the global mean; the top-|drift| days bracket the likeliest
    level shift. The cumulative window is global but over the
    DAY-sized relation (post-aggregation). Both the daily means and
    the global mean round BEFORE the cumulative sum, so the window
    adds identical doubles in identical order cross-engine (running
    sums are order-deterministic — only the ordering key must be
    unique, and day is). Final drift re-rounds only to absorb the
    accumulated-sum's last-ulp."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("day_mean"))
    base = daily.agg(F.round(F.avg("day_mean"), 6).alias("mu"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cusum = daily.join(F.broadcast(base)).select(
        "day",
        "day_mean",
        F.round(
            F.sum(F.col("day_mean") - F.col("mu")).over(w), 6
        ).alias("drift"),
    )
    return cusum.orderBy(F.abs(F.col("drift")).desc(), "day").limit(10)


@_register(
    "events_weekly_seasonality",
    """WITH base AS (
  SELECT value, dayofweek(ts)::INT AS dow FROM events),
dow_means AS (
  SELECT dow, round(avg(value), 6) AS dow_mean, count(*) AS n
  FROM base GROUP BY dow),
stats AS (
  SELECT round(var_samp(value), 6) AS var_total FROM base),
resid AS (
  SELECT round(var_samp(b.value - m.dow_mean), 6) AS var_resid
  FROM base b JOIN dow_means m ON m.dow = b.dow)
SELECT m.dow, m.dow_mean, m.n,
       round(1 - (SELECT var_resid FROM resid)
                 / (SELECT var_total FROM stats), 6) AS var_explained
FROM dow_means m""",
)
def q_events_weekly_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly seasonal profile + variance explained: day-of-week mean
    spend, and how much of total variance the weekly pattern removes
    (1 - var(residual)/var(total)) — the go/no-go check before
    fitting any seasonal model.

    dayofweek: Spark and DuckDB disagree on numbering (Sun=1 vs
    Sun=0), so the Spark side subtracts 1 to match DuckDB's 0-based
    convention. The dow-mean relation (7 rows) broadcasts back for
    the residual pass; all variances round at 6dp before the final
    ratio."""
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "value", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    )
    dow_means = base.groupBy("dow").agg(
        F.round(F.avg("value"), 6).alias("dow_mean"),
        F.count(F.lit(1)).alias("n"),
    )
    var_total = base.agg(
        F.round(F.var_samp("value"), 6).alias("v")
    ).collect()[0]["v"]
    resid = (
        base.join(F.broadcast(dow_means.select("dow", "dow_mean")), "dow")
        .agg(
            F.round(
                F.var_samp(F.col("value") - F.col("dow_mean")), 6
            ).alias("v")
        )
        .collect()[0]["v"]
    )
    return dow_means.select(
        "dow",
        "dow_mean",
        "n",
        F.round(F.lit(1.0) - F.lit(resid) / F.lit(var_total), 6).alias(
            "var_explained"
        ),
    )


@_register(
    "events_conversion_latency",
    """WITH first_click AS (
  SELECT user_id, min(ts) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id),
conv AS (
  SELECT e.user_id,
         min(epoch(e.ts) - epoch(f.t_click)) AS latency_s
  FROM events e JOIN first_click f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= f.t_click
  GROUP BY e.user_id)
SELECT count(*) AS n_converted,
       round(quantile_cont(latency_s, 0.5)::DOUBLE, 4) AS p50_s,
       round(quantile_cont(latency_s, 0.9)::DOUBLE, 4) AS p90_s,
       round(avg(latency_s), 4) AS mean_s
FROM conv""",
)
def q_events_conversion_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion-latency distribution: per user, time from FIRST
    click to the EARLIEST subsequent purchase; p50/p90/mean across
    converters — the product-analytics companion to the funnel count
    (which says how many convert; this says how fast).

    Two partial-aggregated passes on the same user key (first-click,
    then min-latency) — the join and both groupBys share one
    partitioning. Latencies are epoch differences (micros/1e6,
    bit-exact cross-engine); percentiles are exact interpolation on
    those exact values, rounded 4dp for repr."""
    ev = load_table(spark, "events", sf_dir)
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purch = ev.filter(F.col("event_type") == "purchase")
    conv = (
        purch.join(first_click, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.col("ts").cast("double")
                - F.col("t_click").cast("double")
            ).alias("latency_s")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 4).alias("p90_s"),
        F.round(F.avg("latency_s"), 4).alias("mean_s"),
    )


@_register(
    "lineitem_shipping_delay",
    """SELECT o_orderpriority,
       count(*) AS n_lines,
       min(datediff('day', o_orderdate, l_shipdate))::INT AS min_days,
       max(datediff('day', o_orderdate, l_shipdate))::INT AS max_days,
       round(avg(datediff('day', o_orderdate, l_shipdate)), 4)
         AS avg_days,
       round(quantile_cont(datediff('day', o_orderdate, l_shipdate),
                           0.9)::DOUBLE, 4) AS p90_days
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority""",
)
def q_lineitem_shipping_delay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipping-delay SLA profile per priority: order-to-ship day
    deltas (integer datediff — exact cross-engine), with exact p90.
    The orders join shuffles on the order key at scale (both fact
    relations); everything downstream is one partial-aggregated
    groupBy on the 5-value priority."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(delay).cast("int").alias("min_days"),
            F.max(delay).cast("int").alias("max_days"),
            F.round(F.avg(delay), 4).alias("avg_days"),
            F.round(
                F.expr(
                    "percentile(datediff(l_shipdate, o_orderdate), 0.9)"
                ),
                4,
            ).alias("p90_days"),
        )
    )


@_register(
    "tpch_q8_market_share",
    """WITH vol AS (
  SELECT year(o_orderdate)::INT AS o_year,
         l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(9,6) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA')
SELECT o_year,
       sum(CASE WHEN supp_nation = 'NATION_2' THEN volume END)
         ::DECIMAL(38,8) AS nation_volume,
       sum(volume)::DECIMAL(38,8) AS total_volume,
       round(coalesce(sum(CASE WHEN supp_nation = 'NATION_2'
                     THEN volume END), 0)::DOUBLE
             / sum(volume)::DOUBLE, 6) AS mkt_share
FROM vol GROUP BY o_year""",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier-nation's share of the ASIA
    customer-market by year — nation joined twice (customer-side
    routes through region for the market filter; supplier-side feeds
    the share CASE), share as a conditional-agg ratio.

    The region filter prunes the customer-side nation broadcast to 5
    rows BEFORE the fact join (semi-join pushdown through two dim
    hops); the supplier-nation CASE rides the aggregate — one scan,
    no second pass for the numerator. Volumes decimal-exact; the
    share is one double division. nation_volume is NULL (not 0) for
    years the nation sold nothing, matching SQL CASE semantics in
    both engines; the share coalesces to 0 explicitly.
    """
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (price * disc1).alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
    nat_sum = F.sum(nat).cast("decimal(38,8)")
    tot_sum = F.sum("volume").cast("decimal(38,8)")
    zero = F.lit(0).cast("decimal(38,8)")
    return vol.groupBy("o_year").agg(
        nat_sum.alias("nation_volume"),
        tot_sum.alias("total_volume"),
        F.round(
            F.coalesce(nat_sum, zero).cast("double")
            / tot_sum.cast("double"),
            6,
        ).alias("mkt_share"),
    )


@_register(
    "tpch_q9_profit",
    """SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(9,6)
           - (p_retailprice::DECIMAL(18,2) * 6 / 10)
             * l_quantity::DECIMAL(18,2))::DECIMAL(38,8) AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)""",
)
def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    year, filtered by a part-name LIKE pattern. The synthetic schema
    has no partsupp, so supply cost is modeled as 60% of
    p_retailprice — the decimal expression keeps Q9's
    revenue-minus-cost two-term structure. (ref: run-hadoop pipelines
    have no analog; this is §2.9 north-star surface.)

    The LIKE '%gear%' predicate prunes part BEFORE broadcast (a
    contains filter pushes to the dim scan); profit arithmetic stays
    on the decimal grid: 6/10 of a 2dp price is exact at 3dp, and
    Spark and DuckDB promote the product chain identically once each
    factor is cast explicitly. Fact side shuffles once on l_orderkey
    for the orders join.
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%gear%")
    )
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc1 = (F.lit(1) - F.col("l_discount")).cast("decimal(9,6)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)") * 6 / 10
    ) * F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(price * disc1 - cost)
            .cast("decimal(38,8)")
            .alias("profit")
        )
    )


@_register(
    "events_user_type_arrays",
    """SELECT user_id,
       list_sort(list(DISTINCT event_type)) AS types,
       len(list(DISTINCT event_type))::INT AS n_types,
       list_contains(list(DISTINCT event_type), 'purchase')
         AS has_purchase,
       list_sort(list(DISTINCT event_type))[1:2] AS first_two
FROM events WHERE user_id % 10 = 0
GROUP BY user_id""",
)
def q_events_user_type_arrays(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Array-column surface: per-user sorted distinct event-type
    arrays with containment and slicing — the collect-as-set pattern
    that backs segment membership checks. Arrays are SORTED before
    leaving the aggregate (collect_set order is
    partition-nondeterministic; sorting restores a canonical form
    the value-hash can compare — same protocol as the journey/
    listagg queries). slice/list indexing is 1-based in both
    engines."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 10 == 0
    )
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        types.alias("types"),
        F.size(types).cast("int").alias("n_types"),
        F.array_contains(types, "purchase").alias("has_purchase"),
        F.slice(types, 1, 2).alias("first_two"),
    )


@_register(
    "doc_token_positions",
    """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS arr
  FROM documents WHERE doc_id % 20 = 0),
pos AS (
  SELECT doc_id,
         unnest(arr) AS tok,
         unnest(generate_series(1, len(arr))) AS p
  FROM toks)
SELECT doc_id, tok,
       min(p)::INT AS first_pos,
       count(*) AS n_occ
FROM pos GROUP BY doc_id, tok
HAVING count(*) >= 3""",
)
def q_doc_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token index: first occurrence + frequency of every
    token repeating >= 3x within a doc (posexplode — the
    position-aware explode; keyword-in-context / lead-paragraph
    features need the position, not just the count).

    Spark's posexplode zips (pos, value); the oracle zips two
    parallel unnests (DuckDB's equivalent). Positions are 1-based on
    both sides (posexplode is 0-based — the +1 is explicit).
    Everything after the explode is one partial-aggregated groupBy.
    """
    docs = load_docs_wide(spark, sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    pos = docs.select(
        "doc_id",
        F.posexplode(_text.tokens("text")).alias("p0", "tok"),
    ).select("doc_id", "tok", (F.col("p0") + 1).alias("p"))
    return (
        pos.groupBy("doc_id", "tok")
        .agg(
            F.min("p").cast("int").alias("first_pos"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_occ") >= 3)
    )


@_register(
    "events_bitwise_surface",
    """SELECT event_id,
       (user_id & 7)::BIGINT AS shard,
       (user_id | 8)::BIGINT AS flagged,
       xor(user_id, event_id)::BIGINT AS mix,
       (user_id << 2)::BIGINT AS scaled,
       (user_id >> 1)::BIGINT AS halved,
       ((user_id & 1) = 1) AS is_odd
FROM events WHERE event_id % 50 = 0""",
)
def q_events_bitwise_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bitwise scalar surface (AND/OR/XOR/shifts) — shard routing,
    flag packing, and hash mixing all reduce to these. Integer-exact
    in both engines; Spark's shiftleft/shiftright are functions where
    DuckDB uses operators, same two's-complement semantics on
    BIGINT."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_id") % 50 == 0
    )
    u, e = F.col("user_id"), F.col("event_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(7)).cast("bigint").alias("shard"),
        u.bitwiseOR(F.lit(8)).cast("bigint").alias("flagged"),
        u.bitwiseXOR(e).cast("bigint").alias("mix"),
        F.shiftleft(u, 2).cast("bigint").alias("scaled"),
        F.shiftright(u, 1).cast("bigint").alias("halved"),
        (u.bitwiseAND(F.lit(1)) == 1).alias("is_odd"),
    )


@_register(
    "events_session_window_native",
    """WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events),
flags AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM e),
sess AS (
  SELECT user_id, ts,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS sid
  FROM flags)
SELECT user_id,
       min(ts) AS session_start,
       (max(ts) + INTERVAL '30 minutes') AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, sid""",
)
def q_events_session_window_native(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark's NATIVE session_window() aggregate in batch mode,
    pinned against the classic lag+cumsum algorithm as its oracle —
    proving the built-in's merge semantics (events within the gap
    coalesce; window end = last event + gap) equal the textbook
    formulation. The native form is what the streaming path uses, so
    this is also the cross-paradigm semantic bridge: one aggregate,
    no window functions, Spark merges sessions inside the
    SessionWindowStateStore-backed aggregate (batch: a sort-based
    merge within the user partition — still one Exchange).

    Tie caveat: session identity needs only ts ordering (equal
    timestamps merge into one session regardless of event order), so
    no event_id tiebreak is required for determinism here.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@_register(
    "lineitem_regr_aggregates",
    """SELECT l_returnflag,
       regr_count(l_extendedprice, l_quantity)::BIGINT AS n,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6)
         AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       round(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
       round(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
FROM lineitem GROUP BY l_returnflag""",
)
def q_lineitem_regr_aggregates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Built-in SQL regression-aggregate family (regr_slope /
    intercept / r2 / avgx / avgy) — price-on-quantity fit per
    returnflag, the one-pass ANSI twin of the hand-rolled OLS in
    events_ols_trend (which exists for the per-group closed-form
    shape; this pins the BUILT-IN aggregates against DuckDB's).
    Price is near-proportional to quantity by construction, so r2 is
    high and the slope approximates unit price — interpretable
    output, not just a function checklist. Both engines accumulate
    exact sums then divide; 6dp rounding absorbs summation-order
    ulp."""
    li = load_table(spark, "lineitem", sf_dir)
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
    )


@_register(
    "part_string_funcs2",
    """SELECT p_partkey,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       reverse(p_name) AS rev,
       lpad(p_partkey::VARCHAR, 8, '0') AS padded_id,
       repeat(left(p_name, 2), 2) AS stutter,
       replace(p_name, ' ', '_') AS snake,
       split_part(p_name, ' ', 2) AS second_word,
       strpos(p_name, 'e')::INT AS first_e,
       right(p_name, 3) AS tail3
FROM part WHERE p_partkey % 25 = 0""",
)
def q_part_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function tranche (translate / reverse / pad /
    repeat / split_part / strpos / left / right) — byte-exact string
    ops, no collation or locale dependence (the corpus is ASCII;
    initcap/soundex are EXCLUDED because DuckDB lacks them — the
    portable surface is what both engines share)."""
    p = load_table(spark, "part", sf_dir).filter(
        F.col("p_partkey") % 25 == 0
    )
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.reverse("p_name").alias("rev"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias(
            "padded_id"
        ),
        F.repeat(F.expr("left(p_name, 2)"), 2).alias("stutter"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias(
            "snake"
        ),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
        F.instr("p_name", "e").cast("int").alias("first_e"),
        F.expr("right(p_name, 3)").alias("tail3"),
    )


@_register(
    "orders_date_funcs2",
    """SELECT o_orderkey,
       (o_orderdate + INTERVAL 3 MONTH) AS plus_3mo,
       last_day(o_orderdate::DATE)::TIMESTAMP AS month_end,
       quarter(o_orderdate)::INT AS qtr,
       date_trunc('quarter', o_orderdate)::TIMESTAMP AS qtr_start,
       ((2001 - year(o_orderdate)) * 12
        + (8 - month(o_orderdate)))::INT AS months_to_ref,
       dayofyear(o_orderdate)::INT AS doy,
       week(o_orderdate)::INT AS iso_week
FROM orders WHERE o_orderkey % 40 = 0""",
)
def q_orders_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date-function tranche: month arithmetic with end-of-
    month clamping (add_months), last_day, quarter extraction/trunc,
    integer month-distance (computed as year*12+month deltas — both
    engines agree exactly, unlike fractional months_between which
    DuckDB lacks), day-of-year, ISO week. Spark weekofyear == DuckDB
    week (both ISO-8601)."""
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") % 40 == 0
    )
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_trunc("quarter", d).alias("qtr_start"),
        (
            (F.lit(2001) - F.year(d)) * 12 + (F.lit(8) - F.month(d))
        ).cast("int").alias("months_to_ref"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.weekofyear(d).cast("int").alias("iso_week"),
    )


@_register(
    "similarity_lsh_mrr",
    f"""WITH eq AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % {_SIM_QUERY_MOD} = 0),
epe AS (SELECT e.vec_id, eq.query_id, e.embedding AS cv, eq.qv
        FROM embeddings e, eq WHERE e.vec_id <> eq.query_id),
esums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM epe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
eranked AS (
  SELECT query_id, vec_id,
         (row_number() OVER (PARTITION BY query_id
              ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC,
                       vec_id))::INT AS rank
  FROM esums),
{"allb AS " + _LSH_BUCKETS_SQL.strip().removeprefix("allb AS").lstrip()},
lq AS (SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
       FROM embeddings e JOIN allb b ON b.vec_id = e.vec_id
       WHERE e.vec_id % {_SIM_QUERY_MOD} = 0),
lpe AS (SELECT e.vec_id, lq.query_id, e.embedding AS cv, lq.qv
        FROM embeddings e
        JOIN allb b ON b.vec_id = e.vec_id
        JOIN lq ON lq.bucket = b.bucket
        WHERE e.vec_id <> lq.query_id),
lsums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM lpe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
lranked AS (
  SELECT query_id, vec_id,
         (row_number() OVER (PARTITION BY query_id
              ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC,
                       vec_id))::INT AS rank
  FROM lsums),
truth AS (SELECT query_id, vec_id AS true_nn FROM eranked
          WHERE rank = 1),
hit AS (
  SELECT t.query_id, l.rank
  FROM truth t LEFT JOIN lranked l
    ON l.query_id = t.query_id AND l.vec_id = t.true_nn
   AND l.rank <= 5)
SELECT count(*) AS n_queries,
       sum(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hits_at_5,
       round(avg(CASE WHEN rank IS NOT NULL
                      THEN 1.0 / rank ELSE 0.0 END), 6) AS mrr_at_5
FROM hit""",
)
def q_similarity_lsh_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: MRR@5 of the LSH index against exact
    cosine top-1 — the ANN quality gate next to pq_recall_at_10
    (recall says the true NN appeared; MRR says how high). Both the
    exact and LSH rankings reuse the registry's deterministic
    protocols (rounded-sim ordering, hyperplanes from the portable
    hash), so an APPROXIMATE index gets an exact oracle — the same
    trick that makes the whole ANN family checkable.

    Scale shape: exact side is the brute-force O(Q x N) baseline
    (few queries — the documented regime); LSH side joins bucket
    candidates only. The eval join is query-count-sized.
    """
    corpus, queries = _sim_queries(spark, sf_dir)
    truth = _sim.cosine_topk(corpus, queries, 1, _EMB_DIM).select(
        "query_id", F.col("vec_id").alias("true_nn")
    )
    cand = _sim.lsh_bucket_topk(corpus, queries, 5, _EMB_DIM).select(
        "query_id", "vec_id", "rank"
    )
    hit = truth.join(
        cand,
        (truth.query_id == cand.query_id)
        & (cand.vec_id == truth.true_nn),
        "left",
    ).select(truth.query_id, cand.rank)
    return hit.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            F.when(F.col("rank").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_hits_at_5"),
        F.round(
            F.avg(
                F.when(
                    F.col("rank").isNotNull(),
                    F.lit(1.0) / F.col("rank"),
                ).otherwise(F.lit(0.0))
            ),
            6,
        ).alias("mrr_at_5"),
    )


@_register(
    "embedding_truncate_renorm",
    f"""WITH t AS (
  SELECT vec_id,
         embedding[1:16] AS tv,
         sqrt((SELECT sum(x::DOUBLE * x::DOUBLE)
               FROM unnest(embedding[1:16]) u(x))) AS tnorm,
         sqrt((SELECT sum(x::DOUBLE * x::DOUBLE)
               FROM unnest(embedding) u(x))) AS fnorm
  FROM embeddings WHERE vec_id % 25 = 0)
SELECT vec_id,
       round(tnorm, 6) AS trunc_norm,
       round(tnorm / fnorm, 6) AS mass_kept,
       round(tv[1]::DOUBLE / tnorm, 6) AS renorm_d1,
       round(tv[16]::DOUBLE / tnorm, 6) AS renorm_d16
FROM t""",
)
def q_embedding_truncate_renorm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style truncation: keep the first 16 of {_EMB_DIM}
    dims, renormalize to unit length, report the retained L2 mass —
    the cheap-retrieval trick (truncate for the coarse pass, full
    dims for rerank). Pure array-HOF arithmetic, zero shuffle;
    sqrt/divide are IEEE-exact so only the display rounding is a
    protocol. On these near-isotropic synthetic embeddings mass_kept
    centers on sqrt(16/{_EMB_DIM}) = 0.5 — the number itself audits
    the corpus's isotropy."""
    embs = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") % 25 == 0
    )
    tv = F.slice("embedding", 1, 16)
    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731
    tnorm = F.sqrt(
        F.aggregate(tv, F.lit(0.0), sq)
    )
    fnorm = F.sqrt(F.aggregate("embedding", F.lit(0.0), sq))
    t = embs.select(
        "vec_id",
        tv.alias("tv"),
        tnorm.alias("tnorm"),
        fnorm.alias("fnorm"),
    )
    return t.select(
        "vec_id",
        F.round(F.col("tnorm"), 6).alias("trunc_norm"),
        F.round(F.col("tnorm") / F.col("fnorm"), 6).alias("mass_kept"),
        F.round(
            F.element_at("tv", 1).cast("double") / F.col("tnorm"), 6
        ).alias("renorm_d1"),
        F.round(
            F.element_at("tv", 16).cast("double") / F.col("tnorm"), 6
        ).alias("renorm_d16"),
    )


@_register(
    "orders_bool_aggs",
    """SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       count_if(o_orderstatus = 'F')::BIGINT AS n_finished,
       min(o_orderkey) AS first_key
FROM orders GROUP BY o_orderpriority""",
)
def q_orders_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-aggregate surface (bool_and / bool_or / count_if) —
    the assertion-style rollups data-quality checks compile to.
    any_value is EXCLUDED by design: it is nondeterministic under
    parallel aggregation in both engines; min() is the deterministic
    stand-in."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias(
            "any_over_400k"
        ),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.min("o_orderkey").alias("first_key"),
    )


@_register(
    "lineitem_ks_test",
    """WITH g AS (
  SELECT l_quantity AS v,
         count_if(l_returnflag = 'R')::BIGINT AS c1,
         count_if(l_returnflag = 'N')::BIGINT AS c2
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY l_quantity),
n AS (SELECT sum(c1)::DOUBLE AS n1, sum(c2)::DOUBLE AS n2 FROM g),
ecdf AS (
  SELECT v,
         sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / n1
           AS f1,
         sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) / n2
           AS f2
  FROM g, n)
SELECT round(max(abs(f1 - f2)), 6) AS ks_stat,
       (SELECT n1::BIGINT FROM n) AS n_returned,
       (SELECT n2::BIGINT FROM n) AS n_normal
FROM ecdf""",
)
def q_lineitem_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: max ECDF gap between
    returned and normal lineitems' quantity distributions — the
    distribution-drift test behind data-shift monitors.

    KS needs a global value ordering, but the ECDF runs over the
    DISTINCT-VALUE relation (50 integer quantities), not the rows —
    the counts aggregate first (one shuffle), then the cumulative
    window is 50 rows. ECDF values are exact-integer ratios (one
    IEEE division each); cumulative sums of integers are exact, so
    the KS statistic is deterministic to the final rounding."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin("R", "N")
    )
    g = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count_if(F.col("l_returnflag") == "R").alias("c1"),
        F.count_if(F.col("l_returnflag") == "N").alias("c2"),
    )
    n = g.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = g.join(F.broadcast(n)).select(
        (F.sum("c1").over(w) / F.col("n1")).alias("f1"),
        (F.sum("c2").over(w) / F.col("n2")).alias("f2"),
        "n1",
        "n2",
    )
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("f1") - F.col("f2"))), 6).alias(
            "ks_stat"
        ),
        F.max("n1").cast("bigint").alias("n_returned"),
        F.max("n2").cast("bigint").alias("n_normal"),
    )


@_register(
    "customer_revenue_gini",
    """WITH cr AS (
  SELECT o_custkey,
         sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS revenue
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT revenue::DOUBLE AS r,
         row_number() OVER (ORDER BY revenue, o_custkey) AS i
  FROM cr),
s AS (SELECT count(*)::DOUBLE AS n, sum(r) AS total,
             sum(i * r) AS weighted
      FROM ranked)
SELECT n::BIGINT AS n_customers,
       round(total, 2) AS total_revenue,
       round(2 * weighted / (n * total) - (n + 1) / n, 6) AS gini
FROM s""",
)
def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration (0 = equal,
    1 = one whale) — the inequality KPI for account risk. Uses the
    rank-weighted closed form 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending revenue.

    The rank window is global but over the CUSTOMER aggregate
    (dimension-sized); revenue is decimal-exact so ranking ties break
    on the key deterministically. The weighted sum is a double
    aggregate — order-nondeterministic — so only the final Gini
    rounds; with n*total ~ 1e12 the quotient's ulp noise sits at
    1e-15, far under 6dp."""
    o = load_table(spark, "orders", sf_dir)
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("revenue")
    )
    wr = Window.orderBy("revenue", "o_custkey")
    ranked = cr.select(
        F.col("revenue").cast("double").alias("r"),
        F.row_number().over(wr).alias("i"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("r").alias("total"),
        F.sum(F.col("i") * F.col("r")).alias("weighted"),
    )
    n, total, weighted = F.col("n"), F.col("total"), F.col("weighted")
    return s.select(
        n.cast("bigint").alias("n_customers"),
        F.round(total, 2).alias("total_revenue"),
        F.round(
            F.lit(2) * weighted / (n * total) - (n + 1) / n, 6
        ).alias("gini"),
    )


@_register(
    "orders_benford_profile",
    """WITH d AS (
  SELECT left(floor(o_totalprice)::BIGINT::VARCHAR, 1)::INT
           AS first_digit
  FROM orders WHERE o_totalprice >= 1),
n AS (SELECT count(*)::DOUBLE AS total FROM d)
SELECT first_digit,
       count(*) AS observed,
       round(count(*) / total, 6) AS observed_share,
       round(ln(1.0 + 1.0 / first_digit) / ln(10.0), 6)
         AS benford_share,
       round(count(*) / total
             - round(ln(1.0 + 1.0 / first_digit) / ln(10.0), 6), 6)
         AS deviation
FROM d, n GROUP BY first_digit, total""",
)
def q_orders_benford_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the
    classic fabricated-data screen. (Synthetic uniform-ish prices
    will NOT follow Benford; the deviation column is the point.)

    Digit extraction goes through floor->bigint->string — integer
    exact, immune to float-repr formatting differences between
    engines. ln is libm so the Benford expectation is rounded, and
    the observed share is an exact-integer ratio; the group count is
    at most 9 rows out of one partial-aggregated scan."""
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") >= 1
    )
    d = o.select(
        F.expr(
            "CAST(left(CAST(CAST(floor(o_totalprice) AS BIGINT)"
            " AS STRING), 1) AS INT)"
        ).alias("first_digit")
    )
    total = d.count()
    benford = F.round(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("first_digit"))
        / F.log(F.lit(10.0)),
        6,
    )
    return d.groupBy("first_digit").agg(
        F.count(F.lit(1)).alias("observed"),
        F.round(
            F.count(F.lit(1)) / F.lit(float(total)), 6
        ).alias("observed_share"),
        benford.alias("benford_share"),
        F.round(
            F.count(F.lit(1)) / F.lit(float(total)) - benford, 6
        ).alias("deviation"),
    )


from knn_using_hadoop_spark.operators.linalg import (  # noqa: E402
    logreg_calibration,
    logreg_calibration_oracle_sql,
)


@_register(
    "lineitem_logreg_calibration",
    logreg_calibration_oracle_sql(
        _LOGREG_FEATS_SQL, ["x1", "x2", "x3"], "y"
    ),
)
def q_lineitem_logreg_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability diagram for the GD-trained returnflag model:
    decile buckets of predicted probability vs actual positive rate
    (operators/linalg.py::logreg_calibration) — probabilities only
    earn trust if mean_pred tracks actual_rate per bucket. Shares the
    exact fit loop (and rounding protocol) with
    lineitem_logreg_returnflag; one extra aggregate scan."""
    feats = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_quantity") / 50).alias("x1"),
        (F.col("l_discount") * 10).alias("x2"),
        (F.col("l_tax") * 10).alias("x3"),
        F.when(F.col("l_returnflag") == "R", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    return logreg_calibration(feats, ["x1", "x2", "x3"], "y")


@_register(
    "events_window_frames",
    """SELECT user_id, event_id, ts, value,
       first_value(value) OVER w_full AS first_val,
       nth_value(value, 2) OVER w_full AS second_val,
       last_value(value) OVER w_full AS last_val,
       round(sum(value) OVER w_rest, 6) AS remaining_spend,
       count(*) OVER w_full AS n_in_series
FROM events WHERE user_id % 40 = 0
WINDOW
  w_full AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING),
  w_rest AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""",
)
def q_events_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame completeness: full-partition frames (first/nth/
    last over UNBOUNDED..UNBOUNDED — the frame that makes last_value
    actually mean 'last', not 'current') and the REVERSE running
    frame (CURRENT..UNBOUNDED FOLLOWING = spend still to come, the
    burn-down column). One Exchange + one sort serves all five
    functions — every frame shares the same partitioning and
    ordering, and Catalyst fuses them into a single Window node."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id") % 40 == 0
    )
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rest = base.rowsBetween(0, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.first("value").over(w_full).alias("first_val"),
        F.nth_value("value", 2).over(w_full).alias("second_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.round(F.sum("value").over(w_rest), 6).alias(
            "remaining_spend"
        ),
        F.count(F.lit(1)).over(w_full).alias("n_in_series"),
    )


@_register(
    "events_timezone_surface",
    """SELECT event_id, ts,
       timezone('America/New_York', ts::TIMESTAMPTZ)::TIMESTAMP
         AS ts_ny,
       timezone('Asia/Tokyo', ts::TIMESTAMPTZ)::TIMESTAMP AS ts_tokyo,
       hour(timezone('America/New_York', ts::TIMESTAMPTZ))::INT
         AS hour_ny,
       (hour(timezone('Asia/Tokyo', ts::TIMESTAMPTZ)) BETWEEN 9 AND 17)
         AS tokyo_business_hours
FROM events WHERE event_id % 60 = 0""",
)
def q_events_timezone_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Timezone conversion surface: UTC event instants rendered as
    local wall-clock in two zones (DST-aware — America/New_York
    shifts across the corpus's date range, so the offset is NOT
    constant) plus local-business-hours flags. Spark's
    from_utc_timestamp(ts, z) == DuckDB's
    timezone(z, ts::TIMESTAMPTZ) under the pinned-UTC session (naive
    == instant); both consult the IANA tzdb, so parity also pins
    that the two runtimes carry compatible zone data."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_id") % 60 == 0
    )
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tk = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return ev.select(
        "event_id",
        "ts",
        ny.alias("ts_ny"),
        tk.alias("ts_tokyo"),
        F.hour(ny).cast("int").alias("hour_ny"),
        F.hour(tk).between(9, 17).alias("tokyo_business_hours"),
    )


@_register(
    "doc_source_kl",
    """WITH tk AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents),
src_cnt AS (
  SELECT source, tok, count(*)::BIGINT AS c FROM tk
  GROUP BY source, tok),
src_tot AS (
  SELECT source, sum(c)::DOUBLE AS n FROM src_cnt GROUP BY source),
all_cnt AS (
  SELECT tok, sum(c)::BIGINT AS c_all FROM src_cnt GROUP BY tok),
all_tot AS (SELECT sum(c_all)::DOUBLE AS n_all FROM all_cnt)
SELECT s.source,
       st.n::BIGINT AS n_tokens,
       round(sum((s.c / st.n)
                 * ln((s.c / st.n) / (a.c_all / t.n_all))), 5)
         AS kl_from_corpus
FROM src_cnt s
JOIN src_tot st ON st.source = s.source
JOIN all_cnt a ON a.tok = s.tok
CROSS JOIN all_tot t
GROUP BY s.source, st.n""",
)
def q_doc_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the
    corpus distribution — the domain-shift meter behind mixture
    reweighting (a source with high KL is the one dragging the
    model; compare against domain_mixture_weights). No smoothing
    needed: every source token exists in the corpus marginal by
    construction (q > 0 wherever p > 0).

    Two aggregation passes over the (source, token) count relation —
    vocab-sized, not corpus-sized; marginals broadcast back. Each
    term's ln carries libm ulp, so only the SUM is rounded (5dp;
    per-term noise ~1e-16 x |vocab| stays under 1e-11)."""
    tk = load_docs_wide(spark, sf_dir).select(
        "source", F.explode(_text.tokens("text")).alias("tok")
    )
    src_cnt = tk.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    src_tot = src_cnt.groupBy("source").agg(
        F.sum("c").cast("double").alias("n")
    )
    all_cnt = src_cnt.groupBy("tok").agg(
        F.sum("c").alias("c_all")
    )
    n_all = float(
        all_cnt.agg(F.sum("c_all")).collect()[0][0]
    )
    p = F.col("c") / F.col("n")
    q = F.col("c_all") / F.lit(n_all)
    return (
        src_cnt.join(F.broadcast(src_tot), "source")
        .join(all_cnt, "tok")
        .groupBy("source", "n")
        .agg(
            F.round(F.sum(p * F.log(p / q)), 5).alias(
                "kl_from_corpus"
            )
        )
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            "kl_from_corpus",
        )
    )


@_register(
    "events_user_entropy",
    """WITH c AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, sum(n)::DOUBLE AS total,
             count(*)::INT AS n_types
      FROM c GROUP BY user_id)
SELECT c.user_id, t.n_types,
       round(-sum((n / total) * ln(n / total)), 5) AS entropy,
       round(CASE WHEN t.n_types = 1 THEN 0.0
                  ELSE -sum((n / total) * ln(n / total))
                       / ln(t.n_types) END, 5) AS entropy_norm
FROM c JOIN t ON t.user_id = c.user_id
WHERE c.user_id % 15 = 0
GROUP BY c.user_id, t.n_types, t.total""",
)
def q_events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's
    event-type mix, plus the [0,1] normalization by ln(k) —
    single-type users pin 0 explicitly (0/0 guard). Segmentation
    feature for exploration-vs-habit scoring.

    Both aggregates and the join share the user key; the per-user
    type relation is at most |event_types| rows. Probabilities are
    exact-integer ratios; only the ln-sum rounds."""
    ev = load_table(spark, "events", sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("user_id").agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("int").alias("n_types"),
    )
    p = F.col("n") / F.col("total")
    ent = -F.sum(p * F.log(p))
    return (
        c.join(t, "user_id")
        .filter(F.col("user_id") % 15 == 0)
        .groupBy("user_id", "n_types", "total")
        .agg(
            F.round(ent, 5).alias("entropy"),
            F.round(
                F.when(F.col("n_types") == 1, F.lit(0.0)).otherwise(
                    ent / F.log(F.col("n_types").cast("double"))
                ),
                5,
            ).alias("entropy_norm"),
        )
        .select("user_id", "n_types", "entropy", "entropy_norm")
    )


@_register(
    "events_theil_sen_trend",
    """WITH daily AS (
  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day_idx,
         round(avg(value), 6) AS m
  FROM events GROUP BY day_idx),
slopes AS (
  SELECT (b.m - a.m) / (b.day_idx - a.day_idx) AS s
  FROM daily a JOIN daily b ON b.day_idx > a.day_idx)
SELECT count(*) AS n_pairs,
       round(quantile_cont(s, 0.5)::DOUBLE, 6) AS theil_sen_slope
FROM slopes""",
)
def q_events_theil_sen_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-Sen robust trend: the MEDIAN of all pairwise slopes of
    the daily-mean series — immune to the outlier days that drag OLS
    (compare events_ols_trend). The O(days²) pair join is over the
    DAY relation (~75 rows at sf0.1 — thousands of pairs, trivially
    bounded; at 100 TB the day count, not the row count, drives it).

    Daily means round before pairing, so each slope is one exact
    IEEE division of identical inputs cross-engine; the median
    interpolates between exact slopes."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.expr(
            "unix_micros(date_trunc('day', ts)) div 86400000000"
        ).alias("day_idx")
    ).agg(F.round(F.avg("value"), 6).alias("m"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b, F.col("b.day_idx") > F.col("a.day_idx")
    ).select(
        (
            (F.col("b.m") - F.col("a.m"))
            / (F.col("b.day_idx") - F.col("a.day_idx"))
        ).alias("s")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(s, 0.5)"), 6).alias(
            "theil_sen_slope"
        ),
    )


@_register(
    "dedup_normalized_exact",
    """WITH norm AS (
  SELECT doc_id,
         regexp_replace(
           trim(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))),
           ' +', ' ', 'g') AS canon
  FROM documents),
grp AS (
  SELECT canon, count(*)::BIGINT AS n_docs,
         min(doc_id) AS keeper_id
  FROM norm GROUP BY canon)
SELECT count(*)::BIGINT AS n_canonical,
       sum(n_docs)::BIGINT AS n_docs_total,
       sum(n_docs - 1)::BIGINT AS n_removed,
       count_if(n_docs > 1)::BIGINT AS n_groups_with_dups
FROM grp""",
)
def q_dedup_normalized_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact dedup on NORMALIZED text (casefold, strip punctuation,
    collapse whitespace) — what production pipelines actually key on:
    raw-byte dedup misses the 'same doc, different quoting' near-
    misses that normalization folds together. Reports the dedup
    yield (removed count, dup-group count) against raw totals.

    Normalization is three scalar regex ops in the scan projection
    (JVM-side, pushed into the same stage as the read); the dedup
    itself is one partial-aggregated groupBy on the canonical string.
    The regex subset ([^a-zA-Z0-9 ], ' +') behaves identically in
    Java regex and RE2. At 100 TB you'd hash the canonical form to a
    fixed-width key first (dedup_exact's trick) — kept as the string
    here so the oracle also pins the normalization itself."""
    docs = load_docs_wide(spark, sf_dir)
    canon = F.regexp_replace(
        F.trim(
            F.lower(
                F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", "")
            )
        ),
        " +",
        " ",
    )
    grp = docs.select(canon.alias("canon")).groupBy("canon").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return grp.agg(
        F.count(F.lit(1)).alias("n_canonical"),
        F.sum("n_docs").cast("bigint").alias("n_docs_total"),
        F.sum(F.col("n_docs") - 1).cast("bigint").alias("n_removed"),
        F.count_if(F.col("n_docs") > 1).alias("n_groups_with_dups"),
    )


@_register(
    "corpus_token_budget_plan",
    """WITH src AS (
  SELECT source,
         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(n_tokens)::DOUBLE AS total FROM src),
alloc AS (
  SELECT source, n_tokens,
         floor(1000000 * n_tokens / total)::BIGINT AS base_alloc,
         1000000 * n_tokens / total
           - floor(1000000 * n_tokens / total) AS frac
  FROM src, tot),
extra AS (
  SELECT (1000000 - sum(base_alloc))::BIGINT AS remainder FROM alloc),
ranked AS (
  SELECT source, n_tokens, base_alloc,
         row_number() OVER (ORDER BY frac DESC, source) AS pos
  FROM alloc)
SELECT source, n_tokens, base_alloc,
       (base_alloc + CASE WHEN pos <= (SELECT remainder FROM extra)
                          THEN 1 ELSE 0 END)::BIGINT AS final_alloc
FROM ranked""",
)
def q_corpus_token_budget_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget allocation: distribute a 1M-token training budget
    across sources proportionally with LARGEST-REMAINDER rounding —
    floors sum short, and the remainder goes to the largest
    fractional parts, so the allocations sum EXACTLY to the budget
    (naive per-source rounding doesn't; the training-mix planner
    needs the invariant).

    All arithmetic on exact integers and one shared division; the
    fractional-part ranking is a window over the SOURCE relation
    with a name tiebreak. The invariant sum(final_alloc) == budget
    is pinned in pytest."""
    docs = load_docs_wide(spark, sf_dir)
    budget = 1000000
    src = docs.groupBy("source").agg(
        F.sum(F.size(_text.tokens("text")))
        .cast("bigint")
        .alias("n_tokens")
    )
    total = float(src.agg(F.sum("n_tokens")).collect()[0][0])
    share = F.lit(budget) * F.col("n_tokens") / F.lit(total)
    alloc = src.select(
        "source",
        "n_tokens",
        F.floor(share).cast("bigint").alias("base_alloc"),
        (share - F.floor(share)).alias("frac"),
    )
    remainder = budget - alloc.agg(
        F.sum("base_alloc")
    ).collect()[0][0]
    wr = Window.orderBy(F.col("frac").desc(), "source")
    return alloc.select(
        "source",
        "n_tokens",
        "base_alloc",
        (
            F.col("base_alloc")
            + F.when(
                F.row_number().over(wr) <= F.lit(int(remainder)), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("final_alloc"),
    )


@_register(
    "part_price_outliers_iqr",
    """WITH q AS (
  SELECT p_brand,
         round(quantile_cont(p_retailprice, 0.25)::DOUBLE, 6) AS q1,
         round(quantile_cont(p_retailprice, 0.75)::DOUBLE, 6) AS q3
  FROM part GROUP BY p_brand)
SELECT p.p_brand,
       count(*) AS n_parts,
       round(q1, 2) AS q1, round(q3, 2) AS q3,
       count_if(p_retailprice < q1 - 1.5 * (q3 - q1)
                OR p_retailprice > q3 + 1.5 * (q3 - q1))::BIGINT
         AS n_outliers
FROM part p JOIN q ON q.p_brand = p.p_brand
GROUP BY p.p_brand, q1, q3""",
)
def q_part_price_outliers_iqr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tukey IQR fences per brand (1.5x IQR beyond the quartiles) —
    the boxplot outlier rule, completing the robust-outlier family
    (z-score: rolling_anomaly, MAD: mad_outliers, winsorize:
    winsorized_stats — each clips a different failure mode).
    Quartiles round before the fence comparison (the winsorize
    protocol); the brand-quartile relation broadcasts back."""
    p = load_table(spark, "part", sf_dir)
    q = p.groupBy("p_brand").agg(
        F.round(F.expr("percentile(p_retailprice, 0.25)"), 6).alias(
            "q1"
        ),
        F.round(F.expr("percentile(p_retailprice, 0.75)"), 6).alias(
            "q3"
        ),
    )
    iqr = F.col("q3") - F.col("q1")
    outside = (
        F.col("p_retailprice") < F.col("q1") - 1.5 * iqr
    ) | (F.col("p_retailprice") > F.col("q3") + 1.5 * iqr)
    return (
        p.join(F.broadcast(q), "p_brand")
        .groupBy("p_brand", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_if(outside).alias("n_outliers"),
        )
        .select(
            "p_brand",
            "n_parts",
            F.round("q1", 2).alias("q1"),
            F.round("q3", 2).alias("q3"),
            "n_outliers",
        )
    )


@_register(
    "orders_backlog_aging",
    """WITH ref AS (SELECT max(o_orderdate) AS now FROM orders),
open_o AS (
  SELECT datediff('day', o_orderdate, now) AS age_days, o_totalprice
  FROM orders, ref WHERE o_orderstatus = 'O')
SELECT CASE WHEN age_days <= 30 THEN '00-30'
            WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       count(*) AS n_orders,
       sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS open_value,
       min(age_days)::INT AS min_age,
       max(age_days)::INT AS max_age
FROM open_o GROUP BY age_bucket""",
)
def q_orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: open orders bucketed by days
    outstanding, with decimal-exact open value per bucket — the ops
    dashboard staple. 'Now' is the corpus's max order date (a 1-row
    aggregate broadcast into the scan) so the query is deterministic
    and re-runnable; ages are integer datediffs, buckets are CASE on
    exact integers."""
    o = load_table(spark, "orders", sf_dir)
    ref = o.agg(F.max("o_orderdate").alias("now"))
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(ref))
        .select(
            F.datediff(F.col("now"), F.col("o_orderdate")).alias(
                "age_days"
            ),
            "o_totalprice",
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "00-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return open_o.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("open_value"),
        F.min("age_days").cast("int").alias("min_age"),
        F.max("age_days").cast("int").alias("max_age"),
    )


@_register(
    "orders_interarrival_profile",
    """WITH gaps AS (
  SELECT o_custkey,
         datediff('day',
                  lag(o_orderdate) OVER
                    (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders),
per_cust AS (
  SELECT o_custkey, count(*)::BIGINT AS n_gaps,
         round(avg(gap_days), 4) AS mean_gap,
         round(quantile_cont(gap_days, 0.5)::DOUBLE, 4) AS median_gap,
         max(gap_days)::INT AS max_gap
  FROM gaps WHERE gap_days IS NOT NULL
  GROUP BY o_custkey)
SELECT * FROM per_cust WHERE o_custkey % 25 = 0""",
)
def q_orders_interarrival_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order inter-arrival profile: per-customer gaps between
    consecutive orders (mean/median/max days) — the purchase-rhythm
    feature behind churn prediction (a gap far beyond the customer's
    own median is the churn signal, not any global threshold).

    Lag window and aggregate share the customer partitioning — one
    Exchange; gaps are integer datediffs (ties broken by order key
    for a deterministic lag), so the only float is the rounded mean
    and the exact-interpolation median."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_days"), 4).alias("mean_gap"),
            F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias(
                "median_gap"
            ),
            F.max("gap_days").cast("int").alias("max_gap"),
        )
        .filter(F.col("o_custkey") % 25 == 0)
    )


@_register(
    "doc_vocab_growth",
    """WITH bounds AS (
  SELECT ((max(doc_id) * p) // 10)::BIGINT AS doc_cut, p
  FROM documents, unnest(generate_series(1, 10)) t(p)
  GROUP BY p),
tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       FROM documents)
SELECT b.p * 10 AS pct_docs,
       count(CASE WHEN tk.doc_id <= b.doc_cut THEN 1 END)::BIGINT
         AS n_tokens,
       count(DISTINCT CASE WHEN tk.doc_id <= b.doc_cut
                           THEN tk.tok END)::BIGINT AS vocab_size
FROM tk CROSS JOIN bounds b
GROUP BY b.p""",
)
def q_doc_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-vocabulary size
    at 10%..100% corpus checkpoints (by doc id) — sublinear growth is
    the expected signature; a LINEAR curve means the corpus keeps
    introducing novel junk (OCR noise, random ids) and the tokenizer
    budget will not amortize.

    One pass: the token stream cross-joins the 10-row checkpoint
    relation (broadcast — fan-out x10 on the vocab-bound stream,
    the bounded-explode trick again) and each checkpoint's
    conditional DISTINCT collapses in the same two-phase aggregate.
    All counts integer-exact."""
    docs = load_docs_wide(spark, sf_dir)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    bounds = spark.createDataFrame(
        [(p, max_id * p // 10) for p in range(1, 11)],
        "p int, doc_cut bigint",
    )
    tk = docs.select(
        "doc_id", F.explode(_text.tokens("text")).alias("tok")
    )
    inside = F.col("doc_id") <= F.col("doc_cut")
    return (
        tk.crossJoin(F.broadcast(bounds))
        .groupBy("p")
        .agg(
            F.count(F.when(inside, 1)).cast("bigint").alias(
                "n_tokens"
            ),
            F.count_distinct(
                F.when(inside, F.col("tok"))
            ).cast("bigint").alias("vocab_size"),
        )
        .select(
            (F.col("p") * 10).cast("bigint").alias("pct_docs"),
            "n_tokens",
            "vocab_size",
        )
    )
