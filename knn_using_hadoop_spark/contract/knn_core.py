"""KNN family (reference parity: SURVEY.md §2 J1, A1-A6, O1-O2).

Split from the former monolithic contract.py (round 3); original lines 55-200. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.functions.features import assemble_features
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)

# noqa: E402  (split module: original source follows)
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


