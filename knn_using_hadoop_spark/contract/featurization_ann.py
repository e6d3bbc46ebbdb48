"""Text featurization (hashed TF-IDF, winnowing) + IVF approximate nearest neighbors.

Split from the former monolithic contract.py (round 3); original lines 1264-1601. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (
    KNN_FEATURES,
    KNN_K,
    KNN_TEST_MOD,
    knn_tables,
    load_docs_wide,
)
from knn_using_hadoop_spark.contract.relational import (queries)
from knn_using_hadoop_spark.contract.text_dedup import (
    _EMB_DIM,
    _H32,
    _SIM_QUERY_MOD,
    _sim_queries,
)

# noqa: E402  (split module: original source follows)
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


