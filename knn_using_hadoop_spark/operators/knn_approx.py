"""Approximate KNN via MLlib LSH (the 100 TB path for exact KNN).

SURVEY.md §2.11 / §7 slice 3: the reference's O(|train| x |test|)
cross join (``Hadoop.java:104-107``) cannot survive a 1000x scale-up.
``BucketedRandomProjectionLSH`` (random-projection buckets for
Euclidean distance) replaces the cross join with a bucket equi-join:
candidates are pairs that collide in at least one hash table, then
exact distances are computed only for candidates.

This operator is seeded and deterministic run-to-run, but its hash
planes come from MLlib's RNG — not expressible in the DuckDB oracle,
so the driver records a rows-only check; recall against the exact
operator is asserted in tests instead (tests/test_knn_approx.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def knn_approx_neighbors(
    train: DataFrame,
    test: DataFrame,
    k: int,
    *,
    bucket_length: float,
    num_hash_tables: int = 3,
    distance_threshold: float = float("inf"),
    seed: int = 42,
) -> DataFrame:
    """Approximate k nearest train rows per test row via LSH.

    Same input/output contract as ``knn.knn_neighbors``
    ((id, features, label) in, (test_id, rank, train_id, label, dist)
    out, dist = SQUARED Euclidean to match the exact operator), but
    only bucket-colliding candidates are scored. ``bucket_length``
    trades recall for cost (rule of thumb: the typical nearest-
    neighbor distance scale of the data).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    tr = train.select(
        F.col("id").alias("train_id"),
        array_to_vector(F.col("features")).alias("fv"),
        "label",
    )
    te = test.select(
        F.col("id").alias("test_id"),
        array_to_vector(F.col("features")).alias("fv"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="fv",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(tr)
    joined = model.approxSimilarityJoin(
        tr, te, distance_threshold, distCol="eucl"
    )
    scored = joined.select(
        F.col("datasetB.test_id").alias("test_id"),
        F.col("datasetA.train_id").alias("train_id"),
        F.col("datasetA.label").alias("label"),
        # exact operator reports squared euclidean (Hadoop.java:155-165)
        (F.col("eucl") * F.col("eucl")).alias("dist"),
    )
    w = Window.partitionBy("test_id").orderBy(
        F.col("dist").asc(), F.col("train_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("test_id", "rank", "train_id", "label", "dist")
    )


def knn_approx_predict(
    train: DataFrame,
    test: DataFrame,
    k: int,
    *,
    bucket_length: float,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Majority vote over approximate neighbors: (test_id, prediction)."""
    from knn_using_hadoop_spark.operators.knn import knn_vote_histogram

    votes = knn_vote_histogram(
        knn_approx_neighbors(
            train,
            test,
            k,
            bucket_length=bucket_length,
            num_hash_tables=num_hash_tables,
            seed=seed,
        )
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
