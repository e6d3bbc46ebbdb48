"""Exact k-nearest-neighbor classification as composable DataFrame ops.

This is the reference engine's entire query surface (SURVEY.md §2),
re-expressed Spark-first. The reference pipeline
(``/root/reference/src/main/java/Hadoop.java``):

* broadcast of the test set by node-local file re-read (``Hadoop.java:66-71``)
  → ``F.broadcast(test)`` here (a real BroadcastExchange);
* nested-loop cross join train × test (``Hadoop.java:104-107``) →
  ``crossJoin`` (BroadcastNestedLoopJoin, whole-stage codegen'd);
* squared-Euclidean distance, label excluded, no sqrt
  (``Hadoop.java:155-165``) → one Catalyst expression (functions.distance);
* hand-rolled map-side partial top-k + single-reducer merge
  (``Hadoop.java:73-142,194-239``) → ``row_number()`` over
  ``(PARTITION BY test_id ORDER BY dist, train_id)`` with a ``<= k``
  filter; Spark's InferWindowGroupLimit inserts the partial top-k
  below the shuffle, so shuffle volume is O(partitions·|test|·k) —
  exactly the reference's combiner effect, but planner-derived and
  correct across any number of partitions (the reference's merge
  drops candidates whenever >1 map task, ``Hadoop.java:211``);
* vote histogram + argmax (``Hadoop.java:243-268``) → hash aggregate
  + ``max_by`` over a (cnt, -label) struct. Correct counting (the
  reference undercounts by one, ``Hadoop.java:250-252``) and a
  deterministic tie-break (lowest label wins; the reference is
  HashMap-iteration-order nondeterministic, ``Hadoop.java:260-268``).

Intentional divergences from reference bugs are documented in
FIXTURES.md and encoded in the oracles.

Scale notes (100 TB design):

* The train side is the streamed/partitioned big relation; only the
  test/query side is broadcast. If the test side outgrows broadcast
  range, switch to ``knn_approx`` (LSH) — an exact all-pairs KNN at
  that scale is the wrong query.
* No driver-side state: every stage is a DataFrame transform, so the
  plan parallelizes over test_id and AQE handles skew/coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.distance import (
    cosine_similarity,
    manhattan_distance,
    sq_euclidean,
)

_METRICS = {
    "sqeuclidean": sq_euclidean,
    "manhattan": manhattan_distance,
    # Nearest under cosine = highest similarity, so distance = 1 - sim.
    # A zero-norm vector has no direction: its similarity is NaN, and
    # NaN would silently break the prefilter (dist <= tau is false for
    # NaN, so prefiltered and unfiltered paths would diverge — ADVICE
    # r1). Map it to the maximum cosine distance 2.0 instead: total,
    # finite ordering, zero vectors rank last, prefilter proof holds.
    "cosine": lambda a, b, dim=None: F.nanvl(
        F.lit(1.0) - cosine_similarity(a, b), F.lit(2.0)
    ),
}


def _distance(metric: str, a: Column, b: Column, dim: int | None) -> Column:
    try:
        return _METRICS[metric](a, b, dim)
    except KeyError:
        raise ValueError(
            f"unknown metric {metric!r}; choose from {sorted(_METRICS)}"
        ) from None


def knn_neighbors(
    train: DataFrame,
    test: DataFrame,
    k: int,
    *,
    metric: str = "sqeuclidean",
    broadcast_test: bool = True,
    dim: int | None = None,
    prefilter: bool = True,
    prefilter_sample: int = 1024,
) -> DataFrame:
    """k nearest train rows per test row.

    Inputs are feature-projected tables (see ``with_features``):
    ``train`` = (id, features, label), ``test`` = (id, features).
    Returns ``(test_id, rank, train_id, label, dist)`` with rank 1..k
    ordered by (dist asc, train_id asc) — the deterministic tie-break
    the reference lacks.

    ``prefilter`` (the scale path): even with WindowGroupLimit's
    partial top-k, the window operator must SORT every scored pair
    within each partition — at |train|x|test| pairs that sort, not the
    distance arithmetic, dominates (measured 360M pairs: ~6s compute
    vs ~240s sort+window at sf0.1). So first score a bounded train
    sample, take each test row's k-th smallest sample distance as an
    upper bound tau (the true k-th distance over ALL train rows can
    only be <= tau), and filter the full scored relation to
    ``dist <= tau`` before the window. The filter keeps every true
    neighbor by construction — results are exactly identical — but
    the window now sorts ~|test| * (k / sample) * |train| expected
    rows instead of the full cross product. Pure Catalyst: the
    threshold relation is a tiny broadcast hash join.

    Sizing: sample-pass cost grows with sample x |test| while the
    survivor count shrinks as |train| / sample — the optimum is near
    sqrt(k * |train|). Measured (32 threads): 600 x 600k pairs ran
    17.2s at sample=8192 vs 5.8s at 1024; 1718 x 31k ran 20.1s vs
    2.9s at 512. Default 1024 sits near the optimum for both.
    """
    t = test.select(
        F.col("id").alias("test_id"), F.col("features").alias("q")
    )
    tr = train.select(
        F.col("id").alias("train_id"),
        F.col("features").alias("x"),
        F.col("label"),
    )

    def score(side: DataFrame) -> DataFrame:
        pairs = side.crossJoin(F.broadcast(t) if broadcast_test else t)
        return pairs.select(
            "test_id",
            "train_id",
            "label",
            _distance(metric, F.col("q"), F.col("x"), dim).alias("dist"),
        )

    scored = score(tr)
    w = Window.partitionBy("test_id").orderBy(
        F.col("dist").asc(), F.col("train_id").asc()
    )
    if prefilter:
        # Any train subset yields a valid upper bound, so limit() is
        # fine; <= keeps distance ties, so no true neighbor is lost.
        sample = tr.limit(max(prefilter_sample, k))
        sw = Window.partitionBy("test_id").orderBy(F.col("dist").asc())
        thresholds = (
            score(sample)
            .select("test_id", "dist")
            .withColumn("rn", F.row_number().over(sw))
            .filter(F.col("rn") <= k)
            .groupBy("test_id")
            .agg(F.max("dist").alias("knn_thr"))
        )
        scored = (
            scored.join(F.broadcast(thresholds), "test_id")
            .filter(F.col("dist") <= F.col("knn_thr"))
            .drop("knn_thr")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        # rank <= k right after row_number => InferWindowGroupLimit
        # plants the partial top-k below the shuffle (map-side combine).
        .filter(F.col("rank") <= k)
        .select("test_id", "rank", "train_id", "label", "dist")
    )


def knn_vote_histogram(neighbors: DataFrame) -> DataFrame:
    """Vote counts per (test_id, label) among the k neighbors.

    True counts — the reference stores first-sighting = 0
    (``Hadoop.java:250-252``); we do not reproduce that bug.
    """
    return neighbors.groupBy("test_id", "label").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def knn_predict(
    train: DataFrame,
    test: DataFrame,
    k: int,
    *,
    metric: str = "sqeuclidean",
    dim: int | None = None,
    prefilter: bool = True,
    prefilter_sample: int = 1024,
) -> DataFrame:
    """Majority-vote class per test row: ``(test_id, prediction)``.

    Tie-break: highest count, then lowest label id (deterministic;
    reference uses HashMap iteration order, ``Hadoop.java:260-268``).
    """
    votes = knn_vote_histogram(
        knn_neighbors(
            train,
            test,
            k,
            metric=metric,
            dim=dim,
            prefilter=prefilter,
            prefilter_sample=prefilter_sample,
        )
    )
    return (
        votes.groupBy("test_id")
        .agg(
            F.max_by(
                F.col("label"),
                F.struct(F.col("cnt"), (-F.col("label")).alias("neg_label")),
            ).alias("prediction")
        )
        .orderBy("test_id")
    )


def knn_accuracy(predictions: DataFrame, truth: DataFrame) -> DataFrame:
    """Single-row ``(accuracy)`` = avg(prediction == label).

    The eval join replaces the reference's positional pairing of the
    re-read sink file with the re-read test file
    (``Hadoop.java:319-343``) — an equi-join on test_id, then an
    average; no driver-side file I/O.
    """
    joined = predictions.join(
        truth.select(F.col("id").alias("test_id"), "label"), "test_id"
    )
    return joined.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias(
            "accuracy"
        )
    )
