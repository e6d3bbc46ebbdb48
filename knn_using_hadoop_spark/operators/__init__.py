"""Relational operators composed from DataFrame primitives."""

from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.operators.topk import top_k_per_group

__all__ = [
    "knn_neighbors",
    "knn_predict",
    "knn_vote_histogram",
    "knn_accuracy",
    "top_k_per_group",
]
