"""Scalar / array column functions (JVM-side, codegen-friendly)."""

from knn_using_hadoop_spark.functions.distance import (
    cosine_similarity,
    dot,
    l2_norm,
    manhattan_distance,
    sq_euclidean,
)
from knn_using_hadoop_spark.functions.features import assemble_features
from knn_using_hadoop_spark.functions.hashing import portable_hash32, portable_hash64

__all__ = [
    "sq_euclidean",
    "manhattan_distance",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "assemble_features",
    "portable_hash32",
    "portable_hash64",
]
