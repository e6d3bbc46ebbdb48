"""Relational operators composed from DataFrame primitives."""

from knn_using_hadoop_spark.operators.dedup import (
    append_dedup_index,
    append_dedup_index_stream,
    build_dedup_index,
    compact_dedup_index,
    dedup_exact,
    dedup_incremental_near,
    delete_from_dedup_index,
    describe_dedup_index,
    evaluate_dedup_index,
    minhash_lsh_pairs,
    query_dedup_index,
    tune_dedup_threshold,
    minhash_signatures,
    neardup_components,
    neardup_components_star,
    ngram_jaccard_pairs,
    simhash,
)
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.operators.graph import (
    bfs_depths,
    bfs_depths_converged,
    pagerank,
    pagerank_converged,
    triangle_count,
)
from knn_using_hadoop_spark.operators.joins import bloom_pruned_join
from knn_using_hadoop_spark.operators.multimodal import (
    attach_media,
    binary_stats,
    decode_media,
    frame_sample,
)
from knn_using_hadoop_spark.operators.knn_approx import (
    knn_approx_neighbors,
    knn_approx_predict,
)
from knn_using_hadoop_spark.operators.pipeline import (
    chunk_windows,
    dedup_incremental,
    pack_greedy,
)
from knn_using_hadoop_spark.operators.retrieval import (
    bm25_topk,
    doc_vectors,
    maxp_doc_topk,
    more_like_this,
    rrf_fuse,
)
from knn_using_hadoop_spark.operators.sketches import kmv_distinct
from knn_using_hadoop_spark.operators.similarity import (
    cosine_classify,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
from knn_using_hadoop_spark.operators.skew import (
    key_skew_profile,
    salted_count_sum,
    salted_join_big_to_skewed,
)
from knn_using_hadoop_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    mllib_tfidf,
    quality_score,
    token_stats,
)
from knn_using_hadoop_spark.operators.topk import top_k_per_group

__all__ = [
    "knn_neighbors",
    "knn_predict",
    "knn_vote_histogram",
    "knn_accuracy",
    "knn_approx_neighbors",
    "knn_approx_predict",
    "top_k_per_group",
    "append_dedup_index",
    "append_dedup_index_stream",
    "build_dedup_index",
    "compact_dedup_index",
    "dedup_exact",
    "dedup_incremental_near",
    "delete_from_dedup_index",
    "describe_dedup_index",
    "evaluate_dedup_index",
    "query_dedup_index",
    "tune_dedup_threshold",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "neardup_components",
    "neardup_components_star",
    "simhash",
    "cosine_topk",
    "cosine_classify",
    "lsh_bucket_topk",
    "ivf_topk",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "mllib_tfidf",
    "salted_count_sum",
    "salted_join_big_to_skewed",
    "key_skew_profile",
    "chunk_windows",
    "pack_greedy",
    "dedup_incremental",
    "kmv_distinct",
    "bloom_pruned_join",
    "pagerank",
    "pagerank_converged",
    "bfs_depths",
    "bfs_depths_converged",
    "triangle_count",
    "bm25_topk",
    "doc_vectors",
    "maxp_doc_topk",
    "more_like_this",
    "rrf_fuse",
    "attach_media",
    "binary_stats",
    "decode_media",
    "frame_sample",
]
