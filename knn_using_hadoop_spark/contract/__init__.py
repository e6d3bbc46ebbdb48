"""Flat facade over the split contract package.

The query registry lives in per-domain modules; importing them in
original definition order preserves registration order (REGISTRY
is an insertion-ordered dict), and the namespace merge below keeps
the historical flat ``contract.X`` surface (tests, bench.py,
__spark_entry__.py) fully compatible with the pre-split monolith.
"""

from knn_using_hadoop_spark.contract import (
    _base,
    knn_core,
    relational,
    text_dedup,
    engine_surface,
    featurization_ann,
    knn_variants,
    curation,
    pipeline_ops,
    bpe_sql_incr,
    windows_modeling,
    graph_queries,
    sequences_rfm,
    tranche_a,
    tranche_b,
    tranche_c,
    round3,
)

for _m in (
    _base,
    knn_core,
    relational,
    text_dedup,
    engine_surface,
    featurization_ann,
    knn_variants,
    curation,
    pipeline_ops,
    bpe_sql_incr,
    windows_modeling,
    graph_queries,
    sequences_rfm,
    tranche_a,
    tranche_b,
    tranche_c,
    round3,
):
    for _k in vars(_m):
        if not _k.startswith('__'):
            globals()[_k] = getattr(_m, _k)
del _m, _k
