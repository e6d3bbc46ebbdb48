"""Graph family: co-occurrence edges -> degrees -> triangles -> PageRank.

Split from the former monolithic contract.py (round 3); original lines 3962-4066. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# Graph family: co-occurrence edges -> degrees -> triangles -> PageRank
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import graph as _graph  # noqa: E402

# Oversized (event_type, hour) groups are hash-threshold-SAMPLED to
# ~200 expected members (not dropped — drop semantics emptied the
# graph on a 100x uniform-growth corpus, NOTES r3): member survives
# iff md5(type|ts|user) < (200/g)*2^32. No window, no sort — mirrors
# operators/graph.py::cooccurrence_edges verbatim.
_EDGES_SQL = """WITH membr AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS grp_ts,
         user_id
  FROM events),
sizes AS (
  SELECT event_type, grp_ts, count(*) AS g FROM membr
  GROUP BY event_type, grp_ts),
kept AS (
  SELECT m.event_type, m.grp_ts, m.user_id
  FROM membr m
  LEFT JOIN sizes s
    ON s.event_type = m.event_type AND s.grp_ts = m.grp_ts
   AND s.g > 200
  WHERE s.g IS NULL
     OR (('0x' || substr(md5(m.event_type || '|'
           || strftime(m.grp_ts, '%Y-%m-%d %H:%M:%S') || '|'
           || m.user_id), 1, 8))::BIGINT::DOUBLE
         < 200.0 * 4294967296.0 / s.g))
SELECT a.user_id AS src, b.user_id AS dst
FROM kept a
JOIN kept b
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


