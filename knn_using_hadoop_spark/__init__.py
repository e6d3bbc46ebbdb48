"""knn_using_hadoop_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query surface of
srna99/KNN-using-Hadoop (a Hadoop MapReduce exact-KNN classifier —
see ``/root/reference/src/main/java/Hadoop.java``), generalized into a
reusable engine plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) that the
north-star mandates.

Design principles (SURVEY.md §1.5, §3.4, §4):

* DataFrame / Spark SQL everywhere — the reference's hand-rolled
  map-side combine, broadcast-by-file-copy, and single-reducer merge
  all collapse into Catalyst-planned primitives (BroadcastExchange,
  WindowGroupLimit partial top-k, parallel HashAggregate).
* No driver-side loops over collect(); every operator returns a
  DataFrame and composes.
* UDFs only where built-ins genuinely can't express the semantics,
  and then Arrow-vectorized (pandas_udf / mapInPandas), never row-wise.
"""

__version__ = "0.1.0"
