"""Generate a ~10x SKEWED stress corpus under /tmp (VERDICT r2 ask #4).

sf0.1 caps at 17 MB and near-uniform distributions — too polite to
prove the 100x claims. This replicates every fact table 10x with
deliberately hostile shape, so tools/stress_skew.py can check which
skew guards actually fire:

- documents (50k rows): 100 exact-duplicate clusters of 10 (LSH
  bucket load), a hot sentence appended to ~30% of docs (hot-shingle
  frequency cap must fire), heavy-tailed lengths (~0.5% of docs x20
  length, ~0.1% x50 — partition-elephant rows for the token/shingle
  exploders).
- events (1M rows): ~20% of all events reassigned to user_id=1 (hot
  key for sessionization windows / rolling distinct / salted join),
  ~10% collapsed into ONE (click, 2024-01-15 12:xx) hour group (the
  cooccurrence max_group cap must drop it — a 100k-member group
  would emit 5e9 pairs).
- lineitem (6M rows) / orders (1.5M): orderkey-remapped copies; ~20%
  of lineitem repointed at ONE hot part (brand-affinity basket cap +
  AQE skew handling on part joins).
- embeddings (20k rows): exact 10x copies (duplicate points pile
  into the same IVF cells / LSH buckets — worst case for bucketed
  ANN).
- dims (region nation customer supplier part): copied unchanged.

Deterministic end to end (key arithmetic only, no RNG). Output:
/tmp/spark_graft_skew10/<table>.parquet.

Usage: python tools/gen_skew_data.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knn_using_hadoop_spark.session import get_spark  # noqa: E402

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_skew10"
COPIES = 10
HOT_SENTENCE = (
    " the quick common phrase appears everywhere in this corpus and"
    " floods one shingle bucket"
)


def main() -> None:
    spark = get_spark("gen-skew")
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(COPIES).select(F.col("id").alias("c"))

    def replicate(name: str):
        return (
            spark.read.parquet(f"{SRC}/{name}.parquet")
            .crossJoin(copies)
        )

    # ---- documents ----
    docs = replicate("documents")
    base_text = F.col("text")
    text = (
        F.when(
            (F.col("c") > 0) & (F.col("doc_id") % 50 == 0), base_text
        )  # exact-dup clusters: copies keep the original text verbatim
        .when(
            (F.col("doc_id") * COPIES + F.col("c")) % 997 == 0,
            F.repeat(base_text, 50),
        )
        .when(
            (F.col("doc_id") * COPIES + F.col("c")) % 200 == 0,
            F.repeat(base_text, 20),
        )
        .when(
            (F.col("doc_id") + F.col("c")) % 10 < 3,
            F.concat(base_text, F.lit(HOT_SENTENCE)),
        )
        .otherwise(base_text)
    )
    (
        docs.select(
            (F.col("c") * 5000 + F.col("doc_id")).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        ).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    )

    # ---- events ----
    ev = replicate("events")
    eid = F.col("c") * 100000 + F.col("event_id")
    hot_group = (F.col("event_id") * COPIES + F.col("c")) % 10 == 1
    (
        ev.select(
            eid.alias("event_id"),
            F.when(
                hot_group,
                F.to_timestamp(F.lit("2024-01-15 12:00:00"))
                + F.make_interval(secs=(eid % 3600).cast("double")),
            )
            .otherwise(F.col("ts"))
            .alias("ts"),
            F.when((eid % 5) == 0, F.lit(1))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            F.when(hot_group, F.lit("click"))
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            "value",
            "props",
        ).write.mode("overwrite").parquet(f"{OUT}/events.parquet")
    )

    # ---- lineitem / orders (orderkey-consistent remap) ----
    max_ok = (
        spark.read.parquet(f"{SRC}/orders.parquet")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
        + 1
    )
    li = replicate("lineitem")
    (
        li.select(
            (F.col("c") * max_ok + F.col("l_orderkey")).alias("l_orderkey"),
            F.when(
                (F.col("l_orderkey") + F.col("c")) % 5 == 0, F.lit(777)
            )
            .otherwise(F.col("l_partkey"))
            .alias("l_partkey"),
            *[
                col
                for col in li.columns
                if col not in ("l_orderkey", "l_partkey", "c")
            ],
        ).write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
    )
    od = replicate("orders")
    (
        od.select(
            (F.col("c") * max_ok + F.col("o_orderkey")).alias("o_orderkey"),
            *[c for c in od.columns if c not in ("o_orderkey", "c")],
        ).write.mode("overwrite").parquet(f"{OUT}/orders.parquet")
    )

    # ---- embeddings (exact duplicate points) ----
    emb = replicate("embeddings")
    (
        emb.select(
            (F.col("c") * 2000 + F.col("vec_id")).alias("vec_id"),
            "embedding",
            "label",
        ).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")
    )

    # ---- dims unchanged ----
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{t}.parquet")

    for t in (
        "documents", "events", "lineitem", "orders", "embeddings",
    ):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
