"""Generate a ~100x UNIFORM scale corpus under /tmp.

tools/gen_skew_data.py answers "do the skew guards fire?" on hostile
10x data. This answers the other half of the 100 TB question:
"does throughput scale linearly when the data just gets BIG?" —
fact tables replicated N times (default 100) with key remapping so
copies stay DISTINCT entities (more users, more docs, more orders —
the shape real growth has), not duplicate explosions:

- events (10M rows): event_id/user_id shifted per copy — 100x users,
  same per-user activity (group count scales, group size doesn't).
- documents (500k rows): doc_id shifted; a per-copy uniq token is
  appended so near-dup relations stay sparse instead of every doc
  gaining 99 identical twins (which would quadratically inflate LSH
  candidate pairs — that hostile case is gen_skew_data's job).
- embeddings (200k rows): vec_id shifted; first component nudged by
  c*1e-3 so points are distinct but the distribution is unchanged.
- lineitem (60M) / orders (15M): orderkey shifted per copy; part/
  supp/cust keys untouched (dims stay small, per-dim fan-in grows
  100x — exactly what a fact table does at scale).
- dims (region nation customer supplier part): copied unchanged.

Deterministic end to end (key arithmetic only, no RNG). Output:
/tmp/spark_graft_scale100/<table>.parquet.

Usage: python tools/gen_scale_data.py [copies] [src_sf_dir] [out_dir]
Then:  SPARK_GRAFT_SKEW_DIR=/tmp/spark_graft_scale100 \
           python tools/stress_skew.py <query ...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knn_using_hadoop_spark.session import get_spark  # noqa: E402

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_scale100"

# Shift strides: comfortably above the sf0.1 max of each key space so
# copies never collide.
STRIDE = 10_000_000


def main() -> None:
    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(COPIES).select(F.col("id").alias("c"))

    def replicate(name: str):
        return spark.read.parquet(f"{SRC}/{name}.parquet").crossJoin(
            copies
        )

    def write(df, name: str, parts: int) -> None:
        (
            df.drop("c")
            .repartition(parts)
            .write.mode("overwrite")
            .parquet(f"{OUT}/{name}.parquet")
        )
        print(f"wrote {name}", flush=True)

    shift = F.col("c") * STRIDE

    ev = (
        replicate("events")
        .withColumn("event_id", F.col("event_id") + shift)
        .withColumn("user_id", F.col("user_id") + shift)
    )
    write(ev, "events", 64)

    docs = (
        replicate("documents")
        .withColumn("doc_id", F.col("doc_id") + shift)
        .withColumn(
            "text",
            F.concat(
                F.col("text"), F.lit(" uniq"), F.col("c").cast("string")
            ),
        )
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    write(docs, "documents", 64)

    emb = (
        replicate("embeddings")
        .withColumn("vec_id", F.col("vec_id") + shift)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    i == 0, x + F.col("c").cast("float") * F.lit(1e-3)
                ).otherwise(x),
            ),
        )
    )
    write(emb, "embeddings", 32)

    li = replicate("lineitem").withColumn(
        "l_orderkey", F.col("l_orderkey") + shift
    )
    write(li, "lineitem", 96)

    orders = replicate("orders").withColumn(
        "o_orderkey", F.col("o_orderkey") + shift
    )
    write(orders, "orders", 64)

    for dim in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{OUT}/{dim}.parquet")
        print(f"wrote {dim}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
