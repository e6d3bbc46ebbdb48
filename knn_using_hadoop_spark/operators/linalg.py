"""Distributed linear-algebra primitives over array<float> columns.

The covariance / Gram matrix is the workhorse behind PCA, whitening,
and normal-equation regression on embedding corpora. For a d-dim
embedding table with n rows the full d x d matrix is a SINGLE
aggregation pass: each row contributes its d(d+1)/2 upper-triangle
products, map-side combine collapses every partition to at most
d(d+1)/2 partial sums, and the final shuffle moves O(d^2) rows per
partition — independent of n. That is the plan that survives 100 TB:
no self-join of the exploded relation (which would shuffle the n*d
relation twice), no driver-side matrix accumulation.

Cross-engine determinism: per-dimension means are rounded to 6 dp
before centering (both engines enter the quadratic pass with
bit-identical inputs), and the final covariance is rounded to 6 dp to
absorb summation-order ulp noise in the n-term sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mean_array(embs: DataFrame, vec_col: str, decimals: int = 6):
    """1-row relation holding the per-dimension mean as an array,
    ordered by position and rounded for the cross-engine protocol."""
    flat = embs.select(F.posexplode(vec_col).alias("i", "x")).select(
        "i", F.col("x").cast("double").alias("x")
    )
    means = flat.groupBy("i").agg(F.round(F.avg("x"), decimals).alias("m"))
    return means.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s.getField("m"),
        ).alias("marr")
    )


def covariance_upper(
    embs: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Upper-triangle covariance matrix (i <= j, 1-based) as rows
    (i, j, cov).

    cov[i,j] = avg over rows of (x_i - m_i)(x_j - m_j) with means
    pre-rounded to 6 dp. The pair products are generated per row with
    nested HOF transforms (compile-light, NOTES.md), exploded, and
    partially aggregated — the shuffle carries d(d+1)/2 keys per
    partition, never O(n).
    """
    marr = _mean_array(embs, vec_col)
    centered = embs.crossJoin(F.broadcast(marr)).select(
        F.zip_with(
            F.col(vec_col), F.col("marr"), lambda x, m: x.cast("double") - m
        ).alias("cx")
    )
    pairs = centered.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(dim)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at(F.col("cx"), i)
                                * F.element_at(F.col("cx"), j)
                            ).alias("v"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.i", "p.j", "p.v")
        .groupBy("i", "j")
        .agg(F.round(F.avg("v"), 6).alias("cov"))
    )


def power_iteration_pc1(
    embs: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    rounds: int = 3,
) -> DataFrame:
    """First principal component by power iteration on the covariance
    matrix: v <- normalize(C v), started from the all-ones direction.

    The d x d matrix C is tiny once aggregated, so every iteration is
    a (dim^2)-row broadcast join — matrix-vector product as groupBy(i)
    sum — with the same per-round rounding protocol as PageRank
    (NOTES.md): round v to 8 dp each round so both engines re-enter
    the next round with bit-identical inputs, 6 dp at the output.
    Returns (i, v) rows, sign-normalized so v[1] >= 0.
    """
    cov = covariance_upper(embs, vec_col, dim)
    # mirror the upper triangle into the full matrix
    full = cov.select("i", "j", F.col("cov").alias("c")).union(
        cov.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("cov").alias("c")
        )
    )
    full = full.localCheckpoint()
    spark = embs.sparkSession
    dim_rows = spark.range(1, dim + 1).select(
        F.col("id").cast("int").alias("i"),
        (F.lit(1.0) / F.sqrt(F.lit(float(dim)))).alias("v"),
    )
    v = dim_rows
    for _ in range(rounds):
        prod = (
            full.alias("m")
            .join(
                F.broadcast(v.alias("vec")),
                F.col("m.j") == F.col("vec.i"),
            )
            .groupBy(F.col("m.i").alias("i"))
            .agg(F.sum(F.col("m.c") * F.col("vec.v")).alias("w"))
        )
        norm = prod.agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
        )
        v = (
            prod.crossJoin(F.broadcast(norm))
            .select("i", F.round(F.col("w") / F.col("nrm"), 8).alias("v"))
            .localCheckpoint()
        )
    sign = v.filter(F.col("i") == 1).select(
        F.when(F.col("v") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
    )
    return v.crossJoin(F.broadcast(sign)).select(
        "i", F.round(F.col("v") * F.col("sgn"), 6).alias("v")
    )


def power_iteration_oracle_sql(dim: int = 64, rounds: int = 3) -> str:
    """DuckDB twin of power_iteration_pc1: the covariance CTEs plus
    one (matvec, norm, renormalize+round) CTE stage per round —
    the same unrolled-iteration protocol as the PageRank oracle."""
    parts = [
        f"""WITH flat AS (
  SELECT vec_id, g.i::INT AS i, embedding[g.i]::DOUBLE AS x
  FROM embeddings, generate_series(1, {dim}) g(i)),
m AS (SELECT i, round(avg(x), 6) AS m FROM flat GROUP BY i),
c AS (SELECT vec_id, f.i, x - m.m AS cx
      FROM flat f JOIN m ON m.i = f.i),
cov AS (SELECT a.i AS i, b.i AS j, round(avg(a.cx * b.cx), 6) AS cv
        FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i),
cf AS (SELECT i, j, cv FROM cov
       UNION ALL
       SELECT j AS i, i AS j, cv FROM cov WHERE i <> j),
v0 AS (SELECT g.i::INT AS i, 1.0 / sqrt({dim}.0) AS v
       FROM generate_series(1, {dim}) g(i))"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""p{r} AS (SELECT cf.i AS i, sum(cf.cv * v{r - 1}.v) AS w
       FROM cf JOIN v{r - 1} ON v{r - 1}.i = cf.j GROUP BY cf.i),
v{r} AS (SELECT i,
         round(w / (SELECT sqrt(sum(w * w)) FROM p{r}), 8) AS v
         FROM p{r})"""
        )
    last = f"v{rounds}"
    parts.append(
        f"""sgn AS (SELECT CASE WHEN (SELECT v FROM {last} WHERE i = 1) < 0
                 THEN -1.0 ELSE 1.0 END AS s)"""
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT i, round(v * (SELECT s FROM sgn), 6) AS v FROM {last}"
    )
