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
from pyspark.sql import types as T


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


def _covariance_upper_vectorized(
    embs: DataFrame, vec_col: str, dim: int
) -> DataFrame | None:
    """Partial-Gram Arrow kernel for ``covariance_upper``: one
    mapInArrow pass emits per-batch (i, j, s, cnt) partial sums
    (d(d+1)/2 rows per batch — a BLAS X.T @ X per batch instead of
    exploding d(d+1)/2 product rows per VECTOR), and the final agg
    is avg's own sum/count + 6dp round. Numerically this reorders
    the n-term sums (BLAS blocking vs partition fold) — the ~1e-11
    noise the 6dp grain absorbs, the same tolerance the DuckDB
    oracle already needs (grain-parity pinned in pytest).

    Null semantics replicated from the SQL plan's zip_with
    null-padding: a null/short/null-element position contributes
    nothing to any pair it touches (its centered value is null, so
    the product is null and avg skips it) — implemented by zeroing
    invalid entries and counting valid pairs with a mask Gram. Null
    means (all-null positions) null every pair they touch. Returns
    None (caller falls back to SQL) when the corpus's max length is
    below ``dim``: there the SQL plan's element_at probes past the
    zip_with result and raises under ANSI — the kernel preserves
    the raise by not replacing the plan.
    """
    import numpy as np
    import pyarrow as pa

    from knn_using_hadoop_spark.operators.similarity import (
        _parse_vec_lists,
        _round6_array,
    )

    # per-position means: the same partial pattern, then a bounded
    # (<= max-length rows) collect
    mean_schema = T.StructType(
        [
            T.StructField("pos", T.IntegerType(), True),
            T.StructField("s", T.DoubleType(), True),
            T.StructField("cnt", T.LongType(), True),
        ]
    )
    src = embs.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    )
    spark = embs.sparkSession
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)

    def mean_partials(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lengths, starts, vals, elem_null = _parse_vec_lists(
                rb.column(0)
            )
            maxlen = int(max(lengths.max(), 0))
            if maxlen <= 0:
                continue
            sums = np.zeros(maxlen, dtype=np.float64)
            cnts = np.zeros(maxlen, dtype=np.int64)
            pres = np.zeros(maxlen, dtype=np.int64)
            for p in range(maxlen):
                has = lengths >= p + 1
                hidx = np.nonzero(has)[0]
                if not hidx.size:
                    continue
                pres[p] = hidx.size
                gpos = starts[hidx] + p
                nn = ~elem_null[gpos]
                cnts[p] = int(nn.sum())
                sums[p] = float(vals[gpos[nn]].sum())
            live = np.nonzero(pres > 0)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(live.astype(np.int32)),
                    pa.array(sums[live]),
                    pa.array(cnts[live]),
                ],
                names=["pos", "s", "cnt"],
            )

    mrows = (
        src.mapInArrow(mean_partials, mean_schema)
        .groupBy("pos")
        .agg(
            F.when(
                F.sum("cnt") > 0,
                F.round(F.sum("s") / F.sum("cnt"), 6),
            ).alias("m")
        )
        .collect()
    )
    if not mrows:
        return embs.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("i", T.IntegerType(), True),
                    T.StructField("j", T.IntegerType(), True),
                    T.StructField("cov", T.DoubleType(), True),
                ]
            ),
        )
    maxlen = max(r["pos"] for r in mrows) + 1
    if maxlen < dim:
        return None  # ANSI raise domain — keep the SQL plan
    mvals = np.zeros(dim, dtype=np.float64)
    mnull = np.ones(dim, dtype=bool)
    for r in mrows:
        if r["pos"] < dim and r["m"] is not None:
            mvals[r["pos"]] = r["m"]
            mnull[r["pos"]] = False

    gram_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), True),
            T.StructField("j", T.IntegerType(), True),
            T.StructField("s", T.DoubleType(), True),
            T.StructField("cnt", T.LongType(), True),
        ]
    )
    iu, ju = np.triu_indices(dim)

    def gram_partials(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            lengths, starts, vals, elem_null = _parse_vec_lists(
                rb.column(0)
            )
            X = np.zeros((n, dim), dtype=np.float64)
            M = np.zeros((n, dim), dtype=bool)
            full = lengths >= dim
            fidx = np.nonzero(full)[0]
            if fidx.size:
                gather = (
                    starts[fidx][:, None]
                    + np.arange(dim, dtype=np.int64)[None, :]
                )
                X[fidx] = vals[gather]
                M[fidx] = ~elem_null[gather]
            for r in np.nonzero(~full)[0]:
                L = max(int(lengths[r]), 0)
                if L == 0:
                    continue
                gpos = starts[r] + np.arange(L, dtype=np.int64)
                X[r, :L] = vals[gpos]
                M[r, :L] = ~elem_null[gpos]
            M[:, mnull] = False
            # exact per-element centering, zeroed where invalid:
            # excluded terms then add 0 to the pair sums while the
            # mask Gram counts only valid pairs
            Xc = np.where(M, X - mvals[None, :], 0.0)
            S = Xc.T @ Xc
            C = M.astype(np.float64).T @ M.astype(np.float64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array((iu + 1).astype(np.int32)),
                    pa.array((ju + 1).astype(np.int32)),
                    pa.array(S[iu, ju]),
                    pa.array(
                        np.rint(C[iu, ju]).astype(np.int64)
                    ),
                ],
                names=["i", "j", "s", "cnt"],
            )

    return (
        src.mapInArrow(gram_partials, gram_schema)
        .groupBy("i", "j")
        .agg(
            F.when(
                F.sum("cnt") > 0,
                F.round(F.sum("s") / F.sum("cnt"), 6),
            ).alias("cov")
        )
    )


def covariance_upper(
    embs: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    impl: str = "vectorized",
) -> DataFrame:
    """Upper-triangle covariance matrix (i <= j, 1-based) as rows
    (i, j, cov).

    cov[i,j] = avg over rows of (x_i - m_i)(x_j - m_j) with means
    pre-rounded to 6 dp. ``impl="sql"``: the pair products are
    generated per row with nested HOF transforms (compile-light,
    NOTES.md), exploded, and partially aggregated — the shuffle
    carries d(d+1)/2 keys per partition, never O(n), but the
    d(d+1)/2-per-row explode still materializes n x 2080 rows
    through the hash aggregate at d=64. ``impl="vectorized"``
    (default): per-batch partial Grams via one BLAS product
    (``_covariance_upper_vectorized``) — d(d+1)/2 rows per BATCH,
    grain-equal results (pytest-pinned).
    """
    if impl == "vectorized":
        out = _covariance_upper_vectorized(embs, vec_col, dim)
        if out is not None:
            return out
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


def _logreg_fit(
    feats: DataFrame,
    x_cols: list[str],
    y_col: str,
    rounds: int,
) -> list[float]:
    """The GD loop shared by logreg_gd and logreg_calibration —
    identical rounding protocol (see logreg_gd docstring)."""
    w = [0.0] * (len(x_cols) + 1)
    for _ in range(rounds):
        z = F.lit(w[0])
        for j, xc in enumerate(x_cols):
            z = z + F.lit(w[j + 1]) * F.col(xc)
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        err = p - F.col(y_col)
        grads = feats.agg(
            F.round(F.avg(err), 6).alias("g0"),
            *[
                F.round(F.avg(err * F.col(xc)), 6).alias(f"g{j + 1}")
                for j, xc in enumerate(x_cols)
            ],
        ).collect()[0]
        w = [w[j] - grads[f"g{j}"] for j in range(len(w))]
    return w


def logreg_gd(
    feats: DataFrame,
    x_cols: list[str],
    y_col: str,
    rounds: int = 3,
) -> DataFrame:
    """Full-batch logistic-regression gradient descent (lr=1.0),
    returning one row: the learned weights plus training-set
    prediction counts — distributed iterative ML training as pure
    aggregates, the MLlib-free shape of `LogisticRegression`.

    Each round is ONE partial-aggregated pass over the features: the
    gradient of the log-loss is avg((sigmoid(w.x) - y) * x_j), a
    (1+|x|)-number aggregate — no per-row state, no shuffle beyond
    the aggregate's. Weights live driver-side (they are the
    iteration's only state, |x|+1 doubles) and re-enter the next
    round as plan-time literals, so round r+1's scan starts fresh —
    constant plan depth without checkpointing.

    Cross-engine determinism protocol (same as PageRank/k-means):
    sigmoid outputs and gradient averages are rounded to 6dp EVERY
    round, so both engines re-enter each round with bit-identical
    weights; exp()'s libm ulp (~1e-17 here) and the aggregate's
    summation-order noise (~1e-13) both vanish into the 5e-7
    half-grid. Weight updates are the identical left-associated
    IEEE subtraction chain in both engines.
    """
    w = _logreg_fit(feats, x_cols, y_col, rounds)
    z = F.lit(w[0])
    for j, xc in enumerate(x_cols):
        z = z + F.lit(w[j + 1]) * F.col(xc)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    pred = (p > 0.5).cast("int")
    y_int = F.col(y_col).cast("int")
    return feats.agg(
        *[F.lit(w[j]).alias(f"w{j}") for j in range(len(w))],
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(pred).cast("bigint").alias("n_pred_pos"),
        F.sum((pred == y_int).cast("int")).cast("bigint").alias(
            "n_correct"
        ),
    )


def logreg_gd_oracle_sql(
    feats_sql: str,
    x_cols: list[str],
    y_col: str,
    rounds: int = 3,
) -> str:
    """DuckDB twin of ``logreg_gd``: the driver-side weight loop
    unrolled into a CTE chain (one gradient CTE + one weight CTE per
    round), identical rounding points."""
    nx = len(x_cols)

    def z_expr(wsrc: str) -> str:
        z = f"{wsrc}.w0"
        for j, xc in enumerate(x_cols):
            z += f" + {wsrc}.w{j + 1} * f.{xc}"
        return z

    parts = [
        f"f AS ({feats_sql})",
        "w0_ AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(nx + 1))
        + ")",
    ]
    for r in range(1, rounds + 1):
        p = f"round(1.0 / (1.0 + exp(-({z_expr(f'w{r - 1}_')}))), 6)"
        gcols = [f"round(avg({p} - f.{y_col}), 6) AS g0"]
        for j, xc in enumerate(x_cols):
            gcols.append(
                f"round(avg(({p} - f.{y_col}) * f.{xc}), 6) AS g{j + 1}"
            )
        parts.append(
            f"g{r} AS (SELECT {', '.join(gcols)} FROM f, w{r - 1}_)"
        )
        wcols = ", ".join(
            f"w{r - 1}_.w{j} - g{r}.g{j} AS w{j}" for j in range(nx + 1)
        )
        parts.append(f"w{r}_ AS (SELECT {wcols} FROM w{r - 1}_, g{r})")
    wlast = f"w{rounds}_"
    p = f"round(1.0 / (1.0 + exp(-({z_expr(wlast)}))), 6)"
    # min() over the 1-row weight CTE: the final select aggregates f,
    # so the (constant) weight columns must pass through an aggregate.
    wsel = ", ".join(
        f"min({wlast}.w{j}) AS w{j}" for j in range(nx + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT {wsel},
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN {p} > 0.5 THEN 1 ELSE 0 END)::BIGINT AS n_pred_pos,
       sum(CASE WHEN (CASE WHEN {p} > 0.5 THEN 1 ELSE 0 END)
                     = {y_col}::INT THEN 1 ELSE 0 END)::BIGINT
         AS n_correct
FROM f, {wlast}"""
    )


def logreg_calibration(
    feats: DataFrame,
    x_cols: list[str],
    y_col: str,
    rounds: int = 3,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram for the trained model: decile-bucket the
    predicted probability, report mean prediction vs actual positive
    rate per bucket — calibration is the eval that tells you whether
    the probabilities MEAN anything (accuracy can't).

    Same trained weights as logreg_gd (shared fit loop); one extra
    aggregate scan. Bin = floor(p * n_bins) clamped to the top bin;
    p is on the 6dp grid, so binning is deterministic IEEE."""
    w = _logreg_fit(feats, x_cols, y_col, rounds)
    z = F.lit(w[0])
    for j, xc in enumerate(x_cols):
        z = z + F.lit(w[j + 1]) * F.col(xc)
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    bin_ = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        feats.select(
            p.alias("p"), F.col(y_col).alias("y"), bin_.alias("bin")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p"), 6).alias("mean_pred"),
            F.round(F.avg("y"), 6).alias("actual_rate"),
        )
    )


def logreg_calibration_oracle_sql(
    feats_sql: str,
    x_cols: list[str],
    y_col: str,
    rounds: int = 3,
    n_bins: int = 10,
) -> str:
    """DuckDB twin of ``logreg_calibration``: the same unrolled
    training chain, then the binning select."""
    full = logreg_gd_oracle_sql(feats_sql, x_cols, y_col, rounds)
    with_part = full[: full.rindex("\nSELECT ")]
    nx = len(x_cols)
    z = f"w{rounds}_.w0"
    for j, xc in enumerate(x_cols):
        z += f" + w{rounds}_.w{j + 1} * f.{xc}"
    p = f"round(1.0 / (1.0 + exp(-({z}))), 6)"
    return (
        with_part
        + f""",
scored AS (
  SELECT {p} AS p, f.{y_col} AS y,
         least(floor({p} * {n_bins})::INT, {n_bins - 1})::INT AS bin
  FROM f, w{rounds}_)
SELECT bin, count(*)::BIGINT AS n,
       round(avg(p), 6) AS mean_pred,
       round(avg(y), 6) AS actual_rate
FROM scored GROUP BY bin"""
    )
