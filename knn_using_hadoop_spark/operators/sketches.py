"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's ``approx_count_distinct`` (HLL++) and DuckDB's
``approx_count_distinct`` (different HLL) can never hash-match, so the
oracle-checkable sketch here is KMV (Bar-Yossef et al. 2002): keep the
k smallest DISTINCT hash values per group; if fewer than k distinct
values exist the count is exact, otherwise estimate

    D ≈ (k - 1) * H / h_(k)

where ``h_(k)`` is the k-th smallest hash and ``H = 2^60`` is the hash
range (the engine's portable 60-bit md5 slice, functions/hashing.py).
Everything is deterministic arithmetic over md5, so the DuckDB twin
reproduces it bit-for-bit — an *oracle-checked* approximate-distinct,
which HLL can't give you.

Scale shape: the per-group k-smallest is a window top-k, which the
planner turns into a partial top-k below the shuffle
(InferWindowGroupLimit) — each map task forwards at most k hashes per
group, the same fixed-size-sketch merge a real HLL implementation
does, just expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import (
    portable_hash32,
    portable_hash64,
)

HASH_RANGE = float(1 << 60)  # exact double (power of two)


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, est_distinct, n_kept) per group.

    ``est_distinct`` is rounded to 4 dp (pure function of md5 — the
    rounding is only to keep the cross-engine repr stable).
    """
    hashes = df.select(
        F.col(group_col),
        portable_hash64(F.col(value_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    kept = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    est: Column = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_RANGE) / F.col("hk").cast("double")
    )
    return kept.select(
        F.col(group_col),
        F.round(est, 4).alias("est_distinct"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
    )


def _mg_update(counters: dict, pairs, k: int) -> None:
    """Weighted Misra-Gries update, in place.

    For each (item, weight): add, then while more than k counters
    live, decrement ALL by the current min and drop the zeros. Every
    overflow removes (k+1)·d of counter mass, so the cumulative
    decrement Σd ≤ W/(k+1) where W is the total weight fed in — any
    item with true weight > W/(k+1) ends with a positive counter
    (present in ``counters``). Pure-Python core of
    ``mg_heavy_hitters``'s per-partition pass, kept module-level so
    the superset guarantee is property-testable without a JVM.
    """
    for v, w in pairs:
        counters[v] = counters.get(v, 0) + int(w)
        if len(counters) > k:
            d = min(counters.values())
            dead = [key for key, c in counters.items() if c <= d]
            for key in counters:
                counters[key] -= d
            for key in dead:
                del counters[key]


def mg_heavy_hitters(
    items: DataFrame, item_col: str, k: int = 40,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact heavy hitters via a Misra-Gries candidate pass + exact
    rescue.

    Finds every item whose frequency (sum of ``weight_col`` if given,
    else row count) strictly exceeds W/k, with exact counts, WITHOUT a
    full-width shuffle of the tail:

    1. Per partition, a weighted Misra-Gries summary with k counters
       (Arrow-batched ``mapInPandas``; bounded memory, one pass). Each
       batch is first collapsed vectorized (``value_counts`` /
       groupby-sum — C speed), so the Python loop runs per DISTINCT
       item per batch, not per row. The weighted-MG update (add, then
       on overflow decrement all k+1 counters by their min and drop
       zeros) undercounts any item by at most Σd ≤ W_p/(k+1): every
       overflow removes (k+1)·d of counter mass, charged against the
       partition's total added weight W_p. So any item with local
       weight > W_p/k > W_p/(k+1) survives locally; a global weight
       > W/k = Σ W_p/k forces some partition over its local threshold
       (pigeonhole), so the union of per-partition candidates contains
       every global heavy hitter.
    2. Exact counts of the candidates only, via a broadcast semi join
       — the long tail (most of a Zipf distribution's mass) never
       enters the aggregation shuffle.
    3. Filter cnt * k > W against the exact global total.

    The candidate SET depends on partitioning, but the OUTPUT doesn't:
    step 2/3 return exactly the items the plain groupBy-filter would —
    which is the DuckDB oracle. At 100 TB this is the difference
    between shuffling |distinct items| rows and shuffling
    ≤ partitions×k candidate keys plus one small broadcast.

    ``weight_col`` is the duplicate-pile-up hook (r5): a caller that
    collapses identical payloads upstream (e.g. distinct texts with
    pile sizes) feeds (item, weight) and gets the same answer as the
    uncollapsed stream — counts are additive — at the collapsed
    stream's cost.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            if weight_col is None:
                vc = pdf[item_col].value_counts(sort=False)
            else:
                vc = pdf.groupby(item_col, sort=False)[weight_col].sum()
            _mg_update(counters, vc.items(), k)
        import pandas as pd

        yield pd.DataFrame({item_col: list(counters.keys())})

    cols = [item_col] if weight_col is None else [item_col, weight_col]
    src = items.select(*cols)
    w_expr = (
        F.count(F.lit(1)) if weight_col is None
        else F.sum(weight_col)
    )
    candidates = (
        src.mapInPandas(
            mg_partition, schema=src.select(item_col).schema
        )
        .distinct()
    )
    total = src.agg(w_expr.cast("bigint").alias("n_total"))
    exact = (
        src.join(F.broadcast(candidates), on=item_col, how="left_semi")
        .groupBy(item_col)
        .agg(w_expr.cast("bigint").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(item_col, "cnt", "n_total")
    )


def mg_heavy_hitters_oracle_sql(
    items_sql: str, item_col: str, k: int = 40
) -> str:
    """DuckDB twin: the plain exact groupBy-filter that the MG
    candidate pass provably reproduces."""
    return f"""
WITH items AS ({items_sql}),
tot AS (SELECT count(*)::BIGINT AS n_total FROM items)
SELECT {item_col}, count(*)::BIGINT AS cnt, n_total
FROM items, tot
GROUP BY {item_col}, n_total
HAVING count(*) * {k} > n_total"""


def kmv_distinct_oracle_sql(
    table: str, group_col: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of ``kmv_distinct`` (same hash, same arithmetic)."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col},
         (('0x' || substr(md5({value_expr}), 1, 15))::BIGINT) AS h
  FROM {table}),
kept AS (
  SELECT {group_col}, max(h) AS hk, count(*)::BIGINT AS n_kept
  FROM (SELECT *, row_number() OVER (PARTITION BY {group_col}
                                     ORDER BY h ASC) AS rn
        FROM hashes) r
  WHERE rn <= {k}
  GROUP BY {group_col})
SELECT {group_col},
       round(CASE WHEN n_kept < {k} THEN n_kept::DOUBLE
                  ELSE {float(k - 1)} * {HASH_RANGE} / hk::DOUBLE END,
             4) AS est_distinct,
       n_kept
FROM kept"""


def kmv_jaccard_pairs(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard similarity ESTIMATES between every pair of
    groups' value sets, from mergeable KMV sketches — set-overlap
    analytics without ever materializing a set intersection.

    Union sketch property (Beyer et al., SIGMOD'07): the k smallest
    hashes of A ∪ B are computable from KMV(A) ∪ KMV(B); for any h in
    that union sketch, h ∈ KMV(A) ⟺ h ∈ A (fewer than k union hashes
    precede it, a fortiori fewer than k of A's). So
    rho = |{union sketch} ∩ A ∩ B| / |union sketch| is an unbiased
    Jaccard estimator and est_intersection = rho * est_union. The
    big-data pass is the per-group k-smallest (WindowGroupLimit
    partial top-k, fixed-size merges); everything after operates on
    <= k rows per group — sketch algebra, never set algebra. All
    arithmetic is deterministic md5 — the oracle reproduces every
    estimate bit-for-bit, which no RNG-seeded or HLL-based sketch
    allows.
    """
    hashes = df.select(
        F.col(group_col).alias("g"),
        portable_hash64(F.col(value_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    kmv = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
    )
    groups = kmv.select("g").distinct()
    pairs = (
        groups.alias("a")
        .join(groups.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(F.col("a.g").alias("t1"), F.col("b.g").alias("t2"))
    )
    tagged = pairs.join(
        F.broadcast(kmv),
        (F.col("g") == F.col("t1")) | (F.col("g") == F.col("t2")),
    )
    u = tagged.groupBy("t1", "t2", "h").agg(
        F.max(F.when(F.col("g") == F.col("t1"), 1).otherwise(0)).alias(
            "in_a"
        ),
        F.max(F.when(F.col("g") == F.col("t2"), 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    wu = Window.partitionBy("t1", "t2").orderBy(F.col("h").asc())
    top = u.withColumn("rn", F.row_number().over(wu)).filter(
        F.col("rn") <= k
    )
    agg = top.groupBy("t1", "t2").agg(
        F.max("h").alias("hk"),
        F.count(F.lit(1)).alias("nk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    est_union = F.when(
        F.col("nk") < k, F.col("nk").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_RANGE) / F.col("hk").cast("double")
    )
    jac = F.col("n_both") / F.col("nk").cast("double")
    return agg.select(
        "t1",
        "t2",
        F.round(est_union, 4).alias("est_union"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * est_union, 4).alias("est_intersection"),
    )


def kmv_jaccard_oracle_sql(
    table: str, group_col: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of ``kmv_jaccard_pairs``."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col} AS g,
         (('0x' || substr(md5({value_expr}), 1, 15))::BIGINT) AS h
  FROM {table}),
kmv AS (
  SELECT g, h
  FROM (SELECT *, row_number() OVER (PARTITION BY g ORDER BY h ASC)
               AS rn FROM hashes) r
  WHERE rn <= {k}),
pairs AS (
  SELECT a.g AS t1, b.g AS t2
  FROM (SELECT DISTINCT g FROM kmv) a
  JOIN (SELECT DISTINCT g FROM kmv) b ON a.g < b.g),
u AS (
  SELECT p.t1, p.t2, kmv.h,
         max(CASE WHEN kmv.g = p.t1 THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN kmv.g = p.t2 THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN kmv ON kmv.g IN (p.t1, p.t2)
  GROUP BY p.t1, p.t2, kmv.h),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY t1, t2 ORDER BY h ASC)
           AS rn FROM u) r
  WHERE rn <= {k}),
agg AS (
  SELECT t1, t2, max(h) AS hk, count(*)::BIGINT AS nk,
         sum(in_a * in_b) AS n_both
  FROM top GROUP BY t1, t2)
SELECT t1, t2,
       round(CASE WHEN nk < {k} THEN nk::DOUBLE
                  ELSE {float(k - 1)} * {HASH_RANGE} / hk::DOUBLE END,
             4) AS est_union,
       round(n_both / nk::DOUBLE, 6) AS jaccard_est,
       round((n_both / nk::DOUBLE)
             * CASE WHEN nk < {k} THEN nk::DOUBLE
                    ELSE {float(k - 1)} * {HASH_RANGE} / hk::DOUBLE END,
             4) AS est_intersection
FROM agg"""


def countmin_estimates(
    items: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 64,
    top_n: int = 20,
) -> DataFrame:
    """Count-Min frequency estimates for the ``top_n`` most frequent
    items, next to their exact counts — (item, exact_cnt, cms_est,
    overestimate).

    CMS invariant (Cormode & Muthukrishnan '05): each of ``depth``
    hash rows buckets every item into ``width`` counters; an item's
    estimate is the MIN of its counters, which can only OVERcount
    (collisions add, never subtract) — ``overestimate >= 0`` always,
    and the output exposes it per item so the error is measurable.

    Scale shape: the corpus-sized pass is the exact groupBy(item)
    count (one partial-aggregated shuffle the caller usually needs
    anyway); the sketch is then built from the VOCAB-sized count
    relation — identical counters to hashing the raw stream, at
    explode cost O(|vocab| * depth), not O(|stream| * depth). The
    counter table is depth*width rows (192 here) — broadcast-joined
    to the probes; nothing in the sketch stage scales with the
    corpus. Deterministic md5 bucketing — the oracle rebuilds the
    identical sketch (no RNG seeds to reconcile).
    """
    exact = items.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    rows = F.array(*[F.lit(r) for r in range(depth)])
    keyed = exact.select(
        "item",
        "exact_cnt",
        F.explode(rows).alias("r"),
    ).select(
        "item",
        "exact_cnt",
        "r",
        (
            portable_hash32(
                F.concat_ws(":", F.col("r").cast("string"), F.col("item"))
            )
            % width
        ).alias("bucket"),
    )
    counters = keyed.groupBy("r", "bucket").agg(
        F.sum("exact_cnt").alias("cnt")
    )
    probes = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("item")
    ).limit(top_n)
    probe_keys = probes.select(
        "item",
        "exact_cnt",
        F.explode(rows).alias("r"),
    ).select(
        "item",
        "exact_cnt",
        "r",
        (
            portable_hash32(
                F.concat_ws(":", F.col("r").cast("string"), F.col("item"))
            )
            % width
        ).alias("bucket"),
    )
    return (
        probe_keys.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("item", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "item",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


def countmin_oracle_sql(
    items_sql: str,
    item_col: str,
    depth: int = 3,
    width: int = 64,
    top_n: int = 20,
) -> str:
    """DuckDB twin of ``countmin_estimates``."""
    h = (
        f"(('0x' || substr(md5(r::VARCHAR || ':' || item), 1, 8))"
        f"::BIGINT) % {width}"
    )
    return f"""
WITH items AS ({items_sql}),
exact_cnt AS (
  SELECT {item_col} AS item, count(*)::BIGINT AS exact_cnt
  FROM items GROUP BY {item_col}),
keyed AS (
  SELECT item, exact_cnt, r, {h} AS bucket
  FROM exact_cnt, unnest(generate_series(0, {depth - 1})) AS t(r)),
counters AS (
  SELECT r, bucket, sum(exact_cnt)::BIGINT AS cnt
  FROM keyed GROUP BY r, bucket),
probes AS (
  SELECT item, exact_cnt FROM exact_cnt
  ORDER BY exact_cnt DESC, item LIMIT {top_n}),
probe_keys AS (
  SELECT item, exact_cnt, r, {h} AS bucket
  FROM probes, unnest(generate_series(0, {depth - 1})) AS t(r))
SELECT p.item, p.exact_cnt, min(c.cnt) AS cms_est,
       min(c.cnt) - p.exact_cnt AS overestimate
FROM probe_keys p JOIN counters c USING (r, bucket)
GROUP BY p.item, p.exact_cnt"""


def grid_quantiles(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    width: int = 64,
) -> DataFrame:
    """Mergeable fixed-grid quantile sketch, with the error exposed.

    Completes the sketch family (KMV distinct, Count-Min frequency,
    Misra-Gries heavy hitters): an equal-width histogram of ``width``
    bins over [min, max] whose per-partition counts merge by plain
    summation — the property that lets a 1000-executor cluster build
    it in one partial-aggregated pass and a coordinator (or a later
    batch) merge sketches without re-reading data. Estimate for
    probability p = midpoint of the first bin whose cumulative count
    reaches ceil(p*n); the deterministic construction means the
    oracle rebuilds the identical sketch (the randomized KLL/t-digest
    alternatives trade this reproducibility for better worst-case
    bounds at equal memory).

    The sketch targets the DISCRETE quantile — the value of rank
    ``ceil(p*n)`` — which by construction falls inside the selected
    bin, so ``abs_err <= err_bound = bin width`` is a theorem, not a
    hope. (Interpolated percentiles can land between two order
    statistics in distant bins; no histogram can bound that gap.)
    Returns (p, grid_est, exact, abs_err, err_bound) — like the CMS
    operator, the sketch answer rides next to the exact one so the
    error is measurable. The exact rank statistic is computed
    relationally from the distinct-value distribution (identical
    formula cross-engine — Spark's PERCENTILE_DISC and DuckDB's
    quantile_disc follow different rank conventions and diverge,
    e.g. at p=0.9, n=12), costing O(D^2) tiny rows for D distinct
    values: a VALIDATION column for bounded-domain testing; a
    pure-sketch deployment drops it.

    Scale shape: one min/max/count aggregate (broadcast back as a
    1-row relation), one partial-aggregated groupBy(bucket) — the
    only corpus-sized passes. Both cumulative sums run as triangular
    self-joins of tiny relations (width-row bins, D-row distinct
    values) rather than unpartitioned windows, keeping the plan free
    of single-partition sorts.
    """
    v = F.col(value_col).cast("double")
    stats = df.agg(
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.count(v).alias("n"),
    )
    bin_w = (F.col("hi") - F.col("lo")) / F.lit(width)
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("lo")) / bin_w),
            F.lit(width - 1),
        )
    )
    bins = (
        df.crossJoin(F.broadcast(stats))
        .select(bucket.cast("int").alias("bucket"), "lo", "hi", "n")
        .groupBy("bucket", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = (
        bins.alias("a")
        .join(
            bins.select(
                F.col("bucket").alias("b2"), F.col("cnt").alias("c2")
            ),
            F.col("b2") <= F.col("bucket"),
        )
        .groupBy("bucket", "lo", "hi", "n")
        .agg(F.sum("c2").alias("cum"))
    )
    probs_df = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    sel = (
        probs_df.crossJoin(cum)
        .filter(F.col("cum") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p", "lo", "hi", "n")
        .agg(F.min("bucket").alias("bucket"))
    )
    # exact rank statistic from the distinct-value distribution:
    # kth = min{val : #(x <= val) >= ceil(p*n)}
    dv = df.groupBy(v.alias("val")).agg(
        F.count(F.lit(1)).alias("c")
    )
    dcum = (
        dv.alias("a")
        .join(
            dv.select(
                F.col("val").alias("v2"), F.col("c").alias("c2")
            ),
            F.col("v2") <= F.col("val"),
        )
        .groupBy("val")
        .agg(F.sum("c2").alias("ccum"))
    )
    exact = (
        probs_df.crossJoin(dcum)
        .crossJoin(F.broadcast(stats.select("n")))
        .filter(F.col("ccum") >= F.ceil(F.col("p") * F.col("n")))
        .groupBy("p")
        .agg(F.min("val").alias("exact"))
    )
    est = F.col("lo") + (F.col("bucket") + F.lit(0.5)) * bin_w
    return (
        sel.join(F.broadcast(exact), "p")
        .select(
            "p",
            F.round(est, 6).alias("grid_est"),
            F.round(F.col("exact"), 6).alias("exact"),
            F.round(F.abs(est - F.col("exact")), 6).alias("abs_err"),
            F.round(bin_w, 6).alias("err_bound"),
        )
    )
