"""Similarity search over embedding columns (array<float>).

North-star extension (SURVEY.md §2.11): brute-force cosine top-k as
the exact baseline, plus an LSH-bucketed approximate path for scale.

Precision protocol for the oracle: per-element casts to double, all
similarity outputs rounded to 6 decimals, and RANKING computed on the
ROUNDED similarity (ties broken by vec_id) — cross-engine float sums
can differ in the last ulp, and ranking on rounded values makes the
order reproducible everywhere.

Scale notes: the exact path is O(|queries| x |corpus| x dim) with the
query side broadcast — right when queries are few. For corpus-scale
all-pairs problems use the LSH path (bucket join, sub-quadratic), or
an IVF-style coarse quantizer: assign each vector to its nearest of C
centroids (one broadcast join), then search only same-cell [+ rim]
candidates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knn_using_hadoop_spark.sources import index_store as store


def _auto_n_centroids(corpus: DataFrame, n: int | None = None) -> int:
    """Data-dependent cell count: C = clamp(round(sqrt(n)), 4, 4096).

    The r3 100x stress (NOTES.md "stress find #2") proved a FIXED
    cell count is a scale bug, not a tuning nit: 16 cells over 200k
    vectors makes every within-cell stage quadratic in n/16, turning
    the "bucketed" operators back into all-pairs. sqrt(n) is both
    papers' own guidance (IVF: n/C candidates per probe and C
    assignment dots balance at C=sqrt(n); SemDeDup: cluster count
    grows with corpus) — per-cell work then stays O(sqrt(n)).
    Derivation costs ONE corpus count() and only runs when the
    caller leaves BOTH the knob and ``n`` unset; explicit values —
    e.g. every registry oracle query — skip it entirely. Cost
    caveat (ADVICE r4 #4, closed r6): the count is metadata-cheap
    only for a direct parquet scan; when the corpus is derived
    lineage (filters, joins, transforms) it executes the full
    upstream plan as an extra job — pipeline composers pass a
    precomputed ``n=`` (every auto-knob operator threads it
    through) or checkpoint the corpus first.
    """
    if n is None:
        n = corpus.count()
    return max(4, min(4096, math.isqrt(max(n, 1))))


def _auto_n_planes(
    corpus: DataFrame, k: int, n: int | None = None
) -> int:
    """Data-dependent hyperplane count for sign-LSH buckets.

    Expected bucket occupancy is n / 2^p; fixed p therefore degrades
    BOTH ways as n moves — tiny buckets (recall collapse) or huge
    ones (quadratic rerank). Target occupancy max(32, 4k) keeps the
    rerank bounded while leaving enough same-bucket candidates to
    fill top-k: p = clamp(round(log2(n / target)), 3, 24). One
    count() when the knob and ``n`` are unset, as in
    ``_auto_n_centroids`` (same derived-lineage caveat; same
    precomputed-``n`` escape).
    """
    if n is None:
        n = corpus.count()
    n = max(n, 1)
    target = max(32, 4 * k)
    p = round(math.log2(max(n / target, 1.0))) if n > target else 3
    return max(3, min(24, p))


def _training_sample(
    corpus: DataFrame,
    train_n: int | None,
    *,
    n: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Bounded, deterministic quantizer-training sample.

    FAISS trains its coarse and PQ quantizers on a sample (its
    default caps training at ~256 points per centroid), never the
    corpus: quantizer quality saturates long before the data does,
    while each Lloyd round over the full relation is a complete
    corpus pass + shuffle — at 100 TB the training cost, not the
    assignment cost, dominates index builds. ``train_n`` caps the
    training relation at ~train_n rows (expectation) by keeping ids
    whose xxhash64 falls in a 1/ceil(n/train_n) slice of hash space:
    one narrow filter, no shuffle, no RNG state — the sample is a
    pure function of the ids, so training is reproducible across
    runs, sessions, and engines. ``train_n=None`` (the default
    everywhere) trains on the full corpus — the oracle-pinned
    behavior of every registered query. Sizing: keep train_n well
    above the centroid/codeword count (FAISS warns below ~39x).
    Derived-lineage callers pass the precomputed ``n=`` (the same
    escape as the auto knobs) to avoid an extra count job.
    """
    if train_n is None:
        return corpus
    if n is None:
        n = corpus.count()
    if n <= train_n:
        return corpus
    ratio = -(-n // train_n)
    return corpus.filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(ratio)) == 0
    )


def _dot_hof(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqnorm_hof(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """dim=None -> interpreted HOF fold; dim=N -> statically unrolled
    expression form. Results are bit-identical (same left-to-right
    association). MEASURED guidance (100x corpus, NOTES r3): with
    norms factored out, the HOF fold WINS in the join-heavy IVF/
    semdedup shapes (one fold per pair beats a 128-element_at
    unrolled tree: semdedup C=256 81s HOF vs 932s unrolled; ivf_topk
    28.6s vs 264s); the unrolled form only pays off in cosine_topk's
    simple broadcast-NL scan when |pairs| reaches hundreds of
    millions. Default None everywhere."""
    return _dot_expanded(a, b, dim) if dim else _dot_hof(a, b)


def _sqnorm(a: Column, dim: int | None = None) -> Column:
    return _sqnorm_expanded(a, dim) if dim else _sqnorm_hof(a)


def _dot_expanded(a: Column, b: Column, dim: int) -> Column:
    total: Column | None = None
    for i in range(1, dim + 1):
        t = F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
        total = t if total is None else total + t
    assert total is not None
    return total


def _sqnorm_expanded(a: Column, dim: int) -> Column:
    total: Column | None = None
    for i in range(1, dim + 1):
        x = F.element_at(a, i).cast("double")
        total = x * x if total is None else total + x * x
    assert total is not None
    return total


def _collect_query_matrix(
    queries: DataFrame, id_col: str, vec_col: str, cap: int = 4096
):
    """Driver-side query fetch for the brute-force kernel — the same
    bounded-scalar-fetch budget as ``_collect_centroid_matrix``
    (cap rows; the SQL plan broadcasts this side anyway). Returns
    (qids int64 array, Q float64 (q, d) matrix) or None when the set
    exceeds the cap or has edge shapes (non-long ids, null ids /
    vectors / elements, ragged dims) — the caller falls back to the
    SQL plan, which defines the semantics.
    """
    import numpy as np

    if not isinstance(
        queries.schema[id_col].dataType, T.LongType
    ):
        return None
    rows = (
        queries.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap or not rows:
        return None
    if any(
        r[0] is None
        or r[1] is None
        or any(x is None for x in r[1])
        for r in rows
    ):
        return None
    d = len(rows[0][1])
    if d == 0 or any(len(r[1]) != d for r in rows):
        return None
    qids = np.asarray([r[0] for r in rows], dtype=np.int64)
    Q = np.array([r[1] for r in rows], dtype=np.float64)
    return qids, Q


def _bruteforce_topk_vectorized(
    corpus: DataFrame,
    qids,
    Q,
    k: int,
    dim: int | None,
    exclude_self: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact brute-force cosine top-k candidates with ZERO shuffle:
    mapInArrow over the corpus, queries captured in the closure.

    Per corpus batch, dots/norms run the SQL fold's exact IEEE op
    stream (element multiply is commutative bit-for-bit, so the
    (query x member) orientation of ``_np_fold_dots`` matches the
    zip_with(qv, cv) fold), sims are ``_round6_array``-rounded, and
    each query emits its per-BATCH top-k under the window's order
    (``_row_topk_select``) plus null-sim fill — the same superset
    argument as the cell kernel: the global top-k rows are each in
    their batch's top-k, and when the global set needs null-sim rows
    (total real < k) every batch emitted at least that many of its
    smallest. The caller's final window ranks |queries| x k x
    |partitions| candidate rows instead of the |corpus| x |queries|
    pair relation. Same ANSI divergence domain as the sibling
    kernels (zero norms; short-vs-dim rows when ``dim`` is set).
    """
    import numpy as np
    import pyarrow as pa

    start_zero = dim is None
    qn = np.sqrt(_np_fold_sqnorm(Q, start_zero=start_zero))
    qd = Q.shape[1]
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), True),
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("sim", T.DoubleType(), True),
        ]
    )
    src = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)

    def topk(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mids = rb.column(0).to_numpy(zero_copy_only=False)
            lengths, starts, vals, elem_null = _parse_vec_lists(
                rb.column(1)
            )
            m = mids.shape[0]
            # clean rows of the query dimension produce real sims;
            # everything else is a null partner (dim=None: cross-
            # length zip_with pads with null; dim set: element_at
            # 1..dim — shorter rows are the ANSI raise domain)
            real = np.zeros(m, dtype=bool)
            for i in range(m):
                li = int(lengths[i])
                if li < 0:
                    continue
                L = li if dim is None else dim
                if L != qd or li < L:
                    continue
                s = starts[i]
                if L > 0 and elem_null[s : s + L].any():
                    continue
                real[i] = True
            ridx = np.nonzero(real)[0]
            oq: list[int] = []
            ov: list[int] = []
            osim: list[float | None] = []
            taken_by_q = np.zeros(qids.shape[0], dtype=np.int64)
            if ridx.size:
                V = vals[
                    starts[ridx][:, None]
                    + np.arange(qd, dtype=np.int64)[None, :]
                ]
                with np.errstate(all="ignore"):
                    vn = np.sqrt(
                        _np_fold_sqnorm(V, start_zero=start_zero)
                    )
                gids = mids[ridx]
                qchunk = max(1, (1 << 22) // max(ridx.size, 1))
                for s0 in range(0, qids.shape[0], qchunk):
                    s1 = min(s0 + qchunk, qids.shape[0])
                    with np.errstate(all="ignore"):
                        D = _np_fold_dots(
                            Q[s0:s1], V, start_zero=start_zero
                        )
                        S = D / (qn[s0:s1, None] * vn[None, :])
                    R = _round6_array(S)
                    for r in range(s1 - s0):
                        qid = int(qids[s0 + r])
                        picks, taken = _row_topk_select(
                            R[r],
                            gids,
                            qid if exclude_self else None,
                            k,
                        )
                        for vid, sv in picks:
                            oq.append(qid)
                            ov.append(vid)
                            osim.append(sv)
                        taken_by_q[s0 + r] = taken
            else:
                taken_by_q[:] = 0
            if (taken_by_q < k).any():
                null_ids = np.sort(mids[~real])
                for r in np.nonzero(taken_by_q < k)[0]:
                    qid = int(qids[r])
                    need = k - int(taken_by_q[r])
                    for sid in null_ids:
                        if exclude_self and sid == qid:
                            continue
                        oq.append(qid)
                        ov.append(int(sid))
                        osim.append(None)
                        need -= 1
                        if need == 0:
                            break
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(oq, type=pa.int64()),
                    pa.array(ov, type=pa.int64()),
                    pa.array(osim, type=pa.float64()),
                ],
                names=["query_id", "vec_id", "sim"],
            )

    return src.mapInArrow(topk, out_schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    expand: bool = False,
    impl: str = "vectorized",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, vec_id, sim).

    Broadcast the (small) query side; one pass over the corpus.
    ``expand=True`` statically unrolls the dot/norm expressions —
    ~2x per-row throughput but ~dim*3 terms of Janino codegen; worth
    it when |corpus| x |queries| reaches hundreds of millions, a net
    loss below that (compile time dominates). Both forms share the
    same left-to-right float association, so results are identical.

    ``impl="vectorized"`` (default): the scan runs through the
    zero-shuffle brute-force Arrow kernel
    (``_bruteforce_topk_vectorized``, queries driver-collected under
    the bounded-fetch budget) and the final window ranks per-batch
    candidates — bit-identical output (pytest-pinned). Falls back to
    the SQL plan when the query set exceeds the fetch cap or has
    edge shapes, or for non-bigint corpus ids.
    """
    d = dim if expand else None
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ):
        prepared = _collect_query_matrix(queries, id_col, vec_col)
        if prepared is not None:
            qids, Q = prepared
            if d is not None and Q.shape[1] != d:
                prepared = None
        if prepared is not None:
            cand = _bruteforce_topk_vectorized(
                corpus, qids, Q, k, d, exclude_self, id_col, vec_col
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("sim").desc(), F.col("vec_id").asc()
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "vec_id", "sim")
            )
    # norms factored out of the pair stage: once per query / corpus
    # row instead of once per pair; sim = dot / (qn * cn) keeps the
    # float shape, so results are bit-identical to the inline form
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_sqnorm(F.col(vec_col), d)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_sqnorm(F.col(vec_col), d)).alias("cn"),
    )
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("qv"), F.col("cv"), d) / (
        F.col("qn") * F.col("cn")
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def cosine_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    *,
    label_col: str = "label",
) -> DataFrame:
    """Majority-vote label among cosine top-k: (query_id, prediction).

    The reference's KNN vote (Hadoop.java:243-268 semantics, corrected)
    applied to embedding space.
    """
    topk = cosine_topk(corpus, queries, k, dim)
    votes = (
        topk.join(
            corpus.select("vec_id", F.col(label_col).alias("nbr_label")),
            "vec_id",
        )
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        votes.groupBy("query_id")
        .agg(
            F.max_by(
                F.col("nbr_label"),
                F.struct(
                    F.col("cnt"), (-F.col("nbr_label")).alias("neg")
                ),
            ).alias("prediction")
        )
        .orderBy("query_id")
    )


def _np_fold_dots(V, Cm, start_zero: bool):
    """(n,d) x (C,d) -> (n,C) dot matrix with the SQL fold's exact
    IEEE-754 op sequence per element: acc = acc + v[j]*c[j] left to
    right. ``start_zero`` replicates the HOF fold's 0.0 seed
    (``_dot_hof``: 0.0 + p0 first) vs the unrolled form's bare-p0
    start (``_dot_expanded``); the two differ only on a -0.0 first
    product, but bit-exact means bit-exact. numpy's elementwise
    multiply/add are plain IEEE doubles (no FMA contraction), so each
    output element sees the identical operation stream the generated
    JVM code runs — results are bit-identical, not merely close.
    """
    import numpy as np

    n, d = V.shape
    nc = Cm.shape[0]
    out = np.empty((n, nc), dtype=np.float64)
    # cache-block the row dimension so the accumulator + temp stay
    # L2-resident — the fold makes d passes over them, and a DRAM-
    # resident accumulator turns the kernel memory-bound (measured
    # 34s -> ~3s at 200k x 447 x 64)
    blk = max(1, 262144 // max(nc, 1))
    tmp = np.empty((min(blk, n), nc), dtype=np.float64)
    for s in range(0, n, blk):
        e = min(s + blk, n)
        acc = out[s:e]
        t = tmp[: e - s]
        if start_zero:
            acc.fill(0.0)
            j0 = 0
        else:
            np.multiply(V[s:e, 0:1], Cm[:, 0].reshape(1, -1), out=acc)
            j0 = 1
        for j in range(j0, d):
            np.multiply(
                V[s:e, j : j + 1], Cm[:, j].reshape(1, -1), out=t
            )
            np.add(acc, t, out=acc)
    return out


def _np_fold_sqnorm(M, start_zero: bool):
    """Row-wise squared norm with the SQL fold's exact op sequence
    (see ``_np_fold_dots``)."""
    import numpy as np

    n, d = M.shape
    if start_zero:
        acc = np.zeros(n, dtype=np.float64)
        j0 = 0
    else:
        acc = M[:, 0] * M[:, 0]
        j0 = 1
    for j in range(j0, d):
        acc = acc + M[:, j] * M[:, j]
    return acc


_DEC_SIX = None


def _round6_like_spark(x: float) -> float:
    """Replicate Spark's ``round(double, 6)``: BigDecimal built from
    the double's string form, setScale(6, HALF_UP), back to double —
    i.e. Decimal(repr(x)) quantized HALF_UP. Python's repr and Java's
    Double.toString both emit a shortest-round-trip decimal; the
    JDK-17 legacy formatter can emit extra digits in rare cases, but
    the represented values then differ by <1 ulp and disagree with
    this replica only if that sliver straddles a 5e-7 rounding
    boundary — far below the 6dp protocol's own cross-engine
    tolerance (see module docstring).

    The ``+ 0.0`` normalizes -0.0 to +0.0: Java's BigDecimal has no
    signed zero, so Spark's round maps every value that rounds to
    zero — including tiny negatives — to POSITIVE zero, while
    Python's Decimal('-0.000000') converts to -0.0.
    """
    global _DEC_SIX
    from decimal import ROUND_HALF_UP, Decimal

    if _DEC_SIX is None:
        _DEC_SIX = Decimal("0.000001")
    return (
        float(
            Decimal(repr(x)).quantize(_DEC_SIX, rounding=ROUND_HALF_UP)
        )
        + 0.0
    )


def _collect_centroid_matrix(
    centroids: DataFrame, vec_col: str, dim: int | None
):
    """Driver-side centroid fetch for the vectorized assignment.

    Bounded by construction (C <= 4096 in every caller — the same
    bounded-scalar-fetch budget as the persisted-index probe list).
    Returns (cids, Cm, cn) with centroids sorted ascending by id, or
    None when the collected set has edge shapes the vectorized kernel
    does not replicate (null ids/vectors/elements, ragged or empty
    dims) — the caller then falls back to the SQL plan, which defines
    the semantics.
    """
    import numpy as np

    if not isinstance(
        centroids.schema["centroid_id"].dataType, T.LongType
    ):
        # the kernel emits int64 cells; other id types keep the SQL
        # plan (which preserves the centroid_id type as-is)
        return None
    rows = centroids.select(
        F.col("centroid_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    ).collect()
    if not rows:
        return [], None, None
    if any(
        r[0] is None
        or r[1] is None
        or any(x is None for x in r[1])
        for r in rows
    ):
        return None
    rows.sort(key=lambda r: r[0])
    d = len(rows[0][1])
    if d == 0 or any(len(r[1]) != d for r in rows):
        return None
    if dim is not None and dim != d:
        return None
    cids = [r[0] for r in rows]
    Cm = np.array([r[1] for r in rows], dtype=np.float64)
    cn = np.sqrt(_np_fold_sqnorm(Cm, start_zero=dim is None))
    return cids, Cm, cn


def _assign_cells_vectorized(
    vectors: DataFrame,
    cids: list,
    Cm,
    cn,
    *,
    id_col: str,
    vec_col: str,
    dim: int | None,
) -> DataFrame:
    """Arrow-batched argmax-centroid kernel, bit-identical to the SQL
    assignment plan (crossJoin + 6dp-rounded cosine + window rank).

    Per batch it runs the exact IEEE op stream of the SQL expressions
    (``_np_fold_dots``/``_np_fold_sqnorm``; sim = dot / (vn * cn);
    np.sqrt and JVM Math.sqrt are both correctly rounded), then picks
    each row's cell without materializing or shuffling the n x C pair
    relation at all:

    * rows whose raw-sim margin to the max exceeds 2e-6 cannot change
      the winner after 6dp rounding (round moves a value < 5.1e-7),
      so the common case is a pure numpy argmax;
    * the rare near-tie candidates are rounded with the exact
      BigDecimal-HALF_UP replica (``_round6_like_spark``) and ranked
      (rounded sim desc, centroid_id asc) — the window's order;
    * Spark's total-order edge semantics are preserved: NaN sims
      (NaN components, zero norms) rank above everything -> lowest
      centroid_id among the NaN columns; null dots (null vector,
      null element, and — with dim=None — length mismatch vs the
      centroid dim under the HOF zip_with) rank below everything
      and tie -> lowest centroid_id overall. With ``dim`` set the
      SQL plan is ``_dot_expanded`` (element_at 1..dim): rows with
      length >= dim are clean and sliced to their first dim
      elements (real prefix sims — the shared L = d_req protocol
      of ``_cell_topk_candidates``; ADVICE r5 #1), rows shorter
      than dim are the documented ANSI-raise (INVALID_ARRAY_INDEX)
      divergence domain and follow null-sim semantics. The other
      DEFINED divergence: an exactly-zero denominator makes the
      ANSI SQL plan raise DIVIDE_BY_ZERO (Spark 4 default); the
      kernel follows the module's documented IEEE protocol (0/0 ->
      NaN, x/0 -> ±Inf) instead — pinned in
      test_assign_vectorized.py. No real corpus has zero-norm rows;
      the SQL plan stays the semantics reference everywhere it is
      defined.

    vs the SQL plan this removes C interpreted lambda-fold dots per
    vector AND the n x C-row window Exchange — the two costs that
    made assignment the dominant stage of every IVF-family operator
    at 100x (measured in NOTES r5).
    """
    import numpy as np
    import pyarrow as pa

    spark = vectors.sparkSession
    src = vectors.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # local-mode test corpora arrive as a handful of parquet splits;
    # fan the narrow kernel out to the session's parallelism so it
    # isn't serialized onto 2-3 Python workers. At cluster scale the
    # input split count already exceeds defaultParallelism and this
    # branch is a no-op (no Exchange added).
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    out_schema = T.StructType(
        [
            T.StructField(
                "vec_id", src.schema[id_col].dataType, True
            ),
            T.StructField("cell", T.LongType(), True),
        ]
    )
    d = Cm.shape[1]
    start_zero = dim is None
    n_cents = len(cids)
    cid_arr = np.asarray(cids, dtype=np.int64)

    absC = np.abs(Cm)

    def pick_exact(svals, col_ids):
        """Winner among EXACT candidate sims ``svals`` at centroid
        column indices ``col_ids`` — the SQL window's order (6dp-
        rounded sim desc, centroid_id asc), with Spark's NaN-greatest
        total order."""
        nanm = np.isnan(svals)
        if nanm.any():
            return col_ids[int(np.argmax(nanm))]
        m = svals.max()
        keep = svals >= (m - 2e-6)
        kcols = col_ids[keep]
        if kcols.size == 1:
            return kcols[0]
        best_j = -1
        best_r = None
        for v, j in zip(svals[keep], kcols):
            r = _round6_like_spark(v) if math.isfinite(v) else v
            if best_r is None or r > best_r:
                best_r, best_j = r, j
        return best_j

    def exact_row_sims(vrow, vn_row, cols):
        """Bit-exact sims of one vector against centroid columns
        ``cols`` — the SQL fold's op stream per element."""
        Ca = Cm[cols]
        if start_zero:
            acc = np.zeros(len(cols), dtype=np.float64)
            j0 = 0
        else:
            acc = vrow[0] * Ca[:, 0]
            j0 = 1
        for j in range(j0, d):
            acc = acc + vrow[j] * Ca[:, j]
        with np.errstate(all="ignore"):
            return acc / (vn_row * cn[cols])

    # rigorous screen bound: |blas dot - sequential fold dot| <=
    # 2 * d * eps * sum|v_j c_j| for EACH of the two summation
    # orders, so 4*d*eps*S covers their difference with slack (the
    # fold's product rounding is shared; dgemm may use FMA which only
    # tightens its half). S itself comes from a matmul whose relative
    # error is ~d*eps — absorbed by the 2x slop in the constant.
    bconst = 4.0 * d * np.finfo(np.float64).eps
    all_cols = np.arange(len(cids), dtype=np.int64)

    def assign(batches):
        import pyarrow.compute as pc

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            idc = rb.column(0)
            la = rb.column(1)
            lengths = pc.list_value_length(la)
            lengths = (
                lengths.to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            null_list = pc.is_null(la).to_numpy(zero_copy_only=False)
            lengths[null_list] = -1.0
            # dim set -> the SQL plan is _dot_expanded (element_at
            # 1..dim): rows with length >= dim compute real prefix
            # sims over their first dim elements (the shared
            # L = d_req protocol of _cell_topk_candidates; ADVICE
            # r5 #1), shorter rows are the documented ANSI-raise
            # divergence domain and follow null-sim semantics.
            # dim=None -> HOF zip_with: any length mismatch vs the
            # centroid dim nulls the dot.
            regular = (
                lengths >= float(d)
                if dim is not None
                else lengths == float(d)
            )
            cells = np.full(n, cid_arr[0], dtype=np.int64)
            ridx = np.nonzero(regular)[0]
            if ridx.size:
                flat = la.flatten()
                elem_null = pc.is_null(flat).to_numpy(
                    zero_copy_only=False
                )
                vals = flat.to_numpy(zero_copy_only=False)
                # row start offsets within flat (null lists are
                # dropped by flatten, so offsets skip them)
                lens_nn = np.where(null_list, 0, lengths).astype(
                    np.int64
                )
                lens_nn[lens_nn < 0] = 0
                starts = np.concatenate(
                    ([0], np.cumsum(lens_nn)[:-1])
                )
                gather = (
                    starts[ridx][:, None]
                    + np.arange(d, dtype=np.int64)[None, :]
                )
                has_null_el = elem_null[gather].any(axis=1)
                ridx = ridx[~has_null_el]
                if ridx.size:
                    V = vals[
                        (
                            starts[ridx][:, None]
                            + np.arange(d, dtype=np.int64)[None, :]
                        )
                    ]
                    vn = np.sqrt(
                        _np_fold_sqnorm(V, start_zero=start_zero)
                    )
                    with np.errstate(all="ignore"):
                        nn = vn[:, None] * cn[None, :]
                        approx = (V @ Cm.T) / nn
                        bsim = (bconst * (np.abs(V) @ absC.T)) / nn
                    finite = np.isfinite(approx).all(
                        axis=1
                    ) & np.isfinite(bsim).all(axis=1)
                    sel = np.empty(ridx.size, dtype=np.int64)
                    fidx = np.nonzero(finite)[0]
                    if fidx.size:
                        s = approx[fidx]
                        bmax = bsim[fidx].max(axis=1)
                        thresh = (
                            s.max(axis=1) - 2.0 * bmax - 1.01e-6
                        )
                        cand = s >= thresh[:, None]
                        first = np.argmax(cand, axis=1)
                        multi = np.nonzero(cand.sum(axis=1) > 1)[0]
                        for i in multi:
                            cols = np.nonzero(cand[i])[0]
                            r = fidx[i]
                            first[i] = pick_exact(
                                exact_row_sims(V[r], vn[r], cols),
                                cols,
                            )
                        sel[fidx] = first
                    # escape hatch: any non-finite screen value
                    # (NaN components, zero norms, overflow) -> full
                    # bit-exact fold for that row
                    for r in np.nonzero(~finite)[0]:
                        sel[r] = pick_exact(
                            exact_row_sims(V[r], vn[r], all_cols),
                            all_cols,
                        )
                    cells[ridx] = cid_arr[sel]
            yield pa.RecordBatch.from_arrays(
                [idc, pa.array(cells, type=pa.int64())],
                names=["vec_id", "cell"],
            )

    if n_cents == 0:
        return spark.createDataFrame([], out_schema)
    return src.mapInArrow(assign, out_schema)


def ivf_assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """Coarse quantization: nearest centroid (by cosine) per vector.

    ``centroids`` = (centroid_id, embedding). Returns (vec_id, cell).
    Deterministic: similarity rounded to 6dp, ties to the lowest
    centroid_id — the same ranking protocol as the top-k operators.

    ``impl="vectorized"`` (default) runs the Arrow kernel
    (``_assign_cells_vectorized``): bit-identical output with ZERO
    shuffle (no pair relation, no window Exchange) and numpy-speed
    arithmetic — measured 9-30x on the 100x corpus (NOTES r5). It
    falls back to the SQL plan when the collected centroid set has
    edge shapes the kernel does not replicate (nulls, ragged dims).
    ``impl="sql"`` forces the original declarative plan — one
    broadcast join, cost O(|vectors| x |centroids| x dim) for the
    dots, norms FACTORED OUT of the pair stage (computed once per
    vector / per centroid before the join); sim = dot / (vn * cn)
    keeps the exact float shape of the inline form, so results (and
    oracles) are bit-identical between both impls — pinned by pytest
    (test_assign_vectorized.py).
    """
    if impl == "vectorized":
        prepared = _collect_centroid_matrix(centroids, vec_col, dim)
        if prepared is not None:
            cids, Cm, cn = prepared
            if not cids:
                spark = vectors.sparkSession
                return spark.createDataFrame(
                    [],
                    T.StructType(
                        [
                            T.StructField(
                                "vec_id",
                                vectors.schema[id_col].dataType,
                                True,
                            ),
                            T.StructField(
                                "cell", T.LongType(), True
                            ),
                        ]
                    ),
                )
            return _assign_cells_vectorized(
                vectors,
                cids,
                Cm,
                cn,
                id_col=id_col,
                vec_col=vec_col,
                dim=dim,
            )
    c = centroids.select(
        F.col("centroid_id"),
        F.col(vec_col).alias("centv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("cn"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("vn"),
    )
    pairs = v.crossJoin(F.broadcast(c))
    sim = F.round(
        _dot(F.col("vv"), F.col("centv"), dim)
        / (F.col("vn") * F.col("cn")),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    return (
        pairs.select("vec_id", "centroid_id", sim.alias("csim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"))
    )


def _round6_array(x):
    """Vectorized ``_round6_like_spark`` over a float64 ndarray.

    numpy integer rounding everywhere the two protocols provably
    agree; the BigDecimal-HALF_UP replica (memoized) only for values
    within ~1e-6 of a .5 decimal boundary or with |x| >= 1e3 (where
    double ulp x 1e6 approaches the boundary margin). Non-finite
    values pass through unchanged — Spark's round returns NaN/Inf
    as-is.
    """
    import numpy as np

    out = np.array(x, dtype=np.float64, copy=True)
    flat = out.reshape(-1)
    fin = np.isfinite(flat)
    if not fin.any():
        return out
    xi = flat[fin]
    with np.errstate(all="ignore"):
        d = xi * 1e6
        r = np.rint(d)
        frac = np.abs(d - np.floor(d) - 0.5)
        risky = (frac < 1e-6) | (np.abs(xi) >= 1e3)
        # + 0.0 maps -0.0 to +0.0, as Java's unsigned BigDecimal
        # does in Spark's round (see _round6_like_spark)
        vals = r / 1e6 + 0.0
    if risky.any():
        cache: dict[float, float] = {}
        for i in np.nonzero(risky)[0]:
            fv = float(xi[i])
            rv = cache.get(fv)
            if rv is None:
                rv = _round6_like_spark(fv)
                cache[fv] = rv
            vals[i] = rv
    flat[fin] = vals
    return out


def _parse_vec_lists(la):
    """Decompose an Arrow list column into flat numpy pieces:
    (lengths float64 with -1.0 for null lists, starts int64 offsets
    into vals, vals float64, elem_null bool). Shared row-parsing
    protocol of the similarity kernels (null lists are dropped by
    ``flatten``, so offsets skip them)."""
    import numpy as np
    import pyarrow.compute as pc

    lengths = (
        pc.list_value_length(la)
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    null_list = pc.is_null(la).to_numpy(zero_copy_only=False)
    lengths[null_list] = -1.0
    flat = la.flatten()
    elem_null = pc.is_null(flat).to_numpy(zero_copy_only=False)
    vals = flat.to_numpy(zero_copy_only=False)
    lens_nn = np.where(null_list, 0, lengths).astype(np.int64)
    lens_nn[lens_nn < 0] = 0
    starts = np.concatenate(([0], np.cumsum(lens_nn)[:-1]))
    return lengths, starts, vals, elem_null


def _row_topk_select(row, gids, qid, k):
    """One query's top-k among ROUNDED sims ``row`` over member ids
    ``gids`` (self excluded): the SQL window's order — NaN greatest,
    then rounded sim desc, ties by vec_id asc. Returns
    (list[(vec_id, sim)], taken). Tie groups at the k-th boundary are
    capped to the lowest ids, so duplicate piles emit k rows, not the
    pile."""
    import numpy as np

    out = []
    valid = (
        gids != qid
        if qid is not None
        else np.ones(gids.shape[0], dtype=bool)
    )
    nanm = np.isnan(row) & valid
    taken = 0
    if nanm.any():
        nids = np.sort(gids[nanm])[:k]
        for v in nids:
            out.append((int(v), float("nan")))
        taken = nids.size
    k2 = k - taken
    if k2 > 0:
        fm = valid & ~nanm
        fv = row[fm]
        fids = gids[fm]
        if fv.size <= k2:
            sel = np.arange(fv.size)
        else:
            key = -fv
            kth = np.partition(key, k2 - 1)[k2 - 1]
            better = np.nonzero(key < kth)[0]
            ties = np.nonzero(key == kth)[0]
            nb = better.size
            tsel = ties[
                np.argsort(fids[ties], kind="stable")[: k2 - nb]
            ]
            sel = np.concatenate((better, tsel))
        for j in sel:
            out.append((int(fids[j]), float(fv[j])))
        taken += sel.size
    return out, taken


def _cell_topk_candidates(
    members: DataFrame, probes: DataFrame, k: int, dim: int | None
) -> DataFrame:
    """Per-(query, cell) exact top-k candidates for the IVF-family
    pair stage: (query_id, vec_id, sim), bit-identical to what the
    SQL pair join + per-query window would keep FROM THAT CELL.

    ``members`` = (cell, vec_id, cv); ``probes`` = (cell, query_id,
    qv). The SQL plan broadcasts probes into a pair join (|cell| x
    |queries-in-cell| rows, one interpreted lambda-fold dot each),
    then ranks the full pair relation in a window Exchange. This
    kernel cogroups both sides on cell (one shuffle each, both
    output-bounded) and emits at most k rows per (query, cell) with
    the exact 6dp-rounded sim of the SQL expression — the caller's
    final window then ranks |probes| x k rows instead of the pair
    relation, and for nprobe=1 is a no-op re-sort.

    Exactness: dots/norms run the SQL fold's exact IEEE op stream
    (``_np_fold_dots``/``_np_fold_sqnorm``; sim = dot / (qn * vn));
    rounding is ``_round6_array`` (BigDecimal-HALF_UP replica at
    boundaries). Selection replicates the window order — rounded sim
    desc with Spark's NaN-greatest total order, ties by vec_id asc,
    null sims last (emitted only when the cell has fewer than k real
    sims; the SQL window keeps them too). Null sims arise exactly
    where the SQL HOF fold yields null: null vectors, null elements,
    and cross-length pairs (zip_with pads with null). Self pairs
    (vec_id == query_id) are excluded, as in the SQL filter. One
    DEFINED divergence (same as the sibling kernels, pinned in
    pytest): inputs where the ANSI plan raises — zero-norm vectors
    (DIVIDE_BY_ZERO), and with ``dim`` set, vectors shorter than dim
    (INVALID_ARRAY_INDEX) — follow IEEE/null semantics instead; the
    SQL plan stays the semantics reference everywhere it evaluates,
    and on such inputs no +/-Inf sim can exist, so NaN-vs-Inf order
    never arises.
    """
    import numpy as np
    import pyarrow as pa

    start_zero = dim is None
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), True),
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("sim", T.DoubleType(), True),
        ]
    )
    # fresh Alias per side: members and probes usually share one
    # upstream cells relation, and cogroup's self-join ambiguity
    # check rejects identical attribute ids on both sides
    mem = members.select(
        (F.col("cell") + F.lit(0)).alias("cell"),
        F.col("vec_id").alias("vec_id"),
        F.col("cv").cast("array<double>").alias("cv"),
    )
    prb = probes.select(
        (F.col("cell") + F.lit(0)).alias("cell"),
        F.col("query_id").alias("query_id"),
        F.col("qv").cast("array<double>").alias("qv"),
    )

    def _groups(ids, lengths, starts, vals, elem_null):
        """Split rows into clean length groups and a null-sim pool.

        Returns (by_len: {L: (row_idx, V, vn)}, null_rows: row idx
        whose every sim is null). With ``dim`` set, clean rows are
        sliced to the first dim elements (element_at 1..dim) and
        shorter rows join the null pool (divergence domain).
        """
        d_req = dim
        by_len: dict[int, list[int]] = {}
        null_rows = []
        n = ids.shape[0]
        for i in range(n):
            li = int(lengths[i])
            if li < 0:
                null_rows.append(i)
                continue
            L = li if d_req is None else d_req
            if d_req is not None and li < d_req:
                null_rows.append(i)
                continue
            s = starts[i]
            if L > 0 and elem_null[s : s + L].any():
                null_rows.append(i)
                continue
            by_len.setdefault(L, []).append(i)
        out = {}
        for L, idxs in by_len.items():
            gi = np.asarray(idxs, dtype=np.int64)
            if L == 0:
                V = np.empty((gi.size, 0), dtype=np.float64)
            else:
                V = vals[
                    starts[gi][:, None]
                    + np.arange(L, dtype=np.int64)[None, :]
                ]
            with np.errstate(all="ignore"):
                vn = np.sqrt(_np_fold_sqnorm(V, start_zero=start_zero))
            out[L] = (gi, V, vn)
        return out, np.asarray(null_rows, dtype=np.int64)

    def topk(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        lt = left.combine_chunks()
        rt = right.combine_chunks()
        mids = lt.column("vec_id").to_numpy(zero_copy_only=False)
        qids = rt.column("query_id").to_numpy(zero_copy_only=False)
        mg, mnull = _groups(
            mids, *_parse_vec_lists(lt.column("cv").combine_chunks())
        )
        qg, qnull = _groups(
            qids, *_parse_vec_lists(rt.column("qv").combine_chunks())
        )
        m = mids.shape[0]
        # member length label per row (-1 = null pool), for building
        # each query's cross-length null-sim pool
        mlen = np.full(m, -1, dtype=np.int64)
        for L, (gi, _, _) in mg.items():
            mlen[gi] = L
        order_all = np.argsort(mids, kind="stable")
        sorted_ids = mids[order_all]
        sorted_len = mlen[order_all]

        oq: list[int] = []
        ov: list[int] = []
        osim: list[float | None] = []

        def fill_nulls(qid, have, own_L):
            """k - have smallest member ids whose sim vs this query
            is null: the cross-length + null-pool members (own_L =
            -2 means ALL members are null-sim for this query)."""
            need = k - have
            if need <= 0:
                return
            for sid, sl in zip(sorted_ids, sorted_len):
                if sid == qid:
                    continue
                if own_L != -2 and sl == own_L:
                    continue
                oq.append(qid)
                ov.append(int(sid))
                osim.append(None)
                need -= 1
                if need == 0:
                    return

        # queries whose every sim is null: k lowest member ids
        for i in qnull:
            fill_nulls(int(qids[i]), 0, -2)

        for L, (qgi, Q, qn) in qg.items():
            grp = mg.get(L)
            if grp is None:
                for i in qgi:
                    fill_nulls(int(qids[i]), 0, L)
                continue
            gi, V, vn = grp
            gids = mids[gi]
            mL = gi.size
            qchunk = max(1, (1 << 22) // max(mL, 1))
            for s0 in range(0, qgi.size, qchunk):
                s1 = min(s0 + qchunk, qgi.size)
                with np.errstate(all="ignore"):
                    D = _np_fold_dots(
                        Q[s0:s1], V, start_zero=start_zero
                    )
                    S = D / (qn[s0:s1, None] * vn[None, :])
                R = _round6_array(S)
                for r in range(s1 - s0):
                    qid = int(qids[qgi[s0 + r]])
                    picks, taken = _row_topk_select(
                        R[r], gids, qid, k
                    )
                    for vid, sv in picks:
                        oq.append(qid)
                        ov.append(vid)
                        osim.append(sv)
                    if taken < k:
                        fill_nulls(qid, taken, L)

        return pa.table(
            {
                "query_id": pa.array(oq, type=pa.int64()),
                "vec_id": pa.array(ov, type=pa.int64()),
                "sim": pa.array(osim, type=pa.float64()),
            }
        )

    return (
        mem.groupBy("cell")
        .cogroup(prb.groupBy("cell"))
        .applyInArrow(topk, out_schema)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_centroids: int | None = None,
    n: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """IVF-style approximate cosine top-k: (query_id, rank, vec_id, sim).

    Coarse quantizer = the first ``n_centroids`` corpus vectors by id
    (sampling corpus points is the standard IVF seeding; a k-means
    refinement would drop in here without changing the dataflow).
    Search visits only the query's own cell (nprobe=1), then reranks
    exactly. Sub-quadratic: each corpus vector is scored against
    centroids once, and queries only meet their own cell's candidates.
    ``n_centroids=None`` (default) derives C = sqrt(n) from a corpus
    count — see ``_auto_n_centroids`` for why a fixed C is a scale
    bug. ``n=`` (r5 verdict #3) supplies that count precomputed, so
    a caller holding a derived-lineage corpus does not pay a full
    upstream-plan execution per operator call; pipelines count once
    on their checkpointed corpus and thread it through.

    ``impl="vectorized"`` (default) runs the pair stage through the
    per-cell Arrow kernel (``_cell_topk_candidates``): no pair-
    relation materialization, numpy fold dots, and the final window
    ranks k candidates per query instead of the pair relation —
    bit-identical output (pytest-pinned vs ``impl="sql"``). Falls
    back to the SQL plan for non-bigint id columns.
    """
    if n_centroids is None:
        n_centroids = _auto_n_centroids(corpus, n=n)
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    )
    cells = ivf_assign_cells(
        corpus, centroids, id_col=id_col, vec_col=vec_col, dim=dim
    ).localCheckpoint(eager=True)  # feeds corpus AND query joins
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ) and isinstance(queries.schema[id_col].dataType, T.LongType):
        mem = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
        ).join(cells, "vec_id")
        prb = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
        ).join(
            cells.select(
                F.col("vec_id").alias("query_id"), F.col("cell")
            ),
            "query_id",
        )
        cand = _cell_topk_candidates(mem, prb, k, dim)
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "sim")
        )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("cvn"),
    ).join(cells, "vec_id")
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("qvn"),
        )
        .join(
            cells.select(
                F.col("vec_id").alias("query_id"),
                F.col("cell"),
            ),
            "query_id",
        )
    )
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # norms factored out of the per-pair stage (see ivf_assign_cells)
    sim = _dot(F.col("qv"), F.col("cv"), dim) / (
        F.col("qvn") * F.col("cvn")
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def _mean_vectors_vectorized(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    out_vec: str,
    decimals: int,
) -> DataFrame:
    """Per-group component means as ONE groupBy-group Arrow kernel.

    Replaces the posexplode plan's |rows| x dim exploded relation
    (and its (group, pos)-keyed shuffle) with a single shuffle of the
    un-exploded vectors. Semantics replicated from the SQL plan:
    position p averages the non-null elements of every non-null array
    longer than p (posexplode skips null arrays; avg skips null
    elements and yields null when all are null), components are
    ``round(avg, decimals)``, groups whose arrays are all null/empty
    vanish. Summation inside the kernel is column-sorted pairwise
    (np.sort + np.sum): deterministic for a given multiset of values
    regardless of partition arrival order — a different fold order
    than Spark's partial aggregation, equivalent under the module's
    rounding protocol (the ~1e-13 summation noise both plans carry is
    absorbed by the same grain that makes the DuckDB oracles pass).
    """
    import numpy as np
    import pyarrow as pa

    gtype = df.schema[group_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(group_col, gtype, True),
            T.StructField(
                out_vec, T.ArrayType(T.DoubleType(), True), True
            ),
        ]
    )
    src = df.select(
        F.col(group_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )

    if decimals == 6:
        round_arr = _round6_array
    else:

        def round_arr(x):
            from decimal import ROUND_HALF_UP, Decimal

            q = Decimal(1).scaleb(-decimals)
            out = np.array(x, dtype=np.float64, copy=True)
            flat = out.reshape(-1)
            for i in range(flat.shape[0]):
                v = float(flat[i])
                if math.isfinite(v):
                    # + 0.0: BigDecimal zero is unsigned (see
                    # _round6_like_spark)
                    flat[i] = (
                        float(
                            Decimal(repr(v)).quantize(
                                q, rounding=ROUND_HALF_UP
                            )
                        )
                        + 0.0
                    )
            return out

    def mean_fn(table: pa.Table) -> pa.Table:
        tbl = table.combine_chunks()
        gcol = tbl.column(0)
        lengths, starts, vals, elem_null = _parse_vec_lists(
            tbl.column(1).combine_chunks()
        )
        live = lengths > 0
        if not live.any():
            return pa.table(
                {
                    group_col: gcol.slice(0, 0),
                    out_vec: pa.array(
                        [], type=pa.list_(pa.float64())
                    ),
                }
            )
        maxlen = int(lengths[live].max())
        lidx = np.nonzero(live)[0]
        llen = lengths[lidx].astype(np.int64)
        lstart = starts[lidx]
        means: list[float | None] = []
        if (llen == maxlen).all() and not elem_null.any():
            V = vals[
                lstart[:, None]
                + np.arange(maxlen, dtype=np.int64)[None, :]
            ]
            avg = np.sum(np.sort(V, axis=0), axis=0) / V.shape[0]
            r = round_arr(avg)
            means = [float(v) for v in r]
        else:
            for p in range(maxlen):
                rows = lidx[llen > p]
                pos = starts[rows] + p
                ok = ~elem_null[pos]
                xv = vals[pos[ok]]
                if xv.size == 0:
                    means.append(None)
                else:
                    a = np.sum(np.sort(xv)) / xv.size
                    means.append(
                        float(round_arr(np.array([a]))[0])
                    )
        return pa.table(
            {
                group_col: gcol.slice(0, 1),
                out_vec: pa.array(
                    [means], type=pa.list_(pa.float64())
                ),
            }
        )

    return src.groupBy(group_col).applyInArrow(mean_fn, out_schema)


def mean_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    *,
    out_vec: str = "centv",
    decimals: int = 6,
    impl: str = "vectorized",
) -> DataFrame:
    """Component-wise mean vector per group: (group_col, out_vec).

    ``impl="sql"``: posexplode -> (group, pos) partial+final avg ->
    re-assemble in pos order — a |rows| x dim exploded relation and a
    (group, pos)-keyed shuffle. ``impl="vectorized"`` (default): one
    groupBy-group Arrow kernel over the un-exploded vectors
    (``_mean_vectors_vectorized``) — same semantics, one shuffle of
    dim-fold fewer rows. Components are ``round(avg, decimals)`` so
    the result is reproducible across engines and partition orders
    (summation noise ~1e-13 is far below the rounding grain). Both
    paths scale to any corpus size and dimension.
    """
    if impl == "vectorized":
        return _mean_vectors_vectorized(
            df, group_col, vec_col, out_vec, decimals
        )
    comp = (
        df.select(F.col(group_col), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(group_col, "pos")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), decimals).alias("av")
        )
    )
    return comp.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "av"))),
            lambda s: s.getField("av"),
        ).alias(out_vec)
    )


def ivf_kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    iters: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    train_n: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """Deterministic Lloyd-refined IVF centroids: (centroid_id, centv).

    Seeds = the first ``n_centroids`` corpus vectors by id (standard
    corpus-point seeding), then ``iters`` rounds of assign → mean.
    ``train_n`` (r6, the FAISS training recipe) bounds BOTH stages to
    a deterministic ~train_n-row hash sample (``_training_sample``)
    — each Lloyd round then costs O(train_n), not a full corpus pass;
    with ``train_n >= n`` the sample is the corpus and the output is
    bit-identical to the default. ``n=`` supplies the corpus count
    precomputed (the auto-knob escape).
    Fully deterministic and oracle-reproducible: assignment ranks on
    cosine rounded to 6dp with ties to the lowest centroid_id, and the
    recomputed centroid components are ``round(avg(x), 6)`` — double
    summation noise across engines/partition orders is ~1e-13, far
    below the rounding grain. Cells that lose all members drop out
    (both engines agree). Each round is one broadcast join (assign)
    plus one (cell, pos) aggregation — no driver-side data movement,
    so the loop scales to any corpus size; iters is a small constant.

    Grain note (ADVICE r5 #4): the mean stage's default is the Arrow
    kernel (``mean_vectors(impl="vectorized")``), which sums each
    component in column-sorted pairwise order — a DIFFERENT fold
    order than Spark's partial aggregation, so the default is
    GRAIN-equal to ``impl="sql"`` (and the DuckDB oracle), not
    bit-identical: a component sum landing within ~1ulp of a 6dp
    HALF_UP boundary could in principle round apart and shift a
    centroid. The rounding replica itself is pinned exactly at
    boundaries (test_mean_vectors_rounding_boundary_adversarial);
    every registry corpus passes whole-relation parity
    (test_mean_vectors_real_corpus), so a flip would be caught, not
    silent.
    """
    train = _training_sample(corpus, train_n, n=n, id_col=id_col)
    seed_src = train
    if train_n is not None and train is not corpus:
        # the hash sample is ~train_n only in EXPECTATION — if it
        # undershoots n_centroids, limit() would silently seed (and
        # emit) fewer centroids (ADVICE r6 #3). Seed from the full
        # corpus in that case; Lloyd rounds still run on the sample.
        # The count is one narrow-filter job, paid only on the
        # sampled path.
        if train.count() < n_centroids:
            seed_src = corpus
    cents = (
        seed_src.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centv"),
        )
    )
    for _ in range(iters):
        cells = ivf_assign_cells(
            train,
            cents.select("centroid_id", F.col("centv").alias(vec_col)),
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
        )
        assigned = train.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vv")
        ).join(cells, "vec_id")
        cents = mean_vectors(assigned, "cell", "vv").select(
            F.col("cell").alias("centroid_id"), "centv"
        )
    return cents


def ivf_probe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_centroids: int | None = None,
    n: int | None = None,
    iters: int = 1,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    train_n: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """IVF ANN with k-means-refined cells and multi-probe search.

    The scale path past ``ivf_topk``'s nprobe=1: each query visits its
    ``nprobe`` nearest cells (recall recovers the neighbors that sit
    just across a Voronoi boundary), candidates are reranked exactly.
    Cost: |corpus| x C assignment (broadcast join, C tiny), then each
    query meets ~nprobe/C of the corpus — sub-quadratic, shuffle keyed
    on cell. Returns (query_id, rank, vec_id, sim).
    ``n_centroids=None`` derives C = sqrt(n) (``_auto_n_centroids``);
    ``n=`` supplies the corpus count precomputed (r5 verdict #3 —
    derived-lineage callers avoid an extra full upstream execution).
    ``train_n`` (r6) caps the quantizer FIT at a deterministic hash
    sample (``_training_sample``): Lloyd rounds then cost O(train_n)
    instead of a full corpus pass each — assignment and search are
    unchanged and still cover every corpus row. Default None = full
    training, the oracle-pinned behavior.

    ``impl="vectorized"`` (default) runs the candidate stage through
    the per-cell Arrow kernel (``_cell_topk_candidates``, emitting
    top-k per probed cell); the final window merges nprobe x k
    candidates per query — the same rows and order the SQL pair plan
    keeps, since any global top-k row is in its own cell's top-k.
    Falls back to the SQL pair plan for non-bigint id columns.
    """
    if n_centroids is None:
        n_centroids = _auto_n_centroids(corpus, n=n)
    cents = ivf_kmeans_centroids(
        corpus, n_centroids, iters, id_col=id_col, vec_col=vec_col,
        dim=dim, train_n=train_n, n=n,
    ).localCheckpoint(eager=True)  # feeds assignment AND probe rank
    cells = ivf_assign_cells(
        corpus,
        cents.select("centroid_id", F.col("centv").alias(vec_col)),
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    # top-nprobe cells per query, ranked on the same rounded cosine;
    # norms factored out of both pair stages (see ivf_assign_cells)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("qvn"),
    )
    qc = q.crossJoin(
        F.broadcast(
            cents.withColumn(
                "cnn", F.sqrt(_sqnorm(F.col("centv"), dim))
            )
        )
    )
    # nullif (r6, same closure as semdedup's centroid_sim): a
    # degenerate zero-norm centroid (or query) yields null psim —
    # ranked last by the desc window, i.e. never probed — instead of
    # an ANSI DIVIDE_BY_ZERO raise before any candidate is scored
    qsim = F.round(
        _dot(F.col("qv"), F.col("centv"), dim)
        / F.nullif(F.col("qvn") * F.col("cnn"), F.lit(0.0)),
        6,
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.select(
            "query_id", "qv", "qvn", "centroid_id", qsim.alias("psim")
        )
        .withColumn("pn", F.row_number().over(wprobe))
        .filter(F.col("pn") <= nprobe)
        .select(
            "query_id", "qv", "qvn", F.col("centroid_id").alias("cell")
        )
    )
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ) and isinstance(queries.schema[id_col].dataType, T.LongType):
        mem = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
        ).join(cells, "vec_id")
        cand = _cell_topk_candidates(
            mem, probes.select("cell", "query_id", "qv"), k, dim
        )
        wf = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "sim")
        )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("cvn"),
    ).join(cells, "vec_id")
    pairs = c.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("qv"), F.col("cv"), dim) / (
        F.col("qvn") * F.col("cvn")
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def _lsh_buckets_vectorized(
    df: DataFrame,
    id_in: str,
    id_out: str,
    vec_col: str,
    S,
    n_planes: int,
    dim: int,
) -> DataFrame:
    """Arrow-batched sign-LSH bucket kernel: (id_out, _vv, bucket),
    bit-identical bucket ids to the SQL ``bucket_expr`` (one
    interpreted zip_with+aggregate fold PER PLANE per row — the last
    interpreted HOF in the ANN hot path, r5 verdict #4).

    The SQL expression per plane is ``aggregate(zip_with(signs, v,
    s*x), 0.0, acc+x) > 0`` with Spark's comparison semantics. The
    kernel replicates it exactly (pinned in
    test_ivf_topk_vectorized.py on hostile corpora):

    * clean rows (length == dim, no null elements, all finite): one
      BLAS ``V @ S.T`` screen; a plane's bit is provably equal to
      the fold's when |proj| exceeds the rigorous error bound
      4*d*eps*sum|v| (sign products are EXACT — |s|=1 — so only
      addition order contributes; same argument as
      ``_assign_cells_vectorized``). Rows with any borderline plane
      re-run the exact fold op stream (acc = 0.0; acc += s_j*x_j
      left-to-right), so an exactly-zero projection yields bit 0
      precisely as ``proj > 0`` does;
    * NaN projections set the bit (Spark treats NaN as greater than
      any value — measured, not assumed); ±Inf keep their sign, and
      Inf-Inf cancellation flows through the exact fold;
    * null list / null element / ANY length != dim (zip_with pads
      the shorter side with null -> null products -> null fold ->
      ``null > 0`` is null -> otherwise-0): bucket 0 for every
      plane. Unlike ``_dot_expanded``'s prefix protocol, the signs
      array is FIXED at dim, so over-length rows are null too.

    Scale shape: zero shuffle (mapInArrow over the scan), output =
    input rows, and the vector column rides along so the caller
    feeds the per-bucket candidate kernel without re-reading the
    corpus.
    """
    import numpy as np
    import pyarrow as pa

    spark = df.sparkSession
    src = df.select(
        F.col(id_in).alias(id_out),
        F.col(vec_col).cast("array<double>").alias("_vv"),
    )
    # same local-mode fan-out as _assign_cells_vectorized: no-op at
    # cluster scale where split count >= defaultParallelism
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    out_schema = T.StructType(
        [
            T.StructField(id_out, T.LongType(), True),
            T.StructField(
                "_vv", T.ArrayType(T.DoubleType(), True), True
            ),
            T.StructField("bucket", T.IntegerType(), True),
        ]
    )
    ST = np.ascontiguousarray(np.asarray(S, dtype=np.float64).T)
    bconst = 4.0 * dim * np.finfo(np.float64).eps
    bitvals = (1 << np.arange(n_planes, dtype=np.int64)).astype(
        np.int64
    )

    def buckets(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            idc = rb.column(0)
            la = rb.column(1)
            lengths, starts, vals, elem_null = _parse_vec_lists(la)
            bkt = np.zeros(n, dtype=np.int64)
            ridx = np.nonzero(lengths == float(dim))[0]
            if ridx.size:
                gather = (
                    starts[ridx][:, None]
                    + np.arange(dim, dtype=np.int64)[None, :]
                )
                keep = ~elem_null[gather].any(axis=1)
                ridx = ridx[keep]
            if ridx.size:
                V = vals[
                    starts[ridx][:, None]
                    + np.arange(dim, dtype=np.int64)[None, :]
                ]
                with np.errstate(all="ignore"):
                    P = V @ ST
                    B = bconst * np.abs(V).sum(axis=1)
                fin = np.isfinite(V).all(axis=1) & np.isfinite(
                    P
                ).all(axis=1)
                safe = fin & (np.abs(P) > B[:, None]).all(axis=1)
                bits = P > 0.0
                ex = np.nonzero(~safe)[0]
                if ex.size:
                    Vx = V[ex]
                    acc = np.zeros(
                        (ex.size, n_planes), dtype=np.float64
                    )
                    with np.errstate(all="ignore"):
                        for j in range(dim):
                            acc = acc + Vx[:, j : j + 1] * ST[j][
                                None, :
                            ]
                    bits[ex] = np.isnan(acc) | (acc > 0.0)
                bkt[ridx] = (
                    bits.astype(np.int64) * bitvals[None, :]
                ).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [idc, la, pa.array(bkt.astype(np.int32))],
                names=[id_out, "_vv", "bucket"],
            )

    return src.mapInArrow(buckets, out_schema)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    *,
    n_planes: int | None = None,
    n: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    impl: str = "vectorized",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Deterministic hyperplanes: component r[p][i] derived from the
    portable hash of "p:i", mapped to {-1,+1} — reproducible across
    engines and runs with no RNG state. Vectors sharing the query's
    sign-pattern bucket are reranked exactly; recall < 1 by design
    (bucket miss) — this is the scale path, the exact path is
    ``cosine_topk``. ``n_planes=None`` derives the plane count from
    the corpus size so expected bucket occupancy tracks max(32, 4k)
    as n grows (``_auto_n_planes``); ``n=`` supplies that count
    precomputed (r5 verdict #3 — derived-lineage callers avoid an
    extra full upstream execution).

    ``impl="vectorized"`` (default): bucket ids come from the Arrow
    sign kernel (``_lsh_buckets_vectorized``, bit-identical to the
    interpreted ``bucket_expr`` — r5 verdict #4) and the rerank runs
    through the shared per-cell Arrow kernel
    (``_cell_topk_candidates``, bucket = cell) — same candidate
    protocol as the IVF family, bit-identical output (pytest-
    pinned). ``impl="sql"`` keeps the HOF bucket expression and the
    bucket-join + window pair plan.
    """
    if n_planes is None:
        n_planes = _auto_n_planes(corpus, k, n=n)
    import hashlib

    def plane_sign(p: int, i: int) -> float:
        # same value as functions.hashing.portable_hash32 / the oracle's
        # md5 expression, but folded at plan-build time so the physical
        # plan carries plain +/- arithmetic instead of 512 md5 calls
        h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
        return 1.0 if h % 2 == 0 else -1.0

    def bucket_expr(vec: Column) -> Column:
        # HOF fold per plane (not a statically expanded 512-term
        # expression: that form costs ~20s of Janino codegen while the
        # data side is tiny; the fold keeps the same left-to-right
        # float association, so values are unchanged)
        total: Column | None = None
        for p in range(n_planes):
            signs = F.array(
                *[F.lit(plane_sign(p, i)) for i in range(1, dim + 1)]
            )
            proj = F.aggregate(
                F.zip_with(signs, vec, lambda s, x: s * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            total = bit if total is None else total + bit
        assert total is not None
        return total

    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ) and isinstance(queries.schema[id_col].dataType, T.LongType):
        # buckets from the Arrow kernel (bit-identical to
        # bucket_expr, r5 verdict #4 — drops n_planes interpreted
        # zip_with folds per row), then the bucket IS the cell:
        # same candidate protocol as the IVF family (per-bucket
        # exact top-k, window over k rows per query instead of the
        # bucket-pair relation)
        import numpy as np

        Snp = np.array(
            [
                [plane_sign(p, i) for i in range(1, dim + 1)]
                for p in range(n_planes)
            ],
            dtype=np.float64,
        )
        ck = _lsh_buckets_vectorized(
            corpus, id_col, "vec_id", vec_col, Snp, n_planes, dim
        )
        qk = _lsh_buckets_vectorized(
            queries, id_col, "query_id", vec_col, Snp, n_planes, dim
        )
        cand = _cell_topk_candidates(
            ck.select(
                F.col("bucket").cast("long").alias("cell"),
                "vec_id",
                F.col("_vv").alias("cv"),
            ),
            qk.select(
                F.col("bucket").cast("long").alias("cell"),
                "query_id",
                F.col("_vv").alias("qv"),
            ),
            k,
            None,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "sim")
        )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # few candidates post-bucketing -> HOF folds (cheap to compile)
    sim = _dot_hof(F.col("qv"), F.col("cv")) / (
        F.sqrt(_sqnorm_hof(F.col("qv"))) * F.sqrt(_sqnorm_hof(F.col("cv")))
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed ANN scoring
# ---------------------------------------------------------------------------

PQ_M = 32  # subspaces (sub-width 2 at dim=64; finer = higher recall)
PQ_KS = 32  # codes per subspace (5 bits; 32 codes x 32 subs = 8x compression)


def _sub_sqdist(a: Column, b: Column) -> Column:
    """Rounded squared L2 between two (sub)vectors.

    (x-y)*(x-y) multiplication (not pow — exact IEEE in both engines);
    the unordered-sum ulp noise is absorbed by the 6dp rounding, the
    repo-wide similarity protocol.
    """
    return F.round(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_codebook(
    corpus: DataFrame,
    *,
    m: int = PQ_M,
    ks: int = PQ_KS,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codebook: (sub, code, cv) — ks codewords per subspace.

    Codewords = the subvectors of the first ``ks`` corpus vectors
    (dense-id convention: rows with ``id < ks``; corpus-point seeding,
    same policy as the IVF coarse quantizer — a per-subspace Lloyd
    refinement would drop in without changing the dataflow). Constant
    size (m x ks rows), always broadcast.
    """
    sub_w = dim // m
    seeds = corpus.filter(F.col(id_col) < ks)
    return seeds.select(
        F.col(id_col).alias("code"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "sub",
        "code",
        F.slice(
            F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
        ).alias("cv"),
    )


def _collect_pq_codebook(
    codebook: DataFrame, sub_w: int, cap: int = 1 << 17
):
    """Driver-side codebook fetch for the PQ kernels — bounded by
    construction (m x ks rows; cap is a guard). Returns
    (subs_present sorted, {sub: codes int64 sorted asc},
    {sub: (ncodes, sub_w) float64 matrix in code order}) or None on
    edge shapes (non-int sub/code, null/ragged/long codewords, null
    elements) — the caller falls back to the SQL plan.
    """
    import numpy as np

    rows = (
        codebook.select(
            F.col("sub").cast("long"),
            F.col("code"),
            F.col("cv").cast("array<double>").alias("_cv"),
        )
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap or not rows:
        return None
    by_sub: dict[int, list] = {}
    for r in rows:
        s, c, v = r[0], r[1], r[2]
        if (
            s is None
            or c is None
            or not isinstance(c, int)
            or v is None
            or len(v) != sub_w
            or any(x is None for x in v)
        ):
            return None
        by_sub.setdefault(int(s), []).append((int(c), v))
    subs = sorted(by_sub)
    codes = {}
    mats = {}
    for s in subs:
        ent = sorted(by_sub[s], key=lambda t: t[0])
        codes[s] = np.asarray([c for c, _ in ent], dtype=np.int64)
        mats[s] = np.array([v for _, v in ent], dtype=np.float64)
    return subs, codes, mats


def _batch_sub_codes(
    lengths, starts, vals, elem_null, sub: int, sub_w: int, codes, mat
):
    """Per-batch nearest-codeword INDEX for one subspace, bit-
    identical to the SQL argmin window (rounded ``_sub_sqdist`` asc
    nulls first, code asc). Rows whose slice span is missing, short,
    or null-bearing have null distances against EVERY codeword —
    the window then falls back to code asc, i.e. index 0 (codes are
    sorted). All-NaN rows land on index 0 the same way. Returns an
    int64 index array into ``codes``."""
    import numpy as np

    n = lengths.shape[0]
    lo = sub * sub_w
    hi = lo + sub_w
    sel = np.zeros(n, dtype=np.int64)
    clean = lengths >= hi
    cidx = np.nonzero(clean)[0]
    if cidx.size:
        gather = (
            starts[cidx][:, None] + lo
            + np.arange(sub_w, dtype=np.int64)[None, :]
        )
        bad = elem_null[gather].any(axis=1)
        cidx = cidx[~bad]
    if cidx.size:
        V = vals[
            starts[cidx][:, None] + lo
            + np.arange(sub_w, dtype=np.int64)[None, :]
        ]
        with np.errstate(all="ignore"):
            D = _np_fold_sqdists(V, mat)
        R = _round6_array(D)
        with np.errstate(all="ignore"):
            rmin = np.nanmin(
                np.where(np.isnan(R), np.inf, R), axis=1
            )
        first = np.argmax(R == rmin[:, None], axis=1)
        # all-NaN rows: no R element equals rmin (inf) -> argmax of
        # all-False is 0 = lowest code, the window's null/NaN order
        sel[cidx] = first
    return sel


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    *,
    m: int = PQ_M,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "vectorized",
) -> DataFrame:
    """Encode each vector as m codes: (vec_id, sub, code).

    ``impl="sql"``: one broadcast join against the m x ks codebook +
    an argmin window per (vec_id, sub) — a |corpus| x m x ks
    intermediate relation, the term that dominates every PQ stage as
    ks grows. ``impl="vectorized"`` (default): a ZERO-shuffle
    mapInArrow kernel with the codebook collected driver-side
    (bounded m x ks fetch) — |corpus| x m output rows, no
    intermediate blowup, bit-identical codes (pytest-pinned; rounded
    sqdist asc nulls-first, code asc — null/short/ragged slices take
    the lowest code exactly as the window does). Falls back to the
    SQL plan on codebook edge shapes or non-bigint ids. This is the
    compression pass: downstream, a vector is m small ints (m bytes
    at ks<=256) instead of dim floats — the 32x memory cut that lets
    a 100 TB corpus's index live in cluster RAM.
    """
    sub_w = dim // m
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ):
        book = _collect_pq_codebook(codebook, sub_w)
        if book is not None:
            import numpy as np
            import pyarrow as pa

            subs_present, codes, mats = book
            out_schema = T.StructType(
                [
                    T.StructField("vec_id", T.LongType(), True),
                    T.StructField("sub", T.IntegerType(), True),
                    T.StructField("code", T.LongType(), True),
                ]
            )
            src = corpus.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            spark = corpus.sparkSession
            target = spark.sparkContext.defaultParallelism
            if src.rdd.getNumPartitions() < target:
                src = src.repartition(target)

            def encode(batches):
                for rb in batches:
                    if rb.num_rows == 0:
                        continue
                    ids = rb.column(0).to_numpy(
                        zero_copy_only=False
                    )
                    parsed = _parse_vec_lists(rb.column(1))
                    oid = []
                    osub = []
                    ocode = []
                    for s in subs_present:
                        sel = _batch_sub_codes(
                            *parsed, s, sub_w, codes[s], mats[s]
                        )
                        oid.append(ids.astype(np.int64))
                        osub.append(
                            np.full(
                                ids.shape[0], s, dtype=np.int32
                            )
                        )
                        ocode.append(codes[s][sel])
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(np.concatenate(oid)),
                            pa.array(np.concatenate(osub)),
                            pa.array(np.concatenate(ocode)),
                        ],
                        names=["vec_id", "sub", "code"],
                    )

            return src.mapInArrow(encode, out_schema)
    subs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "vec_id",
        "sub",
        F.slice(
            F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
        ).alias("sv"),
    )
    scored = subs.join(F.broadcast(codebook), "sub").select(
        "vec_id",
        "sub",
        "code",
        _sub_sqdist(F.col("sv"), F.col("cv")).alias("d"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d").asc(), F.col("code").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )


def _pq_adc_tables(Q, subs_present, codes, mats, sub_w):
    """Per-subspace ADC lookup tables for a collected query matrix:
    {sub: (q, ncodes) rounded sqdist matrix} — the exact values of
    the SQL plan's qd column (fold op stream + the BigDecimal
    replica), computed once driver-side (q x m x ks doubles)."""
    import numpy as np

    tables = {}
    for s in subs_present:
        lo = s * sub_w
        Qs = Q[:, lo : lo + sub_w]
        with np.errstate(all="ignore"):
            D = _np_fold_sqdists(Qs, mats[s])
        tables[s] = _round6_array(D)
    return tables


def _pq_adc_scan_vectorized(
    corpus: DataFrame,
    qids,
    tables,
    subs_present,
    codes,
    mats,
    sub_w: int,
    k: int,
    id_col: str,
    vec_col: str,
    qcells=None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """Fused encode + ADC scoring with ZERO extra shuffle: one
    mapInArrow pass over the corpus (joined with its cells relation
    when ``qcells`` restricts scoring to same-cell pairs — the IVFPQ
    shape). Per batch: each subspace's nearest-code INDEX via the
    exact argmin kernel (``_batch_sub_codes``), then adc = the sum
    of per-sub table hits accumulated IN SUB ORDER and rounded —
    deterministic; Spark's groupBy-sum folds in partition order
    instead, the same order-noise the 6dp grain absorbs between the
    engines today (pytest still pins equality on the test corpora).
    Every corpus row scores (null/short rows encode to the lowest
    code per sub, exactly like the SQL window), so there are no null
    candidates; per-batch top-k + the caller's final window replace
    the |corpus| x m x ks encode relation and the |corpus|-row
    aggregation. Emits (query_id, vec_id, adc_dist).
    """
    import numpy as np
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), True),
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("adc_dist", T.DoubleType(), True),
        ]
    )
    if cells is not None:
        src = (
            corpus.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
            .join(cells, "vec_id")
            .select("vec_id", "_v", "cell")
        )
    else:
        src = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    nq = qids.shape[0]
    with_cells = cells is not None
    if with_cells:
        # cell -> query index array, so each batch only pays ADC
        # arithmetic for (member, query) pairs sharing a cell — the
        # SQL plan's cell equi-join, applied BEFORE the gather-sum
        qbycell: dict[int, list[int]] = {}
        for i in range(nq):
            qbycell.setdefault(int(qcells[i]), []).append(i)
        qbycell_arr = {
            c: np.asarray(v, dtype=np.int64)
            for c, v in qbycell.items()
        }
    else:
        qbycell_arr = None

    def _emit(acc_rounded, qsel, gids, oq, ov, od):
        for r in range(qsel.shape[0]):
            qid = int(qids[qsel[r]])
            picks, _ = _row_topk_select_asc(
                acc_rounded[r], gids, qid, k
            )
            for vid, dv in picks:
                oq.append(qid)
                ov.append(vid)
                od.append(dv)

    def scan(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            mids = rb.column(0).to_numpy(zero_copy_only=False)
            parsed = _parse_vec_lists(rb.column(1))
            mcell = (
                rb.column(2).to_numpy(zero_copy_only=False)
                if with_cells
                else None
            )
            idx = {
                s: _batch_sub_codes(
                    *parsed, s, sub_w, codes[s], mats[s]
                )
                for s in subs_present
            }
            oq: list[int] = []
            ov: list[int] = []
            od: list[float] = []
            if with_cells:
                for c in np.unique(mcell):
                    qsel = qbycell_arr.get(int(c))
                    if qsel is None:
                        continue
                    mmask = mcell == c
                    gids = mids[mmask]
                    nm = gids.shape[0]
                    subidx = {
                        s: idx[s][mmask] for s in subs_present
                    }
                    qchunk = max(1, (1 << 22) // max(nm, 1))
                    for s0 in range(0, qsel.shape[0], qchunk):
                        qs = qsel[s0 : s0 + qchunk]
                        acc = np.zeros(
                            (qs.shape[0], nm), dtype=np.float64
                        )
                        for s in subs_present:
                            np.add(
                                acc,
                                tables[s][qs][:, subidx[s]],
                                out=acc,
                            )
                        _emit(
                            _round6_array(acc), qs, gids,
                            oq, ov, od,
                        )
            else:
                allq = np.arange(nq, dtype=np.int64)
                qchunk = max(1, (1 << 22) // max(n, 1))
                for s0 in range(0, nq, qchunk):
                    qs = allq[s0 : s0 + qchunk]
                    acc = np.zeros(
                        (qs.shape[0], n), dtype=np.float64
                    )
                    for s in subs_present:
                        np.add(
                            acc,
                            tables[s][qs][:, idx[s]],
                            out=acc,
                        )
                    _emit(
                        _round6_array(acc), qs, mids, oq, ov, od
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(oq, type=pa.int64()),
                    pa.array(ov, type=pa.int64()),
                    pa.array(od, type=pa.float64()),
                ],
                names=["query_id", "vec_id", "adc_dist"],
            )

    return src.mapInArrow(scan, out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    m: int = PQ_M,
    ks: int = PQ_KS,
    dim: int,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_n: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes:
    (query_id, rank, vec_id, adc_dist).

    The query stays exact; each corpus vector is scored through its
    codes: adc = sum over subspaces of ||q_sub - codeword(code)||².
    Per (query, sub) the ks distances form a lookup table, so scoring
    a candidate costs m table hits instead of a dim-wide dot — with
    dim=64, m=8 that is 8x less arithmetic and 32x less candidate
    data. ``impl="sql"`` runs the table join in long format (join on
    (sub, code), sum per pair). ``impl="vectorized"`` (default) IS
    the packed-scan design the long format approximates: one fused
    mapInArrow pass encodes each batch and scores it through
    driver-built lookup tables (``_pq_adc_scan_vectorized``) — no
    |corpus| x m x ks relation, no |corpus|-row aggregation, the
    final window ranks per-batch candidates. Bounded driver fetches
    (codebook m x ks, queries under the same cap as the other
    kernels); SQL fallback on edge shapes. Ranking: (adc_dist asc,
    vec_id asc) on rounded sums — the deterministic repo protocol.
    """
    cb = pq_codebook(
        corpus, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    if iters > 0:
        cb = pq_refine_codebook(
            corpus, cb, m=m, dim=dim, iters=iters,
            id_col=id_col, vec_col=vec_col, train_n=train_n,
        ).localCheckpoint(eager=True)  # feeds encode AND the ADC table
    sub_w = dim // m
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ):
        book = _collect_pq_codebook(cb, sub_w)
        prepared = (
            _collect_query_matrix(queries, id_col, vec_col)
            if book is not None
            else None
        )
        if prepared is not None and prepared[1].shape[1] == dim:
            qids, Q = prepared
            subs_present, pcodes, mats = book
            tables = _pq_adc_tables(
                Q, subs_present, pcodes, mats, sub_w
            )
            cand = _pq_adc_scan_vectorized(
                corpus, qids, tables, subs_present, pcodes, mats,
                sub_w, k, id_col, vec_col,
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("adc_dist").asc(), F.col("vec_id").asc()
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "vec_id", "adc_dist")
            )
    codes = pq_encode(
        corpus, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    )
    sub_w = dim // m
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "query_id",
        "sub",
        F.slice(
            F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
        ).alias("qsv"),
    )
    adc = qsubs.join(F.broadcast(cb), "sub").select(
        "query_id",
        "sub",
        "code",
        _sub_sqdist(F.col("qsv"), F.col("cv")).alias("qd"),
    )
    pairs = codes.join(F.broadcast(adc), ["sub", "code"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    approx = pairs.groupBy("query_id", "vec_id").agg(
        F.round(F.sum("qd"), 6).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_dist")
    )


def _np_fold_sqdists(Q, V):
    """(q, d) x (m, d) -> (q, m) squared-L2 matrix with the SQL
    fold's exact IEEE op sequence per element: acc = acc +
    (q[j]-v[j])*(q[j]-v[j]) left to right from the 0.0 seed
    (``_sub_sqdist``'s zip_with stream). Row-blocked like
    ``_np_fold_dots`` so the accumulator stays cache-resident."""
    import numpy as np

    nq, d = Q.shape
    m = V.shape[0]
    out = np.empty((nq, m), dtype=np.float64)
    blk = max(1, 262144 // max(m, 1))
    tmp = np.empty((min(blk, nq), m), dtype=np.float64)
    for s in range(0, nq, blk):
        e = min(s + blk, nq)
        acc = out[s:e]
        t = tmp[: e - s]
        acc.fill(0.0)
        for j in range(d):
            np.subtract(
                Q[s:e, j : j + 1], V[:, j].reshape(1, -1), out=t
            )
            np.multiply(t, t, out=t)
            np.add(acc, t, out=acc)
    return out


def _row_topk_select_asc(row, gids, qid, k):
    """Mirror of ``_row_topk_select`` for DISTANCE ranking (rounded
    dist asc, ties vec_id asc): NaN is greatest, so NaN rows come
    LAST, after every finite distance. Null handling stays with the
    caller (asc windows put nulls FIRST in Spark)."""
    import numpy as np

    out = []
    valid = (
        gids != qid
        if qid is not None
        else np.ones(gids.shape[0], dtype=bool)
    )
    nanm = np.isnan(row) & valid
    fm = valid & ~nanm
    fv = row[fm]
    fids = gids[fm]
    if fv.size <= k:
        sel = np.arange(fv.size)
    else:
        kth = np.partition(fv, k - 1)[k - 1]
        better = np.nonzero(fv < kth)[0]
        ties = np.nonzero(fv == kth)[0]
        tsel = ties[
            np.argsort(fids[ties], kind="stable")[: k - better.size]
        ]
        sel = np.concatenate((better, tsel))
    for j in sel:
        out.append((int(fids[j]), float(fv[j])))
    taken = sel.size
    if taken < k and nanm.any():
        nids = np.sort(gids[nanm])[: k - taken]
        for v in nids:
            out.append((int(v), float("nan")))
        taken += nids.size
    return out, taken


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "vectorized",
) -> DataFrame:
    """Exact squared-L2 top-k (the ground truth PQ approximates):
    (query_id, rank, vec_id, dist).

    ``impl="vectorized"`` (default): zero-shuffle mapInArrow scan,
    queries driver-collected under the bounded-fetch budget —
    the squared-L2 twin of ``cosine_topk``'s kernel, with the asc
    window's edge order mirrored (nulls FIRST, NaN last). No ANSI
    divergence domain here: the score has no division. Bit-parity
    pinned vs ``impl="sql"``.
    """
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ):
        prepared = _collect_query_matrix(queries, id_col, vec_col)
        if prepared is not None:
            qids, Q = prepared
            cand = _l2_candidates_vectorized(
                corpus, qids, Q, k, id_col, vec_col
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("dist").asc(), F.col("vec_id").asc()
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "vec_id", "dist")
            )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        _sub_sqdist(F.col("qv"), F.col("cv")).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "dist")
    )


def _l2_candidates_vectorized(
    corpus: DataFrame, qids, Q, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Per-batch squared-L2 top-k candidates for ``l2_topk``:
    the brute-force kernel with the asc window's order. Null dists
    (null vectors/elements, cross-length zip_with) sort FIRST under
    asc, so each batch emits its k smallest null-partner ids BEFORE
    filling with real distances — mirrored superset argument."""
    import numpy as np
    import pyarrow as pa

    qd = Q.shape[1]
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), True),
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("dist", T.DoubleType(), True),
        ]
    )
    src = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)

    def topk(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mids = rb.column(0).to_numpy(zero_copy_only=False)
            lengths, starts, vals, elem_null = _parse_vec_lists(
                rb.column(1)
            )
            m = mids.shape[0]
            real = np.zeros(m, dtype=bool)
            for i in range(m):
                if int(lengths[i]) != qd:
                    continue
                s = starts[i]
                if qd > 0 and elem_null[s : s + qd].any():
                    continue
                real[i] = True
            null_ids = np.sort(mids[~real])
            ridx = np.nonzero(real)[0]
            oq: list[int] = []
            ov: list[int] = []
            od: list[float | None] = []
            if ridx.size:
                V = vals[
                    starts[ridx][:, None]
                    + np.arange(qd, dtype=np.int64)[None, :]
                ]
                gids = mids[ridx]
            else:
                V = None
                gids = None
            qchunk = max(1, (1 << 22) // max(ridx.size, 1))
            for s0 in range(0, qids.shape[0], qchunk):
                s1 = min(s0 + qchunk, qids.shape[0])
                R = None
                if V is not None:
                    with np.errstate(all="ignore"):
                        D = _np_fold_sqdists(Q[s0:s1], V)
                    R = _round6_array(D)
                for r in range(s1 - s0):
                    qid = int(qids[s0 + r])
                    taken = 0
                    for sid in null_ids:
                        if sid == qid:
                            continue
                        oq.append(qid)
                        ov.append(int(sid))
                        od.append(None)
                        taken += 1
                        if taken == k:
                            break
                    if taken < k and R is not None:
                        picks, got = _row_topk_select_asc(
                            R[r], gids, qid, k - taken
                        )
                        for vid, dv in picks:
                            oq.append(qid)
                            ov.append(vid)
                            od.append(dv)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(oq, type=pa.int64()),
                    pa.array(ov, type=pa.int64()),
                    pa.array(od, type=pa.float64()),
                ],
                names=["query_id", "vec_id", "dist"],
            )

    return src.mapInArrow(topk, out_schema)


def pq_refine_codebook(
    corpus: DataFrame,
    codebook: DataFrame,
    *,
    m: int = PQ_M,
    dim: int,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_n: int | None = None,
    n: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """Per-subspace Lloyd refinement of a PQ codebook.

    Each iteration assigns every corpus subvector to its nearest
    codeword (``pq_encode`` — the kernel path by default, so the
    |corpus| x m x ks argmin relation never materializes) and
    recomputes codewords as component means. Deterministic by the
    repo protocol: assignment on 6dp-rounded distances with code-id
    tie-break, means as round(avg, 6). Codes that lose all members
    drop out (both engines agree). Measured on the synthetic
    embeddings: one iteration lifts recall@10 from 0.54 to 0.65 at
    m=32, ks=32. Returns (sub, code, cv) with sub-width arrays.
    ``train_n`` (r6, the FAISS recipe) bounds each refinement round
    to a deterministic ~train_n-row hash sample of the corpus
    (``_training_sample``); the ENCODE of the corpus (the caller's
    job) is unaffected. Default None = full-corpus refinement, the
    oracle-pinned behavior.
    """
    corpus = _training_sample(corpus, train_n, n=n, id_col=id_col)
    sub_w = dim // m
    subs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "vec_id",
        "sub",
        F.slice(
            F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
        ).alias("sv"),
    )
    cb = codebook
    for _ in range(iters):
        book = (
            _collect_pq_codebook(cb, sub_w)
            if impl == "vectorized"
            and isinstance(
                corpus.schema[id_col].dataType, T.LongType
            )
            else None
        )
        if book is not None:
            # fused encode + per-(sub, code, pos) partial sums in
            # ONE corpus pass (m x ks x sub_w partial rows per
            # batch); the final agg's division is avg's own
            # sum/count, summation order differs from Spark's
            # partial aggregation by the usual ~1e-13 the 6dp grain
            # absorbs (the same tolerance the DuckDB oracle uses)
            partials = _pq_refine_partials_vectorized(
                corpus, book, sub_w, id_col, vec_col
            )
            comp = partials.groupBy("sub", "code", "pos").agg(
                F.when(
                    F.sum("cnt") > 0,
                    F.round(F.sum("s") / F.sum("cnt"), 6),
                ).alias("a")
            )
        else:
            assign = pq_encode(
                corpus, cb, m=m, dim=dim, id_col=id_col,
                vec_col=vec_col, impl=impl,
            )
            comp = (
                assign.join(subs, ["vec_id", "sub"])
                .select(
                    "sub", "code",
                    F.posexplode("sv").alias("pos", "x"),
                )
                .groupBy("sub", "code", "pos")
                .agg(
                    F.round(
                        F.avg(F.col("x").cast("double")), 6
                    ).alias("a")
                )
            )
        cb = comp.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "a"))),
                lambda s: s.getField("a"),
            ).alias("cv")
        )
    return cb


def _pq_refine_partials_vectorized(
    corpus: DataFrame, book, sub_w: int, id_col: str, vec_col: str
) -> DataFrame:
    """One-pass encode + per-(sub, code, pos) partial sums for the
    PQ Lloyd step: (sub, code, pos, s, cnt, pres). ``s``/``cnt``
    aggregate the non-null elements assigned to each codeword at
    each slice position; ``pres`` counts rows whose slice HAS the
    position at all (so all-null positions still produce a codeword
    component — a null one — exactly like posexplode + avg). Rows
    with missing/short/null slices encode to the lowest code and
    contribute nothing, as slice-of-null posexplodes to nothing.
    """
    import numpy as np
    import pyarrow as pa

    subs_present, codes, mats = book
    out_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType(), True),
            T.StructField("code", T.LongType(), True),
            T.StructField("pos", T.IntegerType(), True),
            T.StructField("s", T.DoubleType(), True),
            T.StructField("cnt", T.LongType(), True),
            T.StructField("pres", T.LongType(), True),
        ]
    )
    src = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    spark = corpus.sparkSession
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)

    def partial(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            parsed = _parse_vec_lists(rb.column(1))
            lengths, starts, vals, elem_null = parsed
            osub = []
            ocode = []
            opos = []
            osum = []
            ocnt = []
            opres = []
            for s in subs_present:
                sel = _batch_sub_codes(
                    *parsed, s, sub_w, codes[s], mats[s]
                )
                nc = codes[s].shape[0]
                lo = s * sub_w
                sums = np.zeros((nc, sub_w), dtype=np.float64)
                cnts = np.zeros((nc, sub_w), dtype=np.int64)
                pres = np.zeros((nc, sub_w), dtype=np.int64)
                for p in range(sub_w):
                    has = lengths >= (lo + p + 1)
                    hidx = np.nonzero(has)[0]
                    if not hidx.size:
                        continue
                    gpos = starts[hidx] + lo + p
                    np.add.at(pres[:, p], sel[hidx], 1)
                    nn = ~elem_null[gpos]
                    gi = hidx[nn]
                    if gi.size:
                        np.add.at(
                            cnts[:, p], sel[gi], 1
                        )
                        np.add.at(
                            sums[:, p],
                            sel[gi],
                            vals[starts[gi] + lo + p],
                        )
                live = pres > 0
                ci, pi = np.nonzero(live)
                if ci.size:
                    osub.append(
                        np.full(ci.size, s, dtype=np.int32)
                    )
                    ocode.append(codes[s][ci])
                    opos.append(pi.astype(np.int32))
                    osum.append(sums[ci, pi])
                    ocnt.append(cnts[ci, pi])
                    opres.append(pres[ci, pi])
            if not osub:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(osub)),
                    pa.array(np.concatenate(ocode)),
                    pa.array(np.concatenate(opos)),
                    pa.array(np.concatenate(osum)),
                    pa.array(np.concatenate(ocnt)),
                    pa.array(np.concatenate(opres)),
                ],
                names=["sub", "code", "pos", "s", "cnt", "pres"],
            )

    return src.mapInArrow(partial, out_schema)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_centroids: int = 16,
    m: int = PQ_M,
    ks: int = PQ_KS,
    dim: int,
    iters: int = 1,
    residual: bool = False,
    refine_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_n: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """Full IVFPQ: coarse cell filter upstream of ADC scoring —
    (query_id, rank, vec_id, adc_dist).

    The index shape production ANN systems (FAISS IVFPQ) run at
    billion-vector scale, as a relational composition of the two
    registered legs: the IVF coarse quantizer restricts each query to
    its own cell's candidates (candidate count = cell occupancy, not
    |corpus|), and PQ/ADC scores those candidates through m-byte
    codes (8x less arithmetic, 32x less candidate data). Codebooks
    are GLOBAL (shared across cells). ``residual=True`` (r6, the
    FAISS IVFPQ_R recipe) re-centers every vector on its cell
    centroid BEFORE quantization — one broadcast join + zip_with
    subtraction producing a derived residual relation the unchanged
    PQ machinery then consumes. Because a query and its candidates
    share a cell, both subtract the SAME centroid, so ADC over
    residuals ranks the same metric while the codebook only has to
    cover the (much tighter) within-cell displacement distribution —
    the standard recall lever at fixed m x ks (measured in pytest:
    recall@10 strictly above the global-codebook run on clustered
    corpora). Every stage is deterministic (rounded distances, id
    tie-breaks), so the DuckDB twin reproduces the ranking exactly;
    the registered oracle query keeps ``residual=False``.

    ``refine_k`` (r6, the FAISS two-stage refine): ADC retrieves a
    ``refine_k``-deep shortlist through the compressed codes, then
    the shortlist ONLY (|queries| x refine_k rows, never the corpus)
    is joined back to the raw vectors and exactly re-ranked to k by
    rounded squared L2 — output (query_id, rank, vec_id, dist).
    Recall converges to the cell-restricted exact ranking as
    refine_k grows while the scan cost stays ADC-shaped; pinned in
    pytest (monotone recall, exactness at refine_k >= cell size).
    The registered oracle query keeps ``refine_k=None``.

    ``impl="vectorized"`` (default): the fused encode+ADC kernel
    (``_pq_adc_scan_vectorized``) with per-query cell restriction —
    members score only against same-cell queries, exactly the SQL
    plan's cell equi-join. Bounded driver fetches; SQL fallback on
    edge shapes.
    """
    if refine_k is not None:
        shortlist = ivfpq_topk(
            corpus, queries, refine_k,
            n_centroids=n_centroids, m=m, ks=ks, dim=dim,
            iters=iters, residual=residual, refine_k=None,
            id_col=id_col, vec_col=vec_col, train_n=train_n,
            impl=impl,
        ).select("query_id", "vec_id")
        mem = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
        )
        qdf = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
        )
        exact = (
            shortlist.join(mem, "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .select(
                "query_id",
                "vec_id",
                _sub_sqdist(F.col("qv"), F.col("cv")).alias("dist"),
            )
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("vec_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "dist")
        )
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    cells = ivf_assign_cells(
        corpus, centroids, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)  # feeds corpus AND query sides
    if residual:
        # derived residual relation: x - centroid(cell(x)). One
        # broadcast join per side; the rest of the operator consumes
        # it exactly like a corpus (queries must be corpus members,
        # as the cell equi-join already requires). zip_with pads
        # length mismatches with null -> the encode kernels' existing
        # null protocol (lowest code) applies unchanged.
        centv = F.broadcast(
            centroids.select(
                F.col("centroid_id").alias("cell"),
                F.col(vec_col).alias("_centv"),
            )
        )
        rv = F.zip_with(
            F.col(vec_col),
            F.col("_centv"),
            lambda x, y: x.cast("double") - y.cast("double"),
        )
        corpus = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .join(cells.withColumnRenamed("vec_id", id_col), id_col)
            .join(centv, "cell")
            .select(F.col(id_col), rv.alias(vec_col))
        )
        queries = corpus.join(
            queries.select(F.col(id_col)).distinct(), id_col
        )
    cb = pq_codebook(
        corpus, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    if iters > 0:
        cb = pq_refine_codebook(
            corpus, cb, m=m, dim=dim, iters=iters,
            id_col=id_col, vec_col=vec_col, train_n=train_n,
        ).localCheckpoint(eager=True)
    sub_w_v = dim // m
    if impl == "vectorized" and isinstance(
        corpus.schema[id_col].dataType, T.LongType
    ):
        import numpy as np

        book = _collect_pq_codebook(cb, sub_w_v)
        prepared = (
            _collect_query_matrix(queries, id_col, vec_col)
            if book is not None
            else None
        )
        if prepared is not None and prepared[1].shape[1] == dim:
            qids, Q = prepared
            # each query's own cell — bounded fetch (<= query cap);
            # queries absent from the cells relation drop, as the
            # SQL plan's inner join does
            qcell_map = {
                r[0]: r[1]
                for r in cells.filter(
                    store.in_set(
                        "vec_id", [int(x) for x in qids]
                    )
                ).collect()
            }
            keep = [
                i for i, q in enumerate(qids) if int(q) in qcell_map
            ]
            subs_present, pcodes, mats = book
            if keep:
                qids2 = qids[keep]
                Q2 = Q[keep]
                qcells = np.asarray(
                    [qcell_map[int(q)] for q in qids2],
                    dtype=np.int64,
                )
                tables = _pq_adc_tables(
                    Q2, subs_present, pcodes, mats, sub_w_v
                )
                cand = _pq_adc_scan_vectorized(
                    corpus, qids2, tables, subs_present, pcodes,
                    mats, sub_w_v, k, id_col, vec_col,
                    qcells=qcells, cells=cells,
                )
            else:
                cand = corpus.sparkSession.createDataFrame(
                    [],
                    T.StructType(
                        [
                            T.StructField(
                                "query_id", T.LongType(), True
                            ),
                            T.StructField(
                                "vec_id", T.LongType(), True
                            ),
                            T.StructField(
                                "adc_dist", T.DoubleType(), True
                            ),
                        ]
                    ),
                )
            w = Window.partitionBy("query_id").orderBy(
                F.col("adc_dist").asc(), F.col("vec_id").asc()
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "rank", "vec_id", "adc_dist")
            )
    codes = pq_encode(
        corpus, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col
    ).join(cells, "vec_id")
    sub_w = dim // m
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col).alias("v"),
    ).select(
        "query_id",
        "sub",
        F.slice(
            F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
        ).alias("qsv"),
    )
    adc = (
        qsubs.join(F.broadcast(cb), "sub")
        .select(
            "query_id",
            F.col("sub").alias("qsub"),
            F.col("code").alias("qcode"),
            _sub_sqdist(F.col("qsv"), F.col("cv")).alias("qd"),
        )
        .join(
            cells.select(
                F.col("vec_id").alias("query_id"),
                F.col("cell").alias("qcell"),
            ),
            "query_id",
        )
    )
    pairs = codes.join(
        F.broadcast(adc),
        (F.col("sub") == F.col("qsub"))
        & (F.col("code") == F.col("qcode"))
        & (F.col("cell") == F.col("qcell")),
    ).filter(F.col("vec_id") != F.col("query_id"))
    approx = pairs.groupBy("query_id", "vec_id").agg(
        F.round(F.sum("qd"), 6).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_dist")
    )


def _semdedup_stats_vectorized(
    members: DataFrame, threshold: float, dim: int | None
) -> DataFrame:
    """Per-member threat stats (a_id, any_lower, min_eq) for the
    semdedup pair stage, bit-identical to the SQL self-join + agg.

    Both semdedup keep policies reduce to exactly two numbers per
    member x: does a threshold-similar clustermate sit strictly below
    x in keep order (``any_lower``), and what is the smallest id among
    equal-centroid-sim threshold-similar mates (``min_eq``). The SQL
    plan computes them by materializing the within-cell pair relation
    (members shuffled TWICE, |cell|^2 rows, one interpreted lambda-
    fold dot per pair). This kernel shuffles members ONCE (the
    groupBy-cell Exchange), then per cell:

    * BLAS V @ V.T screen with the rigorous error bound of
      ``_assign_cells_vectorized``; pairs provably on one side of the
      6dp-rounded threshold are decided wholesale, borderline pairs
      are recomputed with the exact SQL fold op stream and — within
      1e-6 of the boundary — the BigDecimal-HALF_UP replica
      (memoized: duplicate piles produce one distinct sim value);
    * Spark comparison semantics are replicated exactly: NaN pair
      sims QUALIFY (``NaN >= t`` is true), null dots (null/ragged
      vectors; with dim=None, cross-length pairs — with dim set,
      clean rows of length >= dim are sliced to their first dim
      elements in ONE group, the element_at 1..dim prefix-dot
      protocol, and only shorter rows fall to the null pool; ADVICE
      r5 #2) never qualify, ``b_cs < a_cs`` /
      ``b_cs == a_cs`` use NaN-greatest / NaN==NaN total order, and
      null centroid_sims yield null stats (coalesced downstream,
      same as the SQL agg). Zero-norm members: the ANSI SQL plan
      raises DIVIDE_BY_ZERO; the kernel follows the documented IEEE
      protocol (same divergence as the assignment kernel).

    Output: one row per member — the shuffle fan-in is |members|,
    not |pairs|. x-row chunking bounds memory on skewed cells.
    """
    import numpy as np
    import pyarrow as pa

    start_zero = dim is None
    out_schema = T.StructType(
        [
            T.StructField("a_id", T.LongType(), True),
            T.StructField("any_lower", T.IntegerType(), True),
            T.StructField("min_eq", T.LongType(), True),
        ]
    )
    src = members.select(
        F.col("cell"),
        F.col("vec_id"),
        F.col("vv").cast("array<double>").alias("vv"),
        F.col("vn"),
        F.col("centroid_sim"),
    )
    eps = float(np.finfo(np.float64).eps)
    thr = float(threshold)

    def stats(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = table.combine_chunks()
        m = tbl.num_rows
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        la = tbl.column("vv").combine_chunks()
        cs_col = tbl.column("centroid_sim").combine_chunks()
        cs_null = pc.is_null(cs_col).to_numpy(zero_copy_only=False)
        cs = cs_col.to_numpy(zero_copy_only=False).astype(
            np.float64, copy=True
        )
        vn = (
            tbl.column("vn")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=True)
        )
        lengths = pc.list_value_length(la).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        null_list = pc.is_null(la).to_numpy(zero_copy_only=False)
        lengths[null_list] = -1.0
        flat = la.flatten()
        elem_null = pc.is_null(flat).to_numpy(zero_copy_only=False)
        vals = flat.to_numpy(zero_copy_only=False)
        lens_nn = np.where(null_list, 0, lengths).astype(np.int64)
        lens_nn[lens_nn < 0] = 0
        starts = np.concatenate(([0], np.cumsum(lens_nn)[:-1]))

        csnan = np.isnan(cs) & ~cs_null
        any_lower = np.zeros(m, dtype=np.int64)
        min_eq = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
        rcache: dict[float, float] = {}

        def r6(x: float) -> float:
            r = rcache.get(x)
            if r is None:
                r = _round6_like_spark(x)
                rcache[x] = r
            return r

        # group members by vector length: with dim=None only same-
        # length pairs can produce a non-null dot under the HOF
        # zip_with. With dim set the SQL pair sim is _dot(av, bv,
        # dim) = element_at 1..dim (ADVICE r5 #2): every clean row
        # with length >= dim is sliced to its first dim elements and
        # placed in ONE group (cross-full-length pairs DO qualify);
        # shorter rows are the documented ANSI-raise divergence
        # domain and join the null-sim pool.
        by_len: dict[int, list[int]] = {}
        for i in range(m):
            li = int(lengths[i])
            if li < 1:
                continue
            L = li if dim is None else dim
            if li < L:
                continue
            if elem_null[starts[i] : starts[i] + L].any():
                continue
            by_len.setdefault(L, []).append(i)
        for L, idxs in by_len.items():
            gi = np.asarray(idxs, dtype=np.int64)
            mg = gi.size
            if mg < 2:
                continue
            V = vals[
                starts[gi][:, None]
                + np.arange(L, dtype=np.int64)[None, :]
            ]
            aV = np.abs(V)
            gvn = vn[gi]
            gcs = cs[gi]
            gnul = cs_null[gi]
            gnan = csnan[gi]
            gids = ids[gi]
            bc = 4.0 * L * eps
            # x-row chunks bound the (chunk x mg) scratch on skewed
            # cells
            xchunk = max(1, (1 << 22) // mg)
            for s0 in range(0, mg, xchunk):
                s1 = min(s0 + xchunk, mg)
                Vx = V[s0:s1]
                with np.errstate(all="ignore"):
                    nn = gvn[s0:s1, None] * gvn[None, :]
                    S = (Vx @ V.T) / nn
                    B = (bc * (aV[s0:s1] @ aV.T)) / nn
                with np.errstate(invalid="ignore"):
                    din = S - B >= thr + 5.1e-7
                    dout = S + B <= thr - 5.1e-7
                qual = din
                border = ~(din | dout)
                # self-pairs never qualify
                rows_local = np.arange(s0, s1)
                qual[np.arange(s1 - s0), rows_local] = False
                border[np.arange(s1 - s0), rows_local] = False
                bi, bj = np.nonzero(border)
                if bi.size:
                    Va = Vx[bi]
                    Vb = V[bj]
                    if start_zero:
                        acc = np.zeros(bi.size, dtype=np.float64)
                        j0 = 0
                    else:
                        acc = Va[:, 0] * Vb[:, 0]
                        j0 = 1
                    for j in range(j0, L):
                        acc = acc + Va[:, j] * Vb[:, j]
                    with np.errstate(all="ignore"):
                        se = acc / (
                            gvn[s0 + bi] * gvn[bj]
                        )
                    q = np.zeros(bi.size, dtype=bool)
                    q[np.isnan(se)] = True  # NaN >= t is true
                    hi = se >= thr + 2e-6
                    lo = se <= thr - 2e-6
                    q[hi] = True
                    mid = ~(np.isnan(se) | hi | lo)
                    for p in np.nonzero(mid)[0]:
                        v = float(se[p])
                        q[p] = (
                            r6(v) >= thr
                            if math.isfinite(v)
                            else v >= thr
                        )
                    qual[bi, bj] = q
                # spark total-order comparisons vs this chunk's
                # x-members: b_cs < a_cs and b_cs == a_cs
                xcs = gcs[s0:s1, None]
                xnan = gnan[s0:s1, None]
                ycs = gcs[None, :]
                ynan = gnan[None, :]
                yval = ~gnul[None, :]
                with np.errstate(invalid="ignore"):
                    lt = yval & (
                        (~ynan & xnan)
                        | (~ynan & ~xnan & (ycs < xcs))
                    )
                    eq = yval & (
                        (ynan & xnan)
                        | (~ynan & ~xnan & (ycs == xcs))
                    )
                xg = gi[s0:s1]
                any_lower[xg] |= (qual & lt).any(axis=1)
                eqm = qual & eq
                cand_ids = np.where(
                    eqm, gids[None, :], np.iinfo(np.int64).max
                ).min(axis=1)
                min_eq[xg] = np.minimum(min_eq[xg], cand_ids)

        # ids are non-null by corpus contract (the SQL joins key on
        # them); null centroid_sims null the stats, as the SQL agg's
        # null-propagating comparisons do
        al = pa.array(
            any_lower.astype(np.int32), mask=cs_null.copy()
        )
        me = pa.array(
            min_eq,
            mask=(
                cs_null | (min_eq == np.iinfo(np.int64).max)
            ),
        )
        return pa.table(
            {
                "a_id": pa.array(ids.astype(np.int64)),
                "any_lower": al,
                "min_eq": me,
            }
        )

    return src.groupBy("cell").applyInArrow(stats, out_schema)


def semdedup_prune(
    corpus: DataFrame,
    *,
    n_centroids: int | None = None,
    n: int | None = None,
    n_distinct: int | None = None,
    iters: int = 1,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    collapse: bool | str = "auto",
    train_n: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al., arXiv:2303.09540).

    The embedding-space analogue of MinHash dedup: k-means-cluster the
    corpus, compare pairs only WITHIN a cluster, and prune every
    vector whose cosine similarity to a keep-worthier clustermate
    reaches ``threshold``. Keep policy follows the paper: within a
    cluster, points far from the centroid are kept first (they carry
    the cluster's diversity), so a vector is removed iff some
    same-cell vector with lower (centroid_sim, vec_id) — the paper's
    sorted upper-triangle scan — is ``threshold``-similar to it.

    Returns (vec_id, cell, centroid_sim, keep) for every corpus row.

    Scale shape: centroid fit + assignment are broadcast joins
    (O(n x C x dim), C small); the pair stage shuffles on ``cell``
    and is quadratic only in CLUSTER size — the paper's own knob
    (more centroids => smaller cells). No driver-side data movement.
    Deterministic end to end: the 6dp-rounded cosine ranking protocol
    shared with the IVF operators makes it oracle-reproducible.
    ``n_centroids=None`` derives C = sqrt(n) — the paper's own knob
    guidance, promoted to the default after the r3 100x stress showed
    fixed C degrades the within-cell stage to all-pairs
    (``_auto_n_centroids``); ``n=`` supplies the corpus count
    precomputed (r5 verdict #3 — derived-lineage callers avoid an
    extra full upstream execution).

    ``collapse`` handles the OTHER quadratic
    driver, duplicate pile-up, which smaller cells cannot fix: m
    exact copies of a vector are m(m-1)/2 within-cell pairs. Content
    piles (identical vector bytes, keyed by the 120-bit hash of the
    array's string form) share cell assignment and centroid_sim by
    determinism of both, so a pile's effect on any other vector — and
    the keep decision of each member — is fully determined by the
    pile's (centroid_sim, min vec_id): member x of pile P is removed
    iff some threshold-similar pile Q has (cs_Q, rep_Q) lexicographic-
    below (cs_P, x), or a same-pile partner with smaller id exists
    (pair sim of identical vectors rounds to exactly 1.0 at 6dp).
    The k-means FIT stays on the FULL corpus (duplicates weight the
    centroids — collapsing before the fit would change the output);
    only assignment + the pair stage run per distinct content.
    NaN-component and zero-norm vectors are forced into singleton
    piles: their pair sims are NaN, and Spark's total-order NaN
    semantics (NaN greatest, NaN == NaN) must keep flowing through
    the ORIGINAL pair comparisons for them. Exact rewrite pinned by
    pytest on pile-up corpora; the within-pile branch is gated off
    for threshold > 1.0 (mirrors ``dedup._expand_content_pairs``).

    ``impl="vectorized"`` (default) computes the within-cell pair
    stage with the Arrow kernel (``_semdedup_stats_vectorized``):
    one members shuffle instead of two, no |cell|^2 pair
    materialization, BLAS-screened exact dots — bit-identical keeps
    (pytest-pinned vs ``impl="sql"``, the declarative self-join
    plan). One corner divergence inherited from the kernels: zero-
    norm MEMBERS make the ANSI SQL pair stage raise DIVIDE_BY_ZERO
    while the kernel follows IEEE. Null centroid_sims, by contrast,
    are now a DEFINED domain shared by all impl x collapse paths
    (r5 verdict #2): the centroid_sim projection nullif's its norm
    product, so a degenerate cell — a kmeans centroid whose
    6dp-rounded components collapse to the zero vector — yields
    null centroid_sims instead of an ANSI raise, and a null keep
    order removes nobody (the null-never-qualifies rule of the
    collapsed agg, the Arrow kernel, and the uncollapsed plan's
    two-sided when).

    ``collapse="auto"`` (the default) probes the duplication ratio
    with one cheap aggregate over the content keys and collapses only
    when rows / distinct-contents >= 2: on an all-distinct corpus the
    collapsed plan is pure overhead (measured +38% at 200k distinct
    vectors — string-cast + two hashes of every array, a window, a
    checkpoint, and two extra joins that buy nothing), while at 10x
    pile-up it wins ~1.8x (38.3 -> 20.9s min, same keep set). The
    probe costs one (count, HLL approx-distinct) aggregate over the
    content hashes — fixed-width sketch merge, no key shuffle,
    single-digit % of the pair stage it protects. Note the probe
    executes the corpus lineage once extra; pipeline composers should
    pass explicit True/False, supply BOTH ``n=`` and ``n_distinct=``
    (a precomputed distinct-content count — the probe then runs no
    job at all, the same escape as the ``n=`` knob), or checkpoint
    the corpus first.
    """
    if n_centroids is None:
        n_centroids = _auto_n_centroids(corpus, n=n)
    # train_n (r6): bounded quantizer fit, see _training_sample.
    # With it set the fit sees a hash sample rather than the full
    # (duplicate-weighted) corpus — cell SHAPES may differ from the
    # default, keep semantics within each cell are unchanged; the
    # registered oracle keeps train_n=None (full fit).
    cents = ivf_kmeans_centroids(
        corpus, n_centroids, iters, id_col=id_col, vec_col=vec_col,
        dim=dim, train_n=train_n, n=n,
    ).localCheckpoint(eager=True)  # feeds assignment AND member join
    ck = None
    pair_src = corpus
    from knn_using_hadoop_spark.functions.hashing import (
        portable_hash64,
    )

    s = F.col(vec_col).cast("string")
    if collapse == "auto":
        # HLL, not exact count_distinct: the ratio only picks a plan
        # (both plans are output-equal, pytest-pinned), and the sketch
        # merges fixed-width partials instead of shuffling every
        # distinct 16-byte key — the probe stays cheap at any scale.
        # Precomputed (n, n_distinct) skip the probe job entirely.
        if n is not None and n_distinct is not None:
            n_rows = n
        else:
            n_rows, n_distinct = (
                corpus.agg(
                    F.count(F.lit(1)),
                    F.approx_count_distinct(portable_hash64(s)),
                ).first()
            )
        collapse = n_distinct > 0 and n_rows / n_distinct >= 2.0
    if collapse:
        # content-determined flag: NaN/zero-norm vectors keep their
        # original singleton pair semantics (their sims are NaN and
        # must flow through the unchanged comparisons). Null arrays /
        # null elements make BOTH probes null -> coalesce to True:
        # their pair sims are null under the HOF fold and never
        # qualify, so pooling them into a content pile would let the
        # within-pile rule remove members the uncollapsed plan keeps
        # (ADVICE r5 #3) — they must stay singleton piles too.
        own = F.coalesce(
            F.exists(
                F.col(vec_col), lambda x: F.isnan(x.cast("double"))
            )
            | (_sqnorm(F.col(vec_col), dim) == F.lit(0.0)),
            F.lit(True),
        )
        ck = (
            corpus.select(
                F.col(id_col).alias("vec_id"),
                portable_hash64(s).alias("k1"),
                portable_hash64(s, pos=17).alias("k2"),
                own.alias("own"),
            )
            .withColumn(
                "crep",
                F.when(F.col("own"), F.col("vec_id")).otherwise(
                    F.min("vec_id").over(Window.partitionBy("k1", "k2"))
                ),
            )
            .select("vec_id", "crep")
            .localCheckpoint(eager=True)
        )
        pair_src = corpus.join(
            ck.filter(F.col("vec_id") == F.col("crep")).select(
                F.col("vec_id").alias(id_col)
            ),
            id_col,
        )
    cells = ivf_assign_cells(
        pair_src,
        cents.select("centroid_id", F.col("centv").alias(vec_col)),
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    # norms factored out: computed once per member, reused by the
    # centroid-sim projection AND both sides of the pair join
    # (see ivf_assign_cells — float shape preserved, bit-identical)
    m = (
        pair_src.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vv"),
            F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("vn"),
        )
        .join(cells, "vec_id")
        .join(
            F.broadcast(
                cents.withColumn(
                    "cnn", F.sqrt(_sqnorm(F.col("centv"), dim))
                )
            ),
            F.col("cell") == F.col("centroid_id"),
        )
    )
    # nullif the norm product: a kmeans cell whose 6dp-rounded
    # centroid collapses to the zero vector (or a zero-norm member)
    # would otherwise make the ANSI plan raise DIVIDE_BY_ZERO before
    # either impl's pair stage (VERDICT r5 #2). A null centroid_sim
    # flows the operator's existing null-stat semantics: such members
    # threaten nobody and are kept (all four impl x collapse paths
    # agree — pinned in test_semdedup_vectorized.py).
    csim = F.round(
        _dot(F.col("vv"), F.col("centv"), dim)
        / F.nullif(F.col("vn") * F.col("cnn"), F.lit(0.0)),
        6,
    )
    # members feeds THREE consumers (both sides of the pair self-join
    # and the final keep join); without a cut each branch would
    # recompute the entire kmeans + assignment lineage. Same pattern
    # as the dedup module's reused signature relation.
    members = m.select(
        "vec_id", "cell", "vv", "vn", csim.alias("centroid_sim")
    ).localCheckpoint(eager=True)
    if impl == "vectorized":
        # per-member threat stats from the Arrow kernel: ONE
        # members shuffle, no pair materialization, BLAS dots —
        # bit-identical to the SQL self-join (test_semdedup_impls)
        threats = _semdedup_stats_vectorized(members, threshold, dim)
        if not collapse:
            joined = members.join(
                threats, members.vec_id == threats.a_id, "left"
            )
            # x is removed iff some threshold-similar clustermate
            # sits strictly below it in keep order — the same
            # predicate the pair plan evaluates pairwise
            rm = F.coalesce(
                F.col("any_lower") == 1, F.lit(False)
            ) | F.coalesce(
                F.col("min_eq") < F.col("vec_id"), F.lit(False)
            )
            return joined.select(
                "vec_id",
                "cell",
                "centroid_sim",
                (~rm).alias("keep"),
            )
    else:
        a = members.select(
            F.col("cell"),
            F.col("vec_id").alias("a_id"),
            F.col("vv").alias("av"),
            F.col("vn").alias("an"),
            F.col("centroid_sim").alias("a_cs"),
        )
        b = members.select(
            F.col("cell"),
            F.col("vec_id").alias("b_id"),
            F.col("vv").alias("bv"),
            F.col("vn").alias("bn"),
            F.col("centroid_sim").alias("b_cs"),
        )
        pair_sim = F.round(
            _dot(F.col("av"), F.col("bv"), dim)
            / (F.col("an") * F.col("bn")),
            6,
        )
        if not collapse:
            removed = (
                a.join(b, "cell")
                .filter(F.col("a_id") < F.col("b_id"))
                .filter(pair_sim >= F.lit(threshold))
                # the LATER point in keep order (higher centroid_sim,
                # ties by id) is the duplicate. Two-sided when, not
                # otherwise: a null centroid_sim on either side (the
                # nullif'd zero-norm domain, or mixed-dimension
                # corpora) makes the keep order undefined and must
                # remove NOBODY — the same null-never-qualifies rule
                # the collapsed agg and the Arrow kernel apply (Spark
                # NaN-greatest total order keeps the trichotomy for
                # every non-null pair, so exactly one branch fires).
                .select(
                    F.when(
                        (F.col("a_cs") > F.col("b_cs"))
                        | (
                            (F.col("a_cs") == F.col("b_cs"))
                            & (F.col("a_id") > F.col("b_id"))
                        ),
                        F.col("a_id"),
                    )
                    .when(
                        (F.col("b_cs") > F.col("a_cs"))
                        | (
                            (F.col("a_cs") == F.col("b_cs"))
                            & (F.col("b_id") > F.col("a_id"))
                        ),
                        F.col("b_id"),
                    )
                    .alias("vec_id")
                )
                .filter(F.col("vec_id").isNotNull())
                .distinct()
                .withColumn("_rm", F.lit(True))
            )
            return (
                members.join(removed, "vec_id", "left")
                .select(
                    "vec_id",
                    "cell",
                    "centroid_sim",
                    F.col("_rm").isNull().alias("keep"),
                )
            )
        # collapsed: per target pile a, summarize every threshold-
        # similar pile b by the two numbers that decide its members'
        # fates — "some pile sits strictly below in keep order" and
        # "the smallest id among equal-centroid-sim piles" (all of
        # b's members share cs_b; their smallest id IS rep_b).
        # Comparisons are the SAME operators as the uncollapsed
        # plan, so Spark's NaN total order carries over.
        threats = (
            a.join(b, "cell")
            .filter(F.col("a_id") != F.col("b_id"))
            .filter(pair_sim >= F.lit(threshold))
            .groupBy("a_id")
            .agg(
                F.max(
                    (F.col("b_cs") < F.col("a_cs")).cast("int")
                ).alias("any_lower"),
                F.min(
                    F.when(
                        F.col("b_cs") == F.col("a_cs"),
                        F.col("b_id"),
                    )
                ).alias("min_eq"),
            )
        )
    stats = members.join(
        threats, members.vec_id == threats.a_id, "left"
    ).select(
        F.col("vec_id").alias("crep"),
        "cell",
        "centroid_sim",
        "any_lower",
        "min_eq",
    )
    expanded = ck.join(stats, "crep")
    removed_x = F.coalesce(
        F.col("any_lower") == 1, F.lit(False)
    ) | F.coalesce(F.col("min_eq") < F.col("vec_id"), F.lit(False))
    if threshold <= 1.0:
        # within-pile: identical vectors' pair sim rounds to exactly
        # 1.0, equal cs -> every non-rep member is removed by the rep
        removed_x = removed_x | (F.col("crep") < F.col("vec_id"))
    return expanded.select(
        "vec_id", "cell", "centroid_sim", (~removed_x).alias("keep")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    n_centroids: int | None = None,
    n: int | None = None,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    pq: bool = False,
    m: int = PQ_M,
    ks: int = PQ_KS,
    pq_iters: int = 1,
    pq_residual: bool = False,
    attribute_cols: list[str] | None = None,
    train_n: int | None = None,
) -> None:
    """Persist an IVF index: build once, query many.

    Writes ``<path>/centroids`` (the k-means-refined coarse quantizer)
    and ``<path>/cells`` — the corpus vectors WITH their precomputed
    norms, hive-partitioned BY CELL. The partitioning is the point:
    a query that probes ``nprobe`` cells reads only those directories
    (partition pruning at the scan), so query cost is independent of
    corpus size given balanced cells. This is the batch-index
    workflow every production ANN deployment uses — the inline
    ``ivf_*_topk`` operators rebuild the quantizer per query batch.
    ``n_centroids=None`` derives C = sqrt(n) (``_auto_n_centroids``);
    ``n=`` supplies the count precomputed. ``train_n`` (r6, the
    FAISS training recipe) caps the coarse-quantizer fit AND the PQ
    codebook refinement at a deterministic ~train_n-row hash sample
    (``_training_sample``) — at index-build scale the Lloyd rounds
    stop being full corpus passes while assignment/encode still
    cover every row; default None trains on the full corpus.

    ``pq=True`` (r5 verdict #5) additionally persists the COMPRESSED
    search path — the FAISS-style artifact a 100 TB deployment
    actually ships (codebooks travel, corpora don't; cf. the
    reference's broadcast-small-side pattern,
    ``src/main/java/Hadoop.java:66-71``, generalized):

    * ``<path>/pq_codebook`` — the (sub, code, cv) product-quantizer
      codebook, ``pq_iters`` Lloyd-refined (m x ks rows, KBs);
    * ``<path>/pq_codes`` — per vector its m nearest-code ids packed
      into ONE array column (m bytes-scale per vector vs dim floats
      — the 8-32x cut that lets the searchable index fit in cluster
      RAM), hive-partitioned BY CELL like the raw store;
    * ``<path>/pq_meta`` — a one-row (m, ks, dim) manifest.

    ``query_ivfpq_index`` then answers through the fused ADC kernel
    reading ONLY probed-cell code partitions — raw vectors are never
    touched on the query path. Requires ``dim`` (subspace slicing).
    ``pq_residual=True`` (the FAISS IVFPQ_R recipe, see
    ``ivfpq_topk(residual=True)``) quantizes x - centroid(cell(x))
    instead of x — the manifest records the flag and the query path
    re-centers each query on its probed cell's centroid before
    building its ADC tables.

    ``attribute_cols`` (r6, filtered vector search): extra corpus
    columns persisted alongside each vector in the cell store, so
    ``query_ivf_index(member_filter=...)`` can apply a metadata
    predicate AT THE SCAN (parquet pushdown, pinned in pytest) and
    return the exact top-k of the filter's survivors — the
    pre-filtering semantics production vector stores implement,
    without a second attribute-join pass over the corpus.
    """
    if n_centroids is None:
        n_centroids = _auto_n_centroids(corpus, n=n)
    cents = ivf_kmeans_centroids(
        corpus, n_centroids, iters, id_col=id_col, vec_col=vec_col,
        dim=dim, train_n=train_n, n=n,
    )
    cells = ivf_assign_cells(
        corpus,
        cents.select("centroid_id", F.col("centv").alias(vec_col)),
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    if pq:
        # cells feeds the raw store AND the code store -> one cut
        cells = cells.localCheckpoint(eager=True)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
            F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("cvn"),
            *[F.col(c) for c in (attribute_cols or [])],
        )
        .join(cells, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/cells")
    )
    if not pq:
        return
    if dim is None:
        raise ValueError("pq=True requires dim")
    spark = corpus.sparkSession
    if pq_residual:
        # quantize the within-cell displacement (see ivfpq_topk
        # residual=True): one broadcast join + zip_with subtraction,
        # the unchanged PQ machinery consumes the derived relation
        centv = F.broadcast(
            cents.select(
                F.col("centroid_id").alias("cell"),
                F.col("centv").alias("_centv"),
            )
        )
        rv = F.zip_with(
            F.col(vec_col),
            F.col("_centv"),
            lambda x, y: x.cast("double") - y.cast("double"),
        )
        corpus = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .join(cells.withColumnRenamed("vec_id", id_col), id_col)
            .join(centv, "cell")
            .select(F.col(id_col), rv.alias(vec_col))
        )
    cb = pq_codebook(
        corpus, m=m, ks=ks, dim=dim, id_col=id_col, vec_col=vec_col
    )
    if pq_iters > 0:
        # n=n: the residual relation has exactly the corpus's row
        # count, so the sample ratio needs no count of the derived
        # lineage
        cb = pq_refine_codebook(
            corpus, cb, m=m, dim=dim, iters=pq_iters,
            id_col=id_col, vec_col=vec_col, train_n=train_n, n=n,
        )
    cb = cb.localCheckpoint(eager=True)  # feeds write AND encode
    cb.write.mode("overwrite").parquet(f"{path}/pq_codebook")
    # pack the long-format codes into one array per vector, in sub
    # order (array_sort on (sub, code) structs sorts by sub — subs
    # are distinct per vector)
    packed = (
        pq_encode(
            corpus, cb, m=m, dim=dim, id_col=id_col, vec_col=vec_col
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", "code"))
                ),
                lambda s: s.getField("code"),
            ).alias("codes")
        )
    )
    (
        packed.join(cells, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/pq_codes")
    )
    spark.createDataFrame(
        [(m, ks, dim, pq_residual)],
        "m int, ks int, dim int, residual boolean",
    ).write.mode("overwrite").parquet(f"{path}/pq_meta")


def _read_index_members(
    spark, path: str, store_name: str, probed_cells: list | None = None
) -> DataFrame:
    """LIVE members of an index store (``cells`` / ``pq_codes``),
    optionally restricted to probed cells: the base store unioned
    with any streamed segments (``stream_<store>/ingest_batch=N`` —
    the batch dimension is dropped; ``cell`` is a partition column
    in both, so the probed-cell filter prunes both scans), minus
    tombstoned ids (broadcast-size anti-join between compactions).
    When no segments or tombstones exist this is exactly the plain
    pruned scan — the existing partition-pruning pins are unchanged.
    Directory probes go through ``sources/index_store`` (Hadoop
    FileSystem API resolved from the path's scheme), so the lifecycle
    behaves identically on local paths, ``file://`` URIs, and
    ``hdfs://``/``s3a://`` stores (r7 verdict #1)."""
    df = spark.read.parquet(f"{path}/{store_name}")
    if probed_cells is not None:
        df = df.filter(F.col("cell").isin(probed_cells))
    seg = store.read_segments(spark, f"{path}/stream_{store_name}")
    if seg is not None:
        if probed_cells is not None:
            seg = seg.filter(F.col("cell").isin(probed_cells))
        df = df.unionByName(seg)
    return store.mask_tombstones(
        spark, f"{path}/tombstones", df, "vec_id"
    )


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    nprobe: int = 1,
    member_filter: Column | str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    impl: str = "vectorized",
) -> DataFrame:
    """Search a persisted IVF index: (query_id, rank, vec_id, sim).

    Ranks the stored centroids per query (broadcast, same 6dp-rounded
    protocol as ``ivf_probe_topk``), collects the probed cell ids —
    a bounded parameter fetch, <= min(|queries| x nprobe, C) values —
    and turns them into a STATIC partition filter on the cell store,
    so the scan reads only the probed directories. Exact rerank
    within candidates; excludes self-matches by id.
    ``impl="vectorized"`` (default) reranks through the shared
    per-cell kernel (``_cell_topk_candidates``) — same candidate
    protocol as the inline IVF family, bit-identical output.

    ``member_filter`` (r6, filtered vector search): a Column or SQL
    string over the cell store's columns (vec_id + any
    ``attribute_cols`` persisted at build time), applied BEFORE the
    exact rerank — the result is the exact top-k among the filter's
    survivors (pre-filtering semantics: no rank-k starvation from
    post-filtering a fixed candidate list). Because the rerank is
    exact within probed cells, filtering cannot hurt correctness,
    only recall through the probe choice — the same recall contract
    the unfiltered query already carries. The predicate reaches the
    parquet scan (PushedFilters, pinned in pytest).
    """
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("qvn"),
    )
    qc = q.crossJoin(
        F.broadcast(
            cents.withColumn(
                "cnn", F.sqrt(_sqnorm(F.col("centv"), dim))
            )
        )
    )
    # nullif (r6, same closure as semdedup's centroid_sim): a
    # degenerate zero-norm centroid (or query) yields null psim —
    # ranked last by the desc window, i.e. never probed — instead of
    # an ANSI DIVIDE_BY_ZERO raise before any candidate is scored
    qsim = F.round(
        _dot(F.col("qv"), F.col("centv"), dim)
        / F.nullif(F.col("qvn") * F.col("cnn"), F.lit(0.0)),
        6,
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.select(
            "query_id", "qv", "qvn", "centroid_id", qsim.alias("psim")
        )
        .withColumn("pn", F.row_number().over(wprobe))
        .filter(F.col("pn") <= nprobe)
        .select(
            "query_id", "qv", "qvn", F.col("centroid_id").alias("cell")
        )
        .localCheckpoint(eager=True)  # reused: cell fetch + join
    )
    # cell column only, deduped in Python (r12 opt): the r11
    # distinct-cell collect paid an aggregation exchange — one more
    # AQE stage job per batch — to dedup <= |q| x nprobe ints the
    # driver can dedup itself; over the cap the r11 shape returns
    cell_rows = probes.select("cell").limit(
        store.MAX_PUSHED_KEYS + 1
    ).collect()
    if len(cell_rows) <= store.MAX_PUSHED_KEYS:
        probed_cells = sorted({r["cell"] for r in cell_rows})
    else:
        probed_cells = [
            r["cell"]
            for r in probes.select("cell").distinct().collect()
        ]
    members = _read_index_members(spark, path, "cells", probed_cells)
    if member_filter is not None:
        members = members.filter(
            F.expr(member_filter)
            if isinstance(member_filter, str)
            else member_filter
        )
    if impl == "vectorized" and isinstance(
        members.schema["vec_id"].dataType, T.LongType
    ) and isinstance(queries.schema[id_col].dataType, T.LongType):
        cand = _cell_topk_candidates(
            members.select("cell", "vec_id", "cv"),
            probes.select("cell", "query_id", "qv"),
            k,
            dim,
        )
        wf = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        return (
            cand.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "sim")
        )
    pairs = members.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("qv"), F.col("cv"), dim) / (
        F.col("qvn") * F.col("cvn")
    )
    scored = pairs.select(
        "query_id", "vec_id", F.round(sim, 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


def query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    nprobe: int = 1,
    refine_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "vectorized",
) -> DataFrame:
    """Search a persisted IVFPQ index (``build_ivf_index(pq=True)``)
    WITHOUT touching raw vectors: (query_id, rank, vec_id, adc_dist).

    The 100 TB query path (r5 verdict #5): centroids + codebook are
    KB-scale driver/broadcast artifacts, the scan reads only the
    probed cells' ``pq_codes`` partitions (static partition filter,
    pruning pinned in pytest), and scoring is table lookups over
    m-byte codes — query cost is independent of corpus size given
    balanced cells, and the corpus' float vectors stay cold.

    Per query the stored centroids are ranked with the same
    6dp-rounded protocol as ``ivf_assign_cells``; at ``nprobe=1``
    the probed cell of an in-corpus query is therefore EXACTLY its
    stored assignment, which makes this a drop-in twin of the inline
    ``ivfpq_topk`` (round-trip equality pinned in pytest — not
    registered; the registry is frozen at 210). ADC distances are
    the inline plan's: per-sub rounded sqdist table hits accumulated
    in sub order, 6dp-rounded sum, ties by vec_id, self-pairs
    excluded.

    ``impl="vectorized"`` (default): driver-built lookup tables
    (bounded q x m x ks doubles, query cap 4096) + one mapInArrow
    pass over the probed code partitions. ``impl="sql"`` (also the
    automatic fallback past the cap / on edge shapes): posexplode
    codes -> broadcast-join the (sub, code) ADC lookup -> sum — the
    declarative twin that defines the semantics.

    Residual manifests (``build_ivf_index(pq_residual=True)``): the
    stored codes quantize each vector's within-cell displacement, so
    the query re-centers on EACH probed cell's centroid before its
    tables (or SQL slices) are built — per-(query, cell) tables,
    still bounded by q x nprobe x m x ks.

    ``refine_k`` (r6, the FAISS two-stage refine): the ADC pass
    retrieves a refine_k-deep shortlist, then ONLY the shortlist is
    joined back to the raw cell store — under the SAME probed-cell
    partition filter, so query cost stays corpus-size independent —
    and exactly re-ranked to k by rounded squared L2. Output column
    becomes ``dist``. The "raw vectors untouched" property is
    traded for exactness on |queries| x refine_k rows, the standard
    production recall knob.
    """
    import numpy as np

    # fingerprint-cached manifest read (r12 opt, index_store
    # read_meta): one listStatus RPC instead of a one-row parquet
    # job per query batch; any pq_meta rewrite invalidates
    md = store.read_meta(spark, f"{path}/pq_meta")
    m, ks, dim = int(md["m"]), int(md["ks"]), int(md["dim"])
    residual = bool(md.get("residual", False))  # pre-r6 manifests
    sub_w = dim // m
    cents = spark.read.parquet(f"{path}/centroids")
    cb = spark.read.parquet(f"{path}/pq_codebook")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("qvn"),
    )
    qc = q.crossJoin(
        F.broadcast(
            cents.withColumn(
                "cnn", F.sqrt(_sqnorm(F.col("centv"), dim))
            )
        )
    )
    # nullif (r6, same closure as semdedup's centroid_sim): a
    # degenerate zero-norm centroid (or query) yields null psim —
    # ranked last by the desc window, i.e. never probed — instead of
    # an ANSI DIVIDE_BY_ZERO raise before any candidate is scored
    qsim = F.round(
        _dot(F.col("qv"), F.col("centv"), dim)
        / F.nullif(F.col("qvn") * F.col("cnn"), F.lit(0.0)),
        6,
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.select(
            "query_id", "centroid_id", qsim.alias("psim")
        )
        .withColumn("pn", F.row_number().over(wprobe))
        .filter(F.col("pn") <= nprobe)
        .select(
            "query_id", F.col("centroid_id").alias("cell")
        )
        .localCheckpoint(eager=True)  # reused: cell fetch + join
    )
    # Python-side cell dedup (r12 opt — same treatment as
    # query_ivf_index): drops the distinct-aggregation stage job
    cell_rows = probes.select("cell").limit(
        store.MAX_PUSHED_KEYS + 1
    ).collect()
    if len(cell_rows) <= store.MAX_PUSHED_KEYS:
        probed_cells = sorted({r["cell"] for r in cell_rows})
    else:
        probed_cells = [
            r["cell"]
            for r in probes.select("cell").distinct().collect()
        ]
    codes_df = _read_index_members(
        spark, path, "pq_codes", probed_cells
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    k_eff = refine_k if refine_k is not None else k

    def _finish(adc_ranked: DataFrame) -> DataFrame:
        """Optional exact refine of the ADC shortlist against the
        raw cell store (same probed-cell partition filter)."""
        if refine_k is None:
            return adc_ranked
        # live members: a streamed vector reaching the shortlist
        # needs its raw row from the segment store too
        raw = _read_index_members(
            spark, path, "cells", probed_cells
        ).select("vec_id", "cv")
        qdf = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
        )
        exact = (
            adc_ranked.select("query_id", "vec_id")
            .join(raw, "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .select(
                "query_id",
                "vec_id",
                _sub_sqdist(F.col("qv"), F.col("cv")).alias(
                    "dist"
                ),
            )
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("vec_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", "dist")
        )
    if impl == "vectorized" and isinstance(
        queries.schema[id_col].dataType, T.LongType
    ) and isinstance(
        codes_df.schema["vec_id"].dataType, T.LongType
    ):
        book = _collect_pq_codebook(cb, sub_w)
        prepared = (
            _collect_query_matrix(queries, id_col, vec_col)
            if book is not None
            else None
        )
        cmap = None
        if prepared is not None and residual:
            # residual manifests: re-center each query on its probed
            # cell's centroid before building its ADC tables. The
            # centroid fetch is bounded (C rows); edge shapes force
            # the SQL twin, which defines the semantics.
            crows = cents.select(
                "centroid_id",
                F.col("centv").cast("array<double>").alias("_cv"),
            ).collect()
            cmap = {}
            for r in crows:
                if (
                    r[0] is None
                    or r[1] is None
                    or len(r[1]) != dim
                    or any(x is None for x in r[1])
                ):
                    cmap = None
                    break
                cmap[int(r[0])] = np.asarray(r[1], dtype=np.float64)
            if cmap is None:
                prepared = None
        if prepared is not None and prepared[1].shape[1] == dim:
            qids, Q = prepared
            subs_present, pcodes, mats = book
            qprobe = {
                (r["query_id"], r["cell"])
                for r in probes.collect()
            }  # bounded: <= |queries| x nprobe
            qpos = {int(qid): i for i, qid in enumerate(qids)}
            qbycell: dict[int, list[int]] = {}
            for qid, cell in qprobe:
                if int(qid) in qpos:
                    qbycell.setdefault(int(cell), []).append(
                        qpos[int(qid)]
                    )
            qbycell_arr = {
                c: np.asarray(sorted(v), dtype=np.int64)
                for c, v in qbycell.items()
            }
            if residual:
                # per-(cell, its probing queries) tables: rows follow
                # qbycell_arr[c] order — bounded q x nprobe x m x ks
                tables_by_cell = {
                    c: _pq_adc_tables(
                        Q[qsel] - cmap[c], subs_present, pcodes,
                        mats, sub_w,
                    )
                    for c, qsel in qbycell_arr.items()
                    if c in cmap
                }
                tables = None
            else:
                tables_by_cell = None
                tables = _pq_adc_tables(
                    Q, subs_present, pcodes, mats, sub_w
                )
            nsubs = len(subs_present)
            out_schema = T.StructType(
                [
                    T.StructField("query_id", T.LongType(), True),
                    T.StructField("vec_id", T.LongType(), True),
                    T.StructField("adc_dist", T.DoubleType(), True),
                ]
            )
            src = codes_df.select("vec_id", "codes", "cell")
            # local-mode fan-out (cf. _assign_cells_vectorized): the
            # probed partitions may be a handful of small files; at
            # cluster scale split count >= defaultParallelism and
            # this is a no-op
            par = spark.sparkContext.defaultParallelism
            if src.rdd.getNumPartitions() < par:
                src = src.repartition(par)

            def scan(batches):
                import pyarrow as pa

                for rb in batches:
                    n = rb.num_rows
                    if n == 0:
                        continue
                    mids = rb.column(0).to_numpy(
                        zero_copy_only=False
                    )
                    la = rb.column(1)
                    lengths, starts, vals_f, elem_null = (
                        _parse_vec_lists(la)
                    )
                    vals = vals_f.astype(np.int64)
                    mcell = rb.column(2).to_numpy(
                        zero_copy_only=False
                    )
                    # only complete, null-free code arrays score —
                    # pq_encode always writes them; the SQL twin's
                    # explode would drop damaged rows the same way
                    ok = lengths == float(nsubs)
                    okidx = np.nonzero(ok)[0]
                    if okidx.size:
                        g = (
                            starts[okidx][:, None]
                            + np.arange(nsubs, dtype=np.int64)[
                                None, :
                            ]
                        )
                        okidx = okidx[~elem_null[g].any(axis=1)]
                    oq: list[int] = []
                    ov: list[int] = []
                    od: list[float] = []
                    if okidx.size:
                        C = vals[
                            starts[okidx][:, None]
                            + np.arange(nsubs, dtype=np.int64)[
                                None, :
                            ]
                        ]
                        gcell = mcell[okidx]
                        gids_all = mids[okidx]
                        for c in np.unique(gcell):
                            qsel = qbycell_arr.get(int(c))
                            if qsel is None:
                                continue
                            ctbl = (
                                tables_by_cell.get(int(c))
                                if tables_by_cell is not None
                                else None
                            )
                            if (
                                tables_by_cell is not None
                                and ctbl is None
                            ):
                                continue
                            mmask = gcell == c
                            gids = gids_all[mmask]
                            Cg = C[mmask]
                            nm = gids.shape[0]
                            qchunk = max(
                                1, (1 << 22) // max(nm, 1)
                            )
                            colidx = {
                                s: np.searchsorted(
                                    pcodes[s], Cg[:, j]
                                )
                                for j, s in enumerate(
                                    subs_present
                                )
                            }
                            for s0 in range(
                                0, qsel.shape[0], qchunk
                            ):
                                qs = qsel[s0 : s0 + qchunk]
                                acc = np.zeros(
                                    (qs.shape[0], nm),
                                    dtype=np.float64,
                                )
                                for s in subs_present:
                                    block = (
                                        ctbl[s][
                                            s0 : s0 + qs.shape[0]
                                        ]
                                        if ctbl is not None
                                        else tables[s][qs]
                                    )
                                    np.add(
                                        acc,
                                        block[:, colidx[s]],
                                        out=acc,
                                    )
                                R = _round6_array(acc)
                                for r in range(qs.shape[0]):
                                    qid = int(qids[qs[r]])
                                    picks, _ = (
                                        _row_topk_select_asc(
                                            R[r], gids, qid,
                                            k_eff,
                                        )
                                    )
                                    for vid, dv in picks:
                                        oq.append(qid)
                                        ov.append(vid)
                                        od.append(dv)
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(oq, type=pa.int64()),
                            pa.array(ov, type=pa.int64()),
                            pa.array(od, type=pa.float64()),
                        ],
                        names=["query_id", "vec_id", "adc_dist"],
                    )

            cand = src.mapInArrow(scan, out_schema)
            return _finish(
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k_eff)
                .select("query_id", "rank", "vec_id", "adc_dist")
            )
    # SQL twin: positions in the packed array are ascending-sub
    # order; map pos -> sub via the codebook's distinct subs
    subs_sorted = sorted(
        r["sub"] for r in cb.select("sub").distinct().collect()
    )
    pos_map = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(subs_sorted)],
        "pos int, sub int",
    )
    if residual:
        # per-(query, probed cell) residual: the query re-centers on
        # EACH cell it probes before slicing (members' stored codes
        # already quantize their own-cell displacement)
        centv = F.broadcast(
            cents.select(
                F.col("centroid_id").alias("qcell"),
                F.col("centv").alias("_centv"),
            )
        )
        qres = (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qv"),
            )
            .join(
                probes.select(
                    "query_id", F.col("cell").alias("qcell")
                ),
                "query_id",
            )
            .join(centv, "qcell")
            .select(
                "query_id",
                "qcell",
                F.zip_with(
                    F.col("qv"),
                    F.col("_centv"),
                    lambda x, y: x.cast("double")
                    - y.cast("double"),
                ).alias("v"),
            )
        )
        qsubs = qres.select(
            "query_id",
            "qcell",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias(
                "sub"
            ),
            "v",
        ).select(
            "query_id",
            "qcell",
            "sub",
            F.slice(
                F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
            ).alias("qsv"),
        )
        adc = qsubs.join(F.broadcast(cb), "sub").select(
            "query_id",
            "qcell",
            F.col("sub").alias("qsub"),
            F.col("code").alias("qcode"),
            _sub_sqdist(F.col("qsv"), F.col("cv")).alias("qd"),
        )
    else:
        qsubs = queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias(
                "sub"
            ),
            F.col(vec_col).alias("v"),
        ).select(
            "query_id",
            "sub",
            F.slice(
                F.col("v"), F.col("sub") * sub_w + 1, F.lit(sub_w)
            ).alias("qsv"),
        )
        adc = (
            qsubs.join(F.broadcast(cb), "sub")
            .select(
                "query_id",
                F.col("sub").alias("qsub"),
                F.col("code").alias("qcode"),
                _sub_sqdist(F.col("qsv"), F.col("cv")).alias("qd"),
            )
            .join(
                probes.select(
                    "query_id", F.col("cell").alias("qcell")
                ),
                "query_id",
            )
        )
    long_codes = codes_df.select(
        "vec_id",
        "cell",
        F.posexplode("codes").alias("pos", "code"),
    ).join(F.broadcast(pos_map), "pos")
    pairs = long_codes.join(
        F.broadcast(adc),
        (F.col("sub") == F.col("qsub"))
        & (F.col("code") == F.col("qcode"))
        & (F.col("cell") == F.col("qcell")),
    ).filter(F.col("vec_id") != F.col("query_id"))
    approx = pairs.groupBy("query_id", "vec_id").agg(
        F.round(F.sum("qd"), 6).alias("adc_dist")
    )
    return _finish(
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_eff)
        .select("query_id", "rank", "vec_id", "adc_dist")
    )


def _ingest_index_batch(
    spark,
    path: str,
    new_vectors: DataFrame,
    *,
    cells_dir: str,
    codes_dir: str,
    mode: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    attribute_cols: list[str] | None = None,
) -> None:
    """Shared ingest core: assign a batch against the STORED
    centroids and write its cell (and, under a PQ manifest, code)
    rows to the given directories. ``append_ivf_index`` targets the
    base stores with mode=append; the streaming feed targets a
    per-micro-batch segment directory with mode=overwrite so a
    replayed batch REPLACES its own output (the
    ``foreach_batch_parquet_sink`` idempotence recipe,
    ``streaming/events.py``)."""
    cents = spark.read.parquet(f"{path}/centroids")
    cells = ivf_assign_cells(
        new_vectors,
        cents.select("centroid_id", F.col("centv").alias(vec_col)),
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    ).localCheckpoint(eager=True)  # feeds raw AND code appends
    (
        new_vectors.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("cv"),
            F.sqrt(_sqnorm(F.col(vec_col), dim)).alias("cvn"),
            # must match the build-time attribute_cols, or the cell
            # store's files disagree on schema
            *[F.col(c) for c in (attribute_cols or [])],
        )
        .join(cells, "vec_id")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(cells_dir)
    )
    if not store.exists_dir(spark, f"{path}/pq_meta"):
        return
    meta = spark.read.parquet(f"{path}/pq_meta").first()
    m, dim_pq = int(meta["m"]), int(meta["dim"])
    residual = bool(meta.asDict().get("residual", False))
    cb = spark.read.parquet(f"{path}/pq_codebook")
    batch = new_vectors.select(F.col(id_col), F.col(vec_col))
    if residual:
        centv = F.broadcast(
            cents.select(
                F.col("centroid_id").alias("cell"),
                F.col("centv").alias("_centv"),
            )
        )
        rv = F.zip_with(
            F.col(vec_col),
            F.col("_centv"),
            lambda x, y: x.cast("double") - y.cast("double"),
        )
        batch = (
            batch.join(
                cells.withColumnRenamed("vec_id", id_col), id_col
            )
            .join(centv, "cell")
            .select(F.col(id_col), rv.alias(vec_col))
        )
    packed = (
        pq_encode(
            batch, cb, m=m, dim=dim_pq,
            id_col=id_col, vec_col=vec_col,
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", "code"))
                ),
                lambda s: s.getField("code"),
            ).alias("codes")
        )
    )
    (
        packed.join(cells, "vec_id")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(codes_dir)
    )


def append_ivf_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    attribute_cols: list[str] | None = None,
) -> None:
    """Incrementally add a batch to a persisted IVF(PQ) index.

    The standard production maintenance path (r6): new vectors are
    assigned against the STORED centroids (the quantizer does not
    move — centroid drift is handled by periodic rebuild, exactly as
    FAISS/Milvus segment maintenance does) and appended to the
    hive-partitioned cell store; when the index carries a PQ
    manifest, the batch is also encoded with the STORED codebook
    (re-centered on its assigned cell first for residual manifests)
    and appended to the code store. Cost: one broadcast-assign pass
    + one encode pass over the BATCH — never touches existing rows.

    Equality pin (pytest): appending B to an index built on A equals
    rebuilding on A UNION B with the same frozen quantizer/codebook
    (iters=0 seeds), for both the raw and the PQ query paths.
    """
    _ingest_index_batch(
        spark,
        path,
        new_vectors,
        cells_dir=f"{path}/cells",
        codes_dir=f"{path}/pq_codes",
        mode="append",
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        attribute_cols=attribute_cols,
    )


def append_ivf_index_stream(
    stream_df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    attribute_cols: list[str] | None = None,
):
    """Continuous ingestion into a persisted IVF(PQ) index — the
    growing-segment half of the Milvus/LSM vector-store model.

    Each micro-batch is assigned against the STORED centroids
    (quantizer frozen, same contract as ``append_ivf_index``) and
    lands in its OWN segment directory,
    ``<path>/stream_cells/ingest_batch=<id>/cell=<c>/`` (and
    ``stream_pq_codes`` under a PQ manifest), written with
    mode=overwrite — a batch replayed after a crash between the sink
    write and the offset commit REPLACES its own segment instead of
    duplicating rows (effectively-once, the
    ``foreach_batch_parquet_sink`` recipe). The query paths union
    live segments with the base store under the SAME probed-cell
    partition filter (``cell`` is a partition column in both), so
    freshly streamed vectors are searchable immediately and query
    cost stays pruned; ``compact_ivf_index`` periodically seals
    segments into the base store.

    Returns the unstarted ``DataStreamWriter`` — callers pick the
    trigger/checkpointLocation and ``.start()`` it.
    """

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        _ingest_index_batch(
            batch_df.sparkSession,
            path,
            batch_df,
            cells_dir=f"{path}/stream_cells/ingest_batch={batch_id}",
            codes_dir=(
                f"{path}/stream_pq_codes/ingest_batch={batch_id}"
            ),
            mode="overwrite",
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            attribute_cols=attribute_cols,
        )

    return stream_df.writeStream.foreachBatch(feed).outputMode(
        "append"
    )


def delete_from_ivf_index(
    spark,
    path: str,
    ids: DataFrame | list | None = None,
    *,
    where: Column | str | None = None,
) -> int:
    """Tombstone-delete vectors from a persisted IVF(PQ) index.

    Parquet partitions are immutable, so deletes are logical first —
    the Delta/Iceberg/Milvus tombstone model: the doomed ``vec_id``s
    land in ``<path>/tombstones`` and every query path anti-joins
    them out BEFORE ranking (a deleted vector can never shadow a
    live one at rank k; equality vs pre-filter semantics pinned in
    pytest). ``compact_ivf_index`` later rewrites only the affected
    cell partitions and clears the tombstones.

    Exactly one of ``ids`` (a DataFrame with a ``vec_id`` column, or
    a Python id list) / ``where`` (a predicate over the cell store's
    columns — vec_id plus any build-time ``attribute_cols``;
    resolved to ids in one pruned scan over live members, streamed
    segments included) must be given. Returns the number of distinct
    ids tombstoned by THIS request.

    Tombstones mask an ID, not a row version: re-inserting a
    tombstoned vec_id (append or stream) before compaction leaves
    the new row masked too — delete-then-reinsert of the same id
    needs a ``compact_ivf_index`` between, or fresh ids (pinned in
    pytest). Supporting in-place PK replacement would require
    versioned tombstones (insert-time watermarks per segment, the
    Delta/Milvus MVCC machinery) — out of scope for a parquet-level
    index.
    """
    if (ids is None) == (where is None):
        raise ValueError("pass exactly one of ids / where")
    # the tombstone column type follows the CELL STORE's vec_id
    # schema (ADVICE r6 #2): an index built with a string/int id_col
    # must not get long-typed tombstones (the anti-join would
    # type-mismatch and silently mask nothing)
    vt = spark.read.parquet(f"{path}/cells").schema[
        "vec_id"
    ].dataType
    if where is not None:
        doomed = (
            _read_index_members(spark, path, "cells")
            .filter(
                F.expr(where) if isinstance(where, str) else where
            )
            .select("vec_id")
        )
    elif isinstance(ids, DataFrame):
        doomed = ids.select(F.col("vec_id").cast(vt))
    else:
        doomed = spark.createDataFrame(
            [(i,) for i in ids],
            T.StructType([T.StructField("vec_id", vt)]),
        )
    doomed = doomed.distinct().localCheckpoint(eager=True)
    n = doomed.count()
    if n:
        doomed.write.mode("append").parquet(f"{path}/tombstones")
    return n


def compact_ivf_index(spark, path: str) -> None:
    """Fold tombstones and streamed segments into the base stores.

    The segment-sealing half of the lifecycle: for each store
    (cells, and pq_codes under a PQ manifest) only the AFFECTED cell
    partitions — those owning a tombstoned row or receiving streamed
    rows — are rewritten, via dynamic partition overwrite; untouched
    cells keep their files. Cells left empty by the rewrite lose
    their directory (dynamic overwrite only replaces partitions it
    writes — on an object store this final step is the same delete
    API call the staged commit already uses). Tombstone and segment
    directories are dropped afterwards, so queries return to the
    single-scan plan. Query results are invariant under compaction
    (pinned in pytest).

    Crash ordering: each store's segment directory is dropped only
    AFTER that store's rewrite, and the tombstone directory is
    dropped LAST, after every store — so a compaction that dies
    midway leaves a state where every query is still correct
    (not-yet-compacted stores still union their segments; already-
    purged stores anti-join tombstones as a no-op), and re-running
    compact converges. The one midway window — dead between a
    store's rewrite and its segment removal, leaving streamed rows
    in BOTH base and segment — is closed by the survivor id-dedup
    below (ADVICE r6 #1): queries between the crash and the re-run
    see duplicate (identical) member rows for those ids, and the
    re-run folds them back to one. Single-writer assumed, as with
    any non-catalog parquet maintenance.

    No write-ahead manifest (r11, deliberate asymmetry with
    ``compact_text_index``): the text index needs one because its
    DERIVED stores (terms df, stats partials, block bounds) can go
    stale against rewritten postings with nothing left to derive
    the affected set from; here every store is primary data whose
    affected set re-derives from the still-present tombstone and
    segment directories in any crash window — pinned by the
    between-stores crash test in ``test_index_lifecycle``.

    All store probes and removals go through ``sources/index_store``
    (Hadoop FileSystem API), so compaction works on ``file://`` /
    ``hdfs://`` / ``s3a://`` stores exactly as on local paths.
    """
    tomb_dir = f"{path}/tombstones"
    tomb = store.read_tombstones(
        spark, tomb_dir, "vec_id", distinct=True
    )
    has_tomb = tomb is not None
    for store_name in ("cells", "pq_codes"):
        if not store.exists_dir(spark, f"{path}/{store_name}"):
            continue
        sdir = f"{path}/stream_{store_name}"
        has_stream = store.has_segments(spark, sdir)
        if not (has_tomb or has_stream):
            continue
        base = spark.read.parquet(f"{path}/{store_name}")
        affected: set[int] = set()
        if tomb is not None:
            affected |= {
                r["cell"]
                for r in base.join(tomb, "vec_id")
                .select("cell")
                .distinct()
                .collect()
            }  # bounded by C
        if has_stream:
            affected |= {
                r["cell"]
                for r in spark.read.parquet(sdir)
                .select("cell")
                .distinct()
                .collect()
            }  # bounded by C
        if affected:
            # fold_partitions (r11, shared with the text lifecycle):
            # checkpoint-before-overwrite (the plan reads the very
            # files it replaces), per-write dynamic overwrite, and
            # explicit removal of emptied cells. dropDuplicates
            # (ADVICE r6 #1): a compaction that crashed between a
            # store's dynamic overwrite and its segment removal
            # leaves streamed rows in BOTH base and segments; base
            # UNION segments would then bake the duplicates in
            # permanently on the re-run. vec_id is the index PK
            # (tombstones mask by id), so id-dedup is exact; the
            # extra shuffle is bounded by the affected cells.
            survivors = (
                _read_index_members(spark, path, store_name)
                .filter(
                    F.col("cell").isin([int(c) for c in affected])
                )
                .dropDuplicates(["vec_id"])
            )
            store.fold_partitions(
                spark,
                survivors,
                "cell",
                f"{path}/{store_name}",
                affected,
            )
        if has_stream:
            store.remove_dir(spark, sdir)
    if has_tomb:
        store.remove_dir(spark, tomb_dir)


def describe_ivf_index(spark, path: str) -> DataFrame:
    """Index introspection: one row per cell with occupancy — plus a
    summary row (cell null) carrying the totals. Reads parquet
    footers' worth of data (a count per partition), no vector
    columns; the ops-side sanity check before pointing a query load
    at an index (skewed cells = slow probes).

    ``n_rows`` counts LIVE members (streamed segments included,
    tombstoned ids excluded — what a query can actually rank);
    ``n_dead`` counts tombstoned rows still physically present, the
    compaction-debt gauge (``compact_ivf_index`` returns it to 0).

    ``n_segments`` / ``n_stream`` (r6 verdict #6) gauge the OTHER
    compaction debt — file-count debt: streaming ingest writes one
    ``ingest_batch=N`` directory per micro-batch, and at production
    batch rates the segment count degrades scan planning (footer
    reads, tiny files) long before ``n_dead`` moves. Per cell,
    ``n_stream`` is the physical row count still sitting in stream
    segments and ``n_segments`` the number of micro-batch segments
    touching that cell; the summary row carries the stream-row total
    and the TOTAL segment-directory count. Compaction returns both
    to 0 (pinned in pytest).
    """
    live = _read_index_members(spark, path, "cells")
    cells = live.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tdir = f"{path}/tombstones"
    tomb = store.read_tombstones(spark, tdir, "vec_id", distinct=True)
    if tomb is not None:
        phys = spark.read.parquet(f"{path}/cells")
        seg = store.read_segments(spark, f"{path}/stream_cells")
        if seg is not None:
            phys = phys.unionByName(seg)
        dead = (
            phys.join(tomb, "vec_id")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_dead"))
        )
        cells = (
            cells.join(dead, "cell", "full_outer")
            .select(
                "cell",
                F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
            )
        )
    else:
        cells = cells.withColumn(
            "n_dead", F.lit(0).cast("bigint")
        )
    sdir = f"{path}/stream_cells"
    batches = store.segment_batch_ids(spark, sdir)
    if batches:
        segstats = (
            spark.read.parquet(sdir)
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n_stream"),
                F.countDistinct("ingest_batch").alias(
                    "n_segments"
                ),
            )
        )
        cells = cells.join(segstats, "cell", "full_outer").select(
            "cell",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("n_dead", F.lit(0)).alias("n_dead"),
            F.coalesce("n_stream", F.lit(0)).alias("n_stream"),
            F.coalesce("n_segments", F.lit(0)).alias(
                "n_segments"
            ),
        )
    else:
        cells = cells.withColumn(
            "n_stream", F.lit(0).cast("bigint")
        ).withColumn("n_segments", F.lit(0).cast("bigint"))
    summary = cells.agg(
        F.lit(None).cast("bigint").alias("cell"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_dead").alias("n_dead"),
        F.sum("n_stream").alias("n_stream"),
        # the summary's segment count is the DIRECTORY count (the
        # planning-debt unit), not the per-cell sum
        F.lit(len(batches)).cast("bigint").alias("n_segments"),
    )
    return cells.select(
        F.col("cell").cast("bigint"),
        "n_rows",
        F.col("n_dead").cast("bigint"),
        F.col("n_stream").cast("bigint"),
        F.col("n_segments").cast("bigint"),
    ).unionByName(summary)


def evaluate_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    *,
    nprobes: tuple | list = (1, 2, 4),
    pq: bool = False,
    refine_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Recall sweep of a persisted index against exact ground truth.

    The FAISS benchmark loop as ops tooling: before pointing a query
    load at an index (or after an append/delete/compact cycle), run
    a SAMPLE of queries at each candidate ``nprobe`` and report
    recall@k against the exact ranking over the index's LIVE members
    (segments in, tombstones out — the same relation the queries
    rank). Ground truth uses the metric the evaluated path ranks by:
    rounded cosine for the raw path (``query_ivf_index``), rounded
    squared L2 for the PQ path (``query_ivfpq_index`` ADC /
    refine) — recall of an L2 index against a cosine oracle would
    be metric-mismatched. Cost: ground truth is one brute-force
    |live| x |queries| pass through the shared Arrow kernels
    (``cosine_topk`` / ``l2_topk`` over the live-member relation —
    never an interpreted pair fold) — that is what exact ground
    truth costs, which is why this takes a query SAMPLE, not a
    workload. Returns one row per swept nprobe:
    (nprobe, pq, refine_k, k, n_queries, recall).

    The operating-point story: pick the smallest nprobe whose recall
    clears the product bar — probes scale query cost linearly while
    recall saturates, and the right answer shifts with corpus shape,
    C, and compaction state, which is why it is measured, not
    guessed.
    """
    exact, nq, denom = _index_ground_truth(
        spark, path, queries, k,
        pq=pq, id_col=id_col, vec_col=vec_col, dim=dim,
    )
    rows = [
        (
            int(np_),
            bool(pq),
            refine_k,
            int(k),
            int(nq),
            _index_recall_at(
                spark, path, queries, k, exact, denom, int(np_),
                pq=pq, refine_k=refine_k,
                id_col=id_col, vec_col=vec_col,
            ),
        )
        for np_ in nprobes
    ]
    return spark.createDataFrame(
        rows,
        "nprobe int, pq boolean, refine_k int, k int, "
        "n_queries long, recall double",
    )


def _index_ground_truth(
    spark, path, queries, k, *, pq, id_col, vec_col, dim
):
    """Exact top-k over the index's LIVE members (checkpointed) plus
    the query and ground-truth-row counts — computed ONCE per sweep,
    shared by every candidate nprobe."""
    mem = _read_index_members(spark, path, "cells").select(
        "vec_id", F.col("cv").alias("embedding")
    )
    qdf = queries.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    )
    nq = qdf.count()
    ranked = (
        l2_topk(mem, qdf, k)
        if pq
        else cosine_topk(mem, qdf, k, dim)
    )
    exact = ranked.select("query_id", "vec_id").localCheckpoint(
        eager=True
    )
    return exact, nq, exact.count()


def _index_recall_at(
    spark, path, queries, k, exact, denom, nprobe,
    *, pq, refine_k, id_col, vec_col,
):
    """Sampled recall@k of one candidate nprobe against the
    checkpointed ground truth — one query pass."""
    if pq:
        got = query_ivfpq_index(
            spark, path, queries, k, nprobe=nprobe,
            refine_k=refine_k, id_col=id_col, vec_col=vec_col,
        )
    else:
        got = query_ivf_index(
            spark, path, queries, k, nprobe=nprobe,
            id_col=id_col, vec_col=vec_col,
        )
    hits = (
        got.select("query_id", "vec_id")
        .join(exact, ["query_id", "vec_id"])
        .count()
    )
    return (hits / denom) if denom else 0.0


def tune_nprobe(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    target_recall: float,
    *,
    pq: bool = False,
    refine_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> dict:
    """Pick the smallest nprobe whose sampled recall@k clears a bar.

    The operating-point decision ``evaluate_ivf_index`` informs,
    made executable (the FAISS autotune idea, scoped to the one knob
    probes actually trade on): sweep nprobe over doublings
    1, 2, 4, ... up to C (the stored centroid count) and return the
    first point at or above ``target_recall`` — probe cost is linear
    in nprobe while recall saturates, so the first clearing point is
    the cheapest. Exact ground truth is computed ONCE per sweep (its
    dominant cost); candidates are then evaluated INCREMENTALLY in
    ascending order and the sweep STOPS at the first clearing point
    (r6 verdict #2 — the old shape evaluated every doubling up to C
    before picking, paying log2(C) sampled passes even when nprobe=1
    cleared the bar; pinned in pytest via a call counter). Returns
    ``{"nprobe": int | None, "recall": float, "swept": [(nprobe,
    recall), ...]}`` — ``swept`` lists only the candidates that
    actually ran (that truncation IS the saving). ``nprobe=None``
    (with the full-probe recall reported) means even probing every
    cell missed the bar: for the PQ path that is quantization loss
    (raise m/ks or refine_k, not nprobe), for the raw path a
    too-small query sample or ties at the k boundary.
    """
    n_cells = spark.read.parquet(f"{path}/centroids").count()
    cands: list[int] = []
    p = 1
    while p < n_cells:
        cands.append(p)
        p *= 2
    cands.append(int(n_cells))
    exact, _nq, denom = _index_ground_truth(
        spark, path, queries, k,
        pq=pq, id_col=id_col, vec_col=vec_col, dim=dim,
    )
    swept: list[tuple[int, float]] = []
    for np_ in cands:
        rec = _index_recall_at(
            spark, path, queries, k, exact, denom, int(np_),
            pq=pq, refine_k=refine_k,
            id_col=id_col, vec_col=vec_col,
        )
        swept.append((int(np_), rec))
        if rec >= target_recall:
            return {"nprobe": int(np_), "recall": rec, "swept": swept}
    return {"nprobe": None, "recall": swept[-1][1], "swept": swept}
