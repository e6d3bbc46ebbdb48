"""k-sweep evaluation, dedup end-game, range join, min-max KNN, random-projection approximate KNN.

Split from the former monolithic contract.py (round 3); original lines 1602-2099. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.operators.knn import (
    knn_accuracy,
    knn_neighbors,
    knn_predict,
    knn_vote_histogram,
)
from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (
    KNN_FEATURES,
    KNN_K,
    KNN_TEST_MOD,
    _KNN_CTE,
    knn_tables,
    load_docs_wide,
)
from knn_using_hadoop_spark.contract.text_dedup import (_DOC_CTE, _MINHASH_SQL)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# k-sweep evaluation (SURVEY.md §2.11: majority-vote classifier with a
# CrossValidator-style hyperparameter sweep, vectorized over k)
# --------------------------------------------------------------------------

_SWEEP_KS = (1, 3, 5)


def _sweep_vote_sql(k: int) -> str:
    return f"""
votes_{k} AS (
  SELECT test_id, label, count(*) AS cnt FROM knn
  WHERE rank <= {k} GROUP BY test_id, label),
pred_{k} AS (
  SELECT test_id, label AS prediction FROM (
    SELECT v.*, row_number() OVER (PARTITION BY test_id
                                   ORDER BY cnt DESC, label ASC) AS rn
    FROM votes_{k} v) q
  WHERE rn = 1),
acc_{k} AS (
  SELECT {k} AS k,
         avg(CASE WHEN p.prediction = te.label THEN 1.0 ELSE 0.0 END)
           AS accuracy
  FROM pred_{k} p JOIN test te ON p.test_id = te.id)"""


@_register(
    "knn_k_sweep",
    "WITH "
    + _KNN_CTE.replace(
        f"rank <= {KNN_K}", f"rank <= {max(_SWEEP_KS)}"
    ).rstrip()
    + ","
    + ",".join(_sweep_vote_sql(k) for k in _SWEEP_KS)
    + " "
    + " UNION ALL ".join(f"SELECT k, accuracy FROM acc_{k}" for k in _SWEEP_KS),
)
def q_knn_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy as a function of k — one neighbor pass, many votes.

    The top-(max k) neighbor relation is computed ONCE; each k's vote
    is a filter + aggregate over it (no re-scan, no re-join). The
    reference would need one full MapReduce job per k.
    """
    train, test = knn_tables(spark, sf_dir)
    nbrs = knn_neighbors(
        train, test, max(_SWEEP_KS), dim=len(KNN_FEATURES)
    )
    truth = test.select(F.col("id").alias("test_id"), "label")
    parts = []
    for k in _SWEEP_KS:
        votes = (
            nbrs.filter(F.col("rank") <= k)
            .groupBy("test_id", F.col("label").alias("nbr_label"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pred = votes.groupBy("test_id").agg(
            F.max_by(
                F.col("nbr_label"),
                F.struct(F.col("cnt"), (-F.col("nbr_label")).alias("neg")),
            ).alias("prediction")
        )
        acc = (
            pred.join(truth, "test_id")
            .agg(
                F.avg(
                    (F.col("prediction") == F.col("label")).cast("double")
                ).alias("accuracy")
            )
            .select(F.lit(k).alias("k"), "accuracy")
        )
        parts.append(acc)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# --------------------------------------------------------------------------
# Dedup end-game: components + filtered corpus
# --------------------------------------------------------------------------

_LSH_PAIRS_CTE = f"""{_DOC_CTE}, {_MINHASH_SQL},
bands AS (
  SELECT doc_id, h_idx // {_dedup.BAND_ROWS} AS band,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 0 THEN minhash END)
           AS sig0,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 1 THEN minhash END)
           AS sig1
  FROM sigs GROUP BY doc_id, h_idx // {_dedup.BAND_ROWS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig0 = b.sig0 AND a.sig1 = b.sig1
   AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN ds x ON x.doc_id = c.doc_a
  JOIN ds y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY c.doc_a, c.doc_b),
neardup AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5)
"""


@_register(
    "dedup_components",
    f"""WITH RECURSIVE {_LSH_PAIRS_CTE},
edges AS (SELECT doc_a AS s, doc_b AS t FROM neardup
          UNION ALL SELECT doc_b, doc_a FROM neardup),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t)
SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc""",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over verified LSH pairs.

    Spark side: iterative min-label propagation to fixpoint (an
    iterative distributed algorithm — driver controls iteration
    count only). Oracle: recursive-CTE transitive closure. Both
    converge to component = min reachable doc_id.
    """
    docs = load_docs_wide(spark, sf_dir)
    pairs = _dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return _dedup.neardup_components(pairs)


@_register(
    "dedup_filtered_corpus",
    f"""WITH RECURSIVE {_LSH_PAIRS_CTE},
edges AS (SELECT doc_a AS s, doc_b AS t FROM neardup
          UNION ALL SELECT doc_b, doc_a FROM neardup),
reach AS (
  SELECT s AS doc, s AS r FROM edges
  UNION
  SELECT e.s AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.t),
comp AS (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN comp ON comp.doc_id = d.doc_id
WHERE comp.doc_id IS NULL OR comp.component = d.doc_id""",
)
def q_dedup_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline end-product: corpus minus near-duplicates.

    Keeps every document that is either not in any near-dup cluster
    or is its cluster's representative (min doc_id) — the standard
    'keep one per cluster' training-data dedup policy.
    """
    docs = load_docs_wide(spark, sf_dir)
    comp = _dedup.neardup_components(
        _dedup.minhash_lsh_pairs(docs, threshold=0.5)
    )
    return (
        docs.join(F.broadcast(comp), "doc_id", "left")
        .filter(
            F.col("component").isNull()
            | (F.col("component") == F.col("doc_id"))
        )
        .select("doc_id", "lang", "source")
    )


# --------------------------------------------------------------------------
# Range join (absent from the reference, §2.9): time-proximity join
# via bucketized equi-join + residual predicate
# --------------------------------------------------------------------------


@_register(
    "range_join_counts",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, count(c.ts) AS clicks_30m_before
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
GROUP BY p.event_id, p.user_id""",
)
def q_range_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within 30 min before each purchase.

    Spark has no native range join. The naive plan is a per-user
    theta join (quadratic in events-per-user); the scale formulation
    here buckets time into 30-minute cells and equi-joins on
    (user_id, cell) for the purchase's cell and its predecessor, then
    applies the exact range predicate — candidate fan-out is bounded
    by 2 buckets instead of the whole user history. DuckDB's oracle
    uses its native inequality join; results are identical.
    """
    events = load_table(spark, "events", sf_dir)
    bucket_s = 1800
    cell = (F.unix_timestamp("ts") / bucket_s).cast("long")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        cell.alias("cell"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), cell.alias("c_cell")
    )
    # each purchase probes its own cell and the one before
    p2 = p.withColumn(
        "probe_cell", F.explode(F.array(F.col("cell") - 1, F.col("cell")))
    )
    joined = p2.join(
        c,
        (p2.user_id == c.user_id) & (p2.probe_cell == c.c_cell),
        "left",
    ).select(
        "event_id",
        p2.user_id.alias("uid"),
        "p_ts",
        F.when(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes"))
            & (F.col("c_ts") < F.col("p_ts")),
            1,
        ).alias("hit"),
    )
    return (
        joined.groupBy("event_id", F.col("uid").alias("user_id"))
        .agg(F.count("hit").alias("clicks_30m_before"))
    )

# --------------------------------------------------------------------------
# Normalized-feature KNN: min-max scaling from train statistics.
# (z-score would need stddev, whose unordered float sum is not
# bit-reproducible cross-engine; min/max are exact, and the scaling
# expression uses one fixed operand order on both sides.)
# --------------------------------------------------------------------------

_MINMAX_CTE = f"""
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
stats AS (
  SELECT min(f1) AS mn1, max(f1) AS mx1, min(f2) AS mn2, max(f2) AS mx2,
         min(f3) AS mn3, max(f3) AS mx3, min(f4) AS mn4, max(f4) AS mx4
  FROM train),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         ((te.f1-s.mn1)/(s.mx1-s.mn1) - (tr.f1-s.mn1)/(s.mx1-s.mn1))
       * ((te.f1-s.mn1)/(s.mx1-s.mn1) - (tr.f1-s.mn1)/(s.mx1-s.mn1))
       + ((te.f2-s.mn2)/(s.mx2-s.mn2) - (tr.f2-s.mn2)/(s.mx2-s.mn2))
       * ((te.f2-s.mn2)/(s.mx2-s.mn2) - (tr.f2-s.mn2)/(s.mx2-s.mn2))
       + ((te.f3-s.mn3)/(s.mx3-s.mn3) - (tr.f3-s.mn3)/(s.mx3-s.mn3))
       * ((te.f3-s.mn3)/(s.mx3-s.mn3) - (tr.f3-s.mn3)/(s.mx3-s.mn3))
       + ((te.f4-s.mn4)/(s.mx4-s.mn4) - (tr.f4-s.mn4)/(s.mx4-s.mn4))
       * ((te.f4-s.mn4)/(s.mx4-s.mn4) - (tr.f4-s.mn4)/(s.mx4-s.mn4))
           AS dist
  FROM test te CROSS JOIN train tr CROSS JOIN stats s),
knn AS (
  SELECT test_id, train_id, label FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
"""


@_register(
    "knn_predict_minmax",
    f"""WITH {_MINMAX_CTE}
SELECT test_id, label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY test_id
                                 ORDER BY cnt DESC, label ASC) AS rn
  FROM votes v) q
WHERE rn = 1""",
)
def q_knn_predict_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KNN on min-max-normalized features (train-statistics scaling).

    Unnormalized squared-Euclidean is dominated by l_extendedprice
    (range ~1e5 vs l_tax's 0.08); scaling each feature to [0,1] from
    TRAIN min/max (never test — no leakage) makes all four features
    contribute.

    The stats pass is a one-row driver collect (metadata-scale, like
    the ARFF header read) so the scaling becomes plan-time LITERALS.
    Round 1 joined the 1-row stats relation instead, and the stats
    aggregate + scaling subtree were re-evaluated inside BOTH of the
    prefilter's scoring branches — 15.3s vs ~6s for the same workload
    (VERDICT r1 #3). Same IEEE doubles either way (min/max are exact,
    mx-mn is one double subtraction on either engine), so the oracle
    hash is unchanged.
    """
    train, test = knn_tables(spark, sf_dir)
    s = train.agg(
        *[
            f(F.element_at("features", i + 1)).alias(f"{n}{i}")
            for i in range(len(KNN_FEATURES))
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    ).first()

    def scale(side: DataFrame) -> DataFrame:
        exprs = [
            (F.element_at("features", i + 1) - F.lit(s[f"mn{i}"]))
            / F.lit(s[f"mx{i}"] - s[f"mn{i}"])
            for i in range(len(KNN_FEATURES))
        ]
        return side.select(
            "id", F.array(*exprs).alias("features"), "label"
        )

    return knn_predict(
        scale(train), scale(test), KNN_K, dim=len(KNN_FEATURES)
    )

# --------------------------------------------------------------------------
# Approximate Euclidean KNN with a full oracle: random-projection
# buckets over min-max-scaled features. Projection signs are derived
# from the portable md5 hash at PLAN-BUILD time (hashlib == Spark md5
# == DuckDB md5), and the projection is a fixed-order 4-term sum, so
# the approximate candidate set itself is bit-reproducible — unlike
# MLlib's RNG-seeded BucketedRandomProjectionLSH (operators/
# knn_approx.py), which stays test-verified.
# --------------------------------------------------------------------------

import hashlib as _hashlib

_BKT_PLANES = 2
_BKT_WIDTH = 0.5


def _bkt_sign(p: int, i: int) -> int:
    h = int(_hashlib.md5(f"knn:{p}:{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _bkt_proj_sql(prefix: str, p: int) -> str:
    terms = []
    for i in range(1, len(KNN_FEATURES) + 1):
        sgn = "+" if _bkt_sign(p, i) > 0 else "-"
        terms.append(
            f"{sgn} ({prefix}.f{i} - s.mn{i}) / (s.mx{i} - s.mn{i})"
        )
    return " ".join(terms)


@_register(
    "knn_predict_bucketed",
    f"""WITH
base AS (
  SELECT ('0x' || substr(md5(l_orderkey || ',' || l_linenumber || ','
                         || l_quantity || ',' || l_extendedprice || ','
                         || l_discount || ',' || l_tax), 1, 15))::BIGINT
           AS id,
         l_quantity AS f1, l_extendedprice AS f2,
         l_discount AS f3, l_tax AS f4,
         l_linenumber AS label
  FROM lineitem),
test AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} = 0),
train AS (SELECT * FROM base WHERE id % {KNN_TEST_MOD} <> 0),
stats AS (
  SELECT min(f1) AS mn1, max(f1) AS mx1, min(f2) AS mn2, max(f2) AS mx2,
         min(f3) AS mn3, max(f3) AS mx3, min(f4) AS mn4, max(f4) AS mx4
  FROM train),
tr_b AS (
  SELECT t.id, t.label,
         (t.f1-s.mn1)/(s.mx1-s.mn1) AS g1, (t.f2-s.mn2)/(s.mx2-s.mn2) AS g2,
         (t.f3-s.mn3)/(s.mx3-s.mn3) AS g3, (t.f4-s.mn4)/(s.mx4-s.mn4) AS g4,
         floor(({_bkt_proj_sql('t', 0)}) / {_BKT_WIDTH})::BIGINT AS b0,
         floor(({_bkt_proj_sql('t', 1)}) / {_BKT_WIDTH})::BIGINT AS b1
  FROM train t CROSS JOIN stats s),
te_b AS (
  SELECT t.id, t.label,
         (t.f1-s.mn1)/(s.mx1-s.mn1) AS g1, (t.f2-s.mn2)/(s.mx2-s.mn2) AS g2,
         (t.f3-s.mn3)/(s.mx3-s.mn3) AS g3, (t.f4-s.mn4)/(s.mx4-s.mn4) AS g4,
         floor(({_bkt_proj_sql('t', 0)}) / {_BKT_WIDTH})::BIGINT AS b0,
         floor(({_bkt_proj_sql('t', 1)}) / {_BKT_WIDTH})::BIGINT AS b1
  FROM test t CROSS JOIN stats s),
pairs AS (
  SELECT te.id AS test_id, tr.id AS train_id, tr.label,
         (te.g1-tr.g1)*(te.g1-tr.g1) + (te.g2-tr.g2)*(te.g2-tr.g2)
       + (te.g3-tr.g3)*(te.g3-tr.g3) + (te.g4-tr.g4)*(te.g4-tr.g4) AS dist
  FROM te_b te JOIN tr_b tr ON te.b0 = tr.b0 AND te.b1 = tr.b1),
knn AS (
  SELECT test_id, train_id, label FROM (
    SELECT p.*, (row_number() OVER (PARTITION BY test_id
                                    ORDER BY dist, train_id))::INT AS rank
    FROM pairs p) r
  WHERE rank <= {KNN_K}),
votes AS (
  SELECT test_id, label, count(*) AS cnt FROM knn GROUP BY test_id, label)
SELECT test_id, label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY test_id
                                 ORDER BY cnt DESC, label ASC) AS rn
  FROM votes v) q
WHERE rn = 1""",
)
def q_knn_predict_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate KNN: random-projection buckets replace the cross join.

    Candidates = train rows sharing BOTH projection buckets with the
    test row (equi-join on (b0, b1) — sub-quadratic, the scale path
    for exact-ish KNN). Projections are fixed-order sums over min-max-
    scaled features, so even this approximate operator is fully
    oracle-checked. Test rows whose bucket holds no train row get no
    prediction (standard LSH recall loss).
    """
    train, test = knn_tables(spark, sf_dir)
    nf = len(KNN_FEATURES)
    # one-row stats collect -> plan-time literals (same rationale and
    # bit-exactness argument as knn_predict_minmax above)
    s = train.agg(
        *[
            f(F.element_at("features", i + 1)).alias(f"{n}{i + 1}")
            for i in range(nf)
            for n, f in (("mn", F.min), ("mx", F.max))
        ]
    ).first()

    def prep(side: DataFrame) -> DataFrame:
        scaled = [
            (
                (F.element_at("features", i) - F.lit(s[f"mn{i}"]))
                / F.lit(s[f"mx{i}"] - s[f"mn{i}"])
            ).alias(f"g{i}")
            for i in range(1, nf + 1)
        ]
        x = side.select("id", "label", *scaled)
        for p in range(_BKT_PLANES):
            proj: Column | None = None
            for i in range(1, nf + 1):
                t = F.lit(float(_bkt_sign(p, i))) * F.col(f"g{i}")
                proj = t if proj is None else proj + t
            x = x.withColumn(
                f"b{p}",
                F.floor(proj / F.lit(_BKT_WIDTH)).cast("bigint"),
            )
        return x

    tr = prep(train)
    te = prep(test)
    d: Column | None = None
    for i in range(1, nf + 1):
        t = (F.col(f"te.g{i}") - F.col(f"tr.g{i}")) * (
            F.col(f"te.g{i}") - F.col(f"tr.g{i}")
        )
        d = t if d is None else d + t
    pairs = (
        te.alias("te")
        .join(
            tr.alias("tr"),
            [
                F.col(f"te.b{p}") == F.col(f"tr.b{p}")
                for p in range(_BKT_PLANES)
            ],
        )
        .select(
            F.col("te.id").alias("test_id"),
            F.col("tr.id").alias("train_id"),
            F.col("tr.label").alias("label"),
            d.alias("dist"),
        )
    )
    w = Window.partitionBy("test_id").orderBy(
        F.col("dist").asc(), F.col("train_id").asc()
    )
    knn = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    votes = knn.groupBy("test_id", "label").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        votes.groupBy("test_id")
        .agg(
            F.max_by(
                F.col("label"),
                F.struct(F.col("cnt"), (-F.col("label")).alias("neg")),
            ).alias("prediction")
        )
        .orderBy("test_id")
    )

