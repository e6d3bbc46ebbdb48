"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

North-star extensions (SURVEY.md §2.11) for training-data pipelines.
All are relational compositions (explode / groupBy / self-join) with
the portable md5 hash so every stage is oracle-checkable in DuckDB.

Scale design notes (100 TB):

* exact dedup groups on a 60-bit content hash, not the full text —
  the shuffle carries 8-byte keys instead of documents;
* MinHash/LSH is the classic sub-quadratic near-dup path: the only
  join is on (band, band-signature) buckets, so cost is driven by
  bucket occupancy, not |docs|^2;
* the n-gram Jaccard join includes a shingle-frequency cap
  (``max_shingle_freq``): ultra-common shingles would otherwise
  create quadratic hot buckets (classic skew); dropping them bounds
  each shingle's join fan-out. The cap only prunes candidate
  GENERATION — verification uses full shingle sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import (
    MERSENNE_PRIME,
    portable_hash64,
)
from knn_using_hadoop_spark.operators.text import (
    exploded_shingles,
    minhash_permuted,
)
from knn_using_hadoop_spark.sources import index_store as store

# Fixed MinHash permutation parameters (odd multipliers, arbitrary
# offsets — frozen: they are part of the operator contract and are
# mirrored in the oracle SQL).
MINHASH_A = (31, 97, 193, 389, 769, 1543, 3079, 6151)
MINHASH_B = (7, 11, 13, 17, 19, 23, 29, 37)
NUM_HASHES = len(MINHASH_A)
BAND_ROWS = 2  # 8 hashes -> 4 bands of 2 (r=2, b=4)


def dedup_exact(docs: DataFrame) -> DataFrame:
    """One row per distinct text: (doc_id = min id, n_copies, fp64).

    Hash-groupBy dedup on a 120-bit content key — two independent
    60-bit slices of the same md5 digest. Grouping on the hash rather
    than the text keeps the shuffle key fixed-width (16 bytes/row
    after partial aggregation) instead of shipping document bodies —
    the property that makes this the 100 TB path. Two distinct texts
    merge only on a 120-bit collision (~2^-60 birthday odds at
    billion-doc scale; adversarial md5 collisions are out of scope
    for dedup).
    """
    return (
        docs.withColumn("fp64", portable_hash64(F.col("text")))
        .withColumn("fp64b", portable_hash64(F.col("text"), pos=17))
        .groupBy("fp64", "fp64b")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("doc_id", "fp64", "n_copies")
    )


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs (linear-time shingling —
    see text.shingles_from_tokens)."""
    return exploded_shingles(docs, n, out="shingle").distinct()


def hashed_shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, h): 60-bit md5-prefix hashes of shingles.

    The fixed-width shuffle representation of a document's shingle
    set: 8-byte keys instead of n-word strings — the same argument as
    the 120-bit exact-dedup key (`dedup_exact`). Two distinct
    shingles of one doc collide at ~s^2/2^61 (an elephant doc of 30k
    shingles: ~4e-10), so set sizes / intersections computed on
    hashes equal the string-set values for every practical corpus.
    The high 32 bits are BY CONSTRUCTION the classic 32-bit shingle
    hash (first 8 of the same 15 md5 hex digits), so MinHash
    signatures derived from this relation are bit-identical to
    ``minhash_signatures``.
    """
    return (
        exploded_shingles(docs, n, out="s")
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("s"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
    )


def _signatures_from_h32(hashed: DataFrame) -> DataFrame:
    """(doc_id, h_idx, minhash) from a (doc_id, h32-keyed) relation."""
    perms = hashed.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))).alias(
            "h_idx"
        ),
    )
    a_map = F.element_at(
        F.array(*[F.lit(a) for a in MINHASH_A]), F.col("h_idx") + 1
    )
    b_map = F.element_at(
        F.array(*[F.lit(b) for b in MINHASH_B]), F.col("h_idx") + 1
    )
    return (
        perms.select(
            "doc_id",
            "h_idx",
            ((a_map * F.col("h") + b_map) % F.lit(MERSENNE_PRIME)).alias(
                "p"
            ),
        )
        .groupBy("doc_id", "h_idx")
        .agg(F.min("p").alias("minhash"))
    )


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """Long-format MinHash signatures: (doc_id, h_idx, minhash).

    h_idx in [0, NUM_HASHES); minhash = min over the doc's shingles of
    (a*h32(shingle)+b) mod p. Docs shorter than the shingle width
    produce no signature rows.

    Shape: explode shingles -> hash each ONCE -> explode the 8
    permutation indices -> partial+final min aggregate. An array-
    expression formulation (8 array_min branches) re-inlines the
    shingle+md5 subtree into every branch — Catalyst does no common
    subexpression elimination across lambda branches — and measured
    7x slower; the explode form hashes each shingle exactly once and
    the groupBy min combines map-side.
    """
    hashed = exploded_shingles(docs, n, out="s").select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    return _signatures_from_h32(hashed)


def minhash_band_buckets(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, sig0, sig1): LSH banding of long-format sigs."""
    return (
        signatures.withColumn(
            "band", (F.col("h_idx") / BAND_ROWS).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.max(
                F.when(F.col("h_idx") % BAND_ROWS == 0, F.col("minhash"))
            ).alias("sig0"),
            F.max(
                F.when(F.col("h_idx") % BAND_ROWS == 1, F.col("minhash"))
            ).alias("sig1"),
        )
    )


def jaccard_verify(
    candidates: DataFrame, shingle_df: DataFrame
) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs.

    ``shingle_df`` = distinct (doc_id, shingle). Returns
    (doc_a, doc_b, n_common, jaccard).
    """
    # NOTE: three consumers below (both join sides + the size
    # aggregate) each recompute the explode+distinct lineage.
    # Measured at sf0.1: materializing it first (localCheckpoint) is
    # ~2x SLOWER than the recompute — serializing the wide string
    # relation costs more than three codegen'd explode passes (same
    # lesson as the r1 cache-vs-recompute finding, NOTES.md).
    sizes = shingle_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    sa = shingle_df.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle")
    )
    sb = shingle_df.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle")
    )
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_shingles").alias("size_a"),
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"),
                F.col("n_shingles").alias("size_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def _lsh_candidates(signatures: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any full band signature.

    b=4, r=2 over 8 hashes — collision prob = 1-(1-j^2)^4.
    """
    bands = minhash_band_buckets(signatures)
    left = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "sig0", "sig1"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "sig0", "sig1"
    )
    return (
        left.join(right, ["band", "sig0", "sig1"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _content_collapse(docs: DataFrame):
    """(ck, reps): doc -> content representative, and the rep docs.

    ck = (doc_id, crep) where crep = min doc_id sharing the 120-bit
    content key (``dedup_exact``'s argument for collision odds) —
    checkpointed: doc-level fixed-width, feeds the rep filter + both
    expansion joins + the within self-join. reps = one full doc row
    per distinct text.
    """
    ck = (
        docs.select(
            "doc_id",
            portable_hash64(F.col("text")).alias("k1"),
            portable_hash64(F.col("text"), pos=17).alias("k2"),
        )
        .withColumn(
            "crep",
            F.min("doc_id").over(Window.partitionBy("k1", "k2")),
        )
        .select("doc_id", "crep")
        .localCheckpoint(eager=True)
    )
    reps = docs.join(
        ck.filter(F.col("doc_id") == F.col("crep")).select("doc_id"),
        "doc_id",
    )
    return ck, reps


def _expand_content_pairs(
    rep_pairs: DataFrame,
    ck: DataFrame,
    sizes: DataFrame,
    threshold: float,
) -> DataFrame:
    """Expand rep-level verified pairs to doc-level pairs.

    ``rep_pairs`` = (doc_a, doc_b, n_common, jaccard) between content
    representatives; ``sizes`` = (doc_id, n_common) per rep with >= 1
    shingle. Cross-content expansion keeps the (content-determined)
    n_common/jaccard with least/greatest id ordering; within-content
    piles emit their m(m-1)/2 pairs directly at jaccard exactly 1.0
    iff the pile has >= 1 shingle and 1.0 passes the threshold — both
    exactly what the uncollapsed plan produces.
    """
    ma = ck.select(
        F.col("crep").alias("doc_a"), F.col("doc_id").alias("da")
    )
    mb = ck.select(
        F.col("crep").alias("doc_b"), F.col("doc_id").alias("db")
    )
    cross = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "n_common",
            "jaccard",
        )
    )
    if threshold > 1.0:
        return cross
    wa = ck.select("crep", F.col("doc_id").alias("doc_a"))
    wb = ck.select("crep", F.col("doc_id").alias("doc_b"))
    within = (
        wa.join(wb, "crep")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(sizes.withColumnRenamed("doc_id", "crep"), "crep")
        .select(
            "doc_a", "doc_b", "n_common", F.lit(1.0).alias("jaccard")
        )
    )
    return cross.unionByName(within)


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Near-dup pairs via MinHash LSH + exact Jaccard verification.

    Candidates from ``_lsh_candidates``; verification: exact Jaccard
    over shingle sets, filtered at ``threshold``. Output (doc_a,
    doc_b, n_common, jaccard) with doc_a < doc_b.

    The whole pipeline reads ONE fixed-width relation
    (``hashed_shingle_sets``): signatures take the high 32 bits (bit-
    identical to ``minhash_signatures`` — same md5 prefix), the
    verify joins shuffle 8-byte hashes instead of n-word strings.
    Measured at 10x skew: 80s (string verify) -> see NOTES r3; at
    sf0.1 unchanged. The minhash over the DISTINCT set equals the
    multiset minhash (min ignores duplicates).

    CONTENT COLLAPSE (r4): identical texts have identical shingle
    sets, hence identical signatures, candidacy, and Jaccard — so
    shingling + LSH + verification run on one REPRESENTATIVE per
    distinct text (120-bit content key, same as ``dedup_exact``) and
    the verified rep pairs expand back to doc pairs:

    * cross-content: (ra, rb) verified -> every (da in content(ra),
      db in content(rb)) with least/greatest ordering, same
      n_common/jaccard (both content-determined);
    * within-content: a pile of m copies is m(m-1)/2 pairs with
      jaccard exactly 1.0 and n_common = the set size — emitted iff
      the pile has >= 1 shingle (shorter docs produce no signatures
      and were never candidates) and 1.0 passes the threshold,
      matching the uncollapsed semantics exactly.

    The expansion joins are output-sized (the pair relation IS
    quadratic in pile size — that is the true answer); everything
    BEFORE them is sized by distinct texts. Hostile-10x corpus (50k
    docs, 10,234 distinct texts): measured in NOTES r4. Output is
    provably identical to the uncollapsed plan — pytest pins it
    against the brute-force replica and this module's own history.
    """
    ck, reps = _content_collapse(docs)
    hs = hashed_shingle_sets(reps, n)
    sigs = _signatures_from_h32(
        hs.select("doc_id", F.shiftright("h", 28).alias("h"))
    )
    candidates = _lsh_candidates(sigs)
    rep_pairs = jaccard_verify(
        candidates, hs.withColumnRenamed("h", "shingle")
    ).filter(F.col("jaccard") >= threshold)
    sizes = hs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return _expand_content_pairs(rep_pairs, ck, sizes, threshold)


def minhash_sig_est_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Near-dup pairs with signature-ESTIMATED Jaccard (no re-join).

    The 100 TB path past ``minhash_lsh_pairs``: verification re-joins
    full shingle sets, whose shuffle is O(total shingles) — dominated
    by the longest documents. Here Jaccard is estimated as the
    agreement fraction of the NUM_HASHES minhashes (the unbiased
    MinHash estimator), so everything after signature computation
    shuffles O(|docs| x NUM_HASHES) fixed-width rows regardless of
    document length. Estimator granularity is 1/NUM_HASHES; use the
    exact variant when the threshold needs finer resolution.
    Output (doc_a, doc_b, n_agree, est_jaccard) with doc_a < doc_b.

    If you only need WHICH docs to drop (not the pairs), use
    ``minhash_sig_est_pruned``: the pair relation is inherently
    quadratic on duplicated corpora (m copies = m(m-1)/2 pairs),
    while the pruned SET is linear and computable from distinct
    signatures (measured 11.5x at 100x — NOTES r4).
    """
    # materialize the signature relation once: it feeds the band
    # self-join AND both sides of the agreement join, and it is
    # fixed-width (|docs| x NUM_HASHES bigint rows) — the cheap-to-
    # materialize case, unlike the wide string relations where
    # checkpointing measured slower (jaccard_verify note)
    sigs = minhash_signatures(docs, n).localCheckpoint(eager=True)
    candidates = _lsh_candidates(sigs)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), "h_idx",
        F.col("minhash").alias("ma"),
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), "h_idx",
        F.col("minhash").alias("mb"),
    )
    return (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "h_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)
            ).alias("n_agree")
        )
        .withColumn(
            "est_jaccard", F.col("n_agree") / F.lit(NUM_HASHES)
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_sig_est_pruned(
    docs: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Distinct near-dup-PRUNED doc_ids (signature-estimated Jaccard)
    at duplicate-pile-up scale: (doc_id) — exactly the distinct
    ``doc_b`` set of ``minhash_sig_est_pairs``.

    Why a separate operator: the pair relation is inherently
    quadratic on a duplicated corpus — a cluster of m copies IS
    m(m-1)/2 true pairs, so no pair-returning plan can beat that.
    A curation pipeline only needs the pruned SET, which is linear,
    and the estimated Jaccard of a pair depends only on the two
    SIGNATURES. So collapse docs into signature groups first and do
    all pairwise work between DISTINCT signatures:

    1. pivot each doc's 8 minhashes to one fixed-width row;
    2. group identical signatures: (m0..m7, rep = min doc_id) — a
       pile of m exact copies becomes ONE row here, which is the
       whole fix: the r3 100x stress corpus produced 27.5M candidate
       pairs from exactly these piles;
    3. LSH-band self-join between group reps only; agreement is
       computed INLINE from the pivoted columns (no 8-way h_idx
       re-join — also removes the old plan's biggest shuffle);
    4. doc d in group g is pruned iff a smaller doc with an
       est-similar signature exists:
       ``d > rep(g)`` (a same-signature partner, agreement 8/8) or
       ``d > min(rep(g'))`` over band-colliding groups g' with
       agreement >= threshold. Both conditions are exact rewrites of
       the pair definition — min over a group's members equals its
       rep, so existential "some smaller doc_a" becomes one min.

    Every relation after step 1 is sized by DISTINCT signatures, not
    docs; the doc-level work is two fixed-width-key shuffles.
    """
    mcols = [f"m{i}" for i in range(NUM_HASHES)]
    wide = (
        minhash_signatures(docs, n)
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("h_idx") == i, F.col("minhash"))
                ).alias(f"m{i}")
                for i in range(NUM_HASHES)
            ]
        )
    )
    # rep via a min-window over the signature partition: ONE shuffle
    # gives every member row its rep (a groupBy + 8-column member
    # re-join costs a second shuffle of all docs — measured slower at
    # both sf0.1 and 100x); groups then falls out as the rep's own
    # row. Checkpoint MEMBERS, not groups: every downstream consumer
    # (four band selects + the final prune join) then reads the one
    # materialized fixed-width relation, so the expensive signature
    # lineage runs exactly once (checkpointing groups instead leaves
    # the prune join recomputing it — measured: sf0.1 2.8 -> 2.0s,
    # 100x 9.5 -> 6.4s).
    members = wide.withColumn(
        "rep", F.min("doc_id").over(Window.partitionBy(*mcols))
    ).localCheckpoint(eager=True)
    groups = members.filter(F.col("doc_id") == F.col("rep")).select(
        "rep", *mcols
    )
    bands = None
    for b in range(NUM_HASHES // BAND_ROWS):
        sel = groups.select(
            "rep",
            *mcols,
            F.lit(b).alias("band"),
            F.col(f"m{b * BAND_ROWS}").alias("sig0"),
            F.col(f"m{b * BAND_ROWS + 1}").alias("sig1"),
        )
        bands = sel if bands is None else bands.unionByName(sel)
    left = bands.select(
        F.col("rep").alias("rep_a"),
        *[F.col(m).alias(f"a_{m}") for m in mcols],
        "band",
        "sig0",
        "sig1",
    )
    right = bands.select(
        F.col("rep").alias("rep_b"),
        *[F.col(m).alias(f"b_{m}") for m in mcols],
        "band",
        "sig0",
        "sig1",
    )
    agreement = None
    for m in mcols:
        t = (F.col(f"a_{m}") == F.col(f"b_{m}")).cast("int")
        agreement = t if agreement is None else agreement + t
    min_ext = (
        left.join(right, ["band", "sig0", "sig1"])
        .filter(F.col("rep_a") != F.col("rep_b"))
        .filter(
            agreement.cast("double") / F.lit(NUM_HASHES)
            >= F.lit(threshold)
        )
        .groupBy(F.col("rep_b").alias("rep"))
        .agg(F.min("rep_a").alias("ext"))
    )
    # A same-signature partner has agreement exactly 8/8 = 1.0, so
    # the `doc_id > rep` branch only exists for threshold <= 1.0; at
    # threshold > 1.0 sig_est_pairs returns nothing and so must the
    # pruned set (ADVICE r4 #2 — mirror _expand_content_pairs).
    same_sig = (
        (F.col("doc_id") > F.col("rep"))
        if threshold <= 1.0
        else F.lit(False)
    )
    return (
        members.select("doc_id", "rep")
        .join(min_ext, "rep", "left")
        .filter(same_sig | (F.col("doc_id") > F.col("ext")))
        .select("doc_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_shingle_freq: int | None = 50,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (no LSH approximation).

    Candidate generation joins docs on shared shingles; shingles
    occurring in more than ``max_shingle_freq`` docs are excluded from
    candidate generation (skew guard — see module docstring), then
    pairs are verified with exact Jaccard over the FULL shingle sets.
    A true near-dup pair always shares at least one sub-cap shingle
    when threshold is high; at web scale you'd tune the cap with the
    band structure. Output (doc_a, doc_b, n_common, jaccard).
    """
    sh = shingle_sets(docs, n)
    gen = sh
    if max_shingle_freq is not None:
        freq_w = Window.partitionBy("shingle")
        gen = sh.withColumn(
            "df", F.count(F.lit(1)).over(freq_w)
        ).filter(F.col("df") <= max_shingle_freq)
    candidates = (
        gen.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(
            gen.select(F.col("doc_id").alias("doc_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(candidates, sh).filter(
        F.col("jaccard") >= threshold
    )


def neardup_components(pairs: DataFrame) -> DataFrame:
    """Connected components over near-dup pairs: (doc_id, component).

    component = min doc_id transitively reachable through the pair
    graph — the grouping step that turns pairwise near-dup hits into
    dedup clusters. Iterative min-label propagation to a fixpoint;
    the driver loop controls ITERATION only (each step is a
    distributed join+aggregate; no data is collected beyond the
    single converged-yet? count). Convergence takes O(diameter)
    rounds; near-dup graphs are overwhelmingly tiny cliques, so this
    is 1-3 rounds in practice. For planet-scale graphs swap in the
    large-star/small-star formulation — same contract.
    """
    edges = pairs.select(
        F.col("doc_a").alias("s"), F.col("doc_b").alias("t")
    )
    edges = edges.union(
        edges.select(F.col("t").alias("s"), F.col("s").alias("t"))
    # materialize once: edges are re-joined EVERY round, and the
    # upstream pair-generation (LSH band join + Jaccard verify) is far
    # too expensive to recompute per iteration
    ).localCheckpoint()
    labels = (
        edges.select(F.col("s").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        # materialize each round: without this the lineage deepens
        # every iteration and both consumers of `updated` (the
        # convergence count and the next round's join) recompute the
        # whole history — O(rounds^2) work and an ever-growing plan
        .localCheckpoint()
    )
    while True:
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc").alias("t"),
                    F.col("label").alias("t_label"),
                ),
                "t",
            )
            .groupBy("s")
            .agg(F.min("t_label").alias("nbr_label"))
        )
        updated = (
            labels.join(
                nbr_min.select(F.col("s").alias("doc"), "nbr_label"),
                "doc",
                "left",
            )
            .select(
                "doc",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc")
            .filter(F.col("u.label") != F.col("l.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("label").alias("component")
    )


def neardup_components_star(
    pairs: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Connected components via alternating large-star/small-star.

    Same contract as ``neardup_components`` (component = min doc_id
    transitively reachable), but O(log n) rounds instead of
    O(diameter) — the formulation for planet-scale graphs (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14;
    public algorithm). Each round is two keyed groupBy+join passes
    over the edge set; edges only ever shrink toward star edges
    (node -> component root), so per-round cost is bounded by the
    current edge count. ``localCheckpoint`` per round keeps the plan
    depth constant (same lesson as ``neardup_components``).

    Edges are kept canonically oriented hi > lo:

    * large-star: every node links its LARGER neighbors to the
      minimum of its neighborhood (incl. itself);
    * small-star: every node links itself and its smaller neighbors
      to its smallest neighbor.

    Fixpoint = edge set unchanged; then every non-root node holds
    exactly its (node, root) star edge.
    """
    E = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        E.select(F.col("hi").alias("doc"))
        .union(E.select(F.col("lo").alias("doc")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # ---- large-star ----
        both = E.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(E.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = both.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # ---- small-star (input: larger endpoint = hi) ----
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .select(
                F.col("lo").alias("node"),
                F.col("m"),
                F.col("hi").alias("u"),
            )
            .filter(F.col("node") != F.col("m"))
            .select(F.col("node").alias("hi"), F.col("m").alias("lo"))
            .union(
                smins.select(
                    F.col("hi"), F.col("m").alias("lo")
                )
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        same = (
            small.count() == E.count()
            and small.exceptAll(E).count() == 0
        )
        E = small
        if same:
            break
    labels = E.groupBy(F.col("hi").alias("doc")).agg(
        F.min("lo").alias("component")
    )
    return (
        nodes.join(labels, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            F.coalesce(F.col("component"), F.col("doc")).alias(
                "component"
            ),
        )
    )


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per doc over whitespace tokens: (doc_id, simhash).

    Bit j of the signature is 1 iff sum over tokens of
    (+1 if bit j of h32(token) else -1) is positive. Computed via
    explode over (token x bit) — embarrassingly parallel, one shuffle
    on (doc_id, bit).
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
    ).select(
        "doc_id",
        "bit",
        # F.shiftright only takes a literal shift; the SQL form takes
        # a column
        F.when(F.expr("shiftright(h, bit) % 2") == 1, 1)
        .otherwise(-1)
        .alias("vote"),
    )
    bitsums = bits.groupBy("doc_id", "bit").agg(
        F.sum("vote").alias("s")
    )
    return bitsums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.pow(F.lit(2.0), F.col("bit")).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def jaccard_prefix_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """EXACT Jaccard-similar pairs via prefix filtering (AllPairs /
    PPJoin family, Bayardo et al. WWW'07) — the lossless sub-quadratic
    set-similarity join.

    Under any global total order on shingles, two sets with
    |A∩B| >= ceil(t*|A|) must share an element of A's
    (|A| - ceil(t*|A|) + 1)-prefix (pigeonhole), and Jaccard >= t
    implies overlap >= t*max(|A|,|B|) >= ceil(t*|A|) for BOTH sides'
    prefixes. So candidates = pairs sharing a PREFIX shingle under
    the (document-frequency ASC, shingle) order — rarest-first, which
    minimizes bucket occupancy — and exact verification restores
    precision. Unlike the freq-capped ``ngram_jaccard_pairs`` (which
    changes semantics by dropping hot shingles) or MinHash-LSH
    (probabilistic recall), the result here provably EQUALS the
    all-pairs join, so the oracle is the plain exact SQL.

    Scale shape: the self-join key set shrinks from every
    (doc, shingle) to every (doc, prefix shingle) — at t=0.5 that
    halves the join input, and because prefixes hold the RAREST
    shingles, bucket sizes collapse (the hot shingle that makes the
    naive join quadratic is in nobody's prefix).

    CONTENT COLLAPSE (r4, same as ``minhash_lsh_pairs``): prefixes,
    candidacy and Jaccard are all functions of the shingle SET, so
    the whole machinery runs on one representative per distinct text
    and verified rep pairs expand back to doc pairs. Exactness is
    preserved by the prefix theorem itself: it holds under ANY global
    total order, so the rep-corpus document frequencies being smaller
    than the full-corpus ones changes only the order statistics, not
    the guaranteed-complete candidate set; verification then restores
    precision as before. Identical piles skip the prefix machinery
    entirely (within-content expansion at jaccard exactly 1.0).
    """
    ck, reps = _content_collapse(docs)
    shingle_df = shingle_sets(reps, n)
    freq = shingle_df.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    sizes = shingle_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    ranked = (
        shingle_df.join(freq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("doc_id", "shingle")
    a = prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = prefix.select(F.col("doc_id").alias("doc_b"), "shingle")
    cands = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    rep_pairs = jaccard_verify(cands, shingle_df).filter(
        F.col("jaccard") >= threshold
    )
    return _expand_content_pairs(
        rep_pairs,
        ck,
        shingle_df.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_common")
        ),
        threshold,
    )


def shared_passage_spans(
    docs: DataFrame,
    win: int = 20,
    max_occurrences: int = 50,
) -> DataFrame:
    """Exact shared-passage detection with positions (substring dedup).

    The relational form of exact-substring training-data dedup (Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 — there via a suffix array): hash every
    ``win``-token window WITH its position, keep window hashes seen in
    >=2 documents, pair up their occurrences, and coalesce runs of
    consecutive matching windows on the same alignment diagonal into
    maximal spans. Returns one row per maximal shared passage:
    (doc_a, doc_b, a_start, b_start, span_tokens) — 0-based token
    offsets, doc_a < doc_b.

    Scale shape: the window relation is fixed-width (60-bit md5-prefix
    keys, the `hashed_shingle_sets` argument); the only shuffles key
    on that hash, and the pair fan-out is bounded by
    ``max_occurrences`` (boilerplate passages that occur everywhere
    are exactly the windows a dedup pass should treat as background —
    same cap argument as `ngram_jaccard_pairs`). Span coalescing is a
    per-(pair, diagonal) window function — no iteration, no driver
    involvement.

    Measured cap trade (hostile-10x corpus, exact uncapped oracle —
    NOTES r4): the default cap=50 suppresses 6.6% of true spans
    (7.7% of span-tokens), all anchored on >50-occurrence boilerplate
    windows, for a ~4x wall-time win (13.5s vs 52-69s). Raise the cap
    when completeness beats cost; a cap above the corpus's max window
    occurrence makes the result exactly complete.
    """
    from knn_using_hadoop_spark.operators.text import (
        shingles_from_tokens,
        tokens,
    )

    tk = docs.select("doc_id", tokens("text").alias("__toks"))
    wins = tk.select(
        "doc_id",
        F.posexplode(
            shingles_from_tokens(F.col("__toks"), win)
        ).alias("pos", "g"),
    )
    hashed = wins.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    ok = (
        hashed.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter(
            (F.col("nd") >= 2) & (F.col("occ") <= max_occurrences)
        )
        .select("h")
    )
    dup = hashed.join(ok, "h")
    a = dup.select(
        "h",
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = dup.select(
        "h",
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    pairs = a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b"))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = pairs.withColumn(
        "diag", F.col("pos_a") - F.col("pos_b")
    ).withColumn("isl", F.col("pos_a") - F.row_number().over(w))
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
            (F.count(F.lit(1)) + F.lit(win - 1)).alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    )


# ---------------------------------------------------------------------------
# Persisted dedup-fingerprint index (r11): build once, then dedup every
# incoming batch against the corpus WITHOUT re-minhashing the corpus —
# the incremental-ingest shape a 100 TB crawl pipeline actually runs
# (a new crawl slice arrives; its near-dups against everything already
# ingested must be found at batch cost, not corpus cost). Third store
# family on the shared `sources/index_store` lifecycle machinery
# (text BM25 store, IVF(PQ) vector store, and now this one).
#
#   <path>/bands       (doc_id, band, sig0, sig1) hive-partitioned by
#                      bbucket = pmod(xxhash64(band, sig0, sig1), B);
#                      files sorted by (sig0, sig1, band) so a batch's
#                      band-key set pushes into the scan (row-group
#                      skipping — the r11 term-selective discipline)
#   <path>/sigs        (doc_id, h_idx, minhash) partitioned by
#                      sbucket = pmod(xxhash64(doc_id), B), sorted by
#                      (doc_id, h_idx) — the doc-keyed side the
#                      verify step and tombstone compaction read
#   <path>/meta        one row (n, n_buckets, num_hashes, band_rows),
#                      swap-written (crash-safe)
#   <path>/bands_seg/ingest_batch=N, <path>/sigs_seg/ingest_batch=N
#                      self-contained append segments
#   <path>/tombstones  deleted doc ids
#
# No write-ahead manifest: unlike the text index there are no derived
# global statistics to go stale (est_jaccard needs only the two rows'
# signatures), so a compaction crash at ANY point leaves a state
# where queries are correct and a re-run converges — the same
# argument as the IVF compact (see `compact_ivf_index`); the one
# duplicate-rows crash window is closed at query time by counting
# agreement over DISTINCT h_idx.

_DEDUP_META_SCHEMA = (
    "n int, n_buckets int, num_hashes int, band_rows int, "
    "attribute_cols array<string>"
)
_DEDUP_PAIRS_SCHEMA = (
    "doc_id bigint, corpus_id bigint, n_agree bigint, "
    "est_jaccard double"
)


def _band_bucket(n_buckets: int):
    return F.pmod(
        F.xxhash64("band", "sig0", "sig1"), F.lit(n_buckets)
    ).cast("int")


def _sig_bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _write_dedup_stores(
    sigs: DataFrame, bands: DataFrame, n_buckets: int,
    bands_dest: str, sigs_dest: str,
) -> None:
    """Write sigs FIRST, bands second (a batch becomes visible to
    candidate generation only when its bands land, and candidates
    never point at missing signatures)."""
    (
        sigs.withColumn("sbucket", _sig_bucket("doc_id", n_buckets))
        .sortWithinPartitions("sbucket", "doc_id", "h_idx")
        .write.mode("overwrite")
        .partitionBy("sbucket")
        .parquet(sigs_dest)
    )
    (
        bands.withColumn("bbucket", _band_bucket(n_buckets))
        .sortWithinPartitions("bbucket", "sig0", "sig1", "band", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bbucket")
        .parquet(bands_dest)
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    *,
    n: int = 3,
    n_buckets: int = 16,
    attribute_cols: list[str] | None = None,
) -> None:
    """Persist the corpus near-dup fingerprint store: build once,
    dedup many batches.

    MinHash signatures (8 permutations over 60-bit md5 shingle
    hashes — bit-identical to ``minhash_signatures``) and their LSH
    band keys (r=2, b=4), both hive-partitioned by a hash bucket and
    KEY-SORTED within every file so queries prune partitions AND
    skip row groups. Docs shorter than the shingle width carry no
    fingerprint (they can only be exact dupes — `dedup_exact`'s
    job). ``attribute_cols`` persists metadata columns beside each
    band row so ``query_dedup_index(member_filter=...)`` can
    pre-filter candidates AT THE SCAN (e.g. same-language near-dups
    only) — the `query_ivf_index(member_filter)` contract. The
    corpus text itself is NOT stored: at 100 TB the
    fingerprint store is ~|docs| x 8 bigint rows — the artifact
    that ships, while the corpus stays cold (the same
    codebooks-travel argument as the PQ store)."""
    spark = docs.sparkSession
    sigs = minhash_signatures(docs, n).localCheckpoint(eager=True)
    bands = minhash_band_buckets(sigs)
    if attribute_cols:
        bands = bands.join(
            docs.select("doc_id", *attribute_cols), "doc_id"
        )
    _write_dedup_stores(
        sigs, bands, n_buckets, f"{path}/bands", f"{path}/sigs"
    )
    store.swap_write(
        spark,
        spark.createDataFrame(
            [(n, n_buckets, NUM_HASHES, BAND_ROWS,
              list(attribute_cols or []))],
            _DEDUP_META_SCHEMA,
        ),
        f"{path}/meta",
    )


def _read_dedup_meta(spark, path: str) -> dict:
    return store.read_meta(spark, f"{path}/meta")


def append_dedup_index(
    spark, path: str, docs: DataFrame, *, batch_id: int | None = None
) -> int:
    """Fingerprint a new batch against the STORED parameters and land
    it as self-contained segments (`ingest_batch=N`, the Lucene/
    Milvus segment model shared with the other two stores): one pass
    over the batch, existing rows untouched. Replaying a batch id
    REPLACES its segments (idempotent ingest). Returns the batch id.

    Sigs land before bands, so a crash between the two writes leaves
    the batch invisible rather than candidate-generating without
    signatures; the re-run (same id) overwrites both."""
    md = _read_dedup_meta(spark, path)
    if batch_id is None:
        batch_id = store.next_batch_id(spark, f"{path}/bands_seg")
    sigs = minhash_signatures(docs, md["n"]).localCheckpoint(
        eager=True
    )
    bands = minhash_band_buckets(sigs)
    attrs = list(md.get("attribute_cols") or [])
    if attrs:
        bands = bands.join(docs.select("doc_id", *attrs), "doc_id")
    _write_dedup_stores(
        sigs,
        bands,
        md["n_buckets"],
        f"{path}/bands_seg/ingest_batch={int(batch_id)}",
        f"{path}/sigs_seg/ingest_batch={int(batch_id)}",
    )
    return int(batch_id)


def delete_from_dedup_index(spark, path: str, ids) -> None:
    """Tombstone doc ids (list or one-column DataFrame): queries stop
    reporting them immediately; their rows leave the stores at the
    next `compact_dedup_index`."""
    if isinstance(ids, DataFrame):
        t = ids.select(F.col(ids.columns[0]).alias("doc_id"))
    else:
        t = spark.createDataFrame(
            [(int(i),) for i in ids], "doc_id bigint"
        )
    t.write.mode("append").parquet(f"{path}/tombstones")


def _dedup_candidates(
    spark, path: str, qbands: DataFrame, *, member_filter=None
):
    """Candidate (qdoc, corpus_id) pairs from band-key equality —
    the probed-bucket partition filter + pushed sig0 predicate scan
    (exposed un-checkpointed so the plan pins can read it); None
    when the batch carries no fingerprints."""
    # ONE bounded driver fetch (r11 opt): the probed-bucket set and
    # the pushed sig0 set both derive from the same distinct
    # (bbucket, sig0) collect — the r11 shape paid two driver jobs
    probe = (
        qbands.select("bbucket", "sig0")
        .distinct()
        .limit(store.MAX_PUSHED_KEYS + 1)
        .collect()
    )
    if len(probe) > store.MAX_PUSHED_KEYS:
        buckets = [
            r["bbucket"]
            for r in qbands.select("bbucket").distinct().collect()
        ]
        sig0s = store.push_set(
            qbands.select("sig0").distinct(), "sig0"
        )
    else:
        buckets = sorted({r["bbucket"] for r in probe})
        sig0s = sorted({r["sig0"] for r in probe})
    if not buckets:
        return None
    base = spark.read.parquet(f"{path}/bands").filter(
        F.col("bbucket").isin(buckets)
    )
    seg = store.read_segments(spark, f"{path}/bands_seg")
    if seg is not None:
        base = base.unionByName(
            seg.filter(F.col("bbucket").isin(buckets))
        )
    if sig0s is not None:
        # store.in_set, not Column.isin: the batch's sig0 set runs to
        # thousands of keys and isin marshals one py4j literal per
        # key (measured ~5 s of pure driver time at this size — the
        # r11-opt profile's 12.9 s leg gap; OPTIMIZATION_r11.md)
        base = base.filter(store.in_set("sig0", sig0s))
    if member_filter is not None:
        # attribute pre-filter over the bands store's persisted
        # columns (build-time attribute_cols) — applied AT THE SCAN
        # (PushedFilters) before candidate generation, the exact
        # pre-filtering contract of query_ivf_index(member_filter)
        base = base.filter(
            F.expr(member_filter)
            if isinstance(member_filter, str)
            else member_filter
        )
    base = store.mask_tombstones(
        spark, f"{path}/tombstones", base, "doc_id"
    )
    return (
        base.join(
            F.broadcast(
                qbands.select(
                    F.col("doc_id").alias("qdoc"),
                    "band",
                    "sig0",
                    "sig1",
                )
            ),
            ["band", "sig0", "sig1"],
        )
        .filter(F.col("doc_id") != F.col("qdoc"))
        .select("qdoc", F.col("doc_id").alias("corpus_id"))
        .distinct()
    )


def query_dedup_index(
    spark,
    path: str,
    docs: DataFrame,
    *,
    threshold: float = 0.5,
    member_filter=None,
) -> DataFrame:
    """Near-dups of a batch against the persisted corpus:
    (doc_id, corpus_id, n_agree, est_jaccard) — batch doc, live
    corpus doc, minhash agreement count, estimated Jaccard >=
    ``threshold`` (granularity 1/num_hashes, the signature-only
    estimator: fixed-width work, no shingle re-join — the 100 TB
    verify path `minhash_sig_est_pairs` established).

    Scan discipline (the probed-cells/terms contract): the batch's
    band keys give a bounded bbucket set (STATIC partition filter)
    and a pushed ``sig0 IN (...)`` predicate (files are sig0-sorted,
    so row-group stats skip non-matching key runs); the surviving
    candidates' ids give the same treatment to the doc-keyed sigs
    store (sbucket partitions + pushed ids). Query cost therefore
    scales with the batch and its match volume, never the corpus.
    Segments are unioned in (searchable immediately), tombstoned
    corpus docs never match. Agreement counts DISTINCT h_idx, so
    the compact crash window that can briefly duplicate store rows
    cannot inflate the estimate. ``member_filter`` (a Column or
    SQL string over the bands store's columns — doc_id plus any
    build-time ``attribute_cols``) drops corpus rows BEFORE
    candidate generation; because verification is per-pair, the
    result equals post-filtering the unfiltered pairs on the same
    predicate, but the scan never reads excluded rows (parquet
    pushdown). The batch's band keys ride as a
    BROADCAST (|batch| x 4 fixed-width rows) — sized for ingest
    slices up to the low millions of docs; a batch at corpus scale
    is not an ingest slice, dedup it with the inline
    `minhash_sig_est_pairs` over the union (or chunk the batch)."""
    md = _read_dedup_meta(spark, path)
    n_buckets, nh = md["n_buckets"], md["num_hashes"]
    qsigs = minhash_signatures(docs, md["n"]).localCheckpoint(
        eager=True
    )
    # NO checkpoint of qbands (r12 opt, VERDICT r11 #8): it is a
    # cheap banding aggregate of the CHECKPOINTED qsigs, so its two
    # consumers (the bounded probe collect; the broadcast band join)
    # each re-derive it from qsigs' pinned blocks — the r11 eager
    # checkpoint was one redundant driver job per query batch
    qbands = minhash_band_buckets(qsigs).withColumn(
        "bbucket", _band_bucket(n_buckets)
    )
    cand = _dedup_candidates(
        spark, path, qbands, member_filter=member_filter
    )
    if cand is None:
        return spark.createDataFrame([], _DEDUP_PAIRS_SCHEMA)
    cand = cand.localCheckpoint(eager=True)  # reused: bucket fetch + join
    # one bounded driver fetch for the sigs-store probe too (r11
    # opt): (corpus_id, sbucket) pairs collected together
    sprobe = (
        cand.select(
            "corpus_id",
            _sig_bucket("corpus_id", n_buckets).alias("sb"),
        )
        .distinct()
        .limit(store.MAX_PUSHED_KEYS + 1)
        .collect()
    )
    if len(sprobe) > store.MAX_PUSHED_KEYS:
        sbuckets = [
            r["sb"]
            for r in cand.select(
                _sig_bucket("corpus_id", n_buckets).alias("sb")
            )
            .distinct()
            .collect()
        ]
        ids = store.push_set(
            cand.select("corpus_id").distinct(), "corpus_id"
        )
    else:
        sbuckets = sorted({r["sb"] for r in sprobe})
        ids = sorted({r["corpus_id"] for r in sprobe})
    if not sbuckets:
        return spark.createDataFrame([], _DEDUP_PAIRS_SCHEMA)
    ssrc = spark.read.parquet(f"{path}/sigs").filter(
        F.col("sbucket").isin(sbuckets)
    )
    sseg = store.read_segments(spark, f"{path}/sigs_seg")
    if sseg is not None:
        ssrc = ssrc.unionByName(
            sseg.filter(F.col("sbucket").isin(sbuckets))
        )
    if ids is not None:
        ssrc = ssrc.filter(store.in_set("doc_id", ids))
    return (
        cand.join(
            qsigs.select(
                F.col("doc_id").alias("qdoc"),
                "h_idx",
                F.col("minhash").alias("qm"),
            ),
            "qdoc",
        )
        .join(
            ssrc.select(
                F.col("doc_id").alias("corpus_id"),
                "h_idx",
                F.col("minhash").alias("cm"),
            ),
            ["corpus_id", "h_idx"],
        )
        .groupBy("qdoc", "corpus_id")
        .agg(
            F.countDistinct(
                F.when(F.col("qm") == F.col("cm"), F.col("h_idx"))
            ).alias("n_agree")
        )
        .withColumn("est_jaccard", F.col("n_agree") / F.lit(nh))
        .filter(F.col("est_jaccard") >= threshold)
        .select(
            F.col("qdoc").alias("doc_id"),
            "corpus_id",
            "n_agree",
            "est_jaccard",
        )
    )


def compact_dedup_index(spark, path: str) -> None:
    """Fold segments and tombstones into the base stores — only the
    AFFECTED hash-bucket partitions rewrite (dynamic partition
    overwrite via the shared `index_store.fold_partitions`; key
    sort preserved through every rewrite).

    Affected sets are O(delta): segment buckets come from the
    segments' own partition values (bounded distinct collects), and
    a tombstoned doc's band buckets are RECOMPUTED from its
    signatures in the doc-keyed sigs store (sbucket-pruned, id-
    pushed fetch) — the docvecs trick, because band rows are keyed
    by band-hash, not by doc. Crash ordering: bands fold -> bands
    segments removed -> sigs fold -> sigs segments removed ->
    tombstones last; a death at any point leaves every query
    correct (un-folded stores still union segments and anti-join
    tombstones; the brief duplicate-row window is neutralized by
    the query's DISTINCT-h_idx agreement) and a re-run converges.
    No write-ahead manifest is needed: there are no derived global
    statistics to go stale (the `compact_ivf_index` argument)."""
    md = _read_dedup_meta(spark, path)
    n_buckets = md["n_buckets"]
    bdir, sdir = f"{path}/bands", f"{path}/sigs"
    bseg_dir, sseg_dir = f"{path}/bands_seg", f"{path}/sigs_seg"
    tomb_dir = f"{path}/tombstones"
    tomb = store.read_tombstones(
        spark, tomb_dir, "doc_id", distinct=True
    )
    bseg = store.read_segments(spark, bseg_dir)
    sseg = store.read_segments(spark, sseg_dir)
    if tomb is None and bseg is None and sseg is None:
        return
    if tomb is not None:
        tomb = tomb.localCheckpoint(eager=True)
    t_sbuckets: set = set()
    if tomb is not None:
        t_sbuckets = {
            r["sb"]
            for r in tomb.select(
                _sig_bucket("doc_id", n_buckets).alias("sb")
            )
            .distinct()
            .collect()
        }
    aff_b: set = set()
    if bseg is not None:
        aff_b |= {
            r["bbucket"]
            for r in bseg.select("bbucket").distinct().collect()
        }
    if tomb is not None and t_sbuckets:
        tsigs = spark.read.parquet(sdir).filter(
            F.col("sbucket").isin(sorted(t_sbuckets))
        )
        ids = store.push_set(tomb, "doc_id")
        if ids is not None:
            tsigs = tsigs.filter(store.in_set("doc_id", ids))
        tsigs = tsigs.join(tomb, "doc_id")
        tbands = minhash_band_buckets(tsigs).withColumn(
            "bbucket", _band_bucket(n_buckets)
        )
        aff_b |= {
            r["bbucket"]
            for r in tbands.select("bbucket").distinct().collect()
        }
    if aff_b:
        base_b = spark.read.parquet(bdir).filter(
            F.col("bbucket").isin(sorted(aff_b))
        )
        live_b = (
            base_b if bseg is None else base_b.unionByName(bseg)
        )
        live_b = store.mask_tombstones(
            spark, tomb_dir, live_b, "doc_id"
        ).dropDuplicates(["doc_id", "band"])
        store.fold_partitions(
            spark,
            live_b,
            "bbucket",
            bdir,
            aff_b,
            order=("sig0", "sig1", "band", "doc_id"),
        )
    store.remove_dir(spark, bseg_dir)
    aff_s = set(t_sbuckets)
    if sseg is not None:
        aff_s |= {
            r["sbucket"]
            for r in sseg.select("sbucket").distinct().collect()
        }
    if aff_s:
        base_s = spark.read.parquet(sdir).filter(
            F.col("sbucket").isin(sorted(aff_s))
        )
        live_s = (
            base_s if sseg is None else base_s.unionByName(sseg)
        )
        live_s = store.mask_tombstones(
            spark, tomb_dir, live_s, "doc_id"
        ).dropDuplicates(["doc_id", "h_idx"])
        store.fold_partitions(
            spark,
            live_s,
            "sbucket",
            sdir,
            aff_s,
            order=("doc_id", "h_idx"),
        )
    store.remove_dir(spark, sseg_dir)
    store.remove_dir(spark, tomb_dir)


def describe_dedup_index(spark, path: str) -> DataFrame:
    """One-row gauge: (n_docs, n_segments, n_dead) — live
    fingerprinted docs (segments in, tombstones out), pending
    segment count, distinct tombstoned ids. The maintenance-debt
    check before a query load, like its text/IVF siblings."""
    md = _read_dedup_meta(spark, path)  # noqa: F841  (validates meta)
    sigs = spark.read.parquet(f"{path}/sigs")
    sseg = store.read_segments(spark, f"{path}/sigs_seg")
    if sseg is not None:
        sigs = sigs.unionByName(sseg)
    live = store.mask_tombstones(
        spark, f"{path}/tombstones", sigs, "doc_id"
    )
    n_docs = live.select("doc_id").distinct().count()
    n_segments = len(
        store.segment_batch_ids(spark, f"{path}/bands_seg")
    )
    tomb = store.read_tombstones(
        spark, f"{path}/tombstones", "doc_id", distinct=True
    )
    n_dead = 0 if tomb is None else tomb.count()
    return spark.createDataFrame(
        [(n_docs, n_segments, n_dead)],
        "n_docs bigint, n_segments int, n_dead bigint",
    )


def append_dedup_index_stream(stream_df: DataFrame, path: str):
    """Continuous ingestion into the persisted dedup-fingerprint
    index — the growing-segment half of the lifecycle, twin of
    ``append_text_index_stream`` / ``append_ivf_index_stream``.

    Each micro-batch lands as its own self-contained sigs+bands
    segment via ``append_dedup_index(batch_id=<micro-batch id>)``
    with mode=overwrite — a batch replayed after a crash between
    the sink write and the offset commit REPLACES its own segments
    instead of duplicating rows (effectively-once). Streamed docs
    are near-dup-searchable immediately; ``compact_dedup_index``
    periodically seals segments into the base stores.

    Returns the unstarted ``DataStreamWriter`` — callers pick the
    trigger/checkpointLocation and ``.start()`` it."""

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        append_dedup_index(
            batch_df.sparkSession,
            path,
            batch_df,
            batch_id=int(batch_id),
        )

    return stream_df.writeStream.foreachBatch(feed).outputMode(
        "append"
    )


def dedup_incremental_near(
    spark, path: str, incoming: DataFrame, *, threshold: float = 0.5
) -> DataFrame:
    """Incoming docs with NO near-dup in the persisted corpus — the
    ingest-filter primitive a crawl pipeline actually applies (keep
    only genuinely new content), the near-dup twin of the exact
    ``dedup_incremental``. One ``query_dedup_index`` pass, then a
    broadcast-size anti-join of the matched batch ids against the
    incoming rows (matched ids <= |incoming|). All incoming columns
    pass through. Docs too short to fingerprint survive (they can
    only be exact dupes — ``dedup_incremental``'s job; run both)."""
    matched = (
        query_dedup_index(
            spark, path, incoming, threshold=threshold
        )
        .select("doc_id")
        .distinct()
    )
    return incoming.join(matched, "doc_id", "left_anti")


def evaluate_dedup_index(
    spark,
    path: str,
    corpus_docs: DataFrame,
    batch: DataFrame,
    *,
    exact_threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Estimator quality report for the served dedup path — the
    `evaluate_ivf_index` of this store family: the operating-point
    picker an ops team runs before choosing a serving threshold.

    For every candidate threshold t in {0, 1/H, ..., 1} (H =
    num_hashes — the estimator's full granularity): how many
    candidate pairs the served estimate (`query_dedup_index` at
    threshold 0, i.e. ALL band candidates with their n_agree/H)
    would report at t, and the precision/recall of that decision
    against EXACT Jaccard >= ``exact_threshold`` computed over the
    same candidate pairs (`jaccard_verify` on the supplied raw
    text — the store keeps only fingerprints, so the evaluator,
    like any ground-truth pass, needs corpus access). LSH candidate
    recall (pairs the bands never surface) is a property of the
    build parameters, pinned separately; this evaluates the
    ESTIMATOR the serving path ranks by. Output one row per
    threshold: (threshold, n_pairs, n_true, tp, precision, recall),
    6dp, precision null at thresholds predicting zero pairs."""
    md = _read_dedup_meta(spark, path)
    nh = md["num_hashes"]
    est = query_dedup_index(
        spark, path, batch, threshold=0.0
    ).localCheckpoint(eager=True)  # feeds truth join + every t
    union = corpus_docs.select("doc_id", "text").unionByName(
        batch.select("doc_id", "text")
    )
    sh = hashed_shingle_sets(union, n).withColumnRenamed(
        "h", "shingle"
    )
    truth = jaccard_verify(
        est.select(
            F.col("doc_id").alias("doc_a"),
            F.col("corpus_id").alias("doc_b"),
        ),
        sh,
    ).select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("corpus_id"),
        (F.col("jaccard") >= exact_threshold).alias("is_true"),
    )
    scored = est.join(truth, ["doc_id", "corpus_id"], "left").select(
        "est_jaccard", F.coalesce("is_true", F.lit(False)).alias("is_true")
    )
    sweep = scored.select(
        "est_jaccard",
        "is_true",
        F.explode(
            F.sequence(F.lit(0), F.lit(nh))
        ).alias("step"),
    ).withColumn("threshold", F.col("step") / F.lit(nh))
    pred = F.col("est_jaccard") >= F.col("threshold")
    return (
        sweep.groupBy("threshold")
        .agg(
            F.sum(F.when(pred, 1).otherwise(0)).alias("n_pairs"),
            F.sum(F.when(F.col("is_true"), 1).otherwise(0)).alias(
                "n_true"
            ),
            F.sum(
                F.when(pred & F.col("is_true"), 1).otherwise(0)
            ).alias("tp"),
        )
        .select(
            F.round("threshold", 6).alias("threshold"),
            "n_pairs",
            "n_true",
            "tp",
            F.round(
                F.when(
                    F.col("n_pairs") > 0,
                    F.col("tp") / F.col("n_pairs"),
                ),
                6,
            ).alias("precision"),
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("tp") / F.col("n_true"),
                ).otherwise(1.0),
                6,
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


def tune_dedup_threshold(
    spark,
    path: str,
    corpus_docs: DataFrame,
    batch: DataFrame,
    target_precision: float,
    *,
    exact_threshold: float = 0.5,
    n: int = 3,
) -> dict:
    """Pick the LOWEST serving threshold whose precision clears a
    bar — the operating-point decision `evaluate_dedup_index`
    informs, made executable (the `tune_nprobe` of this family).

    Near-dup screening trades precision against recall monotonically
    in the threshold: raising it can only drop predicted pairs, so
    the lowest clearing point keeps the most recall at the required
    precision. One `evaluate_dedup_index` sweep (one candidate pass
    + one exact-Jaccard pass over candidates — the dominant costs),
    then a driver-side scan of its <= num_hashes+1 rows. Returns
    ``{"threshold": float | None, "precision": float, "recall":
    float, "swept": [(threshold, precision, recall), ...]}`` —
    ``threshold=None`` (with the t=1.0 row reported) means even
    requiring all hashes to agree cannot clear the bar on this
    sample. A threshold predicting ZERO pairs (null precision)
    vacuously satisfies any bar only if no lower point does;
    such a point is returned with precision reported as 1.0."""
    rep = evaluate_dedup_index(
        spark,
        path,
        corpus_docs,
        batch,
        exact_threshold=exact_threshold,
        n=n,
    ).collect()
    swept = [
        (
            r.threshold,
            1.0 if r.precision is None else r.precision,
            r.recall,
        )
        for r in sorted(rep, key=lambda r: r.threshold)
    ]
    for t, p, rec in swept:
        if p >= target_precision:
            return {
                "threshold": t,
                "precision": p,
                "recall": rec,
                "swept": swept,
            }
    t, p, rec = swept[-1]
    return {
        "threshold": None,
        "precision": p,
        "recall": rec,
        "swept": swept,
    }
