"""Graph-operator semantics on known graphs + scale-shape checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators import graph as g


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; appending a pendant edge adds none
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    assert (
        g.triangle_count(_edges(spark, k4)).collect()[0]["n_triangles"] == 4
    )
    assert (
        g.triangle_count(_edges(spark, k4 + [(3, 9)]))
        .collect()[0]["n_triangles"]
        == 4
    )


def test_degree_counts(spark):
    deg = {
        r["node"]: r["degree"]
        for r in g.degree_counts(
            _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
        ).collect()
    }
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


def test_pagerank_sums_to_one_and_ranks_hub_highest(spark):
    # star graph: hub 0 connected to 1..5 — hub must rank highest
    star = [(0, i) for i in range(1, 6)]
    ranks = {
        r["node"]: r["rank"]
        for r in g.pagerank(_edges(spark, star), iters=5).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-4  # rank mass conserved
    assert ranks[0] == max(ranks.values())
    leaf_ranks = {v for k, v in ranks.items() if k != 0}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_pagerank_partition_independent(spark):
    ring = [(i, (i + 1) % 8) for i in range(8)]
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in ring], "src long, dst long"
    )
    r1 = {
        (r["node"], r["rank"])
        for r in g.pagerank(df.repartition(1), iters=3).collect()
    }
    r7 = {
        (r["node"], r["rank"])
        for r in g.pagerank(df.repartition(7), iters=3).collect()
    }
    assert r1 == r7


def test_cooccurrence_group_cap(spark):
    import datetime as dt

    rows = [
        (i, i % 30, dt.datetime(2024, 1, 1 + (i % 2)), "view", 1.0)
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    # 30 is even, so user u (= i % 30) always lands on day 1 + u % 2:
    # two disjoint (view, day) groups of 15 users each. Oversized
    # groups are hash-threshold SAMPLED toward the cap (expected
    # size = cap, binomial tails), never dropped wholesale.
    full = {
        (r.src, r.dst)
        for r in g.cooccurrence_edges(ev, max_group=200).collect()
    }
    assert len(full) == 2 * 15 * 14 / 2  # in-cap groups: exact identity
    capped = {
        (r.src, r.dst)
        for r in g.cooccurrence_edges(ev, max_group=10).collect()
    }
    # sampled graph: nonempty, strictly smaller, and a subset
    assert 0 < len(capped) < len(full)
    assert capped <= full
    # determinism: same result on every evaluation
    again = {
        (r.src, r.dst)
        for r in g.cooccurrence_edges(ev, max_group=10).collect()
    }
    assert again == capped


def test_bfs_depths_path_graph(spark):
    # path 1-2-3-4-5-6: from source 1, 3 rounds reach distance <= 3
    path = [(i, i + 1) for i in range(1, 6)]
    got = {
        r["node"]: r["dist"]
        for r in g.bfs_depths(_edges(spark, path), rounds=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5,6 unreached in 3 hops


def test_bfs_depths_min_combine_shortcut(spark):
    # two routes to node 4: 1-2-3-4 and 1-4 — min distance wins
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    got = {
        r["node"]: r["dist"]
        for r in g.bfs_depths(_edges(spark, edges), rounds=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 1}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_converged_equals_fixed_rounds(spark):
    # Star graph. Error contracts ~ damping^k, so the 8-dp fixpoint
    # needs ~log_d(1e-8) rounds — damping 0.25 converges in ~14,
    # keeping the test fast (0.85 would need ~113). Early stop must
    # fire, and running MORE fixed rounds past the fixpoint must not
    # change the result (VERDICT r2 ask #6).
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3)])
    conv, rounds_run = g.pagerank_converged(
        e, max_rounds=25, damping=0.25
    )
    assert rounds_run < 25
    fixed = g.pagerank(e, iters=rounds_run + 3, damping=0.25)
    got = {(r.node, r.rank) for r in conv.collect()}
    want = {(r.node, r.rank) for r in fixed.collect()}
    assert got == want


def test_pagerank_converged_early_exit_on_preconverged_graph(spark):
    # 4-cycle: every node has degree 2, so the uniform start IS the
    # fixpoint — the loop must exit after a single probe round
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    conv, rounds_run = g.pagerank_converged(e, max_rounds=20)
    assert rounds_run == 1
    ranks = {r.node: r.rank for r in conv.collect()}
    assert ranks == {1: 0.25, 2: 0.25, 3: 0.25, 4: 0.25}


def test_bfs_converged_stops_at_diameter(spark):
    # Path graph 1-2-3-4-5: diameter 4 from source 1; budget 50 must
    # stop right after the last level stabilizes, not run 50 rounds
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    dist, rounds_run = g.bfs_depths_converged(e, max_rounds=50)
    assert {(r.node, r.dist) for r in dist.collect()} == {
        (1, 0), (2, 1), (3, 2), (4, 3), (5, 4)
    }
    assert rounds_run == 5  # 4 productive relaxations + 1 fixpoint probe
    fixed = g.bfs_depths(e, rounds=50)
    assert {(r.node, r.dist) for r in fixed.collect()} == {
        (r.node, r.dist) for r in dist.collect()
    }
