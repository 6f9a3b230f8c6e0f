from __future__ import annotations


def test_connected_components_known_graph(spark):
    from ftm_datalake_spark.operators.components import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_raises_when_not_converged(spark):
    import pytest

    from ftm_datalake_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=2)


def test_components_long_chain_converges(spark):
    from ftm_datalake_spark.operators.components import connected_components

    n = 40  # diameter 40 chain: exercises multi-round convergence
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = connected_components(edges, max_iterations=50).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n + 1


def test_star_components_known_graph(spark):
    from ftm_datalake_spark.operators.components import connected_components_star

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_star_components_log_round_convergence(spark):
    """A 64-node chain (diameter 64) converges in O(log n) rounds — the
    property plain min-label propagation lacks (it needs ~63)."""
    from ftm_datalake_spark.operators.components import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    labels, rounds = connected_components_star(
        edges, max_iterations=25, return_rounds=True
    )
    got = labels.collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 65
    assert rounds <= 12, f"expected log-round convergence, took {rounds}"


def test_star_components_matches_propagation_random(spark):
    """Star and propagation algorithms agree on a seeded random graph."""
    import random

    from ftm_datalake_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    pairs = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    prop = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iterations=60).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components_star(edges).collect()
    }
    assert star == prop


def test_pagerank_fixed_symmetry_and_centrality(spark):
    from ftm_datalake_spark.operators.pagerank import SCALE, pagerank_fixed

    # symmetric pair: identical ranks by symmetry
    pair = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.pr for r in pagerank_fixed(pair, 5).collect()}
    assert got["a"] == got["b"] > 0

    # symmetrized star: the hub out-ranks every leaf
    leaves = [f"l{i}" for i in range(4)]
    star = spark.createDataFrame(
        [("hub", l) for l in leaves] + [(l, "hub") for l in leaves],
        "src string, dst string",
    )
    ranks = {r.node: r.pr for r in pagerank_fixed(star, 5).collect()}
    assert all(ranks["hub"] > ranks[l] for l in leaves)
    # ranks stay in sane fixed-point range (positive, below total mass)
    assert all(0 < v < SCALE for v in ranks.values())

    # determinism under repartitioning
    ranks2 = {
        r.node: r.pr for r in pagerank_fixed(star.repartition(5), 5).collect()
    }
    assert ranks == ranks2
