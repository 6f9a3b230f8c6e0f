"""Unit tests for degree-ordered triangle enumeration."""

from __future__ import annotations

from itertools import combinations

from ftm_datalake_spark.operators.triangles import triangles


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "u long, v long"
    ).distinct()


def test_k4_has_four_triangles_each_once(spark):
    k4 = _edges(spark, combinations(range(4), 2))
    out = sorted(tuple(r) for r in triangles(k4).collect())
    assert out == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_path_and_star_have_no_triangles(spark):
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    star = _edges(spark, [(0, i) for i in range(1, 6)])
    assert triangles(path).count() == 0
    assert triangles(star).count() == 0


def test_skewed_hub_graph_counts_match_naive(spark):
    # hub 0 connected to all; ring among 1..6 — triangles = ring edges
    # whose endpoints both touch the hub
    ring = [(i, i % 6 + 1) for i in range(1, 7)]
    pairs = [(0, i) for i in range(1, 7)] + ring
    out = sorted(tuple(r) for r in triangles(_edges(spark, pairs)).collect())
    expected = sorted(tuple(sorted((0, u, v))) for u, v in ring)
    assert out == expected


# ------------------------------------------------------------------- BFS
def test_bfs_chain_respects_depth_bound(spark):
    from ftm_datalake_spark.operators.bfs import bfs_distances

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in bfs_distances(chain, 0, max_depth=4).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # nodes beyond depth 4 absent


def test_bfs_takes_shortest_of_two_paths(spark):
    from ftm_datalake_spark.operators.bfs import bfs_distances

    # 0→1→2→3 and shortcut 0→3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in bfs_distances(edges, 0, max_depth=4).collect()}
    assert out[3] == 1
