"""Unit properties for the round-6 iterative operators: weighted SSSP
(operators/sssp.py), k-core peeling (operators/kcore.py), and exact
power iteration (operators/pca.py) — hand-built graphs/matrices with
known answers, plus the convergence-within-budget assertions the
registry queries rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.kcore import kcore
from ftm_datalake_spark.operators.pca import exact_floor_div, power_iteration_top
from ftm_datalake_spark.operators.sssp import bellman_ford


def _edges(spark, rows):
    """Directed weighted edge list from (src, dst, w) tuples."""
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _undirected(spark, pairs):
    """Both directions of each undirected (a, b) pair, unweighted."""
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


# ---------------------------------------------------------------- SSSP


def test_sssp_prefers_cheap_two_hop_over_direct(spark):
    # 0→2 direct costs 10; 0→1→2 costs 3. Bellman–Ford must take the
    # cheaper two-edge path once rounds ≥ 2.
    e = _edges(spark, [(0, 2, 10), (0, 1, 1), (1, 2, 2)])
    got = {r["node"]: r["dist"] for r in bellman_ford(e, seed=0, rounds=2).collect()}
    assert got == {0: 0, 1: 1, 2: 3}


def test_sssp_round_bound_limits_path_length(spark):
    # Chain 0→1→2→3 (weight 1 each): after 2 rounds node 3 is absent.
    e = _edges(spark, [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r["node"]: r["dist"] for r in bellman_ford(e, seed=0, rounds=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    full = {r["node"]: r["dist"] for r in bellman_ford(e, seed=0, rounds=3).collect()}
    assert full[3] == 3


def test_sssp_parallel_edges_take_min(spark):
    e = _edges(spark, [(0, 1, 7), (0, 1, 4)])
    got = {r["node"]: r["dist"] for r in bellman_ford(e, seed=0, rounds=1).collect()}
    assert got == {0: 0, 1: 4}


def test_sssp_unreachable_component_absent(spark):
    e = _edges(spark, [(0, 1, 1), (5, 6, 1)])
    nodes = {r["node"] for r in bellman_ford(e, seed=0, rounds=4).collect()}
    assert nodes == {0, 1}


# -------------------------------------------------------------- k-core


def test_kcore_clique_survives_pendants_peel(spark):
    # K4 on {0,1,2,3} plus pendant 9 hanging off node 0. At k=3 the
    # pendant peels in round 1; node 0's degree then drops to 3, which
    # still meets the bar — the clique is the 3-core.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _undirected(spark, k4 + [(0, 9)])
    got = {r["node"]: r["deg"] for r in kcore(e, k=3, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_chain_fully_peels(spark):
    # A path graph has max degree 2 → the 3-core is empty, and the
    # fixed budget reaches the fixpoint (empty survives extra rounds).
    e = _undirected(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert kcore(e, k=3, rounds=2).count() == 0
    assert kcore(e, k=3, rounds=4).count() == 0


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    # Chain 9-8-K4: after peeling leaf 9 (deg 1 < 2), node 8 drops to
    # deg 1 and peels next round — a 2-step cascade at k=2.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = _undirected(spark, k4 + [(0, 8), (8, 9)])
    one = {r["node"] for r in kcore(e, k=2, rounds=1).collect()}
    assert 8 in one  # not yet peeled after a single round
    two = {r["node"] for r in kcore(e, k=2, rounds=2).collect()}
    assert two == {0, 1, 2, 3}


def test_kcore_query_graph_converges_within_budget(spark, sf_dir):
    """The registry query's 3-round budget reaches the fixpoint on its
    own graph: a 4th peel removes nothing."""
    from ftm_datalake_spark.plans.graph_ops import _KCORE_K, _KCORE_ROUNDS

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).cast("long").alias("a"),
            (F.col("o_custkey") * 2 + 1).cast("long").alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    at_budget = kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    one_more = kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS + 1)
    assert at_budget.exceptAll(one_more).count() == 0
    assert one_more.exceptAll(at_budget).count() == 0


def test_sssp_query_graph_converges_within_budget(spark, sf_dir):
    """graph_weighted_sssp's 4-round budget is the fixpoint on the
    nation trade graph (25 nodes, near-complete): round 5 changes no
    distance."""
    from ftm_datalake_spark.plans.graph_ops import graph_weighted_sssp

    got = graph_weighted_sssp(spark, sf_dir).collect()
    # Rebuild the same edges and run one extra round.
    from ftm_datalake_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").cast("long").alias("u"),
            F.greatest("c_nationkey", "s_nationkey").cast("long").alias("v"),
        )
        .agg(F.round(F.min("l_extendedprice") * 100).cast("long").alias("w"))
    )
    edges = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    extra = bellman_ford(edges, seed=0, rounds=5).orderBy("node").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in extra]


# ----------------------------------------------------- power iteration


@pytest.mark.parametrize(
    "a,b",
    [
        (7, 3),
        (-7, 3),
        (0, 5),
        (2**62, 1024),
        (-(2**62) - 12345, 1024),
        (10**18 + 7, 999),
        (-(10**18) - 7, 999),
    ],
)
def test_exact_floor_div_matches_python(spark, a, b):
    row = (
        spark.range(1)
        .select(
            exact_floor_div(
                F.lit(a).cast("long"), F.lit(b).cast("long")
            ).alias("q")
        )
        .first()
    )
    assert row["q"] == a // b  # Python // IS floor division


def test_power_iteration_finds_dominant_axis(spark):
    # Corpus with variance concentrated on dim 0: v' = X^T(Xv) must end
    # up dominated by dim 0 after renormalization.
    rows = [([float(100 + i), 1.0, -1.0, 0.5],) for i in range(8)]
    rows += [([float(-100 - i), -1.0, 1.0, -0.5],) for i in range(8)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {
        r["dim_idx"]: r["v"]
        for r in power_iteration_top(df, dims=4, steps=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert abs(out[1]) > 10 * max(abs(out[2]), abs(out[3]), abs(out[4]))


def test_power_iteration_partitioning_invariant(spark):
    rows = [([float(i % 5), float(i % 3), 1.0],) for i in range(30)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    one = power_iteration_top(df.coalesce(1), dims=3, steps=2).collect()
    many = power_iteration_top(df.repartition(7), dims=3, steps=2).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
