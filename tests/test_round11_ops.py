"""Round-11 operator additions: the 3-D skyline (iterated dominance
over collapsed candidate frames) — oracle parity at two scales plus a
brute-force dominance law on adversarial data."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.oracle_utils import compare_query


def test_part_skyline_3d_matches_oracle(spark, sf_dir):
    compare_query(spark, sf_dir, "part_skyline_3d")


def _brute_skyline_3d(rows):
    """O(n^2) reference: maximize a, minimize b, minimize c."""
    sky = set()
    for p in set(rows):
        dominated = any(
            q[0] >= p[0] and q[1] <= p[1] and q[2] <= p[2]
            and (q[0] > p[0] or q[1] < p[1] or q[2] < p[2])
            for q in set(rows)
        )
        if not dominated:
            sky.add(p)
    out = {}
    for r in rows:
        if r in sky:
            out[r] = out.get(r, 0) + 1
    return out


@pytest.mark.parametrize("seed", [7, 41])
def test_skyline_3d_equals_bruteforce_on_adversarial_data(spark, seed):
    """Random quantized data with heavy ties across all three
    dimensions (the tie handling is where staircase sweeps usually go
    wrong: full ties are mutually non-dominating and ALL belong)."""
    from ftm_datalake_spark.operators.skyline import skyline_3d

    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 8), rng.randint(0, 6), rng.randint(0, 6))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r["a"], r["frontier_b"], r["frontier_c"]): r["n_rows"]
        for r in skyline_3d(df, "a", "b", "c").collect()
    }
    assert got == _brute_skyline_3d(rows)


def test_skyline_3d_plan_shape(spark, sf_dir):
    """No cartesian, no single-partition exchange; exactly the one
    bounded staircase-strata BNLJ (broadcast side = the distinct
    MAX-dimension frame)."""
    from ftm_datalake_spark.plans import REGISTRY

    plan = (
        REGISTRY["part_skyline_3d"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_skyline_3d_degenerate_third_dim_matches_2d(spark):
    """Law: with a CONSTANT third dimension, the 3-D frontier must
    coincide with the 2-D frontier (the extra dimension can neither
    add nor remove dominance)."""
    from ftm_datalake_spark.operators.skyline import skyline_2d, skyline_3d

    rng = random.Random(3)
    rows = [(rng.randint(0, 10), rng.randint(0, 10)) for _ in range(300)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "c", F.lit(5).cast("long")
    )
    sky2 = {
        (r["a"], r["frontier_b"]): r["n_rows"]
        for r in skyline_2d(df.select("a", "b"), "a", "b").collect()
    }
    sky3 = {
        (r["a"], r["frontier_b"]): r["n_rows"]
        for r in skyline_3d(df, "a", "b", "c").collect()
    }
    assert sky3 == sky2
