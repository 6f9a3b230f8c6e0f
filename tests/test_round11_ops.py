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


# ------------------------------------------------------- r11 second wave
@pytest.mark.parametrize(
    "name",
    [
        "corpus_shard_source_balance",
        "events_user_activity_gini",
        "text_hapax_ratio",
    ],
)
def test_r11_second_wave_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_shard_balance_deviations_sum_to_zero(spark, sf_dir):
    """Law: per shard (and per source), Σ deviation_x = 0 — the
    observed counts and the marginal-product expectations share the
    same totals by construction; a nonzero sum means a marginal was
    joined against the wrong frame."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.plans import REGISTRY

    df = REGISTRY["corpus_shard_source_balance"].builder(spark, sf_dir)
    df = df.localCheckpoint(eager=True)  # two folds over one build
    for key in ("shard", "source"):
        sums = df.groupBy(key).agg(F.sum("deviation_x").alias("s"))
        assert all(r["s"] == 0 for r in sums.collect()), key
    # the completed grid covers every (shard, source) pair
    n_shards = df.select("shard").distinct().count()
    n_sources = df.select("source").distinct().count()
    assert df.count() == n_shards * n_sources


def test_gini_bounds_and_known_values(spark):
    """Gini = 0 for perfectly equal activity; → (n-1)/n for one user
    holding everything. Computed through the registered builder's
    operator path on crafted events."""
    import datetime

    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.rank import with_global_rank

    def gini(counts):
        rows = [
            (i, datetime.datetime(2024, 1, 1), u, "click", 1.0, "{}")
            for i, u in enumerate(
                [u for u, n in enumerate(counts) for _ in range(n)]
            )
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        per_user = df.groupBy("user_id").agg(F.count("*").alias("n_events"))
        ranked, _ = with_global_rank(per_user, ["n_events", "user_id"])
        row = ranked.agg(
            F.count("*").alias("n"), F.sum("n_events").alias("t"),
            F.sum(F.col("rank") * F.col("n_events")).alias("s1"),
        ).collect()[0]
        return ((2 * row["s1"] - (row["n"] + 1) * row["t"]) * 1_000_000) // (
            row["n"] * row["t"]
        )

    assert gini([5, 5, 5, 5]) == 0
    # one user owns all events among 4 users with >=1 event each is not
    # constructible (count>=1 per present user); extreme skew instead:
    g = gini([1, 1, 1, 97])
    assert 700_000 < g < 750_000  # analytic: (2*(1+2+3+4*97)-5*100)/400
