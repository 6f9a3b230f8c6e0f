"""Round-12 operator laws: the skew-salted flagship aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted_skew_statements(spark, n=20_000):
    # one celebrity entity owns 20% of statements; values mostly
    # distinct (the collect_set worst case), with some duplicates so
    # the idempotence of the two-phase union is actually exercised
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit("celebrity"))
        .otherwise(F.concat(F.lit("e"), (F.col("id") % 400).cast("string")))
        .alias("canonical_id"),
        F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("prop"),
        F.concat(F.lit("v"), (F.col("id") % (n // 2)).cast("string")).alias(
            "value"
        ),
        F.concat(F.lit("ds"), (F.col("id") % 7).cast("string")).alias(
            "dataset"
        ),
        F.when(F.col("id") % 3 == 0, F.lit("Person"))
        .otherwise(F.lit("Company"))
        .alias("schema"),
    )


def test_salted_aggregation_is_bit_identical(spark):
    """Set union is associative/commutative/idempotent, so the salted
    two-phase plan must produce byte-identical entities to the
    single-phase plan — on planted celebrity skew, for several salt
    widths including salt=1 (degenerate) and salt > distinct values."""
    from ftm_datalake_spark.operators.statements import aggregate_statements

    stmts = _planted_skew_statements(spark)
    base = aggregate_statements(stmts).orderBy("id").collect()
    # celebrity + the 320 entity slots not shadowed by it (ids ≡ 0
    # mod 5 all map to the celebrity, emptying every 5th of e0..e399)
    assert len(base) == 321
    for salt in (1, 7, 32, 100_000):
        salted = (
            aggregate_statements(stmts, salt_buckets=salt)
            .orderBy("id")
            .collect()
        )
        assert salted == base, f"salt_buckets={salt} diverged"


def test_salted_plan_has_two_phase_shape(spark):
    """The salted plan must actually split the union: two hash
    aggregations over the statement frame's lineage keyed with and
    then without the salt column — visible as the partial-collect
    alias in the analyzed plan."""
    from ftm_datalake_spark.operators.statements import aggregate_statements

    stmts = _planted_skew_statements(spark)
    plan = (
        aggregate_statements(stmts, salt_buckets=32)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "__salt" in plan and "__pvals" in plan
    unsalted = (
        aggregate_statements(stmts)._jdf.queryExecution().analyzed().toString()
    )
    assert "__salt" not in unsalted


def test_registry_salted_twin_matches_flagship(spark, sf_dir):
    """statement_aggregation_salted shares the flagship's oracle; the
    two registry plans must agree row-for-row on the driver tables."""
    from ftm_datalake_spark.plans import REGISTRY

    a = (
        REGISTRY["statement_aggregation"]
        .builder(spark, sf_dir)
        .collect()
    )
    b = (
        REGISTRY["statement_aggregation_salted"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert a == b


# ---------------------------------------------------------------- skyline_kd
def _brute_force_skyline(rows, k_max, k_min):
    """Quadratic reference: strict Pareto dominance over dicts."""
    dims = [(c, True) for c in k_max] + [(c, False) for c in k_min]

    def dominates(q, p):
        ge = all(
            (q[c] >= p[c]) if mx else (q[c] <= p[c]) for c, mx in dims
        )
        gt = any((q[c] > p[c]) if mx else (q[c] < p[c]) for c, mx in dims)
        return ge and gt

    pts = {tuple(r[c] for c, _ in dims) for r in rows}
    pts = [dict(zip([c for c, _ in dims], t)) for t in pts]
    sky = [
        p for p in pts if not any(dominates(q, p) for q in pts if q != p)
    ]
    out = {}
    for r in rows:
        key = tuple(r[c] for c, _ in dims)
        if any(all(p[c] == r[c] for c, _ in dims) for p in sky):
            out[key] = out.get(key, 0) + 1
    return out


def test_skyline_kd_matches_brute_force_adversarial(spark):
    """4-D frontier on adversarial data: duplicated frontier points,
    full-tie clusters, anti-correlated staircases, and a dimension
    where everything ties (degenerate)."""
    import random

    from ftm_datalake_spark.operators.skyline import skyline_kd

    rng = random.Random(12)
    rows = []
    # anti-correlated staircase (classic worst case: big frontier)
    for i in range(40):
        rows.append({"a": i, "b": 40 - i, "c": (i * 7) % 11, "d": 5})
    # random cloud + exact duplicates
    for _ in range(300):
        r = {
            "a": rng.randint(0, 8),
            "b": rng.randint(0, 8),
            "c": rng.randint(0, 8),
            "d": rng.randint(0, 3),
        }
        rows.append(r)
        if rng.random() < 0.3:
            rows.append(dict(r))  # duplicate: must count, not dominate
    df = spark.createDataFrame(
        [(r["a"], r["b"], r["c"], r["d"]) for r in rows],
        "a long, b long, c long, d long",
    )
    got = {
        (r["a"], r["frontier_b"], r["frontier_c"], r["frontier_d"]): r[
            "n_rows"
        ]
        for r in skyline_kd(
            df, max_cols=["a"], min_cols=["b", "c", "d"]
        ).collect()
    }
    want = _brute_force_skyline(rows, ["a"], ["b", "c", "d"])
    assert got == want

    # two-max/two-min direction mix
    got2 = {
        (r["a"], r["b"], r["frontier_c"], r["frontier_d"]): r["n_rows"]
        for r in skyline_kd(
            df, max_cols=["a", "b"], min_cols=["c", "d"]
        ).collect()
    }
    want2 = _brute_force_skyline(rows, ["a", "b"], ["c", "d"])
    assert got2 == want2


def test_skyline_kd_reduces_to_3d(spark):
    """skyline_kd(1 max, 2 min) must agree with the dedicated 3-D
    staircase implementation on the same frame."""
    from ftm_datalake_spark.operators.skyline import skyline_3d, skyline_kd

    df = spark.range(500).select(
        (F.col("id") % 13).alias("a"),
        (F.col("id") % 7).alias("b"),
        ((F.col("id") * 3) % 17).alias("c"),
    )
    via_kd = {
        (r["a"], r["frontier_b"], r["frontier_c"]): r["n_rows"]
        for r in skyline_kd(df, ["a"], ["b", "c"]).collect()
    }
    via_3d = {
        (r["a"], r["frontier_b"], r["frontier_c"]): r["n_rows"]
        for r in skyline_3d(df, "a", "b", "c").collect()
    }
    assert via_kd == via_3d
