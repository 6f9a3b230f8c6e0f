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
