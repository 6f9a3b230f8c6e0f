"""Round-13 operator laws: the auto-salt skew probe for the flagship
statement aggregation (VERDICT r12 next-round #5)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hot_key_statements(spark, n=100_000):
    # one (celebrity, p0) key owns ~20% of ALL rows — the share the
    # sampled probe must detect; the rest is uniform across 400
    # entities x 4 props
    return spark.range(n).select(
        F.when(F.col("id") % 5 == 0, F.lit("celebrity"))
        .otherwise(F.concat(F.lit("e"), (F.col("id") % 400).cast("string")))
        .alias("canonical_id"),
        F.when(F.col("id") % 5 == 0, F.lit("p0"))
        .otherwise(
            F.concat(F.lit("p"), (F.col("id") % 4).cast("string"))
        )
        .alias("prop"),
        F.concat(F.lit("v"), (F.col("id") % (n // 2)).cast("string")).alias(
            "value"
        ),
        F.concat(F.lit("ds"), (F.col("id") % 7).cast("string")).alias(
            "dataset"
        ),
        F.lit("Person").alias("schema"),
    )


def _uniform_statements(spark, n=100_000):
    return spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 2000).cast("string")).alias(
            "canonical_id"
        ),
        F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("prop"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("value"),
        F.concat(F.lit("ds"), (F.col("id") % 7).cast("string")).alias(
            "dataset"
        ),
        F.lit("Company").alias("schema"),
    )


def test_auto_salt_probe_detects_planted_skew(spark):
    """The sampled probe flags the 20%-share celebrity key and stays
    quiet on a uniform corpus (hottest key share 1/8000)."""
    from ftm_datalake_spark.operators.statements import (
        AUTO_SALT_BUCKETS,
        _auto_salt_buckets,
    )

    assert (
        _auto_salt_buckets(_hot_key_statements(spark)) == AUTO_SALT_BUCKETS
    )
    assert _auto_salt_buckets(_uniform_statements(spark)) is None


def test_auto_salt_probe_tiny_corpus_recounts_full(spark):
    """A corpus whose 1% sample cannot resolve the threshold must be
    probed in full, not guessed: 300 rows, 50% on one key — the probe
    still salts even though the sample holds ~3 rows."""
    from ftm_datalake_spark.operators.statements import (
        AUTO_SALT_BUCKETS,
        _auto_salt_buckets,
    )

    stmts = spark.range(300).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("e"), F.col("id").cast("string")))
        .alias("canonical_id"),
        F.lit("p0").alias("prop"),
        F.col("id").cast("string").alias("value"),
        F.lit("ds").alias("dataset"),
        F.lit("Person").alias("schema"),
    )
    assert _auto_salt_buckets(stmts) == AUTO_SALT_BUCKETS


def test_auto_mode_picks_salted_path_and_stays_bit_identical(spark):
    """On planted skew, auto selects the two-phase plan (salt column in
    the lineage); the output is bit-identical to the unsalted plan."""
    from ftm_datalake_spark.operators.statements import aggregate_statements

    stmts = _hot_key_statements(spark, n=20_000)
    auto_df = aggregate_statements(stmts, salt_buckets="auto")
    plan = auto_df._jdf.queryExecution().analyzed().toString()
    assert "__salt" in plan and "__pvals" in plan
    assert (
        auto_df.orderBy("id").collect()
        == aggregate_statements(stmts).orderBy("id").collect()
    )


def test_auto_mode_uniform_keeps_single_phase_plan(spark):
    """No skew -> auto must NOT pay the extra shuffle: the plan is the
    unsalted one (no salt column anywhere in the lineage) and output
    matches exactly."""
    from ftm_datalake_spark.operators.statements import aggregate_statements

    stmts = _uniform_statements(spark, n=20_000)
    auto_df = aggregate_statements(stmts, salt_buckets="auto")
    plan = auto_df._jdf.queryExecution().analyzed().toString()
    assert "__salt" not in plan
    assert (
        auto_df.orderBy("id").collect()
        == aggregate_statements(stmts).orderBy("id").collect()
    )
