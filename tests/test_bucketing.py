"""Bucketed co-located join: correctness + the no-Exchange plan property.

Uses the shared session (stopping a module-local session would kill the
suite-wide JVM); broadcast/AQE are disabled via runtime confs and
restored, so the no-Exchange property is attributable to bucketing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def smj_conf(spark):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_no_shuffle(smj_conf, tmp_path):
    from ftm_datalake_spark.operators.bucketing import (
        co_located_join,
        plan_has_no_shuffle,
        write_bucketed,
    )

    spark = smj_conf
    spark.sql("DROP TABLE IF EXISTS b_stmts")
    spark.sql("DROP TABLE IF EXISTS b_ents")

    stmts = spark.range(10_000).select(
        (F.col("id") % 500).cast("string").alias("canonical_id"),
        F.col("id").alias("stmt_id"),
    )
    ents = spark.range(500).select(
        F.col("id").cast("string").alias("canonical_id"),
        F.concat(F.lit("E"), F.col("id")).alias("label"),
    )
    write_bucketed(stmts, "b_stmts", ["canonical_id"], num_buckets=4)
    write_bucketed(ents, "b_ents", ["canonical_id"], num_buckets=4)
    try:
        joined = co_located_join(spark, "b_stmts", "b_ents", ["canonical_id"])
        assert plan_has_no_shuffle(joined), (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert joined.count() == 10_000

        # sanity: the same join on unbucketed frames DOES shuffle
        plain = stmts.join(ents, "canonical_id")
        assert not plan_has_no_shuffle(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_stmts")
        spark.sql("DROP TABLE IF EXISTS b_ents")
