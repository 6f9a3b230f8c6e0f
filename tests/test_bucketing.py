"""Bucketed co-located join: correctness + the no-Exchange plan property."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_spark(tmp_path_factory):
    from ftm_datalake_spark.session import build_session

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = (
        build_session(
            app_name="bucketing-tests",
            master="local[4]",
            shuffle_partitions=4,
            extra_conf={
                "spark.ui.enabled": "false",
                "spark.sql.warehouse.dir": wh,
                # force SMJ so the no-Exchange property is about bucketing,
                # not about broadcast fallback
                "spark.sql.autoBroadcastJoinThreshold": "-1",
                "spark.sql.adaptive.enabled": "false",
            },
        )
    )
    yield spark
    spark.stop()


def test_bucketed_join_no_shuffle(warehouse_spark):
    from ftm_datalake_spark.operators.bucketing import (
        co_located_join,
        plan_has_no_shuffle,
        write_bucketed,
    )

    spark = warehouse_spark
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

    joined = co_located_join(spark, "b_stmts", "b_ents", ["canonical_id"])
    assert plan_has_no_shuffle(joined), joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 10_000

    # sanity: the same join on unbucketed frames DOES shuffle
    plain = stmts.join(ents, "canonical_id")
    from ftm_datalake_spark.operators.bucketing import plan_has_no_shuffle as nope

    assert not nope(plain)
