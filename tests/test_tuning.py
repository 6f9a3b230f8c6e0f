from __future__ import annotations

import os


def test_recommended_partitions_scales():
    from ftm_datalake_spark.tuning import recommended_shuffle_partitions

    GB = 1024**3
    # small input: floored at 2x cores
    assert recommended_shuffle_partitions(1 * GB, total_cores=32) == 64
    # 10 TB at 128 MB targets: ~80k partitions
    assert recommended_shuffle_partitions(10 * 1024 * GB, total_cores=1000) == 81921
    # explode x4 expansion quadruples the estimate
    assert recommended_shuffle_partitions(
        10 * 1024 * GB, total_cores=1000, expansion=4.0
    ) == 327681


def test_apply_recommended_conf(spark, sf_dir):
    from ftm_datalake_spark.tuning import apply_recommended_conf

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        info = apply_recommended_conf(
            spark, [os.path.join(sf_dir, "lineitem.parquet")]
        )
        assert info["input_bytes"] > 0
        assert info["shuffle_partitions"] >= 2 * info["cores"]
        assert (
            spark.conf.get("spark.sql.shuffle.partitions")
            == str(info["shuffle_partitions"])
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_explain_shuffles_counts(spark, sf_dir):
    from ftm_datalake_spark.sources.tables import load_table
    from ftm_datalake_spark.tuning import explain_shuffles

    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    assert explain_shuffles(li.select("l_orderkey")) == 0
    assert explain_shuffles(li.groupBy("l_orderkey").count()) >= 1


def test_aqe_splits_skewed_join_partitions(spark):
    """A hot join key must not pin one reducer: with AQE skew handling
    on (the session default), the final adaptive plan marks the sort-
    merge join as skew-handled and splits the hot partition. Thresholds
    are lowered so the sf-test-size skew triggers the same code path
    production data would."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # 300k rows on ONE key + a uniform tail vs a small dim table.
        # The sha1 payload must survive into the join output: without
        # it, the constant hot key compresses below the skew threshold
        # in the shuffle files and no split is needed.
        facts = spark.range(300_000).select(
            F.when(F.col("id") < 290_000, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = facts.join(dim, "k").select(
            F.sum(F.length("payload")).alias("s")
        )
        assert joined.collect()[0]["s"] == 300_000 * 40
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
