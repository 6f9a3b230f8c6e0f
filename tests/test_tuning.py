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
