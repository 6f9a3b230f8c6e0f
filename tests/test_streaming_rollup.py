"""Watermarked tumbling rollup: streaming result equals the batch query,
and partition pruning reaches the dataset-partitioned documents table."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, tmp_path):
    from ftm_datalake_spark.plans import REGISTRY
    from ftm_datalake_spark.sources.tables import load_table
    from ftm_datalake_spark.streaming.stages import hourly_rollup_stream

    events = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "events_json")
    events.select("ts", "event_type", "value").coalesce(1).write.json(stage)

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(stage)
    q = (
        hourly_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table("rollup_test").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in REGISTRY["events_hourly_rollup"].builder(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_documents_table_partition_pruning(spark, tmp_path):
    """Reading one dataset must prune to that partition at scan time."""
    import os

    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents

    for ds in ("ds_a", "ds_b"):
        src = str(tmp_path / f"src_{ds}")
        os.makedirs(src)
        with open(os.path.join(src, f"{ds}.txt"), "wb") as fh:
            fh.write(ds.encode())
        crawl(spark, src, ds, str(tmp_path / "lake"))

    docs = read_documents(spark, str(tmp_path / "lake"), "ds_a")
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dataset" in plan
    assert [r["key"] for r in docs.collect()] == ["ds_a.txt"]
