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


def test_watermark_drops_late_data(spark, tmp_path):
    """Rows older than the watermark must be dropped once the watermark
    has advanced past their window (bounded state at 100 TB)."""
    import json
    import os

    from ftm_datalake_spark.streaming.stages import hourly_rollup_stream

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage)

    def write(name, rows):
        with open(os.path.join(stage, name), "w") as fh:
            for row in rows:
                fh.write(json.dumps(row) + "\n")

    def drain():
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
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    # batch 1: events at 10:00; watermark (2h) advances to ~08:00
    write("b1.json", [{"ts": "2024-01-05 10:00:00", "event_type": "click", "value": 1.0}])
    drain()
    # batch 2: push watermark far ahead (20:00 -> watermark 18:00),
    # then batch 3 delivers a VERY late row for the 10:00 window
    write("b2.json", [{"ts": "2024-01-05 20:00:00", "event_type": "click", "value": 1.0}])
    drain()
    write("b3.json", [{"ts": "2024-01-05 10:30:00", "event_type": "click", "value": 99.0}])
    write("b3b.json", [{"ts": "2024-01-05 21:30:00", "event_type": "click", "value": 1.0}])
    drain()
    # close remaining windows so appends flush
    write("b4.json", [{"ts": "2024-01-06 23:00:00", "event_type": "click", "value": 1.0}])
    drain()

    rows = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window contains ONLY the on-time row — the 10:30 late row
    # (behind the 18:00 watermark) was dropped
    assert rows[("2024-01-05 10:00:00", "click")] == (1, 1.0)


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


def test_streaming_moments_sketch_matches_batch(spark, sf_dir, tmp_path):
    """The moments sketch streams: because the sketch is mergeable
    (count/min/max/decimal power sums), a streaming groupBy over
    micro-batches (forced here via maxFilesPerTrigger=1 over multiple
    files) must converge to the EXACT batch sketch — same integers, and
    therefore the same derived quantile estimates."""
    from ftm_datalake_spark.operators.sketches import (
        moments_estimates,
        moments_partials,
    )
    from ftm_datalake_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "events_json")
    events.select("event_type", "value").repartition(3).write.json(stage)

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).json(stage)
    sketch_stream = moments_partials(stream, F.col("value"), ["event_type"])
    q = (
        sketch_stream.writeStream.format("memory")
        .queryName("moments_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = spark.table("moments_stream")
    batch = moments_partials(events, F.col("value"), ["event_type"])
    assert batch.exceptAll(final).count() == 0
    assert final.exceptAll(batch).count() == 0
    # derived estimates agree bit-for-bit too (pure function of the sketch)
    est_s = {
        r["event_type"]: (r["mean_value"], r["std_value"], r["est_p99"])
        for r in moments_estimates(final).collect()
    }
    est_b = {
        r["event_type"]: (r["mean_value"], r["std_value"], r["est_p99"])
        for r in moments_estimates(batch).collect()
    }
    assert est_s == est_b
