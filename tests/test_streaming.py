"""End-to-end Structured Streaming tests: stage-directory drain with
exactly-once checkpoints (the reference's event-coupled stages + task
ledger, SURVEY §2.10)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

STAGE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)


def _write_stage_file(stage_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    with open(os.path.join(stage_dir, name), "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def test_stage_stream_exactly_once(spark, tmp_path):
    from ftm_datalake_spark.streaming.stages import (
        read_stage_stream,
        run_stage_to_parquet,
    )

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_stage_file(stage, "batch1.json", [{"key": "a", "size": 1}, {"key": "b", "size": 2}])

    q = run_stage_to_parquet(read_stage_stream(spark, stage, STAGE_SCHEMA), out, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2

    # drop a new file: only the new rows are processed (checkpoint = ledger)
    _write_stage_file(stage, "batch2.json", [{"key": "c", "size": 3}])
    q = run_stage_to_parquet(read_stage_stream(spark, stage, STAGE_SCHEMA), out, ckpt)
    q.awaitTermination(60)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["key"] for r in got.collect()} == {"a", "b", "c"}

    # re-run with nothing new: no duplicates
    q = run_stage_to_parquet(read_stage_stream(spark, stage, STAGE_SCHEMA), out, ckpt)
    q.awaitTermination(60)
    assert spark.read.parquet(out).count() == 3


def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming session_window vs the batch sessionize on real events:
    same session count per user."""
    from ftm_datalake_spark.plans import REGISTRY
    from ftm_datalake_spark.sources.tables import load_table
    from ftm_datalake_spark.streaming.stages import sessionize_stream

    events = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "events_json")
    events.select("user_id", "ts", "event_type", "value").coalesce(1).write.json(stage)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(stage)
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = (
        spark.table("sessions_test")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    batch = (
        REGISTRY["events_sessionize"]
        .builder(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    s = {r["user_id"]: r["n_sessions"] for r in streamed.collect()}
    b = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert s == b


def test_task_ledger_pending_work(spark, tmp_path):
    from ftm_datalake_spark.streaming.ledger import (
        cache_key,
        pending_work,
        read_ledger,
        record_completed,
    )

    ledger_path = str(tmp_path / "ledger")
    incoming = spark.createDataFrame(
        [("ds1", "a"), ("ds1", "b"), ("ds1", "c")], "dataset string, key string"
    ).withColumn("cache_key", cache_key("crawl", F.col("dataset"), F.col("key")))

    # empty ledger: everything pending
    ledger = read_ledger(spark, ledger_path)
    assert pending_work(incoming, ledger).count() == 3

    # complete two tasks, re-run: one pending (anycache skip semantics)
    record_completed(incoming.limit(2), ledger_path)
    ledger = read_ledger(spark, ledger_path)
    pend = pending_work(incoming, ledger)
    assert pend.count() == 1


def test_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (view→click within 10 min per user)
    drains to exactly the batch join's row multiset."""
    from ftm_datalake_spark.sources.tables import load_table
    from ftm_datalake_spark.streaming.stages import interval_join_stream

    events = load_table(spark, sf_dir, "events")
    stage = str(tmp_path / "ev_json")
    # default JSON timestampFormat is millisecond-precision; keep micros
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    events.select("user_id", "ts", "event_type").coalesce(1).write.option(
        "timestampFormat", ts_fmt
    ).json(stage)

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("timestampFormat", ts_fmt)
        .json(stage)
    )
    views = src.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    clicks = src.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = interval_join_stream(views, clicks)
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ij_test")

    b_views = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    b_clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    expected = b_views.join(
        b_clicks,
        (F.col("user_id") == F.col("cu"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("interval 10 minutes")),
    ).select("user_id", "view_ts", "click_ts")

    assert got.count() == expected.count() > 0
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
