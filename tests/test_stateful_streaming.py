"""applyInPandasWithState: per-key running totals accumulate across
separate availableNow drains (state survives via the checkpoint)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("dataset", T.StringType()),
        T.StructField("key", T.StringType()),
    ]
)


def _write(stage: str, name: str, rows: list[dict]) -> None:
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, name), "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def test_running_totals_across_drains(spark, tmp_path):
    from ftm_datalake_spark.streaming.stateful import running_totals

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(stage)
        totals = running_totals(
            stream.select(F.col("dataset").alias("key")).groupBy("key")
        )
        q = (
            totals.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    _write(stage, "b1.json", [
        {"dataset": "ds1", "key": "a"},
        {"dataset": "ds1", "key": "b"},
        {"dataset": "ds2", "key": "c"},
    ])
    drain()

    _write(stage, "b2.json", [
        {"dataset": "ds1", "key": "d"},
    ])
    drain()

    rows = spark.read.parquet(out).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append((r["batch_rows"], r["total_rows"]))
    # ds1: batch of 2 then batch of 1, total reaching 3 via persisted state
    assert sorted(by_key["ds1"]) == [(1, 3), (2, 2)]
    assert by_key["ds2"] == [(1, 1)]


def test_sessionize_stateful_matches_batch(spark, tmp_path):
    """Closed sessions from the custom stateful sessionizer are
    row-identical to batch events_sessionize on the same events, minus
    each user's final (still-open) session; session ids stay monotone
    across separate availableNow drains via the checkpointed state."""
    from pyspark.sql import Window

    from ftm_datalake_spark.streaming.stateful import sessionize_stateful

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).json(stage)
        sessions = sessionize_stateful(stream.groupBy("user_id"))
        q = (
            sessions.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)

    batch1 = [
        {"user_id": 1, "ts": "2026-01-01T10:00:00Z"},
        {"user_id": 1, "ts": "2026-01-01T10:10:00Z"},
        {"user_id": 1, "ts": "2026-01-01T11:30:00Z"},  # closes session 1
        {"user_id": 2, "ts": "2026-01-01T09:00:00Z"},
    ]
    batch2 = [
        {"user_id": 1, "ts": "2026-01-01T11:45:00Z"},  # extends session 2
        {"user_id": 1, "ts": "2026-01-01T13:00:00Z"},  # closes session 2
        {"user_id": 2, "ts": "2026-01-01T09:20:00Z"},  # extends session 1
    ]
    _write(stage, "b1.json", batch1)
    drain()
    _write(stage, "b2.json", batch2)
    drain()

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            str(r["session_start"]),
            str(r["session_end"]),
        )
        for r in spark.read.parquet(out).collect()
    }

    # batch twin on the union of all events (same lag/cumsum semantics as
    # plans/reference_ops.events_sessionize), minus each user's open tail
    all_events = spark.createDataFrame(
        [
            (r["user_id"], r["ts"].replace("Z", "").replace("T", " "))
            for r in batch1 + batch2
        ],
        "user_id LONG, ts_s STRING",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag(F.unix_micros("ts")).over(w)
    marked = all_events.select(
        "user_id",
        "ts",
        F.when(
            prev.isNull() | ((F.unix_micros("ts") - prev) > 1_800_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    agg = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    last = agg.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    closed_batch = agg.join(last, "user_id").where(
        F.col("session_id") < F.col("last_sid")
    )
    want = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            str(r["session_start"]),
            str(r["session_end"]),
        )
        for r in closed_batch.collect()
    }
    assert got == want
    assert got  # scenario actually closes sessions
    # the session that spans the two drains closed with BOTH its events
    assert got[(1, 2)][0] == 2
