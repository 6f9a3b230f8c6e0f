"""Streaming dedup: the documents-table skip-existing semantics on a
stream (built-in stateful dropDuplicates with the checkpoint as ledger)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def _write(stage: str, name: str, rows: list[dict]) -> None:
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, name), "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def test_stream_dedup_across_batches(spark, tmp_path):
    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(stage, "b1.json", [
        {"key": "a", "content_hash": "h1"},
        {"key": "a", "content_hash": "h1"},  # dup within batch
        {"key": "b", "content_hash": "h2"},
    ])

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(stage)
        deduped = stream.dropDuplicates(["key", "content_hash"])
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    drain()
    assert spark.read.parquet(out).count() == 2

    # second batch: one true new row + one replay of (a, h1)
    _write(stage, "b2.json", [
        {"key": "a", "content_hash": "h1"},  # already seen -> dropped by state
        {"key": "c", "content_hash": "h3"},
    ])
    drain()
    got = {(r["key"], r["content_hash"]) for r in spark.read.parquet(out).collect()}
    assert got == {("a", "h1"), ("b", "h2"), ("c", "h3")}
    assert spark.read.parquet(out).count() == 3
