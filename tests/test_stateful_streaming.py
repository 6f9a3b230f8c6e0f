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
