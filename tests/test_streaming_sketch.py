"""Streaming count-min sketch: the cells relation maintained across
micro-batches via foreachBatch merge — proving the sketch's mergeability
is exactly what makes it streaming-compatible (each batch's partial
cells ADD into the store, and the result equals the batch sketch over
the full stream)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType([T.StructField("token", T.StringType())])


def _write(stage: str, name: str, tokens: list[str]) -> None:
    os.makedirs(stage, exist_ok=True)
    with open(os.path.join(stage, name), "w") as fh:
        for t in tokens:
            fh.write(json.dumps({"token": t}) + "\n")


def test_streaming_cms_equals_batch_cms(spark, tmp_path):
    from ftm_datalake_spark.operators.sketches import cms_cells

    stage = str(tmp_path / "stage")
    store = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")

    def merge_batch(batch_df, _batch_id):
        new_cells = cms_cells(batch_df, depth=3, width=64)
        if os.path.exists(store):
            old = batch_df.sparkSession.read.parquet(store)
            merged = (
                old.unionByName(new_cells)
                .groupBy("seed", "bucket")
                .agg(F.sum("c").alias("c"))
            )
        else:
            merged = new_cells
        # atomic-enough for the test: rewrite the snapshot
        merged.write.mode("overwrite").parquet(store + ".tmp")
        batch_df.sparkSession.read.parquet(store + ".tmp").write.mode(
            "overwrite"
        ).parquet(store)

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(stage)
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write(stage, "b1.json", ["a"] * 5 + ["b"] * 2)
    drain()
    _write(stage, "b2.json", ["a"] * 3 + ["c"] * 7)
    drain()

    streamed = {
        (r["seed"], r["bucket"]): r["c"]
        for r in spark.read.parquet(store).collect()
    }
    full = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2 + [("c",)] * 7, "token string"
    )
    batch = {
        (r["seed"], r["bucket"]): r["c"]
        for r in cms_cells(full, depth=3, width=64).collect()
    }
    assert streamed == batch


def test_streaming_kmv_equals_batch_kmv(spark, tmp_path):
    """KMV mergeability across micro-batches: keeping the k smallest of
    (stored sketch ∪ batch sketch) every batch ends with exactly the
    batch sketch of the full stream — so theta set algebra works over
    live streams with k rows of state."""
    from pyspark.sql import Window

    from ftm_datalake_spark.operators.sketches import kmv_sketch

    stage = str(tmp_path / "stage")
    store = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")
    K = 16

    def merge_batch(batch_df, _batch_id):
        new_sk = kmv_sketch(batch_df.select(F.col("token").alias("key")), K)
        if os.path.exists(store):
            old = batch_df.sparkSession.read.parquet(store)
            merged = old.unionByName(new_sk).distinct()
            w = Window.orderBy("h")
            merged = (
                merged.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= K)
                .select("h")
            )
        else:
            merged = new_sk
        merged.write.mode("overwrite").parquet(store + ".tmp")
        batch_df.sparkSession.read.parquet(store + ".tmp").write.mode(
            "overwrite"
        ).parquet(store)

    def drain():
        stream = spark.readStream.schema(SCHEMA).json(stage)
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    toks1 = [f"t{i}" for i in range(40)]
    toks2 = [f"t{i}" for i in range(20, 70)]  # overlap + new keys
    _write(stage, "b1.json", toks1)
    drain()
    _write(stage, "b2.json", toks2)
    drain()

    streamed = sorted(r["h"] for r in spark.read.parquet(store).collect())
    full = spark.createDataFrame(
        [(t,) for t in toks1 + toks2], "key string"
    )
    batch = sorted(r["h"] for r in kmv_sketch(full, K).collect())
    assert streamed == batch and len(batch) == K


def test_streaming_grouped_hll_equals_batch(spark, tmp_path):
    """Per-group HLL registers merged across micro-batches via
    foreachBatch max-merge equal the batch sketch of the full stream —
    grouped registers are mergeable the same way global ones are, so
    per-group distinct counts stream with bounded state (groups x m)."""
    import json as _json

    from ftm_datalake_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )

    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("key", T.StringType()),
        ]
    )
    stage = str(tmp_path / "stage")
    store = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")

    def _write_rows(name, rows):
        os.makedirs(stage, exist_ok=True)
        with open(os.path.join(stage, name), "w") as fh:
            for g, k in rows:
                fh.write(_json.dumps({"grp": g, "key": k}) + "\n")

    def merge_batch(batch_df, _batch_id):
        new = hll_registers_by(batch_df, "grp")
        if os.path.exists(store):
            old = batch_df.sparkSession.read.parquet(store)
            merged = (
                old.unionByName(new)
                .groupBy("grp", "bucket")
                .agg(F.max("r").alias("r"))
            )
        else:
            merged = new
        merged.write.mode("overwrite").parquet(store + ".tmp")
        batch_df.sparkSession.read.parquet(store + ".tmp").write.mode(
            "overwrite"
        ).parquet(store)

    def drain():
        stream = spark.readStream.schema(schema).json(stage)
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [("x", f"u{i}") for i in range(40)] + [("y", f"v{i}") for i in range(5)]
    b2 = [("x", f"u{i}") for i in range(20, 60)] + [("y", "v0"), ("z", "w1")]
    _write_rows("b1.json", b1)
    drain()
    _write_rows("b2.json", b2)
    drain()

    streamed = {
        (r["grp"], r["bucket"]): r["r"]
        for r in spark.read.parquet(store).collect()
    }
    full = spark.createDataFrame(b1 + b2, schema)
    batch = {
        (r["grp"], r["bucket"]): r["r"]
        for r in hll_registers_by(full, "grp").collect()
    }
    assert streamed == batch
    # and the estimates therefore agree too
    est_streamed = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_by(spark.read.parquet(store), "grp").collect()
    }
    est_batch = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_by(hll_registers_by(full, "grp"), "grp").collect()
    }
    assert est_streamed == est_batch
