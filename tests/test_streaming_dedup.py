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


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_stream_incremental_minhash_dedup(spark, tmp_path):
    """Incremental dedup on a STREAM: new docs arrive in micro-batches and
    band-join (in foreachBatch) against the static stored signature table —
    the streaming form of operators/training.incremental_dedup. Only the
    increment is shingled per batch; the lake is never re-signatured."""
    from ftm_datalake_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
        shingle_postings,
    )

    base_text = "the quick brown fox jumps over the lazy dog again and again"
    old = spark.createDataFrame(
        [(1, base_text), (2, "a completely different document about spark engines ok")],
        DOC_SCHEMA,
    )
    # stored signature table (what production keeps as parquet)
    old_bands = lsh_bands(minhash_signatures(shingle_postings(old)))
    old_bands.write.mode("overwrite").parquet(str(tmp_path / "old_bands"))
    stored = spark.read.parquet(str(tmp_path / "old_bands"))

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write(stage, "b1.json", [
        {"doc_id": 100, "text": base_text},          # dup of doc 1
        {"doc_id": 101, "text": "unrelated fresh content never seen before at all"},
    ])

    matches: list[tuple[int, int]] = []

    def handle_batch(batch_df, batch_id):
        # per batch: signature the increment, band-join vs the STORED table
        from pyspark.sql import functions as F

        new_bands = lsh_bands(minhash_signatures(shingle_postings(batch_df)))
        result = (
            new_bands.alias("n")
            .join(
                stored.alias("o"),
                (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.band_val") == F.col("o.band_val")),
            )
            .groupBy(F.col("n.doc_id").alias("new_doc"))
            .agg(F.min(F.col("o.doc_id")).alias("dup_of"))
            .collect()
        )
        matches.extend((r["new_doc"], r["dup_of"]) for r in result)
        batch_df.write.mode("append").parquet(out)

    stream = spark.readStream.schema(DOC_SCHEMA).json(stage)
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert (100, 1) in matches          # streamed dup found its stored original
    assert all(m[0] != 101 for m in matches)  # fresh doc not flagged
