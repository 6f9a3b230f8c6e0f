"""End-to-end training-data export: the corpus-curation operators
composed into ONE product verb that writes loader-ready artifacts.

Stages (each one an operator this engine already oracles individually):

1. quality gate  — Gopher rules (operators/textops.gopher_rules)
2. dedup         — CCNet segment-dedup canonicalization: boilerplate
                   segments stripped, one survivor per cleaned signature
                   (operators/textops.segment_dedup)
3. decontaminate — optional: drop docs sharing word k-grams with a
                   benchmark corpus (operators/training.decontaminate)
4. shard         — deterministic seeded shuffle into n_shards epoch
                   shards (operators/training.epoch_shards)
5. pack          — concat-and-chunk sequence packing index at seq_len
                   tokens (operators/training.pack_sequences)

Outputs under ``out_dir``:
- ``docs/shard=K/*.parquet``   — surviving docs, in-shard order by pos
- ``chunks/*.parquet``         — (doc_id, n_tokens, cum_end, chunk_id)
                                 packing map (offsets let the reader
                                 slice docs back into chunks)
- ``manifest.json``            — per-stage counts + config (the export
                                 is a pure function of (corpus, config,
                                 seed): same inputs, same manifest)

Everything is hash-deterministic (md5 shuffle keys, no RNG state), so a
re-run over the same corpus produces byte-stable shard membership — the
property a 100 TB pipeline needs to resume/verify an export. No stage
collects data to the driver; the manifest counts are 1-row aggregates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def export_training(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    seq_len: int = 2048,
    n_shards: int = 8,
    seed: str = "epoch0",
    benchmark: DataFrame | None = None,
    quality_gate: bool = True,
) -> dict:
    """Run the full export; returns (and writes) the manifest dict."""
    from ftm_datalake_spark.operators.textops import (
        gopher_rules,
        segment_dedup,
        token_count,
    )
    from ftm_datalake_spark.operators.training import (
        decontaminate,
        epoch_shards,
        pack_sequences,
    )

    manifest: dict = {
        "config": {
            "seq_len": seq_len,
            "n_shards": n_shards,
            "seed": seed,
            "quality_gate": quality_gate,
            "decontaminate": benchmark is not None,
        },
        "stages": {},
    }
    stages = manifest["stages"]
    stages["input_docs"] = docs.count()

    kept = docs
    if quality_gate:
        passes = gopher_rules(kept).where(F.col("passes")).select("doc_id")
        kept = kept.join(passes, "doc_id")
        stages["after_quality"] = kept.count()

    # canonical survivor per cleaned (boilerplate-stripped) signature —
    # exact dedup falls out as the clean_sig collision case
    cleaned = segment_dedup(kept).select("doc_id", "clean_sig")
    w_dedup = Window.partitionBy("clean_sig").orderBy("doc_id")
    canon = (
        cleaned.withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .select("doc_id")
    )
    kept = kept.join(canon, "doc_id")
    stages["after_dedup"] = kept.count()

    if benchmark is not None:
        contaminated = decontaminate(kept, benchmark).select("doc_id")
        kept = kept.join(contaminated, "doc_id", "left_anti")
        stages["after_decontaminate"] = kept.count()

    # pin the survivor set once: shards and chunks must see the SAME
    # rows even though they traverse it twice
    kept = kept.localCheckpoint()

    sharded = epoch_shards(kept, seed, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .drop("shuffle_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "docs"))
    )

    packed = pack_sequences(kept, seq_len, with_offsets=True)
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks"))

    totals = kept.agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("tokens")
    ).first()
    n_chunks = packed.agg(
        (F.max("chunk_id") + 1).cast("long").alias("n")
    ).first()
    stages["total_tokens"] = int(totals["tokens"] or 0)
    stages["chunks"] = int(n_chunks["n"] or 0)
    stages["shards"] = n_shards

    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_training_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    """Reader twin of :func:`export_training`: materialize each packed
    chunk's text pieces from the exported docs + chunk map.

    Returns one row per (chunk_id, doc_id) span — ``piece_start`` /
    ``piece_end`` are 0-based token offsets within the doc, ``piece``
    the corresponding whitespace-token slice. Concatenating pieces in
    (chunk_id, doc_id) order reconstructs the exact global token stream
    the packer cut (law-tested in tests/test_training_export.py); a
    loader groups by chunk_id to get fixed-budget sequences. The join is
    doc_id-keyed (both sides shuffle once on an 8-byte key); token
    slicing is codegen'd array slice — no Python row boundary."""
    from ftm_datalake_spark.operators.textops import tokens

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        seq_len = json.load(fh)["config"]["seq_len"]
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    j = chunks.join(docs.select("doc_id", "text"), "doc_id")
    start_global = F.col("cum_end") - F.col("n_tokens")
    piece_start = F.greatest(
        F.col("chunk_id") * seq_len - start_global, F.lit(0).cast("long")
    )
    piece_end = F.least(
        (F.col("chunk_id") + 1) * seq_len - start_global, F.col("n_tokens")
    )
    return j.select(
        "chunk_id",
        "doc_id",
        piece_start.alias("piece_start"),
        piece_end.alias("piece_end"),
        F.array_join(
            F.slice(
                tokens(F.col("text")),  # the packer's exact tokenization
                (piece_start + 1).cast("int"),
                (piece_end - piece_start).cast("int"),
            ),
            " ",
        ).alias("piece"),
    ).orderBy("chunk_id", "doc_id")
