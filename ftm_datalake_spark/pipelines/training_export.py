"""End-to-end training-data export: the corpus-curation operators
composed into ONE product verb that writes loader-ready artifacts.

Stages (each one an operator this engine already oracles individually):

1. quality gate  — Gopher rules (operators/textops.gopher_rules)
2. dedup + clean — CCNet segment-dedup canonicalization: boilerplate
                   segments are STRIPPED FROM THE SHIPPED TEXT, docs
                   whose content is entirely boilerplate are dropped,
                   and one survivor is kept per cleaned signature
                   (operators/textops.segment_dedup +
                   operators/training.sample_per_group_cap)
3. decontaminate — optional: drop docs sharing word k-grams with a
                   benchmark corpus (operators/training.decontaminate)
4. shard         — deterministic seeded shuffle into n_shards epoch
                   shards (operators/training.epoch_shards)
5. pack          — concat-and-chunk sequence packing PER SHARD, in
                   epoch (shuffle) order: every chunk is assembled from
                   one shard's own docs, so a per-shard loader never
                   reads across shards, and a different seed yields
                   different packed sequences (a new epoch), not just a
                   relabeled shard split

Outputs under ``out_dir``:
- ``docs/shard=K/*.parquet``   — surviving docs (CLEANED text), in
                                 epoch order by pos within each shard
- ``chunks/*.parquet``         — (shard, doc_id, n_tokens, cum_end,
                                 chunk_id) per-shard packing map
                                 (offsets let the reader slice docs
                                 back into chunks)
- ``manifest.json``            — per-stage counts + config (the export
                                 is a pure function of (corpus, config,
                                 seed): same inputs, same manifest)
- ``epochs/epoch=S/...``       — optional extra epochs
                                 (:func:`export_epoch_maps`): per-seed
                                 assignment + chunk maps over the SAME
                                 doc bytes — O(docs + spans) per epoch,
                                 the text is never copied

Everything is hash-deterministic (md5 shuffle keys, no RNG state), so a
re-run over the same corpus produces byte-stable shard membership — the
property a 100 TB pipeline needs to resume/verify an export. Each
curation stage is localCheckpoint-ed BEFORE its manifest count, so the
expensive chain (gopher gate, segment explode + two shuffles) executes
once, not once per downstream count. The per-shard packing cumsum is a
window partitioned by shard — each task holds corpus/n_shards rows, the
same scale contract as epoch_shards itself. No stage collects data to
the driver; the manifest counts are 1-row aggregates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
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
        pack_epoch_shards,
        sample_per_group_cap,
    )

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

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
        kept = kept.join(passes, "doc_id").localCheckpoint()
        stages["after_quality"] = kept.count()

    # CCNet canonicalization: the SHIPPED text is the boilerplate-
    # stripped reassembly; docs cleaned down to nothing carry no novel
    # content and are dropped (they would otherwise all collide on
    # md5('') and collapse into one arbitrary survivor); one survivor
    # per cleaned signature (exact dup == clean_sig collision)
    # pinned once: the winner window and the text branch below both
    # read `cleaned` — without the checkpoint Spark would re-run the
    # whole segment explode + shuffle chain for each branch
    cleaned = (
        segment_dedup(kept, keep_text=True)
        .where(F.col("clean_len") > 0)
        .localCheckpoint()
    )
    # cap on (doc_id, clean_sig) ONLY — the survivor window must not
    # shuffle the full cleaned-text payload; the text moves once, in
    # the winner join below
    winner_ids = sample_per_group_cap(
        cleaned.select("doc_id", "clean_sig"),
        "clean_sig",
        [F.col("doc_id")],
        cap=1,
    ).select("doc_id")
    kept = (
        kept.drop("text")
        .join(
            cleaned.select(
                "doc_id", F.col("clean_text").alias("text")
            ).join(winner_ids, "doc_id"),
            "doc_id",
        )
        .localCheckpoint()
    )
    stages["after_dedup"] = kept.count()

    if benchmark is not None:
        contaminated = decontaminate(kept, benchmark).select("doc_id")
        kept = kept.join(
            contaminated, "doc_id", "left_anti"
        ).localCheckpoint()
        stages["after_decontaminate"] = kept.count()

    # shards and chunks must see the SAME rows and epoch order
    sharded = epoch_shards(kept, seed, n_shards).drop(
        "shuffle_key"
    ).localCheckpoint()
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "docs"))
    )

    # per-shard concat-and-chunk packing in EPOCH order (chunk ids are
    # local to the shard) — the oracled operator
    packed = pack_epoch_shards(sharded, seq_len)
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks"))

    totals = sharded.agg(
        F.sum(token_count(F.col("text"))).cast("long").alias("tokens")
    ).first()
    # chunk count from the parquet just written — re-aggregating
    # `packed` would re-run the whole window+explode plan a second time.
    # An empty corpus writes no part files (nothing to infer a schema
    # from), detected explicitly — any OTHER read failure must surface,
    # not silently become chunks=0 in a "successful" manifest.
    n_chunks = _count_chunks(spark, os.path.join(out_dir, "chunks"))
    stages["total_tokens"] = int(totals["tokens"] or 0)
    stages["chunks"] = n_chunks
    stages["shards"] = n_shards

    _write_manifest(os.path.join(out_dir, "manifest.json"), manifest)
    return manifest


def _count_chunks(spark: SparkSession, chunk_dir: str) -> int:
    """Total chunk count across shards from a written chunk map; 0 for
    an empty map (no part files). Real read failures propagate."""
    if not any(
        n.endswith(".parquet") for n in os.listdir(chunk_dir)
    ) and not any(
        os.path.isdir(os.path.join(chunk_dir, n)) for n in os.listdir(chunk_dir)
    ):
        return 0
    return int(
        spark.read.parquet(chunk_dir)
        .groupBy("shard")
        .agg((F.max("chunk_id") + 1).alias("n"))
        .agg(F.sum("n").cast("long").alias("n"))
        .first()["n"]
        or 0
    )


def _write_manifest(path: str, manifest: dict) -> None:
    """Write-aside + atomic rename: a crash mid-write must never leave
    the export's only manifest truncated (same pattern as the
    streaming entity-table swap)."""
    tmp = path + ".__stage__"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_training_chunks(
    spark: SparkSession, out_dir: str, epoch: str | None = None
) -> DataFrame:
    """Reader twin of :func:`export_training`: materialize each packed
    chunk's text pieces from the exported docs + chunk map.

    Returns one row per (shard, chunk_id, doc_id) span — ``piece_start``
    / ``piece_end`` are 0-based token offsets within the doc, ``piece``
    the corresponding whitespace-token slice, ``cum_end`` the doc's
    exclusive token end in the shard stream (the in-chunk piece order
    key). Concatenating pieces in (chunk_id, cum_end) order within a
    shard reproduces that shard's exact epoch token stream (law-tested
    in tests/test_training_export.py); a per-shard loader reads only its
    own shard's docs. The join is doc_id-keyed (one shuffle on an 8-byte
    key); slicing is codegen'd — no Python row boundary; no global sort
    is imposed (a loader groups by (shard, chunk_id) anyway)."""
    from ftm_datalake_spark.operators.textops import tokens

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        seq_len = json.load(fh)["config"]["seq_len"]
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    # ``epoch`` selects an export_epoch_maps chunk map (same doc bytes,
    # different shard/packing); default is the base export's map
    chunk_dir = (
        os.path.join(out_dir, "epochs", f"epoch={epoch}", "chunks")
        if epoch
        else os.path.join(out_dir, "chunks")
    )
    chunks = spark.read.parquet(chunk_dir)
    j = chunks.join(docs.select("doc_id", "text"), "doc_id")
    start_global = F.col("cum_end") - F.col("n_tokens")
    piece_start = F.greatest(
        F.col("chunk_id") * seq_len - start_global, F.lit(0).cast("long")
    )
    piece_end = F.least(
        (F.col("chunk_id") + 1) * seq_len - start_global, F.col("n_tokens")
    )
    return j.select(
        "shard",
        "chunk_id",
        "doc_id",
        "cum_end",
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
    )


def export_epoch_maps(
    spark: SparkSession,
    out_dir: str,
    seeds: list[str],
    n_shards: int | None = None,
) -> dict:
    """Additional training epochs over an EXISTING export without
    copying the corpus: each seed yields a fresh shard assignment
    (doc_id, shard, pos) and per-shard chunk map, written under
    ``epochs/epoch=<seed>/{assignment,chunks}``. Storage per epoch is
    O(docs + spans) — text bytes are written once by export_training;
    a loader joins the epoch's assignment to ``docs/`` by doc_id (the
    8-byte-key shuffle) or re-reads docs/shard=K for epoch 0.

    Returns {"epochs": {seed: {"chunks": n, "span_tokens": n}}} and
    appends the same block to manifest.json (``span_tokens`` counts a
    boundary-straddling doc once per chunk — a span checksum, not a
    corpus token total). Deterministic like the base export: same
    (corpus, seed, config) ⇒ identical maps. Seeds double as directory
    names, so only ``[A-Za-z0-9._-]`` seeds are accepted — silent
    sanitization could alias two distinct seeds onto one directory."""
    from ftm_datalake_spark.operators.training import (
        epoch_shards,
        pack_epoch_shards,
    )

    for seed in seeds:
        if not seed or not all(
            c.isalnum() or c in "-_." for c in seed
        ):
            raise ValueError(
                f"epoch seed {seed!r} is not a safe directory name "
                "(use [A-Za-z0-9._-] only)"
            )
    if n_shards is not None and n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path) as fh:
        manifest = json.load(fh)
    seq_len = manifest["config"]["seq_len"]
    if n_shards is None:
        n_shards = manifest["config"]["n_shards"]

    docs = spark.read.parquet(os.path.join(out_dir, "docs")).select(
        "doc_id", "text"
    )
    stats: dict = {}
    for seed in seeds:
        epoch_dir = os.path.join(out_dir, "epochs", f"epoch={seed}")
        sharded = epoch_shards(docs, seed, n_shards).drop("shuffle_key")
        # pin once: assignment and chunks must agree on shard/pos
        sharded = sharded.localCheckpoint()
        (
            sharded.select("doc_id", "shard", "pos")
            .repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "pos")
            .write.mode("overwrite")
            .parquet(os.path.join(epoch_dir, "assignment"))
        )
        packed = pack_epoch_shards(sharded, seq_len)
        packed.write.mode("overwrite").parquet(
            os.path.join(epoch_dir, "chunks")
        )
        chunk_dir = os.path.join(epoch_dir, "chunks")
        if not os.listdir(chunk_dir) or not any(
            n.endswith(".parquet") or os.path.isdir(os.path.join(chunk_dir, n))
            for n in os.listdir(chunk_dir)
        ):
            stats[seed] = {"chunks": 0, "span_tokens": 0}  # empty corpus
            continue
        row = (
            spark.read.parquet(chunk_dir)
            .groupBy("shard")
            .agg(
                (F.max("chunk_id") + 1).alias("n"),
                F.sum("n_tokens").alias("t"),
            )
            .agg(
                F.sum("n").cast("long").alias("chunks"),
                F.sum("t").cast("long").alias("tokens"),
            )
            .first()
        )
        stats[seed] = {
            "chunks": int(row["chunks"] or 0),
            # NOTE: summed over spans, so boundary-straddling docs count
            # once per chunk — loaders use it as a span checksum, not a
            # corpus token total (that lives in stages.total_tokens)
            "span_tokens": int(row["tokens"] or 0),
        }

    manifest.setdefault("epochs", {}).update(stats)
    _write_manifest(man_path, manifest)
    return {"epochs": stats}
