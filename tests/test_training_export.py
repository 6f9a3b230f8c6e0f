"""End-to-end training-data export (pipelines/training_export.py):
stage counts are consistent, the packing map conserves tokens, shard
membership is hash-deterministic across runs, and the CLI verb wires it
all up."""

from __future__ import annotations

import argparse
import json
import os


def _export(spark, tmp_path, name, **kw):
    from ftm_datalake_spark.pipelines.training_export import export_training

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / name)
    return export_training(spark, docs, out, **kw), out


def test_export_manifest_and_artifacts(spark, tmp_path):
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.textops import token_count

    manifest, out = _export(
        spark, tmp_path, "exp", seq_len=512, n_shards=4, seed="e0"
    )
    st = manifest["stages"]
    assert (
        st["input_docs"]
        >= st["after_quality"]
        >= st["after_dedup"]
        > 0
    )
    assert st["shards"] == 4

    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == st["after_dedup"]
    # every shard partition exists and in-shard positions are dense 1..n
    per_shard = {
        r["shard"]: (r["n"], r["maxp"])
        for r in docs.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos").alias("maxp"))
        .collect()
    }
    assert set(per_shard) <= set(range(4))
    for n, maxp in per_shard.values():
        assert n == maxp

    # packing map: chunk ids dense from 0, token totals conserved
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    total_tokens = (
        docs.agg(F.sum(token_count(F.col("text"))).alias("t")).first()["t"]
    )
    assert st["total_tokens"] == total_tokens
    assert st["chunks"] == (total_tokens + 511) // 512
    # each doc's token count appears identically in every chunk it spans
    spans = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"), F.first("n_tokens").alias("n_tokens")
    )
    # a doc spans at most ceil(n_tokens/512) + 1 chunks
    bad = spans.where(
        F.col("n_spans") > (F.col("n_tokens") + 511) / 512 + 1
    ).count()
    assert bad == 0

    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == manifest


def test_export_is_deterministic(spark, tmp_path):
    m1, out1 = _export(spark, tmp_path, "a", seq_len=256, n_shards=2, seed="s")
    m2, out2 = _export(spark, tmp_path, "b", seq_len=256, n_shards=2, seed="s")
    assert m1 == m2
    d1 = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in spark.read.parquet(os.path.join(out1, "docs"))
        .select("doc_id", "shard", "pos")
        .collect()
    }
    d2 = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in spark.read.parquet(os.path.join(out2, "docs"))
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert d1 == d2
    # a different seed reshuffles: some doc moves shard or position
    m3, out3 = _export(
        spark, tmp_path, "c", seq_len=256, n_shards=2, seed="other"
    )
    d3 = {
        (r["doc_id"]): (r["shard"], r["pos"])
        for r in spark.read.parquet(os.path.join(out3, "docs"))
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert set(d3) == set(d1) and d3 != d1


def test_export_decontaminate_drops_hits(spark, tmp_path):
    # benchmark = one of the SURVIVING docs verbatim -> it must be gone
    base, out0 = _export(spark, tmp_path, "plain", seq_len=256, n_shards=2)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = (
        spark.read.parquet(os.path.join(out0, "docs"))
        .orderBy("doc_id")
        .limit(1)
        .select("doc_id", "text")
    )
    from ftm_datalake_spark.pipelines.training_export import export_training

    manifest = export_training(
        spark,
        docs,
        str(tmp_path / "decon"),
        seq_len=256,
        n_shards=2,
        benchmark=bench,
    )
    st = manifest["stages"]
    assert "after_decontaminate" in st
    assert st["after_decontaminate"] < st["after_dedup"]


def test_export_training_cli(spark, tmp_path):
    from ftm_datalake_spark.__main__ import _dispatch

    out = str(tmp_path / "cliexp")
    rc = _dispatch(
        spark,
        argparse.Namespace(
            cmd="export-training",
            source="/root/testdata/sf0.001",
            out=out,
            seq_len=512,
            shards=2,
            seed="epoch0",
            benchmark=None,
            no_quality_gate=False,
        ),
    )
    assert rc in (0, None)
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.isdir(os.path.join(out, "docs"))
    assert os.path.isdir(os.path.join(out, "chunks"))


def test_reader_reconstructs_exact_token_stream(spark, tmp_path):
    """Law: concatenating the reader's pieces in (chunk_id, doc_id)
    order reproduces the packer's global token stream — every doc's
    tokens, in doc_id order, nothing lost or duplicated at chunk
    boundaries; and no chunk exceeds the token budget."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.pipelines.training_export import (
        read_training_chunks,
    )

    _, out = _export(spark, tmp_path, "rt", seq_len=64, n_shards=2)
    pieces = read_training_chunks(spark, out).collect()

    # per-chunk token budget respected (last chunk may be short)
    per_chunk: dict[int, int] = {}
    for r in pieces:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + (
            r["piece_end"] - r["piece_start"]
        )
    max_chunk = max(per_chunk)
    for cid, n in per_chunk.items():
        assert n == 64 or (cid == max_chunk and 0 < n <= 64)
    assert set(per_chunk) == set(range(max_chunk + 1))  # dense ids

    # stream equality: pieces in (chunk, doc) order == docs in doc order
    stream = " ".join(
        r["piece"] for r in sorted(
            pieces, key=lambda r: (r["chunk_id"], r["doc_id"])
        ) if r["piece"]
    ).split()
    docs = (
        spark.read.parquet(os.path.join(out, "docs"))
        .orderBy("doc_id")
        .select("text")
        .collect()
    )
    want = " ".join(r["text"].strip() for r in docs).split()
    assert stream == want
