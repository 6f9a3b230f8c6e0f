"""End-to-end training-data export (pipelines/training_export.py):
stage counts are consistent, the shipped text is boilerplate-stripped,
the per-shard packing map conserves tokens in epoch order, shard AND
chunk membership are hash-deterministic across runs (and seed-
sensitive), and the CLI verb wires it all up."""

from __future__ import annotations

import argparse
import json
import os

import pytest
from pyspark.sql import functions as F


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
        st["input_docs"] >= st["after_quality"] >= st["after_dedup"] > 0
    )
    assert st["shards"] == 4

    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == st["after_dedup"]
    # every shard's in-shard positions are dense 1..n
    per_shard = {
        r["shard"]: (r["n"], r["maxp"], r["tokens"])
        for r in docs.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.max("pos").alias("maxp"),
            F.sum(token_count(F.col("text"))).alias("tokens"),
        )
        .collect()
    }
    assert set(per_shard) <= set(range(4))
    for n, maxp, _ in per_shard.values():
        assert n == maxp

    # packing map: per-shard chunk count arithmetic, token conservation
    assert st["total_tokens"] == sum(t for _, _, t in per_shard.values())
    assert st["chunks"] == sum(
        (t + 511) // 512 for _, _, t in per_shard.values()
    )
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    got_chunks = {
        r["shard"]: r["n"]
        for r in chunks.groupBy("shard")
        .agg((F.max("chunk_id") + 1).alias("n"))
        .collect()
    }
    for shard, (_, _, t) in per_shard.items():
        assert got_chunks[shard] == (t + 511) // 512

    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh) == manifest


def test_export_ships_cleaned_text_and_drops_all_boilerplate_docs(
    spark, tmp_path
):
    """The exported text is the boilerplate-stripped reassembly; a doc
    whose every segment is shared boilerplate is dropped entirely (not
    collapsed into an arbitrary md5('') survivor)."""
    from ftm_datalake_spark.pipelines.training_export import export_training

    boiler = " ".join(f"b{i}" for i in range(8))  # one 8-word segment
    rows = [
        (1, boiler + " " + " ".join(f"u{i}" for i in range(8))),
        (2, boiler + " " + " ".join(f"v{i}" for i in range(8))),
        (3, boiler),  # all boilerplate -> dropped
        (4, boiler),  # all boilerplate -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    m = export_training(
        spark,
        docs,
        str(tmp_path / "clean"),
        seq_len=16,
        n_shards=2,
        quality_gate=False,
    )
    assert m["stages"]["after_dedup"] == 2
    exported = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "clean/docs")).collect()
    }
    assert set(exported) == {1, 2}
    for text in exported.values():
        assert "b0" not in text  # boilerplate stripped from shipped text
    assert exported[1] == " ".join(f"u{i}" for i in range(8))


def test_export_is_deterministic_and_seed_sensitive(spark, tmp_path):
    def _docs_map(out):
        return {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in spark.read.parquet(os.path.join(out, "docs"))
            .select("doc_id", "shard", "pos")
            .collect()
        }

    def _chunks_map(out):
        return {
            (r["shard"], r["doc_id"], r["chunk_id"])
            for r in spark.read.parquet(os.path.join(out, "chunks")).collect()
        }

    m1, out1 = _export(spark, tmp_path, "a", seq_len=256, n_shards=2, seed="s")
    m2, out2 = _export(spark, tmp_path, "b", seq_len=256, n_shards=2, seed="s")
    assert m1 == m2
    assert _docs_map(out1) == _docs_map(out2)
    assert _chunks_map(out1) == _chunks_map(out2)

    # a different seed is a different epoch: shard placement AND the
    # packed sequences change (packing follows the shuffle order)
    m3, out3 = _export(
        spark, tmp_path, "c", seq_len=256, n_shards=2, seed="other"
    )
    assert set(_docs_map(out3)) == set(_docs_map(out1))  # same survivors
    assert _docs_map(out3) != _docs_map(out1)
    assert _chunks_map(out3) != _chunks_map(out1)


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


def test_export_rejects_bad_config(spark, tmp_path):
    from ftm_datalake_spark.pipelines.training_export import export_training

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_len"):
        export_training(spark, docs, str(tmp_path / "x"), seq_len=0)
    with pytest.raises(ValueError, match="n_shards"):
        export_training(spark, docs, str(tmp_path / "y"), n_shards=0)


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


def test_reader_reconstructs_exact_epoch_stream_per_shard(spark, tmp_path):
    """Law: within each shard, concatenating the reader's pieces in
    (chunk_id, cum_end) order reproduces the shard's epoch token stream
    — every doc's tokens in shuffle order, nothing lost or duplicated at
    chunk boundaries; chunk budgets hold; ids are dense per shard."""
    from ftm_datalake_spark.pipelines.training_export import (
        read_training_chunks,
    )

    _, out = _export(spark, tmp_path, "rt", seq_len=64, n_shards=2)
    pieces = read_training_chunks(spark, out).collect()
    docs = spark.read.parquet(os.path.join(out, "docs")).collect()

    shards = {r["shard"] for r in docs}
    for shard in shards:
        mine = [r for r in pieces if r["shard"] == shard]
        # budget per chunk: == 64 except the shard's last chunk
        per_chunk: dict[int, int] = {}
        for r in mine:
            per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + (
                r["piece_end"] - r["piece_start"]
            )
        last = max(per_chunk)
        assert set(per_chunk) == set(range(last + 1))
        for cid, n in per_chunk.items():
            assert n == 64 or (cid == last and 0 < n <= 64)
        # stream equality in epoch order
        stream = " ".join(
            r["piece"]
            for r in sorted(mine, key=lambda r: (r["chunk_id"], r["cum_end"]))
            if r["piece"]
        ).split()
        want = " ".join(
            r["text"].strip()
            for r in sorted(
                (d for d in docs if d["shard"] == shard),
                key=lambda d: d["pos"],
            )
        ).split()
        assert stream == want


def test_export_partitioning_invariant(spark, tmp_path):
    """The export is bit-identical under a different shuffle-partition
    setting — shard membership, positions, and chunk map all derive
    from total orders / hash keys, never physical placement."""
    def _maps(out):
        docs = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in spark.read.parquet(os.path.join(out, "docs"))
            .select("doc_id", "shard", "pos")
            .collect()
        }
        chunks = {
            (r["shard"], r["doc_id"], r["chunk_id"], r["cum_end"])
            for r in spark.read.parquet(os.path.join(out, "chunks")).collect()
        }
        return docs, chunks

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        _, out_a = _export(spark, tmp_path, "p7", seq_len=128, n_shards=3)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        _, out_b = _export(spark, tmp_path, "p32", seq_len=128, n_shards=3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert _maps(out_a) == _maps(out_b)


def test_epoch_maps_permutation_and_conservation(spark, tmp_path):
    """export_epoch_maps: each extra epoch's assignment is a permutation
    of the SAME survivor set into dense per-shard positions, its chunk
    map conserves the corpus token total (counting straddlers once),
    different seeds give different maps, and the manifest records it."""
    from pyspark.sql import functions as F

    from ftm_datalake_spark.operators.textops import token_count
    from ftm_datalake_spark.pipelines.training_export import (
        export_epoch_maps,
    )

    manifest, out = _export(spark, tmp_path, "base", seq_len=128, n_shards=2)
    res = export_epoch_maps(spark, out, ["epoch1", "epoch2"])
    assert set(res["epochs"]) == {"epoch1", "epoch2"}

    docs = spark.read.parquet(os.path.join(out, "docs"))
    doc_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    base_map = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in docs.select("doc_id", "shard", "pos").collect()
    }
    for seed in ["epoch1", "epoch2"]:
        ep = os.path.join(out, "epochs", f"epoch={seed}")
        assign = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in spark.read.parquet(
                os.path.join(ep, "assignment")
            ).collect()
        }
        assert set(assign) == doc_ids  # same survivors, reshuffled
        assert assign != base_map
        chunks = spark.read.parquet(os.path.join(ep, "chunks"))
        # token conservation: each doc appears with its n_tokens in >=1
        # span; summing ONE span per doc gives the corpus total
        per_doc = chunks.groupBy("doc_id").agg(
            F.first("n_tokens").alias("n_tokens")
        )
        got = per_doc.agg(F.sum("n_tokens").alias("t")).first()["t"]
        want = docs.agg(
            F.sum(token_count(F.col("text"))).alias("t")
        ).first()["t"]
        assert got == want
    ep1 = {
        (r["shard"], r["doc_id"], r["chunk_id"])
        for r in spark.read.parquet(
            os.path.join(out, "epochs", "epoch=epoch1", "chunks")
        ).collect()
    }
    ep2 = {
        (r["shard"], r["doc_id"], r["chunk_id"])
        for r in spark.read.parquet(
            os.path.join(out, "epochs", "epoch=epoch2", "chunks")
        ).collect()
    }
    assert ep1 != ep2

    with open(os.path.join(out, "manifest.json")) as fh:
        man2 = json.load(fh)
    assert set(man2["epochs"]) == {"epoch1", "epoch2"}
    assert man2["stages"] == manifest["stages"]  # base stages untouched


def test_export_epochs_cli(spark, tmp_path):
    from ftm_datalake_spark.__main__ import _dispatch

    _, out = _export(spark, tmp_path, "cli_e", seq_len=256, n_shards=2)
    rc = _dispatch(
        spark,
        argparse.Namespace(
            cmd="export-epochs", export_dir=out, seeds="e1", shards=None
        ),
    )
    assert rc in (0, None)
    assert os.path.isdir(os.path.join(out, "epochs", "epoch=e1", "chunks"))


def test_reader_reconstructs_extra_epoch_stream(spark, tmp_path):
    """The reconstruction law holds for an export_epoch_maps epoch too:
    reading chunks for epoch=e1 reproduces e1's shuffle-order token
    stream (ordered by the epoch's assignment positions)."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_epoch_maps,
        read_training_chunks,
    )

    _, out = _export(spark, tmp_path, "re", seq_len=64, n_shards=2)
    export_epoch_maps(spark, out, ["e1"])
    pieces = read_training_chunks(spark, out, epoch="e1").collect()

    docs_text = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }
    assign = spark.read.parquet(
        os.path.join(out, "epochs", "epoch=e1", "assignment")
    ).collect()
    for shard in {r["shard"] for r in assign}:
        stream = " ".join(
            r["piece"]
            for r in sorted(
                (p for p in pieces if p["shard"] == shard),
                key=lambda p: (p["chunk_id"], p["cum_end"]),
            )
            if r["piece"]
        ).split()
        want = " ".join(
            docs_text[r["doc_id"]].strip()
            for r in sorted(
                (a for a in assign if a["shard"] == shard),
                key=lambda a: a["pos"],
            )
        ).split()
        assert stream == want


def test_epoch_maps_reject_unsafe_seed_and_bad_shards(spark, tmp_path):
    from ftm_datalake_spark.pipelines.training_export import (
        export_epoch_maps,
    )

    _, out = _export(spark, tmp_path, "guard", seq_len=256, n_shards=2)
    with pytest.raises(ValueError, match="safe directory"):
        export_epoch_maps(spark, out, ["run/2024"])
    with pytest.raises(ValueError, match="safe directory"):
        export_epoch_maps(spark, out, ["e 1"])
    with pytest.raises(ValueError, match="n_shards"):
        export_epoch_maps(spark, out, ["e1"], n_shards=0)
    # nothing was written by the rejected calls
    assert not os.path.exists(os.path.join(out, "epochs"))


def test_manifest_write_is_atomic(tmp_path):
    """_write_manifest never leaves a truncated manifest: the stage file
    is fully written before the rename."""
    from ftm_datalake_spark.pipelines.training_export import _write_manifest

    path = str(tmp_path / "manifest.json")
    _write_manifest(path, {"a": 1})
    _write_manifest(path, {"a": 2, "b": [1, 2, 3]})
    with open(path) as fh:
        assert json.load(fh) == {"a": 2, "b": [1, 2, 3]}
    assert not os.path.exists(path + ".__stage__")


def test_reader_shard_restriction_prunes_and_matches(spark, tmp_path):
    """read_training_chunks(shard=K) equals the full read filtered to K,
    and its docs-side inputFiles stay inside shard=K (the per-loader
    partition-pruned read)."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        read_training_chunks,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"s{i}w{j}" for j in range(12))) for i in range(24)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "exp")
    export_training(
        spark, docs, out, seq_len=16, n_shards=4, quality_gate=False
    )

    full = read_training_chunks(spark, out)
    shards = sorted(
        int(r["shard"]) for r in full.select("shard").distinct().collect()
    )
    assert len(shards) > 1
    k = shards[0]
    only = read_training_chunks(spark, out, shard=k)
    want = {
        tuple(r) for r in full.where(F.col("shard") == k).collect()
    }
    assert {tuple(r) for r in only.collect()} == want and want

    # pruning lives in the physical plan (inputFiles lists the relation
    # pre-pruning): both scans carry a shard PartitionFilters equality
    import re

    plan = only._jdf.queryExecution().executedPlan().toString()
    shard_filters = [
        f
        for f in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        if "shard" in f
    ]
    assert len(shard_filters) >= 2, plan  # docs side AND chunks side


def test_delta_id_distinct_ids_no_xor_cancellation(spark):
    """{1,1,3} and {2,2,3} must not alias: the id hashes over DISTINCT
    doc_ids (xor of a repeated id would cancel out)."""
    from ftm_datalake_spark.pipelines.training_export import _delta_id

    a = spark.createDataFrame(
        [(1, "x"), (1, "x"), (3, "y")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    assert _delta_id(a) != _delta_id(b)
    # order/partitioning independent
    assert _delta_id(a.orderBy(F.col("doc_id").desc()).repartition(7)) == _delta_id(a)
