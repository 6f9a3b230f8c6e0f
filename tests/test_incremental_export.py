"""Incremental training-export (round-8 brief #5) + Hadoop-FS-safe
artifact probes (brief #6).

The law: ``incremental(C, Δ) == full(C ∪ Δ)`` on shard membership,
epoch order, chunk maps and manifest totals, under the documented
preconditions (Δ segment-disjoint from C, Δ doc_ids sort after C's).
The full export is the oracle — both sides run the same deterministic
hash pipeline, so equality is exact, not approximate.

Plus: ledger idempotence (re-folding the same Δ is a no-op), partial
blast radius (shards the Δ misses are not rewritten), first-write-wins
on duplicate content, and an end-to-end export over a non-file://
scheme (viewfs) proving no code path assumes a local filesystem."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def _corpus(spark, ids, prefix, words=9):
    # segment-disjoint by construction: every token is unique per doc
    rows = [
        (i, " ".join(f"{prefix}{i}w{j}" for j in range(words + i % 7)))
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _docs_set(spark, out):
    return {
        (r["doc_id"], int(r["shard"]), r["pos"], r["text"])
        for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }


def _chunks_set(spark, out):
    return {
        (int(r["shard"]), r["doc_id"], r["n_tokens"], r["cum_end"], r["chunk_id"])
        for r in spark.read.parquet(os.path.join(out, "chunks")).collect()
    }


CFG = dict(seq_len=32, n_shards=4, seed="e0", quality_gate=False)


def test_incremental_matches_full_export(spark, tmp_path):
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(40), "c")
    delta = _corpus(spark, range(100, 112), "d")

    export_training(
        spark, base.unionByName(delta), str(tmp_path / "full"), **CFG
    )
    export_training(spark, base, str(tmp_path / "inc"), **CFG)
    manifest = export_training_incremental(spark, delta, str(tmp_path / "inc"))

    assert _docs_set(spark, str(tmp_path / "full")) == _docs_set(
        spark, str(tmp_path / "inc")
    )
    assert _chunks_set(spark, str(tmp_path / "full")) == _chunks_set(
        spark, str(tmp_path / "inc")
    )

    # manifest totals converge to the full export's
    from ftm_datalake_spark.pipelines.training_export import _read_manifest

    full_m = _read_manifest(spark, str(tmp_path / "full" / "manifest.json"))
    assert manifest["stages"]["total_tokens"] == full_m["stages"]["total_tokens"]
    assert manifest["stages"]["chunks"] == full_m["stages"]["chunks"]
    gen = manifest["generations"][0]
    assert gen["delta_input"] == 12 and gen["docs_added"] == 12
    # Δ must not land in every shard for the partial-rewrite claim to
    # have been exercised (12 docs over 4 shards could fill all 4 —
    # the seeded md5 fold makes this deterministic, so just assert it)
    assert 0 < len(gen["affected_shards"]) <= 4


def test_incremental_is_idempotent_and_partial(spark, tmp_path):
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(30), "c")
    delta = _corpus(spark, [200], "d")  # one doc -> exactly one shard
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)

    m1 = export_training_incremental(spark, delta, out)
    affected = m1["generations"][0]["affected_shards"]
    assert len(affected) == 1

    # untouched shards' files were not rewritten (dynamic overwrite)
    untouched = [s for s in range(CFG["n_shards"]) if s not in affected]
    assert untouched
    before = {
        d: sorted(glob.glob(os.path.join(out, d, f"shard={untouched[0]}", "*")))
        for d in ("docs", "chunks")
    }
    docs_before = _docs_set(spark, out)

    # re-delivering the same delta is a no-op (ledger anti-join)
    m2 = export_training_incremental(spark, delta, out)
    assert m2["generations"][1]["delta_fresh"] == 0
    assert m2["generations"][1]["affected_shards"] == []
    assert _docs_set(spark, out) == docs_before
    for d in ("docs", "chunks"):
        assert (
            sorted(glob.glob(os.path.join(out, d, f"shard={untouched[0]}", "*")))
            == before[d]
        )


def test_incremental_first_write_wins_on_duplicate_content(spark, tmp_path):
    """A Δ doc whose text duplicates an exported doc is dropped — its
    segments all hit frequency 2 against the exported corpus, so it
    cleans to nothing. The exported original is NOT retroactively
    re-cleaned (the documented frequency-ledger approximation)."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(10), "c")
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)
    dup_text = base.where(F.col("doc_id") == 3).first()["text"]
    delta = spark.createDataFrame(
        [(300, dup_text)], "doc_id long, text string"
    )
    m = export_training_incremental(spark, delta, out)
    assert m["generations"][0]["after_dedup"] == 0
    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.where(F.col("doc_id") == 300).count() == 0
    assert docs.where(F.col("doc_id") == 3).count() == 1


@pytest.fixture()
def viewfs(spark, tmp_path):
    import uuid

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./data"
    hconf.set(key, tmp_path.as_uri())
    yield f"viewfs://{name}/data"
    hconf.unset(key)


def test_export_e2e_over_viewfs(spark, tmp_path, viewfs):
    """Full export + epoch maps + reader + incremental fold over a
    non-file:// URI: every artifact probe and manifest round-trip goes
    through the Hadoop FS client, never os.listdir/open (brief #6)."""
    from ftm_datalake_spark.pipelines.training_export import (
        _read_manifest,
        export_epoch_maps,
        export_training,
        export_training_incremental,
        read_training_chunks,
    )

    out = viewfs + "/exp"
    base = _corpus(spark, range(12), "c")
    m = export_training(spark, base, out, **CFG)
    assert m["stages"]["after_dedup"] == 12 and m["stages"]["chunks"] > 0

    maps = export_epoch_maps(spark, out, ["e1"])
    assert maps["epochs"]["e1"]["chunks"] > 0

    pieces = read_training_chunks(spark, out)
    assert pieces.count() >= 12

    m2 = export_training_incremental(
        spark, _corpus(spark, [500, 501], "d"), out
    )
    assert m2["generations"][0]["docs_added"] == 2
    assert m2["generations"][0]["stale_epochs"] == ["e1"]
    man = _read_manifest(spark, out + "/manifest.json")
    assert man["stages"]["after_dedup"] == 14


def test_export_training_delta_cli(spark, tmp_path):
    import argparse

    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.training_export import export_training

    out = str(tmp_path / "cliexp")
    export_training(spark, _corpus(spark, range(8), "c"), out, **CFG)
    delta_path = str(tmp_path / "delta.parquet")
    _corpus(spark, [900, 901], "d").write.parquet(delta_path)

    rc = _dispatch(
        spark,
        argparse.Namespace(
            cmd="export-training-delta",
            source=delta_path,
            out=out,
            benchmark=None,
        ),
    )
    assert rc in (0, None)
    from ftm_datalake_spark.pipelines.training_export import _read_manifest

    man = _read_manifest(spark, os.path.join(out, "manifest.json"))
    assert man["generations"][0]["docs_added"] == 2
    assert man["stages"]["after_dedup"] == 10


def test_segment_ledger_written_and_exact(spark, tmp_path):
    """The full export persists segledger/ == segment_frequencies of
    the post-quality corpus, and the delta fold sums its counts in."""
    from ftm_datalake_spark.operators.textops import segment_frequencies
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(10), "c")
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)

    ledger = {
        (r["seg_key"], r["n"])
        for r in spark.read.parquet(os.path.join(out, "segledger")).collect()
    }
    expect = {
        (r["seg_key"], r["n"]) for r in segment_frequencies(base).collect()
    }
    assert ledger == expect

    from ftm_datalake_spark.pipelines.training_export import (
        compact_segment_ledger,
        read_segment_ledger,
    )

    export_training_incremental(spark, _corpus(spark, [700], "d"), out)
    combined = base.unionByName(_corpus(spark, [700], "d"))
    want = {
        (r["seg_key"], r["n"]) for r in segment_frequencies(combined).collect()
    }
    # the fold APPENDED one generation of delta counts (O(|delta|)
    # write); the summed view equals the full-corpus frequencies
    assert {
        (r["seg_key"], r["n"])
        for r in read_segment_ledger(spark, out).collect()
    } == want
    raw = spark.read.parquet(os.path.join(out, "segledger"))
    assert raw.count() > len(want) - 1  # base + delta generations coexist

    # compaction folds the generations into one; the view is unchanged
    n = compact_segment_ledger(spark, out)
    assert n == len(want)
    assert {
        (r["seg_key"], r["n"])
        for r in spark.read.parquet(os.path.join(out, "segledger")).collect()
    } == want


def test_ledger_beats_cleaned_text_fallback(spark, tmp_path):
    """Differential case: a boilerplate segment stripped from the
    exported CLEANED text survives only in the ledger. A delta doc
    carrying that segment must still have it stripped (full-export
    semantics: corpus frequency 3), which re-scanning the cleaned text
    could never know."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    boiler = " ".join(f"b{i}" for i in range(8))
    u1 = " ".join(f"u{i}" for i in range(8))
    u2 = " ".join(f"v{i}" for i in range(8))
    u3 = " ".join(f"w{i}" for i in range(8))
    base = spark.createDataFrame(
        [(1, f"{boiler} {u1}"), (2, f"{boiler} {u2}")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "exp")
    export_training(spark, base, out, seq_len=16, n_shards=2, quality_gate=False)
    # boiler stripped from the shipped text of both docs
    shipped = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }
    assert shipped == {1: u1, 2: u2}

    delta = spark.createDataFrame(
        [(300, f"{boiler} {u3}")], "doc_id long, text string"
    )
    m = export_training_incremental(spark, delta, out)
    assert m["generations"][0]["docs_added"] == 1
    shipped = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }
    assert shipped[300] == u3  # boiler stripped via the ledger counts


def test_ledger_chains_across_folds(spark, tmp_path):
    """Fold 2 sees fold 1's segments: a doc duplicating a FOLD-1 doc
    cleans to nothing and is dropped, exactly like one duplicating the
    original corpus."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    out = str(tmp_path / "exp")
    export_training(spark, _corpus(spark, range(8), "c"), out, **CFG)
    d1 = _corpus(spark, [400], "d")
    export_training_incremental(spark, d1, out)
    dup = spark.createDataFrame(
        [(500, d1.first()["text"])], "doc_id long, text string"
    )
    m = export_training_incremental(spark, dup, out)
    assert m["generations"][1]["after_dedup"] == 0


def test_refresh_epoch_maps_after_fold(spark, tmp_path):
    """A delta fold stales extra epoch maps; refresh_epoch_maps
    re-derives them over the updated corpus — the refreshed map covers
    the delta's docs and equals a from-scratch export_epoch_maps."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_epoch_maps,
        export_training,
        export_training_incremental,
        refresh_epoch_maps,
    )

    out = str(tmp_path / "exp")
    export_training(spark, _corpus(spark, range(10), "c"), out, **CFG)
    export_epoch_maps(spark, out, ["e9"])
    stale = spark.read.parquet(
        os.path.join(out, "epochs", "epoch=e9", "assignment")
    ).count()

    export_training_incremental(spark, _corpus(spark, [800, 801], "d"), out)
    res = refresh_epoch_maps(spark, out)
    assert set(res["epochs"]) == {"e9"}
    assign = spark.read.parquet(
        os.path.join(out, "epochs", "epoch=e9", "assignment")
    )
    assert assign.count() == stale + 2
    assert assign.where(F.col("doc_id").isin([800, 801])).count() == 2


def test_stream_training_deltas(spark, tmp_path):
    """Streaming fold: deltas dropped as parquet files are folded
    micro-batch by micro-batch (maxFilesPerTrigger=1) and the result
    equals sequential batch folds; a checkpointed re-run of the drained
    stream folds nothing new (exactly-once per doc)."""
    from ftm_datalake_spark.pipelines.training_export import (
        _read_manifest,
        export_training,
        stream_training_deltas,
    )

    out = str(tmp_path / "exp")
    export_training(spark, _corpus(spark, range(10), "c"), out, **CFG)

    drop = tmp_path / "drop"
    drop.mkdir()

    def drop_delta(df, name):
        # the file stream source lists FLAT files in the drop dir —
        # stage the delta then move its part file in, the usual
        # "atomic drop" pattern for file-source ingestion
        import shutil

        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(drop / f"{name}.parquet"))

    drop_delta(_corpus(spark, [600, 601], "d"), "batch1")
    drop_delta(_corpus(spark, [700], "e"), "batch2")

    q = stream_training_deltas(
        spark, str(drop), out, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    man = _read_manifest(spark, os.path.join(out, "manifest.json"))
    assert man["stages"]["after_dedup"] == 13
    gens = man["generations"]
    assert sum(g["docs_added"] for g in gens) == 3
    assert len(gens) >= 2  # one fold per micro-batch

    # drained stream restarted with the same checkpoint: no re-folds
    q2 = stream_training_deltas(spark, str(drop), out)
    q2.awaitTermination(120)
    man2 = _read_manifest(spark, os.path.join(out, "manifest.json"))
    assert sum(g["docs_added"] for g in man2["generations"]) == 3
    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == 13


def _segledger_counts(spark, out):
    from ftm_datalake_spark.pipelines.training_export import (
        read_segment_ledger,
    )

    return {
        (r["seg_key"], r["n"])
        for r in read_segment_ledger(spark, out).collect()
    }


def test_redelivered_dropped_delta_never_inflates_ledger(spark, tmp_path):
    """ADVICE r8 #1a: a delta whose docs were ALL dropped by dedup must
    not re-append its segment counts on re-delivery — neither as the
    same batch (delta_id commit record) nor smuggled inside a later
    partially-overlapping batch (sig-ledger processed-ids anti-join)."""
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(10), "c")
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)

    dup_text = base.where(F.col("doc_id") == 3).first()["text"]
    dup = spark.createDataFrame([(300, dup_text)], "doc_id long, text string")
    m1 = export_training_incremental(spark, dup, out)
    assert m1["generations"][0]["after_dedup"] == 0  # dropped by dedup
    counts_once = _segledger_counts(spark, out)

    # same batch again: commit-record no-op, counts untouched
    m2 = export_training_incremental(spark, dup, out)
    g = m2["generations"][1]
    assert g["replayed"] is True and g["delta_fresh"] == 0
    assert _segledger_counts(spark, out) == counts_once

    # the dropped doc riding along in a NEW batch: still exactly-once
    mixed = spark.createDataFrame(
        [(300, dup_text), (400, "mix400a mix400b mix400c mix400d")],
        "doc_id long, text string",
    )
    m3 = export_training_incremental(spark, mixed, out)
    g3 = m3["generations"][2]
    assert g3["delta_fresh"] == 1  # only doc 400 is new work
    after = _segledger_counts(spark, out)
    # doc 3/300's segments were counted exactly twice (base + one fold),
    # never a third time — so no segment of theirs reaches max_freq by
    # replay alone
    dup_counts = {n for k, n in after if (k, 2) in counts_once}
    assert dup_counts == {2}


@pytest.mark.slow
def test_crash_between_shard_writes_and_ledger_append_replays(spark, tmp_path):
    """ADVICE r8 #1b: a crash after the shard writes but before the
    ledger appends must NOT lose the delta's counts. The replayed fold
    re-runs the whole delta (sig ledger has no record of it), rewrites
    the affected shards idempotently (no duplicated docs), and lands
    the counts exactly once — final state equals the uncrashed fold's."""
    import shutil

    from ftm_datalake_spark.pipelines.training_export import (
        _read_manifest,
        _write_manifest,
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(20), "c")
    delta = _corpus(spark, [500, 501, 502], "d")
    good, crash = str(tmp_path / "good"), str(tmp_path / "crash")
    export_training(spark, base, good, **CFG)
    export_training(spark, base, crash, **CFG)

    export_training_incremental(spark, delta, good)  # the oracle

    # build the crash state on the twin: full fold, then erase the
    # ledger generations AND the manifest entry => exactly "crashed
    # after the shard writes, before the ledger appends"
    m = export_training_incremental(spark, delta, crash)
    delta_id = m["generations"][0]["delta_id"]
    for ledger in ("segledger", "sigledger"):
        gen_dir = os.path.join(crash, ledger, f"gen={delta_id}")
        assert os.path.isdir(gen_dir), f"fold did not write {ledger} gen"
        shutil.rmtree(gen_dir)
    # the pre-crash manifest is the base export's (the fold's commit
    # never happened): rebuild it from a base-only twin
    base_only = str(tmp_path / "baseonly")
    export_training(spark, base, base_only, **CFG)
    crash_manifest = _read_manifest(
        spark, os.path.join(base_only, "manifest.json")
    )
    _write_manifest(os.path.join(crash, "manifest.json"), crash_manifest, spark)

    # replay the delta into the crash state
    m2 = export_training_incremental(spark, delta, crash)
    g = m2["generations"][0]
    assert g["delta_fresh"] == 3 and "replayed" not in g

    assert _docs_set(spark, good) == _docs_set(spark, crash)
    assert _chunks_set(spark, good) == _chunks_set(spark, crash)
    assert _segledger_counts(spark, good) == _segledger_counts(spark, crash)
    mg = _read_manifest(spark, os.path.join(good, "manifest.json"))
    mc = _read_manifest(spark, os.path.join(crash, "manifest.json"))
    assert mg["stages"] == mc["stages"]


@pytest.mark.slow
def test_crash_after_ledgers_before_manifest_recovers(spark, tmp_path):
    """The other crash window: ledgers advanced, manifest commit lost.
    The replay must NOT double-append counts — it reconstructs the
    generation entry from the gen partitions (recovered=True)."""
    from ftm_datalake_spark.pipelines.training_export import (
        _read_manifest,
        _write_manifest,
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(15), "c")
    delta = _corpus(spark, [600, 601], "d")
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)
    pre_manifest = _read_manifest(spark, os.path.join(out, "manifest.json"))

    m = export_training_incremental(spark, delta, out)
    committed_stages = dict(m["stages"])
    docs_after = _docs_set(spark, out)
    counts_after = _segledger_counts(spark, out)

    # lose the commit: restore the pre-fold manifest (ledgers + shards stay)
    _write_manifest(os.path.join(out, "manifest.json"), pre_manifest, spark)

    m2 = export_training_incremental(spark, delta, out)
    g = m2["generations"][0]
    assert g["recovered"] is True
    assert g["delta_fresh"] == 2 and g["docs_added"] == 2
    assert sorted(g["affected_shards"])  # reconstructed from docs/
    assert _docs_set(spark, out) == docs_after
    assert _segledger_counts(spark, out) == counts_after  # exactly once
    assert m2["stages"] == committed_stages


def test_sig_ledger_bootstrap_for_legacy_exports(spark, tmp_path):
    """An export created before the sig ledger existed gets one
    bootstrap pass on its first fold; afterwards first-write-wins and
    freshness run off the ledger."""
    import shutil

    from ftm_datalake_spark.pipelines.training_export import (
        compact_sig_ledger,
        export_training,
        export_training_incremental,
    )

    base = _corpus(spark, range(8), "c")
    out = str(tmp_path / "exp")
    export_training(spark, base, out, **CFG)
    shutil.rmtree(os.path.join(out, "sigledger"))  # simulate legacy

    dup_text = base.where(F.col("doc_id") == 2).first()["text"]
    delta = spark.createDataFrame(
        [(700, dup_text), (701, "novel701a novel701b novel701c")],
        "doc_id long, text string",
    )
    m = export_training_incremental(spark, delta, out)
    assert m["generations"][0]["docs_added"] == 1  # dup dropped, novel kept
    sig = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(out, "sigledger")
    )
    assert sig.count() == 8 + 2  # bootstrap + the fold's generation
    assert compact_sig_ledger(spark, out) == 10


@pytest.mark.slow
def test_streamed_fold_reads_back_like_sequential_fold(spark, tmp_path):
    """VERDICT r8 #6 (compose streaming with the reader): a checkpointed
    streaming fold and the same deltas folded sequentially yield
    byte-equal shard token streams through read_training_chunks."""
    import shutil

    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
        read_training_chunks,
        stream_training_deltas,
    )

    base = _corpus(spark, range(10), "c")
    d1 = _corpus(spark, [600, 601], "d")
    d2 = _corpus(spark, [700], "e")
    seq_out, str_out = str(tmp_path / "seq"), str(tmp_path / "strm")
    export_training(spark, base, seq_out, **CFG)
    export_training(spark, base, str_out, **CFG)

    export_training_incremental(spark, d1, seq_out)
    export_training_incremental(spark, d2, seq_out)

    drop = tmp_path / "drop"
    drop.mkdir()
    for name, df in (("b1", d1), ("b2", d2)):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(drop / f"{name}.parquet"))
    q = stream_training_deltas(spark, str(drop), str_out, max_files_per_trigger=1)
    q.awaitTermination(120)

    def shard_streams(out):
        rows = read_training_chunks(spark, out).collect()
        streams = {}
        for r in sorted(
            rows, key=lambda r: (r["shard"], r["chunk_id"], r["cum_end"])
        ):
            streams.setdefault(int(r["shard"]), []).append(r["piece"])
        return {s: " ".join(ps) for s, ps in streams.items()}

    assert shard_streams(seq_out) == shard_streams(str_out)
    assert _docs_set(spark, seq_out) == _docs_set(spark, str_out)
    assert _chunks_set(spark, seq_out) == _chunks_set(spark, str_out)


def test_export_compact_cli(spark, tmp_path, capsys):
    """export-compact folds both ledgers' generations; reads unchanged."""
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.training_export import (
        export_training,
        export_training_incremental,
    )

    out = str(tmp_path / "exp")
    export_training(spark, _corpus(spark, range(8), "c"), out, **CFG)
    export_training_incremental(spark, _corpus(spark, [900], "d"), out)
    before = _segledger_counts(spark, out)

    capsys.readouterr()
    rc = _dispatch(
        spark, argparse.Namespace(cmd="export-compact", export_dir=out)
    )
    assert rc in (0, None)
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["segments"] == len(before)
    assert res["docs"] == 9  # 8 base + 1 fold, all processed docs
    assert _segledger_counts(spark, out) == before
    # single generation remains for each ledger
    for ledger in ("segledger", "sigledger"):
        gens = [
            n for n in os.listdir(os.path.join(out, ledger))
            if n.startswith("gen=")
        ]
        assert gens == ["gen=base"]
