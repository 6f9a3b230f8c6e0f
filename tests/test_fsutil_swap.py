"""Crash-window laws for the round-9 fsutil additions: hidden-entry
semantics of dir_has_data, the _SUCCESS-gated dir_committed probe, and
the replace_dir/heal_dir staged-swap pair that makes ledger compaction
lose-nothing at every crash point."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ftm_datalake_spark import fsutil


def _write(spark, path, rows=3):
    spark.range(rows).select(F.col("id").alias("v")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _vals(spark, path):
    return sorted(r["v"] for r in spark.read.parquet(path).collect())


# ---------------------------------------------------------- dir_has_data


def test_dir_has_data_ignores_temporary_staging(spark, tmp_path):
    """A write that crashed mid-job leaves only _temporary — that is
    NOT data, else a re-delivered delta would skip a half-written
    generation."""
    d = str(tmp_path / "gen")
    os.makedirs(os.path.join(d, "_temporary", "0"))
    assert not fsutil.dir_has_data(spark, d)
    # a _SUCCESS husk alone is not data either
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert not fsutil.dir_has_data(spark, d)
    _write(spark, d)
    assert fsutil.dir_has_data(spark, d)


def test_dir_committed_requires_success_marker(spark, tmp_path):
    d = str(tmp_path / "gen")
    _write(spark, d)
    assert fsutil.dir_committed(spark, d)
    os.remove(os.path.join(d, "_SUCCESS"))
    # parts without the job-commit marker: crashed mid-commit — treat
    # as not written
    assert fsutil.dir_has_data(spark, d)
    assert not fsutil.dir_committed(spark, d)


# ---------------------------------------------------------- swap / heal


def test_replace_dir_swaps_and_cleans_up(spark, tmp_path):
    target, staged = str(tmp_path / "ledger"), str(tmp_path / "ledger.__new__")
    _write(spark, target, rows=2)
    _write(spark, staged, rows=5)
    fsutil.replace_dir(spark, target, staged)
    assert _vals(spark, target) == [0, 1, 2, 3, 4]
    assert not os.path.exists(staged)
    assert not os.path.exists(target + ".__old__")


def test_heal_recovers_crash_between_renames(spark, tmp_path):
    """Crash point: target renamed away, staged not yet renamed in —
    the ONLY state lives in .__old__. heal_dir must restore it."""
    target = str(tmp_path / "ledger")
    _write(spark, target + ".__old__", rows=4)  # parked pre-swap state
    healed = fsutil.heal_dir(spark, target)
    assert healed == target
    assert _vals(spark, target) == [0, 1, 2, 3]
    assert not os.path.exists(target + ".__old__")


def test_heal_prefers_live_target_over_stale_old(spark, tmp_path):
    """After a COMPLETED swap plus later writes, a leftover .__old__
    must never shadow the live ledger."""
    target = str(tmp_path / "ledger")
    _write(spark, target, rows=5)
    _write(spark, target + ".__old__", rows=2)
    assert fsutil.heal_dir(spark, target) == target
    assert _vals(spark, target) == [0, 1, 2, 3, 4]


def test_replace_dir_after_crashed_swap_keeps_state_until_staged_lands(
    spark, tmp_path
):
    """A NEW swap attempted on top of a previously crashed one must not
    delete .__old__ (the only state) before the staged data is in
    place."""
    target = str(tmp_path / "ledger")
    _write(spark, target + ".__old__", rows=3)  # crashed prior swap
    staged = str(tmp_path / "ledger.__new__")
    _write(spark, staged, rows=6)
    fsutil.replace_dir(spark, target, staged)
    assert _vals(spark, target) == [0, 1, 2, 3, 4, 5]
    assert not os.path.exists(target + ".__old__")


# ------------------------------------------- compaction crash e2e laws


def test_classifier_compact_crash_between_renames_loses_nothing(
    spark, tmp_path
):
    """Simulate a compaction crash at the worst point (ledger renamed
    away, staged not yet in): the next read heals and the model is
    unchanged; a re-run compaction then completes."""
    import shutil

    from ftm_datalake_spark.pipelines.classifier_store import (
        append_classifier_model,
        build_classifier_model,
        compact_classifier_ledger,
        read_classifier_model,
    )

    docs = spark.createDataFrame(
        [(1, "A", "alpha beta"), (2, "B", "beta gamma")],
        "doc_id long, lang string, text string",
    )
    delta = spark.createDataFrame(
        [(9, "A", "gamma gamma")], "doc_id long, lang string, text string"
    )
    d = str(tmp_path / "m")
    build_classifier_model(spark, docs, d)
    append_classifier_model(spark, delta, d)
    before = sorted(tuple(r) for r in read_classifier_model(spark, d).collect())

    ledger = os.path.join(d, "tokledger")
    shutil.move(ledger, ledger + ".__old__")  # the crash point

    after = sorted(tuple(r) for r in read_classifier_model(spark, d).collect())
    assert after == before  # healed read
    assert os.path.isdir(ledger) and not os.path.exists(ledger + ".__old__")

    compact_classifier_ledger(spark, d)
    final = sorted(tuple(r) for r in read_classifier_model(spark, d).collect())
    assert final == before


def test_export_ledger_compact_crash_heals(spark, tmp_path):
    import shutil

    from ftm_datalake_spark.pipelines.training_export import (
        compact_segment_ledger,
        export_training,
        read_segment_ledger,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(20)))
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "exp")
    export_training(
        spark, docs, out, seq_len=64, n_shards=2, quality_gate=False
    )
    before = {
        (r["seg_key"], r["n"])
        for r in read_segment_ledger(spark, out).collect()
    }
    ledger = os.path.join(out, "segledger")
    shutil.move(ledger, ledger + ".__old__")
    after = {
        (r["seg_key"], r["n"])
        for r in read_segment_ledger(spark, out).collect()
    }
    assert after == before
    n = compact_segment_ledger(spark, out)
    assert n == len(before)
    assert {
        (r["seg_key"], r["n"])
        for r in read_segment_ledger(spark, out).collect()
    } == before
