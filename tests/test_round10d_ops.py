"""Round-10 wave-5 laws: audio VAD run-packing, Welch's t-test, and
the Zipf head-slope fit."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F


def _wav(samples: list[int], rate: int = 8000) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _media(spark, samples):
    return spark.createDataFrame(
        [("m0", "audio", _wav(samples))],
        "media_id string, modality string, content binary",
    )


def test_vad_merges_adjacent_active_runs(spark):
    from ftm_datalake_spark.operators.multimodal import (
        audio_activity_segments,
    )

    # active 0-2, silence 3, active 4-7 (two runs, second is two
    # adjacent above-threshold stretches that must merge into one)
    samples = [100, 90, 80, 0, 60, 70, 200, 55]
    rows = sorted(
        audio_activity_segments(_media(spark, samples), threshold=50)
        .collect(),
        key=lambda r: r["seg_id"],
    )
    got = [(r["start_idx"], r["end_idx"], r["n_samples"]) for r in rows]
    assert got == [(0, 2, 3), (4, 7, 4)]


def test_vad_negative_amplitudes_count_as_active(spark):
    from ftm_datalake_spark.operators.multimodal import (
        audio_activity_segments,
    )

    samples = [-100, -90, 0, 0, 100]
    rows = audio_activity_segments(_media(spark, samples), 50).collect()
    got = {(r["start_idx"], r["end_idx"]) for r in rows}
    assert got == {(0, 1), (4, 4)}


def test_vad_all_silence_yields_no_segments(spark):
    from ftm_datalake_spark.operators.multimodal import (
        audio_activity_segments,
    )

    assert (
        audio_activity_segments(_media(spark, [0] * 8), 50).count() == 0
    )


def test_welch_matches_scipy_formula(spark, sf_dir):
    """Cross-check t and df against a plain-Python recomputation from
    the raw values (the textbook Welch formulas)."""
    from ftm_datalake_spark.plans import REGISTRY
    from ftm_datalake_spark.sources.tables import load_table

    row = REGISTRY["eval_welch_ttest"].builder(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    vals = {
        et: [
            float(r["c"]) for r in ev.where(F.col("event_type") == et)
            .select((F.col("value").cast("decimal(18,2)") * 100)
                    .cast("long").alias("c")).collect()
        ]
        for et in ("purchase", "click")
    }

    def mv(x):
        n = len(x)
        m = sum(x) / n
        v = sum((e - m) ** 2 for e in x) / (n - 1)
        return n, m, v

    n1, m1, v1 = mv(vals["purchase"])
    n2, m2, v2 = mv(vals["click"])
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / (se1 + se2) ** 0.5
    df = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["t_stat"] - t) < 1e-9 * max(1.0, abs(t))
    assert abs(row["welch_df"] - df) < 1e-6 * df


def test_zipf_slope_is_negative_and_bounded(spark, sf_dir):
    from ftm_datalake_spark.plans import REGISTRY

    row = REGISTRY["text_zipf_slope"].builder(spark, sf_dir).collect()[0]
    # frequencies fall with rank: the fitted head slope must be
    # negative and not absurdly steep for a word-frequency table
    assert row["slope_milli"] < 0
    assert row["slope_milli"] > -5000
    assert row["head_ranks"] <= 1000
    assert row["vocab_size"] >= row["head_ranks"]


def test_zipf_slope_exact_on_synthetic_powerlaw(spark):
    """freq = 2^(10 - log2(rank)) exactly → y = 10 - x on every point
    → slope exactly -1 (milli = -1000)."""
    from ftm_datalake_spark.plans import REGISTRY
    import tempfile, os

    words = []
    # rank r gets frequency 1024 // r rounded to a power of two:
    # construct explicit counts so flog2(f) = 10 - flog2(r_group)
    r = 1
    for x in range(0, 6):  # rank groups 2^x .. 2^(x+1)-1
        for _ in range(2**x):
            words.extend([f"w{r:04d}"] * (2 ** (10 - x)))
            r += 1
    text = " ".join(words)
    df = spark.createDataFrame(
        [(0, text, "en", "s0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        row = REGISTRY["text_zipf_slope"].builder(spark, d).collect()[0]
    assert row["slope_milli"] == -1000


def test_dsir_cli_roundtrip(spark, tmp_path, capsys):
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch

    src = str(tmp_path / "docs.parquet")
    rows = [(i, " ".join(f"a{j} b{j}" for j in range(6)), "zh", "s0", 50)
            for i in range(5)]
    rows += [(i, " ".join(f"x{i}y{j} z{j}" for j in range(6)), "en", "s1", 50)
            for i in range(5, 20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.parquet(src)
    out = str(tmp_path / "weights.parquet")
    args = argparse.Namespace(
        cmd="dsir", source=src, out=out,
        target_lang="zh", target_source=None, top_k=5,
    )
    assert _dispatch(spark, args) in (0, None)
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 5
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1, 2, 3, 4}  # the zh slice outranks everything


def test_dsir_cli_requires_exactly_one_target(spark, tmp_path):
    import argparse

    from ftm_datalake_spark.__main__ import _dispatch

    args = argparse.Namespace(
        cmd="dsir", source=str(tmp_path / "nope.parquet"),
        out=str(tmp_path / "o"), target_lang=None, target_source=None,
        top_k=None,
    )
    assert _dispatch(spark, args) == 2
