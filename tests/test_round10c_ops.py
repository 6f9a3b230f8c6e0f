"""Round-10 third-wave laws: JL random projection, video scene cuts,
and the plan-shape lint."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from ftm_datalake_spark.operators.randproj import (
    jl_sign,
    jl_sign_matrix,
    random_project,
)


# ------------------------------------------------------------------- JL
def test_jl_signs_are_plus_minus_one_and_deterministic():
    m = jl_sign_matrix(8, 32)
    assert all(s in (1, -1) for row in m for s in row)
    assert m == jl_sign_matrix(8, 32)
    # both signs actually occur (a constant matrix projects onto a line)
    flat = [s for row in m for s in row]
    assert 1 in flat and -1 in flat
    assert jl_sign(3, 7) == m[2][6]


def test_jl_projection_is_linear(spark):
    # projection of (a+b) equals proj(a) + proj(b) — exact integers,
    # quantization is linear for values that are multiples of 1/1000
    a = [i / 1000 for i in range(1, 17)]
    b = [(17 - i) / 1000 for i in range(1, 17)]
    ab = [x + y for x, y in zip(a, b)]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, ab)], "vec_id long, embedding array<double>"
    )
    out = random_project(df, d=16, k=4).collect()
    proj = {(r["vec_id"], r["dim"]): r["proj_q"] for r in out}
    for j in range(1, 5):
        assert proj[(0, j)] + proj[(1, j)] == proj[(2, j)]


def test_jl_preserves_identical_vectors(spark):
    v = [float(i) for i in range(64)]
    df = spark.createDataFrame(
        [(0, v), (1, v)], "vec_id long, embedding array<double>"
    )
    out = random_project(df, d=64, k=16).collect()
    proj = {(r["vec_id"], r["dim"]): r["proj_q"] for r in out}
    assert all(proj[(0, j)] == proj[(1, j)] for j in range(1, 17))


# ----------------------------------------------------------- scene cuts
def _p6(v: int, frames: int = 1) -> bytes:
    return (b"P6\n2 2\n255\n" + bytes([v] * 12)) * frames


def test_scene_cuts_flat_video_has_none(spark):
    from ftm_datalake_spark.operators.multimodal import video_scene_cuts

    media = spark.createDataFrame(
        [("m0", "video", _p6(100) * 5)],
        "media_id string, modality string, content binary",
    )
    row = video_scene_cuts(media, threshold_x1000=50_000).collect()[0]
    assert row["n_frames"] == 5
    assert row["n_cuts"] == 0
    assert row["first_cut_idx"] is None


def test_scene_cuts_two_planted_jumps(spark):
    from ftm_datalake_spark.operators.multimodal import video_scene_cuts

    # lumas 10,10,200,200,40 → cuts at frames 2 and 4
    payload = _p6(10) + _p6(10) + _p6(200) + _p6(200) + _p6(40)
    media = spark.createDataFrame(
        [("m0", "video", payload)],
        "media_id string, modality string, content binary",
    )
    row = video_scene_cuts(media, threshold_x1000=100_000).collect()[0]
    assert row["n_cuts"] == 2
    assert row["first_cut_idx"] == 2


def test_scene_cuts_threshold_monotone(spark):
    from ftm_datalake_spark.operators.multimodal import video_scene_cuts

    payload = _p6(10) + _p6(60) + _p6(200)
    media = spark.createDataFrame(
        [("m0", "video", payload)],
        "media_id string, modality string, content binary",
    )
    loose = video_scene_cuts(media, threshold_x1000=40_000).collect()[0]
    tight = video_scene_cuts(media, threshold_x1000=120_000).collect()[0]
    assert loose["n_cuts"] >= tight["n_cuts"]
    assert loose["n_cuts"] == 2 and tight["n_cuts"] == 1


# ------------------------------------------------------------------ lint
def test_lint_flags_cartesian(spark):
    from ftm_datalake_spark.plans.lint import lint_plan

    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.join(b)  # no condition, no broadcast → cartesian
        report = lint_plan(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert report["cartesian_products"] >= 1
    assert not report["ok"]
    assert any(p.startswith("FAIL") for p in report["problems"])


def test_lint_clean_agg_is_ok(spark):
    from ftm_datalake_spark.plans.lint import lint_plan

    df = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
    report = lint_plan(df)
    assert report["ok"] and report["problems"] == []
    assert report["shuffle_exchanges"] >= 1


def test_query_lint_cli(spark, capsys, sf_dir):
    from ftm_datalake_spark.__main__ import _dispatch

    args = argparse.Namespace(
        cmd="query",
        name="q3_shipping_priority",
        sf_dir=sf_dir,
        limit=20,
        explain=False,
        oracle=False,
        lint=True,
    )
    assert _dispatch(spark, args) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["query"] == "q3_shipping_priority"
    assert out["ok"] is True
    assert out["cartesian_products"] == 0
