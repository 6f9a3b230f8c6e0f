"""CLI smoke test: crawl → ls → stats through `python -m ftm_datalake_spark`
(one subprocess per command is a fresh JVM, so keep this to one flow)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(*argv: str) -> str:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "ftm_datalake_spark", *argv],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env=env,
        timeout=180,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_crawl_ls_stats(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"alpha")
    (src / "b.pdf").write_bytes(b"%PDF beta")
    lake = str(tmp_path / "lake")

    counters = json.loads(_run("crawl", str(src), "-d", "ds1", "--lake", lake).strip())
    assert counters == {"files_total": 2, "added_or_updated": 2}

    keys = _run("ls", "-d", "ds1", "--lake", lake, "--keys").split()
    assert keys == ["a.txt", "b.pdf"]

    stats = json.loads(_run("stats", "-d", "ds1", "--lake", lake).strip())
    assert stats["entity_count"] == 2
    assert {x["name"] for x in stats["things"]["schemata"]} == {"PlainText", "Pages"}


def test_cli_optimize_flow(spark, tmp_path):
    src = str(tmp_path / "tbl")
    spark.range(2000).selectExpr(
        "id", "id % 64 as x", "(id * 7) % 64 as y"
    ).write.parquet(src)

    out_dir = str(tmp_path / "zordered")
    assert _run(
        "optimize", "zorder", src, "--out", out_dir,
        "--cols", "x,y", "--bits", "6", "--partitions", "4",
    ).strip() == out_dir
    assert spark.read.parquet(out_dir).count() == 2000

    idx_lines = [
        json.loads(l)
        for l in _run("optimize", "index", out_dir, "--cols", "x,y").splitlines()
    ]
    assert {r["column"] for r in idx_lines} == {"x", "y"}
    assert sum(r["num_rows"] for r in idx_lines if r["column"] == "x") == 2000

    plan_lines = [
        json.loads(l)
        for l in _run("optimize", "compact-plan", out_dir, "--target-mb", "1").splitlines()
    ]
    assert sum(r["n_files"] for r in plan_lines) == len(
        [r for r in idx_lines if r["column"] == "x"]
    )
