"""CLI smoke test: crawl → ls → stats through `python -m ftm_datalake_spark`
(one subprocess per command is a fresh JVM, so keep this to one flow)."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
def test_cli_crawl_ls_stats(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"alpha")
    (src / "b.pdf").write_bytes(b"%PDF beta")
    lake = str(tmp_path / "lake")

    counters = json.loads(_run("crawl", str(src), "-d", "ds1", "--lake", lake).strip())
    assert counters == {"files_total": 2, "added_or_updated": 2, "not_found": 0}

    keys = _run("ls", "-d", "ds1", "--lake", lake, "--keys").split()
    assert keys == ["a.txt", "b.pdf"]

    stats = json.loads(_run("stats", "-d", "ds1", "--lake", lake).strip())
    assert stats["entity_count"] == 2
    assert {x["name"] for x in stats["things"]["schemata"]} == {"PlainText", "Pages"}


@pytest.mark.slow
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


@pytest.mark.slow
def test_cli_reference_verbs_flow(spark, tmp_path):
    """config / catalog / versions / diff / get / head — the remaining
    reference CLI verbs (ftm_datalake/cli.py:96-235), one subprocess
    flow over a crawled + archived lake."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "doc.txt").write_bytes(b"hello lake")
    lake = str(tmp_path / "lake")
    (tmp_path / "lake").mkdir()
    (tmp_path / "lake" / "ds1").mkdir()
    (tmp_path / "lake" / "ds1" / "config.yml").write_text(
        "name: ds1\ntitle: Dataset One\n"
    )

    counters = json.loads(
        _run("crawl", str(src), "-d", "ds1", "--lake", lake, "--archive").strip()
    )
    assert counters["added_or_updated"] == 1

    cfg = json.loads(_run("config", "-d", "ds1", "--lake", lake).strip())
    assert cfg["config"]["title"] == "Dataset One"

    assert _run("catalog", "--lake", lake, "--names-only").split() == ["ds1"]
    cat_rows = [
        json.loads(l) for l in _run("catalog", "--lake", lake).splitlines()
    ]
    assert cat_rows[0]["dataset"] == "ds1" and cat_rows[0]["file_count"] == 1

    info = json.loads(_run("head", "doc.txt", "-d", "ds1", "--lake", lake).strip())
    import hashlib

    assert info["content_hash"] == hashlib.sha1(b"hello lake").hexdigest()

    blob = _run("get", "doc.txt", "-d", "ds1", "--lake", lake)
    assert blob == "hello lake"

    # versions + diff over two programmatic snapshots
    from ftm_datalake_spark.operators.versions import write_version
    from ftm_datalake_spark.pipelines.ingest import read_documents

    docs = read_documents(spark, lake, "ds1")
    v1 = write_version(docs, lake, "ds1", version="v1")
    (src / "extra.txt").write_bytes(b"more")
    _run("crawl", str(src), "-d", "ds1", "--lake", lake)
    v2 = write_version(read_documents(spark, lake, "ds1"), lake, "ds1", version="v2")

    assert _run("versions", "-d", "ds1", "--lake", lake).split() == [v1, v2]
    ops = [
        json.loads(l)
        for l in _run("diff", "-d", "ds1", "--lake", lake, "-v", "v2").splitlines()
    ]
    assert [(o["op"], o["key"]) for o in ops] == [("added", "extra.txt")]


@pytest.mark.slow
def test_cli_sync_verbs(tmp_path):
    """memorious-sync imports sidecar metadata into the documents table;
    aleph-sync emits the exact upload payload with resolved folder ids."""
    meta_dir = tmp_path / "meta"
    meta_dir.mkdir()
    (meta_dir / "m1.json").write_text(
        json.dumps(
            {
                "url": "http://host/docs/report.pdf",
                "content_hash": "ab" * 20,
                "_file_name": "report.pdf",
                "headers": {"Content-Length": "77", "Content-Type": "application/pdf"},
                "retrieved_at": "2024-01-02T03:04:05Z",
                "request_id": "r1",
            }
        )
        + "\n"
    )
    lake = str(tmp_path / "lake")

    out = json.loads(
        _run("memorious-sync", str(meta_dir) + "/*.json", "-d", "ds1", "--lake", lake).strip()
    )
    assert out == {"imported": 1}
    keys = _run("ls", "-d", "ds1", "--lake", lake, "--keys").split()
    assert keys == ["docs/report.pdf"]

    payload = [
        json.loads(l)
        for l in _run("aleph-sync", "-d", "ds1", "--lake", lake).splitlines()
    ]
    assert len(payload) == 1
    assert payload[0]["file_name"] == "report.pdf"
    assert payload[0]["parent_id"]  # resolved parent folder id
