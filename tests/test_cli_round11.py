"""Round-11 CLI verbs: export-webdataset and cdc-apply round-trips
through _dispatch (the object-store-hardened sinks as product verbs)."""

from __future__ import annotations

import argparse
import json
import os


def test_export_webdataset_cli_roundtrip(spark, capsys, tmp_path, sf_dir):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.sources.sinks import read_webdataset_shards

    out_dir = str(tmp_path / "wds")
    args = argparse.Namespace(
        cmd="export-webdataset",
        source=os.path.join(sf_dir, "documents.parquet"),
        out=out_dir,
        shard_size=200,
        key_col="doc_id",
        text_col="text",
        s3_endpoint=None,
    )
    assert _dispatch(spark, args) in (0, None)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["shards"] == 3 and res["samples"] == 500  # 200+200+100
    assert len(res["sha256"]) == 3
    back = read_webdataset_shards(spark, out_dir)
    assert back.where("member = 'txt'").count() == 500


def test_cdc_apply_cli_both_modes(spark, capsys, tmp_path):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.streaming.cdc import init_partitioned_snapshot

    feed = tmp_path / "feed"
    feed.mkdir()
    changes = [
        {"key": "a", "seq": 1, "op": "U", "val": "v1x"},
        {"key": "b", "seq": 1, "op": "D", "val": None},
        {"key": "d", "seq": 1, "op": "I", "val": "v4"},
    ]
    (feed / "b1.json").write_text(
        "\n".join(json.dumps(c) for c in changes) + "\n"
    )
    base = spark.createDataFrame(
        [("a", "v1"), ("b", "v2"), ("c", "v3")], "key string, val string"
    )
    want = {"a": "v1x", "c": "v3", "d": "v4"}
    schema = "key string, seq long, op string, val string"

    swap_snap = str(tmp_path / "snap_swap")
    base.write.parquet(swap_snap)
    args = argparse.Namespace(
        cmd="cdc-apply", snapshot=swap_snap, feed=str(feed),
        checkpoint=str(tmp_path / "ck1"), keys="key", schema=schema,
        buckets=None,
    )
    assert _dispatch(spark, args) in (0, None)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res == {"snapshot": swap_snap, "rows": 3, "mode": "swap"}
    got = {r.key: r.val for r in spark.read.parquet(swap_snap).collect()}
    assert got == want

    part_snap = str(tmp_path / "snap_part")
    init_partitioned_snapshot(base, part_snap, ["key"], n_buckets=4)
    args = argparse.Namespace(
        cmd="cdc-apply", snapshot=part_snap, feed=str(feed),
        checkpoint=str(tmp_path / "ck2"), keys="key", schema=schema,
        buckets=4,
    )
    assert _dispatch(spark, args) in (0, None)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["mode"] == "partitioned" and res["rows"] == 3
    got = {
        r.key: r.val
        for r in spark.read.parquet(part_snap).select("key", "val").collect()
    }
    assert got == want


def test_export_zip_cli_roundtrip(spark, capsys, tmp_path):
    """export-zip had no dispatch test; the r11 review also changed its
    call to pass the session (URI-aware staging). Local round-trip:
    crawl a source, export, re-open the zip."""
    import zipfile

    from ftm_datalake_spark.__main__ import _dispatch

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"alpha")
    (src / "b.txt").write_bytes(b"bravo")
    lake = str(tmp_path / "lake")
    args = argparse.Namespace(
        cmd="crawl", source=str(src), dataset="ds1", lake=lake,
        include=None, exclude=None, archive=False, s3_endpoint=None,
        inventory=None,
    )
    assert _dispatch(spark, args) in (0, None)
    capsys.readouterr()
    out_zip = str(tmp_path / "ds1.zip")
    args = argparse.Namespace(
        cmd="export-zip", dataset="ds1", lake=lake, out=out_zip,
    )
    assert _dispatch(spark, args) in (0, None)
    assert capsys.readouterr().out.strip().splitlines()[-1] == out_zip
    with zipfile.ZipFile(out_zip) as zf:
        names = zf.namelist()
    assert "documents.csv" in names
    body = zipfile.ZipFile(out_zip).read("documents.csv").decode()
    assert "a.txt" in body and "b.txt" in body
