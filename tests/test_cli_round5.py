"""Round-5 CLI verbs through _dispatch (in-session, no subprocess JVM):
http-source crawl routing (+ --archive over HTTP), serve, forget/gc,
and the dq profile/skew reports."""

from __future__ import annotations

import argparse
import hashlib
import http.server
import json
import os
import threading

import pytest


def _args(**kw) -> argparse.Namespace:
    return argparse.Namespace(**kw)


@pytest.fixture()
def http_src(tmp_path):
    root = tmp_path / "www"
    root.mkdir()
    (root / "x.txt").write_bytes(b"payload x")
    (root / "y.txt").write_bytes(b"payload y")
    handler_cls = type(
        "Quiet", (http.server.SimpleHTTPRequestHandler,),
        {"log_message": lambda self, *a: None},
    )
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: handler_cls(*a, directory=str(root), **kw),
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", root
    httpd.shutdown()


def test_crawl_routes_http_source_and_archives(spark, tmp_path, http_src, capsys):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.sources.archive import open_blob

    base, _root = http_src
    lake = str(tmp_path / "lake")
    rc = _dispatch(
        spark,
        _args(
            cmd="crawl", source=base, dataset="ds", lake=lake,
            include=None, exclude=None, archive=True,
        ),
    )
    assert rc in (0, None)
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters == {"files_total": 2, "added_or_updated": 2, "not_found": 0}
    sha = hashlib.sha1(b"payload x").hexdigest()
    assert open_blob(lake, "ds", sha) == b"payload x"

    # re-crawl over http: nothing new, archive untouched (idempotent)
    rc = _dispatch(
        spark,
        _args(
            cmd="crawl", source=base, dataset="ds", lake=lake,
            include=None, exclude=None, archive=True,
        ),
    )
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters == {"files_total": 2, "added_or_updated": 0, "not_found": 0}


def test_serve_command_answers_requests(spark, tmp_path, capsys):
    import urllib.request

    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.ingest import crawl

    src = tmp_path / "src"
    src.mkdir()
    (src / "f.txt").write_bytes(b"served bytes")
    lake = str(tmp_path / "lake")
    crawl(spark, str(src), "ds", lake)

    result = {}

    def run():
        result["rc"] = _dispatch(
            spark,
            _args(
                cmd="serve", lake=lake, host="127.0.0.1", port=0,
                secret="s3cret", debug=False, max_requests=1,
            ),
        )

    thread = threading.Thread(target=run)
    thread.start()
    # wait for the listening line
    import time

    base = None
    for _ in range(100):
        out = capsys.readouterr().out
        if "listening" in out:
            base = json.loads(out.strip().splitlines()[-1])["listening"]
            break
        time.sleep(0.1)
    assert base, "server never reported its address"
    req = urllib.request.Request(f"{base}/ds/f.txt", method="HEAD")
    with urllib.request.urlopen(req) as res:
        assert res.status == 200
        assert res.headers["x-ftm-datalake-name"] == "f.txt"
    thread.join(timeout=30)
    assert not thread.is_alive()


def test_forget_gc_dq_verbs(spark, tmp_path, capsys):
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.ingest import crawl

    src = tmp_path / "src"
    src.mkdir()
    (src / "keep.txt").write_bytes(b"keep")
    (src / "drop.txt").write_bytes(b"drop")
    lake = str(tmp_path / "lake")
    _dispatch(
        spark,
        _args(
            cmd="crawl", source=str(src), dataset="ds", lake=lake,
            include=None, exclude=None, archive=True,
        ),
    )
    capsys.readouterr()

    _dispatch(
        spark,
        _args(
            cmd="forget", keys=["drop.txt"], dataset="ds", lake=lake,
            keep_blobs=True,
        ),
    )
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit == {"rows_removed": 1, "blobs_collected": 0}

    _dispatch(spark, _args(cmd="gc", dataset="ds", lake=lake, dry_run=True))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"orphan_blobs": 1, "dry_run": True}
    _dispatch(spark, _args(cmd="gc", dataset="ds", lake=lake, dry_run=False))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"orphan_blobs": 1, "dry_run": False}

    # dq profile + skew over the documents table itself
    _dispatch(
        spark,
        _args(
            cmd="dq", dq_cmd="profile", path=os.path.join(lake, "documents"),
            cols="key,size",
        ),
    )
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {l["column"] for l in lines} == {"key", "size"}
    assert all(l["n_rows"] == 1 for l in lines)

    _dispatch(
        spark,
        _args(
            cmd="dq", dq_cmd="skew", path=os.path.join(lake, "documents"),
            key="dataset", top=5,
        ),
    )
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["key"] == "ds" and lines[0]["share_ppm"] == 1_000_000


def test_publish_writes_index_and_catalog(spark, tmp_path, capsys):
    """publish materializes {dataset}/index.json per dataset plus the
    root catalog.json — the reference's make_index + catalog fan-in as
    files, from ONE pass over the partitioned table."""
    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.ingest import crawl

    for ds, names in (("ds1", ["a.txt", "b.pdf"]), ("ds2", ["c.csv"])):
        src = tmp_path / f"src_{ds}"
        src.mkdir()
        for n in names:
            (src / n).write_bytes(f"body of {n}".encode())
        crawl(spark, str(src), ds, str(tmp_path / "lake"))

    _dispatch(spark, _args(cmd="publish", lake=str(tmp_path / "lake")))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["datasets"] == 2

    idx1 = json.loads((tmp_path / "lake" / "ds1" / "index.json").read_text())
    assert idx1["name"] == "ds1" and idx1["file_count"] == 2
    assert idx1["entity_count"] == 2
    schemata = {s["name"] for s in idx1["things"]["schemata"]}
    assert schemata == {"PlainText", "Pages"}
    # reference index.json document shape (label/plural, coverage)
    labels = {s["name"]: s["label"] for s in idx1["things"]["schemata"]}
    assert labels == {"PlainText": "Text file", "Pages": "Document"}
    assert idx1["coverage"]["frequency"] == "unknown"

    cat = json.loads((tmp_path / "lake" / "catalog.json").read_text())
    assert [d["name"] for d in cat["datasets"]] == ["ds1", "ds2"]
    assert cat["datasets"][1]["file_count"] == 1
