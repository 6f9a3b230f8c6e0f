"""Regression tests for the round-4 ADVICE findings: archive-pass glob +
skip-unchanged, http resource payloads, catalog error propagation, and
unknown-version diff handling."""

from __future__ import annotations

import argparse
import http.server
import json
import os
import threading

import pytest


def _args(**kw) -> argparse.Namespace:
    return argparse.Namespace(**kw)


@pytest.mark.slow
def test_crawl_archive_honors_excludes_and_table(spark, tmp_path):
    """ADVICE (medium): crawl --archive used to re-scan and re-hash the
    whole source tree with no include/exclude — excluded files ended up
    archived anyway. The archive pass now derives from the merged
    documents table, which the globs already shaped."""
    from ftm_datalake_spark.__main__ import _dispatch

    src = tmp_path / "src"
    src.mkdir()
    (src / "keep.txt").write_bytes(b"keep me")
    (src / "skip.pdf").write_bytes(b"%PDF skip me")
    lake = str(tmp_path / "lake")

    rc = _dispatch(
        spark,
        _args(
            cmd="crawl", source=str(src), dataset="ds1", lake=lake,
            include=None, exclude="*.pdf", archive=True,
        ),
    )
    assert rc in (0, None)
    archive_root = os.path.join(lake, "ds1", "archive")
    shards = [
        name
        for _root, _dirs, names in os.walk(archive_root)
        for name in names
    ]
    import hashlib

    keep_sha = hashlib.sha1(b"keep me").hexdigest()
    skip_sha = hashlib.sha1(b"%PDF skip me").hexdigest()
    assert keep_sha in shards
    assert skip_sha not in shards  # excluded blob never archived


def test_catalog_missing_vs_corrupt(spark, tmp_path, capsys):
    """ADVICE (low): a corrupt documents table must not exit 0 like an
    empty catalog."""
    from ftm_datalake_spark.__main__ import _dispatch

    empty_lake = str(tmp_path / "nolake")
    rc = _dispatch(spark, _args(cmd="catalog", lake=empty_lake, names_only=True))
    assert rc in (0, None)

    corrupt_lake = tmp_path / "corrupt"
    (corrupt_lake / "documents").mkdir(parents=True)
    (corrupt_lake / "documents" / "part-00000.parquet").write_bytes(
        b"this is not parquet"
    )
    rc = _dispatch(
        spark, _args(cmd="catalog", lake=str(corrupt_lake), names_only=True)
    )
    assert rc == 1
    assert "catalog read failed" in capsys.readouterr().err


def test_diff_unknown_version(spark, tmp_path, capsys):
    """ADVICE (low): unknown -v printed a raw ValueError traceback."""
    from ftm_datalake_spark.__main__ import _dispatch

    lake = str(tmp_path / "lake")
    rc = _dispatch(
        spark,
        _args(
            cmd="diff", lake=lake, dataset="ds1",
            version="20990101T000000", against=None,
        ),
    )
    assert rc == 1
    assert "unknown version" in capsys.readouterr().err


def test_load_entities_dataset_http_resource(spark, tmp_path):
    """ADVICE (low): http(s) resource URLs in a published index crashed
    the distributed scan with 'No FileSystem for scheme https'. Remote
    payloads are now staged driver-side before the scan."""
    from ftm_datalake_spark.pipelines.sync import load_entities_dataset

    root = tmp_path / "www"
    root.mkdir()
    entities = [
        {"id": "e1", "schema": "Person", "properties": {"name": ["Alice"]}},
        {"id": "e2", "schema": "Company", "properties": {"name": ["ACME"]}},
    ]
    (root / "entities.ftm.json").write_text(
        "\n".join(json.dumps(e) for e in entities)
    )

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw
    )
    handler_cls = type(
        "Quiet", (http.server.SimpleHTTPRequestHandler,),
        {"log_message": lambda self, *a: None},
    )
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **kw: handler_cls(*a, directory=str(root), **kw),
    )
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        index = {
            "resources": [
                {
                    "url": f"{base}/entities.ftm.json",
                    "mime_type": "application/json+ftm",
                    "checksum": "abc",
                }
            ]
        }
        (root / "index.json").write_text(json.dumps(index))

        outdir = tmp_path / "pushed"
        outdir.mkdir()

        def send(batch: list[dict]) -> None:
            # sends run on executors: persist to files, not closures
            import uuid

            (outdir / f"{uuid.uuid4().hex}.json").write_text(json.dumps(batch))

        stats = load_entities_dataset(spark, f"{base}/index.json", send=send)
        assert stats == {"resources": 1, "entities": 2, "skipped_resources": 0}
        sent = {
            e["id"]
            for p in outdir.iterdir()
            for e in json.loads(p.read_text())
        }
        assert sent == {"e1", "e2"}
    finally:
        httpd.shutdown()
