"""E2E HTTP tests for the serving shell — real sockets via wsgiref,
mirroring the reference's API test sequence (tests/test_api.py:25-63):
public HEAD/GET with metadata headers, debug token mint, Bearer access,
expired/tampered tokens → 404, and 404-hiding for every invalid path."""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

SECRET = "test-secret"
DATASET = "test_dataset"
KEY = "testdir/test.txt"
CONTENT = b"hello world"
SHA1 = "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed"  # sha1 of b"hello world"


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from ftm_datalake_spark.api import build_app_from_documents, serve

    root = tmp_path_factory.mktemp("archive")
    shard = root / DATASET / "archive" / SHA1[0:2] / SHA1[2:4] / SHA1[4:6]
    os.makedirs(shard)
    (shard / SHA1).write_bytes(CONTENT)

    documents = spark.createDataFrame(
        [(KEY, SHA1, len(CONTENT), "text/plain", DATASET)],
        "key string, content_hash string, size long, mimetype string, dataset string",
    ).withColumn("updated_at", F.to_timestamp(F.lit("2024-01-01 00:00:00")))

    app = build_app_from_documents(documents, str(root), SECRET, debug=True)
    httpd = serve(app, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, app
    httpd.shutdown()


def _request(url: str, method: str = "GET", headers: dict | None = None):
    req = urllib.request.Request(url, method=method, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as res:
            return res.status, dict(res.headers), res.read()
    except urllib.error.HTTPError as err:
        return err.code, dict(err.headers), err.read()


def _check_headers(headers: dict) -> None:
    assert headers["x-ftm-datalake-dataset"] == DATASET
    assert headers["x-ftm-datalake-key"] == KEY
    assert headers["x-ftm-datalake-sha1"] == SHA1
    assert headers["x-ftm-datalake-name"] == "test.txt"
    assert headers["x-ftm-datalake-size"] == str(len(CONTENT))
    assert "text/plain" in headers["content-type"]
    assert "x-ftm-datalake-version" in headers


def test_root(server):
    base, _ = server
    status, _, body = _request(base + "/")
    assert status == 200
    assert json.loads(body)["title"] == "ftm-datalake-spark"


def test_public_head_and_get(server):
    base, _ = server
    status, headers, body = _request(f"{base}/{DATASET}/{KEY}", "HEAD")
    assert status == 200
    _check_headers(headers)
    status, headers, body = _request(f"{base}/{DATASET}/{KEY}")
    assert status == 200
    _check_headers(headers)
    assert body == CONTENT


def test_unknown_file_404(server):
    base, _ = server
    for path in ("/foo/bar", f"/{DATASET}/missing.txt", f"/{DATASET}"):
        status, _, _ = _request(base + path, "HEAD")
        assert status == 404, path


def test_token_roundtrip(server):
    base, _ = server
    # no token
    status, _, _ = _request(base + "/file")
    assert status == 404
    # mint via the debug endpoint, then Bearer access
    status, mint_headers, body = _request(f"{base}/{DATASET}/{KEY}/token?exp=1")
    assert status == 200
    # mint responds with the file's x- headers (reference main.py:40-52),
    # but the body — hence content-type — is the Token JSON
    assert mint_headers["x-ftm-datalake-sha1"] == SHA1
    assert "application/json" in mint_headers["content-type"]
    token = json.loads(body)["access_token"]
    auth = {"Authorization": f"Bearer {token}"}
    status, headers, _ = _request(base + "/file", "HEAD", auth)
    assert status == 200
    _check_headers(headers)
    status, _, body = _request(base + "/file", "GET", auth)
    assert status == 200
    assert body == CONTENT


def test_expired_token_404(server):
    base, _ = server
    status, _, body = _request(f"{base}/{DATASET}/{KEY}/token?exp=-1")
    token = json.loads(body)["access_token"]
    status, _, _ = _request(
        base + "/file", "HEAD", {"Authorization": f"Bearer {token}"}
    )
    assert status == 404


def test_tampered_token_404(server):
    base, _ = server
    _, _, body = _request(f"{base}/{DATASET}/{KEY}/token?exp=1")
    token = json.loads(body)["access_token"]
    head, payload, sig = token.split(".")
    bad = f"{head}.{payload}x.{sig}"
    status, _, _ = _request(
        base + "/file", "HEAD", {"Authorization": f"Bearer {bad}"}
    )
    assert status == 404


def test_token_for_unknown_file_404(server):
    base, _ = server
    status, _, _ = _request(f"{base}/{DATASET}/nope.txt/token?exp=1")
    assert status == 404


def test_non_debug_hides_token_endpoint(server):
    base, app = server
    app.debug = False
    try:
        status, _, _ = _request(f"{base}/{DATASET}/{KEY}/token?exp=1")
        assert status == 404
    finally:
        app.debug = True
