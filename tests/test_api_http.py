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


def test_lookup_mode_wiring(spark, tmp_path):
    """All four lookup_mode settings of build_app_from_documents: the
    guarded snapshot default raises with guidance on overflow; the
    projection and explicit-spark backends resolve the same row."""
    from ftm_datalake_spark.api import build_app_from_documents

    docs = spark.createDataFrame(
        [(KEY, SHA1, len(CONTENT), "text/plain", DATASET),
         ("other.txt", SHA1, 1, "text/plain", DATASET)],
        "key string, content_hash string, size long, mimetype string, dataset string",
    )
    with pytest.raises(ValueError, match="projection_dir"):
        build_app_from_documents(docs, str(tmp_path), SECRET, snapshot_max_rows=1)
    with pytest.raises(ValueError, match="requires projection_dir"):
        build_app_from_documents(
            docs, str(tmp_path), SECRET, lookup_mode="projection"
        )
    for kwargs in (
        {"projection_dir": str(tmp_path / "proj")},  # auto -> projection
        {"lookup_mode": "spark"},
        {},  # auto -> snapshot
    ):
        app = build_app_from_documents(docs, str(tmp_path), SECRET, **kwargs)
        info = app.lookup(DATASET, KEY)
        assert info and info["content_hash"] == SHA1, kwargs
        assert app.lookup(DATASET, "nope.txt") is None, kwargs


def test_hot_get_runs_no_spark_job(server, spark):
    """The default lookup_mode collects a dict snapshot at build time, so
    the request path must never touch Spark: tag a job group around a
    burst of GETs and assert no job landed in it (round-8 brief #3)."""
    base, _ = server
    sc = spark.sparkContext
    sc.setJobGroup("hot-get-spy", "api hot path must be Spark-free")
    try:
        for _ in range(5):
            status, _, body = _request(f"{base}/{DATASET}/{KEY}")
            assert status == 200 and body == CONTENT
            status, _, _ = _request(f"{base}/{DATASET}/missing.txt", "HEAD")
            assert status == 404
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("hot-get-spy")
        sc.setJobGroup(None, None)
    assert jobs == [], f"Spark jobs ran on the hot GET path: {jobs}"


def test_hot_get_latency_smoke(server):
    """Latency smoke: 50 sequential loopback GETs through wsgiref must
    average well under 50 ms — a per-GET Spark scan would be ~100×."""
    import time

    base, _ = server
    start = time.perf_counter()
    n = 50
    for _ in range(n):
        status, _, _ = _request(f"{base}/{DATASET}/{KEY}", "HEAD")
        assert status == 200
    avg = (time.perf_counter() - start) / n
    assert avg < 0.05, f"hot GET averaged {avg * 1000:.1f} ms"


def test_non_debug_hides_token_endpoint(server):
    base, app = server
    app.debug = False
    try:
        status, _, _ = _request(f"{base}/{DATASET}/{KEY}/token?exp=1")
        assert status == 404
    finally:
        app.debug = True
