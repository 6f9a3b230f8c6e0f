"""Live-socket Aleph connector tests: a fake Aleph HTTP server (the
alephclient wire surface — collections lookup/create, folder ingest,
_bulk entity load) driven end-to-end by sync_to_aleph_http and
load_entities_dataset, with request-level assertions on memoization,
batch caps, and auth headers (reference flow:
ftm_datalake/connectors/aleph.py:20-120, sync/aleph_entities.py:39-80)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest


class FakeAleph:
    """In-memory Aleph: collections, folder ingests, bulk entity loads.
    Every request is recorded for protocol-level assertions."""

    def __init__(self):
        self.lock = threading.Lock()
        self.collections: dict[str, dict] = {}  # foreign_id -> collection
        self.ingests: list[dict] = []  # folder-create requests, in order
        self.bulks: list[tuple[str, list, str | None]] = []  # (cid, entities, auth)
        self.requests: list[tuple[str, str]] = []  # (method, path)
        self._next_id = 100

    def handler(self):
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def _body(self):
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n)) if n else None

            def _reply(self, obj, status=200):
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                with fake.lock:
                    fake.requests.append(("GET", self.path))
                if self.path.startswith("/api/2/collections?filter:foreign_id="):
                    from urllib.parse import unquote

                    fid = unquote(self.path.split("=", 1)[1])
                    with fake.lock:
                        col = fake.collections.get(fid)
                    self._reply({"results": [col] if col else []})
                else:
                    self._reply({"error": "not found"}, 404)

            def do_POST(self):
                body = self._body()
                auth = self.headers.get("Authorization")
                with fake.lock:
                    fake.requests.append(("POST", self.path))
                    if self.path == "/api/2/collections":
                        cid = str(fake._next_id)
                        fake._next_id += 1
                        col = {**body, "id": cid}
                        fake.collections[body["foreign_id"]] = col
                        self._reply(col)
                    elif self.path.endswith("/ingest"):
                        fid = fake._next_id
                        fake._next_id += 1
                        fake.ingests.append(body["meta"])
                        self._reply({"id": str(fid)})
                    elif self.path.endswith("/_bulk"):
                        cid = self.path.split("/")[4]
                        fake.bulks.append((cid, body, auth))
                        self._reply({"status": "ok"})
                    else:
                        self._reply({"error": "not found"}, 404)

            def do_PUT(self):
                body = self._body()
                with fake.lock:
                    fake.requests.append(("PUT", self.path))
                self._reply(body or {})

            def log_message(self, *a):
                pass

        return Handler


@pytest.fixture()
def aleph():
    fake = FakeAleph()
    server = ThreadingHTTPServer(("127.0.0.1", 0), fake.handler())
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    fake.base_url = f"http://127.0.0.1:{server.server_address[1]}"
    yield fake
    server.shutdown()


def test_sync_to_aleph_over_http(spark, aleph):
    from ftm_datalake_spark.connectors.aleph_http import sync_to_aleph_http

    docs = spark.createDataFrame(
        [
            ("a/b/one.txt", "h1"),
            ("a/b/two.txt", "h2"),
            ("a/three.txt", "h3"),
            ("top.txt", "h4"),
        ],
        "key string, content_hash string",
    )
    cid = sync_to_aleph_http(
        docs,
        aleph.base_url,
        foreign_id="test_dataset",
        api_key="secret-key",
        batch_size=3,
    )

    # collection was created via get-or-create (one lookup, one create)
    assert "test_dataset" in aleph.collections
    assert cid == aleph.collections["test_dataset"]["id"]

    # folder-create memoization: each distinct folder ingested EXACTLY
    # once, parents before children, shaped like make_folders metadata
    assert [i["foreign_id"] for i in aleph.ingests] == ["a", "a/b"]
    assert aleph.ingests[0]["file_name"] == "a"
    assert "parent" not in aleph.ingests[0]
    assert aleph.ingests[1]["file_name"] == "b"
    # the parent id is the id the server returned for folder 'a'
    assert aleph.ingests[1]["parent"]["id"]

    # all 4 document rows arrived via _bulk, ≤batch_size per request,
    # against the right collection, with the ApiKey auth header
    rows = [r for _cid, batch, _a in aleph.bulks for r in batch]
    assert sorted(r["key"] for r in rows) == sorted(
        ["a/b/one.txt", "a/b/two.txt", "a/three.txt", "top.txt"]
    )
    for bulk_cid, batch, auth in aleph.bulks:
        assert bulk_cid == cid
        assert 1 <= len(batch) <= 3
        assert auth == "ApiKey secret-key"

    # parent ids resolved to the server-assigned folder ids
    by_key = {r["key"]: r for r in rows}
    folder_ids = {i["foreign_id"]: None for i in aleph.ingests}
    assert by_key["top.txt"]["parent_id"] is None
    assert by_key["a/three.txt"]["parent_id"] is not None
    assert by_key["a/b/one.txt"]["parent_id"] == by_key["a/b/two.txt"]["parent_id"]


def test_sync_reuses_existing_collection(spark, aleph):
    """Second sync against the same foreign_id must NOT create a second
    collection (get-or-create semantics)."""
    from ftm_datalake_spark.connectors.aleph_http import sync_to_aleph_http

    docs = spark.createDataFrame([("x.txt", "h1")], "key string, content_hash string")
    cid1 = sync_to_aleph_http(docs, aleph.base_url, foreign_id="ds")
    cid2 = sync_to_aleph_http(docs, aleph.base_url, foreign_id="ds")
    assert cid1 == cid2
    creates = [p for m, p in aleph.requests if m == "POST" and p == "/api/2/collections"]
    assert len(creates) == 1


def test_load_entities_dataset_to_http_bulk(spark, aleph, tmp_path):
    """The published-dataset entity loader composes with the HTTP bulk
    sender: entities flow resource → distributed scan → _bulk batches."""
    from ftm_datalake_spark.connectors.aleph_http import (
        AlephHTTPClient,
        make_bulk_sender,
    )
    from ftm_datalake_spark.pipelines.sync import load_entities_dataset

    # a published dataset: index.json + entities.ftm.json resource
    entities = [
        {"id": f"e{i}", "schema": "Document", "properties": {"name": [f"n{i}"]}}
        for i in range(25)
    ]
    res_path = tmp_path / "entities.ftm.json"
    res_path.write_text("\n".join(json.dumps(e) for e in entities))
    index = {
        "name": "ds",
        "resources": [
            {"name": "entities.ftm.json", "url": str(res_path),
             "mime_type": "application/json+ftm", "checksum": "abc123"}
        ],
    }
    index_path = tmp_path / "index.json"
    index_path.write_text(json.dumps(index))

    client = AlephHTTPClient(aleph.base_url, api_key="k2")
    col = client.load_collection_by_foreign_id("ds")
    send = make_bulk_sender(client, str(col["id"]))
    out = load_entities_dataset(
        spark, str(index_path), send, batch_size=10,
        ledger_dir=str(tmp_path / "ledger"),
    )

    got = sorted(
        r["id"] for _cid, batch, _a in aleph.bulks for r in batch
    )
    assert got == sorted(e["id"] for e in entities)
    for _cid, batch, auth in aleph.bulks:
        assert len(batch) <= 10
        assert auth == "ApiKey k2"

    # incremental: a second load skips the already-pushed resource
    n_bulks = len(aleph.bulks)
    load_entities_dataset(
        spark, str(index_path), send, batch_size=10,
        ledger_dir=str(tmp_path / "ledger"),
    )
    assert len(aleph.bulks) == n_bulks


def test_cli_aleph_sync_live_host(spark, aleph, tmp_path):
    """`aleph-sync --host` drives the real HTTP path end-to-end from the
    CLI: collection created, folders ingested once, rows bulk-pushed."""
    import argparse
    import json as _json

    from ftm_datalake_spark.__main__ import _dispatch
    from ftm_datalake_spark.pipelines.ingest import crawl

    src = tmp_path / "src"
    (src / "nested").mkdir(parents=True)
    (src / "nested" / "a.txt").write_bytes(b"cli doc a")
    (src / "b.txt").write_bytes(b"cli doc b")
    lake = str(tmp_path / "lake")
    crawl(spark, str(src), "clids", lake)

    rc = _dispatch(
        spark,
        argparse.Namespace(
            cmd="aleph-sync", dataset="clids", lake=lake, out=None,
            host=aleph.base_url, api_key="cli-key",
        ),
    )
    assert rc in (0, None)
    assert "clids" in aleph.collections
    assert [i["foreign_id"] for i in aleph.ingests] == ["nested"]
    keys = sorted(
        r["key"] for _c, batch, _a in aleph.bulks for r in batch
    )
    assert keys == ["b.txt", "nested/a.txt"]
