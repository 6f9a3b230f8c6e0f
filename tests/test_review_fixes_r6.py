"""Regression tests for the round-6 self-review findings: the entity
table swap must survive a crash at ANY point (the old rmtree-then-rename
order could silently lose the whole table), the autoindex walker must
not re-queue './' hrefs, and the aleph-load default foreign_id must come
from the index document's name, never the literal filename 'index'."""

from __future__ import annotations

import json
import os
import shutil


def _docs_batch(spark, dataset, keys):
    """A tiny document-rows frame shaped like stage 2's statement input."""
    from ftm_datalake_spark.streaming.pipeline import documents_to_statements

    rows = [
        (dataset, k, f"hash-{k}", 10, "text/plain", None, None, None)
        for k in keys
    ]
    docs = spark.createDataFrame(
        rows,
        "dataset string, key string, content_hash string, size bigint, "
        "mimetype string, created_at timestamp, updated_at timestamp, "
        "origin string",
    )
    return documents_to_statements(docs)


def test_entity_swap_recovers_from_crash_between_renames(spark, tmp_path):
    """Crash window: merged table fully written to the stage dir, the
    live dir renamed aside, driver dies before the forward rename. The
    next batch must recover the NEW table (stage has _SUCCESS), not
    start from an empty frame."""
    from ftm_datalake_spark.streaming.pipeline import (
        _merge_statements_batch,
        read_entities,
    )

    ent = str(tmp_path / "entities")
    _merge_statements_batch(spark, _docs_batch(spark, "ds", ["a", "b"]), ent)
    n_before = read_entities(spark, ent).count()
    assert n_before == 2

    # Simulate the interrupted swap: a complete next version is staged,
    # the live dir was renamed aside, then the process died.
    tmp = ent + ".__stage__"
    old = ent + ".__old__"
    _merge_statements_batch(spark, _docs_batch(spark, "ds", ["c"]), ent)
    assert read_entities(spark, ent).count() == 3
    shutil.copytree(ent, tmp)  # the staged COMPLETE table (has _SUCCESS)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    os.rename(ent, old)  # live dir renamed aside; crash here

    # Recovery happens in the next batch's preamble: the staged table is
    # renamed into place BEFORE the merge reads it, so nothing is lost.
    _merge_statements_batch(spark, _docs_batch(spark, "ds", ["d"]), ent)
    ids = {r["id"] for r in read_entities(spark, ent).collect()}
    assert len(ids) == 4
    assert not os.path.exists(tmp) and not os.path.exists(old)


def test_entity_swap_rolls_back_when_stage_incomplete(spark, tmp_path):
    """Crash window: live dir renamed aside but the stage dir is absent
    or incomplete (no _SUCCESS) — the preamble must roll the old table
    back instead of treating the lake as empty."""
    from ftm_datalake_spark.streaming.pipeline import (
        _merge_statements_batch,
        read_entities,
    )

    ent = str(tmp_path / "entities")
    _merge_statements_batch(spark, _docs_batch(spark, "ds", ["a", "b"]), ent)
    os.rename(ent, ent + ".__old__")  # crash mid-swap, no staged table

    _merge_statements_batch(spark, _docs_batch(spark, "ds", ["c"]), ent)
    assert read_entities(spark, ent).count() == 3  # a, b survived


def test_safe_key_rejects_dot_segments():
    from ftm_datalake_spark.sources.http_store import _safe_key

    assert not _safe_key(".")
    assert not _safe_key("./a")
    assert not _safe_key("a/./b")
    assert not _safe_key("a/../b")
    assert _safe_key("a/b.txt")
    assert _safe_key("a.b/c")  # dots INSIDE a segment stay legal


def test_autoindex_dot_href_not_requeued(tmp_path):
    """An autoindex page carrying './' (some servers emit it) must not
    cause a second GET of the same directory under a new prefix."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from ftm_datalake_spark.sources.http_store import list_http_autoindex

    hits = []

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            body = (
                b'<a href="./">.</a><a href="a.txt">a</a>'
                b'<a href="sub/">sub/</a>'
                if self.path == "/"
                else b'<a href="./">.</a><a href="b.txt">b</a>'
            )
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        keys = list_http_autoindex(base)
        assert keys == ["a.txt", "sub/b.txt"]
        assert sorted(hits) == ["/", "/sub/"]  # exactly one GET per dir
    finally:
        srv.shutdown()


def test_aleph_load_default_foreign_id_is_dataset_name(spark, tmp_path):
    """`aleph-load-dataset <...>/index.json --host` without --foreign-id
    must derive the collection foreign_id from the index document's
    name, NOT the filename stem 'index' (which would merge every
    dataset into one shared collection)."""
    import argparse
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from ftm_datalake_spark.__main__ import _dispatch

    ds_dir = tmp_path / "my_dataset"
    ds_dir.mkdir()
    (ds_dir / "index.json").write_text(
        json.dumps({"name": "my_dataset", "resources": []})
    )

    created = []

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"results": []}')

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = json.loads(self.rfile.read(n) or b"{}")
            if "collections" in self.path and "_bulk" not in self.path:
                created.append(body.get("foreign_id"))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(
                json.dumps(
                    {"id": "7", "foreign_id": body.get("foreign_id")}
                ).encode()
            )

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rc = _dispatch(
            spark,
            argparse.Namespace(
                cmd="aleph-load-dataset",
                uri=str(ds_dir / "index.json"),
                out=None,
                host=f"http://127.0.0.1:{srv.server_port}",
                api_key="k",
                foreign_id=None,
                ledger=None,
                batch_size=1000,
            ),
        )
        assert rc in (0, None)
        assert created == ["my_dataset"]  # not 'index'
    finally:
        srv.shutdown()


def test_projection_lookup_survives_rebuild(spark, tmp_path):
    """A projection rebuilt underneath a live lookup closure must not
    kill the server: the cached file index goes stale, the lookup
    re-lists once and keeps serving."""
    from ftm_datalake_spark.serving import (
        build_lookup_projection,
        make_projection_lookup,
    )

    docs = spark.createDataFrame(
        [("ds", "a.txt", "h1", 1), ("ds", "b.txt", "h2", 2)],
        "dataset string, key string, content_hash string, size long",
    )
    proj = str(tmp_path / "proj")
    build_lookup_projection(docs, proj, num_shards=4)
    lookup = make_projection_lookup(spark, proj, num_shards=4)
    assert lookup("ds", "a.txt")["content_hash"] == "h1"

    docs2 = spark.createDataFrame(
        [("ds", "a.txt", "h1-new", 1)],
        "dataset string, key string, content_hash string, size long",
    )
    build_lookup_projection(docs2, proj, num_shards=4)
    assert lookup("ds", "a.txt")["content_hash"] == "h1-new"
    assert lookup("ds", "b.txt") is None


def test_publish_coverage_keys_survive_all_null_timestamps(spark, tmp_path):
    """publish() must always emit coverage.start/end (null, not absent)
    — consumers index into those keys."""
    import json as _json
    import os as _os

    from ftm_datalake_spark.pipelines.ingest import publish, write_documents

    docs = spark.createDataFrame(
        [("ds", "k1", "h1", 5, "text/plain", None, None, None)],
        "dataset string, key string, content_hash string, size long, "
        "mimetype string, created_at timestamp, updated_at timestamp, "
        "origin string",
    )
    lake = str(tmp_path / "lake")
    write_documents(docs, lake)
    publish(spark, lake)
    with open(_os.path.join(lake, "ds", "index.json")) as fh:
        doc = _json.load(fh)
    assert doc["coverage"]["start"] is None
    assert doc["coverage"]["end"] is None
    assert doc["coverage"]["frequency"] == "unknown"
