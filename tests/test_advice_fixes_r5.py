"""Regression tests for the round-5 ADVICE findings: CSV-sink
directory→file transition, forget-ALL-keys retention no-op, stale-row
tolerance in the crawl --archive pass, timestamp byte parity in
documents.csv lines, and autoindex key normalization."""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import os

import pytest


def _args(**kw) -> argparse.Namespace:
    return argparse.Namespace(**kw)


def _docs_df(spark, rows):
    from ftm_datalake_spark.schemas import DOCUMENTS_SCHEMA

    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def _doc_row(key, dataset="ds1", content_hash=None):
    now = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    return (
        key,
        content_hash or hashlib.sha1(key.encode()).hexdigest(),
        7,
        "text/plain",
        now,
        now,
        dataset,
    )


def test_csv_sink_directory_to_file_transition(spark, tmp_path):
    """ADVICE (medium): when documents.csv exists as the large-table
    DIRECTORY form and a later shrunken write takes the single-file
    branch, the new part must REPLACE the directory — not be moved into
    it, leaving stale headerless parts behind."""
    from ftm_datalake_spark.sources.sinks import write_documents_csv
    from ftm_datalake_spark.sources.tables import read_documents_csv

    big = _docs_df(spark, [_doc_row(f"k{i:03d}") for i in range(20)])
    small = _docs_df(spark, [_doc_row(f"k{i:03d}") for i in range(3)])
    out = str(tmp_path / "ds")

    target = write_documents_csv(big, out, snapshot=False, single_file_max_rows=5)
    assert os.path.isdir(target)  # directory form engaged

    target = write_documents_csv(small, out, snapshot=False, single_file_max_rows=5)
    assert os.path.isfile(target)  # transitioned back to one file
    back = read_documents_csv(spark, target)
    keys = sorted(r["key"] for r in back.select("key").collect())
    assert keys == ["k000", "k001", "k002"]  # no stale rows, no header-as-data


def test_forget_all_keys_drops_partition(spark, tmp_path):
    """ADVICE (medium): forgetting EVERY key of a dataset used to no-op —
    dynamic partitionOverwriteMode writes no partitions for an empty
    frame, so the old partition survived. Now the partition directory is
    dropped explicitly and rows_removed reports the full count."""
    from ftm_datalake_spark.pipelines.ingest import read_documents, write_documents
    from ftm_datalake_spark.pipelines.retention import forget_keys

    lake = str(tmp_path / "lake")
    docs = _docs_df(spark, [_doc_row(f"k{i}") for i in range(4)])
    write_documents(docs, lake)

    all_keys = spark.createDataFrame([(f"k{i}",) for i in range(4)], "key string")
    removed = forget_keys(spark, lake, "ds1", all_keys)
    assert removed == 4
    assert read_documents(spark, lake, "ds1").count() == 0
    assert not os.path.isdir(os.path.join(lake, "documents", "dataset=ds1"))
    # idempotent: forgetting again is a no-op, not an error
    assert forget_keys(spark, lake, "ds1", all_keys) == 0


def test_crawl_archive_tolerates_stale_rows(spark, tmp_path):
    """ADVICE (medium): the archive pass derives source paths from the
    merged table; rows from earlier crawls whose file has been removed
    from the source must be skipped, not crash the job."""
    from ftm_datalake_spark.__main__ import _dispatch

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_bytes(b"blob a")
    (src / "b.txt").write_bytes(b"blob b")
    lake = str(tmp_path / "lake")

    # first crawl records both rows in the table, archives nothing
    rc = _dispatch(
        spark,
        _args(
            cmd="crawl", source=str(src), dataset="ds1", lake=lake,
            include=None, exclude=None, archive=False,
        ),
    )
    assert rc in (0, None)

    # b.txt disappears from the source; its table row is now stale
    (src / "b.txt").unlink()
    rc = _dispatch(
        spark,
        _args(
            cmd="crawl", source=str(src), dataset="ds1", lake=lake,
            include=None, exclude=None, archive=True,
        ),
    )
    assert rc in (0, None)  # no FileNotFoundError crash
    archive_root = os.path.join(lake, "ds1", "archive")
    shards = {
        name for _r, _d, names in os.walk(archive_root) for name in names
    }
    assert hashlib.sha1(b"blob a").hexdigest() in shards
    assert hashlib.sha1(b"blob b").hexdigest() not in shards


def test_csv_lines_timestamp_parity_with_pandas(spark):
    """ADVICE (low): Spark's plain timestamp→string cast trims trailing
    fractional zeros ('00:00:00.5') where pandas pads to 6 digits
    ('00:00:00.500000'); documents_csv_lines must render the pandas
    form byte-for-byte, omitting the fraction at exactly .000000."""
    import pandas as pd

    from ftm_datalake_spark.sources.sinks import documents_csv_lines

    stamps = [
        dt.datetime(2024, 3, 1, 12, 0, 0),
        dt.datetime(2024, 3, 1, 12, 0, 0, 500000),  # .5s: the zero-pad case
        dt.datetime(2024, 3, 1, 12, 0, 0, 123456),
        dt.datetime(2024, 3, 1, 12, 0, 0, 120000),
    ]
    rows = [
        (f"k{i}", f"h{i}", 1, "text/plain", ts, ts)
        for i, ts in enumerate(stamps)
    ]
    df = spark.createDataFrame(
        rows,
        "key string, content_hash string, size long, mimetype string, "
        "created_at timestamp, updated_at timestamp",
    )
    got = sorted(r["line"] for r in documents_csv_lines(df).collect())
    expected = sorted(
        f"k{i},h{i},1,text/plain,{pd.Timestamp(ts)},{pd.Timestamp(ts)}"
        for i, ts in enumerate(stamps)
    )
    assert got == expected


def test_autoindex_rejects_escaping_keys(tmp_path):
    """ADVICE (low): a crafted autoindex page can serve hrefs like
    'a/../../x' that pass a naive leading-'../' check yet escape the
    base prefix when the server resolves the GET. Key normalization
    must reject every '..'-containing or non-normal candidate."""
    from ftm_datalake_spark.sources.http_store import _safe_key

    assert _safe_key("good.txt")
    assert _safe_key("sub/dir/file.bin")
    assert not _safe_key("a/../../x")
    assert not _safe_key("../x")
    assert not _safe_key("a/..")
    assert not _safe_key("a/./b")
    assert not _safe_key("a//b")
    assert not _safe_key("/abs")
    assert not _safe_key("")


def test_autoindex_walk_filters_hostile_hrefs():
    """End-to-end: a live autoindex page carrying hostile hrefs yields
    only the safe keys."""
    import http.server
    import threading

    hostile = (
        b'<html><body>'
        b'<a href="good.txt">good.txt</a>'
        b'<a href="a/../../etc/passwd">escape</a>'
        b'<a href="../up">up</a>'
        b'<a href="?sort=name">sort</a>'
        b'<a href="http://evil.example/x">abs</a>'
        b"</body></html>"
    )

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(hostile)

        def log_message(self, *a):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        from ftm_datalake_spark.sources.http_store import list_http_autoindex

        base = f"http://127.0.0.1:{server.server_address[1]}/"
        assert list_http_autoindex(base) == ["good.txt"]
    finally:
        server.shutdown()
