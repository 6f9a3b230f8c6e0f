"""Streaming crawl: new files land in the source dir and are ingested
incrementally on the next drain (checkpoint = crawl ledger)."""

from __future__ import annotations

import hashlib
import os


def test_crawl_stream_incremental(spark, tmp_path):
    from ftm_datalake_spark.streaming.stages import crawl_stream, run_stage_to_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "one.pdf"), "wb") as fh:
        fh.write(b"pdf-one")

    q = run_stage_to_parquet(crawl_stream(spark, src, "ds1"), out, ckpt)
    q.awaitTermination(90)
    first = spark.read.parquet(out)
    assert first.count() == 1
    row = first.first()
    assert row["key"] == "one.pdf"
    assert row["content_hash"] == hashlib.sha1(b"pdf-one").hexdigest()
    assert row["mimetype"] == "application/pdf"

    # drop a second file; only it is processed on the next drain
    with open(os.path.join(src, "two.txt"), "wb") as fh:
        fh.write(b"text-two")
    q = run_stage_to_parquet(crawl_stream(spark, src, "ds1"), out, ckpt)
    q.awaitTermination(90)
    got = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"one.pdf", "two.txt"}
    assert got["two.txt"]["content_hash"] == hashlib.sha1(b"text-two").hexdigest()
