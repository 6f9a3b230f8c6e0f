from __future__ import annotations


def test_lookup_and_headers(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents
    from ftm_datalake_spark.serving import blob_shard_uri, file_headers, lookup_file

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "doc.txt"), "wb") as fh:
        fh.write(b"serve me")
    crawl(spark, src, "ds1", lake)
    docs = read_documents(spark, lake, "ds1")

    info = lookup_file(docs, "ds1", "doc.txt")
    assert info is not None and info["size"] == 8
    headers = file_headers(info)
    assert headers["Content-Type"] == "text/plain"
    assert headers["Content-Length"] == "8"

    assert lookup_file(docs, "ds1", "nope.txt") is None  # 404 semantics

    uri = blob_shard_uri("s3://lake", "ds1", "abcdef012345")
    assert uri == "s3://lake/ds1/archive/ab/cd/ef/abcdef012345"
