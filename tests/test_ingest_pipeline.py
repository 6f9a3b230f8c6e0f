"""End-to-end crawl → documents table → stats lifecycle, mirroring the
reference's crawl/make e2e tests (tests/test_crawl.py, tests/test_make.py,
SURVEY §5): exact counts, checksums, re-crawl idempotence, mutation
repair."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F


def _make_corpus(base: str) -> dict[str, bytes]:
    files = {
        "report.pdf": b"%PDF-1.4 fake report content",
        "data.csv": b"a,b\n1,2\n",
        "mail/message.eml": b"From: x@y.z\n\nhello",
        "notes.txt": b"some plain text notes",
        "img/photo.jpg": b"\xff\xd8\xff fakejpeg",
        "placeholder.txt": b"",  # zero-length: binaryFile drops these
    }
    for rel, content in files.items():
        full = os.path.join(base, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(content)
    return files


def test_crawl_make_lifecycle(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import (
        crawl,
        make,
        make_index_stats,
        read_documents,
        repair,
    )

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    files = _make_corpus(src)

    # first crawl: everything added
    counters = crawl(spark, src, "ds1", lake)
    assert counters == {"files_total": 6, "added_or_updated": 6, "not_found": 0}

    docs = read_documents(spark, lake, "ds1")
    got = {r["key"]: r for r in docs.collect()}
    assert set(got) == set(files)
    for key, content in files.items():
        assert got[key]["content_hash"] == hashlib.sha1(content).hexdigest()
        assert got[key]["size"] == len(content)
    assert got["report.pdf"]["mimetype"] == "application/pdf"

    # stats (A1-A3 golden-aggregate shape)
    stats = make_index_stats(spark, lake, "ds1")
    assert stats["entity_count"] == 6
    assert stats["total_file_size"] == sum(len(c) for c in files.values())
    facet = {x["name"]: x["count"] for x in stats["things"]["schemata"]}
    assert facet == {"Pages": 1, "Table": 1, "Email": 1, "PlainText": 2, "Image": 1}

    # re-crawl: nothing new (skip-existing J4)
    counters2 = crawl(spark, src, "ds1", lake)
    assert counters2 == {"files_total": 6, "added_or_updated": 0, "not_found": 0}

    # make on a clean lake: everything ok
    actions = {r["key"]: r["action"] for r in make(spark, src, "ds1", lake).collect()}
    assert set(actions.values()) == {"ok"}

    # mutations: delete one source file, corrupt another
    os.remove(os.path.join(src, "notes.txt"))
    with open(os.path.join(src, "data.csv"), "wb") as fh:
        fh.write(b"corrupted!")
    actions = {r["key"]: r["action"] for r in make(spark, src, "ds1", lake).collect()}
    assert actions["notes.txt"] == "delete"
    assert actions["data.csv"] == "fix"
    assert actions["report.pdf"] == "ok"

    counters = repair(spark, src, "ds1", lake)
    assert counters.get("fix") == 1 and counters.get("delete") == 1
    repaired = {r["key"]: r for r in read_documents(spark, lake, "ds1").collect()}
    assert "notes.txt" not in repaired
    assert repaired["data.csv"]["content_hash"] == hashlib.sha1(b"corrupted!").hexdigest()


def test_crawl_unicode_and_space_keys(spark, tmp_path):
    """The reference corpus includes unicode + space filenames
    ('Îș unî©ođ€.txt', FIXTURES.md §1) — keys must survive the
    path→key projection byte-exactly."""
    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents

    src = str(tmp_path / "src")
    os.makedirs(src)
    names = ["Îș unî©ođ€.txt", "with space.pdf", "질문.csv"]
    for name in names:
        with open(os.path.join(src, name), "wb") as fh:
            fh.write(name.encode("utf-8"))
    lake = str(tmp_path / "lake")
    counters = crawl(spark, src, "uni", lake)
    assert counters["files_total"] == 3
    got = {r["key"]: r for r in read_documents(spark, lake, "uni").collect()}
    assert set(got) == set(names)
    for name in names:
        assert got[name]["content_hash"] == hashlib.sha1(name.encode()).hexdigest()


def test_crawl_glob_filters(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import crawl_scan

    src = str(tmp_path / "src")
    _make_corpus(src)
    only_pdf = crawl_scan(spark, src, "ds1", include="*.pdf")
    assert [r["key"] for r in only_pdf.collect()] == ["report.pdf"]
    no_mail = crawl_scan(spark, src, "ds1", exclude="mail/*")
    assert "mail/message.eml" not in {r["key"] for r in no_mail.collect()}


def test_glob_filters_are_start_anchored(spark, tmp_path):
    """fnmatch semantics: 'tmp/*' must NOT match 'backup/tmp/...'."""
    from ftm_datalake_spark.pipelines.ingest import crawl_scan

    src = str(tmp_path / "src")
    for rel in ("tmp/a.txt", "backup/tmp/b.txt"):
        full = os.path.join(src, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as fh:
            fh.write(b"x")
    kept = {r["key"] for r in crawl_scan(spark, src, "ds", exclude="tmp/*").collect()}
    assert kept == {"backup/tmp/b.txt"}
    included = {r["key"] for r in crawl_scan(spark, src, "ds", include="tmp/*").collect()}
    assert included == {"tmp/a.txt"}


def test_recrawl_preserves_created_at(spark, tmp_path):
    """Updating a file must advance updated_at but keep the original
    created_at (first-archived time)."""
    import time

    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents

    src = str(tmp_path / "src")
    os.makedirs(src)
    path = os.path.join(src, "doc.txt")
    with open(path, "wb") as fh:
        fh.write(b"v1")
    lake = str(tmp_path / "lake")
    crawl(spark, src, "ds1", lake)
    first = read_documents(spark, lake, "ds1").first()

    time.sleep(1.1)
    with open(path, "wb") as fh:
        fh.write(b"v2-changed")
    crawl(spark, src, "ds1", lake)
    second = read_documents(spark, lake, "ds1").first()
    assert second["content_hash"] != first["content_hash"]
    assert second["updated_at"] > first["updated_at"]
    assert second["created_at"] == first["created_at"]  # preserved


def test_recrawl_unchanged_reads_no_content(spark, tmp_path):
    """Skip-existing must decide on metadata alone: an unchanged corpus
    re-crawls with zero content bytes read or hashed (reference skips
    before fetching, ftm_datalake/crawl.py:67-71).

    Proof is behavioral: swap one file's BYTES while keeping its size and
    mtime — if the crawl read or hashed content, the stored hash would
    move; it must not."""
    from ftm_datalake_spark.pipelines.ingest import (
        crawl,
        crawl_listing,
        read_documents,
    )

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    _make_corpus(src)
    crawl(spark, src, "ds1", lake)
    before = {r["key"]: r for r in read_documents(spark, lake, "ds1").collect()}

    # same size, same mtime, different bytes
    path = os.path.join(src, "notes.txt")
    st = os.stat(path)
    with open(path, "wb") as fh:
        fh.write(b"SOME PLAIN TEXT NOTES")  # same 21-byte length
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))

    counters = crawl(spark, src, "ds1", lake)
    assert counters == {"files_total": 6, "added_or_updated": 0, "not_found": 0}
    after = {r["key"]: r for r in read_documents(spark, lake, "ds1").collect()}
    # hash unchanged == content never re-read (sha1 of new bytes differs)
    assert after["notes.txt"]["content_hash"] == before["notes.txt"]["content_hash"]
    assert after["notes.txt"]["content_hash"] == hashlib.sha1(
        b"some plain text notes"
    ).hexdigest()

    # and the listing plan itself never projects the content column
    listing = crawl_listing(spark, src)
    assert "content" not in listing.columns
    plan = listing._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_recrawl_picks_up_touched_file(spark, tmp_path):
    """A bumped mtime (even with identical bytes) re-ingests that one file
    through the explicit-path delta branch — not a full rescan."""
    import time

    from ftm_datalake_spark.pipelines.ingest import crawl, read_documents

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    _make_corpus(src)
    crawl(spark, src, "ds1", lake)

    time.sleep(1.1)
    path = os.path.join(src, "data.csv")
    with open(path, "wb") as fh:
        fh.write(b"a,b\n9,9\n")
    counters = crawl(spark, src, "ds1", lake)
    assert counters == {"files_total": 6, "added_or_updated": 1, "not_found": 0}
    got = {r["key"]: r for r in read_documents(spark, lake, "ds1").collect()}
    assert got["data.csv"]["content_hash"] == hashlib.sha1(b"a,b\n9,9\n").hexdigest()


def test_entity_projection_shape(spark, tmp_path):
    from ftm_datalake_spark.pipelines.ingest import crawl, project_entities, read_documents

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    _make_corpus(src)
    crawl(spark, src, "ds1", lake)
    ents = project_entities(read_documents(spark, lake, "ds1"))
    row = {r["properties"]["fileName"][0]: r for r in ents.collect()}
    assert row["report.pdf"]["schema"] == "Pages"
    assert row["report.pdf"]["id"].startswith("ds1-file-")
    assert row["message.eml"]["schema"] == "Email"
    assert row["photo.jpg"]["properties"]["mimeType"] == ["image/jpeg"]
