"""Unit tests for the scalar function library (SURVEY §2.8 F1-F9)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_content_checksum_matches_hashlib(spark):
    from ftm_datalake_spark.functions.checksum import content_checksum

    payload = b"hello ftm datalake"
    df = spark.createDataFrame([(payload,)], "content binary")
    got = df.select(content_checksum(F.col("content")).alias("h")).first()["h"]
    assert got == hashlib.sha1(payload).hexdigest()


def test_entity_id_recipe(spark):
    from ftm_datalake_spark.functions.checksum import data_checksum, entity_id

    df = spark.createDataFrame(
        [("ds1", "a/b.txt", "abc123")], "dataset string, key string, ch string"
    )
    row = df.select(
        entity_id(F.col("dataset"), F.col("key"), F.col("ch")).alias("id"),
        data_checksum(F.col("key"), F.col("ch")).alias("dc"),
    ).first()

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    expect_dc = md5(md5("a/b.txt") + md5("abc123"))
    assert row["dc"] == expect_dc
    assert row["id"] == f"ds1-file-{expect_dc}"


def test_data_checksum_unambiguous(spark):
    """Delimiter and NULL/empty ambiguities must not collide (the reference
    hashes a python tuple repr, which is likewise unambiguous)."""
    from ftm_datalake_spark.functions.checksum import data_checksum

    df = spark.createDataFrame(
        [("a|b", "c", None, "")], "p1 string, p2 string, pn string, pe string"
    )
    row = df.select(
        data_checksum(F.col("p1"), F.col("p2")).alias("joined_left"),
        data_checksum(F.lit("a"), F.lit("b|c")).alias("joined_right"),
        data_checksum(F.col("pn")).alias("null_part"),
        data_checksum(F.col("pe")).alias("empty_part"),
    ).first()
    assert row["joined_left"] != row["joined_right"]
    assert row["null_part"] != row["empty_part"]
    assert row["null_part"] == hashlib.md5(b"N").hexdigest()


def test_shard_path(spark):
    from ftm_datalake_spark.functions.checksum import shard_path

    ch = "abcdef0123456789"
    df = spark.createDataFrame([(ch,)], "ch string")
    got = df.select(shard_path(F.col("ch")).alias("p")).first()["p"]
    assert got == f"ab/cd/ef/{ch}"


def test_mimetype_to_schema(spark):
    from ftm_datalake_spark.functions.mime import mimetype_to_schema

    cases = [
        ("application/pdf", "Pages"),
        ("text/csv", "Table"),
        ("message/rfc822", "Email"),
        ("text/plain", "PlainText"),
        ("text/html", "HyperText"),
        ("image/png", "Image"),
        ("application/x-whatever", "Document"),
    ]
    df = spark.createDataFrame([(m,) for m, _ in cases], "mimetype string")
    got = [
        r["schema"]
        for r in df.select(
            mimetype_to_schema(F.col("mimetype")).alias("schema")
        ).collect()
    ]
    assert got == [s for _, s in cases]


def test_guess_mimetype(spark):
    from ftm_datalake_spark.functions.mime import guess_mimetype

    df = spark.createDataFrame(
        [("report.PDF",), ("data.csv",), ("noext",)], "key string"
    )
    got = [
        r["m"] for r in df.select(guess_mimetype(F.col("key")).alias("m")).collect()
    ]
    assert got == ["application/pdf", "text/csv", "application/octet-stream"]


def test_paths(spark):
    from ftm_datalake_spark.functions.paths import (
        ancestor_paths,
        file_name,
        parent_path,
        url_to_key,
    )

    df = spark.createDataFrame(
        [("a/b/c.txt", "https://ex.com/docs/f%20ile.pdf?x=1")],
        "key string, url string",
    )
    row = df.select(
        file_name(F.col("key")).alias("name"),
        parent_path(F.col("key")).alias("parent"),
        ancestor_paths(F.col("key")).alias("anc"),
        url_to_key(F.col("url")).alias("ukey"),
    ).first()
    assert row["name"] == "c.txt"
    assert row["parent"] == "a/b"
    assert row["anc"] == ["a", "a/b"]
    # reference key scheme: unquote(urlparse(url).path).strip('/')
    assert row["ukey"] == "docs/f ile.pdf"


def test_url_to_key_matches_reference_scheme(spark):
    """url_to_key mirrors get_file_key (ftm_datalake/sync/memorious.py:
    125-126) including lenient decoding of malformed percent-escapes —
    one dirty URL must not abort the sync job."""
    from urllib.parse import unquote, urlparse

    from ftm_datalake_spark.functions.paths import url_to_key

    urls = [
        "https://ex.com/docs/f%20ile.pdf?x=1",
        "https://ex.com/100%.txt",  # malformed escape: keep raw
        "http://host.org/a/b/c/",
        "https://ex.com/",
        "ex.com/no/scheme.txt",  # urlparse: all path
        "https://ex.com/enc%C3%B6ded/p%C3%A4th.bin#frag",
        "https://ex.com/a+b.txt",  # '+' is literal in paths, not space
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["k"] for r in df.select(url_to_key(F.col("url")).alias("k")).collect()]
    for url, k in zip(urls, got):
        expect = unquote(urlparse(url).path).strip("/")
        assert k == expect, f"{url}: {k!r} != {expect!r}"


def test_rolling_fingerprint_deterministic(spark):
    from ftm_datalake_spark.operators.textops import rolling_fingerprint

    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], "text string")
    vals = [
        r["fp"]
        for r in df.select(rolling_fingerprint(F.col("text")).alias("fp")).collect()
    ]
    # h("abc") = ((0*31+97)*31+98)*31+99 mod p
    expect = ((97 * 31 + 98) * 31 + 99) % 1_000_000_007
    assert vals[0] == vals[1] == expect
    assert vals[2] != vals[0]
