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
    expect_dc = hashlib.sha1(b"a/b.txt|abc123").hexdigest()
    assert row["dc"] == expect_dc
    assert row["id"] == f"ds1-file-{expect_dc}"


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
    assert row["ukey"] == "ex.com/docs/f ile.pdf"


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
