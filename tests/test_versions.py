"""Versioned-table tests: snapshot/list/read/diff/replay (FIXTURES.md §8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "key string, content_hash string, updated_at timestamp"
    ).withColumn("dataset", F.lit("ds1"))


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_version_lifecycle(spark, tmp_path):
    from ftm_datalake_spark.operators.versions import (
        changes_since,
        diff_versions,
        list_versions,
        read_version,
        write_version,
    )

    lake = str(tmp_path)
    v1_df = _docs(
        spark,
        [("a", "h1", _ts("2024-01-01T00:00:00")), ("b", "h2", _ts("2024-01-01T00:00:00"))],
    )
    v2_df = _docs(
        spark,
        [
            ("a", "h1b", _ts("2024-02-01T00:00:00")),  # updated
            ("b", "h2", _ts("2024-01-01T00:00:00")),  # unchanged
            ("c", "h3", _ts("2024-02-01T00:00:00")),  # added
        ],
    )
    v3_df = _docs(
        spark,
        [("a", "h1b", _ts("2024-02-01T00:00:00")), ("c", "h3", _ts("2024-02-01T00:00:00"))],
    )  # b deleted

    v1 = write_version(v1_df, lake, "ds1", "v1")
    v2 = write_version(v2_df, lake, "ds1", "v2")
    v3 = write_version(v3_df, lake, "ds1", "v3")
    assert list_versions(lake, "ds1") == ["v1", "v2", "v3"]

    # current = latest
    assert read_version(spark, lake, "ds1").count() == 2

    added, deleted = diff_versions(spark, lake, "ds1", v1, v2)
    assert {r["key"] for r in added.collect()} == {"a", "c"}  # update shows as add
    assert {r["key"] for r in deleted.collect()} == {"a"}  # ...and delete of old row

    # I2 replay: everything changed since v1, as of current (v3)
    replay = changes_since(spark, lake, "ds1", v1)
    assert {(r["key"], r["content_hash"]) for r in replay.collect()} == {
        ("a", "h1b"),
        ("c", "h3"),
    }

    # duplicate version id refused
    import pytest

    with pytest.raises(Exception):
        write_version(v1_df, lake, "ds1", "v1")


def test_salted_agg_equivalence(spark, sf_dir):
    from ftm_datalake_spark.operators.skew import salted_agg, top_frequent_keys
    from ftm_datalake_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], r["total"], r["mn"], r["mx"])
        for r in events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["total"], r["mn"], r["mx"])
        for r in salted_agg(
            events.withColumn("value_dec", F.col("value").cast("decimal(12,2)")),
            ["event_type"],
            {
                "n": ("event_type", "count"),
                "total": ("value_dec", "sum"),
                "mn": ("value", "min"),
                "mx": ("value", "max"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted

    hot = top_frequent_keys(events, F.col("event_type"), top_n=2).collect()
    assert len(hot) == 2 and hot[0]["n"] >= hot[1]["n"]

    import pytest

    with pytest.raises(ValueError):
        salted_agg(events, ["event_type"], {"bad": ("value", "collect_list")})


def test_retention_vacuum(spark, tmp_path):
    """Expired snapshots + staging orphans are planned, dry-run leaves
    everything readable, real vacuum reclaims them and time travel keeps
    working across the surviving window."""
    import os

    from ftm_datalake_spark.operators.versions import (
        changes_since,
        list_versions,
        read_version,
        retention_plan,
        vacuum_versions,
        write_version,
    )

    lake = str(tmp_path / "lake")
    rows = lambda *keys: spark.createDataFrame(  # noqa: E731
        [(k, f"h{k}") for k in keys], "key STRING, content_hash STRING"
    )
    for i, ks in enumerate([("a",), ("a", "b"), ("a", "b", "c"), ("a", "b", "c", "d")]):
        write_version(rows(*ks), lake, "ds", version=f"v{i}")
    # a staging leftover that belongs to no snapshot
    root = os.path.join(lake, "document_versions", "dataset=ds")
    open(os.path.join(root, "part-stray.__stage__"), "w").write("x")

    plan = retention_plan(lake, "ds", keep_last=2)
    assert [e["version"] for e in plan["expired"]] == ["v0", "v1"]
    assert plan["keep"] == ["v2", "v3"]
    assert len(plan["orphans"]) == 1
    assert all(e["n_files"] > 0 and e["bytes"] > 0 for e in plan["expired"])

    preview = vacuum_versions(lake, "ds", keep_last=2, dry_run=True)
    assert all(not e["deleted"] for e in preview["expired"])
    assert list_versions(lake, "ds") == ["v0", "v1", "v2", "v3"]  # intact

    done = vacuum_versions(lake, "ds", keep_last=2, dry_run=False)
    assert all(e["deleted"] for e in done["expired"])
    assert list_versions(lake, "ds") == ["v2", "v3"]
    assert not os.path.exists(os.path.join(root, "part-stray.__stage__"))
    # time travel still works in the surviving window
    assert read_version(spark, lake, "ds", "v2").count() == 3
    assert {r["key"] for r in changes_since(spark, lake, "ds", "v2").collect()} == {"d"}


def test_changefeed_between_versions_roundtrip(spark, tmp_path):
    from ftm_datalake_spark.operators.documents import apply_cdc
    from ftm_datalake_spark.operators.versions import (
        changefeed_between_versions,
        read_version,
        write_version,
    )

    lake = str(tmp_path / "lake")
    v0 = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")], "key STRING, content_hash STRING"
    )
    v1 = spark.createDataFrame(
        [("a", "h1"), ("b", "h2x"), ("d", "h4")], "key STRING, content_hash STRING"
    )
    write_version(v0, lake, "ds", version="v0")
    write_version(v1, lake, "ds", version="v1")
    feed = changefeed_between_versions(spark, lake, "ds", "v0", "v1")
    ops = {(r["key"], r["op"]) for r in feed.collect()}
    assert ops == {("b", "U"), ("c", "D"), ("d", "I")}
    replayed = {
        tuple(r)
        for r in apply_cdc(
            read_version(spark, lake, "ds", "v0"), feed, ["key"]
        ).collect()
    }
    assert replayed == {("a", "h1"), ("b", "h2x"), ("d", "h4")}
