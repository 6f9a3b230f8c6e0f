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
    assert list_versions(spark, lake, "ds1") == ["v1", "v2", "v3"]

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

    plan = retention_plan(spark, lake, "ds", keep_last=2)
    assert [e["version"] for e in plan["expired"]] == ["v0", "v1"]
    assert plan["keep"] == ["v2", "v3"]
    assert len(plan["orphans"]) == 1
    assert all(e["n_files"] > 0 and e["bytes"] > 0 for e in plan["expired"])

    preview = vacuum_versions(spark, lake, "ds", keep_last=2, dry_run=True)
    assert all(not e["deleted"] for e in preview["expired"])
    assert list_versions(spark, lake, "ds") == ["v0", "v1", "v2", "v3"]  # intact

    done = vacuum_versions(spark, lake, "ds", keep_last=2, dry_run=False)
    assert all(e["deleted"] for e in done["expired"])
    assert list_versions(spark, lake, "ds") == ["v2", "v3"]
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


def test_versioning_retention_over_viewfs(spark, tmp_path):
    """W2/I2 + retention e2e over a non-file:// scheme (VERDICT r8 #1):
    write/list/read-current/diff-replay and a retention dry-run + vacuum
    all go through the Hadoop FS client — no code path may assume a
    local filesystem."""
    import uuid

    from ftm_datalake_spark.operators.versions import (
        changes_since,
        list_versions,
        read_version,
        retention_plan,
        vacuum_versions,
        write_version,
    )

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = f"fs.viewfs.mounttable.{name}.link./lake"
    hconf.set(key, tmp_path.as_uri())
    try:
        lake = f"viewfs://{name}/lake"
        rows = lambda *keys: spark.createDataFrame(  # noqa: E731
            [(k, f"h{k}") for k in keys], "key STRING, content_hash STRING"
        )
        for i, ks in enumerate(
            [("a",), ("a", "b"), ("a", "b", "c"), ("a", "b", "c", "d")]
        ):
            write_version(rows(*ks), lake, "ds", version=f"v{i}")
        assert list_versions(spark, lake, "ds") == ["v0", "v1", "v2", "v3"]
        assert read_version(spark, lake, "ds").count() == 4  # current
        assert {
            r["key"] for r in changes_since(spark, lake, "ds", "v2").collect()
        } == {"d"}

        plan = retention_plan(spark, lake, "ds", keep_last=2)
        assert [e["version"] for e in plan["expired"]] == ["v0", "v1"]
        assert all(
            e["n_files"] > 0 and e["bytes"] > 0 for e in plan["expired"]
        )
        preview = vacuum_versions(spark, lake, "ds", keep_last=2, dry_run=True)
        assert all(not e["deleted"] for e in preview["expired"])
        assert list_versions(spark, lake, "ds") == ["v0", "v1", "v2", "v3"]

        done = vacuum_versions(spark, lake, "ds", keep_last=2, dry_run=False)
        assert all(e["deleted"] for e in done["expired"])
        assert list_versions(spark, lake, "ds") == ["v2", "v3"]
        # time travel survives in the window, through the viewfs URI
        assert read_version(spark, lake, "ds", "v2").count() == 3
    finally:
        hconf.unset(key)


def test_unreachable_root_fails_loudly(spark):
    """An unresolvable scheme must RAISE, not read as an empty lake —
    silently treating an outage as 'no versions' is how retention
    deletes everything (VERDICT r8 'worse than raising')."""
    import pytest

    from ftm_datalake_spark.operators.versions import list_versions

    with pytest.raises(Exception) as err:
        list_versions(spark, "nosuchscheme://host/lake", "ds")
    assert "nosuchscheme" in str(err.value).lower()


def test_atomic_manifest_swap_recovery(spark, tmp_path):
    """fsutil.write_bytes_atomic over a non-local scheme never leaves
    zero complete copies: a crash between the two renames leaves a
    .__bak__ that read_bytes_with_fallback recovers (ADVICE r8 #2)."""
    import uuid

    from ftm_datalake_spark import fsutil

    name = f"graft-{uuid.uuid4().hex[:8]}"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set(f"fs.viewfs.mounttable.{name}.link./d", tmp_path.as_uri())
    try:
        uri = f"viewfs://{name}/d/manifest.json"
        fsutil.write_bytes_atomic(spark, uri, b"v1")
        assert fsutil.read_bytes_with_fallback(spark, uri) == b"v1"
        fsutil.write_bytes_atomic(spark, uri, b"v2")
        assert fsutil.read_bytes_with_fallback(spark, uri) == b"v2"
        # no stale swap artifacts after a clean write
        names = fsutil.list_names(spark, f"viewfs://{name}/d")
        assert "manifest.json.__bak__" not in names
        assert "manifest.json.__stage__" not in names

        # simulate the crash window: manifest renamed aside, stage not
        # yet renamed in — the ONLY instant the target is absent
        fs, p, jvm = fsutil.hadoop_fs(spark, uri)
        fs.rename(p, jvm.org.apache.hadoop.fs.Path(uri + ".__bak__"))
        assert not fs.exists(p)
        assert fsutil.read_bytes_with_fallback(spark, uri) == b"v2"
        # and the next atomic write heals the state entirely
        fsutil.write_bytes_atomic(spark, uri, b"v3")
        assert fsutil.read_bytes_with_fallback(spark, uri) == b"v3"
    finally:
        hconf.unset(f"fs.viewfs.mounttable.{name}.link./d")
