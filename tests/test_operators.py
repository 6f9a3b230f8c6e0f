"""Golden-behavior tests for the core reference-parity operators
(merge semantics, diffs, reconcile, statement aggregation) — the
mutation-test strategy of the reference (SURVEY §5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "key string, content_hash string, updated_at timestamp"
    )


def test_merge_latest_wins_and_delete(spark):
    from ftm_datalake_spark.operators.documents import merge_documents

    current = _docs(
        spark,
        [
            ("a", "h1", _ts("2024-01-01T00:00:00")),
            ("b", "h2", _ts("2024-01-01T00:00:00")),
            ("c", "h3", _ts("2024-01-01T00:00:00")),
        ],
    )
    added = _docs(
        spark,
        [
            ("a", "h1b", _ts("2024-02-01T00:00:00")),  # update wins
            ("d", "h4", _ts("2024-02-01T00:00:00")),  # new key
        ],
    )
    deleted = spark.createDataFrame([("b",)], "key string")
    out = {
        r["key"]: r["content_hash"]
        for r in merge_documents(current, added, deleted).collect()
    }
    assert out == {"a": "h1b", "c": "h3", "d": "h4"}


def test_merge_tie_break_deterministic(spark):
    from ftm_datalake_spark.operators.documents import merge_documents

    t = _ts("2024-01-01T00:00:00")
    current = _docs(spark, [("a", "h1", t)])
    added = _docs(spark, [("a", "h2", t)])  # same timestamp: tiebreak on hash desc
    out = merge_documents(current, added).collect()
    assert len(out) == 1
    assert out[0]["content_hash"] == "h2"


def test_snapshot_diff_roundtrip(spark):
    from ftm_datalake_spark.operators.documents import merge_documents, snapshot_diff

    v1 = _docs(
        spark,
        [
            ("a", "h1", _ts("2024-01-01T00:00:00")),
            ("b", "h2", _ts("2024-01-01T00:00:00")),
        ],
    )
    v2 = _docs(
        spark,
        [
            ("a", "h1", _ts("2024-01-01T00:00:00")),
            ("c", "h3", _ts("2024-01-02T00:00:00")),
        ],
    )
    added, deleted = snapshot_diff(v1, v2)
    assert {r["key"] for r in added.collect()} == {"c"}
    assert {r["key"] for r in deleted.collect()} == {"b"}
    # merge(v1, adds, deletes) reproduces v2 (FIXTURES.md §8)
    merged = merge_documents(v1, added, deleted.select("key"))
    assert sorted(r["key"] for r in merged.collect()) == ["a", "c"]


def test_reconcile_actions(spark):
    from ftm_datalake_spark.operators.documents import reconcile

    src = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("d", "h4")], "key string, content_hash string"
    )
    meta = spark.createDataFrame(
        [("a", "h1"), ("b", "h2x"), ("c", "h3")], "key string, content_hash string"
    )
    out = {r["key"]: r["action"] for r in reconcile(src, meta).collect()}
    assert out == {"a": "ok", "b": "fix", "c": "delete", "d": "add"}


def test_aggregate_statements_map_shape(spark):
    from ftm_datalake_spark.operators.statements import aggregate_statements
    from ftm_datalake_spark.schemas import STATEMENT_SCHEMA

    rows = [
        ("s1", "e1", "e1", "Person", "name", "Alice", "ds1", "ingest", None, None),
        ("s2", "e1", "e1", "Person", "name", "Alyce", "ds2", "analyze", None, None),
        ("s3", "e1", "e1", "Person", "country", "de", "ds1", "ingest", None, None),
        ("s4", "e2", "e2", "Company", "name", "ACME", "ds1", "ingest", None, None),
    ]
    stmts = spark.createDataFrame(rows, STATEMENT_SCHEMA)
    out = {r["id"]: r for r in aggregate_statements(stmts).collect()}
    assert set(out) == {"e1", "e2"}
    e1 = out["e1"]
    assert e1["schema"] == "Person"
    assert e1["properties"]["name"] == ["Alice", "Alyce"]
    assert e1["properties"]["country"] == ["de"]
    assert e1["datasets"] == ["ds1", "ds2"]


def test_latest_wins_null_order(spark):
    from ftm_datalake_spark.operators.documents import latest_wins

    df = _docs(
        spark,
        [("a", "h1", None), ("a", "h2", _ts("2024-01-01T00:00:00"))],
    )
    out = latest_wins(df, ["key"], "updated_at").collect()
    assert len(out) == 1
    assert out[0]["content_hash"] == "h2"  # nulls lose


def test_simhash_similarity_property(spark):
    from ftm_datalake_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert hamming(sigs[1], sigs[2]) < hamming(sigs[1], sigs[3])


def test_dq_rule_summary_counts(spark):
    from ftm_datalake_spark.operators.quality import (
        dq_duplicate_key_count,
        dq_orphan_count,
        dq_rule_summary,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, -1), (3, 0), (3, 7)], "id long, v long"
    )
    got = {
        r.rule: (r.n_rows, r.n_violations)
        for r in dq_rule_summary(
            df, {"v_positive": ~(F.col("v") > 0), "v_under_6": F.col("v") > 6}
        ).collect()
    }
    assert got == {"v_positive": (4, 2), "v_under_6": (4, 1)}

    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    orph = dq_orphan_count(df, "id", parent, "pid", "fk").collect()[0]
    assert (orph.n_rows, orph.n_violations) == (4, 2)  # the two id=3 rows

    dup = dq_duplicate_key_count(df, ["id"], "uniq").collect()[0]
    assert (dup.n_rows, dup.n_violations) == (4, 1)


# ------------------------------------------------------------ changefeed


def test_changefeed_roundtrip_law(spark):
    """apply_cdc(old, as_changefeed(old, new)) == new for arbitrary
    snapshot pairs — the CDC roundtrip law, across random mutations
    (inserts, updates, deletes, null values, unchanged rows)."""
    import random

    from ftm_datalake_spark.operators.documents import apply_cdc, as_changefeed

    rng = random.Random(11)
    for trial in range(5):
        keys = [f"k{i}" for i in range(12)]
        old_rows = [
            (k, rng.choice(["a", "b", None]), rng.randint(0, 3))
            for k in keys
            if rng.random() < 0.8
        ]
        new_rows = [
            (k, rng.choice(["a", "b", "c", None]), rng.randint(0, 3))
            for k in keys
            if rng.random() < 0.8
        ]
        schema = "key STRING, val STRING, n LONG"
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        feed = as_changefeed(old, new, ["key"])
        # feed size is the true delta
        old_map = {r[0]: r[1:] for r in old_rows}
        new_map = {r[0]: r[1:] for r in new_rows}
        n_delta = sum(
            1
            for k in set(old_map) | set(new_map)
            if old_map.get(k, "<absent>") != new_map.get(k, "<absent>")
        )
        assert feed.count() == n_delta
        got = {
            tuple(r)
            for r in apply_cdc(old, feed, ["key"]).select("key", "val", "n").collect()
        }
        assert got == set(new_rows), f"trial {trial}"
        # D rows carry the deleted image
        deleted = {
            (r["key"], r["val"], r["n"])
            for r in feed.where("op = 'D'").collect()
        }
        assert deleted == {
            (k, *old_map[k]) for k in set(old_map) - set(new_map)
        }
