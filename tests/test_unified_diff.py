"""Byte parity of the distributed unified diff with the reference's
writer (ftm_datalake/archive/documents.py:96-117): make_lines renders
each row via csv.DictWriter, strips+sorts into a set, diffs with
difflib.unified_diff(n=0, fromfiledate, tofiledate), and writes each
yielded element + '\\n'. These tests reimplement that exact recipe
in-test (no reference imports) and require our relationally-computed
diff to produce identical bytes."""

from __future__ import annotations

import pytest

import csv
import io
import random
from difflib import unified_diff

from pyspark.sql import functions as F

HEADER = ["key", "content_hash", "size", "mimetype", "created_at", "updated_at"]


def _reference_lines(rows: list[dict]) -> list[str]:
    lines = set()
    for row in rows:
        out = io.StringIO()
        writer = csv.DictWriter(out, HEADER)
        writer.writerow(row)
        lines.add(out.getvalue().strip())
    return sorted(lines)


def _reference_diff_bytes(
    old_rows: list[dict], new_rows: list[dict], from_ver: str, to_ver: str
) -> str:
    diff = list(
        unified_diff(
            _reference_lines(old_rows),
            _reference_lines(new_rows),
            fromfiledate=from_ver,
            tofiledate=to_ver,
            n=0,
        )
    )
    return "".join(line + "\n" for line in diff)


def _reference_render(old: list[str], new: list[str], f: str, t: str) -> str:
    diff = unified_diff(sorted(set(old)), sorted(set(new)), fromfiledate=f, tofiledate=t, n=0)
    return "".join(line + "\n" for line in diff)


def _docs_df(spark, rows: list[dict]):
    data = [tuple(r.get(c) for c in HEADER) for r in rows]
    return spark.createDataFrame(
        data,
        "key string, content_hash string, size long, mimetype string, "
        "created_at string, updated_at string",
    )


def test_golden_bytes_vs_reference_recipe(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import write_documents_diff

    old_rows = [
        {"key": "a.txt", "content_hash": "h1", "size": 10, "mimetype": "text/plain",
         "created_at": "2024-01-01 00:00:00", "updated_at": "2024-01-01 00:00:00"},
        {"key": "b.txt", "content_hash": "h2", "size": 20, "mimetype": "text/plain",
         "created_at": "2024-01-01 00:00:00", "updated_at": "2024-01-02 00:00:00"},
        {"key": "c.txt", "content_hash": "h3", "size": 30, "mimetype": "text/csv",
         "created_at": "2024-01-01 00:00:00", "updated_at": "2024-01-01 00:00:00"},
        # a field that needs QUOTE_MINIMAL quoting
        {"key": 'd,"quoted".txt', "content_hash": "h4", "size": 4,
         "mimetype": "text/plain", "created_at": "2024-01-01 00:00:00",
         "updated_at": "2024-01-01 00:00:00"},
    ]
    # b changed (hunk between common a and common c), the quoted row
    # deleted (its own hunk — it sorts first), e+z appended (tail hunk),
    # a and c kept common: three separated hunks.
    new_rows = [
        old_rows[0],
        {**old_rows[1], "content_hash": "h2x",
         "updated_at": "2024-01-03 00:00:00"},
        old_rows[2],
        {"key": "e.txt", "content_hash": "h5", "size": 5, "mimetype": None,
         "created_at": "2024-01-02 00:00:00", "updated_at": "2024-01-02 00:00:00"},
        {"key": "z.txt", "content_hash": "h6", "size": 6, "mimetype": "text/plain",
         "created_at": "2024-01-02 00:00:00", "updated_at": "2024-01-02 00:00:00"},
    ]
    from_ver, to_ver = "2024-01-02T00:00:00", "2024-01-03T00:00:00"
    expected = _reference_diff_bytes(old_rows, new_rows, from_ver, to_ver)
    target = write_documents_diff(
        _docs_df(spark, old_rows),
        _docs_df(spark, new_rows),
        str(tmp_path / "documents.csv.diff"),
        from_ver,
        to_ver,
    )
    assert open(target).read() == expected
    # sanity: the fixture actually produced multiple hunks
    assert expected.count("@@") >= 3


def test_empty_from_version_header(spark, tmp_path):
    # First diff: get_current_version() == "" -> '--- ' with no date tab.
    from ftm_datalake_spark.sources.sinks import write_documents_diff

    old = [{"key": "a", "content_hash": "h", "size": 1, "mimetype": "m",
            "created_at": "c", "updated_at": "u"}]
    new = [{"key": "b", "content_hash": "h", "size": 1, "mimetype": "m",
            "created_at": "c", "updated_at": "u"}]
    expected = _reference_diff_bytes(old, new, "", "2024-01-01T00:00:00")
    target = write_documents_diff(
        _docs_df(spark, old), _docs_df(spark, new),
        str(tmp_path / "d.diff"), "", "2024-01-01T00:00:00",
    )
    assert open(target).read() == expected
    assert expected.startswith("--- \n")


def test_no_changes_writes_empty(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import write_documents_diff

    rows = [{"key": "a", "content_hash": "h", "size": 1, "mimetype": "m",
             "created_at": "c", "updated_at": "u"}]
    target = write_documents_diff(
        _docs_df(spark, rows), _docs_df(spark, rows), str(tmp_path / "d.diff")
    )
    assert open(target).read() == ""


@pytest.mark.slow
def test_randomized_parity_with_difflib(spark):
    """Property check of the anchor/hunk math itself: random sorted
    unique line sets, rendered via the relational path, must match
    difflib byte-for-byte (headers, hunk ranges, and ordering)."""
    from ftm_datalake_spark.operators.documents import unified_diff_changes
    from ftm_datalake_spark.sources.sinks import render_unified_diff

    rng = random.Random(20260814)
    for trial in range(8):
        universe = [f"line{idx:03d}" for idx in range(40)]
        old = sorted(rng.sample(universe, rng.randint(0, 30)))
        new = sorted(rng.sample(universe, rng.randint(0, 30)))
        old_df = spark.createDataFrame(
            [(x,) for x in old] or [(None,)], "line string"
        ).where(F.col("line").isNotNull())
        new_df = spark.createDataFrame(
            [(x,) for x in new] or [(None,)], "line string"
        ).where(F.col("line").isNotNull())
        dels, adds = unified_diff_changes(old_df, new_df)
        ours = render_unified_diff(
            dels.collect(), adds.collect(), "vOLD", "vNEW"
        )
        theirs = _reference_render(old, new, "vOLD", "vNEW")
        assert ours == theirs, f"trial {trial}: {old} -> {new}"


def test_csv_lines_match_dictwriter(spark):
    from ftm_datalake_spark.sources.sinks import documents_csv_lines

    rows = [
        {"key": "plain.txt", "content_hash": "h1", "size": 1,
         "mimetype": "text/plain", "created_at": "c", "updated_at": "u"},
        {"key": 'needs,"quotes"', "content_hash": "h2", "size": 2,
         "mimetype": None, "created_at": "c", "updated_at": "u"},
    ]
    ours = sorted(
        r["line"] for r in documents_csv_lines(_docs_df(spark, rows)).collect()
    )
    assert ours == _reference_lines(rows)


@pytest.mark.slow
def test_randomized_parity_with_nasty_document_rows(spark, tmp_path):
    """End-to-end diff parity on rows whose fields need CSV quoting
    (commas, quotes, spaces) — the quoting path must round-trip through
    the relational renderer identically to csv.DictWriter + difflib."""
    import random

    from ftm_datalake_spark.sources.sinks import write_documents_diff

    rng = random.Random(99)
    pool = [
        "plain.txt", 'has,comma.txt', 'has"quote.txt', "two words.txt",
        'both,"of".txt', "unicode-é.txt", "trailing.txt",
    ]
    for trial in range(4):
        def rows(sample):
            return [
                {"key": k, "content_hash": f"h{i}", "size": i * 10,
                 "mimetype": "text/plain" if i % 2 else None,
                 "created_at": "2024-01-01 00:00:00",
                 "updated_at": f"2024-01-0{1 + i % 5} 00:00:00"}
                for i, k in enumerate(sample)
            ]
        old_rows = rows(sorted(rng.sample(pool, rng.randint(1, len(pool)))))
        new_rows = rows(sorted(rng.sample(pool, rng.randint(1, len(pool)))))
        expected = _reference_diff_bytes(old_rows, new_rows, "vA", "vB")
        target = write_documents_diff(
            _docs_df(spark, old_rows), _docs_df(spark, new_rows),
            str(tmp_path / f"t{trial}.diff"), "vA", "vB",
        )
        assert open(target).read() == expected, f"trial {trial}"


def test_distributed_diff_directory_byte_parity(spark, tmp_path):
    """Above the changed-line threshold the diff renders as a DIRECTORY
    of hunk parts (no driver-side delta materialization); _header +
    parts concatenated must equal difflib's bytes exactly."""
    from ftm_datalake_spark.sources.sinks import (
        read_diff_text,
        write_documents_diff,
    )

    rng = random.Random(7)

    def mk(i, tag):
        return {
            "key": f"{tag}{i:05d}.txt", "content_hash": f"h{tag}{i}",
            "size": i, "mimetype": "text/plain",
            "created_at": "2024-01-01 00:00:00",
            "updated_at": "2024-01-01 00:00:00",
        }

    common = [mk(i, "c") for i in range(120)]
    old_only = [mk(i, "d") for i in range(60)]
    new_only = [mk(i, "a") for i in range(60)]
    # interleave so hunks land at many distinct anchors
    old_rows = common + old_only
    new_rows = common + new_only
    rng.shuffle(old_rows)
    rng.shuffle(new_rows)

    from_ver, to_ver = "2024-02-01T00:00:00", "2024-02-02T00:00:00"
    expected = _reference_diff_bytes(old_rows, new_rows, from_ver, to_ver)

    target = write_documents_diff(
        _docs_df(spark, old_rows),
        _docs_df(spark, new_rows),
        str(tmp_path / "documents.csv.diff"),
        from_ver,
        to_ver,
        single_file_max_changes=10,  # force the distributed form
    )
    import os

    assert os.path.isdir(target)
    assert read_diff_text(target) == expected

    # and the form transition back: a tiny delta overwrites the
    # directory with the single-file form
    target2 = write_documents_diff(
        _docs_df(spark, old_rows),
        _docs_df(spark, old_rows[:-1]),
        str(tmp_path / "documents.csv.diff"),
        from_ver,
        to_ver,
    )
    assert os.path.isfile(target2)
    assert read_diff_text(target2) == _reference_diff_bytes(
        old_rows, old_rows[:-1], from_ver, to_ver
    )
