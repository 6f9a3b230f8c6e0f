"""Scale guard on the S11 CSV sink: above SINGLE_FILE_MAX_ROWS the sink
must never funnel the table through one task — documents.csv becomes a
directory of globally range-ordered parts written fully distributed
(VERDICT r4 item 3)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _big_documents(spark, n: int):
    return spark.range(n).select(
        F.format_string("file-%09d.txt", F.col("id")).alias("key"),
        F.md5(F.col("id").cast("string")).alias("content_hash"),
        (F.col("id") % 100000).alias("size"),
        F.lit("text/plain").alias("mimetype"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("created_at"),
        F.to_timestamp(F.lit("2024-01-02 00:00:00")).alias("updated_at"),
    )


def test_large_table_writes_distributed(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import write_documents_csv

    out = str(tmp_path / "ds")
    n = 50_000
    target = write_documents_csv(
        _big_documents(spark, n), out, snapshot=True, single_file_max_rows=10_000
    )
    # directory-of-parts form, multiple parts => no coalesce(1) funnel
    assert os.path.isdir(target)
    parts = sorted(glob.glob(os.path.join(target, "part-*.csv")))
    assert len(parts) > 1
    # concatenating parts in filename order reproduces the global sort
    keys = []
    for p in parts:
        with open(p) as fh:
            keys.extend(line.split(",", 1)[0] for line in fh if line.strip())
    assert len(keys) == n
    assert keys == sorted(keys)
    # header sidecar (parts are headerless so concatenation stays a CSV)
    header = open(os.path.join(target, "_header")).read().strip()
    assert header == "key,content_hash,size,mimetype,created_at,updated_at"
    # snapshot is a complete fs-level directory copy (byte-identical;
    # the old hardlink farm was POSIX-only — object stores have no
    # link op, VERDICT r9 #1)
    snaps = [p for p in os.listdir(out) if p.startswith("documents.csv.")]
    assert len(snaps) == 1
    snap_part = os.path.join(out, snaps[0], os.path.basename(parts[0]))
    assert open(snap_part, "rb").read() == open(parts[0], "rb").read()


def test_default_threshold_guards_million_rows(spark, tmp_path):
    """The driver-shaped check from the verdict: >1M rows through the
    sink takes the distributed branch under the DEFAULT threshold."""
    from ftm_datalake_spark.sources.sinks import (
        SINGLE_FILE_MAX_ROWS,
        write_documents_csv,
    )

    n = SINGLE_FILE_MAX_ROWS + 50_000
    out = str(tmp_path / "big")
    target = write_documents_csv(_big_documents(spark, n), out, snapshot=False)
    assert os.path.isdir(target)
    parts = glob.glob(os.path.join(target, "part-*.csv"))
    assert len(parts) > 1
    total = 0
    for p in parts:
        with open(p) as fh:
            total += sum(1 for line in fh if line.strip())
    assert total == n


def test_directory_form_roundtrips_through_reader(spark, tmp_path):
    """read_documents_csv must not eat the first row of each headerless
    part when reading the large-table directory form."""
    from ftm_datalake_spark.sources.sinks import write_documents_csv
    from ftm_datalake_spark.sources.tables import read_documents_csv

    n = 5_000
    out = str(tmp_path / "rt")
    target = write_documents_csv(
        _big_documents(spark, n), out, snapshot=False, single_file_max_rows=1_000
    )
    assert os.path.isdir(target)
    back = read_documents_csv(spark, target)
    assert back.count() == n
    assert back.where(back.key.isNull()).count() == 0
    # and the single-file form still reads with its header consumed
    single = write_documents_csv(
        _big_documents(spark, 10), str(tmp_path / "small"), snapshot=False
    )
    assert read_documents_csv(spark, single).count() == 10


def test_small_table_keeps_single_file(spark, tmp_path):
    from ftm_datalake_spark.sources.sinks import write_documents_csv

    out = str(tmp_path / "small")
    target = write_documents_csv(
        _big_documents(spark, 50), out, snapshot=False
    )
    assert os.path.isfile(target)
    with open(target) as fh:
        assert fh.readline().startswith("key,content_hash")
