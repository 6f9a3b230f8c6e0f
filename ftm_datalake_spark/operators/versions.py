"""Versioned documents table: timestamped snapshots, version listing,
relational diffs, and version-replay — the reference's documents.csv.{ts}
machinery (SURVEY §2.1 S11, §2.3 J5, §2.5 W2, §2.10 I2).

Reference behavior (ftm_datalake/archive/documents.py:82-185): every
write stores a timestamped snapshot plus a unified-diff text file;
incremental sync replays keys added since the last-synced version
(sync/aleph.py:73-93).

Spark-first: snapshots are parquet subdirectories `version={ts}` under a
versions root — readable individually, listable from the filesystem, and
diffable relationally with exceptAll (no diff-text parsing, P9
eliminated). `changes_since` is the I2 replay: the union of per-step adds
between two versions, deduplicated to latest state.

All listing/stat/delete goes through fsutil's Hadoop-FS helpers, so the
same lake works on file://, viewfs://, hdfs://, s3a:// — the reference's
uniformly-fsspec storage contract (archive/base.py:25-29). A missing
versions root is "no versions yet" ([]), but an unresolvable scheme
raises — retention must never mistake an outage for an empty lake.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

from ftm_datalake_spark import fsutil
from ftm_datalake_spark.operators.documents import snapshot_diff


def _versions_root(lake_dir: str, dataset: str) -> str:
    return os.path.join(lake_dir, "document_versions", f"dataset={dataset}")


def write_version(
    documents: DataFrame,
    lake_dir: str,
    dataset: str,
    version: str | None = None,
) -> str:
    """Persist a snapshot as `version=<utc-iso-basic>` parquet."""
    version = version or dt.datetime.now(dt.timezone.utc).strftime("%Y%m%dT%H%M%S%f")
    path = os.path.join(_versions_root(lake_dir, dataset), f"version={version}")
    documents.drop("dataset").write.mode("errorifexists").parquet(path)
    return version


def list_versions(
    spark: SparkSession, lake_dir: str, dataset: str
) -> list[str]:
    """W2: ascending version ids; last is current."""
    root = _versions_root(lake_dir, dataset)
    return sorted(
        name.split("=", 1)[1]
        for name in fsutil.list_names(spark, root)
        if name.startswith("version=")
    )


def read_version(
    spark: SparkSession, lake_dir: str, dataset: str, version: str | None = None
) -> DataFrame:
    """Point-in-time read; default latest (the reference's "current")."""
    versions = list_versions(spark, lake_dir, dataset)
    if not versions:
        raise FileNotFoundError(f"no versions for dataset {dataset}")
    version = version or versions[-1]
    path = os.path.join(_versions_root(lake_dir, dataset), f"version={version}")
    return spark.read.parquet(path)


def diff_versions(
    spark: SparkSession,
    lake_dir: str,
    dataset: str,
    old_version: str,
    new_version: str,
) -> tuple[DataFrame, DataFrame]:
    """J5 across stored versions: (added_rows, deleted_rows)."""
    old = read_version(spark, lake_dir, dataset, old_version)
    new = read_version(spark, lake_dir, dataset, new_version)
    return snapshot_diff(old, new)


def changes_since(
    spark: SparkSession, lake_dir: str, dataset: str, since_version: str
) -> DataFrame:
    """I2 incremental replay: net-new/updated rows after `since_version`.

    Exactly the keys an incremental sync must push (reference:
    sync/aleph.py:73-93) — computed as one exceptAll between the since
    snapshot and the current one, so intermediate versions need not be
    replayed pairwise."""
    added, _deleted = diff_versions(
        spark,
        lake_dir,
        dataset,
        since_version,
        list_versions(spark, lake_dir, dataset)[-1],
    )
    return added


def retention_plan(
    spark: SparkSession, lake_dir: str, dataset: str, keep_last: int = 2
) -> dict:
    """VACUUM planning for the versioned table: which snapshots fall out
    of the retention window, with their reclaimable footprint, plus any
    stray files in the versions root that belong to no snapshot (failed
    staging leftovers).

    Metadata-only (directory listing + stat — never reads row data), so
    it is driver-side by design, same as `list_versions`; at lake scale
    the per-snapshot file counts come from the same listing a manifest
    would provide. Nothing is deleted here — see :func:`vacuum_versions`.
    """
    root = _versions_root(lake_dir, dataset)
    versions = list_versions(spark, lake_dir, dataset)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    expired = [v for v in versions if v not in keep]

    plan = {
        "dataset": dataset,
        "versions_total": len(versions),
        "keep": sorted(keep),
        "expired": [],
        "orphans": [],
    }
    for v in expired:
        n, size = fsutil.du(spark, os.path.join(root, f"version={v}"))
        plan["expired"].append({"version": v, "n_files": n, "bytes": size})
    for name in fsutil.list_names(spark, root):
        if not name.startswith("version="):
            plan["orphans"].append(os.path.join(root, name))
    return plan


def vacuum_versions(
    spark: SparkSession,
    lake_dir: str,
    dataset: str,
    keep_last: int = 2,
    dry_run: bool = True,
) -> dict:
    """Apply (or preview) the retention plan: delete expired snapshot
    directories and orphaned staging files, keeping the newest
    ``keep_last`` versions readable. Time travel (`read_version`,
    `diff_versions`, `changes_since`) keeps working across the surviving
    window. Returns the executed plan with a `deleted` flag per entry."""
    root = _versions_root(lake_dir, dataset)
    plan = retention_plan(spark, lake_dir, dataset, keep_last)
    plan["dry_run"] = dry_run
    for entry in plan["expired"]:
        path = os.path.join(root, f"version={entry['version']}")
        if not dry_run:
            fsutil.delete(spark, path, recursive=True)
        entry["deleted"] = not dry_run
    for i, orphan in enumerate(list(plan["orphans"])):
        if not dry_run:
            fsutil.delete(spark, orphan, recursive=True)
        plan["orphans"][i] = {"path": orphan, "deleted": not dry_run}
    return plan


def changefeed_between_versions(
    spark: SparkSession,
    lake_dir: str,
    dataset: str,
    old_version: str,
    new_version: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """I/U/D feed that replays one stored snapshot into another:
    ``apply_cdc(read_version(old), feed) == read_version(new)`` by the
    changefeed roundtrip law. The sequenced feed is what a downstream
    sync/CDC consumer needs, where `changes_since` (I2) only yields the
    upserted rows."""
    from ftm_datalake_spark.operators.documents import as_changefeed

    old = read_version(spark, lake_dir, dataset, old_version)
    new = read_version(spark, lake_dir, dataset, new_version)
    return as_changefeed(old, new, key_cols or ["key"])
