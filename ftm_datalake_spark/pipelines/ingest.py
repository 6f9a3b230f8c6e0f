"""The crawl / make ingest lifecycle as single Spark jobs (SURVEY §3.1-3.2).

Reference control flow is producer/consumer threads over an in-process
queue (anystore Worker); here each lifecycle is ONE declarative plan:

crawl:  binaryFile scan → glob filters → anti-join existing → checksum/
        mime projection → merge into documents → stats index
make:   full-outer reconcile of source scan vs metadata table → actions

No task queue, no threads, no per-file IO loops — a 1000-executor cluster
runs the same plan unchanged; the scan parallelism comes from file
splits, the merge shuffle is keyed by `key`.
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.functions.checksum import content_checksum, entity_id
from ftm_datalake_spark.functions.mime import guess_mimetype, mimetype_to_schema
from ftm_datalake_spark.operators.documents import merge_documents
from ftm_datalake_spark.sources.tables import scan_binary_files


def _glob_to_regex(glob: str) -> str:
    # rlike uses substring-find semantics and fnmatch.translate only
    # end-anchors; anchor the start too so 'tmp/*' does not also match
    # 'backup/tmp/...' (the reference's fnmatch is start-anchored).
    return r"\A" + fnmatch.translate(glob)


def crawl_scan(
    spark: SparkSession,
    source_uri: str,
    dataset: str,
    include: str | None = None,
    exclude: str | None = None,
) -> DataFrame:
    """S1/S2 + P2/P3 + F1/F9: list files, filter by glob, checksum, type.

    Returns file-metadata rows in DOCUMENTS_SCHEMA shape. Reference:
    CrawlWorker (ftm_datalake/crawl.py:55-106)."""
    from ftm_datalake_spark.functions.paths import path_to_key

    files = scan_binary_files(spark, source_uri)
    key = path_to_key(F.col("path"), source_uri)
    df = files.select(
        key.alias("key"),
        content_checksum(F.col("content")).alias("content_hash"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("updated_at"),
    )
    # Spark's binaryFile source produces no splits for zero-length files,
    # silently dropping them — but empty files are real corpus members
    # (the reference archives them with the empty-content sha1). Recover
    # them from a listing pass.
    empties = _empty_files(spark, source_uri)
    if empties is not None:
        df = df.unionByName(empties)
    if include:
        df = df.where(F.col("key").rlike(_glob_to_regex(include)))
    if exclude:
        df = df.where(~F.col("key").rlike(_glob_to_regex(exclude)))
    return df.select(
        "key",
        "content_hash",
        "size",
        guess_mimetype(F.col("key")).alias("mimetype"),
        F.col("updated_at").alias("created_at"),
        "updated_at",
        F.lit(dataset).alias("dataset"),
    )


EMPTY_SHA1 = "da39a3ee5e6b4b0d3255bfef95601890afd80709"


def _empty_files(spark: SparkSession, source_uri: str) -> DataFrame | None:
    """Zero-length files under a local source dir as document rows.

    Local-FS listing; for object stores, plug the store's inventory
    listing into the same row shape."""
    import datetime as dt

    root = source_uri
    if root.startswith("file:"):
        root = root[len("file:") :]
    if "://" in root or not os.path.isdir(root):
        return None
    rows = []
    for walk_root, _dirs, names in os.walk(root):
        for name in names:
            full = os.path.join(walk_root, name)
            if os.path.getsize(full) == 0:
                rows.append(
                    (
                        os.path.relpath(full, root),
                        EMPTY_SHA1,
                        0,
                        # keep tz-aware: Spark converts naive datetimes via
                        # the HOST zone, which would shift mtimes off-UTC hosts
                        dt.datetime.fromtimestamp(
                            os.path.getmtime(full), dt.timezone.utc
                        ),
                    )
                )
    if not rows:
        return None
    return spark.createDataFrame(
        rows, "key string, content_hash string, size long, updated_at timestamp"
    )


def read_documents(spark: SparkSession, lake_dir: str, dataset: str) -> DataFrame:
    from ftm_datalake_spark.schemas import DOCUMENTS_SCHEMA

    path = os.path.join(lake_dir, "documents")
    try:
        df = spark.read.parquet(path)
        return df.where(F.col("dataset") == dataset)
    except Exception:
        return spark.createDataFrame([], DOCUMENTS_SCHEMA)


def write_documents(documents: DataFrame, lake_dir: str) -> None:
    """The managed documents table: dataset-partitioned parquet."""
    (
        documents.write.mode("overwrite")
        .partitionBy("dataset")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(lake_dir, "documents"))
    )


def crawl(
    spark: SparkSession,
    source_uri: str,
    dataset: str,
    lake_dir: str,
    include: str | None = None,
    exclude: str | None = None,
) -> dict:
    """Full crawl: scan → skip-existing anti-join → merge → stats.

    Returns the counter dict the reference tracks (A4:
    files_total/added/updated, ftm_datalake/crawl.py:29-30)."""
    incoming = crawl_scan(spark, source_uri, dataset, include, exclude)
    current = read_documents(spark, lake_dir, dataset)

    # files_total counts the listing only — column pruning drops the
    # content/checksum columns, so no blob bytes are read for this.
    n_total = incoming.select("key").count()

    # J4 skip-existing: a key with unchanged hash is not re-ingested.
    # Persist the (small) delta so the checksum scan runs ONCE — without
    # this, counting and merging would each re-read and re-hash every blob.
    unchanged = current.select("key", "content_hash")
    new_or_changed = incoming.join(
        F.broadcast(unchanged), ["key", "content_hash"], "left_anti"
    ).persist()
    try:
        n_new = new_or_changed.count()
        merged = merge_documents(current, new_or_changed)
        write_documents(merged, lake_dir)
    finally:
        new_or_changed.unpersist()
    return {"files_total": n_total, "added_or_updated": n_new}


def make_index_stats(spark: SparkSession, lake_dir: str, dataset: str) -> dict:
    """A1-A3: stats row for index.json from the documents table."""
    docs = read_documents(spark, lake_dir, dataset)
    entities = project_entities(docs)
    facets = [
        {"name": r["schema"], "count": r["count"]}
        for r in entities.groupBy("schema")
        .agg(F.count("*").alias("count"))
        .orderBy("schema")
        .collect()
    ]
    totals = docs.agg(
        F.count("*").alias("n"), F.sum("size").alias("total_file_size")
    ).first()
    return {
        "name": dataset,
        "entity_count": int(totals["n"]),
        "total_file_size": int(totals["total_file_size"] or 0),
        "things": {"total": int(totals["n"]), "schemata": facets},
    }


def project_entities(documents: DataFrame) -> DataFrame:
    """P7: file rows → FTM entity proxies (ENTITY_SCHEMA shape).

    Reference: to_proxy(), ftm_datalake/model.py:37-52 — id derived from
    (dataset, key, content_hash), schema from the mime map, properties as
    MAP<STRING, ARRAY<STRING>>."""
    return documents.select(
        entity_id(F.col("dataset"), F.col("key"), F.col("content_hash")).alias("id"),
        mimetype_to_schema(F.col("mimetype")).alias("schema"),
        F.map_from_arrays(
            F.array(
                F.lit("contentHash"),
                F.lit("fileName"),
                F.lit("fileSize"),
                F.lit("mimeType"),
            ),
            F.array(
                F.array(F.col("content_hash")),
                F.array(F.element_at(F.split(F.col("key"), "/"), -1)),
                F.array(F.col("size").cast("string")),
                F.array(F.col("mimetype")),
            ),
        ).alias("properties"),
        F.col("dataset"),
    )


def make(
    spark: SparkSession, source_uri: str, dataset: str, lake_dir: str
) -> DataFrame:
    """Integrity check: reconcile source files vs the documents table.

    One full-outer join replaces the reference's twin task streams
    (ftm_datalake/make.py:52-111). Returns (key, action) with
    add|delete|fix|ok."""
    from ftm_datalake_spark.operators.documents import reconcile

    source = crawl_scan(spark, source_uri, dataset)
    current = read_documents(spark, lake_dir, dataset)
    return reconcile(source, current)


def repair(
    spark: SparkSession, source_uri: str, dataset: str, lake_dir: str
) -> dict:
    """Apply `make` actions: re-add missing, drop orphaned, fix corrupted —
    by rebuilding the table from the reconciled source scan (idempotent)."""
    from ftm_datalake_spark.operators.documents import reconcile

    # one source scan (sha1 of every blob) serves both the action counts
    # and the rewrite
    source = crawl_scan(spark, source_uri, dataset).persist()
    try:
        current = read_documents(spark, lake_dir, dataset)
        actions = reconcile(source, current)
        counters = {
            r["action"]: r["n"]
            for r in actions.groupBy("action").agg(F.count("*").alias("n")).collect()
        }
        write_documents(source, lake_dir)
    finally:
        source.unpersist()
    return counters
