"""The RFC's event-coupled stage pipeline, end to end (SURVEY §2.10 I3;
reference docs/rfc.md:148-152: "dropping a file to one origin folder
triggers the subsequent layer of processing").

Three file-coupled Structured-Streaming stages, each exactly-once via
its own checkpoint (the checkpoint IS the stage's task ledger):

    source files  --crawl_stream-->  documents/   (stage parquet)
    documents/    --project+explode--> statements/ (stage parquet)
    statements/   --foreachBatch merge_entity_increment--> entities/

Stage 3 is the interesting one: statement aggregation is not an
append-mode streaming agg, but it IS algebraic — so each drained
micro-batch aggregates alone and merges into the persistent entity
table with ``merge_entity_increment`` (operators/statements.py), whose
``merge(aggregate(A), B) == aggregate(A ∪ B)`` law makes the
incremental result exactly the batch result regardless of how the
stream is chopped into batches. At 100 TB the same topology runs with
real triggers and bucket notifications (the RFC's SQS/PubSub note);
``availableNow`` keeps it testable and cron-schedulable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def documents_to_statements(documents: DataFrame) -> DataFrame:
    """Document rows → long-format statement fragments (the RFC's
    "statement folder" payload): one row per (entity, prop, value),
    derived through the same P7 entity projection as the batch path so
    stream and batch can never diverge on ids or schema mapping."""
    from ftm_datalake_spark.pipelines.ingest import project_entities

    ents = project_entities(documents)
    return (
        ents.select(
            F.col("id").alias("canonical_id"),
            "schema",
            "dataset",
            F.explode("properties").alias("prop", "values"),
        )
        .select(
            "canonical_id",
            "prop",
            F.explode("values").alias("value"),
            "schema",
            "dataset",
        )
    )


STAGE_DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("mimetype", T.StringType()),
        T.StructField("dataset", T.StringType()),
    ]
)

STAGE_STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("canonical_id", T.StringType()),
        T.StructField("prop", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("dataset", T.StringType()),
    ]
)


def read_entities(spark: SparkSession, entities_dir: str) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField(
                "properties",
                T.MapType(T.StringType(), T.ArrayType(T.StringType())),
            ),
            T.StructField("datasets", T.ArrayType(T.StringType())),
        ]
    )
    from ftm_datalake_spark import fsutil

    if fsutil.dir_has_data(spark, entities_dir):
        return spark.read.parquet(entities_dir)
    return spark.createDataFrame([], schema)


def _merge_statements_batch(
    spark: SparkSession, batch: DataFrame, entities_dir: str
) -> None:
    """One stage-3 micro-batch: aggregate the increment, merge into the
    persistent entity table, swap via rename (write to a sibling temp
    dir, rename the old table aside, rename the new one into place,
    then drop the old). Every crash window is recoverable: the only
    moment ``entities_dir`` is absent is between the two renames, and
    then ``tmp`` holds a COMPLETE table (``_SUCCESS`` present) that the
    next batch's recovery preamble renames into place — the old
    rmtree-then-rename order could silently lose the whole table."""
    from ftm_datalake_spark import fsutil
    from ftm_datalake_spark.operators.statements import merge_entity_increment

    tmp = entities_dir.rstrip("/") + ".__stage__"
    old = entities_dir.rstrip("/") + ".__old__"
    fs, ent_path, jvm = fsutil.hadoop_fs(spark, entities_dir)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    old_path = jvm.org.apache.hadoop.fs.Path(old)
    # Crash recovery from a previous interrupted swap (FS-client renames,
    # so the same topology works on hdfs://viewfs:// lakes; on object
    # stores rename degrades to copy but the ordering still never leaves
    # zero complete tables).
    if not fs.exists(ent_path):
        if fs.exists(jvm.org.apache.hadoop.fs.Path(tmp + "/_SUCCESS")):
            fs.rename(tmp_path, ent_path)  # forward: finish the swap
        elif fs.exists(old_path):
            fs.rename(old_path, ent_path)  # backward: roll back
    fs.delete(tmp_path, True)
    fs.delete(old_path, True)

    existing = read_entities(spark, entities_dir)
    merged = merge_entity_increment(existing, batch)
    merged.write.mode("overwrite").parquet(tmp)
    if fs.exists(ent_path):
        fs.rename(ent_path, old_path)
    fs.rename(tmp_path, ent_path)
    fs.delete(old_path, True)


def run_rfc_pipeline(
    spark: SparkSession,
    source_uri: str,
    dataset: str,
    work_dir: str,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Drain all three stages once (availableNow) and return the stage
    row counts. Re-running with the same work_dir processes ONLY what
    landed since the last run — each stage's checkpoint is its ledger."""
    from ftm_datalake_spark.streaming.stages import (
        crawl_stream,
        read_stage_stream,
        run_stage_to_parquet,
    )

    docs_dir = os.path.join(work_dir, "documents")
    st_dir = os.path.join(work_dir, "statements")
    ent_dir = os.path.join(work_dir, "entities")
    cp = os.path.join(work_dir, "_checkpoints")

    # stage 1: source files -> document rows
    q1 = run_stage_to_parquet(
        crawl_stream(spark, source_uri, dataset, max_files_per_trigger),
        docs_dir,
        os.path.join(cp, "crawl"),
    )
    q1.awaitTermination()

    # stage 2: document rows -> statement fragments
    docs_stream = read_stage_stream(
        spark, docs_dir, STAGE_DOCUMENT_SCHEMA, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    q2 = run_stage_to_parquet(
        documents_to_statements(docs_stream),
        st_dir,
        os.path.join(cp, "statements"),
    )
    q2.awaitTermination()

    # stage 3: statement fragments -> merged entity table
    st_stream = read_stage_stream(
        spark, st_dir, STAGE_STATEMENT_SCHEMA, fmt="parquet",
        max_files_per_trigger=max_files_per_trigger,
    )
    q3 = (
        st_stream.writeStream.foreachBatch(
            lambda batch, _bid: _merge_statements_batch(spark, batch, ent_dir)
        )
        .option("checkpointLocation", os.path.join(cp, "entities"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination()

    from ftm_datalake_spark import fsutil

    return {
        "documents": spark.read.parquet(docs_dir).count()
        if fsutil.dir_has_data(spark, docs_dir)
        else 0,
        "statements": spark.read.parquet(st_dir).count()
        if fsutil.dir_has_data(spark, st_dir)
        else 0,
        "entities": read_entities(spark, ent_dir).count(),
    }
