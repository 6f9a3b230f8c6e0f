"""Structured-Streaming counterparts of the batch operators.

The reference's incremental model is event-coupled stage directories —
"dropping a file to one origin folder triggers the next layer"
(reference: docs/rfc.md:148-152) — plus a task-ledger cache. Spark-first,
that is a Structured Streaming file source per stage directory with
`trigger(availableNow=True)`: each run drains whatever landed since the
last checkpoint, exactly-once, and the checkpoint directory *is* the task
ledger.

At 100 TB these same topologies run continuously with real triggers;
`availableNow` keeps them testable and cron-schedulable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_stage_stream(
    spark: SparkSession,
    stage_dir: str,
    schema: StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """I3: a stage directory as an append-only stream."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(stage_dir)


def run_stage_to_parquet(
    df: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Drain the stream exactly-once into parquet (stage output dir).

    The checkpoint carries the processed-file ledger — re-running with the
    same checkpoint processes only new files (the anycache semantics of
    reference ftm_datalake/crawl.py:64-71, without a ledger table)."""
    return (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def crawl_stream(
    spark: SparkSession,
    source_uri: str,
    dataset: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming crawl: the binaryFile source as a stream — new files in
    the source prefix become document rows (key, sha1, size, mimetype)
    incrementally; the checkpoint replaces the crawl task-ledger.

    Continuous form of pipelines.ingest.crawl_scan (I3 + S1/S2 + F1/F9);
    note the zero-length-file caveat of the batch path applies here too."""
    from ftm_datalake_spark.functions.checksum import content_checksum
    from ftm_datalake_spark.functions.mime import guess_mimetype

    from pyspark.sql import types as T

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(binary_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.option("recursiveFileLookup", "true").load(source_uri)

    from ftm_datalake_spark.functions.paths import path_to_key

    key = path_to_key(F.col("path"), source_uri)
    return files.select(
        key.alias("key"),
        content_checksum(F.col("content")).alias("content_hash"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("updated_at"),
    ).withColumn("mimetype", guess_mimetype(F.col("key"))).withColumn(
        "dataset", F.lit(dataset)
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization with the built-in session_window.

    Batch-equivalent of the `events_sessionize` registry query; with a
    watermark this runs incrementally with bounded state."""
    return (
        events.withWatermark(ts_col, "1 hour")
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def hourly_rollup_stream(
    events: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Streaming tumbling-window rollup (batch twin: events_hourly_rollup)."""
    return (
        events.withWatermark(ts_col, "2 hours")
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col(type_col))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            type_col,
            "n",
            "total_value",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "view_ts",
    right_ts: str = "click_ts",
    max_delay: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: right events joined to a
    same-key left event they follow within `max_delay`.

    Both sides carry a watermark and the join condition bounds right_ts
    to [left_ts, left_ts + max_delay], so Spark can expire buffered state
    once the watermark passes the bound — state is O(events within the
    watermark horizon), not unbounded. This is the streaming twin of the
    events_funnel step join (plans/events_ops.py)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.select(
        F.col(key_col).alias("__rk"), F.col(right_ts)
    ).withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{key_col} = __rk AND {right_ts} >= {left_ts} "
        f"AND {right_ts} <= {left_ts} + interval {max_delay}"
    )
    return lw.join(rw, cond).select(key_col, left_ts, right_ts)
