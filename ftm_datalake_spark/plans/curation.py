"""Flagship training-corpus curation pipeline: quality-filter → exact
dedup (keep lowest id) → language tag — the composed form of the text/
dedup operators, as one declarative plan with a full DuckDB oracle.

This is the shape a 100 TB pretraining-data pass takes: all stages are
projections or one hash-shuffle (the dedup groupBy); nothing is holistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.operators import textops as TX
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


@register(
    "corpus_curation",
    oracle="""
    WITH feat AS (
      SELECT doc_id, text, lang,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|is|in)\\b')) AS BIGINT) AS n_stop
      FROM documents
    ),
    quality AS (
      SELECT doc_id, text, lang, n_tokens,
             CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio
      FROM feat
      WHERE n_tokens >= 20 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.30
    ),
    deduped AS (
      SELECT doc_id, lang, n_tokens, stop_ratio,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM quality
    )
    SELECT doc_id, lang, n_tokens, stop_ratio
    FROM deduped WHERE rn = 1
    ORDER BY doc_id
    """,
    tags=("text", "dedup", "flagship", "bench"),
    bench=True,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = TX.token_count(text).cast("long")
    n_stop = F.regexp_count(text, F.lit(TX.STOPWORD_PATTERN)).cast("long")
    feat = docs.select("doc_id", "text", "lang", n_tokens.alias("n_tokens"),
                       n_stop.alias("n_stop"))
    quality = feat.select(
        "doc_id",
        "text",
        "lang",
        "n_tokens",
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("stop_ratio"),
    ).where(
        (F.col("n_tokens") >= 20)
        & ((F.col("n_stop").cast("double") / F.col("n_tokens")) < 0.30)
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    return (
        quality.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_tokens", "stop_ratio")
        .orderBy("doc_id")
    )
