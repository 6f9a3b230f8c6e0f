"""Corpus-hygiene queries: CCNet-style segment dedup and Gopher-style
quality gates over the `documents` table.

Both are LLM-pipeline extensions (no reference counterpart); the Spark
side is pure built-in Column expressions — see operators/textops.py for
the scale notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ftm_datalake_spark.operators import textops as X
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


@register(
    "dedup_common_segments",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    segs AS (
      -- constant series bound (DuckDB lateral generate_series cannot take
      -- a column bound) + WHERE filter to the real segment count
      SELECT doc_id, s.i AS seg_idx,
             array_to_string(tk[(s.i*8+1):(s.i*8+8)], ' ') AS seg
      FROM toks, LATERAL (SELECT i FROM generate_series(0, 127) g(i)) s
      WHERE s.i < ceil(len(tk) / 8.0)
    ),
    freq AS (SELECT md5(seg) AS seg_key, COUNT(*) AS n
             FROM segs GROUP BY md5(seg)),
    joined AS (
      SELECT s.doc_id, s.seg_idx, s.seg, f.n
      FROM segs s JOIN freq f ON f.seg_key = md5(s.seg)
    )
    SELECT doc_id,
           COUNT(*) AS n_segs,
           SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS n_dropped,
           md5(COALESCE(string_agg(CASE WHEN n <= 1 THEN seg END, ' '
                                   ORDER BY seg_idx), '')) AS clean_sig,
           CAST(length(COALESCE(string_agg(CASE WHEN n <= 1 THEN seg END, ' '
                                           ORDER BY seg_idx), '')) AS BIGINT)
             AS clean_len
    FROM joined
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "text", "bench"),
    bench=True,
)
def dedup_common_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.segment_dedup(docs, seg_len=8, max_freq=1).orderBy("doc_id")


@register(
    "quality_gopher_rules",
    oracle="""
    SELECT doc_id, n_words, total_chars, stop_hits, symbols,
           (n_words >= 30 AND n_words <= 100000) AS wordcount_ok,
           (total_chars >= 3 * n_words AND total_chars <= 10 * n_words)
             AS meanlen_ok,
           (stop_hits >= 2) AS stopword_ok,
           (symbols * 10 <= total_chars) AS symbol_ok,
           ((n_words >= 30 AND n_words <= 100000)
            AND (total_chars >= 3 * n_words AND total_chars <= 10 * n_words)
            AND (stop_hits >= 2)
            AND (symbols * 10 <= total_chars)) AS passes
    FROM (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ('the', 'a', 'of'))) AS BIGINT)
               AS stop_hits,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT)
               AS symbols
      FROM documents
    )
    ORDER BY doc_id
    """,
    tags=("quality", "text"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return X.gopher_rules(docs).orderBy("doc_id")


# --------------------------------------------------------------------------
# Positional phrase search: per-token position lists + shifted-list
# intersection — the inverted-positional-index shape (term postings with
# positions, adjacency by offset join) executed as zero-shuffle array
# expressions per document. At index scale the same intersection runs on
# posting lists instead of per-row arrays; the operator shape is
# identical.
@register(
    "text_phrase_search",
    oracle="""
    WITH pos AS (
      SELECT doc_id,
             list_transform(list_filter(
               list_zip(tk, generate_series(1, len(tk))),
               p -> p[1] = 'fast'), p -> p[2]) AS p1,
             list_transform(list_filter(
               list_zip(tk, generate_series(1, len(tk))),
               p -> p[1] = 'table'), p -> p[2]) AS p2
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    )
    SELECT doc_id,
           CAST(len(list_intersect(list_transform(p1, x -> x + 1), p2))
                AS BIGINT) AS n_occurrences
    FROM pos
    WHERE len(list_intersect(list_transform(p1, x -> x + 1), p2)) >= 1
    ORDER BY doc_id
    """,
    tags=("text", "search"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    tk = X.tokens(F.col("text"))

    def positions(word: str):
        indexed = F.transform(
            tk, lambda w, i: F.struct(i.alias("i"), w.alias("w"))
        )
        hits = F.filter(indexed, lambda s: s["w"] == F.lit(word))
        return F.transform(hits, lambda s: s["i"])

    occ = F.size(
        F.array_intersect(
            F.transform(positions("fast"), lambda x: x + 1), positions("table")
        )
    )
    return (
        docs.select(F.col("doc_id"), occ.cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= 1)
        .orderBy("doc_id")
    )
