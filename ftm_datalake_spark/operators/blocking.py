"""Entity-resolution blocking: rare-token block keys, bounded candidate
generation, and set-overlap scoring for cross-dataset record matching.

The reference aggregates statements into entities per dataset
(/root/reference/docs/rfc.md:63-73) but leaves cross-dataset identity
resolution to downstream consumers. This operator family supplies that
step Spark-first, using the standard blocking-then-verify shape that
survives 100 TB:

- **Block key**: each record is keyed by its k *rarest* tokens (lowest
  document frequency, ties broken lexically). Rare tokens are the most
  discriminative, so block sizes stay small on natural corpora; a hard
  `max_block_size` cap drops degenerate blocks (stopword-like keys) so
  candidate generation is bounded *by construction* — the classic
  token-blocking + block-purging scheme from the ER literature.
- **Candidates**: an equi-join of records on block_key, restricted to
  cross-source pairs with `doc_a < doc_b` — a shuffle on a bounded-fanout
  key, never an all-pairs product.
- **Scoring**: distinct-token Jaccard via postings joins — candidates ×
  left-doc postings, then an equi-join on (right doc, token) — integer
  counts all the way, with the threshold applied as integer arithmetic
  (`n_inter * 10 >= n_union * 8` for 0.8) so the cut is bit-exact across
  engines.

Everything is built-in Column expressions (one window per doc bounded by
doc length, hash-agg joins); no Python boundary anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.textops import tokens


def distinct_token_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Exploded distinct (doc_id, source, token) postings, empty tokens
    dropped. One explode + one distinct (single shuffle)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )


def rare_token_block_keys(postings: DataFrame, k: int = 2) -> DataFrame:
    """One block key per doc: its k rarest tokens (by corpus document
    frequency, lexical tie-break) joined with '|'.

    The df aggregation is a uniform hash-agg; the per-doc ranking window
    partitions by doc_id, so its state is bounded by document length —
    no global or skewed window anywhere.
    """
    dfreq = postings.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "token")
    ranked = (
        postings.join(dfreq, "token")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    return ranked.groupBy("doc_id").agg(
        F.any_value(F.col("source")).alias("source"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "token"))),
                lambda s: s["token"],
            ),
            "|",
        ).alias("block_key"),
    )


def candidate_pairs(
    block_keys: DataFrame, max_block_size: int = 100
) -> DataFrame:
    """Cross-source candidate pairs from same-block records.

    Blocks larger than max_block_size are purged *before* the self-join,
    so the join fanout per key is capped at max_block_size² regardless of
    corpus skew.
    """
    ok = (
        block_keys.groupBy("block_key")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") <= max_block_size)
        .select("block_key")
    )
    b = block_keys.join(ok, "block_key")
    left = b.select(
        "block_key",
        F.col("doc_id").alias("doc_a"),
        F.col("source").alias("source_a"),
    )
    right = b.select(
        "block_key",
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("source_b"),
    )
    return (
        left.join(right, "block_key")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("source_a") != F.col("source_b"))
        )
        .select("doc_a", "doc_b", "source_a", "source_b")
    )


def score_token_jaccard(
    candidates: DataFrame, postings: DataFrame
) -> DataFrame:
    """Distinct-token Jaccard per candidate pair via postings joins.

    Work is proportional to candidate-pair postings, not corpus²: the
    blocking stage already bounded the candidate set.
    """
    sizes = postings.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    ta = postings.select(F.col("doc_id").alias("doc_a"), "token")
    tb = postings.select(F.col("doc_id").alias("doc_b"), "token")
    inter = (
        candidates.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("__nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "source_a",
            "source_b",
            "n_inter",
            (F.col("__na") + F.col("__nb") - F.col("n_inter")).alias("n_union"),
            (
                F.col("n_inter").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def entity_match(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = 2,
    max_block_size: int = 100,
    threshold_pct: int = 80,
) -> DataFrame:
    """Composed cross-source match: block → candidates → verify.

    threshold_pct is applied as integer arithmetic
    (n_inter * 100 >= n_union * threshold_pct) so the cut is bit-exact
    across engines; the reported jaccard double is exact IEEE division of
    the same integers.
    """
    postings = distinct_token_postings(df, text_col, id_col, source_col)
    keys = rare_token_block_keys(postings, k)
    cands = candidate_pairs(keys, max_block_size)
    scored = score_token_jaccard(cands, postings)
    return scored.where(
        F.col("n_inter") * 100 >= F.col("n_union") * F.lit(threshold_pct)
    )
