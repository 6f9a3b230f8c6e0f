"""Trained token-vote text classifier — a fasttext-shaped supervised
filter (train on labeled docs, score unlabeled ones) with fully
integer-exact semantics so a DuckDB oracle can replay it bit-exact.

Why not real multinomial Naive Bayes: NB scores are sums of logs, and
``ln`` is not guaranteed bit-identical across engines. This classifier
keeps the same per-class token-likelihood shape but (a) quantizes each
token's class likelihood to exact integer ppm via the ``(s - s % d) /
d`` floor identity (the text_pmi_collocations idiom), and (b) replaces
the log-sum with plurality voting over token OCCURRENCES — every
comparison is integer or string, so Spark and DuckDB agree exactly.

Determinism spec:
- model: for each token, the label maximizing floor(1e6 * cnt(label,
  token) / total(label)); ties by lexicographically smallest label.
- predict: each token occurrence found in the model votes for its
  label; a doc's prediction is the plurality label, ties by smallest
  label; tokens absent from the model abstain.

Scale shape: training is one corpus-scan token explosion feeding two
hash aggregations (label×token counts, then label totals — the totals
frame is |labels| rows and broadcasts back). The model is vocab-scale;
prediction broadcasts it into the test-side token stream and needs two
aggregations (votes per doc×label, arg-max per doc via
``min(struct(-votes, label))`` — no window, no sort). This is the
CCNet/fasttext quality-filter shape: train once, score 100 TB with one
scan + broadcast join.

No reference counterpart; extends the LLM-pipeline text family
(textops.predict_lang is the unsupervised heuristic, this is the
supervised path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENIZE = "regexp_extract_all(lower({col}), '[a-z]+', 0)"


def _tokens(df: DataFrame, keep: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(keep),
        F.explode(F.expr(_TOKENIZE.format(col=text_col))).alias("token"),
    )


def token_counts(
    train: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(label, token, cnt) occurrence counts — the classifier's
    MERGEABLE sufficient statistic: counts from two corpora sum, so a
    persisted ledger of them supports O(|delta|) model updates
    (pipelines/classifier_store.py)."""
    toks = _tokens(train.withColumnRenamed(label_col, "label"), "label", text_col)
    return toks.groupBy("label", "token").agg(
        F.count("*").cast("long").alias("cnt")
    )


def model_from_counts(counts: DataFrame) -> DataFrame:
    """Derive the (token, label, cnt, score_ppm) model from a (label,
    token, cnt) counts frame — label totals are recovered by summing
    the counts, so the counts ARE the whole training state."""
    totals = counts.groupBy("label").agg(
        F.sum("cnt").cast("long").alias("total")
    )
    s = F.col("cnt") * F.lit(1_000_000).cast("long")
    scored = counts.join(F.broadcast(totals), "label").withColumn(
        "score_ppm",
        ((s - s % F.col("total")) / F.col("total")).cast("long"),
    )
    best = scored.groupBy("token").agg(
        F.min(
            F.struct(
                (-F.col("score_ppm")).alias("ns"),
                F.col("label"),
                F.col("cnt"),
                F.col("score_ppm"),
            )
        ).alias("w")
    )
    return best.select(
        "token",
        F.col("w.label").alias("label"),
        F.col("w.cnt").alias("cnt"),
        F.col("w.score_ppm").alias("score_ppm"),
    )


def token_vote_model(
    train: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(token, label, cnt, score_ppm): each token's best label by
    quantized per-class likelihood. One explode + two hash-aggs."""
    return model_from_counts(token_counts(train, label_col, text_col))


def token_vote_predict(
    model: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, predicted, votes, n_voting) per scored doc. The model
    broadcasts (vocab-scale); docs with zero model tokens are absent
    from the output (they abstain entirely)."""
    toks = _tokens(docs.withColumnRenamed(id_col, "doc_id"), "doc_id", text_col)
    j = toks.join(F.broadcast(model.select("token", "label")), "token")
    votes = j.groupBy("doc_id", "label").agg(
        F.count("*").cast("long").alias("votes")
    )
    tot = j.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_voting"))
    win = (
        votes.groupBy("doc_id")
        .agg(
            F.min(
                F.struct((-F.col("votes")).alias("nv"), F.col("label"))
            ).alias("w")
        )
        .select(
            "doc_id",
            F.col("w.label").alias("predicted"),
            (-F.col("w.nv")).cast("long").alias("votes"),
        )
    )
    return win.join(tot, "doc_id")


def confusion_matrix(
    predictions: DataFrame,
    truth: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
) -> DataFrame:
    """(label, predicted, n) — the test-split confusion matrix for a
    token_vote_predict output joined back to ground truth."""
    t = truth.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("label")
    )
    return (
        predictions.join(t, "doc_id")
        .groupBy("label", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
    )
