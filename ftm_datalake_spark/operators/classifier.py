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


def model_from_counts(counts: DataFrame, min_count: int = 1) -> DataFrame:
    """Derive the (token, label, cnt, score_ppm) model from a (label,
    token, cnt) counts frame — label totals are recovered by summing
    the counts (BEFORE any pruning, so likelihoods stay calibrated to
    the full corpus), so the counts ARE the whole training state.

    ``min_count`` > 1 prunes rare (label, token) rows from the vocab —
    fasttext's minCount trick: it bounds the model to the
    frequent-token head (what the broadcast ceiling wants) and drops
    the noisy hapax tail (what accuracy wants)."""
    totals = counts.groupBy("label").agg(
        F.sum("cnt").cast("long").alias("total")
    )
    if min_count > 1:
        counts = counts.where(F.col("cnt") >= F.lit(int(min_count)))
    # `div` is true integer division — the previous (s - s % total) /
    # total identity routed the exact quotient through a double, which
    # rounds off by 1 once cnt * 1e6 exceeds 2^53 (cnt ≳ 9e9: stop-word
    # territory at 100 TB) and would break bit-exactness vs the oracle
    # (ADVICE r9 #3). The DuckDB oracle uses `//` for the same reason.
    scored = counts.join(F.broadcast(totals), "label").withColumn(
        "score_ppm",
        F.expr("(cnt * CAST(1000000 AS BIGINT)) div total").cast("long"),
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
    train: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(token, label, cnt, score_ppm): each token's best label by
    quantized per-class likelihood. One explode + two hash-aggs.
    ``min_count`` caps the vocab at train time (see
    :func:`model_from_counts`)."""
    return model_from_counts(
        token_counts(train, label_col, text_col), min_count=min_count
    )


def token_vote_predict(
    model: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_rows: int | None = 2_000_000,
    model_rows: int | None = None,
) -> DataFrame:
    """(doc_id, predicted, votes, n_voting) per scored doc. Docs with
    zero model tokens are absent from the output (they abstain).

    Broadcast size guard (VERDICT r9 #3): the model side is broadcast
    only while it fits — at or below ``max_broadcast_rows`` (counted
    once here unless the caller passes a known ``model_rows``; the
    persisted-model path sizes the ledger from file metadata instead,
    see classifier_store.predict_from_store). Above the threshold the
    join is left unhinted, so the planner / AQE picks a shuffle join —
    an uncapped 100 TB-corpus vocab can exceed the broadcast ceiling,
    and a forced hint would foreclose the escape. Pass
    ``max_broadcast_rows=None`` to force the broadcast when the vocab
    is known-bounded (capped training, tiny oracle corpora)."""
    sel = model.select("token", "label")
    if max_broadcast_rows is None:
        side = F.broadcast(sel)
    elif max_broadcast_rows <= 0:
        side = sel  # never hint; planner / AQE decides (no probe job)
    else:
        n = model_rows if model_rows is not None else sel.count()
        side = F.broadcast(sel) if n <= max_broadcast_rows else sel
    toks = _tokens(docs.withColumnRenamed(id_col, "doc_id"), "doc_id", text_col)
    j = toks.join(side, "token")
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
