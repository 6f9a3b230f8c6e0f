"""Supervised classifier queries (round 9): train/predict/evaluate the
integer-exact token-vote classifier on a deterministic doc_id % 5
train/test split of the documents table (operators/classifier.py).

This is the fasttext-style quality/language-filter stage of an LLM
data pipeline expressed as three oracled relational programs: the
model build (vocab-scale output), the per-doc scoring pass (broadcast
model into a corpus scan), and the confusion-matrix eval against the
held-out labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators import classifier as C
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table

# Shared oracle CTEs: tokenized train split -> per-label counts ->
# quantized-ppm best label per token. Both engines use TRUE integer
# division (Spark `div`, DuckDB `//`): the earlier (s - s % d) / d
# identity routed the quotient through a double, which rounds off by 1
# once cnt * 1e6 > 2^53 (ADVICE r9 #3).
_MODEL_CTES = """
    toks AS (
      SELECT lang AS label,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
      FROM documents WHERE doc_id % 5 <> 0),
    counts AS (
      SELECT label, token, COUNT(*) AS cnt FROM toks GROUP BY label, token),
    totals AS (SELECT label, COUNT(*) AS total FROM toks GROUP BY label),
    scored AS (
      SELECT c.token, c.label, c.cnt,
             (c.cnt * 1000000) // t.total AS score_ppm
      FROM counts c JOIN totals t USING (label)),
    model AS (
      SELECT token, label, cnt, score_ppm FROM (
        SELECT token, label, cnt, score_ppm,
               ROW_NUMBER() OVER (PARTITION BY token
                                  ORDER BY score_ppm DESC, label) AS rn
        FROM scored) ranked
      WHERE rn = 1)"""

# Test-split scoring on top of the model: every model-token occurrence
# votes; plurality with min-label tie-break.
_PREDICT_CTES = _MODEL_CTES + """,
    toks_test AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
      FROM documents WHERE doc_id % 5 = 0),
    j AS (SELECT t.doc_id, m.label
          FROM toks_test t JOIN model m USING (token)),
    votes AS (
      SELECT doc_id, label, COUNT(*) AS votes FROM j GROUP BY doc_id, label),
    tot AS (SELECT doc_id, COUNT(*) AS n_voting FROM j GROUP BY doc_id),
    win AS (
      SELECT doc_id, label AS predicted, votes FROM (
        SELECT doc_id, label, votes,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY votes DESC, label) AS rn
        FROM votes) ranked
      WHERE rn = 1),
    pred AS (
      SELECT w.doc_id, w.predicted, w.votes, t.n_voting
      FROM win w JOIN tot t USING (doc_id))"""


def _split(docs: DataFrame, train: bool) -> DataFrame:
    cond = (F.col("doc_id") % 5) != 0 if train else (F.col("doc_id") % 5) == 0
    return docs.where(cond)


@register(
    "clf_token_vote_model",
    oracle=f"""
    WITH {_MODEL_CTES}
    SELECT token, label, CAST(cnt AS BIGINT) AS cnt,
           CAST(score_ppm AS BIGINT) AS score_ppm
    FROM model ORDER BY token
    """,
    tags=("classifier", "text", "training"),
)
def clf_token_vote_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab-scale model table: each token's best label by quantized
    per-class likelihood, trained on the 80% split."""
    docs = load_table(spark, sf_dir, "documents")
    return C.token_vote_model(_split(docs, train=True)).orderBy("token")


@register(
    "clf_token_vote_predict",
    oracle=f"""
    WITH {_PREDICT_CTES}
    SELECT doc_id, predicted, CAST(votes AS BIGINT) AS votes,
           CAST(n_voting AS BIGINT) AS n_voting
    FROM pred ORDER BY doc_id
    """,
    tags=("classifier", "text", "training"),
)
def clf_token_vote_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out 20% split scored by the broadcast model: one corpus
    scan + two hash-aggs, no window."""
    docs = load_table(spark, sf_dir, "documents")
    model = C.token_vote_model(_split(docs, train=True))
    # vocab here is bounded by the oracle corpus — force the broadcast
    # (None) instead of paying the size-probe count; the production
    # persisted-model path sizes from ledger file metadata instead
    # (classifier_store.predict_from_store).
    return C.token_vote_predict(
        model, _split(docs, train=False), max_broadcast_rows=None
    ).orderBy("doc_id")


@register(
    "clf_token_vote_confusion",
    oracle=f"""
    WITH {_PREDICT_CTES}
    SELECT d.lang AS label, p.predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY d.lang, p.predicted
    ORDER BY label, predicted
    """,
    tags=("classifier", "text", "eval"),
)
def clf_token_vote_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the token-vote classifier on the held-out
    split — the eval leg of the train/score/eval triple."""
    docs = load_table(spark, sf_dir, "documents")
    model = C.token_vote_model(_split(docs, train=True))
    preds = C.token_vote_predict(
        model, _split(docs, train=False), max_broadcast_rows=None
    )
    return C.confusion_matrix(preds, _split(docs, train=False)).orderBy(
        "label", "predicted"
    )
