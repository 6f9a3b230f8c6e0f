"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) — as integer-exact hashed n-gram importance weights.

The published recipe: featurize every document as a bag of hashed
n-grams (bigrams here, `n_buckets` hash buckets), fit two smoothed
bucket-unigram models — one on a small TARGET sample (the distribution
you want more of) and one on the RAW corpus — and weight each raw
document by its log-likelihood ratio

    log p_target(doc) - log p_raw(doc)
      = sum over bigram occurrences of
          [ log p_t(bucket) - log p_r(bucket) ]

then resample the corpus proportionally to the weights.

This implementation keeps the estimator but replaces libm `log` with
`floor(log2(.))` computed as binary-string length (the repo-wide
integer-log idiom, see `lm_surprisal_topdocs`), so the weight is pure
integer arithmetic and bit-exact across engines:

    llr(bucket) = flog2((cnt_t+1) * SCALE div (cnt_r+1))
                - flog2((T_t+B)   * SCALE div (T_r+B))

with add-one smoothing over B buckets and SCALE = 2^20 carrying the
sub-integer resolution through the division. When the raw count dwarfs
`(cnt_t+1) * SCALE` the quotient floors to 0 and flog2 saturates at 0 —
a bounded penalty, identical in both engines (`bin(0) = '0'`).

Scale shape (the part that must survive 100 TB): the bucket LM is at
most `n_buckets` rows after a map-side-combined hash agg, so the
corpus-scan scoring join is a broadcast of a few-KB frame; the totals
are 1-row scalars shipped the same way (`crossJoin(broadcast(..))`,
the `text_pmi_collocations` idiom). One corpus-scale shuffle total:
the per-doc weight agg. No all-pairs anything, no Python UDFs.

Reference role: the reference engine has no data-selection pass at all
(its analyzer surface stops at language/mime detection,
ftm_datalake/logic/analyze.py); this is part of the training-pipeline
family the Spark port adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 512
_LOG_SCALE_BITS = 20  # SCALE = 2^20


def _flog2(col: Column) -> Column:
    """floor(log2(x)) for x >= 1 as binary-string length; 0 for x = 0."""
    return (F.length(F.conv(col.cast("long"), 10, 2)) - F.lit(1)).cast("long")


def hashed_bigram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket) per bigram OCCURRENCE — the hashed bag-of-ngrams
    featurization. md5-hex-prefix hash so the bucket assignment is
    engine-portable (mirror: `CAST(('0x'||substr(md5(g),1,8)) AS
    BIGINT) % B`)."""
    from ftm_datalake_spark.operators.textops import ngram_array

    # Materialize the token array in its own projection and hand
    # ngram_array a plain column reference (its documented contract:
    # slice() appears k times, and CollapseProject keeps the split()
    # from being re-inlined only when it sits behind an attribute) —
    # otherwise the regex split runs ~3x per row (ADVICE r10). No
    # short-row pre-filter: rows with <2 tokens produce an EMPTY gram
    # array (ngram_array clamps the slice length to 0) and the inner
    # explode drops them — a size() filter would just get pushed below
    # this projection and re-run the split a second time per row.
    toked = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks")
    )
    grams = ngram_array(F.col("__toks"), 2)
    bucket = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).alias("bucket")
    return toked.select(F.col(id_col), F.explode(grams).alias("gram")).select(
        id_col, bucket
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document DSIR weight: sum of per-bucket integer log-likelihood
    ratios of the target bucket-LM vs the raw bucket-LM, over the doc's
    bigram occurrences. Returns (id, n_bigrams, dsir_weight); higher
    means more target-like. `target_pred` selects the target sample
    (rows also remain part of the raw corpus, as in the paper where the
    target is a held-out distribution, not a subtraction)."""
    feats = hashed_bigram_buckets(docs, text_col, id_col, n_buckets)
    tgt_ids = docs.where(target_pred).select(id_col)
    # Bucket LMs: raw over everything, target over the sample. Both
    # collapse to <= n_buckets rows (map-side combine does the heavy
    # lifting); the target restriction is a semi-join on ids.
    raw_lm = feats.groupBy("bucket").agg(F.count("*").alias("cnt_r"))
    # No broadcast hint on the target-id semi-join: the CLI's
    # --target-lang/--target-source slice can select a majority of the
    # corpus, and a forced broadcast of an unbounded id set OOMs with
    # no shuffle fallback. AQE broadcasts small targets on its own and
    # degrades to a shuffled semi-join for big ones (ADVICE r10).
    tgt_feats = feats.join(tgt_ids, id_col, "left_semi")
    tgt_lm = tgt_feats.groupBy("bucket").agg(F.count("*").alias("cnt_t"))
    totals = (
        feats.agg(F.count("*").alias("t_raw"))
        .crossJoin(F.broadcast(tgt_feats.agg(F.count("*").alias("t_tgt"))))
    )
    scale = 1 << _LOG_SCALE_BITS
    lm = (
        raw_lm.join(tgt_lm, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _flog2(
                    F.expr(
                        f"((coalesce(cnt_t, 0) + 1) * {scale}L)"
                        " div (cnt_r + 1)"
                    )
                )
                - _flog2(
                    F.expr(
                        f"((t_tgt + {n_buckets}L) * {scale}L)"
                        f" div (t_raw + {n_buckets}L)"
                    )
                )
            ).alias("llr"),
        )
    )
    return (
        feats.join(F.broadcast(lm), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("llr").cast("long").alias("dsir_weight"),
        )
    )
