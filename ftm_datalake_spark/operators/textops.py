"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Column functions (JVM codegen, no
Python row boundary): tokenization via split, language-ID via regexp
marker counts, quality ratios via exact integer division, fingerprints via
md5 of normalized text. These run as one projection over the scan — no
shuffle at all — so they scale linearly to 100 TB.

These extend the reference's analyzer surface (docs/rfc.md:131-140: "NER,
geocoding, transcription services writing statements back").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE = r"\s+"

# marker-word regexes per language (word-boundary anchored, RE2/Java safe)
LANG_MARKERS = {
    "en": r"\b(the|a|of)\b",
    "de": r"\b(der|die|und)\b",
    "fr": r"\b(le|la|et)\b",
    "es": r"\b(el|los|y)\b",
}
STOPWORD_PATTERN = r"\b(the|a|of|and|is|in)\b"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), WHITESPACE)


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish refinements live in the same shape)."""
    return F.size(tokens(text))


def marker_counts(text: Column) -> dict[str, Column]:
    return {
        lang: F.regexp_count(text, F.lit(pat)) for lang, pat in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """n-gram-heuristic language ID: argmax of marker counts, priority-order
    tiebreak (en > de > fr > es), 'und' when nothing matches."""
    c = marker_counts(text)
    n_en, n_de, n_fr, n_es = c["en"], c["de"], c["fr"], c["es"]
    return (
        F.when((n_en == 0) & (n_de == 0) & (n_fr == 0) & (n_es == 0), F.lit("und"))
        .when((n_en >= n_de) & (n_en >= n_fr) & (n_en >= n_es), F.lit("en"))
        .when((n_de >= n_fr) & (n_de >= n_es), F.lit("de"))
        .when(n_fr >= n_es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring features: counts are exact ints; ratios are
    int/int double divisions (bit-deterministic across engines)."""
    text = F.col(text_col)
    n_tok = token_count(text)
    n_stop = F.regexp_count(text, F.lit(STOPWORD_PATTERN))
    n_alpha = F.length(F.regexp_replace(text, WHITESPACE, ""))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_alpha.alias("n_alpha_chars"),
        (n_stop.cast("double") / n_tok).alias("stop_ratio"),
        (n_alpha.cast("double") / n_tok).alias("avg_token_len"),
    )


def fingerprint(text: Column, length: int = 16) -> Column:
    """Document fingerprint: md5 over whitespace-stripped lowercased text.

    A canonical content key for exact near-duplicate families; the rolling
    polynomial variant is in `rolling_fingerprint` (not oracle-paired:
    engines differ on char-fold primitives)."""
    normalized = F.lower(F.regexp_replace(text, WHITESPACE, ""))
    return F.substring(F.md5(normalized), 1, length)


def rolling_fingerprint(text: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over unicode code points, fold kept exact
    with mod-per-step so 64-bit arithmetic never overflows."""
    codes = F.transform(F.split(text, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % mod,
    )
