"""Multimodal registry query: the image decode path under REAL driver
verification.

Each documents row synthesizes a deterministic P6 PPM payload *inside
the engine* (header via encode(), constant pixel raster via
unhex(repeat(hex(v)))) — so the mapInPandas decode boundary
(operators/multimodal.image_features) runs on genuine binary images and
its extracted features are checkable by pure SQL arithmetic: the oracle
recomputes dims/bytes/luma directly from doc_id. Luma is compared as
round(×1000) → BIGINT: the decoder's float64 Rec.601 mean is exact to
~1e-10 here (constant-pixel images), far inside the rounding margin, so
the check is robust without comparing raw doubles across a Python/numpy
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ftm_datalake_spark.operators.multimodal import image_features
from ftm_datalake_spark.plans.registry import register
from ftm_datalake_spark.sources.tables import load_table


def _synth_ppm_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-engine P6 payload per documents row (see module
    docstring)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(2) + F.col("doc_id") % 3).cast("int")
    h = (F.lit(2) + F.col("doc_id") % 2).cast("int")
    v = (F.col("doc_id") % 256).cast("int")
    header = F.encode(
        F.concat_ws(
            "",
            F.lit("P6\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    raster = F.unhex(
        F.repeat(F.lpad(F.hex(v), 2, "0"), (w * h * F.lit(3)).cast("int"))
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("modality"),
        F.concat(header, raster).alias("content"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


@register(
    "multimodal_image_features",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             2 + doc_id % 3 AS w,
             2 + doc_id % 2 AS h,
             CAST(doc_id % 256 AS DOUBLE) AS v
      FROM documents)
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           CAST(11 + w * h * 3 AS BIGINT) AS n_bytes,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(ROUND((0.299 * v + 0.587 * v + 0.114 * v) * 1000)
                AS BIGINT) AS luma_x1000,
           'ppm' AS decoder
    FROM d
    ORDER BY media_id
    """,
    tags=("multimodal", "mapInPandas"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = image_features(_synth_ppm_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        F.round(F.col("mean_luma") * 1000).cast("long").alias("luma_x1000"),
        "decoder",
    ).orderBy("media_id")


@register(
    "multimodal_resize_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           4 AS width, 4 AS height,
           CAST(ROUND((0.299 * v + 0.587 * v + 0.114 * v) * 1000)
                AS BIGINT) AS luma_x1000,
           'ppm' AS decoder
    FROM (SELECT doc_id, CAST(doc_id % 256 AS DOUBLE) AS v FROM documents)
    ORDER BY media_id
    """,
    tags=("multimodal", "mapInPandas"),
)
def multimodal_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive resize end-to-end: synth PPM → resize_nearest to 4×4 →
    re-decode. Constant-pixel images survive resampling with identical
    luma, so dims prove the resample ran and luma proves the payload
    re-encoded losslessly."""
    from ftm_datalake_spark.operators.multimodal import resize_images

    media = _synth_ppm_media(spark, sf_dir)
    resized = resize_images(media, width=4, height=4)
    feats = image_features(resized)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("mean_luma") * 1000).cast("long").alias("luma_x1000"),
        "decoder",
    ).orderBy("media_id")
