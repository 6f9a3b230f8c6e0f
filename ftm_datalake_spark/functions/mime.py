"""MIME-type → FTM schema mapping (SURVEY §2.2 P5, §2.8 F9).

Reference: ftm_datalake/util.py:19-38 — case-map of mimetype groups to
schema. Expressed as a chained ``when`` Column so Catalyst constant-folds
and codegens it; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact mirror of the reference's MIME_SCHEMAS case map
# (ftm_datalake/util.py:19-38, rigour.mime.types constants): notably the
# OpenDocument types and non-listed image/* subtypes fall through to
# Document — verified against the fixture corpus facet counts
# (tests/fixtures/archive/test_dataset/.leakrfc/index.json: Pages=13,
# Table=6, Image=5 requires ODT/ODS/jp2/svg/webp/vnd.djvu → Document).
PAGES_MIMETYPES = (
    "application/pdf",
    "application/msword",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
)
TABLE_MIMETYPES = (
    "text/csv",
    "application/vnd.ms-excel",
    "application/xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
)
EMAIL_MIMETYPES = (
    "message/rfc822",
    "application/vnd.ms-outlook",
    "application/xml+opf",
)
PLAINTEXT_MIMETYPES = ("text/plain", "application/rtf")
HYPERTEXT_MIMETYPES = ("text/html", "text/xml")
IMAGE_MIMETYPES = (
    "image/png",
    "image/gif",
    "image/jpeg",
    "image/tiff",
    "image/x-djvu",
    "image/x-photoshop",
)

# FTM schema display metadata for index.json things.schemata[] — from the
# public followthemoney model (schema label/plural), fixture-verified.
SCHEMA_LABELS = {
    "Pages": ("Document", "Documents"),
    "Document": ("File", "Files"),
    "HyperText": ("Web page", "Web pages"),
    "Table": ("Table", "Tables"),
    "Email": ("E-Mail", "E-Mails"),
    "PlainText": ("Text file", "Text files"),
    "Image": ("Image", "Images"),
}

EXTENSION_MIMETYPES = {
    "pdf": "application/pdf",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "doc": "application/msword",
    "csv": "text/csv",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "txt": "text/plain",
    "html": "text/html",
    "htm": "text/html",
    "eml": "message/rfc822",
    "msg": "application/vnd.ms-outlook",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "json": "application/json",
    "zip": "application/zip",
}


def mimetype_to_schema(mimetype: Column) -> Column:
    """P5: map a mimetype to its FTM schema, default ``Document``."""
    mt = F.lower(mimetype)
    return (
        F.when(mt.isin(*PAGES_MIMETYPES), F.lit("Pages"))
        .when(mt.isin(*TABLE_MIMETYPES), F.lit("Table"))
        .when(mt.isin(*EMAIL_MIMETYPES), F.lit("Email"))
        .when(mt.isin(*PLAINTEXT_MIMETYPES), F.lit("PlainText"))
        .when(mt.isin(*HYPERTEXT_MIMETYPES), F.lit("HyperText"))
        .when(mt.isin(*IMAGE_MIMETYPES), F.lit("Image"))
        .otherwise(F.lit("Document"))
    )


def guess_mimetype(key: Column) -> Column:
    """F9: mimetype from file extension (lookup map expression)."""
    ext = F.lower(F.element_at(F.split(key, r"\."), -1))
    expr: Column = F.lit("application/octet-stream")
    mapping = F.create_map(
        *[F.lit(x) for pair in EXTENSION_MIMETYPES.items() for x in pair]
    )
    return F.coalesce(F.element_at(mapping, ext), expr)
