"""Multimodal plumbing tests: Arrow-batch UDF shapes over binary columns
(decode itself is stubbed — see operators/multimodal.py)."""

from __future__ import annotations

import pytest

from ftm_datalake_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    image_features,
    pseudo_embed,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        ("img1", "image", b"\x89PNG" + bytes(range(200)), {"src": "camera"}),
        ("img2", "image", b"\xff\xd8\xff" + bytes(100), {}),
        ("vid1", "video", bytes(range(256)) * 4, {"fps": "30"}),
        ("aud1", "audio", bytes(64), {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_shapes(spark):
    feats = image_features(_media(spark))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {"img1", "img2"}  # only images
    assert rows["img1"]["n_bytes"] == 204
    assert rows["img1"]["width"] >= 16 and rows["img1"]["height"] >= 16
    assert isinstance(rows["img1"]["mean_luma"], float)


def test_frame_sampling(spark):
    frames = sample_frames(_media(spark))
    rows = frames.collect()
    assert all(r["media_id"] == "vid1" for r in rows)
    assert len(rows) >= 1
    assert all(len(r["frame"]) <= 16 for r in rows)
    idx = [r["frame_idx"] for r in rows]
    assert idx == sorted(idx)


def test_pseudo_embed_deterministic(spark):
    emb1 = {r["media_id"]: r["embedding"] for r in pseudo_embed(_media(spark)).collect()}
    emb2 = {r["media_id"]: r["embedding"] for r in pseudo_embed(_media(spark)).collect()}
    assert emb1 == emb2
    assert len(emb1["img1"]) == 8
    assert all(-1.0 <= v <= 1.0 for v in emb1["img1"])


def test_resize_is_stubbed(spark):
    with pytest.raises(NotImplementedError):
        resize_images(_media(spark), 64, 64)
