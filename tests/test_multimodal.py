"""Multimodal tests: REAL pure-numpy decode for PPM/BMP images and WAV
PCM16 audio (exact dims/luma/RMS), real nearest-neighbor resize, plus the
Arrow-batch plumbing shapes; compressed formats fall back to the stub."""

from __future__ import annotations

import struct

import numpy as np

from ftm_datalake_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    pseudo_embed,
    resize_images,
    sample_frames,
)


def _gradient_pixels(h: int, w: int) -> np.ndarray:
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :] * 5
    px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 7
    px[:, :, 2] = 9
    return px


def _wav_bytes(rate: int, samples: np.ndarray) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _media(spark):
    px = _gradient_pixels(12, 10)
    wav = _wav_bytes(8000, np.array([0, 100, -100, 300], dtype=np.int16))
    rows = [
        ("ppm1", "image", encode_ppm(px), {"src": "camera"}),
        ("bmp1", "image", encode_bmp(px), {}),
        ("png1", "image", b"\x89PNG" + bytes(range(200)), {}),
        ("vid1", "video", bytes(range(256)) * 4, {"fps": "30"}),
        ("aud1", "audio", wav, {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_ppm_bmp_roundtrip():
    px = _gradient_pixels(7, 5)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_image_features_real_decode(spark):
    feats = image_features(_media(spark))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {"ppm1", "bmp1", "png1"}
    px = _gradient_pixels(12, 10).astype(np.float64)
    expect_luma = float(
        (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean()
    )
    for mid in ("ppm1", "bmp1"):
        assert rows[mid]["width"] == 10 and rows[mid]["height"] == 12
        assert abs(rows[mid]["mean_luma"] - expect_luma) < 1e-9
    assert rows["ppm1"]["decoder"] == "ppm"
    assert rows["bmp1"]["decoder"] == "bmp"
    assert rows["png1"]["decoder"] == "stub"  # compressed → stub fallback


def test_resize_real(spark):
    out = {r["media_id"]: r for r in resize_images(_media(spark), 4, 6).collect()}
    assert out["ppm1"]["meta"]["resized"] == "true"
    resized = decode_ppm(bytes(out["ppm1"]["content"]))
    assert resized.shape == (6, 4, 3)
    # nearest-neighbor must only produce colors present in the source
    src_colors = {tuple(c) for c in _gradient_pixels(12, 10).reshape(-1, 3)}
    assert {tuple(c) for c in resized.reshape(-1, 3)} <= src_colors
    bmp_resized = decode_bmp(bytes(out["bmp1"]["content"]))
    assert bmp_resized.shape == (6, 4, 3)
    assert out["png1"]["meta"]["resized"] == "false"  # passthrough


def test_audio_features_real_decode(spark):
    rows = {r["media_id"]: r for r in audio_features(_media(spark)).collect()}
    assert set(rows) == {"aud1"}
    r = rows["aud1"]
    assert r["sample_rate"] == 8000 and r["n_channels"] == 1
    assert r["n_samples"] == 4
    assert abs(r["duration_ms"] - 0.5) < 1e-12
    expect_rms = float(np.sqrt(np.mean(np.array([0, 100, -100, 300]) ** 2)))
    assert abs(r["rms"] - expect_rms) < 1e-9


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
    assert len(emb1["ppm1"]) == 8
    assert all(-1.0 <= v <= 1.0 for v in emb1["ppm1"])


# ------------------------------------------------------------ video stream
def test_split_ppm_stream_walks_mixed_size_frames():
    from ftm_datalake_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        split_ppm_stream,
    )
    import numpy as np

    f1 = encode_ppm(np.full((2, 3, 3), 10, dtype=np.uint8))
    f2 = encode_ppm(np.full((4, 1, 3), 200, dtype=np.uint8))
    frames = split_ppm_stream(f1 + f2)
    assert frames is not None and len(frames) == 2
    assert decode_ppm(frames[0]).shape == (2, 3, 3)
    assert decode_ppm(frames[1]).shape == (4, 1, 3)


def test_split_ppm_stream_rejects_truncated_and_garbage():
    from ftm_datalake_spark.operators.multimodal import (
        encode_ppm,
        split_ppm_stream,
    )
    import numpy as np

    good = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    assert split_ppm_stream(good[:-1]) is None  # truncated raster
    assert split_ppm_stream(good + b"JUNK") is None  # trailing garbage
    assert split_ppm_stream(b"RIFFxxxx") is None  # wrong magic
    assert split_ppm_stream(b"") is None


def test_video_frame_features_samples_every_second_frame(spark):
    from ftm_datalake_spark.operators.multimodal import (
        encode_ppm,
        video_frame_features,
    )
    import numpy as np

    stream = b"".join(
        encode_ppm(np.full((2, 2, 3), 50 * i, dtype=np.uint8)) for i in range(5)
    )
    media = spark.createDataFrame(
        [("v1", "video", bytearray(stream))],
        "media_id string, modality string, content binary",
    )
    rows = sorted(
        video_frame_features(media, every_n=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in rows)
    assert [round(r["mean_luma"]) for r in rows] == [0, 100, 200]


# ----------------------------------------------------------- fuzz safety
def test_decoders_never_crash_on_arbitrary_bytes():
    """Decoders must return None (not raise) for any malformed payload —
    a corrupt blob in a 100 TB crawl cannot be allowed to kill a stage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ftm_datalake_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        split_ppm_stream,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def run(payload):
        for fn in (decode_ppm, decode_bmp, decode_wav, split_ppm_stream):
            try:
                fn(payload)
            except Exception as e:  # noqa: BLE001
                raise AssertionError(f"{fn.__name__} raised on fuzz input: {e}")

    run()


def test_decoders_never_crash_on_truncated_valid_prefixes():
    import numpy as np

    from ftm_datalake_spark.operators.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        split_ppm_stream,
    )

    ppm = encode_ppm(np.full((3, 3, 3), 7, dtype=np.uint8))
    bmp = encode_bmp(np.full((3, 3, 3), 7, dtype=np.uint8))
    for payload in (ppm, bmp):
        for cut in range(len(payload)):
            decode_ppm(payload[:cut])
            decode_bmp(payload[:cut])
            split_ppm_stream(payload[:cut])


def test_decoders_reject_hostile_headers():
    from ftm_datalake_spark.operators.multimodal import decode_ppm, decode_wav

    assert decode_ppm(b"P6\n-3 2\n255\n" + b"\x00" * 18) is None  # negative dim
    assert decode_ppm(b"P6\n2 2\n255\n\x00") is None  # truncated raster
    assert decode_ppm(b"P6\n2x 2\n255\n" + b"\x00" * 12) is None  # non-numeric
    # RIFF/WAVE magic with a truncated fmt chunk must not raise
    assert decode_wav(b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01") is None


def test_decode_wav_pcm8_and_float32():
    import struct as st

    from ftm_datalake_spark.operators.multimodal import decode_wav

    def wav(fmt, bits, data_bytes, rate=8000, channels=1):
        fmt_chunk = st.pack("<HHIIHH", fmt, channels, rate, rate * (bits // 8), bits // 8, bits)
        return (
            b"RIFF" + st.pack("<I", 36 + len(data_bytes)) + b"WAVE"
            + b"fmt " + st.pack("<I", 16) + fmt_chunk
            + b"data" + st.pack("<I", len(data_bytes)) + data_bytes
        )

    # PCM8: unsigned bytes recentered ×256 — 128 → 0, 129 → 256, 0 → -32768
    rate, ch, samples = decode_wav(wav(1, 8, bytes([128, 129, 0])))
    assert (rate, ch) == (8000, 1)
    assert list(samples) == [0, 256, -32768]

    # float32: scaled ×32768 — 0.5 → 16384.0
    data = st.pack("<3f", 0.0, 0.5, -1.0)
    rate, ch, samples = decode_wav(wav(3, 32, data))
    assert list(samples) == [0.0, 16384.0, -32768.0]

    # 24-bit PCM: unsupported → None
    assert decode_wav(wav(1, 24, b"\x00" * 6)) is None
    # data chunk before fmt chunk: malformed → None
    bad = (b"RIFF" + st.pack("<I", 40) + b"WAVE"
           + b"data" + st.pack("<I", 4) + b"\x00\x00\x00\x00")
    assert decode_wav(bad) is None

def test_audio_spectral_features_square_wave(spark):
    from ftm_datalake_spark.operators.multimodal import audio_spectral_features

    n, c, a = 128, 5, 700
    i = np.arange(n)
    sq = np.where((i * c) % n * 2 < n, a, -a).astype(np.int16)
    sine = np.round(900 * np.sin(2 * np.pi * 7 * np.arange(256) / 256)).astype(
        np.int16
    )
    rows = [
        ("sq", "audio", _wav_bytes(8000, sq), {}),
        ("sine", "audio", _wav_bytes(16000, sine), {}),
        ("junk", "audio", b"RIFFxxxx", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in audio_spectral_features(media).collect()}
    assert set(out) == {"sq", "sine", "junk"}
    r = out["sq"]
    assert r["dominant_bin"] == c
    assert r["zero_cross"] == 2 * c - 1
    assert r["rms"] == float(a)  # |x| constant -> exact
    assert abs(r["dominant_hz"] - c * 8000 / n) < 1e-12
    s = out["sine"]
    assert s["dominant_bin"] == 7  # pure tone, integer cycles
    assert abs(s["dominant_hz"] - 7 * 16000 / 256) < 1e-12
    assert out["junk"]["dominant_bin"] is None


def test_phash_brightness_invariance_and_discrimination():
    from ftm_datalake_spark.operators.multimodal import phash63

    def img(fx, fy, b):
        x = np.arange(16)[None, :]
        y = np.arange(16)[:, None]
        val = ((x * fx + y * fy) * 7) % 200 + b
        return np.repeat(val[:, :, None], 3, axis=2).astype(np.uint8)

    ham = lambda a, b: bin(a ^ b).count("1")
    # uniform brightness shift moves only the discarded DC coefficient
    assert ham(phash63(img(2, 3, 0)), phash63(img(2, 3, 16))) <= 2
    # different stripe orientations are far apart
    assert ham(phash63(img(2, 3, 0)), phash63(img(4, 1, 0))) > 10
    # scale invariance: the same pattern rendered 2x larger
    big = np.repeat(np.repeat(img(2, 3, 0), 2, axis=0), 2, axis=1)
    assert ham(phash63(img(2, 3, 0)), phash63(big)) <= 2


def test_phash_neardup_blocking_matches_brute_force(spark):
    from ftm_datalake_spark.operators.multimodal import (
        PHASH_SCHEMA,
        phash_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    base = int(rng.integers(0, 1 << 63))
    rows = []
    hashes = {}
    for i in range(60):
        h = base
        for bit in rng.choice(63, size=int(rng.integers(0, 12)), replace=False):
            h ^= 1 << int(bit)
        mid = f"m{i:02d}"
        rows.append((mid, h))
        hashes[mid] = h
    feats = spark.createDataFrame(rows, PHASH_SCHEMA)
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in phash_neardup_pairs(feats, max_hamming=5).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    want = {
        (a, b, ham(hashes[a], hashes[b]))
        for a in hashes
        for b in hashes
        if a < b and ham(hashes[a], hashes[b]) <= 5
    }
    assert got == want and len(want) > 0


def test_phash_neardup_rejects_weak_banding():
    import pytest as _pytest

    from ftm_datalake_spark.operators.multimodal import phash_neardup_pairs

    with _pytest.raises(ValueError):
        phash_neardup_pairs(None, max_hamming=8)


def test_decimate_audio_roundtrip(spark):
    from ftm_datalake_spark.operators.multimodal import (
        decimate_audio,
        decode_wav,
        encode_wav_pcm16,
    )

    samples = np.arange(-50, 50, dtype=np.int16)
    wav = encode_wav_pcm16(8000, samples)
    rate, ch, got = decode_wav(wav)
    assert (rate, ch) == (8000, 1) and np.array_equal(got, samples)
    rows = [
        ("aud", "audio", wav, {}),
        ("img", "image", b"not audio", {}),
        ("bad", "audio", b"RIFFjunk", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decimate_audio(media, 2).collect()}
    rate2, _, dec = decode_wav(bytes(out["aud"]["content"]))
    assert rate2 == 4000 and np.array_equal(dec, samples[::2])
    assert bytes(out["img"]["content"]) == b"not audio"  # passthrough
    assert bytes(out["bad"]["content"]) == b"RIFFjunk"  # undecodable kept


def test_resize_bilinear_exact_on_plane_and_constant():
    from ftm_datalake_spark.operators.multimodal import resize_bilinear

    # constant image: every output pixel is the constant
    const = np.full((8, 6, 3), 77, dtype=np.uint8)
    out = resize_bilinear(const, 3, 4)
    assert out.shape == (4, 3, 3) and np.allclose(out, 77.0, atol=1e-12)

    # linear ramp: interpolation reproduces the plane at output centers
    x = np.arange(12)[None, :]
    y = np.arange(8)[:, None]
    ramp = np.repeat((2 * x + 3 * y)[:, :, None], 3, axis=2).astype(np.float64)
    out = resize_bilinear(ramp, 6, 4)
    xs = (np.arange(6) + 0.5) * 12 / 6 - 0.5
    ys = (np.arange(4) + 0.5) * 8 / 4 - 0.5
    want = 2 * xs[None, :] + 3 * ys[:, None]
    assert np.allclose(out[:, :, 0], want, atol=1e-10)
    # mean-invariance of the plane under clean downscale
    assert abs(out[:, :, 0].mean() - ramp[:, :, 0].mean()) < 1e-10


# ----------------------------------------------------------------- y4m


def test_y4m_roundtrip_all_chroma_formats():
    import numpy as np

    from ftm_datalake_spark.operators.multimodal import (
        encode_y4m,
        parse_y4m,
        y4m_frame_luma,
    )

    for cfmt in ("420jpeg", "420mpeg2", "422", "444", "mono"):
        frames = [np.full((2, 4), v, np.uint8) for v in (0, 7, 200)]
        w, h, c, fr = parse_y4m(encode_y4m(frames, cfmt))
        assert (w, h, c) == (4, 2, cfmt)
        assert [y4m_frame_luma(w, h, f) for f in fr] == [0.0, 7.0, 200.0]
    # non-constant plane: exact float mean of the Y' bytes
    y = np.arange(8, dtype=np.uint8).reshape(2, 4)
    w, h, _, fr = parse_y4m(encode_y4m([y]))
    assert y4m_frame_luma(w, h, fr[0]) == 3.5


def test_y4m_malformed_rejected():
    from ftm_datalake_spark.operators.multimodal import parse_y4m

    assert parse_y4m(b"") is None
    assert parse_y4m(b"P6\n1 1\n255\n\x00\x00\x00") is None  # not y4m
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C420\n") == (4, 2, "420", [])
    # truncated frame payload
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C420\nFRAME\n" + b"\x00" * 5) is None
    assert parse_y4m(b"YUV4MPEG2 W3 H3 C420\n") is None  # odd dims for 420
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C999\n") is None  # unknown chroma
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C420\nJUNK\n") is None  # no FRAME


def test_video_frame_features_routes_y4m_and_p6(spark):
    import numpy as np

    from ftm_datalake_spark.operators.multimodal import (
        encode_ppm,
        encode_y4m,
        video_frame_features,
    )

    y4m = encode_y4m([np.full((2, 2), v, np.uint8) for v in (10, 20, 30)])
    p6 = b"".join(
        encode_ppm(np.full((2, 2, 3), v, np.uint8)) for v in (40, 50)
    )
    media = spark.createDataFrame(
        [("vid-y4m", "video", bytearray(y4m)), ("vid-p6", "video", bytearray(p6))],
        "media_id STRING, modality STRING, content BINARY",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in video_frame_features(media, every_n=2).collect()
    }
    assert rows[("vid-y4m", 0)]["decoder"] == "y4m"
    assert rows[("vid-y4m", 0)]["mean_luma"] == 10.0
    assert rows[("vid-y4m", 2)]["mean_luma"] == 30.0
    assert ("vid-y4m", 1) not in rows  # stride honored
    assert rows[("vid-p6", 0)]["decoder"] == "ppm-stream"
    assert rows[("vid-p6", 0)]["n_frames"] == 2
