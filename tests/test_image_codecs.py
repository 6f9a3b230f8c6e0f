"""PNG and baseline-JPEG decoder tests.

The JPEG fixtures are synthesized by a minimal test-side baseline
encoder (forward DCT + quantize + standard Annex K Huffman tables), so
expected pixels are computed independently: expected = clip(round(
IDCT(quantize_roundtripped coefficients))) — no circular dependency on
the decoder under test."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ftm_datalake_spark.operators.multimodal import (
    _IDCT_A,
    _ZIGZAG,
    decode_image,
    decode_jpeg,
    decode_png,
    encode_png,
)

# ------------------------------------------------------------ PNG fixtures


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _make_png(pixels: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Encode with explicit per-row filter types (exercises the unfilter)."""
    import struct

    h, w = pixels.shape[:2]
    channels = pixels.shape[2] if pixels.ndim == 3 else 1
    flat = pixels.reshape(h, w * channels).astype(np.int64)
    raw = bytearray()
    prior = np.zeros(w * channels, np.int64)
    for y in range(h):
        ftype = filters[y % len(filters)]
        row = flat[y]
        bpp = channels
        if ftype == 0:
            enc = row
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            enc = (row - left) % 256
        elif ftype == 2:  # Up
            enc = (row - prior) % 256
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            enc = (row - (left + prior) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            enc = (row - pred) % 256
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7 + y) % 256, (y * 5) % 256, (x * 3 + y * 11) % 256], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_rgb_all_filter_types(filters):
    px = _gradient_rgb(13, 9)
    out = decode_png(_make_png(px, color_type=2, filters=filters))
    np.testing.assert_array_equal(out, px)


def test_png_grayscale():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)[:, :, None]
    out = decode_png(_make_png(g, color_type=0, filters=[2]))
    np.testing.assert_array_equal(out, np.repeat(g, 3, axis=2))


def test_png_rgba_drops_alpha():
    rgb = _gradient_rgb(6, 5)
    rgba = np.concatenate(
        [rgb, np.full((6, 5, 1), 77, np.uint8)], axis=2
    )
    out = decode_png(_make_png(rgba, color_type=6, filters=[1, 4]))
    np.testing.assert_array_equal(out, rgb)


def test_png_encode_decode_roundtrip():
    px = _gradient_rgb(11, 17)
    np.testing.assert_array_equal(decode_png(encode_png(px)), px)
    codec, decoded = decode_image(encode_png(px))
    assert codec == "png"
    np.testing.assert_array_equal(decoded, px)


def test_png_rejects_garbage_and_truncation():
    assert decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk") is None
    valid = encode_png(_gradient_rgb(4, 4))
    assert decode_png(valid[: len(valid) // 2]) is None
    assert decode_png(b"") is None
    assert decode_png(None) is None


# ----------------------------------------------------- JPEG test-side encoder

# Annex K Huffman specs: (bits[16], symbols)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
)
_AC_LUMA = (_AC_LUMA_BITS, _AC_LUMA_VALS)


def _enc_codes(bits: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_baseline_jpeg(pixels: np.ndarray, quant: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Grayscale HxW (multiple of 8) → (jpeg bytes, expected decoded HxW).

    Expected pixels are the independent forward computation:
    clip(round(IDCT(round(DCT(px-128)/q) * q)) + 128)."""
    import struct

    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    dc_codes = _enc_codes(*_DC_LUMA)
    ac_codes = _enc_codes(*_AC_LUMA)
    qz = quant.astype(np.int64)  # zigzag order, 64

    writer = _BitWriter()
    pred = 0
    expected = np.zeros_like(pixels, dtype=np.float64)
    for by in range(h // 8):
        for bx in range(w // 8):
            block = pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128.0
            coeffs = _IDCT_A @ block @ _IDCT_A.T  # forward orthonormal DCT
            zz = np.round(coeffs.reshape(-1)[_ZIGZAG] / qz).astype(np.int64)
            # independent expected reconstruction
            deq = np.zeros(64, np.float64)
            deq[_ZIGZAG] = (zz * qz).astype(np.float64)
            expected[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _IDCT_A.T @ deq.reshape(8, 8) @ _IDCT_A + 128.0
            )
            # entropy-encode
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t = _category(diff)
            writer.write(*dc_codes[t])
            if t:
                writer.write(t, _magnitude_bits(diff, t))
            run = 0
            last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    if run == 16:
                        writer.write(*ac_codes[0xF0])  # ZRL
                        run = 0
                    continue
                s = _category(int(zz[k]))
                writer.write(*ac_codes[(run << 4) | s])
                writer.write(s, _magnitude_bits(int(zz[k]), s))
                run = 0
            if last_nz < 63:
                writer.write(*ac_codes[0x00])  # EOB

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qz))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + _DC_LUMA[1]) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + _AC_LUMA[1]
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    payload = (
        b"\xff\xd8" + dqt + sof + dht + sos + writer.flush() + b"\xff\xd9"
    )
    return payload, np.clip(np.round(expected), 0, 255).astype(np.uint8)


_Q_ONES = np.ones(64, np.int64)
_Q_STD = np.array(  # Annex K luminance table, zigzag order
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    np.int64,
)


def test_jpeg_solid_gray_exact():
    px = np.full((8, 8), 130, np.uint8)
    data, expected = _encode_baseline_jpeg(px, _Q_ONES)
    out = decode_jpeg(data)
    assert out is not None and out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[:, :, 0], expected)
    np.testing.assert_array_equal(out[:, :, 0], px)  # DC-only: lossless


def test_jpeg_gradient_multiblock_exact():
    y, x = np.mgrid[0:24, 0:16]
    px = (110 + 2 * x + 3 * y).astype(np.uint8)  # low amplitude, cats in range
    data, expected = _encode_baseline_jpeg(px, _Q_ONES)
    out = decode_jpeg(data)
    assert out is not None and out.shape == (24, 16, 3)
    np.testing.assert_array_equal(out[:, :, 0], expected)
    # q=1 quantization error ≤ rounding: decoded within 1 of source
    assert np.abs(out[:, :, 0].astype(int) - px.astype(int)).max() <= 1


def test_jpeg_std_quant_table_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(60, 200, size=(16, 16), dtype=np.int64).astype(np.uint8)
    data, expected = _encode_baseline_jpeg(px, _Q_STD)
    out = decode_jpeg(data)
    assert out is not None
    np.testing.assert_array_equal(out[:, :, 0], expected)


def test_jpeg_dispatch_and_magic():
    px = np.full((8, 8), 99, np.uint8)
    data, _ = _encode_baseline_jpeg(px, _Q_ONES)
    codec, decoded = decode_image(data)
    assert codec == "jpeg"
    assert decoded[0, 0, 0] == 99


def test_jpeg_rejects_arithmetic_lossless_and_garbage():
    px = np.full((8, 8), 99, np.uint8)
    data, _ = _encode_baseline_jpeg(px, _Q_ONES)
    arithmetic = data.replace(b"\xff\xc0", b"\xff\xc9", 1)  # SOF9
    assert decode_jpeg(arithmetic) is None
    lossless = data.replace(b"\xff\xc0", b"\xff\xc3", 1)  # SOF3
    assert decode_jpeg(lossless) is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0junk") is None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(None) is None


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_jpeg_png_never_crash_on_fuzz(data):
    decode_jpeg(b"\xff\xd8" + data)
    decode_png(b"\x89PNG\r\n\x1a\n" + data)


# ------------------------------------------------- color JPEG (3-component)


def _encode_color_jpeg(
    rgb: np.ndarray, sampling: tuple[int, int]
) -> tuple[bytes, np.ndarray]:
    """RGB HxW (dims multiples of 8*sampling) → (jpeg bytes, expected RGB).

    YCbCr 3-component baseline with luma sampling factors (hs, vs) and
    chroma at 1x1 (so (2,2) = 4:2:0, (1,1) = 4:4:4). Chroma planes are
    box-downsampled then encoded; expected pixels recompute the whole
    pipeline independently: subsample → DCT→quantize→dequantize→IDCT per
    plane → replicate-upsample → YCbCr→RGB → round/clip, mirroring what
    a correct decoder must produce bit-for-bit."""
    import struct

    hs, vs = sampling
    h, w = rgb.shape[:2]
    assert h % (8 * vs) == 0 and w % (8 * hs) == 0
    r, g, b = (rgb[:, :, k].astype(np.float64) for k in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    def box_down(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
        if fy == 1 and fx == 1:
            return p
        hh, ww = p.shape
        return p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))

    planes = [y, box_down(cb, vs, hs), box_down(cr, vs, hs)]
    qz = np.ones(64, np.int64)
    dc_codes = _enc_codes(*_DC_LUMA)
    ac_codes = _enc_codes(*_AC_LUMA)

    # encode MCU-interleaved; collect reconstructed planes for expectation
    recon = [np.zeros_like(p) for p in planes]
    factors = [(hs, vs), (1, 1), (1, 1)]
    mcus_y, mcus_x = h // (8 * vs), w // (8 * hs)
    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (chs, cvs)) in enumerate(zip(planes, factors)):
                for by in range(cvs):
                    for bx in range(chs):
                        y0 = (my * cvs + by) * 8
                        x0 = (mx * chs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coeffs = _IDCT_A @ block @ _IDCT_A.T
                        zz = np.round(coeffs.reshape(-1)[_ZIGZAG] / qz).astype(np.int64)
                        deq = np.zeros(64)
                        deq[_ZIGZAG] = (zz * qz).astype(np.float64)
                        recon[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                            _IDCT_A.T @ deq.reshape(8, 8) @ _IDCT_A + 128.0
                        )
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        t = _category(diff)
                        writer.write(*dc_codes[t])
                        if t:
                            writer.write(t, _magnitude_bits(diff, t))
                        run = 0
                        last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                if run == 16:
                                    writer.write(*ac_codes[0xF0])
                                    run = 0
                                continue
                            s = _category(int(zz[k]))
                            writer.write(*ac_codes[(run << 4) | s])
                            writer.write(s, _magnitude_bits(int(zz[k]), s))
                            run = 0
                        if last_nz < 63:
                            writer.write(*ac_codes[0x00])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof_comps = bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0])
    sos_comps = bytes([1, 0x00, 2, 0x00, 3, 0x00])
    data = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qz))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + sof_comps)
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + _DC_LUMA[1])
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + _AC_LUMA[1])
        + seg(0xDA, bytes([3]) + sos_comps + bytes([0, 63, 0]))
        + writer.flush()
        + b"\xff\xd9"
    )
    # expected: replicate-upsample chroma, JFIF ycbcr→rgb, round/clip
    ry = recon[0]
    rcb = np.repeat(np.repeat(recon[1], vs, axis=0), hs, axis=1) - 128.0
    rcr = np.repeat(np.repeat(recon[2], vs, axis=0), hs, axis=1) - 128.0
    exp = np.stack(
        [
            ry + 1.402 * rcr,
            ry - 0.344136 * rcb - 0.714136 * rcr,
            ry + 1.772 * rcb,
        ],
        axis=2,
    )
    return data, np.clip(np.round(exp), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("sampling", [(1, 1), (2, 2), (2, 1)])
def test_jpeg_color_exact(sampling):
    rng = np.random.default_rng(11)
    hs, vs = sampling
    h, w = 8 * vs * 2, 8 * hs * 2
    rgb = rng.integers(50, 206, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    data, expected = _encode_color_jpeg(rgb, sampling)
    out = decode_jpeg(data)
    assert out is not None and out.shape == expected.shape
    np.testing.assert_array_equal(out, expected)


def test_jpeg_color_solid_is_near_lossless():
    rgb = np.full((16, 16, 3), 0, np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 120, 130, 140
    data, expected = _encode_color_jpeg(rgb, (2, 2))
    out = decode_jpeg(data)
    np.testing.assert_array_equal(out, expected)
    # solid color: DCT is DC-only, error is color-transform rounding only
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


# --------------------------------------------------- Adam7 + 16-bit PNG

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _make_png_adam7(pixels: np.ndarray) -> bytes:
    """Interlaced encoder: serialize the 7 passes (filter 0 rows)."""
    import struct

    h, w, channels = pixels.shape
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = pixels[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            raw.append(0)
            raw += sub[y].astype(np.uint8).tobytes()
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)  # interlace=1
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("dims", [(16, 16), (13, 9), (1, 1), (7, 3), (8, 1)])
def test_png_adam7_interlaced(dims):
    h, w = dims
    px = _gradient_rgb(h, w)
    out = decode_png(_make_png_adam7(px))
    assert out is not None, f"decode failed for {dims}"
    np.testing.assert_array_equal(out, px)


def test_png_16bit_reduces_to_high_byte():
    import struct

    h, w = 5, 4
    rgb8 = _gradient_rgb(h, w)
    # 16-bit big-endian samples: high byte = rgb8, low byte = arbitrary
    rgb16 = np.zeros((h, w * 3 * 2), np.uint8)
    rgb16[:, 0::2] = rgb8.reshape(h, w * 3)
    rgb16[:, 1::2] = 0xAB
    raw = b"".join(b"\x00" + rgb16[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(data)
    np.testing.assert_array_equal(out, rgb8)


def test_png_palette():
    import struct

    h, w = 4, 6
    palette = np.array([[250, 10, 30], [0, 200, 100], [5, 5, 5]], np.uint8)
    idx = (np.arange(h * w) % 3).reshape(h, w).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(data), palette[idx])


# ------------------------------------------------- progressive JPEG (SOF2)


def _encode_progressive_gray_jpeg(
    pixels: np.ndarray, quant: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Grayscale progressive encoder (spectral selection + successive
    approximation, Al=1 then refine), independent of the decoder:
    scan 1: DC first  (Ah=0, Al=1)      scan 2: AC 1-20 first (Al=1)
    scan 3: AC 21-63 first (Al=1)       scan 4: DC refine (Ah=1, Al=0)
    scan 5: AC 1-63 refine (Ah=1, Al=0)
    Returns (bytes, expected pixels) with the expectation computed from
    the quantized coefficients alone (same math as the baseline tests)."""
    import struct

    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    qz = quant.astype(np.int64)
    bh, bw = h // 8, w // 8
    # forward DCT + quantize, and the independent expected reconstruction
    coefs = np.zeros((bh, bw, 64), np.int64)
    expected = np.zeros_like(pixels, dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            block = pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(np.float64) - 128.0
            cf = _IDCT_A @ block @ _IDCT_A.T
            zz = np.round(cf.reshape(-1)[_ZIGZAG] / qz).astype(np.int64)
            coefs[by, bx] = zz
            deq = np.zeros(64)
            deq[_ZIGZAG] = (zz * qz).astype(np.float64)
            expected[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _IDCT_A.T @ deq.reshape(8, 8) @ _IDCT_A + 128.0
            )
    dc_codes = _enc_codes(*_DC_LUMA)
    ac_codes = _enc_codes(*_AC_LUMA)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qz))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + _DC_LUMA[1])
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + _AC_LUMA[1])

    # scan 1: DC first, Al=1 (arithmetic shift for DC)
    out += sos(0, 0, 0, 1)
    writer = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            v = int(coefs[by, bx][0]) >> 1
            diff = v - pred
            pred = v
            t = _category(diff)
            writer.write(*dc_codes[t])
            if t:
                writer.write(t, _magnitude_bits(diff, t))
    out += writer.flush()

    # scans 2-3: AC first at Al=1 (magnitude shift). The standard Annex K
    # tables have no EOBn symbols (0x10..0xE0 — those need custom
    # progressive tables), so every EOB run has length 1 (code 0x00),
    # which is spec-legal and hits the same decoder path with r=0.
    for ss, se in ((1, 20), (21, 63)):
        out += sos(ss, se, 0, 1)
        writer = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                zz = coefs[by, bx]
                shifted = [
                    (k, (1 if int(zz[k]) > 0 else -1) * (abs(int(zz[k])) >> 1))
                    for k in range(ss, se + 1)
                ]
                nz = [(k, sv) for k, sv in shifted if sv]
                prev = ss - 1
                for k, sv in nz:
                    run = k - prev - 1
                    while run > 15:
                        writer.write(*ac_codes[0xF0])
                        run -= 16
                    s = _category(sv)
                    writer.write(*ac_codes[(run << 4) | s])
                    writer.write(s, _magnitude_bits(sv, s))
                    prev = k
                if not nz or nz[-1][0] < se:
                    writer.write(*ac_codes[0x00])  # EOB, run of exactly 1
        out += writer.flush()

    # scan 4: DC refinement (bit Al=0)
    out += sos(0, 0, 1, 0)
    writer = _BitWriter()
    for by in range(bh):
        for bx in range(bw):
            writer.write(1, int(coefs[by, bx][0]) & 1)
    out += writer.flush()

    # scan 5: AC refinement Ah=1, Al=0. Correction bits for history-
    # nonzero coeffs interleave with the zero-run in coefficient order;
    # `events` tracks that order so ZRL splits land on exact 16-zero
    # boundaries. EOB runs are always length 1 (standard tables carry no
    # EOBn symbols).
    out += sos(1, 63, 1, 0)
    writer = _BitWriter()
    for by in range(bh):
        for bx in range(bw):
            zz = coefs[by, bx]
            events: list[tuple[str, int]] = []  # ('z', _) | ('c', bit)
            for k in range(1, 64):
                t = abs(int(zz[k]))
                if t == 0:
                    events.append(("z", 0))
                elif t > 1:
                    events.append(("c", t & 1))
                else:  # newly significant: emit run + sign, flush events
                    r = sum(1 for e, _ in events if e == "z")
                    while r > 15:
                        writer.write(*ac_codes[0xF0])  # ZRL: 16 zero-history
                        zeros = 0
                        while zeros < 16:
                            e, bit = events.pop(0)
                            if e == "z":
                                zeros += 1
                            else:
                                writer.write(1, bit)
                        r -= 16
                    writer.write(*ac_codes[(r << 4) | 1])
                    writer.write(1, 1 if int(zz[k]) > 0 else 0)
                    for e, bit in events:
                        if e == "c":
                            writer.write(1, bit)
                    events.clear()
            if events:  # trailing zeros/corrections: EOB (run of 1) + bits
                writer.write(*ac_codes[0x00])
                for e, bit in events:
                    if e == "c":
                        writer.write(1, bit)
    out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out), np.clip(np.round(expected), 0, 255).astype(np.uint8)


def test_progressive_jpeg_solid_gray():
    px = np.full((8, 8), 130, np.uint8)
    data, expected = _encode_progressive_gray_jpeg(px, _Q_ONES)
    out = decode_jpeg(data)
    assert out is not None, "progressive decode returned None"
    np.testing.assert_array_equal(out[:, :, 0], expected)
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_progressive_jpeg_gradient_matches_baseline():
    y, x = np.mgrid[0:24, 0:16]
    px = (110 + 2 * x + 3 * y).astype(np.uint8)
    prog, expected = _encode_progressive_gray_jpeg(px, _Q_ONES)
    base, expected_b = _encode_baseline_jpeg(px, _Q_ONES)
    np.testing.assert_array_equal(expected, expected_b)  # same coeff math
    out_p = decode_jpeg(prog)
    out_b = decode_jpeg(base)
    assert out_p is not None
    np.testing.assert_array_equal(out_p, out_b)  # progressive == baseline
    np.testing.assert_array_equal(out_p[:, :, 0], expected)


def test_progressive_jpeg_random_blocks_std_quant():
    rng = np.random.default_rng(23)
    px = rng.integers(40, 216, size=(24, 24), dtype=np.int64).astype(np.uint8)
    data, expected = _encode_progressive_gray_jpeg(px, _Q_STD)
    out = decode_jpeg(data)
    assert out is not None
    np.testing.assert_array_equal(out[:, :, 0], expected)


def test_progressive_jpeg_high_frequency_content():
    # checkerboard maximizes AC energy → exercises ZRL, EOB runs, and
    # refinement correction bits densely
    y, x = np.mgrid[0:16, 0:16]
    px = (128 + 60 * ((x + y) % 2) - 30).astype(np.uint8)
    data, expected = _encode_progressive_gray_jpeg(px, _Q_ONES)
    out = decode_jpeg(data)
    assert out is not None
    np.testing.assert_array_equal(out[:, :, 0], expected)


def _encode_progressive_color_jpeg(
    rgb: np.ndarray, sampling: tuple[int, int]
) -> tuple[bytes, np.ndarray]:
    """Color progressive encoder: interleaved DC scans + per-component
    non-interleaved AC scans. With sampling (2,2) and dims that are
    multiples of 8 but NOT of 16, the luma component's own block grid is
    smaller than the MCU-padded grid — exercising the decoder's
    non-interleaved dimension math. Expected output mirrors the baseline
    color pipeline (DCT roundtrip per plane, replicate-upsample, JFIF)."""
    import struct

    hs, vs = sampling
    h, w = rgb.shape[:2]
    r_, g_, b_ = (rgb[:, :, k].astype(np.float64) for k in range(3))
    y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    cb = 128.0 - 0.168735892 * r_ - 0.331264108 * g_ + 0.5 * b_
    cr = 128.0 + 0.5 * r_ - 0.418687589 * g_ - 0.081312411 * b_

    def box_down(p, fy, fx):
        if fy == 1 and fx == 1:
            return p
        hh, ww = p.shape
        return p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))

    planes = [y, box_down(cb, vs, hs), box_down(cr, vs, hs)]
    factors = [(hs, vs), (1, 1), (1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qz = np.ones(64, np.int64)
    dc_codes = _enc_codes(*_DC_LUMA)
    ac_codes = _enc_codes(*_AC_LUMA)

    # per-component quantized coeffs on the MCU-padded grid (edge blocks
    # padded by edge replication) + reconstruction on the true grid
    coefs = []
    recon = []
    for ci, (p, (chs, cvs)) in enumerate(zip(planes, factors)):
        gh, gw = mcus_y * cvs * 8, mcus_x * chs * 8
        padded = np.zeros((gh, gw))
        ph, pw = p.shape
        padded[:ph, :pw] = p
        padded[ph:, :pw] = p[-1:, :]
        padded[:, pw:] = padded[:, pw - 1 : pw]
        bh, bw = gh // 8, gw // 8
        cf = np.zeros((bh, bw, 64), np.int64)
        rec = np.zeros((gh, gw))
        for by in range(bh):
            for bx in range(bw):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                zz = np.round((_IDCT_A @ block @ _IDCT_A.T).reshape(-1)[_ZIGZAG] / qz).astype(np.int64)
                cf[by, bx] = zz
                deq = np.zeros(64)
                deq[_ZIGZAG] = (zz * qz).astype(np.float64)
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _IDCT_A.T @ deq.reshape(8, 8) @ _IDCT_A + 128.0
                )
        coefs.append(cf)
        recon.append(rec[:ph, :pw])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qz))
    sof_comps = bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([3]) + sof_comps)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + _DC_LUMA[1])
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA[0]) + _AC_LUMA[1])

    # scan 1: interleaved DC first, Al=1 — MCU order, vs×hs luma blocks/MCU
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (chs, cvs) in enumerate(factors):
                for by in range(cvs):
                    for bx in range(chs):
                        v = int(coefs[ci][my * cvs + by, mx * chs + bx][0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        writer.write(*dc_codes[t])
                        if t:
                            writer.write(t, _magnitude_bits(diff, t))
    out += writer.flush()

    # scans 2-4: per-component AC first (Al=0 — single AC stage), over
    # each component's TRUE block grid (not the MCU-padded grid)
    for ci, (comp_id, (chs, cvs)) in enumerate(zip([1, 2, 3], factors)):
        comp_w = -(-w * chs // hmax)
        comp_h = -(-h * cvs // vmax)
        bw_n, bh_n = -(-comp_w // 8), -(-comp_h // 8)
        out += seg(0xDA, bytes([1, comp_id, 0x00, 1, 63, 0x00]))
        writer = _BitWriter()
        for by in range(bh_n):
            for bx in range(bw_n):
                zz = coefs[ci][by, bx]
                nz = [(k, int(zz[k])) for k in range(1, 64) if zz[k]]
                prev = 0
                for k, v in nz:
                    run = k - prev - 1
                    while run > 15:
                        writer.write(*ac_codes[0xF0])
                        run -= 16
                    s = _category(v)
                    writer.write(*ac_codes[(run << 4) | s])
                    writer.write(s, _magnitude_bits(v, s))
                    prev = k
                if not nz or nz[-1][0] < 63:
                    writer.write(*ac_codes[0x00])
        out += writer.flush()

    # scan 5: interleaved DC refinement (Ah=1, Al=0)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (chs, cvs) in enumerate(factors):
                for by in range(cvs):
                    for bx in range(chs):
                        writer.write(1, int(coefs[ci][my * cvs + by, mx * chs + bx][0]) & 1)
    out += writer.flush()
    out += b"\xff\xd9"

    # expected: AC scans only covered the TRUE grid; MCU-padding blocks
    # got DC-only data, but padding is cropped before color convert
    ry = recon[0]
    rcb = np.repeat(np.repeat(recon[1], vs, axis=0), hs, axis=1)[:h, :w] - 128.0
    rcr = np.repeat(np.repeat(recon[2], vs, axis=0), hs, axis=1)[:h, :w] - 128.0
    exp = np.stack(
        [ry + 1.402 * rcr,
         ry - 0.344136 * rcb - 0.714136 * rcr,
         ry + 1.772 * rcb], axis=2,
    )
    return bytes(out), np.clip(np.round(exp), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("dims,sampling", [((24, 24), (2, 2)), ((16, 16), (1, 1))])
def test_progressive_color_jpeg(dims, sampling):
    h, w = dims
    rng = np.random.default_rng(31)
    rgb = rng.integers(60, 196, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
    data, expected = _encode_progressive_color_jpeg(rgb, sampling)
    out = decode_jpeg(data)
    assert out is not None, "color progressive decode returned None"
    np.testing.assert_array_equal(out, expected)


# ---------------------------------------------------------------- GIF

from ftm_datalake_spark.operators.multimodal import decode_gif  # noqa: E402


class _GifLzwWriter:
    """LSB-first bit packer for GIF LZW codes."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Textbook GIF LZW encoder (dictionary of index strings)."""
    clear = 1 << min_code_size
    end = clear + 1
    writer = _GifLzwWriter()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    writer.write(clear, width)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        writer.write(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            # widen AFTER assigning: decoder widens when table hits 2^width
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        cur = bytes([byte])
    if cur:
        writer.write(table[cur], width)
    writer.write(end, width)
    return writer.flush()


def _make_gif(
    idx: np.ndarray, palette: np.ndarray, interlaced: bool = False,
    local_palette: bool = False, version: bytes = b"GIF89a",
) -> bytes:
    import struct

    h, w = idx.shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    n_padded = 1 << depth
    pal = np.zeros((n_padded, 3), np.uint8)
    pal[:n] = palette
    rows = idx
    if interlaced:
        order = []
        for start, step in [(0, 8), (4, 8), (2, 4), (1, 2)]:
            order.extend(range(start, h, step))
        rows = idx[order]
    min_code = max(2, depth)
    lzw = _gif_lzw_encode(rows.astype(np.uint8).tobytes(), min_code)
    out = bytearray()
    out += version
    gflags = (0x80 | (depth - 1)) if not local_palette else 0x00
    out += struct.pack("<HHBBB", w, h, gflags, 0, 0)
    if not local_palette:
        out += pal.tobytes()
    # a comment extension to exercise the skip path
    out += b"\x21\xfe\x05hello\x00"
    iflags = (0x40 if interlaced else 0) | ((0x80 | (depth - 1)) if local_palette else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if local_palette:
        out += pal.tobytes()
    out += bytes([min_code])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


_PAL = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 7, 7], [200, 150, 100]], np.uint8
)


@pytest.mark.parametrize("interlaced", [False, True])
@pytest.mark.parametrize("local_palette", [False, True])
def test_gif_decode(interlaced, local_palette):
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 5, size=(13, 9), dtype=np.int64).astype(np.uint8)
    data = _make_gif(idx, _PAL, interlaced=interlaced, local_palette=local_palette)
    out = decode_gif(data)
    assert out is not None
    np.testing.assert_array_equal(out, _PAL[idx])


def test_gif_large_image_code_widening():
    # enough distinct runs to push the LZW table past several width bumps
    y, x = np.mgrid[0:64, 0:64]
    idx = ((x * 3 + y * 7 + (x * y) % 5) % 5).astype(np.uint8)
    data = _make_gif(idx, _PAL)
    out = decode_gif(data)
    np.testing.assert_array_equal(out, _PAL[idx])


def test_gif_dispatch_and_rejects():
    idx = np.zeros((4, 4), np.uint8)
    data = _make_gif(idx, _PAL, version=b"GIF87a")
    codec, decoded = decode_image(data)
    assert codec == "gif"
    np.testing.assert_array_equal(decoded, _PAL[idx])
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(b"NOTGIF" + data[6:]) is None
    assert decode_gif(data[: len(data) // 2]) is None
    assert decode_gif(None) is None


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_gif_never_crashes_on_fuzz(data):
    decode_gif(b"GIF89a" + data)


def test_progressive_jpeg_multiblock_eob_runs():
    """Real progressive encoders use custom AC tables with EOBn symbols
    (0x10..0xE0) to span EOB runs across many blocks; the standard-table
    tests above never emit r>0. This builds a custom table and a stream
    where one EOB code covers a run of blocks, exercising the decoder's
    `eobrun = (1<<r) + read_bits(r)` path in both first and refinement
    scans."""
    import struct

    h = w = 32  # 16 blocks
    # Coefficients are authored directly (small sizes fit the tiny custom
    # table): block (0,0) carries AC energy, the other 15 are DC-only so
    # one EOB16 code covers (0,0)'s band tail plus all 15 of them.
    qz = np.ones(64, np.int64)
    bh, bw = h // 8, w // 8
    coefs = np.zeros((bh, bw, 64), np.int64)
    for i, (by, bx) in enumerate((y, x) for y in range(bh) for x in range(bw)):
        coefs[by, bx][0] = -224 + i * 16  # varied DC diffs
    coefs[0, 0][[1, 3, 20, 37]] = [3, -2, 1, -1]  # sizes ≤ 2, runs ≤ 16
    expected = np.zeros((h, w))
    for by in range(bh):
        for bx in range(bw):
            deq = np.zeros(64)
            deq[_ZIGZAG] = (coefs[by, bx] * qz).astype(np.float64)
            expected[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                _IDCT_A.T @ deq.reshape(8, 8) @ _IDCT_A + 128.0
            )
    expected = np.clip(np.round(expected), 0, 255).astype(np.uint8)

    # custom AC table: include EOBn symbols alongside size-1/2 run codes
    ac_symbols = bytes([0x00, 0x10, 0x20, 0x30, 0x40, 0x01, 0x11, 0x21,
                        0x02, 0x12, 0xF0, 0x03, 0x04, 0x05])
    ac_bits = [0, 0, 2, 4, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    assert sum(ac_bits) == len(ac_symbols)
    ac_codes = _enc_codes(ac_bits, ac_symbols)
    dc_codes = _enc_codes(*_DC_LUMA)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qz))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + _DC_LUMA[1])
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_symbols)

    # scan 1: DC first Al=0 (single DC stage)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    wtr = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            v = int(coefs[by, bx][0])
            diff, pred = v - pred, v
            t = _category(diff)
            wtr.write(*dc_codes[t])
            if t:
                wtr.write(t, _magnitude_bits(diff, t))
    out += wtr.flush()

    # scan 2: AC first Al=0, band 1-63 — block (0,0) has coeffs, then an
    # EOB15 run (code 0x30 + 3 extra bits = 8+7) covers the other 15 blocks
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    wtr = _BitWriter()
    zz0 = coefs[0, 0]
    nz = [(k, int(zz0[k])) for k in range(1, 64) if zz0[k]]
    assert nz, "test image must put AC energy in block (0,0)"
    prev = 0
    for k, v in nz:
        run = k - prev - 1
        while run > 15:
            wtr.write(*ac_codes[0xF0])
            run -= 16
        s = _category(v)
        wtr.write(*ac_codes[(run << 4) | s])
        wtr.write(s, _magnitude_bits(v, s))
        prev = k
    # EOB run covering: rest of block (0,0) + the 15 DC-only blocks? No —
    # an EOB run STARTS at the current block; (0,0) ends via its own EOB
    # inside the run. Spec: the run includes the current block. 16 blocks
    # remain unfinished? (0,0) finished its nz list but band tail remains:
    # EOBRUN of 16 = 0x40 (r=4, 1<<4=16) + 4 extra bits (0) → covers
    # (0,0)'s tail AND the 15 empty blocks.
    wtr.write(*ac_codes[0x40])
    wtr.write(4, 0)
    out += wtr.flush()
    out += b"\xff\xd9"

    decoded = decode_jpeg(bytes(out))
    assert decoded is not None
    np.testing.assert_array_equal(decoded[:, :, 0], expected)


# ------------------------------------------------------------------ TIFF
from ftm_datalake_spark.operators.multimodal import (  # noqa: E402
    _packbits_decode,
    decode_tiff,
    encode_tiff,
)


def _tiff_px(h, w, ch=3):
    rng = np.random.default_rng(h * 100 + w)
    return rng.integers(0, 256, (h, w, ch) if ch else (h, w)).astype(np.uint8)


@pytest.mark.parametrize("dims", [(1, 1), (5, 3), (16, 16), (7, 31)])
def test_tiff_rgb_roundtrip(dims):
    h, w = dims
    px = _tiff_px(h, w)
    got = decode_tiff(encode_tiff(px))
    assert got is not None and np.array_equal(got, px)


def test_tiff_gray_replicates_channels():
    g = _tiff_px(6, 4, ch=0)
    got = decode_tiff(encode_tiff(g))
    assert got.shape == (6, 4, 3)
    assert np.array_equal(got[:, :, 0], g)
    assert np.array_equal(got[:, :, 1], g)


def test_tiff_big_endian_and_white_is_zero():
    # Hand-build a 2x2 big-endian gray TIFF with photometric 0.
    import struct as S

    strip = bytes([0, 100, 200, 255])
    ifd_off = 8 + len(strip)
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 2),
        (279, 4, 1, 4),
    ]
    buf = S.pack(">2sHI", b"MM", 42, ifd_off) + strip + S.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            buf += S.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            buf += S.pack(">HHII", tag, typ, cnt, val)
    buf += S.pack(">I", 0)
    got = decode_tiff(buf)
    assert got is not None
    assert got[:, :, 0].tolist() == [[255, 155], [55, 0]]  # inverted


def test_tiff_packbits_strip():
    import struct as S

    # 4x4 gray, PackBits: row of 4 repeated bytes → (-3, v)
    rows = bytes()
    for v in (10, 20, 30, 40):
        rows += bytes([256 - 3, v])  # repeat v 4 times
    assert _packbits_decode(rows, 16) == bytes(
        [10] * 4 + [20] * 4 + [30] * 4 + [40] * 4
    )
    ifd_off = 8 + len(rows)
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 4), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 4),
        (279, 4, 1, len(rows)),
    ]
    buf = S.pack("<2sHI", b"II", 42, ifd_off) + rows + S.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        buf += S.pack("<HHII", tag, typ, cnt, val)
    buf += S.pack("<I", 0)
    got = decode_tiff(buf)
    assert got is not None
    assert got[:, :, 0].tolist() == [[10] * 4, [20] * 4, [30] * 4, [40] * 4]


def test_tiff_multi_strip():
    px = _tiff_px(8, 5)
    raw = px.tobytes()
    import struct as S

    half = 4 * 5 * 3
    s1_off = 8
    s2_off = 8 + half
    ifd_off = 8 + len(raw)
    extra_off = ifd_off + 2 + 9 * 12 + 4 + 8  # after IFD + two offset arrays
    # offsets/counts arrays (2 entries each) live right after next-IFD ptr
    arrays = S.pack("<II", s1_off, s2_off) + S.pack("<II", half, half)
    bps_off = ifd_off + 2 + 9 * 12 + 4 + len(arrays)
    entries = [
        (256, 3, 1, 5), (257, 3, 1, 8), (258, 3, 3, bps_off), (259, 3, 1, 1),
        (262, 3, 1, 2), (273, 4, 2, ifd_off + 2 + 9 * 12 + 4),
        (277, 3, 1, 3), (278, 3, 1, 4),
        (279, 4, 2, ifd_off + 2 + 9 * 12 + 4 + 8),
    ]
    buf = S.pack("<2sHI", b"II", 42, ifd_off) + raw + S.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        buf += S.pack("<HHII", tag, typ, cnt, val)
    buf += S.pack("<I", 0) + arrays + S.pack("<HHH", 8, 8, 8)
    del extra_off
    got = decode_tiff(buf)
    assert got is not None and np.array_equal(got, px)


def test_tiff_rejects_garbage_and_truncation():
    px = _tiff_px(6, 6)
    good = encode_tiff(px)
    assert decode_tiff(b"II*\x00" + b"\x01" * 3) is None
    assert decode_tiff(good[: len(good) // 2]) is None
    assert decode_tiff(b"not a tiff") is None
    assert decode_tiff(b"") is None


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_tiff_never_crashes_on_fuzz(data):
    decode_tiff(data)
    decode_tiff(b"II*\x00" + data)
    decode_tiff(b"MM\x00*" + data)
