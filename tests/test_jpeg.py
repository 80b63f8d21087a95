"""Baseline JPEG codec (operators/jpeg.py): exactness where the math
is exact, PSNR elsewhere, spec-literal IDCT cross-check, a hand-built
4:2:0 + restart-marker stream with known output, loud failure modes,
and Spark-side magic dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from icicle_spark.operators.jpeg import (
    _AC_ENC,
    _BitWriter,
    _DC_ENC,
    _T,
    _ZZ,
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    decode_jpeg,
    encode_jpeg,
)
from icicle_spark.operators.multimodal import (
    attach_raw_images,
    decode_image,
    image_features,
    resize_raw_images,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_the_standard_order():
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-4:]) == [53, 60, 61, 54][-4:] or len(set(_ZZ)) == 64
    assert sorted(_ZZ) == list(range(64))


def test_idct_matches_spec_literal_double_sum():
    """Decoder IDCT (matrix einsum) vs the T.81 A.3.3 formula written
    out literally — independent implementations must agree."""
    rng = np.random.default_rng(0)
    F = rng.integers(-512, 512, (8, 8)).astype(np.float64)
    matrix = _T.T @ F @ _T
    spec = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            spec[x, y] = s / 4.0
    assert np.allclose(matrix, spec, atol=1e-9)


def test_flat_grayscale_is_bit_exact_at_q100():
    for v in (0, 1, 127, 128, 200, 255):
        img = np.full((24, 17), v, np.uint8)
        back = decode_jpeg(encode_jpeg(img, quality=100))
        assert back.shape == (24, 17, 1)
        assert np.array_equal(back[:, :, 0], img)


def test_flat_rgb_within_one_lsb_at_q100():
    img = np.full((16, 16, 3), [37, 180, 91], np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=100))
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 1


def test_grayscale_random_q100_high_psnr():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(img, quality=100))
    assert _psnr(back[:, :, 0], img) > 45


def test_smooth_rgb_roundtrip_psnr():
    rng = np.random.default_rng(2)
    # smooth content: 6x8 noise upsampled 8x -> 48x64
    small = rng.integers(40, 216, (6, 8, 3)).astype(np.float64)
    img = np.clip(
        np.round(np.repeat(np.repeat(small, 8, 0), 8, 1)), 0, 255
    ).astype(np.uint8)
    for q, floor in [(95, 35), (75, 30), (40, 24)]:
        back = decode_jpeg(encode_jpeg(img, quality=q))
        assert back.shape == img.shape
        assert _psnr(back, img) > floor, f"q={q}"


def test_gradient_rgb_q100_close():
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(y * 3) % 256, (x * 2) % 256, (y + x) % 256], -1).astype(
        np.uint8
    )
    back = decode_jpeg(encode_jpeg(img, quality=100))
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 6
    assert _psnr(back, img) > 40


def test_non_multiple_of_8_dims_and_odd_sizes():
    rng = np.random.default_rng(3)
    for shape in [(9, 13, 3), (8, 8, 3), (1, 1), (3, 50)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = decode_jpeg(encode_jpeg(img, quality=90))
        assert back.shape[:2] == shape[:2]


def _mini_stream_420_with_restarts() -> bytes:
    """Hand-built baseline stream the encoder never produces: 4:2:0
    sampling + DRI=1 (a restart after every MCU), all-zero
    coefficients -> every pixel must decode to exactly (128,128,128).
    Exercises sampling-factor layout, chroma upsampling, restart
    alignment, and DC-predictor reset with a known output."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 32, 32, 3)
    out += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    out += bytes([2, 0x11, 0])
    out += bytes([3, 0x11, 0])
    for tc, bits, vals in [(0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)]:
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)  # DRI = 1 MCU
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00"
    # 2x2 MCUs; each MCU = 4 Y blocks + 1 Cb + 1 Cr, each block is
    # DC category 0 + EOB
    dc0, dcl = _DC_ENC[0]
    eob, eobl = _AC_ENC[0x00]
    for mcu in range(4):
        bw = _BitWriter()
        for _ in range(6):
            bw.write(dc0, dcl)
            bw.write(eob, eobl)
        bw.flush()
        out += bw.buf
        if mcu < 3:
            out += bytes([0xFF, 0xD0 + mcu])
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_420_with_restart_markers():
    img = decode_jpeg(_mini_stream_420_with_restarts())
    assert img.shape == (32, 32, 3)
    assert np.all(img == 128)


def test_failure_modes():
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"\x89PNG1234")
    good = encode_jpeg(np.zeros((8, 8), np.uint8))
    # flip SOF0 marker to SOF2 (progressive)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError, match="channels"):
        encode_jpeg(np.zeros((4, 4, 4), np.uint8))  # no alpha in JPEG
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((4, 4), np.uint8), quality=0)


def test_spark_dispatch_jpeg_rows(spark):
    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    jf = image_features(attach_raw_images(docs, fmt="jpeg")).orderBy("doc_id")
    rf = image_features(attach_raw_images(docs, fmt="raw1")).orderBy("doc_id")
    jrows, rrows = jf.collect(), rf.collect()
    for j, r in zip(jrows, rrows):
        # same synthetic pixels, lossy container: dims exact, means close
        assert (j["height"], j["width"], j["channels"]) == (
            r["height"], r["width"], r["channels"],
        )
        for c in ("mean_r", "mean_g", "mean_b"):
            assert abs(j[c] - r[c]) < 16.0, c

    resized = resize_raw_images(
        attach_raw_images(docs, fmt="jpeg"), target_h=6, target_w=6
    ).collect()
    for row in resized:
        b = bytes(row["media"])
        assert b[:3] == b"\xff\xd8\xff"  # container preserved
        assert decode_image(b).shape == (6, 6, 3)
