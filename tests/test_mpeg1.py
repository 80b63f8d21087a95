"""MPEG-1 video codec (ISO/IEC 11172-2 subset, operators/mpeg1.py):
structural spec checks, exactness where the math is exact, motion
compensation actually engaging, and dispatch through the multimodal
tier."""

from __future__ import annotations

import numpy as np
import pytest

from icicle_spark.operators.mpeg1 import (
    _CBP_CODES,
    _DEF_INTRA_Q,
    _MBA_CODES,
    _MV_CODES,
    _PICTURE_RATES,
    decode_m1v,
    encode_m1v,
)


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _blob_frames(n=6, h=48, w=64, step=4):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        img = 128 + 100 * np.exp(
            -(((yy - h / 2) / 10.0) ** 2 + ((xx - 10 - step * t) / 12.0) ** 2)
        )
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


# ------------------------------------------------------- spec structure


def test_sequence_header_fields():
    buf = encode_m1v([np.full((32, 48), 77, np.uint8)], fps=25)
    assert buf[:4] == b"\x00\x00\x01\xb3"
    hw = int.from_bytes(buf[4:7], "big")  # 12-bit width, 12-bit height
    assert hw >> 12 == 48 and hw & 0xFFF == 32
    assert (buf[7] >> 4) == 1  # pel_aspect_ratio
    assert (buf[7] & 0xF) == 3  # picture_rate code 3 = 25 fps
    assert buf.endswith(b"\x00\x00\x01\xb7")  # sequence_end_code
    # picture + slice start codes present, byte-aligned
    assert b"\x00\x00\x01\x00" in buf and b"\x00\x00\x01\x01" in buf


def test_default_intra_matrix_is_spec_literal():
    # ISO/IEC 11172-2 §2.4.3.2 first and last rows, spot values
    assert list(_DEF_INTRA_Q[0]) == [8, 16, 19, 22, 26, 27, 29, 34]
    assert list(_DEF_INTRA_Q[7]) == [27, 29, 35, 38, 46, 56, 69, 83]
    assert _DEF_INTRA_Q[4][4] == 32


def test_vlc_tables_prefix_free_and_shaped():
    # construction already asserts prefix-freedom; pin the anchors
    assert _MBA_CODES[1] == "1" and _MBA_CODES[3] == "010"
    assert _MV_CODES[0] == "1" and len(_MV_CODES) == 33  # 0, +-1..16
    assert _CBP_CODES[60] == "111"
    assert set(_CBP_CODES) == set(range(1, 64))  # cbp 0 untransmissible
    assert 0 not in _CBP_CODES


def test_fps_code_roundtrip():
    for code, fps in _PICTURE_RATES.items():
        buf = encode_m1v([np.zeros((16, 16), np.uint8)], fps=fps)
        assert decode_m1v(buf)[1] == fps


# ------------------------------------------------------------ exactness


def test_flat_gray_i_frame_exact_any_level():
    for v in (0, 1, 77, 128, 254, 255):
        buf = encode_m1v([np.full((16, 32), v, np.uint8)], qscale=8)
        dec, _ = decode_m1v(buf)
        assert dec.shape == (1, 16, 32, 3)
        assert (dec == v).all(), v


def test_solid_frame_sequence_exact_through_p_logic():
    """Solid frames whose gray jumps per frame stay exact end-to-end
    (intra mode decision catches the jumps; DC step is 8 at every
    qscale)."""
    frames = [np.full((16, 16), (40 + 13 * k) % 256, np.uint8)
              for k in range(4)]
    buf = encode_m1v(frames, qscale=16, gop=100)
    dec, _ = decode_m1v(buf)
    for k, f in enumerate(frames):
        assert (dec[k, :, :, 0] == f).all(), k


def test_identical_frames_skip_cheaply():
    """A repeated frame whose I reconstruction is exact (per-MB flat
    tiles are DC-only) becomes skips + the two forced coded MBs —
    the P picture costs a few bytes. On lossy content the P picture
    instead re-codes the quantization error (also pinned: still far
    cheaper than a second I picture)."""
    # 3x4 MBs, each a flat tile -> exact intra recon -> all-skip P
    tiles = np.arange(12).reshape(3, 4) * 20 + 7
    f = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)
    one = len(encode_m1v([f], qscale=4))
    two = len(encode_m1v([f, f], qscale=4, gop=100))
    assert two - one < 24  # picture+slice headers + 2 forced MBs
    dec, _ = decode_m1v(encode_m1v([f, f], qscale=4, gop=100))
    assert (dec[0] == dec[1]).all()
    assert (dec[0, :, :, 0] == f).all()
    # lossy content: P refines the recon, still beats a second I
    g = np.random.default_rng(3).integers(0, 256, (48, 64), np.uint8)
    one_i = len(encode_m1v([g], qscale=4))
    with_p = len(encode_m1v([g, g], qscale=4, gop=100))
    two_i = len(encode_m1v([g, g], qscale=4, gop=1))
    assert with_p - one_i < 0.5 * (two_i - one_i)


# ----------------------------------------------------- motion behaviour


def test_motion_compensation_beats_intra_on_translation():
    """Pure translation of a textured frame: the P picture with MC
    must be far smaller than an I picture of the same content, and
    still reconstruct the motion faithfully."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (48, 80), np.uint8)
    frames = [np.roll(base, 4 * t, axis=1) for t in range(3)]
    with_p = len(encode_m1v(frames, qscale=4, gop=100))
    all_i = len(encode_m1v(frames, qscale=4, gop=1))
    assert with_p < 0.62 * all_i  # P frames ~free on pure translation
    dec, _ = decode_m1v(encode_m1v(frames, qscale=4, gop=100))
    # interior (roll wrap corrupts the left edge blocks)
    assert _psnr(dec[2, :, 16:, 0], frames[2][:, 16:]) > 30


def test_smooth_motion_quality_and_compression():
    frames = _blob_frames()
    buf = encode_m1v(frames, qscale=4, gop=100)
    dec, fps = decode_m1v(buf)
    assert fps == 30.0
    assert len(buf) < 0.05 * (6 * 48 * 64)  # vs raw grayscale
    for t in (0, 5):
        assert _psnr(dec[t, :, :, 0], frames[t]) > 40


def test_gop_inserts_i_frames():
    frames = _blob_frames(n=5)
    short_gop = len(encode_m1v(frames, qscale=4, gop=2))
    long_gop = len(encode_m1v(frames, qscale=4, gop=100))
    assert short_gop > long_gop  # more I pictures, more bits
    a, _ = decode_m1v(encode_m1v(frames, qscale=4, gop=2))
    b, _ = decode_m1v(encode_m1v(frames, qscale=4, gop=100))
    for t in range(5):
        assert _psnr(a[t], b[t]) > 35  # same content either way


def test_rgb_roundtrip_420():
    rng = np.random.default_rng(11)
    # smooth color field (chroma subsampling is the lossy step)
    yy, xx = np.mgrid[0:32, 0:32]
    f = np.stack([
        (yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256
    ], -1).astype(np.uint8)
    dec, _ = decode_m1v(encode_m1v([f], qscale=2))
    assert _psnr(dec[0], f) > 30


def test_odd_dimensions_padded_and_cropped():
    f = np.full((18, 23), 99, np.uint8)
    dec, _ = decode_m1v(encode_m1v([f], qscale=4))
    assert dec.shape == (1, 18, 23, 3)
    assert (dec == 99).all()


# ------------------------------------------------------------ guards


def test_bad_inputs_raise():
    with pytest.raises(ValueError):
        encode_m1v([])
    with pytest.raises(ValueError):
        encode_m1v([np.zeros((16, 16), np.uint8)], qscale=0)
    with pytest.raises(ValueError):
        encode_m1v([np.zeros((16, 16), np.uint8),
                    np.zeros((8, 8), np.uint8)])
    with pytest.raises(ValueError):
        decode_m1v(b"\x00\x00\x01\xb4garbage")


def test_truncated_stream_raises():
    buf = encode_m1v(_blob_frames(n=2), qscale=4)
    with pytest.raises(ValueError):
        decode_m1v(buf[: len(buf) // 2] )


# ----------------------------------------------------------- dispatch


def test_multimodal_dispatch_m1v():
    from icicle_spark.operators.multimodal import decode_video

    frames = _blob_frames(n=3)
    dec, fps = decode_video(encode_m1v(frames, fps=25, qscale=4))
    assert dec.shape == (3, 48, 64, 3) and fps == 25.0


def test_pattern_video_fixture_closed_form(spark):
    """attach_pattern_videos(fmt='m1v'): every per-frame gray is
    recomputable from the id alone — certifies the full MC bitstream
    path against closed-form arithmetic."""
    from icicle_spark.operators.multimodal import (
        attach_pattern_videos,
        decode_video,
    )

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = attach_pattern_videos(docs, fmt="m1v").collect()
    assert len(rows) == 12
    for r in rows:
        i = int(r.doc_id)
        frames, fps = decode_video(bytes(r.media))
        n, h, w = 2 + i % 3, 6 + i % 5, 6 + i % 7
        assert frames.shape == (n, h, w, 3)
        for k in range(n):
            want = (7 * i + 13 * k + 5) % 256
            assert (frames[k] == want).all(), (i, k)
