"""PNG / WAV codec tier (multimodal): real stdlib-zlib PNG baseline
profile and RIFF/WAVE PCM16 — round-trips, spec-independent filter
verification, loud failure modes, and Spark-side magic dispatch.

The Up/Average/Paeth unfilter paths are verified against an
INDEPENDENT forward-filter implementation written straight from the
PNG spec formulas (RFC 2083 §6), not against our own encoder — a
mutual encoder/decoder bug cannot hide.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from icicle_spark.operators.multimodal import (
    attach_raw_images,
    decode_audio,
    decode_image,
    decode_media_features,
    decode_png,
    decode_wav,
    encode_png,
    encode_raw_image,
    encode_wav,
    image_features,
    resize_raw_images,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _spec_forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """PNG spec (RFC 2083 §6.2-6.6) FORWARD filter, written
    independently of the module's codecs: per-row filter byte + the
    filtered scanline. Pure-python per-byte loop — slow but literal."""
    h, w, c = img.shape
    bpp = c
    raw = img.reshape(h, w * c).astype(int)
    out = bytearray()
    prev = [0] * (w * c)
    for y in range(h):
        out.append(ftype)
        cur = list(raw[y])
        for x in range(w * c):
            a = cur[x - bpp] if x >= bpp else 0  # left (reconstructed=orig)
            b = prev[x]  # up
            cc = prev[x - bpp] if x >= bpp else 0  # upper-left
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out.append((cur[x] - pred) & 0xFF)
        prev = cur
    return bytes(out)


def _build_png(img: np.ndarray, filtered: bytes) -> bytes:
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1])
def test_png_roundtrip_all_color_types(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    img = rng.integers(0, 256, (9, 5, channels), dtype=np.uint8)
    back = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(back, img)


def test_png_grayscale_2d_input():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray)), gray[:, :, None])


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_unfilter_vs_spec_forward_filter(ftype, channels):
    """Decoder unfiltering verified against an independent spec-literal
    forward filter — covers Up/Average/Paeth, which our encoder never
    emits."""
    rng = np.random.default_rng(100 * ftype + channels)
    img = rng.integers(0, 256, (7, 4, channels), dtype=np.uint8)
    png = _build_png(img, _spec_forward_filter(img, ftype))
    assert np.array_equal(decode_png(png), img)


def test_png_mixed_filters_per_row():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    # row i gets filter i: exercises every filter with real row deps
    rows = [
        _spec_forward_filter(img[: y + 1], y)[-(3 * 3 + 1) :]
        for y in range(5)
    ]
    png = _build_png(img, b"".join(rows))
    assert np.array_equal(decode_png(png), img)


def test_png_failure_modes():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"JFIF" + good[4:])
    # flip one IDAT payload byte -> CRC mismatch
    idat_at = good.index(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    # chop IEND (12 bytes) plus into the IDAT body itself
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-20])
    # 16-bit depth / palette / interlace headers raise loudly
    for depth, ctype, inter, msg in [
        (16, 2, 0, "bit depth"),
        (8, 3, 0, "palette"),
        (8, 2, 1, "interlaced"),
    ]:
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, inter)
        png = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match=msg):
            decode_png(png)
    # wrong decompressed size
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="expected"):
        decode_png(png)


def test_wav_roundtrip_mono_stereo():
    s = (np.sin(np.linspace(0, 40, 800)) * 12000).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and back.shape == (800, 1)
    assert np.array_equal(back[:, 0], s)
    st = np.stack([s, -s], axis=1)
    back2, rate2 = decode_wav(encode_wav(st, 44100))
    assert rate2 == 44100 and np.array_equal(back2, st)


def test_wav_odd_chunk_word_alignment():
    """RIFF chunks are word-aligned: an odd-length chunk before `data`
    must not derail the walk."""
    s = np.arange(10, dtype=np.int16)
    wav = encode_wav(s, 16000)
    head, rest = wav[:12], wav[12:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    back, rate = decode_wav(head + odd + rest)
    assert rate == 16000 and np.array_equal(back[:, 0], s)


def test_wav_failure_modes():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS junk bytes here")
    s = np.arange(4, dtype=np.int16)
    wav = bytearray(encode_wav(s))
    fmt_at = wav.index(b"fmt ") + 8
    wav[fmt_at] = 3  # IEEE-float format tag
    with pytest.raises(ValueError, match="PCM16 or IMA ADPCM only"):
        decode_wav(bytes(wav))


def test_magic_dispatch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_raw_image(img)), img)
    with pytest.raises(ValueError, match="unknown image"):
        decode_image(b"GIF89a....")
    s = np.array([100, -100, 200, -200], dtype=np.int16)
    st = np.stack([s, s + 10], axis=1)
    mono, rate = decode_audio(encode_wav(st, 8000))
    assert rate == 8000
    # stereo averaged to mono with int floor-div semantics
    assert np.array_equal(
        mono, ((s.astype(np.int32) + (s + 10)) // 2).astype(np.int16)
    )
    # OggS is a HANDLED magic now (Ogg FLAC) — garbage after the
    # sync fails loudly in the container layer, not as "unknown"
    with pytest.raises(ValueError, match="ogg"):
        decode_audio(b"OggS....")
    with pytest.raises(ValueError, match="unknown audio"):
        decode_audio(b"Mystery bytes")


def test_png_rows_flow_through_spark_operators(spark):
    docs = spark.range(8).withColumnRenamed("id", "doc_id")
    png_feats = image_features(attach_raw_images(docs, fmt="png")).orderBy(
        "doc_id"
    )
    raw_feats = image_features(attach_raw_images(docs, fmt="raw1")).orderBy(
        "doc_id"
    )
    # same rng seeding per id -> identical pixels -> identical features
    assert png_feats.collect() == raw_feats.collect()

    resized = resize_raw_images(
        attach_raw_images(docs, fmt="png"), target_h=5, target_w=5
    ).collect()
    for row in resized:
        img = decode_png(bytes(row["media"]))  # container preserved
        assert img.shape == (5, 5, 3)


def test_decode_media_features_real_vs_fake(spark):
    """Tier-1/2 payloads produce stats over the DECODED content; an
    unknown payload falls back to byte stats — and row alignment
    survives a mixed batch."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    png = encode_png(img)
    fake = b"JFIFnot-a-real-codec-payload"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(fake))], "doc_id long, media binary"
    )
    rows = {r["doc_id"]: r for r in decode_media_features(df).collect()}
    flat = img.reshape(-1)
    assert rows[1]["n_bytes"] == flat.size
    assert rows[1]["first_byte"] == int(flat[0])
    assert rows[1]["last_byte"] == int(flat[-1])
    assert rows[1]["mean_byte"] == pytest.approx(float(flat.mean()))
    fb = np.frombuffer(fake, np.uint8)
    assert rows[2]["n_bytes"] == fb.size
    assert rows[2]["mean_byte"] == pytest.approx(float(fb.mean()))
