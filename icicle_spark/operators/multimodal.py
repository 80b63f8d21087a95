"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Three codec tiers:

1. **RAW formats — fully real, pure numpy** (no external codec needed):
   ``RAW1`` images (magic + uint16 height/width + uint8 channels +
   row-major uint8 payload) and ``PCM1`` audio (magic + uint32 sample
   rate + int16 mono samples). ``decode_raw_image`` /
   ``decode_pcm_audio`` validate and decode for real;
   ``image_features`` / ``audio_features`` / ``resize_raw_images``
   compute real statistics and a real nearest-neighbor resize inside
   ``mapInPandas``.

2. **Standards-compliant compressed formats — fully real, stdlib
   + numpy**: ``encode_png``/``decode_png`` implement the PNG
   baseline still-image profile (8-bit gray/RGB/±alpha,
   non-interlaced, all five row filters, CRC-checked chunks),
   ``encode_wav``/``decode_wav`` the RIFF/WAVE container (PCM16 and
   4-bit IMA ADPCM, format tag 0x11 — ``encode_wav_adpcm``),
   ``operators/jpeg.py`` the baseline JPEG (ITU-T T.81) sequential
   DCT process, ``operators/gif.py`` animated GIF89a (variable-width
   LZW, interlace, disposal composition), ``operators/avi.py``
   the MJPEG AVI container over the same JPEG codec plus MS-RLE8
   inter-frame AVI (keyframe + temporal-delta frames over a
   persistent canvas), ``operators/flac.py`` a FLAC (RFC 9639
   subset) lossless audio codec, ``operators/mpeg1.py`` an MPEG-1
   video (ISO/IEC 11172-2 subset) codec with TRUE MOTION
   COMPENSATION (I/P pictures, full-pel motion search, DCT residual
   coding), and ``operators/ogg.py`` the Ogg container (RFC 3533:
   pages, lacing, CRC-32) carrying FLAC frames per the published
   Ogg FLAC 1.0 mapping. The feature/resize/frame-sample operators
   dispatch on the payload magic, so RAW1/PCM1 and PNG/JPEG/WAV/
   FLAC/OggFLAC/GIF/AVI/MPEG-1 rows flow through the SAME extractors.

3. **Codec-library formats — stubbed** (this environment ships no
   Vorbis codec; an ``OggS`` payload whose first packet is not the
   Ogg FLAC mapping raises the documented stub):
   ``decode_media_features``
   tries tiers 1-2, then the real library, and otherwise falls back
   to a clearly-marked DETERMINISTIC FAKE over the raw bytes.
   Production swaps ``_try_real_decode`` for PIL/libsndfile — every
   Spark-side shape (schema, Arrow batching, partitioning) is
   identical.

Layout convention (one row per asset):

    media     binary          -- the encoded payload
    mime      string          -- 'image/raw1', 'audio/pcm1',
                              --  'image/png', 'audio/wav', ...
    width/height/duration_ms  -- typed metadata (nullable)
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FRAME_BYTES = 256  # fake codec: one "frame" per 256-byte chunk


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a binary media column from text
    bytes (fixture helper — stands in for reading real blobs)."""
    return docs.withColumn("media", F.encode(F.col(text_col), "utf-8")).withColumn(
        "mime", F.lit("image/fake")
    )


# ------------------------------------------------------------------ RAW tier

_RAW1 = b"RAW1"  # | magic 4B | H uint16 LE | W uint16 LE | C uint8 | pixels |
_PCM1 = b"PCM1"  # | magic 4B | sample_rate uint32 LE | int16 LE samples |


def encode_raw_image(arr: np.ndarray) -> bytes:
    """Encode an (H, W, C) or (H, W) uint8 array as RAW1 bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError("image must be (H, W[, C])")
    h, w, c = a.shape
    if h > 0xFFFF or w > 0xFFFF or c > 0xFF:
        raise ValueError("image too large for RAW1")
    head = _RAW1 + np.array([h, w], "<u2").tobytes() + bytes([c])
    return head + a.tobytes()


def decode_raw_image(buf: bytes) -> np.ndarray:
    """Real decode of a RAW1 payload -> (H, W, C) uint8 array."""
    if len(buf) < 9 or buf[:4] != _RAW1:
        raise ValueError("not a RAW1 image")
    h, w = np.frombuffer(buf[4:8], "<u2")
    c = buf[8]
    body = np.frombuffer(buf, np.uint8, offset=9)
    if body.size != int(h) * int(w) * int(c):
        raise ValueError(
            f"RAW1 payload is {body.size} bytes, header says {h}x{w}x{c}"
        )
    return body.reshape(int(h), int(w), int(c))


def encode_pcm_audio(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode mono int16 samples as PCM1 bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    return _PCM1 + np.array([sample_rate], "<u4").tobytes() + s.tobytes()


def decode_pcm_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Real decode of a PCM1 payload -> (int16 samples, sample_rate)."""
    if len(buf) < 8 or buf[:4] != _PCM1:
        raise ValueError("not a PCM1 clip")
    rate = int(np.frombuffer(buf[4:8], "<u4")[0])
    return np.frombuffer(buf, "<i2", offset=8), rate


# --------------------------------------------- PNG / WAV tier (real)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filter_type: int = 1) -> bytes:
    """Encode an (H, W[, C]) uint8 array as a real PNG (8-bit depth,
    non-interlaced) using stdlib zlib — readable by any compliant
    viewer. ``filter_type`` 0 (None) or 1 (Sub) is applied to every
    row; Sub compresses smooth content better."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported image shape {arr.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    if filter_type == 0:
        filtered = np.concatenate(
            [np.zeros((h, 1), np.uint8), a.reshape(h, w * c)], axis=1
        )
    elif filter_type == 1:  # Sub: delta vs the pixel to the left, mod 256
        delta = a.copy()
        delta[:, 1:, :] = a[:, 1:, :] - a[:, :-1, :]
        filtered = np.concatenate(
            [np.full((h, 1), 1, np.uint8), delta.reshape(h, w * c)], axis=1
        )
    else:
        raise ValueError("encoder supports filter types 0 (None) and 1 (Sub)")
    idat = zlib.compress(filtered.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """Real PNG decode -> (H, W, C) uint8 array, stdlib zlib + numpy.

    Baseline still-image profile: 8-bit depth, color types 0/2/4/6
    (gray, RGB, gray+alpha, RGBA), non-interlaced, all five row
    filters (None/Sub/Up/Average/Paeth), per-chunk CRC verification.
    Palette (type 3), sub-8/16-bit depths and Adam7 interlace raise
    loudly — parity with the module's parse-don't-guess contract."""
    if len(buf) < 8 or buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG color type {color_type} (palette not supported)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("non-standard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG not supported")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"invalid PNG filter type {int(ftypes.max())}")
    # Unfilter. Each row depends on the previous RECONSTRUCTED row, so
    # the outer loop is rows; Sub/Average/Paeth additionally carry a
    # left-to-right dependency, walked bpp columns at a time with
    # vectorized numpy arithmetic (no per-byte Python loop).
    bpp = c
    prev = np.zeros(stride, np.int64)
    out = np.empty((h, stride), np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        cur = data[y].astype(np.int64)
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth
            rec = np.empty(stride, np.int64)
            for x0 in range(0, stride, bpp):
                sl = slice(x0, x0 + bpp)
                left = rec[x0 - bpp : x0] if x0 else np.zeros(bpp, np.int64)
                if ft == 1:  # Sub
                    rec[sl] = (cur[sl] + left) & 0xFF
                elif ft == 3:  # Average
                    rec[sl] = (cur[sl] + (left + prev[sl]) // 2) & 0xFF
                else:  # Paeth
                    up = prev[sl]
                    ul = (
                        prev[x0 - bpp : x0] if x0 else np.zeros(bpp, np.int64)
                    )
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, ul),
                    )
                    rec[sl] = (cur[sl] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, c)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 PCM mono/stereo samples as a standard WAV file."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n_ch = s.shape[1]
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE decode -> ((N, channels) int16 array, rate).
    PCM16 (format tag 1) and mono IMA ADPCM (format tag 0x11);
    anything else raises loudly."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data, fact = 12, None, None, None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and length >= 4:
            (fact,) = struct.unpack("<I", body[:4])
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt == 0x11:  # IMA ADPCM (compressed tier)
        if n_ch != 1 or bits != 4:
            raise ValueError(
                f"IMA ADPCM WAV: mono 4-bit only, got {n_ch}ch/{bits}-bit"
            )
        return _decode_ima_adpcm(data, block_align, fact), rate
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV format {audio_fmt}/{bits}-bit "
            "(PCM16 or IMA ADPCM only)"
        )
    samples = np.frombuffer(
        data[: len(data) - len(data) % (2 * n_ch)], "<i2"
    ).reshape(-1, n_ch)
    return samples, rate


# IMA/DVI ADPCM (WAVE format tag 0x11): 4-bit differential coding,
# public algorithm from the IMA Digital Audio Focus Group (1992).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step (shared by encoder+decoder
    so the encoder's predictor tracks the decoder exactly)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble & 7])))
    return pred, index


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 16_000, block_align: int = 256
) -> bytes:
    """Encode mono int16 samples as IMA ADPCM WAV (format tag 0x11,
    ~4:1) — the compressed-audio tier. Block layout per the public
    spec: 4-byte header (predictor int16, step index, reserved) then
    two 4-bit samples per byte, low nibble first."""
    s = np.asarray(samples, dtype=np.int16).reshape(-1)
    if s.size == 0:
        raise ValueError("cannot encode empty audio")
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    index = 0
    out = bytearray()
    for start in range(0, s.size, spb):
        block = s[start : start + spb]
        pred = int(block[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for sample in block[1:]:
            step = int(_IMA_STEPS[index])
            delta = int(sample) - pred
            n = 8 if delta < 0 else 0
            d = -delta if delta < 0 else delta
            if d >= step:
                n |= 4
                d -= step
            if d >= step >> 1:
                n |= 2
                d -= step >> 1
            if d >= step >> 2:
                n |= 1
            pred, index = _ima_step(pred, index, n)
            nibbles.append(n)
        if len(nibbles) & 1:
            nibbles.append(0)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - len(nibbles) // 2)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        (sample_rate * block_align + spb - 1) // spb, block_align, 4,
        2, spb,
    )
    fact = struct.pack("<I", s.size)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(out))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(out)) + bytes(out)
    )


def _decode_ima_adpcm(
    data: bytes, block_align: int, n_samples: int | None
) -> np.ndarray:
    """IMA ADPCM payload -> (N, 1) int16 (mono)."""
    spb = (block_align - 4) * 2 + 1
    out: list[int] = []
    for start in range(0, len(data) - len(data) % block_align, block_align):
        block = data[start : start + block_align]
        pred, index, _ = struct.unpack("<hBB", block[:4])
        index = max(0, min(88, index))
        out.append(pred)
        produced = 1
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                if produced >= spb:
                    break
                pred, index = _ima_step(pred, index, nibble)
                out.append(pred)
                produced += 1
    arr = np.array(out, dtype=np.int16)
    if n_samples is not None:
        arr = arr[:n_samples]
    return arr.reshape(-1, 1)


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-dispatching image decode: RAW1, PNG, or baseline JPEG ->
    (H, W, C) uint8. The single entry the feature/resize operators
    call, so every tier flows through identical Spark plumbing."""
    if buf[:4] == _RAW1:
        return decode_raw_image(buf)
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:3] == b"\xff\xd8\xff":
        from icicle_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(buf)
    raise ValueError(
        "unknown image payload (expected RAW1, PNG, or JPEG magic)"
    )


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-dispatching audio decode: PCM1 or RIFF/WAVE -> (mono
    int16 samples, rate). WAV stereo is averaged to mono so both
    containers produce the same downstream feature shape."""
    if buf[:4] == _PCM1:
        return decode_pcm_audio(buf)
    if buf[:4] == b"RIFF":
        s, rate = decode_wav(buf)
        mono = s[:, 0] if s.shape[1] == 1 else (
            ((s[:, 0].astype(np.int32) + s[:, 1]) // 2).astype(np.int16)
        )
        return mono, rate
    if buf[:4] == b"fLaC":
        from icicle_spark.operators.flac import decode_flac

        s, rate = decode_flac(buf)  # (N, ch) int32, 16-bit payloads
        mono = s[:, 0] if s.shape[1] == 1 else ((s[:, 0] + s[:, 1]) // 2)
        return mono.astype(np.int16), rate
    if buf[:4] == b"OggS":
        from icicle_spark.operators.ogg import decode_ogg_flac, ogg_parse

        first = ogg_parse(buf)[0][0]
        if first[:5] == b"\x7fFLAC":
            s, rate = decode_ogg_flac(buf)
            mono = (
                s[:, 0] if s.shape[1] == 1 else ((s[:, 0] + s[:, 1]) // 2)
            )
            return mono.astype(np.int16), rate
        if first[:7] == b"\x01vorbis":
            from icicle_spark.operators.vorbis import decode_vorbis

            f, rate = decode_vorbis(buf)  # float64, nominal [-1, 1]
            if f.ndim == 2:
                f = f.mean(axis=1)
            pcm = np.clip(np.round(f * 32767.0), -32768, 32767)
            return pcm.astype(np.int16), rate
        raise ValueError(
            "Ogg stream is neither Ogg FLAC nor Ogg Vorbis"
        )
    raise ValueError(
        "unknown audio payload (expected PCM1, RIFF, fLaC, or OggS magic)"
    )


def _is_avi(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI "


def _is_gif(buf: bytes) -> bool:
    return buf[:6] in (b"GIF87a", b"GIF89a")


def _is_m1v(buf: bytes) -> bool:
    return buf[:4] == b"\x00\x00\x01\xb3"  # MPEG-1 sequence header


def decode_video(buf: bytes) -> tuple[np.ndarray, float]:
    """Magic-dispatching video decode: animated GIF (lossless, LZW),
    MJPEG/MS-RLE8 AVI, or MPEG-1 video elementary stream (I/P
    pictures with MOTION COMPENSATION — ``operators/mpeg1.py``) ->
    ((N, H, W, 3) uint8 frames, fps). GIF fps derives from the first
    frame's delay (centiseconds)."""
    if _is_gif(buf):
        from icicle_spark.operators.gif import decode_gif

        frames, delays = decode_gif(buf)
        fps = 100.0 / delays[0] if delays and delays[0] else 0.0
        return frames, fps
    if _is_avi(buf):
        from icicle_spark.operators.avi import decode_avi_frames

        return decode_avi_frames(buf)
    if _is_m1v(buf):
        from icicle_spark.operators.mpeg1 import decode_m1v

        return decode_m1v(buf)
    raise ValueError(
        "unknown video payload (expected GIF, RIFF/AVI, or MPEG-1 magic)"
    )


def attach_raw_images(
    docs: DataFrame,
    id_col: str = "doc_id",
    max_side: int = 24,
    fmt: str = "raw1",
) -> DataFrame:
    """Fixture/ingest helper: deterministic synthetic image per row,
    seeded by the id (stands in for reading real blobs; the bytes are
    REAL payloads the decoder accepts). ``fmt`` picks the container:
    ``raw1`` (uncompressed), ``png`` (real zlib-compressed PNG), or
    ``jpeg`` (real baseline T.81 — lossy, so downstream features are
    near- but not bit-identical to the raw1 fixture)."""
    if fmt == "jpeg":
        from icicle_spark.operators.jpeg import encode_jpeg

        enc = encode_jpeg
    elif fmt in ("raw1", "png"):
        enc = encode_raw_image if fmt == "raw1" else encode_png
    else:
        raise ValueError(f"unknown image format {fmt!r}")
    id_type = dict(docs.dtypes)[id_col]
    mime = f"image/{fmt}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                rng = np.random.default_rng(int(rid) & 0x7FFFFFFF)
                h = int(rng.integers(4, max_side + 1))
                w = int(rng.integers(4, max_side + 1))
                media.append(
                    enc(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": mime}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def attach_pattern_images(
    docs: DataFrame, id_col: str = "doc_id", fmt: str = "png"
) -> DataFrame:
    """Fixture/ingest helper with a CLOSED-FORM pattern: pixel
    ``(y, x, c)`` of doc ``i`` is ``(7*i + 3*y + 5*x + 11*c) mod 256``
    over a ``(4 + i%5) x (4 + i%7) x 3`` canvas. An external engine
    can recompute every per-image statistic from the id alone, so a
    cross-engine oracle certifies the PNG encode -> decode -> feature
    path end-to-end with no shared code between query and oracle."""
    if fmt not in ("raw1", "png"):
        raise ValueError(f"unknown image format {fmt!r}")
    id_type = dict(docs.dtypes)[id_col]
    enc = encode_raw_image if fmt == "raw1" else encode_png
    mime = f"image/{fmt}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                i = int(rid)
                h, w = 4 + i % 5, 4 + i % 7
                img = (
                    7 * i
                    + 3 * np.arange(h)[:, None, None]
                    + 5 * np.arange(w)[None, :, None]
                    + 11 * np.arange(3)[None, None, :]
                ) % 256
                media.append(enc(img.astype(np.uint8)))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": mime}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def attach_pattern_videos(
    docs: DataFrame,
    id_col: str = "doc_id",
    fmt: str = "gif",
    fps: int = 25,
) -> DataFrame:
    """Fixture/ingest helper with a CLOSED-FORM video pattern: doc
    ``i`` gets ``2 + i%3`` solid-colour frames of size
    ``(6 + i%5) x (6 + i%7)``, frame ``k`` filled with gray
    ``(7*i + 13*k + 5) mod 256``. Solid frames are exact through BOTH
    containers (GIF is lossless; flat JPEG blocks are DC-only and
    bit-exact at quality 100), so an external engine can recompute
    every per-frame statistic from the id alone — a cross-engine
    oracle certifies encode -> LZW/T.81 -> container parse -> decode
    end-to-end with no shared code. ``fmt="m1v"`` rides the MPEG-1
    codec: solid frames are DC-only intra macroblocks (fixed step 8,
    so any gray level is exact), and the inter-frame gray jumps
    always trip the encoder's intra mode decision — per-frame values
    stay exact through the motion-compensated bitstream too."""
    if fmt not in ("gif", "avi", "m1v"):
        raise ValueError(f"unknown video format {fmt!r}")
    id_type = dict(docs.dtypes)[id_col]
    mime = {
        "gif": "video/gif", "avi": "video/x-msvideo",
        "m1v": "video/mpeg",
    }[fmt]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.avi import encode_avi_mjpeg
        from icicle_spark.operators.gif import encode_gif
        from icicle_spark.operators.mpeg1 import encode_m1v

        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                i = int(rid)
                n, h, w = 2 + i % 3, 6 + i % 5, 6 + i % 7
                frames = np.stack([
                    np.full((h, w), (7 * i + 13 * k + 5) % 256, np.uint8)
                    for k in range(n)
                ])
                if fmt == "gif":
                    media.append(
                        encode_gif(frames, delay_cs=100 // fps)
                    )
                elif fmt == "m1v":
                    media.append(encode_m1v(frames, fps=fps, qscale=4))
                else:
                    media.append(
                        encode_avi_mjpeg(frames, fps=fps, quality=100)
                    )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": mime}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def attach_pattern_audio(
    docs: DataFrame,
    id_col: str = "doc_id",
    fmt: str = "ogg",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Fixture/ingest helper with a CLOSED-FORM audio pattern: doc
    ``i`` gets ``400 + (i%7)*50`` samples alternating ``+a, -a`` with
    ``a = 100 + i%11``. Every downstream feature is exact arithmetic
    on the id (RMS = peak = a, zero_crossings = n-1, duration =
    n/16 ms at 16 kHz) and every container here is LOSSLESS, so an
    external engine can recompute the statistics with no shared code
    — the audio twin of :func:`attach_pattern_videos`. ``fmt``:
    ``pcm1`` (raw tier), ``wav`` (RIFF PCM16), ``flac`` (native), or
    ``ogg`` (Ogg FLAC mapping — certifies page framing + CRC + the
    FLAC layer end-to-end)."""
    if fmt not in ("pcm1", "wav", "flac", "ogg"):
        raise ValueError(f"unknown audio format {fmt!r}")
    id_type = dict(docs.dtypes)[id_col]
    mime = {"pcm1": "audio/pcm1", "wav": "audio/wav",
            "flac": "audio/flac", "ogg": "audio/ogg"}[fmt]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.flac import encode_flac
        from icicle_spark.operators.ogg import encode_ogg_flac

        enc = {
            "pcm1": lambda s: encode_pcm_audio(s, sample_rate),
            "wav": lambda s: encode_wav(s, sample_rate),
            "flac": lambda s: encode_flac(s, sample_rate),
            "ogg": lambda s: encode_ogg_flac(s, sample_rate),
        }[fmt]
        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                i = int(rid)
                n = 400 + (i % 7) * 50
                a = 100 + i % 11
                s = np.where(
                    np.arange(n) % 2 == 0, a, -a
                ).astype(np.int16)
                media.append(enc(s))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": mime}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def attach_pattern_vorbis(
    docs: DataFrame,
    id_col: str = "doc_id",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Fixture/ingest helper with a CLOSED-FORM Ogg Vorbis pattern.
    Vorbis is LOSSY, so unlike :func:`attach_pattern_audio` the
    anchor is the SPECTRUM, which the profile encoder
    (``operators/vorbis.py``) writes exactly: doc ``i`` carries
    ``6 + i%7`` packets of a single spectral line ``k0 = i%8`` with
    amplitude ``v in {-1, -0.5, +0.5}`` by ``i%3``. Equal
    consecutive short blocks make the decoded waveform periodic and
    fully closed-form (module docstring of ``vorbis.py``), so an
    external engine recomputes every feature from elementary trig
    with no shared code — the lossy-codec twin of the
    ``png_features`` / ``m1v_features`` oracle strategy."""
    id_type = dict(docs.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.vorbis import (
            _HALF,
            _ZERO_IDX,
            encode_vorbis_pattern,
        )

        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                i = int(rid)
                n_pkts = 6 + i % 7
                spec = np.full((n_pkts, _HALF), _ZERO_IDX, np.int64)
                spec[:, i % 8] = (0, 1, 3)[i % 3]
                media.append(encode_vorbis_pattern(spec, sample_rate))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": "audio/ogg; codecs=vorbis"}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def vorbis_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL Ogg Vorbis decode features, on the float samples BEFORE
    PCM quantization (a lossy codec's oracle lives in float): one
    Arrow-batched ``decode_vorbis`` per asset inside ``mapInPandas``
    -> ``(n_samples, rms, peak, dc)``. Same 100 TB shape as
    ``decode_media_features``: narrow map stage, binary column never
    shuffled, decode parallelism = partition count."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.vorbis import decode_vorbis

        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                s, _rate = decode_vorbis(bytes(buf))
                if s.ndim == 2:
                    s = s.mean(axis=1)
                rows.append((
                    rid,
                    int(s.shape[0]),
                    float(np.sqrt(np.mean(s * s))) if s.size else 0.0,
                    float(np.abs(s).max()) if s.size else 0.0,
                    float(s.mean()) if s.size else 0.0,
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_samples", "rms", "peak", "dc"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, n_samples bigint, rms double, "
        "peak double, dc double",
    )


def video_frame_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every: int = 1,
) -> DataFrame:
    """REAL per-frame features from GIF/AVI payloads: decode the
    container, keep every ``every``-th frame, emit one row per kept
    frame with dimensions + mean pixel — one Arrow-batched decode per
    asset inside ``mapInPandas``."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                frames, fps = decode_video(bytes(buf))
                n, h, w, _ = frames.shape
                for k in range(0, n, every):
                    rows.append(
                        (rid, k, n, h, w, float(fps),
                         float(frames[k].astype(np.float64).mean()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx", "n_frames", "height",
                         "width", "fps", "mean_px"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, frame_idx int, n_frames int, "
        "height int, width int, fps double, mean_px double",
    )


def image_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL per-image features from RAW1 or PNG payloads
    (magic-dispatched decode): dimensions plus per-channel means and
    overall std — one Arrow-batched decode per asset, numpy
    throughout."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                img = decode_image(bytes(buf))
                h, w, c = img.shape
                means = img.reshape(-1, c).mean(axis=0)
                rows.append(
                    (
                        rid, h, w, c,
                        float(means[0]),
                        float(means[1]) if c > 1 else None,
                        float(means[2]) if c > 2 else None,
                        float(img.astype("float64").std()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "height", "width", "channels",
                         "mean_r", "mean_g", "mean_b", "std_px"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, height int, width int, channels int, "
        "mean_r double, mean_g double, mean_b double, std_px double",
    )


def resize_raw_images(
    df: DataFrame,
    target_h: int,
    target_w: int,
    media_col: str = "media",
) -> DataFrame:
    """REAL nearest-neighbor resize of RAW1 or PNG images (numpy
    integer index gather — the same access pattern a SIMD resize
    kernel uses), re-encoded in the SAME container the row arrived
    in."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[media_col]:
                b = bytes(buf)
                img = decode_image(b)
                if b[:8] == _PNG_SIG:
                    enc = encode_png
                elif b[:3] == b"\xff\xd8\xff":
                    from icicle_spark.operators.jpeg import encode_jpeg

                    enc = encode_jpeg
                else:
                    enc = encode_raw_image
                h, w, _c = img.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out.append(enc(img[yi[:, None], xi[None, :]]))
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(fn, df.schema)


def audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL per-clip features from PCM1 / RIFF/WAVE / FLAC /
    Ogg FLAC payloads (magic-dispatched; stereo averaged to mono):
    duration, RMS, peak, zero-crossing count."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                s, rate = decode_audio(bytes(buf))
                x = s.astype("float64")
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    (
                        rid,
                        float(len(s) * 1000.0 / rate),
                        float(np.sqrt(np.mean(x * x))) if len(s) else 0.0,
                        int(np.abs(s).max()) if len(s) else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "duration_ms", "rms", "peak", "zero_crossings"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, duration_ms double, rms double, "
        "peak int, zero_crossings int",
    )


# ------------------------------------------------------- compressed tier


def _try_real_decode(buf: bytes) -> np.ndarray:
    """Real decode path -> canonical uint8 content array (image/video
    pixels flattened, or audio PCM bytes). RAW1/PNG/JPEG images,
    PCM1/WAV(PCM16 + IMA ADPCM)/FLAC/Ogg-FLAC/Ogg-Vorbis audio, and
    GIF/AVI/MPEG-1 video all decode for real via the tier-1/tier-2
    codecs (FLAC in ``flac.py``, motion-compensated MPEG-1 in
    ``mpeg1.py``, Vorbis floor1/residue/IMDCT in ``vorbis.py``) —
    the whole audio/image/video matrix is stub-free. Swap the tail
    of this function for PIL/cv2/libsndfile in production;
    everything downstream is agnostic."""
    if buf[:4] == _RAW1 or buf[:8] == _PNG_SIG or buf[:3] == b"\xff\xd8\xff":
        return decode_image(buf).reshape(-1)
    if _is_gif(buf) or _is_avi(buf) or _is_m1v(buf):
        frames, _fps = decode_video(buf)
        return frames.reshape(-1)
    if buf[:4] in (_PCM1, b"RIFF", b"fLaC", b"OggS"):
        # OggS: decode_audio dispatches Ogg FLAC and Ogg Vorbis, both
        # decoded for real by the pure-numpy codecs
        samples, _rate = decode_audio(buf)
        return np.frombuffer(samples.astype("<i2").tobytes(), np.uint8)
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "no image codec in this environment; using deterministic fake"
        ) from None
    raise NotImplementedError("real decode intentionally not wired in sandbox")


def _fake_features(buf: bytes) -> tuple[int, int, int, float]:
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return 0, 0, 0, 0.0
    return int(a.size), int(a[0]), int(a[-1]), float(a.mean())


def decode_media_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Per-asset decode + feature extraction via ``mapInPandas``
    (Arrow-batched; the per-asset loop is the codec call, exactly as a
    real decoder would be driven). RAW1/PNG/PCM1/WAV payloads yield
    stats over the REAL decoded content (pixels / PCM bytes);
    codec-library formats fall back to the deterministic byte fake."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf[media_col]:
                b = bytes(buf)
                try:
                    content = _try_real_decode(b)
                    if content.size == 0:
                        feats.append((0, 0, 0, 0.0))
                    else:
                        feats.append(
                            (
                                int(content.size),
                                int(content[0]),
                                int(content[-1]),
                                float(content.mean()),
                            )
                        )
                except NotImplementedError:
                    feats.append(_fake_features(b))
            out = pd.DataFrame(
                feats, columns=["n_bytes", "first_byte", "last_byte", "mean_byte"]
            )
            out[id_col] = pdf[id_col].to_numpy()
            yield out[[id_col, "n_bytes", "first_byte", "last_byte", "mean_byte"]]

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, n_bytes bigint, first_byte int, "
        "last_byte int, mean_byte double",
    )


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every: int = 4,
) -> DataFrame:
    """Sample every ``every``-th frame and emit one row per sampled
    frame with a deterministic checksum. GIF/AVI payloads go through
    the REAL container decoders (checksum = int64 sum of the frame's
    decoded RGB pixels); other payloads fall back to the byte-chunk
    fake (one "frame" per FRAME_BYTES bytes, checksum = byte sum)."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                b = bytes(buf)
                if _is_gif(b) or _is_avi(b):
                    frames, _fps = decode_video(b)
                    for k in range(0, frames.shape[0], every):
                        ids.append(rid)
                        idxs.append(k)
                        sums.append(int(frames[k].astype(np.int64).sum()))
                    continue
                a = np.frombuffer(b, dtype=np.uint8)
                n_frames = int(np.ceil(a.size / FRAME_BYTES)) if a.size else 0
                for k in range(0, n_frames, every):
                    chunk = a[k * FRAME_BYTES: (k + 1) * FRAME_BYTES]
                    ids.append(rid)
                    idxs.append(k)
                    sums.append(int(chunk.astype(np.int64).sum()))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.select(id_col, media_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, frame_idx int, frame_checksum bigint"
    )


def resize_stub(
    df: DataFrame, media_col: str = "media", target: int = 64
) -> DataFrame:
    """'Resize' = deterministic byte-level downsample to ``target``
    bytes (real resize would live in the codec; plumbing identical)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[media_col]:
                a = np.frombuffer(bytes(buf), dtype=np.uint8)
                if a.size == 0:
                    out.append(bytearray())
                    continue
                idx = np.linspace(0, a.size - 1, min(target, a.size)).astype(int)
                out.append(bytearray(a[idx].tobytes()))
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(fn, df.schema)
