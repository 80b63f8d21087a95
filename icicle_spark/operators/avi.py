"""AVI / Motion-JPEG container codec in pure stdlib — the lossy
member of the video tier (``multimodal.py`` tier 2).

AVI is a RIFF container (Microsoft, public specification); MJPEG
stores each video frame as an independent baseline JPEG, so the
frames themselves ride the real T.81 codec in
``icicle_spark/operators/jpeg.py``:

- ``encode_avi_mjpeg``: RIFF('AVI ') with a spec-shaped header list
  — ``avih`` main header (56 bytes: frame period in microseconds,
  total frames, dimensions), one ``strl`` stream list (``strh``
  'vids'/'MJPG' with rate/scale, ``strf`` BITMAPINFOHEADER) — a
  ``movi`` list of word-aligned ``00dc`` chunks each holding one
  JPEG, and a standard ``idx1`` index.
- ``decode_avi_frames``: walks the RIFF chunk tree, reads the frame
  rate from ``strh`` (rate/scale, falling back to ``avih``'s
  microseconds-per-frame), collects every ``00dc``/``00db`` chunk in
  the ``movi`` list and decodes it with ``decode_jpeg``. Returns
  ``(frames (N, H, W, 3) uint8, fps float)``.

JPEG is lossy, so AVI round-trips are exact only where the DCT math
is exact (flat-colour frames at quality 100 — see ``jpeg.py``);
tests pin that plus PSNR on gradients. Word-alignment of RIFF chunks
follows the same rule as the WAV reader in ``multimodal.py``.

Reference parity note: the reference engine treats media as opaque
blobs; this module serves the training-data-pipeline tier (video
frame sampling at corpus scale), not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

from icicle_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def encode_avi_mjpeg(
    frames: np.ndarray | list[np.ndarray],
    *,
    fps: int = 10,
    quality: int = 90,
) -> bytes:
    """Encode a stack of (H, W[, 3]) uint8 frames as an MJPEG AVI."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one size")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    # avih: usec/frame, max bytes/sec, padding, flags(HASINDEX),
    # total frames, initial frames, streams, suggested buffer,
    # width, height, reserved[4]
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    # strh: fccType, fccHandler, flags, prio+lang, initial, scale,
    # rate, start, length, bufsize, quality, samplesize, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, fps, 0, n, max_bytes,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    # strf: BITMAPINFOHEADER with biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets point at the chunk tag, relative to 'movi'
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_body))

    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) over a RIFF chunk run."""
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def decode_avi_frames(buf: bytes) -> tuple[np.ndarray, float]:
    """Decode an MJPEG AVI -> ((N, H, W, 3) uint8 frames, fps)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps = 0.0
    jpegs: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps
        for tag, start, length in _iter_chunks(buf, pos, end):
            if tag == b"LIST":
                ltype = buf[start : start + 4]
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(start + 4, start + length)
            elif tag == b"strh" and length >= 32:
                if buf[start : start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", buf[start + 20 : start + 28]
                    )
                    if scale:
                        fps = rate / scale
            elif tag == b"avih" and length >= 4 and fps == 0.0:
                (usec,) = struct.unpack("<I", buf[start : start + 4])
                if usec:
                    fps = 1_000_000 / usec
            elif tag[2:4] in (b"dc", b"db") and length >= 2:
                body = buf[start : start + length]
                if body[:3] == b"\xff\xd8\xff":
                    jpegs.append(body)
                else:
                    raise ValueError(
                        f"non-JPEG video chunk {tag!r} (MJPEG only)"
                    )

    walk(12, len(buf))
    if not jpegs:
        raise ValueError("AVI contains no video frames")
    frames = [decode_jpeg(j) for j in jpegs]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("AVI frames disagree on size")
    rgb = [
        f if f.ndim == 3 and f.shape[2] == 3
        else np.repeat(f.reshape(h, w, 1), 3, axis=2)
        for f in frames
    ]
    return np.stack(rgb), fps
