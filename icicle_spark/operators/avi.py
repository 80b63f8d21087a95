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

The module also implements Microsoft RLE8 (``BI_RLE8``,
biCompression=1 — the public Windows RLE bitmap/video codec), which
is a true INTER-FRAME format: a delta frame's escape codes (end-of-
line, delta-offset, early end-of-bitmap) skip pixels entirely, and
skipped pixels retain the PREVIOUS frame's content on the decoder's
persistent canvas. ``encode_avi_rle8`` writes frame 0 as a keyframe
and every later frame as a temporal delta containing only the
changed runs; ``decode_avi_frames`` keeps the canvas across chunks.
RLE8 is lossless over 8-bit (grayscale-palette) frames, so
round-trips are bit-exact — pinned alongside a spec-literal
hand-built stream in ``tests/test_video.py``.

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


# ------------------------------------------------------------ MS-RLE8
# BI_RLE8 (biCompression = 1): the public Microsoft RLE bitmap/video
# coding. Opcodes are byte pairs, rows run BOTTOM-UP:
#   (n>0, c)        -> n pixels of palette index c
#   (0, 0)          -> end of line
#   (0, 1)          -> end of bitmap
#   (0, 2, dx, dy)  -> move cursor right dx, up dy rows; SKIPPED
#                      pixels keep the previous frame's content,
#                      which is what makes delta frames inter-frame
#   (0, n>=3, ...)  -> n literal pixels, word-padded


def _rle8_runs(seg: np.ndarray) -> bytearray:
    """RLE8-code one contiguous changed segment (no escapes)."""
    out = bytearray()
    i, n = 0, len(seg)
    while i < n:
        run = 1
        while i + run < n and run < 255 and seg[i + run] == seg[i]:
            run += 1
        if run >= 3:
            out += bytes((run, int(seg[i])))
            i += run
            continue
        # literal stretch: until a >=3 run starts (or the 254 cap)
        j = i
        while j < n and j - i < 254:
            if j + 2 < n and seg[j] == seg[j + 1] == seg[j + 2]:
                break
            j += 1
        lit = j - i
        if lit >= 3:
            out += bytes((0, lit)) + seg[i:j].tobytes()
            if lit & 1:
                out += b"\x00"  # absolute mode is word-aligned
        else:
            for k in range(i, j):
                out += bytes((1, int(seg[k])))
        i = j
    return out


def _rle8_encode_frame(cur: np.ndarray, prev: np.ndarray | None) -> bytes:
    """One RLE8 frame, bottom-up. ``prev=None`` -> keyframe (every
    pixel coded); else a delta frame: only runs where ``cur`` differs
    from ``prev`` are coded, everything else is skipped with delta
    escapes so the decoder's canvas carries it over."""
    h, w = cur.shape
    out = bytearray()
    for r in range(h):  # r = bottom-up row index
        row = cur[h - 1 - r]
        if prev is None:
            segs = [(0, w)] if w else []
        else:
            diff = row != prev[h - 1 - r]
            if not diff.any():
                out += bytes((0, 0))  # bare EOL: row fully skipped
                continue
            edges = np.flatnonzero(np.diff(diff.astype(np.int8)))
            bounds = np.concatenate(([0], edges + 1, [w]))
            segs = [
                (int(bounds[k]), int(bounds[k + 1]))
                for k in range(len(bounds) - 1)
                if diff[bounds[k]]
            ]
        x = 0
        for s, e in segs:
            dx = s - x
            while dx > 255:
                out += bytes((0, 2, 255, 0))
                dx -= 255
            if dx:
                out += bytes((0, 2, dx, 0))
            out += _rle8_runs(row[s:e])
            x = e
        out += bytes((0, 0))  # EOL
    out += bytes((0, 1))  # end of bitmap
    return bytes(out)


def _rle8_apply(data: bytes, canvas: np.ndarray) -> None:
    """Apply one RLE8 frame to the persistent canvas in place."""
    h, w = canvas.shape
    x = r = 0
    i, n = 0, len(data)
    while i + 2 <= n:
        b0, b1 = data[i], data[i + 1]
        i += 2
        if b0 > 0:
            if r >= h or x + b0 > w:
                raise ValueError("RLE8 run exceeds frame bounds")
            canvas[h - 1 - r, x : x + b0] = b1
            x += b0
        elif b1 == 0:  # EOL
            r += 1
            x = 0
        elif b1 == 1:  # end of bitmap
            return
        elif b1 == 2:  # delta: skipped pixels keep previous content
            if i + 2 > n:
                raise ValueError("RLE8 truncated delta escape")
            x += data[i]
            r += data[i + 1]
            i += 2
            if x > w or r > h:
                raise ValueError("RLE8 delta exceeds frame bounds")
        else:  # absolute mode
            if r >= h or x + b1 > w or i + b1 > n:
                raise ValueError("RLE8 absolute run exceeds bounds")
            canvas[h - 1 - r, x : x + b1] = np.frombuffer(
                data[i : i + b1], dtype=np.uint8
            )
            x += b1
            i += b1 + (b1 & 1)
    raise ValueError("RLE8 stream missing end-of-bitmap")


_GRAY_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))


def encode_avi_rle8(
    frames: np.ndarray | list[np.ndarray], *, fps: int = 10
) -> bytes:
    """Encode (N, H, W) uint8 grayscale frames as an MS-RLE8 AVI:
    frame 0 is a keyframe (flagged in idx1), every later frame a
    temporal delta coding only changed pixels. Lossless."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("all AVI frames must share one size")
    payloads = [
        _rle8_encode_frame(f, frames[k - 1] if k else None)
        for k, f in enumerate(frames)
    ]
    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_bytes * fps, 0, 0x10,
        n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MRLE"
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, fps, 0, n, max_bytes,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    # BITMAPINFOHEADER: 8-bit, BI_RLE8, 256-entry grayscale palette
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, w * h, 0, 0, 256, 0
    ) + _GRAY_PALETTE
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx = bytearray()
    for k, p in enumerate(payloads):
        flags = 0x10 if k == 0 else 0  # AVIIF_KEYFRAME on frame 0 only
        idx += b"00dc" + struct.pack("<III", flags, 4 + len(movi_body), len(p))
        movi_body += _chunk(b"00dc", p)
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
    """Decode an AVI -> ((N, H, W, 3) uint8 frames, fps). Dispatches
    on the video stream's BITMAPINFOHEADER: MJPG fourcc -> per-frame
    JPEG decode; biCompression=1 (BI_RLE8) -> persistent-canvas
    inter-frame decode with the stream palette."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps = 0.0
    chunks: list[bytes] = []
    strf: bytes | None = None

    def walk(pos: int, end: int) -> None:
        nonlocal fps, strf
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
            elif tag == b"strf" and length >= 40 and strf is None:
                strf = buf[start : start + length]
            elif tag == b"avih" and length >= 4 and fps == 0.0:
                (usec,) = struct.unpack("<I", buf[start : start + 4])
                if usec:
                    fps = 1_000_000 / usec
            elif tag[2:4] in (b"dc", b"db") and length >= 2:
                chunks.append(buf[start : start + length])

    walk(12, len(buf))
    if not chunks:
        raise ValueError("AVI contains no video frames")

    compression = strf[16:20] if strf is not None else None
    if compression == struct.pack("<I", 1):  # BI_RLE8 inter-frame
        w, h = struct.unpack("<ii", strf[4:12])
        h = abs(h)
        palette = np.frombuffer(strf[40 : 40 + 256 * 4], dtype=np.uint8)
        palette = palette.reshape(-1, 4)[:, [2, 1, 0]]  # RGBQUAD is BGR0
        if palette.shape[0] < 256:
            raise ValueError("RLE8 AVI missing 256-entry palette")
        canvas = np.zeros((h, w), dtype=np.uint8)
        frames = []
        for c in chunks:
            _rle8_apply(c, canvas)  # deltas mutate the carried canvas
            frames.append(palette[canvas])
        return np.stack(frames), fps

    if any(c[:3] != b"\xff\xd8\xff" for c in chunks):
        raise ValueError(
            "unsupported AVI video codec (MJPG or BI_RLE8 only)"
        )
    frames = [decode_jpeg(j) for j in chunks]
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("AVI frames disagree on size")
    rgb = [
        f if f.ndim == 3 and f.shape[2] == 3
        else np.repeat(f.reshape(h, w, 1), 3, axis=2)
        for f in frames
    ]
    return np.stack(rgb), fps
