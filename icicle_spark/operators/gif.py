"""GIF89a codec in pure numpy + stdlib — the lossless member of the
video tier (``multimodal.py`` tier 2).

Implements the public GIF89a specification (CompuServe, 1990; the
format W3C republishes) with no codec library:

- ``encode_gif``: animated GIF byte stream from a stack of frames.
  Global 256-entry colour table (a grayscale ramp for 2-D frames, or
  a palette built from the distinct colours of RGB frames — >256
  distinct colours raises loudly, as GIF is an indexed format),
  Netscape 2.0 looping extension, per-frame Graphic Control
  Extension (disposal + delay), optional interlaced row order, and
  variable-width LSB-first LZW compression with deferred-clear
  (dictionary freezes at 4096 entries — no mid-stream CLEAR needed,
  the most compatible convention).
- ``decode_gif``: full decoder — logical screen descriptor, global
  and local colour tables, extension skipping, Graphic Control
  handling (disposal methods 0-3, transparency), interlace pass
  reordering, and canvas composition: each decoded image is painted
  onto the logical screen at its (left, top) offset, transparent
  pixels leave the canvas untouched, disposal 2 restores the painted
  region to the background colour and disposal 3 restores the
  previous canvas.  Returns ``(frames, delays_cs)`` with frames a
  ``(N, H, W, 3)`` uint8 array of the COMPOSED canvas after each
  image (what a player shows), so encode -> decode round-trips
  bit-exact for full-canvas frames.

LZW reference semantics: variable code width starting at
``min_code_size + 1``; decoder grows its table by one entry per code
after the first and widens when the table reaches ``1 << width``
(up to 12 bits); the encoder mirrors that decoder-table bookkeeping
exactly so widths stay in sync, and both sides freeze at 4096.

The per-frame LZW loops are plain Python — fine at fixture scale;
production swaps this module for an imageio/PIL decode behind the
same ``decode_image``/video dispatch in ``multimodal.py``.

Reference parity note: the reference engine (icicle-lang/icicle)
treats media as opaque blobs; this module exists for the
training-data-pipeline tier (frame sampling / feature extraction
over multimodal corpora), not for reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GCE_LABEL = 0xF9
_MAX_CODE = 4096  # LZW dictionary hard limit (12-bit codes)

# interlace passes: (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    """Row indices in stream order for an interlaced image."""
    return np.concatenate(
        [np.arange(first, height, step) for first, step in _INTERLACE_PASSES]
    ).astype(np.int64)


# --------------------------------------------------------------- LZW


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compress a flat uint8 index array.

    Emits CLEAR, then greedy longest-match codes; the dictionary
    freezes at 4096 entries (deferred clear). Code widths mirror the
    decoder's table length, which lags the encoder's own dictionary
    by one (the decoder adds no entry after the first data code).
    """
    clear = 1 << min_code_size
    end = clear + 1
    # encoder dictionary: bytes -> code
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    # decoder-mirror bookkeeping for code widths
    dec_len = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    first_emitted = False

    def emit_data(code: int) -> None:
        """Emit a data code, then mirror the decoder's post-read table
        growth (it appends one entry per data code after the first,
        widening when its table reaches 1 << width) so the NEXT code —
        including END — is written at the width the decoder reads it."""
        nonlocal dec_len, width, first_emitted
        emit(code)
        if first_emitted and dec_len < _MAX_CODE:
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
        first_emitted = True

    emit(clear)
    data = indices.astype(np.uint8).tobytes()
    if data:
        cur = data[:1]
        for i in range(1, len(data)):
            nxt = cur + data[i : i + 1]
            if nxt in table:
                cur = nxt
                continue
            emit_data(table[cur])
            if next_code < _MAX_CODE:
                table[nxt] = next_code
                next_code += 1
            cur = nxt[-1:]
        emit_data(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)

    # wrap in <=255-byte sub-blocks
    blocks = bytearray([min_code_size])
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return bytes(blocks)


def lzw_decode(blocks: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decompress LZW image data starting at ``pos`` (the
    min-code-size byte). Returns (flat uint8 indices, next offset)."""
    min_code_size = blocks[pos]
    pos += 1
    data = bytearray()
    while True:
        n = blocks[pos]
        pos += 1
        if n == 0:
            break
        data.extend(blocks[pos : pos + n])
        pos += n

    clear = 1 << min_code_size
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(roots)
    width = min_code_size + 1
    out = bytearray()
    prev: int | None = None
    acc = 0
    nbits = 0
    di = 0
    nd = len(data)
    while True:
        while nbits < width:
            if di >= nd:
                raise ValueError("GIF LZW stream truncated (no END code)")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(f"bad first LZW code {code}")
            out.extend(table[code])
            prev = code
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"LZW code {code} out of range {len(table)}")
        out.extend(entry)
        if len(table) < _MAX_CODE:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
    return np.frombuffer(bytes(out), dtype=np.uint8), pos


# ----------------------------------------------------------- encoder


def _build_palette(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N,H,W,3) RGB frames -> (palette (256,3), (N,H,W) indices).
    Raises if the frames use more than 256 distinct colours."""
    flat = frames.reshape(-1, 3)
    packed = (
        flat[:, 0].astype(np.uint32) << 16
        | flat[:, 1].astype(np.uint32) << 8
        | flat[:, 2].astype(np.uint32)
    )
    colours, inverse = np.unique(packed, return_inverse=True)
    if colours.size > 256:
        raise ValueError(
            f"GIF is indexed: frames use {colours.size} distinct colours "
            "(max 256); quantize first"
        )
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: colours.size, 0] = (colours >> 16) & 0xFF
    palette[: colours.size, 1] = (colours >> 8) & 0xFF
    palette[: colours.size, 2] = colours & 0xFF
    return palette, inverse.reshape(frames.shape[:3]).astype(np.uint8)


def encode_gif(
    frames: np.ndarray,
    *,
    palette: np.ndarray | None = None,
    delay_cs: int = 4,
    interlace: bool = False,
    loop: int = 0,
) -> bytes:
    """Encode frames as an animated GIF89a.

    ``frames``: (N, H, W) uint8 palette indices (grayscale ramp
    palette unless ``palette`` given) or (N, H, W, 3) RGB uint8
    (palette built from distinct colours, <=256 or raises).
    Every frame is full-canvas with disposal 1 (leave in place), so
    decode returns the input stack bit-exact.
    """
    frames = np.asarray(frames)
    if frames.ndim == 3:
        idx = frames.astype(np.uint8)
        if palette is None:
            ramp = np.arange(256, dtype=np.uint8)
            palette = np.stack([ramp, ramp, ramp], axis=1)
    elif frames.ndim == 4 and frames.shape[3] == 3:
        if palette is not None:
            raise ValueError("palette only valid with index frames")
        palette, idx = _build_palette(frames.astype(np.uint8))
    else:
        raise ValueError(f"unsupported frame stack shape {frames.shape}")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    n, h, w = idx.shape
    if n == 0:
        raise ValueError("need at least one frame")

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, 8-bit colour, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.tobytes()
    # Netscape looping extension
    out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0"
    out += bytes([3, 1]) + struct.pack("<H", loop) + bytes([0])
    for k in range(n):
        # graphic control: disposal 1 (do not dispose), no transparency
        out += bytes([_EXTENSION, _GCE_LABEL, 4, 0b000_001_0_0])
        out += struct.pack("<H", delay_cs) + bytes([0, 0])
        # image descriptor: full canvas, no local table
        out += bytes([_IMAGE_SEP]) + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = idx[k][_interlace_order(h)] if interlace else idx[k]
        out += lzw_encode(rows.reshape(-1), 8)
    out.append(_TRAILER)
    return bytes(out)


# ----------------------------------------------------------- decoder


def decode_gif(buf: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode a GIF87a/89a byte stream.

    Returns ``(frames, delays_cs)``: the composed logical-screen
    canvas after each image (RGB uint8, shape (N, H, W, 3)) and the
    per-frame delays in centiseconds.
    """
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg_idx, _aspect = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    global_pal = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        global_pal = (
            np.frombuffer(buf[pos : pos + 3 * size], np.uint8)
            .reshape(size, 3)
            .copy()
        )
        pos += 3 * size

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        canvas[:] = global_pal[bg_idx]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the next image
    disposal, delay_cs, transp = 0, 0, -1

    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            label = buf[pos]
            pos += 1
            if label == _GCE_LABEL:
                n = buf[pos]
                flags = buf[pos + 1]
                (delay_cs,) = struct.unpack("<H", buf[pos + 2 : pos + 4])
                transp = buf[pos + 4] if flags & 0x01 else -1
                disposal = (flags >> 2) & 0x07
                pos += 1 + n
                if buf[pos] != 0:
                    raise ValueError("unterminated graphic control ext")
                pos += 1
            else:  # comment / plain-text / application: skip sub-blocks
                while True:
                    n = buf[pos]
                    pos += 1
                    if n == 0:
                        break
                    pos += n
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")

        left, top, iw, ih, iflags = struct.unpack("<HHHHB", buf[pos : pos + 9])
        pos += 9
        pal = global_pal
        if iflags & 0x80:  # local colour table
            size = 2 << (iflags & 0x07)
            pal = (
                np.frombuffer(buf[pos : pos + 3 * size], np.uint8)
                .reshape(size, 3)
                .copy()
            )
            pos += 3 * size
        if pal is None:
            raise ValueError("GIF image with no colour table")

        idx, pos = lzw_decode(buf, pos)
        if idx.size != iw * ih:
            raise ValueError(
                f"GIF frame pixel count {idx.size} != {iw}x{ih}"
            )
        img = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in pass order
            deinter = np.empty_like(img)
            deinter[_interlace_order(ih)] = img
            img = deinter

        region = canvas[top : top + ih, left : left + iw]
        saved = region.copy() if disposal == 3 else None
        rgb = pal[np.minimum(img, len(pal) - 1)]
        if transp >= 0:
            mask = img != transp
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)

        if disposal == 2:  # restore to background
            canvas[top : top + ih, left : left + iw] = bg_fill
        elif disposal == 3 and saved is not None:  # restore previous
            canvas[top : top + ih, left : left + iw] = saved
        disposal, delay_cs, transp = 0, 0, -1

    if not frames:
        raise ValueError("GIF stream contains no image")
    return np.stack(frames), delays
