"""Pure-numpy/stdlib FLAC codec (RFC 9639 subset) for the multimodal
compressed-audio tier.

The container ships no libsndfile/soundfile, so — like the PNG/JPEG/
GIF/ADPCM tiers before it (`multimodal.py`, `jpeg.py`, `gif.py`) —
this is a from-scratch implementation of the public FLAC bitstream
format, good enough to round-trip real audio losslessly and to decode
streams produced by conformant encoders within the supported subset:

* decoder: STREAMINFO + metadata skip, frames with CRC-8 header and
  CRC-16 frame checks, UTF-8-coded frame/sample numbers, CONSTANT /
  VERBATIM / FIXED(0-4) / LPC(1-32) subframes, partitioned Rice
  residuals (RICE and RICE2, escape partitions), wasted bits, and all
  four channel assignments (independent, left/side, right/side,
  mid/side) with the side channel's +1 bit depth; optional stream MD5
  verification against STREAMINFO.
* encoder: 16-bit mono/stereo (independent channels), fixed block
  size, per-channel best-of CONSTANT / FIXED(0-4) / VERBATIM with
  exhaustive Rice-parameter search, correct CRCs and STREAMINFO MD5 —
  every stream it emits decodes bit-exactly to its input.

Lossless means *lossless*: all round-trip tests assert exact int16
equality (`tests/test_flac.py`). Prediction/residual arithmetic is
int64 numpy throughout; only the LPC inner recurrence is a per-sample
Python loop (decode-only path, sequentially dependent by definition).

Like every codec here this runs INSIDE Arrow-batched ``mapInPandas``
workers — one binary cell per document row — so Spark parallelism is
across rows, and per-row cost is what it is on any executor.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110  # 14-bit frame sync


# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity: CRC-8 poly 0x07, CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table[byte] = crc & mask
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[crc ^ b])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]) ^ (crc << 8)) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# bit-level I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at the bit
    level)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        # q zero bits then a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self.data = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, nbits: int) -> int:
        end = self.pos + nbits
        if end > len(self.data) * 8:
            raise ValueError("FLAC: bitstream truncated")
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        self.pos = end
        return (chunk >> shift) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            # scan up to a byte at a time
            avail = min(8 - (self.pos & 7), (len(self.data) * 8) - self.pos)
            if avail <= 0:
                raise ValueError("FLAC: bitstream truncated in unary")
            peek = self.read(avail)
            if peek == 0:
                q += avail
                continue
            # highest set bit inside peek
            lead = avail - peek.bit_length()
            q += lead
            # rewind past the 1-bit's trailing bits we over-consumed
            self.pos -= avail - lead - 1
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert (self.pos & 7) == 0
        return self.pos >> 3


# ---------------------------------------------------------------------------
# shared frame-header tables
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {
    192: 0b0001,
    576: 0b0010, 1152: 0b0011, 2304: 0b0100, 4608: 0b0101,
    256: 0b1000, 512: 0b1001, 1024: 0b1010, 2048: 0b1011,
    4096: 0b1100, 8192: 0b1101, 16384: 0b1110, 32768: 0b1111,
}
_SAMPLE_RATES = {
    0b0001: 88_200, 0b0010: 176_400, 0b0011: 192_000, 0b0100: 8_000,
    0b0101: 16_000, 0b0110: 22_050, 0b0111: 24_000, 0b1000: 32_000,
    0b1001: 44_100, 0b1010: 48_000, 0b1011: 96_000,
}
_SAMPLE_SIZE_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110,
                      32: 0b111}
_SAMPLE_SIZES = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}

# fixed predictor coefficients per order (applied to previous samples)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_coded(value: int) -> bytes:
    """FLAC's extended-UTF-8 number coding (frame/sample numbers, up
    to 36 bits / 7 bytes)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, bits in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if value < (1 << bits):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (value & 0x3F)
                value >>= 6
            out[0] = ((0xFF << (8 - nbytes)) & 0xFF) | value
            return bytes(out)
    raise ValueError("number too large for FLAC UTF-8 coding")


def _read_utf8_coded(rd: _BitReader) -> int:
    first = rd.read(8)
    if first < 0x80:
        return first
    n = 0
    probe = first
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0:
        raise ValueError("FLAC: invalid UTF-8-coded number")
    value = first & (0x3F >> n)
    for _ in range(n):
        cont = rd.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation byte")
        value = (value << 6) | (cont & 0x3F)
    return value


# ---------------------------------------------------------------------------
# Rice residual coding
# ---------------------------------------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1).astype(np.int64)


def _rice_cost(uval: np.ndarray, k: int) -> int:
    return int((uval >> k).sum()) + uval.size * (k + 1)


def _best_rice_param(uval: np.ndarray, max_k: int = 30) -> tuple[int, int]:
    """(k, bits) minimizing the exact coded size."""
    if uval.size == 0:
        return 0, 0
    best_k, best_bits = 0, _rice_cost(uval, 0)
    for k in range(1, max_k + 1):
        bits = _rice_cost(uval, k)
        if bits < best_bits:
            best_k, best_bits = k, bits
        elif bits > best_bits * 2:
            break
    return best_k, best_bits


def _write_rice(w: _BitWriter, res: np.ndarray, k: int) -> None:
    uval = _zigzag(res)
    for u in uval.tolist():
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _write_residual(w: _BitWriter, res: np.ndarray) -> None:
    """Encoder subset: method RICE (4-bit params), partition order
    0 (a single partition covering blocksize - predictor_order)."""
    w.write(0b00, 2)  # RICE
    w.write(0, 4)  # partition order 0
    k, _ = _best_rice_param(_zigzag(res))
    if k >= 15:  # param 15 is the escape code in 4-bit RICE
        w.write(0b1111, 4)
        raw = max(int(np.abs(res).max()).bit_length() + 1, 1) if res.size else 1
        w.write(raw, 5)
        for v in res.tolist():
            w.write_signed(v, raw)
        return
    w.write(k, 4)
    _write_rice(w, res, k)


def _read_residual(rd: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method not in (0, 1):
        raise ValueError(f"FLAC: reserved residual method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = rd.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: block size not divisible by partition count")
    out = np.empty(blocksize - order, dtype=np.int64)
    filled = 0
    for p in range(n_parts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = rd.read(param_bits)
        if param == escape:
            raw = rd.read(5)
            for i in range(n):
                out[filled + i] = rd.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = rd.read_unary()
                u = (q << param) | (rd.read(param) if param else 0)
                out[filled + i] = (u >> 1) ^ -(u & 1)
        filled += n
    return out


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), n=order) if order else x.astype(np.int64)


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-``order`` difference given the warmup
    samples: successive integrations, each seeded by the last value of
    the next-lower-order difference of the warmup."""
    if order == 0:
        return res.copy()
    levels = [np.asarray(warm, dtype=np.int64)]
    for _ in range(order):
        levels.append(np.diff(levels[-1]))
    cur = res.astype(np.int64)
    for k in range(order, 0, -1):
        cur = levels[k - 1][-1] + np.cumsum(cur)
    return np.concatenate([levels[0], cur])


def _restore_lpc(
    warm: np.ndarray, res: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    """x[i] = ((sum_j c[j] * x[i-1-j]) >> shift) + res[i-order] — the
    spec's integer arithmetic verbatim; sequential by definition."""
    order = len(coefs)
    out = np.empty(order + res.size, dtype=np.int64)
    out[:order] = warm
    xs = out  # local alias; plain-int loop below
    for i in range(order, out.size):
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * int(xs[i - 1 - j])
        out[i] = (acc >> shift) + int(res[i - order])
    return out


# ---------------------------------------------------------------------------
# subframes
# ---------------------------------------------------------------------------


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    """Best-of CONSTANT / FIXED(0-4) / VERBATIM for one channel of one
    block (encoder always writes zero wasted bits)."""
    n = x.size
    if n and (x == x[0]).all():
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write_signed(int(x[0]), bps)
        return
    best_order, best_bits = None, n * bps  # verbatim baseline
    for order in range(0, min(5, n)):
        res = _fixed_residual(x, order)
        _, bits = _best_rice_param(_zigzag(res))
        bits += order * bps + 6  # warmup + residual header
        if bits < best_bits:
            best_order, best_bits = order, bits
    if best_order is None:
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        for v in x.tolist():
            w.write_signed(int(v), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | best_order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:best_order].tolist():
        w.write_signed(int(v), bps)
    _write_residual(w, _fixed_residual(x, best_order))


def _decode_subframe(rd: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    kind = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
        bps -= wasted
    if kind == 0b000000:  # CONSTANT
        out = np.full(blocksize, rd.read_signed(bps), dtype=np.int64)
    elif kind == 0b000001:  # VERBATIM
        out = np.fromiter(
            (rd.read_signed(bps) for _ in range(blocksize)),
            dtype=np.int64,
            count=blocksize,
        )
    elif 0b001000 <= kind <= 0b001100:  # FIXED
        order = kind & 0b000111
        warm = np.fromiter(
            (rd.read_signed(bps) for _ in range(order)),
            dtype=np.int64,
            count=order,
        )
        res = _read_residual(rd, blocksize, order)
        out = _restore_fixed(warm, res, order)
    elif kind & 0b100000:  # LPC
        order = (kind & 0b011111) + 1
        warm = np.fromiter(
            (rd.read_signed(bps) for _ in range(order)),
            dtype=np.int64,
            count=order,
        )
        prec = rd.read(4)
        if prec == 0b1111:
            raise ValueError("FLAC: invalid LPC precision code")
        prec += 1
        shift = rd.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [rd.read_signed(prec) for _ in range(order)]
        res = _read_residual(rd, blocksize, order)
        out = _restore_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {kind:#08b}")
    return out << wasted if wasted else out


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def _encode_frame(
    samples: np.ndarray, frame_no: int, sample_rate: int, bps: int
) -> bytes:
    """One frame, independent channels, fixed-blocksize strategy."""
    blocksize, n_ch = samples.shape
    w = _BitWriter()
    w.write(_SYNC, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed-blocksize strategy
    bs_code = _BLOCKSIZE_CODES.get(blocksize, 0b0111)
    w.write(bs_code, 4)
    w.write(0b0000, 4)  # sample rate: from STREAMINFO
    w.write(n_ch - 1, 4)  # independent channels
    w.write(_SAMPLE_SIZE_CODES[bps], 3)
    w.write(0, 1)  # reserved
    for b in _utf8_coded(frame_no):
        w.write(b, 8)
    if bs_code == 0b0111:
        w.write(blocksize - 1, 16)
    w.write(crc8(bytes(w.buf)), 8)
    for ch in range(n_ch):
        _encode_subframe(w, samples[:, ch].astype(np.int64), bps)
    w.align()
    w.write(crc16(bytes(w.buf)), 16)
    return w.getvalue()


def _decode_frame(
    rd: _BitReader, info: dict
) -> np.ndarray:
    """One frame starting at rd's (byte-aligned) position ->
    (blocksize, channels) int64."""
    start = rd.byte_pos()
    if rd.read(14) != _SYNC:
        raise ValueError("FLAC: lost frame sync")
    if rd.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    rd.read(1)  # blocking strategy (number semantics only)
    bs_code = rd.read(4)
    sr_code = rd.read(4)
    ch_code = rd.read(4)
    ss_code = rd.read(3)
    if rd.read(1):
        raise ValueError("FLAC: reserved frame-header bit set")
    _read_utf8_coded(rd)  # frame/sample number
    if bs_code == 0b0000:
        raise ValueError("FLAC: reserved block size code")
    elif bs_code == 0b0110:
        blocksize = rd.read(8) + 1
    elif bs_code == 0b0111:
        blocksize = rd.read(16) + 1
    else:
        blocksize = next(
            bs for bs, code in _BLOCKSIZE_CODES.items() if code == bs_code
        )
    if sr_code == 0b0000:
        pass  # from STREAMINFO
    elif sr_code in _SAMPLE_RATES:
        pass  # informational; STREAMINFO remains authoritative
    elif sr_code == 0b1100:
        rd.read(8)
    elif sr_code in (0b1101, 0b1110):
        rd.read(16)
    else:
        raise ValueError("FLAC: invalid sample rate code")
    if ss_code == 0b000:
        bps = info["bps"]
    elif ss_code in _SAMPLE_SIZES:
        bps = _SAMPLE_SIZES[ss_code]
    else:
        raise ValueError("FLAC: reserved sample size code")
    # CRC-8 covers the header bytes up to (not including) the CRC byte
    rd.align()
    header_end = rd.byte_pos()
    expect8 = crc8(rd.data[start:header_end])
    if rd.read(8) != expect8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if ch_code <= 0b0111:
        n_ch, mode = ch_code + 1, "indep"
    elif ch_code == 0b1000:
        n_ch, mode = 2, "left_side"
    elif ch_code == 0b1001:
        n_ch, mode = 2, "right_side"
    elif ch_code == 0b1010:
        n_ch, mode = 2, "mid_side"
    else:
        raise ValueError(f"FLAC: reserved channel assignment {ch_code:#06b}")

    chans = []
    for ch in range(n_ch):
        ch_bps = bps
        if (mode in ("left_side", "mid_side") and ch == 1) or (
            mode == "right_side" and ch == 0
        ):
            ch_bps += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(rd, blocksize, ch_bps))
    rd.align()
    body_end = rd.byte_pos()
    expect16 = crc16(rd.data[start:body_end])
    if rd.read(16) != expect16:
        raise ValueError("FLAC: frame CRC-16 mismatch")

    if mode == "indep":
        out = np.stack(chans, axis=1)
    elif mode == "left_side":
        left, side = chans
        out = np.stack([left, left - side], axis=1)
    elif mode == "right_side":
        side, right = chans
        out = np.stack([side + right, right], axis=1)
    else:  # mid_side
        mid, side = chans
        mid = (mid << 1) | (side & 1)
        out = np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
    return out


# ---------------------------------------------------------------------------
# stream level
# ---------------------------------------------------------------------------


def _md5_of_samples(samples: np.ndarray, bps: int) -> bytes:
    """STREAMINFO MD5: interleaved samples, little-endian,
    bps/8 bytes each (16-bit subset here)."""
    assert bps == 16
    return hashlib.md5(
        np.ascontiguousarray(samples, dtype="<i2").tobytes()
    ).digest()


def encode_flac(
    samples: np.ndarray, sample_rate: int = 16_000, block_size: int = 4096
) -> bytes:
    """Encode int16 mono ``(N,)`` / ``(N,1)`` or stereo ``(N,2)``
    samples as a FLAC stream (independent channels, fixed block
    size). Decodes bit-exactly with :func:`decode_flac` and with any
    conformant decoder."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported sample shape {samples.shape}")
    if s.size == 0:
        raise ValueError("cannot encode empty audio")
    if s.min() < -32768 or s.max() > 32767:
        raise ValueError("samples exceed int16 range")
    n, n_ch = s.shape
    bps = 16

    frames = bytearray()
    for frame_no, start in enumerate(range(0, n, block_size)):
        frames += _encode_frame(
            s[start : start + block_size], frame_no, sample_rate, bps
        )

    # STREAMINFO: the last block may be short, which by spec is
    # excluded from "minimum block size"
    min_bs = block_size if n >= block_size else n
    info = _BitWriter()
    info.write(min_bs, 16)
    info.write(block_size, 16)
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(sample_rate, 20)
    info.write(n_ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    body = info.getvalue() + _md5_of_samples(s.astype(np.int16), bps)
    assert len(body) == 34
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:]
    return header + body + bytes(frames)


def decode_flac(buf: bytes, verify_md5: bool = True) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> ``((N, channels) int32 array, rate)``.
    CRC-8/CRC-16 are always enforced; the STREAMINFO MD5 is checked
    when present (nonzero) unless ``verify_md5=False``."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info: dict | None = None
    while True:
        if pos + 4 > len(buf):
            raise ValueError("FLAC: truncated metadata")
        head = buf[pos]
        length = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + length]
        if head & 0x7F == 0:  # STREAMINFO
            if length != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            rd = _BitReader(body)
            rd.read(16)  # min block size
            rd.read(16)  # max block size
            rd.read(24)
            rd.read(24)
            info = {
                "rate": rd.read(20),
                "channels": rd.read(3) + 1,
                "bps": rd.read(5) + 1,
                "total": rd.read(36),
                "md5": body[18:34],
            }
        pos += 4 + length
        if head & 0x80:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")

    rd = _BitReader(buf, pos_bytes=pos)
    blocks = []
    total = 0
    while rd.pos < len(buf) * 8 and (
        info["total"] == 0 or total < info["total"]
    ):
        frame = _decode_frame(rd, info)
        blocks.append(frame)
        total += frame.shape[0]
    out = (
        np.concatenate(blocks, axis=0)
        if blocks
        else np.empty((0, info["channels"]), dtype=np.int64)
    )
    if info["total"]:
        out = out[: info["total"]]
    if out.shape[1] != info["channels"]:
        raise ValueError("FLAC: frame channel count != STREAMINFO")
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if out.size and (out.min() < lo or out.max() > hi):
        raise ValueError("FLAC: decoded sample exceeds declared bit depth")
    if (
        verify_md5
        and info["bps"] == 16
        and info["md5"] != b"\x00" * 16
        and _md5_of_samples(out.astype(np.int16), 16) != info["md5"]
    ):
        raise ValueError("FLAC: stream MD5 mismatch")
    return out.astype(np.int32), info["rate"]
