"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

Implements the baseline sequential DCT process from the public JPEG
specification — no codec library:

- ``encode_jpeg``: JFIF byte stream for 8-bit grayscale / RGB arrays.
  BT.601 RGB->YCbCr, 4:4:4 sampling, Annex-K luminance/chrominance
  quantization tables with the libjpeg quality scaling curve, 8x8
  forward DCT (orthonormal matrix form, batched with einsum),
  zigzag + DC-prediction + run-length coding, canonical Huffman
  tables SHIPPED IN THE STREAM (fixed-length canonical codes: 4-bit
  DC categories, 8-bit AC run/size symbols — valid per T.81 since the
  decoder builds its tables from DHT, and no code is all-ones).
- ``decode_jpeg``: full baseline decoder — marker parse (DQT/DHT/
  SOF0/SOF1/DRI/SOS, APPn/COM skipped), byte-unstuffed bit reader,
  canonical Huffman decode, EXTEND sign recovery, dequant, inverse
  zigzag, batched IDCT, restart-marker handling with DC-predictor
  reset, general h/v sampling factors with integer-replication
  chroma upsampling (so 4:2:0 / 4:2:2 streams from OTHER encoders
  decode too), BT.601 YCbCr->RGB. Progressive (SOF2), arithmetic
  coding, 12-bit precision and hierarchical modes raise loudly.

JPEG is lossy: tests pin exactness where the math is exact (flat
blocks are DC-only and reconstruct bit-exact at quality 100) and
PSNR elsewhere, and cross-check the decoder IDCT against a
spec-literal double-sum IDCT written independently in the test.

The per-block entropy coding loops are plain Python — fine at
fixture scale; production swaps this module for libjpeg-turbo via
the same ``decode_image`` dispatch in ``multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag if s % 2 else diag[::-1])
    return np.array([r * 8 + c for r, c in order])


_ZZ = _zigzag()  # zigzag position k -> row-major block index
_UNZZ = np.argsort(_ZZ)  # row-major block index -> zigzag position

# Annex K.1 luminance / K.2 chrominance quantization tables
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 = Annex K verbatim, 100 = all-ones."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


# Orthonormal 8-point DCT-II matrix: F = T @ block @ T.T
_T = np.array(
    [
        [
            0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Fixed-length canonical Huffman tables (shipped via DHT, so any
# compliant decoder accepts them): 12 DC categories at 4 bits, the
# 162 AC run/size symbols at 8 bits. No code is all-ones.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code assignment: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


# ---------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-pad a component plane to 8x8 multiples, return (n, 8, 8)
    blocks in raster MCU order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    return (
        p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8),
        bh,
        bw,
    )


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """Encode an (H, W) or (H, W, 1|3) uint8 array as baseline JFIF
    JPEG (4:4:4, tables in-stream). Alpha channels raise: JPEG has no
    alpha — strip it upstream if intended."""
    a = np.ascontiguousarray(arr, dtype=np.uint8).astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(
            f"JPEG supports 1 or 3 channels, got shape {arr.shape}"
        )
    h, w, nc = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = (
        [a[:, :, 0]] if nc == 1 else list(np.moveaxis(_rgb_to_ycbcr(a), -1, 0))
    )
    ql, qc = _scaled_q(_QL, quality), _scaled_q(_QC, quality)
    qtabs = [ql] + ([qc, qc] if nc == 3 else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (  # JFIF APP0
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tid, q in enumerate([ql] + ([qc] if nc == 3 else [])):
        out += (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(q[i]) for i in _ZZ)  # stored in zigzag order
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if nc == 3:
        out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    # Quantized zigzag coefficients, all components (batched DCT)
    comp_coefs = []
    nblocks = None
    for ci, plane in enumerate(planes):
        blocks, bh, bw = _blocks(plane - 128.0)
        f = np.einsum("ua,nab,vb->nuv", _T, blocks, _T)
        q = np.round(f / qtabs[ci].reshape(8, 8)).astype(np.int64)
        zz = q.reshape(-1, 64)[:, _ZZ]
        comp_coefs.append(zz)
        nblocks = len(zz)

    bw_ = _BitWriter()
    pred = [0] * nc
    for b in range(nblocks):  # 4:4:4 -> MCU raster = block raster
        for ci in range(nc):
            zz = comp_coefs[ci][b]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size = _category(diff)
            code, ln = _DC_ENC[size]
            bw_.write(code, ln)
            bw_.write(_mag_bits(diff, size), size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bw_.write(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = _AC_ENC[(run << 4) | size]
                bw_.write(code, ln)
                bw_.write(_mag_bits(v, size), size)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw_.write(code, ln)
    bw_.flush()
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.cur = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise ValueError("truncated JPEG entropy data")
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                if self.p >= len(self.d):
                    raise ValueError("truncated JPEG entropy data")
                nxt = self.d[self.p]
                if nxt == 0x00:
                    self.p += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    )
            self.cur = b
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        self.n = 0
        if (
            self.p + 1 >= len(self.d)
            or self.d[self.p] != 0xFF
            or self.d[self.p + 1] != 0xD0 + (idx & 7)
        ):
            raise ValueError(f"expected RST{idx & 7} marker")
        self.p += 2


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG decode -> (H, W, C) uint8 (C = 1 or 3).

    Accepts baseline (SOF0) and extended-sequential-Huffman 8-bit
    (SOF1) frames with arbitrary integer sampling factors and restart
    intervals. Progressive / arithmetic / 12-bit / hierarchical raise
    loudly — parse, don't guess."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        m = buf[pos + 1]
        if m == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        body = buf[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i : i + 64], np.uint8).astype(
                        np.int64
                    )
                    i += 64
                else:
                    vals = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.int64)
                    i += 128
                qt[tq] = vals  # zigzag order, as stored
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_decode(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (fh, fw, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF{m - 0xC0}")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tdta >> 4, tdta & 15))
            return _decode_scan(
                buf, pos + 2 + seglen, frame, scan, qt, huff, restart
            )
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(buf, pos, frame, scan, qt, huff, restart):
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise ValueError("partial-scan JPEG not supported (baseline only)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    byid = {c[0]: c for c in comps}
    plan = []  # (hi, vi, qtab, dc_table, ac_table, coef array)
    for cs, td, ta in scan:
        cid, hi, vi, tq = byid[cs]
        if tq not in qt or (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG scan references missing table")
        coefs = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
        plan.append((hi, vi, qt[tq], huff[(0, td)], huff[(1, ta)], coefs))

    br = _BitReader(buf, pos)
    pred = [0] * len(plan)
    rst_idx = 0
    for mi in range(mcux * mcuy):
        if restart and mi and mi % restart == 0:
            br.align_and_expect_rst(rst_idx)
            rst_idx += 1
            pred = [0] * len(plan)
        my, mx = divmod(mi, mcux)
        for ci, (hi, vi, _q, dct, act, coefs) in enumerate(plan):
            for by in range(vi):
                for bx in range(hi):
                    zz = coefs[my * vi + by, mx * hi + bx]
                    size = _huff_decode(br, dct)
                    pred[ci] += _extend(br.read_bits(size), size)
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, act)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(br.read_bits(sz), sz)
                        k += 1

    planes = []
    for hi, vi, q, _dct, _act, coefs in plan:
        deq = (coefs * q)[:, :, _UNZZ].reshape(
            coefs.shape[0], coefs.shape[1], 8, 8
        )
        px = np.einsum("au,yxab,bv->yxuv", _T, deq.astype(np.float64), _T)
        bh, bw_ = deq.shape[0], deq.shape[1]
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8) + 128.0
        ry, rx = vmax // vi, hmax // hi
        if ry * vi != vmax or rx * hi != hmax:
            raise ValueError("non-integer JPEG sampling ratio")
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
