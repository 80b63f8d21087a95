"""MPEG-1 Video (ISO/IEC 11172-2) subset codec, pure numpy + stdlib —
the MOTION-COMPENSATED member of the video tier (the one capability
GIF / MJPEG / MS-RLE8 in this repo do not cover: true inter-frame
prediction with motion vectors and DCT-coded residuals).

Encoder (I + P pictures, 4:2:0):

- GOP structure ``I P P P ...`` (``gop`` frames per I);
- full-pel exhaustive motion search (±``search`` pels, SAD on luma),
  closed-loop: P frames predict from the encoder's own *decoded*
  reconstruction, so encoder/decoder never drift;
- per-macroblock mode decision: skip / MC-not-coded / MC-coded /
  no-MC-coded / intra, with differential motion-vector coding and
  the spec's predictor reset rules (slice start, intra, skip);
- DCT residual quantization: intra via the default intra quantiser
  matrix (sequence header loads none ⇒ spec default), non-intra via
  the flat 16 matrix; mismatch-control oddification on dequant;
- one slice per picture (legal in MPEG-1), fixed quantiser_scale.

Decoder: sequence / GOP / picture / slice headers, I and P pictures,
skipped macroblocks, motion compensation, IDCT reconstruction,
chroma vectors = luma//2 (toward zero). The slice is parsed by
macroblock COUNT (known from the sequence dimensions), so start-code
emulation inside VLC data is irrelevant to framing.

Subset + provenance notes (honest scope):

- B pictures, half-pel vectors (``full_pel_forward_vector`` is set),
  ``forward_f_code`` > 1, custom quantiser matrices and multi-slice
  pictures are not implemented (loud errors where reachable).
- VLC tables (Annex B: macroblock address increment B.1, macroblock
  type B.2, coded block pattern B.3, motion code B.4, DC size B.5a/b,
  AC run/level B.5c) are transcribed from the published standard from
  memory; encoder and decoder share one transcription, so round-trips
  are exact regardless, and any transcription slip would only affect
  interop with external tools (none exist in this container to test
  against). AC pairs outside the transcribed table use ESCAPE coding
  (run + signed level), which the standard always permits.
- Like the JPEG/FLAC/GIF/RLE8 tiers, this serves the training-data
  pipeline (frame sampling / features over video columns at corpus
  scale); the reference engine treats media as opaque blobs.
"""

from __future__ import annotations

import numpy as np

from icicle_spark.operators.jpeg import _T, _ZZ

# ---------------------------------------------------------------- tables

_SEQ_START = b"\x00\x00\x01\xb3"
_GOP_START = 0xB8
_PIC_START = 0x00
_SEQ_END = 0xB7

_PICTURE_RATES = {
    1: 23.976, 2: 24.0, 3: 25.0, 4: 29.97,
    5: 30.0, 6: 50.0, 7: 59.94, 8: 60.0,
}

# default intra quantiser matrix (11172-2 §2.4.3.2), row-major
_DEF_INTRA_Q = np.array([
    [8, 16, 19, 22, 26, 27, 29, 34],
    [16, 16, 22, 24, 27, 29, 34, 37],
    [19, 22, 26, 27, 29, 34, 34, 38],
    [22, 22, 26, 27, 29, 34, 37, 40],
    [22, 26, 27, 29, 32, 35, 40, 48],
    [26, 27, 29, 32, 35, 40, 48, 58],
    [26, 27, 29, 34, 38, 46, 56, 69],
    [27, 29, 35, 38, 46, 56, 69, 83],
], dtype=np.int64)
_FLAT_Q = np.full((8, 8), 16, dtype=np.int64)

# B.1 macroblock_address_increment (1..33 + escape adds 33)
_MBA_CODES = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000", 26: "00000011111", 27: "00000011110",
    28: "00000011101", 29: "00000011100", 30: "00000011011",
    31: "00000011010", 32: "00000011001", 33: "00000011000",
}
_MBA_ESCAPE = "00000001000"  # adds 33, then another increment follows
_MBA_STUFFING = "00000001111"  # discarded by decoders

# B.2 macroblock_type. Flags: (quant, motion_forward, pattern, intra)
_MBTYPE_I = {"1": (0, 0, 0, 1), "01": (1, 0, 0, 1)}
_MBTYPE_P = {
    "1": (0, 1, 1, 0),       # MC, coded
    "01": (0, 0, 1, 0),      # no MC, coded
    "001": (0, 1, 0, 0),     # MC, not coded
    "00011": (0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 0),   # MC, coded, quant
    "00001": (1, 0, 1, 0),   # no MC, coded, quant
    "000001": (1, 0, 0, 1),  # intra, quant
}

# B.4 motion_code (-16..16); positive code ends 0, negative ends 1
_MV_CODES = {0: "1"}
for _m, _base in enumerate([
    "01", "001", "0001", "000011", "0000101", "0000100",
    "0000011", "000001011", "000001010", "000001001",
    "0000010001", "0000010000", "0000001111", "0000001110",
    "0000001101", "0000001100",
], start=1):
    _MV_CODES[_m] = _base + "0"
    _MV_CODES[-_m] = _base + "1"

# B.3 coded_block_pattern (cbp 1..63; 0 is not transmissible)
_CBP_CODES = {
    60: "111", 4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101",
    59: "000000100", 27: "000000011", 39: "000000010",
}

# B.5a/b dct_dc_size
_DC_LUM = {
    0: "100", 1: "00", 2: "01", 3: "101", 4: "110",
    5: "1110", 6: "11110", 7: "111110", 8: "1111110",
}
_DC_CHR = {
    0: "00", 1: "01", 2: "10", 3: "110", 4: "1110",
    5: "11110", 6: "111110", 7: "1111110", 8: "11111110",
}

# B.5c dct_coeff run/level (code WITHOUT the trailing sign bit).
# (0,1) is positional: '1' as the first coefficient of a non-intra
# block, '11' elsewhere (where '1 x' would collide with EOB '10').
_EOB = "10"
_ESCAPE = "000001"
_AC_CODES = {
    (0, 1): "11", (1, 1): "011", (0, 2): "0100", (2, 1): "0101",
    (0, 3): "00101", (3, 1): "00111", (4, 1): "00110",
    (1, 2): "000110", (5, 1): "000111", (6, 1): "000101",
    (7, 1): "000100",
    (0, 4): "0000110", (2, 2): "0000100", (8, 1): "0000111",
    (9, 1): "0000101",
    (0, 5): "00100110", (0, 6): "00100001", (1, 3): "00100101",
    (3, 2): "00100100", (10, 1): "00100111", (11, 1): "00100011",
    (12, 1): "00100010", (13, 1): "00100000",
}

_ZZ_ORDER = _ZZ  # zigzag position k -> row-major index (shared w/ JPEG)


def _prefix_decoder(codes: dict) -> dict:
    """code-string -> symbol map, validated prefix-free."""
    m = {}
    for sym, code in codes.items():
        m[code] = sym
    for a in m:
        for b in m:
            if a != b and b.startswith(a):
                raise AssertionError(f"not prefix-free: {a} / {b}")
    return m


_MBA_DEC = _prefix_decoder(
    {**_MBA_CODES, "escape": _MBA_ESCAPE, "stuffing": _MBA_STUFFING}
)
_MV_DEC = _prefix_decoder(_MV_CODES)
_CBP_DEC = _prefix_decoder(_CBP_CODES)
_DC_LUM_DEC = _prefix_decoder(_DC_LUM)
_DC_CHR_DEC = _prefix_decoder(_DC_CHR)
_MBTYPE_I_DEC = dict(_MBTYPE_I)
_MBTYPE_P_DEC = dict(_MBTYPE_P)
# AC decode map: code -> (run, level) plus EOB / ESCAPE sentinels
_AC_DEC = {v: k for k, v in _AC_CODES.items()}
_AC_DEC[_EOB] = "eob"
_AC_DEC[_ESCAPE] = "escape"


# ------------------------------------------------------------- bit I/O


class _BW:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val: int, count: int) -> None:
        if count:
            self.acc = (self.acc << count) | (val & ((1 << count) - 1))
            self.n += count
            while self.n >= 8:
                self.n -= 8
                self.buf.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def code(self, s: str) -> None:
        for c in s:
            self.bits(1 if c == "1" else 0, 1)

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.byte = pos
        self.bit = 0

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            if self.byte >= len(self.buf):
                raise ValueError("mpeg1: bitstream truncated")
            v = (v << 1) | ((self.buf[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def vlc(self, table: dict, what: str, max_len: int = 17):
        code = ""
        for _ in range(max_len):
            code += "1" if self.bits(1) else "0"
            if code in table:
                return table[code]
        raise ValueError(f"mpeg1: bad {what} VLC near byte {self.byte}")

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# --------------------------------------------------------- DCT + quant


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block.astype(np.float64) @ _T.T


def _idct(coefs: np.ndarray) -> np.ndarray:
    return _T.T @ coefs.astype(np.float64) @ _T


def _oddify(rec: np.ndarray) -> np.ndarray:
    """Mismatch control (§2.4.4.2): force odd reconstruction levels."""
    even = (rec != 0) & (rec % 2 == 0)
    return rec - even * np.sign(rec)


def _quant_intra(coefs: np.ndarray, qscale: int) -> np.ndarray:
    lv = np.round(8.0 * coefs / (_DEF_INTRA_Q * qscale)).astype(np.int64)
    return np.clip(lv, -255, 255)


def _dequant_intra(levels: np.ndarray, qscale: int) -> np.ndarray:
    rec = (levels * _DEF_INTRA_Q * qscale) // 8
    return np.clip(_oddify(rec), -2048, 2047)


def _quant_inter(coefs: np.ndarray, qscale: int) -> np.ndarray:
    # dead-zone quantizer inverse to _dequant_inter
    lv = np.trunc(16.0 * coefs / (2.0 * _FLAT_Q * qscale)).astype(np.int64)
    return np.clip(lv, -255, 255)


def _dequant_inter(levels: np.ndarray, qscale: int) -> np.ndarray:
    rec = ((2 * levels + np.sign(levels)) * _FLAT_Q * qscale) // 16
    return np.clip(_oddify(rec), -2048, 2047)


# -------------------------------------------------------- colour/plane


def _rgb_to_yuv420(frame: np.ndarray):
    f = frame.astype(np.float64)
    if f.ndim == 2:
        y = f
        cb = np.full(((f.shape[0] + 1) // 2, (f.shape[1] + 1) // 2), 128.0)
        return y, cb, cb.copy()
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # 2x2 box-average subsample (pad odd dims by edge replication)
    def sub(p):
        h, w = p.shape
        p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
        return (p[0::2, 0::2] + p[0::2, 1::2]
                + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
    return y, sub(cb), sub(cr)


def _yuv420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    h, w = y.shape
    cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1)[:h, :w].astype(np.float64)
    crf = np.repeat(np.repeat(cr, 2, 0), 2, 1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64)
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(
        np.uint8
    )


def _pad16(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(
        p, ((0, (-h) % mult), (0, (-w) % mult)), mode="edge"
    )


# ------------------------------------------------------------ encoder


def _dc_size_bits(diff: int) -> tuple[int, int]:
    size = int(abs(diff)).bit_length()
    if diff >= 0:
        return size, diff
    return size, diff + (1 << size) - 1


def _emit_coeffs(bw: _BW, zz: np.ndarray, first_index: int,
                 first_may_use_short: bool) -> None:
    """Run/level-code zz[first_index:] then EOB."""
    run = 0
    first = first_may_use_short
    for k in range(first_index, 64):
        lv = int(zz[k])
        if lv == 0:
            run += 1
            continue
        s = 0 if lv > 0 else 1
        a = abs(lv)
        if first and run == 0 and a == 1:
            bw.code("1")
            bw.bits(s, 1)
        elif (run, a) in _AC_CODES:
            bw.code(_AC_CODES[(run, a)])
            bw.bits(s, 1)
        else:
            if a > 255:
                raise ValueError("mpeg1: escape level out of range")
            bw.code(_ESCAPE)
            bw.bits(run, 6)
            if a < 128:
                bw.bits(lv & 0xFF, 8)
            else:
                bw.bits(0x80 if lv < 0 else 0x00, 8)
                bw.bits(lv & 0xFF, 8)
        run = 0
        first = False
    bw.code(_EOB)


def _write_intra_block(bw: _BW, levels: np.ndarray, dc_table: dict,
                       dc_pred: int) -> int:
    zz = levels.ravel()[_ZZ_ORDER]
    dc = int(zz[0])
    size, bits = _dc_size_bits(dc - dc_pred)
    bw.code(dc_table[size])
    if size:
        bw.bits(bits, size)
    _emit_coeffs(bw, zz, 1, first_may_use_short=False)
    return dc


def _write_inter_block(bw: _BW, levels: np.ndarray) -> None:
    zz = levels.ravel()[_ZZ_ORDER]
    _emit_coeffs(bw, zz, 0, first_may_use_short=True)


def _mv_diff(bw: _BW, want: int, pred: int) -> int:
    """Write differential full-pel motion component (f_code=1:
    values live in [-16, 15] modulo 32; the ±16 motion codes make
    every wrapped difference representable)."""
    diff = ((want - pred + 16) % 32) - 16
    bw.code(_MV_CODES[diff])
    # decoder recon: wrap(pred + diff) == want for want in [-16, 15]
    return want


def _sad(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a.astype(np.int32) - b.astype(np.int32)).sum())


def _motion_search(cur: np.ndarray, ref: np.ndarray, my: int, mx: int,
                   rng: int) -> tuple[int, int, float]:
    """Exhaustive full-pel search, window clipped to the frame."""
    h, w = ref.shape
    best = (0, 0, _sad(cur, ref[my:my + 16, mx:mx + 16]))
    for dy in range(-rng, rng + 1):
        yy = my + dy
        if yy < 0 or yy + 16 > h:
            continue
        for dx in range(-rng, rng + 1):
            if dy == 0 and dx == 0:
                continue
            xx = mx + dx
            if xx < 0 or xx + 16 > w:
                continue
            s = _sad(cur, ref[yy:yy + 16, xx:xx + 16])
            if s < best[2]:
                best = (dy, dx, s)
    return best


def _mb_blocks(y, cb, cr, my, mx):
    """The six 8x8 blocks of the MB at luma row my, col mx."""
    by, bx = my // 2, mx // 2
    return [
        y[my:my + 8, mx:mx + 8], y[my:my + 8, mx + 8:mx + 16],
        y[my + 8:my + 16, mx:mx + 8], y[my + 8:my + 16, mx + 8:mx + 16],
        cb[by:by + 8, bx:bx + 8], cr[by:by + 8, bx:bx + 8],
    ]


def encode_m1v(
    frames,
    *,
    fps: float = 30.0,
    qscale: int = 8,
    gop: int = 12,
    search: int = 8,
) -> bytes:
    """Encode (H, W[, 3]) uint8 frames as an MPEG-1 video elementary
    stream (I + P pictures, full-pel MC). ``qscale`` 1 (best) .. 31."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if not 1 <= qscale <= 31:
        raise ValueError("qscale must be in 1..31")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    rate_code = min(
        _PICTURE_RATES, key=lambda c: abs(_PICTURE_RATES[c] - fps)
    )

    bw = _BW()
    # sequence header
    bw.buf += _SEQ_START
    bw.bits(w, 12)
    bw.bits(h, 12)
    bw.bits(1, 4)          # pel_aspect_ratio: square-ish
    bw.bits(rate_code, 4)
    bw.bits(0x3FFFF, 18)   # bit_rate: variable
    bw.bits(1, 1)          # marker
    bw.bits(0, 10)         # vbv_buffer_size
    bw.bits(0, 1)          # constrained_parameters_flag
    bw.bits(0, 1)          # load_intra_quantiser_matrix (default)
    bw.bits(0, 1)          # load_non_intra (default flat 16)
    bw.align()
    # GOP header
    bw.buf += b"\x00\x00\x01" + bytes([_GOP_START])
    bw.bits(0, 25)         # time_code
    bw.bits(1, 1)          # closed_gop
    bw.bits(0, 1)          # broken_link
    bw.align()

    ref_y = ref_cb = ref_cr = None
    for idx, frame in enumerate(frames):
        y, cb, cr = _rgb_to_yuv420(frame)
        y, cb, cr = _pad16(y, 16), _pad16(cb, 8), _pad16(cr, 8)
        is_intra = ref_y is None or (gop and idx % gop == 0)
        # closed-loop: _encode_picture returns the reconstruction the
        # decoder will compute, which becomes the next P reference
        ref_y, ref_cb, ref_cr = _encode_picture(
            bw, idx, is_intra, y, cb, cr,
            ref_y, ref_cb, ref_cr, mb_w, mb_h, qscale, search,
        )
    bw.align()
    bw.buf += b"\x00\x00\x01" + bytes([_SEQ_END])
    return bw.bytes()


def _encode_picture(bw, idx, is_intra, y, cb, cr,
                    ref_y, ref_cb, ref_cr, mb_w, mb_h, qscale, search):
    bw.align()
    bw.buf += b"\x00\x00\x01" + bytes([_PIC_START])
    bw.bits(idx & 0x3FF, 10)            # temporal_reference
    bw.bits(1 if is_intra else 2, 3)    # picture_coding_type
    bw.bits(0xFFFF, 16)                 # vbv_delay
    if not is_intra:
        bw.bits(1, 1)                   # full_pel_forward_vector
        bw.bits(1, 3)                   # forward_f_code = 1
    bw.align()
    # one slice covering the picture
    bw.buf += b"\x00\x00\x01\x01"
    bw.bits(qscale, 5)
    bw.bits(0, 1)                       # extra_bit_slice

    rec_y = np.zeros_like(y, dtype=np.float64)
    rec_cb = np.zeros_like(cb, dtype=np.float64)
    rec_cr = np.zeros_like(cr, dtype=np.float64)
    n_mbs = mb_w * mb_h
    dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)        # Y, Cb, Cr
    mv_pred = (0, 0)
    pending_skip = 0

    for mb in range(n_mbs):
        my, mx = (mb // mb_w) * 16, (mb % mb_w) * 16
        cur = _mb_blocks(y, cb, cr, my, mx)

        if is_intra:
            mode = "intra"
            mv = (0, 0)
        else:
            dy, dx, sad = _motion_search(
                y[my:my + 16, mx:mx + 16], ref_y, my, mx, search
            )
            mv = (dy, dx)
            pred_y = ref_y[my + dy:my + dy + 16, mx + dx:mx + dx + 16]
            intra_act = float(
                np.abs(
                    y[my:my + 16, mx:mx + 16]
                    - y[my:my + 16, mx:mx + 16].mean()
                ).sum()
            )
            mode = "intra" if sad > intra_act + 512 else "inter"

        if mode == "intra":
            _flush_mba(bw, pending_skip)
            pending_skip = 0
            bw.code("1" if is_intra else "00011")
            for i, b in enumerate(cur):
                coefs = _fdct(b)
                l = _quant_intra(coefs, qscale)
                # intra DC uses the FIXED step 8 (not matrix*qscale)
                l.ravel()[0] = min(
                    255, max(0, int(round(coefs.ravel()[0] / 8.0)))
                )
                comp = 0 if i < 4 else i - 3
                table = _DC_LUM if comp == 0 else _DC_CHR
                dc_pred[comp] = _write_intra_block(
                    bw, l, table, dc_pred[comp]
                )
                rec = _dequant_intra(l, qscale)
                rec.ravel()[0] = l.ravel()[0] * 8
                _place(rec_y, rec_cb, rec_cr, my, mx, i,
                       np.clip(_idct(rec), 0, 255))
            mv_pred = (0, 0)
            continue

        # inter: build residual against the MC prediction
        dy, dx = mv
        cy, cx = _chroma_mv(dy), _chroma_mv(dx)
        by, bx = my // 2, mx // 2
        pred = [
            ref_y[my + dy:my + dy + 8, mx + dx:mx + dx + 8],
            ref_y[my + dy:my + dy + 8, mx + dx + 8:mx + dx + 16],
            ref_y[my + dy + 8:my + dy + 16, mx + dx:mx + dx + 8],
            ref_y[my + dy + 8:my + dy + 16, mx + dx + 8:mx + dx + 16],
            ref_cb[by + cy:by + cy + 8, bx + cx:bx + cx + 8],
            ref_cr[by + cy:by + cy + 8, bx + cx:bx + cx + 8],
        ]
        lv = [
            _quant_inter(_fdct(c.astype(np.float64) - p), qscale)
            for c, p in zip(cur, pred)
        ]
        cbp = 0
        for i, l in enumerate(lv):
            if np.any(l):
                cbp |= 1 << (5 - i)
        zero_mv = mv == (0, 0)
        first_or_last = mb == 0 or mb == n_mbs - 1

        if cbp == 0 and zero_mv and not first_or_last:
            pending_skip += 1
            # skipped MB: decoder copies co-located, resets MV pred
            for i, p in enumerate(pred):
                _place(rec_y, rec_cb, rec_cr, my, mx, i, p)
            mv_pred = (0, 0)
            dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)
            continue

        _flush_mba(bw, pending_skip)
        pending_skip = 0
        if cbp == 0:
            bw.code("001")              # MC, not coded
            mv_pred = (
                _mv_diff(bw, dy, mv_pred[0]),
                _mv_diff(bw, dx, mv_pred[1]),
            )
        elif zero_mv:
            bw.code("01")               # no MC, coded
            mv_pred = (0, 0)
            bw.code(_CBP_CODES[cbp])
        else:
            bw.code("1")                # MC, coded
            mv_pred = (
                _mv_diff(bw, dy, mv_pred[0]),
                _mv_diff(bw, dx, mv_pred[1]),
            )
            bw.code(_CBP_CODES[cbp])
        for i, (l, p) in enumerate(zip(lv, pred)):
            if cbp & (1 << (5 - i)):
                _write_inter_block(bw, l)
                resid = _idct(_dequant_inter(l, qscale))
            else:
                resid = 0.0
            _place(rec_y, rec_cb, rec_cr, my, mx, i,
                   p.astype(np.float64) + resid)
        dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)

    # trailing skips are not representable: encoder avoided them by
    # forcing the last MB coded; assert the invariant
    if pending_skip:
        raise AssertionError("mpeg1: trailing skipped macroblocks")
    np.clip(rec_y, 0, 255, out=rec_y)
    np.clip(rec_cb, 0, 255, out=rec_cb)
    np.clip(rec_cr, 0, 255, out=rec_cr)
    return rec_y, rec_cb, rec_cr


def _flush_mba(bw: _BW, skipped: int) -> None:
    inc = skipped + 1
    while inc > 33:
        bw.code(_MBA_ESCAPE)
        inc -= 33
    bw.code(_MBA_CODES[inc])


def _chroma_mv(m: int) -> int:
    return m // 2 if m >= 0 else -((-m) // 2)


def _place(rec_y, rec_cb, rec_cr, my, mx, i, block) -> None:
    by, bx = my // 2, mx // 2
    if i == 0:
        rec_y[my:my + 8, mx:mx + 8] = block
    elif i == 1:
        rec_y[my:my + 8, mx + 8:mx + 16] = block
    elif i == 2:
        rec_y[my + 8:my + 16, mx:mx + 8] = block
    elif i == 3:
        rec_y[my + 8:my + 16, mx + 8:mx + 16] = block
    elif i == 4:
        rec_cb[by:by + 8, bx:bx + 8] = block
    else:
        rec_cr[by:by + 8, bx:bx + 8] = block


# ------------------------------------------------------------ decoder


def _read_coeffs(br: _BR, intra: bool) -> np.ndarray:
    """Decode one block's run/level stream into row-major levels."""
    zz = np.zeros(64, dtype=np.int64)
    k = 0 if intra else -1  # next write position - 1
    first = not intra
    while True:
        if first:
            # '1' = (0,1); cannot be EOB on the first coefficient
            b = br.bits(1)
            if b:
                s = br.bits(1)
                zz[0] = -1 if s else 1
                k = 0
                first = False
                continue
            code = "0"
        else:
            code = ""
        sym = None
        for _ in range(17):
            if code in _AC_DEC:
                sym = _AC_DEC[code]
                break
            code += "1" if br.bits(1) else "0"
        if sym is None:
            raise ValueError("mpeg1: bad dct_coeff VLC")
        if sym == "eob":
            break
        if sym == "escape":
            run = br.bits(6)
            v = br.bits(8)
            if v == 0x00:
                level = br.bits(8)
            elif v == 0x80:
                level = br.bits(8) - 256
            else:
                level = v - 256 if v & 0x80 else v
        else:
            run, a = sym
            level = -a if br.bits(1) else a
        k += run + 1
        if k > 63:
            raise ValueError("mpeg1: coefficient run past block end")
        zz[k] = level
        first = False
    out = np.zeros(64, dtype=np.int64)
    out[_ZZ_ORDER] = zz
    return out.reshape(8, 8)


def _next_start(buf: bytes, pos: int) -> tuple[int, int]:
    """(code, offset-after-code) of the next start code at/after pos."""
    i = buf.find(b"\x00\x00\x01", pos)
    if i < 0:
        return -1, len(buf)
    return buf[i + 3], i + 4


def decode_m1v(buf: bytes):
    """Decode an MPEG-1 video elementary stream (the subset
    :func:`encode_m1v` writes: I/P, full-pel, one slice/picture).
    Returns ``((N, H, W, 3) uint8, fps)``."""
    if buf[:4] != _SEQ_START:
        raise ValueError("mpeg1: missing sequence header")
    br = _BR(buf, 4)
    w = br.bits(12)
    h = br.bits(12)
    br.bits(4)
    fps = _PICTURE_RATES.get(br.bits(4), 0.0)
    br.bits(18)
    br.bits(1)
    br.bits(10)
    br.bits(1)
    if br.bits(1):
        raise ValueError("mpeg1: custom intra matrix not supported")
    if br.bits(1):
        raise ValueError("mpeg1: custom non-intra matrix not supported")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16

    frames = []
    ref = None
    pos = br.byte + (1 if br.bit else 0)
    while True:
        code, nxt = _next_start(buf, pos)
        if code in (-1, _SEQ_END):
            break
        if code == _PIC_START:
            ref, pos = _decode_picture(buf, nxt, mb_w, mb_h, ref)
            y, cb, cr = ref
            frames.append(_yuv420_to_rgb(y[:h, :w], cb, cr))
        else:
            pos = nxt  # GOP / extensions: skip
    if not frames:
        raise ValueError("mpeg1: no pictures in stream")
    return np.stack(frames), fps


def _decode_picture(buf, pos, mb_w, mb_h, ref):
    br = _BR(buf, pos)
    br.bits(10)                     # temporal_reference
    ptype = br.bits(3)
    br.bits(16)                     # vbv_delay
    if ptype == 2:
        full_pel = br.bits(1)
        f_code = br.bits(3)
        if not full_pel or f_code != 1:
            raise ValueError(
                "mpeg1: only full_pel forward f_code=1 supported"
            )
    elif ptype != 1:
        raise ValueError(f"mpeg1: picture type {ptype} not supported")
    br.align()
    # slice start code
    code, nxt = _next_start(buf, br.byte)
    if not 1 <= code <= 0xAF:
        raise ValueError("mpeg1: expected slice start code")
    br = _BR(buf, nxt)
    qscale = br.bits(5)
    while br.bits(1):               # extra_bit_slice
        br.bits(8)

    if ptype == 2 and ref is None:
        raise ValueError("mpeg1: P picture without a reference frame")
    y = np.zeros((mb_h * 16, mb_w * 16))
    cb = np.full((mb_h * 8, mb_w * 8), 128.0)
    cr = np.full((mb_h * 8, mb_w * 8), 128.0)
    ry, rcb, rcr = ref if ref is not None else (y, cb, cr)
    n_mbs = mb_w * mb_h
    dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)
    mv_pred = [0, 0]
    addr = -1

    while addr < n_mbs - 1:
        inc = 0
        while True:
            sym = br.vlc(_MBA_DEC, "macroblock_address_increment")
            if sym == "stuffing":
                continue
            if sym == "escape":
                inc += 33
                continue
            inc += sym
            break
        if inc > 1 and ptype == 1:
            raise ValueError("mpeg1: skipped macroblock in I picture")
        # skipped MBs: copy co-located from reference
        for _ in range(inc - 1):
            addr += 1
            my, mx = (addr // mb_w) * 16, (addr % mb_w) * 16
            by, bx = my // 2, mx // 2
            y[my:my + 16, mx:mx + 16] = ry[my:my + 16, mx:mx + 16]
            cb[by:by + 8, bx:bx + 8] = rcb[by:by + 8, bx:bx + 8]
            cr[by:by + 8, bx:bx + 8] = rcr[by:by + 8, bx:bx + 8]
        if inc > 1:
            mv_pred = [0, 0]
            dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)
        addr += 1
        my, mx = (addr // mb_w) * 16, (addr % mb_w) * 16
        by, bx = my // 2, mx // 2

        table = _MBTYPE_I_DEC if ptype == 1 else _MBTYPE_P_DEC
        quant, motion_f, pattern, intra = br.vlc(
            table, "macroblock_type", max_len=6
        )
        if quant:
            qscale = br.bits(5)

        if intra:
            mv_pred = [0, 0]
            for i in range(6):
                comp = 0 if i < 4 else i - 3
                dct = _DC_LUM_DEC if comp == 0 else _DC_CHR_DEC
                size = br.vlc(dct, "dct_dc_size", max_len=8)
                if size:
                    bits = br.bits(size)
                    if bits < (1 << (size - 1)):
                        diff = bits - (1 << size) + 1
                    else:
                        diff = bits
                else:
                    diff = 0
                dc_pred[comp] += diff
                lv = _read_coeffs(br, intra=True)
                rec = _dequant_intra(lv, qscale)
                rec.ravel()[0] = dc_pred[comp] * 8  # DC step is 8
                _place(y, cb, cr, my, mx, i, np.clip(
                    _idct(rec), 0, 255,
                ))
            continue

        dc_pred = [128, 128, 128]  # quantized units (128*8 = 1024)
        if motion_f:
            for c in range(2):
                m = br.vlc(_MV_DEC, "motion_code", max_len=11)
                rec = mv_pred[c] + m
                mv_pred[c] = ((rec + 16) % 32) - 16
        else:
            mv_pred = [0, 0]
        dy, dx = mv_pred
        cy, cx = _chroma_mv(dy), _chroma_mv(dx)
        pred = [
            ry[my + dy:my + dy + 8, mx + dx:mx + dx + 8],
            ry[my + dy:my + dy + 8, mx + dx + 8:mx + dx + 16],
            ry[my + dy + 8:my + dy + 16, mx + dx:mx + dx + 8],
            ry[my + dy + 8:my + dy + 16, mx + dx + 8:mx + dx + 16],
            rcb[by + cy:by + cy + 8, bx + cx:bx + cx + 8],
            rcr[by + cy:by + cy + 8, bx + cx:bx + cx + 8],
        ]
        cbp = (
            br.vlc(_CBP_DEC, "coded_block_pattern", max_len=9)
            if pattern else 0
        )
        for i in range(6):
            if cbp & (1 << (5 - i)):
                lv = _read_coeffs(br, intra=False)
                resid = _idct(_dequant_inter(lv, qscale))
            else:
                resid = 0.0
            _place(y, cb, cr, my, mx, i, np.clip(
                pred[i].astype(np.float64) + resid, 0, 255,
            ))

    br.align()
    return (y, cb, cr), br.byte
