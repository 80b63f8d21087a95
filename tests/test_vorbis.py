"""Ogg Vorbis codec (`operators/vorbis.py`) — the last
compressed-audio tier, now decoded for real.

Strategy mirrors the other codec tiers: the profile encoder anchors
on the SPECTRUM (Vorbis is lossy, so PCM round-trips cannot), and
the decoder is checked against an INDEPENDENT numpy model of the
spec's synthesis chain (IMDCT line sums + window overlap-add)
written out longhand here — plus primitive-level goldens for the
codeword assignment, the packed float format, and the floor line
renderer."""

from __future__ import annotations

import numpy as np
import pytest

from icicle_spark.operators.vorbis import (
    _HALF,
    _N,
    _ZERO_IDX,
    FLOOR1_INVERSE_DB_TABLE,
    BitReader,
    BitWriter,
    assign_codewords,
    decode_vorbis,
    encode_vorbis_pattern,
    float32_pack,
    float32_unpack,
    ilog,
    is_ogg_vorbis,
    lookup1_values,
)

BOOK_VALUES = np.array([-1.0, -0.5, 0.0, 0.5])


# ------------------------------------------------ independent model

def _window(n: int) -> np.ndarray:
    j = np.arange(n)
    return np.sin(0.5 * np.pi * np.sin((j + 0.5) * np.pi / n) ** 2)


def _imdct_model(spec: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n)
    for j in range(n):
        for k in range(n // 2):
            out[j] += spec[k] * np.cos(
                np.pi / (2 * n) * (2 * j + 1 + n // 2) * (2 * k + 1)
            )
    return out


def _expected(spectra_idx: np.ndarray,
              floor: float = 1.0) -> np.ndarray:
    """Spec synthesis, written independently: per-packet IMDCT of the
    floored spectrum, windowed, right-half(prev) + left-half(cur)."""
    w = _window(_N)
    blocks = [
        _imdct_model(BOOK_VALUES[s] * floor, _N) * w
        for s in spectra_idx
    ]
    chunks = [
        blocks[p][_HALF:] + blocks[p + 1][:_HALF]
        for p in range(len(blocks) - 1)
    ]
    return np.concatenate(chunks) if chunks else np.zeros(0)


# ------------------------------------------------------- primitives

def test_ilog_spec_values():
    # the spec's §9.2.1 examples
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]


def test_float32_pack_unpack_roundtrip():
    for v in (0.0, 1.0, -1.0, 0.5, -0.25, 1.5, -768.0, 2.0 ** -20):
        assert float32_unpack(float32_pack(v)) == v


def test_lookup1_values():
    assert lookup1_values(16, 2) == 4
    assert lookup1_values(9, 2) == 3
    assert lookup1_values(8, 3) == 2
    assert lookup1_values(26, 3) == 2


def test_codeword_assignment_canonical():
    # the spec §3.2.1 worked example shape: lengths 2,4,4,4,4,2,3,3
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    assert codes == [0b00, 0b0100, 0b0101, 0b0110, 0b0111,
                     0b10, 0b110, 0b111]
    # uniform complete tree -> identity codes
    assert assign_codewords([4] * 16) == list(range(16))
    with pytest.raises(ValueError, match="underspecified"):
        assign_codewords([2, 2, 2])  # leaves a free slot
    with pytest.raises(ValueError, match="overspecified"):
        assign_codewords([1, 1, 1])


def test_bit_io_lsb_first_round_trip():
    w = BitWriter()
    vals = [(0x564342, 24), (5, 3), (1, 1), (1023, 10), (0, 7),
            (0xFFFFFFFF, 32)]
    for v, b in vals:
        w.write(v, b)
    r = BitReader(w.getvalue())
    for v, b in vals:
        assert r.read(v.bit_length() and b or b) == v
    # LSB-first byte layout: 0x01 then bit -> 0b1_00000001?
    w2 = BitWriter()
    w2.write(1, 1)
    w2.write(0b11, 2)
    assert w2.getvalue() == bytes([0b00000111])


def test_inverse_db_table_endpoints():
    # spec table endpoints: 1.0649863e-07 .. ~1.0
    assert FLOOR1_INVERSE_DB_TABLE[0] == pytest.approx(
        1.0649863e-07, rel=1e-6
    )
    assert FLOOR1_INVERSE_DB_TABLE[255] == 1.0
    assert np.all(np.diff(FLOOR1_INVERSE_DB_TABLE) > 0)


# ------------------------------------------------- stream round-trip

def test_single_line_matches_closed_form():
    for k0, m, pkts in [(0, 0, 2), (3, 1, 6), (7, 3, 9)]:
        spec = np.full((pkts, _HALF), _ZERO_IDX, np.int64)
        spec[:, k0] = m
        s, rate = decode_vorbis(encode_vorbis_pattern(spec))
        assert rate == 16_000
        assert s.shape == ((pkts - 1) * _HALF,)
        v = BOOK_VALUES[m]
        j = np.arange(_HALF)
        w = _window(_N)
        c = np.cos(
            np.pi / (2 * _N) * (2 * np.arange(_N) + 1 + _HALF)
            * (2 * k0 + 1)
        )
        g = v * (w[_HALF:] * c[_HALF:] + w[:_HALF] * c[:_HALF])
        assert np.abs(s - np.tile(g, pkts - 1)).max() < 1e-12


def test_dense_random_spectra_match_independent_model():
    rng = np.random.RandomState(7)
    spec = rng.randint(0, 4, size=(5, _HALF))
    s, _ = decode_vorbis(encode_vorbis_pattern(spec))
    assert np.abs(s - _expected(spec)).max() < 1e-9


def test_varying_spectra_overlap_add():
    # consecutive packets DIFFER: the lap sums right(prev)+left(cur)
    spec = np.full((3, _HALF), _ZERO_IDX, np.int64)
    spec[0, 1] = 3
    spec[1, 5] = 0
    spec[2, 2] = 1
    s, _ = decode_vorbis(encode_vorbis_pattern(spec))
    assert np.abs(s - _expected(spec)).max() < 1e-12


def test_non_unity_floor_scales_by_db_table():
    spec = np.full((4, _HALF), _ZERO_IDX, np.int64)
    spec[:, 4] = 3
    base, _ = decode_vorbis(encode_vorbis_pattern(spec))
    lo, _ = decode_vorbis(
        encode_vorbis_pattern(spec, floor_y=(200, 200))
    )
    scale = FLOOR1_INVERSE_DB_TABLE[200]
    assert np.abs(lo - base * scale).max() < 1e-12


def test_sloped_floor_renders_integer_line():
    # y0=100, y1=255 over x in [0,32]: check against an independent
    # integer Bresenham with the spec's truncating division
    spec = np.full((2, _HALF), _ZERO_IDX, np.int64)
    spec[:, :] = 3  # constant 0.5 across the whole spectrum
    s, _ = decode_vorbis(
        encode_vorbis_pattern(spec, floor_y=(100, 255))
    )
    dy, adx = 155, 32
    base = dy // adx
    ady = dy - base * adx
    ys, y, err = [100], 100, 0
    for _x in range(1, _HALF):
        err += ady
        if err >= adx:
            err -= adx
            y += base + 1
        else:
            y += base
        ys.append(y)
    curve = FLOOR1_INVERSE_DB_TABLE[np.array(ys)]
    exp = _expected(spec)  # unity-floor model ...
    w = _window(_N)
    blocks = [
        _imdct_model(BOOK_VALUES[sp] * curve, _N) * w for sp in spec
    ]
    exp = blocks[0][_HALF:] + blocks[1][:_HALF]
    assert np.abs(s - exp).max() < 1e-12


def test_empty_and_single_packet_streams():
    spec = np.full((1, _HALF), _ZERO_IDX, np.int64)
    s, _ = decode_vorbis(encode_vorbis_pattern(spec))
    assert s.shape == (0,)  # first packet only primes the lap


def test_is_ogg_vorbis_and_dispatch():
    from icicle_spark.operators.multimodal import decode_audio
    from icicle_spark.operators.ogg import encode_ogg_flac

    spec = np.full((3, _HALF), _ZERO_IDX, np.int64)
    spec[:, 2] = 3
    buf = encode_vorbis_pattern(spec)
    assert is_ogg_vorbis(buf)
    flac = encode_ogg_flac(np.array([100, -100] * 50, np.int16))
    assert not is_ogg_vorbis(flac)
    # decode_audio: float -> int16 PCM quantization
    pcm, rate = decode_audio(buf)
    assert pcm.dtype == np.int16 and rate == 16_000
    f, _ = decode_vorbis(buf)
    assert np.array_equal(
        pcm, np.clip(np.round(f * 32767.0), -32768, 32767)
        .astype(np.int16)
    )


def test_try_real_decode_no_longer_stubs_vorbis():
    from icicle_spark.operators.multimodal import _try_real_decode

    spec = np.full((3, _HALF), _ZERO_IDX, np.int64)
    spec[:, 1] = 0
    out = _try_real_decode(encode_vorbis_pattern(spec))
    assert out.dtype == np.uint8 and out.size == 2 * 2 * _HALF


def test_bad_streams_fail_loud():
    spec = np.full((2, _HALF), _ZERO_IDX, np.int64)
    buf = bytearray(encode_vorbis_pattern(spec))
    with pytest.raises(ValueError):
        decode_vorbis(bytes(buf[:40]))  # truncated container
    with pytest.raises(ValueError, match="multiplicand"):
        encode_vorbis_pattern(np.full((1, _HALF), 9))
    with pytest.raises(ValueError, match="spectra"):
        encode_vorbis_pattern(np.zeros((2, 7), np.int64))


# ------------------------------------------------- spark integration

def test_vorbis_features_spark(spark):
    import pyspark.sql.functions as F

    from icicle_spark.operators.multimodal import (
        attach_pattern_vorbis,
        vorbis_features,
    )

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = vorbis_features(attach_pattern_vorbis(docs)).orderBy(
        "doc_id"
    ).collect()
    assert len(out) == 12
    for r in out:
        i = r["doc_id"]
        pkts = 6 + i % 7
        assert r["n_samples"] == (pkts - 1) * _HALF
        m = (0, 1, 3)[i % 3]
        k0 = i % 8
        j = np.arange(_HALF)
        w = _window(_N)
        c = np.cos(
            np.pi / (2 * _N) * (2 * np.arange(_N) + 1 + _HALF)
            * (2 * k0 + 1)
        )
        g = BOOK_VALUES[m] * (
            w[_HALF:] * c[_HALF:] + w[:_HALF] * c[:_HALF]
        )
        assert r["rms"] == pytest.approx(
            float(np.sqrt(np.mean(g * g))), abs=1e-9
        )
        assert r["peak"] == pytest.approx(
            float(np.abs(g).max()), abs=1e-9
        )


def test_alternate_codebook_codings_decode_identically():
    # ordered and sparse length codings describe the SAME uniform
    # tree as the dense profile header — all three parse paths must
    # yield identical audio
    rng = np.random.RandomState(3)
    spec = rng.randint(0, 4, size=(4, _HALF))
    base, _ = decode_vorbis(encode_vorbis_pattern(spec))
    for coding in ("sparse", "ordered"):
        s, _ = decode_vorbis(
            encode_vorbis_pattern(spec, book1_coding=coding)
        )
        assert np.array_equal(s, base), coding


def test_residue_type2_mono_equals_type1():
    # type 2 interleaves channels into one vector; for mono the
    # interleave is the identity, so the SAME packets decode equal
    rng = np.random.RandomState(4)
    spec = rng.randint(0, 4, size=(5, _HALF))
    base, _ = decode_vorbis(encode_vorbis_pattern(spec))
    s, _ = decode_vorbis(
        encode_vorbis_pattern(spec, residue_type=2)
    )
    assert np.array_equal(s, base)


def test_residue_type0_constant_spectrum():
    # type 0's stride interleave permutes WITHIN a partition; a
    # constant spectrum is permutation-invariant, so the type-1
    # packets decode to the same audio through the type-0 path
    spec = np.full((3, _HALF), 3, np.int64)
    base, _ = decode_vorbis(encode_vorbis_pattern(spec))
    s, _ = decode_vorbis(
        encode_vorbis_pattern(spec, residue_type=0)
    )
    assert np.array_equal(s, base)


def test_truncated_audio_packet_decodes_as_zeros():
    # spec §1.3.2: EOP during AUDIO decode is normal (encoders elide
    # trailing zeros) — the partial packet decodes, the rest of the
    # residue vector stays zero, nothing raises
    from icicle_spark.operators.ogg import ogg_pack, ogg_parse

    spec = np.full((4, _HALF), 3, np.int64)
    full = encode_vorbis_pattern(spec)
    pk = ogg_parse(full)
    packets = [p for p, _ in pk]
    grans = [g for _, g in pk]
    cut = packets[:-1] + [packets[-1][:3]]  # mid-residue truncation
    s_cut, _ = decode_vorbis(ogg_pack(cut, grans))
    s_full, _ = decode_vorbis(full)
    assert s_cut.shape == s_full.shape
    # chunks not involving the truncated packet are untouched
    assert np.array_equal(s_cut[:2 * _HALF], s_full[:2 * _HALF])
    # the last chunk differs (missing residue decodes as zeros) but
    # stays finite and bounded by the full decode's envelope
    assert np.all(np.isfinite(s_cut))
    # EOP before the packet body -> packet lost entirely, still no raise
    lost = packets[:-1] + [b""]
    s_lost, _ = decode_vorbis(ogg_pack(lost, grans))
    assert s_lost.shape == ((len(packets) - 3 - 2) * _HALF,)


def test_final_granule_truncates_tail():
    # real encoders record the true PCM length in the last page's
    # granule; the decoder must cut the synthetic tail to it
    from icicle_spark.operators.ogg import ogg_pack, ogg_parse

    spec = np.full((4, _HALF), 3, np.int64)
    full = encode_vorbis_pattern(spec)
    pk = ogg_parse(full)
    packets = [p for p, _ in pk]
    grans = [g for _, g in pk]
    grans[-1] = grans[-1] - 5  # claim 5 fewer true samples
    s, _ = decode_vorbis(ogg_pack(packets, grans))
    s_full, _ = decode_vorbis(full)
    assert s.shape[0] == s_full.shape[0] - 5
    assert np.array_equal(s, s_full[:-5])


def test_lost_mid_stream_packet_reprimes_lap():
    # a hole in the middle: the packet after the hole must re-prime
    # the lap buffer (emit nothing), never splice onto the pre-hole
    # tail
    from icicle_spark.operators.ogg import ogg_pack, ogg_parse

    spec = np.full((4, _HALF), _ZERO_IDX, np.int64)
    spec[:, 2] = 3
    pk = ogg_parse(encode_vorbis_pattern(spec))
    packets = [p for p, _ in pk]
    grans = [g for _, g in pk]
    packets[4] = b""  # second audio packet lost
    s, _ = decode_vorbis(ogg_pack(packets, grans))
    # pkt0 primes, pkt1 lost (prev reset), pkt2 re-primes, pkt3 emits
    assert s.shape == (_HALF,)
    # the one chunk is a clean lap of two ADJACENT identical blocks —
    # exactly the closed form, no splice artifact
    j = np.arange(_HALF)
    w = _window(_N)
    c = np.cos(np.pi / (2 * _N) * (2 * np.arange(_N) + 1 + _HALF) * 5)
    g = BOOK_VALUES[3] * (w[_HALF:] * c[_HALF:] + w[:_HALF] * c[:_HALF])
    assert np.abs(s - g).max() < 1e-12


def test_eop_during_floor_zeroes_the_block():
    # spec §4.3.2: EOP mid-floor zeroes every channel of the block,
    # which still participates in the overlap-add as silence
    from icicle_spark.operators.ogg import ogg_pack, ogg_parse

    spec = np.full((3, _HALF), _ZERO_IDX, np.int64)
    spec[:, 1] = 3
    pk = ogg_parse(encode_vorbis_pattern(spec))
    packets = [p for p, _ in pk]
    grans = [g for _, g in pk]
    packets[-1] = packets[-1][:1]  # 8 bits: EOP inside the floor
    s, _ = decode_vorbis(ogg_pack(packets, grans))
    s_full, _ = decode_vorbis(encode_vorbis_pattern(spec))
    assert s.shape == s_full.shape
    # first chunk untouched; last chunk = pre-tail + silence
    assert np.array_equal(s[:_HALF], s_full[:_HALF])
    j = np.arange(_HALF)
    w = _window(_N)
    c = np.cos(np.pi / (2 * _N) * (2 * np.arange(_N) + 1 + _HALF) * 3)
    tail_only = BOOK_VALUES[3] * w[_HALF:] * c[_HALF:]
    assert np.abs(s[_HALF:] - tail_only).max() < 1e-12


def _inverse_couple_scalar(M, A):
    # spec §4.3.5 square polar, transcribed independently longhand
    out_m = np.empty_like(M)
    out_a = np.empty_like(A)
    for i in range(len(M)):
        m, a = M[i], A[i]
        if m > 0:
            if a > 0:
                nm, na = m, m - a
            else:
                nm, na = m + a, m
        else:
            if a > 0:
                nm, na = m, m + a
            else:
                nm, na = m - a, m
        out_m[i], out_a[i] = nm, na
    return out_m, out_a


def test_stereo_coupled_stream_matches_independent_model():
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_stereo,
    )

    rng = np.random.RandomState(11)
    mag = rng.randint(0, 4, size=(4, _HALF))
    ang = rng.randint(0, 4, size=(4, _HALF))
    s, rate = decode_vorbis(encode_vorbis_pattern_stereo(mag, ang))
    assert rate == 16_000
    assert s.shape == (3 * _HALF, 2)
    w = _window(_N)
    blocks = []
    for p in range(4):
        m, a = _inverse_couple_scalar(
            BOOK_VALUES[mag[p]], BOOK_VALUES[ang[p]]
        )
        blocks.append((
            _imdct_model(m, _N) * w, _imdct_model(a, _N) * w,
        ))
    for p in range(3):
        chunk_l = blocks[p][0][_HALF:] + blocks[p + 1][0][:_HALF]
        chunk_r = blocks[p][1][_HALF:] + blocks[p + 1][1][:_HALF]
        seg = s[p * _HALF:(p + 1) * _HALF]
        assert np.abs(seg[:, 0] - chunk_l).max() < 1e-9
        assert np.abs(seg[:, 1] - chunk_r).max() < 1e-9


def test_stereo_dispatch_downmixes_to_mono_int16():
    from icicle_spark.operators.multimodal import decode_audio
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_stereo,
    )

    mag = np.full((3, _HALF), _ZERO_IDX, np.int64)
    mag[:, 2] = 3
    ang = np.full((3, _HALF), _ZERO_IDX, np.int64)
    buf = encode_vorbis_pattern_stereo(mag, ang)
    pcm, rate = decode_audio(buf)
    assert pcm.dtype == np.int16 and pcm.ndim == 1
    f, _ = decode_vorbis(buf)
    exp = np.clip(
        np.round(f.mean(axis=1) * 32767.0), -32768, 32767
    ).astype(np.int16)
    assert np.array_equal(pcm, exp)


def _model_window(n, prev_long, next_long, n0):
    # spec §4.3.1 lapping window, written longhand independently
    left_n = n // 2 if prev_long else n0 // 2
    left_start = 0 if prev_long else n // 4 - n0 // 4
    right_n = n // 2 if next_long else n0 // 2
    right_end = n if next_long else 3 * n // 4 + n0 // 4
    right_start = right_end - right_n
    w = np.zeros(n)
    for i in range(left_n):
        w[left_start + i] = np.sin(
            np.pi / 2 * np.sin((i + 0.5) / left_n * np.pi / 2) ** 2
        )
    for i in range(left_start + left_n, right_start):
        w[i] = 1.0
    for i in range(right_n):
        w[right_start + i] = np.sin(
            np.pi / 2 * np.sin(
                (i + 0.5) / right_n * np.pi / 2 + np.pi / 2
            ) ** 2
        )
    return w


def test_window_switching_matches_independent_model():
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_switching,
    )

    rng = np.random.RandomState(5)
    flags = [0, 0, 1, 1, 0, 1, 0]
    spec = rng.randint(0, 4, size=(len(flags), _HALF))
    s, _ = decode_vorbis(encode_vorbis_pattern_switching(spec, flags))
    sizes = [64 if f == 0 else 256 for f in flags]
    blocks = []
    for i, (f, n) in enumerate(zip(flags, sizes)):
        pl = bool(i == 0 or flags[i - 1]) if f else True
        nl = bool(i + 1 >= len(flags) or flags[i + 1]) if f else True
        full = np.zeros(n // 2)
        full[:_HALF] = BOOK_VALUES[spec[i]]
        blocks.append(
            _imdct_model(full, n) * _model_window(n, pl, nl, 64)
        )
    # independent layout, NOT the decoder's pairwise slice
    # arithmetic: consecutive block CENTERS sit n_prev/4 + n_cur/4
    # apart; place every windowed block on one global timeline, sum,
    # and read from the first center to the last — a sign error in
    # the decoder's chunk offset could not also appear here
    centers = [sizes[0] // 2]
    for i in range(1, len(sizes)):
        centers.append(
            centers[-1] + sizes[i - 1] // 4 + sizes[i] // 4
        )
    pad = max(sizes)
    buf = np.zeros(centers[-1] + 2 * pad)
    for i, b in enumerate(blocks):
        start = centers[i] - sizes[i] // 2 + pad
        buf[start:start + sizes[i]] += b
    exp = buf[centers[0] + pad:centers[-1] + pad]
    assert s.shape == exp.shape
    assert np.abs(s - exp).max() < 1e-9


def test_switching_profile_all_short_equals_plain_profile():
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_switching,
    )

    rng = np.random.RandomState(6)
    spec = rng.randint(0, 4, size=(5, _HALF))
    a, _ = decode_vorbis(encode_vorbis_pattern(spec))
    b, _ = decode_vorbis(
        encode_vorbis_pattern_switching(spec, [0] * 5)
    )
    assert np.array_equal(a, b)


def test_long_short_transition_reconstructs_steady_cosine():
    # Princen-Bradley across a size transition: a pure spectral line
    # held constant through short->long->short must stay continuous
    # and finite (no window-geometry seam blowups)
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_switching,
    )

    flags = [0, 1, 1, 0]
    spec = np.full((4, _HALF), _ZERO_IDX, np.int64)
    spec[:, 0] = 3
    s, _ = decode_vorbis(encode_vorbis_pattern_switching(spec, flags))
    assert np.all(np.isfinite(s))
    # hops: 64/4+256/4, 256/4+256/4, 256/4+64/4
    assert s.shape == (80 + 128 + 80,)


def test_invalid_blocksizes_rejected_by_name():
    # spec §4.2.2: blocksize_0 > blocksize_1 (or out of [64, 8192])
    # makes the stream undecodable — rejected at the ident header
    # with a NAMED error, never a raw shape error from the lapper
    from icicle_spark.operators.ogg import ogg_pack
    from icicle_spark.operators.vorbis import (
        _comment_packet,
        _ident_packet,
        _setup_packet,
    )

    packets = [_ident_packet(1, 16_000, exps=(8, 6)),
               _comment_packet(), _setup_packet(two_modes=True)]
    buf = ogg_pack(packets, [0, 0, 0])
    with pytest.raises(ValueError, match="invalid blocksizes"):
        decode_vorbis(buf)


def test_zero_dimension_codebook_rejected():
    # dim is a raw 16-bit header field; 0 would hang lookup1_values
    # and the residue partition loop — rejected by name at parse
    from icicle_spark.operators.vorbis import Codebook

    w = BitWriter()
    w.write(0x564342, 24)
    w.write(0, 16)   # dim 0
    w.write(2, 24)
    with pytest.raises(ValueError, match="zero-dimension"):
        Codebook.parse(BitReader(w.getvalue() + bytes(8)))


def test_zero_packet_streams_encode_and_decode_empty():
    from icicle_spark.operators.vorbis import (
        encode_vorbis_pattern_stereo,
        encode_vorbis_pattern_switching,
    )

    empty = np.empty((0, _HALF), np.int64)
    for buf in (
        encode_vorbis_pattern(empty),
        encode_vorbis_pattern_switching(empty, []),
    ):
        s, rate = decode_vorbis(buf)
        assert s.shape == (0,) and rate == 16_000
    s, _ = decode_vorbis(encode_vorbis_pattern_stereo(empty, empty))
    assert s.shape == (0, 2)
