"""FLAC codec (operators/flac.py): lossless round trips, decoder
coverage of spec features the subset encoder never emits (LPC,
stereo decorrelation, RICE2, partitioned/escape residuals, wasted
bits) via hand-built conformant bitstreams, integrity checks, and the
Spark ``audio_features`` dispatch path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.operators.flac import (
    _SYNC,
    _BitReader,
    _BitWriter,
    _utf8_coded,
    _zigzag,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


# ------------------------------------------------------------ round trips


@pytest.mark.parametrize("rate", [8000, 22050, 44100])
def test_roundtrip_mono(rate):
    rng = np.random.default_rng(rate)
    t = np.arange(10_000)
    sig = (
        4000 * np.sin(t / 37.0) + rng.integers(-300, 300, t.size)
    ).astype(np.int16)
    dec, got_rate = decode_flac(encode_flac(sig, rate))
    assert got_rate == rate
    assert dec.shape == (sig.size, 1)
    assert np.array_equal(dec[:, 0], sig.astype(np.int32))


def test_roundtrip_stereo_and_odd_blocksize():
    rng = np.random.default_rng(1)
    left = (2000 * np.sin(np.arange(7321) / 11.0)).astype(np.int16)
    right = (left // 3 + rng.integers(-50, 50, left.size)).astype(np.int16)
    s = np.stack([left, right], axis=1)
    dec, rate = decode_flac(encode_flac(s, 16_000, block_size=1000))
    assert rate == 16_000
    assert np.array_equal(dec, s.astype(np.int32))


def test_roundtrip_edge_signals():
    cases = [
        np.full(5000, -32768, dtype=np.int16),          # extreme constant
        np.full(17, 32767, dtype=np.int16),             # short constant
        np.arange(-4000, 4000, dtype=np.int16),         # perfect ramp
        np.random.default_rng(3)
        .integers(-32768, 32768, 4097)
        .astype(np.int16),                              # incompressible
        np.array([7], dtype=np.int16),                  # single sample
    ]
    for sig in cases:
        dec, _ = decode_flac(encode_flac(sig, 8000))
        assert np.array_equal(dec[:, 0], sig.astype(np.int32))


def test_compresses_smooth_signals():
    sig = (8000 * np.sin(np.arange(40_000) / 80.0)).astype(np.int16)
    buf = encode_flac(sig, 16_000)
    assert len(buf) < 0.6 * sig.size * 2  # well under raw PCM16


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_flac(np.array([], dtype=np.int16))
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 3), dtype=np.int16))
    with pytest.raises(ValueError):
        encode_flac(np.array([40_000], dtype=np.int64))


# ------------------------------------------------ hand-built decoder paths
#
# The subset encoder never emits LPC, stereo decorrelation, RICE2,
# partition orders > 0, escape partitions, or wasted bits; build those
# frames by hand (spec-conformant bits + real CRCs) and check the
# decoder reconstructs exactly what the spec arithmetic says.


def _stream(frames: bytes, n: int, n_ch: int, rate: int = 8000) -> bytes:
    """Minimal fLaC container: STREAMINFO (zero MD5 -> no MD5 check)
    + raw frames."""
    w = _BitWriter()
    w.write(4096, 16)
    w.write(4096, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(n_ch - 1, 3)
    w.write(16 - 1, 5)
    w.write(n, 36)
    body = w.getvalue() + b"\x00" * 16
    head = b"fLaC" + bytes([0x80, 0, 0, len(body)])
    return head + body + frames


def _frame_header(w: _BitWriter, blocksize: int, ch_code: int) -> None:
    w.write(_SYNC, 14)
    w.write(0, 2)  # reserved + fixed strategy
    w.write(0b0111, 4)  # 16-bit blocksize follows
    w.write(0b0000, 4)  # rate from STREAMINFO
    w.write(ch_code, 4)
    w.write(0b100, 3)  # 16-bit samples
    w.write(0, 1)
    for b in _utf8_coded(0):
        w.write(b, 8)
    w.write(blocksize - 1, 16)
    w.write(crc8(bytes(w.buf)), 8)


def _write_verbatim(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    w.write(0, 1)
    w.write(0b000001, 6)
    w.write(0, 1)
    for v in x.tolist():
        w.write_signed(int(v), bps)


def _finish(w: _BitWriter) -> bytes:
    w.align()
    w.write(crc16(bytes(w.buf)), 16)
    return w.getvalue()


def test_decode_lpc_subframe():
    """LPC order 2, coefs [3, -1], shift 1: x[i] = ((3*x[i-1] -
    x[i-2]) >> 1) + r[i]. Residuals chosen so samples stay small."""
    order, coefs, shift = 2, [3, -1], 1
    warm = [100, 90]
    res = [5, -3, 0, 7, -2, 1, 4, -6, 2, 0]
    x = list(warm)
    for r in res:
        pred = (coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift
        x.append(pred + r)
    blocksize = len(x)

    w = _BitWriter()
    _frame_header(w, blocksize, ch_code=0)  # mono
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)  # LPC, order 2
    w.write(0, 1)  # no wasted bits
    for v in warm:
        w.write_signed(v, 16)
    w.write(15 - 1, 4)  # qlp precision 15
    w.write_signed(shift, 5)
    for c in coefs:
        w.write_signed(c, 15)
    # residual: RICE, partition order 0, param 3
    w.write(0b00, 2)
    w.write(0, 4)
    w.write(3, 4)
    for u in _zigzag(np.array(res, dtype=np.int64)).tolist():
        w.write_unary(u >> 3)
        w.write(u & 7, 3)
    frame = _finish(w)

    dec, _ = decode_flac(_stream(frame, blocksize, 1))
    assert dec[:, 0].tolist() == x


@pytest.mark.parametrize(
    "ch_code,mode",
    [(0b1000, "left_side"), (0b1001, "right_side"), (0b1010, "mid_side")],
)
def test_decode_stereo_decorrelation(ch_code, mode):
    rng = np.random.default_rng(ch_code)
    left = rng.integers(-3000, 3000, 64).astype(np.int64)
    right = rng.integers(-3000, 3000, 64).astype(np.int64)
    side = left - right
    if mode == "left_side":
        ch0, ch1, bps0, bps1 = left, side, 16, 17
    elif mode == "right_side":
        ch0, ch1, bps0, bps1 = side, right, 17, 16
    else:
        ch0, ch1, bps0, bps1 = (left + right) >> 1, side, 16, 17

    w = _BitWriter()
    _frame_header(w, 64, ch_code=ch_code)
    _write_verbatim(w, ch0, bps0)
    _write_verbatim(w, ch1, bps1)
    frame = _finish(w)

    dec, _ = decode_flac(_stream(frame, 64, 2))
    assert np.array_equal(dec[:, 0], left)
    assert np.array_equal(dec[:, 1], right)


def test_decode_rice2_partitions_and_escape():
    """RICE2 coding, partition order 2 (4 partitions), one escaped
    raw partition, over a FIXED order-1 subframe."""
    x = np.cumsum(
        np.concatenate(
            [
                np.array([10], dtype=np.int64),  # warmup sample
                np.tile([3, -2, 5, -1], 4)[:15].astype(np.int64),  # part 1
                np.zeros(16, dtype=np.int64),  # part 2
                np.array([1000, -1000] * 8, dtype=np.int64),  # part 3 escape
                np.arange(16, dtype=np.int64) - 8,  # part 4
            ]
        )
    )
    blocksize = x.size
    assert blocksize == 64
    res = np.diff(x)  # FIXED order 1 residual

    w = _BitWriter()
    _frame_header(w, blocksize, ch_code=0)
    w.write(0, 1)
    w.write(0b001001, 6)  # FIXED order 1
    w.write(0, 1)
    w.write_signed(int(x[0]), 16)
    w.write(0b01, 2)  # RICE2 (5-bit params)
    w.write(2, 4)  # partition order 2 -> 4 partitions of 16
    parts = [res[:15], res[15:31], res[31:47], res[47:]]
    for i, part in enumerate(parts):
        if i == 2:
            w.write(0b11111, 5)  # escape
            w.write(12, 5)  # 12-bit raw residuals
            for v in part.tolist():
                w.write_signed(int(v), 12)
        else:
            k = 2
            w.write(k, 5)
            for u in _zigzag(part).tolist():
                w.write_unary(u >> k)
                w.write(u & ((1 << k) - 1), k)
    frame = _finish(w)

    dec, _ = decode_flac(_stream(frame, blocksize, 1))
    assert np.array_equal(dec[:, 0], x)


def test_decode_wasted_bits():
    """Samples all divisible by 8 -> 3 wasted bits; subframe codes
    x >> 3 at bps 13 and the decoder must shift back up."""
    x = (np.arange(-20, 28, dtype=np.int64)) * 8
    w = _BitWriter()
    _frame_header(w, x.size, ch_code=0)
    w.write(0, 1)
    w.write(0b000001, 6)  # VERBATIM
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(3 - 1)  # wasted = unary + 1 = 3
    for v in (x >> 3).tolist():
        w.write_signed(int(v), 16 - 3)
    frame = _finish(w)
    dec, _ = decode_flac(_stream(frame, x.size, 1))
    assert np.array_equal(dec[:, 0], x)


# ----------------------------------------------------------- integrity


def test_crc_corruption_detected():
    sig = (1000 * np.sin(np.arange(9000) / 19.0)).astype(np.int16)
    buf = bytearray(encode_flac(sig, 8000))
    buf[len(buf) // 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(buf))


def test_md5_mismatch_detected():
    sig = np.arange(100, dtype=np.int16)
    buf = bytearray(encode_flac(sig, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the stream
    buf[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(buf))
    dec, _ = decode_flac(bytes(buf), verify_md5=False)
    assert np.array_equal(dec[:, 0], sig.astype(np.int32))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_bitreader_unary_across_bytes():
    w = _BitWriter()
    for q in [0, 7, 8, 9, 40, 3]:
        w.write_unary(q)
    w.align()
    rd = _BitReader(w.getvalue())
    assert [rd.read_unary() for _ in range(6)] == [0, 7, 8, 9, 40, 3]


# ------------------------------------------------------ Spark dispatch


def test_audio_features_flac_dispatch(spark):
    from icicle_spark.operators.multimodal import audio_features, encode_wav

    const = np.full(800, 1000, dtype=np.int16)  # 100 ms at 8 kHz
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "media": [
                    encode_flac(const, 8000),
                    encode_wav(const, 8000),  # same audio, WAV tier
                ],
            }
        )
    )
    got = audio_features(df).toPandas().set_index("doc_id").sort_index()
    # FLAC row decodes to identical features as the PCM WAV row
    assert abs(got.loc[0, "duration_ms"] - 100.0) < 1e-9
    assert abs(got.loc[0, "rms"] - 1000.0) < 1e-9
    assert (got.loc[0] == got.loc[1]).all()


def test_stereo_flac_mono_mix_matches_wav(spark):
    from icicle_spark.operators.multimodal import decode_audio, encode_wav

    rng = np.random.default_rng(5)
    s = rng.integers(-2000, 2000, (500, 2)).astype(np.int16)
    flac_mono, flac_rate = decode_audio(encode_flac(s, 16_000))
    wav_mono, wav_rate = decode_audio(encode_wav(s, 16_000))
    assert flac_rate == wav_rate == 16_000
    assert np.array_equal(flac_mono, wav_mono)
