"""Ogg container (RFC 3533) + Ogg FLAC mapping 1.0
(operators/ogg.py): page framing, lacing, CRC, continuation
reassembly, and the lossless Ogg FLAC path through the audio
dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from icicle_spark.operators.ogg import (
    decode_ogg_flac,
    encode_ogg_flac,
    is_ogg,
    ogg_crc,
    ogg_pack,
    ogg_parse,
)


# ------------------------------------------------------- container


def test_page_structure_and_flags():
    buf = ogg_pack([b"first", b"mid", b"last"], [0, 5, 9], serial=7)
    assert buf[:4] == b"OggS" and buf[4] == 0
    assert buf[5] == 0x02  # BOS on first page
    # three pages, sequence numbers 0..2, serial everywhere
    pages = []
    pos = 0
    while pos < len(buf):
        n_segs = buf[pos + 26]
        body = sum(buf[pos + 27:pos + 27 + n_segs])
        pages.append(buf[pos:pos + 27 + n_segs + body])
        pos += 27 + n_segs + body
    assert len(pages) == 3
    assert pages[-1][5] == 0x04  # EOS
    for i, p in enumerate(pages):
        assert struct.unpack("<I", p[14:18])[0] == 7
        assert struct.unpack("<I", p[18:22])[0] == i
    assert struct.unpack("<q", pages[1][6:14])[0] == 5  # granule


def test_crc_rejects_corruption():
    buf = bytearray(ogg_pack([b"payload goes here"], [1]))
    buf[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        ogg_parse(bytes(buf))


def test_lacing_exact_255_multiple():
    for n in (255, 510, 0):
        pkt = bytes(range(256))[:1] * n
        got = ogg_parse(ogg_pack([pkt], [0]))
        assert got[0][0] == pkt


def test_large_packet_spans_continuation_pages():
    rng = np.random.default_rng(2)
    pkt = bytes(rng.integers(0, 256, 150_000, dtype=np.uint8))
    buf = ogg_pack([b"hdr", pkt], [0, 42])
    got = ogg_parse(buf)
    assert got[0][0] == b"hdr"
    assert got[1][0] == pkt and got[1][1] == 42
    # at least one page carries the continuation flag and granule -1
    assert b"OggS\x00\x01" in buf


def test_parse_guards():
    with pytest.raises(ValueError, match="sync"):
        ogg_parse(b"NotOggData")
    buf = ogg_pack([b"abc"], [0])
    with pytest.raises(ValueError):
        ogg_parse(buf[:-2])  # truncated body
    # sequence gap: drop the middle page of three
    buf3 = ogg_pack([b"a", b"b", b"c"], [0, 1, 2])
    pages = []
    pos = 0
    while pos < len(buf3):
        n_segs = buf3[pos + 26]
        body = sum(buf3[pos + 27:pos + 27 + n_segs])
        pages.append(buf3[pos:pos + 27 + n_segs + body])
        pos += 27 + n_segs + body
    with pytest.raises(ValueError, match="sequence"):
        ogg_parse(pages[0] + pages[2])


def test_crc_spec_vector():
    # forward CRC-32/04C11DB7 with zero init: crc(b"") == 0 and a
    # one-byte stream equals the table entry for that byte
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


# ------------------------------------------------------- Ogg FLAC


def test_ogg_flac_roundtrip_mono_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-3000, 3000, 4000).astype(np.int16)
    st = rng.integers(-3000, 3000, (4000, 2)).astype(np.int16)
    for s in (mono, st):
        buf = encode_ogg_flac(s, 16_000, block_size=1024)
        assert is_ogg(buf)
        dec, rate = decode_ogg_flac(buf)
        ref = s[:, None] if s.ndim == 1 else s
        assert rate == 16_000 and (dec == ref).all()


def test_ogg_flac_mapping_header():
    s = np.zeros(100, np.int16)
    pkts = ogg_parse(encode_ogg_flac(s, 8_000))
    first = pkts[0][0]
    assert first[:5] == b"\x7fFLAC"
    assert first[5] == 1 and first[6] == 0  # mapping 1.0
    assert struct.unpack(">H", first[7:9])[0] == 1  # one header packet
    assert first[9:13] == b"fLaC"
    assert (first[13] & 0x7F) == 0  # STREAMINFO, is-last cleared
    # header packet: a VORBIS_COMMENT block (type 4, is-last)
    assert pkts[1][0][0] == 0x84
    # audio page granules are cumulative decoded sample counts
    assert pkts[-1][1] == 100


def test_ogg_flac_md5_integrity_applies():
    s = np.arange(-500, 500, dtype=np.int16)
    buf = bytearray(encode_ogg_flac(s, 8_000))
    # corrupt one audio byte AND refresh that page's CRC so only the
    # FLAC-layer integrity (frame CRC) can catch it
    pos = len(buf) - 40
    buf[pos] ^= 0x10
    # find the page containing pos and re-CRC it
    p = 0
    while p < len(buf):
        n_segs = buf[p + 26]
        body = sum(buf[p + 27:p + 27 + n_segs])
        end = p + 27 + n_segs + body
        if p <= pos < end:
            page = bytearray(buf[p:end])
            page[22:26] = b"\x00\x00\x00\x00"
            buf[p + 22:p + 26] = struct.pack("<I", ogg_crc(bytes(page)))
            break
        p = end
    with pytest.raises(ValueError):
        decode_ogg_flac(bytes(buf))


def test_pattern_audio_fixture_all_formats(spark):
    """attach_pattern_audio: the same closed-form clip decodes to
    identical samples through every lossless container tier."""
    from icicle_spark.operators.multimodal import (
        attach_pattern_audio,
        audio_features,
    )

    docs = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    got = {}
    for fmt in ("pcm1", "wav", "flac", "ogg"):
        rows = audio_features(
            attach_pattern_audio(docs, fmt=fmt)
        ).orderBy("doc_id").collect()
        got[fmt] = [(r.duration_ms, r.rms, r.peak, r.zero_crossings)
                    for r in rows]
        for r in rows:
            i = int(r.doc_id)
            n, a = 400 + (i % 7) * 50, 100 + i % 11
            assert r.peak == a and r.zero_crossings == n - 1
            assert abs(r.rms - a) < 1e-9
            assert abs(r.duration_ms - n / 16.0) < 1e-9
    assert got["pcm1"] == got["wav"] == got["flac"] == got["ogg"]


def test_audio_dispatch_ogg_flac_and_vorbis():
    from icicle_spark.operators.multimodal import decode_audio

    s = np.asarray(
        2000 * np.sin(np.arange(3000) * 0.05), dtype=np.int16
    )
    mono, rate = decode_audio(encode_ogg_flac(s, 16_000))
    assert rate == 16_000 and (mono == s).all()
    # an Ogg Vorbis stream decodes for real now (operators/vorbis.py,
    # tests/test_vorbis.py); a TRUNCATED vorbis header fails loud
    fake_vorbis = ogg_pack([b"\x01vorbis" + bytes(23)], [0])
    with pytest.raises(ValueError, match="vorbis"):
        decode_audio(fake_vorbis)
    # an Ogg stream that is neither mapping is rejected by name
    other = ogg_pack([b"\x7fSPEX" + bytes(23)], [0])
    with pytest.raises(ValueError, match="neither"):
        decode_audio(other)
