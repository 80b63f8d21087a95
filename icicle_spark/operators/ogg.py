"""Ogg container (RFC 3533) + the Ogg FLAC mapping (version 1.0) in
pure stdlib — gives the audio tier REAL ``OggS``-magic payloads that
encode and decode for real by carrying FLAC frames (the full codec in
``operators/flac.py``) inside Ogg pages.

Container layer (codec-agnostic, reusable for any mapping):

- ``ogg_pack(packets, granules)``: packets -> pages with correct
  lacing (255-byte segments, zero-lacing terminator for multiples of
  255), BOS/EOS/continuation flags, page sequence numbers, and the
  Ogg CRC-32 (polynomial 0x04C11DB7, init 0, no reflection, no final
  xor — computed over the page with the checksum field zeroed);
  packets larger than one page span continuation pages.
- ``ogg_parse(buf)``: pages -> (packet, granule) list with CRC
  verification, continuation reassembly, and loud errors on
  truncation / bad sync / sequence gaps.

Ogg FLAC mapping 1.0 (the published xiph mapping): the first packet
(alone on the BOS page) is ``0x7F 'FLAC' major minor n_headers
'fLaC' STREAMINFO``; ``n_headers`` more header packets follow (here
one minimal VORBIS_COMMENT block, which the mapping mandates); every
later packet is exactly one FLAC audio frame, and a page's granule
position is the number of samples fully decoded by its end. The
decoder reassembles a native FLAC stream (fLaC + STREAMINFO with the
last-metadata flag forced + frames — FLAC frames are self-delimiting
so concatenation is the native layout) and hands it to
``flac.decode_flac``, so every CRC-8/16 + MD5 integrity check of the
native decoder applies to the Ogg path too.

This leaves Ogg VORBIS (lossy) as the only absent codec in the
multimodal tier: Vorbis decode needs stream-defined codebooks, MDCT
and floor/residue synthesis — out of scope for this container, and
``multimodal._try_real_decode`` keeps raising NotImplementedError
for it. Like the other codec tiers, this serves the training-data
pipeline; the reference engine treats media as opaque blobs.
"""

from __future__ import annotations

import struct

import numpy as np

_OGG_MAGIC = b"OggS"
_MAX_PAGE_BODY = 255 * 255  # 255 lacing values of 255 bytes


def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1)
            r &= 0xFFFFFFFF
        table.append(r)
    return table


_CRC = _crc_table()


def ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: 0x04C11DB7, init 0, unreflected, no xorout."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) ^ b) & 0xFF]
    return crc


def _lacing(n: int, complete: bool) -> bytes:
    """Segment table for n body bytes; ``complete`` appends the
    terminating short/zero lacing value."""
    full, rem = divmod(n, 255)
    out = bytes([255]) * full
    if complete:
        out += bytes([rem])
    elif rem:
        raise AssertionError("partial packet chunks must be 255-aligned")
    return out


def _page(header_type: int, granule: int, serial: int, seq: int,
          segs: bytes, body: bytes) -> bytes:
    head = (
        _OGG_MAGIC
        + bytes([0, header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(segs)])
        + segs
    )
    crc = ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def ogg_pack(packets: list[bytes], granules: list[int],
             serial: int = 0x1CEC1E) -> bytes:
    """Pack packets into an Ogg stream, one packet per page (the
    layout every Ogg muxer may legally emit and every demuxer must
    accept); oversized packets span continuation pages. ``granules``
    is parallel to ``packets``: the granule position recorded on the
    page where that packet ends (-1 is never needed here since pages
    end exactly one packet)."""
    if len(packets) != len(granules):
        raise ValueError("granules must be parallel to packets")
    if not packets:
        raise ValueError("need at least one packet")
    out = bytearray()
    seq = 0
    last = len(packets) - 1
    for i, (pkt, gran) in enumerate(zip(packets, granules)):
        pos = 0
        # full continuation pages for oversized packets
        while len(pkt) - pos > _MAX_PAGE_BODY:
            chunk = pkt[pos:pos + _MAX_PAGE_BODY]
            flags = (0x02 if (i == 0 and pos == 0) else 0) | (
                0x01 if pos else 0
            )
            # granule -1: no packet ends on this page (RFC 3533 §6)
            out += _page(flags, -1, serial, seq,
                         _lacing(len(chunk), False), chunk)
            seq += 1
            pos += _MAX_PAGE_BODY
        chunk = pkt[pos:]
        flags = 0
        if i == 0 and pos == 0:
            flags |= 0x02  # BOS
        if pos:
            flags |= 0x01  # continuation
        if i == last:
            flags |= 0x04  # EOS
        out += _page(flags, gran, serial, seq,
                     _lacing(len(chunk), True), chunk)
        seq += 1
    return bytes(out)


def ogg_parse(buf: bytes) -> list[tuple[bytes, int]]:
    """Parse an Ogg stream into ``[(packet, granule_of_its_page)]``
    with CRC verification and continuation reassembly."""
    pos = 0
    packets: list[tuple[bytes, int]] = []
    partial = b""
    expect_seq = None
    while pos < len(buf):
        if buf[pos:pos + 4] != _OGG_MAGIC:
            raise ValueError("ogg: bad page sync")
        if len(buf) < pos + 27:
            raise ValueError("ogg: truncated page header")
        version, header_type = buf[pos + 4], buf[pos + 5]
        if version != 0:
            raise ValueError(f"ogg: unknown version {version}")
        granule = struct.unpack("<q", buf[pos + 6:pos + 14])[0]
        seq = struct.unpack("<I", buf[pos + 18:pos + 22])[0]
        crc_stored = struct.unpack("<I", buf[pos + 22:pos + 26])[0]
        n_segs = buf[pos + 26]
        segs = buf[pos + 27:pos + 27 + n_segs]
        if len(segs) != n_segs:
            raise ValueError("ogg: truncated segment table")
        body_len = sum(segs)
        body = buf[pos + 27 + n_segs:pos + 27 + n_segs + body_len]
        if len(body) != body_len:
            raise ValueError("ogg: truncated page body")
        page = bytearray(buf[pos:pos + 27 + n_segs + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("ogg: page CRC mismatch")
        if expect_seq is not None and seq != expect_seq:
            raise ValueError(
                f"ogg: page sequence gap ({expect_seq} -> {seq})"
            )
        expect_seq = seq + 1
        if (header_type & 0x01) and not partial:
            raise ValueError("ogg: unexpected continuation page")
        if not (header_type & 0x01) and partial:
            raise ValueError("ogg: packet left dangling")
        # walk lacing values into packets
        off = 0
        for k, lace in enumerate(segs):
            partial += body[off:off + lace]
            off += lace
            if lace < 255:
                packets.append((partial, granule))
                partial = b""
        pos += 27 + n_segs + body_len
    if partial:
        raise ValueError("ogg: stream ends mid-packet")
    return packets


def is_ogg(buf: bytes) -> bool:
    return buf[:4] == _OGG_MAGIC


# ------------------------------------------------------ Ogg FLAC 1.0


def _vorbis_comment_block(is_last: bool) -> bytes:
    vendor = b"icicle_spark ogg-flac"
    body = (
        struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    )
    head = bytes([0x04 | (0x80 if is_last else 0)])
    return head + struct.pack(">I", len(body))[1:] + body


def encode_ogg_flac(
    samples: np.ndarray, sample_rate: int = 16_000,
    block_size: int = 4096,
) -> bytes:
    """Encode int16 mono/stereo samples as Ogg FLAC (mapping 1.0):
    lossless, one FLAC frame per packet, granule = samples decoded."""
    from icicle_spark.operators.flac import encode_flac

    native = encode_flac(samples, sample_rate, block_size)
    # split the native stream: fLaC, STREAMINFO block (38 bytes of
    # header+body by construction), then self-delimiting frames —
    # re-split frames by re-encoding per block to keep packets exact
    streaminfo = native[4:4 + 4 + 34]
    # first packet: 0x7f 'FLAC' 1 0, n_headers=1 (vorbis comment),
    # then the native signature + STREAMINFO with is-last CLEARED
    si = bytes([streaminfo[0] & 0x7F]) + streaminfo[1:]
    first = (
        b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 1)
        + b"fLaC" + si
    )
    packets = [first, _vorbis_comment_block(is_last=True)]
    granules = [0, 0]

    from icicle_spark.operators.flac import _encode_frame

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n = s.shape[0]
    done = 0
    for frame_no, start in enumerate(range(0, n, block_size)):
        block = s[start:start + block_size]
        packets.append(
            bytes(_encode_frame(block, frame_no, sample_rate, 16))
        )
        done += block.shape[0]
        granules.append(done)
    return ogg_pack(packets, granules)


def decode_ogg_flac(buf: bytes, verify_md5: bool = True):
    """Decode Ogg FLAC -> ``((N, channels) int32, rate)`` by
    reassembling the native FLAC stream (frames are self-delimiting)
    and running the full native decoder — all CRC/MD5 checks apply."""
    from icicle_spark.operators.flac import decode_flac

    packets = ogg_parse(buf)
    first = packets[0][0]
    if first[:5] != b"\x7fFLAC":
        raise ValueError("ogg: not an Ogg FLAC stream")
    major = first[5]
    if major != 1:
        raise ValueError(f"ogg-flac: unsupported mapping version {major}")
    n_headers = struct.unpack(">H", first[7:9])[0]
    if first[9:13] != b"fLaC":
        raise ValueError("ogg-flac: missing native signature")
    streaminfo = first[13:]
    if len(streaminfo) < 38 or (streaminfo[0] & 0x7F) != 0:
        raise ValueError("ogg-flac: first block is not STREAMINFO")
    # force is-last: the reassembled stream drops other header blocks
    si = bytes([streaminfo[0] | 0x80]) + streaminfo[1:]
    frames = b"".join(p for p, _ in packets[1 + n_headers:])
    return decode_flac(b"fLaC" + si + frames, verify_md5=verify_md5)
