"""Video tier: GIF89a + MJPEG/AVI containers, IMA ADPCM audio, and
the Spark-side frame operators.

GIF is lossless, so round-trips are pinned bit-exact (including
12-bit LZW table growth, the KwKwK self-referential code, interlaced
row order, disposal methods, transparency, and local colour tables —
the disposal/transparency stream is hand-built so the decoder is
exercised against spec bytes the encoder never emits). AVI pins
flat-colour frames bit-exact at quality 100 (DC-only JPEG blocks)
and PSNR on gradients. ADPCM pins a spec-literal single-block
cross-check computed independently in the test, plus SNR."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from icicle_spark.operators.avi import decode_avi_frames, encode_avi_mjpeg
from icicle_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from icicle_spark.operators.multimodal import (
    attach_pattern_videos,
    decode_audio,
    decode_media_features,
    decode_video,
    decode_wav,
    encode_wav_adpcm,
    frame_sample,
    video_frame_features,
)

RNG = np.random.default_rng(20260819)


# ------------------------------------------------------------- LZW


@pytest.mark.parametrize("n", [1, 2, 255, 4096, 120_000])
def test_lzw_roundtrip_noise(n):
    idx = RNG.integers(0, 256, size=n, dtype=np.uint8)
    blocks = lzw_encode(idx, 8)
    dec, pos = lzw_decode(blocks, 0)
    assert pos == len(blocks)
    assert np.array_equal(dec, idx)


def test_lzw_roundtrip_repetitive_kwkwk():
    # aaaa... forces the KwKwK case (code == len(table)) immediately
    for pat in (b"\x01" * 5000, b"\x01\x01\x02" * 4000, b"\x00\x01" * 6000):
        idx = np.frombuffer(pat, np.uint8)
        dec, _ = lzw_decode(lzw_encode(idx, 8), 0)
        assert np.array_equal(dec, idx)


def test_lzw_small_code_size():
    idx = RNG.integers(0, 4, size=10_000, dtype=np.uint8)
    dec, _ = lzw_decode(lzw_encode(idx, 2), 0)
    assert np.array_equal(dec, idx)


def test_lzw_table_freeze_past_4096():
    # enough entropy to fill the 12-bit table and keep going frozen
    idx = RNG.integers(0, 256, size=400_000, dtype=np.uint8)
    dec, _ = lzw_decode(lzw_encode(idx, 8), 0)
    assert np.array_equal(dec, idx)


def test_lzw_truncated_stream_raises():
    blocks = bytearray(lzw_encode(np.arange(100, dtype=np.uint8), 8))
    # chop the stream before END: keep the size byte + first sub-block
    # header but drop the terminator and tail bytes
    bad = bytes(blocks[:10]) + b"\x00"
    bad = bytes([blocks[0], 8]) + bytes(blocks[2:10]) + b"\x00"
    with pytest.raises(ValueError):
        lzw_decode(bad, 0)


# ------------------------------------------------------------- GIF


def test_gif_gray_roundtrip_bit_exact():
    frames = RNG.integers(0, 256, size=(5, 17, 23), dtype=np.uint8)
    out, delays = decode_gif(encode_gif(frames, delay_cs=6))
    assert np.array_equal(out, np.stack([frames] * 3, axis=-1))
    assert delays == [6] * 5


def test_gif_rgb_palette_roundtrip():
    colours = RNG.integers(0, 256, size=(200, 3), dtype=np.uint8)
    frames = colours[RNG.integers(0, 200, size=(3, 21, 19))]
    out, _ = decode_gif(encode_gif(frames))
    assert np.array_equal(out, frames)


def test_gif_too_many_colours_raises():
    # a 32x32 gradient with >256 distinct RGB triples
    y, x = np.mgrid[0:32, 0:32]
    img = np.stack([y * 8, x * 8, (y + x)], axis=-1).astype(np.uint8)
    with pytest.raises(ValueError, match="distinct colours"):
        encode_gif(img[None])


def test_gif_interlaced_roundtrip():
    frames = RNG.integers(0, 256, size=(2, 13, 9), dtype=np.uint8)
    buf = encode_gif(frames, interlace=True)
    out, _ = decode_gif(buf)
    assert np.array_equal(out, np.stack([frames] * 3, axis=-1))
    # stream really is interlaced (image descriptor flag set):
    # header 13 + GCT 768 + netscape ext 19 + GCE 8 -> image separator
    sep = 13 + 768 + 19 + 8
    assert buf[sep] == 0x2C and buf[sep + 9] & 0x40


def _hand_gif(blocks: list[bytes], w: int, h: int, palette: bytes) -> bytes:
    """Assemble a GIF from hand-built blocks (spec bytes the encoder
    never emits: partial-canvas frames, disposal, transparency,
    local palettes)."""
    size_bits = max(0, (len(palette) // 3 - 1).bit_length() - 1)
    pal = palette + b"\x00" * ((2 << size_bits) * 3 - len(palette))
    head = (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0xF0 | size_bits, 0, 0) + pal)
    return head + b"".join(blocks) + b"\x3b"


def _img_block(left, top, w, h, indices, *, flags=0, palette=b""):
    body = struct.pack("<HHHHB", left, top, w, h, flags) + palette
    return bytes([0x2C]) + body + lzw_encode(
        np.asarray(indices, np.uint8).reshape(-1), 2
    )


def _gce(disposal, transp_idx=None, delay=0):
    flags = (disposal << 2) | (1 if transp_idx is not None else 0)
    return bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay) + bytes(
        [transp_idx if transp_idx is not None else 0, 0]
    )


def test_gif_disposal_and_transparency_hand_stream():
    # 4x4 canvas, 2-entry global palette: 0=black, 1=white, 2=red, 3=blue
    pal = bytes([0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 255])
    full = np.ones((4, 4), np.uint8)  # white canvas
    # frame 2: 2x2 red patch at (1,1), disposal 2 (restore background)
    patch = np.full((2, 2), 2, np.uint8)
    # frame 3: transparent-index overlay leaves canvas untouched
    overlay = np.array([[3, 0], [0, 3]], np.uint8)  # 0 = transparent
    blocks = [
        _gce(1), _img_block(0, 0, 4, 4, full),
        _gce(2), _img_block(1, 1, 2, 2, patch),
        _gce(1, transp_idx=0), _img_block(1, 1, 2, 2, overlay),
    ]
    frames, _ = decode_gif(_hand_gif(blocks, 4, 4, pal))
    assert frames.shape == (3, 4, 4, 3)
    white, red, blue, black = (
        [255, 255, 255], [255, 0, 0], [0, 0, 255], [0, 0, 0])
    assert np.array_equal(frames[0], np.tile(white, (4, 4, 1)))
    # frame 2: white canvas with red patch
    assert np.array_equal(frames[1][1:3, 1:3], np.tile(red, (2, 2, 1)))
    assert np.array_equal(frames[1][0], np.tile(white, (4, 1)))
    # disposal 2 restored the patch region to the background colour
    # (index 0 = black) BEFORE frame 3's overlay painted its diagonal
    assert np.array_equal(frames[2][1, 1], blue)  # overlay[0,0] = 3
    assert np.array_equal(frames[2][1, 2], black)  # transparent -> bg
    assert np.array_equal(frames[2][2, 1], black)  # transparent -> bg
    assert np.array_equal(frames[2][2, 2], blue)  # overlay[1,1] = 3
    assert np.array_equal(frames[2][0], np.tile(white, (4, 1)))


def test_gif_disposal_restore_previous():
    pal = bytes([10, 10, 10, 200, 200, 200])
    base = np.zeros((3, 3), np.uint8)
    patch = np.ones((1, 1), np.uint8)
    blocks = [
        _gce(1), _img_block(0, 0, 3, 3, base),
        _gce(3), _img_block(1, 1, 1, 1, patch),  # restore-previous
        _gce(1), _img_block(0, 0, 1, 1, patch),
    ]
    frames, _ = decode_gif(_hand_gif(blocks, 3, 3, pal))
    assert np.array_equal(frames[1][1, 1], [200, 200, 200])
    # after disposal 3 the (1,1) pixel is back to the base colour
    assert np.array_equal(frames[2][1, 1], [10, 10, 10])
    assert np.array_equal(frames[2][0, 0], [200, 200, 200])


def test_gif_local_palette_overrides_global():
    global_pal = bytes([0, 0, 0, 255, 255, 255])
    local_pal = bytes([0, 255, 0, 9, 9, 9])  # index 0 = green
    blocks = [_img_block(0, 0, 2, 2, np.zeros((2, 2), np.uint8),
                         flags=0x80, palette=local_pal)]
    frames, _ = decode_gif(_hand_gif(blocks, 2, 2, global_pal))
    assert np.array_equal(frames[0][0, 0], [0, 255, 0])


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JFIF0000")


# ------------------------------------------------------------- AVI


def test_avi_flat_frames_bit_exact_q100():
    grays = [0, 63, 128, 200, 255]
    frames = [np.full((9, 14), g, np.uint8) for g in grays]
    out, fps = decode_avi_frames(encode_avi_mjpeg(frames, fps=30,
                                                  quality=100))
    assert fps == 30.0
    assert out.shape == (5, 9, 14, 3)
    for k, g in enumerate(grays):
        assert np.all(out[k] == g)


def test_avi_rgb_gradient_psnr():
    y, x = np.mgrid[0:24, 0:32]
    grad = np.stack([(y * 5) % 256, (x * 3) % 256, ((x + y) * 4) % 256],
                    axis=-1).astype(np.uint8)
    out, _ = decode_avi_frames(encode_avi_mjpeg([grad, grad[::-1]],
                                                quality=92))
    for k, ref in enumerate([grad, grad[::-1]]):
        mse = float(((out[k].astype(float) - ref) ** 2).mean())
        assert 10 * np.log10(255 ** 2 / mse) > 30


def test_avi_word_alignment_odd_jpeg():
    # force odd-length JPEG payloads; RIFF pads chunks to even offsets
    for seed in range(4):
        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (8, 8), np.uint8) for _ in range(3)]
        buf = encode_avi_mjpeg(frames, quality=35)
        out, _ = decode_avi_frames(buf)
        assert out.shape == (3, 8, 8, 3)


def test_avi_rejects_mismatched_sizes_and_garbage():
    with pytest.raises(ValueError, match="share one size"):
        encode_avi_mjpeg([np.zeros((4, 4), np.uint8),
                          np.zeros((5, 4), np.uint8)])
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_video_dispatch():
    g = encode_gif(np.zeros((2, 4, 4), np.uint8), delay_cs=4)
    frames, fps = decode_video(g)
    assert frames.shape == (2, 4, 4, 3) and fps == 25.0
    a = encode_avi_mjpeg([np.zeros((4, 4), np.uint8)], fps=12)
    frames, fps = decode_video(a)
    assert frames.shape == (1, 4, 4, 3) and fps == 12.0
    with pytest.raises(ValueError, match="video payload"):
        decode_video(b"\x00" * 32)


# ----------------------------------------------------------- ADPCM


def test_adpcm_spec_literal_block():
    """Cross-check one block against the IMA algorithm written out
    independently here (tables re-stated, different code shape)."""
    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
             31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
             118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
             337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876,
             963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
             2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
             5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
             12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
             27086, 29794, 32767]
    idx_tab = [-1, -1, -1, -1, 2, 4, 6, 8]
    sig = (3000 * np.sin(np.arange(505) / 5.0)).astype(np.int16)
    buf = encode_wav_adpcm(sig, 8000, block_align=256)
    # locate the data chunk and decode its first block by hand
    d = buf.index(b"data") + 8
    block = buf[d : d + 256]
    pred, index, _res = struct.unpack("<hBB", block[:4])
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            if len(out) >= 505:
                break
            step = steps[index]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            pred = pred - diff if nib & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + idx_tab[nib & 7]))
            out.append(pred)
    dec, rate = decode_wav(buf)
    assert rate == 8000
    assert np.array_equal(dec[:505, 0], np.array(out, np.int16))


def test_adpcm_snr_and_ratio():
    t = np.arange(16_000)
    sig = (9000 * np.sin(2 * np.pi * t / 80)
           + 2000 * np.sin(2 * np.pi * t / 13)).astype(np.int16)
    buf = encode_wav_adpcm(sig, 16_000)
    dec, _ = decode_wav(buf)
    assert dec.shape == (sig.size, 1)
    err = dec[:, 0].astype(float) - sig
    snr = 10 * np.log10((sig.astype(float) ** 2).mean() / (err ** 2).mean())
    assert snr > 25
    assert len(buf) < 0.3 * 2 * sig.size  # ~4:1 vs PCM16
    # decode_audio dispatch: ADPCM WAV -> mono samples
    mono, rate = decode_audio(buf)
    assert mono.shape == (sig.size,) and rate == 16_000


def test_adpcm_rejects_empty_and_pcm_path_unchanged():
    with pytest.raises(ValueError, match="empty"):
        encode_wav_adpcm(np.array([], np.int16))
    from icicle_spark.operators.multimodal import encode_wav

    s = RNG.integers(-1000, 1000, 64).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 8000))
    assert np.array_equal(dec[:, 0], s) and rate == 8000


# ------------------------------------------------------- Spark side


def _expected(i: int, k: int) -> tuple[int, int, int, int]:
    return 2 + i % 3, 6 + i % 5, 6 + i % 7, (7 * i + 13 * k + 5) % 256


@pytest.mark.parametrize("fmt", ["gif", "avi"])
def test_pattern_videos_closed_form(spark, sf_dir, fmt):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    vids = attach_pattern_videos(docs, fmt=fmt)
    rows = video_frame_features(vids).collect()
    assert rows
    for r in rows:
        n, h, w, g = _expected(int(r.doc_id), r.frame_idx)
        assert (r.n_frames, r.height, r.width) == (n, h, w)
        assert r.mean_px == float(g)  # solid frames are EXACT
    # every frame of every doc present
    assert len(rows) == sum(2 + int(r.doc_id) % 3 for r in docs.collect())


def test_frame_sample_real_containers(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    vids = attach_pattern_videos(docs, fmt="gif")
    rows = frame_sample(vids, every=2).collect()
    for r in rows:
        i, k = int(r.doc_id), r.frame_idx
        assert k % 2 == 0
        n, h, w, g = _expected(i, k)
        assert r.frame_checksum == 3 * h * w * g


def test_frame_sample_fake_fallback_unchanged(spark, sf_dir):
    from icicle_spark.operators.multimodal import attach_fake_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    media = attach_fake_media(docs)
    rows = frame_sample(media, every=4).collect()
    docs_pd = docs.select("doc_id", "text").toPandas()
    by_id = dict(zip(docs_pd.doc_id, docs_pd.text))
    for r in rows:
        text = by_id[r.doc_id].encode()
        chunk = text[r.frame_idx * 256:(r.frame_idx + 1) * 256]
        assert r.frame_checksum == sum(chunk)


def test_decode_media_features_video_tier(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    vids = attach_pattern_videos(docs, fmt="gif")
    rows = decode_media_features(vids).collect()
    for r in rows:
        i = int(r.doc_id)
        n, h, w, _ = _expected(i, 0)
        assert r.n_bytes == n * h * w * 3  # decoded pixels, not bytes
        grays = [(7 * i + 13 * k + 5) % 256 for k in range(n)]
        assert r.first_byte == grays[0] and r.last_byte == grays[-1]
        assert abs(r.mean_byte - sum(grays) / n) < 1e-9


# ----------------------------------------------------------- MS-RLE8
# BI_RLE8 is the inter-frame member of the video tier: delta frames
# code only changed runs; skipped pixels carry the decoder's canvas.


def _rle8_video(n=5, h=40, w=56, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w)).astype(np.uint8)  # noisy bg
    frames = np.stack([base.copy() for _ in range(n)])
    for k in range(n):
        frames[k, 8:16, 4 + 5 * k : 12 + 5 * k] = 250  # moving square
    return frames


def test_rle8_roundtrip_bit_exact():
    from icicle_spark.operators.avi import decode_avi_frames, encode_avi_rle8

    frames = _rle8_video()
    dec, fps = decode_avi_frames(encode_avi_rle8(frames, fps=8))
    assert fps == 8.0
    assert dec.shape == frames.shape + (3,)
    for k in range(frames.shape[0]):
        # grayscale palette: all three channels equal the index plane
        assert np.array_equal(dec[k, :, :, 0], frames[k])
        assert np.array_equal(dec[k, :, :, 0], dec[k, :, :, 1])
        assert np.array_equal(dec[k, :, :, 0], dec[k, :, :, 2])


def test_rle8_delta_frames_are_small():
    """Inter-frame coding must pay off: on a noisy static background
    the keyframe is ~full-frame size while deltas code only the
    moving square."""
    from icicle_spark.operators.avi import _rle8_encode_frame

    frames = _rle8_video()
    key = len(_rle8_encode_frame(frames[0], None))
    deltas = [
        len(_rle8_encode_frame(frames[k], frames[k - 1]))
        for k in range(1, frames.shape[0])
    ]
    assert key > frames[0].size  # noise defeats intra-frame RLE
    assert all(d < key / 5 for d in deltas)  # temporal deltas win


def test_rle8_spec_literal_opcodes():
    """Hand-built stream exercising every opcode: run, absolute
    (word-padded), EOL, delta skip, early EOF. Untouched pixels must
    keep previous-frame content (the inter-frame contract)."""
    from icicle_spark.operators.avi import _rle8_apply

    canvas = np.full((4, 8), 9, np.uint8)
    prev = canvas.copy()
    data = bytes(
        [
            3, 1,                # run: 3x palette index 1 (bottom row)
            0, 4, 5, 6, 7, 8,    # absolute: 4 literals (even, no pad)
            0, 0,                # end of line
            0, 2, 2, 1,          # delta: right 2, up 1 row
            2, 3,                # run: 2x index 3
            0, 1,                # end of bitmap (rows above untouched)
        ]
    )
    _rle8_apply(data, canvas)
    expect = prev.copy()
    expect[3, 0:3] = 1
    expect[3, 3:7] = [5, 6, 7, 8]
    expect[1, 2:4] = 3  # bottom-up row 2 == array row 1
    assert np.array_equal(canvas, expect)


def test_rle8_odd_absolute_run_padded():
    from icicle_spark.operators.avi import _rle8_apply, _rle8_encode_frame

    # a 5-literal stretch forces absolute mode with a pad byte
    row = np.array([[10, 20, 30, 40, 50, 50, 50, 50]], np.uint8)
    payload = _rle8_encode_frame(row, None)
    canvas = np.zeros((1, 8), np.uint8)
    _rle8_apply(payload, canvas)
    assert np.array_equal(canvas, row)


def test_rle8_bounds_and_truncation_raise():
    from icicle_spark.operators.avi import _rle8_apply

    with pytest.raises(ValueError, match="bounds"):
        _rle8_apply(bytes([9, 1, 0, 1]), np.zeros((2, 4), np.uint8))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _rle8_apply(bytes([2, 1]), np.zeros((2, 4), np.uint8))


def test_rle8_video_features_dispatch(spark):
    """RLE8 AVI rows flow through the same Spark video plumbing as
    MJPEG/GIF (magic dispatch is container-level RIFF/AVI)."""
    import pandas as pd

    from icicle_spark.operators.avi import encode_avi_rle8
    from icicle_spark.operators.multimodal import video_frame_features

    frames = _rle8_video(n=3)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "media": [encode_avi_rle8(frames)]})
    )
    got = video_frame_features(df).toPandas().sort_values("frame_idx")
    assert len(got) == 3 and (got["n_frames"] == 3).all()
    assert abs(got.iloc[0]["mean_px"] - frames[0].mean()) < 1e-9
