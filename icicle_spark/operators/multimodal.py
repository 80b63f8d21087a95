"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Two codec tiers:

1. **RAW formats — fully real, pure numpy** (no external codec needed):
   ``RAW1`` images (magic + uint16 height/width + uint8 channels +
   row-major uint8 payload) and ``PCM1`` audio (magic + uint32 sample
   rate + int16 mono samples). ``decode_raw_image`` /
   ``decode_pcm_audio`` validate and decode for real;
   ``image_features`` / ``audio_features`` / ``resize_raw_images``
   compute real statistics and a real nearest-neighbor resize inside
   ``mapInPandas``. Production swaps the per-buffer decode call for
   PIL/libsndfile to gain compressed formats — every Spark-side shape
   (schema, Arrow batching, partitioning) is identical.

2. **Compressed formats — stubbed** (this environment ships no
   PNG/JPEG/OGG codecs): ``decode_media_features`` tries the real
   library and otherwise falls back to a clearly-marked DETERMINISTIC
   FAKE over the raw bytes.

Layout convention (one row per asset):

    media     binary          -- the encoded payload
    mime      string          -- 'image/raw1', 'audio/pcm1',
                              --  'image/png', ...
    width/height/duration_ms  -- typed metadata (nullable)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FRAME_BYTES = 256  # fake codec: one "frame" per 256-byte chunk


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a binary media column from text
    bytes (fixture helper — stands in for reading real blobs)."""
    return docs.withColumn("media", F.encode(F.col(text_col), "utf-8")).withColumn(
        "mime", F.lit("image/fake")
    )


# ------------------------------------------------------------------ RAW tier

_RAW1 = b"RAW1"  # | magic 4B | H uint16 LE | W uint16 LE | C uint8 | pixels |
_PCM1 = b"PCM1"  # | magic 4B | sample_rate uint32 LE | int16 LE samples |


def encode_raw_image(arr: np.ndarray) -> bytes:
    """Encode an (H, W, C) or (H, W) uint8 array as RAW1 bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError("image must be (H, W[, C])")
    h, w, c = a.shape
    if h > 0xFFFF or w > 0xFFFF or c > 0xFF:
        raise ValueError("image too large for RAW1")
    head = _RAW1 + np.array([h, w], "<u2").tobytes() + bytes([c])
    return head + a.tobytes()


def decode_raw_image(buf: bytes) -> np.ndarray:
    """Real decode of a RAW1 payload -> (H, W, C) uint8 array."""
    if len(buf) < 9 or buf[:4] != _RAW1:
        raise ValueError("not a RAW1 image")
    h, w = np.frombuffer(buf[4:8], "<u2")
    c = buf[8]
    body = np.frombuffer(buf, np.uint8, offset=9)
    if body.size != int(h) * int(w) * int(c):
        raise ValueError(
            f"RAW1 payload is {body.size} bytes, header says {h}x{w}x{c}"
        )
    return body.reshape(int(h), int(w), int(c))


def encode_pcm_audio(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode mono int16 samples as PCM1 bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    return _PCM1 + np.array([sample_rate], "<u4").tobytes() + s.tobytes()


def decode_pcm_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """Real decode of a PCM1 payload -> (int16 samples, sample_rate)."""
    if len(buf) < 8 or buf[:4] != _PCM1:
        raise ValueError("not a PCM1 clip")
    rate = int(np.frombuffer(buf[4:8], "<u4")[0])
    return np.frombuffer(buf, "<i2", offset=8), rate


def attach_raw_images(
    docs: DataFrame, id_col: str = "doc_id", max_side: int = 24
) -> DataFrame:
    """Fixture/ingest helper: deterministic synthetic RAW1 image per
    row, seeded by the id (stands in for reading real blobs; the
    bytes are REAL RAW1 payloads the decoder accepts)."""
    id_type = dict(docs.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for rid in pdf[id_col]:
                rng = np.random.default_rng(int(rid) & 0x7FFFFFFF)
                h = int(rng.integers(4, max_side + 1))
                w = int(rng.integers(4, max_side + 1))
                media.append(
                    encode_raw_image(rng.integers(0, 256, (h, w, 3)))
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "media": media,
                 "mime": "image/raw1"}
            )

    return docs.select(id_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, media binary, mime string"
    )


def image_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL per-image features from RAW1 payloads: dimensions plus
    per-channel means and overall std — one Arrow-batched decode per
    asset, numpy throughout."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                img = decode_raw_image(bytes(buf))
                h, w, c = img.shape
                means = img.reshape(-1, c).mean(axis=0)
                rows.append(
                    (
                        rid, h, w, c,
                        float(means[0]),
                        float(means[1]) if c > 1 else None,
                        float(means[2]) if c > 2 else None,
                        float(img.astype("float64").std()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "height", "width", "channels",
                         "mean_r", "mean_g", "mean_b", "std_px"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, height int, width int, channels int, "
        "mean_r double, mean_g double, mean_b double, std_px double",
    )


def resize_raw_images(
    df: DataFrame,
    target_h: int,
    target_w: int,
    media_col: str = "media",
) -> DataFrame:
    """REAL nearest-neighbor resize of RAW1 images (numpy integer
    index gather — the same access pattern a SIMD resize kernel
    uses), re-encoded as RAW1."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[media_col]:
                img = decode_raw_image(bytes(buf))
                h, w, _c = img.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out.append(encode_raw_image(img[yi[:, None], xi[None, :]]))
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(fn, df.schema)


def audio_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """REAL per-clip features from PCM1 payloads: duration, RMS, peak,
    zero-crossing count."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                s, rate = decode_pcm_audio(bytes(buf))
                x = s.astype("float64")
                zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    (
                        rid,
                        float(len(s) * 1000.0 / rate),
                        float(np.sqrt(np.mean(x * x))) if len(s) else 0.0,
                        int(np.abs(s).max()) if len(s) else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "duration_ms", "rms", "peak", "zero_crossings"],
            )

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, duration_ms double, rms double, "
        "peak int, zero_crossings int",
    )


# ------------------------------------------------------- compressed tier


def _try_real_decode(buf: bytes):
    """Real decode path — raises NotImplementedError here because no
    codec library is available in this container. Swap this function
    for PIL/cv2 in production; everything downstream is agnostic."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "no image codec in this environment; using deterministic fake"
        ) from None
    raise NotImplementedError("real decode intentionally not wired in sandbox")


def _fake_features(buf: bytes) -> tuple[int, int, int, float]:
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return 0, 0, 0, 0.0
    return int(a.size), int(a[0]), int(a[-1]), float(a.mean())


def decode_media_features(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Per-asset decode + feature extraction via ``mapInPandas``
    (Arrow-batched; the per-asset loop is the codec call, exactly as a
    real decoder would be driven)."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf[media_col]:
                try:
                    _try_real_decode(bytes(buf))
                except NotImplementedError:
                    feats.append(_fake_features(bytes(buf)))
            out = pd.DataFrame(
                feats, columns=["n_bytes", "first_byte", "last_byte", "mean_byte"]
            )
            out[id_col] = pdf[id_col].to_numpy()
            yield out[[id_col, "n_bytes", "first_byte", "last_byte", "mean_byte"]]

    return df.select(id_col, media_col).mapInPandas(
        fn,
        f"`{id_col}` {id_type}, n_bytes bigint, first_byte int, "
        "last_byte int, mean_byte double",
    )


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    every: int = 4,
) -> DataFrame:
    """Sample every ``every``-th FRAME_BYTES chunk of the payload and
    emit one row per sampled frame with a deterministic checksum —
    the video-frame-sampling access pattern with a fake codec."""
    id_type = dict(df.dtypes)[id_col]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for rid, buf in zip(pdf[id_col], pdf[media_col]):
                a = np.frombuffer(bytes(buf), dtype=np.uint8)
                n_frames = int(np.ceil(a.size / FRAME_BYTES)) if a.size else 0
                for k in range(0, n_frames, every):
                    chunk = a[k * FRAME_BYTES: (k + 1) * FRAME_BYTES]
                    ids.append(rid)
                    idxs.append(k)
                    sums.append(int(chunk.astype(np.int64).sum()))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.select(id_col, media_col).mapInPandas(
        fn, f"`{id_col}` {id_type}, frame_idx int, frame_checksum bigint"
    )


def resize_stub(
    df: DataFrame, media_col: str = "media", target: int = 64
) -> DataFrame:
    """'Resize' = deterministic byte-level downsample to ``target``
    bytes (real resize would live in the codec; plumbing identical)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for buf in pdf[media_col]:
                a = np.frombuffer(bytes(buf), dtype=np.uint8)
                if a.size == 0:
                    out.append(bytearray())
                    continue
                idx = np.linspace(0, a.size - 1, min(target, a.size)).astype(int)
                out.append(bytearray(a[idx].tobytes()))
            pdf = pdf.copy()
            pdf[media_col] = out
            yield pdf

    return df.mapInPandas(fn, df.schema)
