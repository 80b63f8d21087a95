"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (this environment ships no image/audio
codecs — PIL/cv2/torchaudio are absent): ``decode_media`` tries the
real library and otherwise falls back to a clearly-marked
DETERMINISTIC FAKE over the raw bytes, so the Spark-side plumbing —
schema, Arrow batch shape, partitioning, UDF signatures — is real and
tested end-to-end while the codec is swappable.

Layout convention (one row per asset):

    media     binary          -- the encoded payload
    mime      string          -- 'image/png', 'audio/wav', ...
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
