"""Video fingerprinting + near-duplicate video detection.

Completes the multimodal dedup triad (text MinHash/SimHash, image
pHash, audio fingerprint): a 63-bit CLIP hash built from per-frame
DCT pHashes (``phash.phash64`` over frames decoded by the engine's
own video codecs — GIF89a, MJPEG/MS-RLE8 AVI, MPEG-1 with motion
compensation, dispatched by `multimodal.decode_video`), condensed by
PER-BIT MAJORITY over uniformly sampled frames. Majority voting
inherits pHash's invariances (per-frame monotone intensity maps,
rescale) and absorbs codec noise that flips a few bits in a few
frames — an MPEG-1 or palette-quantized GIF re-encode of the same
footage lands within a small Hamming distance, while different
footage is ~32 bits away. Frame sampling is by POSITION FRACTION,
so re-encodes that preserve content match even when containers
disagree about fps metadata.

Near-dup pairs reuse the shared banded Hamming join
(`phash.hamming_pairs` — EXACT for d < bands by pigeonhole), and
keep-one decisions reuse the text dedup machinery.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["vhash64", "vhash_column", "vhash_pairs", "vhash_survivors"]

_SAMPLES = 9  # frames sampled per clip (odd: no majority ties)


def vhash64(frames: np.ndarray) -> int:
    """63-bit clip hash of (N, H, W, 3) uint8 frames: per-frame
    pHash at ``_SAMPLES`` uniform position fractions, then per-bit
    majority. Deterministic; an odd sample count means no ties."""
    from icicle_spark.operators.phash import phash64

    n = len(frames)
    if n == 0:
        return 0
    idx = np.minimum((np.arange(_SAMPLES) * n) // _SAMPLES, n - 1)
    votes = np.zeros(63, dtype=np.int32)
    for i in idx:
        h = phash64(frames[int(i)])
        bits = np.array(
            [(h >> (62 - b)) & 1 for b in range(63)], dtype=np.int32
        )
        votes += bits
    maj = votes * 2 > _SAMPLES
    val = 0
    for b in maj:
        val = (val << 1) | int(b)
    return val


def vhash_column(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """(id, vhash) — one Arrow-batched decode+hash pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.multimodal import decode_video

        for pdf in batches:
            out = []
            for b in pdf[media_col]:
                frames, _fps = decode_video(bytes(b))
                out.append(vhash64(frames))
            yield pd.DataFrame({id_col: pdf[id_col], "vhash": out})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, media_col).mapInPandas(
        fn, schema=f"`{id_col}` {id_type}, vhash long"
    )


def vhash_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate video pairs ``(id_a, id_b, distance)`` —
    exactness per :func:`phash.hamming_pairs` (d < bands finds every
    pair). The default d<=7 / 8 bands absorbs MPEG-1 quantization
    and GIF palette noise across re-encodes."""
    from icicle_spark.operators.phash import hamming_pairs

    return hamming_pairs(
        vhash_column(df, media_col, id_col),
        id_col, "vhash", max_distance, bands,
    )


def vhash_survivors(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Keep-one video dedup: (id, cluster, keep) decisions."""
    from icicle_spark.operators.dedup import dedup_survivors

    pairs = vhash_pairs(df, media_col, id_col, max_distance, bands)
    return dedup_survivors(df, pairs, id_col)
