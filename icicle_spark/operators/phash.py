"""Perceptual image hashing + near-duplicate image detection.

The image analogue of MinHash text dedup: a 63-bit DCT perceptual
hash (the classic pHash construction — low-frequency 2-D DCT
coefficients thresholded at their median, so the hash is invariant
to any monotone intensity remap and robust to re-encoding, mild
noise, and rescaling) computed over THIS ENGINE'S OWN codecs
(`multimodal.decode_image`: RAW1 / PNG / baseline JPEG by magic
dispatch), then a banded Hamming self-join that is EXACT by
pigeonhole: a pair within Hamming distance d shares at least one of
``bands`` band keys whenever ``d < bands``, so with the default
4×16-bit bands every pair at distance ≤ 3 is found with zero
probability of a miss, and ``bands=8`` extends the guarantee to
d ≤ 7 at the cost of coarser (8-bit) band keys.

Scale shape: hashes are 8 bytes/image (one Arrow-batched decode
pass); identical hashes collapse in an exact groupBy BEFORE the
banded join, so the quadratic verify runs over DISTINCT hashes per
band bucket; band keys and Hamming distance (`xor` + `bit_count`)
stay in whole-stage codegen. Pairs -> clusters -> keep-one reuses
the text dedup machinery (`dedup.dedup_clusters`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["hamming_pairs", "hamming_pairs_incremental", "phash64",
           "phash_column", "phash_pairs", "phash_survivors"]

_N = 32  # resample size before the DCT

# Orthonormal 32-point DCT-II matrix (same construction as the JPEG
# codec's 8-point _T — jpeg.py:90)
_T32 = np.array(
    [
        [
            np.sqrt((1.0 if u == 0 else 2.0) / _N)
            * np.cos((2 * x + 1) * u * np.pi / (2 * _N))
            for x in range(_N)
        ]
        for u in range(_N)
    ]
)


def phash64(img: np.ndarray) -> int:
    """The 63-bit DCT perceptual hash of an (H, W, C) uint8 image,
    packed into a SIGNED int64 (Spark LongType; bit 63 stays 0).

    gray -> nearest-neighbor 32x32 -> 2-D DCT -> top-left 8x8
    low-frequency block -> each non-DC coefficient compared against
    the median of the 63 non-DC coefficients. Median thresholding
    makes the hash invariant to brightness/contrast (any monotone
    affine intensity map scales all DCT coefficients together)."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    yi = (np.arange(_N) * h // _N).clip(0, h - 1)
    xi = (np.arange(_N) * w // _N).clip(0, w - 1)
    g32 = g[yi[:, None], xi[None, :]]
    coef = (_T32 @ g32 @ _T32.T)[:8, :8].ravel()[1:]  # drop DC
    med = np.median(coef)
    bits = coef > med
    val = 0
    for b in bits:  # 63 iterations, msb-first
        val = (val << 1) | int(b)
    return val


def phash_column(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """(id, phash) — one Arrow-batched decode+hash pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.multimodal import decode_image

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": [
                        phash64(decode_image(bytes(b)))
                        for b in pdf[media_col]
                    ],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, media_col).mapInPandas(
        fn, schema=f"`{id_col}` {id_type}, phash long"
    )


def hamming_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """``(id_a, id_b, distance)`` pairs with Hamming(hash) <=
    max_distance over any 64-bit fingerprint column (images, audio,
    SimHash variants).

    EXACT (no missed pairs) whenever ``max_distance < bands`` — the
    pigeonhole guarantee; a larger ``max_distance`` keeps every
    reported pair correct but may miss pairs that disagree in every
    band. The join runs over DISTINCT hash values (identical items
    collapse first), band keys and popcounts are JVM expressions."""
    if not 1 <= bands <= 64:
        raise ValueError(f"bands must be in 1..64: {bands}")
    hashes = hashes.select(
        F.col(id_col).alias(id_col), F.col(hash_col).alias("__h")
    ).cache()
    width = 64 // bands
    mask = (1 << width) - 1
    distinct = hashes.select("__h").distinct()
    bands_df = distinct.select(
        "__h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("__h"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("__h", "bk.band", "bk.key")
    b2 = bands_df.withColumnRenamed("__h", "__h_b")
    cand = (
        bands_df.join(b2, ["band", "key"])
        .where(F.col("__h") < F.col("__h_b"))
        .select("__h", "__h_b")
        .distinct()
        .withColumn(
            "distance",
            F.bit_count(
                F.col("__h").bitwiseXOR(F.col("__h_b"))
            ).cast("int"),
        )
        .where(F.col("distance") <= max_distance)
    )
    # expand hash pairs back to id pairs; identical hashes pair at
    # distance 0 within their own group
    ha = hashes.select(F.col(id_col).alias("id_a"), "__h")
    hb = hashes.select(F.col(id_col).alias("id_b"),
                       F.col("__h").alias("__h_b"))
    cross = (
        cand.join(ha, "__h").join(hb, "__h_b")
        .select(
            # normalize pair order on IDS (the hash order that drove
            # the join says nothing about id order)
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "distance",
        )
    )
    same = (
        ha.join(hashes.select(F.col(id_col).alias("id_b"), "__h"), "__h")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).alias("distance"))
    )
    return cross.where(F.col("id_a") != F.col("id_b")).unionByName(same)


def hamming_pairs_incremental(
    inc: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Incremental fingerprint dedup: pairs ``(id_a, id_b, distance)``
    where AT LEAST ONE side is in the increment — new-vs-new and
    new-vs-indexed, never indexed-vs-indexed (those were reported
    when the index was built).

    ``index`` is the persisted fingerprint table ``(id, hash)`` —
    8 bytes per item. What it saves is the DECODE+HASH pass over the
    historical corpus (the expensive Arrow/pyarrow work); band keys
    re-derive from the stored hashes in one JVM projection, which is
    the same narrow-int64 cost profile as the MinHash band index
    re-read the text pipeline uses."""
    all_h = index.select(id_col, hash_col).unionByName(
        inc.select(id_col, hash_col)
    ).dropDuplicates([id_col])
    pairs = hamming_pairs(all_h, id_col, hash_col, max_distance, bands)
    ids = inc.select(id_col).distinct()
    pa = pairs.join(
        ids.withColumnRenamed(id_col, "id_a"), "id_a", "leftsemi"
    )
    pb = pairs.join(
        ids.withColumnRenamed(id_col, "id_b"), "id_b", "leftsemi"
    )
    return pa.unionByName(pb).distinct()


def phash_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a, id_b, distance)`` with
    Hamming(phash) <= max_distance — see :func:`hamming_pairs` for
    the exactness guarantee."""
    return hamming_pairs(
        phash_column(df, media_col, id_col),
        id_col, "phash", max_distance, bands,
    )


def phash_survivors(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Keep-one image dedup: (id, cluster, keep) — near-dup pairs ->
    connected components -> min-id survivor per cluster (the same
    decisions contract as the text dedup pipeline)."""
    from icicle_spark.operators.dedup import dedup_survivors

    pairs = phash_pairs(df, media_col, id_col, max_distance, bands)
    return dedup_survivors(df, pairs, id_col)
