"""Perceptual image hashing + near-dup detection (operators/phash.py).

Invariance properties use TEXTURED images (smoothed noise): pHash's
median-thresholded DCT bits are only meaningful on images with broad
spectra — a pure sinusoid has ~2 nonzero coefficients and 61 noise
signs, a known property of the construction, not a bug."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.operators.jpeg import decode_jpeg, encode_jpeg
from icicle_spark.operators.multimodal import encode_png, encode_raw_image
from icicle_spark.operators.phash import (
    phash64,
    phash_column,
    phash_pairs,
    phash_survivors,
)


def _textured(seed: int, n: int = 48) -> np.ndarray:
    """Smoothed noise in [60, 190] — broad spectrum, clip-safe under
    +-40 brightness shifts."""
    from numpy.lib.stride_tricks import sliding_window_view

    r = np.random.default_rng(seed)
    raw = r.normal(0, 1, (n, n))
    sm = sliding_window_view(
        np.pad(raw, 2, mode="edge"), (5, 5)
    ).reshape(n, n, 25).mean(-1)
    g = ((sm - sm.min()) / (sm.max() - sm.min()) * 130 + 60).astype(np.uint8)
    return np.stack([g] * 3, axis=2)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_invariances():
    img = _textured(3, 72)
    h0 = phash64(img)
    # monotone affine intensity maps: identical hash (median threshold)
    assert _ham(h0, phash64((img.astype(int) + 40).astype(np.uint8))) == 0
    assert _ham(h0, phash64((img.astype(int) - 40).astype(np.uint8))) == 0
    assert _ham(
        h0, phash64(np.clip(img * 1.2, 0, 255).astype(np.uint8))
    ) == 0
    # nearest-neighbor rescale: identical hash
    assert _ham(h0, phash64(img.repeat(2, 0).repeat(2, 1))) == 0
    # lossy re-encode: small distance
    assert _ham(h0, phash64(decode_jpeg(encode_jpeg(img, 85)))) <= 4
    assert _ham(h0, phash64(decode_jpeg(encode_jpeg(img, 60)))) <= 8
    # different content: far
    assert _ham(h0, phash64(_textured(4, 72))) > 16
    assert _ham(h0, phash64(np.roll(img, 9, axis=1))) > 16
    # signed-int64 packing: bit 63 unused
    assert 0 <= h0 < (1 << 63)


@pytest.fixture(scope="module")
def planted(spark):
    """120 images in 30 clusters of 4: base / brightness-shift /
    2x NN-upsample / JPEG q70 re-encode, mixed PNG+JPEG+RAW1."""
    rows = []
    for i in range(120):
        base = _textured(i % 30)
        variant = i // 30
        img = base
        if variant == 1:
            img = (base.astype(int) + 25).astype(np.uint8)
        if variant == 2:
            img = base.repeat(2, 0).repeat(2, 1)
        if i % 3 == 0:
            enc = encode_png
        elif i % 3 == 1:
            enc = encode_raw_image
        else:
            enc = lambda a: encode_jpeg(a, 85)  # noqa: E731
        if variant == 3:
            enc = lambda a: encode_jpeg(a, 70)  # noqa: E731
        rows.append((i, enc(img)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media"]),
        "doc_id long, media binary",
    ).repartition(8).cache()


def test_banded_pairs_exact_vs_bruteforce(spark, planted):
    got = {
        (r.id_a, r.id_b): r.distance
        for r in phash_pairs(
            planted, "media", "doc_id", max_distance=3, bands=4
        ).collect()
    }
    h = {
        r.doc_id: r.phash
        for r in phash_column(planted, "media", "doc_id").collect()
    }
    want = {
        (a, b): _ham(h[a], h[b])
        for a in h
        for b in h
        if a < b and _ham(h[a], h[b]) <= 3
    }
    assert got == want and got  # pigeonhole: zero missed pairs
    # 8x8-bit bands widen the exactness guarantee to d <= 7
    got7 = {
        (r.id_a, r.id_b)
        for r in phash_pairs(
            planted, "media", "doc_id", max_distance=7, bands=8
        ).collect()
    }
    want7 = {
        (a, b) for a in h for b in h if a < b and _ham(h[a], h[b]) <= 7
    }
    assert got7 == want7


def test_survivors_keep_one_per_cluster(spark, planted):
    out = phash_survivors(
        planted, "media", "doc_id", max_distance=7, bands=8
    ).toPandas()
    assert len(out) == 120
    # every cluster keeps exactly its min id
    for cl, grp in out.groupby("cluster"):
        keepers = grp[grp.keep]["doc_id"].tolist()
        assert keepers == [grp["doc_id"].min()] == [cl]
    # the planted structure: brightness + upsample variants collapse
    # into their base cluster, so clusters are mostly size >= 3
    sizes = out.groupby("cluster").size()
    assert (sizes >= 3).sum() >= 25
    assert int(out.keep.sum()) <= 40


def test_phash_guards(spark, planted):
    with pytest.raises(ValueError, match="bands"):
        phash_pairs(planted, bands=0)
    with pytest.raises(Exception, match="unknown image payload"):
        bad = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "media": [b"not-an-image"]}),
            "doc_id long, media binary",
        )
        phash_column(bad).collect()
