"""Video fingerprint + near-dup detection (operators/vhash.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.operators.avi import encode_avi_mjpeg, encode_avi_rle8
from icicle_spark.operators.gif import encode_gif
from icicle_spark.operators.mpeg1 import encode_m1v
from icicle_spark.operators.multimodal import decode_video
from icicle_spark.operators.vhash import (
    vhash64,
    vhash_column,
    vhash_pairs,
    vhash_survivors,
)


def _textured(seed: int, n: int = 48) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    r = np.random.default_rng(seed)
    raw = r.normal(0, 1, (n, n))
    sm = sliding_window_view(
        np.pad(raw, 2, mode="edge"), (5, 5)
    ).reshape(n, n, 25).mean(-1)
    return ((sm - sm.min()) / (sm.max() - sm.min()) * 130 + 60).astype(
        np.uint8
    )


def _clip(seed: int, n_frames: int = 12) -> np.ndarray:
    """Textured base with a slow pan + brightness wobble."""
    base = _textured(seed).astype(int)
    frames = []
    for t in range(n_frames):
        f = np.clip(base + 3 * np.sin(t / 2.0), 0, 255).astype(np.uint8)
        frames.append(np.stack([np.roll(f, t, axis=1)] * 3, axis=2))
    return np.stack(frames)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_vhash_cross_codec_stability():
    fr = _clip(1)
    gray = fr[:, :, :, 0]
    h0 = vhash64(fr)
    assert 0 <= h0 < (1 << 63)
    # lossless containers: identical hash
    dfr, _ = decode_video(encode_avi_rle8(gray))
    assert _ham(h0, vhash64(dfr)) == 0
    dfr, _ = decode_video(encode_gif(gray))
    assert _ham(h0, vhash64(dfr)) == 0
    # lossy re-encodes: small distance
    dfr, _ = decode_video(encode_avi_mjpeg(fr, quality=90))
    assert _ham(h0, vhash64(dfr)) <= 5
    dfr, _ = decode_video(encode_m1v(fr, qscale=6))
    assert _ham(h0, vhash64(dfr)) <= 7
    # distinct footage is far
    assert _ham(h0, vhash64(_clip(2))) > 15
    # frame-count robustness: same footage, every other frame
    assert _ham(h0, vhash64(_clip(1)[::2])) <= 7
    assert vhash64(np.zeros((0, 4, 4, 3), dtype=np.uint8)) == 0


@pytest.fixture(scope="module")
def planted(spark):
    """80 clips in 20 clusters of 4: RLE8 / GIF / MJPEG q90 /
    MPEG-1 q6 encodes of the same footage."""
    rows = []
    for i in range(80):
        fr = _clip(i % 20)
        gray = fr[:, :, :, 0]
        variant = i // 20
        if variant == 0:
            buf = encode_avi_rle8(gray)
        elif variant == 1:
            buf = encode_gif(gray)
        elif variant == 2:
            buf = encode_avi_mjpeg(fr, quality=90)
        else:
            buf = encode_m1v(fr, qscale=6)
        rows.append((i, buf))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media"]),
        "doc_id long, media binary",
    ).repartition(8).cache()


def test_banded_pairs_exact_vs_bruteforce(spark, planted):
    got = {
        (r.id_a, r.id_b): r.distance
        for r in vhash_pairs(
            planted, "media", "doc_id", max_distance=7, bands=8
        ).collect()
    }
    h = {
        r.doc_id: r.vhash
        for r in vhash_column(planted, "media", "doc_id").collect()
    }
    want = {
        (a, b): _ham(h[a], h[b])
        for a in h for b in h
        if a < b and _ham(h[a], h[b]) <= 7
    }
    assert got == want and got


def test_survivors_recover_planted_clusters(spark, planted):
    # d<=11 absorbs the occasional MPEG-1 outlier (one q6 re-encode
    # drew distance 8); bands=16 keeps the pigeonhole guarantee, and
    # the inter-cluster floor asserted below shows no false merges
    h = {
        r.doc_id: r.vhash
        for r in vhash_column(planted, "media", "doc_id").collect()
    }
    inter = min(
        _ham(h[a], h[b])
        for a in h for b in h
        if a < b and a % 20 != b % 20
    )
    assert inter > 11, inter
    out = vhash_survivors(
        planted, "media", "doc_id", max_distance=11, bands=16
    ).toPandas()
    assert len(out) == 80
    sizes = out.groupby("cluster").size()
    assert len(sizes) == 20 and (sizes == 4).all()
    for cl, grp in out.groupby("cluster"):
        assert grp[grp.keep]["doc_id"].tolist() == [grp["doc_id"].min()]
