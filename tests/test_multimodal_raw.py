"""RAW codec tier (multimodal): fully real numpy decode / features /
resize over RAW1 images and PCM1 audio — no external codec, no fakes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.operators.multimodal import (
    attach_raw_images,
    audio_features,
    decode_pcm_audio,
    decode_raw_image,
    encode_pcm_audio,
    encode_raw_image,
    image_features,
    resize_raw_images,
)


def test_raw1_roundtrip_and_validation():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    assert np.array_equal(decode_raw_image(encode_raw_image(img)), img)
    gray = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    assert decode_raw_image(encode_raw_image(gray)).shape == (4, 4, 1)
    with pytest.raises(ValueError, match="not a RAW1"):
        decode_raw_image(b"PNG\x89 nope")
    with pytest.raises(ValueError, match="header says"):
        decode_raw_image(encode_raw_image(img)[:-4])


def test_pcm1_roundtrip():
    s = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    back, rate = decode_pcm_audio(encode_pcm_audio(s, 8000))
    assert rate == 8000 and np.array_equal(back, s)


def test_image_features_match_numpy(spark):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (6, 9, 3)).astype(np.uint8) for _ in range(4)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(4), "media": [encode_raw_image(i) for i in imgs]}
        )
    )
    got = image_features(df).toPandas().set_index("doc_id").sort_index()
    for i, img in enumerate(imgs):
        assert (got.loc[i, "height"], got.loc[i, "width"]) == (6, 9)
        assert abs(got.loc[i, "mean_r"] - img[:, :, 0].mean()) < 1e-9
        assert abs(got.loc[i, "std_px"] - img.astype("float64").std()) < 1e-9


def test_resize_nearest_neighbor_exact(spark):
    # 2x2 -> 4x4 nearest neighbor: each source pixel becomes a 2x2 block
    img = np.array(
        [[[10, 0, 0], [20, 0, 0]], [[30, 0, 0], [40, 0, 0]]], dtype=np.uint8
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [encode_raw_image(img)]})
    )
    out = resize_raw_images(df, 4, 4).toPandas()
    res = decode_raw_image(bytes(out["media"][0]))
    expect = img.repeat(2, axis=0).repeat(2, axis=1)
    assert np.array_equal(res, expect)
    # and downscale back to 2x2 reproduces the original
    back = resize_raw_images(resize_raw_images(df, 4, 4), 2, 2).toPandas()
    assert np.array_equal(decode_raw_image(bytes(back["media"][0])), img)


def test_audio_features(spark):
    const = np.full(800, 1000, dtype=np.int16)          # 100ms at 8k
    alt = np.tile([5000, -5000], 400).astype(np.int16)  # alternating
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "media": [
                    encode_pcm_audio(const, 8000),
                    encode_pcm_audio(alt, 8000),
                ],
            }
        )
    )
    got = audio_features(df).toPandas().set_index("doc_id").sort_index()
    assert abs(got.loc[0, "duration_ms"] - 100.0) < 1e-9
    assert abs(got.loc[0, "rms"] - 1000.0) < 1e-9
    assert got.loc[0, "zero_crossings"] == 0
    assert got.loc[1, "peak"] == 5000
    assert got.loc[1, "zero_crossings"] == 799


def test_attach_raw_images_end_to_end(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    media = attach_raw_images(docs)
    feats = image_features(media).toPandas()
    assert len(feats) == 10
    assert (feats["channels"] == 3).all()
    assert feats["height"].between(4, 24).all()
    # deterministic: same ids -> same payload features
    feats2 = image_features(attach_raw_images(docs)).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("doc_id").reset_index(drop=True),
        feats2.sort_values("doc_id").reset_index(drop=True),
    )
