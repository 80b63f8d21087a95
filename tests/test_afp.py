"""Audio fingerprint + near-dup detection (operators/afp.py).

Clips are spectrally DENSE (noise shaped by a seeded smooth
envelope): the fingerprint's bits are adjacent-band energy gaps of
the long-term spectrum, which are only meaningful when bands carry
energy — the same realism caveat as pHash on textured images."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.operators.afp import (
    afp64,
    afp_column,
    afp_pairs,
    afp_survivors,
)
from icicle_spark.operators.flac import encode_flac
from icicle_spark.operators.multimodal import (
    decode_audio,
    encode_pcm_audio,
    encode_wav,
    encode_wav_adpcm,
)

SR = 16000


def _dense(seed: int, secs: float = 1.0) -> np.ndarray:
    r = np.random.default_rng(seed)
    n = int(SR * secs)
    spec = np.fft.rfft(r.normal(0, 1, n))
    f = np.linspace(0, 1, len(spec))
    env = np.exp(sum(
        a * np.cos(2 * np.pi * (k + 1) * f + r.uniform(0, 6))
        for k, a in enumerate(r.uniform(0.3, 1.2, 4))
    ))
    x = np.fft.irfft(spec * env, n)
    return (x / np.abs(x).max() * 12000).astype(np.int16)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_afp_invariances():
    c = _dense(3)
    h0 = afp64(c, SR)
    assert 0 <= h0 < (1 << 63)
    # volume: exactly invariant (log-energy differences cancel gain)
    assert _ham(h0, afp64((c * 0.3).astype(np.int16), SR)) == 0
    assert _ham(h0, afp64((c * 0.49).astype(np.int16), SR)) == 0
    # lossless codecs and container swaps: identical samples
    for enc in (
        lambda x: encode_pcm_audio(x, SR),
        lambda x: encode_wav(x, SR),
        lambda x: encode_flac(x.reshape(-1, 1), SR),
    ):
        s, rate = decode_audio(enc(c))
        assert _ham(h0, afp64(s, rate)) == 0
    # 4-bit IMA ADPCM: shaped quantization noise rewrites weak bands —
    # bounded but NOT small (the documented recall limit)
    s, rate = decode_audio(encode_wav_adpcm(c))
    assert _ham(h0, afp64(s, rate)) <= 20
    # distinct content is far on average
    dists = [_ham(afp64(_dense(i), SR), afp64(_dense(i + 50), SR))
             for i in range(8)]
    assert sum(dists) / len(dists) > 15


@pytest.fixture(scope="module")
def planted(spark):
    """90 clips in 30 clusters of 3: base WAV / volume-scaled PCM1 /
    FLAC re-encode — all hash-identical variants."""
    rows = []
    for i in range(90):
        base = _dense(i % 30)
        variant = i // 30
        if variant == 0:
            buf = encode_wav(base, SR)
        elif variant == 1:
            buf = encode_pcm_audio(
                (base * 0.4).astype(np.int16), SR
            )
        else:
            buf = encode_flac(base.reshape(-1, 1), SR)
        rows.append((i, buf))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "media"]),
        "doc_id long, media binary",
    ).repartition(8).cache()


def test_banded_pairs_exact_vs_bruteforce(spark, planted):
    got = {
        (r.id_a, r.id_b): r.distance
        for r in afp_pairs(
            planted, "media", "doc_id", max_distance=3, bands=4
        ).collect()
    }
    h = {
        r.doc_id: r.afp
        for r in afp_column(planted, "media", "doc_id").collect()
    }
    want = {
        (a, b): _ham(h[a], h[b])
        for a in h for b in h
        if a < b and _ham(h[a], h[b]) <= 3
    }
    assert got == want and got


def test_survivors_recover_planted_clusters(spark, planted):
    out = afp_survivors(
        planted, "media", "doc_id", max_distance=3, bands=4
    ).toPandas()
    assert len(out) == 90
    sizes = out.groupby("cluster").size()
    # every planted trio collapses: 30 clusters of exactly 3
    assert len(sizes) == 30 and (sizes == 3).all()
    for cl, grp in out.groupby("cluster"):
        assert grp[grp.keep]["doc_id"].tolist() == [grp["doc_id"].min()]


def test_afp_guards(spark):
    bad = None
    with pytest.raises(Exception, match="unknown audio payload"):
        import pandas as pd  # noqa: F811

        from icicle_spark.session import get_spark  # noqa: F401

        bad = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "media": [b"not-audio"]}),
            "doc_id long, media binary",
        )
        afp_column(bad).collect()
