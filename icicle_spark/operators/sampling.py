"""Deterministic sampling and source mixing for training-data curation.

``df.sample`` draws per-partition pseudo-random rows: the selected set
changes with partitioning, task retries, and Spark version — useless
for reproducible dataset builds. These operators decide membership from
a HASH of a stable key instead, so the same rows are kept at any
parallelism, on any rerun, on any cluster:

* ``deterministic_sample`` — keep ~fraction of rows by key hash.
* ``mix_sources``          — per-source downsampling weights (the
  "data mixture" step of a pretraining pipeline: web 0.6, books 1.0,
  …), one scan, no shuffle, whole-stage codegen.
* ``split_train_holdout``  — disjoint, exhaustive train/holdout split
  by the same mechanism (a row's side never changes as the corpus
  grows, unlike randomSplit).

All selections use xxhash64(key, seed): changing the seed redraws
every decision; keys hash identically forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1_000_000


def _bucket(key_col, seed: int, hash_fn: str = "xx64") -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_fn == "md5":
        # portable gate: md5 hex is identical in every engine (DuckDB,
        # Trino, BigQuery...), so membership is oracle-checkable
        # cross-engine. 15 hex digits = 60 bits, fits a signed int64.
        h = F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(
            _BUCKETS
        )
    if hash_fn != "xx64":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xx64 | md5)")
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS))


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    at any parallelism (membership is a pure function of the key)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(
        _bucket(key_col, seed, hash_fn) < int(fraction * _BUCKETS)
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Per-source deterministic downsampling: a row from source s
    survives iff hash(key) lands under weights[s]. Sources absent from
    ``weights`` get ``default`` (0 = dropped). One scan, no shuffle."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0, 1]")
    thr = F.lit(int(default * _BUCKETS))
    for s, w in weights.items():
        thr = F.when(F.col(source_col) == s, F.lit(int(w * _BUCKETS))).otherwise(
            thr
        )
    return df.where(_bucket(key_col, seed, hash_fn) < thr)


def split_train_holdout(
    df: DataFrame, holdout_fraction: float, key_col: str, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout): disjoint and exhaustive by key hash. A key's
    side is stable as the corpus grows — new snapshots never leak a
    previously-held-out document into train."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    cut = int(holdout_fraction * _BUCKETS)
    b = _bucket(key_col, seed)
    return df.where(b >= cut), df.where(b < cut)
