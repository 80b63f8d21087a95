"""Data.Map key order for group-fold map outputs.

The reference's group/distinct accumulators are Data.Map.Map values,
so every map it renders or folds over iterates in ASCENDING KEY order
(Haskell Ord: Nothing < Just x, False < True, numerics/dates/strings
by value — containers Data.Map.Strict). The engine's map columns are
``map<string, …>`` (keys stringified for a uniform Spark type), but
iteration order follows the ORIGINAL typed key via these helpers, so
``group fold (k, v)`` postcomputations and rendered maps see the same
sequence the reference does.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
import pandas as pd


def _ord_key(x: Any):
    """Haskell Ord sort key: null (Nothing) first, then the value."""
    if x is None:
        return (0, 0)
    if isinstance(x, float) and np.isnan(x):
        return (0, 0)
    if x is pd.NaT:
        return (0, 0)
    if isinstance(x, (bool, np.bool_)):
        return (1, bool(x))
    return (1, x)


def hask_sorted(keys: Iterable[Any]) -> list:
    """Keys in Data.Map order. Falls back to string order if the keys
    are not mutually comparable (cannot happen for a well-typed group
    key, but a loud wrong ORDER beats a crash)."""
    ks = list(keys)
    try:
        return sorted(ks, key=_ord_key)
    except TypeError:
        return sorted(ks, key=lambda x: (x is not None, str(x)))


def key_str(k: Any) -> str:
    """A group key's STRING map-key form, identical across backends
    (native._key_str mirrors this in Catalyst, vexec vectorizes it):
    time-valued keys at midnight render as plain dates — the
    reference prints Time map keys date-first (t06-custom-folds
    `group time` goldens) — and intra-day times as
    'YYYY-MM-DD HH:MM:SS'."""
    import datetime as dt

    if isinstance(k, np.datetime64):
        k = pd.Timestamp(k)
    if isinstance(k, pd.Timestamp):
        k = k.to_pydatetime()
    if isinstance(k, dt.datetime):
        if (k.hour, k.minute, k.second, k.microsecond) == (0, 0, 0, 0):
            return k.date().isoformat()
        return k.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(k, dt.date):
        return k.isoformat()
    return str(k)


def key_str_series(s: pd.Series) -> pd.Series:
    """Vectorized `key_str` over a pandas Series."""
    if pd.api.types.is_datetime64_any_dtype(s):
        full = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        return full.where(s.dt.normalize() != s, s.dt.strftime("%Y-%m-%d"))
    return s.astype(str)


def bound_map(v: Any, max_group: int):
    """maxMapSize analogue for MAP-VALUED custom folds (t60.1: a
    map_insert fold whose final map exceeds the bound is an error
    value). Checked on the finished state — a run that grows past the
    bound but deletes back down is accepted here, where the
    reference's melted map errors mid-stream (documented divergence,
    COVERAGE.md)."""
    if isinstance(v, dict) and len(v) > max_group:
        return None
    return v
