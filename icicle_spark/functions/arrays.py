"""Array builtins — the reference's BuiltinArray surface
(icicle-source/src/Icicle/Source/Query/Builtin.hs:101-105: ArraySort,
ArrayLength, ArrayIndex). ArrayIndex is Possibly: out-of-bounds is an
error value, encoded as null (Spark 4 ANSI ``element_at`` throws on
OOB; ``F.get`` is the 0-based null-safe form)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def array_sort(a: Column) -> Column:
    return F.array_sort(a)


def array_length(a: Column) -> Column:
    return F.size(a).cast("bigint")


def array_index(a: Column, i) -> Column:
    """0-based, bounds-checked: OOB (or negative) index -> null."""
    idx = i if isinstance(i, Column) else F.lit(i)
    return F.get(a, idx)
