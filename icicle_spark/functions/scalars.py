"""Scalar function layer with Icicle "Possibly" semantics.

In the reference, division / pow / log return ``Possibly Double`` —
NaN, Inf and domain errors are *error values*, not numbers
(/root/reference/icicle-source/src/Icicle/Source/Query/Prim.hs:36-42,73-98).
Spark's closest native encoding is null, which then flows through the
plan layer's poison/skip rules. Each ``safe_*`` returns null exactly
where the reference returns an error.

Time arithmetic matches the reference's calendar-clipped semantics
(``minusMonths`` uses addGregorianMonthsClip,
/root/reference/icicle-data/src/Icicle/Data/Time.hs:317-323 — Spark's
``add_months`` clips the same way: Jan 31 - 1 month = Dec 31,
Mar 31 - 1 month = Feb 28/29).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _definitely(c: Column) -> Column:
    """NaN/Inf -> null (errors in the reference's Possibly encoding)."""
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None)).otherwise(c)


def safe_div(num: Column, den: Column) -> Column:
    """x / 0 -> null (reference: division is Possibly, ambling.md:251-258)."""
    return F.when(den != 0, num.cast("double") / den.cast("double"))


def safe_log(c: Column) -> Column:
    return F.when(c > 0, _definitely(F.log(c.cast("double"))))


def safe_sqrt(c: Column) -> Column:
    return F.when(c >= 0, F.sqrt(c.cast("double")))


def safe_pow(base: Column, exp: Column) -> Column:
    return _definitely(F.pow(base.cast("double"), exp.cast("double")))


def days_between(a: Column, b: Column) -> Column:
    """Whole days from a to b (reference Builtin.hs:76-78)."""
    return F.datediff(F.to_date(b), F.to_date(a)).cast("bigint")


def seconds_between(a: Column, b: Column) -> Column:
    return (F.unix_timestamp(b) - F.unix_timestamp(a)).cast("bigint")
