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


def safe_exp(c: Column) -> Column:
    """exp with overflow as error (Inf -> null)."""
    return _definitely(F.exp(c.cast("double")))


def safe_acos(c: Column) -> Column:
    """Domain error outside [-1, 1] -> null (reference: Possibly)."""
    return _definitely(F.acos(c.cast("double")))


def safe_asin(c: Column) -> Column:
    return _definitely(F.asin(c.cast("double")))


def atan(c: Column) -> Column:
    return F.atan(c.cast("double"))


def atan2(y: Column, x: Column) -> Column:
    return F.atan2(y.cast("double"), x.cast("double"))


def cos(c: Column) -> Column:
    return F.cos(c.cast("double"))


def sin(c: Column) -> Column:
    return F.sin(c.cast("double"))


def tan(c: Column) -> Column:
    return _definitely(F.tan(c.cast("double")))


def cosh(c: Column) -> Column:
    """Overflow -> null (cosh(1000) is Inf = error in the reference)."""
    return _definitely(F.cosh(c.cast("double")))


def sinh(c: Column) -> Column:
    return _definitely(F.sinh(c.cast("double")))


def tanh(c: Column) -> Column:
    return F.tanh(c.cast("double"))


def abs_(c: Column) -> Column:
    return F.abs(c)


def to_double(c: Column) -> Column:
    return c.cast("double")


def from_integer(c: Column) -> Column:
    """FromInteger: integral -> double (Builtin.hs ToDouble twin)."""
    return c.cast("double")


def floor_(c: Column) -> Column:
    return F.floor(c.cast("double")).cast("bigint")


def ceiling_(c: Column) -> Column:
    return F.ceil(c.cast("double")).cast("bigint")


def round_(c: Column) -> Column:
    """Haskell ``round`` is banker's rounding (half to EVEN) — Spark's
    ``round`` is half-up; ``bround`` matches the reference."""
    return F.bround(c.cast("double")).cast("bigint")


def truncate_(c: Column) -> Column:
    """Toward zero (Haskell truncate) — a long cast truncates toward
    zero in Spark, unlike floor."""
    return c.cast("double").cast("bigint")


def days_between(a: Column, b: Column) -> Column:
    """Whole days from a to b (reference Builtin.hs:76-78)."""
    return F.datediff(F.to_date(b), F.to_date(a)).cast("bigint")


def seconds_between(a: Column, b: Column) -> Column:
    return (F.unix_timestamp(b) - F.unix_timestamp(a)).cast("bigint")
