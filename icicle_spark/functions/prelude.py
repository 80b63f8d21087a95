"""Prelude aggregate library — the reference ships these as library
folds over Core's single fold primitive
(/root/reference/icicle-source/data/libs/prelude.icicle); here each is
a Column aggregate expression (Catalyst-native, map-side partials).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def covariance(x: Column, y: Column) -> Column:
    """Sample covariance (prelude.icicle:219-237)."""
    return F.covar_samp(x, y)


def correlation(x: Column, y: Column) -> Column:
    """Pearson correlation (prelude.icicle:241-243)."""
    return F.corr(x, y)


def gradient(y: Column, x: Column) -> Column:
    """Simple linear-regression slope of y on x
    (prelude.icicle:247-249: covariance / variance). Degenerate x
    (zero variance) yields null, the reference's error value."""
    v = F.var_samp(x)
    return F.when(v != 0, F.covar_samp(y, x) / v)


def intercept(y: Column, x: Column) -> Column:
    """Regression intercept (prelude.icicle:253-255)."""
    return F.avg(y) - gradient(y, x) * F.avg(x)


def numflips_expr(value: Column, prev: Column) -> Column:
    """Count of state changes given a lag column
    (prelude.icicle:261-272)."""
    return F.coalesce(
        F.sum(F.when(prev.isNotNull() & (value != prev), 1).otherwise(0)), F.lit(0)
    )


def days_in(state: Column, time: Column, next_time: Column, query_time: Column):
    """`days_in` — days spent in each state, as the per-row day count
    to feed a groupBy(entity, state) (prelude.icicle:344-356): each
    fact holds its state until the next fact (or the query time)."""
    until = F.coalesce(next_time, query_time)
    return F.datediff(F.to_date(until), F.to_date(time))


def circular_mean(theta: Column) -> Column:
    """Circular mean of an angle aggregate (prelude.icicle:303-324):
    atan2(mean sin, mean cos)."""
    return F.atan2(F.avg(F.sin(theta)), F.avg(F.cos(theta)))


def circular_sd(theta: Column) -> Column:
    """Circular standard deviation: sqrt(-2 ln R̄)."""
    r = F.sqrt(
        F.pow(F.avg(F.sin(theta)), 2) + F.pow(F.avg(F.cos(theta)), 2)
    )
    return F.when(r > 0, F.sqrt(-2.0 * F.log(r)))
