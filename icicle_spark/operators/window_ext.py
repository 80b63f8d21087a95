"""Spark-native window extensions required by the north rule.

The reference has no lag/lead/backfill/sessionization (its windows are
days-before filters only — SURVEY.md §2.5); these are the extensions a
training-data pipeline needs, expressed purely as Catalyst window
functions so they stay inside whole-stage codegen — no Python UDFs.

Scale notes: each helper is ONE window spec => one shuffle on the
partition keys; chained helpers over the same keys reuse the exchange
(Catalyst recognises the matching partitioning). Entity keys are
hash-distributed; a single hot entity is bounded by the sort on its
partition, same invariant as the fold executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _win(entity_cols: list[str], time_col: str, seq_col: str | None):
    order = [F.col(time_col)] + ([F.col(seq_col)] if seq_col else [])
    return W.partitionBy(*entity_cols).orderBy(*order)


def lag_lead(
    df: DataFrame,
    value_col: str,
    entity_cols: list[str] | str,
    time_col: str,
    n: int = 1,
    seq_col: str | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Add ``<value>_lag_n`` / ``<value>_lead_n`` per entity timeline."""
    if isinstance(entity_cols, str):
        entity_cols = [entity_cols]
    w = _win(entity_cols, time_col, seq_col)
    p = prefix or value_col
    return df.withColumn(f"{p}_lag_{n}", F.lag(value_col, n).over(w)).withColumn(
        f"{p}_lead_{n}", F.lead(value_col, n).over(w)
    )


def backfill(
    df: DataFrame,
    value_col: str,
    entity_cols: list[str] | str,
    time_col: str,
    seq_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill nulls with the last non-null value per entity
    (``last(value, ignorenulls=True)`` over an unbounded-preceding
    frame). This is the point-in-time-safe fill: only PAST values flow
    forward, never future ones."""
    if isinstance(entity_cols, str):
        entity_cols = [entity_cols]
    w = _win(entity_cols, time_col, seq_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.last(value_col, ignorenulls=True).over(w),
    )


def sessionize(
    df: DataFrame,
    entity_cols: list[str] | str,
    time_col: str,
    gap_minutes: float = 30.0,
    seq_col: str | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based session ids per entity: a new session starts when the
    time since the previous event exceeds ``gap_minutes``. Implemented
    as the classic cumulative sum of boundary flags — two window
    passes over the SAME partitioning (one exchange total)."""
    if isinstance(entity_cols, str):
        entity_cols = [entity_cols]
    w = _win(entity_cols, time_col, seq_col)
    prev = F.lag(F.col(time_col)).over(w)
    gap_s = F.unix_timestamp(F.col(time_col)) - F.unix_timestamp(prev)
    new_sess = F.when(
        prev.isNull() | (gap_s > int(gap_minutes * 60)), F.lit(1)
    ).otherwise(F.lit(0))
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(out_col, F.sum(new_sess).over(wc))


def scan(
    df: DataFrame,
    agg: Column,
    entity_cols: list[str] | str,
    time_col: str,
    seq_col: str | None = None,
    out_col: str = "scan",
) -> DataFrame:
    """Running aggregate visible at element level — Icicle's
    ``scan`` / LetScan context (reference
    icicle-source/src/Icicle/Source/ToCore/ToCore.hs:235-258):
    cumulative over rows from the stream start to the current fact.

    ``agg`` is any Spark aggregate Column, e.g. ``F.sum("value")``.
    """
    if isinstance(entity_cols, str):
        entity_cols = [entity_cols]
    w = _win(entity_cols, time_col, seq_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(out_col, agg.over(w))
