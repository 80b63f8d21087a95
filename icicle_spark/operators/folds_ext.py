"""Second-order folds and fact-stream hygiene operators.

* ``group_fold``  — fold over the FINISHED map of a `group` feature
  (reference `group fold (k,v) = g ~> agg`, Context.hs:36,
  ToCore/ToCore.hs:190-220): expressed over the map column with
  higher-order functions, no shuffle.
* ``array_fold``  — fold over an array value (reference
  `array fold v = arr ~>`, Context.hs:35, PrimFoldArray): thin wrapper
  over ``F.aggregate``.
* ``nub_by_key``  — drop CONSECUTIVE duplicate facts per declared key
  (reference InputKey nubbing, ToCore/ToCore.hs:502-616): a lag
  comparison over the entity timeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def group_fold(map_col: Column | str, kind: str) -> Column:
    """Aggregate over a map column's entries.

    kind: 'max_value' | 'min_value' | 'sum_values' | 'n_keys'
          | 'argmax_key' | 'argmin_key'
    """
    kinds = {
        "max_value", "min_value", "sum_values", "n_keys",
        "argmax_key", "argmin_key",
    }
    if kind not in kinds:
        raise ValueError(f"unknown group_fold kind {kind}")
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    entries = F.map_entries(m)
    vals = F.map_values(m)
    if kind == "n_keys":
        return F.size(m).cast("bigint")
    if kind == "sum_values":
        return F.aggregate(vals, F.lit(0.0), lambda a, v: a + v.cast("double"))
    if kind == "max_value":
        return F.array_max(vals)
    if kind == "min_value":
        return F.array_min(vals)
    if kind in ("argmax_key", "argmin_key"):
        # first key (in key-sorted order) achieving the extreme value —
        # deterministic across engines
        target = F.array_max(vals) if kind == "argmax_key" else F.array_min(vals)
        keys = F.transform(
            F.filter(entries, lambda e: e["value"] == target), lambda e: e["key"]
        )
        return F.array_min(keys)
    raise ValueError(f"unknown group_fold kind {kind}")


def array_fold(
    arr: Column | str,
    init: Column,
    step,
    finish=None,
) -> Column:
    """`array fold` — F.aggregate with optional finisher."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.aggregate(a, init, step, finish) if finish else F.aggregate(a, init, step)


def nest_map(map_col: Column | str, sep: str = "|") -> Column:
    """Reshape a flat ``map<'k1<sep>k2', v>`` into nested
    ``map<k1, map<k2, v>>`` — the presentation form of the
    reference's nested groups (repl corpus t02.1: `group a ~> group b
    ~> agg` yields a map of maps). The engine evaluates nested groups
    as ONE composite-key group (a fact's outer key determines its
    bucket, so `group a ~> group b` == group by the (a,b) pair);
    this HOF rebuilds the nested shape JVM-side."""
    m = F.col(map_col) if isinstance(map_col, str) else map_col
    entries = F.map_entries(m)
    outer = F.array_distinct(
        F.transform(entries, lambda e: F.split_part(e["key"], F.lit(sep), F.lit(1)))
    )
    return F.map_from_arrays(
        outer,
        F.transform(
            outer,
            lambda ok: F.map_from_entries(
                F.transform(
                    F.filter(
                        entries,
                        lambda e: F.split_part(e["key"], F.lit(sep), F.lit(1)) == ok,
                    ),
                    lambda e: F.struct(
                        F.split_part(e["key"], F.lit(sep), F.lit(2)).alias("key"),
                        e["value"].alias("value"),
                    ),
                )
            ),
        ),
    )


def nub_by_key(
    facts: DataFrame,
    key_cols: list[str] | str,
    entity_cols: list[str] | str,
    time_col: str,
    seq_col: str | None = None,
) -> DataFrame:
    """Keep a fact only when its key differs from the immediately
    preceding fact's key on the same entity timeline (the reference
    nubs only CONSECUTIVE duplicates, not global ones)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if isinstance(entity_cols, str):
        entity_cols = [entity_cols]
    order = [F.col(time_col)] + ([F.col(seq_col)] if seq_col else [])
    w = W.partitionBy(*entity_cols).orderBy(*order)
    key = F.struct(*[F.col(k) for k in key_cols])
    prev = F.lag(key).over(w)
    return (
        facts.withColumn("__keep", prev.isNull() | (key != prev))
        .where(F.col("__keep"))
        .drop("__keep")
    )
