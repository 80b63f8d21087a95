"""Native plan compiler — pure DataFrame ops, no Python anywhere.

Compiles a fold ``Plan`` into a single-scan Catalyst pipeline. The
feature set is split by execution need:

* mergeable folds + latest-N  — ONE scan, two-stage salted
  aggregation: stage 1 computes constant-size partial states per
  (entity[, query_time], salt-of-seq); stage 2 merges per entity.
  Skew-immune: a hot entity holding 30% of all rows spreads over
  ``_SALT_BUCKETS`` tasks. latest-N rides along because top-N-by-
  (time,seq) is a monoid (local tail in stage 1, merged tail in
  stage 2). Measured alternative: a window-rank implementation of
  latest-N did not finish in 10 minutes on the skewed 8M-row bench
  (one task owns the hot entity's frame); the salted path takes
  seconds.
* non-mergeable aggregates (count_distinct, distinct_values,
  max_by/min_by) — direct conditional aggregation per group key
  (Spark's own partial aggregation handles these).
* numflips — prev-value helper column over an entity-time window,
  then the same conditional aggregation (bounded cost: one sorted
  exchange; avoid mixing with extreme skew, or use the Arrow
  executor).

Fusion: N features still read the input ONCE (the analogue of the
reference's Core fusion,
/root/reference/icicle-core/src/Icicle/Core/Program/Fusion.hs:37-81).

Scale: snapshot filters push to the parquet/Iceberg scan (partition
pruning on time); the chord table broadcasts; exchanges carry only
constant-size states, never raw fact rows. Plans the compiler can't
express (group-maps, custom folds, distinct keys) raise and are
routed to the vectorized Arrow executor by run_plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from icicle_spark.plans.ir import (
    Agg,
    Feature,
    Plan,
    apply_postcomps,
    feature_dtype,
)

_NATIVE_AGGS = {
    Agg.SUM, Agg.COUNT, Agg.MEAN, Agg.MIN, Agg.MAX, Agg.VARIANCE, Agg.SD,
    Agg.NEWEST, Agg.OLDEST, Agg.ANY, Agg.ALL, Agg.COUNT_DISTINCT,
    Agg.DISTINCT_VALUES, Agg.MAX_BY, Agg.MIN_BY, Agg.NUMFLIPS,
    Agg.DECAYED_SUM,
}

# `group k ~> agg` compiles to groupBy(entity, k) + map_from_entries —
# pure Catalyst, two exchanges, no Python (the 100 TB path for maps)
_GROUP_NATIVE_AGGS = {
    Agg.SUM, Agg.COUNT, Agg.MEAN, Agg.MIN, Agg.MAX, Agg.ANY, Agg.ALL,
    Agg.VARIANCE, Agg.SD, Agg.NEWEST, Agg.OLDEST,
}

# `distinct k ~> agg` compiles to a first-per-(entity,k) rank + agg
_DISTINCT_NATIVE_AGGS = {
    Agg.SUM, Agg.COUNT, Agg.MEAN, Agg.MIN, Agg.MAX, Agg.ANY, Agg.ALL,
    Agg.COUNT_DISTINCT, Agg.NEWEST, Agg.OLDEST,
}


def _feature_native(f: Feature) -> bool:
    if not isinstance(f.agg, Agg) or not isinstance(f.expr, str):
        return False
    if f.latest_outer is not None:
        # pre-filter latest frames would need a second rank stage;
        # the fold executors evaluate them instead
        return False
    if f.scans:
        # running-fold element binds need per-row cumulative state;
        # the vectorized executor evaluates them
        return False
    if f.where is not None and not isinstance(f.where, str):
        return False
    if f.filter_let is not None and not all(
        isinstance(e, str) for _, e in f.filter_let
    ):
        return False
    if f.by is not None and not isinstance(f.by, str):
        return False
    if f.group is not None:
        if f.post_group_filter is not None and not (
            isinstance(f.post_group_filter, str) and f.skip_nulls
        ):
            # Possibly-mode post-group filters need row-level poison
            # interplay with the guard — the fold executors handle it
            return False
        if f.group_latest is not None and not f.skip_nulls:
            return False
        if f.pg_before_latest:
            # filter-then-frame per key: the fold executors compose
            # the guard and the frame in stream order
            return False
        return (
            isinstance(f.group, str)
            and f.agg in _GROUP_NATIVE_AGGS
            and f.distinct is None
            and f.latest is None
        )
    if f.agg is Agg.DECAYED_SUM and (
        f.half_life_days is None or f.latest is not None
    ):
        return False
    if f.distinct is not None:
        return (
            isinstance(f.distinct, str)
            and f.agg in _DISTINCT_NATIVE_AGGS
            and f.latest is None
        )
    return f.agg in _NATIVE_AGGS


def native_supported(plan: Plan) -> bool:
    return all(_feature_native(f) for f in plan.features)


def _plain_agg(agg: Agg, x: Column) -> Column:
    if agg is Agg.SUM:
        return F.sum(x.cast("double"))
    if agg is Agg.COUNT:
        return F.count(x)
    if agg is Agg.MEAN:
        return F.avg(x)
    if agg is Agg.MIN:
        return F.min(x.cast("double"))
    if agg is Agg.MAX:
        return F.max(x.cast("double"))
    if agg is Agg.ANY:
        return F.bool_or(x.cast("boolean"))
    if agg is Agg.ALL:
        return F.bool_and(x.cast("boolean"))
    if agg is Agg.VARIANCE:
        return F.var_samp(x.cast("double"))
    if agg is Agg.SD:
        return F.stddev_samp(x.cast("double"))
    raise ValueError(f"not a group-native agg: {agg}")  # pragma: no cover


# per-key value for a key whose every fact was guarded out by a
# post-group filter: the fold's init (executor._EMPTY parity).
# Aggregates absent here are legitimately null over an empty slice
# (mean/min/max/variance/sd/newest/oldest); count is never null.
_GROUP_EMPTY = {
    Agg.SUM: lambda: F.lit(0.0),
    Agg.ANY: lambda: F.lit(False),
    Agg.ALL: lambda: F.lit(True),
}


def _key_str(base: DataFrame, kexpr: str) -> Column:
    """Group-key expression as a STRING map key, matching the Python
    executors' str() casing: Spark casts booleans to 'true'/'false'
    while str(numpy.bool_) is 'True'/'False' — a silent cross-backend
    map-key divergence for `group (value > 0)`-style keys."""
    k = F.expr(kexpr)
    from pyspark.sql.types import BooleanType, DateType, TimestampNTZType, TimestampType

    dtype = base.select(k.alias("__k")).schema[0].dataType
    if isinstance(dtype, BooleanType):
        return F.when(k, F.lit("True")).when(~k, F.lit("False"))
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        # maporder.key_str parity: midnight times render as dates
        return F.when(
            F.date_trunc("DAY", k) == k, F.date_format(k, "yyyy-MM-dd")
        ).otherwise(F.date_format(k, "yyyy-MM-dd HH:mm:ss"))
    if isinstance(dtype, DateType):
        return F.date_format(k, "yyyy-MM-dd")
    return k.cast("string")


def _order_cols(plan: Plan) -> list[Column]:
    cols = [F.col(plan.time_col)]
    if plan.seq_col:
        cols.append(F.col(plan.seq_col))
    return cols


def _agg_col(
    f: Feature, cond: Column, tcol: str, extra: Column | None,
    qt: Column | None = None,
) -> Column:
    """One conditional aggregate for one feature; ``extra`` is the
    helper-column condition (latest rank) to conjoin."""
    if extra is not None:
        cond = cond & extra
    x = F.when(cond, F.expr(f.expr))
    agg = f.agg
    if agg is Agg.SUM:
        out = F.coalesce(F.sum(x), F.lit(0.0))
    elif agg is Agg.COUNT:
        out = F.coalesce(F.sum(F.when(cond & x.isNotNull(), 1).otherwise(0)), F.lit(0))
    elif agg is Agg.MEAN:
        out = F.avg(x)
    elif agg is Agg.MIN:
        out = F.min(x)
    elif agg is Agg.MAX:
        out = F.max(x)
    elif agg is Agg.VARIANCE:
        out = F.var_samp(x)
    elif agg is Agg.SD:
        out = F.stddev_samp(x)
    elif agg is Agg.NEWEST:
        out = F.max_by(x, F.when(cond & x.isNotNull(), F.col(tcol)))
    elif agg is Agg.OLDEST:
        out = F.min_by(x, F.when(cond & x.isNotNull(), F.col(tcol)))
    elif agg is Agg.ANY:
        out = F.coalesce(F.bool_or(x.cast("boolean")), F.lit(False))
    elif agg is Agg.ALL:
        out = F.coalesce(F.bool_and(x.cast("boolean")), F.lit(True))
    elif agg is Agg.COUNT_DISTINCT:
        out = F.count_distinct(x)
    elif agg is Agg.DISTINCT_VALUES:
        out = F.sort_array(F.collect_set(x.cast("string")))
    elif agg in (Agg.MAX_BY, Agg.MIN_BY):
        # ties on the key keep the FIRST fact in stream order, like the
        # reference's strict-compare fold (prelude.icicle:172-191):
        # composite key (by, ±time) makes earliest win either way.
        t_us = F.unix_micros(F.col(tcol).cast("timestamp"))
        if agg is Agg.MIN_BY:
            key = F.struct(F.expr(f.by).alias("b"), t_us.alias("t"))
            out = F.min_by(x, F.when(cond, key))
        else:
            key = F.struct(F.expr(f.by).alias("b"), (-t_us).alias("t"))
            out = F.max_by(x, F.when(cond, key))
    elif agg is Agg.DECAYED_SUM:
        import math

        lam = math.log(2.0) / (float(f.half_life_days) * 86_400.0)
        age_s = (
            F.unix_micros(qt.cast("timestamp"))
            - F.unix_micros(F.col(tcol).cast("timestamp"))
        ).cast("double") / F.lit(1e6)
        out = F.coalesce(
            F.sum(
                F.when(cond, F.expr(f.expr).cast("double") * F.exp(-F.lit(lam) * age_s))
            ),
            F.lit(0.0),
        )
    elif agg is Agg.NUMFLIPS:
        # __prev_<name> holds the previous matching value (window stage)
        prev = F.col(f"__prev_{f.name}")
        flip = F.when(
            cond & prev.isNotNull() & (F.expr(f.expr) != prev), 1
        ).otherwise(0)
        out = F.coalesce(F.sum(flip), F.lit(0))
    else:  # pragma: no cover
        raise ValueError(f"not native: {agg}")
    if not f.skip_nulls and agg is not Agg.COUNT:
        # Possibly semantics: a null (error/tombstone) element in the
        # final visible slice poisons the aggregate.
        poison = F.max(F.when(cond & F.expr(f.expr).isNull(), 1).otherwise(0))
        out = F.when(poison == 1, F.lit(None)).otherwise(out)
    elif not f.skip_nulls:
        poison = F.max(F.when(cond & F.expr(f.expr).isNull(), 1).otherwise(0))
        out = F.when(poison == 1, F.lit(None)).otherwise(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
        )
    return out.alias(f.name)


def prepare_facts(facts: DataFrame, plan: Plan) -> DataFrame:
    """The shared Catalyst-side fact preamble: null every non-key
    column on tombstoned facts (they contribute null elements — error
    values, doc/design/tombstones.md:56-73), then materialize
    filter_let binds (which therefore bind null on tombstoned facts,
    failing the Some pattern). Used by compile_native AND the
    resumable-fold paths so both see identical element semantics."""
    ecol, tcol = plan.entity_col, plan.time_col
    if plan.tombstone_col is not None and plan.tombstone_col in facts.columns:
        tb = F.coalesce(F.col(plan.tombstone_col).cast("boolean"), F.lit(False))
        keep = {ecol, tcol, plan.tombstone_col, plan.seq_col}
        facts = facts.select(
            *[
                F.when(~tb, F.col(c)).otherwise(F.lit(None)).alias(c)
                if c not in keep
                else F.col(c)
                for c in facts.columns
            ]
        )
    return _with_binds(facts, plan)


def _with_binds(facts: DataFrame, plan: Plan) -> DataFrame:
    """Materialize every filter_let bind as a physical column (one
    projection — Catalyst folds it into the scan stage). Must run
    AFTER tombstone nulling so tombstoned facts bind to null and the
    Some-pattern drops them."""
    added: set[str] = set()
    for f in plan.features:
        for b, e in (f.filter_let or ()):
            if b in added:
                continue  # plan validation pinned one expr per name
            if b in facts.columns:
                raise ValueError(
                    f"filter_let bind {b!r} shadows a fact column"
                )
            facts = facts.withColumn(b, F.expr(e))
            added.add(b)
    return facts


def _visibility(
    f: Feature, qt: Column, tcol: str, include_filters: bool = True
) -> Column:
    """Per-feature visibility condition. ``include_filters=False``
    stops after the time/window stage — the pre-filter frame an outer
    latest buffer truncates (Feature.latest_outer)."""
    cond = F.col(tcol) < qt  # strict: zero temporal leakage
    if f.window is not None:
        cond &= F.col(tcol) >= qt - F.expr(
            f.window.sql_interval(f.window.newer_than_days)
        )
        if f.window.older_than_days:
            cond &= F.col(tcol) <= qt - F.expr(
                f.window.sql_interval(f.window.older_than_days)
            )
    if not include_filters:
        return cond
    if f.filter_let is not None:
        # `filter let Some b = e`: the pattern fails on null binds.
        # Bind columns are materialized on the facts AFTER tombstone
        # nulling (compile_native / errors handle raw-tombstone cases),
        # so a tombstoned fact's bind is null and drops here too.
        for b, _ in f.filter_let:
            cond &= F.col(b).isNotNull()
    if f.where is not None:
        cond &= F.coalesce(F.expr(f.where).cast("boolean"), F.lit(False))
    return cond


_INIT: dict[Agg, Any] = {
    Agg.DECAYED_SUM: 0.0,
    Agg.SUM: 0.0, Agg.COUNT: 0, Agg.ANY: False, Agg.ALL: True,
    Agg.COUNT_DISTINCT: 0, Agg.NUMFLIPS: 0,
}


def _fill_inits(out: DataFrame, plan: Plan, marker: str) -> DataFrame:
    """Entities/chords with zero visible facts get fold init values
    (the empty-fold path — reference Core/Eval/Stream.hs:76-99)."""
    for f in plan.features:
        if isinstance(f.agg, Agg) and f.agg in _INIT:
            out = out.withColumn(
                f.name,
                F.when(F.col(marker).isNull(), F.lit(_INIT[f.agg])).otherwise(
                    F.col(f.name)
                ),
            )
        elif isinstance(f.agg, Agg) and f.agg is Agg.DISTINCT_VALUES:
            out = out.withColumn(
                f.name,
                F.when(
                    F.col(marker).isNull(), F.array().cast("array<string>")
                ).otherwise(F.col(f.name)),
            )
    return out.drop(marker)


def _helper_stage(
    df: DataFrame, plan: Plan, qt: Column, part_keys: list[str]
) -> tuple[DataFrame, dict[str, Column]]:
    """Add per-feature window helper columns; returns (df, extra_conds)."""
    extras: dict[str, Column] = {}
    order = _order_cols(plan)
    w_fwd = (
        W.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    w_back = (
        W.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    new_cols: list[tuple[str, Column]] = []
    for f in plan.features:
        cond = _visibility(f, qt, plan.time_col)
        if f.latest is not None:
            rank_cond = cond
            if f.skip_nulls:
                # skip_nulls drops nulls BEFORE the latest-N buffer
                rank_cond = cond & F.expr(f.expr).isNotNull()
            col = f"__rank_{f.name}"
            new_cols.append(
                (col, F.sum(F.when(rank_cond, 1).otherwise(0)).over(w_fwd))
            )
            extras[f.name] = (F.col(col) <= f.latest) & (
                rank_cond if f.skip_nulls else F.lit(True)
            )
        if f.agg is Agg.NUMFLIPS:
            new_cols.append(
                (
                    f"__prev_{f.name}",
                    F.last(F.when(cond, F.expr(f.expr)), ignorenulls=True).over(
                        w_back
                    ),
                )
            )
    for name, col in new_cols:
        df = df.withColumn(name, col)
    return df, extras


_SALT_BUCKETS = 64


def _tail_slice(arr: Column, n: int) -> Column:
    """Last n elements of an array (safe when size < n)."""
    return F.slice(arr, F.greatest(F.size(arr) - (n - 1), F.lit(1)), n)


def _finalize_latest(f: Feature, arr: Column) -> Column:
    """Fold the merged last-N struct array into the feature value."""
    vs = F.transform(arr, lambda x: x["v"])
    n = F.size(arr)
    agg = f.agg
    if agg is Agg.SUM:
        out = F.coalesce(
            F.aggregate(vs, F.lit(0.0), lambda a, v: a + v.cast("double")),
            F.lit(0.0),
        )
    elif agg is Agg.COUNT:
        out = F.size(F.filter(vs, lambda v: v.isNotNull())).cast("bigint")
    elif agg is Agg.MEAN:
        out = F.when(
            n > 0,
            F.aggregate(vs, F.lit(0.0), lambda a, v: a + v.cast("double")) / n,
        )
    elif agg is Agg.MIN:
        out = F.array_min(vs)
    elif agg is Agg.MAX:
        out = F.array_max(vs)
    elif agg is Agg.NEWEST:
        out = F.when(n > 0, F.element_at(arr, -1)["v"])
    elif agg is Agg.OLDEST:
        out = F.when(n > 0, F.element_at(arr, 1)["v"])
    elif agg is Agg.VARIANCE or agg is Agg.SD:
        s = F.aggregate(vs, F.lit(0.0), lambda a, v: a + v.cast("double"))
        s2 = F.aggregate(
            vs, F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
        )
        var = F.when(n > 1, (s2 - s * s / n) / (n - 1))
        out = F.sqrt(var) if agg is Agg.SD else var
    elif agg is Agg.ANY:
        out = F.coalesce(
            F.exists(vs, lambda v: v.cast("boolean")), F.lit(False)
        )
    elif agg is Agg.ALL:
        out = F.coalesce(
            F.forall(vs, lambda v: v.cast("boolean")), F.lit(True)
        )
    elif agg is Agg.COUNT_DISTINCT:
        out = F.size(F.array_distinct(F.filter(vs, lambda v: v.isNotNull()))).cast(
            "bigint"
        )
    elif agg is Agg.DISTINCT_VALUES:
        out = F.array_sort(
            F.array_distinct(F.transform(vs, lambda v: v.cast("string")))
        )
    elif agg is Agg.MAX_BY or agg is Agg.MIN_BY:
        bs = F.transform(arr, lambda x: x["b"])
        target = F.array_max(bs) if agg is Agg.MAX_BY else F.array_min(bs)
        out = F.element_at(
            F.filter(arr, lambda x: x["b"] == target), 1
        )["v"]
    # DECAYED_SUM + latest intentionally has no arm: _feature_native
    # rejects the combination, so it routes to the executor fallback;
    # the final else raises rather than leaving a half-wired branch.
    elif agg is Agg.NUMFLIPS:
        pair = F.aggregate(
            vs,
            F.struct(F.lit(None).cast("string").alias("prev"), F.lit(0).alias("k")),
            lambda acc, v: F.struct(
                v.cast("string").alias("prev"),
                F.when(
                    acc["prev"].isNotNull() & (v.cast("string") != acc["prev"]),
                    acc["k"] + 1,
                ).otherwise(acc["k"]).alias("k"),
            ),
        )
        out = pair["k"].cast("bigint")
    else:  # pragma: no cover
        raise ValueError(f"latest does not support {agg}")
    if not f.skip_nulls:
        poison = F.exists(vs, lambda v: v.isNull())
        out = F.when(poison, F.lit(None)).otherwise(out)
    return out


def _merge_final(f: Feature, c: Column) -> Column:
    """Aggregate-merge partial fold states (resume._state_expr shape)
    across salt buckets and finalize — the N-way version of
    resume._merge_expr for time-independent folds."""
    p = F.coalesce(F.bool_or(c["p"]), F.lit(False))
    agg = f.agg
    if agg in (Agg.SUM, Agg.DECAYED_SUM):
        # decay states across salt buckets share the same query time,
        # so the merge is a plain sum of the weighted partials
        out = F.coalesce(F.sum(c["s"]), F.lit(0.0))
    elif agg is Agg.COUNT:
        out = F.coalesce(F.sum(c["c"]), F.lit(0)).cast("bigint")
    elif agg is Agg.MEAN:
        n = F.sum(c["c"])
        out = F.when(n > 0, F.sum(c["s"]) / n)
    elif agg is Agg.MIN:
        out = F.min(c["m"])
    elif agg is Agg.MAX:
        out = F.max(c["m"])
    elif agg in (Agg.NEWEST, Agg.OLDEST):
        pick = F.max_by if agg is Agg.NEWEST else F.min_by
        key = F.when(
            c["tv"].isNotNull(), F.struct(c["tv"]["t"].alias("t"), c["tv"]["q"].alias("q"))
        )
        out = pick(c["tv"], key)["v"]
    elif agg is Agg.ANY:
        out = F.coalesce(F.bool_or(c["b"]), F.lit(False))
    elif agg is Agg.ALL:
        out = F.coalesce(F.bool_and(c["b"]), F.lit(True))
    elif agg in (Agg.VARIANCE, Agg.SD):
        n = F.sum(c["n"])
        s = F.sum(c["s"])
        s2 = F.sum(c["s2"])
        var = F.when(n > 1, (s2 - s * s / n) / (n - 1))
        out = F.sqrt(var) if agg is Agg.SD else var
    else:  # pragma: no cover
        raise ValueError(f"not mergeable: {agg}")
    if not f.skip_nulls:
        out = F.when(p, F.lit(None)).otherwise(out)
    return out


def _two_stage(
    base: DataFrame,
    plan: Plan,
    mergeable: list[Feature],
    latest_feats: list[Feature],
    qt: Column,
    keys: list[str] | None = None,
) -> DataFrame:
    """ONE scan for all mergeable + latest features: stage 1 partials
    per (entity, salt-of-seq), stage 2 merge per entity. The exchange
    carries only constant-size states — skew-immune and single-pass
    over the input (the multi-subtree alternative re-scans the table
    once per feature family, 3-6x the I/O at 100 TB)."""
    from icicle_spark.plans.resume import _state_expr

    ecol, tcol = plan.entity_col, plan.time_col
    scol = plan.seq_col or tcol
    # salt MATERIALIZES as a column: the rank window partitions and
    # the stage-1 groupBy then share one attribute, so Catalyst
    # satisfies the aggregate's distribution with the window's
    # exchange instead of re-shuffling all rows a second time
    # (guide §2.4 — plan verified: Exchange(entity, salt) appears
    # once, reused by Window and HashAggregate)
    base = base.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(scol)), F.lit(_SALT_BUCKETS))
    )
    salt = F.col("__salt")
    s1_aggs: list[Column] = []
    s2_aggs: list[Column] = []
    for f in mergeable:
        s1_aggs.append(
            _state_expr(f, plan, _visibility(f, qt, tcol), qt).alias(f"__st_{f.name}")
        )
        s2_aggs.append(_merge_final(f, F.col(f"__st_{f.name}")).alias(f.name))
    for f in latest_feats:
        cond = _visibility(f, qt, tcol)
        if f.skip_nulls:
            cond = cond & F.expr(f.expr).isNotNull()
        fields = [
            F.col(tcol).alias("t"),
            F.col(scol).cast("double").alias("s"),
            F.expr(f.expr).alias("v"),
        ]
        if f.by is not None:
            fields.append(F.expr(f.by).alias("b"))
        keep = cond & (F.col(f"__rk_{f.name}") <= f.latest)
        s1_aggs.append(
            F.array_sort(
                F.collect_list(F.when(keep, F.struct(*fields)))
            ).alias(f"__p_{f.name}")
        )
        merged = _tail_slice(
            F.array_sort(F.flatten(F.collect_list(F.col(f"__p_{f.name}")))),
            f.latest,
        )
        s2_aggs.append(_finalize_latest(f, merged).alias(f.name))
    keys = keys or [ecol]
    if latest_feats:
        # Rank stage: a salted exchange + Tungsten sort, then an O(n)
        # running conditional count from the NEWEST row backwards =
        # rank-from-end among each feature's own cond rows. The
        # collect_list in stage 1 then holds at most N structs per
        # (entity, salt) — object churn is bounded, unlike collecting
        # the whole bucket (measured 85% of the fused pass) or an
        # unbounded-following window frame (did not finish on the hot
        # entity).
        w_desc = (
            W.partitionBy(*[F.col(k) for k in keys], salt)
            .orderBy(F.desc(tcol), F.desc(scol))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        ranked = base
        for f in latest_feats:
            cond = _visibility(f, qt, tcol)
            if f.skip_nulls:
                cond = cond & F.expr(f.expr).isNotNull()
            ranked = ranked.withColumn(
                f"__rk_{f.name}",
                F.sum(F.when(cond, 1).otherwise(0)).over(w_desc),
            )
        base = ranked
    s1 = base.groupBy(*[F.col(k) for k in keys], salt).agg(*s1_aggs)
    return s1.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nl"), *s2_aggs)


def _compile_scoped(
    spine: DataFrame,
    base: DataFrame,
    plan: Plan,
    qt: Column,
    keys: list[str],
) -> DataFrame:
    """Shared snapshot/chord compilation after visibility is set up:
    split features into mergeable-plain + latest (single-scan salted
    two-stage), direct aggregates, and numflips (window helpers)."""
    from icicle_spark.plans.resume import _STATEFUL

    ecol, tcol = plan.entity_col, plan.time_col
    group_feats = [f for f in plan.features if f.group is not None]
    dist_feats = [
        f for f in plan.features if f.distinct is not None and f.group is None
    ]
    scalar_feats = [
        f for f in plan.features if f.group is None and f.distinct is None
    ]
    latest_feats = [f for f in scalar_feats if f.latest is not None]
    flip_feats = [
        f for f in scalar_feats
        if f.agg is Agg.NUMFLIPS and f.latest is None
    ]
    plain_feats = [
        f for f in scalar_feats
        if f.latest is None and f.agg is not Agg.NUMFLIPS
    ]
    mergeable = [
        f for f in plain_feats
        if f.agg in _STATEFUL and f.agg is not Agg.NUMFLIPS
    ]
    direct_feats = [f for f in plain_feats if f not in mergeable]
    out = spine
    if latest_feats:
        lat = _two_stage(base, plan, mergeable, latest_feats, qt, keys)
        out = out.join(lat, on=keys, how="left")
        # init-fill ONLY rows absent from the sub-result (no visible
        # facts at all) — a poisoned null stays null.
        for f in latest_feats + mergeable:
            if f.agg in _INIT:
                out = out.withColumn(
                    f.name,
                    F.when(
                        F.col("__nl").isNull(), F.lit(_INIT[f.agg])
                    ).otherwise(F.col(f.name)),
                )
        out = out.drop("__nl")
    else:
        direct_feats = plain_feats
    if direct_feats:
        aggs = [
            _agg_col(f, _visibility(f, qt, tcol), tcol, None, qt)
            for f in direct_feats
        ]
        agged = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"), *aggs)
        out = out.join(agged, on=keys, how="left")
        out = _fill_inits(
            out,
            Plan(direct_feats, entity_col=ecol, time_col=tcol,
                 seq_col=plan.seq_col),
            "__n",
        )
    if flip_feats:
        fl_plan = Plan(
            flip_feats, entity_col=ecol, time_col=tcol, seq_col=plan.seq_col
        )
        fbase, _ = _helper_stage(base, fl_plan, qt, keys)
        aggs = [
            _agg_col(f, _visibility(f, qt, tcol), tcol, None, qt)
            for f in flip_feats
        ]
        agged = fbase.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nf"), *aggs)
        out = out.join(agged, on=keys, how="left")
        out = _fill_inits(out, fl_plan, "__nf")
    # FUSE group features that share (group key, window, where,
    # filter_let) under plain skip_nulls semantics: one per-(entity,
    # key) aggregate and one map assembly evaluate ALL of them, where
    # the per-feature loop below would run the whole two-exchange
    # pipeline once per feature (guide §1.2/§2.4 — the group_fold
    # queries carry 2+ features over one key; measured ~2x on the
    # grouped family). Null elements ride through as nulls instead of
    # being pre-filtered: every _GROUP_NATIVE_AGGS aggregate skips
    # nulls (NEWEST/OLDEST via a nulled order key), and a key's map
    # slot materializes only when that feature saw a non-null element
    # (__n > 0) — exactly the key set the filtered single-feature
    # plan produces.
    fusable: dict[tuple, list[Feature]] = {}
    fused_feats: list[Feature] = []
    for f in group_feats:
        if (
            f.skip_nulls
            and f.post_group_filter is None
            and f.group_latest is None
        ):
            sig = (f.group, repr(f.window), f.where, repr(f.filter_let))
            fusable.setdefault(sig, []).append(f)
    for sig, batch in fusable.items():
        if len(batch) < 2:
            continue
        fused_feats.extend(batch)
        f0 = batch[0]
        gk = _key_str(base, f0.group)
        rows = base.where(
            _visibility(f0, qt, tcol) & F.expr(f0.group).isNotNull()
        ).select(
            *[F.col(k) for k in keys],
            gk.alias("__gk"),
            F.expr(f0.group).alias("__gkr"),
            *[F.expr(f.expr).alias(f"__gv{i}") for i, f in enumerate(batch)],
            F.struct(*_order_cols(plan)).alias("__gord"),
        )
        per_aggs: list[Column] = []
        for i, f in enumerate(batch):
            gv = F.col(f"__gv{i}")
            if f.agg in (Agg.NEWEST, Agg.OLDEST):
                pick = F.max_by if f.agg is Agg.NEWEST else F.min_by
                agg_c = pick(
                    gv.cast("double"),
                    F.when(gv.isNotNull(), F.col("__gord")),
                )
            else:
                agg_c = _plain_agg(f.agg, gv)
            per_aggs.append(agg_c.alias(f"__v{i}"))
            per_aggs.append(F.count(gv).alias(f"__n{i}"))
        per_key = rows.groupBy(*keys, "__gk").agg(
            F.min("__gkr").alias("__gkr"), *per_aggs
        )
        map_aggs = [
            F.map_from_entries(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col(f"__n{i}") > 0,
                                F.struct(
                                    F.col("__gkr").alias("r"),
                                    F.col("__gk").alias("k"),
                                    F.col(f"__v{i}").alias("v"),
                                ),
                            )
                        )
                    ),
                    lambda e: F.struct(
                        e["k"].alias("key"), e["v"].alias("value")
                    ),
                )
            ).alias(f.name)
            for i, f in enumerate(batch)
        ]
        m = per_key.groupBy(*keys).agg(*map_aggs)
        out = out.join(m, on=keys, how="left")
        for f in batch:
            val = F.coalesce(
                F.col(f.name), F.expr("map()").cast(feature_dtype(f))
            )
            out = out.withColumn(
                f.name,
                F.when(F.size(val) <= F.lit(plan.max_group_size), val),
            )
    for f in group_feats:
        if f in fused_feats:
            continue
        # map-of-accumulators as TWO Catalyst exchanges: partial aggs
        # per (entity, key) with map-side combine, then collect the
        # finished entries into a map per entity. Rows are pre-filtered
        # by this feature's full visibility so absent keys never
        # surface with init values (executor parity).
        ex = F.expr(f.expr)
        gk = _key_str(base, f.group)
        pgf = f.post_group_filter
        # skip_nulls (enforced by the support gate) drops null values
        # AND null group keys, like the Arrow executors
        ok = ex.isNotNull() & F.expr(f.group).isNotNull()
        if f.skip_nulls and pgf is not None:
            # post-group filter (t02-groups:11-13, ToCore/Fold.hs:
            # 275-285): every visible fact ESTABLISHES its key — only
            # the fold step is guarded, so fully-filtered keys emit
            # the fold's init. A null element still establishes but
            # never reaches the guarded step (skip_nulls).
            rows = base.where(
                _visibility(f, qt, tcol) & F.expr(f.group).isNotNull()
            ).select(
                *[F.col(k) for k in keys],
                gk.alias("__gk"),
                F.expr(f.group).alias("__gkr"),
                ex.alias("__gv"),
                (
                    F.coalesce(F.expr(pgf).cast("boolean"), F.lit(False))
                    & ex.isNotNull()
                ).alias("__pgok"),
                F.lit(0).alias("__gp"),
                F.struct(*_order_cols(plan)).alias("__gord"),
            )
        elif f.skip_nulls:
            # skip_nulls: null elements / null keys silently drop
            rows = base.where(_visibility(f, qt, tcol) & ok).select(
                *[F.col(k) for k in keys],
                gk.alias("__gk"),
                F.expr(f.group).alias("__gkr"),
                ex.alias("__gv"),
                F.lit(True).alias("__pgok"),
                F.lit(0).alias("__gp"),
                F.struct(*_order_cols(plan)).alias("__gord"),
            )
        else:
            # Possibly semantics: ANY visible null element or null
            # key poisons the WHOLE map (executor parity, t03.1) —
            # keep the row as a poison marker instead of dropping it
            rows = base.where(_visibility(f, qt, tcol)).select(
                *[F.col(k) for k in keys],
                F.when(ok, gk).alias("__gk"),
                F.when(ok, F.expr(f.group)).alias("__gkr"),
                F.when(ok, ex).alias("__gv"),
                F.lit(True).alias("__pgok"),
                F.when(ok, 0).otherwise(1).alias("__gp"),
                F.struct(*_order_cols(plan)).alias("__gord"),
            )
        if f.group_latest is not None:
            # `group k ~> latest N`: frame the last N facts PER KEY
            # (t17-latest:4-8) before the guarded fold. The rank
            # window partitions on the same (keys, __gk) the per-key
            # aggregate groups on, so Catalyst reuses one exchange.
            wgl = W.partitionBy(
                *[F.col(k) for k in keys], F.col("__gk")
            ).orderBy(F.col("__gord").desc())
            rows = (
                rows.withColumn("__rn", F.row_number().over(wgl))
                .where(F.col("__rn") <= F.lit(f.group_latest))
                .drop("__rn")
            )
        gv = (
            F.when(F.col("__pgok"), F.col("__gv"))
            if pgf is not None
            else F.col("__gv")
        )
        if f.agg in (Agg.NEWEST, Agg.OLDEST):
            # value at the stream-order extreme per key (fold1 pair
            # semantics, prelude.icicle newest/oldest): arg-extreme
            # on the (time, seq) order struct; guarded-out rows get a
            # null order and are ignored by max_by/min_by
            pick = F.max_by if f.agg is Agg.NEWEST else F.min_by
            per_key_agg = pick(
                F.col("__gv").cast("double"),
                F.when(F.col("__pgok"), F.col("__gord"))
                if pgf is not None
                else F.col("__gord"),
            )
        else:
            per_key_agg = _plain_agg(f.agg, gv)
        per_key = rows.groupBy(*keys, "__gk").agg(
            per_key_agg.alias("__v"), F.max("__gp").alias("__gp"),
            F.min("__gkr").alias("__gkr"),
        )
        if pgf is not None and f.agg in _GROUP_EMPTY:
            # a fully-guarded key's slot holds the fold's init
            # (executor _EMPTY parity: the t02 'counts of zero')
            per_key = per_key.withColumn(
                "__v", F.coalesce(F.col("__v"), _GROUP_EMPTY[f.agg]())
            )
        # Data.Map iteration order (plans/maporder.py): sort entries
        # by the TYPED key before assembling the map — `group fold
        # (k, v)` postcomps and rendered maps then iterate exactly as
        # the reference's Data.Map accumulator does
        m = per_key.groupBy(*keys).agg(
            F.map_from_entries(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__gk").isNotNull(),
                                F.struct(
                                    F.col("__gkr").alias("r"),
                                    F.col("__gk").alias("k"),
                                    F.col("__v").alias("v"),
                                ),
                            )
                        )
                    ),
                    lambda e: F.struct(e["k"].alias("key"), e["v"].alias("value")),
                )
            ).alias(f.name),
            F.max("__gp").alias(f"__poison_{f.name}"),
        )
        out = out.join(m, on=keys, how="left")
        val = F.coalesce(
            F.col(f.name), F.expr("map()").cast(feature_dtype(f))
        )
        # maxMapSize analogue: overflow -> error value (null);
        # Possibly poison -> null map
        out = out.withColumn(
            f.name,
            F.when(
                (F.size(val) <= F.lit(plan.max_group_size))
                & (F.coalesce(F.col(f"__poison_{f.name}"), F.lit(0)) == 0),
                val,
            ),
        ).drop(f"__poison_{f.name}")
    for f in dist_feats:
        # `distinct k`: first fact per (entity, key) in stream order
        # (ToCore/Fold.hs:477-559), then a plain aggregate over those
        # firsts — one rank exchange + one agg exchange.
        ex = F.expr(f.expr)
        vis = _visibility(f, qt, tcol)
        key_ok = F.expr(f.distinct).isNotNull()
        # skip_nulls drops null elements before the firsts pass; in
        # Possibly mode they stay — a null FIRST poisons via _agg_col
        cond = vis & key_ok & (ex.isNotNull() if f.skip_nulls
                               else F.lit(True))
        w = W.partitionBy(
            *[F.col(k) for k in keys], F.expr(f.distinct)
        ).orderBy(*_order_cols(plan))
        firsts = (
            base.where(cond)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
        )
        marker = f"__nd_{f.name}"
        agged = firsts.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(marker),
            _agg_col(f, F.lit(True), tcol, None, qt),
        )
        # bounded distinct state (maxMapSize, t03 ':set max-map-size'):
        # more distinct keys than the bound -> error value (null);
        # marker stays non-null so _fill_inits won't resurrect an init
        agged = agged.withColumn(
            f.name,
            F.when(
                F.col(marker) <= F.lit(plan.max_group_size), F.col(f.name)
            ),
        )
        out = out.join(agged, on=keys, how="left")
        out = _fill_inits(
            out,
            Plan([f], entity_col=ecol, time_col=tcol, seq_col=plan.seq_col),
            marker,
        )
        if not f.skip_nulls:
            # a null distinct KEY anywhere visible poisons the whole
            # fold (Possibly key, t03.1 — executor parity)
            kp = f"__kp_{f.name}"
            pois = base.where(vis & ~key_ok).groupBy(*keys).agg(
                F.lit(1).alias(kp)
            )
            out = out.join(pois, on=keys, how="left").withColumn(
                f.name,
                F.when(F.col(kp).isNull(), F.col(f.name)),
            ).drop(kp)
    return out.select(*keys, *[f.name for f in plan.features])


def compile_native(
    facts: DataFrame,
    plan: Plan,
    snapshot: Any | None = None,
    chords: DataFrame | None = None,
    broadcast_chords: bool = True,
) -> DataFrame:
    """Compile and return the result DataFrame (lazy).

    ``broadcast_chords=False`` joins the chord table with a shuffle
    join instead of a broadcast — required when the chord table is
    itself at data scale (e.g. one chord per entity at 10^12 rows);
    AQE's skew-join splitting then spreads a hot entity's join across
    tasks, and the downstream two-stage aggregation is salted anyway.
    """
    if (snapshot is None) == (chords is None):
        raise ValueError("exactly one of snapshot / chords required")
    if not native_supported(plan):
        raise ValueError("plan not native-compilable; use plans.executor")
    from icicle_spark.plans.ir import resolve_dtypes

    # idempotent when run_plan already resolved: keeps direct
    # compile_native callers on the same output typing (int folds
    # stay integral) as every run_plan strategy
    plan = resolve_dtypes(plan, facts)
    full = plan
    plan, _dups = plan.stripped().cse()
    ecol, tcol = plan.entity_col, plan.time_col

    facts = prepare_facts(facts, plan)

    def _finalize(out: DataFrame) -> DataFrame:
        # re-emit CSE-shared fold columns, then run the postcomp stage
        # (Core/Program/Program.hs:33-36) on the aggregated frame
        for dup, kept in _dups.items():
            out = out.withColumn(dup, F.col(kept))
        now_sql = (
            f"TIMESTAMP '{snapshot}'"
            if snapshot is not None
            else "query_time"
        )
        return apply_postcomps(out, full, now_sql=now_sql)

    if snapshot is not None:
        qt = F.lit(snapshot).cast("timestamp")
        # pre-filter to the visible range -> parquet pushdown /
        # partition pruning; per-feature windows re-check inside.
        base = facts.where(F.col(tcol) < qt)
        spine = facts.select(ecol).distinct()
        return _finalize(_compile_scoped(spine, base, plan, qt, [ecol]))

    qt = F.col("query_time")
    keys = [ecol, "query_time"] + (["label"] if "label" in chords.columns else [])
    rhs = F.broadcast(chords) if broadcast_chords else chords
    base = facts.join(rhs, on=ecol, how="inner").where(
        F.col(tcol) < qt
    )
    return _finalize(_compile_scoped(chords, base, plan, qt, keys))
