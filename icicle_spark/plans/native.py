"""Native plan compiler — pure DataFrame ops, no Python UDFs.

Compiles a fold ``Plan`` into a single Catalyst-optimised aggregation:

    facts  --filter(time < qtime)-->  conditional aggregates per feature
           --(chord: broadcast join with query-time table first)-->
           --right join entity/chord spine--> init-fill for empty groups

Every feature becomes one conditional aggregate expression
(``agg(when(visible_f, expr_f))``), so N fused features still read the
input ONCE — the same one-pass guarantee the reference gets from Core
fusion (/root/reference/icicle-core/src/Icicle/Core/Program/Fusion.hs:37-81)
but here it's just columnar conditional aggregation, fully inside
whole-stage codegen with map-side partial aggregation (a capability the
``applyInPandas`` executor cannot have, since an entity's facts must
meet in one place).  Prefer this path whenever the plan allows; fall
back to ``plans.executor`` for latest-N / group-map / custom folds.

Scale: snapshot filters push to the parquet/Iceberg scan (partition
pruning on time); the chord table is broadcast; the only shuffle is the
partial->final aggregation exchange on (entity[, query_time]), which is
skew-immune because partial aggregation collapses hot entities map-side.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from icicle_spark.plans.ir import Agg, Feature, Plan

_NATIVE_AGGS = {
    Agg.SUM, Agg.COUNT, Agg.MEAN, Agg.MIN, Agg.MAX, Agg.VARIANCE, Agg.SD,
    Agg.NEWEST, Agg.OLDEST, Agg.ANY, Agg.ALL, Agg.COUNT_DISTINCT,
    Agg.DISTINCT_VALUES, Agg.MAX_BY, Agg.MIN_BY,
}


def native_supported(plan: Plan) -> bool:
    return all(
        isinstance(f.agg, Agg)
        and f.agg in _NATIVE_AGGS
        and f.latest is None
        and f.group is None
        and f.distinct is None
        and (isinstance(f.expr, str))
        and (f.where is None or isinstance(f.where, str))
        and (f.by is None or isinstance(f.by, str))
        for f in plan.features
    )


def _agg_col(f: Feature, cond: Column, tcol: str) -> Column:
    """One conditional aggregate for one feature."""
    x = F.when(cond, F.expr(f.expr))
    agg = f.agg
    if agg is Agg.SUM:
        out = F.coalesce(F.sum(x), F.lit(0.0))
    elif agg is Agg.COUNT:
        out = F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
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
        # newest = value at the latest visible time (prelude.icicle:21-24)
        out = F.max_by(x, F.when(cond, F.col(tcol)))
    elif agg is Agg.OLDEST:
        out = F.min_by(x, F.when(cond, F.col(tcol)))
    elif agg is Agg.ANY:
        out = F.coalesce(F.bool_or(x.cast("boolean")), F.lit(False))
    elif agg is Agg.ALL:
        out = F.coalesce(F.bool_and(x.cast("boolean")), F.lit(True))
    elif agg is Agg.COUNT_DISTINCT:
        out = F.count_distinct(x)
    elif agg is Agg.DISTINCT_VALUES:
        out = F.sort_array(F.collect_set(x.cast("string")))
    elif agg is Agg.MAX_BY:
        out = F.max_by(x, F.when(cond, F.expr(f.by)))
    elif agg is Agg.MIN_BY:
        out = F.min_by(x, F.when(cond, F.expr(f.by)))
    else:  # pragma: no cover
        raise ValueError(f"not native: {agg}")
    if not f.skip_nulls:
        # Possibly semantics: a null (error/tombstone) element in the
        # visible slice poisons the aggregate (reference
        # Transform/ReifyPossibility.hs error propagation).
        poison = F.max(F.when(cond & F.expr(f.expr).isNull(), 1).otherwise(0))
        out = F.when(poison == 1, F.lit(None)).otherwise(out)
    return out.alias(f.name)


def _visibility(f: Feature, plan: Plan, qt: Column, tcol: str) -> Column:
    cond = F.col(tcol) < qt  # strict: zero temporal leakage
    if f.window is not None:
        cond &= F.col(tcol) >= qt - F.expr(
            f"INTERVAL {f.window.newer_than_days} DAYS"
        )
        if f.window.older_than_days:
            cond &= F.col(tcol) <= qt - F.expr(
                f"INTERVAL {f.window.older_than_days} DAYS"
            )
    if f.where is not None:
        cond &= F.coalesce(F.expr(f.where).cast("boolean"), F.lit(False))
    if plan.tombstone_col is not None:
        pass  # tombstone handled as null expr -> poison/skip
    return cond


_INIT: dict[Agg, Any] = {
    Agg.SUM: 0.0, Agg.COUNT: 0, Agg.ANY: False, Agg.ALL: True,
    Agg.COUNT_DISTINCT: 0,
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


def compile_native(
    facts: DataFrame,
    plan: Plan,
    snapshot: Any | None = None,
    chords: DataFrame | None = None,
) -> DataFrame:
    """Compile and return the result DataFrame (lazy)."""
    if (snapshot is None) == (chords is None):
        raise ValueError("exactly one of snapshot / chords required")
    if not native_supported(plan):
        raise ValueError("plan not native-compilable; use plans.executor")
    plan = plan.condensed()
    ecol, tcol = plan.entity_col, plan.time_col

    if plan.tombstone_col is not None and plan.tombstone_col in facts.columns:
        # poison tombstoned values: every value column a feature might
        # read becomes null on tombstone rows. We rewrite lazily by
        # nulling the expr at visibility time instead — cheapest is a
        # projection that nulls all non-key columns on tombstone rows.
        tb = F.coalesce(F.col(plan.tombstone_col).cast("boolean"), F.lit(False))
        keep = {ecol, tcol, plan.tombstone_col}
        facts = facts.select(
            *[
                F.when(~tb, F.col(c)).otherwise(F.lit(None)).alias(c)
                if c not in keep
                else F.col(c)
                for c in facts.columns
            ]
        )

    if snapshot is not None:
        qt = F.lit(snapshot).cast("timestamp")
        aggs = [
            _agg_col(f, _visibility(f, plan, qt, tcol), tcol)
            for f in plan.features
        ]
        # pre-filter to the widest visible range -> parquet pushdown /
        # partition pruning; per-feature windows re-check inside.
        agged = (
            facts.where(F.col(tcol) < qt)
            .groupBy(ecol)
            .agg(F.count(F.lit(1)).alias("__n"), *aggs)
        )
        spine = facts.select(ecol).distinct()
        out = spine.join(agged, on=ecol, how="left")
        return _fill_inits(out, plan, "__n")

    qt = F.col("query_time")
    keys = [ecol, "query_time"] + (["label"] if "label" in chords.columns else [])
    aggs = [_agg_col(f, _visibility(f, plan, qt, tcol), tcol) for f in plan.features]
    joined = facts.join(F.broadcast(chords), on=ecol, how="inner").where(
        F.col(tcol) < qt
    )
    agged = joined.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"), *aggs)
    out = chords.join(agged, on=keys, how="left")
    return _fill_inits(out, plan, "__n")
