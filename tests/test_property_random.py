"""Randomized cross-backend commuting (the Spark analogue of the
reference's QuickCheck EvalCommutes suites,
/root/reference/icicle-compiler/test/Icicle/Test/Avalanche/EvalCommutes.hs):
seeded random plans over seeded random fact tables must agree across
native / vectorized / cogroup backends bit-for-bit (to float
tolerance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from icicle_spark.plans import Agg, Feature, Plan, Window, run_plan

AGG_POOL = [
    Agg.SUM, Agg.COUNT, Agg.MEAN, Agg.MIN, Agg.MAX, Agg.NEWEST,
    Agg.OLDEST, Agg.VARIANCE, Agg.SD, Agg.ANY, Agg.ALL, Agg.NUMFLIPS,
    Agg.COUNT_DISTINCT, Agg.DECAYED_SUM,
]


def random_facts(rng: np.random.Generator, n_rows: int, n_ents: int) -> pd.DataFrame:
    ent = rng.integers(0, n_ents, n_rows)
    secs = rng.integers(0, 120 * 86_400, n_rows)
    # inject ties
    ties = rng.random(n_rows) < 0.1
    secs[ties] = (secs[ties] // 86_400) * 86_400
    vals = rng.normal(50, 20, n_rows).round(2)
    vals[rng.random(n_rows) < 0.05] = np.nan  # nulls / tombstoned values
    flags = rng.integers(0, 2, n_rows).astype(bool)
    pdf = pd.DataFrame(
        {
            "entity": [f"e{i}" for i in ent],
            "time": np.datetime64("2024-01-01") + secs.astype("timedelta64[s]"),
            "value": vals,
            "flag": flags,
            "cat": [f"c{i}" for i in rng.integers(0, 4, n_rows)],
            "seq": np.arange(n_rows, dtype=np.int64),
        }
    )
    return pdf


def random_feature(rng: np.random.Generator, i: int, sql: bool) -> Feature:
    agg = AGG_POOL[rng.integers(0, len(AGG_POOL))]
    expr = "cat" if agg in (Agg.NUMFLIPS, Agg.COUNT_DISTINCT) else (
        "flag" if agg in (Agg.ANY, Agg.ALL) else "value"
    )
    half_life = float(rng.integers(2, 30)) if agg is Agg.DECAYED_SUM else None
    window = None
    if rng.random() < 0.4:
        window = Window(int(rng.integers(5, 90)), unit=rng.choice(["days", "weeks"]))
    latest = int(rng.integers(1, 8)) if rng.random() < 0.3 else None
    if latest is not None and agg in (
        Agg.NUMFLIPS, Agg.ANY, Agg.ALL, Agg.COUNT_DISTINCT,
        Agg.VARIANCE, Agg.SD,
    ):
        latest = None  # keep native/latest support matrix aligned
    where = None
    if rng.random() < 0.3:
        where = "cat = 'c1'" if sql else "cat == 'c1'"
    if agg is Agg.DECAYED_SUM:
        latest = None  # native two-stage computes decay without frames
    return Feature(
        f"f{i}",
        agg,
        expr,
        where=where,
        window=window,
        latest=latest,
        skip_nulls=bool(rng.random() < 0.7),
        half_life_days=half_life,
    )


SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("cat", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_executors_commute_extended(spark, seed):
    """vectorized vs cogroup over the EXTENDED feature surface —
    filter_let binds (null binds drop; value NaNs make the pattern
    genuinely partial) and outer latest frames (latest A ~> filter ~>
    latest B) — which the native compiler doesn't take."""
    rng = np.random.default_rng(seed)
    pdf = random_facts(rng, n_rows=int(rng.integers(500, 2000)), n_ents=40)
    facts = spark.createDataFrame(pdf, SCHEMA)
    feats = []
    for i in range(int(rng.integers(3, 6))):
        f = random_feature(np.random.default_rng(seed * 77 + i), i, False)
        kw = dict(
            where=f.where, window=f.window, latest=f.latest,
            skip_nulls=f.skip_nulls, half_life_days=f.half_life_days,
        )
        r = np.random.default_rng(seed * 31 + i)
        if r.random() < 0.6 and f.agg not in (
            Agg.NUMFLIPS, Agg.COUNT_DISTINCT, Agg.ANY, Agg.ALL,
        ):
            kw["filter_let"] = ((f"b{i}", "value * 2"),)
            expr = f"b{i}"
        else:
            expr = f.expr
        if r.random() < 0.5 and f.agg is not Agg.DECAYED_SUM:
            kw["latest_outer"] = int(r.integers(2, 7))
        feats.append(Feature(f.name, f.agg, expr, **kw))
    snap = str(
        pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(rng.integers(30, 110)))
    )
    plan = Plan(feats, entity_col="entity", time_col="time", seq_col="seq")
    ve = run_plan(facts, plan, snapshot=snap, strategy="vectorized").toPandas()
    co = run_plan(facts, plan, snapshot=snap, strategy="cogroup").toPandas()
    ve, co = (d.sort_values("entity").reset_index(drop=True) for d in (ve, co))
    assert len(ve) == len(co)
    for f in feats:
        b = ve[f.name].astype("float64").to_numpy()
        c = co[f.name].astype("float64").to_numpy()
        bad = ~np.isclose(b, c, equal_nan=True)
        assert not bad.any(), (
            seed, f, ve.loc[bad, ["entity", f.name]].head(3),
            co.loc[bad, ["entity", f.name]].head(3),
        )


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_backends_commute(spark, seed):
    rng = np.random.default_rng(seed)
    pdf = random_facts(rng, n_rows=int(rng.integers(500, 2500)), n_ents=60)
    facts = spark.createDataFrame(pdf, SCHEMA)
    n_feats = int(rng.integers(3, 7))
    feats_sql = [random_feature(np.random.default_rng(seed * 100 + i), i, True)
                 for i in range(n_feats)]
    feats_pd = [
        Feature(f.name, f.agg, f.expr,
                where=(f.where.replace(" = ", " == ") if f.where else None),
                window=f.window, latest=f.latest, skip_nulls=f.skip_nulls,
                half_life_days=f.half_life_days)
        for f in feats_sql
    ]
    snap = str(pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(rng.integers(30, 110))))
    pn = Plan(feats_sql, entity_col="entity", time_col="time", seq_col="seq")
    pv = Plan(feats_pd, entity_col="entity", time_col="time", seq_col="seq")
    na = run_plan(facts, pn, snapshot=snap, strategy="native").toPandas()
    ve = run_plan(facts, pv, snapshot=snap, strategy="vectorized").toPandas()
    co = run_plan(facts, pv, snapshot=snap, strategy="cogroup").toPandas()
    na, ve, co = (
        d.sort_values("entity").reset_index(drop=True) for d in (na, ve, co)
    )
    assert len(na) == len(ve) == len(co)
    for f in feats_sql:
        a = na[f.name].astype("float64").to_numpy()
        b = ve[f.name].astype("float64").to_numpy()
        c = co[f.name].astype("float64").to_numpy()
        bad_nv = ~np.isclose(a, b, equal_nan=True)
        bad_vc = ~np.isclose(b, c, equal_nan=True)
        assert not bad_nv.any(), (
            seed, f, na.loc[bad_nv, ["entity", f.name]].head(3),
            ve.loc[bad_nv, ["entity", f.name]].head(3),
        )
        assert not bad_vc.any(), (seed, f)
