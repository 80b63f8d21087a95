"""Golden parity with the reference's REPL test corpus.

The expected values below are transcribed from the reference's own
golden transcripts (/root/reference/icicle-compiler/test/cli/repl/
t01-sanity, t02-groups, t03-distinct, t06-custom-folds, t16-prelude,
t17-latest, t19-windows — `expected` files), evaluated over the shared
homer/marge fixture (data.psv, dictionary.icicle) at snapshot
2017-01-01. Snapshot dates are EXCLUSIVE (facts dated on the snapshot
day are visible — Time.hs:235-237), handled by `icicle_snapshot`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from icicle_spark.plans import (
    Agg,
    CustomFold,
    Feature,
    Plan,
    Window,
    icicle_snapshot,
    run_plan,
)

SNAP = icicle_snapshot("2017-01-01")

SALARY = [
    # (entity, time, value) — data.psv salary facts
    ("homer", "1989-12-17", 100),
    ("homer", "1990-01-01", 200),
    ("homer", "1994-01-01", 300),
    ("homer", "1999-01-01", 400),
    ("homer", "2010-01-01", 500),
    ("marge", "1989-12-17", 0),
    ("marge", "1989-12-17", 10),
    ("marge", "1989-12-17", 20),
]

INJURY = [
    # (entity, time, location, severity) — data.psv injury facts
    ("homer", "1989-12-17", "head", 2),
    ("homer", "1990-01-01", "head", 1),
    ("homer", "1994-01-01", "arm", 4),
    ("homer", "1999-01-01", "torso", 3),
    ("homer", "2010-01-01", "torso", 1),
]


@pytest.fixture(scope="module")
def salary(spark):
    pdf = pd.DataFrame(SALARY, columns=["entity", "time", "value"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("time", T.TimestampType()),
            T.StructField("value", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    return spark.createDataFrame(pdf, schema).cache()


@pytest.fixture(scope="module")
def injury(spark):
    pdf = pd.DataFrame(INJURY, columns=["entity", "time", "location", "severity"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    return spark.createDataFrame(pdf).cache()


def _plan(*features):
    return Plan(list(features), entity_col="entity", time_col="time", seq_col="seq")


def _run(df, plan, strategy, snap=SNAP):
    out = run_plan(df, plan, snapshot=snap, strategy=strategy).toPandas()
    return out.set_index("entity").sort_index()


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t01_sanity(salary, strategy):
    """t01-sanity golden: sum 1500/30, count 5/3, mean 300/10,
    filtered count 5/1, latest-3 mean 400/10."""
    where = "value > 10"
    plan = _plan(
        Feature("s", Agg.SUM, "value", skip_nulls=True),
        Feature("c", Agg.COUNT, "value", skip_nulls=True),
        Feature("m", Agg.MEAN, "value", skip_nulls=True),
        Feature("fc", Agg.COUNT, "value", where=where, skip_nulls=True),
        Feature("l3m", Agg.MEAN, "value", latest=3, skip_nulls=True),
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "s"] == 1500 and r.loc["marge", "s"] == 30
    assert r.loc["homer", "c"] == 5 and r.loc["marge", "c"] == 3
    assert r.loc["homer", "m"] == 300.0 and r.loc["marge", "m"] == 10.0
    assert r.loc["homer", "fc"] == 5 and r.loc["marge", "fc"] == 1
    assert r.loc["homer", "l3m"] == 400.0 and r.loc["marge", "l3m"] == 10.0


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t02_groups(salary, strategy):
    """t02-groups golden: group value ~> count == all-ones map;
    group time ~> mean."""
    plan = _plan(
        Feature("gc", Agg.COUNT, "value", group="value", skip_nulls=True),
        Feature(
            "gm",
            Agg.MEAN,
            "value",
            group=lambda p: p["time"].dt.strftime("%Y-%m-%d"),
            skip_nulls=True,
        ),
    )
    r = _run(salary, plan, strategy)
    assert {k: int(v) for k, v in r.loc["homer", "gc"].items()} == {
        "100": 1, "200": 1, "300": 1, "400": 1, "500": 1
    }
    assert {k: int(v) for k, v in r.loc["marge", "gc"].items()} == {
        "0": 1, "10": 1, "20": 1
    }
    gm = r.loc["marge", "gm"]
    assert gm == {"1989-12-17": 10.0}


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t03_distinct(salary, strategy):
    """t03-distinct golden: distinct value count 5/3; distinct time
    count 5/1; distinct time mean 300/0 (first fact per key)."""
    plan = _plan(
        Feature("dv", Agg.COUNT, "value", distinct="value", skip_nulls=True),
        Feature("dt", Agg.COUNT, "value", distinct="time", skip_nulls=True),
        Feature("dtm", Agg.MEAN, "value", distinct="time", skip_nulls=True),
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "dv"] == 5 and r.loc["marge", "dv"] == 3
    assert r.loc["homer", "dt"] == 5 and r.loc["marge", "dt"] == 1
    assert r.loc["homer", "dtm"] == 300.0 and r.loc["marge", "dtm"] == 0.0


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t06_custom_folds(salary, strategy):
    """t06-custom-folds golden: fold1 rolling avg 406.25/12.5; custom
    sum 1500/30; fold1 newest/oldest (500,100)/(20,0); tuple-state
    mean 300/10."""
    plan = _plan(
        Feature(
            "roll",
            CustomFold(
                init=None,
                step_seq=lambda acc, v: float(v) if acc is None else acc * 0.5 + v * 0.5,
            ),
            "value",
            skip_nulls=True,
        ),
        Feature(
            "xsum",
            CustomFold(init=0.0, step_seq=lambda acc, v: acc + v),
            "value",
            skip_nulls=True,
        ),
        Feature(
            "xnew",
            CustomFold(init=None, step_seq=lambda acc, v: v, dtype="bigint"),
            "value",
            skip_nulls=True,
        ),
        Feature(
            "xold",
            CustomFold(
                init=None,
                step_seq=lambda acc, v: acc if acc is not None else v,
                dtype="bigint",
            ),
            "value",
            skip_nulls=True,
        ),
        Feature(
            "tmean",
            CustomFold(
                init=(0, 0.0),
                step_seq=lambda acc, v: (acc[0] + 1, acc[1] + v),
                output=lambda acc: acc[1] / acc[0] if acc[0] else None,
            ),
            "value",
            skip_nulls=True,
        ),
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "roll"] == pytest.approx(406.25)
    assert r.loc["marge", "roll"] == pytest.approx(12.5)
    assert r.loc["homer", "xsum"] == 1500 and r.loc["marge", "xsum"] == 30
    assert (r.loc["homer", "xnew"], r.loc["homer", "xold"]) == (500, 100)
    assert (r.loc["marge", "xnew"], r.loc["marge", "xold"]) == (20, 0)
    assert r.loc["homer", "tmean"] == 300.0 and r.loc["marge", "tmean"] == 10.0


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t16_prelude(salary, injury, strategy):
    """t16-prelude golden: sd 158.11388300841898/10.0;
    min_by/max_by severity->location (head, arm); numflips 2."""
    plan = _plan(Feature("sd", Agg.SD, "value", skip_nulls=True))
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "sd"] == pytest.approx(158.11388300841898)
    assert r.loc["marge", "sd"] == pytest.approx(10.0)
    iplan = _plan(
        Feature("minby", Agg.MIN_BY, "location", by="severity", dtype="string"),
        Feature("maxby", Agg.MAX_BY, "location", by="severity", dtype="string"),
        Feature("flips", Agg.NUMFLIPS, "location", skip_nulls=True),
    )
    ri = _run(injury, iplan, strategy)
    assert ri.loc["homer", "minby"] == "head"
    assert ri.loc["homer", "maxby"] == "arm"
    assert ri.loc["homer", "flips"] == 2


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t17_latest_element_expr(salary, strategy):
    """t17-latest golden: `let zod = value + 2 ~> latest 3 ~> zod`
    == [302,402,502] / [2,12,22]."""
    plan = _plan(
        Feature(
            "zods", Agg.COLLECT, lambda p: (p["value"] + 2).astype("float64"),
            latest=3, skip_nulls=True,
        )
    )
    r = _run(salary, plan, strategy)
    assert list(r.loc["homer", "zods"]) == [302.0, 402.0, 502.0]
    assert list(r.loc["marge", "zods"]) == [2.0, 12.0, 22.0]


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t17_filter_let_some_bind(salary, strategy):
    """t17-latest golden line 26 (`filter let Some zod = Some (value
    + 1) ~> latest 3 ~> zod`): the bind unwraps for downstream exprs
    -> homer [301,401,501], marge [1,11,21]."""
    plan = _plan(
        Feature(
            "zods", Agg.COLLECT, "zod", latest=3, skip_nulls=True,
            filter_let=(("zod", "value + 1"),),
        )
    )
    r = _run(salary, plan, strategy)
    assert list(r.loc["homer", "zods"]) == [301.0, 401.0, 501.0]
    assert list(r.loc["marge", "zods"]) == [1.0, 11.0, 21.0]


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t17_latest_then_filter_let(salary, strategy):
    """t17-latest goldens lines 27-29: contexts compose in any order —
    `latest 4 ~> filter let Some zod = Some (value + 1) ~> latest 3 ~>
    zod` (outer frame BEFORE the filter) and the nested
    `latest 4 ~> latest 3`. With the always-Some bind the results
    match the filter-first form: homer [301,401,501], marge
    [1,11,21]."""
    plan = _plan(
        Feature(
            "zods", Agg.COLLECT, "zod", latest=3, latest_outer=4,
            skip_nulls=True, filter_let=(("zod", "value + 1"),),
        ),
        Feature(
            "nested", Agg.COLLECT, "value + 1", latest=3, latest_outer=4,
            skip_nulls=True,
        ),
    )
    r = _run(salary, plan, strategy)
    for col in ["zods", "nested"]:
        assert list(r.loc["homer", col]) == [301.0, 401.0, 501.0], col
        assert list(r.loc["marge", col]) == [1.0, 11.0, 21.0], col


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t19_month_windows(spark, strategy):
    """t19-windows golden (one salary fact per month of 1970):
    snapshot 1970-12-01, windowed 3 months -> sum of [10,11,12];
    between 1 and 3 months -> [10,11]; same at snapshot 1970-12-02."""
    rows = [("homer", f"1970-{m:02d}-01", m) for m in range(1, 13)]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    plan = _plan(
        Feature("w3", Agg.SUM, "value", window=Window(3, unit="months"),
                skip_nulls=True),
        Feature("wb", Agg.SUM, "value", window=Window(3, 1, unit="months"),
                skip_nulls=True),
    )
    for snap_date, w3_exp, wb_exp in [
        ("1970-12-01", 10 + 11 + 12, 10 + 11),
        ("1970-12-02", 10 + 11 + 12, 10 + 11),
    ]:
        r = _run(df, plan, strategy, snap=icicle_snapshot(snap_date))
        assert r.loc["homer", "w3"] == w3_exp, (strategy, snap_date)
        assert r.loc["homer", "wb"] == wb_exp, (strategy, snap_date)


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t04_lets(salary, strategy):
    """t04-lets goldens: `let x = value * 2 ~> sum x` -> 3000/60;
    pure let `sum (value + sx) - (sx * count value)` -> 1500/30;
    aggregate tuple `(sum value, filter value > 100 ~> sum value)`
    -> (1500, 1400)/(30, 0) — aggregate combination, SURVEY §2.4."""
    plan = _plan(
        Feature("dbl", Agg.SUM, "value * 2", skip_nulls=True),
        Feature("s", Agg.SUM, "value", skip_nulls=True),
        Feature("c", Agg.COUNT, "value", skip_nulls=True),
        Feature("s_hi", Agg.SUM, "value", where="value > 100", skip_nulls=True),
    )
    r = _run(salary, plan, strategy)
    sx = 13013
    for ent, dbl, s, c, s_hi in [
        ("homer", 3000, 1500, 5, 1400),
        ("marge", 60, 30, 3, 0),
    ]:
        assert r.loc[ent, "dbl"] == dbl, strategy
        # pure let: sum(value + sx) - sx*count == sum value
        assert (r.loc[ent, "s"] + sx * r.loc[ent, "c"]) - sx * r.loc[ent, "c"] == s
        assert (r.loc[ent, "s"], r.loc[ent, "s_hi"]) == (s, s_hi), strategy


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t07_possiblies(salary, strategy):
    """t07-possiblies goldens: `distinct (value/5) ~> sum (value/5) / 5`
    -> 60.0/1.2; `(newest value / 5, oldest (value/5), sum value)` ->
    (100, 20, 1500)/(4, 0, 30); `latest 1 ~> sum value` -> 500/20."""
    plan = _plan(
        Feature("d", Agg.SUM, "value / 5", distinct="value / 5", skip_nulls=True),
        Feature("nw", Agg.NEWEST, "value", skip_nulls=True),
        Feature("od", Agg.OLDEST, "value / 5", skip_nulls=True),
        Feature("s", Agg.SUM, "value", skip_nulls=True),
        Feature("l1", Agg.SUM, "value", latest=1, skip_nulls=True),
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "d"] / 5 == pytest.approx(60.0)
    assert r.loc["marge", "d"] / 5 == pytest.approx(1.2)
    assert (r.loc["homer", "nw"] / 5, r.loc["homer", "od"], r.loc["homer", "s"]) == (
        100.0, 20.0, 1500,
    )
    assert (r.loc["marge", "nw"] / 5, r.loc["marge", "od"], r.loc["marge", "s"]) == (
        4.0, 0.0, 30,
    )
    assert r.loc["homer", "l1"] == 500 and r.loc["marge", "l1"] == 20


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t14_dates(salary, strategy):
    """t14-dates golden at snapshot 2010-01-01 (exclusive): newest
    visible time is 2010-01-01 (homer) / 1989-12-17 (marge);
    days_between to 2014-01-01 = 1461 / 8781."""
    plan = _plan(
        Feature("nt", Agg.NEWEST, "time", dtype="timestamp"),
    )
    r = _run(salary, plan, strategy, snap=icicle_snapshot("2010-01-01"))
    ref = pd.Timestamp("2014-01-01")
    assert (ref - pd.Timestamp(r.loc["homer", "nt"])).days == 1461
    assert (ref - pd.Timestamp(r.loc["marge", "nt"])).days == 8781


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t09_group_folds(spark, salary, injury, strategy):
    """t09-group-folds goldens: group fold over (group time ~> count)
    -> unique-times 5/1, total 5/3, max-count 1/3; over (group time ~>
    oldest) -> max 500/0; injury min_by(count) mean-severity -> 4.0."""
    from pyspark.sql import functions as F

    from icicle_spark.operators.folds_ext import group_fold

    plan = _plan(
        Feature("g_cnt", Agg.COUNT, "value", group="time", skip_nulls=True),
        Feature("g_old", Agg.OLDEST, "value", group="time", skip_nulls=True),
    )
    res = run_plan(salary, plan, snapshot=SNAP, strategy=strategy)
    r = (
        res.select(
            "entity",
            group_fold("g_cnt", "n_keys").alias("uniq"),
            group_fold("g_cnt", "sum_values").alias("total"),
            group_fold("g_cnt", "max_value").alias("maxc"),
            group_fold("g_old", "max_value").alias("maxold"),
        )
        .toPandas()
        .set_index("entity")
    )
    assert (r.loc["homer", ["uniq", "total", "maxc", "maxold"]].tolist()
            == [5, 5.0, 1, 500])
    assert (r.loc["marge", ["uniq", "total", "maxc", "maxold"]].tolist()
            == [1, 3.0, 3, 0])

    iplan = Plan(
        [
            Feature("g_mean", Agg.MEAN, "severity", group="location", skip_nulls=True),
            Feature("g_n", Agg.COUNT, "severity", group="location", skip_nulls=True),
        ],
        entity_col="entity",
        time_col="time",
        seq_col="seq",
    )
    ires = run_plan(injury, iplan, snapshot=SNAP, strategy=strategy)
    ir = (
        ires.select(
            "entity",
            F.element_at(
                F.col("g_mean"), group_fold("g_n", "argmin_key")
            ).alias("minby"),
        )
        .toPandas()
        .set_index("entity")
    )
    assert ir.loc["homer", "minby"] == pytest.approx(4.0)


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t13_cases_either(salary, strategy):
    """t13-cases-either golden: alternating Left/Right sum-type fold
    `fold p = Left 0 then case p of Left i then Right (double i+1);
    Right j then Left (trunc j+1)` -> 5.0 / 3.0 (tag flips per fact,
    payload increments)."""
    def step(st, _v):
        tag, x = st
        return ("R", float(x) + 1.0) if tag == "L" else ("L", float(int(x) + 1))

    plan = _plan(
        Feature(
            "p",
            CustomFold(init=("L", 0.0), step_seq=step, output=lambda st: st[1]),
            "value",
        )
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "p"] == pytest.approx(5.0)
    assert r.loc["marge", "p"] == pytest.approx(3.0)


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t80_array_index(salary, strategy):
    """t80-array-index goldens: `let arr = (latest 3 ~> value) ~>
    index arr i` — 300 at 0, 500 at 2, tombstone (null) for OOB
    indices 49-of-50, 100, 3, -1 (bounds-checked Possibly index)."""
    from pyspark.sql import functions as F

    plan = _plan(
        Feature("arr3", Agg.COLLECT, "value", latest=3, skip_nulls=True),
        Feature("arr50", Agg.COLLECT, "value", latest=50, skip_nulls=True),
    )
    res = run_plan(salary, plan, snapshot=SNAP, strategy=strategy)
    # Icicle `index` is 0-based and tombstones OOB (Prim.hs:147-152);
    # F.get is 0-based and null on OOB/negative — exact match (unlike
    # element_at, which throws under ANSI mode).
    def ix(col, i):
        return F.get(F.col(col), i)

    r = (
        res.select(
            "entity",
            ix("arr3", 0).alias("i0"),
            ix("arr3", 2).alias("i2"),
            ix("arr50", 49).alias("i49"),
            ix("arr3", 100).alias("i100"),
            ix("arr3", 3).alias("i3"),
            ix("arr3", -1).alias("im1"),
        )
        .toPandas()
        .set_index("entity")
    )
    assert r.loc["homer", "i0"] == 300.0
    assert r.loc["homer", "i2"] == 500.0
    for c in ["i49", "i100", "i3", "im1"]:
        assert pd.isna(r.loc["homer", c]), c


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t02_1_nested_groups(spark, strategy):
    """t02.1-group-groups goldens over the cylon fixture (snapshot
    2016-07-14): `group year ~> group day ~> count` ->
    {2000: {1:1, 3:2, 7:1}, 2001: {2:1, 4:1}}; `group year ~>
    distinct day ~> count` -> {2000: 3, 2001: 2}. Nested groups
    evaluate as one composite-key group; `nest_map` restores the
    map-of-maps shape."""
    from icicle_spark.operators.folds_ext import nest_map

    rows = [
        ("foo", "2000-01-01", 1), ("foo", "2000-03-03", 3),
        ("foo", "2000-05-03", 3), ("foo", "2000-05-07", 7),
        ("foo", "2001-01-02", 2), ("foo", "2001-01-04", 4),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    cylon = spark.createDataFrame(pdf)

    def yd(p):
        return (
            p["time"].dt.year.astype(str) + "|" + p["time"].dt.day.astype(str)
        )

    plan = _plan(
        Feature("nested", Agg.COUNT, "value", group=yd, skip_nulls=True),
        Feature(
            "dcnt",
            Agg.COUNT,
            "value",
            group=lambda p: p["time"].dt.year.astype(str),
            distinct=yd,
            skip_nulls=True,
        ),
    )
    res = run_plan(cylon, plan, snapshot=icicle_snapshot("2016-07-14"),
                   strategy=strategy)
    out = res.select(
        "entity", nest_map("nested").alias("nested"), "dcnt"
    ).collect()[0]
    nested = {k: dict(v) for k, v in out["nested"].items()}
    assert nested == {
        "2000": {"1": 1, "3": 2, "7": 1},
        "2001": {"2": 1, "4": 1},
    }
    assert dict(out["dcnt"]) == {"2000": 3, "2001": 2}


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t05_nested_queries(salary, strategy):
    """t05-nested-queries goldens: `((filter value > 300 ~> count),
    count)` -> (2,5)/(0,3); with `(distinct time ~> count)` ->
    (2,5)/(0,1) — aggregate tuples of filtered/distinct subqueries
    fused into one pass."""
    plan = _plan(
        Feature("hi", Agg.COUNT, "value", where="value > 300", skip_nulls=True),
        Feature("all_c", Agg.COUNT, "value", skip_nulls=True),
        Feature("dt", Agg.COUNT, "value", distinct="time", skip_nulls=True),
    )
    r = _run(salary, plan, strategy)
    assert (r.loc["homer", "hi"], r.loc["homer", "all_c"], r.loc["homer", "dt"]) == (2, 5, 5)
    assert (r.loc["marge", "hi"], r.loc["marge", "all_c"], r.loc["marge", "dt"]) == (0, 3, 1)


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t60_map_state_fold(injury, strategy):
    """t60-map-delete golden: fold with Map state — insert
    (location -> severity) when absent, delete when present ->
    homer {arm: 4} (toggle semantics over the injury stream)."""
    def step(acc, kv):
        loc, sev = kv
        acc = dict(acc)
        if loc in acc:
            del acc[loc]
        else:
            acc[loc] = int(sev)
        return acc

    plan = _plan(
        Feature(
            "m",
            CustomFold(init={}, step_seq=step, dtype="map<string,bigint>"),
            lambda p: pd.Series(
                list(zip(p["location"], p["severity"])), index=p.index
            ),
        )
    )
    r = _run(injury, plan, strategy)
    assert dict(r.loc["homer", "m"]) == {"arm": 4}


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t31_builtins(salary, injury, strategy):
    """t31-builtin goldens: sorted keys of a group -> [arm, head,
    torso]; days_between (newest time) now = 2558 (snapshot instant
    2017-01-02 exclusive); sort (latest 3 ~> value) -> [300,400,500] /
    [0,10,20]; year_of now = 2016 at snapshot 2015-12-31."""
    from pyspark.sql import functions as F

    plan = _plan(
        Feature("locs", Agg.DISTINCT_VALUES, "location"),
        Feature("nt", Agg.NEWEST, "time", dtype="timestamp"),
    )
    res = run_plan(injury, plan, snapshot=SNAP, strategy=strategy)
    row = res.select(
        "locs", F.datediff(F.lit(SNAP).cast("timestamp"), F.col("nt")).alias("db")
    ).collect()[0]
    assert list(row["locs"]) == ["arm", "head", "torso"]
    assert row["db"] == 2558

    splan = _plan(Feature("l3", Agg.COLLECT, "value", latest=3, skip_nulls=True))
    sres = run_plan(salary, splan, snapshot=SNAP, strategy=strategy)
    sr = (
        sres.select("entity", F.sort_array("l3").alias("sorted3"))
        .toPandas()
        .set_index("entity")
    )
    assert list(sr.loc["homer", "sorted3"]) == [300.0, 400.0, 500.0]
    assert list(sr.loc["marge", "sorted3"]) == [0.0, 10.0, 20.0]

    # `now` is the exclusive snapshot instant (Time.hs:235-237)
    assert icicle_snapshot("2015-12-31") == "2016-01-01 00:00:00"
    assert pd.Timestamp(icicle_snapshot("2015-12-31")).year == 2016


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t18_nested_structs(spark, strategy):
    """t18-nested-structs goldens: group by nested struct fields
    (`group injury.severity ~> mean misery`, `group
    injury.location.area ~> mean misery`) — homer {1: 1.5, 2: 6.5},
    marge {2: 2.5} / {head: 1.5, leg: 6.5} and {leg: 2.5}."""
    rows = [
        ("homer", "2000-01-01", 1.5, {"location": {"area": "head", "depth": 0.5}, "severity": 1}),
        ("homer", "2000-01-02", 5.5, {"location": {"area": "leg", "depth": 1.5}, "severity": 2}),
        ("homer", "2000-01-03", 7.5, {"location": {"area": "leg", "depth": 1.5}, "severity": 2}),
        ("marge", "2000-01-03", 2.5, {"location": {"area": "leg", "depth": 1.5}, "severity": 2}),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "misery", "injury"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    person = spark.createDataFrame(
        pdf,
        "entity string, time timestamp, misery double, "
        "injury struct<location: struct<area: string, depth: double>, severity: int>, "
        "seq long",
    )
    plan = _plan(
        Feature(
            "by_sev", Agg.MEAN, "misery",
            group=lambda p: p["injury"].map(lambda d: d["severity"]),
            skip_nulls=True,
        ),
        Feature(
            "by_area", Agg.MEAN, "misery",
            group=lambda p: p["injury"].map(lambda d: d["location"]["area"]),
            skip_nulls=True,
        ),
    )
    r = _run(person, plan, strategy, snap=icicle_snapshot("2017-01-01"))
    assert {k: v for k, v in r.loc["homer", "by_sev"].items()} == {"1": 1.5, "2": 6.5}
    assert dict(r.loc["marge", "by_sev"]) == {"2": 2.5}
    assert dict(r.loc["homer", "by_area"]) == {"head": 1.5, "leg": 6.5}
    assert dict(r.loc["marge", "by_area"]) == {"leg": 2.5}


def test_t06_01_scan_prev(spark, salary):
    """t06.01-scan golden: `scan v = (second_last value) ~> filter
    value > v ~> count` == count of elements greater than their
    previous element -> 4 / 2; identical under `latest 10`."""
    from pyspark.sql import functions as F

    from icicle_spark.operators.window_ext import lag_lead

    df = lag_lead(salary, "value", "entity", "time", seq_col="seq")
    rises = (
        df.where(F.col("value") > F.col("value_lag_1"))
        .groupBy("entity")
        .count()
        .toPandas()
        .set_index("entity")["count"]
    )
    assert rises["homer"] == 4 and rises["marge"] == 2
    # latest 10 covers every fact -> same answer (reference transcript)
    w10 = df.withColumn(
        "rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("entity").orderBy(F.desc("time"), F.desc("seq"))
        ),
    ).where(F.col("rn") <= 10)
    rises10 = (
        w10.where(F.col("value") > F.col("value_lag_1"))
        .groupBy("entity").count().toPandas().set_index("entity")["count"]
    )
    assert rises10["homer"] == 4 and rises10["marge"] == 2


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t15_tombstones(spark, strategy):
    """t15-tombstones goldens over the gonzo fixture (a, b, NA, NA, c
    with NA = tombstone): `latest 5 ~> (value, tombstone)` keeps
    tombstone slots; `numflips' value tombstone` (prelude.icicle:
    278-291 — tombstones lift to None states) -> 3."""
    rows = [
        ("gonzo", "1989-12-17", "a", False),
        ("gonzo", "1990-01-01", "b", False),
        ("gonzo", "1994-01-01", None, True),
        ("gonzo", "1999-01-01", None, True),
        ("gonzo", "2010-01-01", "c", False),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value", "tombstone"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    facts = spark.createDataFrame(pdf)

    lifted = lambda p: p["value"].where(~p["tombstone"], "tombstone")  # noqa: E731
    plan = _plan(
        Feature(
            "l5", Agg.COLLECT, lifted, latest=5, skip_nulls=True,
            dtype="array<string>",
        ),
        Feature("flips", Agg.NUMFLIPS, lifted, skip_nulls=True),
    )
    r = _run(facts, plan, strategy)
    assert list(r.loc["gonzo", "l5"]) == ["a", "b", "tombstone", "tombstone", "c"]
    assert r.loc["gonzo", "flips"] == 3


def test_t01_2_trig(spark, salary):
    """t01.2-trig goldens: trig constants map 1:1 to
    pyspark.sql.functions; `atan2 (sin 1) (cos 1)` = 1.0; a Possibly
    error inside (`sin (1/0)`) propagates to tombstone/null."""
    from pyspark.sql import functions as F

    from icicle_spark.functions.scalars import safe_div

    row = (
        salary.select(
            F.acos(F.lit(1.0)).alias("acos1"),
            F.asin(F.lit(0.0)).alias("asin0"),
            F.atan2(F.lit(0.0), F.lit(0.0)).alias("atan2_00"),
            F.cos(F.lit(0.0)).alias("cos0"),
            F.cosh(F.lit(0.0)).alias("cosh0"),
            F.tanh(F.lit(0.0)).alias("tanh0"),
            F.atan2(F.sin(F.lit(1.0)), F.cos(F.lit(1.0))).alias("wrap"),
            F.atan2(
                F.sin(safe_div(F.lit(1.0), F.lit(0.0))), F.cos(F.lit(1.0))
            ).alias("poss"),
        )
        .limit(1)
        .collect()[0]
    )
    assert row["acos1"] == 0.0 and row["asin0"] == 0.0
    assert row["atan2_00"] == 0.0
    assert row["cos0"] == 1.0 and row["cosh0"] == 1.0 and row["tanh0"] == 0.0
    assert row["wrap"] == pytest.approx(1.0)
    assert row["poss"] is None  # error propagates, never NaN


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t03_1_distinct_tomb(spark, strategy):
    """t03.1-distinct-tomb goldens (injury stream where homer's last
    fact is a tombstone — location is Possibly, time is Definitely):
    distinct/group over the POSSIBLY key tombstones homer; over the
    definite time key, only value-aggregates of location tombstone;
    `distinct time ~> count time` = 5/2, `group time ~> count time`
    = all-ones maps."""
    rows = [
        ("homer", "1989-12-17", "head", False),
        ("homer", "1990-01-01", "head", False),
        ("homer", "1994-01-01", "arm", False),
        ("homer", "1999-01-01", "torso", False),
        ("homer", "2010-01-01", None, True),
        ("marge", "1989-12-17", "head", False),
        ("marge", "1990-01-01", "head", False),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "location", "tombstone"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    injury = spark.createDataFrame(pdf)

    tkey = lambda p: p["time"].dt.strftime("%Y-%m-%d")  # noqa: E731
    plan = _plan(
        # Possibly distinct key -> homer poisoned, marge 1
        Feature("d_loc_cnt", Agg.COUNT, "location", distinct="location"),
        # definite distinct key, Possibly value -> homer poisoned, marge 2
        Feature("d_time_loc", Agg.COUNT, "location", distinct=tkey),
        # definite key, definite value -> 5 / 2
        Feature(
            "d_time_time", Agg.COUNT, lambda p: p["time"], distinct=tkey,
        ),
        # Possibly group key -> homer poisoned; marge {head: 2}
        Feature("g_loc", Agg.COUNT, "location", group="location"),
        # definite group key, Possibly value -> homer poisoned
        Feature("g_time_loc", Agg.COUNT, "location", group=tkey),
        # definite everywhere -> all-ones map per time
        Feature("g_time_time", Agg.COUNT, lambda p: p["time"], group=tkey),
    )
    r = _run(injury, plan, strategy)
    assert pd.isna(r.loc["homer", "d_loc_cnt"])
    assert r.loc["marge", "d_loc_cnt"] == 1
    assert pd.isna(r.loc["homer", "d_time_loc"])
    assert r.loc["marge", "d_time_loc"] == 2
    assert r.loc["homer", "d_time_time"] == 5
    assert r.loc["marge", "d_time_time"] == 2
    assert r.loc["homer", "g_loc"] is None
    assert {k: int(v) for k, v in r.loc["marge", "g_loc"].items()} == {"head": 2}
    assert r.loc["homer", "g_time_loc"] is None
    assert len(r.loc["homer", "g_time_time"]) == 5
    assert all(int(v) == 1 for v in r.loc["homer", "g_time_time"].values())


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t04_1_filter_pattern(injury, strategy):
    """t04.1-filters golden: `filter let "head" = location ~> sum
    severity` — a literal pattern binding acts as an equality filter.
    homer head severities 2+1 = 3; marge has no injury facts, so no
    output row (the spine comes from the input's own entities)."""
    plan = _plan(
        Feature(
            "s", Agg.SUM, "severity", where="location == 'head'",
            skip_nulls=True,
        )
    )
    r = _run(injury, plan, strategy)
    assert r.loc["homer", "s"] == 3
    assert "marge" not in r.index


@pytest.fixture(scope="module")
def gonzo_arrays(spark):
    """t09.1-group-folds-element data.psv: gonzo, Array Int input."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "entity": ["gonzo", "gonzo"],
            "time": pd.to_datetime(["1989-12-17", "1990-01-01"]),
            "value": [[1, 2], [2, 3]],
            "seq": [0, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    # element-context lets (`let lengths = (array fold ...)`) are
    # per-fact projections — precomputed columns in Spark terms
    return df.select(
        "entity", "time", "seq", "value",
        F.size("value").alias("len_v"),
        F.aggregate("value", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "sum_v"
        ),
        # `group v in 1 ~> group fold (k,v) ~> sum k` = sum of the
        # map's KEYS = sum of distinct elements
        F.aggregate(
            F.array_distinct("value"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("dsum_v"),
    ).cache()


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t09_1_group_folds_element(gonzo_arrays, strategy):
    """t09.1-group-folds-element goldens: latest 10 of per-fact array
    length [2,2]; per-fact array sum [3,5]; the map-keys detour
    (group v in 1 ~> group fold sum k) also [3,5]."""
    plan = _plan(
        Feature("lens", Agg.COLLECT, "len_v", latest=10, skip_nulls=True),
        Feature("sums", Agg.COLLECT, "sum_v", latest=10, skip_nulls=True),
        Feature("ksums", Agg.COLLECT, "dsum_v", latest=10, skip_nulls=True),
    )
    r = _run(gonzo_arrays, plan, strategy)
    assert list(r.loc["gonzo", "lens"]) == [2, 2]
    assert list(r.loc["gonzo", "sums"]) == [3, 5]
    assert list(r.loc["gonzo", "ksums"]) == [3, 5]


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t13_1_cases_record(salary, strategy):
    """t13.1-cases-record goldens (the three WELL-TYPED queries; the
    other two are desugar errors by design): record construction +
    case with record/Option patterns over {a = None, b = Some 4}.
    q1 `{a=Some _}->2; {b=b}->4`      == 4
    q4 `{a=Some a}->a; {b=None}->2; {a=None}->6`        == 6
    q5 `{a=Some a}->a; {b=None}->2; {a=None,b=Some b}->b` == 4
    Options encode as nullable columns, records as structs, case as a
    first-match F.when chain (reference Constructor.hs record sugar)."""
    from pyspark.sql import functions as F

    plan = _plan(Feature("c", Agg.COUNT, "value", skip_nulls=True))
    spine = run_plan(salary, plan, snapshot=SNAP, strategy=strategy)
    rec = F.struct(
        F.lit(None).cast("long").alias("a"), F.lit(4).cast("long").alias("b")
    )
    q1 = F.when(rec["a"].isNotNull(), F.lit(2)).otherwise(F.lit(4))
    q4 = (
        F.when(rec["a"].isNotNull(), rec["a"])
        .when(rec["b"].isNull(), F.lit(2))
        .when(rec["a"].isNull(), F.lit(6))
    )
    q5 = (
        F.when(rec["a"].isNotNull(), rec["a"])
        .when(rec["b"].isNull(), F.lit(2))
        .when(rec["a"].isNull() & rec["b"].isNotNull(), rec["b"])
    )
    r = (
        spine.select("entity", q1.alias("q1"), q4.alias("q4"), q5.alias("q5"))
        .toPandas()
        .set_index("entity")
    )
    for ent in ["homer", "marge"]:
        assert r.loc[ent, "q1"] == 4
        assert r.loc[ent, "q4"] == 6
        assert r.loc[ent, "q5"] == 4


@pytest.fixture(scope="module")
def days_catch(spark):
    """t30.2-array-strings data.psv: Array String facts."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        [
            ("ID00000000", "2014-05-02", ["Blue mackerel", "Short mackerel"]),
            ("ID00000000", "2014-06-02", ["Blue mackerel", "Wahoo"]),
            ("ID00000001", "2014-06-02", ["Blue mackerel"]),
            ("ID00000002", "2014-06-02", ["Atlantic mackerel"]),
            ("ID00000002", "2014-06-02", ["Wahoo"]),
        ],
        columns=["entity", "time", "value"],
    )
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    # whole-array distinct key: serialize the array once, JVM-side
    return df.withColumn("vkey", F.to_json("value")).cache()


@pytest.mark.parametrize("strategy", ["native", "vectorized", "cogroup"])
def test_t30_2_array_strings(days_catch, strategy):
    """t30.2-array-strings golden: `distinct value ~> fold c = 0 then
    c+1 ~> c` over Array String facts — count of distinct whole-array
    values: ID00000000 2, ID00000001 1, ID00000002 2."""
    plan = _plan(Feature("c", Agg.COUNT_DISTINCT, "vkey", skip_nulls=True))
    r = _run(days_catch, plan, strategy)
    assert r.loc["ID00000000", "c"] == 2
    assert r.loc["ID00000001", "c"] == 1
    assert r.loc["ID00000002", "c"] == 2


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_t30_3_sum_not_error(salary, strategy):
    """t30.3-sum-not-error golden: Either-state fold `perhaps = Left 0
    then case perhaps of Left i then Right (double i+1); Right j then
    Left (trunc j+1)` — alternating constructor state; homer 5.0 (5
    facts), marge 3.0 (3 facts)."""
    plan = _plan(
        Feature(
            "perhaps",
            CustomFold(
                init=("L", 0.0),
                step_seq=lambda acc, v: (
                    ("R", acc[1] + 1.0)
                    if acc[0] == "L"
                    else ("L", float(int(acc[1]) + 1))
                ),
                output=lambda acc: float(acc[1]),
            ),
            "value",
            skip_nulls=True,
        )
    )
    r = _run(salary, plan, strategy)
    assert r.loc["homer", "perhaps"] == 5.0
    assert r.loc["marge", "perhaps"] == 3.0
