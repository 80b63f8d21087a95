"""`filter let Some b = e` — the Option-destructuring filter bind
(reference icicle-source/src/Icicle/Source/Query/Context.hs:31,
ToCore/Fold.hs:289-305; repl corpus t17-latest lines 26-27).

Semantics pinned here, identical across all value backends:

* facts where the bind expr is null fail the pattern and are DROPPED
  (an element filter, before window/latest frames) — they never
  poison, even under Possibly semantics;
* tombstoned facts carry no value, so the pattern fails on them too;
* the bound name is visible to the feature's expr/where/by/group/
  distinct;
* error attribution: an entity whose every fact fails the pattern is
  an empty stream (FOLD1_NO_VALUE for fold1 aggregates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.plans import (
    ERR_FOLD1_NO_VALUE,
    ERR_OK,
    Agg,
    Feature,
    Plan,
    error_codes,
    run_plan,
)

SNAP = "2017-01-01 00:00:00"
STRATEGIES = ["native", "vectorized", "cogroup"]


@pytest.fixture(scope="module")
def facts(spark):
    # bonus is the nullable Option source; dead marks tombstones
    rows = [
        ("homer", "2016-01-01", 100.0, None, False),
        ("homer", "2016-02-01", 200.0, 5.0,  False),
        ("homer", "2016-03-01", 300.0, None, False),
        ("homer", "2016-04-01", 400.0, 7.0,  False),
        ("marge", "2016-01-01", 0.0,   None, False),
        # every bart fact fails the pattern: null bind or tombstone
        ("bart",  "2016-01-01", 50.0,  None, False),
        ("bart",  "2016-02-01", 60.0,  8.0,  True),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value", "bonus", "dead"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    return spark.createDataFrame(pdf).cache()


def _plan(*features, **kw):
    return Plan(
        list(features), entity_col="entity", time_col="time", seq_col="seq", **kw
    )


BIND = (("b2", "bonus + value"),)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_filter_let_binds_and_drops(facts, strategy):
    plan = _plan(
        Feature("s", Agg.SUM, "b2", filter_let=BIND, skip_nulls=True),
        Feature("m", Agg.MEAN, "b2", filter_let=BIND, skip_nulls=True),
        Feature(
            "sw", Agg.SUM, "b2", filter_let=BIND, where="value > 300",
            skip_nulls=True,
        ),
        # Possibly semantics: pattern-failing facts DROP, they do not
        # poison — the remaining stream is clean
        Feature("sp", Agg.SUM, "b2", filter_let=BIND, skip_nulls=False),
    )
    r = run_plan(facts, plan, snapshot=SNAP, strategy=strategy).toPandas()
    r = r.set_index("entity").sort_index()
    assert r.loc["homer", "s"] == 612.0  # (200+5) + (400+7)
    assert r.loc["homer", "m"] == 306.0
    assert r.loc["homer", "sw"] == 407.0
    assert r.loc["homer", "sp"] == 612.0
    # marge: every fact fails the pattern -> empty stream
    assert r.loc["marge", "s"] == 0.0
    assert pd.isna(r.loc["marge", "m"])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_filter_let_tombstone_fails_pattern(facts, strategy):
    """A tombstoned fact's raw bind expr may be non-null, but a
    tombstone carries no value: the Some pattern fails — dropped, not
    poisoning, in every backend."""
    plan = _plan(
        Feature("s", Agg.SUM, "b2", filter_let=BIND, skip_nulls=False),
        tombstone_col="dead",
    )
    r = run_plan(facts, plan, snapshot=SNAP, strategy=strategy).toPandas()
    r = r.set_index("entity")
    # bart: null-bind fact dropped AND tombstoned fact dropped -> unit
    assert r.loc["bart", "s"] == 0.0
    assert r.loc["homer", "s"] == 612.0


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_filter_let_chord_scope(spark, facts, strategy):
    """Chords see the same bind semantics: a query time between
    homer's two Some facts sees only the first."""
    chords = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity": ["homer", "homer"],
                "query_time": pd.to_datetime(["2016-03-15", "2017-01-01"]),
            }
        )
    )
    plan = _plan(Feature("s", Agg.SUM, "b2", filter_let=BIND, skip_nulls=True))
    r = (
        run_plan(facts, plan, chords=chords, strategy=strategy)
        .toPandas()
        .sort_values("query_time")
        .reset_index(drop=True)
    )
    assert r.loc[0, "s"] == 205.0
    assert r.loc[1, "s"] == 612.0


def test_filter_let_error_codes(facts):
    """Error channel: all-pattern-failed entities are empty streams
    (FOLD1_NO_VALUE for fold1), never OK beside a null value."""
    plan = _plan(
        Feature("m", Agg.MEAN, "b2", filter_let=BIND, skip_nulls=True),
        tombstone_col="dead",
    )
    errs = (
        error_codes(facts, plan, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
    )
    assert errs.loc["homer", "m_err"] == ERR_OK
    assert errs.loc["marge", "m_err"] == ERR_FOLD1_NO_VALUE
    assert errs.loc["bart", "m_err"] == ERR_FOLD1_NO_VALUE


def test_latest_outer_chord_routing(spark, facts):
    """Chord scope + latest_outer: supports_chords and the native
    compiler both decline, so auto routes to the cogroup executor —
    and the semantics hold per query time."""
    chords = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity": ["homer", "homer"],
                "query_time": pd.to_datetime(["2016-03-15", "2017-01-01"]),
            }
        )
    )
    plan = _plan(
        Feature(
            "o", Agg.SUM, "b2", filter_let=BIND, latest_outer=2,
            skip_nulls=True,
        )
    )
    r = (
        run_plan(facts, plan, chords=chords, strategy="auto")
        .toPandas()
        .sort_values("query_time")
        .reset_index(drop=True)
    )
    # at 2016-03-15 the last 2 visible are (100,None),(200,5) -> 205;
    # at 2017-01-01 they are (300,None),(400,7) -> 407
    assert r.loc[0, "o"] == 205.0
    assert r.loc[1, "o"] == 407.0


def test_latest_outer_error_codes(spark, facts):
    """Error channel with an outer latest frame: the last visible fact
    failing the filter empties the frame (FOLD1_NO_VALUE) even though
    older matching facts exist — and without the outer frame the same
    feature is OK."""
    mk = lambda name, outer: Feature(  # noqa: E731
        name, Agg.MEAN, "value", where="value < 350",
        latest_outer=outer, skip_nulls=True,
    )
    plan = _plan(mk("m_out", 1), mk("m_all", None))
    errs = (
        error_codes(facts, plan, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
    )
    # homer's last visible fact is 400 (fails value < 350): the
    # 1-deep outer frame sees only it
    assert errs.loc["homer", "m_out_err"] == ERR_FOLD1_NO_VALUE
    assert errs.loc["homer", "m_all_err"] == ERR_OK
    # and the value side agrees (cogroup path evaluates latest_outer)
    vals = (
        run_plan(facts, plan, snapshot=SNAP, strategy="cogroup")
        .toPandas()
        .set_index("entity")
    )
    assert pd.isna(vals.loc["homer", "m_out"])
    assert vals.loc["homer", "m_all"] == 200.0  # mean(100, 200, 300)


def test_filter_let_validation(facts):
    # a bind name may not mean two different things in one plan
    with pytest.raises(ValueError, match="different expressions"):
        _plan(
            Feature("a", Agg.SUM, "b2", filter_let=(("b2", "bonus + value"),)),
            Feature("b", Agg.SUM, "b2", filter_let=(("b2", "bonus * 2"),)),
        )
    # ... nor shadow a key column
    with pytest.raises(ValueError, match="shadows a plan key column"):
        _plan(Feature("a", Agg.SUM, "time", filter_let=(("time", "bonus"),)))
    # ... nor shadow a fact column (checked at compile time)
    plan = _plan(
        Feature("a", Agg.SUM, "value", filter_let=(("value", "bonus"),))
    )
    with pytest.raises(ValueError, match="shadows a fact column"):
        run_plan(facts, plan, snapshot=SNAP, strategy="native").collect()


@pytest.mark.parametrize("strategy", ["vectorized", "cogroup"])
def test_latest_outer_vs_filter_first(facts, strategy):
    """`latest 2 ~> filter let Some b ~> sum b` is NOT
    `filter let Some b ~> latest 2 ~> sum b`: the outer frame truncates
    BEFORE the pattern drops. homer's last 2 facts are (300, None) and
    (400, 7) — outer-first sums 407; filter-first sums 612."""
    outer = Feature(
        "o", Agg.SUM, "b2", filter_let=BIND, latest_outer=2,
        skip_nulls=True,
    )
    inner = Feature(
        "i", Agg.SUM, "b2", filter_let=BIND, latest=2, skip_nulls=True
    )
    r = (
        run_plan(facts, _plan(outer, inner), snapshot=SNAP, strategy=strategy)
        .toPandas()
        .set_index("entity")
    )
    assert r.loc["homer", "o"] == 407.0
    assert r.loc["homer", "i"] == 612.0


def test_filter_let_resume_parity(spark, facts):
    """Checkpoint/resume sees the bind semantics too: fold_states at
    T0 + increment == the full run (resume materializes the binds via
    the same prepare_facts preamble as compile_native)."""
    from pyspark.sql import functions as F

    from icicle_spark.plans.resume import fold_states, resume_plan

    plan = _plan(
        Feature("s", Agg.SUM, "b2", filter_let=BIND, skip_nulls=True),
        Feature("m", Agg.MEAN, "b2", filter_let=BIND, skip_nulls=True),
        tombstone_col="dead",
    )
    t0 = "2016-02-15 00:00:00"
    states = fold_states(facts, plan, as_of=t0)
    inc = facts.where(F.col("time") >= F.lit(t0).cast("timestamp"))
    got = (
        resume_plan(inc, plan, states, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    want = (
        run_plan(facts, plan, snapshot=SNAP, strategy="native")
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    for c in ["s", "m"]:
        a, b = got[c].to_numpy("float64"), want[c].to_numpy("float64")
        assert np.allclose(a, b, equal_nan=True), c


def test_resume_tombstone_parity(spark, facts):
    """Tombstoned facts poison / drop identically in the resumed and
    direct paths (the resume preamble nulls them like compile_native —
    previously resume read raw values)."""
    from pyspark.sql import functions as F

    from icicle_spark.plans.resume import fold_states, resume_plan

    plan = _plan(
        Feature("sp", Agg.SUM, "value"),          # Possibly: tombstone poisons
        Feature("ss", Agg.SUM, "value", skip_nulls=True),
        tombstone_col="dead",
    )
    t0 = "2016-01-15 00:00:00"
    states = fold_states(facts, plan, as_of=t0)
    inc = facts.where(F.col("time") >= F.lit(t0).cast("timestamp"))
    got = (
        resume_plan(inc, plan, states, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    want = (
        run_plan(facts, plan, snapshot=SNAP, strategy="native")
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    # bart has a tombstoned fact (value 60): poisons sp, drops from ss
    assert pd.isna(want.loc["bart", "sp"]) and pd.isna(got.loc["bart", "sp"])
    assert want.loc["bart", "ss"] == 50.0 and got.loc["bart", "ss"] == 50.0
    for c in ["sp", "ss"]:
        a, b = got[c].to_numpy("float64"), want[c].to_numpy("float64")
        assert np.allclose(a, b, equal_nan=True), c


def test_filter_let_sequential_binds(facts):
    """Later binds may reference earlier ones."""
    plan = _plan(
        Feature(
            "s", Agg.SUM, "b3", skip_nulls=True,
            filter_let=(("b2", "bonus + value"), ("b3", "b2 * 2")),
        )
    )
    for strategy in STRATEGIES:
        r = (
            run_plan(facts, plan, snapshot=SNAP, strategy=strategy)
            .toPandas()
            .set_index("entity")
        )
        assert r.loc["homer", "s"] == 1224.0, strategy
