"""Error64 channel semantics (reference Primitive.hs:212-233).

Tombstone (1) vs CannotCompute (3) vs Fold1NoValue (2) distinction the
value backends collapse to null — pinned against hand-computed facts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.plans import (
    ERR_CANNOT_COMPUTE,
    ERR_FOLD1_NO_VALUE,
    ERR_OK,
    ERR_TOMBSTONE,
    Agg,
    Feature,
    Plan,
    error_codes,
    run_plan,
)

SNAP = "2017-01-01 00:00:00"


@pytest.fixture(scope="module")
def facts(spark):
    # ok:    clean facts only
    # tomb:  one tombstoned fact among clean ones
    # poss:  a Possibly error (value null, NOT tombstoned)
    # both:  tombstone AND possibly-error (tombstone wins)
    # late:  only facts at/after the snapshot (empty visible stream)
    rows = [
        ("ok",   "2016-01-01", 1.0,  False),
        ("ok",   "2016-02-01", 2.0,  False),
        ("tomb", "2016-01-01", 3.0,  False),
        ("tomb", "2016-02-01", None, True),
        ("poss", "2016-01-01", 4.0,  False),
        ("poss", "2016-02-01", None, False),
        ("both", "2016-01-01", None, True),
        ("both", "2016-02-01", None, False),
        ("late", "2017-06-01", 9.0,  False),
        # tombstoned facts carrying NON-null raw values: the value
        # backends null them before skip_nulls applies, so the
        # skip_nulls fold sees an empty stream
        ("tombv", "2016-01-01", 3.0, True),
        ("tombv", "2016-02-01", 4.0, True),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value", "dead"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf))
    return spark.createDataFrame(pdf).cache()


def _plan(**kw):
    return Plan(
        [
            Feature("m", Agg.MEAN, "value", skip_nulls=False),
            Feature("s", Agg.SUM, "value", skip_nulls=False),
            Feature("ms", Agg.MEAN, "value", skip_nulls=True),
        ],
        entity_col="entity",
        time_col="time",
        seq_col="seq",
        tombstone_col="dead",
        **kw,
    )


def test_error_codes_snapshot(spark, facts):
    errs = (
        error_codes(facts, _plan(), snapshot=SNAP)
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    # Possibly mean: tombstone poisons -> 1; possibly-null -> 3
    assert errs.loc["ok", "m_err"] == ERR_OK
    assert errs.loc["tomb", "m_err"] == ERR_TOMBSTONE
    assert errs.loc["poss", "m_err"] == ERR_CANNOT_COMPUTE
    assert errs.loc["both", "m_err"] == ERR_TOMBSTONE  # tombstone wins
    assert errs.loc["late", "m_err"] == ERR_FOLD1_NO_VALUE  # empty stream
    # sum folds from a unit init: empty stream is NOT an error
    assert errs.loc["late", "s_err"] == ERR_OK
    assert errs.loc["tomb", "s_err"] == ERR_TOMBSTONE
    # skip_nulls drops the poison; mean still has elements -> OK,
    # except the empty stream which stays Fold1NoValue
    assert errs.loc["tomb", "ms_err"] == ERR_OK
    assert errs.loc["poss", "ms_err"] == ERR_OK
    # 'both' has NO non-null elements left after skip_nulls drops them:
    # the fold1 mean saw an empty stream
    assert errs.loc["both", "ms_err"] == ERR_FOLD1_NO_VALUE
    assert errs.loc["late", "ms_err"] == ERR_FOLD1_NO_VALUE


def test_error_codes_all_tombstone_nonnull_values(spark, facts):
    """A skip_nulls fold1 whose visible frame is ONLY tombstoned facts
    with non-null RAW values: the value backends null every non-key
    column on a tombstoned fact before skip_nulls drops it, so the
    fold saw an empty stream — ERR_FOLD1_NO_VALUE, never ERR_OK
    beside a null value (round-2 ADVICE)."""
    errs = (
        error_codes(facts, _plan(), snapshot=SNAP)
        .toPandas()
        .set_index("entity")
    )
    assert errs.loc["tombv", "ms_err"] == ERR_FOLD1_NO_VALUE
    assert errs.loc["tombv", "m_err"] == ERR_TOMBSTONE
    # and the value side really is null there
    out = (
        run_plan(facts, _plan(), snapshot=SNAP, error_codes=True)
        .toPandas()
        .set_index("entity")
    )
    assert pd.isna(out.loc["tombv", "ms"])


def test_error_codes_join_matches_values(spark, facts):
    """run_plan(error_codes=True): err==0 exactly where the value is
    non-null (for the Possibly mean), and codes explain every null."""
    out = (
        run_plan(facts, _plan(), snapshot=SNAP, error_codes=True)
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    for ent in out.index:
        if out.loc[ent, "m_err"] in (ERR_TOMBSTONE, ERR_CANNOT_COMPUTE):
            assert pd.isna(out.loc[ent, "m"]), ent
        if out.loc[ent, "m_err"] == ERR_OK:
            assert not pd.isna(out.loc[ent, "m"]), ent


def test_error_codes_chords(spark, facts):
    """Chord scope: per-entity query times route the same attribution;
    a chord BEFORE the tombstone sees a clean stream."""
    chords = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity": ["tomb", "tomb"],
                "query_time": pd.to_datetime(["2016-01-15", "2016-12-01"]),
            }
        )
    )
    errs = (
        error_codes(facts, _plan(), chords=chords)
        .toPandas()
        .sort_values("query_time")
        .reset_index(drop=True)
    )
    assert errs.loc[0, "m_err"] == ERR_OK          # before the tombstone
    assert errs.loc[1, "m_err"] == ERR_TOMBSTONE   # after it


def test_error_codes_latest_frame(spark, facts):
    """latest-N with skip_nulls=False: poison only counts INSIDE the
    last-N buffer — a latest-1 over 'tomb' sees only the tombstoned
    newest fact; a latest-1 over 'poss' sees only the possibly-null."""
    plan = Plan(
        [Feature("l1", Agg.NEWEST, "value", latest=1, skip_nulls=False)],
        entity_col="entity",
        time_col="time",
        seq_col="seq",
        tombstone_col="dead",
    )
    errs = (
        error_codes(facts, plan, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
    )
    assert errs.loc["ok", "l1_err"] == ERR_OK
    assert errs.loc["tomb", "l1_err"] == ERR_TOMBSTONE
    assert errs.loc["poss", "l1_err"] == ERR_CANNOT_COMPUTE
    assert errs.loc["late", "l1_err"] == ERR_FOLD1_NO_VALUE


def test_error_codes_group_features(spark, facts):
    """Group folds: a null group KEY or element poisons the whole map
    (code 1/3 by source); skip_nulls drops both -> OK."""
    plan = Plan(
        [
            Feature("g", Agg.COUNT, "value", group="value", skip_nulls=False),
            Feature("gs", Agg.COUNT, "value", group="value", skip_nulls=True),
        ],
        entity_col="entity",
        time_col="time",
        seq_col="seq",
        tombstone_col="dead",
    )
    errs = (
        error_codes(facts, plan, snapshot=SNAP)
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    assert errs.loc["ok", "g_err"] == ERR_OK
    assert errs.loc["tomb", "g_err"] == ERR_TOMBSTONE
    assert errs.loc["poss", "g_err"] == ERR_CANNOT_COMPUTE
    for ent in ["ok", "tomb", "poss", "both", "late"]:
        assert errs.loc[ent, "gs_err"] == ERR_OK  # group folds have map init
