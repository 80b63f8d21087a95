"""Dictionary registry — the declared, validated entry point
(reference Dictionary/Data.hs:61-81, Command/Compile.hs:127-175).

Pins: construction-time validation, load-time encoding validation,
InputKey nubbing, one fused pass per input, and the dictionary-driven
spark-submit job producing byte-identical output to the hand-built
plan.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from icicle_spark.dictionary import Dictionary, DictionaryInput, DictionaryOutput
from icicle_spark.plans import Agg, Feature, Plan, Window, run_plan

SNAP = "2017-01-01 00:00:00"
ENC = "entity string, time timestamp, value double, seq bigint"


def _facts_pdf():
    rows = [
        ("homer", "2016-01-01", 100.0),
        ("homer", "2016-02-01", 200.0),
        ("homer", "2016-02-01", 200.0),   # consecutive same-key dup
        ("homer", "2016-03-01", 300.0),
        ("marge", "2016-01-01", 10.0),
    ]
    pdf = pd.DataFrame(rows, columns=["entity", "time", "value"])
    pdf["time"] = pd.to_datetime(pdf["time"])
    pdf["seq"] = np.arange(len(pdf), dtype="int64")
    return pdf


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(_facts_pdf(), schema=ENC).cache()


FEATS_A = (
    Feature("s", Agg.SUM, "value", skip_nulls=True),
    Feature("c", Agg.COUNT, "value", skip_nulls=True),
)
FEATS_B = (
    Feature("w60", Agg.SUM, "value", window=Window(60), skip_nulls=True),
)


def _dict(key=None):
    return Dictionary(
        inputs=[
            DictionaryInput(
                "facts", ENC, entity_col="entity", time_col="time",
                seq_col="seq", key=key,
            )
        ],
        outputs=[
            DictionaryOutput("basic", "facts", FEATS_A),
            DictionaryOutput("windowed", "facts", FEATS_B),
        ],
    )


def test_outputs_fuse_into_one_plan_matching_hand_built(spark, facts):
    d = _dict()
    got = (
        d.run(spark, frames={"facts": facts}, snapshot=SNAP,
              strategy="native")["facts"]
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    hand = Plan(
        list(FEATS_A + FEATS_B),
        entity_col="entity", time_col="time", seq_col="seq",
    )
    want = (
        run_plan(facts, hand, snapshot=SNAP, strategy="native")
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.loc["homer", "s"] == 800.0  # no key: dup fact counts


def test_input_key_nubs_consecutive_duplicates(spark, facts):
    d = _dict(key="value")
    got = (
        d.run(spark, frames={"facts": facts}, snapshot=SNAP)["facts"]
        .toPandas()
        .set_index("entity")
    )
    # the consecutive duplicate (200 @ 2016-02-01) is nubbed
    assert got.loc["homer", "s"] == 600.0
    assert got.loc["homer", "c"] == 3


def test_output_from_query_string(spark, facts):
    """The full reference loop: declared input + Icicle query STRING
    outputs, fused and evaluated — identical to IR-built features."""
    d = Dictionary(
        inputs=[
            DictionaryInput(
                "facts", ENC, entity_col="entity", time_col="time",
                seq_col="seq",
            )
        ],
        outputs=[
            DictionaryOutput("s", "facts", query="from facts ~> sum value",
                             skip_nulls=True),
            DictionaryOutput(
                "big_c", "facts",
                query="from facts ~> filter value > 150 ~> count value",
                skip_nulls=True,
            ),
        ],
    )
    got = (
        d.run(spark, frames={"facts": facts}, snapshot=SNAP,
              strategy="native")["facts"]
        .toPandas()
        .set_index("entity")
        .sort_index()
    )
    assert got.loc["homer", "s"] == 800.0
    assert got.loc["homer", "big_c"] == 3  # 200, 200, 300
    assert got.loc["marge", "big_c"] == 0
    # query must read the declared input
    with pytest.raises(ValueError, match="reads 'other'"):
        DictionaryOutput("x", "facts", query="from other ~> sum value")
    with pytest.raises(ValueError, match="exactly one of"):
        DictionaryOutput("x", "facts")


def test_registry_validation():
    inp = DictionaryInput("facts", ENC, entity_col="entity",
                          time_col="time", seq_col="seq")
    with pytest.raises(ValueError, match="duplicate input"):
        Dictionary([inp, inp], [])
    with pytest.raises(ValueError, match="undeclared input"):
        Dictionary([inp], [DictionaryOutput("o", "nope", FEATS_A)])
    with pytest.raises(ValueError, match="not in the declared encoding"):
        Dictionary(
            [DictionaryInput("f", ENC, entity_col="user")], []
        )
    # outputs over one input FUSE: colliding feature names surface at
    # registry construction, not run time
    with pytest.raises(ValueError, match="duplicate feature names"):
        Dictionary(
            [inp],
            [
                DictionaryOutput("a", "facts", FEATS_A),
                DictionaryOutput("b", "facts", FEATS_A),
            ],
        )


def test_load_validates_encoding(spark, facts):
    bad_missing = DictionaryInput(
        "facts", ENC + ", extra int", entity_col="entity", time_col="time"
    )
    d = Dictionary([bad_missing], [DictionaryOutput("o", "facts", FEATS_A)])
    with pytest.raises(ValueError, match="missing from the data"):
        d.load(spark, "facts", df=facts)
    bad_type = DictionaryInput(
        "facts",
        "entity string, time timestamp, value string, seq bigint",
        entity_col="entity", time_col="time",
    )
    d2 = Dictionary([bad_type], [DictionaryOutput("o", "facts", FEATS_A)])
    with pytest.raises(ValueError, match="declared string"):
        d2.load(spark, "facts", df=facts)


PSV = """\
homer|salary|100|1989-12-17
homer|salary|200|1990-01-01
homer|salary|300|1994-01-01
homer|salary|400|1999-01-01
homer|salary|500|2010-01-01
homer|salary|NA|2011-01-01
marge|salary|0|1989-12-17
homer|injury|{"location":"head","severity":2}|1989-12-17
homer|injury|{"location":"arm","severity":4}|1994-01-01
homer|injury|NA|1995-01-01
"""


def test_load_psv_typed_parse(spark, tmp_path):
    """parseFact parity (Data.hs:131-143, Encoding.hs:176-210): the
    tombstone marker set is checked before decoding; Int values cast;
    struct encodings parse from JSON; downstream plans see the
    reference's tombstone semantics."""
    p = tmp_path / "data.psv"
    p.write_text(PSV)
    d = Dictionary(
        inputs=[
            DictionaryInput(
                "salary", "entity string, time timestamp, value bigint",
                tombstones=frozenset({"NA"}),
            ),
            DictionaryInput(
                "injury",
                "entity string, time timestamp, location string, "
                "severity bigint",
                tombstones=frozenset({"NA"}),
            ),
        ],
        outputs=[
            DictionaryOutput(
                "sal", "salary",
                (
                    Feature("s", Agg.SUM, "value", skip_nulls=True),
                    Feature("sp", Agg.SUM, "value"),  # Possibly
                ),
            )
        ],
    )
    sal = d.load_psv(spark, "salary", str(p)).toPandas()
    assert len(sal) == 7  # only salary facts
    h = sal[sal.entity == "homer"].sort_values("time")
    assert list(h["value"].dropna()) == [100, 200, 300, 400, 500]
    assert h["tombstone"].tolist() == [False] * 5 + [True]
    assert str(sal.dtypes["time"]).startswith("datetime")

    inj = d.load_psv(spark, "injury", str(p)).toPandas().sort_values("time")
    assert list(inj["location"].dropna()) == ["head", "arm"]
    assert list(inj["severity"].dropna()) == [2, 4]
    assert inj["tombstone"].tolist() == [False, False, True]

    # downstream: tombstone poisons Possibly, drops under skip_nulls
    facts = d.load_psv(spark, "salary", str(p))
    plan = Plan(
        list(d.outputs["sal"].features),
        entity_col="entity", time_col="time", tombstone_col="tombstone",
    )
    r = (
        run_plan(facts, plan, snapshot="2017-01-01", strategy="native")
        .toPandas()
        .set_index("entity")
    )
    assert r.loc["homer", "s"] == 1500.0
    assert pd.isna(r.loc["homer", "sp"])
    assert r.loc["marge", "sp"] == 0.0


DICT_MODULE = '''
from icicle_spark.dictionary import Dictionary, DictionaryInput, DictionaryOutput
from icicle_spark.plans import Agg, Feature

DICT = Dictionary(
    inputs=[
        DictionaryInput(
            "facts",
            "entity string, time timestamp, value double, seq bigint",
            entity_col="entity", time_col="time", seq_col="seq",
        )
    ],
    outputs=[
        DictionaryOutput(
            "basic", "facts",
            (
                Feature("s", Agg.SUM, "value", skip_nulls=True),
                Feature("c", Agg.COUNT, "value", skip_nulls=True),
            ),
        )
    ],
)
'''


def test_run_features_job_dictionary_driven(spark, facts, tmp_path):
    """jobs/run_features.py --dictionary: identical output to the
    hand-built plan (the dictionary only supplies what the CLI flags
    would have)."""
    from jobs.run_features import main

    src = str(tmp_path / "facts_pq")
    facts.write.mode("overwrite").parquet(src)
    mod = tmp_path / "feature_dict.py"
    mod.write_text(DICT_MODULE)
    out_dict = str(tmp_path / "out_dict")
    out_hand = str(tmp_path / "out_hand")

    assert main([
        "--input", src, "--output", out_dict, "--snapshot", SNAP,
        "--dictionary", f"{mod}:DICT", "--dict-input", "facts",
        "--strategy", "native",
    ]) == 0
    hand = Plan(list(FEATS_A), entity_col="entity", time_col="time",
                seq_col="seq")
    run_plan(facts, hand, snapshot=SNAP, strategy="native").write.mode(
        "overwrite"
    ).parquet(out_hand)

    a = spark.read.parquet(out_dict).toPandas().set_index("entity").sort_index()
    b = spark.read.parquet(out_hand).toPandas().set_index("entity").sort_index()
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    # lineage manifest still written
    assert os.path.exists(os.path.join(out_dict, "_lineage", "manifest.json"))
    manifest = json.load(
        open(os.path.join(out_dict, "_lineage", "manifest.json"))
    )
    assert manifest


def test_run_features_job_icicle_source(spark, facts, tmp_path):
    """--dictionary path/to/file.icicle: dictionary SOURCE drives the
    job end-to-end; results equal the python-module registry."""
    from jobs.run_features import main

    src = str(tmp_path / "facts_pq2")
    facts.write.mode("overwrite").parquet(src)
    dic = tmp_path / "features.icicle"
    dic.write_text(
        "module Default where\n"
        "\n"
        "input facts : Double\n"
        "\n"
        "feature s =\n"
        "  from facts\n"
        "    in sum value\n"
        "\n"
        "feature c =\n"
        "  from facts\n"
        "    in count value\n"
        "\n"
        "feature avg =\n"
        "  from facts\n"
        "    in sum value / count value\n"
    )
    out = str(tmp_path / "out_icicle")
    assert main([
        "--input", src, "--output", out, "--snapshot", SNAP,
        "--dictionary", f"{dic}:entity,time,seq",
        "--dict-input", "facts", "--strategy", "native",
    ]) == 0
    got = spark.read.parquet(out).toPandas().set_index("entity").sort_index()
    hand = (
        run_plan(
            facts,
            Plan(list(FEATS_A), entity_col="entity", time_col="time",
                 seq_col="seq"),
            snapshot=SNAP, strategy="native",
        ).toPandas().set_index("entity").sort_index()
    )
    pd.testing.assert_frame_equal(got[["s", "c"]], hand[["s", "c"]])
    assert np.allclose(got["avg"], got["s"] / got["c"])


def test_load_psv_malformed_struct_raises(spark, tmp_path):
    """A live (non-tombstone) struct value that is not valid JSON must
    raise — parseFact's DecodeError (Encoding.hs:204-210), matching
    the primitive path's loud ANSI cast, not an all-null row
    (FAILFAST json mode)."""
    p = tmp_path / "bad.psv"
    p.write_text(
        'homer|injury|{"location":"head","severity":2}|1989-12-17\n'
        "homer|injury|not-json-at-all|1994-01-01\n"
    )
    d = Dictionary(
        inputs=[
            DictionaryInput(
                "injury",
                "entity string, time timestamp, location string, "
                "severity bigint",
                tombstones=frozenset({"NA"}),
            )
        ],
        outputs=[],
    )
    with pytest.raises(Exception, match="(?i)malformed"):
        d.load_psv(spark, "injury", str(p)).collect()
