"""PSV fact-file IO parity (the reference's text input format,
/root/reference/icicle-source/src/Icicle/Serial.hs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icicle_spark.plans import Agg, Feature, Plan, icicle_snapshot, run_plan
from icicle_spark.sources.io import read_psv_facts

PSV = """homer|salary|100|1989-12-17
homer|salary|200|1990-01-01
homer|salary|300|1994-01-01
homer|salary|400|1999-01-01
homer|salary|500|2010-01-01
marge|salary|0|1989-12-17
marge|salary|10|1989-12-17
marge|salary|20|1989-12-17
"""


def test_psv_roundtrip_sum(spark, tmp_path):
    p = tmp_path / "data.psv"
    p.write_text(PSV)
    facts = read_psv_facts(spark, str(p))
    assert facts.columns == ["entity", "attribute", "value", "time"]
    salary = facts.where(F.col("attribute") == "salary").withColumn(
        "value", F.col("value").cast("long")
    )
    plan = Plan(
        [Feature("s", Agg.SUM, "value", skip_nulls=True)],
        entity_col="entity",
        time_col="time",
    )
    r = (
        run_plan(salary, plan, snapshot=icicle_snapshot("2017-01-01"))
        .toPandas()
        .set_index("entity")
    )
    assert r.loc["homer", "s"] == 1500 and r.loc["marge", "s"] == 30


def test_psv_output_schema_sidecar(spark, tmp_path):
    """PSV output writes the reference's _schema.json sidecar
    (Runtime/Serial/Psv/Schema.hs:234-299): version "1", entity_id at
    index 0, one attribute per non-entity column with the reference's
    encoding JSON ({"primitive": ...} / {"listof": ...} /
    {"struct": [...]})."""
    import json
    import os

    from icicle_spark.sources.io import write_output

    df = spark.createDataFrame(
        [("homer", 1500, 300.0, [1, 2], {"a": 1})],
        "entity string, s long, m double, arr array<int>, mp map<string,int>",
    )
    out = str(tmp_path / "out_psv")
    write_output(df, out, fmt="psv")
    schema = json.load(open(os.path.join(out, "_schema.json")))
    assert schema["version"] == "1" and schema["encoding_version"] == "1"
    assert schema["entity_id"] == {"index": 0, "encoding": "string"}
    assert schema["global_properties"]["missing_value"] == "NA"
    # 1-based attribute indices: entity_id holds physical position 0
    # (Schema.hs ppSchema: imap (ppColumn . (+1)))
    assert [a["index"] for a in schema["attributes"]] == [1, 2, 3, 4]
    enc = {a["name"]: a["encoding"] for a in schema["attributes"]}
    assert enc["s"] == {"primitive": "int"}
    assert enc["m"] == {"primitive": "double"}
    assert enc["arr"] == {"listof": {"primitive": "int"}}
    assert enc["mp"] == {
        "listof": {"pairof": [{"primitive": "string"}, {"primitive": "int"}]}
    }
    # the data itself is still readable PSV
    back = spark.read.option("sep", "|").csv(out)
    assert back.count() == 1
