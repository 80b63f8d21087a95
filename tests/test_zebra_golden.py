"""Golden end-to-end test against the reference's zebra CLI suite
(icicle-compiler/test/cli/zebra): the dictionary's six features over
the input facts (read from the human-readable input.ztxt — the zebra
BINARY format itself is out of scope, replaced by parquet/DataFrames)
must reproduce expected.psv at snapshot 2016-02-01.

Covers, in one pass: filter-then-frame per group key (test_map),
map-state folds with Option keys (test_map_delete), aggregate lets
over group-map subqueries + date-literal map_delete
(test_map_delete_end), Option-wrapped per-key arithmetic
(test_map_double), empty-frame latest collect (moe's latest_four =
[]), and all-tombstone newest (NA)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

Z = "/root/reference/icicle-compiler/test/cli/zebra"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(Z), reason="reference tree not present"
)


def _facts(spark):
    rows, seq = [], 0
    with open(f"{Z}/input.ztxt", encoding="utf-8") as f:
        for line in f:
            obj = json.loads(line)
            ent = obj["key"]["entity_id"]
            for fact in obj["value"]["default:injury"]:
                v = fact["value"][0]["some"]
                act = v["action"]
                act = act.get("some") if isinstance(act, dict) else act
                rows.append(
                    {
                        "entity": ent,
                        "time": pd.Timestamp(
                            fact["key"]["time"]
                        ).to_pydatetime(),
                        "action": act,
                        "location": v["location"],
                        "severity": float(v["severity"]),
                        "tombstone": False,
                        "seq": seq,
                    }
                )
                seq += 1
    return spark.createDataFrame(pd.DataFrame(rows))


# expected.psv, decoded: columns in dictionary declaration order
EXPECTED = {
    "homer": {
        "latest_four": ["ignore"],
        "newest": None,
        "test_map": {"arm": [], "torso": ["ignore"]},
        "test_map_delete": {"arm": 4.0},
        "test_map_delete_end": {
            f"2016-01-0{i}": 1 for i in range(1, 6)
        },
        "test_map_double": {"arm": 0.04, "torso": 0.04},
    },
    "marge": {
        "latest_four": ["ignore"],
        "newest": None,
        "test_map": {"head": ["ignore"], "leg": []},
        "test_map_delete": {"leg": 4.0},
        "test_map_delete_end": {
            f"2016-01-0{i}": 1 for i in range(1, 6)
        },
        "test_map_double": {"head": 0.04, "leg": 0.04},
    },
    "moe": {
        "latest_four": [],
        "newest": None,
        "test_map": {"ear": [], "hair": []},
        "test_map_delete": {"ear": 1.0, "hair": 2.0},
        "test_map_delete_end": {"2016-01-01": 1, "2016-01-02": 1},
        "test_map_double": {"ear": 0.01, "hair": 0.02},
    },
}


def _norm(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return [_norm(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, np.generic):
        return v.item()
    if v is None or (isinstance(v, float) and v != v):
        return None
    return v


def test_zebra_cli_golden(spark):
    from icicle_spark.plans import icicle_snapshot
    from icicle_spark.source_lang import parse_dictionary_file

    d, skipped = parse_dictionary_file(
        f"{Z}/dictionary.icicle", seq_col="seq"
    )
    assert skipped == {}
    assert list(d.outputs) == [
        "latest_four", "newest", "test_map", "test_map_delete",
        "test_map_delete_end", "test_map_double",
    ]
    out = d.run(
        spark,
        frames={"injury": _facts(spark)},
        snapshot=icicle_snapshot("2016-02-01"),
        strategy="auto",
    )
    res = out["injury"].toPandas().set_index("entity")
    assert sorted(res.index) == ["homer", "marge", "moe"]
    for ent, feats in EXPECTED.items():
        for fname, want in feats.items():
            got = _norm(res.loc[ent, fname])
            if isinstance(want, dict) and want and all(
                isinstance(x, float) for x in want.values()
            ):
                assert set(got) == set(want), (ent, fname, got)
                for k in want:
                    assert got[k] == pytest.approx(want[k]), (
                        ent, fname, k, got[k],
                    )
            else:
                assert got == want, (ent, fname, got, want)
