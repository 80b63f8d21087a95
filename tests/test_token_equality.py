"""The north-rule per-row invariant: token arrays must survive the
engine EXACTLY (element-for-element int equality), both as pass-through
values of array-valued folds (newest/collect over `tokens`) and at
every entity x query-time under the strict `<` as-of rule.

Reference semantics: a fact's value is opaque to the fold machinery —
Icicle buffers/captures values without transforming them
(icicle-core/src/Icicle/Core/Eval/Stream.hs:76-99); an engine that
round-trips tokens through Arrow must not cast, pad, or reorder them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.plans import Agg, Feature, Plan, run_plan
from icicle_spark.sources.fixtures import token_facts, token_facts_pdf

SNAP = "2024-05-30 00:00:00"


@pytest.fixture(scope="module")
def facts(spark):
    return token_facts(spark, n_rows=3000, n_docs=120).cache()


@pytest.fixture(scope="module")
def facts_pdf():
    return token_facts_pdf(n_rows=3000, n_docs=120)


def _oracle_newest(pdf: pd.DataFrame, snap: str):
    """Newest NON-tombstoned token array per doc (skip_nulls=True ≙
    `filter not tombstone ~> newest tokens`)."""
    vis = pdf[pdf["event_time"] < pd.Timestamp(snap)]
    vis = vis.sort_values(["doc_id", "event_time", "seq"])
    out = {}
    for doc, grp in vis.groupby("doc_id"):
        nn = grp[grp["tokens"].notna()]
        out[doc] = nn["tokens"].iloc[-1] if len(nn) else None
    return out


def _tok_plan(latest: int | None = None) -> Plan:
    return Plan(
        [
            Feature(
                "newest_tokens",
                Agg.NEWEST,
                "tokens",
                dtype="array<int>",
                skip_nulls=True,
                latest=latest,
            ),
        ],
        entity_col="doc_id",
        time_col="event_time",
        seq_col="seq",
    )


def test_newest_tokens_exact_equality(spark, facts, facts_pdf):
    """Executor path: the newest visible token array per doc equals
    the pandas oracle element-for-element (exact ints, no tolerance)."""
    got = run_plan(facts, _tok_plan(), snapshot=SNAP).toPandas()
    got = got.set_index("doc_id")["newest_tokens"]
    expect = _oracle_newest(facts_pdf, SNAP)
    checked = 0
    for doc, exp_tok in expect.items():
        actual = got[doc]
        if exp_tok is None or (isinstance(exp_tok, float) and pd.isna(exp_tok)):
            assert actual is None or (
                not isinstance(actual, (list, np.ndarray)) and pd.isna(actual)
            ), doc
            continue
        assert actual is not None, doc
        assert np.array_equal(
            np.asarray(actual, dtype="int64"), np.asarray(exp_tok, dtype="int64")
        ), doc
        checked += 1
    assert checked > 50  # the fixture has plenty of non-tombstone docs
    # docs with no visible facts surface as null, never a fabricated array
    empty_docs = set(facts_pdf["doc_id"]) - set(expect)
    for doc in empty_docs:
        assert doc in got.index and got[doc] is None or pd.isna(got[doc])


def test_collect_tokens_ordered_exact(spark, facts, facts_pdf):
    """COLLECT over n_tok preserves chronological order and exact
    values per entity — the buffered-elements case of latest-N."""
    plan = Plan(
        [
            Feature(
                "ntoks",
                Agg.COLLECT,
                "n_tok",
                latest=4,
                dtype="array<double>",
                skip_nulls=True,
            )
        ],
        entity_col="doc_id",
        time_col="event_time",
        seq_col="seq",
    )
    got = run_plan(facts, plan, snapshot=SNAP).toPandas().set_index("doc_id")["ntoks"]
    vis = facts_pdf[facts_pdf["event_time"] < pd.Timestamp(SNAP)]
    vis = vis.sort_values(["doc_id", "event_time", "seq"])
    for doc, grp in list(vis.groupby("doc_id"))[:80]:
        exp = grp["n_tok"].dropna().to_numpy()[-4:]
        act = got[doc]
        act = [] if act is None or (np.ndim(act) == 0 and pd.isna(act)) else act
        assert np.array_equal(
            np.asarray(act, dtype="float64"), exp.astype("float64")
        ), doc


def test_roundtrip_tokens_bit_exact(spark, facts, facts_pdf):
    """Scan-level invariant: reading the fixture back gives byte-equal
    token arrays in seq order (Arrow transport does not perturb)."""
    back = facts.select("seq", "tokens").toPandas().sort_values("seq")
    orig = facts_pdf.sort_values("seq")
    for a, b in zip(back["tokens"].to_numpy()[:500], orig["tokens"].to_numpy()[:500]):
        if b is None or (isinstance(b, float) and pd.isna(b)):
            assert a is None or (not isinstance(a, (list, np.ndarray)) and pd.isna(a))
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))
