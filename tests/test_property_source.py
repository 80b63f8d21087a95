"""Property test over the SOURCE grammar: randomly generated query
strings (contexts x aggregate-expression tails) must evaluate
identically through the native Catalyst compiler and the cogroup
executor — catching parser or backend divergence in one sweep.

Generated forms stay in the cross-dialect expression subset (bare
columns and `value > N` comparisons are valid in both Spark SQL and
pandas-eval), so ONE query string runs on both backends."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from icicle_spark.plans import icicle_snapshot, run_plan
from icicle_spark.source_lang import parse_program

SNAP = icicle_snapshot("2024-03-01")

AGGS = ["sum", "count", "mean", "min", "max", "variance", "sd"]
OPS = ["+", "-", "*", "/"]


def _rand_query(rng: np.random.Generator) -> str:
    parts = ["from facts"]
    if rng.random() < 0.4:
        parts.append(f"filter value > {int(rng.integers(-20, 60))}")
    if rng.random() < 0.3:
        parts.append(f"windowed {int(rng.integers(5, 40))} days")
    has_let = rng.random() < 0.3
    if has_let:
        parts.append(f"let x = value + {int(rng.integers(1, 9))}")
    n_terms = int(rng.integers(1, 4))
    terms = []
    for _ in range(n_terms):
        agg = AGGS[int(rng.integers(0, len(AGGS)))]
        expr = rng.choice(
            ["value", "x" if has_let else "value", "(value * 2)"]
        )
        terms.append(f"{agg} {expr}")
    tail = terms[0]
    for t in terms[1:]:
        tail = f"{tail} {OPS[int(rng.integers(0, len(OPS)))]} {t}"
    parts.append(tail)
    return " ~> ".join(parts)


@pytest.fixture(scope="module")
def facts(spark):
    rng = np.random.default_rng(17)
    n = 4000
    pdf = pd.DataFrame(
        {
            "entity": [f"e{i}" for i in rng.integers(0, 80, n)],
            "time": np.datetime64("2024-01-01")
            + rng.integers(0, 55 * 86_400, n).astype("timedelta64[s]"),
            "value": rng.normal(20, 25, n).round(2),
            "seq": np.arange(n, dtype=np.int64),
        }
    )
    return spark.createDataFrame(pdf).cache()


def test_random_source_programs_commute(spark, facts):
    rng = np.random.default_rng(23)
    queries = {f"q{i}": _rand_query(rng) for i in range(30)}
    outs = {}
    for strat, dialect in (("native", "sql"), ("cogroup", "pandas")):
        plan = parse_program(
            queries, dialect=dialect, skip_nulls=True,
            entity_col="entity", time_col="time", seq_col="seq",
        )["facts"]
        outs[strat] = (
            run_plan(facts, plan, snapshot=SNAP, strategy=strat)
            .toPandas().set_index("entity").sort_index()
        )
    a, b = outs["native"], outs["cogroup"]
    assert list(a.index) == list(b.index)
    for name, q in queries.items():
        av = a[name].to_numpy(dtype=float)
        bv = b[name].to_numpy(dtype=float)
        ok = np.isclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
        # inf == inf (division by ~0 postcomps can legitimately blow
        # up identically on both engines)
        ok |= (av == bv)
        assert ok.all(), (name, q)
