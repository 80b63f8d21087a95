"""Hashed linear classifier: formula-weight Column expression vs the
learned-weights broadcast-join path, edge cases, determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.quality_ml import (
    classifier_score,
    formula_weight_table,
    score_with_weights,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_weights_join_path_matches_formula_column(spark, docs):
    """Materializing the formula pseudo-model into a weight table and
    scoring through explode+broadcast-join+groupBy must reproduce the
    zero-shuffle Column expression exactly (same hash, same weights,
    same mean)."""
    dim, bias = 512, -0.25
    col = docs.select(
        "doc_id",
        classifier_score(F.col("text"), dim=dim, bias=bias).alias("s"),
    )
    tab = score_with_weights(
        docs,
        formula_weight_table(spark, dim),
        dim=dim,
        bias=bias,
        out_col="s",
    )
    a = {r.doc_id: r.s for r in col.collect()}
    b = {r.doc_id: r.s for r in tab.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)


def test_empty_text_scores_sigmoid_bias(spark):
    bias = 0.7
    d = spark.createDataFrame(
        [("a", ""), ("b", "   "), ("c", "!!! ???")], "doc_id string, text string"
    )
    out = d.select(
        "doc_id", classifier_score(F.col("text"), bias=bias).alias("s")
    ).collect()
    want = 1.0 / (1.0 + math.exp(-bias))
    assert all(abs(r.s - want) < 1e-12 for r in out)


def test_scores_bounded_and_deterministic(spark, docs):
    out1 = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", classifier_score(F.col("text")).alias("s")
        ).collect()
    }
    assert all(0.0 < s < 1.0 for s in out1.values())
    out2 = {
        r.doc_id: r.s
        for r in docs.repartition(13)
        .select("doc_id", classifier_score(F.col("text")).alias("s"))
        .collect()
    }
    assert out1 == out2


def test_missing_buckets_weigh_zero(spark):
    """A weights table covering NO buckets scores every doc
    sigmoid(bias) — absent weights are 0, not dropped tokens."""
    d = spark.createDataFrame(
        [("a", "hello world"), ("b", "more words here")],
        "doc_id string, text string",
    )
    empty = spark.createDataFrame([], "bucket long, weight double")
    out = score_with_weights(d, empty, dim=64, bias=0.5).collect()
    want = 1.0 / (1.0 + math.exp(-0.5))
    assert len(out) == 2 and all(abs(r.clf_score - want) < 1e-12 for r in out)


def test_weights_join_is_broadcast(spark, docs):
    dim = 256
    plan = score_with_weights(
        docs, formula_weight_table(spark, dim), dim=dim
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
