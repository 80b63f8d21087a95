"""Deterministic sampling: same rows at any parallelism, correct
proportions, disjoint+exhaustive splits."""

from __future__ import annotations

import pytest

from icicle_spark.operators.sampling import (
    deterministic_sample,
    mix_sources,
    split_train_holdout,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_sample_reproducible_across_partitionings(spark, docs):
    a = set(
        r.doc_id
        for r in deterministic_sample(docs, 0.3, "doc_id").select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(17), 0.3, "doc_id"
        ).select("doc_id").collect()
    )
    assert a == b
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08
    # a different seed redraws
    c = set(
        r.doc_id
        for r in deterministic_sample(docs, 0.3, "doc_id", seed=9)
        .select("doc_id")
        .collect()
    )
    assert c != a


def test_sample_is_nested_by_fraction(spark, docs):
    """fraction=0.2 selects a SUBSET of fraction=0.5 (same seed) —
    shrinking a mixture weight only removes rows, never swaps them."""
    small = set(r.doc_id for r in deterministic_sample(docs, 0.2, "doc_id").collect())
    big = set(r.doc_id for r in deterministic_sample(docs, 0.5, "doc_id").collect())
    assert small <= big


def test_mix_sources_weights(spark, docs):
    base = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    weights = {s: w for s, w in zip(sorted(base.index), [1.0, 0.5, 0.1])}
    mixed = (
        mix_sources(docs, weights)
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    for s, w in weights.items():
        got = mixed.get(s, 0) / base[s]
        assert abs(got - w) < 0.12, (s, w, got)
    # unlisted sources drop by default
    assert set(mixed.index) <= set(weights)


def test_split_disjoint_exhaustive_stable(spark, docs):
    train, hold = split_train_holdout(docs, 0.25, "doc_id")
    t = set(r.doc_id for r in train.select("doc_id").collect())
    h = set(r.doc_id for r in hold.select("doc_id").collect())
    assert t.isdisjoint(h)
    assert len(t) + len(h) == docs.count()
    # growing the corpus never flips an existing key's side
    sub = docs.where("doc_id < 200")
    t2, h2 = split_train_holdout(sub, 0.25, "doc_id")
    assert set(r.doc_id for r in h2.collect()) == {i for i in h if i < 200}
