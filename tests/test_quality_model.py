"""Seed-vs-crawl quality classifier: separation, scoring determinism,
Pareto-gate reproducibility, model persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.quality_model import (
    pareto_keep,
    score_quality,
    train_quality_classifier,
)

B = 1 << 12


@pytest.fixture(scope="module")
def corpora(spark):
    seed_rows = [
        (i,
         f"the history of science shows careful empirical reasoning "
         f"about nature experiments evidence and theory revision "
         f"across centuries of scholarship topic {i}")
        for i in range(12)
    ]
    spam_rows = [
        (100 + i,
         f"buy cheap pills casino bonus click subscribe winner prize "
         f"jackpot offer discount promo code limited stock order now "
         f"variant {i}")
        for i in range(12)
    ]
    mixed_rows = seed_rows[8:] + spam_rows[8:] + [
        (200, "scholarship about the history of experiments and "
              "evidence in science with careful theory revision"),
        (201, "jackpot casino promo click now cheap bonus pills "
              "subscribe discount winner order offer"),
    ]
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id bigint, text string"
    )
    return mk(seed_rows[:8]), mk(spam_rows[:8]), mk(mixed_rows)


@pytest.fixture(scope="module")
def model(corpora):
    pos, neg, _ = corpora
    return train_quality_classifier(pos, neg, buckets=B)


def test_classifier_separates_seed_from_spam(corpora, model):
    _, _, mixed = corpora
    p = {
        r.doc_id: r.quality_prob
        for r in score_quality(mixed, model, buckets=B).collect()
    }
    seedish = [i for i in p if i < 100 or i == 200]
    spammy = [i for i in p if 100 <= i < 200 or i == 201]
    assert min(p[i] for i in seedish) > max(p[i] for i in spammy)


def test_scoring_deterministic_under_repartition(corpora, model):
    _, _, mixed = corpora
    a = {
        r.doc_id: r.quality_prob
        for r in score_quality(mixed, model, buckets=B).collect()
    }
    b = {
        r.doc_id: r.quality_prob
        for r in score_quality(
            mixed.repartition(7), model, buckets=B
        ).collect()
    }
    assert a == b


def test_pareto_gate_deterministic_and_monotone(corpora, model):
    _, _, mixed = corpora
    scored = score_quality(mixed, model, buckets=B)
    a = {r.doc_id: r.kept for r in pareto_keep(scored).collect()}
    b = {
        r.doc_id: r.kept
        for r in pareto_keep(scored.repartition(5)).collect()
    }
    assert a == b
    # a different seed may redraw; alpha -> 0 keeps everything
    # (pareto draw diverges), huge alpha approaches the hard gate
    all_kept = pareto_keep(scored, alpha=0.01)
    assert all(r.kept for r in all_kept.collect())


def test_model_roundtrip(tmp_path, corpora, model):
    from pyspark.ml.classification import LogisticRegressionModel

    _, _, mixed = corpora
    p = str(tmp_path / "qmodel")
    model.save(p)
    loaded = LogisticRegressionModel.load(p)
    a = {
        r.doc_id: r.quality_prob
        for r in score_quality(mixed, model, buckets=B).collect()
    }
    b = {
        r.doc_id: r.quality_prob
        for r in score_quality(mixed, loaded, buckets=B).collect()
    }
    assert a == b


def test_exported_weights_score_parity(corpora, model):
    """Train once, score forever without MLlib: the exported
    (bucket, weight) table + pmod(hash(term), B) reproduces the
    model's probabilities (HashingTF's murmur3 replicated as a
    Column expression)."""
    from icicle_spark.operators.quality_model import (
        export_weights,
        score_exported,
    )

    _, _, mixed = corpora
    w, b = export_weights(model)
    a = {
        r.doc_id: r.quality_prob
        for r in score_quality(mixed, model, buckets=B).collect()
    }
    c = {
        r.doc_id: r.quality_prob
        for r in score_exported(mixed, w, b, buckets=B).collect()
    }
    assert set(a) == set(c)
    for i in a:
        assert a[i] == pytest.approx(c[i], rel=1e-9, abs=1e-12)


def test_curation_qmodel_stage(spark, tmp_path):
    import json
    import os

    import pandas as pd

    from jobs.run_curation import main

    seedish = ("the history of science shows careful empirical "
               "reasoning about nature experiments evidence and "
               "theory revision across centuries of scholarship")
    spammy = ("buy cheap pills casino bonus click subscribe winner "
              "prize jackpot offer discount promo code limited stock "
              "order now today only")
    rows = [(i, f"{seedish} topic {i}", "wiki") for i in range(6)]
    rows += [(10 + i, f"{seedish} field notes on experiments {i}",
              "web") for i in range(3)]
    rows += [(20 + i, f"{spammy} variant {i}", "web") for i in range(6)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--max-dup2", "1.0",
        "--qmodel-target", "source = 'wiki'",
        "--qmodel-alpha", "200",  # ~hard gate for a tiny corpus
        "--qmodel-buckets", "4096",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["qmodel"] == "source = 'wiki'"
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    # seed-like docs survive; the spam block is gated out
    assert set(kept.doc_id) <= set(range(0, 14))
    assert len(kept) >= 6
