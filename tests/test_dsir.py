"""DSIR importance resampling: python-reference weight parity,
target-affinity, determinism under repartitioning, broadcast plan
shape."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.dsir import (
    dsir_logweights,
    dsir_resample,
    hashed_ngram_model,
)

B = 64  # tiny bucket space so the python reference is cheap


def _py_grams(text: str) -> list[str]:
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_bucket(g: str, buckets: int, seed: int = 0) -> int:
    h = hashlib.md5(f"{g}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) % buckets


def _py_logweights(raw, target, buckets, alpha=1.0):
    """(id -> (n_grams, logw)) exactly as the operator defines them."""
    cnt_r: Counter = Counter()
    cnt_t: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    for i, text in raw:
        bs = [_py_bucket(g, buckets) for g in _py_grams(text)]
        if bs:
            per_doc[i] = Counter(bs)
            cnt_r.update(bs)
    for _, text in target:
        cnt_t.update(_py_bucket(g, buckets) for g in _py_grams(text))
    nt, nr = sum(cnt_t.values()), sum(cnt_r.values())
    out = {}
    for i, bs in per_doc.items():
        lw = sum(
            c
            * (
                math.log((cnt_t.get(b, 0) + alpha) / (nt + alpha * buckets))
                - math.log((cnt_r[b] + alpha) / (nr + alpha * buckets))
            )
            for b, c in bs.items()
        )
        out[i] = (sum(bs.values()), lw)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat", "seed"),
        (1, "the cat ate the fish", "seed"),
        (2, "a cat sat near the mat", "raw"),
        (3, "stock market prices fell sharply today", "raw"),
        (4, "the dog sat on the mat", "raw"),
        (5, "quantum flux capacitor inverts polarity", "raw"),
        (6, "fish ate the cat on the mat", "raw"),
        (7, "zzz yyy xxx www vvv", "raw"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, kind string")


def test_logweights_match_python_reference(corpus):
    raw = corpus
    target = corpus.where(F.col("kind") == "seed")
    got = {
        r.doc_id: (r.n_grams, r.logw)
        for r in dsir_logweights(raw, target, buckets=B).collect()
    }
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    want = _py_logweights(
        rows, [(i, t) for i, t in rows if i in (0, 1)], B
    )
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)


def test_weights_prefer_target_like_docs(corpus):
    """Docs sharing the seed's vocabulary outscore off-domain docs.

    alpha is small relative to the toy corpus: with the default
    alpha=1 and buckets=4096 the smoothing mass (alpha*B) dwarfs the
    ~70 observed grams and flattens every ratio toward ln(1)."""
    target = corpus.where(F.col("kind") == "seed")
    w = {
        r.doc_id: r.logw / r.n_grams  # length-normalize for comparison
        for r in dsir_logweights(
            corpus, target, buckets=4096, alpha=0.01
        ).collect()
    }
    # 2/4/6 reuse seed words; 3/5/7 share none
    assert min(w[2], w[4], w[6]) > max(w[3], w[5], w[7])


def test_resample_deterministic_and_sized(corpus):
    target = corpus.where(F.col("kind") == "seed")
    a = [r.doc_id for r in dsir_resample(corpus, target, 3, buckets=B).collect()]
    b = [
        r.doc_id
        for r in dsir_resample(
            corpus.repartition(7), target, 3, buckets=B
        ).collect()
    ]
    assert len(a) == 3 and a == b
    with pytest.raises(ValueError):
        dsir_resample(corpus, target, 0)


def test_model_counts_and_plan_shape(corpus):
    m = hashed_ngram_model(corpus, buckets=B)
    total = m.agg(F.sum("cnt")).collect()[0][0]
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    assert total == sum(len(_py_grams(t)) for _, t in rows)
    # scoring joins the ratio table broadcast — no corpus-side
    # shuffle join in the weight plan
    target = corpus.where(F.col("kind") == "seed")
    plan = dsir_logweights(corpus, target, buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
