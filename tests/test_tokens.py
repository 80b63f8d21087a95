"""Token-sequence operator semantics vs brute-force python oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.tokens import (
    char_token_ids,
    corpus_token_freq,
    subseq_count,
    token_histogram,
    token_ngram_ids,
)

_M = (1 << 31) - 1


@pytest.fixture(scope="module")
def seqs(spark):
    rng = np.random.default_rng(3)
    rows = [
        (0, [1, 2, 3, 1, 2, 3, 1, 2]),
        (1, [5]),
        (2, []),
        (3, list(rng.integers(0, 50, 40))),
        (4, [7, 7, 7, 7]),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    pdf["tokens"] = pdf["tokens"].apply(lambda xs: [int(x) for x in xs])
    return spark.createDataFrame(
        pdf, "doc_id long, tokens array<long>"
    ).cache()


def _gram_ids(toks, n):
    out = []
    for i in range(len(toks) - n + 1):
        h = 0
        for x in toks[i : i + n]:
            h = (h * 131 + x) % _M
        out.append(h)
    return out


def test_ngram_ids_match_bruteforce(spark, seqs):
    for n in (2, 3):
        got = (
            seqs.select("doc_id", token_ngram_ids("tokens", n).alias("g"))
            .toPandas()
            .set_index("doc_id")
        )
        ref = seqs.select("doc_id", "tokens").toPandas().set_index("doc_id")
        for d in ref.index:
            assert list(got.loc[d, "g"]) == _gram_ids(list(ref.loc[d, "tokens"]), n), (
                n, d,
            )


def test_subseq_count_overlapping(spark, seqs):
    got = (
        seqs.select(
            "doc_id",
            subseq_count("tokens", [1, 2]).alias("c12"),
            subseq_count("tokens", [7, 7]).alias("c77"),
            subseq_count("tokens", [1, 2, 3, 1]).alias("c1231"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[0, "c12"] == 3
    assert got.loc[4, "c77"] == 3  # overlapping occurrences
    assert got.loc[0, "c1231"] == 2
    assert got.loc[1, "c12"] == 0 and got.loc[2, "c12"] == 0


def test_subseq_count_hash_collision_exact(spark):
    # [6, 869] has the same rolling id as [5, 1000]
    # (5*131 + 1000 == 6*131 + 869 == 1655): the id prefilter alone
    # would count it; slice verification must reject it.
    df = spark.createDataFrame(
        [(0, [6, 869, 5, 1000]), (1, [6, 869])],
        "doc_id int, tokens array<int>",
    )
    got = (
        df.select("doc_id", subseq_count("tokens", [5, 1000]).alias("c"))
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[0, "c"] == 1
    assert got.loc[1, "c"] == 0


def test_token_histogram(spark, seqs):
    got = (
        seqs.select("doc_id", token_histogram("tokens").alias("h"))
        .toPandas()
        .set_index("doc_id")
    )
    assert dict(got.loc[0, "h"]) == {1: 3, 2: 3, 3: 2}
    assert dict(got.loc[4, "h"]) == {7: 4}
    assert dict(got.loc[2, "h"]) == {}


def test_corpus_token_freq(spark, seqs):
    from collections import Counter

    expect = Counter()
    for toks in seqs.select("tokens").toPandas()["tokens"]:
        expect.update(int(t) for t in toks)
    freq = corpus_token_freq(seqs, "tokens").toPandas().set_index("token")
    assert {int(k): int(v) for k, v in freq["freq"].items()} == dict(expect)
    top = corpus_token_freq(seqs, "tokens", k=2).toPandas()
    assert len(top) == 2
    assert top["freq"].is_monotonic_decreasing


def test_char_token_ids_deterministic(spark):
    df = spark.createDataFrame([("the table set",)], "text string")
    got = df.select(char_token_ids("text").alias("t")).first()["t"]
    assert got == [116 * 32 + 3, 116 * 32 + 5, 115 * 32 + 3]


# ------------------------------------------------- heavy hitters (MG)

def _zipf_docs(spark, n_docs=400, vocab=5000, seed=11, parts=16):
    """Skewed corpus: Zipf-ish token draws so a handful of tokens
    dominate (the heavy-hitter regime) over a long tail."""
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        n = int(rng.integers(5, 120))
        # zipf with cutoff; fold the tail into vocab range
        toks = (rng.zipf(1.3, n) % vocab).astype(np.int64)
        rows.append((d, [int(t) for t in toks]))
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    return spark.createDataFrame(
        pdf, "doc_id long, tokens array<long>"
    ).repartition(parts)


def _exact_hh(df, support):
    import math

    toks = df.select(F.explode("tokens").alias("t"))
    n = toks.count()
    thr = math.ceil(support * n)
    rows = (
        toks.groupBy("t").count().where(F.col("count") >= thr).collect()
    )
    return {r.t: r["count"] for r in rows}


@pytest.mark.parametrize("support", [0.02, 0.005, 0.001])
def test_heavy_hitters_exact_vs_bruteforce(spark, support):
    from icicle_spark.operators.tokens import heavy_hitters

    df = _zipf_docs(spark)
    got = {
        r.token: r.freq
        for r in heavy_hitters(df, "tokens", support=support).collect()
    }
    assert got == _exact_hh(df, support)
    assert got, "test corpus should contain heavy hitters"


def test_heavy_hitters_superset_guarantee_tiny_k(spark):
    """Even at the guarantee boundary (k = ceil(1/support) small and
    data adversarially partitioned), nothing is missed."""
    from icicle_spark.operators.tokens import heavy_hitters

    # one hot token spread thinly across many docs + uniform noise
    rng = np.random.default_rng(7)
    rows = []
    for d in range(300):
        toks = [9999] * 3 + [int(t) for t in rng.integers(0, 2000, 50)]
        rng.shuffle(toks)
        rows.append((d, toks))
    pdf = pd.DataFrame(rows, columns=["doc_id", "tokens"])
    df = spark.createDataFrame(
        pdf, "doc_id long, tokens array<long>"
    ).repartition(24)
    support = 0.05  # k = 20 counters only
    got = {
        r.token: r.freq
        for r in heavy_hitters(df, "tokens", support=support).collect()
    }
    assert got == _exact_hh(df, support)
    assert 9999 in got


def test_heavy_hitters_edges(spark, seqs):
    from icicle_spark.operators.tokens import heavy_hitters

    # empty / null arrays tolerated; support bounds validated
    got = heavy_hitters(seqs, "tokens", support=0.9).collect()
    assert got == []  # nothing reaches 90% of the corpus
    with pytest.raises(ValueError):
        heavy_hitters(seqs, "tokens", support=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(seqs, "tokens", support=1.5)


def test_mg_candidates_bounded_state(spark):
    """The per-partition summary is genuinely bounded by k."""
    from icicle_spark.operators.tokens import mg_candidates

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "doc_id": range(200),
            "tokens": [
                [int(t) for t in rng.integers(0, 10000, 80)]
                for _ in range(200)
            ],
        }
    )
    df = spark.createDataFrame(
        pdf, "doc_id long, tokens array<long>"
    ).repartition(4)
    k = 50
    per_part = (
        mg_candidates(df, "tokens", k=k)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert per_part and all(r["count"] <= k for r in per_part)


def test_fim_transform_python_replay(spark):
    """PSM and SPM rearrangements replay exactly from (fim_a, fim_b);
    non-sentinel token multiset is conserved; short/ungated docs pass
    through; deterministic under repartition."""
    import random

    from icicle_spark.operators.tokens import fim_transform

    rng = random.Random(4)
    rows = [
        (i, [rng.randrange(100) for _ in range(rng.randrange(0, 12))])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    src = dict((i, t) for i, t in rows)
    for mode in ("psm", "spm"):
        out = fim_transform(df, rate=0.6, seed=1, mode=mode).collect()
        n_fim = 0
        for r in out:
            t = src[r["doc_id"]]
            if not r["fim"]:
                assert list(r["tokens"]) == t
                assert r["fim_a"] is None and r["fim_b"] is None
                continue
            n_fim += 1
            a, b = r["fim_a"], r["fim_b"]
            assert 0 <= a <= b <= len(t) and len(t) >= 2
            p, m, s = t[:a], t[a:b], t[b:]
            if mode == "psm":
                want = [-101] + p + [-103] + s + [-102] + m
            else:
                want = [-101, -103] + s + [-102] + p + m
            assert list(r["tokens"]) == want
        assert 0 < n_fim < len(out)
    # rate bounds
    all_off = fim_transform(df, rate=0.0).collect()
    assert not any(r["fim"] for r in all_off)
    on = fim_transform(df, rate=1.0).collect()
    assert all(r["fim"] for r in on if len(src[r["doc_id"]]) >= 2)
    # repartition determinism
    a1 = sorted((r["doc_id"], list(r["tokens"])) for r in on)
    a2 = sorted(
        (r["doc_id"], list(r["tokens"]))
        for r in fim_transform(df.repartition(7), rate=1.0).collect()
    )
    assert a1 == a2


def test_fim_transform_zero_shuffle_plan(spark):
    from icicle_spark.operators.tokens import fim_transform

    df = spark.createDataFrame(
        [(1, [1, 2, 3])], "doc_id bigint, tokens array<int>"
    )
    plan = fim_transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_render_dialog_golden_and_plan(spark):
    """Role sentinels + eot per turn; loss mask 1 exactly on masked
    roles' content+eot; unknown role raises; zero-shuffle plan."""
    import pytest as _pt

    from icicle_spark.operators.tokens import render_dialog

    df = spark.createDataFrame(
        [
            (1, [("user", "hi there"), ("assistant", "hello friend ok")]),
            (2, [("system", "be nice"), ("user", "x"), ("assistant", "")]),
        ],
        "doc_id bigint, turns array<struct<role:string,content:string>>",
    )
    got = {r["doc_id"]: r for r in render_dialog(df).collect()}

    def tok(w):
        return ord(w[0]) * 32 + min(len(w), 31)

    t1 = [-202, tok("hi"), tok("there"), -200,
          -203, tok("hello"), tok("friend"), tok("ok"), -200]
    m1 = [0, 0, 0, 0, 0, 1, 1, 1, 1]
    assert list(got[1]["tokens"]) == t1
    assert list(got[1]["loss_mask"]) == m1
    assert got[1]["n_turns"] == 2
    t2 = [-201, tok("be"), tok("nice"), -200, -202, tok("x"), -200,
          -203, -200]
    m2 = [0, 0, 0, 0, 0, 0, 0, 0, 1]
    assert list(got[2]["tokens"]) == t2
    assert list(got[2]["loss_mask"]) == m2
    # mask/token lengths always agree
    assert all(
        len(r["tokens"]) == len(r["loss_mask"]) for r in got.values()
    )
    # unknown role raises loudly
    bad = spark.createDataFrame(
        [(1, [("robot", "beep")])],
        "doc_id bigint, turns array<struct<role:string,content:string>>",
    )
    with _pt.raises(Exception, match="unknown role"):
        render_dialog(bad).collect()
    # zero-shuffle, no Python
    plan = render_dialog(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
