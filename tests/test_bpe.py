"""BPE tokenizer training/application vs a pure-Python golden.

The golden is a direct transcription of the classic BPE trainer
(Sennrich et al. 2016): most frequent adjacent pair (tie-break count
desc, a asc, b asc), greedy left-to-right non-overlapping replacement,
repeat. Token-array equality is exact per row (the repo's per-row
invariant)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.bpe import (
    _greedy_keep,
    bpe_apply,
    bpe_train,
    pair_counts,
    top_pair,
)


# ---------------------------------------------------------------- golden
def py_merge_one(seq: list[int], a: int, b: int, new: int) -> list[int]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def py_train(corpus: list[list[int]], n_merges: int, min_count: int = 2):
    corpus = [list(s) for s in corpus]
    new_id = max((t for s in corpus for t in s), default=-1) + 1
    merges = []
    for rank in range(n_merges):
        cnt: Counter = Counter()
        for s in corpus:
            # count ALL adjacent pairs (overlaps included) — this is
            # what a corpus-wide pair scan sees, and what pair_counts
            # computes; the reference trainers count the same way
            for x, y in zip(s, s[1:]):
                cnt[(x, y)] += 1
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((rank, a, b, new_id + rank, c))
        corpus = [py_merge_one(s, a, b, new_id + rank) for s in corpus]
    return merges, corpus


CORPUS = [
    [1, 2, 3, 1, 2, 1, 2],
    [2, 3, 2, 3, 1, 2],
    [1, 1, 1, 1, 1],  # a==b overlap runs
    [],
    [7],
    [3, 1, 2, 3, 1, 2, 3],
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], "doc_id int, tokens array<int>"
    )


def test_greedy_keep_runs():
    import numpy as np

    # candidates 2,3,4,5 (a==b run): scan keeps 2 and 4
    assert _greedy_keep(np.array([2, 3, 4, 5])).tolist() == [2, 4]
    # disjoint candidates untouched
    assert _greedy_keep(np.array([1, 5, 9])).tolist() == [1, 5, 9]
    # two runs
    assert _greedy_keep(np.array([0, 1, 2, 7, 8])).tolist() == [0, 2, 7]
    assert _greedy_keep(np.array([], dtype=int)).size == 0


def test_pair_counts_matches_python(corpus_df):
    got = {
        (r["a"], r["b"]): r["cnt"] for r in pair_counts(corpus_df).collect()
    }
    want: Counter = Counter()
    for s in CORPUS:
        for x, y in zip(s, s[1:]):
            want[(x, y)] += 1
    assert got == dict(want)


def test_top_pair_tiebreak(corpus_df):
    cnt: Counter = Counter()
    for s in CORPUS:
        for x, y in zip(s, s[1:]):
            cnt[(x, y)] += 1
    (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert top_pair(corpus_df) == (a, b, c)


@pytest.mark.parametrize("n_merges", [1, 3, 6])
def test_train_and_apply_parity(spark, corpus_df, n_merges):
    want_merges, want_corpus = py_train(CORPUS, n_merges)
    mdf = bpe_train(corpus_df, "tokens", n_merges=n_merges)
    got_merges = [
        (r["rank"], r["a"], r["b"], r["new_id"], r["count"])
        for r in mdf.orderBy("rank").collect()
    ]
    assert got_merges == want_merges
    applied = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply(corpus_df, mdf, "tokens").collect()
    }
    # exact token-array equality per row
    assert applied == {i: s for i, s in enumerate(want_corpus)}


def test_apply_overlap_run_semantics(spark):
    # aaaaa + (a,a)->X: greedy leftmost -> X X a
    df = spark.createDataFrame([(0, [1, 1, 1, 1, 1])], "i int, tokens array<int>")
    got = bpe_apply(df, [(1, 1, 9)], "tokens").collect()[0]["bpe_tokens"]
    assert got == [9, 9, 1]
    # chained merges reuse fresh ids: (1,1)->9 then (9,9)->10
    got2 = bpe_apply(df, [(1, 1, 9), (9, 9, 10)], "tokens").collect()[0][
        "bpe_tokens"
    ]
    assert got2 == [10, 1]


def test_min_count_stops_early(spark):
    # every pair occurs once -> no merges at min_count=2
    df = spark.createDataFrame([(0, [1, 2, 3, 4])], "i int, tokens array<int>")
    assert bpe_train(df, "tokens", n_merges=4, min_count=2).count() == 0


def test_sampled_training_is_deterministic(spark, corpus_df):
    a = bpe_train(
        corpus_df, "tokens", n_merges=2, sample_fraction=0.8,
        sample_key="doc_id", seed=7,
    ).collect()
    b = bpe_train(
        corpus_df.repartition(5), "tokens", n_merges=2, sample_fraction=0.8,
        sample_key="doc_id", seed=7,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_passthrough_columns_and_empty(spark):
    df = spark.createDataFrame(
        [("x", []), ("y", [5, 5])], "k string, tokens array<int>"
    )
    out = bpe_apply(df, [(5, 5, 6)], "tokens").orderBy("k").collect()
    assert [r["k"] for r in out] == ["x", "y"]
    assert out[0]["bpe_tokens"] == []
    assert out[1]["bpe_tokens"] == [6]


def test_checkpoint_path_runs(spark, corpus_df):
    # checkpoint_every=1 exercises the lineage-truncation branch
    m = bpe_train(corpus_df, "tokens", n_merges=3, checkpoint_every=1)
    want, _ = py_train(CORPUS, 3)
    assert [
        (r["rank"], r["a"], r["b"], r["new_id"], r["count"])
        for r in m.orderBy("rank").collect()
    ] == want
