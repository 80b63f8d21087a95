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
