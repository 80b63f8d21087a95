"""Chunking / packing / PII-redaction semantics (training-pipeline
extensions; chunk rule mirrored by the chunk_docs DuckDB oracle)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.functions.text import redact_pii
from icicle_spark.operators.chunking import chunk_documents, pack_chunks


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),   # 10 words
        (1, "one"),                                   # single word
        (2, ""),                                      # empty -> no chunks
        (3, "  a   b  c "),                           # stray whitespace
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).cache()


def test_chunk_windows_no_overlap(docs):
    out = (
        chunk_documents(docs, max_words=4, overlap=0)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert list(d0.chunk_text) == [
        "w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9",
    ]
    assert list(d0.n_words) == [4, 4, 2]
    assert list(out[out.doc_id == 1].chunk_text) == ["one"]
    assert (out.doc_id != 2).all()           # empty doc: no chunks
    assert list(out[out.doc_id == 3].chunk_text) == ["a b c"]


def test_chunk_windows_overlap(docs):
    out = (
        chunk_documents(docs.where("doc_id = 0"), max_words=4, overlap=2)
        .toPandas()
        .sort_values("chunk_id")
    )
    # stride 2: starts 0,2,4,6,8
    assert list(out.chunk_text) == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9", "w8 w9",
    ]
    with pytest.raises(ValueError):
        chunk_documents(docs, max_words=4, overlap=4)


def test_chunks_reassemble_lossless(spark):
    """Invariant: with overlap=0, concatenating a document's chunks in
    chunk_id order reproduces the normalized word stream exactly, and
    n_words sums to the document's word count."""
    import numpy as np

    rng = np.random.default_rng(5)
    texts = [
        " ".join(f"t{rng.integers(0, 50)}" for _ in range(int(n)))
        for n in rng.integers(1, 40, 25)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    out = (
        chunk_documents(docs, max_words=7, overlap=0)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    joined = out.groupby("doc_id")["chunk_text"].apply(" ".join)
    sums = out.groupby("doc_id")["n_words"].sum()
    for i, t in enumerate(texts):
        assert joined[i] == t, i
        assert sums[i] == len(t.split()), i


def test_pack_chunks_bins(spark):
    chunks = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1] * 5,
                "chunk_id": range(5),
                "n_words": [30, 30, 30, 30, 30],
            }
        )
    )
    out = (
        pack_chunks(chunks, budget=64)
        .toPandas()
        .sort_values("chunk_id")
    )
    # start offsets 0,30,60,90,120 -> bins 0,0,0,1,1
    assert list(out.bin_id) == [0, 0, 0, 1, 1]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-am.co, ip 192.168.001.4, ssn 123-45-6789, "
             "tel +44 20 7946 0958, clean 42 stays")],
        "id int, text string",
    )
    out = df.select(redact_pii(F.col("text")).alias("t")).first()["t"]
    assert "<EMAIL>" in out and "<IP>" in out
    assert "<SSN>" in out and "<PHONE>" in out
    assert "clean 42 stays" in out
    assert "@" not in out and "192.168" not in out
    # kind subset: only emails touched
    out2 = df.select(
        redact_pii(F.col("text"), kinds=["email"]).alias("t")
    ).first()["t"]
    assert "<EMAIL>" in out2 and "192.168.001.4" in out2
