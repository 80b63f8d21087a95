"""Tokenize-and-pack pipeline smoke: base tokenize -> BPE train ->
apply -> dense remap -> pack, through the spark-submit entry point."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from jobs.run_tokenize import main


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rows = [
        (1, "abab abab abab", "web"),
        (2, "the cat sat on the mat the cat sat", "web"),
        (3, "abababab", "books"),
        (4, "", "books"),
        (5, "xyz xyz xyz xyz xyz", "web"),
    ]
    p = tmp_path_factory.mktemp("tok")
    src = str(p / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    return src


def test_tokenize_pipeline(spark, corpus, tmp_path):
    out = str(tmp_path / "out")
    assert main([
        "--input", corpus, "--output", out,
        "--base", "codepoint", "--merges", "6", "--seq-len", "16",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["n_docs"] == 5
    assert 1 <= summary["n_merges"] <= 6
    assert summary["vocab_size"] >= 2
    assert summary["n_oov"] == 0  # vocab built from the same corpus
    merges = spark.read.parquet(os.path.join(out, "merges.parquet"))
    assert merges.count() == summary["n_merges"]
    packed = spark.read.parquet(os.path.join(out, "packed.parquet"))
    rows = packed.collect()
    assert len(rows) == summary["packed_sequences"]
    # every window is exactly seq_len except possibly the last,
    # all ids within [0, vocab_size] (vocab_size == eos)
    lens = sorted((r["n_tok"] for r in rows), reverse=True)
    assert all(n == 16 for n in lens[:-1]) and 0 < lens[-1] <= 16
    hi = summary["vocab_size"]
    for r in rows:
        assert all(0 <= t <= hi for t in r["tokens"])
    # total packed tokens = dense tokens + one eos per doc
    assert sum(r["n_tok"] for r in rows) == summary["n_tokens"] + 5


def test_tokenize_utf8_and_sample(spark, corpus, tmp_path):
    out = str(tmp_path / "out8")
    assert main([
        "--input", corpus, "--output", out,
        "--base", "utf8", "--merges", "3", "--sample", "0.9",
        "--no-pack",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["packed_sequences"] is None
    toks = spark.read.parquet(os.path.join(out, "tokenized.parquet"))
    assert toks.count() == 5
    assert "tokens" in toks.columns


def test_tokenize_pretokenized_column(spark, tmp_path):
    src = str(tmp_path / "pre.parquet")
    spark.createDataFrame(
        [(1, [1, 2, 1, 2, 1, 2]), (2, [1, 2, 3, 1, 2])],
        "doc_id int, toks array<int>",
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "outp")
    assert main([
        "--input", src, "--output", out, "--tokens-col", "toks",
        "--merges", "2", "--seq-len", "4",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    # (1,2) occurs 5x -> merged; dense ids start at 0
    assert summary["n_merges"] >= 1
    assert summary["n_tokens"] < 11


def test_tokenize_bin_pack_mode(spark, corpus, tmp_path):
    """--pack-mode bin: no-split windows, fixed seq_len shape, every
    window holds whole (eos-terminated) documents; token totals
    conserved up to padding."""
    out = str(tmp_path / "out_bin")
    assert main([
        "--input", corpus, "--output", out,
        "--base", "codepoint", "--merges", "4", "--seq-len", "16",
        "--pack-mode", "bin",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["pack_mode"] == "bin"
    packed = spark.read.parquet(os.path.join(out, "packed.parquet"))
    rows = packed.collect()
    assert rows and summary["packed_sequences"] == len(rows)
    pad = None
    for r in rows:
        assert len(r["tokens"]) == 16  # padded to shape
        assert r["n_tok"] <= 16
        tail = r["tokens"][r["n_tok"]:]
        if tail:
            pad = pad if pad is not None else tail[0]
            assert all(t == pad for t in tail)


def test_tokenize_fim_mode(spark, corpus, tmp_path):
    """--fim-rate: sentinels (vocab+2..vocab+4) appear in transformed
    docs; token multiset minus sentinels is conserved vs a fim-less
    run of the same pipeline."""
    out = str(tmp_path / "out_fim")
    base = str(tmp_path / "out_nofim")
    common = [
        "--input", corpus, "--base", "codepoint", "--merges", "4",
        "--seq-len", "16", "--no-pack",
    ]
    assert main(common + ["--output", base]) == 0
    assert main(common + ["--output", out, "--fim-rate", "1.0"]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["fim"] == {"rate": 1.0, "mode": "psm"}
    v = summary["vocab_size"]
    sents = {v + 2, v + 3, v + 4}
    a = spark.read.parquet(os.path.join(base, "tokenized.parquet"))
    b = spark.read.parquet(os.path.join(out, "tokenized.parquet"))
    pa = {r["doc_id"]: list(r["tokens"]) for r in a.collect()}
    pb = {r["doc_id"]: list(r["tokens"]) for r in b.collect()}
    assert set(pa) == set(pb)
    n_fim = 0
    for k in pa:
        body = [t for t in pb[k] if t not in sents]
        assert sorted(body) == sorted(pa[k])
        if len(pa[k]) >= 2:
            n_fim += 1
            assert len(pb[k]) == len(pa[k]) + 3
    assert n_fim


def test_tokenize_pack_order_epoch(spark, tmp_path):
    """An epoch-upsampled corpus (duplicate (source, doc_id)) bin-packs
    via --pack-order epoch; without it the packer refuses loudly."""
    rows = [
        ("s0", 1, 0, "alpha beta gamma"),
        ("s0", 1, 1, "alpha beta gamma"),
        ("s0", 2, 0, "delta epsilon"),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "epoch", "text"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "o")
    assert main([
        "--input", src, "--output", out, "--base", "codepoint",
        "--merges", "2", "--seq-len", "32", "--pack-mode", "bin-ffd",
        "--pack-order", "epoch",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["packed_sequences"] >= 1
    with pytest.raises(SystemExit, match="--pack-order columns"):
        main([
            "--input", src, "--output", str(tmp_path / "o2"),
            "--base", "codepoint", "--merges", "2", "--seq-len", "32",
            "--pack-order", "nope",
        ])
