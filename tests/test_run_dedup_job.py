"""Smoke tests for the spark-submit dedup pipeline (jobs/run_dedup.py):
exact -> near-dup pairs -> connected-component survivors, fresh and
incremental (MinHash band index and SimHash chunk index), asserting
the job's decisions match the library operators run inline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Corpus with an exact dup (0/1), a near dup of 0 (2), and
    filler; written to parquet for the CLI."""
    rng = np.random.default_rng(23)
    vocab = BASE.split()
    rows = [(0, BASE), (1, BASE), (2, BASE.replace("windowsill", "doorstep"))]
    for i in range(3, 20):
        rows.append((i, " ".join(rng.choice(vocab, size=30))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    path = str(tmp_path_factory.mktemp("corpus") / "docs")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path, df


def _decisions(spark, path) -> pd.DataFrame:
    return (
        spark.read.parquet(path).toPandas().set_index("doc_id").sort_index()
    )


def test_job_fresh_minhash_matches_inline(spark, corpus, tmp_path):
    from icicle_spark.operators.dedup import (
        dedup_survivors,
        exact_dedup,
        minhash_dedup_pairs,
    )
    from jobs.run_dedup import main

    src, docs = corpus
    out = str(tmp_path / "decisions")
    pairs_out = str(tmp_path / "pairs")
    idx_out = str(tmp_path / "index")
    assert main([
        "--input", src, "--output", out, "--method", "minhash",
        "--threshold", "0.5", "--pairs-out", pairs_out,
        "--write-index", idx_out,
    ]) == 0
    got = _decisions(spark, out)

    # inline reference: exact survivors -> near pairs -> survivors
    kept = exact_dedup(docs).select("doc_id")
    surv = docs.join(kept, on="doc_id")
    pairs = minhash_dedup_pairs(surv, threshold=0.5)
    want = (
        dedup_survivors(surv, pairs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # the job additionally folds exact-dropped ids into their
    # survivor's cluster: doc 1 points at doc 0's cluster
    assert not got.loc[1, "keep"] and got.loc[1, "cluster"] == 0
    for doc_id in want.index:
        assert got.loc[doc_id, "keep"] == want.loc[doc_id, "keep"], doc_id
        assert got.loc[doc_id, "cluster"] == want.loc[doc_id, "cluster"], doc_id
    # near dup 2 collapsed into 0's cluster; one survivor per cluster
    assert got.loc[2, "cluster"] == 0 and not got.loc[2, "keep"]
    assert (got.groupby("cluster")["keep"].sum() == 1).all()
    # the persisted band index is reusable (partitioned by band)
    idx = spark.read.parquet(idx_out)
    assert set(idx.columns) == {"doc_id", "band", "bh"}


def test_job_incremental_minhash(spark, corpus, tmp_path):
    """--index: only the increment is banded; decisions for the
    increment match the fresh full-corpus run."""
    from jobs.run_dedup import main

    src, docs = corpus
    old_path = str(tmp_path / "old")
    inc_path = str(tmp_path / "inc")
    docs.where("doc_id <> 2").write.mode("overwrite").parquet(old_path)
    docs.where("doc_id = 2").write.mode("overwrite").parquet(inc_path)
    idx_path = str(tmp_path / "index")
    out_full = str(tmp_path / "out_full")
    out_inc = str(tmp_path / "out_inc")

    # pass 1: index the old corpus
    assert main([
        "--input", old_path, "--output", out_full, "--method", "minhash",
        "--threshold", "0.5", "--write-index", idx_path,
    ]) == 0
    # pass 2: dedup the increment against the persisted index
    assert main([
        "--input", inc_path, "--output", out_inc, "--method", "minhash",
        "--threshold", "0.5", "--index", idx_path,
        "--corpus-texts", old_path,
    ]) == 0
    inc = _decisions(spark, out_inc)
    # doc 2 is a near dup of indexed doc 0 -> dropped into 0's cluster
    assert not inc.loc[2, "keep"] and inc.loc[2, "cluster"] == 0


def test_job_incremental_simhash_dispatch(spark, corpus, tmp_path):
    """--method simhash --index runs the SIMHASH incremental path
    against a simhash chunk index (round-2 ADVICE: the method flag
    used to be ignored with --index)."""
    from jobs.run_dedup import main

    src, docs = corpus
    old_path = str(tmp_path / "old")
    inc_path = str(tmp_path / "inc")
    docs.where("doc_id <> 1").write.mode("overwrite").parquet(old_path)
    docs.where("doc_id = 1").write.mode("overwrite").parquet(inc_path)
    idx_path = str(tmp_path / "index")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    assert main([
        "--input", old_path, "--output", out1, "--method", "simhash",
        "--write-index", idx_path,
    ]) == 0
    idx = spark.read.parquet(idx_path)
    assert {"ck", "cv", "fp"} <= set(idx.columns)  # chunk index, not bands
    assert main([
        "--input", inc_path, "--output", out2, "--method", "simhash",
        "--index", idx_path,
    ]) == 0
    inc = _decisions(spark, out2)
    # doc 1 is an exact dup of indexed doc 0: hamming 0 -> dropped
    assert not inc.loc[1, "keep"] and inc.loc[1, "cluster"] == 0


def test_job_exact_with_index_errors(corpus, tmp_path):
    from jobs.run_dedup import main

    src, _ = corpus
    with pytest.raises(SystemExit):
        main([
            "--input", src, "--output", str(tmp_path / "o"),
            "--method", "exact", "--index", str(tmp_path / "idx"),
        ])


def _textured(seed: int, n: int = 48) -> np.ndarray:
    from numpy.lib.stride_tricks import sliding_window_view

    r = np.random.default_rng(seed)
    raw = r.normal(0, 1, (n, n))
    sm = sliding_window_view(
        np.pad(raw, 2, mode="edge"), (5, 5)
    ).reshape(n, n, 25).mean(-1)
    g = ((sm - sm.min()) / (sm.max() - sm.min()) * 130 + 60).astype(np.uint8)
    return np.stack([g] * 3, axis=2)


@pytest.fixture(scope="module")
def image_corpus(spark, tmp_path_factory):
    """Images: 0/1 byte-identical, 2 a brightness-shifted copy of 0
    (pHash-invariant near dup, different bytes), 3.. distinct
    textures."""
    from icicle_spark.operators.multimodal import encode_png

    base = _textured(0, 64)
    shifted = (base.astype(int) + 25).astype(np.uint8)
    rows = [
        (0, encode_png(base)),
        (1, encode_png(base)),
        (2, encode_png(shifted)),
    ] + [(i, encode_png(_textured(i, 64))) for i in range(3, 10)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    path = str(tmp_path_factory.mktemp("imgs") / "docs")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    return path, df


def test_job_phash_fresh(spark, image_corpus, tmp_path):
    """--method phash: exact byte dup 1 and perceptual near dup 2 both
    collapse into doc 0's cluster; fingerprint index is persisted."""
    from jobs.run_dedup import main

    src, _ = image_corpus
    out = str(tmp_path / "dec")
    idx = str(tmp_path / "idx")
    pairs_out = str(tmp_path / "pairs")
    assert main([
        "--input", src, "--output", out, "--method", "phash",
        "--write-index", idx, "--pairs-out", pairs_out,
    ]) == 0
    got = _decisions(spark, out)
    assert not got.loc[1, "keep"] and got.loc[1, "cluster"] == 0
    assert not got.loc[2, "keep"] and got.loc[2, "cluster"] == 0
    assert got.loc[3:, "keep"].all()
    assert (got.groupby("cluster")["keep"].sum() == 1).all()
    idx_df = spark.read.parquet(idx)
    assert set(idx_df.columns) == {"doc_id", "phash"}
    # byte-identical dup 1 was collapsed before hashing: not indexed
    assert idx_df.count() == 9


def test_job_phash_incremental(spark, image_corpus, tmp_path):
    """--index: the increment (a re-encode of indexed doc 0) decodes
    alone but still pairs with the indexed fingerprints; the refreshed
    index unions old + new."""
    from jobs.run_dedup import main

    src, docs = image_corpus
    old_path = str(tmp_path / "old")
    inc_path = str(tmp_path / "inc")
    docs.where("doc_id <> 2").write.mode("overwrite").parquet(old_path)
    docs.where("doc_id = 2").write.mode("overwrite").parquet(inc_path)
    idx1 = str(tmp_path / "idx1")
    idx2 = str(tmp_path / "idx2")
    out1 = str(tmp_path / "o1")
    out2 = str(tmp_path / "o2")
    assert main([
        "--input", old_path, "--output", out1, "--method", "phash",
        "--write-index", idx1,
    ]) == 0
    assert main([
        "--input", inc_path, "--output", out2, "--method", "phash",
        "--index", idx1, "--write-index", idx2,
    ]) == 0
    inc = _decisions(spark, out2)
    assert not inc.loc[2, "keep"] and inc.loc[2, "cluster"] == 0
    idx = spark.read.parquet(idx2)
    assert idx.count() == 9  # 8 old exact-survivors + the increment
    assert idx.select("doc_id").distinct().count() == 9
