"""Similarity-search operators: exact brute force vs a numpy oracle,
and recall bounds for the two approximate scale paths (LSH, IVF).

Mirrors the reference's cross-evaluator commuting strategy (SURVEY §5):
the same top-k question answered by independent implementations must
agree (exactly for brute force, by recall for ANN).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    lsh_topk,
)

K = 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _numpy_topk(emb_pdf, k):
    ids = emb_pdf["vec_id"].to_numpy()
    m = np.stack(emb_pdf["embedding"].to_numpy()).astype("float64")
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    out = {}
    for qid in ids[ids < 5]:
        sims = m @ m[list(ids).index(qid)]
        # round before ranking, ties by vec_id asc — same rule as the operator
        order = sorted(zip(-np.round(sims, 5), ids))[:k]
        out[int(qid)] = [int(v) for _, v in order]
    return out


def test_brute_force_matches_numpy(emb, queries):
    got = brute_force_topk(emb, queries, k=K, round_digits=5).toPandas()
    expect = _numpy_topk(emb.toPandas(), K)
    for qid, grp in got.groupby("query_id"):
        ranked = grp.sort_values(
            ["cosine_sim", "vec_id"], ascending=[False, True]
        )["vec_id"].tolist()
        assert ranked == expect[int(qid)]


def test_pandas_path_agrees_with_hof(emb, queries):
    a = brute_force_topk(emb, queries, k=K, round_digits=5).toPandas()
    b = brute_force_topk(emb, queries, k=K, round_digits=5, use_pandas=True).toPandas()
    ka = a.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    kb = b.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert ka["vec_id"].tolist() == kb["vec_id"].tolist()
    assert np.allclose(ka["cosine_sim"], kb["cosine_sim"], atol=1e-9)


def _recall(approx_pdf, exact_pdf):
    hits = tot = 0
    exact = exact_pdf.groupby("query_id")["vec_id"].apply(set)
    for qid, grp in approx_pdf.groupby("query_id"):
        tot += len(exact[qid])
        hits += len(set(grp["vec_id"]) & exact[qid])
    return hits / max(tot, 1)


def test_ivf_recall(emb, queries):
    exact = brute_force_topk(emb, queries, k=K, round_digits=5).toPandas()
    approx = ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=4).toPandas()
    assert (approx.groupby("query_id").size() <= K).all()
    # each query's own vector lives in its top probe list
    assert _recall(approx, exact) >= 0.6
    # nprobe = n_centroids degenerates to exact search
    full = ivf_topk(emb, queries, k=K, n_centroids=8, nprobe=8).toPandas()
    assert _recall(full, exact) == 1.0


def test_ivf_assign_is_total_and_deterministic(emb):
    from icicle_spark.operators.similarity import _train_centroids

    cent = _train_centroids(emb, 8, "vec_id", "embedding", 512, 3)
    cent2 = _train_centroids(emb, 8, "vec_id", "embedding", 512, 3)
    assert np.allclose(cent, cent2)
    tagged = ivf_assign(emb, cent).toPandas()
    assert len(tagged) == emb.count()
    assert tagged["__cluster"].between(0, 7).all()


def test_lsh_recall(emb, queries):
    exact = brute_force_topk(emb, queries, k=K, round_digits=5).toPandas()
    approx = lsh_topk(emb, queries, k=K, n_planes=4, n_tables=8, dim=64).toPandas()
    assert _recall(approx, exact) >= 0.5


def test_embedding_dedup_pairs(spark):
    """Near-dup pairs: exact baseline finds every planted duplicate;
    the IVF-blocked scale path finds (a verified subset with) high
    recall on genuine near-dups at threshold 0.95."""
    from icicle_spark.operators.similarity import embedding_dedup_pairs

    rng = np.random.default_rng(4)
    base = rng.standard_normal((120, 32))
    # plant 10 near-dup pairs: id 200+i is id i plus small noise
    dup = base[:10] + 0.02 * rng.standard_normal((10, 32))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)] + [
        (200 + i, [float(x) for x in v]) for i, v in enumerate(dup)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = embedding_dedup_pairs(emb, threshold=0.95).toPandas()
    planted = {(i, 200 + i) for i in range(10)}
    got = {(int(a), int(b)) for a, b in zip(exact["id_a"], exact["id_b"])}
    assert planted <= got
    assert (exact["cosine_sim"] >= 0.95).all()

    blocked = embedding_dedup_pairs(
        emb, threshold=0.95, n_centroids=6, nprobe=2
    ).toPandas()
    got_b = {(int(a), int(b)) for a, b in zip(blocked["id_a"], blocked["id_b"])}
    assert got_b <= got  # verified subset, never false positives
    assert len(got_b & planted) >= 8  # high recall on true near-dups


def test_ivf_index_reuse_roundtrip(spark, emb, tmp_path):
    """Persisted centroids + assignments give identical IVF results to
    the train-per-call path (same seed/sample => same quantizer)."""
    from icicle_spark.operators.similarity import (
        _train_centroids,
        ivf_assign,
        ivf_topk,
        load_centroids,
        save_centroids,
    )

    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    fresh = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=3).toPandas()
    cent = _train_centroids(emb, 8, "vec_id", "embedding", 4096, 5)
    p = str(tmp_path / "centroids")
    save_centroids(spark, cent, p)
    cent2 = load_centroids(spark, p)
    assert np.allclose(cent, cent2)
    assigned = ivf_assign(emb, cent2)
    ap = str(tmp_path / "assigned")
    assigned.write.mode("overwrite").parquet(ap)
    reused = ivf_topk(
        emb, q, k=5, nprobe=3,
        centroids=cent2, assigned=spark.read.parquet(ap),
    ).toPandas()
    key = ["query_id", "vec_id"]
    f = fresh.sort_values(key).reset_index(drop=True)
    r = reused.sort_values(key).reset_index(drop=True)
    assert (f[key].values == r[key].values).all()
    assert np.allclose(f["cosine_sim"], r["cosine_sim"])


def test_semantic_decontamination(spark):
    """Planted near-paraphrase of a benchmark vector is dropped;
    orthogonal vectors survive; threshold boundary respected."""
    import numpy as np
    import pandas as pd

    from icicle_spark.operators.similarity import (
        semantic_contamination,
        semantic_decontaminate,
    )

    rng = np.random.default_rng(11)
    b0 = rng.normal(size=16)
    b0 /= np.linalg.norm(b0)
    near = b0 + rng.normal(scale=0.05, size=16)  # cos ~0.999
    orth = np.zeros(16)
    orth[int(np.argmin(np.abs(b0)))] = 1.0  # nearly orthogonal to b0
    far = rng.normal(size=16)

    bench = spark.createDataFrame(
        pd.DataFrame({"vec_id": [100], "embedding": [b0.tolist()]})
    )
    corpus = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": [1, 2, 3],
            "embedding": [near.tolist(), orth.tolist(), far.tolist()],
        })
    )
    sims = (
        semantic_contamination(corpus, bench)
        .toPandas().set_index("vec_id").sort_index()
    )
    assert sims.loc[1, "max_sim"] > 0.95
    assert abs(sims.loc[2, "max_sim"]) < 0.2
    kept = semantic_decontaminate(corpus, bench, threshold=0.9)
    assert sorted(r.vec_id for r in kept.select("vec_id").collect()) == [2, 3]


def test_semantic_contamination_empty_benchmark(spark):
    import pandas as pd

    from icicle_spark.operators.similarity import (
        semantic_contamination,
        semantic_decontaminate,
    )

    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 0.0]]})
    )
    bench = corpus.where("vec_id < 0")  # empty
    sims = semantic_contamination(corpus, bench).toPandas()
    assert len(sims) == 1 and pd.isna(sims.loc[0, "max_sim"])
    kept = semantic_decontaminate(corpus, bench, threshold=0.5)
    assert kept.count() == 1
