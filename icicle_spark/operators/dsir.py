"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a small TARGET corpus
(the curated seed: wiki-quality pages, textbooks, ...) by importance
weights between two bag-of-hashed-n-grams unigram models:

    log w(doc) = sum over gram occurrences of
                 ln p_target(bucket(gram)) - ln p_raw(bucket(gram))

then samples k documents WITHOUT replacement via Gumbel top-k over
``log w + Gumbel noise`` — the paper's resampling step, made
deterministic here by deriving the Gumbel from a portable md5 hash of
the document id (same mechanism as ``operators/sampling.py``: a rerun
at any parallelism, or any other engine, draws the same sample).

Every hash is the md5 60-bit bucket (``sampling._bucket_n`` md5 mode),
so the whole pipeline — featurization, model fit, scoring, noise,
selection — replays exactly in DuckDB for the contract oracle.

100 TB shape: the target corpus is small by construction (a curated
seed); its model is a broadcast-sized aggregate. The raw model is ONE
explode + map-side-combined groupBy whose shuffle carries at most
``buckets`` rows per partition. Scoring is a second corpus scan
joining the broadcast ``buckets``-row log-ratio table and one per-doc
groupBy; selection is a distributed ``TakeOrderedAndProject`` (sort +
limit), never a single-partition window. No per-row Python anywhere.

The reference engine has no corpus-selection surface; this extends the
curation stack (SURVEY §2.10-2.12) with the standard pretraining
data-selection step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag

_B_DEFAULT = 10_000
_U60 = float(2**60)  # md5 buckets are 15 hex digits = 60 bits


def _bucket_of(g, buckets: int, seed: int):
    """Portable md5 bucket of a gram string (DuckDB-replayable)."""
    h = F.md5(F.concat(g, F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(
        buckets
    )


def hashed_grams(text_col, buckets: int = _B_DEFAULT, seed: int = 0):
    """Array of hashed-n-gram bucket ids (unigrams + bigrams) for one
    text value — the DSIR featurization. Pure JVM: tokenization,
    ``zip_with`` bigrams, and the md5 bucket all stay in whole-stage
    codegen."""
    from icicle_spark.operators.dedup import _norm_tokens

    ws = _norm_tokens(text_col)
    k = F.greatest(F.size(ws) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(ws, 1, k),
        F.slice(ws, 2, k),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.transform(
        F.concat(ws, bi), lambda g: _bucket_of(g, buckets, seed)
    )


def hashed_ngram_model(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = _B_DEFAULT,
    seed: int = 0,
) -> DataFrame:
    """Bag-of-hashed-n-grams counts ``(bucket, cnt)`` over a corpus —
    the sufficient statistics of a DSIR unigram model. One scan, one
    map-side-combined shuffle of at most ``buckets`` rows per
    partition."""
    g = docs.select(
        explode_bag(hashed_grams(F.col(text_col), buckets, seed)).alias(
            "bucket"
        )
    )
    return g.groupBy("bucket").agg(F.count("*").alias("cnt"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = _B_DEFAULT,
    seed: int = 0,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight of every raw doc with
    at least one token: ``(id_col, n_grams, logw)``.

    Both models are Laplace-smoothed over the same ``buckets``-bucket
    space: ``p(b) = (cnt_b + alpha) / (total + alpha * buckets)``. The
    per-bucket log-ratio table is built once (raw model LEFT JOIN
    target model — a gram in a raw doc always exists in the raw
    model) and broadcast to the scoring scan. The two model totals are
    bounded one-row collects (like ``doc_logprob``'s vocab size)."""
    # Collect BOTH models once (each is <= buckets rows by
    # construction — a bounded driver frame like the BPE argmax) and
    # rebuild the per-bucket count table as a literal local frame.
    # The previous form paid THREE full featurization passes over the
    # raw corpus (one per total-collect action plus the final plan's
    # own model recompute) and three over the target; collecting the
    # bounded models directly makes it ONE model pass per side plus
    # the scoring scan (guide §1.2: fewer passes). The log-ratio math
    # stays in Spark expressions on the rebuilt frame, so lr doubles
    # are bit-identical to the previous join formulation.
    mt_rows = {
        int(r["bucket"]): int(r["cnt"])
        for r in hashed_ngram_model(target, text_col, buckets, seed).collect()
    }
    mr_rows = {
        int(r["bucket"]): int(r["cnt"])
        for r in hashed_ngram_model(raw, text_col, buckets, seed).collect()
    }
    nt = float(sum(mt_rows.values()))
    nr = float(sum(mr_rows.values()))
    denom_t = F.lit(nt + alpha * buckets)
    denom_r = F.lit(nr + alpha * buckets)
    spark = raw.sparkSession
    counts = spark.createDataFrame(
        [(b, c, mt_rows.get(b)) for b, c in mr_rows.items()],
        "bucket bigint, cnt_r bigint, cnt_t bigint",
    )
    ratio = counts.select(
        "bucket",
        (
            F.log((F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(alpha)) / denom_t)
            - F.log((F.col("cnt_r") + F.lit(alpha)) / denom_r)
        ).alias("lr"),
    )
    occ = raw.select(
        F.col(id_col),
        explode_bag(hashed_grams(F.col(text_col), buckets, seed)).alias(
            "bucket"
        ),
    )
    return (
        occ.join(F.broadcast(ratio), on="bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lr").alias("logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = _B_DEFAULT,
    seed: int = 0,
    alpha: float = 1.0,
) -> DataFrame:
    """Gumbel top-``k`` DSIR selection: ``(id_col, n_grams, logw,
    key)``, the ``k`` raw documents sampled without replacement with
    probability proportional to their importance weight.

    The Gumbel is derived from the md5 hash of the document id —
    ``u = (h60 + 1) / (2^60 + 1)``, ``g = -ln(-ln(u))`` — so the draw
    is a pure function of ``(id, seed)``: reproducible across reruns,
    partitionings, and engines. Scores are shifted by an off-grid
    epsilon (1.37e-8, far larger than any summation-order ulp drift
    but far smaller than the rounding grid) and rounded to 6 dp
    BEFORE ranking (ties then break on id), keeping the selected set
    bit-identical across engines despite float summation order."""
    if k <= 0:
        raise ValueError("k must be positive")
    w = dsir_logweights(
        raw, target, text_col, id_col, buckets, seed, alpha
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":g{seed}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_U60 + 1.0)
    gumbel = -F.log(-F.log(u))
    eps = F.lit(1.37e-8)  # off-decimal-grid: >> ulp drift, << 1e-6
    scored = w.select(
        id_col,
        "n_grams",
        F.round(F.col("logw") + eps, 6).alias("logw"),
        F.round(F.col("logw") + gumbel + eps, 6).alias("key"),
    )
    return scored.orderBy(F.desc("key"), F.col(id_col)).limit(k)
