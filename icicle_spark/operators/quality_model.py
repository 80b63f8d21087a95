"""Model-based quality filtering (the GPT-3 / CCNet classifier step).

A linear classifier trained to separate a curated SEED corpus
(positives) from raw crawl (negatives) over hashed n-gram features —
the fastText-style filter every large pretraining pipeline runs after
heuristic cleaning. Spark-first construction:

* features: unigram+bigram strings built JVM-side (``zip_with``),
  hashed by ``pyspark.ml.feature.HashingTF`` — term-frequency
  SparseVectors, whole-stage codegen, no Python in the scan;
* training: ``pyspark.ml.classification.LogisticRegression`` —
  distributed L-BFGS on the JVM, scales to any corpus Spark can scan
  (each iteration is one treeAggregate over the executors);
* scoring: one broadcast of the coefficient vector inside the fitted
  model's ``transform`` — a single corpus scan, no shuffle;
* keep rule: GPT-3's Pareto gate ``keep iff score > 1 - pareto(9)``
  made DETERMINISTIC — the Pareto draw derives from a portable md5
  hash of the doc id (inverse-CDF ``(u^(-1/a) - 1)``), so reruns at
  any parallelism keep the same rows while still admitting a
  score-proportional tail of low-scoring docs (the bias-reduction
  trick the GPT-3 appendix describes).

Training is not SQL-expressible, so the contract query for this
operator is rows-only (like LSH/IVF ANN); determinism and separation
are pytest-pinned instead.

100 TB shape: the seed is small; negatives are a deterministic hash
sample of the raw corpus (``operators/sampling.deterministic_sample``)
sized to the seed. Each L-BFGS iteration reads the (cached) training
frame once; scoring is one scan with a broadcast coefficient vector;
the gate is a zero-shuffle codegen projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag

_B_DEFAULT = 1 << 18


def _gram_strings(text_col):
    """Unigram + bigram token strings (JVM-side), the classifier's
    feature terms — same construction as ``operators/dsir``."""
    from icicle_spark.operators.dedup import _norm_tokens

    ws = _norm_tokens(text_col)
    k = F.greatest(F.size(ws) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(ws, 1, k),
        F.slice(ws, 2, k),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(ws, bi)


def _featurize(docs: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """Term-frequency SparseVectors over ``pmod(hash(term), buckets)``
    — the ONE bucket definition shared by training and the
    MLlib-free serving path (:func:`score_exported`). The term hash
    stays JVM-side (``F.hash`` = murmur3; HashingTF's variant is not
    expressible as a Column, so we standardize on this one); the only
    Python is the assembly of int bucket lists into SparseVectors
    (VectorUDT is not Arrow-transferable, so this is a plain UDF),
    paid on the (small) training/model-scoring frames — the
    corpus-scale serving path (:func:`score_exported`) has no UDF at
    all."""
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.functions import udf

    @udf(VectorUDT())
    def _assemble(b):  # list[int] -> SparseVector
        from collections import Counter

        c = Counter(b or [])
        idx = sorted(c)
        return SparseVector(buckets, idx, [float(c[i]) for i in idx])

    g = docs.withColumn(
        "__b",
        F.transform(
            _gram_strings(F.col(text_col)),
            lambda t: F.pmod(F.hash(t), F.lit(buckets)),
        ),
    )
    return g.withColumn("features", _assemble("__b")).drop("__b")


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    buckets: int = _B_DEFAULT,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the seed-vs-crawl LogisticRegression. Returns the fitted
    ``LogisticRegressionModel`` (save/load via its own ``.save`` /
    ``LogisticRegressionModel.load`` — the persisted form a refresh
    pipeline reuses across runs without retraining)."""
    from pyspark.ml.classification import LogisticRegression

    train = _featurize(
        positive.select(F.col(text_col), F.lit(1.0).alias("label")).unionByName(
            negative.select(F.col(text_col), F.lit(0.0).alias("label"))
        ),
        text_col,
        buckets,
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
    )
    return lr.fit(train)


def score_quality(
    docs: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int | None = None,
) -> DataFrame:
    """Per-doc seed-likeness probability ``(id_col, quality_prob)``:
    one scan, broadcast coefficients, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    b = buckets or model.numFeatures
    feat = _featurize(docs, text_col, b)
    scored = model.transform(feat)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(F.col(id_col), p1.alias("quality_prob"))


def pareto_keep(
    scored: DataFrame,
    score_col: str = "quality_prob",
    id_col: str = "doc_id",
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """GPT-3's stochastic quality gate, deterministic: keep a doc iff
    ``score > 1 - pareto_draw`` where the Pareto(alpha) draw is the
    inverse CDF of a md5-derived uniform of the doc id. High-scoring
    docs always pass; low-scoring docs pass with the heavy-tailed
    probability the GPT-3 appendix uses to avoid hard-threshold
    selection bias. Membership is a pure function of (id, seed)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(f":p{seed}"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**60) + 1.0)
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.withColumn(
        "kept", F.col(score_col) > (F.lit(1.0) - pareto)
    )


def export_weights(model, spark=None):
    """Export the fitted model as ``(weights_df, intercept)`` where
    ``weights_df`` holds the NONZERO coefficients as ``(bucket:int,
    weight:double)`` — the persisted, engine-agnostic form a 100 TB
    deployment scores with (train once here; every later refresh
    needs only this parquet + :func:`score_exported`, no MLlib on
    the scoring path). Regularized models are sparse, so the table
    is far below the ``buckets`` bound and always broadcastable."""
    from pyspark.sql import SparkSession

    spark = spark or SparkSession.getActiveSession()
    coef = model.coefficients
    idx = getattr(coef, "indices", None)
    if idx is not None:
        pairs = [
            (int(i), float(v)) for i, v in zip(coef.indices, coef.values)
            if v != 0.0
        ]
    else:
        pairs = [(i, float(v)) for i, v in enumerate(coef) if v != 0.0]
    w = spark.createDataFrame(pairs, "bucket bigint, weight double")
    return w, float(model.intercept)


def score_exported(
    docs: DataFrame,
    weights: DataFrame,
    intercept: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = _B_DEFAULT,
) -> DataFrame:
    """LR inference from an exported weight table, no MLlib: explode
    the uni+bigram terms, reproduce ``HashingTF``'s bucket as
    ``pmod(hash(term), buckets)`` (Spark's ``hash`` IS the murmur3
    seed-42 HashingTF uses on strings), broadcast-join the weight
    table, ``sigmoid(intercept + sum(w))`` per doc. One corpus scan,
    one per-doc groupBy — bit-identical to
    :func:`score_quality` on the same model (pinned in
    tests/test_quality_model.py).

    Docs with no terms keep their spine row and score
    ``sigmoid(intercept)``."""
    spine = docs.select(id_col)
    toks = docs.select(
        id_col,
        explode_bag(_gram_strings(F.col(text_col))).alias("__g"),
    ).withColumn("__b", F.pmod(F.hash("__g"), F.lit(buckets)))
    w = weights.select(
        F.col("bucket").alias("__b"), F.col("weight").alias("__wt")
    )
    per_doc = (
        toks.join(F.broadcast(w), "__b", "left")
        .fillna({"__wt": 0.0})
        .groupBy(id_col)
        .agg(F.sum("__wt").alias("__s"))
    )
    scored = spine.join(per_doc, id_col, "left").fillna({"__s": 0.0})
    return scored.select(
        id_col,
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.lit(float(intercept)) + F.col("__s"))))
        ).alias("quality_prob"),
    )
