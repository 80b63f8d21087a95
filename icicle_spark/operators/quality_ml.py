"""Hashed linear classifier inference — the fastText-shaped quality
scorer of a CCNet/RedPajama-style curation pipeline, run as pure
Column expressions.

A pretrained linear model over hashed bag-of-words features (feature
hashing, Weinberger et al. 2009) scores every document:

    score(doc) = sigmoid(bias + mean_w in words( W[h(w) mod dim] ))

Inference — the part a 100 TB pipeline runs — is embarrassingly
parallel and lives entirely JVM-side here: tokenize with ``split``,
bucket with a hash, look the weight up, ``aggregate`` the mean, one
``exp``. Zero shuffles, zero Python rows, fuses into whole-stage
codegen with the surrounding scan/filter.

Two weight sources:

* ``classifier_score`` — weights given by a deterministic
  multiplicative-hash parameterization of the bucket id (a fixed,
  reproducible pseudo-model). This is the oracle-checkable form: any
  engine can recompute ``W[b]`` from ``b``, so the DuckDB gate replays
  the full score. It is also the right smoke-test harness for the
  plumbing a learned model uses.
* ``score_with_weights`` — weights from a (bucket, weight) DataFrame
  (e.g. exported from a trained fastText/logistic model): explode →
  broadcast-join the dim-sized weight table → one groupBy. The scale
  path for real learned weights; parity with the formula form is
  pinned in tests/test_quality_ml.py by materializing the formula
  into a weights table.

Training itself is out of scope by design: pipelines score with a
frozen pretrained model (CCNet's fastText binary); fitting happens
offline. What the engine owes the pipeline is fast, deterministic,
resumable inference — this.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag

from ..functions.text import _WORD_RE

# multiplicative-hash weight parameterization: spreads bucket ids into
# [-0.5, 0.5) with no structure a bag-of-words mean can resonate with
_W_MULT = 2654435761  # Knuth's 2^32 / phi
_W_ADD = 12345
_W_MOD = 1_000_003  # prime


def _feature_bucket(word: Column, dim: int, hash_fn: str = "xx64") -> Column:
    """Feature-hash a token into [0, dim). ``md5`` is the portable
    (cross-engine replayable) gate; ``xx64`` the fast production one —
    same convention as operators/sampling.py."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(word), 1, 15), 16, 10).cast("bigint")
        return h % F.lit(dim)
    if hash_fn != "xx64":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xx64 | md5)")
    return F.pmod(F.xxhash64(word), F.lit(dim))


def formula_weight(bucket: Column) -> Column:
    """W[b] for the deterministic pseudo-model (see module docstring)."""
    raw = (bucket * F.lit(_W_MULT) + F.lit(_W_ADD)) % F.lit(_W_MOD)
    return raw.cast("double") / F.lit(float(_W_MOD)) - F.lit(0.5)


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _WORD_RE), lambda w: w != "")


def classifier_score(
    text: Column,
    *,
    dim: int = 4096,
    bias: float = 0.0,
    hash_fn: str = "xx64",
) -> Column:
    """Linear-classifier score in [0,1] with formula weights — a pure
    Column expression (no shuffle, no UDF). Empty/whitespace-only text
    scores ``sigmoid(bias)``."""
    words = _words(text)
    n = F.size(words)
    s = F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc + formula_weight(_feature_bucket(w, dim, hash_fn)),
    )
    mean = F.when(n > 0, s / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + mean)))


def score_with_weights(
    docs: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    bias: float = 0.0,
    hash_fn: str = "xx64",
    out_col: str = "clf_score",
) -> DataFrame:
    """Score with a LEARNED weight table ``weights(bucket:int,
    weight:double)`` (≤ ``dim`` rows — always broadcastable).

    Plan shape for 100 TB: explode words (narrow), broadcast-hash-join
    the dim-sized weight table (no corpus-side shuffle), one groupBy
    on the doc id (the single shuffle). Buckets absent from the table
    weigh 0. Returns ``(id_col, out_col)``; join it back onto the
    corpus on ``id_col`` if the full row is needed downstream.

    Documents with no words still appear (left path below keeps the
    spine) and score ``sigmoid(bias)``."""
    spine = docs.select(id_col)
    toks = docs.select(
        id_col, explode_bag(_words(F.col(text_col))).alias("__w")
    ).withColumn("__b", _feature_bucket(F.col("__w"), dim, hash_fn))
    w = weights.select(
        F.col("bucket").cast("bigint").alias("__b"),
        F.col("weight").cast("double").alias("__wt"),
    )
    joined = toks.join(F.broadcast(w), "__b", "left").fillna(
        {"__wt": 0.0}
    )
    per_doc = joined.groupBy(id_col).agg(
        (F.sum("__wt") / F.count(F.lit(1))).alias("__mean")
    )
    scored = spine.join(per_doc, id_col, "left").fillna({"__mean": 0.0})
    return scored.select(
        id_col,
        (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + F.col("__mean"))))
        ).alias(out_col),
    )


def formula_weight_table(spark, dim: int) -> DataFrame:
    """Materialize the formula pseudo-model as a (bucket, weight)
    table — the parity bridge between the two entry points, and a
    template for exporting real model weights."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        formula_weight(F.col("id")).alias("weight"),
    )
