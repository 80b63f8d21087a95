"""Document chunking for context-window packing — an engine extension
for LLM training-data pipelines (no reference counterpart; the
reference's array surface stops at sort/index — SURVEY §2.7).

Splits each document into sliding word windows of ``max_words`` with
``overlap`` words shared between consecutive chunks. Everything is
JVM-side Column HOFs (split → transform over a sequence → explode):
one narrow projection, no shuffle, no Python — chunking 100 TB is a
pure map stage that AQE/codegen handle like any other scan.

Chunk rule (mirrored exactly by the DuckDB oracle in
``__spark_entry__``): stride = max_words - overlap; chunk i covers
words [i*stride, i*stride + max_words) for i in 0..ceil(n/stride)-1.
Trailing chunks may be shorter; documents with zero words emit no
chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_words) — one row per sliding word
    window. ``overlap`` must be < ``max_words``."""
    if not 0 <= overlap < max_words:
        raise ValueError("need 0 <= overlap < max_words")
    stride = max_words - overlap
    # materialize the word array FIRST: slicing an inline transform(...)
    # re-evaluates the whole transform per access (measured 15x on the
    # token ops — see operators/tokens.py)
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = (
        docs.select(F.col(id_col), ws.alias("__ws"))
        .withColumn("__n", F.size("__ws"))
        .where(F.col("__n") > 0)
    )
    chunk = explode_bag(
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("__n") / F.lit(stride)).cast("int") - 1,
            ),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.array_join(
                    F.slice(F.col("__ws"), i * stride + 1, max_words), " "
                ).alias("chunk_text"),
                F.size(
                    F.slice(F.col("__ws"), i * stride + 1, max_words)
                ).alias("n_words"),
            ),
        )
    )
    return base.select(id_col, chunk.alias("__c")).select(
        id_col,
        F.col("__c.chunk_id").alias("chunk_id"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_words").alias("n_words"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n_words",
    budget: int = 2048,
) -> DataFrame:
    """Offset-division sequence packing: concatenate a document's
    chunks in order and split at ``budget``-word boundaries — each
    chunk's ``bin_id`` is its start offset div budget (one window
    cumsum, no Python, no sequential state). This is the
    concat-then-split packing most training pipelines use; unlike
    strict first-fit, a chunk whose span crosses a boundary belongs to
    the bin of its START, so a bin can run over by at most one chunk
    tail (< max_words). Exact first-fit needs a sequential fold —
    route through plans.CustomFold if hard budgets are required."""
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("chunk_id")
    cum = F.sum(F.col(count_col)).over(w)
    return chunks.withColumn(
        "bin_id", F.floor((cum - F.col(count_col)) / F.lit(budget)).cast("int")
    )
