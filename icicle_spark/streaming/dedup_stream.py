"""Streaming near-dup dedup: ingest micro-batches against a persisted,
self-extending MinHash index (the streaming form of
``jobs/run_dedup.py``'s incremental flow).

State is the parquet index itself, not the Spark state store:
near-dup membership over an unbounded corpus cannot live in executor
state (it grows with the corpus and needs banding joins), so each
micro-batch runs the same banded incremental join the batch pipeline
uses — via ``foreachBatch``, the Structured Streaming escape hatch for
batch-grade operators.

Per micro-batch:

1. intra-batch exact dedup (hash groupBy, dedup.exact_key);
2. band ONLY the batch; join buckets against index + batch
   (``minhash_dedup_incremental``) — cost ~ |batch| x bands,
   independent of corpus size;
3. drop a batch doc that near-matches any indexed doc, or a
   smaller-id doc in the same batch;
4. append survivors to the output, their band buckets to the index,
   and their texts to the text store — later batches dedup against
   them.

Exactly-once caveat (stated, not hidden): the three appends are not
transactional. On failure-replay of a micro-batch the appends run
again; production deployments should point the sink at a
transactional table format (Iceberg/Delta) keyed by batch_id, or
make ids idempotent upstream. The LOGIC is replay-safe — re-deduping
a batch against an index that already contains it drops every doc as
a self-duplicate only if ids differ; identical ids re-appear as
bucket rows, which the bucket cap tolerates.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from icicle_spark.operators.dedup import (
    exact_dedup,
    minhash_band_buckets,
    minhash_dedup_incremental,
    minhash_dedup_pairs,
    simhash_chunk_index,
    simhash_dedup_incremental,
    simhash_dedup_pairs,
)


def minhash_ingest_sink(
    index_path: str,
    texts_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    method: str = "minhash",
    max_hamming: int = 3,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function:

        stream.writeStream.foreachBatch(
            minhash_ingest_sink(index, texts, out)
        ).start()

    ``method="simhash"`` keeps the same flow over a SimHash chunk
    index instead (fingerprints travel with the index, so the text
    store is only maintained for downstream use, not for verification).
    """
    if method not in ("minhash", "simhash"):
        raise ValueError(f"unknown method {method!r}")

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        batch_d = exact_dedup(batch, text_col, id_col)
        have_index = os.path.exists(index_path)
        if have_index and method == "simhash":
            pairs = simhash_dedup_incremental(
                batch_d, spark.read.parquet(index_path), text_col, id_col,
                max_hamming=max_hamming, max_bucket=max_bucket,
            )
        elif have_index:
            index = spark.read.parquet(index_path)
            corpus_texts = spark.read.parquet(texts_path)
            texts = corpus_texts.unionByName(
                batch_d.select(id_col, text_col)
            ).dropDuplicates([id_col])
            pairs = minhash_dedup_incremental(
                batch_d, index, texts, text_col, id_col,
                num_perm, bands, shingle_n, threshold, max_bucket,
            )
        elif method == "simhash":
            pairs = simhash_dedup_pairs(
                batch_d, text_col, id_col,
                max_hamming=max_hamming, max_bucket=max_bucket,
            )
        else:
            pairs = minhash_dedup_pairs(
                batch_d, text_col, id_col, num_perm, bands, shingle_n,
                threshold, max_bucket,
            )
        # a batch doc drops when it matches any indexed doc, or a
        # smaller-id doc of the same batch (pairs carry id_a < id_b,
        # so for intra-batch pairs the larger side drops; for
        # cross pairs the batch side drops whichever side it is)
        bids = batch_d.select(F.col(id_col).alias("__bid"))
        p = pairs.join(
            bids.withColumnRenamed("__bid", "id_a").withColumn(
                "__a_new", F.lit(True)
            ),
            on="id_a", how="left",
        ).join(
            bids.withColumnRenamed("__bid", "id_b").withColumn(
                "__b_new", F.lit(True)
            ),
            on="id_b", how="left",
        )
        drops = p.select(
            F.when(
                F.coalesce("__a_new", F.lit(False))
                & F.coalesce("__b_new", F.lit(False)),
                F.col("id_b"),                       # both new: keep min
            )
            .when(F.coalesce("__a_new", F.lit(False)), F.col("id_a"))
            .otherwise(F.col("id_b"))                # matched the index
            .alias(id_col)
        ).distinct()
        kept = batch_d.join(drops, on=id_col, how="left_anti")
        # cache: kept feeds three sinks; recomputing it re-runs the
        # banded join per sink
        kept = kept.persist()
        try:
            kept.write.mode("append").parquet(out_path)
            if method == "simhash":
                simhash_chunk_index(
                    kept, text_col, id_col, max_hamming
                ).write.mode("append").parquet(index_path)
            else:
                minhash_band_buckets(
                    kept, text_col, id_col, num_perm, bands, shingle_n
                ).write.mode("append").parquet(index_path)
            kept.select(id_col, text_col).write.mode("append").parquet(
                texts_path
            )
        finally:
            kept.unpersist()

    return fn


def line_dedup_ingest_sink(
    index_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_count: int = 2,
    strategy: str = "broadcast_set",
) -> Callable[[DataFrame, int], None]:
    """Streaming boilerplate removal against a self-extending
    line-count index (the streaming form of batch
    ``line_dedup(..., index=...)``). Per micro-batch:

    1. read the persisted corpus line counts (the index directory is
       APPEND-ONLY partial counts, summed on read — each batch writes
       O(|batch|) rows, never rewrites the index; compact it offline
       whenever it fragments);
    2. clean the batch against the MERGED counts (corpus-so-far +
       batch — a line repeated across old batches and this one drops,
       same contract as the batch incremental form);
    3. append the cleaned batch to ``out_path`` and the batch's RAW
       counts (pre-cleaning — later batches must see boilerplate's
       true occurrence totals) to the index.

    Same exactly-once caveat as :func:`minhash_ingest_sink`: the two
    appends are not transactional; point them at Iceberg/Delta keyed
    by batch_id for replay safety.
    """
    from icicle_spark.operators.dedup import (
        line_dedup,
        line_hash_counts,
    )

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        idx = None
        if os.path.exists(index_path):
            idx = (
                spark.read.parquet(index_path)
                .groupBy("line_hash")
                .agg(F.sum("n_occurrences").alias("n_occurrences"))
            )
        cleaned = line_dedup(
            batch, text_col, id_col, delim,
            min_count=min_count, strategy=strategy, index=idx,
        )
        cleaned.write.mode("append").parquet(out_path)
        line_hash_counts(batch, text_col, delim).write.mode(
            "append"
        ).parquet(index_path)

    return fn


def span_dedup_ingest_sink(
    index_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    key: str = "hash",
    broadcast_index: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Streaming KEEP-ONE span dedup against a self-extending
    ``span_gram_index`` (the streaming form of
    ``span_dedup.strip_repeated_spans_incremental``). Per micro-batch:

    1. read the persisted span index (APPEND-ONLY partial indexes,
       folded on read by the ``merge_span_index`` law — ``sum`` of
       distinct-doc counts + ``min`` of keepers; compact offline when
       it fragments);
    2. strip the batch against the merged index (a span first seen in
       an earlier batch keeps its canonical copy THERE — the keep-one
       policy holds across batches when doc ids are disjoint, the
       same contract as the batch incremental form);
    3. append the cleaned batch to ``out_path`` and the batch's RAW
       partial index (pre-cleaning) to ``index_path``.

    Same exactly-once caveat as :func:`minhash_ingest_sink`: the two
    appends are not transactional; point them at Iceberg/Delta keyed
    by batch_id for replay safety.
    """
    from icicle_spark.operators.span_dedup import (
        span_gram_index,
        strip_repeated_spans,
        strip_repeated_spans_incremental,
    )

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        if os.path.exists(index_path):
            idx = (
                spark.read.parquet(index_path)
                .groupBy("gram")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.min("keeper").alias("keeper"),
                )
            )
            cleaned = strip_repeated_spans_incremental(
                batch, idx, text_col, id_col, n, min_docs, key,
                broadcast_index,
            )
        else:
            cleaned = strip_repeated_spans(
                batch, text_col, id_col, n, min_docs, key,
                broadcast_index,
            )
        cleaned.write.mode("append").parquet(out_path)
        span_gram_index(batch, text_col, id_col, n, key).write.mode(
            "append"
        ).parquet(index_path)

    return fn
