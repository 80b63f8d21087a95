"""Streaming corpus telemetry: maintain the mergeable sketch report
(``operators/reporting.py``) under micro-batch ingest, so the corpus
stats page stays current as documents arrive.

State is the persisted report table itself, not the Spark state
store: the report is human-scale by construction (one row per
source: additive counters + KB-sized DataSketches HLL sketches), so
each micro-batch computes ITS OWN sketch report (one map-side
combined aggregate over the batch) and merges it with the persisted
table — cost ~ |batch| + |sources|, independent of corpus size, the
same incremental-index shape as ``dedup_stream``.

The merged table is materialized on the driver before the overwrite
(bounded: #sources rows of counters + sketches — the documented
scalar-checkpoint exception to the no-collect rule; Spark cannot
lazily overwrite a path it is still reading).

Exactly-once caveat (stated, not hidden): the read-merge-overwrite is
not transactional. On failure-replay of a micro-batch the batch
merges twice — counters double-count it (sketch uniques do not, HLL
union is idempotent for identical keys). Production deployments
should key the report by ``batch_id`` in a transactional table format
(Iceberg/Delta) and MERGE, exactly as for the dedup ingest sink.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame

from icicle_spark.operators.reporting import (
    corpus_sketch_report,
    merge_sketch_reports,
)


def telemetry_sink(
    report_path: str,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    char_col: str = "n_chars",
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function:

        stream.writeStream.foreachBatch(
            telemetry_sink("report.parquet")
        ).start()

    Read the current stats at any time with
    ``sketch_estimates(spark.read.parquet(report_path))``.
    """

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = corpus_sketch_report(
            batch,
            group_col=group_col,
            text_col=text_col,
            lang_col=lang_col,
            char_col=char_col,
        )
        if os.path.exists(report_path):
            merged = merge_sketch_reports(
                spark.read.parquet(report_path), new
            )
        else:
            merged = new
        # materialize before overwriting the path being read
        # (bounded: one row per source)
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(report_path)

    return fn
