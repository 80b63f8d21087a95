"""Streaming feature-drift monitor: keep a PSI report current as
data arrives, against a FROZEN reference distribution.

Shape (mirrors ``telemetry_stream``): the reference — bin edges from
``operators/reporting.drift_edges`` plus the reference's own
(feature, bin) counts — is computed once, batch-side, and persisted.
Because :func:`~icicle_spark.operators.reporting.drift_bin_counts`
is a pure zero-state function of the rows under fixed edges, each
micro-batch's counts ADD exactly to the running histogram: cost per
batch ~ |batch| + features x bins, independent of history size, with
no Spark state store. ``drift_report`` then joins the two persisted
count tables through the same PSI tail the batch operator uses — the
streaming monitor and ``feature_drift`` agree exactly on identical
data (pinned in tests/test_streaming.py).

Exactly-once caveat (stated, not hidden): the read-add-overwrite of
the histogram is not transactional; a failure-replayed micro-batch
double-counts. Production deployments should key by ``batch_id`` in
a transactional table (Iceberg/Delta) and MERGE — same caveat as the
telemetry and dedup ingest sinks.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from icicle_spark.operators.reporting import (
    drift_bin_counts,
    drift_edges,
    drift_psi,
)


def write_drift_reference(
    ref: DataFrame,
    cols: list[str],
    path: str,
    n_bins: int = 10,
    round_digits: int = 6,
) -> dict[str, list[float]]:
    """Freeze the reference: quantile edges (JSON sidecar) + the
    reference's (feature, bin, ref_n) counts (parquet). Returns the
    edges dict."""
    edges = drift_edges(ref, cols, n_bins, round_digits)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "edges.json"), "w") as f:
        json.dump({"edges": edges, "round_digits": round_digits}, f)
    drift_bin_counts(ref, cols, edges, "ref_n", round_digits).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "ref_counts.parquet"))
    return edges


def read_drift_reference(path: str) -> tuple[dict[str, list[float]], int]:
    with open(os.path.join(path, "edges.json")) as f:
        d = json.load(f)
    return d["edges"], int(d["round_digits"])


def drift_sink(
    ref_path: str,
    hist_path: str,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function:

        stream.writeStream.foreachBatch(
            drift_sink("ref_dir", "hist.parquet")
        ).start()

    Each batch bins under the frozen edges and adds its counts into
    the persisted histogram (materialized bounded: features x bins
    rows — the documented scalar-checkpoint exception)."""
    edges, digits = read_drift_reference(ref_path)

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new = drift_bin_counts(batch, list(edges), edges, "cur_n", digits)
        if os.path.exists(hist_path):
            merged = (
                spark.read.parquet(hist_path)
                .unionByName(new)
                .groupBy("feature", "bin")
                .agg(F.sum("cur_n").alias("cur_n"))
            )
        else:
            merged = new
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(hist_path)

    return fn


def drift_report(
    spark: SparkSession,
    ref_path: str,
    hist_path: str,
) -> DataFrame:
    """Current PSI report: persisted reference counts vs the
    accumulated streaming histogram — identical math (and output
    schema) to the batch ``feature_drift``."""
    _, digits = read_drift_reference(ref_path)
    ref_counts = spark.read.parquet(
        os.path.join(ref_path, "ref_counts.parquet")
    )
    cur = spark.read.parquet(hist_path)
    return drift_psi(ref_counts, cur, digits)
