"""Continuous ingest into an arranged fact store.

``fact_store_ingest_sink`` is a ``foreachBatch`` function: every
micro-batch lands as an aligned delta run (``sources.io.
append_fact_store`` — one exchange of the batch only), queries keep
reading the store's zero-shuffle merge-on-read view mid-stream, and
the sink compacts automatically once the pending-run fan-out crosses
a threshold (merge-on-read cost grows with files per bucket, so
compaction cadence IS the knob that bounds read amplification — the
LSM trade dressed in Spark clothes).

Delivery semantics: exactly-once per micro-batch. Structured
Streaming replays a batch after failure with the SAME batch id;
``append_fact_store(batch_id=...)`` records committed ids in the
store meta, turns a replayed committed batch into a no-op, and lets
a replayed HALF-committed batch (crash between the run write and the
meta write) overwrite its own orphan run directory. The reference
engine is batch-only — this is the Spark-native extension of its
ingest loop (icicle-compiler ingest: append facts, re-run
snapshots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fact_store_ingest_sink(path: str, compact_every: int | None = 8):
    """Build the ``foreachBatch`` function:

        stream.writeStream.foreachBatch(
            fact_store_ingest_sink("/data/fact_store")
        ).option("checkpointLocation", ckpt).start()

    The store must already exist (``write_fact_store`` — possibly on
    an empty frame — fixes the bucket count and key columns).
    ``compact_every=N`` folds the runs into the base whenever N or
    more are pending; ``None`` leaves compaction to
    ``jobs/compact_store.py`` on an external cadence."""
    from icicle_spark.sources.io import (
        _store_meta,
        append_fact_store,
        compact_fact_store,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_fact_store(batch_df, path, batch_id=batch_id)
        if compact_every:
            meta = _store_meta(path)
            if len(meta.get("runs", [])) >= compact_every:
                compact_fact_store(batch_df.sparkSession, path)

    return sink
