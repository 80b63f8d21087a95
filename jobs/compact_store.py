"""Arranged fact-store maintenance — spark-submit entry.

    zip -r icicle_spark.zip icicle_spark
    spark-submit --py-files icicle_spark.zip jobs/compact_store.py \\
        --store /data/fact_store [--status-only]

An arranged store ingests increments as sorted delta runs
(``append_fact_store`` — one exchange of the DELTA only); queries see
a zero-shuffle merge-on-read view until this job folds the runs into
the base. Compaction is a per-bucket parallel rewrite (each task
merges exactly its bucket's base+run files and writes the compacted
bucket directly) — NO global shuffle, which at 100 TB is the entire
point: the base is never re-bucketed, only re-serialized bucket by
bucket, and even that cost amortizes across ingest batches.

``--status-only`` prints the store's layout, pending run count, and
per-bucket file fan-out without touching anything (the signal for
WHEN to compact: merge-on-read cost grows with files per bucket).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--store", required=True)
    ap.add_argument("--status-only", action="store_true")
    args = ap.parse_args(argv)

    from icicle_spark.session import get_spark
    from icicle_spark.sources.io import (
        _bucket_file_map,
        _store_meta,
        compact_fact_store,
    )

    meta = _store_meta(args.store)
    files = _bucket_file_map(args.store, meta)
    fanout = max((len(v) for v in files.values()), default=0)
    status = {
        "store": args.store,
        "buckets": meta["buckets"],
        "pending_runs": len(meta.get("runs", [])),
        "max_files_per_bucket": fanout,
    }
    if args.status_only:
        print(json.dumps(status))
        return 0

    spark = get_spark("icicle-compact-store")
    t0 = time.time()
    compact_fact_store(spark, args.store)
    meta2 = _store_meta(args.store)
    status.update(
        compacted_rows=meta2.get("compacted_rows", 0),
        elapsed_sec=round(time.time() - t0, 3),
        pending_runs_after=len(meta2.get("runs", [])),
    )
    print(json.dumps(status))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
