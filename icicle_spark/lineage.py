"""Per-partition lineage manifests and run metrics (north rule).

A feature-engineering run at 10^12-row scale must be auditable:
which input files fed it, what each output partition contains, and
whether a rerun would produce the same thing. ``run_with_lineage``
executes a plan, writes the output, and records:

* input manifest  — one row per input FILE: path, rows, time range,
  distinct-entity estimate (the scan-side lineage unit)
* output manifest — one row per output PARTITION: spark partition id,
  rows, entity range (the shuffle-side lineage unit; entity-hash
  partitioning means partition membership is reproducible)
* run record      — plan fingerprint (sha256 of the canonical plan),
  snapshot time, row counts in/out, wall seconds, engine strategy,
  relevant spark conf

All three land under ``<out>/_lineage/`` beside the data, so a resume
(plans.resume) or a rerun can verify it consumed exactly the recorded
inputs.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, functions as F

from icicle_spark.plans.ir import Agg, CustomFold, Plan


def plan_fingerprint(plan: Plan) -> str:
    """Deterministic digest of the logical plan (fusion-order
    insensitive: features are sorted by name)."""
    parts = []
    for f in sorted(plan.features, key=lambda f: f.name):
        agg = f.agg.value if isinstance(f.agg, Agg) else "custom"
        parts.append(
            "|".join(
                str(x)
                for x in (
                    f.name, agg,
                    f.expr if isinstance(f.expr, str) else "<fn>",
                    f.where if isinstance(f.where, str) else f.where and "<fn>",
                    f.window and (f.window.newer_than_days, f.window.older_than_days),
                    f.latest, f.skip_nulls, f.half_life_days,
                    f.group if isinstance(f.group, str) else f.group and "<fn>",
                    f.distinct if isinstance(f.distinct, str) else f.distinct and "<fn>",
                )
            )
        )
    blob = ";".join(
        [plan.entity_col, plan.time_col, str(plan.seq_col), str(plan.tombstone_col)]
        + parts
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def input_manifest(facts: DataFrame, plan: Plan) -> list[dict[str, Any]]:
    """Per input file: rows, time range, entity-cardinality estimate."""
    rows = (
        facts.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(plan.time_col).alias("min_time"),
            F.max(plan.time_col).alias("max_time"),
            F.approx_count_distinct(plan.entity_col).alias("approx_entities"),
        )
        .collect()
    )
    return [
        {
            "file": r["file"],
            "rows": r["rows"],
            "min_time": str(r["min_time"]),
            "max_time": str(r["max_time"]),
            "approx_entities": r["approx_entities"],
        }
        for r in rows
    ]


def output_manifest(result: DataFrame, entity_col: str) -> list[dict[str, Any]]:
    """Per output partition: id, rows, entity range."""
    rows = (
        result.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(entity_col).cast("string").alias("min_entity"),
            F.max(entity_col).cast("string").alias("max_entity"),
        )
        .collect()
    )
    return [
        {
            "partition": r["__pid"],
            "rows": r["rows"],
            "min_entity": r["min_entity"],
            "max_entity": r["max_entity"],
        }
        for r in sorted(rows, key=lambda r: r["__pid"])
    ]


def run_with_lineage(
    facts: DataFrame,
    plan: Plan,
    out_path: str,
    snapshot: Any | None = None,
    chords: DataFrame | None = None,
    strategy: str = "native",
) -> dict[str, Any]:
    """Execute the plan, write parquet output + lineage manifests;
    returns the run record."""
    from icicle_spark.plans import run_plan

    spark = facts.sparkSession
    t0 = time.time()
    result = run_plan(
        facts, plan, snapshot=snapshot, chords=chords, strategy=strategy
    )
    result.write.mode("overwrite").parquet(out_path)
    wall = time.time() - t0
    written = spark.read.parquet(out_path)
    record = {
        "plan_fingerprint": plan_fingerprint(plan),
        "features": [f.name for f in plan.features],
        "snapshot": str(snapshot) if snapshot is not None else None,
        "strategy": strategy,
        "rows_in": facts.count(),
        "rows_out": written.count(),
        "wall_seconds": round(wall, 3),
        "spark_conf": {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.shuffle.partitions",
                "spark.sql.adaptive.enabled",
                "spark.master",
            )
        },
        "inputs": input_manifest(facts, plan),
        "output_partitions": output_manifest(written, plan.entity_col),
    }
    lineage_dir = os.path.join(out_path, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    with open(os.path.join(lineage_dir, "manifest.json"), "w") as fh:
        json.dump(record, fh, indent=2)
    return record
