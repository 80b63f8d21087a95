"""sf1 scale-stress (VERDICT r4 #4): run the round-4/5 pipeline ops
at sf0.1 AND at a 10x-rows synthetic sf1 and report the time ratio.

A scale-correct one-or-two-shuffle op should scale ~linearly in rows
(ratio ~<= SCALE_RATIO_BUDGET = 12x incl. constant overheads amortizing differently); a
superlinear ratio flags an accidental all-pairs / global-sort /
driver-side bottleneck that sf0.1 hides behind cache effects.

The synthetic sf1 replicates sf0.1 10x with shifted ids:

* ``documents``: doc_id + k*10_000_000, text perturbed with a
  per-replica suffix token (docs stay DISTINCT so dedup workloads
  keep their selectivity; repeated LINES across replicas are
  realistic boilerplate for line/span dedup);
* ``events``: user_id + k*10_000_000, event_id + k*1_000_000_000 —
  10x entities with the same per-entity history shape (the as-of
  engine's scaling axis is entities, not history depth);
* every other table symlinks to sf0.1 (unused by the stressed ops).

Usage: python tools/scale_stress.py [out.md]; writes the table to
stdout and (optionally) a markdown file. Builds the 10x dir under
``.bench_sf1/`` once and reuses it.
"""

from __future__ import annotations

import os
import sys

# one constant for both the documented budget and the flag condition
# (r5 ADVICE: the docstring budget and the table flag disagreed)
SCALE_RATIO_BUDGET = 12
import time

SF01 = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".bench_sf1")
REPLICAS = 10
QUERIES = [
    # the round-4/5 ops VERDICT asked to stress + the fold flagships
    "asof_snapshot_folds",
    "group_fold",
    "latest_n",
    "heavy_hitters",
    "line_dedup",
    "substring_dedup",
    "span_dedup",
    "dsir_select",
    "bin_pack",
    "pack_sequences",
    "fim_transform",
    "sft_render",
    "epoch_mix",
    "feature_drift",
    "tokenizer_fertility",
    "vorbis_features",
]


def build_sf1(spark) -> str:
    import pyspark.sql.functions as F

    marker = os.path.join(SF1, "_built")
    if os.path.exists(marker):
        return SF1
    os.makedirs(SF1, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = None
    for k in range(REPLICAS):
        d = docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            (F.concat(F.col("text"), F.lit(f" rep{k}seal"))
             if k else F.col("text")).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        reps = d if reps is None else reps.unionByName(d)
    reps.repartition(32).write.mode("overwrite").parquet(
        f"{SF1}/documents.parquet"
    )
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    reps = None
    for k in range(REPLICAS):
        e = ev.select(
            (F.col("user_id") + k * 10_000_000).alias("user_id"),
            (F.col("event_id") + k * 1_000_000_000).alias("event_id"),
            *[c for c in ev.columns
              if c not in ("user_id", "event_id")],
        )
        reps = e if reps is None else reps.unionByName(e)
    reps.repartition(32).write.mode("overwrite").parquet(
        f"{SF1}/events.parquet"
    )
    for t in ("region nation customer supplier part orders lineitem "
              "embeddings").split():
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    open(marker, "w").write("ok")
    return SF1


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    from icicle_spark.session import get_spark

    spark = get_spark(cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    qs = entry.queries()
    rows = []
    for name in QUERIES:
        times = {}
        for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
            _force(qs[name](spark, sf))  # warm (JIT + page cache)
            best = None
            for _ in range(2):
                df = qs[name](spark, sf)
                t0 = time.perf_counter()
                _force(df)
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            times[label] = best
        ratio = times["sf1"] / times["sf0.1"]
        rows.append((name, times["sf0.1"], times["sf1"], ratio))
        print(f"{name:24s} sf0.1 {times['sf0.1']:7.2f}s  "
              f"sf1 {times['sf1']:7.2f}s  ratio {ratio:5.1f}x",
              flush=True)
    lines = [
        "| query | sf0.1 (s) | sf1 = 10x rows (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, a, b, r in rows:
        flag = " **superlinear**" if r > SCALE_RATIO_BUDGET else ""
        lines.append(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    table = "\n".join(lines)
    print(table)
    if len(sys.argv) > 1:
        open(sys.argv[1], "w").write(table + "\n")
    worst = max(r for _, _, _, r in rows)
    print(f"\nworst ratio: {worst:.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
