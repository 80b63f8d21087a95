"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "feature_rows_per_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ...}

``--scaling`` mode: run the fused flagship pass in fresh JVMs at
local[8] and local[32] on the same input and report throughput at both
plus scaling efficiency (the sandbox stand-in for N vs 4N executors —
BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "asof_snapshot_folds",
    "asof_snapshot_native",
    "asof_window_folds",
    "asof_chord",
    "latest_n",
    "group_fold",
    "scan_running_sum",
    "sessionize",
    "exact_dedup",
    "minhash_pairs",
    "embed_topk",
    "tpch_q1",
]


def _force(df) -> int:
    """Materialize fully on executors (no driver collect)."""
    return df.count()


def run_fused(spark, sf_dir: str) -> tuple[float, int, int]:
    """The flagship fused as-of + windowed fold pass; returns
    (elapsed_s, out_rows, n_features)."""
    from icicle_spark.plans import Agg, Feature, Plan, Window, run_plan

    features = [
        Feature("sum_val", Agg.SUM, "value", skip_nulls=True),
        Feature("cnt", Agg.COUNT, "value", skip_nulls=True),
        Feature("mean_val", Agg.MEAN, "value", skip_nulls=True),
        Feature("min_val", Agg.MIN, "value", skip_nulls=True),
        Feature("max_val", Agg.MAX, "value", skip_nulls=True),
        Feature("newest_val", Agg.NEWEST, "value", skip_nulls=True),
        Feature("win7_sum", Agg.SUM, "value", window=Window(7), skip_nulls=True),
        Feature("win7_cnt", Agg.COUNT, "value", window=Window(7), skip_nulls=True),
        Feature("latest5_mean", Agg.MEAN, "value", latest=5, skip_nulls=True),
        Feature("click_cnt", Agg.COUNT, "value", where="event_type == 'click'",
                skip_nulls=True),
    ]
    plan = Plan(features, entity_col="user_id", time_col="ts", seq_col="event_id")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    t0 = time.perf_counter()
    n = _force(run_plan(ev, plan, snapshot="2024-01-20 00:00:00"))
    return time.perf_counter() - t0, n, len(features)


def main() -> None:
    if "--scaling" in sys.argv:
        return scaling()
    if "--fused-only" in sys.argv:
        # subprocess entry for scaling mode: one fresh JVM, one pass
        from icicle_spark.session import get_spark

        spark = get_spark(cpus=CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        run_fused(spark, SF_DIR)  # warm (JIT, page cache)
        el, n, k = run_fused(spark, SF_DIR)
        print(json.dumps({"elapsed": el, "rows": n, "features": k}))
        return

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from icicle_spark.session import get_spark

    spark = get_spark(cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        _force(df)  # warm: JIT + file cache
        t0 = time.perf_counter()
        _force(df)
        timings[name] = round(time.perf_counter() - t0, 3)
    el, n_rows, n_feat = run_fused(spark, SF_DIR)
    timings["fused_flagship"] = round(el, 3)
    print(
        json.dumps(
            {
                "metric": "feature_rows_per_sec",
                "value": round(n_rows * n_feat / el, 1),
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
            }
        )
    )


def scaling() -> None:
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=SF_DIR)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--fused-only"],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
    t8, t32 = out[8]["elapsed"], out[32]["elapsed"]
    feat_rows = out[32]["rows"] * out[32]["features"]
    eff = (t8 / t32) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "throughput_local8": round(feat_rows / t8, 1),
                "throughput_local32": round(feat_rows / t32, 1),
                "elapsed_local8": round(t8, 3),
                "elapsed_local32": round(t32, 3),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
