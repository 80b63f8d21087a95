"""Feature-drift / train-serve-skew report (spark-submit entry):

    spark-submit jobs/run_drift.py \
        --ref train_features.parquet --cur serve_features.parquet \
        --cols x,y,z --output out/

writes the per-(feature, bin) PSI report (parquet) plus summary.json
with per-feature PSI and the usual stability verdicts. With
``--freeze-ref DIR`` it instead persists the reference (edges +
counts) for the streaming monitor (`streaming/drift_stream.py`);
``--hist PATH`` compares a frozen reference against an accumulated
streaming histogram instead of a --cur frame.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", help="reference feature frame (parquet)")
    ap.add_argument("--ref-frozen",
                    help="frozen reference dir (write_drift_reference)")
    ap.add_argument("--cur", help="current feature frame (parquet)")
    ap.add_argument("--hist",
                    help="accumulated streaming histogram (parquet)")
    ap.add_argument("--cols", help="comma-separated feature columns "
                    "(required unless --ref-frozen)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--bins", type=int, default=None,
                    help="quantile bins (default 10; fixed at freeze "
                    "time in --ref-frozen mode)")
    ap.add_argument("--freeze-ref",
                    help="persist the reference to DIR and exit")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from icicle_spark.session import get_spark

    spark = get_spark(app_name="icicle_spark_drift")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.output, exist_ok=True)

    if args.freeze_ref:
        if not (args.ref and args.cols):
            raise SystemExit("--freeze-ref needs --ref and --cols")
        from icicle_spark.streaming.drift_stream import (
            write_drift_reference,
        )

        edges = write_drift_reference(
            spark.read.parquet(args.ref),
            [c.strip() for c in args.cols.split(",")],
            args.freeze_ref,
            n_bins=args.bins or 10,
        )
        print(json.dumps({"frozen": args.freeze_ref,
                          "features": sorted(edges)}))
        return 0

    if args.ref_frozen and args.hist and args.cur:
        raise SystemExit(
            "--ref-frozen takes --hist OR --cur, not both — pick the "
            "accumulated histogram or the batch frame"
        )
    if args.ref_frozen and (args.hist or args.cur):
        from icicle_spark.streaming.drift_stream import (
            drift_report,
            read_drift_reference,
        )

        # the frozen reference already fixes features and bins — a
        # conflicting request must not be silently ignored
        if args.cols or args.bins is not None:
            raise SystemExit(
                "--ref-frozen fixes the features and bins at freeze "
                "time; drop --cols/--bins (re-freeze to change them)"
            )
        if args.hist:
            report = drift_report(spark, args.ref_frozen, args.hist)
        else:
            # frozen reference vs a BATCH frame (train-vs-serve):
            # bin the frame under the frozen edges, same PSI tail
            from icicle_spark.operators.reporting import (
                drift_bin_counts,
                drift_psi,
            )

            edges, digits = read_drift_reference(args.ref_frozen)
            cur_counts = drift_bin_counts(
                spark.read.parquet(args.cur), list(edges), edges,
                "cur_n", digits,
            )
            ref_counts = spark.read.parquet(
                os.path.join(args.ref_frozen, "ref_counts.parquet")
            )
            report = drift_psi(ref_counts, cur_counts, digits)
    elif args.ref and args.cur and args.cols:
        from icicle_spark.operators.reporting import feature_drift

        report = feature_drift(
            spark.read.parquet(args.ref),
            spark.read.parquet(args.cur),
            [c.strip() for c in args.cols.split(",")],
            n_bins=args.bins or 10,
        )
    else:
        raise SystemExit(
            "need --ref --cur --cols, or --ref-frozen with --hist or "
            "--cur, or --freeze-ref"
        )

    report.write.mode("overwrite").parquet(
        os.path.join(args.output, "drift.parquet")
    )
    psi = {
        r["feature"]: round(float(r["psi"]), 6)
        for r in spark.read.parquet(os.path.join(args.output, "drift.parquet"))
        .groupBy("feature")
        .agg(F.sum("psi_term").alias("psi"))
        .collect()
    }
    verdict = {
        f: ("stable" if p < 0.1 else "moderate" if p < 0.25 else "drifted")
        for f, p in psi.items()
    }
    summary = {"psi": psi, "verdict": verdict}
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
