"""Corpus telemetry report (spark-submit entry): the stats page a
pretraining-data refresh publishes and asserts on —

    per-source stats (docs / chars / words / exact median length /
    language spread / exact-duplicate ratio) + rolled-up TOTAL row
    -> (source, lang) histogram drilldown
    -> [--diff-against] per-doc added/removed/changed/unchanged vs
       the previous snapshot (content-hash full-outer join that
       shuffles 32-byte md5s, never bodies)
    -> [--top-tokens SUPPORT] exact token heavy hitters via two-pass
       Misra-Gries (bounded candidate state, no vocabulary-wide
       shuffle — operators/tokens.py heavy_hitters)
    -> parquet tables + report.json

Scale shape: the stats table is ONE corpus scan (ROLLUP grouping
sets inside a single hash aggregate; distinct-counts ride the same
aggregate over 32-byte md5 keys); the histogram is one map-side
combined groupBy. ``--approx`` swaps distinct counts for HLL
sketches and the median for approx_percentile — constant per-group
state, the cheap form for human-read telemetry. The only driver
collect is the final report rows (|sources| + |sources×langs|,
human-scale by construction).

    spark-submit jobs/corpus_report.py \
        --input documents.parquet --output report/ [--approx]
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
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--group-col", default="source")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--char-col", default="n_chars",
                    help="precomputed length column; use --derive-chars "
                    "when the input has none")
    ap.add_argument("--derive-chars", action="store_true",
                    help="compute length(text) instead of reading "
                    "--char-col")
    ap.add_argument("--diff-against",
                    help="previous snapshot parquet; adds diff.parquet "
                    "(per-doc added/removed/changed/unchanged by content "
                    "hash) and a status summary to report.json")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--approx", action="store_true",
                    help="HLL distinct counts + approx_percentile "
                    "(constant per-group state; 100 TB telemetry mode)")
    ap.add_argument("--top-tokens", type=float, metavar="SUPPORT",
                    help="also publish top_tokens.parquet: every token "
                    "at >= SUPPORT corpus frequency with its EXACT "
                    "count, via two-pass Misra-Gries (bounded state, "
                    "no vocabulary-wide shuffle)")
    ap.add_argument("--tokens-col",
                    help="token array column for --top-tokens; when "
                    "absent, tokens derive from --text-col via the "
                    "deterministic stand-in tokenizer")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from icicle_spark.operators.reporting import corpus_stats, lang_histogram
    from icicle_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)
    if args.derive_chars:
        docs = docs.withColumn(args.char_col, F.length(args.text_col))

    stats = corpus_stats(
        docs,
        group_col=args.group_col,
        char_col=args.char_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
        approx=args.approx,
    )
    hist = lang_histogram(docs, lang_col=args.lang_col,
                          group_col=args.group_col)

    diff_summary = None
    diff_path = None
    if args.diff_against:
        from icicle_spark.operators.reporting import (
            corpus_diff,
            corpus_diff_summary,
        )

        prev = spark.read.parquet(args.diff_against)
        diff = corpus_diff(prev, docs, id_col=args.id_col,
                           text_col=args.text_col)
        diff_path = os.path.join(args.output, "diff.parquet")
        os.makedirs(args.output, exist_ok=True)
        diff.write.mode("overwrite").parquet(diff_path)
        diff_summary = {
            r["status"]: r["n_docs"]
            for r in corpus_diff_summary(
                spark.read.parquet(diff_path)
            ).collect()
        }

    os.makedirs(args.output, exist_ok=True)
    stats_path = os.path.join(args.output, "stats.parquet")
    hist_path = os.path.join(args.output, "lang_histogram.parquet")
    stats.write.mode("overwrite").parquet(stats_path)
    hist.write.mode("overwrite").parquet(hist_path)

    tokens_path = None
    if args.top_tokens:
        from icicle_spark.operators.tokens import (
            char_token_ids,
            heavy_hitters,
        )

        toks = (
            docs.select(F.col(args.tokens_col).alias("tokens"))
            if args.tokens_col
            else docs.select(char_token_ids(args.text_col).alias("tokens"))
        )
        tokens_path = os.path.join(args.output, "top_tokens.parquet")
        heavy_hitters(toks, "tokens", support=args.top_tokens).write.mode(
            "overwrite"
        ).parquet(tokens_path)

    # report.json: the persisted tables re-read (tiny by construction)
    rows = [r.asDict() for r in spark.read.parquet(stats_path).collect()]
    rows.sort(key=lambda r: r[args.group_col])
    report = {
        "approx": bool(args.approx),
        "sources": [r for r in rows if r[args.group_col] != "TOTAL"],
        "total": next(r for r in rows if r[args.group_col] == "TOTAL"),
        "outputs": {"stats": stats_path, "lang_histogram": hist_path},
    }
    if diff_summary is not None:
        report["diff"] = diff_summary
        report["outputs"]["diff"] = diff_path
    if tokens_path is not None:
        report["outputs"]["top_tokens"] = tokens_path
        report["top_tokens_support"] = args.top_tokens
        report["n_top_tokens"] = (
            spark.read.parquet(tokens_path).count()
        )
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps({"n_sources": len(report["sources"]),
                      "total_docs": report["total"]["n_docs"]},
                     sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
