"""End-to-end corpus curation pipeline (spark-submit entry):

    exact dedup -> [benchmark n-gram decontamination] -> quality
    signals (word count, Gopher repetition stats, type-token ratio,
    unigram LM log-prob) -> declarative quality policy -> kept /
    dropped(+reason) parquet + a per-reason summary

This is the composition a training-data refresh actually runs at
100 TB: every stage is one scan or one broadcast join; the only
corpus-sized shuffles are exact-dedup's groupBy and the word-freq
build (skippable with --no-logprob).

    spark-submit jobs/run_curation.py \
        --input corpus.parquet --output out/ \
        --benchmark eval.parquet --min-words 20 --max-dup2 0.5
"""

from __future__ import annotations

import argparse
import json
import os


def build_rules(args) -> list[tuple[str, str]]:
    """Ordered policy: first failing rule is the recorded reason."""
    rules = [
        ("too_short", f"n_words >= {args.min_words}"),
        ("too_long", f"n_words <= {args.max_words}"),
        ("repetitive_2gram", f"dup2_frac <= {args.max_dup2}"),
        ("low_diversity",
         f"distinct_word_ratio >= {args.min_distinct_ratio}"),
    ]
    if not args.no_logprob:
        rules.append(("gibberish", f"logprob >= {args.min_logprob}"))
    return rules


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--benchmark",
                    help="eval-set parquet to decontaminate against")
    ap.add_argument("--ngram", type=int, default=13,
                    help="decontamination n-gram size")
    ap.add_argument("--embeddings",
                    help="corpus embeddings parquet (id_col + "
                         "embedding) for SEMANTIC decontamination")
    ap.add_argument("--benchmark-embeddings",
                    help="eval-set embeddings parquet")
    ap.add_argument("--semantic-threshold", type=float, default=0.9)
    ap.add_argument("--min-words", type=int, default=20)
    ap.add_argument("--max-words", type=int, default=100_000)
    ap.add_argument("--max-dup2", type=float, default=0.5)
    ap.add_argument("--min-distinct-ratio", type=float, default=0.2)
    ap.add_argument("--min-logprob", type=float, default=-12.0)
    ap.add_argument("--no-logprob", action="store_true",
                    help="skip the word-freq build + LM proxy")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from icicle_spark.functions.text import (
        doc_logprob,
        quality_filter,
        repetition_stats,
        word_freq,
    )
    from icicle_spark.operators.dedup import (
        _norm_tokens,
        decontaminate,
        exact_dedup,
    )
    from icicle_spark.session import get_spark

    spark = get_spark(app_name="icicle_spark_curation")
    docs = spark.read.parquet(args.input)
    n_input = docs.count()

    # 1. exact dedup (hash + groupBy, map-side combine)
    docs = exact_dedup(docs, args.text_col, args.id_col)

    # 2. benchmark decontamination (broadcast gram index), optionally
    # followed by embedding-space decontamination (paraphrases share
    # no n-gram; the flagged id set anti-joins the docs)
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        docs = decontaminate(
            docs, bench, args.text_col, args.id_col, n=args.ngram
        )
    if args.embeddings and args.benchmark_embeddings:
        from icicle_spark.operators.similarity import (
            semantic_contamination,
        )

        emb = spark.read.parquet(args.embeddings)
        bemb = spark.read.parquet(args.benchmark_embeddings)
        flagged = (
            semantic_contamination(emb, bemb, id_col=args.id_col)
            .where(F.col("max_sim") >= args.semantic_threshold)
            .select(args.id_col)
        )
        docs = docs.join(F.broadcast(flagged), on=args.id_col,
                         how="left_anti")
    # persist the cleaned corpus: the signal stage, the (optional)
    # word-freq build, both writes and the reason summary all read it
    # — without this the dedup+decontamination DAG re-executes up to
    # five times
    docs = docs.persist()
    n_clean = docs.count()

    # 3. quality signals: one scan-side stage; log-prob adds the
    # word-freq build (one explode+groupBy) + a broadcast join
    sig = repetition_stats(docs, args.text_col).withColumn(
        "n_words", F.size(_norm_tokens(F.col(args.text_col)))
    )
    if not args.no_logprob:
        freq = word_freq(docs, args.text_col)
        lp = doc_logprob(docs, freq, args.text_col, args.id_col)
        sig = sig.join(
            lp.select(args.id_col, "logprob"), on=args.id_col, how="left"
        )

    # 4. declarative policy (first failing rule recorded); persisted
    # because kept/dropped writes and the reason summary each consume
    # it
    out = quality_filter(sig, build_rules(args)).persist()

    kept_path = os.path.join(args.output, "kept")
    dropped_path = os.path.join(args.output, "dropped")
    out.where("passed").drop("passed", "fail_reason").write.mode(
        "overwrite"
    ).parquet(kept_path)
    out.where("NOT passed").write.mode("overwrite").parquet(dropped_path)

    reasons = {
        r["fail_reason"]: r["n"]
        for r in out.where("NOT passed")
        .groupBy("fail_reason")
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: one row per policy rule
    }
    n_kept = n_clean - sum(reasons.values())
    summary = {
        "input_docs": n_input,
        "after_dedup_decontamination": n_clean,
        "kept": n_kept,
        "dropped_by_reason": reasons,
    }
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    print(json.dumps(summary, sort_keys=True))
    out.unpersist()
    docs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
