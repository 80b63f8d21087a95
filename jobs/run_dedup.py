"""Production dedup pipeline — spark-submit entry.

    zip -r icicle_spark.zip icicle_spark
    spark-submit --py-files icicle_spark.zip jobs/run_dedup.py \\
        --input /data/documents --output /data/dedup_decisions \\
        --method minhash --threshold 0.7 \\
        [--id-col doc_id] [--text-col text] \\
        [--index /data/minhash_index]        # reuse a persisted index \\
        [--write-index /data/minhash_index]  # persist this corpus' index \\
        [--pairs-out /data/dup_pairs]

Flow: exact dedup first (hash groupBy — removes byte-identical copies
cheaply), then near-dup pairs (minhash | simhash), then connected
components -> one survivor per cluster. Output: (id, cluster, keep)
decisions, optionally the verified pairs and the reusable LSH bucket
index. With ``--index`` the near-dup stage bands ONLY documents that
survive exact dedup and joins against the persisted corpus index
(incremental ingest — cost scales with the increment).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# plain `python jobs/...` (no spark-submit --py-files) must still
# find the library beside jobs/ — on the driver AND in the Python
# workers Spark forks (they unpickle UDF closures that import it)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="minhash",
                    choices=["minhash", "simhash", "exact",
                             "phash", "afp", "vhash"])
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--media-col", default="media",
                    help="binary media column for the fingerprint "
                    "methods (phash: images, afp: audio, vhash: video)")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--max-hamming", type=int, default=3)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--index", help="existing index (parquet): MinHash "
                    "band buckets, SimHash chunks, or the (id, hash) "
                    "fingerprint table for phash/afp/vhash")
    ap.add_argument("--corpus-texts", help="texts covering the indexed corpus "
                    "(required with --index for Jaccard verification)")
    ap.add_argument("--write-index", help="persist this corpus' bucket index here")
    ap.add_argument("--pairs-out", help="also write verified pairs here")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from icicle_spark.operators.dedup import (
        dedup_survivors,
        exact_dedup,
        exact_key,
        minhash_band_buckets,
        minhash_dedup_incremental,
        minhash_dedup_pairs,
        simhash_chunk_index,
        simhash_dedup_incremental,
        simhash_dedup_pairs,
    )
    from icicle_spark.session import get_spark

    t0 = time.time()
    spark = get_spark(app_name="icicle_spark_dedup")
    docs = spark.read.parquet(args.input)
    idc, txt = args.id_col, args.text_col

    if args.method in ("phash", "afp", "vhash"):
        return _media_dedup(spark, docs, args, t0)

    # stage 1: exact dedup — survivors carry the near-dup cost
    kept_ids = exact_dedup(docs, txt, idc).select(idc)
    survivors = docs.join(kept_ids, on=idc)

    # stage 2: near-dup pairs among exact survivors
    if args.method == "exact":
        if args.index:
            ap.error("--index is meaningless with --method exact")
        pairs = None
    elif args.index and args.method == "simhash":
        # SimHash index carries the fingerprints — no text re-join
        pairs = simhash_dedup_incremental(
            survivors, spark.read.parquet(args.index), txt, idc,
            max_hamming=args.max_hamming, max_bucket=args.max_bucket,
        )
    elif args.index:
        if not args.corpus_texts:
            ap.error("--index with --method minhash requires --corpus-texts")
        corpus_texts = spark.read.parquet(args.corpus_texts)
        texts = corpus_texts.select(idc, txt).unionByName(
            survivors.select(idc, txt)
        ).dropDuplicates([idc])
        pairs = minhash_dedup_incremental(
            survivors, spark.read.parquet(args.index), texts,
            txt, idc, args.num_perm, args.bands,
            threshold=args.threshold, max_bucket=args.max_bucket,
        )
    elif args.method == "minhash":
        pairs = minhash_dedup_pairs(
            survivors, txt, idc, args.num_perm, args.bands,
            threshold=args.threshold, max_bucket=args.max_bucket,
        )
    else:
        pairs = simhash_dedup_pairs(
            survivors, txt, idc,
            max_hamming=args.max_hamming, max_bucket=args.max_bucket,
        )

    # stage 3: decisions. Exact-dropped docs point at their exact
    # survivor; near-dup clusters keep their min id.
    exact_cluster = docs.groupBy(exact_key(txt).alias("__k")).agg(
        F.min(idc).alias("__surv")
    )
    base = docs.withColumn("__k", exact_key(txt)).join(exact_cluster, on="__k")
    if pairs is not None:
        near = dedup_survivors(survivors, pairs, idc)
        decisions = base.join(
            near.select(F.col(idc).alias("__surv"),
                        F.col("cluster").alias("__nc")),
            on="__surv", how="left",
        ).select(
            idc,
            F.coalesce("__nc", "__surv").alias("cluster"),
            (F.col(idc) == F.coalesce("__nc", "__surv")).alias("keep"),
        )
    else:
        decisions = base.select(
            idc,
            F.col("__surv").alias("cluster"),
            (F.col(idc) == F.col("__surv")).alias("keep"),
        )
    decisions.write.mode("overwrite").parquet(args.output)

    record = {
        "mode": f"incremental_{args.method}" if args.index else args.method,
        "docs_in": docs.count(),
        "kept": spark.read.parquet(args.output).where("keep").count(),
        "output": args.output,
        "wall_seconds": round(time.time() - t0, 3),
    }
    if args.pairs_out and pairs is not None:
        pairs.write.mode("overwrite").parquet(args.pairs_out)
        record["pairs_out"] = args.pairs_out
    if args.write_index:
        if args.method == "simhash":
            simhash_chunk_index(
                survivors, txt, idc, args.max_hamming
            ).write.mode("overwrite").partitionBy("ck").parquet(args.write_index)
        else:
            minhash_band_buckets(
                survivors, txt, idc, args.num_perm, args.bands
            ).write.mode("overwrite").partitionBy("band").parquet(args.write_index)
        record["index"] = args.write_index
    print(json.dumps(record))
    return 0




def _media_dedup(spark, docs, args, t0) -> int:
    """Fingerprint dedup over a binary media column: byte-identical
    exact stage (md5 groupBy), then near-dup pairs from the 63-bit
    perceptual/audio/video fingerprint (`operators/{phash,afp,
    vhash}.py`) via the banded Hamming join — EXACT for
    max_hamming < bands. ``--index`` points at a persisted (id, hash)
    fingerprint table, so a refresh decodes+hashes ONLY the
    increment; ``--write-index`` persists this corpus' fingerprints
    (old index unioned in) for the next refresh."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from icicle_spark.operators.dedup import dedup_survivors
    from icicle_spark.operators.phash import (
        hamming_pairs,
        hamming_pairs_incremental,
    )

    idc, media = args.id_col, args.media_col
    if args.method == "phash":
        from icicle_spark.operators.phash import phash_column as fp_col
        hcol = "phash"
    elif args.method == "afp":
        from icicle_spark.operators.afp import afp_column as fp_col
        hcol = "afp"
    else:
        from icicle_spark.operators.vhash import vhash_column as fp_col
        hcol = "vhash"

    # stage 1: byte-identical exact dedup — survivors carry the
    # decode+hash cost
    exact_cluster = docs.groupBy(F.md5(F.col(media)).alias("__k")).agg(
        F.min(idc).alias("__surv")
    )
    base = docs.withColumn("__k", F.md5(F.col(media))).join(
        exact_cluster, on="__k"
    )
    survivors = docs.join(
        base.where(F.col(idc) == F.col("__surv")).select(idc), on=idc
    )

    # stage 2: fingerprint near-dup pairs (one decode+hash pass over
    # the increment only when --index is given)
    hashes = fp_col(survivors, media, idc)
    if args.index:
        index = spark.read.parquet(args.index)
        pairs = hamming_pairs_incremental(
            hashes, index, idc, hcol,
            max_distance=args.max_hamming, bands=args.bands,
        )
    else:
        index = None
        pairs = hamming_pairs(
            hashes, idc, hcol,
            max_distance=args.max_hamming, bands=args.bands,
        )

    # stage 3: decisions (same contract as the text pipeline)
    near = dedup_survivors(survivors, pairs, idc)
    decisions = base.join(
        near.select(F.col(idc).alias("__surv"),
                    F.col("cluster").alias("__nc")),
        on="__surv", how="left",
    ).select(
        idc,
        F.coalesce("__nc", "__surv").alias("cluster"),
        (F.col(idc) == F.coalesce("__nc", "__surv")).alias("keep"),
    )
    decisions.write.mode("overwrite").parquet(args.output)

    record = {
        "mode": (f"incremental_{args.method}" if args.index
                 else args.method),
        "docs_in": docs.count(),
        "kept": spark.read.parquet(args.output).where("keep").count(),
        "output": args.output,
        "wall_seconds": round(_time.time() - t0, 3),
    }
    if args.pairs_out:
        pairs.write.mode("overwrite").parquet(args.pairs_out)
        record["pairs_out"] = args.pairs_out
    if args.write_index:
        out_index = hashes.select(idc, hcol)
        if index is not None:
            out_index = index.select(idc, hcol).unionByName(
                out_index
            ).dropDuplicates([idc])
        out_index.write.mode("overwrite").parquet(args.write_index)
        record["index"] = args.write_index
    print(_json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
