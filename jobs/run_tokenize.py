"""Corpus tokenization pipeline (spark-submit entry): the stage that
follows curation in a pretraining data refresh —

    base-tokenize (bytes / codepoints / word-hash, or a pre-tokenized
    column) -> train BPE merges (optionally on a deterministic hash
    sample) -> apply merges corpus-wide -> dense vocab remap (freq
    order) -> pack into fixed-length training sequences -> parquet
    splits (merges / vocab / packed) + summary.json

Scale shape: training cost follows the sample (``--sample``), every
corpus-wide step is one scan (byte/codepoint tokenize, BPE apply,
remap) or the packing's single segment-cumsum pass; the vocab and
merge tables move as broadcasts, never corpus-sized shuffles.

    spark-submit jobs/run_tokenize.py \
        --input kept.parquet --output out/ \
        --base codepoint --merges 512 --sample 0.05 --seq-len 2048
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--tokens-col",
                    help="pre-tokenized array<int> column; skips base "
                    "tokenization (--base ignored)")
    ap.add_argument("--base", default="codepoint",
                    choices=["codepoint", "utf8", "wordhash"],
                    help="base tokenization when deriving from text")
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--sample", type=float,
                    help="train merges on this hash-gated doc fraction")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint-every", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--eos", type=int, default=-1,
                    help="end-of-document marker id appended before "
                    "packing; -1 = vocab size (one past the last id); "
                    "use --no-eos to disable")
    ap.add_argument("--no-eos", action="store_true")
    ap.add_argument("--no-pack", action="store_true",
                    help="stop after remap; write tokenized docs only")
    ap.add_argument("--fim-rate", type=float, default=0.0,
                    help="fill-in-the-middle: rearrange this "
                    "md5-deterministic fraction of documents "
                    "(PSM/SPM) after remap, before packing; "
                    "sentinels take the three ids after the pad id")
    ap.add_argument("--fim-mode", default="psm", choices=["psm", "spm"])
    ap.add_argument("--pack-order", default="",
                    help="comma-separated EXTRA order columns appended "
                    "to (source, doc_id) for packing — e.g. 'epoch' "
                    "for an epoch-upsampled corpus, whose duplicate "
                    "(source, doc_id) keys the no-split packer "
                    "otherwise refuses loudly")
    ap.add_argument("--pack-mode", default="concat",
                    choices=["concat", "bin", "bin-ffd"],
                    help="concat = GPT concat-then-chunk "
                    "(pack_token_sequences); bin / bin-ffd = no-split "
                    "whole-doc bin packing (materialize_bins, "
                    "class / first-fit-decreasing), right-padded to "
                    "seq_len with a fresh pad id")
    ap.add_argument("--shards", type=int, default=0,
                    help="after packing: deterministic global shuffle "
                    "+ write N balanced shard=K/ dirs with a per-shard "
                    "manifest (0 = single packed.parquet)")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from icicle_spark.operators.bpe import bpe_apply, bpe_train
    from icicle_spark.operators.packing import pack_token_sequences
    from icicle_spark.operators.tokens import (
        char_token_ids,
        codepoint_token_ids,
        utf8_byte_tokens,
    )
    from icicle_spark.session import get_spark

    spark = get_spark(app_name="icicle_spark_tokenize")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.output, exist_ok=True)

    df = spark.read.parquet(args.input)
    pack_extra = tuple(
        c.strip() for c in args.pack_order.split(",") if c.strip()
    )
    missing = [c for c in pack_extra if c not in df.columns]
    if missing:
        raise SystemExit(
            f"--pack-order columns not in the corpus: {missing}"
        )
    if args.tokens_col:
        base = df.select(
            F.col(args.id_col).alias("doc_id"),
            *([F.col("source")] if "source" in df.columns else []),
            *[F.col(c) for c in pack_extra],
            F.col(args.tokens_col).alias("tokens"),
        )
    else:
        keep = [F.col(args.id_col).alias("doc_id")] + (
            [F.col("source")] if "source" in df.columns else []
        ) + [F.col(c) for c in pack_extra]
        if args.base == "utf8":
            base = utf8_byte_tokens(
                df.select(*keep, args.text_col), args.text_col, "tokens"
            ).drop(args.text_col)
        else:
            fn = (
                codepoint_token_ids
                if args.base == "codepoint"
                else char_token_ids
            )
            base = df.select(*keep, fn(args.text_col).alias("tokens"))
    base = base.persist()
    n_docs = base.count()

    merges = bpe_train(
        base,
        "tokens",
        n_merges=args.merges,
        min_count=args.min_count,
        sample_fraction=args.sample,
        sample_key="doc_id" if args.sample is not None else None,
        seed=args.seed,
        checkpoint_every=args.checkpoint_every,
    )
    merges.write.mode("overwrite").parquet(
        os.path.join(args.output, "merges.parquet")
    )
    n_merges = merges.count()

    enc = bpe_apply(base, merges, "tokens", out_col="bpe").drop("tokens")

    # dense vocab: freq-ordered ids 0..V-1 (ties: token asc). The
    # vocab table is bounded (distinct post-merge ids), remap is a
    # broadcast lookup — corpus side stays shuffle-free.
    from pyspark.sql.window import Window

    from icicle_spark.operators.tokens import corpus_token_freq, remap_tokens

    # the global-order row_number sorts only the VOCAB table (bounded:
    # distinct post-merge ids), never the corpus
    vocab = corpus_token_freq(enc, "bpe").withColumn(
        "new_id",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token")))
        - 1,
    )
    vocab.write.mode("overwrite").parquet(
        os.path.join(args.output, "vocab.parquet")
    )
    vocab_size = vocab.count()

    dense = remap_tokens(enc, vocab, "bpe").drop("bpe").withColumnRenamed(
        "remapped", "tokens"
    )
    if args.fim_rate > 0:
        from icicle_spark.operators.tokens import fim_transform

        # sentinel ids after eos (vocab_size) and pad (vocab_size+1)
        s0 = vocab_size + 2
        dense = fim_transform(
            dense,
            "tokens",
            "doc_id",
            rate=args.fim_rate,
            seed=args.seed,
            mode=args.fim_mode,
            pre_tok=s0,
            mid_tok=s0 + 1,
            suf_tok=s0 + 2,
        ).drop("fim", "fim_a", "fim_b")

    # token accounting AFTER any FIM stage so summary.json matches the
    # corpus actually written (FIM adds 3 sentinels per transformed doc)
    stats = dense.agg(
        F.sum(F.size("tokens")).alias("n_tok"),
        F.sum("n_oov").alias("n_oov"),
    ).collect()[0]

    if args.no_pack:
        dense.write.mode("overwrite").parquet(
            os.path.join(args.output, "tokenized.parquet")
        )
        packed_rows = None
    else:
        eos = None if args.no_eos else (
            vocab_size if args.eos == -1 else args.eos
        )
        order = ("source", "doc_id") if "source" in dense.columns else (
            "doc_id",
        )
        order = order + pack_extra
        if args.pack_mode == "concat":
            packed = pack_token_sequences(
                dense, "tokens", order_cols=order, seq_len=args.seq_len,
                eos=eos,
            )
            id_col = "seq_id"
        else:
            from icicle_spark.operators.packing import materialize_bins

            # pad id: one past the eos marker (or one past the vocab
            # when eos is disabled) — always a fresh id
            pad = (eos + 1) if eos is not None else vocab_size
            packed = materialize_bins(
                dense, "tokens", order_cols=order, seq_len=args.seq_len,
                strategy="class" if args.pack_mode == "bin" else "ffd",
                eos=eos, pad=pad,
            )
            id_col = "bin_id"
        if args.shards:
            from icicle_spark.operators.packing import write_shards

            manifest = write_shards(
                packed, os.path.join(args.output, "packed_shards"),
                args.shards, id_col=id_col, seed=args.seed,
            )
            with open(
                os.path.join(args.output, "shard_manifest.json"), "w"
            ) as f:
                json.dump(manifest, f, indent=2)
            packed_rows = sum(m["rows"] for m in manifest)
        else:
            packed.write.mode("overwrite").parquet(
                os.path.join(args.output, "packed.parquet")
            )
            packed_rows = packed.count()

    summary = {
        "n_docs": n_docs,
        "n_merges": int(n_merges),
        "vocab_size": int(vocab_size),
        "n_tokens": int(stats["n_tok"] or 0),
        "n_oov": int(stats["n_oov"] or 0),
        "packed_sequences": packed_rows,
        "seq_len": None if args.no_pack else args.seq_len,
        "pack_mode": None if args.no_pack else args.pack_mode,
        "fim": None if not args.fim_rate else {
            "rate": args.fim_rate, "mode": args.fim_mode,
        },
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    base.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
