"""End-to-end curation pipeline smoke: exact dedup + decontamination
+ signals + policy through the spark-submit entry point."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from jobs.run_curation import main


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    base = ("the quick brown fox jumps over the lazy dog while birds "
            "sing in tall green trees beside a cold clear mountain "
            "river during early spring mornings full of soft light")
    rows = [
        # 1/2: exact duplicates (one survives)
        (1, base),
        (2, base),
        # 3: too short
        (3, "tiny text"),
        # 4: repetitive
        (4, "spam ham " * 40),
        # 5: healthy
        (5, "a genuinely varied document with many different interesting "
            "words covering assorted topics like rivers mountains cities "
            "music science history art cooking travel sports weather"),
        # 6: contaminated vs benchmark (long shared 8-gram)
        (6, "prefix words here what is the capital of france paris "
            "answer suffix tail words padding making this long enough "
            "to pass the minimum word count threshold easily for sure"),
    ]
    p = tmp_path_factory.mktemp("cur")
    src = str(p / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    bench = str(p / "bench.parquet")
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [900],
             "text": ["what is the capital of france paris answer"]}
        )
    ).write.mode("overwrite").parquet(bench)
    return src, bench


def test_curation_pipeline(spark, corpus, tmp_path):
    src, bench = corpus
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--benchmark", bench,
        "--ngram", "8", "--min-words", "12", "--max-dup2", "0.5",
        "--min-distinct-ratio", "0.25", "--min-logprob", "-20",
        "--report",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    # --report: kept-corpus telemetry persisted and summarized
    assert os.path.exists(os.path.join(out, "kept_stats.parquet"))
    assert summary["kept_stats"]["TOTAL"]["n_docs"] == summary["kept"]
    assert summary["kept_stats"]["TOTAL"]["dup_ratio"] == 0.0
    assert summary["input_docs"] == 6
    # one exact dup + one contaminated doc removed pre-policy
    assert summary["after_dedup_decontamination"] == 4
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    dropped = spark.read.parquet(os.path.join(out, "dropped")).toPandas()
    assert set(kept.doc_id) == {1, 5}
    got = dropped.set_index("doc_id")["fail_reason"].to_dict()
    assert got[3] == "too_short"
    assert got[4] in ("repetitive_2gram", "low_diversity")
    assert summary["kept"] == 2
    assert sum(summary["dropped_by_reason"].values()) == 2
    # signal columns ride along on kept rows
    for col in ("n_words", "dup2_frac", "distinct_word_ratio", "logprob"):
        assert col in kept.columns


def test_curation_semantic_decontamination(spark, corpus, tmp_path):
    """--embeddings/--benchmark-embeddings: a doc whose embedding is
    near a benchmark embedding is dropped pre-policy."""
    import numpy as np

    src, bench = corpus
    rng = np.random.default_rng(5)
    b0 = rng.normal(size=8); b0 /= np.linalg.norm(b0)
    vecs = {i: rng.normal(size=8).tolist() for i in (1, 2, 3, 4, 6)}
    vecs[5] = (b0 + rng.normal(scale=0.03, size=8)).tolist()  # near
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": list(vecs), "embedding": list(vecs.values())})
    ).write.mode("overwrite").parquet(emb)
    bemb = str(tmp_path / "bemb.parquet")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": [900], "embedding": [b0.tolist()]})
    ).write.mode("overwrite").parquet(bemb)
    out = str(tmp_path / "out_sem")
    assert main([
        "--input", src, "--output", out, "--benchmark", bench,
        "--ngram", "8", "--min-words", "12",
        "--embeddings", emb, "--benchmark-embeddings", bemb,
        "--semantic-threshold", "0.9", "--no-logprob",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    # dedup(-1), ngram contamination(-1), semantic contamination(-1)
    assert summary["after_dedup_decontamination"] == 3
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert 5 not in set(kept.doc_id)


def test_curation_dictionary_policy(spark, corpus, tmp_path):
    """--dictionary file.icicle: declared quality features join the
    signal frame and gate the policy via --rule — the .icicle-declared
    curation shape (VERDICT r3 #8, unifying the two job entry
    points)."""
    src, bench = corpus
    dict_path = str(tmp_path / "quality.icicle")
    with open(dict_path, "w") as f:
        f.write("""
module Quality where

input document : {
    text : String
  }

feature has_fox =
  from document
    in any (grepl "fox" text)

feature text_len =
  from document
    in sum (strlen text)
""")
    out = str(tmp_path / "out_dict")
    assert main([
        "--input", src, "--output", out,
        "--min-words", "2", "--max-dup2", "0.99",
        "--min-distinct-ratio", "0.01", "--no-logprob",
        "--dictionary", dict_path,
        "--rule", "mentions_fox:NOT coalesce(has_fox, false)",
        "--rule", "short_text:text_len >= 40",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    dropped = spark.read.parquet(os.path.join(out, "dropped")).toPandas()
    # declared signals ride along
    assert "has_fox" in kept.columns and "text_len" in kept.columns
    got = dropped.set_index("doc_id")["fail_reason"].to_dict()
    # doc 1 (or its dup survivor) mentions the fox -> custom rule
    assert got[1] == "mentions_fox"
    # doc 3 ("tiny text", 9 chars) fails the declared-length rule
    assert got[3] == "short_text"
    # doc 4 ("spam ham "*40) still trips the BASE dup2 rule — base and
    # declared rules compose
    assert got[4] == "repetitive_2gram"
    assert set(kept.doc_id) == {5, 6}
    assert summary["kept"] == 2


def test_curation_pipeline_boilerplate_stages(spark, corpus, tmp_path):
    """--line-dedup / --substring-dedup rewrite text before signals
    and report removal totals in the summary."""
    src, _ = corpus
    out = str(tmp_path / "out_bp")
    assert main([
        "--input", src, "--output", out,
        "--line-dedup", "--substring-dedup", "6",
        "--min-words", "2", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0", "--no-logprob",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    # docs 1/2 are exact dups -> one survives, so its text is unique
    # afterwards; the duplicated-substring stage still sees doc 4's
    # internal 'spam ham' repetition (>= 6-token run repeated)
    assert summary["tokens_removed"] > 0
    assert "lines_removed" in summary
    kept = spark.read.parquet(os.path.join(out, "kept"))
    assert "__tokens_rm" not in kept.columns
    assert "__lines_rm" not in kept.columns


def test_curation_pipeline_span_dedup_stage(spark, tmp_path):
    """--span-dedup rewrites text with the KEEP-ONE policy: the
    canonical (lowest doc_id) occurrence of a cross-doc duplicated
    span survives, the later copy is cut, and the total lands in the
    summary as span_tokens_removed."""
    shared = "copied boilerplate footer appears verbatim here"
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                f"first document unique opening words then {shared}",
                f"second document different body text then {shared}",
            ],
        }
    )
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out_span")
    assert main([
        "--input", src, "--output", out,
        "--span-dedup", "6",
        "--min-words", "1", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0", "--no-logprob",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    # both docs share the 7-word suffix 'then <shared>': two
    # overlapping duplicated 6-grams whose canonical copies sit in
    # doc 1, so doc 2 loses the unioned 7 positions
    assert summary["span_tokens_removed"] == 7
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert "__span_tokens_rm" not in kept.columns
    texts = kept.set_index("doc_id")["text"].to_dict()
    assert shared in texts[1]  # canonical copy survives
    assert shared not in texts[2]


def test_curation_novelty_signal(spark, corpus, tmp_path):
    """--novelty-index joins gram-novelty signals and --rule can gate
    on them (near-zero-novelty docs = boilerplate re-crawls)."""
    from icicle_spark.operators.dedup import gram_hash_counts

    src, _bench = corpus
    held = str(tmp_path / "held_index.parquet")
    # held corpus = the healthy doc 5: doc 5 re-crawled => novelty 0
    gram_hash_counts(
        spark.read.parquet(src).where("doc_id = 5"), "text", k=4
    ).write.mode("overwrite").parquet(held)
    out = str(tmp_path / "out_nov")
    assert main([
        "--input", src, "--output", out,
        "--novelty-index", f"{held}:4",
        "--min-words", "2", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0", "--no-logprob",
        "--rule", "stale:novelty >= 0.05",
    ]) == 0
    import pandas as _pd

    kept = _pd.read_parquet(f"{out}/kept")
    dropped = _pd.read_parquet(f"{out}/dropped")
    assert 5 not in set(kept["doc_id"])  # its own grams: novelty 0
    assert set(dropped[dropped["fail_reason"] == "stale"]["doc_id"]) == {5}
    assert "novelty" in kept.columns


def test_curation_pipeline_temperature_mix(spark, tmp_path):
    """--mix-alpha rebalances the kept corpus by source: the rare
    source survives wholesale, the dominant one is thinned toward the
    sqrt ratio, and the rates land in summary.json."""
    rows = [
        (
            i,
            f"varied document number {i} with plenty of different "
            f"interesting words covering rivers mountains cities music "
            f"science history art cooking travel sports weather item{i}",
            "web" if i % 10 else "books",
        )
        for i in range(1, 201)
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--mix-alpha", "0.5",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["mix_alpha"] == 0.5
    assert summary["mix_rates"]["books"] == 1.0  # rare: kept wholesale
    assert 0.3 < summary["mix_rates"]["web"] < 0.35  # sqrt(20/180)=0.333
    kept = spark.read.parquet(os.path.join(out, "kept"))
    by = {r["source"]: r["n"] for r in
          kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["books"] == 20
    assert 40 <= by["web"] <= 80  # ~180*0.333 with hash noise
    assert summary["kept_after_mix"] == by["books"] + by["web"]


def test_curation_mix_requires_source_col(spark, corpus, tmp_path):
    src, _ = corpus
    with pytest.raises(SystemExit, match="mix-alpha"):
        main([
            "--input", src, "--output", str(tmp_path / "o2"),
            "--min-words", "5", "--no-logprob", "--mix-alpha", "0.5",
        ])


def test_curation_url_gate_and_quota(spark, tmp_path):
    """--url-col gates blocked domains up front; --cap-group caps the
    kept corpus per domain; both land in summary.json."""
    body = ("a genuinely varied document with many different words "
            "covering rivers mountains cities music science history")
    rows = [
        (
            i,
            f"{body} item{i}",
            (f"https://spam.bad.biz/x/{i}" if i % 10 == 0
             else f"https://ok{i % 4}.example.com/page/{i}"),
        )
        for i in range(1, 101)
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "url"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--url-col", "url",
        "--block-domain", "bad.biz",
        "--cap-group", "domain", "--cap-max", "15",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["url_dropped"] == 10
    assert summary["cap_group"] == "domain"
    kept = spark.read.parquet(os.path.join(out, "kept"))
    by = {r["domain"]: r["n"] for r in
          kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert set(by) == {"example.com"}  # bad.biz gone; domain col rode through
    assert by["example.com"] == 15  # quota applied
    assert summary["kept_after_mix"] == 15


def test_curation_leakage_safe_split(spark, tmp_path):
    """--split assigns kept docs to named splits so near-dup clusters
    never straddle a boundary; output partitions by the split col."""
    body = ("many different interesting words covering assorted "
            "topics like rivers mountains cities music science "
            "history art cooking travel sports weather dawn %s")
    rows = []
    # 20 healthy docs; ids 100/101 are near-duplicates of each other
    for i in range(20):
        rows.append((i, body % f"variant number {i} with extras"))
    near = body % "variant number shared tail"
    rows.append((100, near))
    rows.append((101, near + " tiny"))
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--split", "train=0.8,holdout=0.2",
        "--split-threshold", "0.6",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert "split" in kept.columns
    assert set(kept.split) <= {"train", "holdout"}
    assert sum(summary["split_counts"].values()) == len(kept)
    # the near-dup pair always lands on one side
    sides = kept.set_index("doc_id")["split"].to_dict()
    assert sides[100] == sides[101]


def test_curation_split_leakage_audit(spark, tmp_path):
    """--audit-leakage publishes per-eval-split n-gram contamination
    vs train in the summary (zero when near-dups share a side)."""
    rows = [(i, f"document number {i} alpha beta gamma delta epsilon "
                f"zeta eta theta iota kappa variant {i}")
            for i in range(12)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--split", "train=0.7,val=0.3",
        "--audit-leakage", "9",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    audit = summary.get("split_leakage", {})
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    evals = set(kept.split) - {"train"}
    assert set(audit) == evals
    for split, row in audit.items():
        assert row["n_docs"] == int((kept.split == split).sum())
        assert 0 <= row["n_contaminated"] <= row["n_docs"]


def test_curation_split_with_precomputed_pairs(spark, tmp_path):
    rows = [(i, f"document number {i} with plenty of distinct words "
                f"alpha beta gamma delta epsilon zeta eta theta")
            for i in range(10)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    pairs = str(tmp_path / "pairs.parquet")
    spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 1], "id_b": [1, 2]})
    ).write.mode("overwrite").parquet(pairs)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--split", "a=0.5,b=0.5",
        "--split-pairs", pairs,
    ]) == 0
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    sides = kept.set_index("doc_id")["split"].to_dict()
    # the chain 0-1-2 is one cluster: all three on the same side
    assert sides[0] == sides[1] == sides[2]


def test_curation_split_spec_validation(spark, tmp_path):
    rows = [(1, "hello world of words")]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    with pytest.raises(SystemExit):
        main(["--input", src, "--output", str(tmp_path / "o"),
              "--min-words", "1", "--no-logprob", "--split", "garbage"])


def test_curation_dsir_stage(spark, tmp_path):
    """--dsir-keep selects the K policy survivors most like the
    --dsir-target seed; selection is deterministic and the summary
    records the stage."""
    seedish = ("rivers mountains forests lakes valleys meadows "
               "glaciers canyons deltas estuaries plateaus cliffs "
               "springs waterfalls ridges summits basins fjords")
    rows = [(i, f"{seedish} nature essay variant {i}", "wiki")
            for i in range(4)]
    rows += [(10 + i,
              f"{seedish} field notes on nature and terrain {i}",
              "web") for i in range(4)]
    rows += [(20 + i,
              "buy cheap pills casino bonus click subscribe now "
              "winner prize jackpot offer discount deal promo code "
              f"limited stock order today spam variant {i}", "web")
             for i in range(4)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--max-dup2", "1.0",
        "--dsir-keep", "6", "--dsir-target", "source = 'wiki'",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["dsir_keep"] == 6
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert len(kept) == 6
    # the seed-like docs win over the spam block
    assert set(kept.doc_id) <= set(range(0, 14))
    # rerun into a second dir: identical selection (hash-derived Gumbel)
    out2 = str(tmp_path / "out2")
    assert main([
        "--input", src, "--output", out2, "--min-words", "3",
        "--no-logprob", "--max-dup2", "1.0",
        "--dsir-keep", "6", "--dsir-target", "source = 'wiki'",
    ]) == 0
    kept2 = spark.read.parquet(os.path.join(out2, "kept")).toPandas()
    assert set(kept2.doc_id) == set(kept.doc_id)


def test_curation_dsir_requires_target(spark, tmp_path):
    rows = [(i, "plain document with enough words to pass the "
                f"threshold easily variant {i}") for i in range(4)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    with pytest.raises(SystemExit):
        main(["--input", src, "--output", str(tmp_path / "o"),
              "--min-words", "3", "--no-logprob", "--dsir-keep", "2"])


def test_curation_epoch_mix(spark, tmp_path):
    """--epoch-budget: the plan lands in summary.json, the kept corpus
    carries labelled epoch copies, per-source copy counts obey
    floor(e)/ceil(e), and the cap binds."""
    rows = [
        (
            i,
            f"varied document number {i} with plenty of different "
            f"interesting words covering rivers mountains cities music "
            f"science history art cooking travel sports weather item{i}",
            "web" if i % 10 else "books",
        )
        for i in range(1, 201)
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--epoch-budget", "20000",
        "--epoch-weight", "web=1", "--epoch-weight", "books=1",
        "--epoch-cap", "3.0",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    plan = {p["source"]: p for p in summary["epoch_plan"]}
    # books is tiny -> its 10k-token target way exceeds its mass: cap
    assert plan["books"]["epochs"] == 3.0
    assert 0 < plan["web"]["epochs"] < 3.0
    kept = spark.read.parquet(os.path.join(out, "kept"))
    assert "epoch" in kept.columns
    per = {
        (r["source"], r["doc_id"]): r["n"]
        for r in kept.groupBy("source", "doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import math

    for (s, _), n in per.items():
        e = plan[s]["epochs"]
        assert math.floor(e) <= n <= math.ceil(e)


def test_curation_epoch_with_split_no_fanout(spark, tmp_path):
    """--epoch-budget + --split: epochs materialize AFTER the split
    join, so copies stay floor(e)/ceil(e) (the pre-fix bug fanned out
    e x e) and every copy of a doc shares one split. Upsampling is a
    TRAIN-only treatment: val docs stay exactly one copy (epoch 0) —
    eval sets must never be epoch-duplicated (it would double-count
    eval examples and understate the leakage audit's
    contaminated_frac by ~the epoch factor)."""
    rows = [
        (
            i,
            f"varied document number {i} plus distinct words rivers "
            f"mountains cities music science history art cooking "
            f"travel sports weather item{i} extra{i*7} token{i*13}",
            "web",
        )
        for i in range(1, 121)
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--epoch-budget", "100000",
        "--epoch-cap", "3.0", "--split", "train=0.8,val=0.2",
    ]) == 0
    kept = spark.read.parquet(os.path.join(out, "kept"))
    per = (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("split").alias("nsplit"),
            F.first("split").alias("split"),
            F.max("epoch").alias("max_epoch"),
        )
        .collect()
    )
    assert per
    assert {r["split"] for r in per} == {"train", "val"}
    for r in per:
        assert r["n"] <= 3  # never e x e (9)
        assert r["nsplit"] == 1
        if r["split"] != "train":
            # eval splits are never epoch-upsampled
            assert r["n"] == 1 and r["max_epoch"] == 0
    # with budget >> corpus the cap binds: train docs all hit 3 copies
    assert all(r["n"] == 3 for r in per if r["split"] == "train")


def test_curation_compression_signal(spark, tmp_path):
    """--compression + a rule gate: the heavily repetitive doc fails
    on compression_ratio while varied docs survive."""
    rows = [
        (1, "spam ham eggs " * 120, "web"),
        (2, "a genuinely varied document with many different words "
            "covering rivers mountains cities music science history "
            "art cooking travel sports weather galaxies chemistry "
            "poetry economics farming sailing painting running "
            "climbing mathematics geography", "web"),
    ]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "5",
        "--no-logprob", "--compression", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0",
        "--rule", "too_compressible:compression_ratio >= 0.25",
    ]) == 0
    kept = {r["doc_id"] for r in
            spark.read.parquet(os.path.join(out, "kept")).collect()}
    assert kept == {2}
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["dropped_by_reason"].get("too_compressible") == 1
