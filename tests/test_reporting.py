"""Corpus telemetry report: cross-row invariants, the exact/approx
mode contract, plan shape, and the spark-submit job end-to-end.

The exact-value cross-engine parity of ``corpus_stats`` is certified
by the driver oracle (``corpus_stats`` in ``__spark_entry__``,
DuckDB ``GROUP BY ROLLUP`` + ``quantile_cont``); these tests pin the
invariants an oracle can't see — TOTAL really is the rollup of the
per-source rows, duplicates actually move ``dup_ratio``, the approx
mode keeps the schema, and the physical plan stays one scan.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.reporting import (
    TOTAL_LABEL,
    corpus_diff,
    corpus_diff_summary,
    corpus_stats,
    lang_histogram,
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(60):
        src = ["web", "books", "code"][i % 3]
        lang = ["en", "de"][i % 2]
        # 20 duplicated bodies inside 'web' (i % 3 == 0, i >= 30
        # repeats i - 30), unique elsewhere
        body = f"alpha beta gamma doc {i - 30 if (i % 3 == 0 and i >= 30) else i}"
        rows.append((i, body, lang, src, len(body)))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_total_is_rollup_of_sources(docs):
    out = corpus_stats(docs).collect()
    per = {r["source"]: r for r in out if r["source"] != TOTAL_LABEL}
    tot = next(r for r in out if r["source"] == TOTAL_LABEL)
    assert set(per) == {"web", "books", "code"}
    assert sum(r["n_docs"] for r in per.values()) == tot["n_docs"] == 60
    assert sum(r["total_chars"] for r in per.values()) == tot["total_chars"]
    assert sum(r["total_words"] for r in per.values()) == tot["total_words"]
    assert tot["min_chars"] == min(r["min_chars"] for r in per.values())
    assert tot["max_chars"] == max(r["max_chars"] for r in per.values())


def test_dup_ratio_sees_duplicates(docs):
    out = {r["source"]: r for r in corpus_stats(docs).collect()}
    # web: 20 docs, 10 bodies repeated once each -> 10 unique
    assert out["web"]["n_unique_texts"] == 10
    assert out["web"]["dup_ratio"] == pytest.approx(0.5)
    assert out["books"]["dup_ratio"] == pytest.approx(0.0)
    assert out[TOTAL_LABEL]["n_unique_texts"] == 50
    assert out[TOTAL_LABEL]["n_langs"] == 2


def test_word_count_and_median(docs):
    out = {r["source"]: r for r in corpus_stats(docs).collect()}
    # every body is exactly 5 single-space words
    assert out[TOTAL_LABEL]["total_words"] == 60 * 5
    med = sorted(r["n_chars"] for r in docs.collect())
    exact = (med[29] + med[30]) / 2
    assert out[TOTAL_LABEL]["p50_chars"] == pytest.approx(exact, abs=1e-5)


def test_approx_mode_schema_and_ballpark(docs):
    exact = corpus_stats(docs)
    approx = corpus_stats(docs, approx=True)
    assert [f.name for f in approx.schema] == [f.name for f in exact.schema]
    a = {r["source"]: r for r in approx.collect()}
    # HLL on 60 keys is exact-ish; allow generous slack
    assert abs(a[TOTAL_LABEL]["n_unique_texts"] - 50) <= 5
    assert a[TOTAL_LABEL]["n_langs"] == 2


def test_repartition_invariance(docs):
    a = sorted(map(tuple, corpus_stats(docs).collect()))
    b = sorted(map(tuple, corpus_stats(docs.repartition(7)).collect()))
    assert a == b


def test_plan_single_scan(docs):
    t = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    # one pass over the corpus: no self-join, no second scan
    assert len(re.findall(r"Scan ", t)) <= 1
    assert "Join" not in t


def test_lang_histogram(docs):
    hist = {(r["source"], r["lang"]): r["n_docs"]
            for r in lang_histogram(docs).collect()}
    assert sum(hist.values()) == 60
    assert hist[("web", "en")] + hist[("web", "de")] == 20


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert {k: v["status"] for k, v in got.items()} == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added"
    }
    assert got[1]["new_hash"] is None and got[4]["old_hash"] is None
    assert got[3]["old_hash"] != got[3]["new_hash"]
    summ = {r["status"]: r["n_docs"]
            for r in corpus_diff_summary(corpus_diff(old, new)).collect()}
    assert summ == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_corpus_diff_shuffles_hashes_not_bodies(spark):
    old = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    new = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    t = corpus_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    # the text column must be hashed away below the join
    assert "md5" in t
    join_ln = next(ln for ln in t.splitlines() if "Join" in ln)
    assert "text" not in join_ln


def test_sketch_merge_matches_union_corpus(spark, docs, tmp_path):
    from icicle_spark.operators.reporting import (
        corpus_sketch_report,
        merge_sketch_reports,
        sketch_estimates,
    )

    a = docs.where("doc_id < 40")
    b = docs.where("doc_id >= 20")  # overlaps a on 20..39
    # per-refresh tables persist and reload (binary sketch columns
    # must round-trip through parquet)
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    corpus_sketch_report(a).write.parquet(pa)
    corpus_sketch_report(b).write.parquet(pb)
    merged = merge_sketch_reports(
        spark.read.parquet(pa), spark.read.parquet(pb)
    )
    est = {r["source"]: r for r in sketch_estimates(merged).collect()}

    exact = {
        r["source"]: r
        for r in corpus_stats(a.unionByName(b)).collect()
        if r["source"] != TOTAL_LABEL
    }
    for src, e in exact.items():
        m = est[src]
        # counters are exact over the appended stream
        assert m["n_docs"] == e["n_docs"]
        assert m["total_chars"] == e["total_chars"]
        assert m["min_chars"] == e["min_chars"]
        assert m["max_chars"] == e["max_chars"]
        # HLL on tens of keys is exact; the union must de-duplicate
        # the overlap region across refreshes
        assert m["n_unique_texts_est"] == e["n_unique_texts"]
        assert m["n_langs_est"] == e["n_langs"]


def test_streaming_telemetry_sink(spark, docs, tmp_path):
    """Two micro-batches through the foreachBatch telemetry sink must
    leave the persisted report equal to the exact stats of everything
    ingested (counters exact, HLL exact at this cardinality)."""
    from icicle_spark.operators.reporting import sketch_estimates
    from icicle_spark.streaming import telemetry_sink

    src = str(tmp_path / "stream_src")
    report = str(tmp_path / "report.parquet")
    b1 = docs.where("doc_id < 40")
    b2 = docs.where("doc_id >= 40")
    b1.coalesce(1).write.parquet(src)
    sink = telemetry_sink(report)
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def run_available():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck_tel"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_available()
    b2.coalesce(1).write.mode("append").parquet(src)
    run_available()

    est = {r["source"]: r
           for r in sketch_estimates(spark.read.parquet(report)).collect()}
    exact = {r["source"]: r for r in corpus_stats(docs).collect()
             if r["source"] != TOTAL_LABEL}
    assert set(est) == set(exact)
    for src_name, e in exact.items():
        m = est[src_name]
        assert m["n_docs"] == e["n_docs"]
        assert m["total_chars"] == e["total_chars"]
        assert m["n_unique_texts_est"] == e["n_unique_texts"]
        assert m["n_langs_est"] == e["n_langs"]


def test_corpus_report_job(tmp_path, docs):
    inp = str(tmp_path / "docs.parquet")
    docs.write.parquet(inp)
    out = str(tmp_path / "report")
    prev = str(tmp_path / "prev.parquet")
    docs.where("doc_id < 50").withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" OLD")))
        .otherwise(F.col("text")),
    ).write.parquet(prev)
    r = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "jobs", "corpus_report.py"),
         "--input", inp, "--output", out, "--cpus", "4",
         "--diff-against", prev, "--top-tokens", "0.01"],
        capture_output=True, text=True, cwd=_ROOT, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.load(open(os.path.join(out, "report.json")))
    assert rep["total"]["n_docs"] == 60
    assert len(rep["sources"]) == 3
    assert os.path.exists(os.path.join(out, "stats.parquet"))
    assert os.path.exists(os.path.join(out, "lang_histogram.parquet"))
    # prev = ids 0..49 with every 5th body mutated -> 10 changed,
    # ids 50..59 added, none removed
    assert rep["diff"] == {"added": 10, "changed": 10, "unchanged": 40}
    # --top-tokens publishes the exact MG heavy-hitter table
    assert os.path.exists(os.path.join(out, "top_tokens.parquet"))
    assert rep["top_tokens_support"] == 0.01
    assert rep["n_top_tokens"] > 0


def test_key_skew_report(spark):
    from icicle_spark.operators.reporting import key_skew_report

    import pandas as pd
    rows = []
    for k, n in (("hot", 2500), ("warm", 900), ("a", 10), ("b", 10),
                 ("c", 5)):
        rows += [(k,)] * n
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k"]))
    rep = key_skew_report(df, "k", target_rows_per_task=1000, top_n=3)
    got = {r.k: r for r in rep.collect()}
    assert set(got) == {"hot", "warm", "a"}  # a beats b on key tiebreak
    assert got["hot"].rank == 1 and got["hot"].salt_factor == 3
    assert got["warm"].salt_factor == 1
    assert abs(got["hot"].share - 2500 / 3425) < 1e-6
    # deterministic under repartitioning
    rep2 = key_skew_report(
        df.repartition(13), "k", target_rows_per_task=1000, top_n=3
    )
    assert sorted(map(tuple, rep2.collect())) == sorted(
        map(tuple, rep.collect())
    )
    # plan shape: top-N is TakeOrderedAndProject, not a global window
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError):
        key_skew_report(df, "k", target_rows_per_task=0)
    with pytest.raises(ValueError):
        key_skew_report(df, "k", top_n=0)


def test_feature_drift_psi(spark):
    """Identical frames -> PSI ~ 0 everywhere; a shifted feature
    shows PSI mass; bins cover n_bins; fractions sum to ~1; empty
    bins smooth instead of inf; validation raises."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from icicle_spark.operators.reporting import feature_drift

    ref = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 13).cast("double").alias("y"),
    )
    same = feature_drift(ref, ref, ["x", "y"]).toPandas()
    psi = same.groupby("feature").psi_term.sum()
    assert (psi.abs() < 1e-4).all()
    frac = same.groupby("feature").ref_frac.sum()
    assert ((frac - 1.0).abs() < 1e-3).all()
    # shift x by +50: drift concentrates there
    cur = ref.select((F.col("x") + 50).alias("x"), "y")
    d = feature_drift(ref, cur, ["x", "y"]).toPandas()
    psi2 = d.groupby("feature").psi_term.sum()
    assert psi2["x"] > 0.25
    assert abs(psi2["y"]) < 1e-4
    assert d[d.feature == "x"].bin.nunique() == 10
    # a bin emptied on one side stays finite (smoothed)
    assert d.psi_term.notna().all()
    with _pt.raises(ValueError):
        feature_drift(ref, ref, [])
    with _pt.raises(ValueError):
        feature_drift(ref, ref, ["x"], n_bins=1)


def test_run_drift_job(spark, tmp_path):
    """Job entry: batch mode writes report + summary; freeze + hist
    mode replays the same report through the streaming pieces."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from icicle_spark.operators.reporting import drift_bin_counts
    from icicle_spark.streaming.drift_stream import read_drift_reference
    from jobs.run_drift import main as drift_main

    ref = spark.range(0, 1500).select(
        (F.col("id") % 89).cast("double").alias("x")
    )
    cur = spark.range(0, 1200).select(
        ((F.col("id") % 89) + 30).cast("double").alias("x")
    )
    rp, cp = str(tmp_path / "ref.parquet"), str(tmp_path / "cur.parquet")
    ref.write.parquet(rp)
    cur.write.parquet(cp)
    out = str(tmp_path / "out")
    assert drift_main(
        ["--ref", rp, "--cur", cp, "--cols", "x", "--output", out]
    ) == 0
    summary = _json.load(open(_os.path.join(out, "summary.json")))
    assert summary["verdict"]["x"] == "drifted"
    # freeze + histogram path agrees
    fz = str(tmp_path / "frozen")
    assert drift_main(
        ["--ref", rp, "--cols", "x", "--output", out, "--freeze-ref", fz]
    ) == 0
    edges, digits = read_drift_reference(fz)
    hist = str(tmp_path / "hist.parquet")
    drift_bin_counts(cur, ["x"], edges, "cur_n", digits).write.parquet(hist)
    out2 = str(tmp_path / "out2")
    assert drift_main(
        ["--ref-frozen", fz, "--hist", hist, "--output", out2]
    ) == 0
    s2 = _json.load(open(_os.path.join(out2, "summary.json")))
    assert s2["psi"]["x"] == summary["psi"]["x"]


def test_tokenizer_fertility(spark):
    """TOTAL row equals the sum of per-source rows; ratios match
    hand math; empty-token groups get null per-token ratios; one
    hash aggregate (no second scan)."""
    from pyspark.sql import functions as F

    from icicle_spark.operators.reporting import tokenizer_fertility

    df = spark.createDataFrame(
        [
            ("web", "ab cd", [1, 2]),
            ("web", "é", [5]),          # 1 char, 2 utf-8 bytes
            ("books", "xyz", [7, 8, 9]),
            ("empty", "", []),
        ],
        "source string, text string, tokens array<int>",
    )
    got = {
        r["source"]: r for r in tokenizer_fertility(df).collect()
    }
    assert got["web"]["n_tokens"] == 3
    assert got["web"]["n_chars"] == 6
    assert got["web"]["n_bytes"] == 7
    assert got["web"]["chars_per_token"] == 2.0
    assert got["books"]["tokens_per_doc"] == 3.0
    assert got["empty"]["chars_per_token"] is None
    t = got["TOTAL"]
    assert t["n_docs"] == 4 and t["n_tokens"] == 6
    assert t["n_bytes"] == 7 + 3  # web 7 + books 3 + empty 0
    plan = (
        tokenizer_fertility(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1


def test_drift_psi_empty_side_survives(spark):
    """A feature with zero total on one side reports finite PSI
    instead of dying on ANSI 0/0 (the streaming not-yet-emitted
    feature case)."""
    from icicle_spark.operators.reporting import drift_psi

    ref = spark.createDataFrame(
        [("x", 1, 10), ("x", 2, 10)], "feature string, bin int, ref_n bigint"
    )
    cur = spark.createDataFrame(
        [("x", 1, 0), ("x", 2, 0)], "feature string, bin int, cur_n bigint"
    )
    rows = drift_psi(ref, cur).collect()
    assert rows and all(r["psi_term"] is not None for r in rows)


def test_run_drift_frozen_vs_cur_and_conflicts(spark, tmp_path):
    """--ref-frozen --cur equals the batch report; --ref-frozen with
    --cols/--bins refuses instead of silently ignoring them."""
    import json as _json
    import os as _os

    import pytest as _pt
    from pyspark.sql import functions as F

    from jobs.run_drift import main as drift_main

    ref = spark.range(0, 800).select(
        (F.col("id") % 61).cast("double").alias("x")
    )
    cur = spark.range(0, 700).select(
        ((F.col("id") % 61) + 15).cast("double").alias("x")
    )
    rp, cp = str(tmp_path / "r.parquet"), str(tmp_path / "c.parquet")
    ref.write.parquet(rp)
    cur.write.parquet(cp)
    out1 = str(tmp_path / "o1")
    assert drift_main(
        ["--ref", rp, "--cur", cp, "--cols", "x", "--output", out1]
    ) == 0
    fz = str(tmp_path / "fz")
    assert drift_main(
        ["--ref", rp, "--cols", "x", "--output", out1,
         "--freeze-ref", fz]
    ) == 0
    out2 = str(tmp_path / "o2")
    assert drift_main(
        ["--ref-frozen", fz, "--cur", cp, "--output", out2]
    ) == 0
    a = _json.load(open(_os.path.join(out1, "summary.json")))
    b = _json.load(open(_os.path.join(out2, "summary.json")))
    assert a["psi"] == b["psi"]
    with _pt.raises(SystemExit, match="fixes the features"):
        drift_main(
            ["--ref-frozen", fz, "--cur", cp, "--output", out2,
             "--cols", "x"]
        )


def test_run_drift_bins_and_conflict_handling(spark, tmp_path):
    """--bins passes through in batch/freeze modes; --ref-frozen
    refuses explicit --bins OR --cols and refuses --hist+--cur."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from jobs.run_drift import main as drift_main

    ref = spark.range(0, 300).select(
        (F.col("id") % 31).cast("double").alias("x")
    )
    rp = str(tmp_path / "r.parquet")
    ref.write.parquet(rp)
    fz = str(tmp_path / "fz")
    assert drift_main(
        ["--ref", rp, "--cols", "x", "--output", str(tmp_path / "o"),
         "--freeze-ref", fz, "--bins", "20"]
    ) == 0
    import json as _json
    import os as _os

    edges = _json.load(open(_os.path.join(fz, "edges.json")))["edges"]
    assert len(edges["x"]) == 19  # 20 bins -> 19 edges
    with _pt.raises(SystemExit, match="fixes the features"):
        drift_main(["--ref-frozen", fz, "--cur", rp,
                    "--output", str(tmp_path / "o2"), "--bins", "20"])
    with _pt.raises(SystemExit, match="not both"):
        drift_main(["--ref-frozen", fz, "--cur", rp, "--hist", rp,
                    "--output", str(tmp_path / "o3")])
