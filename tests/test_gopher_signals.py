"""Gopher quality signals: python parity on crafted docs, rule gates,
curation-job preset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icicle_spark.functions.text import (
    GOPHER_RULES,
    gopher_signals,
    quality_filter,
)


@pytest.fixture(scope="module")
def docs(spark):
    good = ("the history of science shows that careful reasoning "
            "about evidence and theory can be revised with new "
            "experiments over time " * 3)
    rows = [
        (1, good),
        (2, "short text"),                       # word count
        (3, "## ## ## " + "# " * 60),            # symbol ratio (+ alpha)
        (4, "\n".join(f"- bullet item {i} listed here" for i in range(10))
            + "\n" + " ".join(["the of and to be that have with"] * 8)),
        (5, "\n".join(f"line {i} trails off..." for i in range(10))
            + "\n" + " ".join(["the of and to be that have with"] * 8)),
        (6, " ".join(["12345 67890 !!! ???"] * 20)),   # alpha words
        (7, " ".join(["zorp quux blarg wibble"] * 15)),  # stop words
        (8, ""),                                  # empty
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_signals_python_parity(docs):
    rows = {r.doc_id: r for r in gopher_signals(docs).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for i, t in texts.items():
        ws = t.split()
        r = rows[i]
        assert r.n_ws_words == len(ws)
        mean = sum(len(w) for w in ws) / len(ws) if ws else 0.0
        assert r.mean_word_len == pytest.approx(mean)
        if ws:
            sym = (t.count("#") + t.count("...") + t.count("…")) / len(ws)
            assert r.symbol_word_ratio == pytest.approx(sym)
            alpha = sum(any(c.isascii() and c.isalpha() for c in w)
                        for w in ws) / len(ws)
            assert r.alpha_word_frac == pytest.approx(alpha)
        lines = [l for l in t.split("\n") if l.strip()]
        if lines:
            b = sum(l.lstrip().startswith(("•", "‣",
                                           "▶", "*", "-"))
                    for l in lines) / len(lines)
            e = sum(l.rstrip().endswith(("...", "…"))
                    for l in lines) / len(lines)
            assert r.bullet_line_frac == pytest.approx(b)
            assert r.ellipsis_line_frac == pytest.approx(e)
        stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert r.stop_hits == len(stops & {w.lower() for w in ws})


def test_rule_gates(docs):
    out = quality_filter(gopher_signals(docs), GOPHER_RULES)
    reason = {r.doc_id: r.fail_reason for r in out.collect()}
    assert reason[1] is None
    assert reason[2] == "gopher_word_count"
    # doc 3: 63 one/two-char '#' words — mean length gate fires
    # before the symbol-ratio gate in rule order
    assert reason[3] == "gopher_mean_word_len"
    assert reason[4] == "gopher_bullet_lines"
    assert reason[5] == "gopher_ellipsis_lines"
    assert reason[6] == "gopher_alpha_words"
    assert reason[7] == "gopher_stop_words"
    assert reason[8] == "gopher_word_count"


def test_curation_gopher_preset(spark, tmp_path):
    import json
    import os

    import pandas as pd

    from jobs.run_curation import main

    good = ("the history of science shows that careful reasoning "
            "about evidence and theory can be revised with new "
            "experiments over time " * 3)
    rows = [(1, good), (2, " ".join(["zorp quux blarg wibble"] * 15))]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0", "--gopher",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["dropped_by_reason"] == {"gopher_stop_words": 1}
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert list(kept.doc_id) == [1]
    assert "stop_hits" in kept.columns
