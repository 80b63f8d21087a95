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


def _py_c4(text):
    lines = [l for l in text.split("\n") if l.strip()]
    kept = [l for l in lines
            if l.rstrip()[-1:] in '.!?"'
            and len(l.split()) >= 3
            and "javascript" not in l.lower()]
    clean = "\n".join(kept)
    import re
    sents = [s for s in re.split(r"[.!?]+", clean) if s.strip()]
    return (clean, len(kept), len(lines) - len(kept), len(sents),
            "lorem ipsum" not in clean.lower(), "{" not in clean)


def test_c4_clean_python_parity(spark):
    from icicle_spark.functions.text import c4_clean

    rows = [
        (1, "A good long sentence here.\nshort one\n"
            "no terminal punctuation line\n"
            "Another solid sentence stands here!\n"
            "Uses javascript for menus.\n"
            "Is this a question? Yes it is.\n"
            "The final full sentence closes things.\n"
            "And one more for good measure.\n"
            "Plus another sentence to clear five."),
        (2, "Contains a { curly brace here.\nAlso lorem ipsum text "
            "filler sentence.\nGood sentence number one stands.\n"
            "Good sentence number two stands.\nGood sentence number "
            "three stands.\nGood sentence number four stands.\nGood "
            "sentence number five stands."),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in c4_clean(df).collect()}
    for i, t in rows:
        clean, nk, nd, ns, nolorem, nobrace = _py_c4(t)
        r = got[i]
        assert r.text == clean, i
        assert r.c4_lines_kept == nk
        assert r.c4_lines_dropped == nd
        assert r.c4_n_sentences == ns
        assert r.c4_no_lorem == nolorem
        assert r.c4_no_brace == nobrace


def test_c4_badwords_gate(spark):
    from icicle_spark.functions.text import c4_clean

    df = spark.createDataFrame(
        [(1, "A perfectly clean sentence stands here."),
         (2, "A very naughtyword sentence stands here.")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.c4_no_badword
           for r in c4_clean(df, badwords=["naughtyword"]).collect()}
    assert out == {1: True, 2: False}


def test_curation_c4_preset(spark, tmp_path):
    import json
    import os

    import pandas as pd

    from jobs.run_curation import main

    good = "\n".join(
        f"This is a complete factual sentence number {i} here."
        for i in range(8))
    brace = good + "\nA stray { brace lives in this sentence."
    rows = [(1, good), (2, brace)]
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    assert main([
        "--input", src, "--output", out, "--min-words", "3",
        "--no-logprob", "--max-dup2", "1.0",
        "--min-distinct-ratio", "0.0", "--c4",
    ]) == 0
    summary = json.load(open(os.path.join(out, "summary.json")))
    assert summary["dropped_by_reason"] == {"c4_brace": 1}
    assert "c4_lines_removed" in summary
    kept = spark.read.parquet(os.path.join(out, "kept")).toPandas()
    assert list(kept.doc_id) == [1]


def test_gopher_oracle_parity_trips_every_gate(spark, tmp_path):
    """Cross-engine certification of ALL SEVEN Gopher gates: a
    crafted corpus where every fail_reason (including the
    bullet/ellipsis line gates the sf corpus never trips) occurs at
    least once, run through BOTH the Spark pipeline and the DuckDB
    oracle from the driver contract, compared with the contract
    comparator."""
    import os
    import sys

    import duckdb
    import pandas as pd

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from tools.check_contract import compare

    good = ("the history of science shows that careful reasoning "
            "about evidence and theory can be revised with new "
            "experiments over time " * 3)
    bullets = "\n".join(
        f"- bullet item number {i} listed here" for i in range(10)
    )
    ells = "\n".join(
        "many plain words appearing in this line of the report "
        "today..." for _ in range(10)
    )
    rows = [
        (1, good),                                   # passes
        (2, "short text"),                           # word count
        (3, "aa " * 60),                             # mean word len
        (4, ("solid normal writing here " * 13) + "#" * 14),  # symbol
        (5, bullets),                                # bullet lines
        (6, ells),                                   # ellipsis lines
        (7, ("1234 5678 9012 3456 " * 15)),          # alpha words
        (8, ("apple banana cherry melon grape kiwi pear plum "
             * 8)),                                  # stop words
        # CRLF document: lines end "...\r\n" — Java's default `$`
        # matches before the \r terminator while DuckDB's RE2 does
        # not, so without \r?\n splitting + (?d) the engines disagree
        (9, ells.replace("\n", "\r\n")),             # ellipsis, CRLF
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    got = entry.queries()["gopher_rules"](spark, sf_dir).toPandas()
    reasons = dict(zip(got["doc_id"], got["fail_reason"]))
    assert reasons[1] is None
    assert reasons[2] == "gopher_word_count"
    assert reasons[3] == "gopher_mean_word_len"
    assert reasons[4] == "gopher_symbol_ratio"
    assert reasons[5] == "gopher_bullet_lines"
    assert reasons[6] == "gopher_ellipsis_lines"
    assert reasons[7] == "gopher_alpha_words"
    assert reasons[8] == "gopher_stop_words"
    assert reasons[9] == "gopher_ellipsis_lines"
    con = duckdb.connect()
    con.execute(
        # Spark writes a parquet DIRECTORY; glob its part files
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    exp = con.execute(entry.oracle_sql()["gopher_rules"]).df()
    assert compare(got, exp) is None
