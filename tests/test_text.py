"""Repetition / boilerplate statistics (Gopher-style quality
signals): hand-computed goldens + the batch/scalar parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.functions.text import (
    distinct_word_ratio,
    dup_ngram_frac,
    repetition_stats,
    top_ngram_share,
)

DOCS = {
    1: "a b c d e f",
    2: "a b a b a b",
    3: "lorem ipsum dolor sit amet lorem ipsum dolor",
    4: "x",
}

# (dup2, top2, dup3, top3, dwr) by hand:
# doc2 2-grams: ab,ba,ab,ba,ab -> 5 positions all duplicated, mode 3/5
# doc3 2-grams: 7 positions, 4 duplicated, mode 2/7; 3-grams: 6, 2 dup
EXPECTED = {
    1: (0.0, 1 / 5, 0.0, 1 / 4, 1.0),
    2: (1.0, 3 / 5, 1.0, 2 / 4, 2 / 6),
    3: (4 / 7, 2 / 7, 2 / 6, 2 / 6, 5 / 8),
    4: (0.0, 1.0, 0.0, 1.0, 1.0),
}


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {"doc_id": list(DOCS), "text": list(DOCS.values())}
    )
    return spark.createDataFrame(pdf).cache()


def test_repetition_stats_hand_goldens(docs):
    out = repetition_stats(docs).toPandas().set_index("doc_id")
    for i, (d2, t2, d3, t3, dwr) in EXPECTED.items():
        assert out.loc[i, "dup2_frac"] == pytest.approx(d2), i
        assert out.loc[i, "top2_share"] == pytest.approx(t2), i
        assert out.loc[i, "dup3_frac"] == pytest.approx(d3), i
        assert out.loc[i, "top3_share"] == pytest.approx(t3), i
        assert out.loc[i, "distinct_word_ratio"] == pytest.approx(dwr), i


def test_scalar_forms_match_batch(docs):
    out = docs.select(
        "doc_id",
        dup_ngram_frac(F.col("text"), 2).alias("d2"),
        top_ngram_share(F.col("text"), 2).alias("t2"),
        distinct_word_ratio(F.col("text")).alias("dwr"),
    ).toPandas().set_index("doc_id")
    for i, (d2, t2, _, _, dwr) in EXPECTED.items():
        assert out.loc[i, "d2"] == pytest.approx(d2)
        assert out.loc[i, "t2"] == pytest.approx(t2)
        assert out.loc[i, "dwr"] == pytest.approx(dwr)


def test_empty_text_is_safe(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [""]}))
    row = repetition_stats(df).collect()[0]
    # empty text: one empty whole-text gram; ratio is null
    assert row["dup2_frac"] == 0.0 and row["top2_share"] == 1.0
    assert row["distinct_word_ratio"] is None


def test_doc_logprob_hand_golden(spark):
    import math

    from icicle_spark.functions.text import doc_logprob, word_freq

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a a b", "b c"]})
    )
    freq = word_freq(docs)
    assert {
        r.word: r.cnt for r in freq.collect()
    } == {"a": 2, "b": 2, "c": 1}
    out = (
        doc_logprob(docs, freq).toPandas().set_index("doc_id").sort_index()
    )
    # N=5, V=3, denom=8: a,b -> (2+1)/8, c -> (1+1)/8
    assert out.loc[1, "n_words"] == 3
    assert out.loc[1, "logprob"] == pytest.approx(math.log(3 / 8))
    assert out.loc[2, "logprob"] == pytest.approx(
        (math.log(3 / 8) + math.log(2 / 8)) / 2
    )


def test_tfidf_top_terms(spark):
    import math

    from icicle_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "cat cat dog",      # cat distinctive (df=1, tf=2)
                    "dog bird",         # dog is everywhere (df=3)
                    "dog fish fish",
                ],
            }
        )
    )
    out = tfidf_top_terms(docs, top_k=2).toPandas()
    by_doc = {
        d: list(g.sort_values("rank")[["word", "tf"]].itertuples(index=False, name=None))
        for d, g in out.groupby("doc_id")
    }
    # df: cat 1, dog 3, bird 1, fish 1; N=3 => idf(dog)=ln(1)=0
    assert by_doc[1] == [("cat", 2), ("dog", 1)]
    assert by_doc[2] == [("bird", 1), ("dog", 1)]
    assert by_doc[3] == [("fish", 2), ("dog", 1)]
    s = out.set_index(["doc_id", "word"]).score
    assert s.loc[(1, "cat")] == pytest.approx(2 * math.log(3))
    assert s.loc[(1, "dog")] == pytest.approx(0.0)
    # rank ties (score 0 for dog everywhere) break by word asc
    plan = tfidf_top_terms(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # df/N join back broadcast


def test_html_strip(spark):
    from icicle_spark.functions.text import html_strip

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "i": [0, 1, 2, 3],
                "h": [
                    '<html><head><style>p{c:red}</style>'
                    '<script>var x=1<2;</script></head><body>'
                    '<!-- secret -->'
                    "<p>Hello &amp;amp; <b>world</b></p>\n"
                    '<div>a&nbsp;&lt;tag&gt; &quot;q&#39;s&quot;</div>'
                    "</body></html>",
                    "plain text no markup",
                    "<p>multi\n\n  space</p>",
                    "",
                ],
            }
        )
    )
    got = [r.t for r in docs.select(html_strip("h").alias("t"))
           .orderBy("i").collect()]
    assert got == [
        # &amp;amp; decodes ONCE (amp last); script/style/comment
        # bodies vanish wholesale, tags collapse to single spaces
        'Hello &amp; world a <tag> "q\'s"',
        "plain text no markup",
        "multi space",
        "",
    ]


def test_normalize_unicode_forms(spark):
    import unicodedata

    from icicle_spark.functions.text import normalize_unicode

    rows = [
        (0, "café"),          # decomposed acute
        (1, "café"),           # precomposed
        (2, "ﬁle Ａ"),     # fi ligature + fullwidth A (NFKC)
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "i int, t string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r.i: r.n
            for r in docs.select(
                "i", normalize_unicode("t", form).alias("n")
            ).collect()
        }
        for i, t in rows:
            want = None if t is None else unicodedata.normalize(form, t)
            assert got[i] == want, (form, i)
    # NFC joins combining marks; NFKC also folds compatibility forms
    nfc = {
        r.i: r.n
        for r in docs.select("i", normalize_unicode("t", "NFC").alias("n"))
        .collect()
    }
    assert nfc[0] == nfc[1] == "café"
    nfkc = {
        r.i: r.n
        for r in docs.select("i", normalize_unicode("t", "NFKC").alias("n"))
        .collect()
    }
    assert nfkc[2] == "file A"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_unicode("t", "NFX")


def test_bigram_logprob_hand_computed(spark):
    """doc_logprob2 vs a hand-computed Laplace bigram conditional on
    a 3-doc corpus (V counted over the unigram vocabulary)."""
    import math

    from icicle_spark.functions.text import (
        bigram_freq,
        doc_logprob2,
        word_freq,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "dog"),  # single word: no pairs, absent from output
        ],
        "doc_id long, text string",
    )
    uni = word_freq(docs)
    bi = bigram_freq(docs)

    # corpus: unigrams {the:2, cat:2, sat:1, ran:1, dog:1} -> V=5
    # bigrams {the cat:2, cat sat:1, cat ran:1}
    got = {
        r.doc_id: (r.n_pairs, r.logprob2)
        for r in doc_logprob2(docs, uni, bi).collect()
    }
    v = 5.0
    lp_the_cat = math.log((2 + 1) / (2 + v))
    lp_cat_sat = math.log((1 + 1) / (2 + v))
    want0 = (lp_the_cat + lp_cat_sat) / 2
    assert got[0][0] == 2 and abs(got[0][1] - want0) < 1e-12
    assert got[1][0] == 2 and abs(got[1][1] - want0) < 1e-12  # symmetric
    assert 2 not in got  # no pairs -> undefined, row absent

    # fluent vs shuffled: same unigram profile, different bigram score
    counts2 = {(r.w1, r.w2): r.cnt2 for r in bi.collect()}
    assert counts2[("the", "cat")] == 2


def test_bigram_freq_one_shuffle_plan(spark):
    """bigram_freq keeps the vocabulary-statistics shape: a single
    hash-aggregate exchange over exploded pairs (map-side combine)."""
    from icicle_spark.functions.text import bigram_freq

    docs = spark.createDataFrame(
        [(0, "a b c a b")], "doc_id long, text string"
    )
    plan = bigram_freq(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_compression_ratio_zlib_parity(spark):
    import zlib

    from icicle_spark.functions.text import compression_ratio

    rows = [
        (1, "spam ham eggs " * 150),
        (2, "k9#pQ!zR@7vX$eW2&mN*bT5^cY8(jU3)"),
        (3, ""),
        (4, None),
        (5, "ünïcödé ünïcödé ünïcödé"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df).collect()
    }
    for i, t in rows:
        if not t:
            assert got[i] is None
            continue
        raw = t.encode("utf-8")
        assert abs(got[i] - len(zlib.compress(raw, 6)) / len(raw)) < 1e-12
    # the repetitive doc compresses an order of magnitude below the
    # high-entropy one
    assert got[1] < 0.1 < got[2]


def test_pii_report_sequential_masking(spark):
    """Counts agree with redaction's masking regime: digits inside an
    email are the email, never also a phone; TOTAL rows add up."""
    from icicle_spark.functions.text import pii_report

    df = spark.createDataFrame(
        [
            (1, "mail 5551234567x@b.com and c@d.org", "web"),
            (2, "ip 10.0.0.1 then ssn 123-45-6789", "books"),
            (3, "call +1 (555) 123-4567 now", "web"),
            (4, "clean", "books"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {
        (r["kind"], r["source"]): (r["n_matches"], r["n_docs_affected"])
        for r in pii_report(df).collect()
    }
    assert got[("email", "web")] == (2, 1)
    # the digit run inside doc 1's email must NOT count as a phone
    assert got[("phone", "web")] == (1, 1)
    assert got[("ip", "books")] == (1, 1)
    assert got[("ssn", "books")] == (1, 1)
    for kind in ("email", "ip", "ssn", "phone"):
        per = [v for (k, g), v in got.items()
               if k == kind and g != "TOTAL"]
        assert got[(kind, "TOTAL")] == (
            sum(m for m, _ in per), sum(d for _, d in per)
        )
