"""Repeated-substring (span-level) dedup — Lee-et-al-2022-style
substring dedup policy: corpus-wide duplicated word n-grams are
removed everywhere except one canonical (min (doc_id, pos))
occurrence."""

import pytest
from pyspark.sql import functions as F

from icicle_spark.operators.span_dedup import (
    duplicated_span_index,
    span_occurrences,
    strip_repeated_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a copy here: the quick brown fox jumps again and again"),
            (2, "totally unique words without repetition whatsoever"),
            (3, "xy"),  # shorter than n: contributes no grams
            (4, ""),  # empty doc survives with n_words 0
        ],
        "doc_id long, text string",
    )


def test_strip_repeated_spans_hand_golden(corpus):
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.cleaned)
        for r in strip_repeated_spans(corpus, n=5, min_docs=2).collect()
    }
    # 'the quick brown fox jumps' occurs in docs 0 (pos 1) and 1
    # (pos 4): the canonical copy (min (doc_id, pos)) stays in doc 0,
    # doc 1 loses word positions 4..8.
    assert got[0] == (9, 0, "the quick brown fox jumps over the lazy dog")
    assert got[1] == (11, 5, "a copy here again and again")
    assert got[2] == (
        6,
        0,
        "totally unique words without repetition whatsoever",
    )
    assert got[3] == (1, 0, "xy")
    assert got[4] == (0, 0, "")


def test_overlapping_spans_union(spark):
    """Two overlapping duplicated grams: covered positions union —
    each doc keeps only what no removed span covers."""
    docs = spark.createDataFrame(
        [
            (0, "p q a b c d x x x"),  # 'a b c d' at 3
            (1, "a b c d y y y y y"),  # 'a b c d' at 1, 'b c d y' at 2
            (2, "m b c d y n o p q"),  # 'b c d y' at 2
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_removed, r.cleaned)
        for r in strip_repeated_spans(docs, n=4, min_docs=2).collect()
    }
    # 'a b c d' keeper = (0, 3) -> doc 1 removes 1..4.
    # 'b c d y' keeper = (1, 2); doc 1's occurrence IS the keeper but
    # positions 2..4 are already covered by the other removal — union
    # semantics keep only position 5 ('y') out of 1..5.
    assert got[0] == (0, "p q a b c d x x x")
    assert got[1] == (4, "y y y y y")
    assert got[2] == (4, "m n o p q")


def test_short_docs_emit_no_grams(corpus):
    occ = span_occurrences(corpus, n=5, key="exact")
    assert occ.filter("doc_id in (3, 4)").count() == 0
    occ_h = span_occurrences(corpus, n=5, key="hash")
    assert occ_h.filter("doc_id in (3, 4)").count() == 0


def test_hash_key_matches_exact(spark):
    """62-bit gram ids give the identical cleaned corpus (collision
    odds ~|grams|^2/2^62) on real sf0.001 documents."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = strip_repeated_spans(docs, n=5, min_docs=2, key="exact")
    b = strip_repeated_spans(docs, n=5, min_docs=2, key="hash")
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0
    assert a.filter("n_removed > 0").count() > 0  # non-trivial corpus


def test_duplicated_span_index_keeper(spark):
    docs = spark.createDataFrame(
        [(7, "a b c"), (3, "z a b c"), (5, "a b c q")],
        "doc_id long, text string",
    )
    occ = span_occurrences(docs, n=3, key="exact")
    idx = {
        r.gram: (r.n_docs, r.keeper.kid, r.keeper.kpos)
        for r in duplicated_span_index(occ, min_docs=2).collect()
    }
    assert idx["a b c"] == (3, 3, 2)  # min (doc_id, pos) = (3, 2)


def test_broadcast_index_plan(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    plan = (
        strip_repeated_spans(docs, n=5, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_incremental_matches_full_run(spark):
    """Incremental strip against a persisted span_gram_index equals
    the full run over stored+new restricted to the new docs — on
    real sf0.001 documents split 60/40 by doc_id."""
    from icicle_spark.operators.span_dedup import (
        merge_span_index,
        span_gram_index,
        strip_repeated_spans_incremental,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    stored = docs.filter("doc_id < 300")
    new = docs.filter("doc_id >= 300")
    idx = span_gram_index(stored, n=5, key="hash")
    inc = strip_repeated_spans_incremental(new, idx, n=5, key="hash")
    full = strip_repeated_spans(docs, n=5, min_docs=2, key="hash").filter(
        "doc_id >= 300"
    )
    assert inc.exceptAll(full).union(full.exceptAll(inc)).count() == 0
    assert inc.filter("n_removed > 0").count() > 0  # non-trivial
    # merged index equals the from-scratch full index
    merged = merge_span_index(idx, span_gram_index(new, n=5, key="hash"))
    scratch = span_gram_index(docs, n=5, key="hash")
    assert merged.exceptAll(scratch).union(
        scratch.exceptAll(merged)
    ).count() == 0


def test_stream_span_dedup_ingest(spark, tmp_path):
    """Streaming keep-one span removal against the self-extending
    span index: a span repeated only ACROSS batches keeps its
    canonical copy in the earlier batch, and the folded-on-read index
    equals the whole-corpus index."""
    import pandas as pd

    from icicle_spark.operators.span_dedup import span_gram_index
    from icicle_spark.streaming import span_dedup_ingest_sink

    rows1 = [
        (0, "alpha beta gamma delta unique tail one"),
        (1, "totally different words here"),
    ]
    rows2 = [
        (10, "prefix words alpha beta gamma delta end"),  # cross-batch
        (11, "shared quad span here plus eleven filler"),
        (12, "also shared quad span here again twelve"),  # intra-batch
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        pd.DataFrame(rows1, columns=["doc_id", "text"])
    ).coalesce(1).write.mode("overwrite").parquet(src)

    index = str(tmp_path / "span_index")
    out = str(tmp_path / "span_out")
    sink = span_dedup_ingest_sink(index, out, n=4)

    def run_available():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck_span"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_available()
    spark.createDataFrame(
        pd.DataFrame(rows2, columns=["doc_id", "text"])
    ).coalesce(1).write.mode("append").parquet(src)
    run_available()

    got = {
        r.doc_id: (r.n_removed, r.cleaned)
        for r in spark.read.parquet(out).collect()
    }
    assert got[0] == (0, "alpha beta gamma delta unique tail one")
    assert got[1][0] == 0
    assert got[10] == (4, "prefix words end")  # canonical copy in doc 0
    assert got[11][0] == 0  # intra-batch keeper
    assert got[12] == (4, "also again twelve")

    # folded-on-read index == whole-corpus index
    folded = (
        spark.read.parquet(index)
        .groupBy("gram")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.min("keeper").alias("keeper"),
        )
    )
    whole = span_gram_index(
        spark.createDataFrame(
            pd.DataFrame(rows1 + rows2, columns=["doc_id", "text"])
        ),
        n=4,
    )
    assert folded.exceptAll(whole).union(
        whole.exceptAll(folded)
    ).count() == 0


def test_bad_key_raises(corpus):
    with pytest.raises(ValueError):
        span_occurrences(corpus, key="fuzzy")
