"""Deterministic synthetic fixtures (FIXTURES.md).

Primary input: the BASELINE.json ``input_hint`` table of pre-tokenized
training sequences

    (doc_id string, tokens array<int32>, n_tok int32, source string,
     event_time timestamp, tombstone boolean)

entity = doc_id, secondary dimension = source.  Invariants
(FIXTURES.md §4): fixed seed -> byte-identical; skewed entity
distribution (hot doc holds ~30% of rows); at least one entity with
zero facts before the snapshot, one with exactly one fact, ties on
event_time; tombstones mid-stream and as the latest fact; gaps larger
than the session gap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("tombstone", T.BooleanType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

SOURCES = ["web", "books", "code", "wiki", "forum"]
EPOCH = np.datetime64("2024-01-01T00:00:00")


def token_facts_pdf(
    n_rows: int = 5_000,
    n_docs: int = 400,
    seed: int = 42,
    hot_frac: float = 0.3,
    vocab: int = 50_000,
    max_len: int = 64,
) -> pd.DataFrame:
    """Deterministic pandas fixture; ``doc_0`` is the hot entity."""
    rng = np.random.default_rng(seed)
    n_hot = int(n_rows * hot_frac)
    doc_idx = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), rng.integers(1, n_docs, n_rows - n_hot)]
    )
    # doc_1: exactly one fact; doc_2: facts only AFTER the default
    # snapshot (zero visible facts -> empty-fold init path).
    doc_idx = doc_idx[doc_idx != 1]
    doc_idx = np.concatenate([doc_idx, [1]])
    n = len(doc_idx)
    # event times over ~200 days with deliberate multi-day gaps and
    # same-second ties
    secs = rng.integers(0, 200 * 86_400, n)
    secs[doc_idx == 2] = 199 * 86_400 + rng.integers(0, 86_400, (doc_idx == 2).sum())
    # introduce ties: every 50th row copies the previous row's time
    ties = np.arange(n) % 50 == 49
    times = EPOCH + secs.astype("timedelta64[s]")
    lens = rng.integers(1, max_len + 1, n).astype(np.int32)
    tok_flat = rng.integers(0, vocab, int(lens.sum()), dtype=np.int32)
    offs = np.concatenate([[0], np.cumsum(lens)])
    tokens = [tok_flat[offs[i]: offs[i + 1]] for i in range(n)]
    tomb = rng.random(n) < 0.02
    pdf = pd.DataFrame(
        {
            "doc_id": [f"doc_{i}" for i in doc_idx],
            "tokens": [t.tolist() for t in tokens],
            "n_tok": lens,
            "source": [SOURCES[i] for i in rng.integers(0, len(SOURCES), n)],
            "event_time": times,
            "tombstone": tomb,
        }
    )
    pdf.loc[ties, "event_time"] = pdf["event_time"].shift(1)[ties].fillna(
        pd.Timestamp(EPOCH)
    )
    pdf.loc[pdf["tombstone"], "tokens"] = None
    pdf.loc[pdf["tombstone"], "n_tok"] = None
    # guarantee a tombstone as the LAST fact of the hot doc
    hot_last = pdf.index[pdf["doc_id"] == "doc_0"][
        pdf.loc[pdf["doc_id"] == "doc_0", "event_time"].values.argmax()
    ]
    pdf.loc[hot_last, ["tombstone"]] = True
    pdf.loc[hot_last, "tokens"] = None
    pdf.loc[hot_last, "n_tok"] = None
    pdf["n_tok"] = pdf["n_tok"].astype("Int32")
    pdf["seq"] = np.arange(n, dtype=np.int64)  # ingestion-order tiebreaker
    return pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def token_facts(spark: SparkSession, partitions: int = 8, **kw) -> DataFrame:
    return spark.createDataFrame(token_facts_pdf(**kw), TOKEN_SCHEMA).repartition(
        partitions
    )


def chord_table(
    spark: SparkSession,
    doc_ids: list[str] | None = None,
    n_docs: int = 400,
    per_entity: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Per-entity labelled query times (reference ChordDescriptor,
    /root/reference/icicle-compiler/src/Icicle/Runtime/Data/IO.hs:139-152)."""
    rng = np.random.default_rng(seed)
    ids = doc_ids or [f"doc_{i}" for i in range(n_docs)]
    rows = []
    for d in ids:
        for j in range(per_entity):
            t = EPOCH + np.timedelta64(int(rng.integers(1, 210 * 86_400)), "s")
            rows.append((d, pd.Timestamp(t), f"c{j}"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "query_time", "label"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("query_time", T.TimestampType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(pdf, schema)


SNAPSHOT = "2024-07-01 00:00:00"  # ~day 182 of the fixture range
