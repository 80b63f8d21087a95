"""Deterministic large-scale bench input generator.

Builds the BASELINE.json input_hint table shape —
(doc_id string, tokens array<int32>, n_tok int32, source string,
event_time timestamp, seq bigint) — at millions of rows with a
Zipf-skewed entity distribution, straight through numpy -> pyarrow
(no Spark, no Python loops), cached as parquet under
``.benchdata/`` (gitignored).

Same seed => byte-identical file. No external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "books", "code", "wiki", "forum"])
EPOCH_S = 1_704_067_200  # 2024-01-01T00:00:00Z


def generate(
    n_rows: int = 8_000_000,
    n_docs: int = 400_000,
    seed: int = 42,
    max_tok: int = 8,
    days: int = 200,
    zipf_a: float = 1.2,
    out_dir: str = ".benchdata",
) -> str:
    """Generate (or reuse cached) bench parquet; returns the path."""
    path = os.path.join(out_dir, f"tokenfacts_r{n_rows}_d{n_docs}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # Zipf-skewed entity ids (clipped): hot entities get a large share
    doc_idx = (rng.zipf(zipf_a, n_rows) - 1) % n_docs
    secs = rng.integers(0, days * 86_400, n_rows, dtype=np.int64)
    lens = rng.integers(1, max_tok + 1, n_rows).astype(np.int32)
    flat = rng.integers(0, 50_000, int(lens.sum()), dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    tokens = pa.LargeListArray.from_arrays(offsets, pa.array(flat))
    doc_ids = np.char.add("doc_", doc_idx.astype("U7"))
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "tokens": tokens,
            "n_tok": pa.array(lens),
            "source": pa.array(SOURCES[rng.integers(0, len(SOURCES), n_rows)]),
            "event_time": pa.array(
                (EPOCH_S + secs) * 1_000_000, type=pa.timestamp("us")
            ),
            "seq": pa.array(np.arange(n_rows, dtype=np.int64)),
        }
    )
    pq.write_table(tbl, path, row_group_size=1_048_576, compression="snappy")
    return path
