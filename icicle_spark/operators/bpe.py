"""Distributed BPE tokenizer training and application.

Byte-pair-encoding merge learning over a corpus of pre-tokenized
sequences (``array<int>`` columns) — the "train a tokenizer on the
cleaned corpus" step of a pretraining data pipeline. Reference
semantics are the classic BPE trainer (Sennrich et al. 2016; the
HuggingFace ``BpeTrainer`` contract): repeatedly take the most
frequent adjacent token pair and replace every non-overlapping
occurrence (greedy leftmost) with a fresh token id.

Scale design (the 100 TB shape):

* ``pair_counts`` is ONE scan + ONE shuffle: adjacent pairs come from
  a JVM ``zip_with`` over two array slices (whole-stage codegen, no
  Python, no second explode), counted with map-side partial
  aggregation.
* The trainer's per-iteration argmax moves exactly ONE row to the
  driver (control flow, not data).
* Each merge is applied corpus-wide by an Arrow-batched
  ``mapInPandas`` that works on the FLATTENED batch (one numpy pass
  over a separator-delimited flat array — no per-row Python loop).
* The industrial pattern for huge corpora is baked in: pass
  ``sample_fraction`` to learn merges on a deterministic xxhash64
  sample (same rows at any parallelism — `sampling.py`), then
  ``bpe_apply`` the learned table to the full corpus in one pass.
  Training cost then scales with the sample, application with the
  corpus.
* The iterative working set is cached and its lineage truncated with
  ``localCheckpoint`` every ``checkpoint_every`` merges, so plan depth
  stays bounded at large merge counts.

Greedy-leftmost overlap semantics are exact, including the ``a == b``
run case (``aaa`` + merge ``(a,a)`` -> ``(aa, a)``): within each run
of consecutive candidates only even offsets merge (see
``_greedy_keep``), which is precisely the left-to-right scan's
behaviour and is fully vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def adjacent_pairs(tokens) -> Column:
    """``array<struct<a,b>>`` of adjacent token pairs — JVM
    ``zip_with`` over two slices, stays in whole-stage codegen."""
    t = _c(tokens)
    n = F.greatest(F.size(t) - 1, F.lit(0))  # 0 for empty/singleton
    head = F.slice(t, 1, n)
    tail = F.slice(t, 2, n)
    return F.zip_with(
        head, tail, lambda x, y: F.struct(x.alias("a"), y.alias("b"))
    )


def pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Corpus-wide adjacent-pair frequency ``(a, b, cnt)``.

    ONE scan, ONE shuffle (explode feeds a hash aggregate with
    map-side partial counts). This is the inner statistic of BPE
    training and is also useful standalone (bigram statistics)."""
    pr = explode_bag(adjacent_pairs(tokens_col)).alias("pr")
    return (
        df.select(pr)
        .select(
            F.col("pr.a").cast("bigint").alias("a"),
            F.col("pr.b").cast("bigint").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_pair(
    df: DataFrame, tokens_col: str = "tokens", distinct_only: bool = False
):
    """The single most frequent adjacent pair, deterministic
    tie-break (cnt desc, a asc, b asc). Returns ``(a, b, cnt)`` or
    ``None`` on an empty/singleton corpus. ``distinct_only`` restricts
    to pairs with ``a != b`` (used by the SQL-oracled contract query,
    where greedy-overlap runs are not SQL-expressible)."""
    pc = pair_counts(df, tokens_col)
    if distinct_only:
        pc = pc.where(F.col("a") != F.col("b"))
    rows = (
        pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
    )
    if not rows:
        return None
    r = rows[0]
    return int(r["a"]), int(r["b"]), int(r["cnt"])


def _greedy_keep(idx):
    """Greedy-leftmost overlap resolution over candidate positions
    ``idx`` (sorted). Candidates can only overlap when they are
    consecutive (which requires ``a == b``); within each run of
    consecutive positions the left-to-right scan merges even offsets
    only. Fully vectorized (run-id via cumsum)."""
    import numpy as np

    if idx.size == 0:
        return idx
    is_start = np.empty(idx.size, dtype=bool)
    is_start[0] = True
    np.not_equal(np.diff(idx), 1, out=is_start[1:])
    run_id = np.cumsum(is_start) - 1
    first = idx[is_start][run_id]
    return idx[((idx - first) & 1) == 0]


def _apply_merges_flat(flat, merges):
    """Apply ``merges`` (rank-ordered ``(a, b, new_id)``) to a
    separator-delimited flat int64 array. Separator positions carry a
    sentinel strictly smaller than every token/merge id so no pair
    ever matches across a sequence boundary. Returns the new flat
    array (separators preserved)."""
    import numpy as np

    for a, b, new_id in merges:
        if flat.size < 2:
            break
        cand = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b))
        keep = _greedy_keep(cand)
        if keep.size == 0:
            continue
        flat[keep] = new_id
        mask = np.ones(flat.size, dtype=bool)
        mask[keep + 1] = False
        flat = flat[mask]
    return flat


def bpe_apply(
    df: DataFrame,
    merges,
    tokens_col: str = "tokens",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a rank-ordered merge table to every sequence.

    ``merges`` is a DataFrame with columns ``(rank, a, b, new_id)`` or
    an already-ordered list of ``(a, b, new_id)`` triples. The table
    is collected (bounded — it IS the learned vocabulary delta) and
    shipped as a broadcast; application is a single corpus scan whose
    per-batch work is ``n_merges`` vectorized numpy passes over the
    flattened batch. Other columns pass through; ``out_col`` is
    ``array<bigint>``."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").select("a", "b", "new_id").collect()
        mlist = [(int(r["a"]), int(r["b"]), int(r["new_id"])) for r in rows]
    else:
        mlist = [(int(a), int(b), int(n)) for a, b, n in merges]
    bc = df.sparkSession.sparkContext.broadcast(mlist)
    out_schema = (
        df.schema.simpleString()[7:-1] + f",{out_col}:array<bigint>"
    )

    def _apply(batches):
        import numpy as np

        ms = bc.value
        lo_merge = min((min(a, b) for a, b, _ in ms), default=0)
        for pdf in batches:
            toks = pdf[tokens_col]
            arrs = [np.asarray(t, dtype=np.int64) for t in toks]
            out = pdf.copy()
            if not arrs or not ms:
                out[out_col] = [a.tolist() for a in arrs]
                yield out
                continue
            lo = min((int(a.min()) for a in arrs if a.size), default=0)
            sep = min(lo, lo_merge) - 1
            # interleave separators: [s0, sep, s1, sep, ..., s_last]
            pieces = []
            for a in arrs:
                pieces.append(a)
                pieces.append(np.array([sep], dtype=np.int64))
            flat = np.concatenate(pieces[:-1]) if pieces else np.empty(
                0, dtype=np.int64
            )
            flat = _apply_merges_flat(flat, ms)
            cuts = np.flatnonzero(flat == sep)
            segs = np.split(flat, cuts)
            # every segment after the first starts with the separator
            merged = [segs[0].tolist()] + [s[1:].tolist() for s in segs[1:]]
            assert len(merged) == len(arrs)
            out[out_col] = merged
            yield out

    return df.mapInPandas(_apply, schema=out_schema)


def bpe_train(
    df: DataFrame,
    tokens_col: str = "tokens",
    n_merges: int = 16,
    min_count: int = 2,
    new_id_start: int | None = None,
    sample_fraction: float | None = None,
    sample_key: str | None = None,
    seed: int = 0,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a merge-table DataFrame
    ``(rank, a, b, new_id, count)`` in learned order.

    Per iteration: one pair-count pass (scan + shuffle) over the
    current working set, a ONE-ROW argmax collect (control flow), and
    one flat-numpy merge application. Stops early when the best pair's
    corpus count drops below ``min_count`` (a merge seen once cannot
    compress). ``sample_fraction``/``sample_key`` train on a
    deterministic hash-gated sample (see module docstring) — the
    returned table is then applied to the full corpus with
    ``bpe_apply``. Fresh ids start at ``new_id_start`` (default:
    corpus max + 1, computed in one aggregate)."""
    spark = df.sparkSession
    work = df.select(_c(tokens_col).alias("tokens"))
    if sample_fraction is not None:
        if sample_key is None:
            raise ValueError("sample_fraction requires sample_key")
        from icicle_spark.operators.sampling import deterministic_sample

        work = df.select(
            _c(sample_key).alias("__k"), _c(tokens_col).alias("tokens")
        )
        work = deterministic_sample(work, sample_fraction, "__k", seed=seed)
        work = work.select("tokens")
    if new_id_start is None:
        mx = work.agg(
            F.max(F.array_max(F.col("tokens"))).alias("m")
        ).collect()[0]["m"]
        new_id_start = (int(mx) if mx is not None else 0) + 1
    work = work.persist()
    merges: list[tuple] = []
    try:
        for rank in range(n_merges):
            best = top_pair(work, "tokens")
            if best is None or best[2] < min_count:
                break
            a, b, cnt = best
            new_id = new_id_start + rank
            merges.append((rank, a, b, new_id, cnt))
            nxt = bpe_apply(
                work, [(a, b, new_id)], "tokens", out_col="__m"
            ).select(F.col("__m").alias("tokens"))
            if (rank + 1) % checkpoint_every == 0:
                # truncate lineage so plan depth stays bounded
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
            work.unpersist()
            work = nxt
    finally:
        work.unpersist()
    return spark.createDataFrame(
        merges, schema="rank int, a bigint, b bigint, new_id bigint, count bigint"
    )
