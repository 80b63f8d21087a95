"""Token-sequence operators over ``tokens: array<int>`` columns.

The engine's north-rule input is an Iceberg table of pre-tokenized
training sequences (doc_id, tokens array<int32>, n_tok, source). These
operators work directly on the token arrays — all JVM higher-order
functions (whole-stage codegen), no Python in the hot path:

* per-sequence: n-gram ids (rolling polynomial over token ids),
  histograms, contiguous-subsequence counts
* corpus-level: token frequency (ONE explode + groupBy shuffle with
  map-side combine — the 100 TB shape for vocabulary statistics)

``char_token_ids`` is a deterministic text->ids stand-in tokenizer
used by tests/oracles (portable to DuckDB for cross-engine checks);
real pipelines bring their own tokenizer output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from icicle_spark.operators.dedup import explode_bag

# same modulus as the dedup shingle hashing: keeps a*x+b in int64
_MERSENNE = (1 << 31) - 1


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def char_token_ids(text_col) -> Column:
    """Deterministic fake tokenizer: one id per whitespace word,
    ``ascii(first_char) * 32 + min(length, 31)``. Exists so token-array
    tests and DuckDB oracles can derive identical ids from text in
    both engines — NOT a real tokenizer."""
    words = F.filter(F.split(_c(text_col), " "), lambda w: w != "")
    return F.transform(
        words,
        lambda w: (
            F.ascii(F.substring(w, 1, 1)) * 32 + F.least(F.length(w), F.lit(31))
        ).cast("long"),
    )


def codepoint_token_ids(text_col) -> Column:
    """Character-level base tokenization: one Unicode codepoint id per
    character (the byte/char-level base vocabulary a BPE trainer
    merges upward from). Pure JVM — split-to-chars + ascii() per char
    (Spark's ascii returns the full codepoint of the first character)
    — stays in whole-stage codegen, no Python."""
    chars = F.filter(F.split(_c(text_col), ""), lambda c: c != "")
    return F.transform(chars, lambda c: F.ascii(c).cast("long"))


def utf8_byte_tokens(df, text_col: str = "text", out_col: str = "tokens"):
    """UTF-8 BYTE-level base tokenization (GPT-2-style byte BPE base
    vocabulary, ids 0-255): Arrow-batched ``mapInPandas``; per row one
    ``np.frombuffer`` over the encoded bytes (C-speed per token, no
    per-token Python). Adds ``out_col: array<bigint>``."""

    from pyspark.sql.types import ArrayType, LongType, StructType

    # copy before add(): StructType.add mutates in place and
    # df.schema is cached on the DataFrame
    out_schema = StructType(list(df.schema.fields)).add(
        out_col, ArrayType(LongType())
    )

    def _enc(batches):
        import numpy as np

        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [
                np.frombuffer(
                    (t or "").encode("utf-8"), dtype=np.uint8
                ).astype(np.int64).tolist()
                for t in pdf[text_col]
            ]
            yield out

    return df.mapInPandas(_enc, schema=out_schema)


def token_ngram_ids(tokens, n: int) -> Column:
    """Rolling polynomial id per contiguous token n-gram
    (id = ((t0*131 + t1)*131 + ...) mod 2^31-1): zip_with over n
    shifted slices, O(len) integer ops, no string materialization —
    same construction as dedup.shingle_hashes but over token ids."""
    t = _c(tokens)
    k = F.greatest(F.size(t) - (n - 1), F.lit(0))
    acc = F.transform(F.slice(t, 1, k), lambda x: F.pmod(x, F.lit(_MERSENNE)))
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(t, 1 + j, k),
            lambda a, b: F.pmod(a * F.lit(131) + b, F.lit(_MERSENNE)),
        )
    return acc


def token_histogram(tokens) -> Column:
    """Per-sequence token -> count map, key-sorted (Data.Map order,
    matching the engine's map semantics elsewhere). Sort +
    run-length: O(n log n) per sequence instead of the naive
    O(distinct x len) rescan-per-key — run starts are the positions
    where the sorted array changes, counts are gaps between
    consecutive starts."""
    t = _c(tokens)

    # Bind intermediates as lambda VARIABLES (transform over a
    # one-element array): inline HOF subtrees re-evaluate per
    # reference, so an unbound array_sort would re-sort per element —
    # measured catastrophic. Bound, each stage evaluates once.
    def _bind(expr, fn):
        return F.get(F.transform(F.array(expr), fn), 0)

    def from_sorted(sv):
        n = F.size(sv)
        # 1-based positions opening a run of equal values
        starts_expr = F.filter(
            F.transform(
                sv,
                lambda x, i: F.when(
                    (i == 0) | (x != F.get(sv, i - 1)), i + 1
                ),
            ),
            lambda p: p.isNotNull(),
        )

        def with_starts(st):
            ends = F.concat(
                F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                F.array(n + 1),
            )
            entries = F.zip_with(
                st,
                ends,
                lambda a, b: F.struct(
                    F.get(sv, a - 1).alias("key"),
                    (b - a).cast("long").alias("value"),
                ),
            )
            # empty-input guard with the SAME map type: zero-length
            # slice of the entries array (zip_with would otherwise
            # pad a null key)
            empty = F.map_from_entries(F.slice(entries, 1, 0))
            return F.when(n > 0, F.map_from_entries(entries)).otherwise(
                empty
            )

        return _bind(starts_expr, with_starts)

    return _bind(F.array_sort(t), from_sorted)


def subseq_count(tokens, pattern: list[int]) -> Column:
    """Occurrences of a contiguous token pattern in the sequence
    (possibly overlapping). EXACT: the rolling n-gram id is a cheap
    O(len) prefilter; each id-matched position is then verified by
    token-slice equality, so hash collisions cannot inflate the
    count (they only cost one extra n-token compare each,
    ~len/2^31 expected per sequence)."""
    n = len(pattern)
    if n == 0:
        raise ValueError("pattern must be non-empty")
    pid = 0
    for x in pattern:
        pid = (pid * 131 + x) % _MERSENNE
    t = _c(tokens)
    pat = F.array(*[F.lit(int(x)) for x in pattern])
    grams = token_ngram_ids(tokens, n)
    # 1-based start positions whose gram id matches the pattern id
    starts = F.filter(
        F.transform(
            grams,
            lambda g, i: F.when(g == F.lit(pid), i + 1),
        ),
        lambda p: p.isNotNull(),
    )
    return F.size(
        F.filter(starts, lambda p: F.slice(t, p, n) == pat)
    ).cast("long")


def remap_tokens(
    df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    token_col: str = "token",
    new_id_col: str = "new_id",
    unk: int = 0,
    strategy: str = "auto",
    map_threshold: int = 4096,
) -> DataFrame:
    """Re-tokenize ``tokens_col`` through a vocabulary table
    (``token -> new_id``): out-of-vocabulary ids become ``unk`` and
    are counted into ``n_oov`` / ``oov_rate``. Both strategies keep
    the corpus side SHUFFLE-FREE — only how the lookup ships differs:

    * ``'map'`` — vocab collapses to ONE literal map row
      (``map_from_entries``), broadcast-cross-joined; the corpus side
      is a narrow JVM ``transform`` in whole-stage codegen, no
      Python. BUT Spark's map access is a LINEAR SCAN per key, so
      this is right only for small vocabularies.
    * ``'pandas'`` — vocab collects to a plain dict (bounded: it IS
      the vocabulary) shipped as a Spark broadcast; an Arrow-batched
      ``mapInPandas`` does one vectorized hash lookup over the
      flattened batch — O(1) per token, the 1e5-1e6-entry BPE-vocab
      scale path.

    ``'auto'`` counts the vocab (tiny aggregate) and picks map below
    ``map_threshold`` entries, pandas above.

    Adds ``remapped`` (same element order), ``n_oov`` and ``oov_rate``
    columns; other input columns pass through.
    """
    if strategy == "auto":
        strategy = (
            "map" if vocab.count() <= map_threshold else "pandas"
        )
    if strategy == "map":
        one = vocab.groupBy().agg(
            F.map_from_entries(
                F.collect_list(F.struct(_c(token_col), _c(new_id_col)))
            ).alias("__vmap")
        )
        t = _c(tokens_col)
        out = df.crossJoin(F.broadcast(one))
        lookup = lambda x: F.element_at(F.col("__vmap"), x)  # noqa: E731
        n = F.size(t)
        n_oov = F.size(F.filter(t, lambda x: lookup(x).isNull()))
        return out.select(
            *[c for c in df.columns],
            F.transform(t, lambda x: F.coalesce(lookup(x), F.lit(unk))).alias(
                "remapped"
            ),
            n_oov.cast("bigint").alias("n_oov"),
            F.when(n > 0, n_oov / n).otherwise(F.lit(0.0)).alias("oov_rate"),
        )
    if strategy != "pandas":
        raise ValueError(f"unknown remap strategy: {strategy!r}")

    lut = {
        r[0]: r[1] for r in vocab.select(_c(token_col), _c(new_id_col)).collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(lut)
    elem_ty = df.schema[tokens_col].dataType.elementType.simpleString()
    out_schema = (
        df.schema.simpleString()[7:-1]  # strip struct< >
        + f",remapped:array<{elem_ty}>,n_oov:bigint,oov_rate:double"
    )
    unk_val = unk

    def _remap(batches):
        import numpy as np
        import pandas as pd

        d = bc.value
        for pdf in batches:
            toks = pdf[tokens_col]
            lens = np.fromiter((len(a) for a in toks), dtype=np.int64, count=len(toks))
            total = int(lens.sum())
            if total:
                flat = np.concatenate([np.asarray(a) for a in toks])
                mapped = pd.Series(flat).map(d)
                oov = mapped.isna().to_numpy()
                # fillna leaves float64 when NaNs were present — cast
                # back so Arrow gets integral values for the int array
                vals = mapped.fillna(unk_val).to_numpy().astype(np.int64)
            else:
                oov = np.zeros(0, dtype=bool)
                vals = np.zeros(0, dtype=np.int64)
            cuts = np.cumsum(lens)[:-1]
            out = pdf.copy()
            out["remapped"] = [seg.tolist() for seg in np.split(vals, cuts)]
            n_oov = np.array(
                [int(seg.sum()) for seg in np.split(oov, cuts)], dtype=np.int64
            )
            out["n_oov"] = n_oov
            out["oov_rate"] = np.where(lens > 0, n_oov / np.maximum(lens, 1), 0.0)
            yield out

    return df.mapInPandas(_remap, schema=out_schema)


def corpus_token_freq(
    df: DataFrame, tokens_col: str = "tokens", k: int | None = None
) -> DataFrame:
    """Corpus-level token frequency: ONE shuffle (explode + groupBy
    with map-side partial counts). Deterministic ordering
    (freq desc, token asc) when ``k`` is set."""
    freq = (
        df.select(explode_bag(_c(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if k is not None:
        freq = freq.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    return freq


def mg_candidates(
    df: DataFrame, tokens_col: str = "tokens", k: int = 1000
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries (bounded
    state: ``k`` counters), batch-merged with the mergeable-summaries
    decrement (Agarwal et al., "Mergeable Summaries", PODS 2012).

    Returns ``(token, weight, n_tokens)`` rows: each partition's
    surviving counter keys with their residual weights, plus the
    partition's total token count carried on every row (summed once
    per partition downstream via ``first``/grouping). Guarantee: any
    token whose GLOBAL relative frequency is ``>= 1/(k+1)`` survives
    in AT LEAST one partition's summary — ``max_p f_p/N_p >= f/N``
    (the weighted-average bound), and per-partition MG keeps every
    key with local relative frequency ``> 1/(k+1)``. So the union of
    per-partition keys is a SUPERSET of the true heavy hitters; it
    never misses, it only over-approximates (by at most
    ``partitions * k`` candidates).

    The per-batch merge is vectorized: ``np.unique`` counts the
    batch (one C pass), the dict merge touches only DISTINCT batch
    tokens, and the MG decrement is one ``np.partition`` when the
    counter set spills past ``k``.
    """
    tcol = tokens_col

    def _summarize(batches):
        import numpy as np
        import pandas as pd

        counters: dict[int, int] = {}
        seen = 0
        for pdf in batches:
            arrs = [a for a in pdf[tcol].to_list() if a is not None and len(a)]
            if not arrs:
                continue
            cat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrs])
            seen += len(cat)
            u, c = np.unique(cat, return_counts=True)
            for t, n in zip(u.tolist(), c.tolist()):
                counters[t] = counters.get(t, 0) + n
            if len(counters) > k:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # (k+1)-th largest residual: subtracting it leaves
                # <= k strictly-positive counters (the MG decrement)
                d = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                counters = {
                    t: v - d for t, v in counters.items() if v - d > 0
                }
        if seen:
            out = pd.DataFrame(
                {
                    "token": np.fromiter(counters.keys(), dtype=np.int64),
                    "weight": np.fromiter(counters.values(), dtype=np.int64),
                }
            )
            out["n_tokens"] = np.int64(seen)
            yield out

    return df.select(tcol).mapInPandas(
        _summarize, schema="token long, weight long, n_tokens long"
    )


def heavy_hitters(
    df: DataFrame, tokens_col: str = "tokens", support: float = 0.001
) -> DataFrame:
    """EXACT corpus heavy hitters without a full-vocabulary shuffle:
    every token with frequency ``>= ceil(support * N)`` and its exact
    count, via the classic two-pass sketch-then-verify plan.

    Pass 1 (:func:`mg_candidates` with ``k = ceil(1/support)``)
    reduces the corpus to a small candidate set — per-partition
    bounded state, NO shuffle of the vocabulary. Pass 2 rescans,
    explodes, and counts ONLY candidate hits (broadcast hash
    semi-join on the candidate ids), then filters by the exact
    threshold. The MG superset guarantee makes the result identical
    to the naive full ``groupBy`` — checked against a DuckDB
    ``HAVING count(*) >= ceil(support * total)`` oracle.

    Scale shape: ``corpus_token_freq`` shuffles EVERY token
    occurrence grouped by a key space as wide as the vocabulary
    (billions of distinct n-grams at 100 TB). This plan's only wide
    exchange carries candidate hits — at most ``partitions * k``
    distinct keys — and the candidate table itself (< a few MB)
    moves by broadcast. Two scans of a columnar source beat one
    scan + a full-vocab shuffle long before the 100 TB mark.
    """
    import math

    if not (0.0 < support < 1.0):
        raise ValueError(f"support must be in (0, 1): {support}")
    k = max(1, math.ceil(1.0 / support))
    summaries = mg_candidates(df, tokens_col, k=k)
    # one tiny job: distinct candidates + exact N (first n_tokens per
    # partition summary would need a partition id; summing SIZE on a
    # pruned second scan is simpler and exact)
    candidates = summaries.select("token").distinct()
    toks = df.select(explode_bag(_c(tokens_col)).alias("token"))
    hits = toks.join(F.broadcast(candidates), "token")
    counted = hits.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = df.select(
        F.sum(F.size(_c(tokens_col))).cast("long").alias("n_total")
    )
    return (
        counted.join(F.broadcast(total))
        .where(F.col("freq") >= F.ceil(F.lit(support) * F.col("n_total")))
        .select("token", "freq")
    )


def _md5_mod(key: Column, salt: str, m: Column | int) -> Column:
    """Portable 60-bit md5 hash mod m — delegates to the single
    definition in operators/sampling.py (md5_mod)."""
    from icicle_spark.operators.sampling import md5_mod

    return md5_mod(key, salt, m)


def fim_transform(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    rate: float = 0.5,
    seed: int = 0,
    mode: str = "psm",
    pre_tok: int = -101,
    mid_tok: int = -102,
    suf_tok: int = -103,
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022):
    a deterministic ``rate`` fraction of sequences is rearranged so the
    model learns infilling —

    * ``psm``:  ``<PRE> P <SUF> S <MID> M``
    * ``spm``:  ``<PRE> <SUF> S <MID> P M`` (joined-sentinel variant)

    where ``(P, M, S)`` split the sequence at positions ``a <= b``.
    The gate AND both split points are pure md5 functions of
    ``(id, seed)`` — the same sequences transform, with the same
    splits, at any parallelism, on any engine (the whole transform
    replays in ANSI SQL, which the ``fim_transform`` contract query's
    DuckDB oracle does). Sequences shorter than 2 tokens pass through.

    Engine extension for LLM pipelines — no reference counterpart.
    Pure Column expressions (slice/concat): a zero-shuffle narrow map
    stage at any scale. Returns the input frame with ``tokens_col``
    replaced (under the name ``tokens``) plus ``(fim, fim_a, fim_b)``
    — splits null when untransformed; every other column rides
    through untouched.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1]: {rate}")
    if mode not in ("psm", "spm"):
        raise ValueError(f"mode must be psm|spm: {mode!r}")
    t = _c(tokens_col)
    key = _c(id_col)
    elem_ty = df.schema[tokens_col].dataType.elementType.simpleString()
    sent = {
        k: F.lit(v).cast(elem_ty)
        for k, v in (("pre", pre_tok), ("mid", mid_tok), ("suf", suf_tok))
    }
    # size(null array) is -1 under non-ANSI Spark, which would make
    # the split-point modulus (n + 1) zero — null under default config
    # (gate already false) but DIVIDE_BY_ZERO under
    # spark.sql.ansi.enabled=true. Clamp so the expression is
    # ANSI-safe; null arrays still pass through untransformed.
    n = F.greatest(F.size(t).cast("bigint"), F.lit(0).cast("bigint"))
    gate = (
        (_md5_mod(key, f":f{seed}", 1_000_000) < int(rate * 1_000_000))
        & (n >= 2)
    )
    a = _md5_mod(key, f":a{seed}", n + 1)
    b = a + _md5_mod(key, f":b{seed}", n - a + 1)
    p = F.slice(t, 1, a.cast("int"))
    m = F.slice(t, (a + 1).cast("int"), (b - a).cast("int"))
    s = F.slice(t, (b + 1).cast("int"), (n - b).cast("int"))
    if mode == "psm":
        fim = F.concat(
            F.array(sent["pre"]), p, F.array(sent["suf"]), s,
            F.array(sent["mid"]), m,
        )
    else:
        fim = F.concat(
            F.array(sent["pre"], sent["suf"]), s,
            F.array(sent["mid"]), p, m,
        )
    passengers = [
        F.col(c)
        for c in df.columns
        if not (isinstance(tokens_col, str) and c == tokens_col)
    ]
    return df.select(
        *passengers,
        F.when(gate, fim).otherwise(t).alias("tokens"),
        gate.alias("fim"),
        F.when(gate, a).alias("fim_a"),
        F.when(gate, b).alias("fim_b"),
    )


def render_dialog(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
    tokenize=None,
    role_ids: dict[str, int] | None = None,
    eot: int = -200,
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """Instruction-tuning (SFT) rendering: flatten a conversation
    column ``array<struct<role:string, content:string>>`` into one
    token sequence with per-token loss masks —

        [role_id] content-tokens [eot]  per turn, concatenated,

    ``loss_mask[i] = 1`` exactly where token ``i`` belongs to a
    ``mask_roles`` turn's content or its ``eot`` (the spans the model
    trains on; role headers and other roles mask 0 — the standard
    assistant-only SFT loss).

    Engine extension for LLM pipelines — no reference counterpart.
    Everything is nested JVM higher-order functions (transform /
    flatten / array_repeat) over the turns array: a zero-shuffle
    narrow map stage, no Python, and the whole rendering replays in
    ANSI SQL (the ``sft_render`` contract query's DuckDB oracle).
    Unknown roles raise loudly. Returns ``(id_col, tokens,
    loss_mask, n_turns)``.
    """
    tokenize = tokenize or char_token_ids
    role_ids = role_ids or {"system": -201, "user": -202,
                            "assistant": -203}

    def role_tok(t):
        expr = F.raise_error(
            F.concat(F.lit("render_dialog: unknown role "), t["role"])
        ).cast("long")
        for r, rid in sorted(role_ids.items()):
            expr = F.when(t["role"] == r, F.lit(rid).cast("long")).otherwise(
                expr
            )
        return expr

    def masked(t):
        m = F.lit(False)
        for r in mask_roles:
            m = m | (t["role"] == r)
        return m

    per_turn = F.transform(
        _c(turns_col),
        lambda t: F.struct(
            F.concat(
                F.array(role_tok(t)),
                tokenize(t["content"]),
                F.array(F.lit(int(eot)).cast("long")),
            ).alias("toks"),
            masked(t).cast("int").alias("m"),
        ),
    )
    d = df.withColumn("__pt", per_turn)
    return d.select(
        _c(id_col).alias(id_col) if isinstance(id_col, str) else _c(id_col),
        F.flatten(
            F.transform(F.col("__pt"), lambda s: s["toks"])
        ).alias("tokens"),
        F.flatten(
            F.transform(
                F.col("__pt"),
                lambda s: F.concat(
                    F.array(F.lit(0)),
                    F.array_repeat(s["m"], F.size(s["toks"]) - 1),
                ),
            )
        ).alias("loss_mask"),
        F.size(F.col("__pt")).alias("n_turns"),
    )
