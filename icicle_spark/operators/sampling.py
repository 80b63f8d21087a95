"""Deterministic sampling and source mixing for training-data curation.

``df.sample`` draws per-partition pseudo-random rows: the selected set
changes with partitioning, task retries, and Spark version — useless
for reproducible dataset builds. These operators decide membership from
a HASH of a stable key instead, so the same rows are kept at any
parallelism, on any rerun, on any cluster:

* ``deterministic_sample`` — keep ~fraction of rows by key hash.
* ``mix_sources``          — per-source downsampling weights (the
  "data mixture" step of a pretraining pipeline: web 0.6, books 1.0,
  …), one scan, no shuffle, whole-stage codegen.
* ``split_train_holdout``  — disjoint, exhaustive train/holdout split
  by the same mechanism (a row's side never changes as the corpus
  grows, unlike randomSplit).
* ``leakage_safe_split``   — cluster-aware splits: near-duplicates
  (connected components over a pair graph) land wholly in one split,
  so an eval document's near-copy can never appear in train.

All selections use xxhash64(key, seed): changing the seed redraws
every decision; keys hash identically forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def md5_mod(key_col, salt: str, m: int | Column | None = None) -> Column:
    """THE engine's portable deterministic hash (single definition —
    tokens.py and the shard writer delegate here): md5 hex is
    identical in every engine (DuckDB, Trino, BigQuery...), so
    membership/splits derived from it are oracle-checkable
    cross-engine. 15 hex digits = 60 bits, fits a signed int64.
    ``m=None`` returns the raw non-negative hash."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")
    if m is None:
        return h
    return h % (F.lit(m) if isinstance(m, int) else m)


def _bucket_n(key_col, seed: int, n: int, hash_fn: str = "xx64") -> Column:
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    if hash_fn == "md5":
        return md5_mod(c, f":{seed}", n)
    if hash_fn != "xx64":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xx64 | md5)")
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(n))


def _bucket(key_col, seed: int, hash_fn: str = "xx64") -> Column:
    return _bucket_n(key_col, seed, _BUCKETS, hash_fn)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — reproducible
    at any parallelism (membership is a pure function of the key)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(
        _bucket(key_col, seed, hash_fn) < int(fraction * _BUCKETS)
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default: float = 0.0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Per-source deterministic downsampling: a row from source s
    survives iff hash(key) lands under weights[s]. Sources absent from
    ``weights`` get ``default`` (0 = dropped). One scan, no shuffle."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0, 1]")
    thr = F.lit(int(default * _BUCKETS))
    for s, w in weights.items():
        thr = F.when(F.col(source_col) == s, F.lit(int(w * _BUCKETS))).otherwise(
            thr
        )
    return df.where(_bucket(key_col, seed, hash_fn) < thr)


def token_budget_sample(
    df: DataFrame,
    budget: int | dict[str, int],
    tok_col: str,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    buckets: int = 256,
    seed: int = 0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Exact per-source TOKEN-BUDGET selection — "take web docs until
    the web slice holds 1.2 T tokens" — deterministic at any
    parallelism, with the expensive sort confined to ~1/``buckets`` of
    each source.

    Spec: order each source's documents by the canonical key
    ``(hash(id) mod buckets, id)`` and keep the prefix whose running
    ``tok_col`` sum stays ≤ the source's budget (a doc that would
    cross the budget is dropped, as is everything after it).
    ``tok_col = 0`` rows are dropped up front (they contribute
    nothing to training). Membership is a pure function of the keys —
    same kept set on any cluster, any rerun, any partitioning.

    Scale shape (the reason this is not one big window): a global
    per-source window would sort a whole source through ONE reducer.
    Instead:

    1. one narrow scan + small aggregate: token sums per
       (source, hash-bucket) — ≤ sources × buckets rows;
    2. bucket-level running sums on that tiny frame classify each
       bucket FULL (entirely within budget), BOUNDARY (straddles it),
       or DROPPED;
    3. broadcast the classification back; FULL buckets pass with no
       sort at all, and only the single boundary bucket per source —
       ~1/``buckets`` of its rows — goes through a per-source window
       to find the exact cut.

    ``budget``: one int for every source, or {source: budget} (absent
    sources get 0 — dropped)."""
    if isinstance(budget, dict):
        bud = F.lit(0).cast("bigint")
        for s, v in budget.items():
            bud = F.when(F.col(source_col) == s, F.lit(int(v))).otherwise(bud)
    else:
        bud = F.lit(int(budget)).cast("bigint")

    b = "__tb_bucket"
    d = df.where(F.col(tok_col) > 0).withColumn(
        b, _bucket_n(id_col, seed, buckets, hash_fn)
    )
    per = d.groupBy(source_col, b).agg(
        F.sum(F.col(tok_col).cast("bigint")).alias("__tb_sum")
    )
    wcum = (
        Window.partitionBy(source_col)
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    status = (
        per.withColumn("__tb_cum", F.sum("__tb_sum").over(wcum))
        .withColumn("__tb_prev", F.col("__tb_cum") - F.col("__tb_sum"))
        .select(source_col, b, "__tb_prev", "__tb_cum")
    )
    joined = d.join(F.broadcast(status), [source_col, b])
    full = joined.where(F.col("__tb_cum") <= bud)
    boundary = joined.where((F.col("__tb_prev") < bud) & (F.col("__tb_cum") > bud))
    # the boundary subset holds exactly one bucket per source, so this
    # window sorts only that slice
    wrun = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary_kept = boundary.withColumn(
        "__tb_run", F.sum(F.col(tok_col).cast("bigint")).over(wrun)
    ).where(F.col("__tb_prev") + F.col("__tb_run") <= bud)
    out_cols = list(df.columns)
    return full.select(*out_cols).unionByName(boundary_kept.select(*out_cols))


def split_train_holdout(
    df: DataFrame, holdout_fraction: float, key_col: str, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout): disjoint and exhaustive by key hash. A key's
    side is stable as the corpus grows — new snapshots never leak a
    previously-held-out document into train."""
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError("holdout_fraction must be in [0, 1]")
    cut = int(holdout_fraction * _BUCKETS)
    b = _bucket(key_col, seed)
    return df.where(b >= cut), df.where(b < cut)


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact quantile bucketing for curriculum ordering / stratified
    sampling: adds ``bucket`` in ``1..n_buckets`` with (near-)equal
    populations, ties sharing a bucket.

    Definition (reproducible in any engine): with scores rounded to
    ``round_digits``, ``bucket = floor(cum_below * n_buckets / total)
    + 1`` where ``cum_below`` counts rows with a strictly smaller
    rounded score.

    Scale shape: ONE map-side-combined aggregate over the rounded
    score (distinct cardinality is bounded by the rounding grid, not
    the corpus) and cumulative counts on the driver, emitting
    ``n_buckets - 1`` literal THRESHOLDS; assignment is a chain of
    O(n_buckets) comparisons in a narrow whole-stage-codegen
    projection — the corpus side has ZERO shuffle, unlike
    ntile/percent_rank (single-partition global window) or
    approxQuantile (approximate thresholds). No per-row map lookup
    (Spark map access is a linear scan).
    """
    import numpy as np

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    s = F.round(F.col(score_col), round_digits)
    hist = df.select(s.alias("__s")).groupBy("__s").count().collect()
    if any(r["__s"] is None for r in hist):
        raise ValueError(f"null score in {score_col!r}")
    hist.sort(key=lambda r: r["__s"])
    if not hist:
        return df.withColumn("bucket", F.lit(None).cast("int"))
    counts = np.array([r["count"] for r in hist], dtype=np.int64)
    total = int(counts.sum())
    below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    per_score_bucket = below * n_buckets // total + 1  # non-decreasing
    # boundary for bucket b = smallest score whose bucket >= b;
    # bucket(s) = 1 + #boundaries <= s (skipped bucket ids collapse
    # onto repeated boundaries, preserving the formula under ties)
    idx = np.searchsorted(per_score_bucket, np.arange(2, n_buckets + 1), "left")
    bucket = F.lit(1)
    for i in idx:
        if i >= len(hist):
            break
        bucket = bucket + (
            s >= F.lit(float(hist[int(i)]["__s"]))
        ).cast("int")
    return df.withColumn("bucket", bucket.cast("int"))


def temperature_rates(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
) -> dict[str, int]:
    """Per-source keep thresholds (out of ``_BUCKETS``) that reshape
    the empirical source distribution ``p_s`` into ``q_s ∝ p_s^alpha``
    — the XLM-R / Gopher temperature-reweighting rule — by
    downsampling only (the rarest source keeps rate 1.0, everything
    more frequent is thinned: ``r_s ∝ p_s^(alpha-1)``, normalized so
    ``max r_s = 1``).

    One tiny count aggregate; the returned dict is control flow
    (``n_sources`` rows to the driver), applied as a zero-shuffle gate
    by ``temperature_mix``. ``alpha=0.5`` uses sqrt/div/mul only —
    all IEEE-correctly-rounded, so thresholds are bit-identical in
    every engine (numpy, JVM, DuckDB) and oracle-replayable; general
    ``alpha`` goes through libm ``pow``, whose last ulp may differ
    across engines (fine in production, not contract-exact)."""
    import math

    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1] (downsample-only)")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return {}
    n_min = min(counts.values())
    out: dict[str, int] = {}
    for s, n in counts.items():
        if alpha == 0.5:
            r = math.sqrt(n_min / n)
        else:
            r = (n_min / n) ** (1.0 - alpha)
        out[s] = int(math.floor(r * _BUCKETS))
    return out


def temperature_mix(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xx64",
    rates: dict[str, int] | None = None,
) -> DataFrame:
    """Temperature-based source rebalancing: keep each row iff its key
    hash lands under the source's ``temperature_rates`` threshold.
    Same deterministic-membership contract as ``mix_sources`` (stable
    at any parallelism / rerun / corpus order); the corpus side is one
    scan, zero shuffle, whole-stage codegen. Pass precomputed
    ``rates`` (as returned by ``temperature_rates``) to skip the count
    aggregate — e.g. when the caller also reports them."""
    if rates is None:
        rates = temperature_rates(df, alpha, source_col)
    thr = F.lit(0)
    for s, t in rates.items():
        thr = F.when(F.col(source_col) == s, F.lit(t)).otherwise(thr)
    return df.where(_bucket(key_col, seed, hash_fn) < thr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xx64",
) -> DataFrame:
    """Per-group quota: keep at most ``max_rows`` rows per
    ``group_col`` value — the anti-spam "max N documents per domain"
    curation rule (composes with ``functions.urls.url_filter``'s
    ``domain`` column).

    Selection is deterministic at any parallelism: rows rank by
    ``(hash(key), key)`` within their group, so the same ``max_rows``
    survivors are chosen on any cluster / rerun / input order —
    effectively a per-group uniform sample, NOT a scan-order prefix.
    Cost: ONE shuffle on ``group_col`` (the rank window); at 100 TB
    the key-hash ordering also means no sorted-input bias toward
    early crawl segments."""
    if max_rows < 1:
        raise ValueError("max_rows must be >= 1")
    w = (
        Window.partitionBy(group_col)
        .orderBy(_bucket(key_col, seed, hash_fn), F.col(key_col))
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= max_rows)
        .drop("__rank")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    seed: int = 0,
    hash_fn: str = "xx64",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster, split): near-dup-cluster-aware train/val/test
    assignment. ``split_train_holdout`` hashes each DOCUMENT, so two
    near-duplicates can land on opposite sides and an eval document's
    near-copy trains the model — the classic benchmark-leakage bug.
    This operator first resolves connected components over the
    near-dup pair graph (``dedup_clusters``: iterative min-label
    propagation, LSH-scale edges), then gates the CLUSTER
    representative through one deterministic hash, so every near-dup
    group lands wholly in one split; documents in no pair are
    singleton clusters of themselves.

    ``fractions`` is an ordered {split_name: fraction} mapping that
    must sum to 1; iteration order fixes the bucket ranges, so the
    same dict always reproduces the same assignment. Growth contract:
    new documents can only JOIN or MERGE clusters — a merged cluster
    may move (its representative can change), but it moves whole;
    no split ever sees a partial cluster.

    Scale shape: the pair graph is LSH output (orders of magnitude
    smaller than the corpus), so the component loop shuffles narrow
    int edges; the corpus-side cost is one hash join on ``id_col``
    plus a codegen projection — no corpus self-join, no window.
    ``hash_fn="md5"`` makes the gate portable (same hex in DuckDB /
    Trino / BigQuery) for cross-engine audits."""
    from icicle_spark.operators.dedup import dedup_clusters

    if not fractions:
        raise ValueError("fractions must name at least one split")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must sum to 1 (got {sum(fractions.values())})"
        )
    clusters = dedup_clusters(pairs, id_a, id_b, max_iter)
    out = docs.select(F.col(id_col)).join(
        clusters.select(F.col("id").alias(id_col), "cluster"),
        on=id_col,
        how="left",
    )
    cluster = F.coalesce("cluster", F.col(id_col))
    b = _bucket(cluster, seed, hash_fn)
    cuts: list[tuple[str, int]] = []
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cuts.append((name, int(round(cum * _BUCKETS))))
    # the last range absorbs float rounding: exhaustive by construction
    cuts[-1] = (cuts[-1][0], _BUCKETS)
    expr = None
    for name, cut in cuts:  # ascending cuts, first match wins
        cond = b < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return out.select(
        id_col, cluster.alias("cluster"), expr.alias("split")
    )


def plan_source_epochs(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    tok_col: str = "n_tok",
    source_col: str = "source",
    max_epochs: float = 4.0,
) -> list[dict]:
    """Multi-epoch mixture planning (the LLaMA/Chinchilla-style "how
    many epochs of each source" table): given target mixture
    ``weights`` (normalized over the sources present), a total token
    budget, and an over-repetition cap, return one row per source —

        {source, tokens, target_tokens, epochs}

    where ``epochs = min(target / tokens, max_epochs)`` (fractional;
    >1 means upsampling across epochs, <1 downsampling). ONE
    map-side-combined aggregate (rows = distinct sources, a bounded
    driver collect); the plan itself is closed-form arithmetic, so
    downstream materialization (:func:`epoch_upsample`) replays
    exactly in any engine."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be positive")
    counts = {
        r[source_col]: int(r["__t"])
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(tok_col).cast("bigint")).alias("__t"))
        .collect()
    }
    missing = set(counts) - set(weights)
    if missing:
        raise ValueError(
            f"plan_source_epochs: no weight for sources {sorted(missing)}"
        )
    present = {s: w for s, w in weights.items() if s in counts and w > 0}
    tot_w = sum(present.values())
    if tot_w <= 0:
        raise ValueError("no positive weight overlaps the corpus")
    plan = []
    for s in sorted(counts):
        w = present.get(s, 0.0) / tot_w
        target = w * token_budget
        epochs = min(target / counts[s], max_epochs) if counts[s] else 0.0
        plan.append(
            {
                "source": s,
                "tokens": counts[s],
                "target_tokens": int(target),
                "epochs": epochs,
            }
        )
    return plan


def epoch_upsample(
    df: DataFrame,
    epochs: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "md5",
    only_where: Column | None = None,
) -> DataFrame:
    """Materialize a fractional-epoch mixture plan: every document of
    source ``s`` appears ``floor(epochs[s])`` times plus one more for
    a deterministic hash-gated ``frac(epochs[s])`` fraction of ids —
    so the EXPECTED per-source token mass is ``epochs[s] × tokens[s]``
    and every repetition is labelled with an ``epoch`` column (0-based
    — dataloaders can interleave or schedule epochs explicitly).

    ``epochs < 1`` downsamples (some docs appear zero times),
    ``epochs > 1`` upsamples. Membership of the final partial epoch is
    a pure function of ``(id, seed)`` via the portable md5 gate
    (``hash_fn="md5"``, default — replays exactly in DuckDB/Trino;
    ``"xx64"`` for the cheaper JVM hash). The repetition is a narrow
    JVM ``explode`` over a per-row ``sequence`` — zero shuffle, and
    output size is exactly the planned blow-up, never a join.

    ``only_where`` restricts the treatment to matching rows in the
    SAME single pass: non-matching rows keep exactly one copy with
    ``epoch = 0`` (and never consult the plan, so an eval split may
    contain sources the plan omits). The train/eval shape — eval
    splits must not be epoch-duplicated — without splitting the
    input into two scans of an expensive upstream lineage."""
    if not epochs:
        raise ValueError("epochs plan is empty")
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"negative epochs for {s!r}: {e}")
    # build as a when-chain (sources are bounded); unknown sources
    # raise loudly rather than silently dropping or keeping
    expr = F.raise_error(
        F.concat(
            F.lit("epoch_upsample: source without an epoch plan: "),
            F.col(source_col),
        )
    ).cast("double")
    for s, e in sorted(epochs.items()):
        expr = F.when(F.col(source_col) == s, F.lit(float(e))).otherwise(expr)
    rate = expr
    if only_where is not None:
        # untreated rows: exactly one copy, epoch 0 (when() guards
        # the raise_error fallback too — the plan is never consulted)
        rate = F.when(only_where, rate).otherwise(F.lit(1.0))
    n_full = F.floor(rate).cast("int")
    frac = rate - F.floor(rate)
    # floor() the threshold explicitly: Spark's double->bigint cast
    # truncates but DuckDB's ROUNDS — floor is the cross-engine form
    gate = _bucket_n(id_col, seed, 1_000_000, hash_fn) < F.floor(
        frac * 1_000_000
    ).cast("bigint")
    n_copies = n_full + F.when(gate, 1).otherwise(0)
    d = df.withColumn("__n_copies", n_copies).where(F.col("__n_copies") > 0)
    return d.select(
        *df.columns,
        F.explode(
            F.sequence(F.lit(0), F.col("__n_copies") - 1)
        ).alias("epoch"),
    )
