"""Corpus telemetry report — the stats page every corpus refresh
publishes: docs / chars / words per source, length quantiles,
exact-duplicate ratio, language spread, plus a grand-total row.

Reference provenance: Icicle ships per-run statistics alongside every
snapshot/chord output (``icicle-data/src/Icicle/Data/Fact.hs`` fact
counts; the CLI prints per-entity/per-attribute tallies) — the engine
equivalent at corpus scale is a one-pass summary table the pipeline
can assert on (row deltas between refreshes, dup-rate regressions).

Scale shape (the whole point at 100 TB):

* ONE scan of the corpus, ONE exchange. ``ROLLUP`` computes the
  per-source rows and the grand total in the same hash aggregate via
  grouping-set expansion, with map-side partial aggregation — no
  second pass, no union of two jobs.
* The two ``count(distinct …)`` columns ride the same aggregate
  (Spark plans an Expand: rows × #grouping-sets × #distinct-args,
  then map-side partial aggregation on the expanded keys — the
  shuffle carries one row per DISTINCT (source, hash), not per doc).
  Duplicate detection hashes the text to a fixed 32-byte key
  map-side (``md5``) so the shuffle carries hashes, never bodies.
* The exact median is safe at scale too: Spark's ``percentile``
  buffers a value→count map, so per-group state is bounded by the
  number of DISTINCT document lengths (~1e5-1e6), not by doc count.
* ``approx=True`` swaps the distinct counts for HLL sketches
  (``approx_count_distinct``) and the median for
  ``approx_percentile`` — constant per-group state and a
  counts-only shuffle, the cheapest form when the report is
  human-read telemetry rather than an asserted contract.
* Everything is built-in Column expressions — whole-stage codegen,
  zero Python rows.

All statistics are chosen to be replayable exactly by another engine
(counts, sums, interpolated medians, distinct counts over md5), so the
report itself is oracle-checkable — telemetry you can trust across
engine migrations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOTAL_LABEL = "TOTAL"


def corpus_stats(
    docs: DataFrame,
    group_col: str = "source",
    char_col: str = "n_chars",
    text_col: str = "text",
    lang_col: str = "lang",
    round_digits: int = 6,
    round_eps: float = 0.0,
    approx: bool = False,
) -> DataFrame:
    """Per-``group_col`` corpus statistics with a rolled-up TOTAL row.

    Columns: ``n_docs``, ``total_chars``, ``avg_chars``, ``min_chars``,
    ``max_chars``, ``p50_chars`` (exact interpolated median),
    ``total_words`` (single-space token count), ``n_langs``,
    ``n_unique_texts`` (distinct md5), ``dup_ratio``.

    ``round_eps`` is added inside every ``round`` so a cross-engine
    oracle can stabilize ties off the 5-ulp grid the same way.
    """
    words = F.size(F.split(F.col(text_col), " "))

    def _r(c):
        return F.round(c + F.lit(round_eps), round_digits)

    n_docs = F.count(F.lit(1))
    if approx:
        n_uniq = F.approx_count_distinct("__h")
        n_langs = F.approx_count_distinct("__l")
        p50 = F.expr("approx_percentile(__c, 0.5)").cast("double")
    else:
        n_uniq = F.countDistinct(F.col("__h"))
        n_langs = F.countDistinct("__l")
        p50 = F.expr("percentile(__c, 0.5)")
    agg = (
        docs.select(
            F.col(group_col).alias("__g"),
            F.col(char_col).alias("__c"),
            F.col(lang_col).alias("__l"),
            words.alias("__w"),
            F.md5(F.col(text_col)).alias("__h"),
        )
        .rollup("__g")
        .agg(
            n_docs.alias("n_docs"),
            F.sum("__c").alias("total_chars"),
            _r(F.avg("__c")).alias("avg_chars"),
            F.min("__c").alias("min_chars"),
            F.max("__c").alias("max_chars"),
            _r(p50).alias("p50_chars"),
            F.sum("__w").cast("long").alias("total_words"),
            n_langs.alias("n_langs"),
            n_uniq.alias("n_unique_texts"),
            _r(F.lit(1.0) - n_uniq.cast("double") / n_docs).alias(
                "dup_ratio"
            ),
        )
    )
    return agg.select(
        F.coalesce(F.col("__g"), F.lit(TOTAL_LABEL)).alias(group_col),
        "n_docs",
        "total_chars",
        "avg_chars",
        "min_chars",
        "max_chars",
        "p50_chars",
        "total_words",
        "n_langs",
        "n_unique_texts",
        "dup_ratio",
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Refresh-over-refresh corpus diff: per-document status
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    snapshots, decided by content hash.

    Scale shape: each side reduces to ``(id, md5(text))`` map-side
    BEFORE the full-outer join, so the one co-partitioned shuffle
    carries 32-byte hashes, never document bodies; everything else is
    whole-stage-codegen Column logic. At 100 TB both sides bucket by
    ``id_col`` at ingest (the arranged-store contract), making the
    join exchange-free.

    Output: ``(id_col, status, old_hash, new_hash)`` — hashes kept so
    downstream audits can sample changed docs without a re-scan.
    """
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("old_hash"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("new_hash"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(id_col, status.alias("status"), "old_hash", "new_hash")


def corpus_diff_summary(diff: DataFrame) -> DataFrame:
    """Status counts of a ``corpus_diff`` frame (one tiny map-side
    combined aggregate)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


def corpus_sketch_report(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    char_col: str = "n_chars",
) -> DataFrame:
    """Per-source MERGEABLE telemetry: additive counters plus
    DataSketches HLL sketches (binary columns). Each corpus refresh
    persists one of these tables; corpus-lifetime stats come from
    :func:`merge_sketch_reports` over the per-refresh tables — cost
    proportional to #refreshes × #sources, with the held corpus never
    rescanned. This is the telemetry counterpart of the incremental
    dedup indexes: the sketch union correctly de-duplicates text
    hashes ACROSS refreshes, which additive counters cannot.

    One scan, one map-side-combined aggregate; the shuffle carries
    per-partition sketches (KBs), not rows.
    """
    return docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(char_col).cast("long").alias("total_chars"),
        F.min(char_col).alias("min_chars"),
        F.max(char_col).alias("max_chars"),
        F.hll_sketch_agg(F.md5(F.col(text_col))).alias("uniq_text_sketch"),
        F.hll_sketch_agg(F.col(lang_col)).alias("lang_sketch"),
    )


def merge_sketch_reports(*reports: DataFrame) -> DataFrame:
    """Merge per-refresh :func:`corpus_sketch_report` tables into one:
    counters add, min/max fold, HLL sketches union (exactly mergeable
    by construction — DataSketches union is order- and
    partitioning-insensitive)."""
    if not reports:
        raise ValueError("merge_sketch_reports needs at least one report")
    u = reports[0]
    for r in reports[1:]:
        u = u.unionByName(r)
    group_col = u.columns[0]
    return u.groupBy(group_col).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("total_chars").cast("long").alias("total_chars"),
        F.min("min_chars").alias("min_chars"),
        F.max("max_chars").alias("max_chars"),
        F.hll_union_agg("uniq_text_sketch").alias("uniq_text_sketch"),
        F.hll_union_agg("lang_sketch").alias("lang_sketch"),
    )


def sketch_estimates(report: DataFrame, round_digits: int = 6) -> DataFrame:
    """Decode a (possibly merged) sketch report into human-readable
    estimates. ``dup_ratio_est`` reads "fraction of appended docs whose
    body was already seen" — exact counters over HLL-estimated
    uniques (relative error ~1.6% at the default lgK=12)."""
    uniq = F.hll_sketch_estimate("uniq_text_sketch")
    return report.select(
        report.columns[0],
        "n_docs",
        "total_chars",
        "min_chars",
        "max_chars",
        uniq.alias("n_unique_texts_est"),
        F.hll_sketch_estimate("lang_sketch").alias("n_langs_est"),
        F.round(
            F.lit(1.0) - uniq.cast("double") / F.col("n_docs"), round_digits
        ).alias("dup_ratio_est"),
    )


def lang_histogram(
    docs: DataFrame,
    lang_col: str = "lang",
    group_col: str = "source",
) -> DataFrame:
    """(source, lang) document counts — the language-mix drilldown of
    the report. One groupBy (map-side combined)."""
    return docs.groupBy(group_col, lang_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 1_000_000,
    top_n: int = 20,
) -> DataFrame:
    """Key-skew diagnostic BEFORE a big groupBy/join: the top-N
    heaviest keys with their row counts, corpus share, and the salt
    factor a two-stage salted aggregation needs to keep each task at
    ~``target_rows_per_task`` rows (``ceil(n_rows / target)``) —
    exactly the split the engine's salted executors apply per bucket.

    Scale shape: ONE map-side-combined groupBy on the key (the
    shuffle carries one row per DISTINCT key, not per input row),
    then a rank over that counts frame — tiny relative to the input
    at any corpus size. Ordering is deterministic: count descending,
    key ascending as the tiebreak, so the report is reproducible and
    oracle-checkable cross-engine.

    A plan reader's rule of thumb: ``salt_factor == 1`` for every
    reported key means a plain groupBy is safe; any key with
    ``salt_factor > 1`` is a hot key that would stall its reducer
    task, and either AQE skew handling or the engine's salted
    two-stage path should carry it."""
    if target_rows_per_task < 1:
        raise ValueError("target_rows_per_task must be >= 1")
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").alias("__t")
    )  # one-row frame; crossJoin-broadcast below, never collected
    # top-N via sort+limit: Spark plans TakeOrderedAndProject — each
    # task keeps its local top-N, the driver merges N items — NOT a
    # single-partition global window, which would funnel one row per
    # DISTINCT key (billions on a high-cardinality column) into one
    # task. The rank window then runs over <= top_n rows.
    top = counts.orderBy(F.desc("n_rows"), F.col(key_col)).limit(top_n)
    w = Window.orderBy(F.desc("n_rows"), F.col(key_col))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            F.col(key_col),
            "n_rows",
            F.round(F.col("n_rows") / F.col("__t"), 6).alias("share"),
            F.ceil(
                F.col("n_rows") / F.lit(target_rows_per_task)
            ).cast("long").alias("salt_factor"),
        )
    )


def feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Population-stability drift report between two snapshots of the
    same feature frame (train-vs-serve skew, refresh-vs-refresh
    drift): per ``(feature, bin)`` —

        (feature, bin, ref_n, cur_n, ref_frac, cur_frac, psi_term)

    with bins = ``n_bins`` REF-quantile buckets (PSI convention: the
    reference distribution defines the binning; ``Σ psi_term`` per
    feature is the PSI — < 0.1 stable, > 0.25 drifted by the usual
    rule of thumb). Empty-side fractions are epsilon-smoothed (1e-6)
    so terms stay finite.

    Scale shape: each side is ONE narrow melt scan (explode over the
    bounded ``cols`` list) + one map-side-combined count aggregate on
    ``(feature, bin)`` — the shuffle carries ≤ features × bins rows
    per partition. Bin edges come from ONE exact-percentile aggregate
    on the reference melt (per-group state bounded by distinct
    values, as ``corpus_stats``' median) collected as ``len(cols)``
    rows — the parameter list, not data. Values and edges are rounded
    (engine-stabilized, ``round_digits``) before comparison so the
    binning replays EXACTLY in any engine with ``quantile_cont`` —
    the ``feature_drift`` contract oracle.
    """
    if not cols:
        raise ValueError("cols must name at least one feature")
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    edges = drift_edges(ref, cols, n_bins, round_digits)
    cr = drift_bin_counts(ref, cols, edges, "ref_n", round_digits)
    cc = drift_bin_counts(cur, cols, edges, "cur_n", round_digits)
    return drift_psi(cr, cc, round_digits)


def _melt_features(df: DataFrame, cols: list[str],
                   round_digits: int) -> DataFrame:
    """One narrow melt scan: (feature, value) with engine-stabilized
    rounding; nulls dropped."""
    eps = 1.37 * 10.0 ** -(round_digits + 2)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("feature"),
                F.round(F.col(c).cast("double") + eps, round_digits)
                .alias("value"),
            )
            for c in cols
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.feature", "p.value")
        .where(F.col("value").isNotNull())
    )


def drift_edges(
    ref: DataFrame,
    cols: list[str],
    n_bins: int = 10,
    round_digits: int = 6,
) -> dict[str, list[float]]:
    """Reference-quantile bin edges per feature: ONE exact-percentile
    aggregate over the melt (per-group state bounded by distinct
    values), collected as ``len(cols)`` rows — the parameter list,
    not data. Freeze these once (e.g. persist beside a streaming
    histogram) and every later binning is a pure function."""
    eps = 1.37 * 10.0 ** -(round_digits + 2)
    qs = [i / n_bins for i in range(1, n_bins)]
    rows = (
        _melt_features(ref, cols, round_digits)
        .groupBy("feature")
        .agg(
            F.expr(
                f"percentile(value, array({', '.join(map(str, qs))}))"
            ).alias("thr")
        )
        .collect()
    )
    edges = {
        r["feature"]: [round(t + eps, round_digits) for t in r["thr"]]
        for r in rows
    }
    missing = sorted(set(cols) - set(edges))
    if missing:
        raise ValueError(
            f"drift_edges: no non-null reference values for features "
            f"{missing} — cannot bin them"
        )
    return edges


def drift_bin_counts(
    df: DataFrame,
    cols: list[str],
    edges: dict[str, list[float]],
    name: str = "n",
    round_digits: int = 6,
) -> DataFrame:
    """(feature, bin, <name>) counts of ``df`` under FIXED bin edges —
    a pure zero-state function of the rows, so counts from disjoint
    slices (micro-batches, partitions, days) ADD to the full-corpus
    counts exactly. One melt scan + one map-side-combined count."""
    missing = sorted(set(cols) - set(edges))
    if missing:
        raise ValueError(
            f"drift_bin_counts: no edges for features {missing}"
        )
    m = _melt_features(df, cols, round_digits)

    def bin_expr():
        expr = F.lit(None).cast("int")
        for c, thr in sorted(edges.items()):
            b = F.lit(1)
            for t in thr:
                b = b + F.when(F.col("value") > t, 1).otherwise(0)
            expr = F.when(F.col("feature") == c, b).otherwise(expr)
        return expr.alias("bin")

    return (
        m.select("feature", bin_expr())
        .groupBy("feature", "bin")
        .agg(F.count("*").alias(name))
    )


def drift_psi(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    round_digits: int = 6,
) -> DataFrame:
    """PSI tail over two (feature, bin, n) count frames (columns
    ``ref_n`` / ``cur_n``): full-outer align, epsilon-smoothed
    fractions, per-bin psi_term. Inputs are tiny (features x bins)."""
    eps = 1.37 * 10.0 ** -(round_digits + 2)
    j = ref_counts.join(
        cur_counts, ["feature", "bin"], "full_outer"
    ).fillna({"ref_n": 0, "cur_n": 0})
    w = Window.partitionBy("feature")
    # greatest(total, 1): an all-zero side (feature absent from every
    # batch so far) must report psi against an empty distribution, not
    # die on ANSI 0/0 — numerators are 0 there, so the floor is inert
    rf = F.greatest(
        F.col("ref_n") / F.greatest(F.sum("ref_n").over(w), F.lit(1)),
        F.lit(1e-6),
    )
    cf = F.greatest(
        F.col("cur_n") / F.greatest(F.sum("cur_n").over(w), F.lit(1)),
        F.lit(1e-6),
    )
    return j.select(
        "feature",
        "bin",
        "ref_n",
        "cur_n",
        F.round(rf + eps, round_digits).alias("ref_frac"),
        F.round(cf + eps, round_digits).alias("cur_frac"),
        F.round((cf - rf) * F.log(cf / rf) + eps, round_digits).alias(
            "psi_term"
        ),
    )


def tokenizer_fertility(
    docs: DataFrame,
    tokens_col: str = "tokens",
    text_col: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
    round_eps: float = 0.0,
) -> DataFrame:
    """Tokenizer fertility report — the standard tokenizer-evaluation
    table (how many tokens the tokenizer spends per unit of text, by
    corpus slice): per ``group_col`` plus a rolled-up TOTAL row —

        (group, n_docs, n_tokens, n_chars, n_bytes,
         tokens_per_doc, chars_per_token, bytes_per_token)

    High ``bytes_per_token`` = compressive (good for that slice);
    a slice whose fertility is far off corpus TOTAL signals vocab
    mismatch (e.g. a script the merges never saw). ONE scan, ONE
    ROLLUP hash aggregate with map-side partials — same shape as
    :func:`corpus_stats`; ratios are null for empty denominators.
    ``round_eps`` as in :func:`corpus_stats` (cross-engine tie
    stabilization)."""

    def _r(c):
        return F.round(c + F.lit(round_eps), round_digits)

    d = docs.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))
        .alias("__g"),
        F.size(F.col(tokens_col)).cast("bigint").alias("__nt"),
        F.length(F.col(text_col)).cast("bigint").alias("__nc"),
        F.octet_length(F.col(text_col)).cast("bigint").alias("__nb"),
    )
    agg = (
        d.rollup("__g")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.sum("__nc").alias("n_chars"),
            F.sum("__nb").alias("n_bytes"),
        )
        .select(
            F.coalesce(F.col("__g"), F.lit(TOTAL_LABEL)).alias(group_col),
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_bytes",
            _r(F.col("n_tokens") / F.col("n_docs")).alias("tokens_per_doc"),
            _r(F.col("n_chars") / F.nullif(F.col("n_tokens"), F.lit(0)))
            .alias("chars_per_token"),
            _r(F.col("n_bytes") / F.nullif(F.col("n_tokens"), F.lit(0)))
            .alias("bytes_per_token"),
        )
    )
    return agg
