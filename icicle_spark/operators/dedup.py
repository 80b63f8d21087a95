"""Deduplication operators for training-data pipelines.

All the hot-path math stays JVM-side: shingling, hashing, min-hashing
and banding are built from Spark higher-order functions
(``transform`` / ``aggregate`` / ``xxhash64``), so the only Python in
the pipeline is SimHash's bit-majority (a vectorized pandas UDF).

Scale design:
* exact:    one hash + one groupBy (map-side combine) — no skew risk.
* MinHash:  signature computed per row (no shuffle), then ONE shuffle
  on (band_id, band_hash); candidate pairs verified with exact
  Jaccard before reporting. Band buckets are capped to avoid
  quadratic blowup on degenerate buckets (boilerplate text).
* SimHash:  pigeonhole banding on 16-bit chunks of the 64-bit
  fingerprint => hamming<=3 candidates in 4 bucket joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.functions import pandas_udf

# 2^31-1: keeps a*h + b inside int64 for a,h < 2^31
_MERSENNE = (1 << 31) - 1


def _c(col):
    return F.col(col) if isinstance(col, str) else col


def explode_bag(arr):
    """Explode an array whose downstream use is ORDER-FREE (feeds a
    groupBy / count / membership join): ``F.shuffle`` pins the array
    into its own projection (nondeterministic expressions don't
    collapse into the Generate's consume chain), without which an
    inline HOF-built array is re-evaluated once PER EMITTED ELEMENT —
    measured 12 s -> 0.6 s on the sf1.0 3-gram explode (50k docs,
    2.6M grams). The emitted multiset is identical under the
    permutation, so every aggregate downstream is unchanged."""
    return F.explode(F.shuffle(arr))


def zip_pos(arr):
    """Materialization-pinned ``posexplode``: ``(p, v)`` struct array
    to feed ``F.explode`` when element POSITIONS matter (so the
    order-randomizing :func:`explode_bag` pin can't be used).
    ``arrays_zip`` materializes the array once instead of
    re-evaluating the inline expression per emitted element
    (measured 11 s -> 1 s on the sf1.0 3-gram posexplode). The
    empty-array guard matters: ``sequence(0, -1)`` counts DOWN, and
    ``arrays_zip`` pads to the longer input."""
    n = F.size(arr)
    z = F.arrays_zip(
        F.sequence(F.lit(0), n - 1).alias("p"), arr.alias("v")
    )
    return F.when(n > 0, z).otherwise(F.array())


def _norm_tokens(text_col):
    """Lower-case word tokens (letters+digits runs)."""
    return F.filter(
        F.split(F.lower(_c(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
    )


def shingles(text_col, n: int = 3):
    """Word n-gram shingle strings of a text column (JVM-side)."""
    toks = _norm_tokens(text_col)
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def _word_hashes(text_col):
    """xxhash64 per normalized word, reduced mod 2^31-1."""
    return F.transform(
        _norm_tokens(text_col), lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE))
    )


def _grams_from(whc, n: int, base: int = 131):
    """n-gram hashes from a word-hash array column via zip_with over
    n shifted slices — rolling polynomial mod 2^31-1, integer ops
    only, O(words) with no per-position element_at (which re-evaluates
    the source array inside HOF lambdas)."""
    k = F.greatest(F.size(whc) - (n - 1), F.lit(0))
    acc = F.slice(whc, 1, k)
    for j in range(1, n):
        # acc < 2^31, so acc*base + next < 2^39 stays in int64
        acc = F.zip_with(
            acc,
            F.slice(whc, 1 + j, k),
            lambda x, y: F.pmod(x * F.lit(base) + y, F.lit(_MERSENNE)),
        )
    whole = F.pmod(
        F.aggregate(
            whc,
            F.lit(0).cast("long"),
            lambda a, x: F.pmod(a * F.lit(base) + x, F.lit(_MERSENNE)),
        ),
        F.lit(_MERSENNE),
    )
    return F.when(F.size(whc) < n, F.array(whole)).otherwise(acc)


def word_hashes(text_col):
    """Public form of the per-word hash array. MATERIALIZE it with
    withColumn before feeding it to ngram_hashes64 — Catalyst
    re-inlines projections, and an inline word-hash expression gets
    re-evaluated per polynomial slice (measured 2x)."""
    return _word_hashes(text_col)


def ngram_hashes64(whc, n: int):
    """62-bit word n-gram ids from a (materialized) word-hash array:
    two independent 31-bit rolling polynomials combined as
    ``h1 * 2^31 + h2``. Cross-corpus join safe — collision odds
    ~|grams_a|x|grams_b|/2^62 — WITHOUT materializing shingle
    strings, which dominated the string path (measured 4.7x: 3.8 s
    -> 0.8 s per 5k docs/core incl. distinct+explode). Texts shorter
    than ``n`` words yield their whole-text polynomial (same rule as
    :func:`shingles`)."""
    return F.zip_with(
        _grams_from(whc, n, 131),
        _grams_from(whc, n, 137),
        lambda a, b: a * F.lit(1 << 31) + b,
    )


def shingle_hashes(text_col, n: int = 3):
    """int64 hash per word n-gram WITHOUT materializing shingle
    strings: hash each word once (xxhash64 in whole-stage codegen),
    then combine n consecutive word hashes with a rolling polynomial.
    Building the n-gram strings (slice + array_join per position)
    allocates O(words x n) strings per doc and was the measured
    bottleneck of the signature stage (4.2 s -> 0.8 s inline,
    0.3 s with the word hashes materialized first; see
    minhash_signature_arrow)."""
    return _grams_from(_word_hashes(text_col), n)


def exact_key(text_col):
    """The exact-dedup grouping key: xxhash64 of the normalized word
    stream (case/punctuation/whitespace folded)."""
    return F.xxhash64(F.array_join(_norm_tokens(text_col), " "))


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: keep the smallest id per identical (normalized)
    text. Returns the surviving rows."""
    with_h = docs.withColumn("__h", exact_key(text_col))
    keep = with_h.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        with_h.join(keep, on=["__h", id_col], how="inner")
        .drop("__h")
    )


def line_hash_counts(
    docs: DataFrame, text_col: str = "text", delim: str = "\n"
) -> DataFrame:
    """UNFILTERED corpus line counts ``(line_hash, n_occurrences)`` —
    the persistable index behind incremental line-level dedup: keep
    every count (a line seen once in the stored corpus plus once in
    an increment IS a duplicate), parquet it per corpus snapshot, and
    fold new batches in with :func:`merge_hash_counts`. Bounded by
    distinct lines, not corpus size."""
    import re as _re

    lines = docs.select(
        explode_bag(F.split(_c(text_col), _re.escape(delim))).alias(
            "__line"
        )
    )
    return lines.groupBy(F.xxhash64("__line").alias("line_hash")).agg(
        F.count("*").alias("n_occurrences")
    )


def merge_hash_counts(
    a: DataFrame, b: DataFrame, key: str
) -> DataFrame:
    """Sum two ``(key, n_occurrences)`` count indexes — the
    corpus-refresh update step for incremental line/substring dedup.
    One groupBy over the two (distinct-bounded) indexes; never over
    corpus data."""
    return (
        a.select(key, "n_occurrences")
        .unionByName(b.select(key, "n_occurrences"))
        .groupBy(key)
        .agg(F.sum("n_occurrences").alias("n_occurrences"))
    )


def duplicate_line_hashes(
    docs: DataFrame,
    text_col: str = "text",
    delim: str = "\n",
    min_count: int = 2,
    index: DataFrame | None = None,
) -> DataFrame:
    """``(line_hash, n_occurrences)`` for every line whose corpus-wide
    occurrence count reaches ``min_count`` — the boilerplate detector
    behind line-level dedup (CCNet paragraph dedup / MassiveText &
    RefinedWeb repeated-line removal: headers, footers, navigation
    chrome, license blocks repeat across pages; prose lines don't).
    ``index`` (a persisted :func:`line_hash_counts` frame for the
    already-ingested corpus) makes the detector incremental: counts
    from ``docs`` merge with the stored counts before thresholding.

    100 TB shape: one narrow Generate (explode) and ONE groupBy over
    8-byte xxhash64 keys (map-side combine does the heavy lifting —
    every repeated line collapses to one row per partition before the
    exchange). The result is bounded by the corpus's DISTINCT repeated
    lines, not its size."""
    counts = line_hash_counts(docs, text_col, delim)
    if index is not None:
        counts = merge_hash_counts(counts, index, "line_hash")
    return counts.filter(F.col("n_occurrences") >= F.lit(min_count))


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    min_count: int = 2,
    strategy: str = "broadcast_set",
    max_dup_lines: int = 100_000,
    index: DataFrame | None = None,
) -> DataFrame:
    """Remove every line that appears ``min_count``-or-more times
    across the corpus (ALL occurrences — repeated lines are
    boilerplate, not content; deterministic, unlike keep-one-copy
    under shuffle). Returns ``docs`` with ``text_col`` rewritten
    (kept lines re-joined on ``delim``) plus ``n_removed``.

    INCREMENTAL ingest: pass ``index`` (the persisted
    :func:`line_hash_counts` of the already-stored corpus) and
    ``docs`` = the new batch only. The batch is cleaned against the
    MERGED counts — identical to what a full-corpus run would do to
    these documents (pytest-pinned) — at a cost proportional to the
    increment; refresh the stored index with
    :func:`merge_hash_counts`. (Old documents whose lines only now
    became duplicates are re-cleaned at the next corpus refresh, the
    standard ingest-pipeline contract.)

    Two scale strategies:

    * ``broadcast_set`` (default): the dup-line hash set is collected
      into ONE array row, broadcast, and each document filters its own
      split — ZERO corpus shuffle beyond the small freq groupBy. Right
      whenever the boilerplate set is modest (the normal case — but
      note the per-line membership test scans the array: O(lines x
      |dup set|), so switch to ``positions`` past ~1k dup lines);
      guarded by ``max_dup_lines`` with a loud executor-side error.
    * ``positions``: duplicate OCCURRENCES join against the dup set
      (AQE picks broadcast vs shuffle) and reduce to a per-doc
      removal-position list; documents then drop those indexes with a
      filter-with-index HOF. The corpus text itself never shuffles in
      exploded form — only the matched positions do.
    """
    import re as _re

    pat = _re.escape(delim)
    dup = duplicate_line_hashes(docs, text_col, delim, min_count, index)
    split = F.split(_c(text_col), pat)

    if strategy == "broadcast_set":
        arr = dup.agg(F.collect_list("line_hash").alias("__dup_lines"))
        # the guard rides INSIDE the used column (a separate
        # assert_true column would be pruned away by Catalyst)
        arr = arr.select(
            F.when(
                F.size("__dup_lines") <= F.lit(max_dup_lines),
                F.col("__dup_lines"),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        f"line_dedup: duplicate-line set exceeds "
                        f"{max_dup_lines}; use strategy='positions'"
                    )
                )
            )
            .alias("__dup_lines")
        )
        kept = F.filter(
            split,
            lambda x: ~F.array_contains("__dup_lines", F.xxhash64(x)),
        )
        return (
            docs.crossJoin(F.broadcast(arr))
            .withColumn("__kept", kept)
            .withColumn(
                "n_removed", F.size(split) - F.size("__kept")
            )
            .withColumn(text_col, F.array_join("__kept", delim))
            .drop("__dup_lines", "__kept")
        )
    if strategy == "positions":
        parts = docs.select(
            _c(id_col).alias(id_col), F.explode(zip_pos(split)).alias("__z")
        ).select(
            id_col,
            F.col("__z.p").alias("__pos"),
            F.col("__z.v").alias("__line"),
        )
        rm = (
            parts.withColumn("line_hash", F.xxhash64("__line"))
            .join(dup.select("line_hash"), on="line_hash")
            .groupBy(id_col)
            .agg(
                F.collect_list("__pos").alias("__rm_pos"),
                F.count("*").alias("__n_rm"),
            )
        )
        kept = F.filter(
            split, lambda x, i: ~F.array_contains("__rm_pos", i)
        )
        out = docs.join(rm, on=id_col, how="left")
        return (
            out.withColumn(
                "n_removed", F.coalesce("__n_rm", F.lit(0))
            )
            .withColumn(
                text_col,
                F.when(F.col("__rm_pos").isNull(), _c(text_col))
                .otherwise(F.array_join(kept, delim)),
            )
            .drop("__rm_pos", "__n_rm")
        )
    raise ValueError(f"unknown line_dedup strategy {strategy!r}")


def gram_hash_counts(
    docs: DataFrame, text_col: str = "text", k: int = 10
) -> DataFrame:
    """UNFILTERED corpus k-gram counts ``(gram_hash,
    n_occurrences)`` — the persistable index behind incremental
    substring dedup (see :func:`line_hash_counts` for the contract).
    Bounded by distinct grams, not corpus size."""
    grams = docs.withColumn("__wh", word_hashes(text_col)).select(
        explode_bag(ngram_hashes64(F.col("__wh"), k)).alias("gram_hash")
    )
    return grams.groupBy("gram_hash").agg(
        F.count("*").alias("n_occurrences")
    )


def duplicate_gram_hashes(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
    index: DataFrame | None = None,
) -> DataFrame:
    """``(gram_hash, n_occurrences)`` for every k-token gram whose
    corpus-wide occurrence count (across ALL positions, including
    repeats inside one document) reaches ``min_count`` — the
    duplicated-substring detector behind :func:`substring_dedup`.
    ``index`` (a persisted :func:`gram_hash_counts` frame) makes it
    incremental, exactly as in :func:`duplicate_line_hashes`.

    100 TB shape: gram ids are 62-bit rolling polynomials over
    per-word hashes (:func:`ngram_hashes64` — no shingle strings ever
    materialize), then ONE groupBy over 8-byte keys with map-side
    combine. The result is bounded by the corpus's distinct duplicated
    grams, not its size. Texts shorter than ``k`` tokens contribute
    their whole normalized text as one gram (same rule as
    :func:`shingles`), so exact short duplicates are still caught."""
    counts = gram_hash_counts(docs, text_col, k)
    if index is not None:
        counts = merge_hash_counts(counts, index, "gram_hash")
    return counts.filter(F.col("n_occurrences") >= F.lit(min_count))


def gram_novelty(
    docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-document novelty against a persisted corpus gram index (a
    :func:`gram_hash_counts` frame): the fraction of the document's
    DISTINCT k-gram ids absent from the index — the "new information
    rate" signal for corpus-refresh curation (score a crawl snapshot
    against everything already held; high-novelty docs are worth
    keeping even at mediocre quality, near-zero-novelty docs are
    boilerplate re-crawls).

    Returns ``(id, n_grams, n_novel, novelty)``. 100 TB shape: the
    document side explodes distinct 62-bit gram ids (no shingle
    strings); membership is ONE join on 8-byte keys against the
    index (Spark broadcasts it when small, shuffles both sides
    otherwise — the index is bounded by distinct corpus grams) and
    one groupBy(doc) re-aggregate. Cost ~ snapshot size, not held
    corpus size."""
    grams = (
        docs.withColumn("__wh", word_hashes(text_col))
        .select(
            id_col,
            explode_bag(
                F.array_distinct(ngram_hashes64(F.col("__wh"), k))
            ).alias("gram_hash"),
        )
    )
    seen = index.select("gram_hash").distinct().withColumn(
        "__seen", F.lit(1)
    )
    joined = grams.join(seen, "gram_hash", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("__seen").isNull(), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_novel").cast("bigint").alias("n_novel"),
            (F.col("n_novel") / F.col("n_grams")).alias("novelty"),
        )
    )


def substring_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_count: int = 2,
    strategy: str = "positions",
    max_dup_grams: int = 200_000,
    index: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr-style duplicated-span removal (Lee et al. 2022,
    arXiv 2107.06499 "Deduplicating Training Data Makes Language
    Models Better"): any run of >= ``k`` tokens appearing
    ``min_count``-or-more times corpus-wide is duplicated text, and
    every token covered by such a run drops from ALL documents. (The
    paper keeps one copy via a corpus suffix array; removing all
    occurrences keeps the operator deterministic under shuffle — the
    same policy as :func:`line_dedup`. For the paper's keep-one
    policy made deterministic — a canonical min-``(doc_id, pos)``
    keeper per gram — see ``span_dedup.strip_repeated_spans``, the
    dedup-proper complement of this boilerplate pass.) Overlapping
    duplicated grams
    merge into maximal spans automatically: a token is removed iff ANY
    k-gram window covering it is duplicated.

    Matching is over NORMALIZED tokens (lowercase alnum runs — the
    tokenization every operator in this module uses) and the cleaned
    text is that token stream re-joined with single spaces. Returns
    ``docs`` with ``text_col`` rewritten plus ``n_removed`` (tokens
    dropped).

    Two scale strategies, mirroring :func:`line_dedup`:

    * ``positions`` (default): duplicate gram OCCURRENCES hash-join
      against the (broadcast) dup set and reduce to a per-doc
      position list; only matched positions ever shuffle — never the
      exploded corpus text. Membership is a hash probe, so cost is
      independent of the dup-set size — the right shape here, since
      duplicated-substring sets are corpus-frequency-bounded, not
      boilerplate-bounded.
    * ``broadcast_set``: the dup-gram set is collected into ONE array
      row, broadcast, and each document resolves its own spans with
      pure HOFs — ZERO corpus shuffle beyond the small freq groupBy,
      but the in-array membership scan is O(grams x |dup set|) per
      doc: use only when the dup set is SMALL (<~1k grams); guarded
      by ``max_dup_grams`` with a loud executor-side error.

    Per-doc cost is O(tokens x k) HOF comparisons (a window ``exists``
    over a flag-array slice); k is 8-50 in practice.

    INCREMENTAL ingest: pass ``index`` (the persisted
    :func:`gram_hash_counts` of the stored corpus) and ``docs`` = the
    new batch; cleaning matches a full-corpus run on those documents
    exactly (pytest-pinned) at increment cost — same contract as
    :func:`line_dedup`."""
    base = (
        docs.withColumn("__toks", _norm_tokens(text_col))
        # materialized word hashes: an inline expression would be
        # re-evaluated per polynomial slice (see word_hashes)
        .withColumn(
            "__wh",
            F.transform(
                "__toks",
                lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE)),
            ),
        )
        .withColumn("__grams", ngram_hashes64(F.col("__wh"), k))
    )
    dup = duplicate_gram_hashes(docs, text_col, k, min_count, index)

    if strategy == "broadcast_set":
        arr = dup.agg(F.collect_list("gram_hash").alias("__dup"))
        # the guard rides INSIDE the used column (a separate
        # assert_true column would be pruned away by Catalyst)
        arr = arr.select(
            F.when(
                F.size("__dup") <= F.lit(max_dup_grams), F.col("__dup")
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        f"substring_dedup: duplicate-gram set exceeds "
                        f"{max_dup_grams}; use strategy='positions'"
                    )
                )
            )
            .alias("__dup")
        )
        # __dup_pos: 0-based gram positions whose gram is duplicated,
        # built in ONE pass over __grams. F.shuffle pins this to its
        # own Project (nondeterministic expressions don't collapse):
        # without the pin, Catalyst inlines the whole O(grams x
        # |dup_set|) membership scan into the PER-TOKEN lambda below,
        # multiplying it by n (measured 194 s vs 131 s at sf0.1's
        # degenerate 27k-gram dup set; `exists` doesn't care about
        # order). The remaining O(grams x |dup set|) is the array
        # scan itself — inherent to this strategy, see the docstring.
        marked = base.crossJoin(F.broadcast(arr)).withColumn(
            "__dup_pos",
            F.shuffle(
                F.filter(
                    F.zip_with(
                        F.transform(
                            "__grams",
                            lambda gr: F.array_contains("__dup", gr),
                        ),
                        F.sequence(
                            F.lit(0), F.size("__grams") - F.lit(1)
                        ),
                        lambda fl, p: F.when(fl, p),
                    ),
                    lambda p: p.isNotNull(),
                )
            ),
        )
    elif strategy == "positions":
        occ = base.select(
            _c(id_col).alias(id_col),
            F.explode(zip_pos(F.col("__grams"))).alias("__z"),
        ).select(
            id_col,
            F.col("__z.p").alias("__p"),
            F.col("__z.v").alias("gram_hash"),
        )
        rm = (
            occ.join(F.broadcast(dup.select("gram_hash")), on="gram_hash")
            .groupBy(id_col)
            .agg(F.collect_set("__p").alias("__dup_pos"))
        )
        marked = base.join(rm, on=id_col, how="left").withColumn(
            "__dup_pos",
            F.coalesce("__dup_pos", F.array().cast("array<int>")),
        )
    else:
        raise ValueError(f"unknown substring_dedup strategy {strategy!r}")

    n = F.size("__toks")
    # token t (1-based) is removed iff some duplicated gram STARTS in
    # [t-k, t-1] (0-based starts; a short doc's whole-text gram sits
    # at 0 and covers everything) — i.e. iff t is one of the COVERED
    # positions {p+1..p+k | p in __dup_pos}. The kept stream is
    # rebuilt as the GAP SLICES between consecutive covered
    # positions: O(tokens + |covered| log |covered|) per doc, where
    # the previous per-token `exists` over __dup_pos was
    # O(tokens x |dup positions|) — quadratic on corpora whose grams
    # are mostly duplicated (the sf1.0 3-gram case: measured the
    # dominant cost of this operator).
    cov = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(
                    "__dup_pos",
                    lambda p: F.sequence(p + F.lit(1), p + F.lit(k)),
                )
            )
        )
    )
    bounds = F.concat(F.array(F.lit(0)), cov, F.array(n + F.lit(1)))
    m = F.size(bounds)
    kept = F.flatten(
        F.zip_with(
            F.slice(bounds, 1, m - 1),
            F.slice(bounds, 2, m - 1),
            # covered positions can exceed n (a short doc's whole-text
            # gram covers 1..k > n), so the trailing gap length is
            # clamped at 0
            lambda a, b: F.slice(
                "__toks", a + 1, F.greatest(b - a - 1, F.lit(0))
            ),
        )
    )
    return (
        marked.withColumn("__kept", kept)
        .withColumn("n_removed", n - F.size("__kept"))
        .withColumn(text_col, F.array_join("__kept", " "))
        .drop(
            "__toks", "__wh", "__grams",
            "__dup", "__dup_pos", "__kept",
        )
    )


def benchmark_gram_index(
    benchmark: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """DISTINCT word n-gram hashes of an evaluation set — the
    contamination index (GPT-3 appendix C / PaLM-style n-gram
    decontamination). One column ``gram_hash: bigint`` — 62-bit
    double-polynomial ids (:func:`ngram_hashes64`): collision odds
    across a corpus-x-benchmark join stay ~|grams|^2/2^62,
    negligible, and no shingle strings are ever built (the measured
    bottleneck of the string path).

    Eval suites are MBs, so the index is broadcastable; persist it
    once (parquet) and reuse across corpus batches. Texts shorter
    than ``n`` words contribute their whole normalized text as one
    gram (same rule as :func:`shingles`), so exact short-answer
    matches are still caught."""
    return (
        benchmark.withColumn("__wh", word_hashes(text_col))
        .select(
            explode_bag(
                F.array_distinct(ngram_hashes64(F.col("__wh"), n))
            ).alias("gram_hash")
        )
        .distinct()
    )


def contaminated_ids(
    corpus: DataFrame,
    gram_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast_index: bool = True,
) -> DataFrame:
    """Corpus documents sharing at least one word ``n``-gram with the
    benchmark index: ``(id_col, n_hits)`` where n_hits counts the
    doc's DISTINCT contaminated grams.

    100 TB shape: ONE corpus scan, gram explode is a narrow flatMap
    (no pre-shuffle), the index joins map-side when broadcast, and
    the only exchange is the groupBy over matched grams — a tiny
    fraction of the corpus. ``broadcast_index=False`` falls back to
    a shuffle join (AQE) for index sizes beyond broadcast."""
    grams = corpus.withColumn("__wh", word_hashes(text_col)).select(
        _c(id_col).alias(id_col),
        explode_bag(
            F.array_distinct(ngram_hashes64(F.col("__wh"), n))
        ).alias("gram_hash"),
    )
    rhs = F.broadcast(gram_index) if broadcast_index else gram_index
    return grams.join(rhs, on="gram_hash").groupBy(id_col).agg(
        F.count("*").alias("n_hits")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast_index: bool = True,
) -> DataFrame:
    """Drop every corpus row sharing a word ``n``-gram with
    ``benchmark`` (training-set decontamination). The contaminated id
    set is broadcast into a left-anti join — it is bounded by the
    benchmark's reach, not the corpus."""
    idx = benchmark_gram_index(benchmark, text_col, n)
    bad = contaminated_ids(
        corpus, idx, text_col, id_col, n, broadcast_index
    ).select(id_col)
    return corpus.join(F.broadcast(bad), on=id_col, how="left_anti")


def cross_split_contamination(
    docs: DataFrame,
    split_col: str = "split",
    train_split: str = "train",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast_index: bool = True,
) -> DataFrame:
    """Post-split leakage audit — the release gate after
    :func:`leakage_safe_split` / :func:`decontaminate`: for every
    non-train split, how many of its documents share a word
    ``n``-gram with ANY train document. Returns one row per eval
    split: ``(split, n_docs, n_contaminated, contaminated_frac)``.

    100 TB shape — index the SMALL side: eval splits are benchmark-
    sized while train is the corpus, so the DISTINCT eval gram set
    (bounded like a benchmark suite) broadcasts against ONE train
    scan to find which eval grams occur in train; that matched set
    (smaller still) broadcasts back against the eval grams to flag
    documents. Two scans total, both gram explodes narrow flatMaps,
    no corpus-side shuffle join; the only exchanges are groupBys
    over per-split counts. ``broadcast_index=False`` falls back to
    shuffle joins (AQE) when an eval split outgrows broadcast."""
    eval_docs = docs.where(F.col(split_col) != F.lit(train_split))
    train = docs.where(F.col(split_col) == F.lit(train_split))
    egrams = eval_docs.withColumn("__wh", word_hashes(text_col)).select(
        F.col(split_col),
        _c(id_col).alias(id_col),
        explode_bag(
            F.array_distinct(ngram_hashes64(F.col("__wh"), n))
        ).alias("gram_hash"),
    )
    eval_idx = egrams.select("gram_hash").distinct()
    rhs = F.broadcast(eval_idx) if broadcast_index else eval_idx
    train_grams = train.withColumn("__wh", word_hashes(text_col)).select(
        explode_bag(
            F.array_distinct(ngram_hashes64(F.col("__wh"), n))
        ).alias("gram_hash")
    )
    matched = train_grams.join(rhs, on="gram_hash").distinct()
    mrhs = F.broadcast(matched) if broadcast_index else matched
    hit = (
        egrams.join(mrhs, on="gram_hash")
        .select(split_col, id_col)
        .distinct()
    )
    per_split = eval_docs.groupBy(split_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    hits = hit.groupBy(split_col).agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    nc = F.coalesce("n_contaminated", F.lit(0)).cast("long")
    return per_split.join(hits, on=split_col, how="left").select(
        split_col,
        "n_docs",
        nc.alias("n_contaminated"),
        F.round(nc / F.col("n_docs"), 6).alias("contaminated_frac"),
    )


def minhash_signature(
    text_col: str, num_perm: int = 64, shingle_n: int = 3, seed: int = 13
):
    """MinHash signature as an array<bigint> column, fully native:
    sig[i] = min over shingles of (a_i * h(s) + b_i) mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm)
    b = rng.integers(0, _MERSENNE, num_perm)
    params = F.array(
        *[
            F.struct(F.lit(int(ai)).alias("a"), F.lit(int(bi)).alias("b"))
            for ai, bi in zip(a, b)
        ]
    )
    hashes = shingle_hashes(text_col, shingle_n)
    return F.transform(
        params,
        lambda p: F.array_min(
            F.transform(hashes, lambda h: (p["a"] * h + p["b"]) % F.lit(_MERSENNE))
        ),
    )


def jaccard(text_a, text_b, shingle_n: int = 3):
    """Exact word-shingle Jaccard between two text columns."""
    sa = F.array_distinct(shingles(text_a, shingle_n))
    sb = F.array_distinct(shingles(text_b, shingle_n))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _jaccard_grams(ga, gb):
    """Jaccard over two DISTINCT gram-hash array COLUMNS. Column refs,
    not inline HOF trees, so nothing re-evaluates per access; the
    union comes from |A| + |B| - |A∩B| (one intersect, two sizes)."""
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = F.size(ga).cast("double") + F.size(gb).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _gram_sets(docs: DataFrame, text_col, id_col: str, shingle_n: int) -> DataFrame:
    """(id, distinct gram-hash array) — the verify-side shingle sets.
    Jaccard over these equals string-shingle Jaccard up to xxhash64
    collisions (~|shingles| / 2^31 per doc), and skips re-tokenizing
    text for every candidate pair."""
    return docs.select(
        F.col(id_col),
        F.array_distinct(shingle_hashes(text_col, shingle_n)).alias("__g"),
    )


def minhash_signature_arrow(
    docs: DataFrame,
    text_col: str,
    num_perm: int,
    shingle_n: int,
    seed: int,
    out_col: str = "__sig",
) -> DataFrame:
    """MinHash signatures, hybrid JVM + Arrow: shingle hashing stays
    JVM-side (xxhash64 inside whole-stage codegen); the perm-min
    reduction runs as ONE numpy (perms x hashes) broadcast per Arrow
    batch — ~20x the pure higher-order-function expression, which
    interprets perms x shingles Catalyst ops per row."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm).astype(np.int64)
    b = rng.integers(0, _MERSENNE, num_perm).astype(np.int64)

    def minsig(hash_arrays: pd.Series) -> pd.Series:
        """Whole-batch perm-min: flatten every doc's shingle hashes
        into one vector, apply each permutation once, and read the
        per-doc minima with a segmented reduce — one numpy pass per
        permutation per BATCH instead of one matrix per document."""
        lens = np.fromiter((len(h) for h in hash_arrays), dtype=np.int64,
                           count=len(hash_arrays))
        n = len(lens)
        out = np.full((n, num_perm), _MERSENNE, dtype=np.int64)
        if n and lens.sum():
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in hash_arrays if len(h)]
            )
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            nonempty = lens > 0
            ne_starts = starts[nonempty]
            for i in range(num_perm):
                # a,h < 2^31 so the int64 modmul cannot overflow
                row = (a[i] * flat + b[i]) % _MERSENNE
                out[nonempty, i] = np.minimum.reduceat(row, ne_starts)
        return pd.Series(list(out))

    udf = pandas_udf(minsig, "array<long>")
    # materialize word hashes first: slices of a concrete array column
    # are O(1), while slicing an inline transform(...) re-evaluates it
    return (
        docs.withColumn("__wh", _word_hashes(text_col))
        .withColumn(out_col, udf(_grams_from(F.col("__wh"), shingle_n)))
        .drop("__wh")
    )


def minhash_band_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 13,
    use_arrow: bool = True,
) -> DataFrame:
    """(id, band, bh) LSH bucket rows — the persistable dedup INDEX.

    Write this once per corpus snapshot (parquet, partitioned by band)
    and dedup future increments against it with
    :func:`minhash_dedup_incremental` instead of re-banding the whole
    corpus. Bucket rows carry ONLY (id, band, bh): at corpus scale the
    band exchange must not shuffle document text bands-times per doc —
    texts are re-joined for the (few) surviving candidate pairs.
    The (num_perm, bands, shingle_n, seed) parameters are part of the
    index identity and must match at query time."""
    rows_per_band = num_perm // bands
    if use_arrow:
        sig = minhash_signature_arrow(
            docs.select(id_col, text_col), text_col, num_perm, shingle_n, seed
        )
    else:
        sig = docs.select(
            F.col(id_col),
            F.col(text_col),
            minhash_signature(text_col, num_perm, shingle_n, seed).alias("__sig"),
        )
    return sig.select(
        id_col,
        F.explode(
            F.transform(
                F.array([F.lit(i) for i in range(bands)]),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.hash(
                        F.slice(F.col("__sig"), bi * rows_per_band + 1, rows_per_band)
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))


def minhash_dedup_incremental(
    new_docs: DataFrame,
    index_buckets: DataFrame,
    texts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    seed: int = 13,
) -> DataFrame:
    """Dedup an INCREMENT against an existing corpus index — the
    production ingest flow: band only the new batch, join its buckets
    against the persisted index (plus the new batch itself for
    intra-batch dups), verify survivors with exact Jaccard.

    Cost ~ |new| x bands for banding + the bucket join — independent
    of corpus size except through bucket membership, vs re-banding the
    full corpus every batch.

    ``texts`` must cover every id that can appear in a pair (corpus +
    increment); banding params must match the ones the index was built
    with. Returns (id_a, id_b, jaccard) where at least one side is
    from ``new_docs``."""
    nb = minhash_band_buckets(
        new_docs, text_col, id_col, num_perm, bands, shingle_n, seed
    )
    allb = index_buckets.select(id_col, "band", "bh").unionByName(nb)
    # cap degenerate buckets across index+increment together
    counted = allb.withColumn(
        "__bn", F.count(F.lit(1)).over(W.partitionBy("band", "bh"))
    ).where(F.col("__bn") <= max_bucket)
    new_ids = new_docs.select(F.col(id_col)).distinct()
    a = counted.join(new_ids, on=id_col).select(
        F.col(id_col).alias("__na"), "band", "bh"
    )
    b = counted.select(F.col(id_col).alias("__cb"), "band", "bh")
    cand = (
        a.join(b, on=["band", "bh"])
        .where(F.col("__na") != F.col("__cb"))
        .select(
            F.least("__na", "__cb").alias("id_a"),
            F.greatest("__na", "__cb").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    grams = _gram_sets(texts, text_col, id_col, shingle_n)
    cand = cand.join(
        grams.select(F.col(id_col).alias("id_a"), F.col("__g").alias("__ga")),
        on="id_a",
    ).join(
        grams.select(F.col(id_col).alias("id_b"), F.col("__g").alias("__gb")),
        on="id_b",
    )
    return (
        cand.withColumn("jaccard", _jaccard_grams(F.col("__ga"), F.col("__gb")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _bucket_pairs(rows, *extra_fields):
    """All (i < j) combinations of a sorted bucket-member array as
    ``struct<id_a, id_b, ...extra>`` — the shuffle-free replacement
    for the band-bucket SELF-JOIN: one groupBy materializes each
    bucket once, and pair expansion is a pure HOF over the collected
    (size-capped) member list, so the banding subplan is evaluated
    ONCE instead of once per join side (guide §2.4: remove shuffles
    outright; the window-count cap becomes a size() filter on the
    same aggregate). ``rows`` is array<struct> whose FIRST field is
    the id (array_sort orders by it); ``extra_fields`` are carried
    from both sides as (name_a, name_b) suffix pairs."""

    def combos(x, i):
        return F.transform(
            F.slice(rows, i + F.lit(2), F.size(rows)),
            lambda y: F.struct(
                x["id"].alias("id_a"),
                y["id"].alias("id_b"),
                *[
                    c
                    for fld in extra_fields
                    for c in (
                        x[fld].alias(f"{fld}_a"),
                        y[fld].alias(f"{fld}_b"),
                    )
                ],
            ),
        )

    return F.flatten(F.transform(rows, combos))


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    seed: int = 13,
    use_arrow: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding,
    verified with exact Jaccard >= threshold.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    banded = minhash_band_buckets(
        docs, text_col, id_col, num_perm, bands, shingle_n, seed, use_arrow
    )
    # ONE groupBy materializes each band bucket; the degenerate-bucket
    # cap (boilerplate => quadratic blowup) is a size() filter on the
    # same aggregate, and pair expansion is a HOF over the member
    # list — no window pass, no self-join re-evaluating the signature
    # subplan per side (guide §2.4).
    groups = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"))).alias("__m"))
        .where((F.size("__m") >= 2) & (F.size("__m") <= max_bucket))
    )
    # sorted members materialize as a CONCRETE column before the pair
    # HOFs: an inline array_sort referenced from inside the lambdas
    # would re-sort per element (the element_at re-evaluation trap)
    sorted_groups = groups.select(F.array_sort("__m").alias("__ms"))
    cand = (
        sorted_groups.select(
            F.explode(_bucket_pairs(F.col("__ms"))).alias("p")
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    grams = _gram_sets(docs, text_col, id_col, shingle_n)
    cand = cand.join(
        grams.select(F.col(id_col).alias("id_a"), F.col("__g").alias("__ga")),
        on="id_a",
    ).join(
        grams.select(F.col(id_col).alias("id_b"), F.col("__g").alias("__gb")),
        on="id_b",
    )
    return (
        cand.withColumn("jaccard", _jaccard_grams(F.col("__ga"), F.col("__gb")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs. All-pairs within optional
    blocking column (e.g. ``lang``) — the exact (small-scale /
    verification) counterpart of :func:`minhash_dedup_pairs`.

    Each side's DISTINCT shingle set materializes ONCE before the
    self-join (same lesson as the MinHash gram-set verify: scoring
    per pair over pre-shingled arrays, never re-tokenizing text per
    partner — a doc in a b-doc block would otherwise shingle b
    times)."""
    sel = [F.col(id_col), F.col(text_col)]
    on = []
    if block_col:
        sel.append(F.col(block_col))
        on = [block_col]
    base = docs.select(*sel).withColumn(
        "__sh", F.array_distinct(shingles(F.col(text_col), shingle_n))
    )
    a = base.select(
        *on, F.col(id_col).alias("id_a"), F.col("__sh").alias("__sa")
    )
    b = base.select(
        *on, F.col(id_col).alias("id_b"), F.col("__sh").alias("__sb")
    )
    cand = (a.join(b, on=on) if on else a.crossJoin(b)).where(
        F.col("id_a") < F.col("id_b")
    )
    return (
        cand.withColumn(
            "jaccard", _jaccard_grams(F.col("__sa"), F.col("__sb"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph by iterative
    min-label propagation: each round every node takes the minimum
    label among itself and its neighbours (one join + one groupBy per
    round), with an eager ``localCheckpoint`` to truncate the plan
    lineage. Converges in graph-diameter rounds — near-dup clusters
    are shallow (dup rings, boilerplate stars), so the default bound
    is generous; iteration stops early at a fixpoint.

    Returns (id, cluster) where cluster = min id reachable. At pair
    scale this is all narrow int columns; the pair graph is orders of
    magnitude smaller than the corpus (LSH output), so the per-round
    shuffle is cheap relative to the candidate generation."""
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("v"), "cluster"), on="v"
            )
            .groupBy("u")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_min", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .where(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # the loop exhausted max_iter with labels still moving: a
        # chain longer than max_iter would silently split into several
        # "clusters" each keeping its own survivor — never return
        # wrong components without saying so
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds "
            "(pair-graph diameter exceeds max_iter); raise max_iter"
        )
    return labels


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Keep/drop decision per document from a near-dup pair graph:
    cluster = connected component, survivor = min id in the cluster;
    documents in no pair keep themselves. The standard last step of a
    MinHash/SimHash dedup pipeline."""
    clusters = dedup_clusters(pairs, id_a, id_b, max_iter)
    out = docs.select(F.col(id_col)).join(
        clusters.select(F.col("id").alias(id_col), "cluster"),
        on=id_col,
        how="left",
    )
    cluster = F.coalesce("cluster", F.col(id_col))
    return out.select(
        id_col,
        cluster.alias("cluster"),
        (F.col(id_col) == cluster).alias("keep"),
    )


def _raw_word_hashes(text_col):
    """Full-width xxhash64 per normalized word (JVM-side, whole-stage
    codegen) — deterministic and process-independent."""
    return F.transform(_norm_tokens(text_col), lambda t: F.xxhash64(t))


def _simhash_from_hashes(hash_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash bit-majority over precomputed word hashes: the
    tokenizing + hashing already happened JVM-side; here one segmented
    ``np.add.reduceat`` per bit position per Arrow BATCH (64 linear
    passes over the flattened hash vector — no per-word Python, same
    shape as minhash_signature_arrow's per-perm reduce)."""
    n = len(hash_arrays)
    lens = np.fromiter(
        (0 if h is None else len(h) for h in hash_arrays),
        dtype=np.int64, count=n,
    )
    out = np.zeros(n, dtype=np.int64)
    total = int(lens.sum())
    if n == 0 or total == 0:
        return pd.Series(out)
    flat = np.concatenate(
        [np.asarray(h, dtype=np.int64) for h in hash_arrays
         if h is not None and len(h)]
    ).view(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    nonempty = lens > 0
    ne_starts = starts[nonempty]
    ne_lens = lens[nonempty]
    fps = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    for bpos in range(64):
        bit = ((flat >> np.uint64(bpos)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, ne_starts)
        fps |= np.uint64(1 << bpos) * (2 * ones > ne_lens)
    out[nonempty] = fps.view(np.int64)
    return pd.Series(out)


def simhash_chunk_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """(id, ck, cv, fp) SimHash chunk rows — the persistable index
    (pigeonhole over ``max_hamming + 1`` near-equal bit-chunks of the
    64-bit fingerprint: any pair within the hamming budget must agree
    on >=1 chunk — exact, not probabilistic). ``max_hamming`` is part
    of the index identity."""
    n_chunks = max_hamming + 1
    if n_chunks < 1 or n_chunks > 16:
        raise ValueError("max_hamming must be in [0, 15]")
    # chunk bit-boundaries: n_chunks near-equal slices of the 64 bits
    bounds = [round(64 * i / n_chunks) for i in range(n_chunks + 1)]
    # built lazily: pandas_udf parses its DDL type against the active session
    simhash64 = pandas_udf(_simhash_from_hashes, "long")
    fp = docs.select(
        F.col(id_col), simhash64(_raw_word_hashes(text_col)).alias("fp")
    )
    return fp.select(
        id_col,
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ck"),
                        (
                            F.col("fp")
                            if bounds[i + 1] - bounds[i] >= 64
                            else F.shiftrightunsigned("fp", bounds[i]).bitwiseAND(
                                F.lit((1 << (bounds[i + 1] - bounds[i])) - 1)
                            )
                        ).alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "fp", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))


def simhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole chunk banding (see
    simhash_chunk_index), verified by exact hamming distance.
    Degenerate chunk buckets (boilerplate corpora share chunk values)
    are capped at ``max_bucket`` members, same as the MinHash band
    join, to keep the candidate join from going quadratic at corpus
    scale."""
    chunks = simhash_chunk_index(docs, text_col, id_col, max_hamming)
    # ONE groupBy per chunk bucket (cap = size() filter, mirror of the
    # MinHash band cap) + HOF pair expansion — replaces the window
    # count and the self-join that re-evaluated the fingerprint UDF
    # subplan once per join side (guide §2.4).
    groups = (
        chunks.groupBy("ck", "cv")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("fp").alias("fp"))
            ).alias("__m")
        )
        .where((F.size("__m") >= 2) & (F.size("__m") <= max_bucket))
    )
    # Pair expansion + hamming filter run as ONE numpy pass per
    # bucket (mapInPandas over the collected member lists): pairwise
    # XOR outer product + 16-bit-LUT popcount, emitting only pairs
    # within the hamming budget. The earlier HOF formulation paid 17M
    # INTERPRETED Catalyst lambda ops on the sf1.0 corpus (~2 s);
    # vectorized XOR/popcount over the same 17M candidate pairs is
    # tens of ms, and only near-dup pairs ever become rows (guide
    # §2.3/§4.2 — filter before you shuffle, batch work into numpy).
    # This path already carries a pandas UDF (the fingerprint
    # bit-majority), so no Python-free plan shape is lost.
    id_type = [
        f.dataType.elementType["id"].dataType.simpleString()
        for f in groups.schema.fields
        if f.name == "__m"
    ][0]
    # primitive id/fp arrays (not struct lists): Arrow then hands the
    # Python side numpy arrays directly — the per-element dict access
    # of a struct list measured ~40% of this stage
    prim = groups.select(
        F.transform("__m", lambda e: e["id"]).alias("__ids"),
        F.transform("__m", lambda e: e["fp"]).alias("__fps"),
    )

    def _pairs(batches):
        lut = np.unpackbits(
            np.arange(65536, dtype=np.uint16).view(np.uint8)
        ).reshape(65536, 16).sum(axis=1).astype(np.uint16)

        for pdf in batches:
            out_a, out_b, out_h = [], [], []
            for ids, fps in zip(pdf["__ids"], pdf["__fps"]):
                ids = np.asarray(ids)
                fps = np.asarray(fps, dtype=np.int64).view(np.uint64)
                order = np.argsort(ids, kind="stable")
                ids, fps = ids[order], fps[order]
                x = np.bitwise_xor.outer(fps, fps)
                pc = lut[x.view(np.uint16).reshape(len(ids), len(ids), 4)
                         ].sum(axis=2)
                iu, ju = np.triu_indices(len(ids), k=1)
                keep = pc[iu, ju] <= max_hamming
                if keep.any():
                    out_a.append(ids[iu[keep]])
                    out_b.append(ids[ju[keep]])
                    out_h.append(pc[iu[keep], ju[keep]].astype(np.int32))
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "hamming": np.concatenate(out_h),
                    }
                )

    pairs = prim.mapInPandas(
        _pairs, f"id_a {id_type}, id_b {id_type}, hamming int"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


def simhash_dedup_incremental(
    new_docs: DataFrame,
    index_chunks: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Dedup an increment against a persisted SimHash chunk index
    (simhash_chunk_index output): chunk only the new batch, join its
    buckets against index+increment, verify by exact hamming — the
    fingerprints travel with the index, so unlike the MinHash form no
    text re-join is needed. ``max_hamming`` must match the index.
    Returns (id_a, id_b, hamming) where at least one side is new."""
    nb = simhash_chunk_index(new_docs, text_col, id_col, max_hamming)
    allc = index_chunks.select(id_col, "fp", "ck", "cv").unionByName(nb)
    counted = allc.withColumn(
        "__bn", F.count(F.lit(1)).over(W.partitionBy("ck", "cv"))
    ).where(F.col("__bn") <= max_bucket)
    new_ids = new_docs.select(F.col(id_col)).distinct()
    a = counted.join(new_ids, on=id_col).select(
        F.col(id_col).alias("__na"), F.col("fp").alias("__fa"), "ck", "cv"
    )
    b = counted.select(
        F.col(id_col).alias("__cb"), F.col("fp").alias("__fb"), "ck", "cv"
    )
    cand = (
        a.join(b, on=["ck", "cv"])
        .where(F.col("__na") != F.col("__cb"))
        .select(
            F.least("__na", "__cb").alias("id_a"),
            F.greatest("__na", "__cb").alias("id_b"),
            F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.where(F.col("hamming") <= max_hamming)
