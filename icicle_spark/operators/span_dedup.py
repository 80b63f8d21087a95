"""Repeated-substring (span-level) deduplication.

Doc-level dedup (``operators/dedup.py``) drops whole near-duplicate
documents; this module removes *duplicated spans inside otherwise
unique documents* at the substring granularity of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better",
arXiv 2107.06499). It is the KEEP-ONE-COPY complement of
``dedup.substring_dedup``: that operator drops every occurrence of a
duplicated run (boilerplate removal — its docstring notes the paper's
keep-one policy as omitted for shuffle determinism), while this one
implements the paper's actual policy by making the kept copy
deterministic — the lexicographically smallest ``(doc_id, pos)``
occurrence survives, independent of partitioning. Policy, fully
oracle-expressible:

* a word n-gram is *duplicated* when it occurs in >= ``min_docs``
  distinct documents;
* for each duplicated gram exactly ONE occurrence survives — the
  lexicographically smallest ``(doc_id, pos)`` (the canonical copy);
* every other occurrence marks its ``n`` covered token positions for
  removal; overlapping spans union naturally;
* a document's cleaned text keeps its tokens in order minus the
  covered positions (a surviving occurrence's tokens can still fall
  to a different overlapping removed span — union semantics).

The reference engine has no substring dedup; this extends the
training-data curation surface (SURVEY.md §2.11) alongside exact /
MinHash / SimHash document dedup.

100 TB shape: ONE corpus-sized exchange (groupBy gram over the
exploded occurrences, map-side combined); the duplicated-gram index
is bounded by the corpus's *duplicated* distinct grams and joins back
broadcast (``broadcast_index=False`` falls back to a shuffle join);
the covered-position explode is bounded by ``n x`` removed
occurrences, not corpus size. At scale use ``key="hash"`` — 62-bit
rolling-polynomial gram ids over per-word hashes (shared with
``dedup.ngram_hashes64``) so no gram *strings* ever materialize in
the shuffle; ``key="exact"`` keeps string grams for cross-engine
oracle checks. A pytest pins hash/exact agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from icicle_spark.operators.dedup import (
    _norm_tokens,
    explode_bag,
    ngram_hashes64,
    zip_pos,
)


def _exact_gram_array(ws, n: int):
    """Array of n-gram strings, element j = words j+1..j+n joined
    (empty for docs shorter than ``n`` words). ``sequence`` is
    guarded: Spark's ``sequence(1, 0)`` counts DOWN, so the empty
    case must short-circuit to a typed empty array."""
    m = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(ws, i, n), " "))


def _word_hashes_col(ws):
    """Per-word 31-bit hashes over an already-tokenized array (the
    array-input twin of dedup._word_hashes, same formula)."""
    return F.transform(
        ws, lambda w: F.pmod(F.xxhash64(w), F.lit(2147483647))
    )


def span_occurrences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    key: str = "exact",
) -> DataFrame:
    """``(id_col, pos, gram)`` — one row per word n-gram occurrence.
    ``pos`` is the 1-based start position in the normalized word
    sequence (:func:`dedup._norm_tokens` tokens). ``key="hash"``
    swaps gram strings for 62-bit rolling-polynomial ids
    (:func:`dedup.ngram_hashes64`) with the short-doc whole-text
    fallback suppressed — a span operator must never emit a gram for
    a doc shorter than ``n`` words, or removal would cover positions
    past the document's end. Word hashes are materialized in their
    own projection first (dedup.word_hashes documents the 2x
    re-evaluation trap of inlining them under the polynomial
    slices)."""
    ws = docs.select(
        F.col(id_col), _norm_tokens(F.col(text_col)).alias("ws")
    )
    if key == "exact":
        garr = _exact_gram_array(F.col("ws"), n)
    elif key == "hash":
        ws = ws.select(
            id_col, "ws", _word_hashes_col(F.col("ws")).alias("wh")
        )
        garr = F.when(
            F.size("ws") < n, F.array().cast("array<long>")
        ).otherwise(ngram_hashes64(F.col("wh"), n))
    else:
        raise ValueError(f"key must be 'exact' or 'hash', got {key!r}")
    # zip_pos pins the gram array's materialization: a plain
    # posexplode re-evaluates the inline gram construction per
    # emitted element (see dedup.zip_pos)
    return ws.select(
        id_col, F.explode(zip_pos(garr)).alias("__z")
    ).select(
        id_col,
        (F.col("__z.p") + 1).alias("pos"),
        F.col("__z.v").alias("gram"),
    )


def _index_from_occ(occ: DataFrame, id_col: str) -> DataFrame:
    """``(gram, n_docs, keeper)`` from an occurrence frame — one
    map-side-combined exchange on the gram key."""
    return occ.groupBy("gram").agg(
        F.count_distinct(id_col).alias("n_docs"),
        F.min(
            F.struct(
                F.col(id_col).alias("kid"), F.col("pos").alias("kpos")
            )
        ).alias("keeper"),
    )


def duplicated_span_index(
    occ: DataFrame, id_col: str = "doc_id", min_docs: int = 2
) -> DataFrame:
    """Duplicated-gram index ``(gram, n_docs, keeper)`` from an
    occurrence frame: grams present in >= ``min_docs`` distinct docs,
    with the canonical (minimal ``(doc_id, pos)``) occurrence."""
    return _index_from_occ(occ, id_col).filter(
        F.col("n_docs") >= min_docs
    )


def _apply_removals(
    docs: DataFrame,
    occ: DataFrame,
    dup: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    broadcast_index: bool,
) -> DataFrame:
    """Shared tail of the full and incremental strips: join the
    occurrences against a ``(gram, keeper)`` duplicated-gram index,
    drop the keeper occurrence, union covered positions per doc, and
    rebuild cleaned text."""
    if broadcast_index:
        dup = F.broadcast(dup)
    removed = occ.join(dup, "gram", "inner").filter(
        ~(
            (F.col(id_col) == F.col("keeper.kid"))
            & (F.col("pos") == F.col("keeper.kpos"))
        )
    )
    covered = (
        removed.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("cp"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("cp").alias("cov"))
    )
    return _rebuild_from_covered(docs, covered, text_col, id_col)


def _rebuild_from_covered(
    docs: DataFrame, covered: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Rebuild cleaned text from a ``(id_col, cov)`` covered-position
    frame (1-based token positions to drop, as a set array)."""
    base = docs.select(
        F.col(id_col), _norm_tokens(F.col(text_col)).alias("ws")
    )
    # gap-slice rebuild (same pattern as substring_dedup's tail):
    # O(tokens + |covered| log |covered|) per doc instead of the
    # per-token array_contains scan, which is O(tokens x |covered|)
    nw = F.size("ws")
    bounds = F.concat(
        F.array(F.lit(0)), F.array_sort("cov"), F.array(nw + F.lit(1))
    )
    m = F.size(bounds)
    gaps = F.flatten(
        F.zip_with(
            F.slice(bounds, 1, m - 1),
            F.slice(bounds, 2, m - 1),
            lambda a, b: F.slice(
                "ws", a + 1, F.greatest(b - a - 1, F.lit(0))
            ),
        )
    )
    kept = F.when(F.col("cov").isNull(), F.col("ws")).otherwise(gaps)
    return base.join(covered, id_col, "left").select(
        id_col,
        F.size("ws").alias("n_words"),
        (F.size("ws") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("cleaned"),
    )


def strip_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    key: str = "exact",
    broadcast_index: bool = True,
) -> DataFrame:
    """Remove corpus-wide duplicated word n-gram spans, keeping one
    canonical occurrence per gram (module docstring has the policy).
    Returns ``(id_col, n_words, n_removed, cleaned)`` for EVERY input
    document (untouched docs report ``n_removed = 0``)."""
    if key == "exact":
        # Hash-prefiltered exact plan (guide §2.3 "shuffle keys and
        # metadata instead of payloads"): ONE corpus-sized exchange
        # carries 8-byte rolling-polynomial gram ids, never gram
        # STRINGS. Every occurrence of an exactly-duplicated gram is
        # a hash candidate (the id is a deterministic function of the
        # gram), so rebuilding exact gram strings ONLY at candidate
        # positions and re-aggregating those gives the identical
        # (gram, n_docs, keeper) policy — hash collisions merely add
        # candidates that the exact re-aggregation then drops or
        # groups correctly. The exact stage computes keeper and the
        # removed occurrences inside one aggregation (array_min /
        # filter over the collected occurrence list — n_docs and the
        # min-(doc_id,pos) keeper exactly as _index_from_occ defines
        # them), so no occurrence frame is ever evaluated twice.
        # Pass 1 — candidate grams by TOTAL occurrence count: a plain
        # 8-byte-key HashAggregate with map-side combine (no
        # positions, no count_distinct expand, no occurrence-list
        # collect). total count >= min_docs is a SUPERSET of
        # n_docs >= min_docs (n_docs <= count), and the exact-string
        # re-aggregation below applies the true distinct-doc policy,
        # so the extra intra-doc-repeat candidates change nothing.
        ws_h = docs.select(
            _norm_tokens(F.col(text_col)).alias("ws")
        ).select("ws", _word_hashes_col(F.col("ws")).alias("wh"))
        garr_h = F.when(
            F.size("ws") < n, F.array().cast("array<long>")
        ).otherwise(ngram_hashes64(F.col("wh"), n))
        cand = (
            ws_h.select(explode_bag(garr_h).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .where(F.col("__cnt") >= min_docs)
            .select("gram")
        )
        # Pass 2 — positions for candidate occurrences only
        occ_h = span_occurrences(docs, text_col, id_col, n, "hash")
        cand_pos = (
            occ_h.join(F.broadcast(cand), "gram")
            .groupBy(id_col)
            .agg(F.collect_set("pos").alias("__cps"))
        )
        ws_docs = docs.select(
            F.col(id_col), _norm_tokens(F.col(text_col)).alias("ws")
        )
        occ_exact = (
            ws_docs.join(F.broadcast(cand_pos), id_col)
            .select(id_col, F.explode("__cps").alias("pos"), F.col("ws"))
            .select(
                id_col,
                "pos",
                F.array_join(F.slice("ws", F.col("pos"), n), " ").alias(
                    "gram"
                ),
            )
        )
        g = (
            occ_exact.groupBy("gram")
            .agg(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("kid"), F.col("pos").alias("kpos")
                    )
                ).alias("os")
            )
            .where(
                F.size(
                    F.array_distinct(F.transform("os", lambda o: o["kid"]))
                )
                >= min_docs
            )
            # keeper materializes as its own column: an inline
            # array_min referenced from the filter lambda would
            # re-scan per element
            .withColumn("__kp", F.array_min("os"))
        )
        removed = g.select(
            F.explode(
                F.filter("os", lambda o: ~(o == F.col("__kp")))
            ).alias("o")
        ).select(F.col("o.kid").alias(id_col), F.col("o.kpos").alias("pos"))
        covered = (
            removed.select(
                id_col,
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
                ).alias("cp"),
            )
            .groupBy(id_col)
            .agg(F.collect_set("cp").alias("cov"))
        )
        return _rebuild_from_covered(docs, covered, text_col, id_col)
    occ = span_occurrences(docs, text_col, id_col, n, key)
    dup = duplicated_span_index(occ, id_col, min_docs).select(
        "gram", "keeper"
    )
    return _apply_removals(
        docs, occ, dup, text_col, id_col, n, broadcast_index
    )


def span_gram_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    key: str = "hash",
) -> DataFrame:
    """UNFILTERED keep-one span index ``(gram, n_docs, keeper)`` —
    the persistable state behind incremental span dedup (parquet it
    per corpus snapshot; the dedup.line/gram_hash_counts contract).
    ``n_docs`` is exact across refreshes because increments carry
    disjoint doc ids, so distinct-doc counts ADD under
    :func:`merge_span_index`; the canonical keeper merges as a plain
    min. Bounded by distinct grams, not corpus size."""
    return _index_from_occ(
        span_occurrences(docs, text_col, id_col, n, key), id_col
    )


def merge_span_index(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two span indexes (disjoint doc-id sets) into one."""
    return (
        a.unionByName(b)
        .groupBy("gram")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.min("keeper").alias("keeper"),
        )
    )


def strip_repeated_spans_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    key: str = "hash",
    broadcast_index: bool = True,
) -> DataFrame:
    """Keep-one span dedup of an INCREMENT against a persisted
    :func:`span_gram_index` — cost scales with the increment plus
    the touched index slice, never the stored corpus. Exactly equal
    to re-running :func:`strip_repeated_spans` over stored+new and
    keeping the new docs' rows (pytest-pinned), provided increment
    doc ids are disjoint from stored ones: distinct-doc counts add
    and the stored keeper stays the global min when stored ids sort
    first. Returns the stripped increment; persist
    ``merge_span_index(index, span_gram_index(new_docs, ...))`` as
    the next snapshot's index."""
    occ = span_occurrences(new_docs, text_col, id_col, n, key)
    idx_new = _index_from_occ(occ, id_col)
    # only grams the increment touches matter: semi-join the stored
    # index down to the increment's gram set before merging
    touched = index.join(
        idx_new.select("gram"), "gram", "left_semi"
    )
    dup = (
        merge_span_index(touched, idx_new)
        .filter(F.col("n_docs") >= min_docs)
        .select("gram", "keeper")
    )
    return _apply_removals(
        new_docs, occ, dup, text_col, id_col, n, broadcast_index
    )
