"""Dedup operator semantics on planted duplicates.

Pins the SimHash rework (JVM word hashes + segmented numpy bit-vote):
the pigeonhole banding must be EXACT for hamming <= max_hamming — every
such pair surfaces (verified against brute-force hamming over the
fingerprints) — and the degenerate-bucket cap must bound candidate
growth on boilerplate corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from icicle_spark.operators.dedup import (
    _raw_word_hashes,
    _simhash_from_hashes,
    exact_dedup,
    minhash_dedup_pairs,
    simhash_dedup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    vocab = BASE.split()
    rows = []
    # 0/1: exact dup; 2: near dup of 0 (one word changed); 3..22 random
    rows.append((0, BASE))
    rows.append((1, BASE))
    rows.append((2, BASE.replace("windowsill", "doorstep")))
    for i in range(3, 23):
        rows.append((i, " ".join(rng.choice(vocab, size=30))))
    # 100..109: identical boilerplate block (bucket-cap fodder)
    for i in range(100, 110):
        rows.append((i, "lorem ipsum dolor sit amet " * 6))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).cache()


def _fingerprints(docs_df) -> pd.DataFrame:
    simhash64 = pandas_udf(_simhash_from_hashes, "long")
    return docs_df.select(
        "doc_id", simhash64(_raw_word_hashes("text")).alias("fp")
    ).toPandas()


def test_exact_dedup_keeps_one_per_text(docs):
    kept = exact_dedup(docs).toPandas()
    # 0/1 collapse to one; the 10 boilerplate docs collapse to one
    assert len(kept) == 33 - 1 - 9
    assert 0 in set(kept["doc_id"]) and 1 not in set(kept["doc_id"])


def test_minhash_finds_planted_near_dup(docs):
    pairs = minhash_dedup_pairs(docs, threshold=0.5).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got


def test_simhash_banding_is_exact_for_hamming_budget(docs):
    fp = _fingerprints(docs)
    f = dict(zip(fp["doc_id"], fp["fp"]))
    ids = sorted(f)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((f[a] ^ f[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got_df = simhash_dedup_pairs(docs, max_bucket=10_000).toPandas()
    got = set(map(tuple, got_df[["id_a", "id_b"]].values))
    assert got == expected
    assert (0, 1) in got  # exact dup -> hamming 0
    # reported hamming agrees with brute force
    for _, r in got_df.iterrows():
        bf = bin((f[r["id_a"]] ^ f[r["id_b"]]) & ((1 << 64) - 1)).count("1")
        assert r["hamming"] == bf


def test_simhash_bucket_cap_suppresses_degenerate_buckets(docs):
    # the 10 identical boilerplate docs put >cap members in every chunk
    # bucket; with a tiny cap those pairs must be dropped, while the
    # planted near-dup trio (bucket size 3) survives
    pairs = simhash_dedup_pairs(docs, max_bucket=5).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert not any(a >= 100 and b >= 100 for a, b in got)
    assert (0, 1) in got


def test_simhash_wider_hamming_budget_is_superset(docs):
    p3 = simhash_dedup_pairs(docs, max_hamming=3, max_bucket=10_000).toPandas()
    p5 = simhash_dedup_pairs(docs, max_hamming=5, max_bucket=10_000).toPandas()
    s3 = set(map(tuple, p3[["id_a", "id_b"]].values))
    s5 = set(map(tuple, p5[["id_a", "id_b"]].values))
    assert s3 <= s5


def test_dedup_clusters_union_find_oracle(spark):
    """Min-label propagation == python union-find on a random sparse
    graph (includes a path component, which needs diameter rounds)."""
    from icicle_spark.operators.dedup import dedup_clusters

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (40, 2)) if a != b]
    edges += [(200 + i, 201 + i) for i in range(8)]  # path of 9 nodes
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["id_a", "id_b"])
    )
    got = dedup_clusters(pairs).toPandas()
    # union-find oracle
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id per component
    comp: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp[r] = min(comp.get(r, n), n)
    expect = {n: comp[find(n)] for n in parent}
    assert dict(zip(got["id"], got["cluster"])) == expect


def test_dedup_clusters_raises_on_non_convergence(spark):
    """A chain longer than max_iter must raise, not silently return
    split components each keeping its own survivor (round-2 ADVICE)."""
    from icicle_spark.operators.dedup import dedup_clusters

    path = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(6)], columns=["id_a", "id_b"])
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(path, max_iter=2)
    # and a generous bound still converges to one component
    ok = dedup_clusters(path, max_iter=10).toPandas()
    assert set(ok["cluster"]) == {0}


def test_dedup_survivors_keep_semantics(spark, docs):
    from icicle_spark.operators.dedup import dedup_survivors, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    surv = dedup_survivors(docs, pairs).toPandas().set_index("doc_id")
    # the planted trio 0/1/2 is one cluster surviving as 0
    assert surv.loc[0, "keep"] and not surv.loc[1, "keep"]
    assert surv.loc[1, "cluster"] == 0 and surv.loc[2, "cluster"] == 0
    # unpaired docs keep themselves
    lonely = surv[surv["cluster"] == surv.index]
    assert lonely["keep"].all()
    # exactly one survivor per cluster
    per = surv.groupby("cluster")["keep"].sum()
    assert (per == 1).all()


def test_minhash_incremental_matches_full(spark, docs):
    """Banding only the increment against a persisted index yields
    exactly the full-corpus pairs that touch the increment."""
    from icicle_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_dedup_incremental,
        minhash_dedup_pairs,
    )

    old = docs.where(F.col("doc_id") != 2)   # corpus without one near-dup
    new = docs.where(F.col("doc_id") == 2)   # the increment
    index = minhash_band_buckets(old)        # persisted once
    inc = minhash_dedup_incremental(
        new, index, texts=docs, threshold=0.5
    ).toPandas()
    full = minhash_dedup_pairs(docs, threshold=0.5).toPandas()
    touching = {
        (a, b)
        for a, b in map(tuple, full[["id_a", "id_b"]].values)
        if a == 2 or b == 2
    }
    got = set(map(tuple, inc[["id_a", "id_b"]].values))
    assert got == touching
    assert (0, 2) in got and (1, 2) in got


def test_simhash_incremental_matches_full(spark, docs):
    from icicle_spark.operators.dedup import (
        simhash_chunk_index,
        simhash_dedup_incremental,
        simhash_dedup_pairs,
    )

    old = docs.where(F.col("doc_id") != 1)
    new = docs.where(F.col("doc_id") == 1)
    index = simhash_chunk_index(old)
    inc = simhash_dedup_incremental(new, index, max_bucket=10_000).toPandas()
    full = simhash_dedup_pairs(docs, max_bucket=10_000).toPandas()
    touching = {
        (a, b)
        for a, b in map(tuple, full[["id_a", "id_b"]].values)
        if a == 1 or b == 1
    }
    got = set(map(tuple, inc[["id_a", "id_b"]].values))
    assert got == touching
    assert (0, 1) in got  # the exact dup pair


def test_decontaminate_flags_ngram_overlap(spark):
    from icicle_spark.operators.dedup import (
        benchmark_gram_index,
        contaminated_ids,
        decontaminate,
    )

    bench = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [900, 901],
                "text": [
                    "What is the capital of France? Paris is the capital.",
                    "short answer",  # < n words: whole text is the gram
                ],
            }
        )
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    # contains an exact 8-gram of bench doc 900
                    "trivia time what is the capital of france paris "
                    "is the answer everyone knows",
                    # same words, different order: no shared 8-gram
                    "paris capital the of what france is answer",
                    # exact short match (whole-text gram rule)
                    "Short ANSWER!",
                    "completely unrelated text about gardening and soil",
                ],
            }
        )
    )
    idx = benchmark_gram_index(bench, "text", n=8)
    hits = (
        contaminated_ids(corpus, idx, "text", "doc_id", n=8)
        .toPandas().set_index("doc_id")
    )
    assert set(hits.index) == {1, 3}
    assert hits.loc[1, "n_hits"] >= 1 and hits.loc[3, "n_hits"] == 1
    # broadcast and shuffle modes agree
    hits2 = (
        contaminated_ids(corpus, idx, "text", "doc_id", n=8,
                         broadcast_index=False)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert hits.sort_index().equals(hits2)
    clean = decontaminate(corpus, bench, "text", "doc_id", n=8)
    assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [2, 4]


# ----------------------------------------------------------- line dedup


def _line_docs(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "COOKIE BANNER\nreal prose one\nCOOKIE BANNER\n"
                    "footer (c) 2026",
                    "real prose two\nfooter (c) 2026",
                    "COOKIE BANNER",   # becomes empty
                    "unique only",     # untouched
                    "",                # stays empty, n_removed 0
                ],
            }
        )
    )


def test_line_dedup_removes_corpus_repeated_lines(spark):
    from icicle_spark.operators.dedup import line_dedup

    out = {
        r.doc_id: (r.text, r.n_removed)
        for r in line_dedup(_line_docs(spark)).collect()
    }
    assert out == {
        0: ("real prose one", 3),   # both banner copies + footer
        1: ("real prose two", 1),
        2: ("", 1),
        3: ("unique only", 0),
        4: ("", 0),
    }


def test_line_dedup_strategies_agree(spark):
    """broadcast_set (zero corpus shuffle) and positions (per-doc
    removal lists) are the same operator at two scales."""
    from icicle_spark.operators.dedup import line_dedup

    docs = _line_docs(spark)
    a = {
        r.doc_id: (r.text, r.n_removed)
        for r in line_dedup(docs, strategy="broadcast_set").collect()
    }
    b = {
        r.doc_id: (r.text, r.n_removed)
        for r in line_dedup(docs, strategy="positions").collect()
    }
    assert a == b


def test_line_dedup_min_count_and_delim(spark):
    import pandas as pd

    from icicle_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a|b|c", "b|d", "b|e"],
            }
        )
    )
    # b repeats 3x: survives min_count=4, drops at min_count=3
    keep = {
        r.doc_id: r.text
        for r in line_dedup(docs, delim="|", min_count=4).collect()
    }
    assert keep == {0: "a|b|c", 1: "b|d", 2: "b|e"}
    drop = {
        r.doc_id: r.text
        for r in line_dedup(docs, delim="|", min_count=3).collect()
    }
    assert drop == {0: "a|c", 1: "d", 2: "e"}


def test_line_dedup_guard_raises_on_oversized_set(spark):
    import pytest as _pytest

    from icicle_spark.operators.dedup import line_dedup

    docs = _line_docs(spark)
    with _pytest.raises(Exception, match="exceeds|positions"):
        line_dedup(docs, max_dup_lines=1).collect()


def test_line_dedup_broadcast_plan_shape(spark):
    """broadcast_set: the corpus side of the plan has NO exchange —
    only the dup-set aggregation shuffles (tiny), and it arrives via
    a broadcast join."""
    from icicle_spark.operators.dedup import line_dedup

    plan = line_dedup(_line_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def _ss_docs(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "intro words then the quick brown fox jumps over"
                    " the end",
                    "totally unique content here",
                    "short dup",   # < k tokens: whole-text gram
                    "short dup",
                ],
            }
        )
    )


def test_substring_dedup_merges_overlapping_spans(spark):
    """The duplicated 7-token run is three overlapping dup 5-grams;
    their union (a maximal span) is removed from BOTH docs, and
    whole-text grams catch short exact dups."""
    from icicle_spark.operators.dedup import substring_dedup

    out = {
        r.doc_id: (r.text, r.n_removed)
        for r in substring_dedup(_ss_docs(spark), k=5).collect()
    }
    assert out == {
        0: ("lazy dog", 7),
        1: ("intro words then end", 7),
        2: ("totally unique content here", 0),
        3: ("", 2),
        4: ("", 2),
    }


def test_substring_dedup_strategies_agree(spark):
    from icicle_spark.operators.dedup import substring_dedup

    docs = _ss_docs(spark)
    a = {
        r.doc_id: (r.text, r.n_removed)
        for r in substring_dedup(
            docs, k=5, strategy="broadcast_set"
        ).collect()
    }
    b = {
        r.doc_id: (r.text, r.n_removed)
        for r in substring_dedup(
            docs, k=5, strategy="positions"
        ).collect()
    }
    assert a == b


def test_substring_dedup_min_count_and_intra_doc_repeats(spark):
    """min_count counts OCCURRENCES (a doc repeating its own phrase
    counts twice), and raising min_count keeps borderline grams."""
    import pandas as pd

    from icicle_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "spam spam spam spam eggs",  # 'spam spam' x3
                    "fresh prose only",
                ],
            }
        )
    )
    out = {
        r.doc_id: (r.text, r.n_removed)
        for r in substring_dedup(docs, k=2, min_count=3).collect()
    }
    # grams: (spam,spam) x3 >= 3 -> tokens 0..3 removed; (spam,eggs)
    # occurs once -> 'eggs' survives
    assert out[0] == ("eggs", 4)
    assert out[1] == ("fresh prose only", 0)


def test_substring_dedup_guard_raises_on_oversized_set(spark):
    import pytest as _pytest

    from icicle_spark.operators.dedup import substring_dedup

    with _pytest.raises(Exception, match="exceeds|positions"):
        substring_dedup(
            _ss_docs(spark), k=5,
            strategy="broadcast_set", max_dup_grams=1,
        ).collect()


def test_substring_dedup_plan_shapes(spark):
    """broadcast_set: dup set arrives as one broadcast array row and
    the corpus NEVER joins by shuffle. positions: gram MEMBERSHIP is
    a broadcast hash join (probe cost independent of dup-set size);
    the only shuffled join is the per-doc position list re-joining
    the corpus on id (co-partitioned, corpus-cardinality — correct at
    scale)."""
    from icicle_spark.operators.dedup import substring_dedup

    bp = substring_dedup(
        _ss_docs(spark), k=5, strategy="broadcast_set"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in bp
    assert "SortMergeJoin" not in bp
    pp = substring_dedup(
        _ss_docs(spark), k=5, strategy="positions"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pp


def _py_substring_dedup(texts, k, min_count=2):
    """Pure-Python reference for substring_dedup semantics."""
    import re as _re

    toks = {
        i: [t for t in _re.split(r"[^a-z0-9]+", s.lower()) if t]
        for i, s in texts.items()
    }
    freq: dict = {}
    per_doc = {}
    for i, ws in toks.items():
        gs = (
            [tuple(ws[p : p + k]) for p in range(len(ws) - k + 1)]
            if len(ws) >= k
            else [tuple(ws)]
        )
        per_doc[i] = gs
        for gr in gs:
            freq[gr] = freq.get(gr, 0) + 1
    out = {}
    for i, ws in toks.items():
        flags = [freq[gr] >= min_count for gr in per_doc[i]]
        g = len(flags)
        kept, rm = [], 0
        for t in range(len(ws)):
            if any(flags[max(0, t - k + 1) : min(t, g - 1) + 1]):
                rm += 1
            else:
                kept.append(ws[t])
        out[i] = (" ".join(kept), rm)
    return out


def test_substring_dedup_random_parity_with_python_reference(spark):
    """Seeded random corpora (tiny vocab => dense duplication,
    lengths straddling k, empty docs): both strategies match a
    pure-Python span-marking reference exactly."""
    import random

    import pandas as pd

    from icicle_spark.operators.dedup import substring_dedup

    rng = random.Random(1789)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for k in (2, 3, 5):
        texts = {
            i: " ".join(
                rng.choice(vocab) for _ in range(rng.randint(0, 14))
            )
            for i in range(30)
        }
        docs = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": list(texts), "text": list(texts.values())}
            )
        )
        want = _py_substring_dedup(texts, k)
        for strat in ("broadcast_set", "positions"):
            got = {
                r.doc_id: (r.text, r.n_removed)
                for r in substring_dedup(docs, k=k, strategy=strat).collect()
            }
            assert got == want, (k, strat)


def test_line_dedup_incremental_matches_full(spark):
    """Cleaning a new batch against the persisted line-count index of
    the stored corpus == what a full-corpus run does to those same
    documents (the dup set is the merged counts either way)."""
    import pandas as pd

    from icicle_spark.operators.dedup import (
        line_dedup,
        line_hash_counts,
        merge_hash_counts,
    )

    old = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["COOKIE BANNER\nold prose", "old other\nfooter"],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [2, 3],
                # COOKIE BANNER dups vs OLD corpus; 'fresh line' dups
                # only WITHIN the increment
                "text": [
                    "COOKIE BANNER\nfresh line\nnew prose",
                    "fresh line\nmore new",
                ],
            }
        )
    )
    idx = line_hash_counts(old)
    inc = {
        r.doc_id: (r.text, r.n_removed)
        for r in line_dedup(new, index=idx).collect()
    }
    full = {
        r.doc_id: (r.text, r.n_removed)
        for r in line_dedup(old.unionByName(new)).collect()
        if r.doc_id >= 2
    }
    assert inc == full
    assert inc[2] == ("new prose", 2)
    # and the refreshed index equals counting the whole corpus
    merged = {
        r.line_hash: r.n_occurrences
        for r in merge_hash_counts(
            line_hash_counts(new), idx, "line_hash"
        ).collect()
    }
    whole = {
        r.line_hash: r.n_occurrences
        for r in line_hash_counts(old.unionByName(new)).collect()
    }
    assert merged == whole


def test_substring_dedup_incremental_matches_full(spark):
    import pandas as pd

    from icicle_spark.operators.dedup import (
        gram_hash_counts,
        substring_dedup,
    )

    old = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": [
                    "the quick brown fox jumps high",
                    "unrelated stored material here",
                ],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [2, 3],
                "text": [
                    "intro the quick brown fox outro",  # dup vs OLD
                    "repeat me now repeat me now",      # dup within
                ],
            }
        )
    )
    idx = gram_hash_counts(old, k=3)
    for strat in ("broadcast_set", "positions"):
        inc = {
            r.doc_id: (r.text, r.n_removed)
            for r in substring_dedup(
                new, k=3, index=idx, strategy=strat
            ).collect()
        }
        full = {
            r.doc_id: (r.text, r.n_removed)
            for r in substring_dedup(
                old.unionByName(new), k=3, strategy=strat
            ).collect()
            if r.doc_id >= 2
        }
        assert inc == full, strat
        assert inc[2] == ("intro outro", 4), strat


def test_gram_novelty_hand_golden(spark):
    from icicle_spark.operators.dedup import gram_hash_counts, gram_novelty

    held = spark.createDataFrame(
        [("h1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    idx = gram_hash_counts(held, "text", k=2)
    snap = spark.createDataFrame(
        [
            ("n1", "alpha beta gamma"),     # grams (a,b),(b,g): both held
            ("n2", "alpha beta zeta eta"),  # (a,b) held; (b,z),(z,e) novel
            ("n3", "totally new words"),    # all novel
            ("n4", ""),                     # empty: 1 whole-gram, novel
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], round(r["novelty"], 6))
        for r in gram_novelty(snap, idx, k=2).collect()
    }
    assert got["n1"] == (2, 0, 0.0)
    assert got["n2"] == (3, 2, round(2 / 3, 6))
    assert got["n3"] == (2, 2, 1.0)
    assert got["n4"] == (1, 1, 1.0)


def test_cross_split_contamination(spark):
    from icicle_spark.operators.dedup import cross_split_contamination

    import pandas as pd
    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu")
    rows = [
        (1, "train", base),                       # train doc
        (2, "val",   base + " extra tail words"), # shares 8-grams
        (3, "val",   "completely different words about rivers "
                     "mountains cities music science history art"),
        (4, "test",  base),                       # exact copy of train
        (5, "test",  "nothing in common here with anything else "
                     "whatsoever at all believe me truly"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "split", "text"])
    )
    got = {r.split: r for r in
           cross_split_contamination(df, n=8).collect()}
    assert set(got) == {"val", "test"}
    assert got["val"].n_docs == 2 and got["val"].n_contaminated == 1
    assert got["test"].n_docs == 2 and got["test"].n_contaminated == 1
    assert abs(got["val"].contaminated_frac - 0.5) < 1e-9
    # a clean corpus reports zero (and keeps the split rows)
    clean = spark.createDataFrame(pd.DataFrame(
        [(1, "train", "one two three four five six seven eight nine"),
         (2, "val", "ten eleven twelve thirteen fourteen fifteen "
                    "sixteen seventeen eighteen")],
        columns=["doc_id", "split", "text"]))
    r = cross_split_contamination(clean, n=8).collect()
    assert len(r) == 1 and r[0].n_contaminated == 0
