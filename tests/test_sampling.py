"""Deterministic sampling: same rows at any parallelism, correct
proportions, disjoint+exhaustive splits."""

from __future__ import annotations

import pytest

from icicle_spark.operators.sampling import (
    deterministic_sample,
    mix_sources,
    split_train_holdout,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()


def test_sample_reproducible_across_partitionings(spark, docs):
    a = set(
        r.doc_id
        for r in deterministic_sample(docs, 0.3, "doc_id").select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(17), 0.3, "doc_id"
        ).select("doc_id").collect()
    )
    assert a == b
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08
    # a different seed redraws
    c = set(
        r.doc_id
        for r in deterministic_sample(docs, 0.3, "doc_id", seed=9)
        .select("doc_id")
        .collect()
    )
    assert c != a


def test_sample_is_nested_by_fraction(spark, docs):
    """fraction=0.2 selects a SUBSET of fraction=0.5 (same seed) —
    shrinking a mixture weight only removes rows, never swaps them."""
    small = set(r.doc_id for r in deterministic_sample(docs, 0.2, "doc_id").collect())
    big = set(r.doc_id for r in deterministic_sample(docs, 0.5, "doc_id").collect())
    assert small <= big


def test_mix_sources_weights(spark, docs):
    base = docs.groupBy("source").count().toPandas().set_index("source")["count"]
    weights = {s: w for s, w in zip(sorted(base.index), [1.0, 0.5, 0.1])}
    mixed = (
        mix_sources(docs, weights)
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
    )
    for s, w in weights.items():
        got = mixed.get(s, 0) / base[s]
        assert abs(got - w) < 0.12, (s, w, got)
    # unlisted sources drop by default
    assert set(mixed.index) <= set(weights)


def test_split_disjoint_exhaustive_stable(spark, docs):
    train, hold = split_train_holdout(docs, 0.25, "doc_id")
    t = set(r.doc_id for r in train.select("doc_id").collect())
    h = set(r.doc_id for r in hold.select("doc_id").collect())
    assert t.isdisjoint(h)
    assert len(t) + len(h) == docs.count()
    # growing the corpus never flips an existing key's side
    sub = docs.where("doc_id < 200")
    t2, h2 = split_train_holdout(sub, 0.25, "doc_id")
    assert set(r.doc_id for r in h2.collect()) == {i for i in h if i < 200}


# --------------------------------------------------- token_budget_sample


def _flat_reference(spark, d, budget, buckets=16):
    """The spec as one flat per-source window: canonical order
    (hash-bucket, doc_id), keep while the running sum stays <= budget."""
    from pyspark.sql import Window, functions as F

    from icicle_spark.operators.sampling import _bucket_n

    w = (
        Window.partitionBy("source")
        .orderBy(_bucket_n("doc_id", 0, buckets, "xx64"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        d.where(F.col("n_tok") > 0)
        .withColumn("cum", F.sum(F.col("n_tok").cast("bigint")).over(w))
        .where(F.col("cum") <= budget)
    )
    return set(r.doc_id for r in ref.select("doc_id").collect())


@pytest.fixture(scope="module")
def tok_docs(spark, docs):
    from pyspark.sql import functions as F

    from icicle_spark.functions.text import token_count

    return (
        docs.select(
            "doc_id",
            "source",
            token_count(F.col("text"), "whitespace").cast("bigint").alias("n_tok"),
        )
        .cache()
    )


def test_token_budget_matches_flat_window(spark, tok_docs):
    from icicle_spark.operators.sampling import token_budget_sample

    for budget in (0, 150, 800, 10**9):
        kept = token_budget_sample(tok_docs, budget, "n_tok", buckets=16)
        got = set(r.doc_id for r in kept.select("doc_id").collect())
        assert got == _flat_reference(spark, tok_docs, budget), budget


def test_token_budget_never_exceeds_budget(spark, tok_docs):
    from pyspark.sql import functions as F

    from icicle_spark.operators.sampling import token_budget_sample

    kept = token_budget_sample(tok_docs, 500, "n_tok", buckets=16)
    per = kept.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    assert per and all(r.t <= 500 for r in per)


def test_token_budget_dict_and_absent_source_dropped(spark, tok_docs):
    from icicle_spark.operators.sampling import token_budget_sample

    kept = token_budget_sample(
        tok_docs, {"src0": 10**9, "src1": 300}, "n_tok", buckets=16
    )
    rows = kept.collect()
    srcs = set(r.source for r in rows)
    assert srcs == {"src0", "src1"}
    # src0 unbounded: every tok>0 doc survives
    n_src0_all = tok_docs.where("source = 'src0' and n_tok > 0").count()
    assert sum(1 for r in rows if r.source == "src0") == n_src0_all
    assert sum(r.n_tok for r in rows if r.source == "src1") <= 300


def test_token_budget_partitioning_invariant(spark, tok_docs):
    from icicle_spark.operators.sampling import token_budget_sample

    a = set(
        r.doc_id
        for r in token_budget_sample(tok_docs, 800, "n_tok").select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in token_budget_sample(
            tok_docs.repartition(23), 800, "n_tok"
        ).select("doc_id").collect()
    )
    assert a == b


def test_token_budget_drops_zero_token_rows(spark):
    from icicle_spark.operators.sampling import token_budget_sample

    d = spark.createDataFrame(
        [("a", "s", 0), ("b", "s", 5), ("c", "s", 0)],
        "doc_id string, source string, n_tok long",
    )
    kept = token_budget_sample(d, 100, "n_tok", buckets=4)
    assert set(r.doc_id for r in kept.collect()) == {"b"}


def test_quantile_buckets_formula_parity(spark):
    """bucket = floor(cum_below * n / total) + 1, ties share."""
    import random

    from icicle_spark.operators.sampling import quantile_buckets

    rng = random.Random(5)
    scores = [round(rng.random(), 2) for _ in range(500)]  # many ties
    d = spark.createDataFrame(
        [(f"d{i}", s) for i, s in enumerate(scores)],
        "doc_id string, q double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in quantile_buckets(d, "q", n_buckets=10).collect()
    }
    srt = sorted(scores)
    import bisect

    total = len(scores)
    for i, s in enumerate(scores):
        below = bisect.bisect_left(srt, s)
        assert got[f"d{i}"] == below * 10 // total + 1, (s, got[f"d{i}"])


def test_quantile_buckets_equal_populations(spark):
    from collections import Counter

    from icicle_spark.operators.sampling import quantile_buckets

    d = spark.range(1000).selectExpr("id", "id / 1000.0 AS q")
    c = Counter(
        r["bucket"] for r in quantile_buckets(d, "q", n_buckets=4).collect()
    )
    assert c == {1: 250, 2: 250, 3: 250, 4: 250}


def test_quantile_buckets_massive_tie(spark):
    from icicle_spark.operators.sampling import quantile_buckets

    # 60% of mass on one value: it takes bucket 1, the rest jump to 7
    rows = [("a%d" % i, 0.1) for i in range(60)] + [
        ("b%d" % i, 0.9) for i in range(40)
    ]
    d = spark.createDataFrame(rows, "doc_id string, q double")
    got = {r["doc_id"]: r["bucket"] for r in quantile_buckets(d, "q").collect()}
    assert got["a0"] == 1 and got["b0"] == 7


def test_quantile_buckets_null_raises(spark):
    import pytest as _pytest

    from icicle_spark.operators.sampling import quantile_buckets

    d = spark.createDataFrame([("a", None)], "doc_id string, q double")
    with _pytest.raises(ValueError, match="null score"):
        quantile_buckets(d, "q")


def test_temperature_rates_skew(spark):
    from icicle_spark.operators.sampling import _BUCKETS, temperature_rates

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    r = temperature_rates(df, 0.5)
    assert r["small"] == _BUCKETS  # rarest source keeps everything
    assert r["big"] == int((100 / 400) ** 0.5 * _BUCKETS)  # sqrt(1/4) = 0.5
    # alpha=1 is identity (no reshaping)
    assert set(temperature_rates(df, 1.0).values()) == {_BUCKETS}
    import pytest as _pt

    with _pt.raises(ValueError):
        temperature_rates(df, 1.5)


def test_temperature_mix_deterministic_and_reshaping(spark):
    from icicle_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i % 5 != 0 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    kept1 = {r["doc_id"] for r in temperature_mix(df, 0.5).collect()}
    kept2 = {
        r["doc_id"]
        for r in temperature_mix(df.repartition(13), 0.5).collect()
    }
    assert kept1 == kept2  # membership invariant under partitioning
    by_src = (
        temperature_mix(df, 0.5)
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r["source"]: r["count"] for r in by_src}
    assert got["small"] == 400  # rarest kept wholesale
    # big thinned toward sqrt ratio: expect ~1600*0.5=800, hash noise small
    assert 700 <= got["big"] <= 900


def test_cap_per_group(spark):
    from icicle_spark.operators.sampling import cap_per_group

    rows = [(i, f"dom{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, domain string")
    out = cap_per_group(df, "domain", 5, key_col="doc_id")
    got = out.groupBy("domain").count().collect()
    assert {r["count"] for r in got} == {5}
    # deterministic survivor SET under repartitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in cap_per_group(
            df.repartition(7), "domain", 5, key_col="doc_id"
        ).collect()
    }
    assert a == b
    # groups under the cap pass through whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id int, domain string")
    assert cap_per_group(small, "domain", 5, key_col="doc_id").count() == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        cap_per_group(df, "domain", 0, key_col="doc_id")


# ---------------------------------------------------------------- #
# leakage_safe_split: near-dup clusters never straddle a split      #
# ---------------------------------------------------------------- #


def _split_fixture(spark):
    """12 docs, pair graph with a 3-chain {1,2,3}, a ring {5,6,7},
    a 2-cluster {9,10}; 0,4,8,11 are singletons."""
    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id: bigint"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (6, 7), (7, 5), (9, 10)],
        "id_a: bigint, id_b: bigint",
    )
    return docs, pairs


def test_leakage_safe_split_no_pair_straddles(spark):
    from icicle_spark.operators.sampling import leakage_safe_split

    docs, pairs = _split_fixture(spark)
    out = leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    rows = {r.doc_id: r for r in out.collect()}
    # disjoint + exhaustive: every doc exactly one split
    assert set(rows) == set(range(12))
    assert all(r.split in ("train", "val", "test") for r in rows.values())
    # cluster atomicity: every pair's endpoints share cluster + split
    for a, b in [(1, 2), (2, 3), (5, 6), (6, 7), (7, 5), (9, 10)]:
        assert rows[a].cluster == rows[b].cluster
        assert rows[a].split == rows[b].split
    # transitivity: 1 and 3 never touched directly, same side via 2
    assert rows[1].split == rows[3].split
    # singleton clusters are the doc itself
    for s in (0, 4, 8, 11):
        assert rows[s].cluster == s


def test_leakage_safe_split_reproducible_and_growth_stable(spark):
    from icicle_spark.operators.sampling import leakage_safe_split

    docs, pairs = _split_fixture(spark)
    fr = {"train": 0.8, "holdout": 0.2}
    a = {r.doc_id: r.split for r in
         leakage_safe_split(docs, pairs, fr).collect()}
    b = {r.doc_id: r.split for r in
         leakage_safe_split(docs.repartition(7), pairs, fr).collect()}
    assert a == b  # parallelism-invariant
    # corpus growth that doesn't touch old clusters never moves them
    grown = docs.union(
        spark.createDataFrame([(i,) for i in range(100, 120)],
                              "doc_id: bigint")
    )
    g = {r.doc_id: r.split for r in
         leakage_safe_split(grown, pairs, fr).collect()}
    assert all(g[k] == v for k, v in a.items())
    # md5 gate agrees with itself across hash functions structurally:
    # same clusters, possibly different sides
    m = {r.doc_id: r.cluster for r in
         leakage_safe_split(docs, pairs, fr, hash_fn="md5").collect()}
    x = {r.doc_id: r.cluster for r in
         leakage_safe_split(docs, pairs, fr).collect()}
    assert m == x


def test_leakage_safe_split_fraction_validation(spark):
    from icicle_spark.operators.sampling import leakage_safe_split

    docs, pairs = _split_fixture(spark)
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, pairs, {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError, match="non-negative"):
        leakage_safe_split(docs, pairs, {"train": 1.5, "val": -0.5})
    with pytest.raises(ValueError, match="at least one"):
        leakage_safe_split(docs, pairs, {})


# ------------------------------------------------------- epoch mixing


def test_plan_source_epochs_math(spark):
    from icicle_spark.operators.sampling import plan_source_epochs

    df = spark.createDataFrame(
        [("web", 100), ("web", 100), ("books", 50), ("code", 25)],
        "source string, n_tok bigint",
    )
    plan = plan_source_epochs(
        df, {"web": 2.0, "books": 1.0, "code": 1.0}, token_budget=1000,
        max_epochs=4.0,
    )
    got = {p["source"]: p for p in plan}
    assert got["web"]["tokens"] == 200
    assert got["web"]["target_tokens"] == 500
    assert got["web"]["epochs"] == 2.5
    assert got["books"]["epochs"] == 250 / 50 * 0 + 4.0  # capped (250/50=5)
    assert got["code"]["epochs"] == 4.0  # 250/25 = 10 -> capped
    import pytest as _pt

    with _pt.raises(ValueError, match="no weight"):
        plan_source_epochs(df, {"web": 1.0}, token_budget=100)


def test_epoch_upsample_counts_and_determinism(spark):
    """floor(e) copies always; the extra epoch hits ~frac of ids;
    epoch labels are 0..copies-1; repartition-invariant; unknown
    source raises."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from icicle_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [(f"d{i:04d}", "web" if i % 2 else "books", i)
         for i in range(2000)],
        "doc_id string, source string, n_tok bigint",
    )
    out = epoch_upsample(df, {"web": 2.25, "books": 0.5}).cache()
    per = {
        (r["source"], r["doc_id"]): r["cnt"]
        for r in out.groupBy("source", "doc_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    web = [v for (s, _), v in per.items() if s == "web"]
    books = [v for (s, _), v in per.items() if s == "books"]
    assert set(web) <= {2, 3} and len(web) == 1000
    extra = sum(1 for v in web if v == 3)
    assert 0.15 < extra / 1000 < 0.35  # ~0.25
    assert set(books) == {1}
    assert 0.35 < len(books) / 1000 < 0.65  # ~0.5 kept once
    # epoch labels are a dense 0..n-1 per doc
    eps = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("epoch")).alias("e"),
        F.count("*").alias("n"),
    )
    for r in eps.collect():
        assert list(r["e"]) == list(range(r["n"]))
    a = sorted(map(tuple, out.select("doc_id", "epoch").collect()))
    b = sorted(
        map(
            tuple,
            epoch_upsample(df.repartition(17), {"web": 2.25, "books": 0.5})
            .select("doc_id", "epoch")
            .collect(),
        )
    )
    assert a == b
    out.unpersist()
    with _pt.raises(Exception, match="without an epoch plan"):
        epoch_upsample(df, {"web": 1.0}).collect()


def test_epoch_upsample_zero_shuffle_plan(spark):
    from icicle_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(
        [("d0", "web", 5)], "doc_id string, source string, n_tok bigint"
    )
    plan = (
        epoch_upsample(df, {"web": 1.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_epoch_upsample_only_where(spark):
    """only_where: treated rows get the plan's copies, untreated rows
    exactly one copy with epoch 0 — and untreated rows never consult
    the plan (an eval split may hold sources the plan omits)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from icicle_spark.operators.sampling import epoch_upsample

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(8),
        "source": ["web"] * 4 + ["books"] * 4,
        "split": ["train", "train", "val", "val"] * 2,
    }))
    out = epoch_upsample(
        df, {"web": 3.0, "books": 2.0},
        only_where=F.col("split") == "train",
    ).toPandas()
    per = out.groupby("doc_id").agg(
        n=("epoch", "size"), mx=("epoch", "max"),
        split=("split", "first"), source=("source", "first"),
    )
    for _, r in per.iterrows():
        if r["split"] == "train":
            assert r["n"] == (3 if r["source"] == "web" else 2)
        else:
            assert r["n"] == 1 and r["mx"] == 0
    # untreated rows bypass the unknown-source raise entirely
    df2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "source": ["web", "mystery"],
        "split": ["train", "val"],
    }))
    out2 = epoch_upsample(
        df2, {"web": 2.0}, only_where=F.col("split") == "train"
    ).toPandas()
    assert len(out2) == 3  # 2 web copies + 1 untouched mystery row
