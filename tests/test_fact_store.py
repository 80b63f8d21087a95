"""Arranged fact store: entity-bucketed, time-sorted parquet layout
(write_fact_store/read_fact_store) that lets the vectorized snapshot
executor skip the entity exchange (assume_arranged) — the reference
store's own invariant (README.md:132-141) made into a storage
contract, with loud failure when violated.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.plans import Agg, Feature, Plan, Window, run_plan
from icicle_spark.sources.fixtures import token_facts
from icicle_spark.sources.io import read_fact_store, write_fact_store

SNAP = "2024-07-01 00:00:00"

PLAN = Plan(
    [
        Feature("s", Agg.SUM, "n_tok", skip_nulls=True),
        Feature("m", Agg.MEAN, "n_tok", skip_nulls=True),
        Feature("n5", Agg.MEAN, "n_tok", latest=5, skip_nulls=True),
        Feature("w30", Agg.SUM, "n_tok", window=Window(30), skip_nulls=True),
        Feature("flips", Agg.NUMFLIPS, "source", skip_nulls=True),
    ],
    entity_col="doc_id",
    time_col="event_time",
    seq_col="seq",
)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    facts = token_facts(spark, n_rows=4000, n_docs=200)
    path = str(tmp_path_factory.mktemp("store") / "facts")
    write_fact_store(
        facts, path, "doc_id", "event_time", "seq", buckets=8
    )
    return facts, path


def test_arranged_matches_shuffled(spark, store):
    facts, path = store
    arranged, meta = read_fact_store(spark, path)
    assert meta["buckets"] == 8 and meta["entity_col"] == "doc_id"
    a = (
        run_plan(arranged, PLAN, snapshot=SNAP, strategy="vectorized",
                 assume_arranged=True)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        run_plan(facts, PLAN, snapshot=SNAP, strategy="vectorized")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in [f.name for f in PLAN.features]:
        x = a[c].astype("float64").to_numpy()
        y = b[c].astype("float64").to_numpy()
        assert np.allclose(x, y, equal_nan=True), c


def test_arranged_skips_exchange(spark, store):
    _, path = store
    arranged, _ = read_fact_store(spark, path)
    df = run_plan(arranged, PLAN, snapshot=SNAP, strategy="vectorized",
                  assume_arranged=True)
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str  # scan -> mapInPandas, no shuffle
    # and the normal path DOES exchange
    df2 = run_plan(arranged, PLAN, snapshot=SNAP, strategy="vectorized")
    assert "Exchange" in df2._jdf.queryExecution().executedPlan().toString()


def test_contiguity_guard_fires(spark):
    """A store that interleaves entities must raise, not return split
    folds."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 1, 2],  # entity 1 reappears after 2
            "event_time": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
            ),
            "seq": [0, 1, 2, 3],
            "n_tok": [1.0, 2.0, 3.0, 4.0],
            "source": ["web"] * 4,
        }
    )
    bad = spark.createDataFrame(pdf).coalesce(1)
    with pytest.raises(Exception, match="not entity-contiguous"):
        run_plan(
            bad, PLAN, snapshot=SNAP, strategy="vectorized",
            assume_arranged=True,
        ).collect()


def test_assume_arranged_rejected_off_path(spark, store):
    facts, _ = store
    with pytest.raises(ValueError, match="assume_arranged requires"):
        run_plan(facts, PLAN, snapshot=SNAP, strategy="native",
                 assume_arranged=True)


def test_run_features_job_detects_store(spark, store, tmp_path):
    """jobs/run_features auto-detects the arranged layout (sidecar
    manifest) and produces the same output as over raw parquet."""
    from jobs.run_features import main

    facts, path = store
    raw = str(tmp_path / "raw")
    facts.write.mode("overwrite").parquet(raw)
    out_store = str(tmp_path / "out_store")
    out_raw = str(tmp_path / "out_raw")
    args = ["--snapshot", SNAP, "--entity-col", "doc_id",
            "--time-col", "event_time", "--seq-col", "seq",
            "--strategy", "vectorized"]
    assert main(["--input", path, "--output", out_store] + args) == 0
    assert main(["--input", raw, "--output", out_raw] + args) == 0
    a = (
        spark.read.parquet(out_store).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        spark.read.parquet(out_raw).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    num = [c for c in a.columns if c != "doc_id"]
    assert np.allclose(
        a[num].astype("float64").to_numpy(),
        b[num].astype("float64").to_numpy(),
        equal_nan=True,
    )


def test_oversize_file_guard(spark, store, tmp_path, monkeypatch):
    _, path = store
    import icicle_spark.sources.io as io_mod

    # pretend the conf is tiny so every real file exceeds it
    spark.conf.set("spark.sql.files.maxPartitionBytes", "10")
    try:
        with pytest.raises(ValueError, match="would split"):
            read_fact_store(spark, path)
    finally:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024)
        )


def test_contiguity_guard_fires_across_batches(spark):
    """An entity recurring in a LATER Arrow batch of the same
    partition (not just within one concatenated chunk) must raise —
    otherwise assume_arranged would emit duplicate rows with partial
    folds for it."""
    rows = [1] * 4 + [2] * 4 + [1] * 2  # entity 1 recurs after 2
    pdf = pd.DataFrame(
        {
            "doc_id": rows,
            "event_time": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(np.arange(len(rows)), unit="D"),
            "seq": np.arange(len(rows)),
            "n_tok": np.arange(len(rows), dtype="float64"),
            "source": ["web"] * len(rows),
        }
    )
    bad = spark.createDataFrame(pdf).coalesce(1)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "4")  # force the recurrence into batch 3
    try:
        with pytest.raises(Exception, match="not entity-contiguous"):
            run_plan(
                bad, PLAN, snapshot=SNAP, strategy="vectorized",
                assume_arranged=True,
            ).collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# ----------------------------------------- incremental ingest (LSM)

def _pf(df):
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


@pytest.fixture()
def lsm_store(spark, tmp_path):
    """Base + two delta runs over disjoint-and-overlapping entities."""
    from icicle_spark.sources.io import append_fact_store

    base = token_facts(spark, n_rows=3000, n_docs=150)
    d1 = token_facts(spark, n_rows=600, n_docs=150, seed=7).withColumn(
        "seq", F.col("seq") + 1_000_000
    )
    d2 = token_facts(spark, n_rows=400, n_docs=40, seed=9).withColumn(
        "seq", F.col("seq") + 2_000_000
    )
    path = str(tmp_path / "lsm")
    write_fact_store(base, path, "doc_id", "event_time", "seq", buckets=8)
    append_fact_store(d1, path)
    append_fact_store(d2, path)
    union = base.unionByName(d1).unionByName(d2)
    return union, path


def test_merge_on_read_contents(spark, lsm_store):
    union, path = lsm_store
    merged, meta = read_fact_store(spark, path)
    assert meta["runs"] == ["run-0000", "run-0001"]
    a = merged.toPandas().sort_values(
        ["doc_id", "event_time", "seq"], ignore_index=True
    )
    b = union.toPandas().sort_values(
        ["doc_id", "event_time", "seq"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_merge_on_read_arranged_parity(spark, lsm_store):
    union, path = lsm_store
    merged, _ = read_fact_store(spark, path)
    a = _pf(run_plan(merged, PLAN, snapshot=SNAP, strategy="vectorized",
                     assume_arranged=True))
    b = _pf(run_plan(union, PLAN, snapshot=SNAP, strategy="native"))
    pd.testing.assert_frame_equal(
        a.astype("float64", errors="ignore"),
        b.astype("float64", errors="ignore"),
        check_dtype=False, atol=1e-9,
    )


def test_merge_on_read_has_no_exchange(spark, lsm_store):
    _, path = lsm_store
    merged, _ = read_fact_store(spark, path)
    out = run_plan(merged, PLAN, snapshot=SNAP, strategy="vectorized",
                   assume_arranged=True)
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str


def test_compaction_round_trip(spark, lsm_store):
    from icicle_spark.sources.io import append_fact_store, compact_fact_store

    union, path = lsm_store
    n = union.count()
    compact_fact_store(spark, path)
    merged, meta = read_fact_store(spark, path)
    assert meta["runs"] == [] and meta["compacted_rows"] == n
    assert merged.count() == n
    a = _pf(run_plan(merged, PLAN, snapshot=SNAP, strategy="vectorized",
                     assume_arranged=True))
    b = _pf(run_plan(union, PLAN, snapshot=SNAP, strategy="native"))
    pd.testing.assert_frame_equal(
        a.astype("float64", errors="ignore"),
        b.astype("float64", errors="ignore"),
        check_dtype=False, atol=1e-9,
    )
    # a post-compaction delta still aligns (bucket function unchanged)
    extra = token_facts(spark, n_rows=200, n_docs=150, seed=11).withColumn(
        "seq", F.col("seq") + 3_000_000
    )
    append_fact_store(extra, path)
    merged2, _ = read_fact_store(spark, path)
    assert merged2.count() == n + 200
    # compaction is a no-op without runs
    compact_fact_store(spark, path)  # folds the new run
    compact_fact_store(spark, path)  # then no-op
    merged3, meta3 = read_fact_store(spark, path)
    assert merged3.count() == n + 200 and meta3["runs"] == []


def test_ingestion_order_stable_on_equal_keys(spark, tmp_path):
    """A run row with the SAME (entity, time, seq) as a base row sorts
    AFTER it (stable merge: base first, runs in append order) — the
    reference store's ingestion-order tiebreak."""
    from icicle_spark.sources.io import append_fact_store

    path = str(tmp_path / "ties")
    cols = "doc_id string, event_time timestamp, seq long, n_tok long"
    base = spark.createDataFrame(
        [("d", datetime.datetime(2024, 1, 1), 0, 10)], cols
    )
    write_fact_store(base, path, "doc_id", "event_time", "seq", buckets=2)
    append_fact_store(
        spark.createDataFrame(
            [("d", datetime.datetime(2024, 1, 1), 0, 99)], cols
        ),
        path,
    )
    merged, _ = read_fact_store(spark, path)
    vals = merged.toPandas()["n_tok"].tolist()
    assert vals == [10, 99]
    plan = Plan(
        [Feature("last", Agg.NEWEST, "n_tok", skip_nulls=True)],
        entity_col="doc_id", time_col="event_time", seq_col="seq",
    )
    out = run_plan(merged, plan, snapshot=SNAP, strategy="vectorized",
                   assume_arranged=True).toPandas()
    assert out["last"].tolist() == [99]


def test_append_guards(spark, lsm_store, tmp_path):
    from icicle_spark.sources.io import append_fact_store

    union, path = lsm_store
    with pytest.raises(ValueError, match="store key columns"):
        append_fact_store(union.drop("seq"), path)
    with pytest.raises(FileNotFoundError):
        append_fact_store(union, str(tmp_path / "nowhere"))
