"""Table IO helpers.

Testdata is parquet (TESTDATA.md); production targets Iceberg — the
reader tries the Iceberg catalog format first when asked, falling back
to parquet.  PSV (pipe-separated fact files, the reference's text
format: /root/reference/icicle-source/src/Icicle/Serial.hs) is
supported for parity.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Production entry: read an Iceberg table (catalog must be on the
    classpath; parquet path fallback keeps tests hermetic)."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception:
        return spark.read.parquet(table)


def write_fact_store(
    df: DataFrame,
    path: str,
    entity_col: str,
    time_col: str,
    seq_col: str | None = None,
    buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write facts in the ARRANGED layout: hash-bucketed by entity,
    one parquet file per bucket, rows sorted (entity, time[, seq])
    within each file — the reference store's own invariant
    (entity-major, ingestion-ordered: README.md:132-141).

    A store in this layout lets the vectorized snapshot executor run
    with ``assume_arranged=True``, skipping the entity exchange + sort
    that otherwise dominate its cost (measured 4.6 s of the 6.9 s
    fused flagship at 8M rows / 32 cores). At 100 TB this is the
    difference between re-shuffling the corpus per feature run and a
    pure scan: maintain the store bucketed once at ingest, amortized
    over every downstream snapshot.
    """
    n = int(
        buckets
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    sort_cols = [entity_col, time_col] + ([seq_col] if seq_col else [])
    (
        df.repartition(n, entity_col)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
    meta = {
        "layout": "icicle_fact_store_v1",
        "entity_col": entity_col,
        "time_col": time_col,
        "seq_col": seq_col,
        "buckets": n,
    }
    with open(os.path.join(path, "_fact_store.json"), "w") as fh:
        json.dump(meta, fh)


def read_fact_store(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read an arranged fact store (see write_fact_store); returns
    (facts, layout_meta). Raises when any data file exceeds
    ``spark.sql.files.maxPartitionBytes``: Spark would SPLIT such a
    file across tasks, breaking the entity-completeness the arranged
    executors rely on — raise the conf (or re-bucket the store)
    rather than silently computing split folds."""
    meta = _store_meta(path)
    if meta.get("runs"):
        # delta runs pending (append_fact_store): serve the zero-
        # shuffle merge-on-read view — still arranged-safe (each
        # result partition is one bucket, entity-complete, sorted);
        # tasks open their files explicitly, so Spark's split sizing
        # cannot break entity-completeness here
        return _merged_store_frame(spark, path, meta), meta
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    digits = "".join(ch for ch in str(raw) if ch.isdigit())
    max_bytes = int(digits or "134217728")
    if os.path.isdir(path):  # local paths: verify no file would split
        for name in os.listdir(path):
            if name.endswith(".parquet"):
                sz = os.path.getsize(os.path.join(path, name))
                if sz > max_bytes:
                    raise ValueError(
                        f"fact-store file {name} is {sz} bytes > "
                        f"spark.sql.files.maxPartitionBytes={max_bytes}; "
                        "Spark would split it across tasks. Raise the "
                        "conf or rebuild with more buckets."
                    )
    return spark.read.parquet(path), meta



def _part_files(d: str) -> dict[int, list[str]]:
    """Bucket index -> parquet files, parsed from Spark's
    ``part-%05d-...`` task-output names. With ``repartition(n,
    entity)`` the task (= file) index IS the murmur3 hash bucket, so
    files from separate write jobs with the same ``n`` align by
    index — the invariant the delta runs below rely on."""
    import re as _re

    out: dict[int, list[str]] = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        m = _re.match(r"part-(\d{5}).*\.parquet$", name)
        if m:
            out.setdefault(int(m.group(1)), []).append(
                os.path.join(d, name)
            )
    return out


def _store_meta(path: str) -> dict:
    with open(os.path.join(path, "_fact_store.json")) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "icicle_fact_store_v1":
        raise ValueError(f"{path} is not an arranged fact store")
    return meta


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, "_fact_store.json"), "w") as fh:
        json.dump(meta, fh)


def append_fact_store(
    df: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Append a DELTA RUN to an arranged fact store — incremental
    ingest without re-shuffling the base (the LSM pattern: base +
    sorted runs, compacted on demand).

    The delta is bucketed with the store's own function
    (``repartition(n, entity)`` — same murmur3, same ``n``) and
    sorted per bucket, so run files align with base files by part
    index. Cost: one exchange of the DELTA only. Until
    :func:`compact_fact_store` folds the runs in,
    :func:`read_fact_store` serves a MERGE-ON-READ view that still
    satisfies the arranged invariant (zero shuffle — see
    ``_merged_store_frame``); at 100 TB this is the difference
    between re-bucketing the corpus per ingest batch and touching
    only the new facts.

    ``batch_id`` (streaming foreachBatch replay protection): an id
    already recorded in the store's meta is a committed batch — the
    append becomes a no-op, and a replayed HALF-committed batch
    (crash between the run write and the meta write) overwrites its
    own orphan run directory, so the sink is idempotent per batch.
    """
    meta = _store_meta(path)
    if batch_id is not None and int(batch_id) in meta.get("batches", []):
        return
    cols = [meta["entity_col"], meta["time_col"]] + (
        [meta["seq_col"]] if meta["seq_col"] else []
    )
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"delta lacks store key columns: {missing}")
    n = int(meta["buckets"])
    runs = meta.get("runs", [])
    if batch_id is not None:
        run_name = f"run-b{int(batch_id):012d}"
        write_mode = "overwrite"  # idempotent replay of an orphan
    else:
        run_name = f"run-{len(runs):04d}"
        write_mode = "error"
    run_path = os.path.join(path, "runs", run_name)
    (
        df.repartition(n, meta["entity_col"])
        .sortWithinPartitions(*cols)
        .write.mode(write_mode)
        .parquet(run_path)
    )
    meta["runs"] = runs + [run_name]
    if batch_id is not None:
        meta["batches"] = meta.get("batches", []) + [int(batch_id)]
    _write_meta(path, meta)


def _bucket_file_map(path: str, meta: dict) -> dict[int, list[str]]:
    """Every bucket's files in merge order: base first, then each run
    (ingestion order — ties on the full sort key keep arrival order
    under the stable merge sort)."""
    files = _part_files(path)
    for run in meta.get("runs", []):
        for b, fs in _part_files(os.path.join(path, "runs", run)).items():
            files.setdefault(b, []).extend(fs)
    return files


def _merged_store_frame(
    spark: SparkSession, path: str, meta: dict
) -> DataFrame:
    """MERGE-ON-READ over base + delta runs with ZERO shuffle: one
    task per bucket opens exactly its bucket's files (pyarrow —
    local paths here; fsspec URIs on a real filesystem) and restores
    the (entity, time[, seq]) order with one stable in-memory sort.
    Partition i of the result is bucket i, entity-complete and
    sorted — it satisfies ``assume_arranged`` exactly like a
    compacted store. Peak task memory is one bucket in pandas, the
    same envelope as the arranged executors themselves; size
    ``buckets`` for the target scale at write time."""
    schema = spark.read.parquet(path).schema
    names = schema.fieldNames()
    sort_cols = [meta["entity_col"], meta["time_col"]] + (
        [meta["seq_col"]] if meta["seq_col"] else []
    )
    files = _bucket_file_map(path, meta)
    n = int(meta["buckets"])
    seeds = spark.createDataFrame(
        spark.sparkContext.parallelize([(i,) for i in range(n)], n),
        "bucket int",
    )

    def merge(batches):
        for pdf in batches:
            for b in pdf["bucket"].tolist():
                tab = _read_merged_bucket(files.get(int(b), []), sort_cols)
                if tab is None:
                    continue
                # nullable-int mapping: a plain to_pandas would turn
                # an int column with nulls into float64, and Spark's
                # Arrow cast back to bigint rejects NaN
                import pandas as pd
                import pyarrow as pa

                mapping = {
                    pa.int64(): pd.Int64Dtype(),
                    pa.int32(): pd.Int32Dtype(),
                    pa.int16(): pd.Int16Dtype(),
                }
                yield tab.to_pandas(types_mapper=mapping.get)[names]

    return seeds.mapInPandas(merge, schema=schema)


def _read_merged_bucket(fs: list[str], sort_cols: list[str]):
    """One bucket's files -> one Arrow table in (entity, time[, seq])
    order. Pure Arrow + one stable numpy lexsort over the key columns
    only — value columns never round-trip through pandas, so dtypes
    (nullable ints, timestamps) survive exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not fs:
        return None

    def _us(t: pa.Table) -> pa.Table:
        # Spark INT96 files surface as timestamp[ns]; compacted files
        # are written as micros — normalize so mixed generations concat
        fields = [
            f.with_type(pa.timestamp("us"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in t.schema
        ]
        target = pa.schema(fields)
        return t if t.schema == target else t.cast(target)

    tables = [_us(pq.read_table(f)) for f in fs]
    tab = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="default"
    )
    if len(tables) > 1 and tab.num_rows > 1:
        keys = []
        for c in reversed(sort_cols):  # np.lexsort: LAST key primary
            col = tab.column(c)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            arr = col.to_numpy(zero_copy_only=False)
            keys.append(arr)
        order = np.lexsort(tuple(keys))
        if not np.array_equal(order, np.arange(len(order))):
            tab = tab.take(pa.array(order))
    return tab


def compact_fact_store(spark: SparkSession, path: str) -> None:
    """Fold the delta runs into the base WITHOUT a global shuffle:
    each bucket's files merge in one task (the same aligned read as
    merge-on-read) and the task writes its compacted bucket file
    directly — per-bucket parallel rewrite, exactly how table-format
    compactors work. File moves at the end are driver-side renames;
    on a shared filesystem run one compaction at a time (the store
    carries no lock)."""
    meta = _store_meta(path)
    if not meta.get("runs"):
        return
    sort_cols = [meta["entity_col"], meta["time_col"]] + (
        [meta["seq_col"]] if meta["seq_col"] else []
    )
    files = _bucket_file_map(path, meta)
    n = int(meta["buckets"])
    tmp = os.path.join(path, ".compact-tmp")
    os.makedirs(tmp, exist_ok=True)
    seeds = spark.createDataFrame(
        spark.sparkContext.parallelize([(i,) for i in range(n)], n),
        "bucket int",
    )

    def write_bucket(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            for b in pdf["bucket"].tolist():
                tab = _read_merged_bucket(files.get(int(b), []), sort_cols)
                if tab is None:
                    continue
                # Spark writes INT96 timestamps, which pyarrow
                # surfaces as timestamp[ns]; writing nanos back would
                # produce TIMESTAMP(NANOS), which Spark's reader
                # rejects. Spark timestamps are micro-precision, so
                # the coercion is lossless (and errors loudly if a
                # sub-microsecond value ever appears).
                pq.write_table(
                    tab,
                    os.path.join(
                        tmp, f"part-{int(b):05d}-compacted.parquet"
                    ),
                    coerce_timestamps="us",
                    allow_truncated_timestamps=False,
                )
                yield pd.DataFrame(
                    {"bucket": [int(b)], "rows": [tab.num_rows]}
                )

    stats = seeds.mapInPandas(write_bucket, "bucket int, rows long")
    n_rows = stats.agg(F.sum("rows")).first()[0] or 0
    # swap: new bucket files replace base + runs (driver renames)
    import shutil

    for fs in _part_files(path).values():
        for f in fs:
            os.remove(f)
    for name in sorted(os.listdir(tmp)):
        os.replace(os.path.join(tmp, name), os.path.join(path, name))
    os.rmdir(tmp)
    shutil.rmtree(os.path.join(path, "runs"), ignore_errors=True)
    meta["runs"] = []
    meta["compacted_rows"] = int(n_rows)
    _write_meta(path, meta)


def read_psv_facts(spark: SparkSession, path: str) -> DataFrame:
    """entity|attribute|value|time fact rows (reference
    icicle-compiler/test/cli/repl/data.psv:1-13)."""
    df = (
        spark.read.option("sep", "|")
        .csv(path)
        .toDF("entity", "attribute", "value", "time")
    )
    return df.withColumn("time", F.to_timestamp("time"))


def _psv_encoding(dt: T.DataType) -> dict:
    """Spark type -> reference PsvEncoding JSON
    (icicle-compiler/src/Icicle/Runtime/Serial/Psv/Schema.hs:83-90,
    197-215: {"primitive": ...} | {"struct": [...]} | {"listof": ...}
    | {"pairof": [a, b]})."""
    if isinstance(dt, T.BooleanType):
        return {"primitive": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"primitive": "int"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"primitive": "double"}
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return {"primitive": "date"}
    if isinstance(dt, T.ArrayType):
        return {"listof": _psv_encoding(dt.elementType)}
    if isinstance(dt, T.MapType):
        # reference maps serialize as a list of key/value pairs
        return {
            "listof": {
                "pairof": [
                    _psv_encoding(dt.keyType),
                    _psv_encoding(dt.valueType),
                ]
            }
        }
    if isinstance(dt, T.StructType):
        return {
            "struct": [
                {
                    "index": i,
                    "name": f.name,
                    "encoding": _psv_encoding(f.dataType),
                }
                for i, f in enumerate(dt.fields)
            ]
        }
    return {"primitive": "string"}


def psv_schema(
    df: DataFrame, entity_col: str = "entity", missing_value: str = "NA"
) -> dict:
    """The reference's PSV schema sidecar JSON (Schema.hs:234-299:
    version/encoding_version "1", entity_id at index 0, one attribute
    entry per output column)."""
    cols = [f for f in df.schema.fields if f.name != entity_col]
    return {
        "version": "1",
        "encoding_version": "1",
        "global_properties": {"missing_value": missing_value},
        "entity_id": {"index": 0, "encoding": "string"},
        "attributes": [
            # 1-based: index is the physical column position, with
            # entity_id pinned at 0 (Schema.hs ppSchema imap
            # (ppColumn . (+1)))
            {"index": i, "name": f.name, "encoding": _psv_encoding(f.dataType)}
            for i, f in enumerate(cols, start=1)
        ],
    }


def write_output(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    entity_col: str = "entity",
    missing_value: str = "NA",
) -> None:
    """Write results; PSV output also writes the reference's
    ``_schema.json`` sidecar beside the data (parquet/Iceberg are
    self-describing, so only PSV needs one)."""
    if fmt == "psv":
        # complex columns serialize to JSON text in the PSV cells (the
        # sidecar records their logical encoding); CSV itself only
        # carries atomic types
        flat = df.select(
            *[
                F.to_json(f.name).alias(f.name)
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
        flat.write.mode("overwrite").option("sep", "|").option(
            "nullValue", missing_value
        ).csv(path)
        with open(os.path.join(path, "_schema.json"), "w") as fh:
            json.dump(psv_schema(df, entity_col, missing_value), fh, indent=2)
    else:
        df.write.mode("overwrite").parquet(path)
