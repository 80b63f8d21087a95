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
    with open(os.path.join(path, "_fact_store.json")) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "icicle_fact_store_v1":
        raise ValueError(f"{path} is not an arranged fact store")
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
