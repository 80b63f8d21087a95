"""Table IO helpers.

Testdata is parquet (TESTDATA.md); production targets Iceberg — the
reader tries the Iceberg catalog format first when asked, falling back
to parquet.  PSV (pipe-separated fact files, the reference's text
format: /root/reference/icicle-source/src/Icicle/Serial.hs) is
supported for parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def read_psv_facts(spark: SparkSession, path: str) -> DataFrame:
    """entity|attribute|value|time fact rows (reference
    icicle-compiler/test/cli/repl/data.psv:1-13)."""
    df = (
        spark.read.option("sep", "|")
        .csv(path)
        .toDF("entity", "attribute", "value", "time")
    )
    return df.withColumn("time", F.to_timestamp("time"))


def write_output(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    w = df.write.mode("overwrite")
    if fmt == "psv":
        w.option("sep", "|").csv(path)
    else:
        w.parquet(path)
