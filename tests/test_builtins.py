"""Builtin function surface parity — the reference's BuiltinMath /
BuiltinMap / BuiltinArray enums (Builtin.hs:47-105) with Possibly
semantics: domain errors, overflow, OOB and missing keys are null,
never NaN/Inf/ANSI exceptions; rounding follows Haskell (round =
half-to-even, truncate = toward zero)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from icicle_spark.functions import arrays as A
from icicle_spark.functions import maps as M
from icicle_spark.functions import scalars as S


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).first()["x"]


def test_math_possibly_domain_errors(spark):
    assert _one(spark, S.safe_acos(F.lit(2.0))) is None
    assert _one(spark, S.safe_asin(F.lit(-1.5))) is None
    assert _one(spark, S.safe_exp(F.lit(1000.0))) is None   # overflow
    assert _one(spark, S.cosh(F.lit(1000.0))) is None
    assert _one(spark, S.sinh(F.lit(-1000.0))) is None
    assert _one(spark, S.safe_log(F.lit(-1.0))) is None
    assert _one(spark, S.safe_div(F.lit(1.0), F.lit(0.0))) is None
    # in-domain values are plain doubles
    assert _one(spark, S.safe_acos(F.lit(1.0))) == 0.0
    assert abs(_one(spark, S.atan2(F.lit(1.0), F.lit(1.0))) - math.pi / 4) < 1e-12
    assert abs(_one(spark, S.tanh(F.lit(0.5))) - math.tanh(0.5)) < 1e-12


def test_math_rounding_matches_haskell(spark):
    # Haskell round = banker's (half to even)
    assert _one(spark, S.round_(F.lit(2.5))) == 2
    assert _one(spark, S.round_(F.lit(3.5))) == 4
    assert _one(spark, S.round_(F.lit(-2.5))) == -2
    # truncate: toward zero; floor/ceiling: usual
    assert _one(spark, S.truncate_(F.lit(-2.7))) == -2
    assert _one(spark, S.floor_(F.lit(-2.5))) == -3
    assert _one(spark, S.ceiling_(F.lit(-2.5))) == -2
    assert _one(spark, S.to_double(F.lit(3))) == 3.0
    assert _one(spark, S.from_integer(F.lit(7))) == 7.0


@pytest.fixture(scope="module")
def mdf(spark):
    return spark.createDataFrame(
        [(1, {"b": 2.0, "a": 1.0, "c": 3.0})],
        "id int, m map<string,double>",
    )


def test_map_builtins(spark, mdf):
    row = mdf.select(
        M.map_keys(F.col("m")).alias("ks"),
        M.map_values(F.col("m")).alias("vs"),
        M.map_lookup(F.col("m"), "b").alias("hit"),
        M.map_lookup(F.col("m"), "zz").alias("miss"),
        M.map_insert(F.col("m"), "b", 9.0).alias("repl"),
        M.map_insert(F.col("m"), "d", 4.0).alias("ins"),
        M.map_delete(F.col("m"), "a").alias("del"),
    ).first()
    assert row["ks"] == ["a", "b", "c"]          # sorted (Data.Map order)
    assert row["vs"] == [1.0, 2.0, 3.0]          # key-order values
    assert row["hit"] == 2.0 and row["miss"] is None
    assert row["repl"]["b"] == 9.0 and len(row["repl"]) == 3
    assert row["ins"]["d"] == 4.0 and len(row["ins"]) == 4
    assert "a" not in row["del"] and len(row["del"]) == 2
    # empty typed map
    empty = spark.range(1).select(M.map_create().alias("e")).first()["e"]
    assert empty == {}


def test_array_builtins(spark):
    df = spark.createDataFrame([(1, [3, 1, 2])], "id int, a array<int>")
    row = df.select(
        A.array_sort(F.col("a")).alias("s"),
        A.array_length(F.col("a")).alias("n"),
        A.array_index(F.col("a"), 0).alias("first"),
        A.array_index(F.col("a"), 7).alias("oob"),
        A.array_index(F.col("a"), -1).alias("neg"),
    ).first()
    assert row["s"] == [1, 2, 3]
    assert row["n"] == 3
    assert row["first"] == 3
    assert row["oob"] is None and row["neg"] is None
