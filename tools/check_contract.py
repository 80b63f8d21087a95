"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same sf dir, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


class CanonUnsafe(TypeError):
    """An output column the DRIVER's canonicalizer cannot sort."""


def norm(df: pd.DataFrame, strict_canon: bool = True) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == "object":
            if df[c].dtype == "object" and df[c].map(
                lambda x: isinstance(x, (list, np.ndarray))
            ).any():
                if strict_canon:
                    # The driver's _canon sorts ALL output columns
                    # with pandas sort_values — array cells crash it
                    # ("unhashable type: 'list'", the four r4 err
                    # rows). Replicate that failure loudly so local
                    # sweeps catch it BEFORE the driver: serialize
                    # arrays (array_join / to_json) in BOTH the
                    # query and its oracle instead.
                    raise CanonUnsafe(
                        f"column {c!r} holds array cells — the "
                        "driver's canonicalizer would crash on it"
                    )
                # array cells (Spark ndarray / DuckDB list) are
                # unhashable for the sort: canonicalize to a string
                df[c] = df[c].map(
                    lambda x: str([*x])
                    if isinstance(x, (list, np.ndarray))
                    else x
                )
                continue
            try:
                df[c] = df[c].astype("float64").round(9)
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _kind(s: pd.Series) -> str:
    """Dtype class as the driver's value hash sees it (int vs float matters)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: {len(a)} vs {len(b)}"
    # The driver's value hash is dtype-sensitive: int64 3 and float64 3.0
    # hash differently even though they compare equal. Mirror that here so
    # a DuckDB HUGEINT-sum → float64 vs Spark int64 shows red locally
    # exactly as it would in CORRECTNESS_r{N}.json.
    for c in sorted(a.columns):
        ka, kb = _kind(a[c]), _kind(b[c])
        if ka != kb:
            return (
                f"dtype col {c}: spark {a[c].dtype} ({ka}) vs oracle "
                f"{b[c].dtype} ({kb}) — driver hash would mismatch"
            )
    try:
        a, b = norm(a), norm(b)
    except CanonUnsafe as e:
        return f"canon-unsafe: {e}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.allclose(
                av.to_numpy(), bv.astype("float64").to_numpy(),
                rtol=1e-9, atol=1e-9, equal_nan=True,
            )
        else:
            ok = (av.fillna("\0").to_numpy() == bv.fillna("\0").to_numpy()).all()
        if not ok:
            bad = av.astype(str) != bv.astype(str)
            i = int(np.argmax(bad.to_numpy())) if bad.any() else 0
            return f"col {c}: row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from icicle_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in osql:
            print(f"ok?  {name}: rows-only ({len(got)} rows)")
            continue
        try:
            exp = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        err = compare(got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
