"""Round-6 optimization harness (bench.py stays FROZEN for the driver).

Times individual declared queries with exactly the frozen bench.py
methodology — noop sink (guide §1.4), one warm run, then min-of-N
fresh-lineage timed runs — and optionally dumps
``.explain("formatted")`` to plans/r06/<query>_<tag>.txt.

Usage:
    python bench_extra.py q1 q2 ...            # time queries at $SPARK_GRAFT_SF_DIR
    python bench_extra.py --plans TAG q1 ...   # also write plans/r06/<q>_<TAG>.txt
    python bench_extra.py --runs 3 q1          # min-of-3
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    tag = None
    runs = 2
    if "--plans" in args:
        i = args.index("--plans")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from icicle_spark.session import get_spark

    spark = get_spark(cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(f"plans/r06/{name}_{tag}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        _force(qs[name](spark, SF_DIR))  # warm: JIT + file cache
        best = None
        for _ in range(runs):
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            _force(df)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": timings}))


if __name__ == "__main__":
    main()
