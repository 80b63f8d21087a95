"""One-command release gate — everything the round gets graded on:

    python tools/release_check.py [--fast]

1. pytest suite (`python -m pytest -x -q`)
2. driver-contract correctness (Spark vs DuckDB, sf0.01)
3. plan-shape audit (scans/exchanges/pushdown/codegen)
4. bench smoke (fused flagship + headline queries; --fast skips)

Prints one PASS/FAIL line per gate and exits non-zero on any failure.
Do not run while another bench/scaling process is active (shared CPUs
corrupt both measurements — BENCH.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], timeout: int) -> tuple[bool, str]:
    t0 = time.time()
    try:
        r = subprocess.run(
            cmd, cwd=ROOT, capture_output=True, text=True, timeout=timeout
        )
        ok = r.returncode == 0
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        ok, tail = False, ["<timeout>"]
    print(f"[{'PASS' if ok else 'FAIL'}] {name} ({time.time() - t0:.0f}s)")
    return ok, "\n".join(tail)


def main() -> int:
    fast = "--fast" in sys.argv
    results = []

    results.append(run(
        "pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], 1800
    ))
    results.append(run(
        "contract sf0.01",
        [sys.executable, "tools/check_contract.py", "/root/testdata/sf0.01"],
        2400,
    ))
    results.append(run(
        "plan audit", [sys.executable, "tools/explain_audit.py"], 600
    ))
    if not fast:
        env = dict(os.environ, SPARK_GRAFT_SKIP_SCALING="1")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=ROOT, capture_output=True, text=True, env=env, timeout=1800,
        )
        ok = r.returncode == 0
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if ok:
            try:
                payload = json.loads(line)
                ok = payload.get("value", 0) > 0
                print(
                    f"[{'PASS' if ok else 'FAIL'}] bench "
                    f"({time.time() - t0:.0f}s) "
                    f"value={payload.get('value')} "
                    f"fused={payload.get('queries', {}).get('fused_flagship')}s"
                )
            except json.JSONDecodeError:
                ok = False
                print("[FAIL] bench (bad JSON)")
        else:
            print(f"[FAIL] bench ({time.time() - t0:.0f}s)")
        results.append((ok, line[:400]))

    bad = [t for ok, t in results if not ok]
    if bad:
        print("--- failure tails ---")
        for t in bad:
            print(t)
        return 1
    print("release check clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
