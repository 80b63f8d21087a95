"""Measure source-grammar reach against the reference REPL corpus.

Extracts every verbatim `from ...` query line from
/root/reference/icicle-compiler/test/cli/repl/*/script and attempts to
parse it with icicle_spark.source_lang.parse_query_multi. Prints a
per-directory tally and (with -v) each failing line + the error.

Usage: python tools/corpus_reach.py [-v] [--dir tNN-name]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icicle_spark.source_lang import parse_query_multi  # noqa: E402

REPL = "/root/reference/icicle-compiler/test/cli/repl"


def corpus_lines(only_dir: str | None = None):
    """Yield (dir_name, line) for every `from ...` query line."""
    for script in sorted(glob.glob(f"{REPL}/*/script")):
        d = os.path.basename(os.path.dirname(script))
        if only_dir and d != only_dir:
            continue
        with open(script) as f:
            for raw in f:
                line = raw.strip()
                if line.startswith("from "):
                    yield d, line


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()

    total = ok = 0
    by_dir: dict[str, list[int]] = {}
    fails: list[tuple[str, str, str]] = []
    for d, line in corpus_lines(args.dir):
        total += 1
        by_dir.setdefault(d, [0, 0])[1] += 1
        try:
            parse_query_multi(line, name="q", dialect="sql")
            ok += 1
            by_dir[d][0] += 1
        except ValueError as e:
            fails.append((d, line, str(e)))
        except Exception as e:  # parser crash = bug, not a skip
            fails.append((d, line, f"CRASH {type(e).__name__}: {e}"))

    for d in sorted(by_dir):
        o, t = by_dir[d]
        mark = "" if o == t else "  <--"
        print(f"{d:32s} {o:3d}/{t:3d}{mark}")
    print(f"\nTOTAL {ok}/{total}")
    if args.verbose:
        print()
        for d, line, err in fails:
            print(f"[{d}] {line}\n    !! {err}")
    crash = [f for f in fails if f[2].startswith("CRASH")]
    if crash:
        print(f"\n{len(crash)} CRASHES (non-ValueError)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
