"""Unified ``icicle`` - shaped CLI (``python -m icicle_spark``).

Mirrors the reference's command surface
(icicle-compiler/main/icicle.hs:33-75: repl / compile / query /
check / lsp) on the Spark engine:

* ``check``   — parse + validate a dictionary, report skipped
                declarations (the reference's "check a dictionary for
                type errors").
* ``compile`` — dump the fused fold-plan IR per input (the engine's
                intermediate form; the reference emits its C
                intermediate here). ``--explain`` additionally starts
                a local SparkSession and prints the optimized
                physical plan over an empty typed frame.
* ``query``   — delegate to ``jobs/run_features.py`` (spark-submit
                entry).
* ``repl``    — delegate to ``icicle_spark.repl``.
* ``lsp``     — stdio language server publishing the checker's
                reference-shaped diagnostics (``icicle_spark.lsp``).
"""

from __future__ import annotations

import sys


def _load(path: str):
    import os

    from icicle_spark.source_lang import parse_dictionary_source

    with open(path) as f:
        text = f.read()
    return parse_dictionary_source(
        text, base_dir=os.path.dirname(os.path.abspath(path))
    )


def _cmd_check(args) -> int:
    try:
        d, skipped = _load(args.dictionary)
    except (ValueError, OSError) as ex:
        from icicle_spark.checker import SourceError

        if isinstance(ex, SourceError):
            # reference-shaped diagnostic block (Check/Desugar/Parse
            # error — the repl corpus error surface)
            print("\n".join(ex.render()), file=sys.stderr)
        else:
            print(f"error: {ex}", file=sys.stderr)
        return 1
    for name, inp in d.inputs.items():
        print(f"input  {name} : {inp.struct().simpleString()}")
    for name in d.outputs:
        o = d.outputs[name]
        print(f"output {name} (from {o.input})")
    for name, reason in skipped.items():
        print(f"SKIPPED {name}: {reason}", file=sys.stderr)
    if skipped and args.strict:
        return 1
    print(f"ok: {len(d.inputs)} inputs, {len(d.outputs)} outputs"
          + (f", {len(skipped)} skipped" if skipped else ""))
    return 0


def _fmt_feature(f) -> str:
    parts = [f"agg={f.agg.name}", f"expr={f.expr!r}"]
    for attr in (
        "where", "window", "latest", "latest_outer", "by", "group",
        "distinct", "filter_let", "post_group_filter", "group_latest",
        "half_life_days", "scans",
    ):
        v = getattr(f, attr)
        if v not in (None, False, ()):
            parts.append(f"{attr}={v!r}")
    return f"  fold {f.name}: " + ", ".join(parts)


def _cmd_compile(args) -> int:
    try:
        d, skipped = _load(args.dictionary)
    except (ValueError, OSError) as ex:
        print(f"error: {ex}", file=sys.stderr)
        return 1
    for name, reason in skipped.items():
        print(f"SKIPPED {name}: {reason}", file=sys.stderr)
    inputs_with_outputs = sorted(
        {o.input for o in d.outputs.values()}
    )
    for input_name in inputs_with_outputs:
        plan = d.plan_for(input_name)
        outs = [n for n, o in d.outputs.items() if o.input == input_name]
        print(f"plan for input {input_name!r} "
              f"({len(plan.features)} fused folds -> {len(outs)} outputs):")
        for f in plan.features:
            print(_fmt_feature(f))
        for pc in plan.postcomps:
            print(f"  postcomp {pc!r}")
        if args.explain:
            from icicle_spark.plans import compile_native
            from icicle_spark.session import get_spark

            spark = get_spark(cpus=args.cpus or 2)
            spark.sparkContext.setLogLevel("ERROR")
            facts = spark.createDataFrame(
                [], schema=d.inputs[input_name].schema
            )
            compile_native(facts, plan, snapshot=args.snapshot).explain(
                "formatted"
            )
    return 0


def main(argv: list[str] | None = None) -> int:
    import argparse

    argv = sys.argv[1:] if argv is None else argv
    ap = argparse.ArgumentParser(
        prog="icicle-spark",
        description=__doc__.split("\n")[0],
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_check = sub.add_parser("check", help="check a dictionary")
    p_check.add_argument("dictionary")
    p_check.add_argument(
        "--strict", action="store_true",
        help="fail when any declaration is skipped",
    )

    p_compile = sub.add_parser("compile", help="dump the fused fold-plan IR")
    p_compile.add_argument("dictionary")
    p_compile.add_argument(
        "--explain", action="store_true",
        help="also print the Spark physical plan (starts a session)",
    )
    p_compile.add_argument("--snapshot", default="2017-01-01")
    p_compile.add_argument("--cpus", type=int, default=None)

    sub.add_parser(
        "query", help="run features (delegates to jobs/run_features.py)",
        add_help=False,
    )
    sub.add_parser(
        "repl", help="interactive REPL (delegates to icicle_spark.repl)",
        add_help=False,
    )
    sub.add_parser(
        "lsp",
        help="language server over stdio (checker diagnostics)",
    )

    # delegate query/repl with their own flag namespaces untouched
    if argv and argv[0] == "query":
        from jobs.run_features import main as qmain

        return qmain(argv[1:]) or 0
    if argv and argv[0] == "repl":
        from icicle_spark.repl import main as rmain

        return rmain(argv[1:]) or 0

    args = ap.parse_args(argv)
    if args.cmd == "check":
        return _cmd_check(args)
    if args.cmd == "compile":
        return _cmd_compile(args)
    if args.cmd == "lsp":
        from icicle_spark.lsp import serve

        return serve()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
