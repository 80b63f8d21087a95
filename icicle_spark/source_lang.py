"""Icicle source-language front-end: parse real query strings into
the engine's fold-plan IR.

A query is a context pipeline ending in an aggregate
(icicle-source/src/Icicle/Source/Query/Query.hs:59-63):

    from salary ~> filter value > 10 ~> count value
    from salary ~> windowed 3 months ~> latest 10 ~> value
    from injury ~> filter let "head" = location ~> sum severity
    from salary ~> filter let Some zod = Some (value + 1)
                ~> latest 3 ~> zod

Supported subset (each maps 1:1 onto a Feature field — the engine's
IR was shaped by these contexts, Context.hs:25-37):

* ``filter e`` / ``filter let Some x = e`` (Option bind) /
  ``filter let LITERAL = e`` (literal pattern = equality filter)
* ``windowed N days|weeks|months`` / ``windowed between A u and B u``
* ``latest N`` (repeated: a filter between two latests makes the
  first an OUTER frame; back-to-back latests collapse to the min)
* ``group e`` / ``distinct e``
* ``let x = e`` (pure bind; substituted textually downstream)
* terminal aggregates: sum count mean min max newest oldest variance
  sd any all / ``max_by k v`` ``min_by k v`` / ``count ()`` /
  a bare element expression under ``latest N`` (array result)

Element expressions pass through verbatim to the execution dialect:
``dialect="sql"`` for the native Catalyst compiler, ``"pandas"`` for
the Arrow fold executors (plain comparisons like ``value > 10`` and
``location == "head"`` are valid in both). Out-of-scope forms —
aggregate arithmetic (``sum x / count x``), tuples, ``now``, custom
function definitions — raise ValueError naming the construct; they
compose from multiple parsed queries / CustomFold at the API layer.
"""

from __future__ import annotations

import re

from icicle_spark.plans.ir import Agg, Feature, Plan, Window

_AGGS = {
    "sum": Agg.SUM, "count": Agg.COUNT, "mean": Agg.MEAN,
    "min": Agg.MIN, "max": Agg.MAX, "newest": Agg.NEWEST,
    "oldest": Agg.OLDEST, "variance": Agg.VARIANCE, "sd": Agg.SD,
    "any": Agg.ANY, "all": Agg.ALL,
}

_UNITS = {"day": "days", "days": "days", "week": "weeks",
          "weeks": "weeks", "month": "months", "months": "months"}


def _unit(u: str) -> str:
    if u not in _UNITS:
        raise ValueError(f"unknown window unit {u!r}")
    return _UNITS[u]


def _strip_some(e: str) -> str:
    """`Some (expr)` / `Some expr` -> expr (the parser's Option
    constructors are erased; null IS None in the engine encoding)."""
    m = re.fullmatch(r"Some\s*\((.*)\)", e.strip(), re.S)
    if m:
        return m.group(1).strip()
    m = re.fullmatch(r"Some\s+(.+)", e.strip(), re.S)
    return m.group(1).strip() if m else e.strip()


class _Builder:
    def __init__(self, dialect: str) -> None:
        if dialect not in ("sql", "pandas"):
            raise ValueError("dialect must be 'sql' or 'pandas'")
        self.dialect = dialect
        self.filters: list[str] = []
        self.binds: list[tuple[str, str]] = []
        self.lets: dict[str, str] = {}
        self.window: Window | None = None
        self.latest: int | None = None
        self.latest_outer: int | None = None
        self._filter_since_latest = False
        self.group: str | None = None
        self.distinct: str | None = None

    def sub(self, e: str) -> str:
        """Apply pure `let` binds textually (parenthesized, word
        boundaries). filter-let binds stay COLUMNS (the IR carries
        them), so they are not substituted."""
        out = e.strip()
        for k, v in self.lets.items():
            out = re.sub(rf"\b{re.escape(k)}\b", f"({v})", out)
        return out

    def where(self) -> str | None:
        if not self.filters:
            return None
        if len(self.filters) == 1:
            return self.filters[0]
        j = " and " if self.dialect == "pandas" else " AND "
        return j.join(f"({f})" for f in self.filters)


def _apply_context(b: _Builder, c: str) -> None:
    c = c.strip()
    m = re.fullmatch(r"filter\s+let\s+Some\s+(\w+)\s*=\s*(.+)", c, re.S)
    if m:
        b.binds.append((m.group(1), b.sub(_strip_some(m.group(2)))))
        b._filter_since_latest = True
        return
    m = re.fullmatch(r"filter\s+let\s+(\"[^\"]*\"|[-\d.]+)\s*=\s*(.+)", c, re.S)
    if m:
        # literal pattern: equality filter (repl t04.1)
        eq = "==" if b.dialect == "pandas" else "="
        b.filters.append(f"({b.sub(m.group(2))}) {eq} {m.group(1)}")
        b._filter_since_latest = True
        return
    m = re.fullmatch(r"filter\s+(.+)", c, re.S)
    if m:
        b.filters.append(b.sub(m.group(1)))
        b._filter_since_latest = True
        return
    m = re.fullmatch(
        r"windowed\s+between\s+(\d+)\s+(\w+)\s+and\s+(\d+)\s+(\w+)", c
    )
    if m:
        a, ua, z, uz = m.groups()
        if _unit(ua) != _unit(uz):
            raise ValueError("mixed window units")
        b.window = Window(int(z), int(a), unit=_unit(uz))
        return
    m = re.fullmatch(r"windowed\s+(\d+)\s+(\w+)", c)
    if m:
        b.window = Window(int(m.group(1)), unit=_unit(m.group(2)))
        return
    m = re.fullmatch(r"latest\s+(\d+)", c)
    if m:
        n = int(m.group(1))
        if b.latest is None:
            b.latest = n
        elif b._filter_since_latest:
            # `latest A ~> filter ... ~> latest B`: A is the OUTER frame
            if b.latest_outer is not None:
                raise ValueError("more than two filtered latest frames")
            b.latest_outer, b.latest = b.latest, n
        else:
            b.latest = min(b.latest, n)  # latest A ~> latest B == min
        b._filter_since_latest = False
        return
    m = re.fullmatch(r"group\s+(.+)", c, re.S)
    if m:
        b.group = b.sub(m.group(1))
        return
    m = re.fullmatch(r"distinct\s+(.+)", c, re.S)
    if m:
        b.distinct = b.sub(m.group(1))
        return
    m = re.fullmatch(r"let\s+(\w+)\s*=\s*(.+)", c, re.S)
    if m:
        b.lets[m.group(1)] = b.sub(m.group(2))
        return
    raise ValueError(f"unsupported context: {c!r}")


def parse_query(
    q: str,
    name: str = "q0",
    dialect: str = "sql",
    skip_nulls: bool = False,
) -> tuple[str, Feature]:
    """Parse one `from INPUT ~> ... ~> AGG` query string; returns
    (input_name, Feature). ``skip_nulls=False`` is the faithful
    Possibly default (a null element poisons the aggregate)."""
    segs = [s.strip() for s in q.strip().split("~>")]
    m = re.fullmatch(r"from\s+([A-Za-z_]\w*)", segs[0])
    if not m:
        raise ValueError(f"query must start with 'from INPUT': {segs[0]!r}")
    input_name = m.group(1)
    if len(segs) < 2:
        raise ValueError("query has no aggregate")
    b = _Builder(dialect)
    for c in segs[1:-1]:
        _apply_context(b, c)
    tail = segs[-1].strip()
    by = None
    if tail in ("now",) or tail.startswith("("):
        raise ValueError(f"unsupported aggregate form: {tail!r}")
    m = re.fullmatch(r"(max_by|min_by)\s+(\S+)\s+(.+)", tail, re.S)
    if m:
        agg = Agg.MAX_BY if m.group(1) == "max_by" else Agg.MIN_BY
        by, expr = b.sub(m.group(2)), b.sub(m.group(3))
    else:
        m = re.fullmatch(r"([a-z_]+)\s*\(\s*\)", tail)
        if m and m.group(1) == "count":
            agg, expr = Agg.COUNT, "1"
        else:
            m = re.fullmatch(r"([a-z_]+)\s+(.+)", tail, re.S)
            if m and m.group(1) in _AGGS:
                agg, expr = _AGGS[m.group(1)], b.sub(m.group(2))
            elif b.latest is not None:
                # bare element expr under latest N -> array result
                agg, expr = Agg.COLLECT, b.sub(tail)
            else:
                raise ValueError(f"unsupported aggregate form: {tail!r}")
    feature = Feature(
        name,
        agg,
        expr,
        where=b.where(),
        window=b.window,
        latest=b.latest,
        latest_outer=b.latest_outer,
        by=by,
        group=b.group,
        distinct=b.distinct,
        filter_let=tuple(b.binds) if b.binds else None,
        skip_nulls=skip_nulls,
    )
    return input_name, feature


def parse_program(
    queries: dict[str, str] | list[str],
    dialect: str = "sql",
    skip_nulls: bool = False,
    entity_col: str = "entity",
    time_col: str = "time",
    seq_col: str | None = None,
    tombstone_col: str | None = None,
) -> dict[str, Plan]:
    """Parse many queries and FUSE them per input (the reference fuses
    all queries over one attribute into a single pass —
    Core/Program/Fusion.hs:37-81). Returns {input_name: Plan}."""
    items = (
        queries.items()
        if isinstance(queries, dict)
        else ((f"q{i}", q) for i, q in enumerate(queries))
    )
    feats: dict[str, list[Feature]] = {}
    for name, q in items:
        inp, f = parse_query(q, name, dialect, skip_nulls)
        feats.setdefault(inp, []).append(f)
    return {
        inp: Plan(
            fs,
            entity_col=entity_col,
            time_col=time_col,
            seq_col=seq_col,
            tombstone_col=tombstone_col,
        )
        for inp, fs in feats.items()
    }
