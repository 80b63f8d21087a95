"""Reference-shaped source diagnostics: the checker / desugar error
surface the reference REPL corpus pins.

Reproduces three error families verbatim-shaped (same kind header,
message form, and ``at line:col`` position the reference prints):

* ``## Check error`` — ``Unknown variable x at 1:17`` with the top-5
  edit-distance-ranked ``Suggested bindings are:`` list and their
  type signatures (Checker/Error.hs:149 ErrorNoSuchVariable,
  Error.hs:322 AvailableBindings — take 5, sortBy editDistance;
  corpus golden: t20-lexer/expected:44-63).
* ``## Parse error`` — megaparsec-style frame on unterminated string
  literals (t20-lexer/expected:68-77).
* ``## Desugar error`` — ``Missing alternative: { a = None, b =
  Some _ }`` / ``Overlapping pattern: { a = None, b = None }`` for
  case alternatives, via the standard pattern-matrix usefulness
  algorithm (Maranget, "Warnings for pattern matching", JFP 2007 —
  the same check the reference runs at desugar time;
  t13.1-cases-record/expected:27-41).  The reference renders the
  unconstrained hole of a missing alternative as a fresh variable
  (``desugar_q-5``); this checker renders ``_``.

Constructor universes are inferred from the patterns themselves
(Bool ``True/False``, Option ``Some/None``, Sum ``Left/Right``,
tuples and records as single-constructor products with the
column-wide field union); literal columns (ints, strings, dates)
are open universes that require a default alternative — exactly the
reference's typing, reached without a type environment.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

__all__ = [
    "SourceError",
    "check_case_alternatives",
    "check_unterminated_string",
    "check_unknown_variables",
    "diagnose",
    "render_pattern",
]


class SourceError(ValueError):
    """A parse/check/desugar diagnostic with the reference's block
    rendering.  Subclasses ValueError so every existing rejection
    path (corpus reach, dictionary skip reporting, the REPL ladder)
    keeps treating it as a loud parse failure."""

    def __init__(
        self,
        kind: str,
        message: str,
        loc: tuple[int, int] | None = None,
        suggestions: Sequence[str] | None = None,
        frame: Sequence[str] | None = None,
    ):
        self.kind = kind  # "Parse error" | "Check error" | "Desugar error"
        self.message = message
        self.loc = loc
        self.suggestions = list(suggestions or [])
        self.frame = list(frame or [])
        at = f" at {loc[0]}:{loc[1]}" if loc else ""
        super().__init__(f"{kind}: {message}{at}")

    def with_loc(self, loc: tuple[int, int]) -> "SourceError":
        """A copy carrying a source position (exprlang raises without
        one; the caller that still holds the full query text adds it)."""
        return SourceError(
            self.kind, self.message, loc, self.suggestions, self.frame
        )

    def render(self) -> list[str]:
        """The reference repl's error block (t20/t13.1 goldens)."""
        at = f" at {self.loc[0]}:{self.loc[1]}" if self.loc else ""
        out = ["Error", "-----", "", f"## {self.kind}", ""]
        out.extend(f"  {ln}" if ln else "" for ln in self.frame)
        if self.message:
            out.append(f"  {self.message}{at}")
        if self.suggestions:
            out.extend(["", "  Suggested bindings are:", ""])
            for i, s in enumerate(self.suggestions):
                if i:
                    out.append("")
                out.extend(f"    {ln}" for ln in s.splitlines())
        return out


# ------------------------------------------------------------------
# pattern rendering (exprlang pattern AST -> reference surface syntax)

def render_pattern(p: tuple) -> str:
    k = p[0]
    if k == "pwild":
        return "_"
    if k == "pvar":
        return p[1]
    if k == "plit":
        v = p[1]
        if isinstance(v, bool):
            return "True" if v else "False"
        if isinstance(v, str):
            return f'"{v}"'
        return str(v)
    if k == "pctor":
        tag, sub = p[1], p[2]
        if sub is None:
            return tag
        inner = render_pattern(sub)
        if sub[0] in ("pctor",) and sub[2] is not None:
            inner = f"({inner})"
        return f"{tag} {inner}"
    if k == "ptuple":
        return "(" + ", ".join(render_pattern(s) for s in p[1]) + ")"
    if k == "precord":
        fields = ", ".join(
            f"{n} = {render_pattern(s)}" for n, s in p[1]
        )
        return "{ " + fields + " }"
    raise ValueError(f"unknown pattern {p!r}")


# ------------------------------------------------------------------
# pattern-matrix usefulness (Maranget 2007)
#
# Root descriptors: ("ctor", tag, arity) for Some/None/Left/Right and
# True/False; ("lit", key) for literal values; ("tup", n); ("rec",
# field_tuple).  A pvar/pwild root is None.

_OPTION = ("Some", "None")
_EITHER = ("Left", "Right")
_BOOL = ("True", "False")
_ARITY = {"Some": 1, "None": 0, "Left": 1, "Right": 1,
          "True": 0, "False": 0, "ExceptTombstone": 0, "Unit": 0}


def _lit_key(v: Any) -> tuple:
    # bool is an int subclass in python; the source types are distinct
    return (type(v).__name__, v)


def _root(p: tuple, rec_fields: tuple[str, ...] | None = None):
    k = p[0]
    if k in ("pwild", "pvar"):
        return None
    if k == "plit":
        if isinstance(p[1], bool):
            return ("ctor", "True" if p[1] else "False", 0)
        return ("lit", _lit_key(p[1]))
    if k == "pctor":
        return ("ctor", p[1], 0 if p[2] is None else 1)
    if k == "ptuple":
        return ("tup", len(p[1]))
    if k == "precord":
        fields = rec_fields or tuple(n for n, _ in p[1])
        return ("rec", fields)
    raise ValueError(f"unknown pattern {p!r}")


def _sub_patterns(p: tuple, root) -> list[tuple]:
    """The sub-patterns a specialized row contributes, padded to the
    root's arity (records pad omitted fields with wildcards)."""
    k = p[0]
    if k == "pctor":
        return [p[2]] if p[2] is not None else []
    if k == "ptuple":
        return list(p[1])
    if k == "precord":
        got = dict(p[1])
        return [got.get(f, ("pwild",)) for f in root[1]]
    return []


def _root_arity(root) -> int:
    if root[0] == "ctor":
        return root[2]
    if root[0] == "lit":
        return 0
    if root[0] == "tup":
        return root[1]
    if root[0] == "rec":
        return len(root[1])
    raise ValueError(root)


def _same_ctor(a, b) -> bool:
    """Roots match for specialization (Some with/without a sub-pattern
    are the same constructor at different arity — normalize on tag)."""
    if a[0] != b[0]:
        return False
    if a[0] == "ctor":
        return a[1] == b[1]
    return a == b


def _rebuild(root, subs: list[tuple]) -> tuple:
    if root[0] == "ctor":
        tag = root[1]
        if tag == "True":
            return ("plit", True)
        if tag == "False":
            return ("plit", False)
        return ("pctor", tag, subs[0] if subs else None)
    if root[0] == "lit":
        return ("plit", root[1][1])
    if root[0] == "tup":
        return ("ptuple", subs)
    if root[0] == "rec":
        return ("precord", list(zip(root[1], subs)))
    raise ValueError(root)


def _column_roots(matrix: list[list[tuple]]):
    """Distinct constructor roots used in the first column.  Record
    roots are unified on the column-wide field union (a pattern that
    omits a field still matches it — t13.1 `{ b = None }` reads
    `{ a = _, b = None }`)."""
    rec_fields: list[str] = []
    for row in matrix:
        if row[0][0] == "precord":
            for n, _ in row[0][1]:
                if n not in rec_fields:
                    rec_fields.append(n)
    roots = []
    for row in matrix:
        r = _root(row[0], tuple(rec_fields) or None)
        if r is not None and not any(_same_ctor(r, x) for x in roots):
            roots.append(r)
    return roots, tuple(rec_fields)


def _universe(roots) -> list | None:
    """The full constructor set of the inferred type, or None when the
    type is open (literals) or unknown (no roots)."""
    if not roots:
        return None
    kinds = {r[0] for r in roots}
    if kinds == {"tup"} and len({r[1] for r in roots}) == 1:
        return [roots[0]]
    if kinds == {"rec"}:
        return [roots[0]]
    if kinds == {"ctor"}:
        tags = {r[1] for r in roots}
        for family in (_OPTION, _EITHER, _BOOL):
            if tags <= set(family):
                out = []
                for t in family:
                    have = next((r for r in roots if r[1] == t), None)
                    out.append(have or ("ctor", t, _ARITY[t]))
                return out
    return None  # literals / mixed: open universe


def _specialize(matrix: list[list[tuple]], root, rec_fields):
    out = []
    for row in matrix:
        r = _root(row[0], rec_fields or None)
        if r is None:
            out.append([("pwild",)] * _root_arity(root) + row[1:])
        elif _same_ctor(r, root):
            subs = _sub_patterns(row[0], root)
            subs += [("pwild",)] * (_root_arity(root) - len(subs))
            out.append(subs + row[1:])
    return out


def _useful(matrix: list[list[tuple]], q: list[tuple]):
    """Maranget's U with witness: None when q is covered by matrix,
    else an example pattern vector matched by q but by no matrix row."""
    if not q:
        return None if matrix else []
    roots, rec_fields = _column_roots(matrix + [q])
    head = q[0]
    hr = _root(head, rec_fields or None)
    if hr is not None:
        sm = _specialize(matrix, hr, rec_fields)
        subs = _sub_patterns(head, hr)
        subs += [("pwild",)] * (_root_arity(hr) - len(subs))
        w = _useful(sm, subs + q[1:])
        if w is None:
            return None
        k = _root_arity(hr)
        return [_rebuild(hr, w[:k])] + w[k:]
    # wildcard head
    m_roots, _ = _column_roots(matrix) if matrix else ([], ())
    uni = _universe(m_roots)
    if uni is not None and all(
        any(_same_ctor(u, r) for r in m_roots) for u in uni
    ):
        # complete signature: try each constructor
        for c in uni:
            sm = _specialize(matrix, c, rec_fields)
            w = _useful(sm, [("pwild",)] * _root_arity(c) + q[1:])
            if w is not None:
                k = _root_arity(c)
                return [_rebuild(c, w[:k])] + w[k:]
        return None
    # incomplete or open: the default matrix
    dm = [row[1:] for row in matrix
          if _root(row[0], rec_fields or None) is None]
    w = _useful(dm, q[1:])
    if w is None:
        return None
    if uni is not None:
        missing = next(
            u for u in uni if not any(_same_ctor(u, r) for r in m_roots)
        )
        return [_rebuild(missing, [("pwild",)] * _root_arity(missing))] + w
    return [("pwild",)] + w


def check_case_alternatives(pats: list[tuple]) -> None:
    """Desugar-time pattern checks (reference Transform/Desugar):
    raise ``Overlapping pattern`` when an alternative can never fire,
    ``Missing alternative`` (with a witness) when the set does not
    cover the scrutinee type."""
    for i in range(1, len(pats)):
        if _useful([[p] for p in pats[:i]], [pats[i]]) is None:
            raise SourceError(
                "Desugar error",
                f"Overlapping pattern: {render_pattern(pats[i])}",
            )
    w = _useful([[p] for p in pats], [("pwild",)])
    if w is not None:
        raise SourceError(
            "Desugar error",
            f"Missing alternative: {render_pattern(w[0])}",
        )


# ------------------------------------------------------------------
# Check error: unknown variables with ranked suggestions

# Reference-printed signatures (data/libs/prelude.icicle + the wired
# builtins the t20 golden lists).  Multi-line exactly as the repl
# renders them (prettyTypedFun).
PRELUDE_SIGS: dict[str, str] = {
    "sum": "sum :\n     Num a\n  => Element a\n  -> Aggregate a",
    "count": "count :\n     Num a\n  => Element b\n  -> Aggregate a",
    "mean": "mean :\n     Num a\n  => Element a\n  -> Aggregate (Possibly Double)",
    "max": "max :\n     Element a\n  -> Aggregate (Possibly a)",
    "min": "min :\n     Element a\n  -> Aggregate (Possibly a)",
    "newest": "newest :\n     Element a\n  -> Aggregate (Possibly a)",
    "oldest": "oldest :\n     Element a\n  -> Aggregate (Possibly a)",
    "variance": "variance :\n     Num a\n  => Element a\n  -> Aggregate (Possibly Double)",
    "sd": "sd :\n     Num a\n  => Element a\n  -> Aggregate (Possibly Double)",
    "any": "any :\n     Element Bool\n  -> Aggregate Bool",
    "all": "all :\n     Element Bool\n  -> Aggregate Bool",
    "max_by": "max_by :\n     Element a\n  -> Element b\n  -> Aggregate (Possibly b)",
    "min_by": "min_by :\n     Element a\n  -> Element b\n  -> Aggregate (Possibly b)",
    "covariance": "covariance :\n     Num a\n  => Element a\n  -> Element a\n  -> Aggregate (Possibly Double)",
    "correlation": "correlation :\n     Num a\n  => Element a\n  -> Element a\n  -> Aggregate (Possibly Double)",
    "gradient": "gradient :\n     Num a\n  => Element a\n  -> Element a\n  -> Aggregate (Possibly Double)",
    "intercept": "intercept :\n     Num a\n  => Element a\n  -> Element a\n  -> Aggregate (Possibly Double)",
    "numflips": "numflips :\n     Num n\n  => Element a\n  -> Aggregate n",
    "distinct_values": "distinct_values :\n     Element a\n  -> Aggregate (Possibly (Array a))",
    "days_in": "days_in :\n     Element a\n  -> Element Time\n  -> Aggregate Time\n  -> Aggregate (Possibly (Group a Int))",
    "circular_stats": "circular_stats :\n     Element Double\n  -> Aggregate (Possibly { mean : Double, sd : Double, z_test : Double })",
    "mod": "mod : Int -> Int -> Possibly Int",
    "int_div": "int_div : Int -> Int -> Possibly Int",
    "is_weekend": "is_weekend : Time -> Possibly Bool",
    "not": "not : Bool -> Bool",
    "is_some": "is_some : Option a -> Bool",
    "is_none": "is_none : Option a -> Bool",
    "get": "get : Option a -> Possibly a",
    "get_or_else": "get_or_else : a -> Option a -> a",
    "fst": "fst : (a, b) -> a",
    "snd": "snd : (a, b) -> b",
    "pi": "pi : Double",
    "exp": "exp : Double -> Possibly Double",
    "log": "log : Double -> Possibly Double",
    "sqrt": "sqrt : Double -> Possibly Double",
    "abs": "abs : Num a => a -> a",
    "double": "double : Num a => a -> Double",
    "floor": "floor : Num a => a -> Int",
    "ceil": "ceil : Num a => a -> Int",
    "trunc": "trunc : Num a => a -> Int",
    "sin": "sin : Double -> Possibly Double",
    "cos": "cos : Double -> Possibly Double",
    "tan": "tan : Double -> Possibly Double",
    "asin": "asin : Double -> Possibly Double",
    "acos": "acos : Double -> Possibly Double",
    "atan": "atan : Double -> Possibly Double",
    "atan2": "atan2 : Double -> Double -> Possibly Double",
    "sinh": "sinh : Double -> Possibly Double",
    "cosh": "cosh : Double -> Possibly Double",
    "tanh": "tanh : Double -> Possibly Double",
    "seq": "seq : a -> b -> b",
    "year_of": "year_of : Time -> Int",
    "month_of": "month_of : Time -> Int",
    "day_of": "day_of : Time -> Int",
    "days_between": "days_between : Time -> Time -> Int",
    "days": "days : Time -> Int",
    "length": "length : Array a -> Int",
    "sort": "sort : Array a -> Array a",
    "index": "index : Array a -> Int -> Possibly a",
    "map_create": "map_create : Group k v",
    "map_insert": "map_insert :\n     k\n  -> v\n  -> Group k v\n  -> Possibly (Group k v)",
    "map_delete": "map_delete : k -> Group k v -> Group k v",
    "map_lookup": "map_lookup : k -> Group k v -> Option v",
    "keys": "keys : Group k v -> Array k",
    "box": "box : Sum Error a -> Possibly a",
}

# query-structure words that are never variables
_QUERY_KEYWORDS = frozenset({
    "from", "in", "feature", "filter", "let", "fold", "fold1", "scan",
    "group", "distinct", "latest", "windowed", "between", "and",
    "before", "after", "days", "weeks", "months", "day", "week",
    "month", "case", "of", "then", "else", "if", "now", "time",
    "value", "true", "false", "array", "tombstone", "_",
    # the implicit whole-struct binding on struct-encoded inputs
    # (reference Query/Environment.hs:109)
    "fields",
})
_CTOR_WORDS = frozenset({
    "Some", "None", "Left", "Right", "True", "False",
    "ExceptTombstone", "Unit",
})

_ID_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_']*")
# the identifier SCAN lexes numbers first, so a scientific literal's
# exponent is not an identifier (`3e3` is one number) while a failed
# exponent stays one (`5ea1` lexes `5` then `ea1` — the t20 golden)
_SCAN_RE = re.compile(
    r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|[A-Za-z_][A-Za-z0-9_']*"
)


def _edit_distance(a: str, b: str) -> int:
    """Levenshtein (the reference ranks suggestions with the same
    metric — Checker/Error.hs:322 editDistance)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def _suggestions(name: str, env: dict[str, str]) -> list[str]:
    """Top-5 bindings by edit distance; each rendered with its
    signature (reference take-5 rule)."""
    ranked = sorted(env, key=lambda k: (_edit_distance(name, k), k))
    return [env[k] for k in ranked[:5]]


def _line_col(text: str, offset: int) -> tuple[int, int]:
    line = text.count("\n", 0, offset) + 1
    col = offset - (text.rfind("\n", 0, offset) + 1) + 1
    return line, col


def _binder_names(masked: str) -> set[str]:
    """Every name the query itself binds, collected lexically (an
    over-approximation only ever WEAKENS the check — a shadowed name
    in an odd position can't produce a false 'unknown')."""
    binds: set[str] = set()
    for m in re.finditer(r"\b(?:let|fold1?|scan)\s+([A-Za-z_][\w']*)\s*=",
                         masked):
        binds.add(m.group(1))
    # multi-binds separated by `;` (t09.1 `let a = (..); b = (..)`)
    for m in re.finditer(r";\s*([A-Za-z_][\w']*)\s*=", masked):
        binds.add(m.group(1))
    # tuple binders, arbitrarily nested: `let (x, _) =`,
    # `group fold (_, (severity, counts)) =` (t09-group-folds)
    for m in re.finditer(r"\b(?:let|fold1?|scan)\s*\(", masked):
        i, depth = m.end() - 1, 0
        for j in range(i, len(masked)):
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
                if depth == 0:
                    break
        binds.update(_ID_RE.findall(masked[i:j + 1]))
    for m in re.finditer(r"\bfilter\s+let\s+(.*?)=", masked):
        binds.update(
            w for w in _ID_RE.findall(m.group(1)) if w not in _CTOR_WORDS
        )
    # case alternative patterns: `of P then` / `; P then`
    for m in re.finditer(r"(?:\bof\b|;)\s*([^;]*?)\bthen\b", masked):
        binds.update(
            w for w in _ID_RE.findall(m.group(1)) if w not in _CTOR_WORDS
        )
    # record literal / record pattern field names: `{ a = .. }`
    for m in re.finditer(r"[{,]\s*([A-Za-z_][\w']*)\s*=", masked):
        binds.add(m.group(1))
    return binds


def check_unknown_variables(
    query: str,
    fields: Sequence[str] = (),
    functions: Sequence[str] = (),
) -> None:
    """Raise the reference's ``Unknown variable x at l:c`` Check error
    for the first identifier that no dictionary field, prelude
    binding, user function, or query-local bind supplies.

    ``fields`` are the loaded input's columns (`value`, `time`,
    struct fields); ``functions`` are user-defined dictionary
    functions.  Purely lexical on the string-masked query — binder
    collection over-approximates, so it can only miss, never
    mis-fire."""
    from icicle_spark.source_lang import _mask_strings

    masked, _ = _mask_strings(query)
    known = set(PRELUDE_SIGS)
    # the stream name after `from` is an input, not a variable
    known.update(re.findall(r"\bfrom\s+([A-Za-z_][\w']*)", masked))
    known.update(_QUERY_KEYWORDS)
    known.update(_CTOR_WORDS)
    known.update(("numflips'", "elem", "str_len", "grepl", "to_lower",
                  "to_upper", "num_unique"))
    known.update(fields)
    known.update(functions)
    known.update(_binder_names(masked))
    env = dict(PRELUDE_SIGS)
    for f in fields:
        env.setdefault(f, f"{f} : Element a")
    for f in functions:
        env.setdefault(f, f"{f} : (dictionary function)")
    for m in _SCAN_RE.finditer(masked):
        name = m.group(0)
        if name[0].isdigit():  # a (possibly scientific) number literal
            continue
        if name in known or name.startswith("__strlit"):
            continue
        # dotted struct access: only the head resolves
        if m.start() > 0 and masked[m.start() - 1] == ".":
            continue
        raise SourceError(
            "Check error",
            f"Unknown variable {name}",
            loc=_line_col(masked, m.start()),
            suggestions=_suggestions(name, env),
        )


def check_unterminated_string(query: str) -> None:
    """Raise the reference's megaparsec-shaped Parse error when a
    string literal never closes (t20-lexer golden)."""
    from icicle_spark.source_lang import _mask_strings

    masked, _ = _mask_strings(query)
    i = masked.find('"')
    if i < 0:
        return
    line, col = _line_col(masked, i)
    endl, endc = _line_col(masked, len(masked))
    snippet = masked.splitlines()[line - 1] if masked.splitlines() else ""
    raise SourceError(
        "Parse error",
        "",
        frame=[
            f"{endl}:{endc + 1}:",
            "  |",
            f"{line} | {snippet}",
            "  |" + " " * (col + 1) + "^",
            "unexpected end of input",
            "expecting '\"'",
        ],
    )


def diagnose(
    query: str,
    exc: Exception,
    fields: Sequence[str] = (),
    functions: Sequence[str] = (),
) -> SourceError | None:
    """Best-effort upgrade of a failed query's exception into a
    reference-shaped diagnostic.  Called on the REPL's error path
    only — never on the hot path — so it re-scans the source freely.
    Returns None when no reference-shaped reading applies (the caller
    keeps its generic error line)."""
    if isinstance(exc, SourceError):
        if exc.loc is None:
            m = re.search(r"\bcase\b", query)
            if m:
                return exc.with_loc(_line_col(query, m.start()))
        return exc
    try:
        check_unterminated_string(query)
        check_unknown_variables(query, fields, functions)
    except SourceError as se:
        return se
    return None
