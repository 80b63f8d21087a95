"""Icicle expression mini-language: tokenizer, parser, and three
lowerings (python evaluation for fold bodies, Spark-SQL text, and a
vectorized pandas callable).

Covers the expression grammar the reference REPL corpus exercises
(icicle-source/src/Icicle/Source/Query/Exp.hs constructors,
Constructor.hs patterns):

* literals (ints, floats incl. scientific, strings, True/False)
* variables (primes allowed: ``numflips'``)
* function application by juxtaposition (binds tightest)
* operators  ``|| && == /= < <= > >= + - * /``  and unary ``-`` / ``!``
* tuples ``(a, b, ...)`` and record literals ``{ a = e, b = e }``
* constructors ``Some None Left Right ExceptTombstone``
* ``case E of P then R; P then R`` (optional ``{ }`` around the
  alternatives) with literal / variable / wildcard / constructor /
  tuple / record patterns
* ``if c then a else b``

Values in the python evaluation: Options encode as ``None`` /
:class:`Ctor` ``("Some", v)`` (a raw non-None value also matches a
``Some`` pattern — elements are untagged), ``Left``/``Right`` as
tagged :class:`Ctor`, tuples as tuples, maps (``map_create`` /
``map_insert`` / ``map_delete``) as dicts with Data.Map-ordered
iteration applied at output time.
"""

from __future__ import annotations

import math
import re
from typing import Any, NamedTuple

# ---------------------------------------------------------------- tokens

_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<date>\d{4}-\d{2}-\d{2})
    | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<str>"(?:\\.|[^"\\])*")
    | (?P<id>[A-Za-z_][A-Za-z0-9_']*)
    | (?P<op>~>|==|/=|!=|<=|>=|&&|\|\||->|[-+*/<>=(){},;!_])
    )""",
    re.X,
)

_KEYWORDS = {"case", "of", "then", "else", "if", "in", "let"}
_CTORS = {"Some", "None", "Left", "Right", "True", "False",
          "ExceptTombstone", "Unit"}


class Ctor(NamedTuple):
    """A constructor value (sum types stay distinguishable from real
    tuples during fold evaluation)."""

    tag: str
    arg: Any = None


def tokenize(s: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m or m.end() == m.start():
            rest = s[i:].strip()
            if not rest:
                break
            raise ValueError(f"cannot tokenize at: {rest[:40]!r}")
        if m.lastgroup is None:  # pure whitespace tail
            break
        toks.append((m.lastgroup, m.group(m.lastgroup)))
        i = m.end()
    return toks


# ---------------------------------------------------------------- parser
# AST: ("lit", v) ("var", name) ("app", fname, [args])
#      ("bin", op, l, r) ("un", op, e) ("tuple", [es])
#      ("record", [(name, e), ...]) ("ctor", tag, arg|None)
#      ("case", scrut, [(pat, expr), ...]) ("if", c, a, b)
# patterns: ("plit", v) ("pvar", n) ("pwild",) ("pctor", tag, sub|None)
#           ("ptuple", [subs]) ("precord", [(name, sub), ...])

_BINPREC = {"||": 1, "&&": 2, "==": 3, "/=": 3, "!=": 3, "<": 3, "<=": 3,
            ">": 3, ">=": 3, "+": 4, "-": 4, "*": 5, "/": 5}


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0
        # inside a case-alternative BODY, an application chain must
        # not swallow the next alternative's pattern: the reference
        # separates alternatives by layout, so a repl one-liner reads
        # `... of None then A Some _ then B` with no `;` (t60-map-
        # delete). The flag arms a pattern-then lookahead in app().
        self._case_body = False

    def _pattern_then_ahead(self) -> bool:
        """True when the upcoming tokens read as `PATTERN then` — the
        start of another case alternative."""
        save = self.i
        try:
            self.pattern()
            t = self.peek()
            return bool(t and t[1] == "then")
        except ValueError:
            return False
        finally:
            self.i = save

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        self.i += 1
        return t

    def accept(self, val: str) -> bool:
        t = self.peek()
        if t and t[1] == val:
            self.i += 1
            return True
        return False

    def expect(self, val: str) -> None:
        t = self.next()
        if t[1] != val:
            raise ValueError(f"expected {val!r}, got {t[1]!r}")

    # -- expressions ---------------------------------------------------
    def expr(self, minprec: int = 0):
        t = self.peek()
        if t and t[0] == "id" and t[1] == "case":
            return self.case_expr()
        if t and t[0] == "id" and t[1] == "if":
            return self.if_expr()
        lhs = self.app()
        while True:
            t = self.peek()
            if not t or t[1] not in _BINPREC or _BINPREC[t[1]] < minprec:
                return lhs
            op = self.next()[1]
            rhs_min = _BINPREC[op] + 1  # left-assoc
            t2 = self.peek()
            if t2 and t2[0] == "id" and t2[1] in ("case", "if"):
                rhs = self.case_expr() if t2[1] == "case" else self.if_expr()
            else:
                rhs = self.expr_bin_rhs(rhs_min)
            lhs = ("bin", op, lhs, rhs)

    def expr_bin_rhs(self, minprec: int):
        lhs = self.app()
        while True:
            t = self.peek()
            if not t or t[1] not in _BINPREC or _BINPREC[t[1]] < minprec:
                return lhs
            op = self.next()[1]
            lhs = ("bin", op, lhs, self.expr_bin_rhs(_BINPREC[op] + 1))

    def case_expr(self):
        self.expect("case")
        scrut = self.expr()
        self.expect("of")
        braced = self.accept("{")
        alts = []
        while True:
            pat = self.pattern()
            self.expect("then")
            outer = self._case_body
            self._case_body = True
            try:
                body = self.expr()
            finally:
                self._case_body = outer
            alts.append((pat, body))
            if self.accept(";"):
                continue
            if self._pattern_then_ahead():
                continue  # layout-separated alternative (no `;`)
            break
        if braced:
            self.expect("}")
        # desugar-time pattern checks (reference Transform/Desugar —
        # t13.1 goldens): overlap and exhaustiveness are parse errors,
        # not a silent null branch
        from icicle_spark.checker import check_case_alternatives

        check_case_alternatives([p for p, _ in alts])
        return ("case", scrut, alts)

    def if_expr(self):
        self.expect("if")
        outer = self._case_body
        self._case_body = False  # this `then` belongs to the if
        try:
            c = self.expr()
        finally:
            self._case_body = outer
        self.expect("then")
        a = self.expr()
        self.expect("else")
        b = self.expr()
        return ("if", c, a, b)

    def app(self):
        head = self.atom()
        args = []
        while self._starts_atom():
            if self._case_body and self._pattern_then_ahead():
                break  # next alternative's pattern, not an argument
            args.append(self.atom())
        if not args:
            return head
        if head[0] == "ctor" and head[2] is None and len(args) == 1:
            return ("ctor", head[1], args[0])
        if head[0] == "var":
            return ("app", head[1], args)
        raise ValueError(f"cannot apply {head!r}")

    def _starts_atom(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        if t[0] in ("num", "str", "date"):
            return True
        if t[0] == "id":
            return t[1] not in _KEYWORDS
        return t[1] in ("(", "{")

    def atom(self):
        t = self.next()
        kind, v = t
        if kind == "num":
            return ("lit", float(v) if ("." in v or "e" in v or "E" in v)
                    else int(v))
        if kind == "date":
            import datetime as _dt

            # date literal (Time lits — t31/t60.1 `1600-03-01`)
            return ("lit", _dt.date.fromisoformat(v))
        if kind == "str":
            return ("lit", _unescape(v))
        if kind == "id":
            if v in _KEYWORDS:
                raise ValueError(f"unexpected keyword {v!r}")
            if v in _CTORS:
                if v == "True":
                    return ("lit", True)
                if v == "False":
                    return ("lit", False)
                return ("ctor", v, None)
            return ("var", v)
        if v == "-":
            return ("un", "-", self.atom_or_app())
        if v == "!":
            return ("un", "!", self.atom_or_app())
        if v == "(":
            es = [self.expr()]
            while self.accept(","):
                es.append(self.expr())
            self.expect(")")
            return es[0] if len(es) == 1 else ("tuple", es)
        if v == "{":
            fields = []
            if not self.accept("}"):
                while True:
                    name = self.next()
                    if name[0] != "id":
                        raise ValueError(f"bad record field {name[1]!r}")
                    self.expect("=")
                    fields.append((name[1], self.expr()))
                    if self.accept(","):
                        continue
                    break
                self.expect("}")
            return ("record", fields)
        raise ValueError(f"unexpected token {v!r}")

    def atom_or_app(self):
        """Operand of a unary operator: one application chain."""
        head = self.atom()
        args = []
        while self._starts_atom():
            args.append(self.atom())
        if not args:
            return head
        if head[0] == "ctor" and head[2] is None and len(args) == 1:
            return ("ctor", head[1], args[0])
        if head[0] == "var":
            return ("app", head[1], args)
        raise ValueError(f"cannot apply {head!r}")

    # -- patterns ------------------------------------------------------
    def pattern(self):
        t = self.next()
        kind, v = t
        if kind == "num":
            return ("plit", float(v) if ("." in v or "e" in v or "E" in v)
                    else int(v))
        if kind == "str":
            return ("plit", _unescape(v))
        if v == "_":
            return ("pwild",)
        if kind == "id":
            if v in _CTORS:
                if v == "True":
                    return ("plit", True)
                if v == "False":
                    return ("plit", False)
                sub = None
                if self._starts_pattern_atom() and v in ("Some", "Left", "Right"):
                    sub = self.pattern()
                return ("pctor", v, sub)
            if v in _KEYWORDS:
                raise ValueError(f"unexpected keyword in pattern: {v!r}")
            return ("pvar", v)
        if v == "-":
            nxt = self.next()
            if nxt[0] != "num":
                raise ValueError("expected number after '-' in pattern")
            n = nxt[1]
            val = float(n) if ("." in n or "e" in n or "E" in n) else int(n)
            return ("plit", -val)
        if v == "(":
            subs = [self.pattern()]
            while self.accept(","):
                subs.append(self.pattern())
            self.expect(")")
            return subs[0] if len(subs) == 1 else ("ptuple", subs)
        if v == "{":
            fields = []
            if not self.accept("}"):
                while True:
                    name = self.next()
                    if name[0] != "id":
                        raise ValueError(f"bad record pattern field {name[1]!r}")
                    self.expect("=")
                    fields.append((name[1], self.pattern()))
                    if self.accept(","):
                        continue
                    break
                self.expect("}")
            return ("precord", fields)
        raise ValueError(f"unexpected token in pattern: {v!r}")

    def _starts_pattern_atom(self) -> bool:
        t = self.peek()
        if t is None:
            return False
        if t[0] in ("num", "str"):
            return True
        if t[0] == "id":
            return t[1] not in _KEYWORDS
        return t[1] in ("(", "{", "_")


def _unescape(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "\\": "\\", '"': '"'}.get(
            m.group(1), m.group(1)
        ),
        body,
    )


def parse(s: str):
    p = _P(tokenize(s))
    ast = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens after expression: "
                         f"{[t[1] for t in p.toks[p.i:]]!r}")
    _check_cases_exhaustive(ast)
    return ast


# ------------------------------------------- case exhaustiveness check
# The reference checker rejects inexhaustive case alternatives
# statically (t13.1-cases-record goldens: `case {a=None, b=Some 4} of
# { ({a = Some _}) then 2; ({b = None}) then 3 }` is a Check error,
# not a runtime tombstone). Coverage is decided by abstract
# enumeration: each constrained path (record field / tuple slot)
# ranges over the constructor tags mentioned plus their complements
# (None/Some, Left/Right) or literal values plus OTHER; the case is
# exhaustive iff every world matches some alternative.

_PAT_COMPLEMENT = {"None": ("Some",), "Some": ("None",),
                   "Left": ("Right",), "Right": ("Left",)}


def _pat_irrefutable(pat) -> bool:
    k = pat[0]
    if k in ("pwild", "pvar"):
        return True
    if k == "ptuple":
        return all(_pat_irrefutable(p) for p in pat[1])
    if k == "precord":
        return all(_pat_irrefutable(p) for _, p in pat[1])
    return False


def _pat_constraints(pat, path=()):
    """{path: requirement} for a pattern, or None when not analyzable
    (a refutable pattern nested under a constructor argument)."""
    k = pat[0]
    if k in ("pwild", "pvar"):
        return {}
    if k == "plit":
        return {path: ("lit", pat[1])}
    if k == "pctor":
        if pat[2] is not None and not _pat_irrefutable(pat[2]):
            return None
        return {path: pat[1]}
    if k == "ptuple":
        out = {}
        for i, s in enumerate(pat[1]):
            c = _pat_constraints(s, path + (f"f{i + 1}",))
            if c is None:
                return None
            out.update(c)
        return out
    if k == "precord":
        out = {}
        for name, s in pat[1]:
            c = _pat_constraints(s, path + (name,))
            if c is None:
                return None
            out.update(c)
        return out
    return None


def _case_exhaustive(alts) -> bool:
    pats = [p for p, _ in alts]
    if any(_pat_irrefutable(p) for p in pats):
        return True
    cons = [_pat_constraints(p) for p in pats]
    if any(c is None for c in cons):
        return False  # unanalyzable without an irrefutable fallback
    paths = sorted({pth for c in cons for pth in c})
    domains = []
    for pth in paths:
        vals: set = set()
        saw_open_lit = False  # a literal over an OPEN domain (int/str)
        for c in cons:
            r = c.get(pth)
            if r is None:
                continue
            vals.add(r)
            if isinstance(r, tuple):
                # Bool is a CLOSED two-value domain: True's complement
                # is False (t13 `case b of True then ..; False then ..`
                # is exhaustive in the reference checker)
                if type(r[1]) is bool:
                    vals.add(("lit", not r[1]))
                else:
                    saw_open_lit = True
            else:
                vals.update(_PAT_COMPLEMENT.get(r, ()))
        if saw_open_lit:
            vals.add(("__other__",))  # any unmentioned literal
        domains.append(sorted(vals, key=repr))
    total = 1
    for d in domains:
        total *= max(1, len(d))
    if total > 4096:
        return False
    import itertools

    for world in itertools.product(*domains):
        w = dict(zip(paths, world))
        if not any(
            all(w.get(p) == r for p, r in c.items()) for c in cons
        ):
            return False
    return True


def _check_cases_exhaustive(ast) -> None:
    if not isinstance(ast, tuple):
        return
    if ast[0] == "case":
        if not _case_exhaustive(ast[2]):
            raise ValueError(
                "inexhaustive case alternatives (the reference checker "
                "rejects cases whose patterns do not cover the "
                "scrutinee)"
            )
        _check_cases_exhaustive(ast[1])
        for _pat, body in ast[2]:
            _check_cases_exhaustive(body)
        return
    if ast[0] == "record":
        for _n, e in ast[1]:
            _check_cases_exhaustive(e)
        return
    for sub in ast[1:]:
        if isinstance(sub, tuple):
            _check_cases_exhaustive(sub)
        elif isinstance(sub, list):
            for x in sub:
                _check_cases_exhaustive(x)


# ------------------------------------------------------------- evaluate

def _map_insert(k, v, m):
    out = dict(m)
    out[k] = v
    return out


def _map_delete(k, m):
    out = dict(m)
    out.pop(k, None)
    return out


_EVAL_FUNCS: dict[str, Any] = {
    "log": math.log, "exp": math.exp, "sqrt": math.sqrt, "abs": abs,
    "floor": math.floor, "ceil": math.ceil, "pow": pow,
    "minimum": min, "maximum": max,
    "double": float, "trunc": int,
    "fst": lambda t: t[0], "snd": lambda t: t[1],
    "map_insert": _map_insert, "map_delete": _map_delete,
    "map_lookup": lambda k, m: (Ctor("Some", m[k]) if k in m else None),
    "get_or_else": lambda d, o: d if o is None else _unsome(o),
    "get": lambda o: _unsome(o),
    "is_some": lambda o: o is not None,
    "is_none": lambda o: o is None,
    "not": lambda b: not b,
    "sin": math.sin, "cos": math.cos, "tan": math.tan,
    "asin": math.asin, "acos": math.acos, "atan": math.atan,
    "atan2": math.atan2, "sinh": math.sinh, "cosh": math.cosh,
    "tanh": math.tanh,
    # `box` lifts Sum Error a -> Possibly a (Prim.hs): the engine's
    # Possibly encoding IS null-or-value, so box is identity (a Left
    # payload is already the null/tombstone channel)
    "box": lambda x: x,
}


def _unsome(o):
    if isinstance(o, Ctor) and o.tag == "Some":
        return o.arg
    return o


def match(pat, value) -> dict | None:
    """Match a pattern against a value; returns bindings or None."""
    kind = pat[0]
    if kind == "pwild":
        return {}
    if kind == "pvar":
        return {pat[1]: value}
    if kind == "plit":
        if isinstance(value, Ctor):
            return None
        try:
            ok = value == pat[1]
        except TypeError:
            return None
        return {} if ok else None
    if kind == "pctor":
        tag, sub = pat[1], pat[2]
        if tag == "None":
            return {} if value is None else None
        if tag == "Some":
            if value is None:
                return None
            inner = value.arg if isinstance(value, Ctor) and value.tag == "Some" else value
            return match(sub, inner) if sub is not None else {}
        if tag in ("Left", "Right", "ExceptTombstone", "Unit"):
            if not isinstance(value, Ctor) or value.tag != tag:
                return None
            return match(sub, value.arg) if sub is not None else {}
        return None
    if kind == "ptuple":
        if isinstance(value, Ctor) or not isinstance(value, tuple):
            return None
        if len(value) != len(pat[1]):
            return None
        env: dict = {}
        for p, v in zip(pat[1], value):
            m = match(p, v)
            if m is None:
                return None
            env.update(m)
        return env
    if kind == "precord":
        if not isinstance(value, dict):
            return None
        env = {}
        for name, p in pat[1]:
            if name not in value:
                return None
            m = match(p, value[name])
            if m is None:
                return None
            env.update(m)
        return env
    raise ValueError(f"unknown pattern {pat!r}")


def evaluate(ast, env: dict):
    """Evaluate an AST against an environment (fold bodies).

    Record literals evaluate to plain dicts; Option ``None`` is python
    None; ``Some x`` / ``Left x`` / ``Right x`` are :class:`Ctor`."""
    kind = ast[0]
    if kind == "lit":
        return ast[1]
    if kind == "var":
        name = ast[1]
        if name == "map_create":
            return {}
        if name in env:
            return env[name]
        raise NameError(f"unbound variable {name!r}")
    if kind == "ctor":
        tag = ast[1]
        if tag == "None":
            return None
        arg = evaluate(ast[2], env) if ast[2] is not None else None
        return Ctor(tag, arg)
    if kind == "tuple":
        return tuple(evaluate(e, env) for e in ast[1])
    if kind == "record":
        return {n: evaluate(e, env) for n, e in ast[1]}
    if kind == "un":
        v = evaluate(ast[2], env)
        if v is None:
            return None
        return (not v) if ast[1] == "!" else -v
    if kind == "bin":
        op = ast[1]
        left = evaluate(ast[2], env)
        if op == "&&":
            return bool(left) and bool(evaluate(ast[3], env))
        if op == "||":
            return bool(left) or bool(evaluate(ast[3], env))
        right = evaluate(ast[3], env)
        if left is None or right is None:
            return None  # Possibly: errors propagate
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            if right == 0:
                return None  # Possibly division error
            return left / right
        if op == "==":
            return left == right
        if op in ("/=", "!="):
            return left != right
        if op == "<":
            return left < right
        if op == "<=":
            return left <= right
        if op == ">":
            return left > right
        if op == ">=":
            return left >= right
        raise ValueError(f"unknown operator {op}")
    if kind == "if":
        c = evaluate(ast[1], env)
        return evaluate(ast[2] if c else ast[3], env)
    if kind == "case":
        scrut = evaluate(ast[1], env)
        for pat, body in ast[2]:
            m = match(pat, scrut)
            if m is not None:
                return evaluate(body, {**env, **m})
        return None  # non-exhaustive match -> error value
    if kind == "app":
        fname = ast[1]
        fn = env.get(fname, _EVAL_FUNCS.get(fname))
        if fn is None:
            raise NameError(f"unknown function {fname!r}")
        args = [evaluate(a, env) for a in ast[2]]
        if fname not in ("is_some", "is_none", "get", "get_or_else",
                         "map_insert", "map_delete", "map_lookup",
                         "fst", "snd") and any(
            a is None for a in args
        ):
            return None  # strict numeric builtins propagate errors
        try:
            return fn(*args)
        except (ValueError, OverflowError, ZeroDivisionError):
            return None  # domain errors are Possibly errors
    raise ValueError(f"unknown AST node {ast!r}")


def unwrap_output(v):
    """Fold OUTPUT projection: constructor wrappers unwrap to their
    payload (the repl prints the payload of `Right 5.0` as 5.0 in the
    t13 goldens), recursively; maps come back insertion-agnostic with
    Data.Map (sorted-key) iteration order."""
    while isinstance(v, Ctor):
        if v.tag == "ExceptTombstone":
            return None
        v = v.arg
    if isinstance(v, dict):
        from icicle_spark.plans.maporder import _ord_key

        # keys unwrap too (`map_insert (Some location) …` folds key by
        # Option values — t60-map-delete), then stringify for the
        # engine's map<string,…> convention, in Data.Map order of the
        # UNWRAPPED key (Nothing < Just, maporder._ord_key)
        items = [(unwrap_output(k), unwrap_output(x)) for k, x in v.items()]
        items.sort(key=lambda kv: _ord_key(kv[0]))
        return {str(k): x for k, x in items}
    if isinstance(v, tuple):
        return tuple(unwrap_output(x) for x in v)
    return v


_INT_APPS = {
    "trunc", "abs", "length", "fst", "snd", "get", "get_or_else",
    "box", "minimum", "maximum", "mod", "int_div",
    "year_of", "month_of", "day_of", "days", "days_between", "index",
}
_DBL_APPS = {
    "double", "log", "exp", "sqrt", "sin", "cos", "tan", "asin",
    "acos", "atan", "atan2", "sinh", "cosh", "tanh", "pi",
}


def infer_numeric(ast, coltypes: dict) -> str | None:
    """Static numeric typing of an expression: ``"int"`` when every
    evaluation provably yields an integral number given the leaf
    column types, ``"double"`` for provably-fractional, None for
    non-numeric / unknown shapes. The reference checker's Num typing
    for the arithmetic fragment — lets int folds and int element
    expressions print `1500`, not `1500.0`, even when the body only
    parses in the exprlang (non-SQL) dialect.

    ``coltypes`` maps leaf names to Spark simpleString types (column
    types, bind types, or "int"/"double" for pre-typed binds)."""
    _INT = ("tinyint", "smallint", "int", "bigint", "long")

    def join(ts):
        ts = [t for t in ts if t != "bottom"]
        if not ts:
            return "bottom"
        if any(t is None for t in ts):
            return None
        if all(t == "int" for t in ts):
            return "int"
        if all(t in ("int", "double") for t in ts):
            return "double"
        return None

    def binds(pat, st):
        # pattern binds inherit the scrutinee's numeric type (payload
        # of an error/option wrapper ≈ the wrapped numeric)
        kind = pat[0]
        if kind == "pvar":
            return {pat[1]: st if st is not None else None}
        if kind == "pctor" and pat[2] is not None:
            return binds(pat[2], st)
        return {}

    def go(a, env):
        kind = a[0]
        if kind == "lit":
            v = a[1]
            if isinstance(v, bool):
                return None
            if isinstance(v, int):
                return "int"
            if isinstance(v, float):
                return "double"
            return None
        if kind == "var":
            t = env.get(a[1], coltypes.get(a[1]))
            if t in ("int", "double", "bottom", None):
                return t
            if t.startswith(_INT):
                return "int"
            if t.startswith(("double", "float", "decimal")):
                return "double"
            return None
        if kind == "un":
            if a[1] == "-":
                return go(a[2], env)
            return None
        if kind == "bin":
            op = a[1]
            if op == "/":
                lt, rt = go(a[2], env), go(a[3], env)
                return "double" if None not in (lt, rt) else None
            if op in ("+", "-", "*"):
                return join([go(a[2], env), go(a[3], env)])
            return None  # comparisons/booleans aren't numeric
        if kind == "if":
            return join([go(a[2], env), go(a[3], env)])
        if kind == "case":
            st = go(a[1], env)
            return join([
                go(body, {**env, **binds(pat, st)})
                for pat, body in a[2]
            ])
        if kind == "ctor":
            tag, arg = a[1], a[2]
            if tag in ("Some", "Right", "Left", "ExceptTombstone"):
                # error/option wrappers: payload type (None payload =
                # a null leaf — bottom, joins as identity)
                return go(arg, env) if arg is not None else "bottom"
            if tag == "None":
                return "bottom"
            return None
        if kind == "app":
            fn = a[1]
            if fn in _INT_APPS:
                if fn in ("minimum", "maximum", "get_or_else",
                          "fst", "snd", "get", "box", "index"):
                    return join([go(x, env) for x in a[2]])
                return "int"
            if fn in _DBL_APPS:
                return "double"
            if fn == "seq":
                return go(a[2][-1], env) if a[2] else None
            return None
        return None  # tuple/record/map states are non-numeric

    t = go(ast, {})
    return None if t == "bottom" else t


def free_vars(ast) -> set[str]:
    """Free variables of an expression (pattern binds removed)."""
    kind = ast[0]
    if kind == "lit":
        return set()
    if kind == "var":
        return {ast[1]} - {"map_create"}
    if kind == "ctor":
        return free_vars(ast[2]) if ast[2] is not None else set()
    if kind == "tuple":
        return set().union(*(free_vars(e) for e in ast[1])) if ast[1] else set()
    if kind == "record":
        return set().union(*(free_vars(e) for _, e in ast[1])) if ast[1] else set()
    if kind == "un":
        return free_vars(ast[2])
    if kind == "bin":
        return free_vars(ast[2]) | free_vars(ast[3])
    if kind == "if":
        return free_vars(ast[1]) | free_vars(ast[2]) | free_vars(ast[3])
    if kind == "case":
        out = free_vars(ast[1])
        for pat, body in ast[2]:
            out |= free_vars(body) - pattern_vars(pat)
        return out
    if kind == "app":
        out = set()
        for a in ast[2]:
            out |= free_vars(a)
        if ast[1] not in _EVAL_FUNCS:
            out.add(ast[1])
        return out
    raise ValueError(f"unknown AST node {ast!r}")


def pattern_vars(pat) -> set[str]:
    kind = pat[0]
    if kind == "pvar":
        return {pat[1]}
    if kind == "pctor" and pat[2] is not None:
        return pattern_vars(pat[2])
    if kind == "ptuple":
        return set().union(*(pattern_vars(p) for p in pat[1]))
    if kind == "precord":
        return set().union(*(pattern_vars(p) for _, p in pat[1]))
    return set()


def is_constant(ast) -> bool:
    return not free_vars(ast)


# ------------------------------------------------------------- SQL / pandas

_SQL_FUNCS = {
    "log": "ln({})", "exp": "exp({})", "sqrt": "sqrt({})",
    "abs": "abs({})", "double": "cast(({}) as double)",
    "trunc": "cast(({}) as bigint)", "floor": "floor({})",
    "ceil": "ceiling({})",
    "sin": "sin({})", "cos": "cos({})", "tan": "tan({})",
    "asin": "asin({})", "acos": "acos({})", "atan": "atan({})",
    "sinh": "sinh({})", "cosh": "cosh({})", "tanh": "tanh({})",
    "atan2": "atan2({}, {})",
    "is_some": "(({}) IS NOT NULL)", "is_none": "(({}) IS NULL)",
    "get": "({})", "get_or_else": "coalesce(({1}), ({0}))",
    "not": "(NOT ({}))", "box": "({})",
    "fst": "({}).f1", "snd": "({}).f2",
    "length": "size({})", "sort": "array_sort({})",
    "index": "get(({}), ({}))",
    "keys": "map_keys({})",
    "year_of": "year({})", "month_of": "month({})",
    "day_of": "day({})",
    "days_between": "datediff(CAST(({1}) AS DATE), CAST(({0}) AS DATE))",
    "days": "datediff(CAST(({}) AS DATE), DATE '1600-03-01')",
    "seq": "({1})",
    "box": "({})",  # box (Right x) = x; box (Left e) = tombstone/null
    # map ops over finished agg maps (engine convention: string keys,
    # key_str casing — a midnight time key prints as its date)
    "map_delete":
        "map_filter(({1}), (__mk, __mv) -> "
        "NOT (__mk <=> cast(({0}) as string)))",
}


def sql_lit(v) -> str:
    import datetime as _dt

    if v is None:
        return "NULL"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return repr(v)


def to_sql(ast, env: dict[str, str] | None = None) -> str:
    """Lower an AST to a Spark-SQL expression string. ``env`` maps
    pattern-bound names to SQL fragments; unbound vars pass through as
    column references."""
    env = env or {}
    kind = ast[0]
    if kind == "lit":
        return sql_lit(ast[1])
    if kind == "var":
        return env.get(ast[1], ast[1])
    if kind == "ctor":
        tag = ast[1]
        if tag == "None":
            return "NULL"
        if tag == "Some":
            return to_sql(ast[2], env)
        if tag == "Right":
            return to_sql(ast[2], env)
        if tag in ("Left", "ExceptTombstone"):
            # Left e boxes to a tombstone (t31 `box (Left ...)`)
            return "NULL"
        raise ValueError(f"constructor {tag!r} has no SQL form")
    if kind == "tuple":
        parts = ", ".join(
            f"'f{i+1}', {to_sql(e, env)}" for i, e in enumerate(ast[1])
        )
        return f"named_struct({parts})"
    if kind == "record":
        parts = ", ".join(
            f"'{n}', {to_sql(e, env)}" for n, e in ast[1]
        )
        return f"named_struct({parts})"
    if kind == "un":
        inner = to_sql(ast[2], env)
        return f"(NOT ({inner}))" if ast[1] == "!" else f"(- ({inner}))"
    if kind == "bin":
        op = {"==": "=", "/=": "<>", "!=": "<>", "&&": "AND", "||": "OR"}.get(
            ast[1], ast[1]
        )
        l, r = to_sql(ast[2], env), to_sql(ast[3], env)
        if ast[1] == "/":
            return f"(({l}) / nullif(({r}), 0))"
        return f"(({l}) {op} ({r}))"
    if kind == "if":
        return (
            f"(CASE WHEN {to_sql(ast[1], env)} THEN {to_sql(ast[2], env)} "
            f"ELSE {to_sql(ast[3], env)} END)"
        )
    if kind == "case":
        scrut = to_sql(ast[1], env)
        whens = []
        for pat, body in ast[2]:
            cond, binds = _pat_sql(pat, scrut)
            body_sql = to_sql(body, {**env, **binds})
            if cond == "TRUE":
                whens.append(f"ELSE {body_sql}")
                break
            whens.append(f"WHEN {cond} THEN {body_sql}")
        text = " ".join(whens)
        if text.startswith("ELSE "):  # first alternative always matches
            return f"({text[5:]})"
        return f"(CASE {text} END)"
    if kind == "app":
        tmpl = _SQL_FUNCS.get(ast[1])
        if tmpl is None:
            raise ValueError(f"function {ast[1]!r} has no SQL form")
        args = [to_sql(a, env) for a in ast[2]]
        if "{0}" in tmpl or "{1}" in tmpl:
            return tmpl.format(*args)
        return tmpl.format(*args)
    raise ValueError(f"unknown AST node {ast!r}")


def _pat_sql(pat, scrut: str) -> tuple[str, dict[str, str]]:
    """SQL condition + bindings for matching ``pat`` against the
    scrutinee fragment."""
    kind = pat[0]
    if kind == "pwild":
        return "TRUE", {}
    if kind == "pvar":
        return "TRUE", {pat[1]: scrut}
    if kind == "plit":
        return f"(({scrut}) = {sql_lit(pat[1])})", {}
    if kind == "pctor":
        tag, sub = pat[1], pat[2]
        if tag == "None":
            return f"(({scrut}) IS NULL)", {}
        if tag == "Some":
            base = f"(({scrut}) IS NOT NULL)"
            if sub is None:
                return base, {}
            c, b = _pat_sql(sub, scrut)
            return (base if c == "TRUE" else f"({base} AND {c})"), b
        raise ValueError(f"pattern constructor {tag!r} has no SQL form")
    if kind == "ptuple":
        conds, binds = [], {}
        for i, sub in enumerate(pat[1]):
            c, b = _pat_sql(sub, f"({scrut}).f{i+1}")
            if c != "TRUE":
                conds.append(c)
            binds.update(b)
        return (" AND ".join(conds) if conds else "TRUE"), binds
    if kind == "precord":
        conds, binds = [], {}
        for name, sub in pat[1]:
            c, b = _pat_sql(sub, f"({scrut}).{name}")
            if c != "TRUE":
                conds.append(c)
            binds.update(b)
        return (" AND ".join(conds) if conds else "TRUE"), binds
    raise ValueError(f"unknown pattern {pat!r}")


def _days_since_ivory(s):
    """Vectorized `days`: whole days since the Ivory epoch 1600-03-01
    (Time.hs:149-165 daysCountIvory). datetime64[D] arithmetic — the
    epoch predates pandas' ns-Timestamp range."""
    import numpy as np
    import pandas as pd

    d = pd.Series(s).to_numpy().astype("datetime64[D]")
    out = (d - np.datetime64("1600-03-01")).astype("float64")
    out[np.isnat(d)] = np.nan
    return pd.Series(out, index=pd.Series(s).index)


def to_callable(ast, env: dict | None = None):
    """Lower an AST to a vectorized pandas callable (pdf -> Series)
    for the Arrow executors. Supports the element-level subset:
    vars = fact columns, literals, arithmetic/comparison, case with
    literal / Some / None / wildcard / var patterns, tuples (Series of
    python tuples), and the numeric builtins."""
    import numpy as np
    import pandas as pd

    env = env or {}

    def ev(node, pdf, binds):
        kind = node[0]
        if kind == "lit":
            return pd.Series(node[1], index=pdf.index)
        if kind == "var":
            name = node[1]
            if name in binds:
                return binds[name]
            if name in env:
                return pd.Series(env[name], index=pdf.index)
            return pdf[name]
        if kind == "ctor":
            if node[1] == "None":
                return pd.Series([None] * len(pdf), index=pdf.index)
            if node[1] in ("Some", "Right"):
                return ev(node[2], pdf, binds)
            return pd.Series([None] * len(pdf), index=pdf.index)
        if kind == "tuple":
            cols = [ev(e, pdf, binds) for e in node[1]]
            return pd.Series(list(zip(*cols)), index=pdf.index)
        if kind == "un":
            v = ev(node[2], pdf, binds)
            return ~v.astype(bool) if node[1] == "!" else -v
        if kind == "bin":
            op = node[1]
            left = ev(node[2], pdf, binds)
            right = ev(node[3], pdf, binds)
            if op == "&&":
                return left.astype(bool) & right.astype(bool)
            if op == "||":
                return left.astype(bool) | right.astype(bool)
            if op == "/":
                r = right.replace(0, np.nan)
                return left / r
            fn = {"+": "add", "-": "sub", "*": "mul", "==": "eq",
                  "/=": "ne", "!=": "ne", "<": "lt", "<=": "le", ">": "gt",
                  ">=": "ge"}[op]
            return getattr(left, fn)(right)
        if kind == "if":
            c = ev(node[1], pdf, binds).astype(bool)
            a = ev(node[2], pdf, binds)
            b = ev(node[3], pdf, binds)
            return a.where(c, b)
        if kind == "case":
            scrut = ev(node[1], pdf, binds)
            result = pd.Series([None] * len(pdf), index=pdf.index,
                               dtype=object)
            done = pd.Series(False, index=pdf.index)
            for pat, body in node[2]:
                cond, extra = _pat_mask(pat, scrut)
                b2 = dict(binds)
                b2.update(extra)
                vals = ev(body, pdf, b2)
                take = cond & ~done
                result = result.mask(take, vals)
                done = done | cond
            return result
        if kind == "app":
            import math as _m  # noqa: F401

            fns = {
                "log": np.log, "exp": np.exp, "sqrt": np.sqrt,
                "abs": np.abs, "double": lambda s: s.astype("float64"),
                "trunc": lambda s: s.astype("int64"),
                "floor": np.floor, "ceil": np.ceil,
                "sin": np.sin, "cos": np.cos, "tan": np.tan,
                "is_some": lambda s: s.notna(),
                "is_none": lambda s: s.isna(),
                "get": lambda s: s,
                "not": lambda s: ~s.astype(bool),
                # days since the Ivory epoch 1600-03-01
                # (Time.hs:149-165 daysCountIvory) — day-resolution
                # numpy arithmetic (the epoch is outside pandas' ns
                # Timestamp range)
                "days": _days_since_ivory,
            }
            fn = fns.get(node[1])
            if fn is None:
                raise ValueError(
                    f"function {node[1]!r} has no vectorized form"
                )
            args = [ev(a, pdf, binds) for a in node[2]]
            return pd.Series(fn(*args), index=pdf.index)
        raise ValueError(f"unsupported node for callable: {node!r}")

    def _pat_mask(pat, scrut):
        import pandas as pd

        kind = pat[0]
        if kind == "pwild":
            return pd.Series(True, index=scrut.index), {}
        if kind == "pvar":
            return pd.Series(True, index=scrut.index), {pat[1]: scrut}
        if kind == "plit":
            return scrut == pat[1], {}
        if kind == "pctor":
            tag, sub = pat[1], pat[2]
            if tag == "None":
                return scrut.isna(), {}
            if tag == "Some":
                base = scrut.notna()
                if sub is None:
                    return base, {}
                c, b = _pat_mask(sub, scrut)
                return base & c, b
        raise ValueError(f"unsupported pattern for callable: {pat!r}")

    def fn(pdf):
        return ev(ast, pdf, {})

    fn.__icicle_ast__ = ast  # lets resolve_dtypes type the callable
    return fn


def infer_sql_type(ast) -> str | None:
    """Best-effort result type of an expression (used for COLLECT
    dtypes). Returns a Spark type name or None when unknown."""
    kind = ast[0]
    if kind == "lit":
        v = ast[1]
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, str):
            return "string"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        return None
    if kind in ("case", "if"):
        branches = [b for _, b in ast[2]] if kind == "case" else [ast[2], ast[3]]
        types = {infer_sql_type(b) for b in branches}
        types.discard(None)
        if len(types) == 1:
            return types.pop()
        if types <= {"bigint", "double"} and types:
            return "double"
        return None
    if kind == "ctor" and ast[1] in ("Some", "Right") and ast[2] is not None:
        return infer_sql_type(ast[2])
    if kind == "app":
        if ast[1] in ("is_some", "is_none"):
            return "boolean"
        if ast[1] in ("get", "get_or_else") and ast[2]:
            return infer_sql_type(ast[2][-1])
    if kind == "tuple":
        parts = []
        for i, e in enumerate(ast[1]):
            t = infer_sql_type(e) or "double"
            parts.append(f"f{i+1}:{t}")
        return "struct<" + ",".join(parts) + ">"
    return None


def infer_dtype_of_value(v) -> str:
    """Spark dtype for a fold's OUTPUT inferred from a python value
    (init / sample state). Numerics widen to double — the engine has
    no typechecker, and Icicle arithmetic mixes int/double freely."""
    v = unwrap_output(v)
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, str):
        return "string"
    if isinstance(v, dict):
        return "map<string,bigint>"
    if isinstance(v, tuple):
        parts = ", ".join(
            f"f{i+1}: {infer_dtype_of_value(x)}" for i, x in enumerate(v)
        )
        return f"struct<{parts}>"
    return "double"
