"""A small SQL scalar-expression interpreter for the in-process event backend.

The reference's third compiler turns the SAME serialized program into a plain
in-process event handler — no cluster, no job, one record at a time
(``milan-scala-compiler/.../event/EventHandlerClassGenerator.scala:36-80``,
``ScalaStreamCompiler.scala:18-43``). Its scalar expressions are Scala trees
compiled to Scala source; this engine's portable IR carries scalar
expressions as Spark-SQL strings, so the event backend needs exactly one
thing Spark normally supplies: evaluating such a string against one record.

This module is that evaluator: a tokenizer + Pratt parser compiling the
documented SQL subset to Python closures ``env -> value`` (parse once at
plan-compile time, evaluate per record), with SQL semantics — three-valued
logic for AND/OR/NOT, NULL-propagating comparisons and arithmetic, HALF_UP
rounding, Java-sign ``%`` — matching what Catalyst computes for the same
string, so the three backends agree on the same JSON plan.

Supported grammar (anything else raises :class:`MilanExprError` naming the
construct at PARSE time, not mid-stream):

- literals: integers, decimals, ``'strings'`` (``''`` escaping), TRUE/FALSE/NULL
- column references (bare identifiers)
- operators: ``+ - * / % DIV``, ``= == != <> < <= > >=``, ``AND OR NOT``,
  unary ``-``/``+``, ``IS [NOT] NULL``, ``[NOT] IN (…)``,
  ``[NOT] BETWEEN a AND b``, ``CAST(e AS type)``,
  ``CASE [e] WHEN … THEN … [ELSE …] END``
- functions: abs, floor, ceil/ceiling, round, sqrt, exp, ln, log, log2,
  log10, pow/power, greatest, least, coalesce, nvl, ifnull, if, isnull,
  isnotnull, upper/ucase, lower/lcase, length/char_length, trim, ltrim,
  rtrim, substring/substr (1-based, SQL negative-start rules), concat,
  concat_ws, replace, instr, lpad, rpad, sign/signum, mod
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal
from typing import Callable

from milan_spark.errors import MilanAnalysisError


class MilanExprError(MilanAnalysisError):
    """An expression uses syntax outside the event backend's documented SQL
    subset; raised at parse (plan-compile) time with the offending text."""


# --- tokenizer ---------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op><=|>=|<>|!=|==|=|<|>|\+|-|\*|/|%|\(|\)|,)
    )""",
    re.VERBOSE,
)

_KEYWORDS = frozenset(
    "and or not is null true false cast as case when then else end in between div".split()
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            if text[pos:].strip() == "":
                break
            raise MilanExprError(f"cannot tokenize {text[pos:pos+20]!r} in {text!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "ident":
            word = m.group("ident")
            out.append(("kw", word.lower()) if word.lower() in _KEYWORDS else ("ident", word))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", ""))
    return out


# --- SQL value semantics ------------------------------------------------------


def _sql_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _sql_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _sql_not(a):
    return None if a is None else (not a)


_CMP = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _java_mod(a, b):
    # Spark % carries the DIVIDEND's sign (Java semantics), unlike Python's
    if isinstance(a, int) and isinstance(b, int):
        r = abs(a) % abs(b)
        return -r if a < 0 else r
    return math.fmod(a, b)


def _round_half_up(x, n=0):
    # Spark ROUND is HALF_UP (away from zero), not Python's banker's
    # rounding; the result keeps the input's type family
    if x is None:
        return None
    q = Decimal(1).scaleb(-int(n))
    d = Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)
    return int(d) if isinstance(x, int) else float(d)


def _substring(s, pos, length=None):
    # SQL 1-based; pos 0 behaves like 1; negative pos counts from the end
    if s is None or pos is None:
        return None
    n = len(s)
    if pos > 0:
        start = pos - 1
    elif pos == 0:
        start = 0
    else:
        start = max(n + pos, 0)
    end = n if length is None else max(start + max(length, 0), start)
    return s[start:end]


def _nullprop(fn):
    def wrapped(*args):
        if any(a is None for a in args):
            return None
        return fn(*args)

    return wrapped


def _greatest(*args):
    vals = [a for a in args if a is not None]
    return max(vals) if vals else None


def _least(*args):
    vals = [a for a in args if a is not None]
    return min(vals) if vals else None


def _coalesce(*args):
    for a in args:
        if a is not None:
            return a
    return None


_FUNCS: dict[str, Callable] = {
    "abs": _nullprop(abs),
    "floor": _nullprop(lambda x: int(math.floor(x))),
    "ceil": _nullprop(lambda x: int(math.ceil(x))),
    "ceiling": _nullprop(lambda x: int(math.ceil(x))),
    "round": _round_half_up,
    "sqrt": _nullprop(math.sqrt),
    "exp": _nullprop(math.exp),
    "ln": _nullprop(math.log),
    "log": _nullprop(math.log),
    "log2": _nullprop(math.log2),
    "log10": _nullprop(math.log10),
    "pow": _nullprop(lambda a, b: float(a) ** float(b)),
    "power": _nullprop(lambda a, b: float(a) ** float(b)),
    "greatest": _greatest,
    "least": _least,
    "coalesce": _coalesce,
    "nvl": lambda a, b: b if a is None else a,
    "ifnull": lambda a, b: b if a is None else a,
    "if": lambda c, a, b: a if c is True else b,
    "isnull": lambda a: a is None,
    "isnotnull": lambda a: a is not None,
    "upper": _nullprop(str.upper),
    "ucase": _nullprop(str.upper),
    "lower": _nullprop(str.lower),
    "lcase": _nullprop(str.lower),
    "length": _nullprop(len),
    "char_length": _nullprop(len),
    "trim": _nullprop(str.strip),
    "ltrim": _nullprop(str.lstrip),
    "rtrim": _nullprop(str.rstrip),
    "substring": _substring,
    "substr": _substring,
    "concat": _nullprop(lambda *a: "".join(str(x) for x in a)),
    "concat_ws": lambda sep, *a: (
        None if sep is None else sep.join(str(x) for x in a if x is not None)
    ),
    "replace": _nullprop(lambda s, find, repl="": s.replace(find, repl)),
    "instr": _nullprop(lambda s, sub: s.find(sub) + 1),
    "lpad": _nullprop(lambda s, n, pad=" ": s[:n] if len(s) >= n else (pad * n)[: n - len(s)] + s),
    "rpad": _nullprop(lambda s, n, pad=" ": s[:n] if len(s) >= n else s + (pad * n)[: n - len(s)]),
    "sign": _nullprop(lambda x: float((x > 0) - (x < 0)) if isinstance(x, float) else (x > 0) - (x < 0)),
    "signum": _nullprop(lambda x: float((x > 0) - (x < 0))),
    "mod": _nullprop(_java_mod),
    # epoch extractors under the engine's fixed UTC session tz (naive
    # datetimes ARE UTC here; see _to_timestamp)
    "unix_micros": _nullprop(lambda v: _epoch_us(v)),
    "unix_millis": _nullprop(lambda v: _epoch_us(v) // 1_000),
    "unix_seconds": _nullprop(lambda v: _epoch_us(v) // 1_000_000),
}


def _epoch_us(v) -> int:
    import datetime as _dt

    d = _to_timestamp(v)
    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    delta = d - _dt.datetime(1970, 1, 1)
    return delta.days * 86_400_000_000 + delta.seconds * 1_000_000 + delta.microseconds

_CAST_TYPES = {
    "tinyint": lambda v: int(v),
    "smallint": lambda v: int(v),
    "int": lambda v: int(v),
    "integer": lambda v: int(v),
    "bigint": lambda v: int(v),
    "long": lambda v: int(v),
    "double": lambda v: float(v),
    "float": lambda v: float(v),
    "string": lambda v: (str(v).lower() if isinstance(v, bool) else str(v)),
    "boolean": lambda v: bool(v),
    "timestamp": lambda v: _to_timestamp(v),
}


def _to_timestamp(v):
    # NTZ→TIMESTAMP under the engine's fixed UTC session tz is an identity;
    # strings parse like Spark's ISO forms ('2024-01-02 03:04:05[.ffffff]')
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return _dt.datetime.fromisoformat(str(v).strip().replace("T", " "))


def _cast(v, typename: str):
    if v is None:
        return None
    try:
        fn = _CAST_TYPES[typename]
    except KeyError:
        raise MilanExprError(
            f"CAST target {typename!r} outside the event-backend subset "
            f"(supported: {sorted(_CAST_TYPES)})"
        ) from None
    if typename in ("tinyint", "smallint", "int", "integer", "bigint", "long") and isinstance(v, str):
        return int(float(v)) if "." in v or "e" in v.lower() else int(v)
    return fn(v)


# --- parser -------------------------------------------------------------------


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise MilanExprError(
                f"expected {val or kind} but found {t[1]!r} in {self.text!r}"
            )
        return t

    def at_kw(self, word):
        t = self.peek()
        return t[0] == "kw" and t[1] == word

    def eat_kw(self, word) -> bool:
        if self.at_kw(word):
            self.next()
            return True
        return False

    # precedence climbing
    def parse(self) -> Callable:
        e = self.or_expr()
        if self.peek()[0] != "end":
            raise MilanExprError(
                f"unexpected trailing {self.peek()[1]!r} in {self.text!r}"
            )
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.eat_kw("or"):
            r = self.and_expr()
            e = (lambda a, b: lambda env: _sql_or(a(env), b(env)))(e, r)
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.eat_kw("and"):
            r = self.not_expr()
            e = (lambda a, b: lambda env: _sql_and(a(env), b(env)))(e, r)
        return e

    def not_expr(self):
        if self.eat_kw("not"):
            e = self.not_expr()
            return lambda env: _sql_not(e(env))
        return self.cmp_expr()

    def cmp_expr(self):
        e = self.add_expr()
        t = self.peek()
        if t[0] == "op" and t[1] in _CMP:
            op = self.next()[1]
            r = self.add_expr()
            cmp_fn = _CMP[op]

            def cmp_(env, a=e, b=r, fn=cmp_fn):
                va, vb = a(env), b(env)
                if va is None or vb is None:
                    return None
                return fn(va, vb)

            return cmp_
        if self.at_kw("is"):
            self.next()
            negate = self.eat_kw("not")
            self.expect("kw", "null")
            return (lambda a, n: lambda env: (a(env) is not None) if n else (a(env) is None))(e, negate)
        negate = self.eat_kw("not")
        if self.at_kw("in"):
            self.next()
            self.expect("op", "(")
            items = [self.or_expr()]
            while self.peek() == ("op", ","):
                self.next()
                items.append(self.or_expr())
            self.expect("op", ")")

            def in_(env, a=e, items=items, n=negate):
                v = a(env)
                if v is None:
                    return None
                vals = [it(env) for it in items]
                hit = any(v == x for x in vals if x is not None)
                if not hit and any(x is None for x in vals):
                    return None
                return (not hit) if n else hit

            return in_
        if self.at_kw("between"):
            self.next()
            lo = self.add_expr()
            self.expect("kw", "and")
            hi = self.add_expr()

            def between(env, a=e, lo=lo, hi=hi, n=negate):
                v, vl, vh = a(env), lo(env), hi(env)
                if v is None or vl is None or vh is None:
                    return None
                r = vl <= v <= vh
                return (not r) if n else r

            return between
        if negate:
            raise MilanExprError(f"dangling NOT in {self.text!r}")
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            r = self.mul_expr()
            if op == "+":
                e = (lambda a, b: lambda env: _nullprop(lambda x, y: x + y)(a(env), b(env)))(e, r)
            else:
                e = (lambda a, b: lambda env: _nullprop(lambda x, y: x - y)(a(env), b(env)))(e, r)
        return e

    def mul_expr(self):
        e = self.unary()
        while (self.peek()[0] == "op" and self.peek()[1] in ("*", "/", "%")) or self.at_kw("div"):
            if self.at_kw("div"):
                self.next()
                op = "div"
            else:
                op = self.next()[1]
            r = self.unary()
            if op == "*":
                e = (lambda a, b: lambda env: _nullprop(lambda x, y: x * y)(a(env), b(env)))(e, r)
            elif op == "/":
                # Spark / is double division regardless of operand types
                e = (lambda a, b: lambda env: _nullprop(lambda x, y: float(x) / float(y))(a(env), b(env)))(e, r)
            elif op == "div":
                e = (lambda a, b: lambda env: _nullprop(lambda x, y: int(float(x) / float(y)) if (x < 0) != (y < 0) else x // y)(a(env), b(env)))(e, r)
            else:
                e = (lambda a, b: lambda env: _nullprop(_java_mod)(a(env), b(env)))(e, r)
        return e

    def unary(self):
        t = self.peek()
        if t == ("op", "-"):
            self.next()
            e = self.unary()
            return lambda env: _nullprop(lambda x: -x)(e(env))
        if t == ("op", "+"):
            self.next()
            return self.unary()
        return self.primary()

    def primary(self):
        t = self.next()
        if t[0] == "num":
            text = t[1]
            val = float(text) if ("." in text or "e" in text.lower()) else int(text)
            return lambda env, v=val: v
        if t[0] == "str":
            return lambda env, v=t[1]: v
        if t[0] == "kw":
            if t[1] == "true":
                return lambda env: True
            if t[1] == "false":
                return lambda env: False
            if t[1] == "null":
                return lambda env: None
            if t[1] == "cast":
                self.expect("op", "(")
                e = self.or_expr()
                self.expect("kw", "as")
                tname = self.next()
                # the type name tokenizes as ident or a keyword we reuse
                typename = tname[1].lower()
                self.expect("op", ")")
                if typename not in _CAST_TYPES:
                    raise MilanExprError(
                        f"CAST target {typename!r} outside the event-backend "
                        f"subset (supported: {sorted(_CAST_TYPES)})"
                    )
                return lambda env, a=e, ty=typename: _cast(a(env), ty)
            if t[1] == "case":
                return self.case_expr()
            raise MilanExprError(f"unexpected keyword {t[1]!r} in {self.text!r}")
        if t[0] == "ident":
            name = t[1]
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.or_expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.or_expr())
                self.expect("op", ")")
                fn = _FUNCS.get(name.lower())
                if fn is None:
                    raise MilanExprError(
                        f"function {name!r} outside the event-backend subset "
                        "(see milan_spark.expr docstring for the supported list)"
                    )
                return lambda env, f=fn, a=args: f(*[x(env) for x in a])

            def col(env, n=name):
                try:
                    return env[n]
                except KeyError:
                    raise MilanExprError(
                        f"column {n!r} not found; record has {sorted(env)}"
                    ) from None

            return col
        if t == ("op", "("):
            e = self.or_expr()
            self.expect("op", ")")
            return e
        raise MilanExprError(f"unexpected {t[1]!r} in {self.text!r}")

    def case_expr(self):
        # CASE [operand] WHEN v THEN r ... [ELSE d] END
        operand = None
        if not self.at_kw("when"):
            operand = self.or_expr()
        branches = []
        while self.eat_kw("when"):
            cond = self.or_expr()
            self.expect("kw", "then")
            res = self.or_expr()
            branches.append((cond, res))
        default = self.or_expr() if self.eat_kw("else") else (lambda env: None)
        self.expect("kw", "end")

        if operand is None:
            def case_(env, bs=branches, d=default):
                for c, r in bs:
                    if c(env) is True:
                        return r(env)
                return d(env)
        else:
            def case_(env, op=operand, bs=branches, d=default):
                v = op(env)
                for c, r in bs:
                    cv = c(env)
                    if v is not None and cv is not None and v == cv:
                        return r(env)
                return d(env)

        return case_


def compile_expr(text: str) -> Callable[[dict], object]:
    """Compile one SQL scalar expression to ``env_dict -> value``."""
    return _Parser(text).parse()


def compile_projection(text: str) -> tuple[str | None, Callable[[dict], object]]:
    """Compile a SELECT-list item: ``expr [AS alias]``. Returns
    (alias-or-None, evaluator); a bare column reference aliases to itself."""
    p = _Parser(text)
    e = p.or_expr()
    alias = None
    if p.eat_kw("as"):
        alias = p.expect("ident")[1]
    if p.peek()[0] != "end":
        raise MilanExprError(f"unexpected trailing {p.peek()[1]!r} in {text!r}")
    if alias is None and re.fullmatch(r"\s*[A-Za-z_][A-Za-z0-9_]*\s*", text):
        alias = text.strip()
    return alias, e
