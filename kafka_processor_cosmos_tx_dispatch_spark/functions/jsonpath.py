"""JsonPath predicate engine — the reference's query language, Spark-first.

The reference's entire query surface is JsonPath 2.x predicates evaluated
against a JSON rendering of each record, with Jayway options
``AS_PATH_LIST`` + ``SUPPRESS_EXCEPTIONS``: a rule *matches* iff the path
resolves to a non-empty node list, and ANY evaluation error (including a
missed definite path like ``$.nop``) is swallowed and treated as a
non-match (/root/reference/src/main/kotlin/com/okp4/processor/cosmos/
TopologyProducer.kt:56-59, 216-223).

This module provides three tiers, fastest first:

1. ``compile_struct_predicate(col, dtype, path)`` — compiles the JsonPath
   subset (child / index / wildcard / recursive descent / array filters
   with ``== != < <= > >= && ||`` and existence) into a **native boolean
   Column** over a typed struct column. Pure Catalyst expressions
   (``exists`` / higher-order functions) — whole-stage codegen, no Python
   in the hot path. Recursive descent is schema-directed: ``$..name`` is
   statically expanded over the struct schema into an OR of concrete
   accessors, so it costs exactly the fields it touches.
2. ``compile_json_string_predicate(col, path)`` — for untyped JSON string
   columns: definite paths (child + index only) compile to
   ``get_json_object(col, path) IS NOT NULL`` (JVM-side Jackson walk).
3. ``match(json_text, path)`` inside ``jsonpath_match_pandas_udf`` — the
   full evaluator in Python, Arrow-batched, for constructs outside the
   compilable subset. Semantics identical: errors ⇒ non-match.

Grammar (the subset the reference exercises, rules_example.yaml:2-11):

    path     := '$' step*
    step     := '.' NAME | '..' NAME | '[' INT ']' | '[*]' | '.*'
              | "['" NAME "']" | '[?(' filter ')]'
    filter   := or ; or := and ('||' and)* ; and := atom ('&&' atom)*
    atom     := '(' or ')' | '!' atom | rel CMP literal | rel
    rel      := '@' ('.' NAME | '[' INT ']' | '[*]')*
    literal  := 'sq-string' | "dq-string" | number | true | false | null

NAME may contain '@' (protobuf-JSON uses ``@type`` as a field key).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class JsonPathError(ValueError):
    pass


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Child:
    name: str


@dataclass(frozen=True)
class RecursiveChild:
    name: str


@dataclass(frozen=True)
class Index:
    i: int


@dataclass(frozen=True)
class Slice:
    start: int | None
    stop: int | None


@dataclass(frozen=True)
class Union:
    indices: tuple


@dataclass(frozen=True)
class Wildcard:
    pass


@dataclass(frozen=True)
class Filter:
    expr: "Or"


@dataclass(frozen=True)
class Or:
    terms: tuple


@dataclass(frozen=True)
class And:
    terms: tuple


@dataclass(frozen=True)
class Not:
    term: object


@dataclass(frozen=True)
class Cmp:
    rel: tuple  # steps from '@'
    op: str
    literal: object


@dataclass(frozen=True)
class Exists:
    rel: tuple


Step = object  # Child | RecursiveChild | Index | Wildcard | Filter

_NAME_END = set(".[]()<>=!&| \t'\"")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    # -- low-level helpers ---------------------------------------------------
    def peek(self, k: int = 1) -> str:
        return self.text[self.pos : self.pos + k]

    def eat(self, s: str) -> None:
        if not self.text.startswith(s, self.pos):
            raise JsonPathError(f"expected {s!r} at {self.pos} in {self.text!r}")
        self.pos += len(s)

    def skip_ws(self) -> None:
        while self.pos < len(self.text) and self.text[self.pos] in " \t":
            self.pos += 1

    def name(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] not in _NAME_END:
            self.pos += 1
        if self.pos == start:
            raise JsonPathError(f"expected name at {start} in {self.text!r}")
        return self.text[start : self.pos]

    # -- grammar --------------------------------------------------------------
    def parse_path(self) -> tuple:
        self.eat("$")
        steps = self.parse_steps()
        if self.pos != len(self.text):
            raise JsonPathError(f"trailing input at {self.pos} in {self.text!r}")
        return steps

    def parse_steps(self) -> tuple:
        steps: list = []
        while self.pos < len(self.text):
            c = self.peek()
            if c == ".":
                if self.peek(2) == "..":
                    self.eat("..")
                    steps.append(RecursiveChild(self.name()))
                else:
                    self.eat(".")
                    if self.peek() == "*":
                        self.eat("*")
                        steps.append(Wildcard())
                    else:
                        steps.append(Child(self.name()))
            elif c == "[":
                steps.append(self.parse_bracket())
            else:
                break
        return tuple(steps)

    def parse_bracket(self):
        self.eat("[")
        self.skip_ws()
        c = self.peek()
        if c == "*":
            self.eat("*")
            self.skip_ws()
            self.eat("]")
            return Wildcard()
        if c in "'\"":
            quoted = self.string_literal()
            self.skip_ws()
            self.eat("]")
            return Child(quoted)
        if c == "?":
            self.eat("?")
            self.skip_ws()
            self.eat("(")
            expr = self.parse_or()
            self.skip_ws()
            self.eat(")")
            self.skip_ws()
            self.eat("]")
            return Filter(expr)
        # integer index / slice / union (negative allowed)
        def maybe_int() -> int | None:
            s = self.pos
            if self.peek() == "-":
                self.pos += 1
            while self.pos < len(self.text) and self.text[self.pos].isdigit():
                self.pos += 1
            if self.pos == s:
                return None
            try:
                return int(self.text[s : self.pos])
            except ValueError as e:  # bare '-' as in '$[-]'
                raise JsonPathError(f"bad index at {s} in {self.text!r}") from e

        first = maybe_int()
        self.skip_ws()
        if self.peek() == ":":  # slice [s:e] — either bound optional
            self.eat(":")
            self.skip_ws()
            stop = maybe_int()
            self.skip_ws()
            self.eat("]")
            return Slice(first, stop)
        if first is None:
            raise JsonPathError(f"bad bracket at {self.pos} in {self.text!r}")
        if self.peek() == ",":  # union [i, j, ...]
            idxs = [first]
            while self.peek() == ",":
                self.eat(",")
                self.skip_ws()
                nxt = maybe_int()
                if nxt is None:
                    raise JsonPathError(
                        f"bad union index at {self.pos} in {self.text!r}"
                    )
                idxs.append(nxt)
                self.skip_ws()
            self.eat("]")
            return Union(tuple(idxs))
        self.eat("]")
        return Index(first)

    def string_literal(self) -> str:
        quote = self.peek()
        if quote not in "'\"":
            raise JsonPathError(f"expected string at {self.pos}")
        self.pos += 1
        out = []
        while self.pos < len(self.text):
            ch = self.text[self.pos]
            if ch == "\\" and self.pos + 1 < len(self.text):
                out.append(self.text[self.pos + 1])
                self.pos += 2
                continue
            if ch == quote:
                self.pos += 1
                return "".join(out)
            out.append(ch)
            self.pos += 1
        raise JsonPathError("unterminated string literal")

    def parse_or(self) -> Or:
        terms = [self.parse_and()]
        self.skip_ws()
        while self.peek(2) == "||":
            self.eat("||")
            terms.append(self.parse_and())
            self.skip_ws()
        return Or(tuple(terms))

    def parse_and(self) -> And:
        terms = [self.parse_atom()]
        self.skip_ws()
        while self.peek(2) == "&&":
            self.eat("&&")
            terms.append(self.parse_atom())
            self.skip_ws()
        return And(tuple(terms))

    def parse_atom(self):
        self.skip_ws()
        if self.peek() == "(":
            self.eat("(")
            expr = self.parse_or()
            self.skip_ws()
            self.eat(")")
            return expr
        if self.peek() == "!":
            self.eat("!")
            return Not(self.parse_atom())
        rel = self.parse_rel()
        self.skip_ws()
        for op in ("==", "!=", "<=", ">=", "<", ">"):
            if self.peek(len(op)) == op:
                self.eat(op)
                self.skip_ws()
                return Cmp(rel, op, self.parse_literal())
        if self.peek(2) == "=~":  # regex: @.f =~ /pattern/flags
            self.eat("=~")
            self.skip_ws()
            self.eat("/")
            s = self.pos
            while self.pos < len(self.text) and self.text[self.pos] != "/":
                if self.text[self.pos] == "\\":
                    self.pos += 1
                self.pos += 1
            pattern = self.text[s : self.pos]
            self.eat("/")
            flags = ""
            while self.peek() and self.peek() in "i":
                flags += self.peek()
                self.pos += 1
            return Cmp(rel, "=~", (pattern, flags))
        if self.peek(3) in ("in ", "in["):  # membership: @.f in ['a','b']
            self.eat("in")
            self.skip_ws()
            self.eat("[")
            items = []
            while True:
                self.skip_ws()
                items.append(self.parse_literal())
                self.skip_ws()
                if self.peek() == ",":
                    self.eat(",")
                    continue
                break
            self.eat("]")
            return Cmp(rel, "in", tuple(items))
        return Exists(rel)

    def parse_rel(self) -> tuple:
        self.eat("@")
        steps: list = []
        while self.pos < len(self.text):
            c = self.peek()
            if c == ".":
                self.eat(".")
                steps.append(Child(self.name()))
            elif c == "[":
                steps.append(self.parse_bracket())
            else:
                break
        return tuple(steps)

    def parse_literal(self):
        c = self.peek()
        if c in "'\"":
            return self.string_literal()
        for word, val in (("true", True), ("false", False), ("null", None)):
            if self.text.startswith(word, self.pos):
                self.pos += len(word)
                return val
        start = self.pos
        if self.peek() == "-":
            self.pos += 1
        while self.pos < len(self.text) and (
            self.text[self.pos].isdigit() or self.text[self.pos] == "."
        ):
            self.pos += 1
        if self.pos == start:
            raise JsonPathError(f"expected literal at {start} in {self.text!r}")
        tok = self.text[start : self.pos]
        try:
            return float(tok) if "." in tok else int(tok)
        except ValueError as e:  # malformed number like '1.2.3'
            raise JsonPathError(f"bad number {tok!r} in {self.text!r}") from e


def parse(path: str) -> tuple:
    """Parse a JsonPath string into a step tuple. Raises JsonPathError."""
    return _Parser(path.strip()).parse_path()


# --------------------------------------------------------------------------
# Tier 3: pure-Python evaluator (UDF fallback; also the test oracle)
# --------------------------------------------------------------------------


def _eval_steps(nodes: list, steps: tuple) -> list:
    for step in steps:
        nodes = _eval_step(nodes, step)
        if not nodes:
            return []
    return nodes


def _descendants(node: Any):
    yield node
    if isinstance(node, dict):
        for v in node.values():
            yield from _descendants(v)
    elif isinstance(node, list):
        for v in node:
            yield from _descendants(v)


def _eval_step(nodes: list, step) -> list:
    out: list = []
    if isinstance(step, Child):
        for n in nodes:
            if isinstance(n, dict) and step.name in n:
                out.append(n[step.name])
    elif isinstance(step, RecursiveChild):
        for n in nodes:
            for d in _descendants(n):
                if isinstance(d, dict) and step.name in d:
                    out.append(d[step.name])
    elif isinstance(step, Index):
        for n in nodes:
            if isinstance(n, list):
                try:
                    out.append(n[step.i])
                except IndexError:
                    pass
    elif isinstance(step, Slice):
        for n in nodes:
            if isinstance(n, list):
                out.extend(n[step.start : step.stop])
    elif isinstance(step, Union):
        for n in nodes:
            if isinstance(n, list):
                for i in step.indices:
                    try:
                        out.append(n[i])
                    except IndexError:
                        pass
    elif isinstance(step, Wildcard):
        for n in nodes:
            if isinstance(n, list):
                out.extend(n)
            elif isinstance(n, dict):
                out.extend(n.values())
    elif isinstance(step, Filter):
        for n in nodes:
            items = n if isinstance(n, list) else [n]
            out.extend(e for e in items if _eval_filter(e, step.expr))
    else:  # pragma: no cover
        raise JsonPathError(f"unknown step {step!r}")
    return out


def _eval_filter(node: Any, expr) -> bool:
    if isinstance(expr, Or):
        return any(_eval_filter(node, t) for t in expr.terms)
    if isinstance(expr, And):
        return all(_eval_filter(node, t) for t in expr.terms)
    if isinstance(expr, Not):
        return not _eval_filter(node, expr.term)
    if isinstance(expr, Exists):
        return bool(_eval_steps([node], expr.rel))
    if isinstance(expr, Cmp):
        matches = _eval_steps([node], expr.rel)
        if not matches:
            return False
        value = matches[0]
        return _compare(value, expr.op, expr.literal)
    raise JsonPathError(f"unknown filter term {expr!r}")


def _compare(value: Any, op: str, literal: Any) -> bool:
    if op == "in":
        return any(_compare(value, "==", x) for x in literal)
    if op == "=~":
        import re

        if not isinstance(value, str):
            return False
        pattern, flags = literal
        f = re.IGNORECASE if "i" in flags else 0
        try:
            return re.fullmatch(pattern, value, f) is not None
        except re.error:
            return False
    if op == "==":
        return value == literal and type(value) in (type(literal), int, float) or (
            isinstance(value, bool) == isinstance(literal, bool) and value == literal
        )
    if op == "!=":
        return not _compare(value, "==", literal)
    try:
        if op == "<":
            return value < literal
        if op == "<=":
            return value <= literal
        if op == ">":
            return value > literal
        if op == ">=":
            return value >= literal
    except TypeError:
        return False
    raise JsonPathError(f"unknown op {op}")


def evaluate(obj: Any, path: str | tuple) -> list:
    """Return the list of nodes the path resolves to (may raise)."""
    steps = parse(path) if isinstance(path, str) else path
    return _eval_steps([obj], steps)


# --------------------------------------------------------------------------
# Compiled tier-3: closure compiler for the hot matching loop
# --------------------------------------------------------------------------
#
# The tree-walking interpreter above stays the SEMANTIC ORACLE (tests
# fuzz the compiled form against it); the decode/dispatch hot path uses
# this compiler instead. Two wins over interpreting per record:
# per-step isinstance dispatch happens once at compile time (each AST
# node becomes a specialized closure), and the step chain is LAZY
# (generators), so a match short-circuits at the first resolved node
# instead of materializing the full node list — `match` only ever asks
# "is the result non-empty". Measured ~1.5× on the dispatch rule bank
# (the residual cost is the recursive-descent walk itself, which a
# non-match must complete regardless of representation).

_SENT = object()


def _c_steps(steps: tuple):
    """steps -> fn(nodes: iterable) -> iterator of resolved nodes."""
    fns = [_c_step(s) for s in steps]

    def run(nodes):
        for fn in fns:
            nodes = fn(nodes)
        return iter(nodes)

    return run


def _c_step(step):
    if isinstance(step, Child):
        name = step.name

        def fn(nodes):
            for n in nodes:
                if isinstance(n, dict) and name in n:
                    yield n[name]

        return fn
    if isinstance(step, RecursiveChild):
        name = step.name

        def fn(nodes):
            for n in nodes:
                for d in _descendants(n):
                    if isinstance(d, dict) and name in d:
                        yield d[name]

        return fn
    if isinstance(step, Index):
        i = step.i

        def fn(nodes):
            for n in nodes:
                if isinstance(n, list):
                    try:
                        yield n[i]
                    except IndexError:
                        pass

        return fn
    if isinstance(step, Slice):
        start, stop = step.start, step.stop

        def fn(nodes):
            for n in nodes:
                if isinstance(n, list):
                    yield from n[start:stop]

        return fn
    if isinstance(step, Union):
        indices = step.indices

        def fn(nodes):
            for n in nodes:
                if isinstance(n, list):
                    for i in indices:
                        try:
                            yield n[i]
                        except IndexError:
                            pass

        return fn
    if isinstance(step, Wildcard):

        def fn(nodes):
            for n in nodes:
                if isinstance(n, list):
                    yield from n
                elif isinstance(n, dict):
                    yield from n.values()

        return fn
    if isinstance(step, Filter):
        pred = _c_filter(step.expr)

        def fn(nodes):
            for n in nodes:
                if isinstance(n, list):
                    for e in n:
                        if pred(e):
                            yield e
                elif pred(n):
                    yield n

        return fn
    raise JsonPathError(f"unknown step {step!r}")  # pragma: no cover


def _c_filter(expr):
    if isinstance(expr, Or):
        preds = [_c_filter(t) for t in expr.terms]
        if len(preds) == 1:
            return preds[0]
        return lambda n: any(p(n) for p in preds)
    if isinstance(expr, And):
        preds = [_c_filter(t) for t in expr.terms]
        if len(preds) == 1:
            return preds[0]
        return lambda n: all(p(n) for p in preds)
    if isinstance(expr, Not):
        p = _c_filter(expr.term)
        return lambda n: not p(n)
    if isinstance(expr, Exists):
        sub = _c_steps(expr.rel)
        return lambda n: next(sub((n,)), _SENT) is not _SENT
    if isinstance(expr, Cmp):
        sub = _c_steps(expr.rel)
        cmp = _c_compare(expr.op, expr.literal)

        def pred(n):
            v = next(sub((n,)), _SENT)
            if v is _SENT:
                return False
            return cmp(v)

        return pred
    raise JsonPathError(f"unknown filter term {expr!r}")


def _c_compare(op: str, literal):
    """One closure per comparison — literal type checks, regex
    compilation, and membership fan-out all hoisted to compile time.
    Each branch mirrors _compare exactly (fuzz-pinned)."""
    if op == "in":
        eqs = [_c_compare("==", x) for x in literal]
        return lambda v: any(e(v) for e in eqs)
    if op == "=~":
        import re

        pattern, flags = literal
        f = re.IGNORECASE if "i" in flags else 0
        try:
            rx = re.compile(pattern, f)
        except re.error:
            return lambda v: False
        return lambda v: isinstance(v, str) and rx.fullmatch(v) is not None
    if op == "==":
        lt = type(literal)
        lit_is_bool = isinstance(literal, bool)
        return lambda v: (
            v == literal and type(v) in (lt, int, float)
        ) or (isinstance(v, bool) == lit_is_bool and v == literal)
    if op == "!=":
        eq = _c_compare("==", literal)
        return lambda v: not eq(v)
    if op in ("<", "<=", ">", ">="):
        import operator

        o = {
            "<": operator.lt,
            "<=": operator.le,
            ">": operator.gt,
            ">=": operator.ge,
        }[op]

        def cmp(v):
            try:
                return o(v, literal)
            except TypeError:
                return False

        return cmp
    raise JsonPathError(f"unknown op {op}")


def compile_predicate(path: str | tuple):
    """path -> fn(parsed_json_obj) -> bool (non-empty-match semantics,
    per-record errors ⇒ False — TopologyProducer.kt:216-223). Parse/
    compile errors still raise, like parse(); only evaluation is
    error-absorbing."""
    steps = parse(path) if isinstance(path, str) else path
    run = _c_steps(steps)

    def pred(obj) -> bool:
        try:
            return next(run((obj,)), _SENT) is not _SENT
        except Exception:
            return False

    return pred


def match(json_text: str | None, path: str | tuple) -> bool:
    """Reference semantics: non-empty node list ⇒ True; ANY error ⇒ False.

    (≅ TopologyProducer.kt:216-223 — runCatching + SUPPRESS_EXCEPTIONS.)
    """
    import json

    if json_text is None:
        return False
    try:
        return bool(evaluate(json.loads(json_text), path))
    except Exception:
        return False


def jsonpath_match_pandas_udf(path: str):
    """Arrow-batched predicate over a JSON-string column (tier-3 fallback)."""
    import json

    pred = compile_predicate(path)  # compile once; fail fast on bad rules

    def row(txt):
        if txt is None:
            return False
        try:
            return pred(json.loads(txt))
        except Exception:
            return False

    @F.pandas_udf(T.BooleanType())
    def _match(s: pd.Series) -> pd.Series:
        return s.map(row)

    return _match


def jsonpath_match_many_pandas_udf(paths: list[str]):
    """One Arrow-batched pass for a whole tier-3 rule bank: the JSON
    text is json.loads'd ONCE per record and every predicate evaluates
    against the same parsed object, returning array<boolean> in rule
    order. With N Python-tier rules the per-rule UDF costs N parses per
    record (the parse dominates evaluation on real transactions);
    fusing them makes the Python matching cost parse + N cheap walks,
    and collapses N UDF columns into one Arrow transfer. Per-rule error
    semantics are unchanged: an evaluation error yields False for THAT
    rule only; unparseable JSON yields all-False (reference parity,
    TopologyProducer.kt:216-223)."""
    import json

    preds = [compile_predicate(p) for p in paths]
    n = len(preds)

    @F.pandas_udf(T.ArrayType(T.BooleanType()))
    def _match_many(s: pd.Series) -> pd.Series:
        def row(txt):
            if txt is None:
                return [False] * n
            try:
                obj = json.loads(txt)
            except Exception:
                return [False] * n
            return [p(obj) for p in preds]

        return s.map(row)

    return _match_many


# --------------------------------------------------------------------------
# Tier 1: native Column compiler over a typed struct column
# --------------------------------------------------------------------------

NodeFn = Callable[[Column], Column]  # node column -> boolean Column


def _lit(literal) -> Column:
    return F.lit(literal)


def _field_type(dtype: T.DataType, name: str) -> T.DataType | None:
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if f.name == name:
                return f.dataType
    return None


def _cmp_column(node: Column, dtype: T.DataType, op: str, literal) -> Column:
    """Comparison with JsonPath semantics: type-mismatch ⇒ non-match."""
    if op == "in":
        # typed membership: only literals type-compatible with the column
        # can match (string list vs numeric column ⇒ False, like Jayway)
        is_str_col = isinstance(dtype, T.StringType)
        compat = [x for x in literal if isinstance(x, str) == is_str_col]
        if not compat:
            return F.lit(False)
        return node.isin(*compat)
    if op == "=~":
        if not isinstance(dtype, T.StringType):
            return F.lit(False)
        pattern, flags = literal
        prefix = "(?i)" if "i" in flags else ""
        # Jayway's =~ is Matcher.matches() — a FULL match; rlike searches,
        # so anchor explicitly. Spark rlike is Java regex, same dialect.
        return node.rlike(rf"{prefix}\A(?:{pattern})\Z")
    if literal is None:
        return node.isNull() if op == "==" else node.isNotNull()
    # string literal vs non-string column (or vice versa) never matches,
    # mirroring Jayway's typed comparison.
    is_str_col = isinstance(dtype, T.StringType)
    if isinstance(literal, str) != is_str_col:
        if op == "!=":
            return node.isNotNull()  # value exists and is of a different type
        return F.lit(False)
    ops = {
        "==": node == _lit(literal),
        "!=": node != _lit(literal),
        "<": node < _lit(literal),
        "<=": node <= _lit(literal),
        ">": node > _lit(literal),
        ">=": node >= _lit(literal),
    }
    return ops[op]


_MISS = "miss"  # sentinel: path provably absent from the schema


def _rel_compile(dtype: T.DataType, rel: tuple):
    """Compile an '@.a.b[0]' relative path against the schema.

    Returns (column_fn, final_dtype) when walkable, ``_MISS`` when the
    schema proves the path can never resolve (definite miss ⇒ constant
    non-match, TopologyProducer.kt:221-223), or None for constructs this
    tier doesn't support (caller falls back to the UDF evaluator).
    """
    fns: list = []
    dt = dtype
    for step in rel:
        if isinstance(step, Child):
            ft = _field_type(dt, step.name)
            if ft is None:
                return _MISS
            fns.append(lambda c, n=step.name: c.getField(n))
            dt = ft
        elif isinstance(step, Index):
            if not isinstance(dt, T.ArrayType):
                return _MISS
            # try_element_at is 1-based; JsonPath [i] is 0-based, [-1] is
            # last. MUST be the try_ variant: plain element_at THROWS on an
            # out-of-bounds index under ANSI semantics, but reference
            # semantics treat any evaluation error as a non-match
            # (TopologyProducer.kt:221-223) — null propagates to False.
            pos = step.i + 1 if step.i >= 0 else step.i
            fns.append(lambda c, p=pos: F.try_element_at(c, F.lit(p)))
            dt = dt.elementType
        else:
            return None

    def colfn(c: Column) -> Column:
        for f in fns:
            c = f(c)
        return c

    return colfn, dt


def _filter_fn(dtype: T.DataType, expr) -> NodeFn | None:
    """Compile a filter expression to node-col -> boolean Column."""
    if isinstance(expr, Or):
        fns = [_filter_fn(dtype, t) for t in expr.terms]
        if any(f is None for f in fns):
            return None
        return lambda c: _reduce_or([f(c) for f in fns])
    if isinstance(expr, And):
        fns = [_filter_fn(dtype, t) for t in expr.terms]
        if any(f is None for f in fns):
            return None
        return lambda c: _reduce_and([f(c) for f in fns])
    if isinstance(expr, Not):
        f = _filter_fn(dtype, expr.term)
        if f is None:
            return None
        return lambda c: ~F.coalesce(f(c), F.lit(False))
    if isinstance(expr, Exists):
        f = _exists_fn(dtype, expr.rel)
        return f
    if isinstance(expr, Cmp):
        resolved = _rel_compile(dtype, expr.rel)
        if resolved is _MISS:
            return lambda c: F.lit(False)  # definite miss ⇒ non-match
        if resolved is None:
            return None  # unsupported construct ⇒ UDF fallback
        colfn, dt = resolved
        return lambda c: F.coalesce(
            _cmp_column(colfn(c), dt, expr.op, expr.literal), F.lit(False)
        )
    return None


def _reduce_or(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _reduce_and(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _exists_fn(dtype: T.DataType, steps: tuple) -> NodeFn | None:
    """Compile steps to a fn: node Column -> boolean 'subtree has ≥1 match'."""
    if not steps:
        return lambda c: c.isNotNull()
    step, rest = steps[0], steps[1:]

    if isinstance(step, Child):
        ft = _field_type(dtype, step.name)
        if ft is None:
            return lambda c: F.lit(False)  # definite miss ⇒ non-match
        f = _exists_fn(ft, rest)
        if f is None:
            return None
        return lambda c: F.coalesce(f(c.getField(step.name)), F.lit(False))

    if isinstance(step, Index):
        if not isinstance(dtype, T.ArrayType):
            return lambda c: F.lit(False)
        f = _exists_fn(dtype.elementType, rest)
        if f is None:
            return None
        # try_element_at, not element_at: out-of-bounds must be a
        # non-match, not an ANSI runtime error (see _walk_steps)
        pos = step.i + 1 if step.i >= 0 else step.i
        return lambda c: F.coalesce(
            f(F.try_element_at(c, F.lit(pos))), F.lit(False)
        )

    if isinstance(step, Union):
        if not isinstance(dtype, T.ArrayType):
            return lambda c: F.lit(False)
        f = _exists_fn(dtype.elementType, rest)
        if f is None:
            return None
        positions = [i + 1 if i >= 0 else i for i in step.indices]
        return lambda c: F.coalesce(
            _reduce_or(
                [
                    F.coalesce(f(F.try_element_at(c, F.lit(p))), F.lit(False))
                    for p in positions
                ]
            ),
            F.lit(False),
        )

    if isinstance(step, Slice):
        if not isinstance(dtype, T.ArrayType):
            return lambda c: F.lit(False)
        # non-negative bounds compile natively; negative bounds (python
        # wrap-around) fall back to the UDF tier
        s = step.start or 0
        if s < 0 or (step.stop is not None and step.stop < 0):
            return None
        f = _exists_fn(dtype.elementType, rest)
        if f is None:
            return None

        def sliced(c: Column) -> Column:
            length = (
                F.lit(step.stop - s)
                if step.stop is not None
                else F.greatest(F.size(c) - F.lit(s), F.lit(0))
            )
            return F.slice(c, F.lit(s + 1), length)

        if step.stop is not None and step.stop - s <= 0:
            return lambda c: F.lit(False)
        return lambda c: F.coalesce(
            F.exists(sliced(c), lambda e: F.coalesce(f(e), F.lit(False))),
            F.lit(False),
        )

    if isinstance(step, Wildcard):
        if isinstance(dtype, T.ArrayType):
            f = _exists_fn(dtype.elementType, rest)
            if f is None:
                return None
            return lambda c: F.coalesce(
                F.exists(c, lambda e: F.coalesce(f(e), F.lit(False))), F.lit(False)
            )
        if isinstance(dtype, T.StructType):
            fns = []
            for fld in dtype.fields:
                f = _exists_fn(fld.dataType, rest)
                if f is None:
                    return None
                fns.append((fld.name, f))
            return lambda c: F.coalesce(
                _reduce_or([F.coalesce(f(c.getField(n)), F.lit(False)) for n, f in fns]),
                F.lit(False),
            )
        return lambda c: F.lit(False)

    if isinstance(step, Filter):
        if isinstance(dtype, T.ArrayType):
            pred = _filter_fn(dtype.elementType, step.expr)
            f = _exists_fn(dtype.elementType, rest)
            if pred is None or f is None:
                return None
            return lambda c: F.coalesce(
                F.exists(
                    c,
                    lambda e: F.coalesce(pred(e), F.lit(False))
                    & F.coalesce(f(e), F.lit(False)),
                ),
                F.lit(False),
            )
        # filter applied to a single object: the object passes or not
        pred = _filter_fn(dtype, step.expr)
        f = _exists_fn(dtype, rest)
        if pred is None or f is None:
            return None
        return lambda c: F.coalesce(pred(c) & f(c), F.lit(False))

    if isinstance(step, RecursiveChild):
        # Schema-directed expansion: find every position in the (finite)
        # schema tree whose field name matches, apply the rest there.
        fns = _recursive_fns(dtype, step.name, rest)
        if fns is None:
            return None
        if not fns:
            return lambda c: F.lit(False)
        return lambda c: F.coalesce(
            _reduce_or([F.coalesce(f(c), F.lit(False)) for f in fns]), F.lit(False)
        )

    return None  # pragma: no cover


def _recursive_fns(dtype: T.DataType, name: str, rest: tuple) -> list[NodeFn] | None:
    """All match-functions for '..name' descendants under dtype."""
    fns: list[NodeFn] = []
    if isinstance(dtype, T.StructType):
        for fld in dtype.fields:
            if fld.name == name:
                f = _exists_fn(fld.dataType, rest)
                if f is None:
                    return None
                fns.append(
                    (lambda fname, ff: lambda c: ff(c.getField(fname)))(fld.name, f)
                )
            sub = _recursive_fns(fld.dataType, name, rest)
            if sub is None:
                return None
            fns.extend(
                (lambda fname, sf: lambda c: sf(c.getField(fname)))(fld.name, s)
                for s in sub
            )
    elif isinstance(dtype, T.ArrayType):
        sub = _recursive_fns(dtype.elementType, name, rest)
        if sub is None:
            return None
        fns.extend(
            (
                lambda sf: lambda c: F.exists(
                    c, lambda e: F.coalesce(sf(e), F.lit(False))
                )
            )(s)
            for s in sub
        )
    return fns


def compile_struct_predicate(
    col: Column, dtype: T.DataType, path: str | tuple
) -> Column | None:
    """Compile a JsonPath to a native boolean Column over a struct column.

    Returns None when the path uses constructs outside the compilable
    subset (caller falls back to the Pandas-UDF evaluator). A path that is
    in the subset but cannot match the schema (e.g. ``$.nop``) compiles to
    ``lit(False)`` — the reference treats missed definite paths as
    non-matches (TopologyProducer.kt:221-223).
    """
    steps = parse(path) if isinstance(path, str) else path
    f = _exists_fn(dtype, steps)
    if f is None:
        return None
    return F.coalesce(f(col), F.lit(False))


# --------------------------------------------------------------------------
# Tier 2: definite paths over untyped JSON strings
# --------------------------------------------------------------------------


def _definite_get_json_path(steps: tuple) -> str | None:
    """Render child/index-only steps as a get_json_object path string."""
    parts = ["$"]
    for s in steps:
        if isinstance(s, Child):
            if not s.name or any(c in s.name for c in ".[]$'\"*@"):
                return None
            parts.append("." + s.name)
        elif isinstance(s, Index):
            if s.i < 0:
                return None
            parts.append(f"[{s.i}]")
        else:
            return None
    return "".join(parts)


def compile_json_string_predicate(col: Column, path: str | tuple) -> Column | None:
    """Definite path over a JSON string → get_json_object IS NOT NULL.

    KNOWN DIVERGENCE (deliberate, pinned in tests/test_jsonpath.py):
    ``get_json_object`` returns SQL NULL for both a MISSING key and a key
    explicitly set to JSON ``null``, so ``{"a": null}`` + ``$.a`` is a
    non-match on this tier while Jayway (and the tier-3 evaluator) match
    the path. There is no detection/fallback — tier 2 wins whenever the
    path is definite. This is benign for the dispatch pipeline because
    protobuf JSON printing never emits null values (proto3 default
    omission, functions/protowire.py), so no tx JSON the rules see can
    contain an explicit null. Callers evaluating arbitrary user JSON that
    must distinguish null-valued keys should use the tier-3 evaluator
    directly (``jsonpath_matches_udf``).
    """
    steps = parse(path) if isinstance(path, str) else path
    gpath = _definite_get_json_path(steps)
    if gpath is None:
        return None
    return F.get_json_object(col, gpath).isNotNull()
