"""OTTL-lite expression compiler → vectorized Arrow compute.

The reference evaluates per-record boolean/value expressions in two
places: stanza ``if``/filter/router expressions (expr-lang,
/root/reference/pkg/stanza/operator/helper/expr_string.go:153-162) and
OTTL ``where`` clauses (participle grammar /root/reference/pkg/ottl/
grammar.go, evaluation expression.go, coercion compare.go:14-60).

This module compiles the shared subset — dotted paths, literals,
comparisons with numeric coercion, and/or/not, arithmetic, and a
function-call registry (the OTTL converters) — into closures
``fn(pa.Table) -> pa.Array | scalar`` built from ``pyarrow.compute``
kernels, evaluated once per *batch* instead of once per record.

Path resolution: flat dotted column names (``attributes.status`` is a
column literally named that). A missing column evaluates to null,
comparisons with null are null, and boolean consumers mask nulls to
False — matching the reference's "errored condition = no match"
behavior under ``error_mode: ignore``
(connector/routingconnector/logs.go:77-83).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ tokens

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<bytes>0x(?:[0-9a-fA-F]{2})+)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?)
  | (?P<int>\d+)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>==|!=|<=|>=|&&|\|\||[()<>+\-*/%,:\[\]={}])
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_.]*)*)
""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "true", "false", "nil", "null", "where"}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\", "0": "\0"}
_ESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|.)")


def _unescape(s: str) -> str:
    """Decode escape sequences only — non-ASCII characters pass through
    intact (``bytes.decode('unicode_escape')`` would mojibake them)."""

    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("u"):
            return chr(int(e[1:], 16))
        return _ESCAPES.get(e, e)

    return _ESCAPE_RE.sub(sub, s)


@dataclass
class _Tok:
    kind: str
    val: str


def _tokenize(s: str) -> list[_Tok]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ValueError(f"bad token at {s[i:i+20]!r} in expression {s!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        v = m.group()
        if kind == "name" and v.lower() in _KEYWORDS:
            out.append(_Tok(v.lower(), v.lower()))
        else:
            out.append(_Tok(kind, v))
    out.append(_Tok("eof", ""))
    return out


# ------------------------------------------------------------------ AST

Evaluator = Callable[[pa.Table], Any]  # returns pa.Array/ChunkedArray or python scalar


def _as_array(v: Any, n: int) -> pa.Array:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    return pa.array([v] * n) if v is not None else pa.nulls(n)


def _is_arr(v: Any) -> bool:
    return isinstance(v, (pa.Array, pa.ChunkedArray))


def _numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def _coerce_pair(a: Any, b: Any) -> tuple[Any, Any]:
    """Numeric cross-type comparisons coerce to float64
    (reference compare.go:14-60 compares int/float numerically)."""
    at = a.type if _is_arr(a) else None
    bt = b.type if _is_arr(b) else None
    if at is not None and bt is not None:
        if _numeric(at) and _numeric(bt) and at != bt:
            return pc.cast(a, pa.float64()), pc.cast(b, pa.float64())
    elif at is not None and isinstance(b, (int, float)) and _numeric(at):
        return a, b
    elif bt is not None and isinstance(a, (int, float)) and _numeric(bt):
        return a, b
    return a, b


_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}

# OTTL log-context enum symbols (contexts/ottllog/log.go:111-138): the
# 24-level severity names resolve to their integer values anywhere an
# expression expects a value.
ENUM_SYMBOLS: dict[str, int] = {"SEVERITY_NUMBER_UNSPECIFIED": 0}
for _i, _lvl in enumerate(("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")):
    for _j in range(4):
        ENUM_SYMBOLS[f"SEVERITY_NUMBER_{_lvl}{'' if _j == 0 else _j + 1}"] = _i * 4 + _j + 1

# span-context enums (pkg/ottl/contexts/internal/span.go:29-37)
ENUM_SYMBOLS.update({
    "SPAN_KIND_UNSPECIFIED": 0, "SPAN_KIND_INTERNAL": 1, "SPAN_KIND_SERVER": 2,
    "SPAN_KIND_CLIENT": 3, "SPAN_KIND_PRODUCER": 4, "SPAN_KIND_CONSUMER": 5,
    "STATUS_CODE_UNSET": 0, "STATUS_CODE_OK": 1, "STATUS_CODE_ERROR": 2,
})
# datapoint-context enums (contexts/ottldatapoint/datapoint.go:122-123)
ENUM_SYMBOLS.update({"FLAG_NONE": 0, "FLAG_NO_RECORDED_VALUE": 1})
# metric-context enums (pkg/ottl/contexts/internal/metric.go:19-27)
ENUM_SYMBOLS.update({
    "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
    "AGGREGATION_TEMPORALITY_DELTA": 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
    "METRIC_DATA_TYPE_NONE": 0, "METRIC_DATA_TYPE_GAUGE": 1,
    "METRIC_DATA_TYPE_SUM": 2, "METRIC_DATA_TYPE_HISTOGRAM": 3,
    "METRIC_DATA_TYPE_EXPONENTIAL_HISTOGRAM": 4, "METRIC_DATA_TYPE_SUMMARY": 5,
})
_ARITH = {
    "+": pc.add,
    "-": pc.subtract,
    "*": pc.multiply,
    "/": pc.divide,
}


def _is_ts(x: Any) -> bool:
    return _is_arr(x) and pa.types.is_timestamp(x.type)


def _to_duration(x: Any):
    """Numbers are seconds (the unit ``Duration()`` returns) → duration[us]."""
    if _is_arr(x):
        if pa.types.is_duration(x.type):
            return x
        us = pc.cast(pc.multiply(pc.cast(x, pa.float64()), 1e6), pa.int64())
        return pc.cast(us, pa.duration("us"))
    return pa.scalar(int(round(float(x) * 1e6)), pa.duration("us"))


def _arith_apply(a: Any, b: Any, op: str, fn):
    """OTTL math.go time semantics: time - time → seconds (float),
    time ± duration-seconds → time. Everything else → plain kernel."""
    if _is_ts(a) and _is_ts(b) and op == "-":
        d = pc.cast(pc.cast(pc.subtract(a, b), pa.int64()), pa.float64())
        return pc.divide(d, 1e6)
    if _is_ts(a) and not _is_ts(b) and op in ("+", "-"):
        return (pc.add if op == "+" else pc.subtract)(a, _to_duration(b))
    if _is_ts(b) and op == "+":
        return pc.add(b, _to_duration(a))
    return fn(a, b)


class _Parser:
    def __init__(self, toks: list[_Tok], funcs: dict[str, Callable]):
        self.toks = toks
        self.i = 0
        self.funcs = funcs

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind_or_val: str) -> _Tok:
        t = self.next()
        if t.kind != kind_or_val and t.val != kind_or_val:
            raise ValueError(f"expected {kind_or_val}, got {t.val!r}")
        return t

    # expr := or
    def parse(self) -> Evaluator:
        e = self.or_()
        if self.peek().kind != "eof":
            raise ValueError(f"trailing tokens at {self.peek().val!r}")
        return e

    def or_(self) -> Evaluator:
        left = self.and_()
        parts = [left]
        while self.peek().val in ("or", "||"):
            self.next()
            parts.append(self.and_())
        if len(parts) == 1:
            return left

        def ev(t: pa.Table, parts=parts):
            n = t.num_rows
            acc = _as_bool(parts[0](t), n)
            for p in parts[1:]:
                acc = pc.or_kleene(acc, _as_bool(p(t), n))
            return acc

        return ev

    def and_(self) -> Evaluator:
        left = self.not_()
        parts = [left]
        while self.peek().val in ("and", "&&"):
            self.next()
            parts.append(self.not_())
        if len(parts) == 1:
            return left

        def ev(t: pa.Table, parts=parts):
            n = t.num_rows
            acc = _as_bool(parts[0](t), n)
            for p in parts[1:]:
                acc = pc.and_kleene(acc, _as_bool(p(t), n))
            return acc

        return ev

    def not_(self) -> Evaluator:
        if self.peek().val == "not":
            self.next()
            inner = self.not_()

            def ev(t: pa.Table, inner=inner):
                return pc.invert(_as_bool(inner(t), t.num_rows))

            return ev
        return self.cmp()

    def cmp(self) -> Evaluator:
        left = self.sum_()
        if self.peek().val in _CMP:
            op = self.next().val
            right = self.sum_()
            fn = _CMP[op]

            def ev(t: pa.Table, left=left, right=right, fn=fn, op=op):
                a, b = left(t), right(t)
                if a is None or b is None:
                    # reference nil semantics (compare.go:174-185): nils
                    # equal each other and nothing else; inequalities
                    # with nil never match
                    other = b if a is None else a
                    if op == "==":
                        return True if other is None else (
                            pc.is_null(other) if _is_arr(other) else False
                        )
                    if op == "!=":
                        return False if other is None else (
                            pc.is_valid(other) if _is_arr(other) else True
                        )
                    return False
                if not _is_arr(a) and not _is_arr(b):
                    return fn(pa.array([a]), pa.array([b]))[0].as_py()
                a, b = _coerce_pair(a, b)
                try:
                    return fn(a, b)
                except pa.ArrowNotImplementedError:
                    # incomparable types: null (→ False under masking),
                    # reference coerces or errors per compare.go
                    n = a.length() if _is_arr(a) else b.length()
                    return pa.nulls(n, pa.bool_())

            return ev
        return left

    def sum_(self) -> Evaluator:
        left = self.term()
        while self.peek().val in ("+", "-"):
            op = self.next().val
            right = self.term()
            fn = _ARITH[op]

            def ev(t: pa.Table, left=left, right=right, fn=fn, op=op):
                return _arith_apply(left(t), right(t), op, fn)

            left = ev
        return left

    def term(self) -> Evaluator:
        left = self.factor()
        while self.peek().val in ("*", "/", "%"):
            op = self.next().val
            right = self.factor()
            if op == "%":
                def ev(t: pa.Table, left=left, right=right):
                    a, b = left(t), right(t)
                    if _is_arr(a) or _is_arr(b):
                        import numpy as np
                        an = a.to_numpy(zero_copy_only=False) if _is_arr(a) else a
                        bn = b.to_numpy(zero_copy_only=False) if _is_arr(b) else b
                        return pa.array(np.mod(an, bn))
                    return a % b
            else:
                fn = _ARITH[op]

                def ev(t: pa.Table, left=left, right=right, fn=fn):
                    return fn(left(t), right(t))

            left = ev
        return left

    def factor(self) -> Evaluator:
        t = self.peek()
        if t.val == "(":
            self.next()
            e = self.or_()
            self.expect(")")
            return e
        if t.val == "-":
            self.next()
            inner = self.factor()
            return lambda tbl, inner=inner: pc.negate(inner(tbl)) if _is_arr(inner(tbl)) else -inner(tbl)
        if t.kind == "int":
            self.next()
            v = int(t.val)
            return lambda tbl, v=v: v
        if t.kind == "float":
            self.next()
            v = float(t.val)
            return lambda tbl, v=v: v
        if t.kind == "str":
            self.next()
            v = _unescape(t.val[1:-1])
            return lambda tbl, v=v: v
        if t.val in ("true", "false"):
            self.next()
            v = t.val == "true"
            return lambda tbl, v=v: v
        if t.val in ("nil", "null"):
            self.next()
            return lambda tbl: None
        if t.val in ENUM_SYMBOLS:
            self.next()
            v = ENUM_SYMBOLS[t.val]
            return lambda tbl, v=v: v
        if t.kind == "bytes":
            self.next()
            v = bytes.fromhex(t.val[2:])
            return lambda tbl, v=v: v
        if t.val == "[":
            return self.list_literal()
        if t.val == "{":
            return self.map_literal()
        if t.kind == "name":
            self.next()
            name = t.val
            if self.peek().val == "(":
                # converter call; grammar.go:216 allows trailing keys on
                # converter RESULTS (`Converter(...)["k"][0]`)
                return self.keys_postfix(self.call(name))
            # string keys on a path build the dotted column name of the
            # flat data model (attributes["k"] ≡ attributes.k); an int
            # key (or any key after one) indexes the VALUE at runtime
            while self.peek().val == "[" and self.toks[self.i + 1].kind == "str":
                self.next()
                key = _unescape(self.expect("str").val[1:-1])
                self.expect("]")
                name = f"{name}.{key}"
            return self.keys_postfix(_path_eval(name))
        raise ValueError(f"unexpected token {t.val!r}")

    def list_literal(self) -> Evaluator:
        """``[v1, v2, …]`` (grammar.go list): scalar elements yield a
        plain python list constant; any array-valued element promotes
        the whole literal to a per-row list column."""
        self.expect("[")
        items: list[Evaluator] = []
        if self.peek().val != "]":
            items.append(self.or_())
            while self.peek().val == ",":
                self.next()
                items.append(self.or_())
        self.expect("]")

        def ev(t: pa.Table, items=items):
            vals = [it(t) for it in items]
            if not any(_is_arr(v) for v in vals):
                return vals
            n = t.num_rows
            cols = [_as_array(v, n) for v in vals]
            py = [c.to_pylist() for c in cols]
            return pa.array([[col[i] for col in py] for i in range(n)])

        return ev

    def map_literal(self) -> Evaluator:
        """``{"k": v, …}`` (grammar.go mapValue; string keys, values any
        expression incl. nested maps/lists): scalar values yield a plain
        python dict constant; any array-valued element promotes the
        whole literal to a per-row column of structs."""
        self.expect("{")
        keys: list[str] = []
        items: list[Evaluator] = []
        if self.peek().val != "}":
            while True:
                keys.append(_unescape(self.expect("str").val[1:-1]))
                self.expect(":")
                items.append(self.or_())
                if self.peek().val != ",":
                    break
                self.next()
        self.expect("}")

        def ev(t: pa.Table, keys=keys, items=items):
            vals = [it(t) for it in items]
            if not any(_is_arr(v) for v in vals):
                return dict(zip(keys, vals))
            n = t.num_rows
            py = [_as_array(v, n).to_pylist() for v in vals]
            return pa.array([
                {k: col[i] for k, col in zip(keys, py)} for i in range(n)
            ])

        return ev

    def keys_postfix(self, base: Evaluator) -> Evaluator:
        """Zero or more ``["key"]`` / ``[int]`` accesses applied to an
        evaluated VALUE (struct field, map lookup, list index) — the
        grammar's ``Keys []key`` on converters and non-leading path
        keys. A missing key/index yields null (error_mode: ignore)."""
        keys: list[object] = []
        while self.peek().val == "[":
            self.next()
            nxt = self.next()
            if nxt.kind == "str":
                keys.append(_unescape(nxt.val[1:-1]))
            elif nxt.kind == "int":
                keys.append(int(nxt.val))
            else:
                raise ValueError(f"expected string or int key, got {nxt.val!r}")
            self.expect("]")
        if not keys:
            return base

        def ev(t: pa.Table, base=base, keys=keys):
            v = base(t)
            for k in keys:
                v = _apply_key(v, k, t.num_rows)
            return v

        return ev

    def call(self, name: str) -> Evaluator:
        self.expect("(")
        args: list[Evaluator] = []
        kwargs: dict[str, Evaluator] = {}
        if self.peek().val != ")":
            self.call_arg(args, kwargs)
            while self.peek().val == ",":
                self.next()
                self.call_arg(args, kwargs)
        self.expect(")")
        fn = self.funcs.get(name)
        if fn is None:
            raise ValueError(f"unknown function {name!r}")

        def ev(t: pa.Table, fn=fn, args=args, kwargs=kwargs):
            return fn(t, *[a(t) for a in args],
                      **{k: a(t) for k, a in kwargs.items()})

        return ev

    def call_arg(self, args: list, kwargs: dict) -> None:
        """One argument, positional or named (grammar.go:219
        ``(name=)? value``) — named args must be lowercase identifiers
        immediately followed by ``=`` (not ``==``)."""
        t = self.peek()
        if (t.kind == "name" and self.toks[self.i + 1].val == "="
                and self.toks[self.i + 2].val != "="):
            self.next()
            self.next()
            kwargs[t.val] = self.or_()
        else:
            args.append(self.or_())


def _apply_key(v: Any, key, n: int):
    """One ``["k"]`` / ``[i]`` access on an evaluated value: python
    dict/list scalars, arrow struct/map/list columns. Missing keys and
    out-of-range indices → null (reference error_mode: ignore)."""
    if v is None:
        return None
    if isinstance(v, dict):
        return v.get(key) if isinstance(key, str) else None
    if isinstance(v, (list, tuple)):
        return (v[key] if isinstance(key, int) and -len(v) <= key < len(v)
                else None)
    if not _is_arr(v):
        return None
    typ = v.type
    try:
        if isinstance(key, str):
            if pa.types.is_struct(typ):
                return pc.struct_field(v, key)
            if pa.types.is_map(typ):
                looked = pc.map_lookup(v, query_key=key, occurrence="first")
                return looked
            return pa.nulls(len(v))
        if (pa.types.is_list(typ) or pa.types.is_large_list(typ)
                or pa.types.is_fixed_size_list(typ)):
            return pc.list_element(v, key)
        if pa.types.is_struct(typ):
            flds = typ
            return (pc.struct_field(v, key) if 0 <= key < flds.num_fields
                    else pa.nulls(len(v)))
        return pa.nulls(len(v))
    except (KeyError, pa.ArrowInvalid, pa.ArrowIndexError):
        return pa.nulls(len(v))


def _path_eval(name: str) -> Evaluator:
    """Column ref with alias chain: `body` ≡ `text` for the transcript
    envelope (reference field roots entry/field.go:13-15)."""

    def ev(t: pa.Table, name=name):
        if name in t.column_names:
            return t[name]
        if name == "body" and "text" in t.column_names:
            return t["text"]
        return pa.nulls(t.num_rows)

    return ev


def _as_bool(v: Any, n: int) -> pa.Array:
    if not _is_arr(v):
        return pa.array([bool(v)] * n)
    if pa.types.is_boolean(v.type):
        return v
    if pa.types.is_null(v.type):
        return pa.nulls(n, pa.bool_())
    return pc.cast(v, pa.bool_())


# ------------------------------------------------------------------ API

_DEFAULT_FUNCS: dict[str, Callable] = {}


def register_function(name: str, fn: Callable) -> None:
    """Register ``fn(table, *evaluated_args) -> array|scalar`` for use in
    expressions (the OTTL converter extension point,
    pkg/ottl/parser.go:54-60)."""
    _DEFAULT_FUNCS[name] = fn


def compile_expr(src: str, funcs: dict[str, Callable] | None = None) -> Evaluator:
    from .functions import converters  # noqa: F401  (registers defaults once)

    merged = dict(_DEFAULT_FUNCS)
    if funcs:
        merged.update(funcs)
    return _Parser(_tokenize(src), merged).parse()


def compile_mask(src: str, funcs: dict[str, Callable] | None = None) -> Callable[[pa.Table], pa.Array]:
    """Compile a boolean condition; nulls → False (no-match)."""
    ev = compile_expr(src, funcs)

    def mask(t: pa.Table) -> pa.Array:
        v = _as_bool(ev(t), t.num_rows)
        return pc.fill_null(v, False)

    return mask


