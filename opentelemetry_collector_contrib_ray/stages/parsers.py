"""Parser operators — the "grok" layer, vectorized.

Parity targets (all under /root/reference/pkg/stanza/operator/):
regex  parser/regex/parser.go:46-74   json parser/json/parser.go:28-40
csv    parser/csv/parser.go:29-107    keyvalue parser/keyvalue/parser.go:37-48
syslog parser/syslog/parser.go:86-172 uri parser/uri/parser.go:16-46
severity operator/helper/severity_builder.go:17-106
time   operator/helper/time.go:19-107 trace operator/helper/trace.go
scope  parser/scope/parser.go:20

Shared ParserOperator semantics (operator/helper/parser.go:126-187):
read ``parse_from``, produce fields, write under ``parse_to`` (default
the ``attributes.`` namespace → flat dotted columns), honor ``if_expr``
and ``on_error``. The reference's per-entry LRU regex memo cache
(parser/regex/cache.go) is unnecessary here: ``pc.extract_regex`` runs
the compiled pattern over the whole Arrow column in C++.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SEVERITY_ALIASES, SEVERITY_TEXT
from .base import BatchOp, blend_columns, set_column

try:  # pandas bundles ujson — ~2× faster than stdlib json on log-sized objects
    from pandas._libs.json import ujson_loads as _ujson_loads
except ImportError:  # pragma: no cover - pandas layout drift
    _ujson_loads = None


def _loads(s: str):
    """Fast JSON object parse: ujson first, stdlib as the semantic
    arbiter — any row ujson rejects gets retried with ``json.loads``,
    so acceptance is a superset of (and in practice identical to) the
    stdlib's; only rows BOTH reject are parse errors."""
    if _ujson_loads is not None:
        try:
            return _ujson_loads(s)
        except (ValueError, TypeError):
            pass
    return json.loads(s)


# Strict flat-JSON detector: a SOUND SUBSET of the JSON grammar (no
# escape sequences, no nesting beyond one flat array of scalars, strict
# number forms — no leading zeros / bare dots). A full match guarantees
# json.loads succeeds and that quoted values need no unescaping, so the
# matching rows can be field-extracted with RE2 kernels instead of
# per-row loads; everything else falls back to the per-row path.
_JSON_STR = r'"[^"\\]*"'
_JSON_NUM = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"
_JSON_SCALAR = rf"(?:{_JSON_STR}|{_JSON_NUM}|true|false|null)"
_JSON_ARRV = rf"\[\s*(?:{_JSON_SCALAR}(?:\s*,\s*{_JSON_SCALAR})*\s*)?\]"
_JSON_PAIR = rf"{_JSON_STR}\s*:\s*(?:{_JSON_SCALAR}|{_JSON_ARRV})"
_SIMPLE_JSON_RE = rf"^\{{\s*(?:{_JSON_PAIR}(?:\s*,\s*{_JSON_PAIR})*\s*)?\}}$"

# fast-path field types whose token→value semantics are proven equal to
# the slow path's (numbers truncate via float64, bools stringify,
# string-encoded numerics cast, JSON null → null)
_JSON_FAST_TYPES = ("string", "int64", "int32", "int8", "float64")


def _col(t: pa.Table, name: str):
    if name not in t.column_names:
        return pa.nulls(t.num_rows, pa.string())
    c = t[name]
    if not (pa.types.is_string(c.type) or pa.types.is_large_string(c.type)):
        c = pc.cast(c, pa.string())
    return c


_TYPE_CASTS = {
    "int64": pa.int64(), "int32": pa.int32(), "int8": pa.int8(),
    "float64": pa.float64(), "string": pa.string(), "bool": pa.bool_(),
}


def _cast_typed(arr: pa.Array, typ: str) -> pa.Array:
    target = _TYPE_CASTS[typ]
    if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) and (
        pa.types.is_integer(target) or pa.types.is_floating(target)
    ):
        # invalid numeric strings → null instead of raising
        ok = pc.fill_null(
            pc.match_substring_regex(arr, r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), False
        )
        arr = pc.if_else(ok, arr, pa.nulls(len(arr), arr.type))
    if pa.types.is_integer(target):
        f = pc.cast(arr, pa.float64(), safe=False)
        return pc.cast(pc.trunc(f), target, safe=False)
    return pc.cast(arr, target, safe=False)


class RegexParser(BatchOp):
    """Named-capture-group regex parse of a string column.

    Build-time validation mirrors parser/regex/config.go:110-158: the
    pattern must contain at least one named group. Non-matching non-null
    rows are parse errors (null outputs under ``send``, removed under
    ``drop``).
    """

    def __init__(self, pattern: str, parse_from: str = "text", prefix: str = "attributes.",
                 types: dict[str, str] | None = None, **kw):
        super().__init__(**kw)
        self.pattern = pattern
        rx = re.compile(pattern)
        self.groups = [g for g in rx.groupindex]
        if not self.groups:
            raise ValueError("regex pattern must define at least one named capture group")
        # groups whose subpattern is digit-pure produce /^\d+$/ strings
        # by construction — integer cast needs no validation regex or
        # float64 round-trip (and stays exact above 2^53)
        self._digit_groups = {
            g for g in self.groups
            if f"(?P<{g}>\\d+)" in pattern or f"(?P<{g}>[0-9]+)" in pattern
        }
        self.parse_from = parse_from
        self.prefix = prefix
        self.types = types or {}

    def _extract(self, t: pa.Table):
        return pc.extract_regex(_col(t, self.parse_from), self.pattern)

    def error_mask(self, t: pa.Table):
        src = _col(t, self.parse_from)
        ext = self._extract(t)
        return pc.and_(pc.is_valid(src), pc.is_null(ext))

    def transform(self, t: pa.Table) -> pa.Table:
        return self.transform_gated(t, None)

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        ext = self._extract(t)
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        ok = pc.is_valid(ext)  # write only where the parse succeeded
        if gate is not None:
            ok = pc.and_(ok, gate)
        cols = {}
        for g in self.groups:
            arr = pc.struct_field(ext, g)
            typ = self.types.get(g)
            if typ:
                if (
                    g in self._digit_groups
                    and typ in _TYPE_CASTS
                    and pa.types.is_integer(_TYPE_CASTS[typ])
                ):
                    try:  # guaranteed-digit strings: one exact cast
                        arr = pc.cast(arr, _TYPE_CASTS[typ])
                    except pa.ArrowInvalid:  # overflow → guarded path
                        arr = _cast_typed(arr, typ)
                else:
                    arr = _cast_typed(arr, typ)
            cols[self.prefix + g] = arr
        return blend_columns(t, cols, None if pc.all(ok).as_py() else ok)


class JsonParser(BatchOp):
    """JSON-object parse of a string column.

    Two modes, matching parser/json/parser.go:28-40 which parses ANY
    object into a dynamic map:
    - ``fields`` given: typed flat columns (the vectorizable hot path);
      dynamic keys outside ``fields`` are preserved JSON-encoded in
      ``<prefix>__rest`` when ``keep_rest=True``.
    - ``fields=None``: schema-free parse of arbitrary objects into ONE
      Arrow ``map<string, string>`` column ``<prefix>__map`` (nested
      values re-encoded as JSON strings) — schema-stable across batches
      no matter which keys appear, the reference's map[string]any
      equivalent under a columnar model (SURVEY.md §1.3).
    """

    def __init__(self, fields: dict[str, str] | None = None, parse_from: str = "text",
                 prefix: str = "attributes.", keep_rest: bool = False, **kw):
        super().__init__(**kw)
        self.fields = fields
        self.parse_from = parse_from
        self.prefix = prefix
        self.keep_rest = keep_rest

    def _parse_rows(self, t: pa.Table, gate=None):
        """Materialize ONLY the gated rows (a '{'-prefixed minority in log
        streams), parse, and scatter back — the hot-path trick that keeps
        the per-row json.loads off the 90% of rows the gate excludes."""
        col = _col(t, self.parse_from)
        n = t.num_rows
        out = [None] * n
        errs = np.zeros(n, dtype=bool)
        if gate is not None:
            g = np.asarray(gate, dtype=bool)
            idx = np.nonzero(g)[0]
            if len(idx) == 0:
                return out, errs
            vals = col.take(pa.array(idx)).to_pylist()
        else:
            idx = np.arange(n)
            vals = col.to_pylist()
        for j, s in zip(idx, vals):
            if s is None:
                continue
            try:
                d = _loads(s)
                if not isinstance(d, dict):
                    raise ValueError
                out[j] = d
            except (ValueError, TypeError):
                errs[j] = True
        return out, errs

    def error_mask(self, t: pa.Table):
        _, errs = self._parse_rows(t)
        return pa.array(errs)

    def transform(self, t: pa.Table) -> pa.Table:
        return self.transform_gated(t, None)

    def _transform_fast(self, t: pa.Table, gate) -> pa.Table:
        """Typed-fields hot path. Rows that full-match the strict
        flat-JSON detector (valid JSON by construction: no escapes, no
        nesting, and — per configured key — no duplicate occurrences,
        a scalar value, and no bool token under a numeric type) extract
        each field with one RE2 kernel; only the irregular remainder
        pays per-row ``_loads``, scattered back with replace_with_mask.
        Same column/ok semantics as the slow path on every row."""
        col = _col(t, self.parse_from)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = t.num_rows
        idx = None
        mv = col
        if gate is not None:
            g = np.asarray(gate, dtype=bool)
            idx = np.nonzero(g)[0]
            if len(idx) == 0:
                return t
            mv = col.take(pa.array(idx))
        m = len(mv)
        simple = pc.fill_null(pc.match_substring_regex(mv, _SIMPLE_JSON_RE), False)
        fast = simple.to_numpy(zero_copy_only=False).copy()
        toks: dict[str, tuple] = {}
        for key, typ in self.fields.items():
            cnt = pc.fill_null(
                pc.count_substring(mv, f'"{key}"'), 0
            ).to_numpy(zero_copy_only=False)
            # ONE extract per field capturing the raw token (quotes
            # included) — every alternate is non-empty, so token
            # presence is just struct validity (RE2 reports
            # non-participating groups as "", which would be ambiguous
            # with a matched empty string under separate groups)
            ext = pc.extract_regex(
                mv,
                rf'"{re.escape(key)}"\s*:\s*'
                rf'(?P<v>"[^"\\]*"|{_JSON_NUM}|true|false|null)')
            if isinstance(ext, pa.ChunkedArray):
                ext = ext.combine_chunks()
            tok = pc.struct_field(ext, "v")
            quoted = pc.fill_null(pc.starts_with(tok, '"'), False)
            q = pc.if_else(quoted, pc.utf8_slice_codeunits(tok, 1, -1),
                           pa.nulls(m, pa.string()))
            b = pc.if_else(quoted, pa.nulls(m, pa.string()), tok)
            hit = pc.is_valid(ext).to_numpy(zero_copy_only=False)
            # demote: duplicate key, key present but non-scalar value
            # (array), or bool token under a numeric target type
            fast &= (cnt <= 1) & ((cnt == 0) | hit)
            if typ != "string":
                isbool = pc.fill_null(
                    pc.is_in(b, value_set=pa.array(["true", "false"])), False
                )
                fast &= ~isbool.to_numpy(zero_copy_only=False)
            toks[key] = (q, b)
        slow_pos = np.nonzero(~fast)[0]
        ok_np = fast.copy()
        sdicts: list = []
        if len(slow_pos):
            svals = mv.take(pa.array(slow_pos)).to_pylist()
            for s in svals:
                d = None
                if s is not None:
                    try:
                        v = _loads(s)
                        if isinstance(v, dict):
                            d = v
                    except (ValueError, TypeError):
                        pass
                sdicts.append(d)
            ok_np[slow_pos] = np.fromiter(
                (d is not None for d in sdicts), dtype=bool, count=len(sdicts)
            )
        slow_mask = pa.array(~fast)
        cols = {}
        for key, typ in self.fields.items():
            q, b = toks[key]
            val = pc.if_else(
                pc.is_valid(q), q,
                pc.if_else(pc.fill_null(pc.equal(b, "null"), True),
                           pa.nulls(m, pa.string()), b),
            )
            arr = _cast_typed(val, typ)
            if len(slow_pos):
                sv = [None if d is None else d.get(key) for d in sdicts]
                try:
                    scol = pa.array(sv)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    # mixed / nested python values that Arrow can't infer
                    scol = pa.nulls(len(sv), _TYPE_CASTS[typ])
                if pa.types.is_null(scol.type):
                    scol = pa.nulls(len(sv), _TYPE_CASTS[typ])
                else:
                    try:
                        scol = _cast_typed(
                            pc.cast(scol, pa.string(), safe=False)
                            if typ == "string" else scol, typ)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        scol = pa.nulls(len(sv), _TYPE_CASTS[typ])
                arr = pc.replace_with_mask(arr, slow_mask, scol)
            if idx is not None:
                full_mask = np.zeros(n, dtype=bool)
                full_mask[idx[ok_np]] = True
                arr = pc.replace_with_mask(
                    pa.nulls(n, arr.type), pa.array(full_mask),
                    arr.filter(pa.array(ok_np)))
            cols[self.prefix + key] = arr
        if idx is not None:
            okm = np.zeros(n, dtype=bool)
            okm[idx[ok_np]] = True
        else:
            okm = ok_np
        return blend_columns(t, cols, None if okm.all() else pa.array(okm))

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        if (
            self.fields is not None
            and not self.keep_rest
            and all(typ in _JSON_FAST_TYPES for typ in self.fields.values())
        ):
            return self._transform_fast(t, gate)
        rows, _ = self._parse_rows(t, gate)
        if self.fields is None:
            items = [
                None if r is None else [
                    (k, v if isinstance(v, str) else json.dumps(v))
                    for k, v in r.items()
                ]
                for r in rows
            ]
            col = pa.array(items, type=pa.map_(pa.string(), pa.string()))
            return set_column(t, self.prefix + "__map", col)
        ok = pa.array([r is not None for r in rows])
        all_ok = bool(pc.all(ok).as_py()) if len(rows) else True
        cols = {}
        for key, typ in self.fields.items():
            try:
                col = pa.array([None if r is None else r.get(key) for r in rows])
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                col = pa.nulls(len(rows), _TYPE_CASTS.get(typ, pa.string()))
            if pa.types.is_null(col.type):
                col = pa.nulls(len(rows), _TYPE_CASTS.get(typ, pa.string()))
            elif typ in _TYPE_CASTS:
                try:
                    col = _cast_typed(pc.cast(col, pa.string(), safe=False) if typ == "string" else col, typ)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    col = pa.nulls(len(rows), _TYPE_CASTS[typ])
            cols[self.prefix + key] = col
        if self.keep_rest:
            known = set(self.fields)
            rest = [
                None if r is None else json.dumps({k: v for k, v in r.items() if k not in known}, sort_keys=True)
                for r in rows
            ]
            cols[self.prefix + "__rest"] = pa.array(rest, type=pa.string())
        return blend_columns(t, cols, None if all_ok else ok)


class JsonArrayParser(BatchOp):
    """JSON-array parse (parser/jsonarray/parser.go): a string field
    holding ``[...]``.

    - ``header`` given (comma-joined names like the reference's
      header mode): element i lands in ``<prefix><header[i]>``; arrays
      with a different length are parse errors. ``types`` casts
      individual columns; untyped elements are stringified (nested
      objects JSON-encoded — the reference also flattens nested values
      to strings, parser.go:56-58).
    - no header: the whole array lands as one ``list<string>`` column
      ``<prefix>__array``.
    """

    def __init__(self, header: list[str] | str | None = None, parse_from: str = "text",
                 prefix: str = "attributes.", types: dict[str, str] | None = None, **kw):
        super().__init__(**kw)
        if isinstance(header, str):
            header = header.split(",")
        self.header = header
        self.parse_from = parse_from
        self.prefix = prefix
        self.types = types or {}

    def _rows(self, t: pa.Table, gate=None):
        col = _col(t, self.parse_from)
        g = None if gate is None else np.asarray(gate, dtype=bool)
        out, errs = [], np.zeros(t.num_rows, dtype=bool)
        for i, s in enumerate(col.to_pylist()):
            if s is None or (g is not None and not g[i]):
                out.append(None)
                continue
            try:
                v = _loads(s)
                if not isinstance(v, list):
                    raise ValueError
                if self.header is not None and len(v) != len(self.header):
                    raise ValueError
                out.append(v)
            except (ValueError, TypeError):
                out.append(None)
                errs[i] = True
        return out, errs

    def error_mask(self, t: pa.Table):
        _, errs = self._rows(t)
        return pa.array(errs)

    @staticmethod
    def _elem_str(v):
        if v is None or isinstance(v, str):
            return v
        return json.dumps(v)

    def transform(self, t: pa.Table) -> pa.Table:
        return self.transform_gated(t, None)

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        rows, _ = self._rows(t, gate)
        if self.header is None:
            arr = pa.array(
                [None if r is None else [self._elem_str(x) for x in r] for r in rows],
                type=pa.list_(pa.string()),
            )
            return set_column(t, self.prefix + "__array", arr)
        ok = pa.array([r is not None for r in rows])
        cols = {}
        for i, name in enumerate(self.header):
            vals = pa.array(
                [None if r is None else self._elem_str(r[i]) for r in rows],
                type=pa.string(),
            )
            if name in self.types:
                vals = _cast_typed(vals, self.types[name])
            cols[self.prefix + name] = vals
        return blend_columns(t, cols, None if pc.all(ok).as_py() else ok)


class KeyValueParser(BatchOp):
    """key=value pair parse. With ``fields`` given the extraction is fully
    vectorized (one anchored regex per field); without, a per-row split
    fallback emits the dynamic-key JSON spill column."""

    def __init__(self, fields: list[str] | None = None, delimiter: str = "=",
                 pair_delimiter: str = " ", parse_from: str = "text",
                 prefix: str = "attributes.", types: dict[str, str] | None = None, **kw):
        super().__init__(**kw)
        self.fields = fields
        self.delimiter = delimiter
        self.pair_delimiter = pair_delimiter
        self.parse_from = parse_from
        self.prefix = prefix
        self.types = types or {}

    def _field_pattern(self, f: str) -> str:
        d, p = re.escape(self.delimiter), re.escape(self.pair_delimiter)
        return f"(?:^|{p}){re.escape(f)}{d}(?P<v>[^{p}]*)"

    def error_mask(self, t: pa.Table):
        src = _col(t, self.parse_from)
        has_pair = pc.match_substring(src, self.delimiter)
        return pc.and_(pc.is_valid(src), pc.invert(pc.fill_null(has_pair, False)))

    def transform(self, t: pa.Table) -> pa.Table:
        return self.transform_gated(t, None)

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        src = _col(t, self.parse_from)
        if self.fields is not None:
            n = t.num_rows
            idx = None
            if gate is not None:
                # minority gate: run the per-field regex over ONLY the
                # gated rows (one take), scatter matches back — k× fewer
                # full-column RE2 scans when the kv lines are a minority
                g = np.asarray(gate, dtype=bool)
                if not g.all():
                    idx = np.nonzero(g)[0]
                    if len(idx) == 0:
                        return t
                    src = src.take(pa.array(idx))
            for f in self.fields:
                ext = pc.extract_regex(src, self._field_pattern(f))
                if isinstance(ext, pa.ChunkedArray):
                    ext = ext.combine_chunks()
                arr = pc.struct_field(ext, "v")
                ok = pc.is_valid(ext)  # per-field: keep old value if absent
                if f in self.types:
                    # cast at minority length BEFORE the scatter — the
                    # validation regex + cast then run over the gated
                    # rows only, not the full batch
                    arr = _cast_typed(arr, self.types[f])
                if idx is not None:
                    ok_np = ok.to_numpy(zero_copy_only=False)
                    m = np.zeros(n, dtype=bool)
                    m[idx[ok_np]] = True
                    full = pc.replace_with_mask(
                        pa.nulls(n, arr.type), pa.array(m),
                        arr.filter(ok))
                    arr, ok = full, pa.array(m)
                t = blend_columns(t, {self.prefix + f: arr},
                                  None if pc.all(ok).as_py() else ok)
            return t
        g = None if gate is None else np.asarray(gate, dtype=bool)
        out = []
        for i, s in enumerate(src.to_pylist()):
            if s is None or (g is not None and not g[i]):
                out.append(None)
                continue
            d = {}
            for pair in s.split(self.pair_delimiter):
                if self.delimiter in pair:
                    k, _, v = pair.partition(self.delimiter)
                    if k:
                        d[k] = v
            out.append(json.dumps(d, sort_keys=True) if d else None)
        return set_column(t, self.prefix + "__kv", pa.array(out, type=pa.string()))


class CsvParser(BatchOp):
    """CSV row → named columns (parser/csv/parser.go:29-107).

    Quote semantics mirror the reference's three modes
    (csv/config.go ``lazy_quotes`` / ``ignore_quotes``,
    parseutils/csv.go ReadCSVRow):
    - default (strict): RFC-4180 quoting — quoted fields may contain the
      delimiter, doubled quotes escape, a bare quote in an unquoted
      field or an unterminated/misplaced quote is a parse error;
      newlines inside a field are kept (the reference stitches
      continuation lines back with ``\\n``).
    - ``lazy_quotes``: bare quotes are literal; never a quote error.
    - ``ignore_quotes``: plain split on the delimiter.

    Vectorization: rows without a quote character take the one-kernel
    ``pc.split_pattern`` path; only the quoted minority runs the per-row
    state machine, scattered back with ``pc.replace_with_mask``.

    Static ``header`` is the hot path; ``header_attribute`` enables the
    reference's dynamic per-entry header mode (parser.go:46-66) —
    per-row fallback emitting a JSON spill column (dynamic keys can't
    be stable Arrow columns). Rows whose field count ≠ header length
    are parse errors.
    """

    def __init__(self, header: list[str] | None = None, delimiter: str = ",",
                 parse_from: str = "text", prefix: str = "attributes.",
                 types: dict[str, str] | None = None,
                 header_attribute: str | None = None,
                 lazy_quotes: bool = False, ignore_quotes: bool = False, **kw):
        super().__init__(**kw)
        if header is None and header_attribute is None:
            raise ValueError("csv parser needs header or header_attribute")
        if lazy_quotes and ignore_quotes:
            raise ValueError("only one of 'ignore_quotes' or 'lazy_quotes' can be true")
        self.header = header
        self.header_attribute = header_attribute
        self.delimiter = delimiter
        self.parse_from = parse_from
        self.prefix = prefix
        self.types = types or {}
        self.lazy_quotes = lazy_quotes
        self.ignore_quotes = ignore_quotes

    # ---------------------------------------------------- quote machine

    def _csv_row(self, s: str) -> list[str] | None:
        """Single-row CSV state machine (quoted-row slow path). Returns
        the field list, or None on a strict-mode quote error — matching
        Go encoding/csv incl. LazyQuotes (parseutils ReadCSVRow joins
        embedded newlines back into the field, so a newline is just a
        character here)."""
        delim, lazy = self.delimiter, self.lazy_quotes
        fields: list[str] = []
        cur: list[str] = []
        i, n = 0, len(s)
        inq = False
        at_start = True
        while i < n:
            ch = s[i]
            if inq:
                if ch == '"':
                    if i + 1 < n and s[i + 1] == '"':
                        cur.append('"')
                        i += 2
                        continue
                    inq = False
                    i += 1
                    if i < n and s[i] != delim and s[i] != "\n":
                        if not lazy:
                            return None  # strict: junk after closing quote
                        cur.append('"')  # lazy: the quote was literal
                    continue
                cur.append(ch)
                i += 1
                continue
            if ch == '"':
                if at_start:
                    inq = True
                    at_start = False
                    i += 1
                    continue
                if lazy:
                    cur.append(ch)
                    i += 1
                    continue
                return None  # strict: bare quote in unquoted field
            if ch == delim:
                fields.append("".join(cur))
                cur = []
                at_start = True
                i += 1
                continue
            cur.append(ch)
            at_start = False
            i += 1
        if inq and not self.lazy_quotes:
            return None  # strict: unterminated quote
        fields.append("".join(cur))
        return fields

    def _row_fields(self, s: str) -> list[str] | None:
        if self.ignore_quotes or '"' not in s:
            return s.split(self.delimiter)
        return self._csv_row(s)

    # ---------------------------------------------------- static header

    def _split(self, t):
        return pc.split_pattern(_col(t, self.parse_from), self.delimiter)

    def _quoted_mask(self, src) -> np.ndarray:
        if self.ignore_quotes:
            return np.zeros(len(src), dtype=bool)
        return np.asarray(pc.fill_null(pc.match_substring(src, '"'), False))

    def _parse_static(self, t: pa.Table):
        """→ (cols {name: StringArray}, ok BooleanArray) with the quoted
        minority overwritten via replace_with_mask."""
        from .transformers import _safe_list_element

        src = _col(t, self.parse_from)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        H = len(self.header)
        parts = pc.split_pattern(src, self.delimiter)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        ok = pc.fill_null(pc.equal(pc.list_value_length(parts), H), False)
        base = [_safe_list_element(parts, i) for i in range(H)]
        qm = self._quoted_mask(src)
        if qm.any():
            idx = np.nonzero(qm)[0]
            parsed = [self._csv_row(s) for s in src.take(pa.array(idx)).to_pylist()]
            good = [p is not None and len(p) == H for p in parsed]
            mask = pa.array(qm)
            ok = pc.replace_with_mask(ok, mask, pa.array(good))
            for i in range(H):
                repl = pa.array(
                    [p[i] if g else None for p, g in zip(parsed, good)], type=pa.string()
                )
                base[i] = pc.replace_with_mask(pc.cast(base[i], pa.string()), mask, repl)
        return dict(zip(self.header, base)), ok

    def error_mask(self, t: pa.Table):
        src = _col(t, self.parse_from)
        if self.header is None:
            hdr = _col(t, self.header_attribute)
            rows = self._dynamic_rows(t, None)
            bad = pa.array([r is None for r in rows])
            return pc.and_(pc.and_(pc.is_valid(src), pc.is_valid(hdr)), bad)
        _, ok = self._parse_static(t)
        return pc.and_(pc.is_valid(src), pc.invert(ok))

    def transform(self, t: pa.Table) -> pa.Table:
        return self.transform_gated(t, None)

    # --------------------------------------------------- dynamic header

    def _dynamic_rows(self, t: pa.Table, gate):
        src = _col(t, self.parse_from).to_pylist()
        hdr = _col(t, self.header_attribute).to_pylist()
        g = None if gate is None else np.asarray(gate, dtype=bool)
        out = []
        for i, (s, h) in enumerate(zip(src, hdr)):
            if s is None or h is None or (g is not None and not g[i]):
                out.append(None)
                continue
            keys = h.split(self.delimiter)
            vals = self._row_fields(s)
            out.append(
                dict(zip(keys, vals))
                if vals is not None and len(keys) == len(vals)
                else None
            )
        return out

    def _transform_dynamic_header(self, t: pa.Table, gate) -> pa.Table:
        rows = self._dynamic_rows(t, gate)
        out = [None if r is None else json.dumps(r, sort_keys=True) for r in rows]
        return set_column(t, self.prefix + "__csv", pa.array(out, type=pa.string()))

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        if self.header is None:
            return self._transform_dynamic_header(t, gate)
        fields, ok = self._parse_static(t)
        if gate is not None:
            ok = pc.and_(ok, gate)
        cols = {}
        for name, arr in fields.items():
            if name in self.types:
                arr = _cast_typed(arr, self.types[name])
            cols[self.prefix + name] = arr
        return blend_columns(t, cols, None if pc.all(ok).as_py() else ok)


class SeverityParser(BatchOp):
    """Token → 24-level severity (severity_builder.go presets + custom
    mapping + `` overwrite_text``). Fully vectorized via a dictionary
    lookup (pc.index_in)."""

    def __init__(self, parse_from: str = "attributes.level",
                 mapping: dict[str, int] | None = None, default: int = 0,
                 to_number: str = "severity_number", to_text: str = "severity_text", **kw):
        super().__init__(**kw)
        m = dict(SEVERITY_ALIASES)
        self.ranges: list[tuple[int, int]] = []  # (hundreds-digit, severity)
        if mapping:
            for k, v in mapping.items():
                kl = str(k).lower()
                if re.fullmatch(r"\dxx", kl):
                    # "2xx"-style HTTP range token (severity_builder.go
                    # range aliases): any numeric 200-299 → v
                    self.ranges.append((int(kl[0]), v))
                else:
                    m[kl] = v
        self.keys = pa.array(list(m.keys()))
        self.vals = np.array(list(m.values()), dtype=np.int64)
        self.default = default
        self.parse_from = parse_from
        self.to_number = to_number
        self.to_text = to_text
        self.text_lut = pa.array([SEVERITY_TEXT[i] for i in range(25)])

    def transform(self, t: pa.Table) -> pa.Table:
        tok = pc.utf8_lower(_col(t, self.parse_from))
        idx = pc.index_in(tok, value_set=self.keys)
        idx_np = idx.to_numpy(zero_copy_only=False)
        miss = np.isnan(idx_np) if idx_np.dtype.kind == "f" else (idx_np < 0)
        ii = np.where(miss, 0, idx_np).astype(np.int64)
        nums = np.where(miss, self.default, self.vals[ii])
        if self.ranges:
            num_tok = _cast_typed(tok, "int64").to_numpy(zero_copy_only=False)
            hundreds = np.where(np.isnan(num_tok), -1, np.nan_to_num(num_tok) // 100)
            for digit, sev in self.ranges:
                nums = np.where(miss & (hundreds == digit), sev, nums)
        t = set_column(t, self.to_number, pa.array(nums.astype(np.int8)))
        # text via arrow take from the 25-entry LUT (no numpy-U column)
        t = set_column(t, self.to_text, pc.take(self.text_lut, pa.array(nums)))
        return t

    def error_mask(self, t: pa.Table):
        tok = pc.utf8_lower(_col(t, self.parse_from))
        idx = pc.index_in(tok, value_set=self.keys)
        return pc.and_(pc.is_valid(tok), pc.is_null(idx))


# Go reference-time components → strptime directives, scanned
# longest-match-first (operator/helper/time.go delegates to
# timeutils.StrptimeToGotime for the inverse mapping; we translate the
# Go layout grammar itself so both layout_type="gotime" and "strptime"
# reach one vectorized parser).
_GO_COMPONENTS = [
    ("2006", "%Y"), ("January", "%B"), ("Monday", "%A"),
    (".000000000", ".%f"), (".000000", ".%f"), (".000", ".%f"),
    (",000000000", ",%f"), (",000000", ",%f"), (",000", ",%f"),
    (".999999999", ".%f"), (".999999", ".%f"), (".999", ".%f"),
    ("Z07:00", "%z"), ("Z0700", "%z"), ("-07:00", "%z"), ("-0700", "%z"),
    ("15", "%H"), ("Jan", "%b"), ("Mon", "%a"), ("MST", "%Z"),
    ("PM", "%p"), ("pm", "%p"),
    ("01", "%m"), ("02", "%d"), ("03", "%I"), ("04", "%M"), ("05", "%S"),
    ("06", "%y"), ("-07", "%z"), ("_2", "%d"), ("2", "%d"), ("1", "%m"),
    ("3", "%I"),
]


def go_layout_to_strptime(layout: str) -> str:
    """Translate a Go time layout (reference time
    ``Mon Jan 2 15:04:05 MST 2006``) to a strptime format string."""
    out, i, n = [], 0, len(layout)
    while i < n:
        for go, sp in _GO_COMPONENTS:
            if layout.startswith(go, i):
                out.append(sp)
                i += len(go)
                break
        else:
            ch = layout[i]
            out.append("%%" if ch == "%" else ch)
            i += 1
    return "".join(out)


_GO_TO_STRPTIME = {
    "2006-01-02 15:04:05": "%Y-%m-%d %H:%M:%S",
    "2006-01-02T15:04:05Z07:00": "%Y-%m-%dT%H:%M:%S%z",
    "2006-01-02": "%Y-%m-%d",
    "Jan _2 15:04:05": "%b %d %H:%M:%S",
}


class TimeParser(BatchOp):
    """strptime / gotime / epoch time parse (operator/helper/time.go:
    layouts 19-107, location handling 131-195 via setLocation).

    - ``layout_type="gotime"``: the Go layout is translated with
      ``go_layout_to_strptime`` (full component grammar, not a lookup
      table); ``"strptime"`` layouts pass through.
    - ``location``: an IANA zone name; when the layout itself carries
      no zone (%z), naive timestamps are interpreted in that zone and
      stored as UTC instants (reference semantics — entry.Timestamp is
      an absolute instant). Without a location, naive parses are taken
      as UTC (the deterministic batch-engine stand-in for Go's
      time.Local). Ambiguous/nonexistent local times (DST folds) parse
      to null and fall to the operator's on_error policy.
    - zone-carrying layouts (%z): offset applied, result in UTC.
    - epoch layouts: s | ms | us | ns | s.ms (float seconds) — integer
      arithmetic on int64/float64 columns, no per-row parsing.

    Vectorization: %z/%f/location layouts parse via pandas
    ``to_datetime`` (C fast path with explicit format); everything else
    via ``pc.strptime``.
    """

    def __init__(self, parse_from: str, layout_type: str = "strptime",
                 layout: str = "%Y-%m-%d %H:%M:%S", to: str = "event_ts",
                 location: str | None = None, **kw):
        super().__init__(**kw)
        self.parse_from = parse_from
        self.layout_type = layout_type
        if layout_type == "gotime":
            self.layout = go_layout_to_strptime(layout)
        elif layout_type == "strptime":
            self.layout = _GO_TO_STRPTIME.get(layout, layout)
        else:
            self.layout = layout
        self.to = to
        self.location = location
        if location is not None:
            from zoneinfo import ZoneInfo

            ZoneInfo(location)  # validate eagerly, like setLocation

    def _parse_strings(self, c):
        fmt = self.layout
        has_z = "%z" in fmt
        if not has_z and "%f" not in fmt and not self.location:
            return pc.strptime(pc.cast(c, pa.string()), format=fmt, unit="us",
                               error_is_null=True)
        s = pd.Series(pc.cast(c, pa.string()).to_pandas())
        dt = pd.to_datetime(s, format=fmt, errors="coerce", utc=has_z)
        if has_z:
            dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
        elif self.location:
            dt = (
                dt.dt.tz_localize(self.location, ambiguous="NaT", nonexistent="NaT")
                .dt.tz_convert("UTC")
                .dt.tz_localize(None)
            )
        return pc.cast(pa.Array.from_pandas(dt), pa.timestamp("us"))

    def _parse(self, t: pa.Table):
        c = t[self.parse_from] if self.parse_from in t.column_names else pa.nulls(t.num_rows, pa.string())
        if self.layout_type in ("strptime", "gotime"):
            return self._parse_strings(c)
        mult = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[self.layout.split(".")[0]]
        f = pc.cast(c, pa.float64(), safe=False)
        us = pc.cast(pc.multiply(f, float(mult)), pa.int64(), safe=False)
        if self.layout == "ns":
            us = pc.divide(pc.cast(c, pa.int64(), safe=False), 1000)
        return pc.cast(us, pa.timestamp("us"))

    def error_mask(self, t: pa.Table):
        c = t[self.parse_from] if self.parse_from in t.column_names else pa.nulls(t.num_rows, pa.string())
        return pc.and_(pc.is_valid(c), pc.is_null(self._parse(t)))

    def transform(self, t: pa.Table) -> pa.Table:
        return set_column(t, self.to, self._parse(t))


class TraceParser(BatchOp):
    """Hex-decode trace/span ids to fixed-width binary
    (operator/helper/trace.go, parser/trace/parser.go:20)."""

    def __init__(self, trace_id_from: str | None = None, span_id_from: str | None = None,
                 flags_from: str | None = None, **kw):
        super().__init__(**kw)
        self.trace_id_from = trace_id_from
        self.span_id_from = span_id_from
        self.flags_from = flags_from

    @staticmethod
    def _hex(col, width):
        def d(s):
            try:
                b = bytes.fromhex(s)
                return b if len(b) == width else None
            except (ValueError, TypeError):
                return None

        return pa.array([None if s is None else d(s) for s in col.to_pylist()], type=pa.binary(width))

    def transform(self, t: pa.Table) -> pa.Table:
        if self.trace_id_from:
            t = set_column(t, "trace_id", self._hex(_col(t, self.trace_id_from), 16))
        if self.span_id_from:
            t = set_column(t, "span_id", self._hex(_col(t, self.span_id_from), 8))
        if self.flags_from:
            t = set_column(t, "trace_flags", _cast_typed(_col(t, self.flags_from), "int64"))
        return t


_URI_RE = (
    r"^(?:(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://)?"
    r"(?P<host>[^/:?#]*)(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?"
)


class UriParser(RegexParser):
    """URI → {scheme, host, port, path, query} (parser/uri/parser.go:16-46),
    via one vectorized regex, plus the reference's query-string → param
    map (``url.Values``, i.e. key → list of values): emitted as the
    JSON spill column ``<prefix>query_params`` (the engine's stable
    representation for dynamic keys, SURVEY.md §1.3). Only rows with a
    non-empty query string run the per-row parse."""

    def __init__(self, parse_from: str = "text", prefix: str = "attributes.uri.",
                 parse_query: bool = True, **kw):
        super().__init__(_URI_RE, parse_from=parse_from, prefix=prefix,
                         types={"port": "int64"}, **kw)
        self.parse_query = parse_query

    def transform_gated(self, t: pa.Table, gate) -> pa.Table:
        t = super().transform_gated(t, gate)
        qname = self.prefix + "query"
        if not self.parse_query or qname not in t.column_names:
            return t
        from urllib.parse import parse_qs

        q = t[qname]
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        nz = np.asarray(
            pc.fill_null(pc.greater(pc.utf8_length(pc.cast(q, pa.string())), 0), False)
        )
        out = [None] * t.num_rows
        if nz.any():
            idx = np.nonzero(nz)[0]
            for j, s in zip(idx, q.take(pa.array(idx)).to_pylist()):
                out[j] = json.dumps(
                    dict(sorted(parse_qs(s, keep_blank_values=True).items()))
                )
        return set_column(t, self.prefix + "query_params", pa.array(out, type=pa.string()))


_RFC3164 = (
    r"^<(?P<priority>\d{1,3})>(?P<timestamp>[A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) (?P<appname>[^\[:\s]+)(?:\[(?P<pid>\d+)\])?:?\s?(?P<message>.*)$"
)
_RFC5424 = (
    r"^<(?P<priority>\d{1,3})>(?P<version>\d) (?P<timestamp>\S+) (?P<hostname>\S+) "
    r"(?P<appname>\S+) (?P<procid>\S+) (?P<msgid>\S+) (?P<structured>(?:-|\[.*\])) ?(?P<message>.*)$"
)


class SyslogParser(BatchOp):
    """RFC3164 / RFC5424 syslog parse (parser/syslog/parser.go:86-172):
    regex extract + priority → facility/severity arithmetic, all
    vectorized."""

    def __init__(self, protocol: str = "rfc3164", parse_from: str = "text",
                 prefix: str = "attributes.", **kw):
        super().__init__(**kw)
        self.rx = _RFC3164 if protocol == "rfc3164" else _RFC5424
        self.groups = list(re.compile(self.rx).groupindex)
        self.parse_from = parse_from
        self.prefix = prefix
        # syslog severity (0-7) → our 24-level numbers, matching the
        # reference table (parser/syslog/parser.go severityMapping):
        # emerg=Fatal4(21) alert=Error3(19) crit=Error2(18) err=Error(17)
        # warning=Warn(13) notice=Info2(10) info=Info(9) debug=Debug(5)
        self.sev_map = np.array([21, 19, 18, 17, 13, 10, 9, 5], dtype=np.int64)

    def error_mask(self, t: pa.Table):
        src = _col(t, self.parse_from)
        ext = pc.extract_regex(src, self.rx)
        return pc.and_(pc.is_valid(src), pc.is_null(ext))

    def transform(self, t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(_col(t, self.parse_from), self.rx)
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        for g in self.groups:
            t = set_column(t, self.prefix + g, pc.struct_field(ext, g))
        pri = _cast_typed(pc.struct_field(ext, "priority"), "int64")
        pri_np = pri.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(pri_np) if pri_np.dtype.kind == "f" else np.ones(len(pri_np), bool)
        pri_i = np.where(valid, np.nan_to_num(pri_np), 0).astype(np.int64)
        t = set_column(t, self.prefix + "facility",
                       pa.array(np.where(valid, pri_i // 8, -1).astype(np.int64)))
        t = set_column(t, "severity_number",
                       pa.array(np.where(valid, self.sev_map[pri_i % 8], 0).astype(np.int8)))
        return t


class ScopeNameParser(BatchOp):
    """Move a field into the scope name column (parser/scope/parser.go:20)."""

    def __init__(self, parse_from: str, **kw):
        super().__init__(**kw)
        self.parse_from = parse_from

    def transform(self, t: pa.Table) -> pa.Table:
        return set_column(t, "scope_name", _col(t, self.parse_from))
