"""OTTL converters as vectorized Arrow batch functions.

Parity target: /root/reference/pkg/ottl/ottlfuncs/functions.go:35-83
(Base64Decode, Concat, ConvertCase, Double, Duration, ExtractPatterns,
FNV, Hour(s), Int, Is*, Len, Log, Micro/Milli/Nano/Seconds, Minutes,
Now, ParseCSV, ParseJSON, ParseKeyValue, ParseXML, SHA1, SHA256,
SpanID, Split, String, Substring, Time, TraceID, TruncateTime, Unix*,
UUID). Hot-path functions use ``pyarrow.compute`` kernels; the
inherently row-wise tail (XML, hashes) loops over a materialized numpy
array once per batch — never per record through the expression tree.

Convention: ``fn(table, *args)`` where args are already evaluated to
Arrow arrays or python scalars; return an Arrow array (length =
table.num_rows) or a scalar.
"""

from __future__ import annotations

import base64
import hashlib
import json
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import register_function, _is_arr, _as_array


def _arr(t: pa.Table, v: Any) -> pa.Array | pa.ChunkedArray:
    return v if _is_arr(v) else _as_array(v, t.num_rows)


def _str_arr(t, v):
    a = _arr(t, v)
    if not pa.types.is_string(a.type) and not pa.types.is_large_string(a.type):
        a = pc.cast(a, pa.string())
    return a


def _rowwise(t, v, fn, out_type=None):
    a = _arr(t, v)
    vals = a.to_pylist()
    return pa.array([None if x is None else fn(x) for x in vals], type=out_type)


# --- type conversion -------------------------------------------------------

def conv_double(t, v):
    return pc.cast(_arr(t, v), pa.float64()) if _is_arr(v) else float(v)


def conv_int(t, v):
    a = _arr(t, v)
    if pa.types.is_string(a.type):
        # reference Int() truncates float-looking strings
        f = pc.cast(a, pa.float64())
        return pc.cast(pc.trunc(f), pa.int64())
    if pa.types.is_floating(a.type):
        return pc.cast(pc.trunc(a), pa.int64())
    return pc.cast(a, pa.int64())


def conv_string(t, v):
    # list VALUES (a `[1,2,3]` literal or a list-typed column) render
    # compactly like the reference's String() (func_string.go via
    # StringLikeGetter: JSON-style `[1,2,3]`)
    if isinstance(v, list):
        return json.dumps(v, separators=(",", ":"))
    if _is_arr(v) and (pa.types.is_list(v.type) or pa.types.is_large_list(v.type)
                       or pa.types.is_fixed_size_list(v.type)):
        return pa.array([None if x is None else json.dumps(x, separators=(",", ":"))
                         for x in v.to_pylist()], type=pa.string())
    return pc.cast(_arr(t, v), pa.string())


def _is_type(pred):
    def fn(t, v):
        a = _arr(t, v)
        return pa.array([pred(a.type)] * t.num_rows)

    return fn


# --- strings ---------------------------------------------------------------

def _prefix_literal(pattern: str) -> str | None:
    """If ``pattern`` is ``^`` + a pure literal (escapes of punctuation
    allowed, no metacharacters / classes / anchors), return the literal;
    else None. Lets IsMatch('^literal') run as ``starts_with`` — ~4×
    cheaper than the RE2 scan on string-heavy batches."""
    if not pattern.startswith("^") or pattern.endswith("$"):
        return None
    body = pattern[1:]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            if i + 1 >= len(body) or body[i + 1].isalnum():
                return None  # \d, \w, \1 … — a class, not an escape
            out.append(body[i + 1])
            i += 2
            continue
        if c in ".*+?()[]{}|^$":
            return None
        out.append(c)
        i += 1
    return "".join(out)


def conv_is_match(t, v, pattern):
    lit = _prefix_literal(pattern)
    if lit is not None:
        return pc.starts_with(_str_arr(t, v), lit)
    return pc.match_substring_regex(_str_arr(t, v), pattern)


def conv_concat(t, first, *rest):
    """Both reference argument orders: ``Concat([vals...], delim)``
    (func_concat.go) and the legacy ``Concat(delim, v1, v2, ...)``.
    A list LITERAL of expressions compiles to a per-row arrow list
    array — joined within each row via ``pc.binary_join``."""
    if _is_arr(first) and pa.types.is_list(first.type):
        delim = rest[0] if rest else ""
        lst = first.combine_chunks() if isinstance(first, pa.ChunkedArray) else first
        if not pa.types.is_string(lst.type.value_type):
            lst = pc.cast(lst, pa.list_(pa.string()))
        return pc.binary_join(lst, delim)
    if isinstance(first, list):
        delim, parts = (rest[0] if rest else ""), first
    else:
        delim, parts = first, list(rest)
    arrs = [_str_arr(t, p) for p in parts]
    return pc.binary_join_element_wise(*arrs, delim)


def conv_convert_case(t, v, case):
    a = _str_arr(t, v)
    if case == "upper":
        return pc.utf8_upper(a)
    if case == "lower":
        return pc.utf8_lower(a)
    if case == "snake":
        import re as _re

        rx = _re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
        return _rowwise(t, a, lambda s: rx.sub("_", s).lower(), pa.string())
    if case == "camel":
        return _rowwise(
            t, a, lambda s: "".join(w.capitalize() for w in s.split("_")), pa.string()
        )
    raise ValueError(f"unknown case {case!r}")


def conv_len(t, v):
    a = _arr(t, v)
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        return pc.utf8_length(a)
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        return pc.list_value_length(a)
    if pa.types.is_binary(a.type):
        return pc.binary_length(a)
    return pa.array([1] * t.num_rows)


def conv_substring(t, v, start, length):
    return pc.utf8_slice_codeunits(_str_arr(t, v), int(start), int(start) + int(length))


def conv_split(t, v, delim):
    return pc.split_pattern(_str_arr(t, v), delim)


def conv_extract_patterns(t, v, pattern):
    return pc.extract_regex(_str_arr(t, v), pattern)


def conv_base64decode(t, v):
    return _rowwise(t, _str_arr(t, v), lambda s: base64.b64decode(s).decode("utf-8", "replace"), pa.string())


def _hexdigest(algo):
    def fn(t, v):
        return _rowwise(
            t, _str_arr(t, v), lambda s: hashlib.new(algo, s.encode()).hexdigest(), pa.string()
        )

    return fn


def conv_fnv(t, v):
    """FNV-1a 64-bit over the UTF-8 bytes (matches Go hash/fnv:
    offset 0xCBF29CE484222325, prime 0x100000001B3)."""
    a = _str_arr(t, v)
    vals = a.to_pylist()
    out = np.empty(len(vals), dtype=np.int64)
    for i, s in enumerate(vals):
        h = 0xCBF29CE484222325
        if s is not None:
            for b in s.encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = np.int64(np.uint64(h))
    return pa.array(out)


# --- parse helpers ---------------------------------------------------------

def conv_parse_json(t, v):
    from ..stages.parsers import _loads

    def p(s):
        try:
            return _loads(s)
        except (ValueError, TypeError):
            return None

    a = _str_arr(t, v)
    return pa.array([p(x) for x in a.to_pylist()])


def conv_parse_csv(t, v, header, delimiter=","):
    cols = header.split(delimiter) if isinstance(header, str) else list(header)
    a = _str_arr(t, v)

    def p(s):
        parts = s.split(delimiter)
        return {k: parts[i] if i < len(parts) else None for i, k in enumerate(cols)}

    return pa.array([None if s is None else p(s) for s in a.to_pylist()])


def conv_parse_key_value(t, v, delimiter="=", pair_delimiter=" "):
    a = _str_arr(t, v)

    def p(s):
        out = {}
        for pair in s.split(pair_delimiter):
            if delimiter in pair:
                k, _, val = pair.partition(delimiter)
                if k:
                    out[k] = val
        return out or None

    return pa.array([None if s is None else p(s) for s in a.to_pylist()])


def conv_parse_xml(t, v):
    import xml.etree.ElementTree as ET

    def p(s):
        try:
            root = ET.fromstring(s)
        except ET.ParseError:
            return None
        return {"tag": root.tag, "attributes": dict(root.attrib), "text": root.text or ""}

    a = _str_arr(t, v)
    return pa.array([None if s is None else p(s) for s in a.to_pylist()])


# --- time ------------------------------------------------------------------

def conv_time(t, v, layout):
    """strptime parse (Go layouts are translated by the time parser op;
    here we accept C89 format strings directly)."""
    return pc.strptime(_str_arr(t, v), format=layout, unit="us", error_is_null=True)


def conv_truncate_time(t, v, unit):
    unit_map = {"1h": "hour", "1m": "minute", "1s": "second", "1d": "day",
                "hour": "hour", "minute": "minute", "second": "second", "day": "day"}
    return pc.floor_temporal(_arr(t, v), unit=unit_map.get(unit, unit))


def conv_hour(t, v):
    return pc.hour(_arr(t, v))


def _dur_seconds(s: str) -> float:
    import re as _re

    total, m = 0.0, _re.findall(r"([\d.]+)(h|ms|us|ns|m|s)", s)
    mult = {"h": 3600, "m": 60, "s": 1, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}
    for num, u in m:
        total += float(num) * mult[u]
    return total


def conv_duration(t, v):
    return _rowwise(t, _str_arr(t, v), _dur_seconds, pa.float64()) if _is_arr(v) else _dur_seconds(v)


def _ts_to_int(a, factor_us: float):
    i = pc.cast(a, pa.int64())  # timestamp[us] → µs since epoch
    if factor_us == 1:
        return i
    return pc.cast(pc.multiply(pc.cast(i, pa.float64()), factor_us), pa.int64())


def conv_unix_seconds(t, v):
    return pc.cast(pc.divide(pc.cast(pc.cast(_arr(t, v), pa.int64()), pa.float64()), 1e6), pa.int64())


def conv_unix_micro(t, v):
    return pc.cast(_arr(t, v), pa.int64())


def conv_unix_milli(t, v):
    return pc.cast(pc.divide(pc.cast(_arr(t, v), pa.int64()), 1000), pa.int64())


def conv_unix_nano(t, v):
    return pc.multiply(pc.cast(_arr(t, v), pa.int64()), 1000)


def conv_unix(t, v):
    """seconds → timestamp[us] (reference Unix() builds a time from epoch)."""
    a = _arr(t, v)
    return pc.cast(pc.cast(pc.multiply(pc.cast(a, pa.float64()), 1e6), pa.int64()), pa.timestamp("us"))


def _dur_conv(factor):
    def fn(t, v):
        d = conv_duration(t, v)
        if _is_arr(d):
            return pc.multiply(d, factor)
        return d * factor

    return fn


def conv_now(t):
    return np.datetime64("now", "us")


def conv_uuid(t):
    import uuid

    return pa.array([str(uuid.uuid4()) for _ in range(t.num_rows)])


def _hex_to_bin(width):
    def fn(t, v):
        return _rowwise(t, _str_arr(t, v), lambda s: bytes.fromhex(s), pa.binary(width))

    return fn


def conv_log(t, v):
    return pc.ln(pc.cast(_arr(t, v), pa.float64()))


_REGISTRY = {
    "Base64Decode": conv_base64decode,
    "Concat": conv_concat,
    "ConvertCase": conv_convert_case,
    "Double": conv_double,
    "Duration": conv_duration,
    "ExtractPatterns": conv_extract_patterns,
    "FNV": conv_fnv,
    "Hour": conv_hour,
    "Hours": _dur_conv(1 / 3600),
    "Int": conv_int,
    "IsBool": _is_type(pa.types.is_boolean),
    "IsDouble": _is_type(pa.types.is_floating),
    "IsInt": _is_type(pa.types.is_integer),
    "IsList": _is_type(lambda ty: pa.types.is_list(ty) or pa.types.is_large_list(ty)),
    "IsMap": _is_type(lambda ty: pa.types.is_struct(ty) or pa.types.is_map(ty)),
    "IsMatch": conv_is_match,
    "IsString": _is_type(lambda ty: pa.types.is_string(ty) or pa.types.is_large_string(ty)),
    "Len": conv_len,
    "Log": conv_log,
    "Microseconds": _dur_conv(1e6),
    "Milliseconds": _dur_conv(1e3),
    "Minutes": _dur_conv(1 / 60),
    "Nanoseconds": _dur_conv(1e9),
    "Now": conv_now,
    "ParseCSV": conv_parse_csv,
    "ParseJSON": conv_parse_json,
    "ParseKeyValue": conv_parse_key_value,
    "ParseXML": conv_parse_xml,
    "SHA1": _hexdigest("sha1"),
    "SHA256": _hexdigest("sha256"),
    "Seconds": _dur_conv(1.0),
    "SpanID": _hex_to_bin(8),
    "Split": conv_split,
    "String": conv_string,
    "Substring": conv_substring,
    "Time": conv_time,
    "TraceID": _hex_to_bin(16),
    "TruncateTime": conv_truncate_time,
    "Unix": conv_unix,
    "UnixMicro": conv_unix_micro,
    "UnixMilli": conv_unix_milli,
    "UnixNano": conv_unix_nano,
    "UnixSeconds": conv_unix_seconds,
    "UUID": conv_uuid,
}

for _name, _fn in _REGISTRY.items():
    register_function(_name, _fn)
