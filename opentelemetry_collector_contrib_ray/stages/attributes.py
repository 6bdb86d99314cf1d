"""Attributes/resource processor — the 7-action attraction engine.

Parity: /root/reference/internal/coreinternal/attraction/attraction.go:
104-137 (actions: insert, update, upsert, delete, hash (SHA1), extract
(regex named groups → new attrs), convert (type cast)), applied to log
records by processor/attributesprocessor/attributes_log.go:34-61 and to
resources by processor/resourceprocessor. Vectorized column ops over
the flat dotted-namespace model; optional ``if_expr`` gate plays the
include/exclude matcher role.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_expr, _is_arr, _as_array
from .base import BatchOp, blend_columns, set_column


class AttributesProcessor(BatchOp):
    """``actions``: list of dicts, executed in order:

    {"action": "insert"|"update"|"upsert", "key": col, "value": v | "from_attribute": col}
    {"action": "delete", "key": col}
    {"action": "hash", "key": col}                       # SHA1 hex
    {"action": "extract", "key": col, "pattern": regex}  # named groups → cols
    {"action": "convert", "key": col, "converted_type": "int"|"double"|"string"}
    """

    _TYPES = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}

    def __init__(self, actions: list[dict], prefix: str = "attributes.", **kw):
        super().__init__(**kw)
        self.actions = actions
        self.prefix = prefix
        for a in actions:
            if "value_expr" in a:
                a["_eval"] = compile_expr(a["value_expr"])

    def _key(self, k: str) -> str:
        return k if "." in k else self.prefix + k

    def transform(self, t: pa.Table) -> pa.Table:
        for a in self.actions:
            t = getattr(self, "_do_" + a["action"])(t, a)
        return t

    def _value(self, t, a):
        if "_eval" in a:
            v = a["_eval"](t)
            return v if _is_arr(v) else _as_array(v, t.num_rows)
        if "from_attribute" in a:
            src = self._key(a["from_attribute"])
            return t[src].combine_chunks() if src in t.column_names else pa.nulls(t.num_rows)
        return _as_array(a.get("value"), t.num_rows)

    def _do_insert(self, t, a):
        k = self._key(a["key"])
        if k in t.column_names:
            # value-level insert: fill nulls only (attraction.go insert)
            v = self._value(t, a)
            merged = pc.coalesce(t[k], pc.cast(v, t[k].type, safe=False))
            return set_column(t, k, merged.combine_chunks())
        return set_column(t, k, self._value(t, a))

    def _do_update(self, t, a):
        k = self._key(a["key"])
        if k not in t.column_names:
            return t
        return set_column(t, k, self._value(t, a))

    def _do_upsert(self, t, a):
        return set_column(t, self._key(a["key"]), self._value(t, a))

    def _do_delete(self, t, a):
        k = self._key(a["key"])
        return t.drop_columns([k]) if k in t.column_names else t

    def _do_hash(self, t, a):
        k = self._key(a["key"])
        if k not in t.column_names:
            return t
        vals = pc.cast(t[k], pa.string()).to_pylist()
        hashed = [
            None if v is None else hashlib.sha1(v.encode()).hexdigest() for v in vals
        ]
        return set_column(t, k, pa.array(hashed, type=pa.string()))

    def _do_extract(self, t, a):
        k = self._key(a["key"])
        if k not in t.column_names:
            return t
        ext = pc.extract_regex(pc.cast(t[k], pa.string()), a["pattern"])
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        ok = pc.is_valid(ext)
        cols = {
            self.prefix + f.name: pc.struct_field(ext, f.name) for f in ext.type
        }
        return blend_columns(t, cols, None if pc.all(ok).as_py() else ok)

    def _do_convert(self, t, a):
        k = self._key(a["key"])
        if k not in t.column_names:
            return t
        target = self._TYPES[a["converted_type"]]
        try:
            return set_column(t, k, pc.cast(t[k], target, safe=False).combine_chunks())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return t
