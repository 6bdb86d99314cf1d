"""Redaction processor — allowlist keys, mask blocked value patterns.

Parity: /root/reference/processor/redactionprocessor — delete
attributes not on ``allowed_keys``, mask attribute values matching
``blocked_values`` regexes, and attach summary attributes. Vectorized:
one ``pc.replace_substring_regex`` per blocked pattern per namespace
column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import BatchOp, set_column


class Redactor(BatchOp):
    def __init__(self, namespace: str = "attributes",
                 allowed_keys: list[str] | None = None,
                 blocked_values: list[str] | None = None,
                 mask: str = "****", summary: bool = True, **kw):
        super().__init__(**kw)
        self.ns = namespace.rstrip(".") + "."
        self.allowed = set(allowed_keys) if allowed_keys is not None else None
        self.blocked = blocked_values or []
        self.mask = mask
        self.summary = summary

    def transform(self, t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if c.startswith(self.ns)]
        dropped = 0
        if self.allowed is not None:
            to_drop = [c for c in cols if c[len(self.ns):] not in self.allowed]
            dropped = len(to_drop)
            if to_drop:
                t = t.drop_columns(to_drop)
                cols = [c for c in cols if c not in to_drop]
        masked_any = None
        for c in cols:
            col = t[c]
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                continue
            for pat in self.blocked:
                hit = pc.fill_null(pc.match_substring_regex(col, pat), False)
                col = pc.if_else(hit, pc.replace_substring_regex(col, pat, self.mask), col)
                masked_any = hit if masked_any is None else pc.or_(masked_any, hit)
            t = set_column(t, c, col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        if self.summary:
            n = t.num_rows
            t = set_column(t, "redaction.masked",
                           pc.cast(masked_any, pa.int8()) if masked_any is not None
                           else pa.array([0] * n, type=pa.int8()))
            t = set_column(t, "redaction.allowed_keys_dropped",
                           pa.array([dropped] * n, type=pa.int32()))
        return t
