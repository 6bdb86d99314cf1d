"""Field transformers (stanza transformer operators), vectorized.

Parity (all under /root/reference/pkg/stanza/operator/transformer/):
add/transformer.go:27-51  move/transformer.go:22-33  copy:22-33
remove:21-42  retain:23-56  flatten  assignkeys:21-57  unquote:22-43
noop:19  filter/transformer.go:26-57 (+ drop_ratio config.go:37-67).

Field addressing = flat dotted column names; namespace ops (retain,
flatten, struct packing) treat a dotted prefix as the namespace, the
flat-row rendering of the reference's nested maps (SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_expr, compile_mask, _is_arr, _as_array
from .base import BatchOp, set_column


class Add(BatchOp):
    """Set a field to a static value or expression result
    (transformer/add/transformer.go:27-51)."""

    def __init__(self, field: str, value=None, expr: str | None = None, **kw):
        super().__init__(**kw)
        self.field = field
        self.value = value
        self.eval = compile_expr(expr) if expr else None

    def transform(self, t: pa.Table) -> pa.Table:
        v = self.eval(t) if self.eval else self.value
        return set_column(t, self.field, v if _is_arr(v) else _as_array(v, t.num_rows))


class Move(BatchOp):
    """Move (rename / re-root) a field (transformer/move/transformer.go:22-33)."""

    def __init__(self, from_field: str, to_field: str, **kw):
        super().__init__(**kw)
        self.from_field = from_field
        self.to_field = to_field

    def transform(self, t: pa.Table) -> pa.Table:
        if self.from_field not in t.column_names:
            return t
        t = set_column(t, self.to_field, t[self.from_field].combine_chunks())
        return t.drop_columns([self.from_field])


class Copy(BatchOp):
    """Duplicate a field (transformer/copy/transformer.go:22-33)."""

    def __init__(self, from_field: str, to_field: str, **kw):
        super().__init__(**kw)
        self.from_field = from_field
        self.to_field = to_field

    def transform(self, t: pa.Table) -> pa.Table:
        if self.from_field not in t.column_names:
            return t
        return set_column(t, self.to_field, t[self.from_field].combine_chunks())


class Remove(BatchOp):
    """Delete fields or a whole dotted namespace
    (transformer/remove/transformer.go:21-42)."""

    def __init__(self, fields: list[str] | str, **kw):
        super().__init__(**kw)
        self.fields = [fields] if isinstance(fields, str) else list(fields)

    def transform(self, t: pa.Table) -> pa.Table:
        drop = []
        for f in self.fields:
            if f in t.column_names:
                drop.append(f)
            drop.extend(c for c in t.column_names if c.startswith(f + "."))
        return t.drop_columns(sorted(set(drop))) if drop else t


class Retain(BatchOp):
    """Keep only the listed fields/namespaces
    (transformer/retain/transformer.go:23-56)."""

    def __init__(self, fields: list[str], **kw):
        super().__init__(**kw)
        self.fields = list(fields)

    def transform(self, t: pa.Table) -> pa.Table:
        keep = [
            c
            for c in t.column_names
            if any(c == f or c.startswith(f + ".") for f in self.fields)
        ]
        return t.select(keep)


class Unquote(BatchOp):
    """Strip one layer of matching quotes
    (transformer/unquote/transformer.go:22-43)."""

    def __init__(self, field: str, **kw):
        super().__init__(**kw)
        self.field = field

    def transform(self, t: pa.Table) -> pa.Table:
        if self.field not in t.column_names:
            return t
        c = pc.cast(t[self.field], pa.string())
        c = pc.replace_substring_regex(c, '^"(.*)"$', r"\1")
        c = pc.replace_substring_regex(c, "^'(.*)'$", r"\1")
        return set_column(t, self.field, c)


class Noop(BatchOp):
    """Pass-through (transformer/noop/transformer.go:19)."""

    def transform(self, t: pa.Table) -> pa.Table:
        return t


class AssignKeys(BatchOp):
    """Name the elements of a list field
    (transformer/assignkeys/transformer.go:21-57)."""

    def __init__(self, field: str, keys: list[str], prefix: str | None = None, **kw):
        super().__init__(**kw)
        self.field = field
        self.keys = keys
        self.prefix = prefix if prefix is not None else field + "."

    def transform(self, t: pa.Table) -> pa.Table:
        if self.field not in t.column_names:
            return t
        lst = t[self.field].combine_chunks()
        for i, k in enumerate(self.keys):
            t = set_column(t, self.prefix + k, _safe_list_element(lst, i))
        return t


def _safe_list_element(lst: pa.Array, i: int) -> pa.Array:
    """list_element that yields null (not error) for short/null lists."""
    offsets = np.asarray(lst.offsets)
    lengths = offsets[1:] - offsets[:-1]
    valid = lengths > i
    if lst.null_count:
        valid &= np.asarray(pc.is_valid(lst)).astype(bool)
    take_idx = np.where(valid, offsets[:-1] + i, -1).astype(np.int64)
    idx = pa.array(np.where(valid, take_idx, 0), type=pa.int64())
    vals = lst.flatten().take(idx) if len(lst.flatten()) else pa.nulls(len(lst))
    return pc.if_else(pa.array(valid), vals, pa.nulls(len(lst), vals.type))


class Filter(BatchOp):
    """DROP rows matching ``expr`` (note: reference filter drops matches,
    transformer/filter/transformer.go:26-57), with ``drop_ratio`` ∈ [0,1]
    as a *deterministic* hash-based keep decision (config.go:37-67 uses a
    random cutoff over [0,1000); we hash a key column for reproducibility
    across runs and parallelism levels). Without ``hash_col`` the dice
    hashes the ROW CONTENT (every column combined) — still independent
    of block boundaries, so the kept set is identical at any
    parallelism (batch-relative indices would not be)."""

    def __init__(self, expr: str, drop_ratio: float = 1.0, hash_col: str | None = None, **kw):
        super().__init__(**kw)
        self.mask = compile_mask(expr)
        self.drop_ratio = drop_ratio
        self.hash_col = hash_col

    def _dice_hash(self, t: pa.Table) -> np.ndarray:
        if self.hash_col and self.hash_col in t.column_names:
            return _hash_u64(t[self.hash_col])
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for name in t.column_names:
                try:
                    h = h * np.uint64(1000003) + _hash_u64(t[name])
                except (TypeError, ValueError, pa.ArrowInvalid):
                    continue  # unhashable column type (nested) — skip
        return h

    def transform(self, t: pa.Table) -> pa.Table:
        m = self.mask(t)  # True = candidate for drop
        if self.drop_ratio < 1.0:
            h = self._dice_hash(t)
            cutoff = np.uint64(int(self.drop_ratio * 1000))
            dice = pa.array((h % np.uint64(1000)) < cutoff)
            m = pc.and_(m, dice)
        return t.filter(pc.invert(m))


def _hash_u64(col) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of an arrow column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        import pandas as pd

        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False).astype("U"))
        return h.astype(np.uint64)
    x = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


class PackStruct(BatchOp):
    """Materialize a dotted namespace (``attributes.*``) as one nested
    struct column — the edge converter back to the reference's nested
    shape (adapter/converter.go:249-283)."""

    def __init__(self, prefix: str, drop_flat: bool = True, **kw):
        super().__init__(**kw)
        self.prefix = prefix.rstrip(".") + "."
        self.out = prefix.rstrip(".")
        self.drop_flat = drop_flat

    def transform(self, t: pa.Table) -> pa.Table:
        cols = [c for c in t.column_names if c.startswith(self.prefix)]
        if not cols:
            return t
        arrays = [t[c].combine_chunks() for c in cols]
        names = [c[len(self.prefix):] for c in cols]
        struct = pa.StructArray.from_arrays(arrays, names)
        if self.drop_flat:
            t = t.drop_columns(cols)
        return set_column(t, self.out, struct)


class FlattenStruct(BatchOp):
    """Splice a struct column's fields up into dotted flat columns
    (transformer/flatten/transformer.go)."""

    def __init__(self, field: str, drop: bool = True, **kw):
        super().__init__(**kw)
        self.field = field
        self.drop = drop

    def transform(self, t: pa.Table) -> pa.Table:
        if self.field not in t.column_names:
            return t
        col = t[self.field].combine_chunks()
        if not pa.types.is_struct(col.type):
            return t
        for f in col.type:
            t = set_column(t, f"{self.field}.{f.name}", pc.struct_field(col, f.name))
        return t.drop_columns([self.field]) if self.drop else t


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", val_col: str = "value",
         var_names: list[str] | None = None):
    """Wide → long unpivot (the inverse of the fixed-column pivot):
    each value column becomes ``len(value_cols)`` long rows per input
    row, labeled by ``var_names`` (default: the column names). Pure
    per-block columnar fan-out — ZERO exchange, streaming, row count
    grows by exactly the column factor. Value columns are cast to a
    common int64 (the pivot counts/sums this inverts are integral)."""
    names = var_names or value_cols

    def fn(t: pa.Table) -> pa.Table:
        outs = []
        for c, nm in zip(value_cols, names):
            outs.append(pa.table({
                **{k: t[k] for k in id_cols},
                var_col: pa.array([nm] * t.num_rows, pa.string()),
                val_col: pc.cast(t[c], pa.int64())}))
        return pa.concat_tables(outs)

    return ds.map_batches(fn, batch_format="pyarrow")
