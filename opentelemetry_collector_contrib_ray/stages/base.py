"""BatchOp framework: gated, error-policied, fusable batch transforms.

Reference contract (stanza): every operator may carry an ``if``
expression (skip records where false) and an ``on_error`` policy
``send | send_quiet | drop | drop_quiet``
(/root/reference/pkg/stanza/operator/helper/transformer.go:78-123).
Here both are *vectorized*: ``if_expr`` becomes a boolean mask blended
per column with ``pc.if_else``; ``on_error: drop`` filters the errored
rows out of the batch; ``send`` keeps them with null outputs.

``Chain`` fuses consecutive stateless ops into one callable so a whole
processor chain runs as a single ``map_batches`` stage — one pass over
each Arrow block, no intermediate block materialization.
"""

from __future__ import annotations

from typing import Callable, Iterable

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_mask

ON_ERROR_MODES = ("send", "send_quiet", "drop", "drop_quiet")


def pa_from_pandas(df) -> pa.Table:
    """``pa.Table.from_pandas`` with the ``b'pandas'`` schema metadata
    stripped. pyarrow's ``Schema.__hash__`` raises ``unhashable type:
    'dict'`` on any schema carrying metadata, which defeats Ray's
    schema deduplication in hash-shuffle stages
    (ray/data/_internal/arrow_ops/transform_pyarrow.py:175-181) and
    floods the logs. Every stage that builds a table from pandas goes
    through this so blocks from different workers dedup to ONE hashable
    schema."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def arrow_out(fn):
    """Wrap a pandas-in UDF so a RAW pandas return converts to a
    metadata-free arrow block HERE instead of inside Ray. Ray's own
    pandas→arrow conversion attaches the ``b'pandas'`` schema metadata
    that makes the schema unhashable and defeats shuffle schema
    deduplication (see ``pa_from_pandas``), and a pandas BLOCK also
    pays a per-boundary conversion at every later arrow stage. Arrow
    returns pass through untouched, so the wrapper is safe on every
    map_groups / map_batches UDF regardless of what it returns."""
    import functools

    import pandas as pd

    @functools.wraps(fn)
    def wrapped(g):
        out = fn(g)
        return pa_from_pandas(out) if isinstance(out, pd.DataFrame) else out

    return wrapped


def set_column(t: pa.Table, name: str, arr) -> pa.Table:
    """Replace-or-append a column (chunk-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr)
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, arr)
    return t.append_column(name, arr)


def blend_columns(t: pa.Table, new_cols: dict[str, pa.Array], mask) -> pa.Table:
    """Write ``new_cols`` only where ``mask`` is true; elsewhere keep the
    old value (or null for brand-new columns)."""
    for name, arr in new_cols.items():
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if mask is None:
            t = set_column(t, name, arr)
            continue
        if name in t.column_names:
            old = t[name]
            if old.type != arr.type and not pa.types.is_null(old.type):
                try:
                    old = pc.cast(old, arr.type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    old = pa.nulls(t.num_rows, arr.type)
            elif pa.types.is_null(old.type):
                old = pa.nulls(t.num_rows, arr.type)
        else:
            old = pa.nulls(t.num_rows, arr.type)
        t = set_column(t, name, pc.if_else(mask, arr, old))
    return t


class BatchOp:
    """Base operator: subclasses implement ``transform(table) -> table``
    (unconditional) and optionally ``error_mask(table) -> BooleanArray``
    marking rows that failed to parse."""

    def __init__(self, if_expr: str | None = None, on_error: str = "send",
                 mark_errors: bool = False):
        """``mark_errors``: under ``send`` modes, OR this op's per-row
        error mask into a ``__parse_errors`` dead-letter column instead
        of dropping — the per-row error channel of SURVEY.md §7.4
        (reference logs-and-sends, transformer.go:97-107; here the
        errored rows stay addressable for a dead-letter sink filter)."""
        if on_error not in ON_ERROR_MODES:
            raise ValueError(f"on_error must be one of {ON_ERROR_MODES}")
        self.on_error = on_error
        self.mark_errors = mark_errors
        self._if_mask = compile_mask(if_expr) if if_expr else None

    # -- subclass surface --
    def transform(self, t: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError

    # -- call protocol --
    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return self.transform(t)
        if self._if_mask is None:
            return self._run(t)
        mask = self._if_mask(t)
        if pc.all(mask).as_py():
            return self._run(t)
        if not pc.any(mask).as_py():
            return t
        if hasattr(self, "transform_gated"):
            # vectorized gating: the op blends outputs under the mask
            # instead of splitting the batch (no copy, no re-sort)
            if self.on_error.startswith("drop"):
                em = self.error_mask(t)
                out = self.transform_gated(t, mask)
                if em is not None:
                    bad = pc.and_(pc.fill_null(em, False), mask)
                    if pc.any(bad).as_py():
                        out = out.filter(pc.invert(bad))
                return out
            out = self.transform_gated(t, mask)
            if self.mark_errors:
                em = self.error_mask(t)
                if em is not None:
                    out = _mark_dead_letter(out, pc.and_(pc.fill_null(em, False), mask))
            return out
        # generic fallback: split, transform selected rows, restore order
        idx = pa.array(range(t.num_rows), type=pa.int64())
        t2 = set_column(t, "__rowid", idx)
        sel = t2.filter(mask)
        rest = t2.filter(pc.invert(mask))
        out = self._run(sel.drop_columns(["__rowid"]))
        out = set_column(out, "__rowid", sel["__rowid"].combine_chunks())
        merged = pa.concat_tables([out, rest], promote_options="permissive")
        merged = merged.sort_by("__rowid")
        return merged.drop_columns(["__rowid"])

    def _run(self, t: pa.Table) -> pa.Table:
        if self.on_error.startswith("drop"):
            em = self.error_mask(t)
            out = self.transform(t)
            if em is not None and pc.any(em).as_py():
                out = out.filter(pc.invert(pc.fill_null(em, False)))
            return out
        if self.mark_errors:
            em = self.error_mask(t)
            out = self.transform(t)
            if em is not None:
                return _mark_dead_letter(out, em)
            return out
        return self.transform(t)

    def error_mask(self, t: pa.Table):
        return None


class Chain:
    """Fuse a sequence of BatchOps/callables into one batch function."""

    def __init__(self, ops: Iterable[Callable[[pa.Table], pa.Table]]):
        self.ops = list(ops)

    def __call__(self, t: pa.Table) -> pa.Table:
        for op in self.ops:
            t = op(t)
        return t


def apply_ops(ds, ops, batch_size: int = 32_768, **kwargs):
    """Attach a fused op chain to a Dataset as ONE map_batches stage."""
    return ds.map_batches(
        Chain(ops) if not callable(ops) else ops,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **kwargs,
    )


DEAD_LETTER_COL = "__parse_errors"


def _mark_dead_letter(t: pa.Table, em) -> pa.Table:
    em = pc.fill_null(em, False)
    if DEAD_LETTER_COL in t.column_names:
        em = pc.or_(pc.fill_null(t[DEAD_LETTER_COL], False), em)
        return t.set_column(
            t.column_names.index(DEAD_LETTER_COL), DEAD_LETTER_COL,
            em.combine_chunks() if isinstance(em, pa.ChunkedArray) else em,
        )
    return t.append_column(
        DEAD_LETTER_COL, em.combine_chunks() if isinstance(em, pa.ChunkedArray) else em
    )


def dead_letter_split(ds):
    """Fan a parsed stream into (clean, dead_letter) Datasets on the
    ``__parse_errors`` column — the dead-letter sink pattern."""

    def keep(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            if DEAD_LETTER_COL not in t.column_names:
                return t if not flag else t.slice(0, 0)
            m = pc.fill_null(t[DEAD_LETTER_COL], False)
            if not flag:
                m = pc.invert(m)
            return t.filter(m).drop_columns([DEAD_LETTER_COL])

        return fn

    return (
        ds.map_batches(keep(False), batch_format="pyarrow"),
        ds.map_batches(keep(True), batch_format="pyarrow"),
    )


def norm_concurrency(c):
    """int → autoscaling (1, c) actor pool; tuple passes through."""
    if c is None or isinstance(c, tuple):
        return c
    return (1, int(c))
