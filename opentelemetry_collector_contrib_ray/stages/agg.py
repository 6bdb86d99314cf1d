"""Skew-aware aggregation helpers: salted two-phase groupby.

The brief's skew requirement (SURVEY.md §7.3): Zipf-hot keys (e.g. a
few conversations holding ~10% of rows) make a naive
``groupby(key).sum()`` shuffle dump a hot key's entire traffic on one
reducer. The standard fix is salting: phase 1 groups on
``(key, salt)`` where ``salt = row_hash % S`` (spreading a hot key over
S reducers), phase 2 re-groups the S partial rows per key. For
count/sum-shaped aggregates the partial per-*block* pre-aggregation in
``map_batches`` already bounds shuffle volume to O(keys × blocks);
salting additionally bounds *reducer* load to O(keys × S) rows — use it
when the distinct-key count is small but per-key volume is huge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def salted_groupby_sum(ds, keys: list[str], value_col: str, salt: int = 16,
                       out_col: str | None = None):
    """Two-phase salted sum: groupby(keys + salt) → groupby(keys).

    Phase 0 additionally pre-aggregates inside each block, so the first
    shuffle moves at most (distinct keys × salt) rows per block.
    """
    out_col = out_col or f"sum_{value_col}"

    def pre(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pa.array((np.arange(n) % salt).astype(np.int32))
        proj = pa.table(
            {**{k: t[k] for k in keys}, "__salt": s, value_col: t[value_col]}
        )
        return proj.group_by(keys + ["__salt"]).aggregate([(value_col, "sum")]).rename_columns(
            keys + ["__salt", value_col]
        )

    phase1 = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    phase2 = phase1.groupby(keys + ["__salt"]).sum(value_col)
    final = phase2.groupby(keys).sum(f"sum({value_col})")

    def clean(t: pa.Table) -> pa.Table:
        names = [c if not c.startswith("sum(") else out_col for c in t.column_names]
        t = t.rename_columns(names)
        keep = [c for c in t.column_names if c != "__salt"]
        return t.select(keep)

    return final.map_batches(clean, batch_format="pyarrow")


def salted_count(ds, keys: list[str], salt: int = 16, out_col: str = "n"):
    """Salted two-phase row count per key tuple."""

    def pre(t: pa.Table) -> pa.Table:
        n = t.num_rows
        proj = pa.table(
            {**{k: t[k] for k in keys},
             "__salt": pa.array((np.arange(n) % salt).astype(np.int32))}
        )
        g = proj.group_by(keys + ["__salt"]).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["__salt", out_col])

    phase1 = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    phase2 = phase1.groupby(keys + ["__salt"]).sum(out_col)
    final = phase2.groupby(keys).sum(f"sum({out_col})")

    def clean(t: pa.Table) -> pa.Table:
        names = [c if not c.startswith("sum(") else out_col for c in t.column_names]
        t = t.rename_columns(names)
        return t.select([c for c in t.column_names if c != "__salt"])

    return final.map_batches(clean, batch_format="pyarrow")
