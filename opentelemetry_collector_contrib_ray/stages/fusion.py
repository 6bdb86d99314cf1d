"""Golden-record fusion (survivorship) for clustered/matched records.

The step AFTER entity resolution (stages/cluster.py near-dup clusters,
dedup.py keys): collapse each cluster into ONE master record by
per-field survivorship rules — the classic MDM "golden record" build
(public pattern; e.g. the rule taxonomy in open-source MDM/record-
linkage literature).  Rules:

- ``latest``   — value of the last record (by ``order_col``) whose
  field is non-null (recency wins, nulls never overwrite)
- ``earliest`` — first non-null by ``order_col``
- ``max`` / ``min`` — numeric extremum (null-skipping)
- ``longest``  — longest string; ties broken by recency.  Encoded as
  an integer composite ``length · 2^40 + order`` so the pick is one
  arg-max (requires ``order_col`` < 2^40 — row ids here, not epochs)

Scale shape: ONE cluster-hash exchange, then each partition fuses all
its clusters vectorized (one stable sort per rule family + groupby
first/last — pandas first/last skip nulls, which IS the non-null
survivorship semantics).  Output is O(clusters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .base import pa_from_pandas, arrow_out

_RULES = ("latest", "earliest", "max", "min", "longest")
_LONG_SHIFT = np.int64(1) << np.int64(40)


def golden_records(ds, cluster_col: str, order_col: str,
                   rules: dict[str, tuple[str, str]],
                   count_alias: str = "n_records",
                   num_partitions: int = 64):
    """Fuse each cluster to one row. ``rules`` maps output column →
    (source column, rule name)."""
    for out, (src, rule) in rules.items():
        if rule not in _RULES:
            raise ValueError(f"unknown survivorship rule {rule!r} for {out}")

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select([cluster_col]).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def fuse(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([cluster_col, order_col], kind="mergesort",
                          ignore_index=True)
        gb = g.groupby(cluster_col, sort=True)
        out = pd.DataFrame({count_alias: gb.size().astype("int64")})
        for name, (src, rule) in rules.items():
            if rule == "latest":
                out[name] = gb[src].last()      # null-skipping = non-null
            elif rule == "earliest":
                out[name] = gb[src].first()
            elif rule == "max":
                out[name] = gb[src].max()
            elif rule == "min":
                out[name] = gb[src].min()
            else:  # longest, tie -> latest (nulls sort first, never win)
                ln = g[src].str.len().fillna(-1).astype(np.int64)
                comp = ln * _LONG_SHIFT + g[order_col].astype(np.int64)
                s = g.assign(__c=comp).sort_values(
                    [cluster_col, "__c"], kind="mergesort")
                out[name] = s.drop_duplicates(
                    subset=[cluster_col], keep="last"
                ).set_index(cluster_col)[src]
        return pa_from_pandas(out.reset_index())

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(fuse), batch_format="pandas"))
