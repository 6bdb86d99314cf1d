"""Count connector — declarative grouped counting, partial + final.

Parity: /root/reference/connector/countconnector/connector.go:165-201,
counter.go:38-108, config.go:17-52. Each metric def = OR'd OTTL
``conditions`` + projected ``attributes`` (key + optional
default_value); rows missing a required attribute with no default are
skipped (counter.go:50-53); the default metric counts everything
(``log.record.count``, config.go:17-20).

Scale design (SURVEY.md §7.2 step 7): the reference emits per-batch
partial delta sums and lets downstream accumulate — here the partial
aggregate runs INSIDE ``map_batches`` (Arrow ``Table.group_by`` per
block), so the global ``groupby().sum()`` shuffle only moves one row
per (metric, attr-tuple) per block, not one per record. Attr tuples
are carried as one canonical JSON string column so heterogeneous
metric defs share a single partial table; hot keys therefore cost
O(#blocks), no salting needed at this stage.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import compile_mask


@dataclass
class MetricDef:
    name: str
    conditions: list[str] = field(default_factory=list)  # OR'd, empty = all
    attributes: list[tuple[str, object]] = field(default_factory=list)
    # attributes: (column, default_value); default None = required → skip


DEFAULT_METRIC = MetricDef(name="log.record.count")

# printable ASCII minus '"' and '\': values matching this need no JSON
# escaping, so the canonical encoding is a pure kernel concatenation
_JSON_SAFE_RE = r'^[\x20\x21\x23-\x5B\x5D-\x7E]*$'


def _canonical_attrs_json(grouped: pa.Table, names: list[str]) -> pa.Array:
    """Canonical attrs encoding, byte-identical to
    ``json.dumps({...}, sort_keys=True)`` — vectorized: one
    ``binary_join_element_wise`` over key-sorted pieces for values that
    need no escaping (the overwhelming case for attribute strings);
    rows with quotes/backslashes/control/non-ASCII characters fall back
    to per-row ``json.dumps`` via ``replace_with_mask``. Input columns
    are null-free strings (defaults filled / required-missing rows
    dropped upstream)."""
    order = sorted(names)
    vals = [grouped[n].combine_chunks() if isinstance(grouped[n], pa.ChunkedArray)
            else grouped[n] for n in order]
    safe = None
    for v in vals:
        s = pc.match_substring_regex(v, _JSON_SAFE_RE)
        safe = s if safe is None else pc.and_(safe, s)
    pieces: list = []
    for j, n in enumerate(order):
        pieces.append(("{" if j == 0 else '", ') + json.dumps(n) + ': "')
        pieces.append(vals[j])
    pieces.append('"}')
    joined = pc.binary_join_element_wise(*pieces, "")
    if not pc.min(safe).as_py():  # min of bools = all()
        unsafe = pc.invert(safe)
        idx = pc.indices_nonzero(unsafe)
        rows = [{n: vals[j][int(i)].as_py() for j, n in enumerate(order)}
                for i in idx.to_pylist()]
        repl = pa.array([json.dumps(r, sort_keys=True) for r in rows],
                        type=pa.string())
        joined = pc.replace_with_mask(joined, unsafe, repl)
    return joined


class CountConnector:
    def __init__(self, metrics: list[MetricDef] | None = None):
        self.metrics = metrics or [DEFAULT_METRIC]
        self._masks = {
            m.name: [compile_mask(c) for c in m.conditions] for m in self.metrics
        }

    # ---- partial (inside map_batches) ----------------------------------

    def partial(self, t: pa.Table) -> pa.Table:
        """One batch → partial count rows (metric, attrs, count)."""
        out_metric, out_attrs, out_count = [], [], []
        for m in self.metrics:
            sel = t
            masks = self._masks[m.name]
            if masks:
                acc = masks[0](t)
                for mk in masks[1:]:
                    acc = pc.or_(acc, mk(t))
                sel = t.filter(acc)
            if sel.num_rows == 0:
                continue
            if not m.attributes:
                out_metric.append(m.name)
                out_attrs.append("{}")
                out_count.append(sel.num_rows)
                continue
            cols, names = [], []
            keep = None
            for key, dflt in m.attributes:
                c = (
                    sel[key]
                    if key in sel.column_names
                    else pa.nulls(sel.num_rows, pa.string())
                )
                c = pc.cast(c, pa.string(), safe=False)
                if dflt is None:
                    v = pc.is_valid(c)
                    keep = v if keep is None else pc.and_(keep, v)
                else:
                    c = pc.fill_null(c, str(dflt))
                cols.append(c)
                names.append(key)
            proj = pa.table(dict(zip(names, cols)))
            if keep is not None:
                proj = proj.filter(keep)
            if proj.num_rows == 0:
                continue
            grouped = proj.group_by(names).aggregate([([], "count_all")])
            attrs = _canonical_attrs_json(grouped, names)
            out_metric.extend([m.name] * grouped.num_rows)
            out_attrs.extend(attrs.to_pylist())
            out_count.extend(grouped["count_all"].to_pylist())
        return pa.table(
            {
                "metric": pa.array(out_metric, type=pa.string()),
                "attrs": pa.array(out_attrs, type=pa.string()),
                "count": pa.array(out_count, type=pa.int64()),
            }
        )

    def partial_by_sink(self, t: pa.Table, bits, sink_bits):
        """Per-batch partials for ALL sinks in ONE grouped pass per
        metric: sink membership becomes int64 indicator columns summed
        inside the same ``group_by``, so the metric masks, the attrs
        projection, the hash aggregation and the canonical-JSON encode
        each run once per batch instead of once per sink (the routing
        fan-out means sinks overlap; per-sink subsets would redo the
        same work k times). Returns ``[(sink, metrics, attrs, counts)]``
        with exactly the totals of ``partial(per-sink subset)``."""
        import numpy as np

        ind = {s: (bits & b) != 0 for s, b in sink_bits}
        res: dict[str, tuple[list, list, list]] = {
            s: ([], [], []) for s, _ in sink_bits}
        for m in self.metrics:
            sel_mask = None
            masks = self._masks[m.name]
            if masks:
                acc = masks[0](t)
                for mk in masks[1:]:
                    acc = pc.or_(acc, mk(t))
                sel_mask = np.asarray(pc.fill_null(acc, False), dtype=bool)
            if not m.attributes:
                for s, iv in ind.items():
                    c = int((iv & sel_mask).sum()) if sel_mask is not None \
                        else int(iv.sum())
                    if c:
                        res[s][0].append(m.name)
                        res[s][1].append("{}")
                        res[s][2].append(c)
                continue
            sel = t.filter(pa.array(sel_mask)) if sel_mask is not None else t
            if sel.num_rows == 0:
                continue
            cols, names = [], []
            keep = None
            for key, dflt in m.attributes:
                c = (
                    sel[key]
                    if key in sel.column_names
                    else pa.nulls(sel.num_rows, pa.string())
                )
                c = pc.cast(c, pa.string(), safe=False)
                if dflt is None:
                    v = pc.is_valid(c)
                    keep = v if keep is None else pc.and_(keep, v)
                else:
                    c = pc.fill_null(c, str(dflt))
                cols.append(c)
                names.append(key)
            data = dict(zip(names, cols))
            sink_cols = []
            for i, (s, _) in enumerate(sink_bits):
                iv = ind[s]
                if sel_mask is not None:
                    iv = iv[sel_mask]
                col = f"__s{i}"
                data[col] = pa.array(iv.astype(np.int64))
                sink_cols.append(col)
            proj = pa.table(data)
            if keep is not None:
                proj = proj.filter(keep)
            if proj.num_rows == 0:
                continue
            grouped = proj.group_by(names).aggregate(
                [(c, "sum") for c in sink_cols])
            attrs = _canonical_attrs_json(grouped, names).to_pylist()
            for i, (s, _) in enumerate(sink_bits):
                cnt = grouped[f"__s{i}_sum"].to_numpy(zero_copy_only=False)
                nz = np.nonzero(cnt > 0)[0]
                if len(nz) == 0:
                    continue
                res[s][0].extend([m.name] * len(nz))
                res[s][1].extend(attrs[j] for j in nz)
                res[s][2].extend(int(cnt[j]) for j in nz)
        return [(s, mm, aa, cc) for s, (mm, aa, cc) in res.items() if mm]

    # ---- final (tiny shuffle) ------------------------------------------

    def aggregate(self, ds):
        """Dataset of records → Dataset of (metric, attrs, count) totals."""
        partials = ds.map_batches(
            self.partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=65_536,
        )
        out = partials.groupby(["metric", "attrs"]).sum("count")
        return out.map_batches(
            lambda t: t.rename_columns(
                ["metric", "attrs", "count"]
            ),
            batch_format="pyarrow",
        )


def aggregate_by_sink(cc: "CountConnector", ds, sink_col: str = "sink"):
    """Per-sink counts in ONE execution: the input carries a ``sink``
    column (Hive partition col of the written fan-out); partials are
    keyed (sink, metric, attrs) so a single tiny groupby serves every
    sink — instead of one full pass per sink."""
    import pyarrow.compute as pc2

    def partial(t: pa.Table) -> pa.Table:
        sinks = pc2.unique(t[sink_col]).to_pylist()
        parts = []
        for s in sinks:
            sub = t.filter(pc2.equal(t[sink_col], s))
            p = cc.partial(sub)
            parts.append(p.append_column(sink_col, pa.array([s] * p.num_rows)))
        if not parts:
            return pa.table(
                {"metric": pa.array([], pa.string()), "attrs": pa.array([], pa.string()),
                 "count": pa.array([], pa.int64()), sink_col: pa.array([], pa.string())}
            )
        return pa.concat_tables(parts)

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=65_536)
    out = out.groupby([sink_col, "metric", "attrs"]).sum("count")
    return out.map_batches(
        lambda t: t.rename_columns([sink_col, "metric", "attrs", "count"]),
        batch_format="pyarrow",
    )


def counts_to_flat(t: pa.Table, attr_keys: list[str]) -> pa.Table:
    """Explode the canonical ``attrs`` JSON back to flat columns for one
    metric's rows — the oracle-comparison shape."""
    rows = [json.loads(s) for s in t["attrs"].to_pylist()]
    cols = {k: pa.array([r.get(k) for r in rows], type=pa.string()) for k in attr_keys}
    cols["count"] = t["count"].combine_chunks()
    return pa.table(cols)
