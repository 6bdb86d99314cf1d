"""metricstransformprocessor parity: rename / relabel / delete / scale /
aggregate / combine operations over a metrics table (reference:
processor/metricstransformprocessor — README operation table and
metrics_transform_processor.go; aggregation semantics in
operation_aggregate_labels.go / operation_aggregate_label_values.go).

Batch-engine shape: the LONG metric layout — one row per data point with
columns ``metric`` (name), any number of string label columns, and an
int64 ``value``.  This is the natural distributed layout (the reference
walks pmetric slices per batch; here every operation is a vectorized
arrow kernel over blocks, and the two aggregate operations end in one
``compact_groupby`` exchange over the tiny rolled-up key space).

Operation mapping (README table → here):

- rename metric (strict or regexp w/ ``$1`` capture expansion)
- add label, rename label key, rename label values
- delete data points by label value
- scale value (int64, overflow-checked)
- aggregate across label sets (keep a label subset, sum)
- aggregate across label values (merge a value set into one, sum)
- combine matched metrics into one, original name kept in a new label
  (``submatch_case``-free strict form of metrics_transform_processor.go
  ``combine``)

Filters mirror the reference's ``include`` + ``match_type``
(strict/regexp); every op applies only to matching metric rows.
Operations apply IN ORDER, each seeing the previous one's output, as in
the reference.  Aggregations are ``sum`` (the delta-count shape this
engine's connectors emit); mean/min/max would slot into the same
compact_groupby.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class MetricsTransform:
    """One transform entry (include filter + a single operation)."""
    action: str                       # see _APPLY keys
    include: str = ".*"               # metric-name filter
    match_type: str = "strict"        # "strict" | "regexp"
    new_name: str = ""                # rename_metric / combine target
    label: str = ""                   # label key operand
    new_label: str = ""               # rename_label_key target / add_label key
    value_map: dict = field(default_factory=dict)   # rename_label_values
    label_value: str = ""             # add_label value / delete match
    scale: int = 1                    # scale_value factor
    keep_labels: list = field(default_factory=list)  # aggregate_labels
    merge_values: list = field(default_factory=list)  # aggregate_label_values
    merged_value: str = ""            # aggregate_label_values target


def _match_mask(t: pa.Table, tr: MetricsTransform):
    m = pc.cast(t["metric"], pa.string())
    if tr.match_type == "strict":
        return pc.equal(m, tr.include)
    return pc.match_substring_regex(m, f"^(?:{tr.include})$")


def _expand_rename(name: str, pattern: str, template: str) -> str:
    """Regexp rename with ``$1``-style capture expansion
    (metrics_transform_processor.go: submatch replacement)."""
    mo = re.fullmatch(pattern, name)
    if not mo:
        return name
    return re.sub(r"\$(\d+)", lambda g: mo.group(int(g.group(1))) or "",
                  template)


def _rename_metric(t: pa.Table, tr: MetricsTransform) -> pa.Table:
    names = pc.cast(t["metric"], pa.string())
    if tr.match_type == "strict":
        out = pc.if_else(pc.equal(names, tr.include),
                         pa.scalar(tr.new_name, pa.string()), names)
    else:
        # distinct metric names are few: rewrite via a per-block dict map
        uniq = pc.unique(names).to_pylist()
        mapping = {u: _expand_rename(u or "", tr.include, tr.new_name)
                   for u in uniq}
        out = pa.array([None if v is None else mapping[v]
                        for v in names.to_pylist()], pa.string()) \
            if any(mapping[u] != u for u in uniq) else names
    return t.set_column(t.schema.get_field_index("metric"), "metric", out)


def _masked_replace(col, mask, new_col):
    return pc.if_else(mask, new_col, col)


def _apply_one(t: pa.Table, tr: MetricsTransform) -> pa.Table:
    if tr.action == "rename_metric":
        return _rename_metric(t, tr)
    mask = _match_mask(t, tr)
    if tr.action == "add_label":
        col = pc.if_else(mask, pa.scalar(tr.label_value, pa.string()),
                         pa.scalar(None, pa.string()))
        return t.append_column(tr.new_label, col) \
            if tr.new_label not in t.column_names else \
            t.set_column(t.schema.get_field_index(tr.new_label),
                         tr.new_label, _masked_replace(
                             pc.cast(t[tr.new_label], pa.string()), mask,
                             pa.scalar(tr.label_value, pa.string())))
    if tr.action == "rename_label_key":
        # only valid when every matched row moves: batch engines rename
        # the column when the filter matches all metrics, else copy over
        src = pc.cast(t[tr.label], pa.string())
        if tr.new_label in t.column_names:
            dst = _masked_replace(pc.cast(t[tr.new_label], pa.string()),
                                  mask, src)
            out = t.set_column(t.schema.get_field_index(tr.new_label),
                               tr.new_label, dst)
        else:
            out = t.append_column(
                tr.new_label, pc.if_else(mask, src,
                                         pa.scalar(None, pa.string())))
        keep = pc.all(mask).as_py() is True
        return out.drop_columns([tr.label]) if keep else out
    if tr.action == "rename_label_values":
        col = pc.cast(t[tr.label], pa.string())
        out = col
        for old, new in tr.value_map.items():
            out = pc.if_else(pc.and_kleene(mask, pc.equal(col, old)),
                             pa.scalar(new, pa.string()), out)
        return t.set_column(t.schema.get_field_index(tr.label),
                            tr.label, out)
    if tr.action == "delete_datapoints":
        drop = pc.and_kleene(
            mask, pc.equal(pc.cast(t[tr.label], pa.string()),
                           tr.label_value))
        return t.filter(pc.fill_null(pc.invert(drop), True))
    if tr.action == "scale_value":
        v = pc.cast(t["value"], pa.int64())
        scaled = pc.multiply_checked(v, tr.scale)
        return t.set_column(t.schema.get_field_index("value"), "value",
                            pc.if_else(mask, scaled, v))
    if tr.action == "relabel_values":  # row-local half of aggregate_label_values
        col = pc.cast(t[tr.label], pa.string())
        merged = pc.if_else(
            pc.and_kleene(mask, pc.is_in(
                col, value_set=pa.array(tr.merge_values, pa.string()))),
            pa.scalar(tr.merged_value, pa.string()), col)
        return t.set_column(t.schema.get_field_index(tr.label),
                            tr.label, merged)
    if tr.action == "combine":
        names = pc.cast(t["metric"], pa.string())
        out = t
        if tr.new_label not in t.column_names:
            out = out.append_column(
                tr.new_label, pc.if_else(mask, names,
                                         pa.scalar(None, pa.string())))
        else:
            out = out.set_column(
                out.schema.get_field_index(tr.new_label), tr.new_label,
                _masked_replace(pc.cast(t[tr.new_label], pa.string()),
                                mask, names))
        return out.set_column(
            out.schema.get_field_index("metric"), "metric",
            pc.if_else(mask, pa.scalar(tr.new_name, pa.string()), names))
    raise ValueError(f"metricstransform: unknown action {tr.action!r}")


def apply_row_local(t: pa.Table, transforms: list[MetricsTransform]) -> pa.Table:
    """Apply every row-local transform in order (everything except
    aggregate_labels, which needs the cross-block exchange)."""
    for tr in transforms:
        if tr.action in ("aggregate_labels", "aggregate_label_values"):
            raise ValueError(f"{tr.action} is not row-local; use "
                             "metrics_transform()")
        t = _apply_one(t, tr)
    return t


_EXCHANGE_ACTIONS = ("aggregate_labels", "aggregate_label_values")


def metrics_transform(ds, transforms: list[MetricsTransform]):
    """Apply a full transform chain to a long-form metrics Dataset.

    Row-local prefixes/suffixes run fused inside ``map_batches``; each
    ``aggregate_labels`` / ``aggregate_label_values`` is one
    ``compact_groupby`` over (metric × kept labels) — tiny key space,
    single bounded exchange.  ``keep_labels`` names the surviving label
    columns for BOTH aggregates (for aggregate_label_values that is the
    full label set — only duplicate label tuples created by the value
    merge collapse, matching operation_aggregate_label_values.go).
    """
    from .agg import compact_groupby

    i = 0
    while i < len(transforms):
        j = i
        while j < len(transforms) and \
                transforms[j].action not in _EXCHANGE_ACTIONS:
            j += 1
        chunk = [MetricsTransform(**{**vars(transforms[j]),
                                     "action": "relabel_values"})] \
            if j < len(transforms) and \
            transforms[j].action == "aggregate_label_values" else []
        chunk = transforms[i:j] + chunk
        if chunk:
            def stage(t: pa.Table, _chunk=tuple(chunk)) -> pa.Table:
                return apply_row_local(t, list(_chunk))
            ds = ds.map_batches(stage, batch_format="pyarrow")
        if j < len(transforms):
            agg = transforms[j]
            if agg.action == "aggregate_labels" and not (
                    agg.match_type == "regexp" and agg.include == ".*"):
                # Column pruning is table-wide in the long layout, so the
                # rollup must cover every metric; selective per-metric
                # rollups compose as filter + aggregate + union instead.
                raise ValueError("aggregate_labels supports match-all "
                                 "includes only (include='.*', regexp)")
            keys = ["metric"] + [k for k in agg.keep_labels if k != "metric"]
            ds = compact_groupby(ds, keys, sum_cols={"value": "value"})
            j += 1
        i = j
    return ds
