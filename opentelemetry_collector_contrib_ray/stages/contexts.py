"""OTTL non-log contexts: span / spanevent / datapoint path tables over
the flat-row model.

Parity: pkg/ottl/contexts/ottlspan (paths at
contexts/internal/span.go:26-98: trace_id, span_id, trace_state,
parent_span_id, name, kind [+ kind.string], start/end_time_unix_nano
[+ start/end_time], attributes.*, status.code, status.message) and
pkg/ottl/contexts/ottldatapoint (datapoint.go:52-80: attributes.*,
start_time_unix_nano, time_unix_nano [+ start_time, time],
value_double, value_int, count, sum, flags). Enum symbols live in
expr.ENUM_SYMBOLS next to the log severities, so ``kind ==
SPAN_KIND_SERVER`` or ``set(status.code, STATUS_CODE_ERROR)`` compile
through the existing statement grammar unchanged.

In the flat-row rendering a context is mostly a NAMING CONTRACT (the
reference's pdata getters/setters become dotted column reads/writes) —
what actually needs code are the DERIVED paths: the ``*_time``
timestamp views of the ``*_time_unix_nano`` integers, and the
read-only ``kind.string`` name view. ``attach_context_aliases`` adds
them before a statement group runs; ``sync_context_aliases`` writes
``*_time`` edits back to the nano columns and drops the views, so a
statement may freely read or set either form (span.go:74-80 exposes
both the same way)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .base import set_column

# ptrace.SpanKind.String() names, index = enum value (span.go kind.string)
SPAN_KIND_NAMES = ["Unspecified", "Internal", "Server", "Client",
                   "Producer", "Consumer"]

# pmetric.MetricType.String() names, index = enum value
# (pkg/ottl/contexts/ottlmetric metric.go exposes metric.type read-only;
# the name view parallels span's kind.string)
METRIC_TYPE_NAMES = ["Empty", "Gauge", "Sum", "Histogram",
                     "ExponentialHistogram", "Summary"]

# time-view aliases per context: alias column → nano source column
_TIME_ALIASES = {
    "span": {"start_time": "start_time_unix_nano",
             "end_time": "end_time_unix_nano"},
    "spanevent": {"time": "time_unix_nano"},
    "datapoint": {"start_time": "start_time_unix_nano",
                  "time": "time_unix_nano"},
}


def _nanos_to_ts(col) -> pa.Array:
    us = pc.divide(pc.cast(col, pa.int64()), 1000)
    return pc.cast(us, pa.timestamp("us"))


def _ts_to_nanos(col) -> pa.Array:
    us = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return pc.multiply(us, 1000)


def attach_context_aliases(t: pa.Table, context: str) -> pa.Table:
    """Materialize the context's derived path columns so statements can
    read them as plain flat paths."""
    for alias, src in _TIME_ALIASES.get(context, {}).items():
        if src in t.column_names and alias not in t.column_names:
            t = t.append_column(alias, _nanos_to_ts(t[src]))
    if context == "span" and "kind" in t.column_names \
            and "kind.string" not in t.column_names:
        t = t.append_column(
            "kind.string", _enum_name_view(t["kind"], SPAN_KIND_NAMES))
    if context == "metric" and "type" in t.column_names \
            and "type.string" not in t.column_names:
        t = t.append_column(
            "type.string", _enum_name_view(t["type"], METRIC_TYPE_NAMES))
    return t


def _enum_name_view(col, names: list[str]) -> pa.Array:
    lut = pa.array(names)
    idx = pc.cast(pc.fill_null(col, 0), pa.int64())
    oob = pc.or_(pc.less(idx, 0), pc.greater_equal(idx, len(names)))
    idx = pc.if_else(oob, pa.scalar(0, pa.int64()), idx)
    return pc.take(lut, idx)


def sync_context_aliases(t: pa.Table, context: str) -> pa.Table:
    """Write ``*_time`` edits back into the nano columns and drop the
    derived views (they never leave the processor, like the log
    context's ``cache``)."""
    drop = []
    for alias, src in _TIME_ALIASES.get(context, {}).items():
        if alias in t.column_names:
            if src in t.column_names:
                t = set_column(t, src, _ts_to_nanos(t[alias]))
            drop.append(alias)
    if context == "span" and "kind.string" in t.column_names:
        drop.append("kind.string")
    if context == "metric" and "type.string" in t.column_names:
        drop.append("type.string")
    if drop:
        t = t.drop_columns(drop)
    return t
