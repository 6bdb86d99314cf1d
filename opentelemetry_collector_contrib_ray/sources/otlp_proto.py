"""OTLP/protobuf logs marshal + file source — the fileexporter
``format: proto`` path and its re-ingest twin.

Parity: /root/reference/exporter/fileexporter/marshaller.go:26-28
selects ``plog.ProtoMarshaler`` for ``formatTypeProto`` — the wire
default of the OTLP ecosystem; the repo previously shipped only the
JSON marshal (sources/otlp_json.py). The message tree is the public
opentelemetry-proto ``LogsData`` schema
(opentelemetry/proto/logs/v1/logs.proto):

    LogsData          { 1: repeated ResourceLogs }
    ResourceLogs      { 1: Resource, 2: repeated ScopeLogs }
    Resource          { 1: repeated KeyValue }
    ScopeLogs         { 1: InstrumentationScope, 2: repeated LogRecord }
    InstrumentationScope { 1: string name }
    LogRecord         { 1: fixed64 time_unix_nano,
                        11: fixed64 observed_time_unix_nano,
                        2: varint severity_number, 3: string severity_text,
                        5: AnyValue body, 6: repeated KeyValue attributes,
                        9: bytes trace_id, 10: bytes span_id }
    KeyValue          { 1: string key, 2: AnyValue value }
    AnyValue (oneof)  { 1: string, 2: bool, 3: int64 varint,
                        4: double fixed64, 7: bytes }

Hand-encoded proto3 wire format (varint / fixed64 / length-delimited)
— dependency-free, byte-compatible with any standard protobuf reader
of that schema. The decoder skips unknown fields by wire type, so
files written by the reference collector with extra fields (flags,
dropped counts, schema_url) still parse.

The per-record encode/decode is row-wise by nature (nested dynamic
tree); it runs inside ``map_batches`` so decode parallelism = block
parallelism, exactly like the JSON twin.
"""

from __future__ import annotations

import struct

import pyarrow as pa

# ------------------------------------------------------------- encode


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1  # two's-complement for negative int64
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _enc_any_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(2, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    if isinstance(v, (bytes, bytearray)):
        return _ld(7, bytes(v))
    return _ld(1, ("" if v is None else str(v)).encode("utf-8"))


def _enc_keyvalue(key: str, v) -> bytes:
    return _ld(1, key.encode("utf-8")) + _ld(2, _enc_any_value(v))


def _enc_log_record(rec: dict) -> bytes:
    out = bytearray()
    if rec.get("time_unix_nano"):
        out += _tag(1, 1) + struct.pack("<Q", int(rec["time_unix_nano"]))
    if rec.get("observed_time_unix_nano"):
        out += _tag(11, 1) + struct.pack("<Q", int(rec["observed_time_unix_nano"]))
    if rec.get("severity_number"):
        out += _tag(2, 0) + _varint(int(rec["severity_number"]))
    if rec.get("severity_text"):
        out += _ld(3, rec["severity_text"].encode("utf-8"))
    if "body" in rec:
        out += _ld(5, _enc_any_value(rec["body"]))
    for k, v in rec.get("attributes", ()):
        out += _ld(6, _enc_keyvalue(k, v))
    if rec.get("trace_id"):
        out += _ld(9, bytes.fromhex(rec["trace_id"]))
    if rec.get("span_id"):
        out += _ld(10, bytes.fromhex(rec["span_id"]))
    return bytes(out)


def encode_otlp_proto_batch(t: pa.Table) -> bytes:
    """Flat log-record batch → ONE serialized ``LogsData`` message (the
    proto analog of ``encode_otlp_json_batch`` — same resource/scope
    grouping: rows group by their ``resource.*`` values into
    resourceLogs, then by ``scope_name`` into scopeLogs)."""
    res_cols = [c for c in t.column_names if c.startswith("resource.")]
    attr_cols = [c for c in t.column_names if c.startswith("attributes.")]
    data = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    groups: dict = {}
    for i in range(n):
        res_key = tuple((c, data[c][i]) for c in res_cols if data[c][i] is not None)
        scope = data.get("scope_name", [""] * n)[i] or ""
        rec: dict = {}
        for src, dst in (("time_unix_nano", "time_unix_nano"),
                         ("observed_time_unix_nano", "observed_time_unix_nano"),
                         ("severity_number", "severity_number"),
                         ("severity_text", "severity_text"),
                         ("trace_id", "trace_id"), ("span_id", "span_id")):
            val = data.get(src, [None] * n)[i]
            if val:
                rec[dst] = val
        if "body" in data:
            rec["body"] = data["body"][i]
        rec["attributes"] = [
            (c[len("attributes."):], data[c][i])
            for c in attr_cols if data[c][i] is not None
        ]
        groups.setdefault(res_key, {}).setdefault(scope, []).append(rec)

    out = bytearray()
    for res_key, scopes in groups.items():
        rl = bytearray()
        if res_key:
            res = b"".join(
                _ld(1, _enc_keyvalue(k[len("resource."):], v)) for k, v in res_key
            )
            rl += _ld(1, res)
        for scope, recs in scopes.items():
            sl = _ld(1, _ld(1, scope.encode("utf-8")))  # scope { name }
            sl += b"".join(_ld(2, _enc_log_record(r)) for r in recs)
            rl += _ld(2, sl)
        out += _ld(1, bytes(rl))
    return bytes(out)


# ------------------------------------------------------------- decode


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes.
    value: int for varint/fixed, bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 1:
            val = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:
            val = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:  # groups (3/4) don't occur in proto3 OTLP
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _dec_any_value(buf: bytes):
    for field, _wire, val in _iter_fields(buf):
        if field == 1:
            return val.decode("utf-8")
        if field == 2:
            return bool(val)
        if field == 3:
            return val - (1 << 64) if val >= (1 << 63) else val  # int64
        if field == 4:
            return struct.unpack("<d", struct.pack("<Q", val))[0]
        if field == 7:
            return bytes(val)
    return None


def _dec_keyvalue(buf: bytes) -> tuple[str, object]:
    key, value = "", None
    for field, _wire, val in _iter_fields(buf):
        if field == 1:
            key = val.decode("utf-8")
        elif field == 2:
            value = _dec_any_value(val)
    return key, value


def _dec_log_record(buf: bytes) -> dict:
    rec: dict = {"time_unix_nano": 0, "observed_time_unix_nano": 0,
                 "severity_number": 0, "severity_text": "", "body": None,
                 "trace_id": "", "span_id": ""}
    for field, _wire, val in _iter_fields(buf):
        if field == 1:
            rec["time_unix_nano"] = int(val)
        elif field == 11:
            rec["observed_time_unix_nano"] = int(val)
        elif field == 2:
            rec["severity_number"] = int(val)
        elif field == 3:
            rec["severity_text"] = val.decode("utf-8")
        elif field == 5:
            rec["body"] = _dec_any_value(val)
        elif field == 6:
            k, v = _dec_keyvalue(val)
            rec[f"attributes.{k}"] = v
        elif field == 9:
            rec["trace_id"] = bytes(val).hex()
        elif field == 10:
            rec["span_id"] = bytes(val).hex()
    return rec


def decode_logs_data(buf: bytes) -> list[dict]:
    """Serialized LogsData → flat rows (the same flat-row model as the
    OTLP-JSON receiver: ``resource.<key>`` / ``attributes.<key>`` /
    envelope columns)."""
    rows: list[dict] = []
    for field, _wire, rl_buf in _iter_fields(buf):
        if field != 1:
            continue
        res: dict = {}
        scope_bufs = []
        for f2, _w2, v2 in _iter_fields(rl_buf):
            if f2 == 1:  # Resource
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _dec_keyvalue(v3)
                        res[f"resource.{k}"] = v
            elif f2 == 2:
                scope_bufs.append(v2)
        for sl_buf in scope_bufs:
            scope_name = ""
            for f2, _w2, v2 in _iter_fields(sl_buf):
                if f2 == 1:  # InstrumentationScope
                    for f3, _w3, v3 in _iter_fields(v2):
                        if f3 == 1:
                            scope_name = v3.decode("utf-8")
            for f2, _w2, v2 in _iter_fields(sl_buf):
                if f2 == 2:  # LogRecord
                    row = dict(res)
                    row["scope_name"] = scope_name
                    row.update(_dec_log_record(v2))
                    rows.append(row)
    return rows


def decode_otlp_proto_files(t: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """Batch of serialized LogsData payloads → flat log-record rows.
    Unknown keys across payloads are unioned (nulls elsewhere)."""
    rows: list[dict] = []
    for buf in t[bytes_col]:
        b = buf.as_py()
        if b:
            rows.extend(decode_logs_data(b))
    if not rows:
        return pa.table({"body": pa.array([], type=pa.string())})
    cols = sorted({k for r in rows for k in r})
    return pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})


# ----------------------------------------------------- traces / metrics
#
# Parity: exporter/fileexporter/marshaller.go:26-50 marshals all THREE
# signal trees (plog/ptrace/pmetric ProtoMarshaler); logs-only covered
# the log-pipeline scope, these close full fileexporter parity. Public
# schemas (opentelemetry-proto):
#
#   TracesData      { 1: repeated ResourceSpans }
#   ResourceSpans   { 1: Resource, 2: repeated ScopeSpans }
#   ScopeSpans      { 1: InstrumentationScope, 2: repeated Span }
#   Span            { 1: bytes trace_id, 2: bytes span_id,
#                     3: string trace_state, 4: bytes parent_span_id,
#                     5: string name, 6: varint kind,
#                     7/8: fixed64 start/end_time_unix_nano,
#                     9: repeated KeyValue attributes, 15: Status }
#   Status          { 2: string message, 3: varint code }
#
#   MetricsData     { 1: repeated ResourceMetrics }
#   ResourceMetrics { 1: Resource, 2: repeated ScopeMetrics }
#   ScopeMetrics    { 1: InstrumentationScope, 2: repeated Metric }
#   Metric          { 1: name, 2: description, 3: unit,
#                     oneof data 5: Gauge | 7: Sum }
#   Gauge           { 1: repeated NumberDataPoint }
#   Sum             { 1: repeated NumberDataPoint,
#                     2: varint aggregation_temporality,
#                     3: bool is_monotonic }
#   NumberDataPoint { 2/3: fixed64 start/time_unix_nano,
#                     oneof value 4: double | 6: sfixed64 as_int,
#                     7: repeated KeyValue attributes }
#   Metric oneof also 9: Histogram
#   Histogram       { 1: repeated HistogramDataPoint,
#                     2: varint aggregation_temporality }
#   HistogramDataPoint { 2/3: fixed64 start/time_unix_nano,
#                     4: fixed64 count, 5: double sum,
#                     6: packed fixed64 bucket_counts,
#                     7: packed double explicit_bounds,
#                     9: repeated KeyValue attributes,
#                     11/12: double min/max }
#
# Flat-row contract matches stages/contexts.py's span/datapoint path
# tables: hex trace/span ids, integer kind/status.code, nano ints,
# ``resource.*`` / ``attributes.*`` dotted columns, ``scope_name``.


_METRIC_TYPE_GAUGE = 1
_METRIC_TYPE_SUM = 2
_METRIC_TYPE_HISTOGRAM = 3


def _enc_span(rec: dict) -> bytes:
    out = bytearray()
    if rec.get("trace_id"):
        out += _ld(1, bytes.fromhex(rec["trace_id"]))
    if rec.get("span_id"):
        out += _ld(2, bytes.fromhex(rec["span_id"]))
    if rec.get("trace_state"):
        out += _ld(3, rec["trace_state"].encode("utf-8"))
    if rec.get("parent_span_id"):
        out += _ld(4, bytes.fromhex(rec["parent_span_id"]))
    if rec.get("name"):
        out += _ld(5, rec["name"].encode("utf-8"))
    if rec.get("kind"):
        out += _tag(6, 0) + _varint(int(rec["kind"]))
    if rec.get("start_time_unix_nano"):
        out += _tag(7, 1) + struct.pack("<Q", int(rec["start_time_unix_nano"]))
    if rec.get("end_time_unix_nano"):
        out += _tag(8, 1) + struct.pack("<Q", int(rec["end_time_unix_nano"]))
    for k, v in rec.get("attributes", ()):
        out += _ld(9, _enc_keyvalue(k, v))
    if rec.get("status.code") or rec.get("status.message"):
        st = bytearray()
        if rec.get("status.message"):
            st += _ld(2, rec["status.message"].encode("utf-8"))
        if rec.get("status.code"):
            st += _tag(3, 0) + _varint(int(rec["status.code"]))
        out += _ld(15, bytes(st))
    return bytes(out)


def _group_rows(t: pa.Table, envelope: tuple[str, ...]):
    """Shared resource/scope grouping for all three signal encoders:
    yields ``groups[res_key][scope] -> [rec dicts]`` where a rec holds
    the envelope fields + attributes pairs."""
    res_cols = [c for c in t.column_names if c.startswith("resource.")]
    attr_cols = [c for c in t.column_names if c.startswith("attributes.")]
    data = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    groups: dict = {}
    for i in range(n):
        res_key = tuple((c, data[c][i]) for c in res_cols
                        if data[c][i] is not None)
        scope = data.get("scope_name", [""] * n)[i] or ""
        rec: dict = {}
        for c in envelope:
            val = data.get(c, [None] * n)[i]
            if val is not None:
                rec[c] = val
        rec["attributes"] = [
            (c[len("attributes."):], data[c][i])
            for c in attr_cols if data[c][i] is not None
        ]
        groups.setdefault(res_key, {}).setdefault(scope, []).append(rec)
    return groups


def _enc_signal(groups: dict, enc_scope_payload) -> bytes:
    """groups → serialized {Logs,Traces,Metrics}Data: identical
    Resource/Scope envelope nesting across all three trees."""
    out = bytearray()
    for res_key, scopes in groups.items():
        rl = bytearray()
        if res_key:
            res = b"".join(
                _ld(1, _enc_keyvalue(k[len("resource."):], v))
                for k, v in res_key)
            rl += _ld(1, res)
        for scope, recs in scopes.items():
            sl = _ld(1, _ld(1, scope.encode("utf-8")))
            sl += enc_scope_payload(recs)
            rl += _ld(2, sl)
        out += _ld(1, bytes(rl))
    return bytes(out)


_SPAN_ENVELOPE = ("trace_id", "span_id", "trace_state", "parent_span_id",
                  "name", "kind", "start_time_unix_nano",
                  "end_time_unix_nano", "status.code", "status.message")


def encode_otlp_proto_spans(t: pa.Table) -> bytes:
    """Flat span-record batch → ONE serialized ``TracesData``."""
    groups = _group_rows(t, _SPAN_ENVELOPE)
    return _enc_signal(
        groups, lambda recs: b"".join(_ld(2, _enc_span(r)) for r in recs))


_METRIC_ENVELOPE = ("metric_name", "description", "unit", "type",
                    "aggregation_temporality", "is_monotonic",
                    "start_time_unix_nano", "time_unix_nano",
                    "value_int", "value_double",
                    "hist_count", "hist_sum", "bucket_counts",
                    "explicit_bounds", "hist_min", "hist_max")


def _enc_number_dp(rec: dict) -> bytes:
    out = bytearray()
    if rec.get("start_time_unix_nano"):
        out += _tag(2, 1) + struct.pack("<Q", int(rec["start_time_unix_nano"]))
    if rec.get("time_unix_nano"):
        out += _tag(3, 1) + struct.pack("<Q", int(rec["time_unix_nano"]))
    if rec.get("value_double") is not None:
        out += _tag(4, 1) + struct.pack("<d", float(rec["value_double"]))
    elif rec.get("value_int") is not None:
        out += _tag(6, 1) + struct.pack("<q", int(rec["value_int"]))
    for k, v in rec.get("attributes", ()):
        out += _ld(7, _enc_keyvalue(k, v))
    return bytes(out)


def _enc_histogram_dp(rec: dict) -> bytes:
    """HistogramDataPoint (opentelemetry-proto metrics.proto): 2/3
    fixed64 start/time nanos, 4 fixed64 count, 5 double sum,
    6 repeated fixed64 bucket_counts (PACKED — proto3 default for
    repeated scalars), 7 repeated double explicit_bounds (packed),
    9 repeated KeyValue attributes, 11/12 double min/max. The
    len(bucket_counts) == len(explicit_bounds) + 1 invariant is the
    caller's (as in pmetric)."""
    out = bytearray()
    if rec.get("start_time_unix_nano"):
        out += _tag(2, 1) + struct.pack("<Q", int(rec["start_time_unix_nano"]))
    if rec.get("time_unix_nano"):
        out += _tag(3, 1) + struct.pack("<Q", int(rec["time_unix_nano"]))
    if rec.get("hist_count") is not None:
        out += _tag(4, 1) + struct.pack("<Q", int(rec["hist_count"]))
    if rec.get("hist_sum") is not None:
        out += _tag(5, 1) + struct.pack("<d", float(rec["hist_sum"]))
    bc = rec.get("bucket_counts")
    if bc:
        out += _ld(6, b"".join(struct.pack("<Q", int(c)) for c in bc))
    eb = rec.get("explicit_bounds")
    if eb:
        out += _ld(7, b"".join(struct.pack("<d", float(x)) for x in eb))
    for k, v in rec.get("attributes", ()):
        out += _ld(9, _enc_keyvalue(k, v))
    if rec.get("hist_min") is not None:
        out += _tag(11, 1) + struct.pack("<d", float(rec["hist_min"]))
    if rec.get("hist_max") is not None:
        out += _tag(12, 1) + struct.pack("<d", float(rec["hist_max"]))
    return bytes(out)


def _enc_metrics_scope(recs: list[dict]) -> bytes:
    """Datapoint rows → repeated Metric messages: rows re-group by the
    metric identity tuple so each metric carries its repeated
    datapoints (the pmetric tree shape)."""
    metrics: dict = {}
    for r in recs:
        ident = (r.get("metric_name", ""), r.get("description"),
                 r.get("unit"), int(r.get("type", _METRIC_TYPE_GAUGE)),
                 r.get("aggregation_temporality"),
                 bool(r.get("is_monotonic", False)))
        metrics.setdefault(ident, []).append(r)
    out = bytearray()
    for (name, desc, unit, typ, temp, mono), dps in metrics.items():
        m = bytearray()
        m += _ld(1, name.encode("utf-8"))
        if desc:
            m += _ld(2, str(desc).encode("utf-8"))
        if unit:
            m += _ld(3, str(unit).encode("utf-8"))
        if typ == _METRIC_TYPE_HISTOGRAM:
            h_msg = bytearray(
                b"".join(_ld(1, _enc_histogram_dp(r)) for r in dps))
            if temp:
                h_msg += _tag(2, 0) + _varint(int(temp))
            m += _ld(9, bytes(h_msg))
        elif typ == _METRIC_TYPE_SUM:
            body = b"".join(_ld(1, _enc_number_dp(r)) for r in dps)
            sum_msg = bytearray(body)
            if temp:
                sum_msg += _tag(2, 0) + _varint(int(temp))
            if mono:
                sum_msg += _tag(3, 0) + _varint(1)
            m += _ld(7, bytes(sum_msg))
        else:
            body = b"".join(_ld(1, _enc_number_dp(r)) for r in dps)
            m += _ld(5, body)
        out += _ld(2, bytes(m))
    return bytes(out)


def encode_otlp_proto_metrics(t: pa.Table) -> bytes:
    """Flat datapoint batch → ONE serialized ``MetricsData``."""
    groups = _group_rows(t, _METRIC_ENVELOPE)
    return _enc_signal(groups, _enc_metrics_scope)


def _dec_span(buf: bytes) -> dict:
    rec: dict = {"trace_id": "", "span_id": "", "parent_span_id": "",
                 "trace_state": "", "name": "", "kind": 0,
                 "start_time_unix_nano": 0, "end_time_unix_nano": 0,
                 "status.code": 0, "status.message": ""}
    for field, _wire, val in _iter_fields(buf):
        if field == 1:
            rec["trace_id"] = bytes(val).hex()
        elif field == 2:
            rec["span_id"] = bytes(val).hex()
        elif field == 3:
            rec["trace_state"] = val.decode("utf-8")
        elif field == 4:
            rec["parent_span_id"] = bytes(val).hex()
        elif field == 5:
            rec["name"] = val.decode("utf-8")
        elif field == 6:
            rec["kind"] = int(val)
        elif field == 7:
            rec["start_time_unix_nano"] = int(val)
        elif field == 8:
            rec["end_time_unix_nano"] = int(val)
        elif field == 9:
            k, v = _dec_keyvalue(val)
            rec[f"attributes.{k}"] = v
        elif field == 15:
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 2:
                    rec["status.message"] = v2.decode("utf-8")
                elif f2 == 3:
                    rec["status.code"] = int(v2)
    return rec


def _dec_number_dp(buf: bytes) -> dict:
    dp: dict = {"start_time_unix_nano": 0, "time_unix_nano": 0,
                "value_int": None, "value_double": None}
    for field, _wire, val in _iter_fields(buf):
        if field == 2:
            dp["start_time_unix_nano"] = int(val)
        elif field == 3:
            dp["time_unix_nano"] = int(val)
        elif field == 4:
            dp["value_double"] = struct.unpack(
                "<d", struct.pack("<Q", val))[0]
        elif field == 6:
            v = val if val < (1 << 63) else val - (1 << 64)
            dp["value_int"] = int(v)
        elif field == 7:
            k, v = _dec_keyvalue(val)
            dp[f"attributes.{k}"] = v
    return dp


def _dec_histogram_dp(buf: bytes) -> dict:
    dp: dict = {"start_time_unix_nano": 0, "time_unix_nano": 0,
                "hist_count": 0, "hist_sum": None,
                "bucket_counts": [], "explicit_bounds": [],
                "hist_min": None, "hist_max": None}
    for field, wire, val in _iter_fields(buf):
        if field == 2:
            dp["start_time_unix_nano"] = int(val)
        elif field == 3:
            dp["time_unix_nano"] = int(val)
        elif field == 4:
            dp["hist_count"] = int(val)
        elif field == 5:
            dp["hist_sum"] = struct.unpack("<d", struct.pack("<Q", val))[0]
        elif field == 6:
            if wire == 2:  # packed fixed64
                dp["bucket_counts"] = [
                    struct.unpack_from("<Q", val, o)[0]
                    for o in range(0, len(val), 8)]
            else:  # tolerated unpacked form
                dp["bucket_counts"].append(int(val))
        elif field == 7:
            if wire == 2:  # packed double
                dp["explicit_bounds"] = [
                    struct.unpack_from("<d", val, o)[0]
                    for o in range(0, len(val), 8)]
            else:
                dp["explicit_bounds"].append(
                    struct.unpack("<d", struct.pack("<Q", val))[0])
        elif field == 9:
            k, v = _dec_keyvalue(val)
            dp[f"attributes.{k}"] = v
        elif field == 11:
            dp["hist_min"] = struct.unpack("<d", struct.pack("<Q", val))[0]
        elif field == 12:
            dp["hist_max"] = struct.unpack("<d", struct.pack("<Q", val))[0]
    return dp


def _iter_signal(buf: bytes):
    """Shared Resource/Scope envelope walk: yields
    (resource_row_dict, scope_name, scope_payload_field_bufs)."""
    for field, _wire, rl_buf in _iter_fields(buf):
        if field != 1:
            continue
        res: dict = {}
        scope_bufs = []
        for f2, _w2, v2 in _iter_fields(rl_buf):
            if f2 == 1:
                for f3, _w3, v3 in _iter_fields(v2):
                    if f3 == 1:
                        k, v = _dec_keyvalue(v3)
                        res[f"resource.{k}"] = v
            elif f2 == 2:
                scope_bufs.append(v2)
        for sl_buf in scope_bufs:
            scope_name = ""
            payloads = []
            for f2, _w2, v2 in _iter_fields(sl_buf):
                if f2 == 1:
                    for f3, _w3, v3 in _iter_fields(v2):
                        if f3 == 1:
                            scope_name = v3.decode("utf-8")
                elif f2 == 2:
                    payloads.append(v2)
            yield res, scope_name, payloads


def decode_traces_data(buf: bytes) -> list[dict]:
    """Serialized TracesData → flat span rows."""
    rows: list[dict] = []
    for res, scope_name, payloads in _iter_signal(buf):
        for span_buf in payloads:
            row = dict(res)
            row["scope_name"] = scope_name
            row.update(_dec_span(span_buf))
            rows.append(row)
    return rows


def decode_metrics_data(buf: bytes) -> list[dict]:
    """Serialized MetricsData → flat datapoint rows (one row per
    NumberDataPoint, metric identity columns repeated)."""
    rows: list[dict] = []
    for res, scope_name, payloads in _iter_signal(buf):
        for m_buf in payloads:
            meta: dict = {"metric_name": "", "description": "",
                          "unit": "", "type": 0,
                          "aggregation_temporality": 0,
                          "is_monotonic": False}
            dp_bufs: list[bytes] = []
            for field, _wire, val in _iter_fields(m_buf):
                if field == 1:
                    meta["metric_name"] = val.decode("utf-8")
                elif field == 2:
                    meta["description"] = val.decode("utf-8")
                elif field == 3:
                    meta["unit"] = val.decode("utf-8")
                elif field == 5:
                    meta["type"] = _METRIC_TYPE_GAUGE
                    for f2, _w2, v2 in _iter_fields(val):
                        if f2 == 1:
                            dp_bufs.append(v2)
                elif field == 7:
                    meta["type"] = _METRIC_TYPE_SUM
                    for f2, _w2, v2 in _iter_fields(val):
                        if f2 == 1:
                            dp_bufs.append(v2)
                        elif f2 == 2:
                            meta["aggregation_temporality"] = int(v2)
                        elif f2 == 3:
                            meta["is_monotonic"] = bool(v2)
                elif field == 9:
                    meta["type"] = _METRIC_TYPE_HISTOGRAM
                    for f2, _w2, v2 in _iter_fields(val):
                        if f2 == 1:
                            dp_bufs.append(v2)
                        elif f2 == 2:
                            meta["aggregation_temporality"] = int(v2)
            dec_dp = (_dec_histogram_dp
                      if meta["type"] == _METRIC_TYPE_HISTOGRAM
                      else _dec_number_dp)
            for dp_buf in dp_bufs:
                row = dict(res)
                row["scope_name"] = scope_name
                row.update(meta)
                row.update(dec_dp(dp_buf))
                rows.append(row)
    return rows


def _decode_files(decoder):
    def fn(t: pa.Table, bytes_col: str = "bytes") -> pa.Table:
        rows: list[dict] = []
        for buf in t[bytes_col]:
            b = buf.as_py()
            if b:
                rows.extend(decoder(b))
        if not rows:
            return pa.table({"name": pa.array([], type=pa.string())})
        cols = sorted({k for r in rows for k in r})
        return pa.table({c: pa.array([r.get(c) for r in rows])
                         for c in cols})
    return fn


def read_otlp_proto_traces(paths):
    """File(s) of serialized TracesData → flat span-row Dataset."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        _decode_files(decode_traces_data), batch_format="pyarrow")


def read_otlp_proto_metrics(paths):
    """File(s) of serialized MetricsData → flat datapoint Dataset."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        _decode_files(decode_metrics_data), batch_format="pyarrow")


def _write_signal(ds, path: str, encoder, ext: str) -> int:
    """Shared OTLP-proto sink (atomic publish, stale-file cleanup,
    task-stable digest names across retries — the
    ``write_otlp_proto_logs`` contract for any signal encoder)."""
    import hashlib
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        if stale.endswith(ext) or stale.endswith(".tmp"):
            os.unlink(os.path.join(path, stale))
    run_id = uuid.uuid4().hex[:8]

    class _EncWrite:
        def __init__(self):
            self.task = None
            self.seq = 0

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"written": pa.array([], type=pa.int64())})
            import ray

            tid = ray.get_runtime_context().get_task_id() or "task"
            if tid != self.task:
                self.task, self.seq = tid, 0
            payload = encoder(t)
            digest = hashlib.sha1(payload).hexdigest()[:12]
            name = f"{run_id}-{tid[:16]}-{self.seq:04d}-{digest}"
            self.seq += 1
            tmp = f"{path}/.{name}.tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, f"{path}/{name}{ext}")
            return pa.table({"written": pa.array([1], type=pa.int64())})

    out = ds.map_batches(_EncWrite, batch_format="pyarrow",
                         concurrency=(1, 8))
    return int(out.sum("written") or 0)


def write_otlp_proto_traces(ds, path: str) -> int:
    """TracesData sink — one ``.pb`` file per block."""
    return _write_signal(ds, path, encode_otlp_proto_spans, ".pb")


def write_otlp_proto_metrics(ds, path: str) -> int:
    """MetricsData sink — one ``.pb`` file per block."""
    return _write_signal(ds, path, encode_otlp_proto_metrics, ".pb")


def read_otlp_proto_logs(paths):
    """File(s) of serialized LogsData → flat-row Dataset."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        decode_otlp_proto_files, batch_format="pyarrow"
    )


def write_otlp_proto_logs(ds, path: str) -> int:
    """OTLP-proto sink: each block marshals to one ``LogsData`` file
    (``.pb``), same naming/idempotency contract as
    ``write_otlp_json_logs`` (atomic publish, stale-file cleanup,
    task-stable names across retries). Returns files written."""
    import hashlib
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        if stale.endswith(".pb") or stale.endswith(".tmp"):
            os.unlink(os.path.join(path, stale))
    run_id = uuid.uuid4().hex[:8]

    class _EncWrite:
        def __init__(self):
            self.task = None
            self.seq = 0

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"written": pa.array([], type=pa.int64())})
            import ray

            tid = ray.get_runtime_context().get_task_id() or "task"
            if tid != self.task:
                self.task, self.seq = tid, 0
            payload = encode_otlp_proto_batch(t)
            digest = hashlib.sha1(payload).hexdigest()[:12]
            name = f"{run_id}-{tid[:16]}-{self.seq:04d}-{digest}"
            self.seq += 1
            tmp = f"{path}/.{name}.tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, f"{path}/{name}.pb")  # atomic publish
            return pa.table({"written": pa.array([1], type=pa.int64())})

    out = ds.map_batches(_EncWrite, batch_format="pyarrow", concurrency=(1, 8))
    return int(out.sum("written") or 0)
