"""OTLP/JSON file source — the otlpjsonfilereceiver analog.

Parity: /root/reference/receiver/otlpjsonfilereceiver reads files of
OTLP-JSON ExportLogsServiceRequest lines and emits plog.Logs. Here the
nested OTLP shape (resourceLogs[] → scopeLogs[] → logRecords[]) is
flattened into the engine's flat-row model (SURVEY.md §1.3): resource
attributes become ``resource.<key>`` columns, record attributes
``attributes.<key>``, plus the envelope columns (timestamps, severity,
body, trace/span ids).

The per-file JSON decode is row-wise by nature (deeply nested dynamic
JSON); it runs inside ``map_batches`` over ``read_text`` lines so
decode parallelism = block parallelism.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa


def _attr_value(v: dict) -> Any:
    """OTLP AnyValue → python scalar (stringValue/intValue/...)."""
    if "stringValue" in v:
        return v["stringValue"]
    if "intValue" in v:
        return int(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "arrayValue" in v:
        return json.dumps(v["arrayValue"])
    if "kvlistValue" in v:
        return json.dumps(v["kvlistValue"])
    return None


def _flatten_request(req: dict) -> list[dict]:
    rows = []
    for rl in req.get("resourceLogs", []):
        res = {
            f"resource.{kv['key']}": _attr_value(kv.get("value", {}))
            for kv in rl.get("resource", {}).get("attributes", [])
        }
        for sl in rl.get("scopeLogs", []):
            scope = sl.get("scope", {}).get("name", "")
            for lr in sl.get("logRecords", []):
                row = dict(res)
                row["scope_name"] = scope
                row["time_unix_nano"] = int(lr.get("timeUnixNano", 0) or 0)
                row["observed_time_unix_nano"] = int(
                    lr.get("observedTimeUnixNano", 0) or 0
                )
                row["severity_number"] = int(lr.get("severityNumber", 0) or 0)
                row["severity_text"] = lr.get("severityText", "")
                body = lr.get("body", {})
                row["body"] = (
                    _attr_value(body) if isinstance(body, dict) else body
                )
                for kv in lr.get("attributes", []):
                    row[f"attributes.{kv['key']}"] = _attr_value(kv.get("value", {}))
                row["trace_id"] = lr.get("traceId", "")
                row["span_id"] = lr.get("spanId", "")
                rows.append(row)
    return rows


def decode_otlp_json_lines(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch of OTLP-JSON lines → flat log-record rows. Unknown keys
    across lines are unioned (nulls elsewhere)."""
    rows: list[dict] = []
    for line in t[text_col].to_pylist():
        if not line or not line.strip():
            continue
        try:
            req = json.loads(line)
        except ValueError:
            continue
        rows.extend(_flatten_request(req))
    if not rows:
        return pa.table({"body": pa.array([], type=pa.string())})
    cols = sorted({k for r in rows for k in r})
    return pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})


def read_otlp_json_logs(paths):
    """File(s) of OTLP-JSON lines → flat-row Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(
        decode_otlp_json_lines, batch_format="pyarrow"
    )
