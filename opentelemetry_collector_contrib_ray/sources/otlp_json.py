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


def _any_value(v) -> dict:
    """python scalar → OTLP AnyValue (inverse of _attr_value)."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, (int,)):
        return {"intValue": str(v)}  # proto3 JSON: int64 as string
    if isinstance(v, float):
        return {"doubleValue": v}
    return {"stringValue": "" if v is None else str(v)}


def encode_otlp_json_batch(t: pa.Table) -> str:
    """Flat log-record batch → ONE OTLP-JSON ExportLogsServiceRequest
    line (the fileexporter marshal analog,
    /root/reference/exporter/fileexporter/file_exporter.go:38-45 — one
    marshaled plog batch per line). Rows group by their ``resource.*``
    values into resourceLogs, then by ``scope_name`` into scopeLogs.
    Row-wise by nature (nested dynamic JSON), mirroring the decoder.
    """
    res_cols = [c for c in t.column_names if c.startswith("resource.")]
    attr_cols = [c for c in t.column_names if c.startswith("attributes.")]
    data = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    groups: dict = {}
    for i in range(n):
        res_key = tuple((c, data[c][i]) for c in res_cols if data[c][i] is not None)
        scope = data.get("scope_name", [""] * n)[i] or ""
        rec: dict = {}
        tun = data.get("time_unix_nano", [0] * n)[i]
        if tun:
            rec["timeUnixNano"] = str(int(tun))
        otun = data.get("observed_time_unix_nano", [0] * n)[i]
        if otun:
            rec["observedTimeUnixNano"] = str(int(otun))
        sev = data.get("severity_number", [0] * n)[i]
        if sev:
            rec["severityNumber"] = int(sev)
        sevt = data.get("severity_text", [""] * n)[i]
        if sevt:
            rec["severityText"] = sevt
        if "body" in data:
            rec["body"] = _any_value(data["body"][i])
        attrs = [
            {"key": c[len("attributes."):], "value": _any_value(data[c][i])}
            for c in attr_cols if data[c][i] is not None
        ]
        if attrs:
            rec["attributes"] = attrs
        tid = data.get("trace_id", [""] * n)[i]
        if tid:
            rec["traceId"] = tid
        sid = data.get("span_id", [""] * n)[i]
        if sid:
            rec["spanId"] = sid
        groups.setdefault(res_key, {}).setdefault(scope, []).append(rec)

    resource_logs = []
    for res_key, scopes in groups.items():
        rl: dict = {}
        if res_key:
            rl["resource"] = {
                "attributes": [
                    {"key": k[len("resource."):], "value": _any_value(v)}
                    for k, v in res_key
                ]
            }
        rl["scopeLogs"] = [
            {"scope": {"name": scope}, "logRecords": recs}
            for scope, recs in scopes.items()
        ]
        resource_logs.append(rl)
    return json.dumps({"resourceLogs": resource_logs}, separators=(",", ":"))


def write_otlp_json_logs(ds, path: str) -> int:
    """OTLP-JSON lines sink: each block marshals to one request line in
    its own file, named ``{run}-{task}-{seq}-{digest}.jsonl``:

    - ``run`` (fresh per invocation) separates this run's output from
      any earlier run's; stale ``*.jsonl`` files in the directory are
      removed at sink start, so readers never see a mix of old and new
      data after a re-run over changed input.
    - ``task`` (the Ray task id, stable across task RETRIES) + ``seq``
      (per-task batch counter) makes distinct blocks with identical
      content land in distinct files — the returned count equals the
      files on disk — while a retried task rewrites the same names
      (atomic ``os.replace`` publish keeps that idempotent).

    Assumes ``path`` is shared storage, like every file sink. Returns
    the number of files written."""
    import hashlib
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        if stale.endswith(".jsonl") or stale.endswith(".tmp"):
            os.unlink(os.path.join(path, stale))
    run_id = uuid.uuid4().hex[:8]

    class _EncWrite:
        """Per-call state: (task_id → next sequence number). A worker
        runs one task at a time, so resetting the counter whenever the
        task id changes reproduces the same name sequence if a retried
        task lands on a reused worker."""

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
            line = encode_otlp_json_batch(t)
            digest = hashlib.sha1(line.encode()).hexdigest()[:12]
            name = f"{run_id}-{tid[:16]}-{self.seq:04d}-{digest}"
            self.seq += 1
            tmp = f"{path}/.{name}.tmp"
            with open(tmp, "w") as f:
                f.write(line + "\n")
            os.replace(tmp, f"{path}/{name}.jsonl")  # atomic publish
            return pa.table({"written": pa.array([1], type=pa.int64())})

    out = ds.map_batches(_EncWrite, batch_format="pyarrow", concurrency=(1, 8))
    return int(out.sum("written") or 0)
