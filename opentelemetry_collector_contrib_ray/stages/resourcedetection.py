"""Resource detection — env/system detectors applied as resource.* columns.

Parity: processor/resourcedetectionprocessor
(config.go:32-34 ``override``; internal/resourcedetection.go:178-193
``MergeResource`` — detected attrs overwrite existing when
``override=True`` else only fill missing; internal/env/env.go:44-62 —
``OTEL_RESOURCE_ATTRIBUTES`` ``k=v,...`` pairs, percent-decoded;
internal/system — host.name / os.type; resourcedetection.go:163-176
``attributes`` keep-filter).

Ray shape: detection runs ONCE at stage build on the driver; the tiny
detected dict rides along in the task closure (broadcast with the spec,
never recomputed per batch). Applying it is a vectorized column
write/fill per batch — no per-row work. Cloud-metadata detectors (ec2,
gcp, azure, ...) need instance metadata endpoints that don't exist here;
the ``static`` detector stands in for them in tests.
"""

from __future__ import annotations

import re
import urllib.parse

import pyarrow as pa
import pyarrow.compute as pc

from .base import set_column

_LABEL_RX = re.compile(r"\s*([\x00-\x7f]{1,256}?)\s*=\s*([\x00-\x7f]{0,256}?)\s*(?:,|$)")


def parse_otel_resource_attrs(labels: str) -> dict[str, str]:
    """``k=v,k2=v2`` → dict, values percent-decoded (env/env.go:69-99)."""
    labels = labels.strip()
    if not labels:
        return {}
    out: dict[str, str] = {}
    prev = 0
    for m in _LABEL_RX.finditer(labels):
        if m.start() != prev:
            raise ValueError(f"invalid resource format, invalid text: {labels[prev:m.start()]!r}")
        out[m.group(1)] = urllib.parse.unquote(m.group(2))
        prev = m.end()
    if not out:
        raise ValueError(f"invalid resource format: {labels!r}")
    return out


class ResourceDetectionProcessor:
    """Set/fill ``resource.*`` columns from detected attributes.

    - ``detectors``: ordered names from {"env", "system", "static"};
      merged first-wins across detectors (resourcedetection.go provider
      merge with overrideTo=false).
    - ``override``: True (reference default) — detected values replace
      existing column values; False — only fill missing/null.
    - ``attributes``: optional keep-list filter over detected keys.
    - ``environ`` / ``system_info`` / ``static_attributes``: injectable
      for deterministic tests (default: real ``os.environ`` /
      hostname+platform).
    """

    def __init__(self, detectors=("env",), override: bool = True,
                 prefix: str = "resource.",
                 attributes: list[str] | None = None,
                 environ: dict | None = None,
                 system_info: dict | None = None,
                 static_attributes: dict | None = None):
        import os as _os

        env = environ if environ is not None else _os.environ
        detected: dict[str, object] = {}
        for d in detectors:
            if d == "env":
                labels = env.get("OTEL_RESOURCE_ATTRIBUTES", "") or env.get("OTEL_RESOURCE", "")
                try:
                    got = parse_otel_resource_attrs(labels) if labels.strip() else {}
                except ValueError:
                    got = {}  # reference clears attrs and reports the error
            elif d == "system":
                if system_info is not None:
                    got = dict(system_info)
                else:
                    import socket
                    import sys as _sys

                    os_type = {"linux": "linux", "darwin": "darwin", "win32": "windows"}.get(
                        _sys.platform, _sys.platform
                    )
                    got = {"host.name": socket.gethostname(), "os.type": os_type}
            elif d == "static":
                got = dict(static_attributes or {})
            else:
                raise ValueError(f"unknown detector {d!r}")
            for k, v in got.items():
                detected.setdefault(k, v)  # first detector wins
        if attributes:
            keep = set(attributes)
            detected = {k: v for k, v in detected.items() if k in keep}
        self.detected = detected
        self.override = override
        self.prefix = prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        for k, v in self.detected.items():
            name = self.prefix + k
            arr = pa.array([v] * n)
            if name in t.column_names and not self.override:
                col = t[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                arr = pc.fill_null(col, v)
            t = set_column(t, name, arr)
        return t
