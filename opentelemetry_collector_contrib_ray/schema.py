"""Core schemas and the severity model.

Reference parity:
- transcript envelope = BASELINE.json ``input_hint``:
  (conv_id:string, turn_idx:int32, role:string, text:string,
   tool:string, ts:timestamp[us]).
- severity: the reference's 24-level enum + text aliases
  (/root/reference/pkg/stanza/entry/severity.go:11-51 and the
  ``otel`` preset mapping in
  operator/helper/severity_builder.go:17-106).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- transcripts

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------- severity

# 25-value severity number space (0 = unspecified/default).
SEVERITY_DEFAULT = 0
SEVERITY_TRACE = 1
SEVERITY_DEBUG = 5
SEVERITY_INFO = 9
SEVERITY_WARN = 13
SEVERITY_ERROR = 17
SEVERITY_FATAL = 21

#: canonical text for each base level (severity_builder.go defaults).
SEVERITY_TEXT = {
    0: "",
    1: "TRACE", 2: "TRACE2", 3: "TRACE3", 4: "TRACE4",
    5: "DEBUG", 6: "DEBUG2", 7: "DEBUG3", 8: "DEBUG4",
    9: "INFO", 10: "INFO2", 11: "INFO3", 12: "INFO4",
    13: "WARN", 14: "WARN2", 15: "WARN3", 16: "WARN4",
    17: "ERROR", 18: "ERROR2", 19: "ERROR3", 20: "ERROR4",
    21: "FATAL", 22: "FATAL2", 23: "FATAL3", 24: "FATAL4",
}

#: the ``otel`` preset token -> number mapping (case-insensitive),
#: including the alias sets from severity_builder.go:17-106.
SEVERITY_ALIASES: dict[str, int] = {}
for _num, _text in SEVERITY_TEXT.items():
    if _text:
        SEVERITY_ALIASES[_text.lower()] = _num
SEVERITY_ALIASES.update(
    {
        "default": 0,
        "trace": 1,
        "debug": 5,
        "info": 9,
        "information": 9,
        "informational": 9,
        "notice": 10,
        "warn": 13,
        "warning": 13,
        "error": 17,
        "err": 17,
        "critical": 21,
        "crit": 21,
        "fatal": 21,
        "alert": 22,
        "emergency": 23,
        "emerg": 23,
        "catastrophe": 24,
        # numeric severity-number tokens map to themselves
        **{str(i): i for i in range(25)},
    }
)


def severity_text_for(num: int) -> str:
    return SEVERITY_TEXT.get(int(num), "")
