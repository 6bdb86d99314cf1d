"""The flagship pipeline: parse → enrich → route → count → sinks.

The Ray-Data rendering of the canonical reference log path
(SURVEY.md §3.1): filelog receiver + operator chain
→ processors → routing connector → file exporters + count connector.

Topology (one streaming execution, no mid-pipeline materialization):

    read_parquet(transcript shards)               # pruned columns
      → map_batches(ParseChain)                   # ONE fused stage:
            regex "grok" + json + keyvalue parse, severity map,
            OTTL statement group
      → map_batches(LookupEnricher, concurrency)  # actor pool, broadcast dicts
      → map_batches(Router.label)                 # route bitmask column
      → per sink: bit-test filter → write_parquet / count-aggregate

Counts pre-aggregate per block inside ``map_batches`` and only then
shuffle (CountConnector docstring) — the tiny-final-groupby pattern.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages import (
    Chain,
    CountConnector,
    JsonParser,
    KeyValueParser,
    MetricDef,
    RegexParser,
    Router,
    RouteSpec,
    SeverityParser,
    TransformProcessor,
)
from ..stages.enrich import LookupEnricher

#: the "grok" pattern for log-line turns (FIXTURES.md §1 template).
LOG_RE = (
    r"^(?P<level>TRACE|DEBUG|INFO|WARN|ERROR|FATAL) "
    r"latency_ms=(?P<latency_ms>\d+) status=(?P<status>\d+) msg=(?P<msg>\S+)$"
)

#: enrichment lookups (FIXTURES.md §2) — broadcast small sides.
TOOL_SERVICE = {
    "search": {"service": "search-svc", "team": "find"},
    "code_exec": {"service": "exec-svc", "team": "run"},
    "browser": {"service": "web-svc", "team": "surf"},
    "db_query": {"service": "data-svc", "team": "store"},
    "calculator": {"service": "math-svc", "team": "run"},
    "": {"service": "chat-svc", "team": "talk"},
}
TOOL_SERVICE_DEFAULTS = {"service": "chat-svc", "team": "talk"}

ROLE_RESOURCE = {
    "user": {"resource_kind": "human", "priority": 1},
    "assistant": {"resource_kind": "model", "priority": 2},
    "system": {"resource_kind": "control", "priority": 3},
    "tool": {"resource_kind": "tool", "priority": 2},
}
ROLE_RESOURCE_DEFAULTS = {"resource_kind": "unknown", "priority": 0}

#: routing table (FIXTURES.md §3; reference routingconnector semantics).
ROUTES = RouteSpec(
    routes=[
        ('service == "search-svc"', ["search"]),
        ("severity_number >= 17", ["errors"]),
        ("attributes.status >= 500", ["errors", "audit"]),
        ('role == "tool"', ["tools"]),
    ],
    match_once=True,
    default_sinks=["default"],
)

#: count-connector metric definitions (FIXTURES.md §4).
METRICS = [
    MetricDef("turn.count"),
    MetricDef("error.count", conditions=["severity_number >= 17"]),
    MetricDef("turns.by.role.tool", attributes=[("role", None), ("tool", "none")]),
    MetricDef("turns.by.service", attributes=[("service", None)]),
]


def build_parse_chain(on_error: str = "send") -> Chain:
    """The fused parse stage: grok + json + kv + severity + OTTL edits."""
    return Chain(
        [
            RegexParser(
                LOG_RE,
                types={"latency_ms": "int64", "status": "int64"},
                on_error=on_error,
            ),
            JsonParser(
                fields={"event": "string", "latency_ms": "int64"},
                prefix="attributes.",
                if_expr='IsMatch(text, "^\\\\{")',
                on_error=on_error,
            ),
            KeyValueParser(
                fields=["latency_ms", "status", "region"],
                types={"latency_ms": "int64", "status": "int64"},
                if_expr='IsMatch(text, "^latency_ms=")',
                on_error=on_error,
            ),
            SeverityParser(parse_from="attributes.level"),
            TransformProcessor(
                [
                    'set(attributes.slow, true) where attributes.latency_ms > 1500',
                    'set(attributes.msg, ConvertCase(attributes.msg, "upper")) '
                    "where severity_number >= 17",
                ]
            ),
        ]
    )


def flagship(ds, enrich_concurrency: int = 4, batch_size: int = 65_536):
    """Build the full pipeline over a transcript Dataset.

    Returns ``(sinks, counts)``: sink name → routed Dataset, and sink
    name → count-aggregate Dataset (the count connector sits after the
    routing fan-out, connector/countconnector/connector.go:165-201).
    """
    parse = build_parse_chain()
    parsed = ds.map_batches(
        parse, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    enriched = parsed.map_batches(
        LookupEnricher,
        fn_constructor_kwargs={
            "key_col": "tool",
            "table": TOOL_SERVICE,
            "defaults": TOOL_SERVICE_DEFAULTS,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=(1, enrich_concurrency),
    )
    router = Router(ROUTES)
    sinks = router.fanout(enriched)
    cc = CountConnector(METRICS)
    counts = {name: cc.aggregate(sds) for name, sds in sinks.items()}
    return sinks, counts


def run_flagship(input_path: str, sink_root: str, resume: bool = True,
                 enrich_concurrency: int = 4):
    """Checkpointed end-to-end run over a directory of transcript shards.

    Partitions = input files grouped one-per-partition; per-partition
    sinks + counts land under ``sink_root`` with committed manifests
    (state/checkpoint.py). Returns the lineage records.
    """
    import glob
    import os

    import ray.data as rd

    from ..state import run_partitioned

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_path}")
    # one partition per input shard → deterministic partition ids
    partitions = {os.path.splitext(os.path.basename(f))[0]: [f] for f in files}

    def pipeline(shard_files: list[str]) -> dict:
        ds = rd.read_parquet(shard_files)
        sinks, counts = flagship(ds, enrich_concurrency=enrich_concurrency)
        out = dict(sinks)
        for name, cds in counts.items():
            out[f"{name}__counts"] = cds
        return out

    return run_partitioned(partitions, pipeline, sink_root, resume=resume)
