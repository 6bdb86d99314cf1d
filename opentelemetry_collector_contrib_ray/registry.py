"""Operator registry — the engine's user-extension surface.

Parity: stanza's global operator registry
(/root/reference/pkg/stanza/operator/registry.go:7,38-45) where
operators are declared in YAML by ``type`` and built by registered
factories; OTTL's per-context function factory maps
(pkg/ottl/parser.go:54-60). Here: ``register_op(name, factory)`` makes
an operator constructible from a pipeline spec dict; any callable
``fn(pa.Table) -> pa.Table`` (or a BatchOp subclass) qualifies.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_op(name: str, factory: Callable[..., Any]) -> None:
    _REGISTRY[name] = factory


def build_op(spec: dict) -> Any:
    """{"type": name, ...kwargs} → operator instance."""
    spec = dict(spec)
    typ = spec.pop("type")
    if typ not in _REGISTRY:
        raise ValueError(f"unknown operator type {typ!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[typ](**spec)


def registered_ops() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from .stages import (
        Add,
        AssignKeys,
        Copy,
        CsvParser,
        Filter,
        FlattenStruct,
        JsonParser,
        KeyValueParser,
        Move,
        Noop,
        PackStruct,
        RegexParser,
        Remove,
        Retain,
        ScopeNameParser,
        SeverityParser,
        SyslogParser,
        TimeParser,
        TraceParser,
        TransformProcessor,
        Unquote,
        UriParser,
    )
    from .stages.attributes import AttributesProcessor
    from .stages.redact import Redactor
    from .stages.resourcedetection import ResourceDetectionProcessor
    from .stages.sampler import ProbabilisticSampler

    for name, cls in {
        "regex_parser": RegexParser,
        "json_parser": JsonParser,
        "keyvalue_parser": KeyValueParser,
        "csv_parser": CsvParser,
        "severity_parser": SeverityParser,
        "time_parser": TimeParser,
        "trace_parser": TraceParser,
        "uri_parser": UriParser,
        "syslog_parser": SyslogParser,
        "scope_name_parser": ScopeNameParser,
        "add": Add,
        "move": Move,
        "copy": Copy,
        "remove": Remove,
        "retain": Retain,
        "flatten": FlattenStruct,
        "pack": PackStruct,
        "assign_keys": AssignKeys,
        "unquote": Unquote,
        "noop": Noop,
        "filter": Filter,
        "transform": TransformProcessor,
        "attributes": AttributesProcessor,
        "redact": Redactor,
        "resource_detection": ResourceDetectionProcessor,
        "sampler": ProbabilisticSampler,
    }.items():
        register_op(name, cls)


_register_builtins()
