"""otelray — a Ray-Data-native log/telemetry processing engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the OpenTelemetry Collector contrib log pipeline
(reference: /root/reference, reakaleek/opentelemetry-collector-contrib):

    receiver (parse) -> processor chain (transform/enrich/filter)
      -> routing connector (fan-out) -> exporter sinks (+ count connector)

re-expressed as idiomatic Ray Data: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, and explicit hash shuffles (``groupby``) for the wide steps.

Data model (see SURVEY.md §1): flat Arrow rows. The reference's
``entry.Entry`` envelope (pkg/stanza/entry/entry.go:14-26) maps to
top-level columns; the dynamic ``attributes``/``resource`` maps map to
flat columns with dotted names (``attributes.latency_ms``) so every
operator stays vectorized; ``pack_struct`` materializes nesting at the
edges when a consumer wants the nested shape.
"""

__version__ = "0.1.0"

from . import schema  # noqa: F401
