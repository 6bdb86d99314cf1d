"""Batch operators (stages) — the engine's operator library.

Every stage is a ``BatchOp``: a callable ``(pa.Table) -> pa.Table``
with optional ``if_expr`` gating and ``on_error`` policy, mirroring the
stanza operator contract
(/root/reference/pkg/stanza/operator/helper/transformer.go:78-123).
Chains of stateless ops fuse into ONE ``map_batches`` stage; stateful
ops (enrichment) are actor-pool callables.
"""

from .base import BatchOp, Chain, apply_ops, set_column  # noqa: F401
from .parsers import (  # noqa: F401
    RegexParser,
    JsonParser,
    JsonArrayParser,
    KeyValueParser,
    CsvParser,
    SeverityParser,
    TimeParser,
    TraceParser,
    UriParser,
    SyslogParser,
    ScopeNameParser,
)
from .transformers import (  # noqa: F401
    Add,
    Move,
    Copy,
    Remove,
    Retain,
    Unquote,
    Noop,
    Filter,
    AssignKeys,
    PackStruct,
    FlattenStruct,
)
from .ottl import TransformProcessor, parse_statement  # noqa: F401
from .route import Router, RouteSpec  # noqa: F401
from .count import CountConnector, MetricDef  # noqa: F401
from .enrich import LookupEnricher  # noqa: F401
from .recombine import recombine  # noqa: F401
from .sampler import ProbabilisticSampler  # noqa: F401
from .redact import Redactor  # noqa: F401
from .resourcedetection import ResourceDetectionProcessor, parse_otel_resource_attrs  # noqa: F401
from .sinks import (  # noqa: F401
    drop_sink,
    failover_write,
    stdout_sink,
    write_grouped_parquet,
    write_json_lines,
    write_time_partitioned,
)
from .sampler import cap_per_key, stratified_cap, upsample_by_weight  # noqa: F401
from .cluster import attach_clusters, connected_components, dedup_by_clusters  # noqa: F401
from .decontam import collect_benchmark_ngrams, decontaminate  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    log_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    segment_dedup,
    span_dedup,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    kmeans_lloyd,
    label_centroids,
    lsh_bucket_topk,
    nearest_centroid_confusion,
)
from .agg import approx_distinct, grouped_int_quantiles, grouped_outliers  # noqa: F401
from .text import (  # noqa: F401
    cdc_chunk_stats,
    gopher_rules,
    ngram_novelty,
    normalize_text,
    repetition_stats,
    token_stats,
    top_terms_per_group,
    top_tfidf,
)
from .pack import doc_offsets, pack_sequences  # noqa: F401
from .windows import funnel_steps, retention_cohorts, session_windows, tumbling_window  # noqa: F401
from .tailsampling import tail_sample  # noqa: F401
