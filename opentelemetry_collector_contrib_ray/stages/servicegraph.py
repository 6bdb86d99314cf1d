"""Service-graph connector: caller→callee edge metrics from paired
client/server spans.

Parity: /root/reference/connector/servicegraphconnector/connector.go —
the reference pairs spans with a parent/child request relationship
(client span_id == server parent_span_id, README "How it works"),
holds unpaired spans in an in-memory store until the partner arrives,
and emits per-edge series keyed by (client, server): request totals,
failed totals, and latency histograms
(connector.go:70-76 reqClient/ServerDurationSeconds{Count,Sum,Bucket}).

Batch rendering: the bounded-wait in-memory pairing store becomes ONE
hash-partitioned join on the pairing key (client.span_id ==
server.parent_span_id) — Ray Data's native hash join co-locates every
possible pair, so "wait for the partner" is simply join locality;
spans with no partner drop out exactly like store-expired spans. The
per-edge aggregate is a per-batch vectorized combiner followed by a
``compact_groupby`` (edge cardinality = services², tiny), so only
edge-partial rows leave the map stage.

Histogram: cumulative ``le_<bound>`` counts over the SERVER duration
(explicit-bucket, the reference's reqServerDurationSecondsBucketCounts)
as plain columns — one row per edge keeps the output SQL-twinnable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import compact_groupby
from .base import pa_from_pandas
from .joins import bucketed_hash_join


def exceptions_rollup(span_events, dims: list[str],
                      event_name_col: str = "event_name",
                      exception_name: str = "exception",
                      count_alias: str = "exceptions_total"):
    """exceptionsconnector analog
    (/root/reference/connector/exceptionsconnector/connector_metrics.go:173
    buildKey over service + span kind + status code + exception
    type/message; README "Each metric will have at least ..."): span
    events named ``exception`` roll up to one counter row per dimension
    tuple. One vectorized filter + compact_groupby — exception
    cardinality is services × types, tiny. The filtered events
    themselves are the connector's LOG output (``connector_logs.go``);
    callers keep that stream by reusing the filter."""

    def only_exceptions(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[event_name_col], exception_name))

    filtered = span_events.map_batches(only_exceptions, batch_format="pyarrow")
    return compact_groupby(filtered, keys=dims, count_alias=count_alias)


def service_graph_pagerank(edges, src: str = "client", dst: str = "server",
                           weight: str = "n_requests", iterations: int = 3,
                           scale: int = 10 ** 9, damping_num: int = 85,
                           damping_den: int = 100) -> pa.Table:
    """Integer-exact weighted PageRank over the AGGREGATED service graph
    — "which service is most central to the request topology", the
    natural follow-on to the servicegraph connector's edge series
    (connector/servicegraphconnector/README.md visualises exactly this
    graph).

    Scale shape: the iteration runs driver-side over the *aggregated*
    edge table, which has one row per (caller, callee) service pair —
    O(services²), bounded by deployment topology, never by corpus size
    (the broadcast-small pattern; identical reasoning to the tiny
    rollup finishes elsewhere in this repo). The part that scales with
    the corpus — extracting and aggregating billions of span pairs into
    that table — stays fully distributed upstream in
    ``service_graph_edges``.

    All arithmetic is integer so a SQL twin reproduces values
    bit-exactly: ranks are scaled by ``scale``; damping is the rational
    ``damping_num/damping_den`` applied with floor division::

        rank_0(v)    = scale                        for every node
        c_k(u→v)     = rank_k(u) * w(u,v) // outw(u)
        rank_{k+1}(v) = ((den-num)*scale)//den + (num * Σ_u c_k(u→v))//den

    Dangling nodes (no out-edges) keep only the teleport term, matching
    the per-node LEFT JOIN in the SQL twin."""
    if isinstance(edges, pa.Table):
        rows = edges.select([src, dst, weight]).to_pylist()
    else:  # tiny aggregated Dataset — one row per service pair
        rows = edges.select_columns([src, dst, weight]).take_all()
    nodes = sorted({r[src] for r in rows} | {r[dst] for r in rows})
    outw: dict = {}
    for r in rows:
        outw[r[src]] = outw.get(r[src], 0) + int(r[weight])
    rank = {n: scale for n in nodes}
    teleport = ((damping_den - damping_num) * scale) // damping_den
    for _ in range(iterations):
        contrib = {n: 0 for n in nodes}
        for r in rows:
            contrib[r[dst]] += (rank[r[src]] * int(r[weight])) // outw[r[src]]
        rank = {n: teleport + (damping_num * contrib[n]) // damping_den
                for n in nodes}
    return pa.table({
        "service": pa.array(nodes, pa.string()),
        "pagerank": pa.array([rank[n] for n in nodes], pa.int64()),
    })


def service_graph_edges(client_spans, server_spans,
                        client_key: str = "span_id",
                        server_key: str = "parent_span_id",
                        client_service: str = "client_service",
                        server_service: str = "server_service",
                        client_dur: str = "duration_client_ms",
                        server_dur: str = "duration_server_ms",
                        client_failed: str | None = "client_failed",
                        server_failed: str | None = "server_failed",
                        bounds_ms: tuple = (50, 100, 150),
                        num_partitions: int | None = None):
    """Edge metrics from two span Datasets.

    ``client_spans``: one row per outgoing (client-kind) span with its
    span id, service, duration and failure flag. ``server_spans``: one
    row per incoming (server-kind) span carrying the PARENT span id it
    answers. Returns one row per (client, server) edge:
    ``n_requests, n_failed, sum_client_ms, sum_server_ms`` and
    cumulative ``le_<b>`` histogram counts over the server duration.

    A request is failed when EITHER side flags failure (the reference
    marks the edge failed on any error status, connector.go)."""
    pairs = bucketed_hash_join(client_spans, server_spans, on=client_key,
                               right_on=server_key, how="inner",
                               num_partitions=num_partitions)
    bounds = [int(b) for b in bounds_ms]

    def indicators(t: pa.Table) -> pa.Table:
        """Per-batch edge partials: vectorized flag/bucket columns then
        one pandas hashed groupby — at most edges×blocks rows shuffle."""
        sdur = pc.cast(t[server_dur], pa.int64()).to_numpy(zero_copy_only=False)
        cdur = pc.cast(t[client_dur], pa.int64()).to_numpy(zero_copy_only=False)
        failed = np.zeros(t.num_rows, dtype=bool)
        for col in (client_failed, server_failed):
            if col is not None:
                failed |= pc.fill_null(
                    pc.cast(t[col], pa.bool_()), False).to_numpy(zero_copy_only=False)
        cols = {
            "client": t[client_service].to_numpy(zero_copy_only=False),
            "server": t[server_service].to_numpy(zero_copy_only=False),
            "n_requests": np.ones(t.num_rows, dtype=np.int64),
            "n_failed": failed.astype(np.int64),
            "sum_client_ms": cdur,
            "sum_server_ms": sdur,
        }
        for b in bounds:
            cols[f"le_{b}"] = (sdur <= b).astype(np.int64)
        df = pd.DataFrame(cols)
        g = df.groupby(["client", "server"], as_index=False, sort=False).sum()
        return pa_from_pandas(g)

    partial = pairs.map_batches(indicators, batch_format="pyarrow")
    sum_cols = {c: c for c in
                ["n_requests", "n_failed", "sum_client_ms", "sum_server_ms"]
                + [f"le_{b}" for b in bounds]}
    return compact_groupby(partial, keys=["client", "server"], sum_cols=sum_cols)
