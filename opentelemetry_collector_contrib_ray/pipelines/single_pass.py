"""Single-pass flagship runner — the at-scale consumption shape.

``flagship()`` returns one lazy Dataset per sink, which is right for
ad-hoc queries but re-executes the shared parse lineage once per
consumed sink. At 100 TB the pipeline must touch the input ONCE:

  pass 1 (streaming): parse → enrich → route-label → expand rows to
    (sink, row) — multi-sink routes duplicate, reference semantics
    (routingconnector README.md:33-40) — → ``write_parquet``
    partitioned by sink (Hive layout = the grouping_file_exporter
    analog, exporter/fileexporter/grouping_file_exporter.go:25-70).
  counts: three modes.
    - ``counts_mode="partials"`` (THE DEFAULT): each expand task writes
      its per-batch partial count table to a sidecar parquet file named
      by a digest of the batch identity + partial content. A re-executed
      task deterministically re-derives the SAME digest and overwrites
      the SAME file, so retries and speculative duplicates are
      idempotent — exactly-once without re-reading the output. Final
      counts = read the tiny sidecar dir + one aggregation (the
      countconnector partial+final shape, counter.go:38-108, with the
      durable-sidecar twist replacing fire-once delta emission).
    - ``counts_mode="two_pass"``: count connector over the *written*
      sinks, reading only the projected attribute columns back
      (columnar pruning), one tiny groupby serving every sink.
      Exactly-once (counts derive from committed output); costs a
      second pruned read (~30-40% of headline wall-time).
    - ``counts_mode="inline"``: a sidecar aggregation actor POOL (the
      one place the Dataset API can't express the semantics: a second
      output stream off the same pass). Each expand task pushes its
      tiny per-batch partial count table to a shard picked by
      hash(batch) — sharding removes the single-actor serialization
      point — and blocks on the ack, so when the write finishes all
      partials are in. Caveat: like the reference's per-batch delta Sum
      emission (countconnector/counter.go partials are fire-once), a
      re-executed task would re-add its partials — NOT retry-safe;
      opt in only for single-attempt runs where the second read
      matters.

No full-dataset materialization at any point.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages import CountConnector
from ..stages.enrich import LookupEnricher
from ..stages.route import ROUTE_BITS_COL, Router
from .flagship import (
    METRICS,
    ROUTES,
    TOOL_SERVICE,
    TOOL_SERVICE_DEFAULTS,
    build_parse_chain,
)


def expand_by_sink(router: Router, counters=None, cc: CountConnector | None = None,
                   partials_dir: str | None = None):
    """Labeled batch → one copy of each row per receiving sink, with a
    ``sink`` partition column. Side-channel count partials, either:
    - ``counters``: ship to a CountsCollector actor shard (inline mode);
    - ``partials_dir``: write a digest-named sidecar parquet per batch
      (idempotent under task re-execution — same batch ⇒ same digest ⇒
      same file overwritten)."""
    sink_bits = [(s, np.uint64(b)) for s, b in router._sink_bits.items()]
    side = bool(counters) or partials_dir is not None

    def fn(t: pa.Table) -> pa.Table:
        import ray

        bits = t[ROUTE_BITS_COL].to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        base = t.drop_columns([ROUTE_BITS_COL])
        # count partials for ALL sinks in one grouped pass per metric
        # (sink-indicator sums) — the per-sink-subset version redid the
        # masks/groupby/JSON-encode once per receiving sink
        partials = cc.partial_by_sink(base, bits, sink_bits) if side else []
        for sink, b in sink_bits:
            mask = (bits & b) != 0
            if mask.any():
                sel = base.filter(pa.array(mask))
                parts.append(sel.append_column("sink", pa.array([sink] * sel.num_rows)))
        if partials and partials_dir is not None:
            _write_partial_sidecar(partials_dir, t, bits, partials)
        elif partials and counters:
            shard = counters[int(bits[0] ^ np.uint64(t.num_rows)) % len(counters)]
            ray.get(shard.add.remote(partials))  # ack before task completes
        if not parts:
            return base.slice(0, 0).append_column("sink", pa.array([], type=pa.string()))
        return pa.concat_tables(parts)

    return fn


def _write_partial_sidecar(partials_dir: str, t: pa.Table, bits, partials):
    """Write this batch's partial counts to ``<digest>.parquet``.
    The digest covers the batch identity (boundary rows + size + route
    bitmask) and the partial content, both deterministic functions of
    the input block — a retried task reproduces the digest exactly and
    the overwrite is a no-op, so no partial is ever double-counted."""
    import hashlib

    import pyarrow.parquet as pq

    ident = [str(t.num_rows), str(int(bits[0])), str(int(bits[-1]))]
    for col in ("conv_id", "turn_idx", "event_id"):
        if col in t.column_names:
            c = t[col]
            ident.append(str(c[0].as_py()))
            ident.append(str(c[-1].as_py()))
    digest = hashlib.blake2b(
        ("|".join(ident) + repr(partials)).encode(), digest_size=16
    ).hexdigest()
    rows = [
        {"sink": s, "metric": m, "attrs": a, "count": c}
        for s, metrics, attrs, counts in partials
        for m, a, c in zip(metrics, attrs, counts)
    ]
    tbl = pa.Table.from_pylist(rows)
    os.makedirs(partials_dir, exist_ok=True)
    tmp = os.path.join(partials_dir, f".{digest}.{os.getpid()}.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(partials_dir, f"{digest}.parquet"))


def _make_counts_collectors(n_shards: int = 8):
    import ray

    @ray.remote(num_cpus=0)
    class CountsCollector:
        def __init__(self):
            self.acc: dict = {}

        def add(self, partials):
            for sink, metrics, attrs, counts in partials:
                for m, a, c in zip(metrics, attrs, counts):
                    k = (sink, m, a)
                    self.acc[k] = self.acc.get(k, 0) + c
            return True

        def totals(self):
            return self.acc

    return [CountsCollector.remote() for _ in range(n_shards)]


def run_single_pass(input_path: str, out_root: str, enrich_concurrency: int = 8,
                    batch_size: int = 65_536, write_counts: bool = True,
                    counts_mode: str = "partials", counts_shards: int = 8,
                    enrich_mode: str = "auto"):
    """Streaming pass writes all sinks; counts per docstring modes.
    Returns {"sinks": dir, "counts": {sink: pandas}}."""
    import shutil

    import ray
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    parse = build_parse_chain()
    router = Router(ROUTES)
    cc = CountConnector(METRICS)
    counters = None
    partials_dir = None
    if write_counts and counts_mode == "inline":
        counters = _make_counts_collectors(counts_shards)
    elif write_counts and counts_mode == "partials":
        partials_dir = os.path.join(out_root, "_count_partials")
        shutil.rmtree(partials_dir, ignore_errors=True)  # stale digests

    # Enrichment table routing: TOOL_SERVICE is tiny, so the enricher
    # INSTANCE ships in the task closure (broadcast-small-side — no
    # actor pool to spin up, and the stage fuses with parse/label into
    # one task op). A big table (k8s-scale metadata) takes the actor
    # pool so it is built once per actor, not per task.
    small_table = enrich_mode == "task" or (
        enrich_mode == "auto" and len(TOOL_SERVICE) <= 10_000
    )
    if enrich_mode == "actor":
        small_table = False
    enriched = ds.map_batches(parse, batch_format="pyarrow", batch_size=batch_size,
                              zero_copy_batch=True)
    if small_table:
        enriched = enriched.map_batches(
            LookupEnricher("tool", TOOL_SERVICE, TOOL_SERVICE_DEFAULTS),
            batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
        )
    else:
        enriched = enriched.map_batches(
            LookupEnricher,
            fn_constructor_kwargs={
                "key_col": "tool", "table": TOOL_SERVICE,
                "defaults": TOOL_SERVICE_DEFAULTS,
            },
            batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
            concurrency=(max(2, enrich_concurrency // 2), enrich_concurrency),
        )
    labeled = (
        enriched
        .map_batches(router.label, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(expand_by_sink(router, counters, cc, partials_dir),
                     batch_format="pyarrow", zero_copy_batch=True)
    )
    sink_dir = os.path.join(out_root, "sinks")
    # zstd: ~20% fewer bytes than snappy for these string-heavy sinks —
    # compression CPU scales with cores, disk bandwidth doesn't, so
    # trading bytes for cycles improves scaling on write-bound tails
    labeled.write_parquet(sink_dir, partition_cols=["sink"], compression="zstd")

    counts: dict[str, pd.DataFrame] = {}
    if write_counts and counters is not None:
        acc: dict = {}
        for shard_acc in ray.get([c.totals.remote() for c in counters]):
            for k, v in shard_acc.items():
                acc[k] = acc.get(k, 0) + v
        rows = [
            {"sink": s, "metric": m, "attrs": a, "count": c}
            for (s, m, a), c in sorted(acc.items())
        ]
        df = pd.DataFrame(rows, columns=["sink", "metric", "attrs", "count"])
        for s, g in df.groupby("sink"):
            counts[s] = g.drop(columns=["sink"]).reset_index(drop=True)
        for c in counters:
            ray.kill(c)
    elif write_counts and partials_dir is not None:
        import pyarrow.dataset as pads

        df = pads.dataset(partials_dir, format="parquet").to_table().to_pandas()
        if len(df):
            agg = (
                df.groupby(["sink", "metric", "attrs"], as_index=False)["count"].sum()
                .sort_values(["sink", "metric", "attrs"])
            )
            for s, g in agg.groupby("sink"):
                counts[s] = g.drop(columns=["sink"]).reset_index(drop=True)
    elif write_counts:
        from ..stages.count import aggregate_by_sink

        need_cols = ["role", "tool", "service", "severity_number", "attributes.status"]
        # ONE pruned read over the whole Hive-partitioned fan-out; the
        # `sink` partition column is reconstructed by the reader.
        sds = rd.read_parquet(sink_dir, columns=need_cols + ["sink"])
        all_counts = aggregate_by_sink(cc, sds).to_pandas()
        for s, g in all_counts.groupby("sink"):
            counts[s] = g.drop(columns=["sink"]).reset_index(drop=True)
    return {"sinks": sink_dir, "counts": counts}
