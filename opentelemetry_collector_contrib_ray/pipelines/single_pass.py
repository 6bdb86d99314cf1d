"""Single-pass flagship runner — the at-scale consumption shape.

``flagship()`` returns one lazy Dataset per sink, which is right for
ad-hoc queries but re-executes the shared parse lineage once per
consumed sink. At 100 TB the pipeline must touch the input ONCE:

  pass 1 (streaming): parse → enrich → route-label → expand rows to
    (sink, row) — multi-sink routes duplicate, reference semantics
    (routingconnector README.md:33-40) — → ``write_parquet``
    partitioned by sink (Hive layout = the grouping_file_exporter
    analog, exporter/fileexporter/grouping_file_exporter.go:25-70).
  counts: two modes.
    - ``counts_mode="two_pass"``: count connector over the *written*
      sinks, reading only the projected attribute columns back
      (columnar pruning), one tiny groupby serving every sink.
      Exactly-once under task retries (counts derive from committed
      output) — the fault-tolerant default for checkpointed runs.
    - ``counts_mode="inline"``: a sidecar aggregation ACTOR (the one
      place the Dataset API can't express the semantics: a second
      output stream off the same pass). Each expand task pushes its
      tiny per-batch partial count table to the collector and blocks
      on the ack, so when the write finishes all partials are in.
      Caveat: like the reference's per-batch delta Sum emission
      (countconnector/counter.go partials are fire-once), a re-executed
      task would re-add its partials — use two_pass when task retries
      are expected.

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


def expand_by_sink(router: Router, counter=None, cc: CountConnector | None = None):
    """Labeled batch → one copy of each row per receiving sink, with a
    ``sink`` partition column. With ``counter`` (a CountsCollector actor
    handle) each batch also ships its partial counts inline."""
    sink_bits = [(s, np.uint64(b)) for s, b in router._sink_bits.items()]

    def fn(t: pa.Table) -> pa.Table:
        import ray

        bits = t[ROUTE_BITS_COL].to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        base = t.drop_columns([ROUTE_BITS_COL])
        partials = []
        for sink, b in sink_bits:
            mask = (bits & b) != 0
            if mask.any():
                sel = base.filter(pa.array(mask))
                parts.append(sel.append_column("sink", pa.array([sink] * sel.num_rows)))
                if counter is not None:
                    p = cc.partial(sel)
                    partials.append(
                        (sink, p["metric"].to_pylist(), p["attrs"].to_pylist(),
                         p["count"].to_pylist())
                    )
        if counter is not None and partials:
            ray.get(counter.add.remote(partials))  # ack before task completes
        if not parts:
            return base.slice(0, 0).append_column("sink", pa.array([], type=pa.string()))
        return pa.concat_tables(parts)

    return fn


def _make_counts_collector():
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

    return CountsCollector.remote()


def run_single_pass(input_path: str, out_root: str, enrich_concurrency: int = 8,
                    batch_size: int = 65_536, write_counts: bool = True,
                    counts_mode: str = "inline"):
    """Streaming pass writes all sinks; counts per docstring modes.
    Returns {"sinks": dir, "counts": {sink: pandas}}."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    parse = build_parse_chain()
    router = Router(ROUTES)
    cc = CountConnector(METRICS)
    counter = None
    if write_counts and counts_mode == "inline":
        counter = _make_counts_collector()

    labeled = (
        ds.map_batches(parse, batch_format="pyarrow", batch_size=batch_size,
                       zero_copy_batch=True)
        .map_batches(
            LookupEnricher,
            fn_constructor_kwargs={
                "key_col": "tool", "table": TOOL_SERVICE,
                "defaults": TOOL_SERVICE_DEFAULTS,
            },
            batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
            concurrency=(max(2, enrich_concurrency // 2), enrich_concurrency),
        )
        .map_batches(router.label, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(expand_by_sink(router, counter, cc), batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    sink_dir = os.path.join(out_root, "sinks")
    labeled.write_parquet(sink_dir, partition_cols=["sink"])

    counts: dict[str, pd.DataFrame] = {}
    if write_counts and counter is not None:
        acc = ray.get(counter.totals.remote())
        rows = [
            {"sink": s, "metric": m, "attrs": a, "count": c}
            for (s, m, a), c in sorted(acc.items())
        ]
        df = pd.DataFrame(rows, columns=["sink", "metric", "attrs", "count"])
        for s, g in df.groupby("sink"):
            counts[s] = g.drop(columns=["sink"]).reset_index(drop=True)
        ray.kill(counter)
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
