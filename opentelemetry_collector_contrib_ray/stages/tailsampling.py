"""Tail sampling — whole-trace keep/drop decisions from complete traces.

Batch rendering of processor/tailsamplingprocessor: the reference
buffers spans until a trace is "complete" (decision_wait), then runs
policy evaluators over the assembled trace and forwards or drops ALL
of its spans. In a batch engine the corpus is already complete, so the
same semantics become a two-phase dataflow:

1. **Summarize**: one partial+final aggregate builds a per-trace
   summary row (span count, min/max timestamp, one any-span-matches
   flag per attribute predicate) — only tiny summary rows shuffle,
   never the spans.
2. **Decide + filter**: policy evaluation is one vectorized numpy pass
   over summary rows; the sampled-trace key set then filters the
   original dataset (broadcast ``pc.is_in`` by default, or a
   hash-partitioned semi-join via ``keep_mode='shuffle'`` when the
   sampled-key set itself is too large to broadcast).

Policy parity (internal/sampling/*.go), composed as the processor
does — a trace is kept when ANY top-level policy samples it:

- ``always`` — always_sample.go.
- ``latency`` — latency.go:51-55: duration ≥ threshold_ms, or with an
  upper bound, threshold_ms < duration ≤ upper_threshold_ms.
- ``span_count`` — span_count_sampler.go:37-40: min ≤ n (≤ max).
- ``string_attr`` — string_tag_filter.go: any span's attribute value
  in the configured set; ``invert`` flips the decision.
- ``numeric_attr`` — numeric_tag_filter.go: any span's attribute in
  [min, max].
- ``status_code`` — status_code.go: sugar for a string_attr match on
  the status column.
- ``probabilistic`` — probabilistic.go: deterministic hash of the
  trace key under a scaled threshold (the SQL-twin Knuth/FNV hash from
  stages/sampler.py, so the sample is oracle-reproducible).
- ``and`` — and.go:32-44: all sub-policies must sample.
- ``not`` — inverted decision (invert_match analog).

Partitioning: summaries are (key-hash % num_partitions)-partitioned;
per-worker state is #traces/num_partitions summary rows regardless of
trace fan-out, so hot traces cost only their span scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .sampler import KNUTH, MOD32, fnv1a_hash_strings, sample_threshold
from .base import pa_from_pandas, arrow_out


def _leaf_predicates(policies: list[dict]) -> list[dict]:
    """Flatten the policy tree's per-span attribute predicates; each
    gets a summary flag column ``__f{i}``."""
    leaves: list[dict] = []

    def walk(p: dict):
        t = p["type"]
        if t in ("string_attr", "numeric_attr", "status_code"):
            p["_flag"] = f"__f{len(leaves)}"
            leaves.append(p)
        elif t in ("and", "not"):
            for s in (p["sub"] if t == "and" else [p["sub"]]):
                walk(s)

    for p in policies:
        walk(p)
    return leaves


def _row_predicate(p: dict, t: pa.Table) -> np.ndarray:
    ty = p["type"]
    if ty == "status_code":
        col = pc.cast(t[p["col"]], pa.string())
        return np.asarray(pc.is_in(col, value_set=pa.array(p["values"])).fill_null(False))
    if ty == "string_attr":
        col = pc.cast(t[p["col"]], pa.string())
        return np.asarray(pc.is_in(col, value_set=pa.array(p["values"])).fill_null(False))
    if ty == "numeric_attr":
        v = pc.cast(t[p["col"]], pa.float64(), safe=False)
        m = pc.and_(pc.greater_equal(v, p["min"]), pc.less_equal(v, p["max"]))
        return np.asarray(m.fill_null(False))
    raise ValueError(ty)


def trace_summaries(ds, trace_key: str, ts: str, policies: list[dict],
                    num_partitions: int = 64):
    """Per-trace summary rows: (key, n, min_us, max_us, flag columns)."""
    leaves = _leaf_predicates(policies)

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {trace_key: t[trace_key].to_numpy(zero_copy_only=False),
                "__us": us}
        for p in leaves:
            cols[p["_flag"]] = _row_predicate(p, t).astype(np.int64)
        df = pd.DataFrame(cols)
        aggs = {"n": ("__us", "size"), "min_us": ("__us", "min"),
                "max_us": ("__us", "max")}
        for p in leaves:
            aggs[p["_flag"]] = (p["_flag"], "max")
        out = df.groupby(trace_key, as_index=False, dropna=False).agg(**aggs)
        h = pd.util.hash_pandas_object(out[trace_key], index=False).to_numpy()
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        aggs = {"n": ("n", "sum"), "min_us": ("min_us", "min"),
                "max_us": ("max_us", "max")}
        for p in leaves:
            aggs[p["_flag"]] = (p["_flag"], "max")
        return g.groupby(trace_key, as_index=False, dropna=False).agg(**aggs)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )


def _key_hash(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            return (x * KNUTH) % MOD32
    return fnv1a_hash_strings(col) % MOD32


def evaluate_policies(t: pa.Table, trace_key: str, policies: list[dict]) -> np.ndarray:
    """Vectorized OR-of-policies decision over summary rows."""
    n = np.asarray(t["n"]).astype(np.int64)
    dur_ms = (np.asarray(t["max_us"]).astype(np.int64)
              - np.asarray(t["min_us"]).astype(np.int64)) // 1000

    def ev(p: dict) -> np.ndarray:
        ty = p["type"]
        if ty == "always":
            return np.ones(t.num_rows, dtype=bool)
        if ty == "latency":
            upper = p.get("upper_threshold_ms", 0)
            if not upper:
                return dur_ms >= p["threshold_ms"]
            return (p["threshold_ms"] < dur_ms) & (dur_ms <= upper)
        if ty == "span_count":
            m = n >= p["min"]
            if p.get("max"):
                m &= n <= p["max"]
            return m
        if ty in ("string_attr", "numeric_attr", "status_code"):
            f = np.asarray(t[p["_flag"]]).astype(bool)
            return ~f if p.get("invert") else f
        if ty == "probabilistic":
            thr = np.uint64(sample_threshold(p["percent"]))
            return _key_hash(t[trace_key]) < thr
        if ty == "and":
            m = ev(p["sub"][0])
            for s in p["sub"][1:]:
                m &= ev(s)
            return m
        if ty == "not":
            return ~ev(p["sub"])
        raise ValueError(ty)

    keep = np.zeros(t.num_rows, dtype=bool)
    for p in policies:
        keep |= ev(p)
    return keep


def tail_sample(ds, trace_key: str, ts: str, policies: list[dict],
                num_partitions: int = 64, keep_mode: str = "broadcast"):
    """Filter ``ds`` to the spans of sampled traces."""
    _leaf_predicates(policies)  # assigns flag names in-place
    summaries = trace_summaries(ds, trace_key, ts, policies, num_partitions)

    def decide(t: pa.Table) -> pa.Table:
        keep = evaluate_policies(t, trace_key, policies)
        return pa.table({trace_key: t.filter(pa.array(keep))[trace_key]})

    sampled = summaries.map_batches(decide, batch_format="pyarrow")
    if keep_mode == "shuffle":
        from .joins import large_semi_join

        # Empty summary partitions surface as zero-column blocks that
        # Dataset.join's schema unification rejects ("no match for key
        # field on right side"); a repartition concat-drops them. The
        # key table is one row per kept trace, so this exchange is
        # small next to the span-side join shuffle.
        sampled = sampled.repartition(num_partitions)
        return large_semi_join(ds, sampled, trace_key,
                               num_partitions=num_partitions)
    blocks = [b for b in ray_get_tables(sampled)
              if b.num_columns and b.num_rows]
    if blocks:
        col = pa.concat_tables(blocks)[trace_key]
        keys = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    else:
        keys = pa.array([], type=ds.schema().base_schema.field(trace_key).type)
    import ray

    ref = ray.put(keys)

    def filt(t: pa.Table) -> pa.Table:
        import ray as _ray

        ks = _ray.get(ref)  # local, zero-copy after first resolve
        return t.filter(pc.is_in(t[trace_key], value_set=ks))

    return ds.map_batches(filt, batch_format="pyarrow")


def ray_get_tables(ds) -> list[pa.Table]:
    """Materialize a (small) dataset's blocks as Arrow tables.

    ``materialize()`` first: ``to_arrow_refs`` on a lazy dataset
    executes the plan AND then probes ``schema()``, which re-executes
    the whole lineage again with limit(1) — for a sort/shuffle-rooted
    dataset that re-runs the exchange (measured: +1.2 s per
    tail_sample call at sf0.1). A materialized plan serves both from
    the cached blocks."""
    import ray

    return [ray.get(b) for b in ds.materialize().to_arrow_refs()]
