"""Sequence packing — GPT-style concat-and-split token packing as a
distributed ordered prefix scan.

Training-data packers concatenate every document's tokens in a fixed
corpus order and cut the stream into fixed-length sequences of
``seq_len`` tokens (the "concat and chunk" packing used for LLM
pretraining batches; the final partial sequence is dropped). The only
global computation is each document's starting offset in the token
stream — an ordered prefix sum, which a shuffle-based engine has no
primitive for. We compute it scalably in two passes with no global
sort:

1. **Range-bucket + per-bucket totals.** Each doc's sort key is
   bucketed into ``num_buckets`` uniform key ranges (bounds from one
   cheap min/max aggregate over the already-tiny ``(key, n_tokens)``
   rows). One ``(bucket, sum_tokens, n_docs)`` row per bucket per
   block flows to the driver, which cumsums them into exclusive
   per-bucket token offsets — driver state is O(num_buckets), never
   O(docs).
2. **Intra-bucket scan.** ``groupby(bucket).map_groups`` sorts each
   bucket by key locally and cumsums; adding the broadcast bucket
   offset yields every doc's exact global offset. Per-worker memory is
   one bucket's doc rows (two ints per doc), not the corpus.

Offsets make sequence membership pure arithmetic: a doc at offset
``o`` with ``n`` tokens overlaps sequences ``o // S .. (o+n-1) // S``.
The per-sequence rollup (how many docs feed each training sequence,
first/last doc) is then an ordinary hash aggregate over small int
rows.

Partitioning assumption: keys are integer-ordered and roughly
uniform over [min, max] (true for snowflake/sequential ids). A skewed
key distribution only skews bucket sizes, never correctness; swap the
uniform bounds for a sampled-quantile sketch if a real corpus needs
it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .base import pa_from_pandas, arrow_out


def token_counts(t: pa.Table, key: str = "doc_id", col: str = "text") -> pa.Table:
    """(key, n_tok) rows — whitespace tokenization matching
    text.token_stats's ``n_tokens_ws`` (trim, split ``\\s+``, empty→0)."""
    c = pc.utf8_trim_whitespace(t[col])
    n = pc.list_value_length(pc.split_pattern_regex(c, r"\s+"))
    n = pc.if_else(pc.equal(pc.utf8_length(c), 0), pa.scalar(0, pa.int32()), n)
    return pa.table({key: t[key], "n_tok": pc.cast(n, pa.int64())})


def _bucket_offsets(counts, key: str, num_buckets: int):
    """Driver-side exclusive token offset per key-range bucket.

    Returns (lo, width, offsets ndarray, total_tokens). Two passes over
    the small (key, n_tok) rows: a min/max aggregate to fix the bucket
    ranges, then per-block (bucket → sum) partials merged on the
    driver (≤ num_buckets rows per block)."""
    from ray.data.aggregate import Max, Min

    mm = counts.aggregate(Min(key), Max(key))
    lo, hi = mm[f"min({key})"], mm[f"max({key})"]
    width = max(1, (int(hi) - int(lo)) // num_buckets + 1)

    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        b = (k - lo) // width
        df = pd.DataFrame({"b": b, "n": t["n_tok"].to_numpy(zero_copy_only=False)})
        out = df.groupby("b", as_index=False, dropna=False)["n"].sum()
        return pa_from_pandas(out)

    parts = counts.map_batches(partial, batch_format="pyarrow").to_pandas()
    sums = np.zeros(num_buckets, dtype=np.int64)
    agg = parts.groupby("b")["n"].sum()
    sums[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    return int(lo), int(width), offsets, int(sums.sum())


def doc_offsets(ds, key: str = "doc_id", col: str = "text",
                num_buckets: int = 256):
    """Per-doc global token offset in ``key`` order.

    Returns (dataset of (key, n_tok, offset), total_tokens)."""
    # Two int64s per doc; materialized because three downstream passes
    # consume it (min/max, bucket totals, scan) — re-deriving it would
    # re-tokenize the full corpus once per pass.
    counts = ds.map_batches(
        lambda t: token_counts(t, key, col), batch_format="pyarrow").materialize()
    lo, width, offsets, total = _bucket_offsets(counts, key, num_buckets)

    def bucketize(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array((k - lo) // width))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="mergesort")
        n = g["n_tok"].to_numpy()
        base = offsets[int(g["__b"].iloc[0])]
        g["offset"] = base + np.cumsum(n) - n
        return g[[key, "n_tok", "offset"]]

    scanned = (
        counts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(arrow_out(scan), batch_format="pandas")
    )
    return scanned, total


def pack_sequences(ds, seq_len: int, key: str = "doc_id",
                   col: str = "text", num_buckets: int = 256):
    """Per-sequence packing stats: (seq_id, n_docs, first_doc,
    last_doc) for every FULL sequence of ``seq_len`` tokens (the final
    partial sequence is dropped, standard packer behavior)."""
    offs, total = doc_offsets(ds, key, col, num_buckets)
    n_full = total // seq_len

    def expand(t: pa.Table) -> pa.Table:
        n = t["n_tok"].to_numpy(zero_copy_only=False)
        o = t["offset"].to_numpy(zero_copy_only=False)
        k = t[key].to_numpy(zero_copy_only=False)
        m = n > 0
        n, o, k = n[m], o[m], k[m]
        first = o // seq_len
        last = (o + n - 1) // seq_len
        reps = last - first + 1
        ends = np.cumsum(reps)
        intra = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
            - np.repeat(ends - reps, reps)
        seq = np.repeat(first, reps) + intra
        doc = np.repeat(k, reps)
        keep = seq < n_full
        # per-block combiner: one row per distinct seq_id in the block
        # (a Ray groupby over millions of tiny seq groups is ~0.2 ms
        # per group; partial+final keeps the exchange to combined rows)
        df = pd.DataFrame({"seq_id": seq[keep], "d": doc[keep]})
        out = df.groupby("seq_id", as_index=False, dropna=False).agg(
            n_docs=("d", "size"), first_doc=("d", "min"), last_doc=("d", "max"))
        out["__p"] = out["seq_id"].to_numpy() % num_buckets
        return pa_from_pandas(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("seq_id", as_index=False, dropna=False).agg(
            n_docs=("n_docs", "sum"), first_doc=("first_doc", "min"),
            last_doc=("last_doc", "max"))

    return (
        offs.map_batches(expand, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )
