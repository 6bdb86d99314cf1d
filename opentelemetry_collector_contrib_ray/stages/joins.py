"""Join strategies — custom operators beyond the reference's lookup-only
surface (SURVEY.md §2.8), built from Dataset primitives.

- broadcast_join: small side broadcast via ``ray.put``, vectorized
  dict-join per batch (LookupEnricher generalization for DataFrames).
- semi_join / anti_join: broadcast key set, mask filter.
- bucketed_hash_join: both sides large — explicit partitioned hash
  join: add ``bucket = hash(key) % B`` to both sides, co-group per
  bucket, pandas merge inside. Partitioning assumption: key hash is
  uniform enough that a bucket's two sides fit one worker's heap; salt
  hot keys into sub-buckets before calling when a single key exceeds
  that (see stages.agg for the salting pattern).
- asof_join: within-bucket sort + ``pd.merge_asof`` per key group.
  Partitioning assumption: rows for one key fit in one group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .transformers import _hash_u64


def broadcast_join(ds, small_ref, on: str, how: str = "left",
                   concurrency: int = 4):
    """``small_ref``: pandas DataFrame or ``ray.put`` ref of one (must
    include ``on``). Vectorized pandas merge per batch — no shuffle."""

    class Joiner:
        def __init__(self):
            import ray

            self.small = (
                ray.get(small_ref) if not isinstance(small_ref, pd.DataFrame) else small_ref
            )

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(self.small, on=on, how=how)

    from .base import norm_concurrency

    return ds.map_batches(
        Joiner, batch_format="pandas", concurrency=norm_concurrency(concurrency)
    )


def _key_set_masker(keys_ref, on: str, keep_matches: bool):
    def fn(t: pa.Table) -> pa.Table:
        import ray

        keys = keys_ref if isinstance(keys_ref, (set, frozenset)) else set(ray.get(keys_ref))
        col = t[on].to_pylist()
        mask = pa.array([((v in keys) == keep_matches) for v in col])
        return t.filter(mask)

    return fn


def semi_join(ds, keys_ref, on: str):
    """Keep rows whose key is in the broadcast key set."""
    return ds.map_batches(_key_set_masker(keys_ref, on, True), batch_format="pyarrow")


def anti_join(ds, keys_ref, on: str):
    """Drop rows whose key is in the broadcast key set."""
    return ds.map_batches(_key_set_masker(keys_ref, on, False), batch_format="pyarrow")


def _add_bucket(on: str, n_buckets: int, side: str):
    def fn(t: pa.Table) -> pa.Table:
        h = _hash_u64(t[on])
        t = t.append_column("__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))
        return t.append_column("__side", pa.array([side] * t.num_rows))

    return fn


def bucketed_hash_join(left, right, on: str, n_buckets: int = 32, how: str = "inner"):
    """Explicit partitioned hash join: bucket both sides by key hash,
    union, co-group per bucket, merge inside the group."""
    lb = left.map_batches(_add_bucket(on, n_buckets, "l"), batch_format="pyarrow")
    rb = right.map_batches(_add_bucket(on, n_buckets, "r"), batch_format="pyarrow")
    both = lb.union(rb)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        r = g[g["__side"] == "r"].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        if l.empty or (r.empty and how == "inner"):
            return l.iloc[0:0]
        return l.merge(r, on=on, how=how)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(left, right, key: str, ts: str, direction: str = "backward",
              suffix: str = "_r", allow_exact_matches: bool = True):
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` (backward) per key. One shuffle on key."""
    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("__side", pa.array([side] * t.num_rows))

        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow")
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].drop(columns="__side").dropna(axis=1, how="all")
        r = g[g["__side"] == "r"].drop(columns="__side").dropna(axis=1, how="all")
        if l.empty:
            return l
        l = l.sort_values(ts, kind="mergesort")
        if r.empty:
            return l
        r = r.sort_values(ts, kind="mergesort")
        return pd.merge_asof(
            l, r, on=ts, by=key, direction=direction, suffixes=("", suffix),
            allow_exact_matches=allow_exact_matches,
        )

    return both.groupby(key).map_groups(merge_group, batch_format="pandas")
