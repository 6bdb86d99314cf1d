"""Windowed aggregates over an ordered, keyed stream.

The reference is purely processing-time (SURVEY.md §2.10 — no
event-time windows exist there); training/telemetry pipelines need
them, so these are first-class custom operators per the brief. Batch
rendering of the streaming guide: treat the input as a partitioned log
(key → sorted by ts), implement windows as
``groupby(key).map_groups(fn)``.

- tumbling: assign ``window = floor(ts / size)`` — fully vectorized,
  NO per-key grouping needed (a plain groupby on (key, window)).
- sliding: per-key group, numpy searchsorted over the sorted ts.
- session: per-key group, gap-based sessionization (new session when
  the gap to the previous event exceeds ``gap``).

Partitioning assumption (sliding/session): one key's rows fit in one
group — bound hot keys upstream (cap or salt by coarse time range).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, key: str, ts: str, size_s: int,
                    agg_col: str | None = None, num_partitions: int = 64):
    """Counts (and optional int-sum) per (key, window-start).

    Partial+final shape: each batch pre-aggregates with a hashed pandas
    groupby (the combiner), then one (key, window)-hash-partitioned
    vectorized merge. A plain Ray ``groupby().aggregate()`` pays
    per-group overhead — pathological once (key × window) groups number
    in the tens of thousands (7.9 s → 2 s at sf0.1 / 77k groups)."""
    size_us = size_s * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // size_us) * size_us
        cols = {key: t[key].to_numpy(zero_copy_only=False), "window_start": win}
        if agg_col:
            cols[agg_col] = t[agg_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(cols)
        # dropna=False: SQL GROUP BY keeps NULL groups; pandas' default
        # would silently drop rows with a null key
        g = df.groupby([key, "window_start"], as_index=False, dropna=False)
        out = g.agg(n=("window_start", "size"),
                    **({f"sum_{agg_col}": (agg_col, "sum")} if agg_col else {}))
        h = pd.util.hash_pandas_object(out[[key, "window_start"]], index=False).to_numpy()
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sums = {"n": ("n", "sum")}
        if agg_col:
            sums[f"sum_{agg_col}"] = (f"sum_{agg_col}", "sum")
        out = g.groupby([key, "window_start"], as_index=False, dropna=False).agg(**sums)
        return out

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge, batch_format="pandas")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("window_start"), "window_start",
            pc.cast(t["window_start"], pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )


def _partitioned(ds, key: str, n_parts: int):
    """Shuffle on ``hash(key) % n_parts`` so each worker gets MANY whole
    key groups in one call — a per-key ``map_groups`` pays a Ray-level
    Python invocation per key, which dominates when keys number in the
    thousands."""
    from .joins import _add_part

    return ds.map_batches(_add_part([key], n_parts), batch_format="pyarrow").groupby("__p")


def sliding_window_counts(ds, key: str, ts: str, size_s: int, step_s: int,
                          num_partitions: int = 64):
    """Per key: one row per step with the count of events in the
    trailing ``size_s`` window ending at that step boundary."""
    size = np.timedelta64(size_s, "s")
    step_us = step_s * 1_000_000

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, sub in g.groupby(key, sort=False, dropna=False):  # in-process, no Ray call
            tsv = np.sort(sub[ts].to_numpy().astype("datetime64[us]"))
            lo = (tsv[0].astype("int64") // step_us) * step_us
            hi = (tsv[-1].astype("int64") // step_us + 1) * step_us
            bounds = np.arange(lo + step_us, hi + step_us, step_us).astype("datetime64[us]")
            upper = np.searchsorted(tsv, bounds, side="right")
            lower = np.searchsorted(tsv, bounds - size, side="right")
            out.append(pd.DataFrame({key: k, "window_end": bounds, "n": upper - lower}))
        if not out:
            return pd.DataFrame({key: [], "window_end": [], "n": []})
        return pd.concat(out, ignore_index=True)

    return _partitioned(ds, key, num_partitions).map_groups(per_part, batch_format="pandas")


def session_windows(ds, key: str, ts: str, gap_s: int, num_partitions: int = 64):
    """Gap-based sessions per key: (key, session_start, session_end, n).
    Fully vectorized within each hash partition: one sort + one boundary
    scan covering every key group at once."""
    gap = np.timedelta64(gap_s, "s")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts], kind="mergesort")
        kv = g[key].to_numpy()
        tsv = g[ts].to_numpy().astype("datetime64[us]")
        new = np.ones(len(g), dtype=bool)
        new[1:] = (kv[1:] != kv[:-1]) | ((tsv[1:] - tsv[:-1]) > gap)
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({key: kv, "sid": sid, "ts": tsv})
        agg = df.groupby("sid", sort=True).agg(
            __k=(key, "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n=("ts", "count"),
        )
        return pd.DataFrame(
            {
                key: agg["__k"].to_numpy(),
                "session_start": agg["session_start"].to_numpy(),
                "session_end": agg["session_end"].to_numpy(),
                "n": agg["n"].astype("int64").to_numpy(),
            }
        )

    return _partitioned(ds, key, num_partitions).map_groups(per_part, batch_format="pandas")
