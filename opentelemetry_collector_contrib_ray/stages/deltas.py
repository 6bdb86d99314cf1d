"""Temporality conversion over keyed metric streams.

Batch renderings of four reference metrics processors (the reference
tracks stream state in an in-memory map keyed by the metric identity;
here the stream identity is a set of key columns and the "arrival
order" is an explicit (ts, tie-break) sort):

- ``cumulative_to_delta`` — processor/cumulativetodeltaprocessor
  (internal/tracking/tracker.go): per stream, delta = value - previous
  value; the first point of a stream has no baseline and is dropped or
  kept verbatim per ``initial_value`` (tracker.go:22-49 InitialValue
  auto|keep|drop; config.go:21-26).
- ``delta_to_cumulative`` — processor/deltatocumulativeprocessor:
  running sum per stream in arrival order.
- ``delta_to_rate`` — processor/deltatorateprocessor/processor.go:61-77:
  rate = delta / duration; the batch rendering takes the duration from
  the previous point of the same stream (the reference uses the data
  point's own start timestamp, which the flat events table lacks).
- ``interval_last`` — processor/intervalprocessor: emit only the LAST
  point of each stream per tumbling interval.

Execution shape: ONE hash shuffle on the stream identity, then a
fully vectorized per-partition pass (sort + boundary-reset diff or
cumsum across every stream in the partition at once). Partitioning
assumption: one stream's points fit in one partition group — bound
hot streams upstream (coarse time-range salt) as with session windows.

``interval_last`` needs no sort shuffle at all: it is a partial+final
aggregate (per-batch argmax combiner, then a small keyed merge).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .base import pa_from_pandas, arrow_out


def _stream_partitioned(ds, keys: list[str], n_parts: int):
    from .joins import _add_part

    return ds.map_batches(_add_part(keys, n_parts), batch_format="pyarrow").groupby("__p")


def _sorted_streams(g: pd.DataFrame, keys: list[str], ts: str, tie: str):
    """Sort one partition by (stream, ts, tie) and return (sorted df,
    boolean first-row-of-stream mask) — the shared kernel for the
    diff/cumsum passes."""
    g = g.sort_values([*keys, ts, tie], kind="mergesort", ignore_index=True)
    first = np.zeros(len(g), dtype=bool)
    first[0] = True
    neq = np.zeros(max(len(g) - 1, 0), dtype=bool)
    for k in keys:
        kv = g[k].to_numpy()
        neq |= kv[1:] != kv[:-1]
    first[1:] = neq
    return g, first


def cumulative_to_delta(ds, keys: list[str], ts: str, value: str, tie: str,
                        initial_value: str = "drop", with_rate: bool = False,
                        num_partitions: int = 64):
    """Per-stream delta conversion. ``initial_value='keep'`` emits the
    first point's value unchanged (tracker.go InitialValueKeep);
    ``'drop'`` omits it. With ``with_rate``, adds
    ``rate = delta·1e6 / Δts_us`` (deltatorate analog; null on first
    points since there is no prior timestamp)."""
    if initial_value not in ("drop", "keep"):
        raise ValueError("initial_value must be 'drop' or 'keep'")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = {k: [] for k in (*keys, tie, "delta")}
        if with_rate:
            cols["rate"] = []
        if g.empty:
            return pd.DataFrame(cols)
        g, first = _sorted_streams(g, keys, ts, tie)
        v = g[value].to_numpy()
        delta = v.copy()
        delta[1:] = v[1:] - v[:-1]
        out = {k: g[k].to_numpy() for k in keys}
        out[tie] = g[tie].to_numpy()
        out["delta"] = delta
        if with_rate:
            us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
            dt = np.empty(len(g), dtype=np.int64)
            dt[0] = 1
            dt[1:] = us[1:] - us[:-1]
            with np.errstate(divide="ignore", invalid="ignore"):
                rate = (delta * 1_000_000).astype(np.float64) / dt.astype(np.float64)
            out["rate"] = rate
        df = pd.DataFrame(out)
        if initial_value == "drop":
            df = df[~first]
        elif with_rate:
            df.loc[first, "rate"] = np.nan
        return df

    return _stream_partitioned(ds, keys, num_partitions).map_groups(
        per_part, batch_format="pandas")


def delta_to_cumulative(ds, keys: list[str], ts: str, value: str, tie: str,
                        num_partitions: int = 64):
    """Per-stream running total in (ts, tie) order — boundary-reset
    cumsum across all streams of a partition in one pass."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({k: [] for k in (*keys, tie, "cumulative")})
        g, first = _sorted_streams(g, keys, ts, tie)
        v = g[value].to_numpy()
        cs = np.cumsum(v)
        # subtract each stream's pre-start prefix from its rows
        starts = np.flatnonzero(first)
        base = np.zeros(len(starts), dtype=cs.dtype)
        base[1:] = cs[starts[1:] - 1]
        sid = np.cumsum(first) - 1
        out = {k: g[k].to_numpy() for k in keys}
        out[tie] = g[tie].to_numpy()
        out["cumulative"] = cs - base[sid]
        return pd.DataFrame(out)

    return _stream_partitioned(ds, keys, num_partitions).map_groups(
        per_part, batch_format="pandas")


def monotonic_increase(ds, keys: list[str], ts: str, value: str, tie: str,
                       num_partitions: int = 64):
    """Counter-RESET-aware increase over cumulative streams — the batch
    rendering of PromQL ``increase()``/``resets()`` semantics (public
    Prometheus counter rules): when a reading drops below its
    predecessor the counter restarted (process crash), so the step
    contributes ``v`` (the climb since the restart), not ``v - prev``;
    otherwise ``v - prev``.  The reference's cumulativetodelta tracker
    (internal/tracking/tracker.go) instead invalidates the stream on a
    non-monotonic point — this operator is the recovery-path variant a
    rate pipeline actually wants.

    Emits ONE compact row per stream (≥2 points): ``total_increase``,
    ``n_resets``, ``n_obs`` (= points - 1) and ``elapsed_us`` (last ts
    − first ts, for rate = increase/elapsed downstream).

    Scale shape: ONE stream-identity hash exchange, then a fully
    vectorized per-partition pass (sort + shifted diff across all
    streams at once); the per-stream totals reduce INSIDE the partition
    (the partition owns every point of its streams), so only O(streams)
    rows leave — no second exchange. Values must be integer (the repo's
    cents discipline) for exact SQL-twin parity.
    """

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = [*keys, "total_increase", "n_resets", "n_obs", "elapsed_us"]
        if g.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        g, first = _sorted_streams(g, keys, ts, tie)
        v = g[value].to_numpy().astype(np.int64)
        prev = np.empty_like(v)
        prev[0] = 0
        prev[1:] = v[:-1]
        reset = (~first) & (v < prev)
        inc = np.where(first, 0, np.where(reset, v, v - prev))
        us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({k: g[k].to_numpy() for k in keys})
        df["__inc"] = inc
        df["__rst"] = reset.astype(np.int64)
        df["__us"] = us
        agg = df.groupby(keys, sort=False).agg(
            total_increase=("__inc", "sum"), n_resets=("__rst", "sum"),
            n_obs=("__inc", "size"), us_min=("__us", "min"),
            us_max=("__us", "max")).reset_index()
        agg = agg[agg["n_obs"] > 1]
        agg["n_obs"] = agg["n_obs"] - 1
        agg["elapsed_us"] = agg["us_max"] - agg["us_min"]
        return agg[cols]

    return _stream_partitioned(ds, keys, num_partitions).map_groups(
        per_part, batch_format="pandas")


def delta_to_rate(ds, keys: list[str], ts: str, value: str, tie: str,
                  num_partitions: int = 64):
    """deltatorateprocessor analog: per-point rate over the gap to the
    previous point of the same stream (first points dropped — no gap)."""
    out = cumulative_to_delta(ds, keys, ts, value, tie,
                              initial_value="drop", with_rate=True,
                              num_partitions=num_partitions)
    return out.drop_columns(["delta"])


def interval_last(ds, keys: list[str], ts: str, size_s: int,
                  carry: list[str] | None = None, num_partitions: int = 64):
    """intervalprocessor analog: the last point (max (ts, first tie
    carry col)) of each stream per tumbling interval. Partial+final:
    per-batch vectorized argmax combiner, then a small keyed merge —
    no sort shuffle, only interval-summary rows move."""
    carry = carry or []
    size_us = size_s * 1_000_000
    tie = carry[0] if carry else None

    def _last_rows(df: pd.DataFrame) -> pd.DataFrame:
        order = [*keys, "window_start", "__ts", *([tie] if tie else [])]
        df = df.sort_values(order, kind="mergesort")
        # keep='last' on the sorted frame = the max-(ts, tie) row per
        # group, whole-row (no per-column NaN skipping like groupby.last)
        return df.drop_duplicates(subset=[*keys, "window_start"], keep="last")

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {k: t[k].to_numpy(zero_copy_only=False) for k in keys}
        cols["window_start"] = (us // size_us) * size_us
        cols["__ts"] = us
        for c in carry:
            cols[c] = t[c].to_numpy(zero_copy_only=False)
        df = _last_rows(pd.DataFrame(cols))
        h = pd.util.hash_pandas_object(df[[*keys, "window_start"]], index=False).to_numpy()
        df["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(df)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return _last_rows(g.drop(columns="__p")).drop(columns="__ts")

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )


def latest_state(ds, key: str, seq: str, delete_expr=None,
                 num_partitions: int = 64):
    """CDC compaction / merge-on-read upsert: from a changelog of keyed
    records, materialize the latest state — for every key keep ONLY the
    row with the max ``seq`` (ties impossible with a unique sequence;
    with dups the whole-row max-(seq) winner is deterministic), and
    drop keys whose winning row matches ``delete_expr`` (a vectorized
    ``pa.Table -> BooleanArray`` tombstone predicate).

    Same partial+final shape as interval_last: each block reduces to
    one candidate row per key (per-batch argmax combiner), a key-hash
    exchange moves ONLY candidates, and the final per-partition pass
    re-argmaxes — changelog volume never shuffles, state size does."""

    def _winners(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, seq], kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="last")

    def partial(t: pa.Table) -> pa.Table:
        df = _winners(t.to_pandas())
        kv = df[key].to_numpy()
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        df["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(df)

    def merge(g: pd.DataFrame) -> pa.Table:
        out = pa_from_pandas(_winners(g.drop(columns="__p")))
        if delete_expr is not None:
            out = out.filter(pc.invert(pc.fill_null(delete_expr(out), False)))
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )
