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
from .base import pa_from_pandas, arrow_out


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
        return pa_from_pandas(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sums = {"n": ("n", "sum")}
        if agg_col:
            sums[f"sum_{agg_col}"] = (f"sum_{agg_col}", "sum")
        out = g.groupby([key, "window_start"], as_index=False, dropna=False).agg(**sums)
        return out

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
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
    trailing ``size_s`` window ending at that step boundary — count of
    ``ts ∈ (end − size, end]``.

    When ``size`` is a multiple of ``step`` (the common case), the
    partition pass is FULLY vectorized across all keys at once: events
    collapse to per-(key, tumbling-bucket) counts, each key's bucket
    range densifies via one ragged-arange, and every window is a
    prefix-sum difference over ``r = size/step`` consecutive buckets
    (exact boundary events — ``ts == k·step`` — carried in a separate
    per-bucket edge count). The dense array is exactly output-sized, so
    no extra asymptotic memory. Non-divisible sizes fall back to a
    per-key searchsorted loop."""
    size_us = size_s * 1_000_000
    step_us = step_s * 1_000_000

    def per_part_fallback(g: pd.DataFrame) -> pd.DataFrame:
        size = np.timedelta64(size_s, "s")
        out = []
        for k, sub in g.groupby(key, sort=False, dropna=False):
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

    r = size_s // step_s

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({key: [], "window_end": [], "n": []})
        us = g[ts].to_numpy().astype("datetime64[us]").astype(np.int64)
        kv = g[key].to_numpy()
        b = us // step_us
        df = pd.DataFrame({"k": kv, "b": b,
                           "edge": (us == b * step_us).astype(np.int64)})
        gb = df.groupby(["k", "b"], sort=True, dropna=False).agg(
            cnt=("b", "size"), edge=("edge", "sum"))
        gk = gb.index.get_level_values(0).to_numpy()
        gbk = gb.index.get_level_values(1).to_numpy()
        cnt = gb["cnt"].to_numpy()
        edge = gb["edge"].to_numpy()
        codes = pd.factorize(gk, use_na_sentinel=False)[0]  # NaN = one key
        new_key = np.ones(len(gk), dtype=bool)
        new_key[1:] = codes[1:] != codes[:-1]
        key_first = np.flatnonzero(new_key)          # first group row per key
        key_last = np.r_[key_first[1:] - 1, len(gk) - 1]
        lo_k, hi_k = gbk[key_first], gbk[key_last]
        nb = (hi_k - lo_k + 1).astype(np.int64)      # dense buckets per key

        seg_end = np.cumsum(nb)
        seg_start = seg_end - nb
        total = int(seg_end[-1])
        # scatter sparse (key,bucket) rows into the dense layout
        pos = np.repeat(seg_start - lo_k, np.diff(np.r_[key_first, len(gk)])) + gbk
        dense_cnt = np.zeros(total, dtype=np.int64)
        dense_edge = np.zeros(total, dtype=np.int64)
        dense_cnt[pos] = cnt
        dense_edge[pos] = edge
        GS = np.concatenate([[0], np.cumsum(dense_cnt)])

        # output row j of key s ↔ local window index i = 0..nb_s-1,
        # window end = (lo_k + 1 + i)·step; covered buckets local
        # [max(i−r+1, 0), i], minus the left-edge events, plus the
        # right-boundary events (bucket i+1's edge, 0 past the end)
        intra = np.arange(total, dtype=np.int64) - np.repeat(seg_start, nb)
        segs = np.repeat(seg_start, nb)
        hi_idx = segs + intra + 1
        lo_local = intra - r + 1
        lo_idx = segs + np.maximum(lo_local, 0)
        n_out = GS[hi_idx] - GS[lo_idx]
        # left edge: local bucket index i−r+1 (only when ≥ 0)
        has_left = lo_local >= 0
        n_out[has_left] -= dense_edge[(segs + lo_local)[has_left]]
        # right edge: local bucket i+1 (only when < nb)
        has_right = intra + 1 < np.repeat(nb, nb)
        n_out[has_right] += dense_edge[(segs + intra + 1)[has_right]]
        ends = ((np.repeat(lo_k, nb) + 1 + intra) * step_us).astype("datetime64[us]")
        return pd.DataFrame({key: np.repeat(gk[key_first], nb),
                             "window_end": ends, "n": n_out})

    fn = per_part if size_s % step_s == 0 and r >= 1 else per_part_fallback
    return _partitioned(ds, key, num_partitions).map_groups(arrow_out(fn), batch_format="pandas")


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

    return _partitioned(ds, key, num_partitions).map_groups(arrow_out(per_part), batch_format="pandas")


def funnel_steps(ds, steps: list[str], user_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 num_partitions: int = 64, window_s: int | None = None):
    """Ordered funnel analysis: how many users performed step 1, then
    step 2 STRICTLY after their first qualifying step 1, then step 3
    strictly after that, … (the classic product-analytics funnel, with
    the greedy earliest-completion rule — each step's anchor is the
    MIN timestamp satisfying the predecessor constraint).

    Shape: rows are pre-filtered to the step types and projected to
    three columns before the single user-hash exchange; each partition
    then resolves every resident user's whole funnel in ``len(steps)``
    vectorized groupby-min passes (no per-user Python). Only
    per-partition step counts reach the driver-side rollup — one tiny
    row per step per partition.

    Output: ``(step_idx, step, n_users)``, one row per step.
    """
    P = num_partitions
    step_ix = {s: i for i, s in enumerate(steps)}

    def prefilter(t: pa.Table) -> pa.Table:
        ty = pc.cast(t[type_col], pa.string())
        m = pc.is_in(ty, value_set=pa.array(steps))
        t = t.filter(pc.fill_null(m, False))
        ty = pc.cast(t[type_col], pa.string()).to_pandas().map(step_ix)
        u = t[user_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u, type=pa.int64()),
            "k": pa.array(ty.to_numpy(np.int64)),
            "t": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            "__p": pa.array((u.astype(np.uint64) % np.uint64(P)).astype(np.int64)),
        })

    win_us = None if window_s is None else int(window_s) * 1_000_000

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev = None  # per-user anchor timestamp of the previous step
        deadline = None  # per-user first-touch deadline (window funnels)
        for k in range(len(steps)):
            sel = g[g["k"] == k]
            if prev is not None:
                anchor = prev.reindex(sel["u"])
                keep = sel["t"].to_numpy() > anchor.fillna(np.iinfo(np.int64).max).to_numpy()
                if deadline is not None:
                    dl = deadline.reindex(sel["u"])
                    keep &= (sel["t"].to_numpy()
                             <= dl.fillna(np.iinfo(np.int64).min).to_numpy())
                sel = sel[keep]
            prev = sel.groupby("u")["t"].min()
            if k == 0 and win_us is not None:
                deadline = prev + win_us
            counts.append(len(prev))
        return pd.DataFrame({"step_idx": np.arange(len(steps), dtype=np.int64),
                             "step": steps,
                             "n_users": np.array(counts, dtype=np.int64)})

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["step_idx", "step"], as_index=False,
                        dropna=False)["n_users"].sum()
        return out.astype({"step_idx": "int64", "n_users": "int64"})

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(per_partition), batch_format="pandas")
        .groupby("step_idx")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      week_us: int = 7 * 86_400_000_000,
                      num_partitions: int = 64):
    """Retention cohort matrix: users are cohorted by the week of
    their FIRST event; for every (cohort_week, week_offset) cell,
    count the distinct cohort users active in that week — the classic
    product-analytics retention triangle.

    Shape: rows project to two ints per event before the single
    user-hash exchange; each partition resolves its resident users
    completely (first week + distinct active weeks are user-local
    after the exchange), so per-partition (cohort, offset) counts are
    disjoint and the final rollup just sums tiny rows.

    Output: ``(cohort_week, week_offset, n_users)``.
    """
    P = num_partitions

    def prefilter(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False)
        wk = pc.divide(pc.cast(t[ts_col], pa.int64()), week_us)
        return pa.table({
            "u": pa.array(u, type=pa.int64()),
            "wk": wk,
            "__p": pa.array((u.astype(np.uint64) % np.uint64(P)).astype(np.int64)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["u", "wk"]].drop_duplicates()
        first = g.groupby("u")["wk"].transform("min")
        out = pd.DataFrame({"cohort_week": first.to_numpy(np.int64),
                            "week_offset": (g["wk"] - first).to_numpy(np.int64)})
        cells = out.groupby(["cohort_week", "week_offset"], as_index=False) \
            .size().rename(columns={"size": "n_users"})
        cells["__q"] = (cells["cohort_week"].to_numpy(np.uint64)
                        % np.uint64(P)).astype(np.int64)
        return cells

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_week", "week_offset"], as_index=False,
                        dropna=False)["n_users"].sum()
        return out.astype({"cohort_week": "int64", "week_offset": "int64",
                           "n_users": "int64"})

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(per_partition), batch_format="pandas")
        .groupby("__q")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def late_arrivals(ds, key: str, ts_col: str, order_col: str,
                  allowed_lateness_s: int, num_partitions: int = 64):
    """Out-of-order / late-data detection — the watermark semantics a
    streaming pipeline applies at ingest, evaluated in batch: process
    each key's rows in ARRIVAL order (``order_col``, e.g. an ingest
    sequence id), track the running max event time over strictly
    earlier arrivals (the per-key watermark), and flag a row late when
    its event time lags that watermark by more than
    ``allowed_lateness_s``.

    Shape: ONE key-hash exchange (many whole keys per partition), then
    a single vectorized pass per partition — sort by (key, order),
    per-key running max via grouped cummax of the shifted ts. Adds an
    ``is_late`` boolean column; rows otherwise unchanged."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    lateness_us = int(allowed_lateness_s) * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = k.astype(np.uint64)
        else:
            h = pd.util.hash_array(k.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def flag_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        grp = g.groupby(key, sort=False, dropna=False)
        # watermark BEFORE this row: cummax of event time over strictly
        # earlier arrivals of the same key
        prev_max = grp[ts_col].shift(1).groupby(
            g[key], sort=False, dropna=False).cummax()
        ts_us = g[ts_col].astype("datetime64[us]").astype("int64")
        wm_us = prev_max.astype("datetime64[us]").astype("int64")  # NaT -> i64 min
        is_late = wm_us.sub(ts_us) > lateness_us
        is_late &= prev_max.notna()
        return g.assign(is_late=is_late.to_numpy()).drop(columns=["__p"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(flag_partition), batch_format="pandas")
    )


def first_k_paths(ds, key: str, ts_col: str, order_col: str, val_col: str,
                  k: int = 3, sep: str = ">", num_partitions: int = 64):
    """User-journey path mining: per key, the ordered concatenation of
    the FIRST ``k`` values by ``(ts, order)`` — SQL's
    ``string_agg(val, sep ORDER BY ts, id)`` over the first k rows.
    One key-hash exchange; per partition one vectorized pass: sort +
    grouped cumcount keeps the first k, a pandas pivot widens rn →
    k columns (C path), and ``pc.binary_join_element_wise`` with
    ``null_handling='skip'`` builds every path string in one kernel —
    no per-group Python join."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def paths(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, ts_col, order_col], kind="mergesort")
        rn = g.groupby(key, sort=False, dropna=False).cumcount()
        g = g.loc[rn < k].assign(__rn=rn[rn < k])
        wide = g.pivot(index=key, columns="__rn", values=val_col)
        cols = [pa.array(wide[c].to_numpy())
                if c in wide.columns else pa.nulls(len(wide), pa.string())
                for c in range(k)]
        path = pc.binary_join_element_wise(
            *[pc.cast(c, pa.string()) for c in cols], sep,
            null_handling="skip")
        n_steps = np.zeros(len(wide), dtype=np.int64)
        for c in cols:
            n_steps += np.asarray(pc.is_valid(c))
        return pa.table({key: pa.array(wide.index.to_numpy()),
                         "path": path,
                         "n_steps": pa.array(n_steps)})

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(paths), batch_format="pandas")
    )


def cohort_value_matrix(ds, user_col: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value",
                        week_us: int = 7 * 86_400_000_000,
                        num_partitions: int = 64):
    """Cohort LTV matrix — retention_cohorts' value-sum sibling: users
    cohorted by first-event week; for every (cohort_week, week_offset)
    cell, the event count and integer-cents value sum contributed by
    that cohort in that week. Same single user-hash exchange of 3-int
    rows (a user's first week is user-local after the exchange);
    per-partition cell partials merge in a tiny rollup."""
    P = num_partitions

    def prefilter(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False)
        wk = pc.divide(pc.cast(t[ts_col], pa.int64()), week_us)
        v = pc.cast(t[val_col], pa.float64())
        cents = pc.cast(pc.floor(pc.add(pc.multiply(v, 100.0), 0.5)), pa.int64())
        cents = pc.fill_null(cents, 0)
        return pa.table({
            "u": pa.array(u, type=pa.int64()),
            "wk": wk,
            "cents": cents,
            "__p": pa.array((u.astype(np.uint64) % np.uint64(P)).astype(np.int64)),
        })

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("u")["wk"].transform("min")
        out = pd.DataFrame({"cohort_week": first.to_numpy(np.int64),
                            "week_offset": (g["wk"] - first).to_numpy(np.int64),
                            "cents": g["cents"].to_numpy(np.int64)})
        cells = (out.groupby(["cohort_week", "week_offset"], as_index=False)
                 .agg(n_events=("cents", "size"), sum_cents=("cents", "sum")))
        cells["n_events"] = cells["n_events"].astype("int64")
        cells["__q"] = (cells["cohort_week"].to_numpy(np.uint64)
                        % np.uint64(P)).astype(np.int64)
        return cells

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_week", "week_offset"], as_index=False,
                        dropna=False)[["n_events", "sum_cents"]].sum()
        return out.astype({"cohort_week": "int64", "week_offset": "int64",
                           "n_events": "int64", "sum_cents": "int64"})

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(per_partition), batch_format="pandas")
        .groupby("__q")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def interval_union_coverage(ds, key: str, ts_col: str, length_s: int,
                            num_partitions: int = 64):
    """Interval-union coverage (the gaps-and-islands problem): each row
    opens an interval [ts, ts + length_s); per key, report the number
    of merged islands and the total seconds covered by their union —
    "how long was this tenant active, counting overlaps once".

    ONE key-hash exchange, then a single vectorized pass per partition:
    sort by (key, ts), island starts where ts exceeds the grouped
    running max of previous interval ends (shift + grouped cummax —
    same kernel as late_arrivals), island ids by grouped cumsum, island
    extents by one groupby min/max. Output: (key, n_islands,
    covered_s)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    len_us = int(length_s) * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        s = g[ts_col].astype("datetime64[us]").astype("int64")
        e = s + len_us
        ee = pd.Series(e.to_numpy(), index=g.index)
        # per-GROUP shift: a plain Series.shift(1) would leak the
        # previous key's interval end into this key's first row, and
        # cummax would then propagate it through the whole group
        prev_max = ee.groupby(g[key], sort=False, dropna=False).shift(1).groupby(
            g[key], sort=False, dropna=False).cummax()
        first = prev_max.isna().to_numpy()
        new_island = first | (s.to_numpy() > prev_max.to_numpy())
        isl = pd.Series(new_island.astype(np.int64), index=g.index).groupby(
            g[key], sort=False, dropna=False).cumsum()
        d = pd.DataFrame({key: g[key].to_numpy(), "isl": isl.to_numpy(),
                          "s": s.to_numpy(), "e": e.to_numpy()})
        ext = (d.groupby([key, "isl"], as_index=False, dropna=False)
               .agg(s=("s", "min"), e=("e", "max")))
        out = (ext.assign(len_us=ext["e"] - ext["s"])
               .groupby(key, as_index=False, dropna=False)
               .agg(n_islands=("len_us", "size"), cov_us=("len_us", "sum")))
        out["n_islands"] = out["n_islands"].astype("int64")
        out["covered_s"] = (out["cov_us"] // 1_000_000).astype("int64")
        return out.drop(columns=["cov_us"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(cover), batch_format="pandas")
    )


def running_total(ds, key_cols: list[str], order_cols: list[str],
                  val_col: str, out_col: str = "running",
                  num_partitions: int = 64):
    """Per-key ordered cumulative sum (the SUM() OVER (PARTITION BY key
    ORDER BY ...) window): hash-partition on the key tuple so every
    key's rows co-locate, then ONE vectorized pandas pass per partition
    (stable multi-key sort + groupby cumsum). ``order_cols`` must make
    the order within a key total, or the prefix is nondeterministic.

    Scale shape: one exchange; per-key state is the sorted run of that
    key (bounded by the largest single key's rows — salt/split upstream
    if one key dominates, or use the O(buckets) two-pass prefix scan in
    stages/pack.py when even one key's rows exceed a worker)."""
    import pandas as pd

    from .base import pa_from_pandas

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(key_cols).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def scan(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(key_cols + order_cols, kind="mergesort")
        vals = g[val_col].astype("int64")
        g[out_col] = vals.groupby(
            [g[k] for k in key_cols], sort=False).cumsum()
        return pa_from_pandas(g.drop(columns="__p"))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(scan), batch_format="pandas"))


def exp_weighted_lag(ds, key_cols: list[str], order_cols: list[str],
                     val_col: str, depth: int = 8,
                     out_col: str = "ew_num", num_partitions: int = 64):
    """Exponentially-weighted rolling value per key — the exact-integer
    rendering of an EWMA smoother: for each row, ``out = Σ_{j<depth}
    v[i-j] · 2^(depth-1-j)`` over that key's ordered stream (current
    point gets weight 2^(depth-1), each older lag half that; lags
    before the stream start contribute 0). ``out // 2^depth`` is the
    classic α=1/2 EWMA truncated to the last ``depth`` terms; keeping
    the un-divided numerator keeps it integer-exact and SQL-twinnable
    (a sum of COALESCE(LAG(v, j), 0) · 2^(depth-1-j) terms).

    Unbounded-history EWMA needs per-step truncating division (state
    that only a sequential scan reproduces); the fixed-depth window is
    the mergeable/vectorizable form — the tail weight below 2^-depth is
    under 0.4% of the smoother mass at depth 8.

    Scale shape: ONE key-hash exchange, then per partition a stable
    sort + ``depth`` shifted adds across all streams at once (the shift
    is masked by position-in-stream, so streams never bleed into each
    other). Emits every input row plus ``out_col``."""
    import pandas as pd

    from .base import pa_from_pandas

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(key_cols).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def scan(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(key_cols + order_cols, kind="mergesort",
                          ignore_index=True)
        v = g[val_col].to_numpy().astype(np.int64)
        n = len(g)
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
            neq = np.zeros(n - 1, dtype=bool)
            for k in key_cols:
                kv = g[k].to_numpy()
                neq |= kv[1:] != kv[:-1]
            first[1:] = neq
        # position of each row inside its stream: arange minus the
        # stream-start index broadcast over the run
        start = np.where(first, np.arange(n), 0)
        np.maximum.accumulate(start, out=start)
        pos = np.arange(n) - start
        out = np.zeros(n, dtype=np.int64)
        for j in range(depth):
            w = np.int64(1) << np.int64(depth - 1 - j)
            shifted = np.zeros(n, dtype=np.int64)
            if n > j:
                shifted[j:] = v[:n - j]
            out += np.where(pos >= j, shifted, 0) * w
        g[out_col] = out
        return pa_from_pandas(g.drop(columns="__p"))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(scan), batch_format="pandas"))


def run_compress(ds, key_cols: list[str], order_cols: list[str],
                 val_col: str, num_partitions: int = 64):
    """Run-length compression of a keyed ordered stream — the SCD-2
    dimension-build shape: collapse consecutive rows with the same
    ``val_col`` per key into one interval row ``(key, val, valid_from,
    valid_to, run_len)`` where ``valid_from`` is the run's first order
    value and ``valid_to`` the NEXT run's first order value (NULL for
    the key's open last run — the "current" SCD row).

    One key-hash exchange (whole keys co-locate, same caveat/fallbacks
    as running_total); per partition the scan is one vectorized pandas
    pass (sort + change-point diff + groupby first/size), never a
    Python loop over rows.
    """
    import pandas as pd

    from .base import pa_from_pandas

    def add_part(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select(key_cols).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    first_order = order_cols[0]

    def scan(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(key_cols + order_cols, kind="mergesort")
        key_change = pd.Series(False, index=g.index)
        for k in key_cols:
            key_change |= g[k].ne(g[k].shift())
        new_run = (key_change | g[val_col].ne(g[val_col].shift()))
        rid = new_run.cumsum()
        runs = g.assign(__rid=rid).groupby("__rid", sort=False).agg(
            **{k: (k, "first") for k in key_cols},
            **{val_col: (val_col, "first"),
               "valid_from": (first_order, "first"),
               "run_len": (val_col, "size")})
        # valid_to = next run's start within the same key, else NULL
        nxt = runs["valid_from"].shift(-1)
        same_key = pd.Series(True, index=runs.index)
        for k in key_cols:
            same_key &= runs[k].eq(runs[k].shift(-1))
        runs["valid_to"] = nxt.where(same_key)
        out = runs.reset_index(drop=True)
        t = pa_from_pandas(out)
        # nullable int64 valid_to (pandas float64 after where) — emit
        # proper int64-with-null so both engines compare as float64
        vt = pa.array(out["valid_to"].to_numpy(na_value=np.nan),
                      pa.int64(), from_pandas=True)
        return t.set_column(t.schema.get_field_index("valid_to"),
                            "valid_to", vt)

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(scan), batch_format="pandas"))


def peak_concurrency(ds, key: str, ts_col: str, length_s: int,
                     num_partitions: int = 64):
    """Peak concurrency per key (the capacity-planning sweep-line):
    each row opens a half-open interval [ts, ts + length_s); per key,
    report the maximum number of simultaneously-open intervals and the
    earliest instant it is first reached.

    Classic +1/-1 sweep: every interval becomes two compact
    (key, t, delta) points (the text/props columns never move), ONE
    key-hash exchange co-locates each key's points, then a single
    vectorized pandas pass per partition: stable sort by (key, t,
    delta) — delta=-1 sorts before +1 at equal t, which IS the
    half-open rule (an interval ending at t does not overlap one
    starting at t) — grouped cumsum, grouped max, grouped first-argmax.
    O(2·rows) shuffled bytes, no per-row Python."""
    len_us = int(length_s) * 1_000_000

    def to_points(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        kv = t[key]
        n = len(s)
        return pa.table({
            key: pa.chunked_array([kv, kv]).combine_chunks(),
            "t": pa.chunked_array([s, pc.add(s, len_us)]).combine_chunks(),
            "d": pa.array(np.concatenate([np.ones(n, np.int64),
                                          -np.ones(n, np.int64)])),
        })

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "t", "d"], kind="mergesort")
        c = g["d"].groupby(g[key], sort=False, dropna=False).cumsum()
        peak = c.groupby(g[key], sort=False, dropna=False).transform("max")
        at = g.loc[c.eq(peak), ["t"]].assign(**{key: g.loc[c.eq(peak), key]})
        out = (pd.DataFrame({key: g[key], "peak": peak})
               .groupby(key, as_index=False, dropna=False).agg(peak=("peak", "first")))
        first_at = at.groupby(key, as_index=False, dropna=False).agg(
            peak_at_us=("t", "min"))
        out = out.merge(first_at, on=key)
        out["peak"] = out["peak"].astype("int64")
        out["peak_at_us"] = out["peak_at_us"].astype("int64")
        return out

    return (ds.map_batches(to_points, batch_format="pyarrow")
              .map_batches(add_part, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(sweep), batch_format="pandas"))


def resample_ffill(ds, key: str, ts_col: str, val_col: str,
                   order_col: str, freq_s: int = 3600):
    """Gap-filling resample with forward fill (the time-series
    regularization every metrics store needs): per key, one row per
    ``freq_s`` bucket across [first observed bucket, last observed
    bucket], carrying the last-at-or-before observation's value
    (deterministic last = max (ts, order_col)) and an ``observed``
    flag for buckets that had data.

    Scale shape: per-block pandas partial keeps ONE candidate row per
    (key, bucket) — O(keys × buckets × blocks) compact rows move, the
    raw stream does not — then a single final task re-argmaxes across
    blocks, materializes each key's bucket range (np.repeat, no Python
    loop) and grouped-ffills. Output size O(keys × buckets), driver
    never holds raw events."""
    freq_us = int(freq_s) * 1_000_000

    def last_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64")
        d = pd.DataFrame({key: df[key], "bucket": (ts_us // freq_us) * freq_us,
                          "ts_us": ts_us, "o": df[order_col],
                          "v": df[val_col]})
        d = d.sort_values(["ts_us", "o"], kind="mergesort")
        return d.groupby([key, "bucket"], as_index=False, dropna=False).tail(1)

    def fold_partial(df: pd.DataFrame) -> pd.DataFrame:
        # partial rows already carry (key, bucket, ts_us, o, v)
        d = df.sort_values(["ts_us", "o"], kind="mergesort")
        return d.groupby([key, "bucket"], as_index=False, dropna=False).tail(1)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if df.empty:
            return pa.table({key: pa.array([], pa.string()),
                             "hour": pa.array([], pa.timestamp("us")),
                             "filled_value": pa.array([], pa.float64()),
                             "observed": pa.array([], pa.int64())})
        obs = fold_partial(df)
        span = obs.groupby(key, as_index=False).agg(h0=("bucket", "min"),
                                                    h1=("bucket", "max"))
        counts = ((span["h1"] - span["h0"]) // freq_us + 1).to_numpy()
        keys_rep = np.repeat(span[key].to_numpy(), counts)
        intra = (np.concatenate([np.arange(c) for c in counts])
                 if len(counts) else np.array([], np.int64))
        buckets = np.repeat(span["h0"].to_numpy(), counts) + intra * freq_us
        grid = pd.DataFrame({key: keys_rep, "bucket": buckets})
        m = grid.merge(obs[[key, "bucket", "v"]], on=[key, "bucket"],
                       how="left")
        m["observed"] = m["v"].notna().astype("int64")
        m["filled_value"] = m.groupby(key, sort=False)["v"].ffill()
        return pa.table({
            key: pa.array(m[key]),
            "hour": pa.array(m["bucket"].to_numpy(), pa.timestamp("us")),
            "filled_value": pa.array(m["filled_value"].to_numpy()),
            "observed": pa.array(m["observed"].to_numpy()),
        })

    return (ds.map_batches(arrow_out(last_per_bucket), batch_format="pandas")
              .repartition(1)
              .map_batches(final, batch_format="pyarrow", batch_size=None))


def cusum_changepoints(ds, key: str, ts_col: str, h_mult: int = 2):
    """One-sided positive CUSUM change-point detection (Page 1954) over
    per-(key, day) counts, integer-exact: with daily counts c_t, n days
    and total T per key, the drift-corrected increments
    D_t = c_t·n − T sum to zero, and the reset-at-zero CUSUM
    S_t = max(0, S_{t−1} + D_t) equals the PREFIX-SUM IDENTITY
    P_t − min(0, min_{j≤t} P_j) — so both engines compute it as
    cumsum + running-min window math, no recursion. A day alarms when
    S_t > h_mult·T.

    Scale shape: raw events collapse to per-block (key, day) count
    partials (compact_groupby), the fold runs over O(keys × days)
    rows in one task; nothing float, nothing per-row."""
    from .agg import compact_groupby

    def day_rows(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key],
                         "day": pc.strftime(t[ts_col], format="%Y-%m-%d")})

    daily = compact_groupby(ds.map_batches(day_rows, batch_format="pyarrow"),
                            [key, "day"], count_alias="c")

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([key, "day"], kind="mergesort")
        g = df.groupby(key, sort=False)
        n = g["c"].transform("size").to_numpy().astype(np.int64)
        T = g["c"].transform("sum").to_numpy().astype(np.int64)
        D = df["c"].to_numpy().astype(np.int64) * n - T
        P = pd.Series(D, index=df.index).groupby(df[key], sort=False).cumsum()
        runmin = P.groupby(df[key], sort=False).cummin().to_numpy()
        S = P.to_numpy() - np.minimum(runmin, 0)
        out = pd.DataFrame({key: df[key].to_numpy(), "day": df["day"].to_numpy(),
                            "cusum": S.astype(np.int64),
                            "alarm": (S > h_mult * T).astype(np.int64)})
        return pa_from_pandas(out)

    return daily.map_batches(fold, batch_format="pyarrow", batch_size=None)


def global_rank(ds, order_cols: list[str], num_buckets: int = 64,
                out_col: str = "rank"):
    """Distributed TOTAL-ORDER row_number (the no-PARTITION-BY window,
    i.e. a global sort) without materializing the dataset: (1) bucket
    boundaries come from per-block evenly-spaced value samples of the
    leading order column (~33 values per block — compact regardless of
    data size; boundaries affect only balance, never correctness),
    (2) one COMPACT exchange of per-block (bucket, n) count partials
    yields the exact global offset of every bucket, (3) ONE row
    exchange co-locates each value-range bucket, where a vectorized
    lexsort assigns within-bucket ranks and adds the broadcast offset.
    Equal leading values always share a bucket (searchsorted side =
    'right'), so ties resolve entirely inside one partition via the
    remaining order columns. ``order_cols`` must be int64-castable and
    make the order total.

    Scale shape: two passes over the (column-pruned) source, one
    compact + one real exchange, O(num_buckets) driver state — the
    honest cost of a total order; skewed leading values bound a
    bucket's size by that value's multiplicity (tie-heavy data wants a
    finer composite leading key)."""
    import pandas as pd

    from .base import pa_from_pandas

    c0 = order_cols[0]

    def samp(t: pa.Table) -> pa.Table:
        v = np.sort(t[c0].to_numpy(zero_copy_only=False).astype(np.int64))
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.int64())})
        idx = np.linspace(0, len(v) - 1, num=min(33, len(v))).astype(np.int64)
        return pa.table({"v": pa.array(v[idx], pa.int64())})

    sv = np.sort(np.concatenate(
        [b["v"].to_numpy(zero_copy_only=False)
         for b in ds.map_batches(samp, batch_format="pyarrow")
                    .iter_batches(batch_format="pyarrow")] or
        [np.array([], np.int64)]))
    if len(sv) > 1:
        qs = np.linspace(0.0, 1.0, num_buckets + 1)[1:-1]
        bounds = np.unique(sv[(qs * (len(sv) - 1)).astype(np.int64)])
    else:
        bounds = np.array([], np.int64)

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t[c0].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.searchsorted(bounds, v, side="right")
        return t.append_column("__b", pa.array(b.astype(np.int64)))

    # compact pass: exact per-bucket counts -> global offsets
    def count_partial(t: pa.Table) -> pa.Table:
        t = add_bucket(t)
        b, n = np.unique(t["__b"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"__b": pa.array(b.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    counts = pd.concat(
        [b.to_pandas() for b in
         ds.map_batches(count_partial, batch_format="pyarrow")
           .iter_batches(batch_format="pyarrow")] or
        [pd.DataFrame({"__b": [], "n": []})])
    per_bucket = counts.groupby("__b")["n"].sum()
    nb = len(bounds) + 1
    full = np.zeros(nb, np.int64)
    if len(per_bucket):
        full[per_bucket.index.to_numpy().astype(np.int64)] = \
            per_bucket.to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        b = int(g["__b"].iloc[0])
        order = np.lexsort([g[c].to_numpy() for c in reversed(order_cols)])
        rnk = np.empty(len(g), np.int64)
        rnk[order] = np.arange(1, len(g) + 1, dtype=np.int64)
        g = g.drop(columns="__b")
        g[out_col] = rnk + offsets[b]
        return pa_from_pandas(g)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__b")
              .map_groups(arrow_out(rank_bucket), batch_format="pandas"))


def interval_gap_stats(ds, key: str, ts_col: str, length_s: int,
                       num_partitions: int = 64):
    """Idle-gap statistics — the complement of
    ``interval_union_coverage``: each row opens [ts, ts + length_s);
    per key, report the number of gaps BETWEEN merged activity islands,
    the total idle micro-second budget inside the key's active span
    (reported as seconds, one integer division over the SUM so the twin
    matches bit-for-bit), and the longest single gap — "how fragmented
    was this tenant's activity". Keys with a single island report
    (0, 0, 0).

    Same shape as the coverage op: ONE key-hash exchange, one
    vectorized pass per partition (grouped shift + cummax island
    detection, island extents via groupby min/max, gaps via a grouped
    shift over island starts). Gaps are strictly positive by island
    construction (a new island opens only when its start exceeds the
    running max end)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    len_us = int(length_s) * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        s = g[ts_col].astype("datetime64[us]").astype("int64")
        e = s + len_us
        ee = pd.Series(e.to_numpy(), index=g.index)
        prev_max = ee.groupby(g[key], sort=False, dropna=False).shift(1).groupby(
            g[key], sort=False, dropna=False).cummax()
        first = prev_max.isna().to_numpy()
        new_island = first | (s.to_numpy() > prev_max.to_numpy())
        isl = pd.Series(new_island.astype(np.int64), index=g.index).groupby(
            g[key], sort=False, dropna=False).cumsum()
        d = pd.DataFrame({key: g[key].to_numpy(), "isl": isl.to_numpy(),
                          "s": s.to_numpy(), "e": e.to_numpy()})
        ext = (d.groupby([key, "isl"], as_index=False, dropna=False)
               .agg(s=("s", "min"), e=("e", "max"))
               .sort_values([key, "isl"], kind="mergesort"))
        nxt = ext.groupby(key, sort=False, dropna=False)["s"].shift(-1)
        gap_us = (nxt - ext["e"]).dropna()
        ext2 = ext.loc[gap_us.index, [key]].assign(gap_us=gap_us.astype("int64"))
        base = (ext.groupby(key, as_index=False, dropna=False)
                .agg(n_islands=("isl", "size")))
        agg = (ext2.groupby(key, as_index=False, dropna=False)
               .agg(idle_us=("gap_us", "sum"), max_gap_us=("gap_us", "max")))
        out = base.merge(agg, on=key, how="left")
        out["n_gaps"] = (out["n_islands"] - 1).astype("int64")
        out["idle_s"] = (out["idle_us"].fillna(0).astype("int64")
                         // 1_000_000).astype("int64")
        out["max_gap_s"] = (out["max_gap_us"].fillna(0).astype("int64")
                            // 1_000_000).astype("int64")
        return out[[key, "n_gaps", "idle_s", "max_gap_s"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(gaps), batch_format="pandas")
    )


def session_entry_exit(ds, key: str, ts_col: str, order_col: str,
                       val_col: str, gap_s: int = 1800,
                       num_partitions: int = 64):
    """Session entry/exit matrix with bounce counts — the landing/exit
    page report: sessions are maximal runs per key with inter-event
    gaps ≤ ``gap_s`` (a STRICTLY larger gap opens a new session), each
    session contributes one (entry value, exit value) pair under the
    total (ts, order_col) order, and a 1-event session is a bounce.
    Output: (entry, exit, n_sessions, n_bounces).

    ONE key-hash exchange (the sessionization rail shared with
    events_sessions/first_k_paths), per-partition vectorized pass
    (lexsort, grouped shift for the gap break, cumsum session ids,
    groupby first/last/size), then per-partition (entry, exit)
    PARTIALS into the compact final fold — O(|vals|² × partitions)
    tiny rows, raw rows move once."""
    import pandas as pd

    from .agg import compact_groupby

    gap_us = int(gap_s) * 1_000_000

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        if kv.dtype.kind in "iu":
            h = kv.astype(np.uint64)
        else:
            h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, order_col], kind="mergesort")
        s = g[ts_col].astype("datetime64[us]").astype("int64")
        prev = pd.Series(s.to_numpy(), index=g.index).groupby(
            g[key], sort=False, dropna=False).shift(1)
        brk = prev.isna().to_numpy() | ((s.to_numpy() - prev.to_numpy())
                                        > gap_us)
        sess = np.cumsum(brk.astype(np.int64))  # global ids: keys never share
        d = pd.DataFrame({"sess": sess, "val": g[val_col].to_numpy()})
        per = d.groupby("sess", sort=False).agg(
            entry=("val", "first"), exit=("val", "last"), n=("val", "size"))
        out = per.assign(bounce=(per["n"] == 1).astype(np.int64)).groupby(
            ["entry", "exit"], as_index=False).agg(
            n_sessions=("n", "size"), n_bounces=("bounce", "sum"))
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_bounces"] = out["n_bounces"].astype("int64")
        return out

    partials = (ds.map_batches(add_part, batch_format="pyarrow")
                .groupby("__p")
                .map_groups(arrow_out(fold), batch_format="pandas"))
    return compact_groupby(partials, ["entry", "exit"],
                           sum_cols={"n_sessions": "n_sessions",
                                     "n_bounces": "n_bounces"})


def survival_km_parts(ds, key: str, ts_col: str, bucket_s: int = 3600,
                      censor_tail_s: int = 21600):
    """Kaplan–Meier survival-curve INTEGER PARTS (Kaplan & Meier 1958)
    over per-key lifetimes with right censoring: a key's lifetime is
    ``last_ts − first_ts`` bucketed to ``bucket_s``; keys whose last
    event falls within ``censor_tail_s`` of the corpus max timestamp
    are CENSORED (they may still be alive — the estimator must not
    count them as deaths). Output, one row per observed lifetime
    bucket t: (t_bucket, n_risk, n_died, n_censored) where
    ``n_risk = Σ_{t' ≥ t} (died + censored)`` — the KM product
    Π(1 − d/n) is driver arithmetic over these integers, so the twin
    never compares floats.

    Shape: one pruned pass folds the global max timestamp (per-block
    max partials); ONE key-hash exchange builds per-key (first, last)
    via the self-decomposable min/max combiner (hash_groupby_agg —
    unbounded key cardinality, only per-block partials move); the
    bucket rollup is compact (O(buckets)) and the at-risk suffix
    cumsum runs on that single final block."""
    import pandas as pd

    from .agg import compact_groupby, hash_groupby_agg

    bucket_us = int(bucket_s) * 1_000_000
    tail_us = int(censor_tail_s) * 1_000_000

    def blk_max(t: pa.Table) -> pa.Table:
        m = pc.max(pc.cast(t[ts_col], pa.timestamp("us")))
        return pa.table({"m": pa.array([m.value], pa.int64())})

    from .tailsampling import ray_get_tables
    mx = int(pa.concat_tables(
        ray_get_tables(ds.map_batches(blk_max, batch_format="pyarrow"))
    )["m"].to_pandas().max())

    def dup(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({key: t[key], "f_us": us, "l_us": us})

    users = hash_groupby_agg(
        ds.map_batches(dup, batch_format="pyarrow"), [key],
        {"f_us": ("min", "first_us"), "l_us": ("max", "last_us")},
        num_partitions=32)

    def bucketize(t: pa.Table) -> pa.Table:
        f = t["first_us"].to_numpy(zero_copy_only=False)
        l = t["last_us"].to_numpy(zero_copy_only=False)
        tb = (l - f) // bucket_us
        cens = ((mx - l) < tail_us).astype(np.int64)
        return pa.table({"t_bucket": pa.array(tb.astype(np.int64)),
                         "n_died": pa.array(1 - cens),
                         "n_censored": pa.array(cens)})

    buckets = compact_groupby(
        users.map_batches(bucketize, batch_format="pyarrow"),
        ["t_bucket"], sum_cols={"n_died": "n_died",
                                "n_censored": "n_censored"})

    def at_risk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("t_bucket", ascending=False)
        df["n_risk"] = (df["n_died"] + df["n_censored"]).cumsum()
        df = df.sort_values("t_bucket")
        return pa_from_pandas(df[["t_bucket", "n_risk",
                                  "n_died", "n_censored"]].astype("int64"))

    return buckets.map_batches(at_risk, batch_format="pyarrow",
                               batch_size=None)


def burst_hours(ds, key: str, ts_col: str, window: int = 24,
                factor: int = 3):
    """Burst detection against a trailing baseline (the practical core
    of Kleinberg 2002's burst model, kept integer-exact): hourly event
    counts per key on a DENSE hour spine (missing hours count 0 — a
    sparse trailing window would inflate the baseline), an hour bursts
    when ``window·n > factor·trail`` where ``trail`` is the sum of the
    previous ``window`` hourly counts (i.e. n > factor × trailing
    mean, cross-multiplied so neither engine divides). The first
    ``window`` hours of a key's span are never flagged (incomplete
    baseline). Output: flagged (key, hour, n, trail) rows.

    Shape: the hourly fold is ONE compact exchange (O(keys × hours)
    partial rows); the spine densify + rolling sum run on the single
    compact final block — bounded by the corpus time span, not its
    volume."""
    import pandas as pd

    from .agg import compact_groupby

    def to_hour(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({key: t[key],
                         "hour": pc.divide(us, 3_600_000_000)})

    hourly = compact_groupby(ds.map_batches(to_hour, batch_format="pyarrow"),
                             [key, "hour"], count_alias="n")

    def detect(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for k, g in df.groupby(key, sort=False, dropna=False):
            g = g.set_index("hour")["n"]
            spine = pd.RangeIndex(int(g.index.min()), int(g.index.max()) + 1)
            n = g.reindex(spine, fill_value=0).astype("int64")
            trail = n.rolling(window, min_periods=1).sum().shift(1).fillna(0)
            idx = np.arange(len(n))
            flag = (idx >= window) & (window * n.to_numpy()
                                      > factor * trail.to_numpy())
            if flag.any():
                rows.append(pd.DataFrame({
                    key: k, "hour": n.index[flag].to_numpy(np.int64),
                    "n": n.to_numpy()[flag],
                    "trail": trail.to_numpy()[flag].astype(np.int64)}))
        if not rows:
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             "hour": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "trail": pa.array([], pa.int64())})
        return pa_from_pandas(pd.concat(rows, ignore_index=True))

    return hourly.map_batches(detect, batch_format="pyarrow",
                              batch_size=None)


def suffix_budget_stats(ds, key: str, order_col: str, text_col: str,
                        budget: int, num_partitions: int = 16):
    """Context-window truncation audit (what a chat trainer's packer
    does to every conversation): keep the longest SUFFIX of ordered
    rows whose total token count fits ``budget`` — most-recent-first,
    the standard chat truncation — and report per kept-row count
    ``n_turns_kept``: how many keys land there (``n_convs``) and the
    integer token mass kept vs dropped. Tokens = non-empty
    space-separated runs ('' → 0). A single row larger than the budget
    keeps 0 rows (the strict rule).

    Shape: ONE key-hash exchange of (key, order, text); per partition
    the suffix sum is a single segmented cumsum over rows sorted
    (key, order DESC) — no per-key loop; only per-partition
    (n_kept → partials) rows fold, through compact_groupby's
    repartition(1) of tiny partials."""
    from .agg import compact_groupby

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col],
                          ascending=[True, False], kind="mergesort")
        ntok = g[text_col].str.count(r"[^ ]+").to_numpy(np.int64)
        kv = g[key].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = kv[1:] != kv[:-1]
        cs = np.cumsum(ntok)
        idx = np.arange(n)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        suf = cs - (cs[start] - ntok[start])  # segmented suffix cumsum
        kept = suf <= budget
        d = pd.DataFrame({"k": kv, "ntok": ntok,
                          "kept_tok": np.where(kept, ntok, 0),
                          "kept": kept.astype(np.int64)})
        per_key = d.groupby("k", sort=False).agg(
            tokens_total=("ntok", "sum"), n_kept=("kept", "sum"),
            tokens_kept=("kept_tok", "sum"))
        per_key["dropped"] = per_key["tokens_total"] - per_key["tokens_kept"]
        out = per_key.groupby("n_kept", as_index=False).agg(
            n_convs=("tokens_total", "size"),
            sum_tokens_kept=("tokens_kept", "sum"),
            sum_tokens_dropped=("dropped", "sum"))
        out = out.rename(columns={"n_kept": "n_turns_kept"})
        return out.astype({c: "int64" for c in out.columns})

    per_part = (ds.map_batches(add_part, batch_format="pyarrow")
                  .groupby("__p")
                  .map_groups(arrow_out(per), batch_format="pandas"))
    return compact_groupby(
        per_part, keys=["n_turns_kept"],
        sum_cols={"n_convs": "n_convs",
                  "sum_tokens_kept": "sum_tokens_kept",
                  "sum_tokens_dropped": "sum_tokens_dropped"})


def seasonal_naive_error(ds, key: str, ts_col: str, val_col: str,
                         season: int = 24):
    """Seasonal-naive backtest / MASE parts (Hyndman & Koehler 2006's
    scaled-error denominator and numerator, kept integer-exact): per
    key, hourly value totals on a DENSE hour spine (missing hours are
    real zeros), then over the evaluable horizon (hours ≥ span start +
    ``season``) the absolute errors of the two canonical baselines —
    seasonal-naive ŷ_h = v_{h−season} and naive ŷ_h = v_{h−1}. Output
    one row per key: (n_hours, sum_abs_seasonal, sum_abs_naive); the
    MASE ratio stays a driver division. A key whose span is shorter
    than ``season``+1 hours emits nothing (no evaluable hour).

    Shape: the hourly fold is ONE compact exchange (O(keys × hours)
    partial rows); spine densify + shifts run on the single compact
    block — bounded by the time span, not the volume."""
    from .agg import compact_groupby

    def to_hour(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table({key: t[key],
                         "hour": pc.divide(us, 3_600_000_000),
                         "v": pc.cast(t[val_col], pa.int64())})

    hourly = compact_groupby(ds.map_batches(to_hour, batch_format="pyarrow"),
                             [key, "hour"], sum_cols={"v": "v"})

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for k, g in df.groupby(key, sort=False):
            g = g.set_index("hour")["v"].sort_index()
            spine = pd.RangeIndex(int(g.index.min()), int(g.index.max()) + 1)
            v = g.reindex(spine, fill_value=0).to_numpy(np.int64)
            if len(v) <= season:
                continue
            seas = np.abs(v[season:] - v[:-season])
            naiv = np.abs(v[1:] - v[:-1])[season - 1:]
            rows.append((k, len(seas), int(seas.sum()), int(naiv.sum())))
        cols = list(zip(*rows)) if rows else ([], [], [], [])
        return pa.table({key: pa.array(list(cols[0]),
                                       t.schema.field(key).type),
                         "n_hours": pa.array(list(cols[1]), pa.int64()),
                         "sum_abs_seasonal": pa.array(list(cols[2]),
                                                      pa.int64()),
                         "sum_abs_naive": pa.array(list(cols[3]),
                                                   pa.int64())})

    return hourly.map_batches(score, batch_format="pyarrow",
                              batch_size=None)


def context_cost_stats(ds, key: str, order_col: str, text_col: str,
                       num_partitions: int = 16):
    """Quadratic context-cost audit (what serving a multi-turn
    conversation actually costs a transformer: every turn re-reads its
    whole prefix): per key with ordered turn token counts t_0..t_{n-1},
    the serving mass is Σ_i Σ_{j≤i} t_j — each token paid once per
    later-or-equal turn. Output per conversation LENGTH ``n_turns``:
    (n_convs, sum_tokens, sum_context_tokens) — the context blow-up
    ratio stays a driver division. Tokens = non-empty space-separated
    runs.

    Shape: ONE key-hash exchange; per partition the prefix sums are a
    single segmented cumsum over rows sorted (key, order); compact
    per-length partials fold through compact_groupby."""
    from .agg import compact_groupby

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(kv.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def per(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, order_col], kind="mergesort")
        ntok = g[text_col].str.count(r"[^ ]+").to_numpy(np.int64)
        kv = g[key].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = kv[1:] != kv[:-1]
        cs = np.cumsum(ntok)
        idx = np.arange(n)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        ctx = cs - (cs[start] - ntok[start])  # segmented prefix cumsum
        d = pd.DataFrame({"k": kv, "ntok": ntok, "ctx": ctx})
        per_key = d.groupby("k", sort=False).agg(
            n_turns=("ntok", "size"), tokens=("ntok", "sum"),
            context_tokens=("ctx", "sum"))
        out = per_key.groupby("n_turns", as_index=False).agg(
            n_convs=("tokens", "size"), sum_tokens=("tokens", "sum"),
            sum_context_tokens=("context_tokens", "sum"))
        return out.astype({c: "int64" for c in out.columns})

    per_part = (ds.map_batches(add_part, batch_format="pyarrow")
                  .groupby("__p")
                  .map_groups(arrow_out(per), batch_format="pandas"))
    return compact_groupby(
        per_part, keys=["n_turns"],
        sum_cols={"n_convs": "n_convs", "sum_tokens": "sum_tokens",
                  "sum_context_tokens": "sum_context_tokens"})
