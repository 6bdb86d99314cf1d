"""Randomized differential tests for round-5 operators: each drives
the REAL distributed query over a synthetic parquet table and compares
against an independent O(n²)-naive pure-Python reference — a second
implementation path, not the SQL twin, so a shared misunderstanding
between the Ray code and its DuckDB twin cannot hide."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(tmp, rows):
    """rows: list of (user_id, t_us, event_type[, value])"""
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array(np.array([r[0] for r in rows], np.int64)),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([float(r[3]) if len(r) > 3 else 1.0
                           for r in rows]),
        "props": pa.array(["{}"] * n),
    }), os.path.join(tmp, "events.parquet"))
    return str(tmp)


def _naive_funnel(rows):
    users = {}
    for u, t, et, *_ in rows:
        users.setdefault(u, []).append((t, et))
    n1 = n2 = n3 = 0
    for evs in users.values():
        views = sorted(t for t, e in evs if e == "view")
        if not views:
            continue
        n1 += 1
        t1 = views[0]
        clicks = sorted(t for t, e in evs if e == "click" and t > t1)
        if not clicks:
            continue
        n2 += 1
        t2 = clicks[0]
        if any(t > t2 for t, e in evs if e == "purchase"):
            n3 += 1
    return n1, n2, n3


def test_funnel_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(30, 200))
        rows = [(int(rng.integers(0, 20)),
                 int(rng.integers(0, 1000)) * 1_000_000,
                 ["view", "click", "purchase", "error"]
                 [int(rng.integers(0, 4))])
                for _ in range(n)]
        d = tmp_path / f"f{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_funnel_steps"](sf).to_pandas().iloc[0]
        assert (out["n_step1"], out["n_step2"], out["n_step3"]) \
            == _naive_funnel(rows), f"seed={seed}"


def _naive_out_of_order(rows):
    per = {}
    for i, (u, t, et, *_) in enumerate(rows):
        per.setdefault(u, []).append((i, t, et))
    agg = {}
    for evs in per.values():
        evs.sort()                      # arrival order = event_id
        wm = None
        for _, t, et in evs:
            late = wm is not None and t < wm
            lateness = (wm - t) if late else 0
            k = agg.setdefault(et, [0, 0, 0])
            k[0] += 1
            k[1] += int(late)
            k[2] = max(k[2], lateness)
            wm = t if wm is None else max(wm, t)
    return agg


def test_out_of_order_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 250))
        rows = [(int(rng.integers(0, 12)),
                 int(rng.integers(0, 500)) * 1_000_000,
                 ["click", "view", "error"][int(rng.integers(0, 3))])
                for _ in range(n)]
        d = tmp_path / f"o{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_out_of_order_audit"](sf).to_pandas()
        got = {r.event_type: (r.n_events, r.n_late, r.max_lateness_us)
               for r in out.itertuples()}
        assert got == {k: tuple(v) for k, v in
                       _naive_out_of_order(rows).items()}, f"seed={seed}"


def _naive_daily_mad(rows):
    per = {}
    for u, t, et, *_ in rows:
        per.setdefault(et, {}).setdefault(t // 86_400_000_000, 0)
        per[et][t // 86_400_000_000] += 1
    out = {}
    for et, days in per.items():
        n = sorted(days.values())
        d = len(n)
        med = n[(d + 1) // 2 - 1]
        dev = sorted(abs(x - med) for x in n)
        out[et] = (d, med, dev[(d + 1) // 2 - 1])
    return out


def test_daily_mad_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 300))
        rows = [(0, int(rng.integers(0, 20)) * 86_400_000_000
                 + int(rng.integers(0, 86_400_000_000)),
                 ["click", "error"][int(rng.integers(0, 2))])
                for _ in range(n)]
        d = tmp_path / f"m{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_daily_mad"](sf).to_pandas()
        got = {r.event_type: (r.n_days, r.median_daily, r.mad_daily)
               for r in out.itertuples()}
        assert got == _naive_daily_mad(rows), f"seed={seed}"


def test_hrw_migration_brute_force(ray_session, tmp_path):
    """HRW invariant: keys move IFF shard 8 wins their 9-way argmax —
    verified against a per-key brute force; moved fraction near 1/9."""
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(3)
    users = rng.choice(100_000, size=400, replace=False).astype(np.int64)
    rows = [(int(u), int(i) * 1_000_000, "click")
            for i, u in enumerate(users)]
    d = tmp_path / "h"
    d.mkdir()
    sf = _events(d, rows)
    out = QUERIES["events_hrw_shard_migration"](sf).to_pandas().iloc[0]

    P1, P2, M = 2654435761, 40503, (1 << 61) - 1
    moved = 0
    for u in users:
        scores = [((int(u) * P1) ^ (s * P2)) % M for s in range(9)]
        if int(np.argmax(scores)) == 8:
            moved += 1
    assert out["n_keys"] == len(users)
    assert out["n_moved"] == moved
    # HRW guarantee: only new-shard winners move (≈ n/9, loose bounds)
    assert 0 < moved < len(users) // 3


def _naive_streaks(rows):
    per = {}
    for u, t, *_ in rows:
        per.setdefault(u, set()).add(t // 86_400_000_000)
    hist = {}
    for days in per.values():
        best = run = 0
        prev = None
        for d in sorted(days):
            run = run + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, run)
            prev = d
        hist[best] = hist.get(best, 0) + 1
    return hist


def test_streaks_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 250))
        rows = [(int(rng.integers(0, 15)),
                 int(rng.integers(0, 40)) * 86_400_000_000
                 + int(rng.integers(0, 86_400)) * 1_000_000,
                 "view")
                for _ in range(n)]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_streaks"](sf).to_pandas()
        got = {int(r.streak_len): int(r.n_users) for r in out.itertuples()}
        assert got == _naive_streaks(rows), f"seed={seed}"


def _naive_spikes(rows):
    per = {}
    for u, t, et, *_ in rows:
        per.setdefault(et, {}).setdefault(t // 86_400_000_000, 0)
        per[et][t // 86_400_000_000] += 1
    out = {}
    for et, days in per.items():
        n = sorted(days.values())
        d = len(n)
        med = n[(d + 1) // 2 - 1]
        dev = sorted(abs(x - med) for x in n)
        mad = dev[(d + 1) // 2 - 1]
        out[et] = (d, sum(1 for x in n if x > med + 3 * mad), max(n))
    return out


def test_spike_days_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(60, 300))
        rows = [(int(rng.integers(0, 10)),
                 int(rng.integers(0, 25)) * 86_400_000_000
                 + int(rng.integers(0, 86_400)) * 1_000_000,
                 ["view", "click", "error"][int(rng.integers(0, 3))])
                for _ in range(n)]
        d = tmp_path / f"k{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_spike_days"](sf).to_pandas()
        got = {r.event_type: (r.n_days, r.n_spike_days, r.max_daily)
               for r in out.itertuples()}
        assert got == _naive_spikes(rows), f"seed={seed}"


def _naive_stickiness(rows):
    ud, uw, us = set(), set(), set()
    for u, t, *_ in rows:
        day = t // 86_400_000_000
        ud.add((u, day))
        uw.add((u, day // 7))
        us.add(u)
    return [len(ud), len(uw), len(us)]


def test_stickiness_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 250))
        rows = [(int(rng.integers(0, 15)),
                 int(rng.integers(0, 30)) * 86_400_000_000
                 + int(rng.integers(0, 86_400)) * 1_000_000,
                 "view")
                for _ in range(n)]
        d = tmp_path / f"w{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_stickiness_parts"](sf).to_pandas()
        assert out.iloc[0].tolist() == _naive_stickiness(rows), \
            f"seed={seed}"


def _naive_first_event(rows):
    per = {}
    for i, (u, t, et, *_) in enumerate(rows):
        per.setdefault(u, []).append((t, i, et))
    out = {}
    for u, evs in per.items():
        evs.sort()
        ft = evs[0][2]
        k = out.setdefault(ft, [0, 0])
        k[0] += 1
        k[1] += len(evs)
    return {k: tuple(v) for k, v in out.items()}


def test_first_event_census_random_differential(ray_session, tmp_path):
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 250))
        # coarse timestamps force plenty of (ts) ties → the event_id
        # tie-break is exercised (event_id = row index here)
        rows = [(int(rng.integers(0, 12)),
                 int(rng.integers(0, 30)) * 1_000_000,
                 ["view", "click", "purchase", "signup"]
                 [int(rng.integers(0, 4))])
                for _ in range(n)]
        d = tmp_path / f"fe{seed}"
        d.mkdir()
        sf = _events(d, rows)
        out = QUERIES["events_first_event_census"](sf).to_pandas()
        got = {r.first_type: (r.n_users, r.sum_events)
               for r in out.itertuples()}
        assert got == _naive_first_event(rows), f"seed={seed}"


def test_emb_exact_dup_census_random_differential(ray_session, tmp_path):
    """Dup-heavy random vectors through the real pipeline vs a naive
    Counter over quantized tuples — the full-key exactness claim
    exercised on collisions the synthetic corpus never produces."""
    from collections import Counter

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n, d = int(rng.integers(50, 200)), 4
        # draw from a TINY grid so exact duplicates are plentiful
        vecs = rng.integers(0, 3, size=(n, d)).astype(np.float32) / 4.0
        t = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        })
        dd = tmp_path / f"e{seed}"
        dd.mkdir()
        pq.write_table(t, dd / "embeddings.parquet")
        out = QUERIES["emb_exact_dup_census"](str(dd)).to_pandas()
        cents = np.floor(vecs.astype(np.float64) * 10000.0 + 0.5) \
            .astype(np.int64)
        cnt = Counter(map(tuple, cents))
        dup = [c for c in cnt.values() if c >= 2]
        assert out.iloc[0].tolist() == [
            len(dup), sum(c - 1 for c in dup),
            max(dup) if dup else 0], f"seed={seed}"


def _naive_cadence(rows):
    """rows: (custkey, day)"""
    per = {}
    for c, d in rows:
        per.setdefault(c, []).append(d)
    hist = {}
    for days in per.values():
        days = sorted(days)
        gaps = [b - a for a, b in zip(days, days[1:])]
        if not gaps:
            continue
        gaps.sort()
        med = gaps[(len(gaps) + 1) // 2 - 1]
        b = min(med // 7, 9)
        k = hist.setdefault(b, [0, 0])
        k[0] += 1
        k[1] += med
    return {k: tuple(v) for k, v in hist.items()}


def test_orders_cadence_random_differential(ray_session, tmp_path):
    """Randomized per-customer order days (with plenty of repeat-day
    ties → zero gaps) through the real distributed rank-pick kernel
    vs a naive sorted-gaps median."""
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    for seed in (0, 1):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(40, 200))
        rows = [(int(rng.integers(0, 15)), int(rng.integers(0, 120)))
                for _ in range(n)]
        t = pa.table({
            "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": pa.array([1.0] * n),
            "o_orderdate": pa.array(
                (np.array([r[1] for r in rows], "timedelta64[D]")
                 + np.datetime64("2024-01-01", "D")).astype(
                     "datetime64[us]")),
            "o_orderpriority": ["1-URGENT"] * n,
        })
        d = tmp_path / f"cad{seed}"
        d.mkdir()
        pq.write_table(t, d / "orders.parquet")
        out = QUERIES["orders_cadence_hist"](str(d)).to_pandas()
        got = {int(r.cadence_bucket): (int(r.n_customers),
                                       int(r.sum_median_gap))
               for r in out.itertuples()}
        assert got == _naive_cadence(rows), f"seed={seed}"
