import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.joins import (
    anti_join,
    asof_join,
    broadcast_join,
    bucketed_hash_join,
    large_anti_join,
    large_semi_join,
    semi_join,
)
from opentelemetry_collector_contrib_ray.stages.windows import (
    session_windows,
    sliding_window_counts,
    tumbling_window,
)


def ts_arr(vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"))


def test_broadcast_join():
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    small = pd.DataFrame({"k": [1, 3], "extra": ["x", "z"]})
    out = broadcast_join(left, ray.put(small), on="k", concurrency=1).to_pandas()
    got = dict(zip(out["k"], out["extra"]))
    assert got == {1: "x", 2: None, 3: "z"} or (got[1] == "x" and pd.isna(got[2]))


def test_semi_anti_join():
    ds = rd.from_arrow(pa.table({"k": [1, 2, 3, 4]}))
    keys = {2, 4}
    assert sorted(semi_join(ds, keys, "k").to_pandas()["k"]) == [2, 4]
    assert sorted(anti_join(ds, keys, "k").to_pandas()["k"]) == [1, 3]


def test_bucketed_hash_join_vs_pandas():
    rng = np.random.default_rng(3)
    l = pd.DataFrame({"k": rng.integers(0, 50, 500), "lv": np.arange(500)})
    r = pd.DataFrame({"k": np.arange(50), "rv": np.arange(50) * 10})
    out = bucketed_hash_join(
        rd.from_pandas(l).repartition(4), rd.from_pandas(r).repartition(2), on="k",
        n_buckets=8,
    ).to_pandas()
    expected = l.merge(r, on="k")
    assert len(out) == len(expected)
    assert sorted(zip(out["k"], out["lv"], out["rv"])) == sorted(
        zip(expected["k"], expected["lv"], expected["rv"])
    )


def test_bucketed_hash_join_left_outer_unmatched():
    # ADVICE round 1: left join with keys absent on the right must not
    # error and must null-fill the right columns
    l = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    r = pd.DataFrame({"k": [2], "rv": [200]})
    out = bucketed_hash_join(
        rd.from_pandas(l), rd.from_pandas(r), on="k", how="left", num_partitions=4
    ).to_pandas()
    assert len(out) == 3
    got = dict(zip(out["k"], out["rv"]))
    assert got[2] == 200 and pd.isna(got[1]) and pd.isna(got[3])


def test_bucketed_hash_join_skewed_key():
    # one key = 20% of left rows: output must still match pandas
    rng = np.random.default_rng(7)
    keys = np.where(rng.random(20000) < 0.2, 0, rng.integers(1, 200, 20000))
    l = pd.DataFrame({"k": keys, "lv": np.arange(20000)})
    r = pd.DataFrame({"k": np.arange(200), "rv": np.arange(200) * 3})
    out = bucketed_hash_join(
        rd.from_pandas(l).repartition(8), rd.from_pandas(r), on="k", num_partitions=16
    ).to_pandas()
    expected = l.merge(r, on="k")
    assert len(out) == len(expected)
    assert int(out["rv"].sum()) == int(expected["rv"].sum())


def test_large_semi_anti_join():
    l = rd.from_items([{"k": i} for i in range(10)])
    r = rd.from_items([{"k": i} for i in [2, 4, 6, 99]])
    assert sorted(large_semi_join(l, r, "k", num_partitions=2).to_pandas()["k"]) == [2, 4, 6]
    assert sorted(large_anti_join(l, r, "k", num_partitions=2).to_pandas()["k"]) == [
        0, 1, 3, 5, 7, 8, 9,
    ]


def test_asof_join():
    trades = pa.table(
        {"sym": ["a", "a", "b"], "ts": ts_arr(["2024-01-01T10:00:05", "2024-01-01T10:01:00", "2024-01-01T10:00:30"]),
         "qty": [1, 2, 3]}
    )
    quotes = pa.table(
        {"sym": ["a", "a", "b"], "ts": ts_arr(["2024-01-01T10:00:00", "2024-01-01T10:00:50", "2024-01-01T10:00:00"]),
         "px": [100.0, 101.0, 50.0]}
    )
    out = asof_join(rd.from_arrow(trades), rd.from_arrow(quotes), key="sym", ts="ts")
    df = out.to_pandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    got = df[df["qty"].notna()]
    assert got["px"].tolist() == [100.0, 101.0, 50.0]


def _asof_oracle(l: pd.DataFrame, r: pd.DataFrame, key, ts, val,
                 allow_exact=True) -> dict:
    """Brute-force per-row asof for verification."""
    out = {}
    for i, row in l.iterrows():
        cand = r[(r[key] == row[key])
                 & ((r[ts] <= row[ts]) if allow_exact else (r[ts] < row[ts]))]
        out[i] = None if cand.empty else cand.sort_values(ts)[val].iloc[-1]
    return out


def test_asof_join_bucketed_cross_bucket_carry():
    # right rows are sparse: most left buckets have no in-bucket right
    # row and must resolve via the carry row from an earlier bucket
    base = np.datetime64("2024-01-01T00:00:00", "us")
    l = pd.DataFrame({
        "k": ["a"] * 50 + ["b"] * 50,
        "ts": np.concatenate([base + np.arange(50) * np.timedelta64(1800, "s")] * 2),
        "lv": np.arange(100),
    })
    rng = np.random.default_rng(11)
    r = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": [base + np.timedelta64(100, "s"), base + np.timedelta64(40000, "s"),
               base + np.timedelta64(7000, "s")],
        "px": [1.0, 2.0, 3.0],
    })
    out = asof_join(
        rd.from_pandas(l).repartition(4), rd.from_pandas(r), key="k", ts="ts",
        bucket_width_s=3600,
    ).to_pandas()
    assert len(out) == 100
    oracle = _asof_oracle(l, r, "k", "ts", "px")
    got = {
        (row["k"], row["ts"]): (None if pd.isna(row["px"]) else row["px"])
        for _, row in out.iterrows()
    }
    for i, row in l.iterrows():
        assert got[(row["k"], row["ts"])] == oracle[i], (row["k"], row["ts"])


def test_asof_join_bucketed_matches_key_shuffle_path():
    rng = np.random.default_rng(5)
    base = np.datetime64("2024-01-01", "us")
    n = 2000
    l = pd.DataFrame({
        "k": rng.integers(0, 8, n),
        "ts": base + rng.integers(0, 10**6, n).astype("timedelta64[s]"),
        "lv": np.arange(n),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, 8, 300),
        "ts": base + rng.integers(0, 10**6, 300).astype("timedelta64[s]"),
        "px": rng.random(300),
    })
    a = asof_join(rd.from_pandas(l), rd.from_pandas(r), key="k", ts="ts").to_pandas()
    b = asof_join(rd.from_pandas(l), rd.from_pandas(r), key="k", ts="ts",
                  bucket_width_s=24 * 3600).to_pandas()
    ka = sorted(zip(a["k"], a["ts"], a["lv"], a["px"].fillna(-1)))
    kb = sorted(zip(b["k"], b["ts"], b["lv"], b["px"].fillna(-1)))
    assert ka == kb


def test_tumbling_window():
    t = pa.table(
        {"k": ["u"] * 4,
         "ts": ts_arr(["2024-01-01T00:10", "2024-01-01T00:50", "2024-01-01T01:10", "2024-01-01T03:00"]),
         "v": pa.array([1, 2, 3, 4], type=pa.int64())}
    )
    out = tumbling_window(rd.from_arrow(t), "k", "ts", 3600, agg_col="v").to_pandas()
    out = out.sort_values("window_start").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1, 1]
    assert out["sum_v"].tolist() == [3, 3, 4]


def test_sliding_window_counts():
    t = pa.table(
        {"k": ["u"] * 3,
         "ts": ts_arr(["2024-01-01T00:00:10", "2024-01-01T00:00:50", "2024-01-01T00:02:30"])}
    )
    out = sliding_window_counts(rd.from_arrow(t), "k", "ts", size_s=60, step_s=60).to_pandas()
    byend = dict(zip(out["window_end"].astype(str), out["n"]))
    assert byend["2024-01-01 00:01:00"] == 2  # both first events in the first minute
    assert byend["2024-01-01 00:03:00"] == 1


def test_session_windows():
    t = pa.table(
        {"k": ["u"] * 4,
         "ts": ts_arr(["2024-01-01T00:00", "2024-01-01T00:30", "2024-01-01T03:00", "2024-01-01T03:10"])}
    )
    out = session_windows(rd.from_arrow(t), "k", "ts", gap_s=3600).to_pandas()
    out = out.sort_values("session_start").reset_index(drop=True)
    assert out["n"].tolist() == [2, 2]
    assert str(out["session_end"][0]) == "2024-01-01 00:30:00"


def test_log_dedup_windows_unit():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dedup import log_dedup

    ts = np.array(
        ["2024-01-01T00:10", "2024-01-01T00:50", "2024-01-01T01:10",
         "2024-01-01T00:20", "2024-01-01T02:05"],
        dtype="datetime64[us]",
    )
    t = pa.table({
        "body": ["a", "a", "a", "b", "a"],
        "ts": pa.array(ts),
        "event_id": pa.array([5, 2, 3, 4, 1], type=pa.int64()),
    })
    out = log_dedup(rd.from_arrow(t), ["body"], ts_col="ts", interval_s=3600,
                    id_col="event_id").to_pandas().sort_values(
        ["window_start", "body"]).reset_index(drop=True)
    # hour 0: two 'a' (ids 5,2 → first=2), one 'b'; hour 1: one 'a'; hour 2: one 'a'
    assert out["log.record.count"].tolist() == [2, 1, 1, 1]
    assert out["first_id"].tolist() == [2, 4, 3, 1]


def test_derive_partitions_no_execution_on_derived(tmp_path):
    """Sizing a join must never execute a derived lineage: the map fn
    below writes a sentinel file if it ever runs."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.joins import (
        DEFAULT_JOIN_PARTITIONS, _derive_partitions)

    sentinel = tmp_path / "executed"

    def spy(t: pa.Table) -> pa.Table:
        sentinel.write_text("ran")
        return t

    base = rd.from_arrow(pa.table({"k": list(range(10))}))
    derived = base.map_batches(spy, batch_format="pyarrow")
    n = _derive_partitions(derived, derived)
    # fallback constant, capped at 4x cluster CPUs (one 0.125-cpu
    # aggregator per partition must be schedulable or the join stalls)
    import ray

    cap = max(8, int(ray.cluster_resources().get("CPU", 8)) * 4)
    assert n == min(DEFAULT_JOIN_PARTITIONS, cap)
    assert not sentinel.exists(), "derived lineage was executed"
    # metadata-backed inputs still size from real row counts
    assert _derive_partitions(base, base) == 8


def test_funnel_steps_hand_case_and_parallelism():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.windows import funnel_steps

    def ts(*vals):
        return pa.array(np.array([f"2024-01-01T00:0{v}:00" for v in vals],
                                 dtype="datetime64[us]"))

    # u1: view(1) click(2) purchase(3) -> completes all
    # u2: click(1) view(2) click(3)    -> view, click-after-view; no purchase
    # u3: view(1) purchase(2)          -> view only (no click step)
    # u4: purchase(1)                  -> nothing (no view)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 4], type=pa.int64()),
        "event_type": ["view", "click", "purchase",
                       "click", "view", "click",
                       "view", "purchase", "purchase"],
        "ts": ts(1, 2, 3, 1, 2, 3, 1, 2, 1),
    })

    def run(blocks):
        out = funnel_steps(rd.from_arrow(t).repartition(blocks),
                           ["view", "click", "purchase"],
                           num_partitions=4).to_pandas()
        return out.sort_values("step_idx").reset_index(drop=True)

    want = pd.DataFrame({"step_idx": [0, 1, 2],
                         "step": ["view", "click", "purchase"],
                         "n_users": [3, 2, 1]})
    pd.testing.assert_frame_equal(run(1)[want.columns].astype(
        {"step_idx": "int64", "n_users": "int64"}), want)
    pd.testing.assert_frame_equal(run(5)[want.columns].astype(
        {"step_idx": "int64", "n_users": "int64"}), want)


def test_funnel_strict_ordering_excludes_ties():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.windows import funnel_steps

    same = np.array(["2024-01-01T00:01:00"] * 2, dtype="datetime64[us]")
    t = pa.table({"user_id": pa.array([7, 7], type=pa.int64()),
                  "event_type": ["view", "click"],
                  "ts": pa.array(same)})
    out = funnel_steps(rd.from_arrow(t), ["view", "click"],
                       num_partitions=2).to_pandas() \
        .sort_values("step_idx")
    assert out["n_users"].tolist() == [1, 0]  # tie is NOT strictly after


def test_retention_cohorts_hand_case_and_parallelism():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.windows import retention_cohorts

    day = np.timedelta64(86400, "s")
    w0 = np.datetime64("2024-01-01T00:00:00", "us")
    # u1: weeks 0,1,2; u2: weeks 0,2 (two events in week 0); u3: week 1 only
    rows = [(1, w0), (1, w0 + 7 * day), (1, w0 + 14 * day),
            (2, w0 + day), (2, w0 + 2 * day), (2, w0 + 15 * day),
            (3, w0 + 8 * day)]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                  "ts": pa.array(np.array([r[1] for r in rows],
                                          dtype="datetime64[us]"))})

    def run(blocks):
        out = retention_cohorts(rd.from_arrow(t).repartition(blocks),
                                num_partitions=4).to_pandas()
        return out.sort_values(["cohort_week", "week_offset"]) \
            .reset_index(drop=True)

    # epoch week of 2024-01-01 = 2819 (epoch_us // 7 days)
    cw = int(w0.astype("datetime64[us]").astype(np.int64) // (7 * 86400000000))
    want = pd.DataFrame({
        "cohort_week": [cw] * 3 + [cw + 1],
        "week_offset": [0, 1, 2, 0],
        "n_users": [2, 1, 2, 1],
    })
    a, b = run(1), run(6)
    pd.testing.assert_frame_equal(a[want.columns], want)
    pd.testing.assert_frame_equal(b[want.columns], want)


def _range_brute(le: pd.DataFrame, iv: pd.DataFrame, closed_start=True,
                 closed_end=False) -> pd.DataFrame:
    m = le.merge(iv, on="k")
    lo = m["ts"] >= m["start"] if closed_start else m["ts"] > m["start"]
    hi = m["ts"] <= m["end"] if closed_end else m["ts"] < m["end"]
    return m[lo & hi].reset_index(drop=True)


def test_range_join_matches_brute_force():
    from opentelemetry_collector_contrib_ray.stages.joins import range_join

    rng = np.random.default_rng(7)
    n, ni = 400, 60
    base = np.datetime64("2024-01-01T00:00:00", "us")
    le = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "ts": base + rng.integers(0, 3_600_000_000 * 24, n).astype("timedelta64[us]"),
        "eid": np.arange(n),
    })
    starts = base + rng.integers(0, 3_600_000_000 * 24, ni).astype("timedelta64[us]")
    # interval lengths 0..3h: spans 1-3 buckets at 1h width (stresses
    # replication), incl. empty intervals
    lens = rng.integers(0, 3 * 3_600_000_000, ni).astype("timedelta64[us]")
    iv = pd.DataFrame({"k": rng.integers(0, 5, ni), "start": starts,
                       "end": starts + lens, "iid": np.arange(ni)})

    for cs, ce in [(True, False), (True, True), (False, False)]:
        got = range_join(
            rd.from_pandas(le).repartition(7), rd.from_pandas(iv).repartition(3),
            key="k", ts="ts", start="start", end="end", bucket_width_s=3600,
            closed_start=cs, closed_end=ce, num_partitions=5,
        ).to_pandas()
        want = _range_brute(le, iv, cs, ce)
        assert len(got) == len(want)
        assert (sorted(zip(got["eid"].astype(int), got["iid"].astype(int)))
                == sorted(zip(want["eid"], want["iid"])))
        # pair set identical under a different partitioning too
        got2 = range_join(
            rd.from_pandas(le), rd.from_pandas(iv), key="k", ts="ts",
            start="start", end="end", bucket_width_s=7200,
            closed_start=cs, closed_end=ce, num_partitions=11,
        ).to_pandas()
        assert sorted(zip(got2["eid"], got2["iid"])) == sorted(zip(want["eid"], want["iid"]))


def test_range_join_null_and_empty():
    from opentelemetry_collector_contrib_ray.stages.joins import range_join

    base = np.datetime64("2024-01-01T00:00:00", "us")
    le = pd.DataFrame({"k": [1, 1, None], "ts": [base, base + np.timedelta64(90, "m"), base],
                       "eid": [0, 1, 2]})
    iv = pd.DataFrame({"k": pd.array([1, 1, None], dtype="Int64"),
                       "start": [base, base, base],
                       "end": [base + np.timedelta64(1, "h"), base, base + np.timedelta64(1, "h")],
                       "iid": [0, 1, 2]})
    out = range_join(rd.from_pandas(le), rd.from_pandas(iv), key="k", ts="ts",
                     start="start", end="end", bucket_width_s=3600,
                     num_partitions=4).to_pandas()
    # only eid=0 × iid=0 matches: null keys drop, empty interval drops,
    # eid=1 is past the 1h end
    assert sorted(zip(out["eid"], out["iid"])) == [(0, 0)]


def test_late_arrivals_watermark_rule():
    from opentelemetry_collector_contrib_ray.stages.windows import late_arrivals

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    # arrival order = seq; user 1: ts goes 5h, 1h (late: 4h behind wm),
    # 4.5h (only 30m behind wm=5h -> not late at 1h lateness), 6h (ahead)
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2],
        "seq": [0, 1, 2, 3, 0, 1],
        "ts": [base + 5 * H, base + 1 * H, base + np.timedelta64(270, "m"),
               base + 6 * H, base, base - 2 * H],
    })
    out = late_arrivals(rd.from_pandas(df).repartition(3), "u", "ts", "seq",
                        3600, num_partitions=4).to_pandas()
    got = dict(zip(zip(out["u"], out["seq"]), out["is_late"]))
    assert got == {(1, 0): False, (1, 1): True, (1, 2): False, (1, 3): False,
                   (2, 0): False, (2, 1): True}


def test_first_k_paths_order_and_cap():
    from opentelemetry_collector_contrib_ray.stages.windows import first_k_paths

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 3],
        "eid": [4, 1, 2, 3, 9, 7],
        # user 1: ties on ts broken by eid (b before c at t+1)
        "ts": [base + 9 * S, base, base + S, base + S, base, base],
        "v": ["z", "a", "b", "c", "solo", "x"],
    })
    out = first_k_paths(rd.from_pandas(df).repartition(3), "u", "ts", "eid",
                        "v", k=3, num_partitions=4).to_pandas()
    got = dict(zip(out["u"], out["path"]))
    steps = dict(zip(out["u"], out["n_steps"]))
    assert got == {1: "a>b>c", 2: "solo", 3: "x"}
    assert steps == {1: 3, 2: 1, 3: 1}


def test_interval_union_coverage_islands():
    from opentelemetry_collector_contrib_ray.stages.windows import (
        interval_union_coverage,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    df = pd.DataFrame({
        # user 1: [0,30)+[10,40) merge (40m); [120,150) separate (30m)
        # user 2: one event right after user 1's last (checks no
        # cross-key leakage through the running max)
        "u": [1, 1, 1, 2],
        "ts": [base, base + 10 * M, base + 120 * M, base + 121 * M],
    })
    out = interval_union_coverage(rd.from_pandas(df).repartition(2), "u", "ts",
                                  1800, num_partitions=2).to_pandas()
    got = {r.u: (r.n_islands, r.covered_s) for r in out.itertuples()}
    assert got == {1: (2, 40 * 60 + 30 * 60), 2: (1, 30 * 60)}


def test_bloom_prefilter_no_false_negatives_and_selective():
    from opentelemetry_collector_contrib_ray.stages.joins import (
        bloom_filter_build,
        bloom_prefilter,
    )

    rng = np.random.default_rng(5)
    members = rng.choice(10**9, 500, replace=False)
    right = rd.from_pandas(pd.DataFrame({"k": members})).repartition(3)
    bloom = bloom_filter_build(right, "k", m_bits=1 << 16, k=4)

    probe_keys = np.concatenate([members[:200], rng.choice(10**9, 5000)])
    left = rd.from_pandas(pd.DataFrame({"k": probe_keys})).repartition(4)
    kept = bloom_prefilter(left, "k", bloom, m_bits=1 << 16, k=4,
                           concurrency=1).to_pandas()["k"].to_numpy()
    member_set = set(members.tolist())
    # no false negatives: every true member survives
    true_hits = [x for x in probe_keys if x in member_set]
    assert sorted(x for x in kept if x in member_set) == sorted(true_hits)
    # selective: the overwhelming majority of non-members are dropped
    non_members = [x for x in probe_keys if x not in member_set]
    false_pos = [x for x in kept if x not in member_set]
    assert len(false_pos) < 0.05 * len(non_members)


def test_gated_semi_join_both_paths():
    from opentelemetry_collector_contrib_ray.stages.joins import gated_semi_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4, 5, 6], "v": list("abcdef")}))
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 4, 6]}))
    want = {(2, "b"), (4, "d"), (6, "f")}
    # broadcast path (threshold well above the side size)
    got_b = gated_semi_join(left, right, on="k", right_on="rk",
                            threshold=1000, concurrency=1).to_pandas()
    assert set(map(tuple, got_b[["k", "v"]].itertuples(index=False))) == want
    # forced-low threshold -> hash-partitioned large path, same rows
    got_h = gated_semi_join(left, right, on="k", right_on="rk",
                            threshold=0, num_partitions=8).to_pandas()
    assert set(map(tuple, got_h[["k", "v"]].itertuples(index=False))) == want


def test_gated_broadcast_join_both_paths():
    from opentelemetry_collector_contrib_ray.stages.joins import gated_broadcast_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 2, 3], "v": [10, 20, 21, 30]}))
    right = rd.from_pandas(pd.DataFrame({"rk": [1, 2], "name": ["x", "y"]}))
    want = {(1, 10, "x"), (2, 20, "y"), (2, 21, "y")}
    got_b = gated_broadcast_join(left, right, on="k", right_on="rk",
                                 threshold=1000, concurrency=1).to_pandas()
    assert set(map(tuple, got_b[["k", "v", "name"]].itertuples(index=False))) == want
    got_h = gated_broadcast_join(left, right, on="k", right_on="rk",
                                 threshold=0, num_partitions=8).to_pandas()
    assert set(map(tuple, got_h[["k", "v", "name"]].itertuples(index=False))) == want


def test_gated_join_size_hint_drives_the_gate():
    """A derived (filtered) side has no metadata count; the size_hint
    dataset's metadata count decides the path."""
    from opentelemetry_collector_contrib_ray.stages import joins as J

    right_raw = rd.from_pandas(pd.DataFrame({"rk": list(range(20))})).materialize()
    right = right_raw.filter(lambda r: r["rk"] % 2 == 0)
    assert J._rows_estimate(right) is None  # derived lineage
    assert J._side_rows(right, size_hint=right_raw) == 20
    assert J._side_rows(right, size_hint=7) == 7


def test_compact_groupby_matches_pandas():
    from opentelemetry_collector_contrib_ray.stages.agg import compact_groupby

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 500),
        "h": rng.integers(0, 2, 500),
        "x": rng.integers(-100, 100, 500).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(7)
    got = (compact_groupby(ds, keys=["g", "h"], sum_cols={"x": "sum_x"},
                           count_alias="n")
           .to_pandas().sort_values(["g", "h"]).reset_index(drop=True))
    want = (df.groupby(["g", "h"], as_index=False)
            .agg(sum_x=("x", "sum"), n=("x", "size"))
            .sort_values(["g", "h"]).reset_index(drop=True))
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["g", "h", "sum_x", "n"]], want[["g", "h", "sum_x", "n"]],
        check_dtype=False)


def test_compact_groupby_empty_blocks_keep_schema():
    from opentelemetry_collector_contrib_ray.stages.agg import compact_groupby

    df = pd.DataFrame({"g": ["a", "b"], "x": [1, 2]})
    ds = rd.from_pandas(df).repartition(6)  # more blocks than rows -> empties
    got = compact_groupby(ds, keys=["g"], sum_cols={"x": "sum_x"}).to_pandas()
    assert sorted(map(tuple, got[["g", "sum_x"]].itertuples(index=False))) == [
        ("a", 1), ("b", 2)]


def test_gated_range_join_broadcast_matches_exchange():
    from opentelemetry_collector_contrib_ray.stages.joins import (
        gated_range_join, range_join)

    rng = np.random.default_rng(17)
    n, ni = 500, 70
    base = np.datetime64("2024-03-01T00:00:00", "us")
    le = pd.DataFrame({
        "k": rng.integers(0, 6, n),
        "ts": base + rng.integers(0, 3_600_000_000 * 24, n).astype("timedelta64[us]"),
        "eid": np.arange(n),
    })
    starts = base + rng.integers(0, 3_600_000_000 * 24, ni).astype("timedelta64[us]")
    lens = rng.integers(0, 3 * 3_600_000_000, ni).astype("timedelta64[us]")
    iv = pd.DataFrame({"k": rng.integers(0, 6, ni), "start": starts,
                       "end": starts + lens, "iid": np.arange(ni)})

    for cs, ce in [(True, False), (True, True), (False, False)]:
        want = range_join(
            rd.from_pandas(le).repartition(5), rd.from_pandas(iv).repartition(3),
            key="k", ts="ts", start="start", end="end", bucket_width_s=3600,
            closed_start=cs, closed_end=ce, num_partitions=5).to_pandas()
        # broadcast path (interval side well under the default threshold)
        got_b = gated_range_join(
            rd.from_pandas(le).repartition(5), rd.from_pandas(iv).repartition(3),
            key="k", ts="ts", start="start", end="end", bucket_width_s=3600,
            closed_start=cs, closed_end=ce).to_pandas()
        # forced-low threshold → exchange path through the same gate
        got_x = gated_range_join(
            rd.from_pandas(le).repartition(5), rd.from_pandas(iv).repartition(3),
            key="k", ts="ts", start="start", end="end", bucket_width_s=3600,
            closed_start=cs, closed_end=ce, threshold=3,
            num_partitions=5).to_pandas()
        w = sorted(zip(want["eid"].astype(int), want["iid"].astype(int)))
        assert sorted(zip(got_b["eid"].astype(int), got_b["iid"].astype(int))) == w
        assert sorted(zip(got_x["eid"].astype(int), got_x["iid"].astype(int))) == w
        assert sorted(got_b.columns) == sorted(want.columns)


def test_gated_range_join_empty_and_missing_keys():
    from opentelemetry_collector_contrib_ray.stages.joins import gated_range_join

    base = np.datetime64("2024-03-01T00:00:00", "us")
    le = pd.DataFrame({"k": [1, 2, None], "ts": [base, base, base],
                       "eid": [0, 1, 2]})
    # key 2 has NO intervals; key 1 has one covering interval; null key drops
    iv = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                       "start": [base - np.timedelta64(1, "m"), base],
                       "end": [base + np.timedelta64(1, "h"),
                               base + np.timedelta64(1, "h")],
                       "iid": [0, 1]})
    out = gated_range_join(rd.from_pandas(le), rd.from_pandas(iv), key="k",
                           ts="ts", start="start", end="end",
                           bucket_width_s=3600).to_pandas()
    assert sorted(zip(out["eid"].astype(int), out["iid"].astype(int))) == [(0, 0)]
    # fully empty interval side → zero rows, schema intact
    iv0 = iv.iloc[:0]
    out0 = gated_range_join(rd.from_pandas(le), rd.from_pandas(iv0), key="k",
                            ts="ts", start="start", end="end",
                            bucket_width_s=3600).to_pandas()
    # Ray drops all-empty output blocks at to_pandas (columns go with
    # them — engine-wide for every empty result, exchange path included)
    assert len(out0) == 0


# --------------------------------------------- zone-map pruned read


def test_zonemap_prunes_by_value_envelope(tmp_path):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.zonemap import (
        collect_stats,
        prune_keys,
        pruned_paths,
    )

    # bucket 0: values < 100 (prunable for v >= 100); buckets 1-3: mixed
    rows = []
    for b in range(4):
        for i in range(50):
            v = i if b == 0 else b * 100 + i
            rows.append({"bucket": b, "v": v, "id": b * 1000 + i})
    ds = rd.from_items(rows).repartition(5)
    root = str(tmp_path / "zm")
    ds.write_parquet(root, partition_cols=["bucket"])

    stats = collect_stats(ds, "bucket", ["v"])
    assert stats.num_rows == 4
    got = dict(zip(stats["bucket"].to_pylist(),
                   zip(stats["v_min"].to_pylist(),
                       stats["v_max"].to_pylist(),
                       stats["n_rows"].to_pylist())))
    assert got[0] == (0, 49, 50) and got[3] == (300, 349, 50)

    # value envelope prunes bucket 0 even though the key range keeps it
    keys = prune_keys(stats, "bucket", {"bucket": (0, 3), "v": (100, None)})
    assert sorted(keys) == [1, 2]
    files = pruned_paths(root, "bucket", keys)
    assert files and all("bucket=0" not in f and "bucket=3" not in f
                         for f in files)

    # pruned scan + exact residual filter == full scan
    back = pa.concat_tables(list(
        rd.read_parquet(files).iter_batches(batch_format="pyarrow")))
    kept = back.filter(pc.greater_equal(back["v"], 100))
    want = [r["id"] for r in rows if r["bucket"] in (0, 1, 2) and r["v"] >= 100]
    assert sorted(kept["id"].to_pylist()) == sorted(want)

    # unbounded side + no constraints keeps everything
    assert sorted(prune_keys(stats, "bucket", {"v": (None, None)})) == \
        [0, 1, 2, 3]


def test_zorder_buckets_are_tiles():
    import numpy as np
    from opentelemetry_collector_contrib_ray.stages.zonemap import zorder_key

    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, 5000)
    y = rng.integers(0, 256, 5000)
    z = zorder_key(x, y, bits=8)
    # round-trip: de-interleave recovers both dims exactly
    xd = np.zeros_like(x)
    yd = np.zeros_like(y)
    for b in range(8):
        xd |= ((z >> (2 * b + 1)) & 1) << b
        yd |= ((z >> (2 * b)) & 1) << b
    assert (xd == x).all() and (yd == y).all()
    # top-8-bit buckets are 16x16 tiles: both dims span < 16 per bucket
    for bucket in np.unique(z >> 8):
        m = (z >> 8) == bucket
        assert x[m].max() - x[m].min() < 16
        assert y[m].max() - y[m].min() < 16


def test_compact_by_range_one_sorted_file_per_bucket_idempotent(tmp_path):
    import glob
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.zonemap import (
        compact_by_range,
    )

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "bucket": rng.integers(0, 3, 500).astype(np.int64),
        "day": rng.integers(0, 30, 500).astype(np.int64),
        "v": np.arange(500, dtype=np.int64),
    })
    root = str(tmp_path / "out")
    ds = rd.from_pandas(df).repartition(8)
    written = compact_by_range(ds, root, "bucket", ["day"])
    assert written == [0, 1, 2]
    for _ in range(2):  # idempotent: rerun overwrites cleanly
        back = []
        for b in (0, 1, 2):
            files = glob.glob(f"{root}/bucket={b}/*.parquet")
            assert len(files) == 1          # exactly one file per bucket
            t = pq.read_table(files[0])
            d = t["day"].to_numpy()
            assert (d[1:] >= d[:-1]).all()  # sorted within the file
            back.append(t.to_pandas())
        got = pd.concat(back).sort_values("v").reset_index(drop=True)
        assert got.v.tolist() == df.sort_values("v").v.tolist()
        assert got.day.sum() == df.day.sum()
        compact_by_range(rd.from_pandas(df).repartition(3), root,
                         "bucket", ["day"])


def test_bloom_index_no_false_negatives_and_deterministic_fps():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.zonemap import (
        _bloom_hash,
        bloom_index,
        bloom_probe,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "bucket": rng.integers(0, 8, 4000).astype(np.int64),
        "user_id": rng.integers(0, 500, 4000).astype(np.int64),
    })
    m, k = 64, 2  # tiny filter → false positives guaranteed
    idx_ds = bloom_index(rd.from_pandas(df).repartition(5),
                         "bucket", "user_id", m=m, k=k).materialize()
    idx = pa.concat_tables(list(idx_ds.iter_batches(
        batch_format="pyarrow")))
    probes = [0, 250, 499, 10_000_001]
    matched = bloom_probe(idx, probes, m=m, k=k)

    # brute-force reference bloom per bucket
    ref = {}
    for b, g in df.groupby("bucket"):
        ids = g.user_id.to_numpy()
        ref[b] = {(j, int(x)) for j in range(k)
                  for x in np.unique(_bloom_hash(ids, j, m, 1_000_003))}
    for u in probes:
        bits = [(j, int(_bloom_hash(np.array([u]), j, m, 1_000_003)[0]))
                for j in range(k)]
        want = sorted(b for b, s in ref.items()
                      if all(x in s for x in bits))
        assert matched[u] == want          # identical incl. FPs
        true_b = set(df[df.user_id == u].bucket.tolist())
        assert true_b.issubset(set(matched[u]))  # never a false negative
    # index row bound: buckets × k × min(distinct users, m)
    assert idx.num_rows <= 8 * k * m


def test_rank_decile_binning_matches_pandas_window():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import (
        running_total,
    )

    rng = np.random.default_rng(23)
    n = 900
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "t": rng.choice(list("xyz"), n),
        "v": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
        "one": np.ones(n, dtype=np.int64),
    })
    ranked = running_total(rd.from_pandas(df).repartition(5), ["t"],
                           ["v", "event_id"], "one",
                           out_col="rnk").to_pandas()
    sizes = df.groupby("t").size()
    got = ranked.assign(
        dec=(10 * (ranked.rnk - 1)) // ranked.t.map(sizes))
    want = df.sort_values(["t", "v", "event_id"], kind="mergesort")
    want = want.assign(rnk=want.groupby("t").cumcount() + 1)
    want = want.assign(dec=(10 * (want.rnk - 1)) // want.t.map(sizes))
    merged = got.set_index("event_id").dec.sort_index()
    assert merged.equals(want.set_index("event_id").dec.sort_index())
    # equi-depth: per (t, dec) counts differ by at most 1 within a type
    cnt = got.groupby(["t", "dec"]).size()
    for t in "xyz":
        c = cnt[t]
        assert c.max() - c.min() <= 1


def test_run_compress_matches_pandas_reference():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import (
        run_compress,
    )

    rng = np.random.default_rng(29)
    n = 1500
    df = pd.DataFrame({
        "k": rng.choice(list("abc"), n),
        "t": np.arange(n, dtype=np.int64),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.choice(["x", "y"], n),
    })
    # reference: per-key ordered change-point runs
    want_rows = []
    for k, g in df.sort_values(["k", "t", "id"]).groupby("k"):
        rid = (g.v != g.v.shift()).cumsum()
        runs = g.groupby(rid).agg(v=("v", "first"), valid_from=("t", "first"),
                                  run_len=("v", "size"))
        runs["valid_to"] = runs.valid_from.shift(-1)
        for _, r in runs.iterrows():
            want_rows.append((k, r.v, int(r.valid_from),
                              None if pd.isna(r.valid_to)
                              else int(r.valid_to), int(r.run_len)))
    for nblocks in (1, 6):
        out = run_compress(rd.from_pandas(df).repartition(nblocks),
                           ["k"], ["t", "id"], "v").to_pandas()
        got = sorted((r.k, r.v, int(r.valid_from),
                      None if pd.isna(r.valid_to) else int(r.valid_to),
                      int(r.run_len)) for r in out.itertuples())
        assert got == sorted(want_rows)
        # open runs: exactly one NULL valid_to per key
        assert out.valid_to.isna().sum() == 3
        # intervals tile: run_len totals = row count
        assert out.run_len.sum() == n


def test_q3_native_semi_path_no_deadlock(sf_dir):
    # force the semi-join gate down the native left_semi path: the
    # materialize() boundary between the two native joins must stage
    # them instead of co-scheduling their aggregator pools
    import opentelemetry_collector_contrib_ray.stages.joins as J
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        QUERIES,
        ORACLES,
    )
    import duckdb

    old = J.BROADCAST_ROWS_THRESHOLD
    try:
        J.BROADCAST_ROWS_THRESHOLD = 0
        got = QUERIES["q3_shipping_priority"](sf_dir).to_pandas()
    finally:
        J.BROADCAST_ROWS_THRESHOLD = old
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    want = con.execute(ORACLES["q3_shipping_priority"]).df()
    cols = sorted(got.columns)
    assert got[cols].sort_values(cols).reset_index(drop=True).astype(str) \
        .equals(want[cols].sort_values(cols).reset_index(drop=True)
                .astype(str))


# --------------------------------------------- skyline / Pareto front


def test_pareto_front_matches_bruteforce():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.skyline import pareto_front

    rng = np.random.default_rng(13)
    n = 3000
    x = rng.integers(0, 200, n)          # heavy ties
    y = rng.integers(0, 200, n)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})

    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dominated[i] = np.any((x >= x[i]) & (y >= y[i])
                              & ((x > x[i]) | (y > y[i])))
    want = set(np.arange(n)[~dominated].tolist())

    for nblocks in (1, 7):
        got = set(pareto_front(rd.from_arrow(t).repartition(nblocks),
                               "x", "y").to_pandas()["id"].tolist())
        assert got == want


def test_pareto_front_duplicates_and_anticorrelated():
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.skyline import pareto_front

    # duplicate frontier points all survive (weak dominance)
    t = pa.table({"id": pa.array([0, 1, 2, 3], pa.int64()),
                  "x": pa.array([5, 5, 3, 1], pa.int64()),
                  "y": pa.array([7, 7, 2, 9], pa.int64())})
    got = pareto_front(rd.from_arrow(t).repartition(2), "x", "y") \
        .to_pandas().sort_values("id")
    assert got["id"].tolist() == [0, 1, 3]   # (3,2) dominated by (5,7)

    # pathological: perfectly anti-correlated -> everything is frontier
    n = 500
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "x": pa.array(np.arange(n), pa.int64()),
                  "y": pa.array(n - np.arange(n), pa.int64())})
    got = pareto_front(rd.from_arrow(t).repartition(5), "x", "y").count()
    assert got == n


def test_peak_concurrency_sweep():
    """Hand case incl. the half-open boundary: an interval ending at t
    does NOT overlap one starting at t."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import peak_concurrency

    base = pd.Timestamp("2024-01-01")
    rows = [
        # key 'a', 10-second intervals: starts 0,5,8 -> peak 3 at t=8
        ("a", 0), ("a", 5), ("a", 8),
        # key 'b': starts 0 and 10 with length 10 -> [0,10) and [10,20)
        # touch but never overlap -> peak 1, first at t=0
        ("b", 0), ("b", 10),
    ]
    df = pd.DataFrame({"k": [r[0] for r in rows],
                       "ts": [base + pd.Timedelta(seconds=r[1]) for r in rows]})
    out = (peak_concurrency(rd.from_pandas(df).repartition(3), key="k",
                            ts_col="ts", length_s=10, num_partitions=4)
           .to_pandas().set_index("k"))
    b0 = base.value // 1000  # micros
    assert out.loc["a", "peak"] == 3
    assert out.loc["a", "peak_at_us"] == b0 + 8_000_000
    assert out.loc["b", "peak"] == 1
    assert out.loc["b", "peak_at_us"] == b0


def test_resample_ffill_hand():
    """Gap hours take the prior value; observed flags mark real data;
    last-in-bucket tie resolves by (ts, order)."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import resample_ffill

    base = pd.Timestamp("2024-01-01")
    rows = [
        # key a: hour0 two obs (later one wins), hours 1-2 empty, hour3 obs
        ("a", 0, 10, 1.0), ("a", 30, 11, 2.0), ("a", 185, 12, 9.0),
        # key b: single hour
        ("b", 70, 13, 5.0),
        # same-ts tie in hour0 of c: higher order id wins
        ("c", 0, 20, 3.0), ("c", 0, 21, 4.0),
    ]
    df = pd.DataFrame({"k": [r[0] for r in rows],
                       "ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
                       "eid": [r[2] for r in rows],
                       "v": [r[3] for r in rows]})
    out = (resample_ffill(rd.from_pandas(df).repartition(3), key="k",
                          ts_col="ts", val_col="v", order_col="eid")
           .to_pandas().sort_values(["k", "hour"]).reset_index(drop=True))
    a = out[out.k == "a"]
    assert a.filled_value.tolist() == [2.0, 2.0, 2.0, 9.0]
    assert a.observed.tolist() == [1, 0, 0, 1]
    b = out[out.k == "b"]
    assert len(b) == 1 and b.filled_value.iloc[0] == 5.0
    c = out[out.k == "c"]
    assert len(c) == 1 and c.filled_value.iloc[0] == 4.0


def test_cusum_changepoints_hand():
    """Step change in daily volume alarms after the shift; identity
    S_t = P_t - min(0, runmin) checked against the direct recurrence."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import (
        cusum_changepoints,
    )

    base = pd.Timestamp("2024-01-01")
    counts = [2, 2, 2, 2, 10, 10, 10, 10]   # level shift on day 4
    rows = []
    for d, c in enumerate(counts):
        rows += [("a", base + pd.Timedelta(days=d, minutes=i))
                 for i in range(c)]
    df = pd.DataFrame(rows, columns=["k", "ts"])
    out = (cusum_changepoints(rd.from_pandas(df).repartition(3), key="k",
                              ts_col="ts", h_mult=1)
           .to_pandas().sort_values("day").reset_index(drop=True))

    # direct recurrence
    n, T = len(counts), sum(counts)
    s, want = 0, []
    for c in counts:
        s = max(0, s + c * n - T)
        want.append(s)
    assert out.cusum.tolist() == want
    assert out.alarm.tolist() == [1 if s > T else 0 for s in want]
    assert out.alarm.iloc[-1] == 1 and out.alarm.iloc[0] == 0


def test_conv_response_latency_invariants():
    """Oracle (run at both SFs by check_correctness) is the exact
    check; here: structural invariants — positive latencies (turn_idx
    order is ts order in the derivation), max <= span, hourly buckets
    aligned."""
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_conv_response_latency,
    )

    out = q_conv_response_latency("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out.n_pairs > 0).all()
    assert (out.sum_latency_us >= out.max_latency_us).all() or (
        out.n_pairs == 1).any()
    assert (out.max_latency_us > 0).all()
    assert (out.hour.astype("int64") % 3_600_000_000 == 0).all()


def test_forward_asof_with_tolerance():
    """Forward asof: nearest strictly-later match within tolerance;
    outside-tolerance and no-match rows stay null."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.joins import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": [1, 1, 2, 3],
        "ts": [base, base + pd.Timedelta(minutes=50),
               base, base],
        "lid": [10, 11, 12, 13]})
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=30),       # within 1h of lid 10
               base + pd.Timedelta(minutes=90),       # within 1h of lid 11
               base + pd.Timedelta(minutes=200)],     # beyond 1h for lid 12
        "rv": [1.0, 2.0, 3.0]})
    out = (asof_join(rd.from_pandas(left).repartition(2),
                     rd.from_pandas(right), key="k", ts="ts",
                     direction="forward", allow_exact_matches=False,
                     tolerance_s=3600, num_partitions=4)
           .to_pandas().sort_values("lid"))
    got = dict(zip(out.lid, out.rv))
    assert got[10] == 1.0      # nearest-next, not the later one
    assert got[11] == 2.0
    assert pd.isna(got[12])    # match exists but outside tolerance
    assert pd.isna(got[13])    # no right rows for key 3


def test_funnel_window_constraint():
    """A user whose click falls outside the 1h first-touch window
    counts for step 1 only; inside-window user converts fully."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.windows import funnel_steps

    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, "view", 0), (1, "click", 30), (1, "purchase", 50),   # all inside
        (2, "view", 0), (2, "click", 90),                        # click late
        (3, "view", 0), (3, "click", 30), (3, "purchase", 120),  # buy late
    ]
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "event_type": [r[1] for r in rows],
                       "ts": [base + pd.Timedelta(minutes=r[2])
                              for r in rows]})
    out = (funnel_steps(rd.from_pandas(df).repartition(3),
                        ["view", "click", "purchase"], num_partitions=4,
                        window_s=3600)
           .to_pandas().sort_values("step_idx"))
    assert out.n_users.tolist() == [3, 2, 1]

    # without the window everyone converts
    out2 = (funnel_steps(rd.from_pandas(df), ["view", "click", "purchase"],
                         num_partitions=4)
            .to_pandas().sort_values("step_idx"))
    assert out2.n_users.tolist() == [3, 3, 2]


def test_snapshot_diff_categories():
    """Added / removed / changed / unchanged classification incl.
    null-vs-null compares as unchanged and null-vs-value as changed."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.joins import snapshot_diff

    left = pd.DataFrame({"k": [1, 2, 3, 5, 6],
                         "g": ["a", "a", "b", "b", "a"],
                         "v": [1.0, 2.0, None, 5.0, None]})
    right = pd.DataFrame({"k": [1, 2, 4, 5, 6],
                          "g": ["a", "a", "b", "b", "a"],
                          "v": [1.0, 9.0, 4.0, 5.0, 7.0]})
    out = (snapshot_diff(rd.from_pandas(left).repartition(2),
                         rd.from_pandas(right), key="k", cmp_cols=["v"],
                         group_col="g", num_partitions=4)
           .to_pandas())
    got = {(r.g, r.category): r.n for r in out.itertuples()}
    assert got == {("b", "added"): 1,        # k=4
                   ("b", "removed"): 1,      # k=3
                   ("a", "changed"): 2,      # k=2 (2->9), k=6 (null->7)
                   ("a", "unchanged"): 1,    # k=1
                   ("b", "unchanged"): 1}    # k=5


def test_gated_broadcast_join_key_column_presence_contract():
    """q18 relies on this contract: BOTH gate paths coalesce the join
    key to the LEFT key name (broadcast renames; the native join drops
    the right key) — the conditional re-derive handles either and any
    future path that keeps both."""
    from opentelemetry_collector_contrib_ray.stages.joins import gated_broadcast_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    right = rd.from_pandas(pd.DataFrame({"rk": [1, 2], "w": [5, 6]}))
    b = gated_broadcast_join(left, right, on="k", right_on="rk",
                             threshold=1000).to_pandas()
    assert "k" in b.columns and "rk" not in b.columns
    h = gated_broadcast_join(left, right, on="k", right_on="rk",
                             threshold=0, num_partitions=8).to_pandas()
    assert "k" in h.columns and "rk" not in h.columns


def test_q13_zero_order_bucket():
    """Customers without orders land in the c_count=0 bucket without a
    full outer join of the customer table."""
    import pandas as pd
    import pyarrow.parquet as pq
    import tempfile, os, pyarrow as pa
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q13_customer_distribution,
    )

    d = tempfile.mkdtemp(prefix="q13_", dir="/tmp")
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
                   os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({"o_custkey": pa.array([1, 1, 2], pa.int64()),
                             "o_orderkey": pa.array([10, 11, 12], pa.int64())}),
                   os.path.join(d, "orders.parquet"))
    out = (q_q13_customer_distribution(d).to_pandas()
           .set_index("c_count")["custdist"].to_dict())
    assert out == {0: 2, 1: 1, 2: 1}


def test_q22_cross_multiply_threshold_and_anti_join():
    """Above-average filter is the integer cross-multiply (no float
    division); customers with recent orders drop; lapsed stay."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q22_global_sales_opportunity,
    )

    d = tempfile.mkdtemp(prefix="q22_", dir="/tmp")
    # balances: 10.00, 20.00, 30.00, -5.00 -> pos avg = 20.00 exactly;
    # strictly-above keeps only 30.00 (cust 3) and the tie at 20 drops
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 1, 7, 3], pa.int32()),
        "c_acctbal": pa.array([10.0, 20.0, 30.0, -5.0])}),
        os.path.join(d, "customer.parquet"))
    # cust 3 has only an OLD order -> lapsed, stays after anti join
    pq.write_table(pa.table({
        "o_custkey": pa.array([3], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("1999-01-01")],
                                pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    out = q_q22_global_sales_opportunity(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.cntrycode, r.n_cust, r.total_cents) == (2, 1, 3000)

    # give cust 3 a RECENT order -> everything filtered, empty result
    pq.write_table(pa.table({
        "o_custkey": pa.array([3], pa.int64()),
        "o_orderdate": pa.array([pd.Timestamp("2001-01-01")],
                                pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    out2 = q_q22_global_sales_opportunity(d).to_pandas()
    assert len(out2) == 0


def test_q14_promo_units_integer_math():
    """promo/total numerator-denominator math: revenue unit is
    cents·(100 − discount%), promo restricted to p_type='PROMO',
    rows outside the September window drop."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q14_promo_revenue,
    )

    d = tempfile.mkdtemp(prefix="q14_", dir="/tmp")
    sep, oct_ = 1757721600000000, 1760400000000000  # 2025-09/10 — OUTSIDE
    in1, in2 = 809913600000000, 810000000000000     # inside 1995-09
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_shipdate": pa.array([in1, in2, sep],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0, 20.0, 99.0]),
        "l_discount": pa.array([0.05, 0.10, 0.0])}),
        os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"])}),
        os.path.join(d, "part.parquet"))
    out = q_q14_promo_revenue(d).to_pandas()
    # row1: 1000 cents * 95 = 95000 (promo); row2: 2000 * 90 = 180000
    assert out["promo_units"].tolist() == [95000]
    assert out["total_units"].tolist() == [95000 + 180000]
    assert oct_ > sep  # window constants sanity


def test_q10_top20_rank_and_quarter_filter():
    """Only R-flag lineitems of quarter orders count; rank orders by
    revenue desc with custkey tie-break; nation name attaches."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q10_returned_items,
    )

    d = tempfile.mkdtemp(prefix="q10_", dir="/tmp")
    inq, outq = 812505600000000, 780000000000000  # in / before the quarter
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R"]),
        "l_extendedprice": pa.array([10.0, 50.0, 10.0, 30.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])}),
        os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([inq, inq, outq], pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_acctbal": pa.array([1.0, 2.0, 3.0]),
        "c_nationkey": pa.array([0, 0, 1], pa.int32())}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ZERO", "ONE"])}),
        os.path.join(d, "nation.parquet"))
    out = (q_q10_returned_items(d).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    # cust 3's order is outside the quarter -> absent; the N-flag line
    # of order 10 never counts. Both remaining customers tie at 100000
    # units -> custkey ascending breaks the tie.
    assert out["c_custkey"].tolist() == [1, 2]
    assert out["rev_units"].tolist() == [100000, 100000]
    assert out["rank"].tolist() == [1, 2]
    assert out["n_name"].tolist() == ["ZERO", "ZERO"]


def test_q5_local_equality_and_region_filter():
    """Only lineitems whose supplier AND customer share an ASIA nation
    count; the non-ASIA supplier drops at the dim gate."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q5_local_supplier_volume,
    )

    d = tempfile.mkdtemp(prefix="q5_", dir="/tmp")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["JP", "IN", "FR"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int64())}),
        os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"])}),
        os.path.join(d, "region.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101, 102], pa.int64()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32())}),
        os.path.join(d, "supplier.parquet"))
    # cust 1 in JP, cust 2 in IN
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int32())}),
        os.path.join(d, "customer.parquet"))
    in95 = 788918400000000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([in95, in95], pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    # order 10 (JP cust): JP supplier (local, counts), IN supplier
    # (non-local, drops), FR supplier (non-ASIA, drops at the dim).
    # order 11 (IN cust): IN supplier (local, counts).
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 11], pa.int64()),
        "l_suppkey": pa.array([100, 101, 102, 101], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.5])}),
        os.path.join(d, "lineitem.parquet"))
    out = (q_q5_local_supplier_volume(d).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    assert out["n_name"].tolist() == ["IN", "JP"]
    # IN: 4000 cents * 50 = 200000; JP: 1000 * 100 = 100000
    assert out["rev_units"].tolist() == [200000, 100000]


def test_global_rank_total_order_and_ties():
    """Cross-bucket offsets compose an exact total order; equal leading
    values share one bucket so ties resolve via the next order column;
    works across multiple blocks and with num_buckets > distinct values."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.windows import global_rank

    df = pd.DataFrame({
        "v": [5, 1, 3, 3, 9, 1, 3, 7, 0, 3],
        "id": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
    })
    ds = rd.from_pandas(df).repartition(4)
    out = (global_rank(ds, ["v", "id"], num_buckets=3).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    expect = df.sort_values(["v", "id"]).reset_index(drop=True)
    assert out["v"].tolist() == expect["v"].tolist()
    assert out["id"].tolist() == expect["id"].tolist()
    assert out["rank"].tolist() == list(range(1, 11))

    # num_buckets far above the distinct-value count still exact
    out2 = (global_rank(rd.from_pandas(df).repartition(2), ["v", "id"],
                        num_buckets=64).to_pandas()
            .sort_values("rank").reset_index(drop=True))
    assert out2["rank"].tolist() == list(range(1, 11))
    assert out2["id"].tolist() == expect["id"].tolist()


def test_weighted_median_crossing_rules():
    """Zero-weight rows are never the crossing row; the crossing row is
    where cumulative weight first reaches half the total; zero-total
    keys vanish."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_weighted_median_ts,
    )

    d = tempfile.mkdtemp(prefix="wmed_", dir="/tmp")
    # type A: weights 1.0, 0.0, 3.0 cents=100,0,300 total=400 ->
    #   crossing at cum>=200: third row (ts 30); the zero row can't win.
    # type B: single row -> itself. type Z: all zero -> excluded.
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["A", "A", "A", "B", "Z"]),
        "ts": pa.array([10_000_000, 20_000_000, 30_000_000,
                        7_000_000, 1_000_000], pa.timestamp("us")),
        "value": pa.array([1.0, 0.0, 3.0, 2.5, 0.0])}),
        os.path.join(d, "events.parquet"))
    out = (q_events_weighted_median_ts(d).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    assert out["event_type"].tolist() == ["A", "B"]
    assert out["median_ts_us"].tolist() == [30_000_000, 7_000_000]


def test_interval_overlap_join_canonical_dedup():
    """A pair overlapping across MANY shared buckets is emitted exactly
    once; touching endpoints count (closed-closed); disjoint intervals
    never pair; keyed mode never crosses keys."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.joins import (
        interval_overlap_join,
    )

    W = 1_000_000  # 1 s buckets
    a = pd.DataFrame({"aid": [1, 2, 3],
                      "s": [0 * W, 10 * W, 20 * W],
                      "e": [8 * W, 11 * W, 21 * W]})
    b = pd.DataFrame({"bid": [10, 11, 12],
                      "s": [2 * W, 11 * W, 30 * W],
                      "e": [9 * W, 12 * W, 31 * W]})
    out = interval_overlap_join(
        rd.from_pandas(a).repartition(2), rd.from_pandas(b).repartition(2),
        "s", "e", bucket_width_s=1).to_pandas()
    got = sorted(zip(out["aid"], out["bid"]))
    # (1,10): overlap spans buckets 2..8 -> once. (2,11): touching at
    # 11s exactly (e_a == s_b) -> closed-closed counts. 3 pairs nothing.
    assert got == [(1, 10), (2, 11)]

    # keyed mode: same intervals, different keys -> no pair
    a["k"] = [1, 1, 1]
    b["k"] = [2, 1, 1]
    outk = interval_overlap_join(
        rd.from_pandas(a), rd.from_pandas(b), "s", "e",
        bucket_width_s=1, key="k").to_pandas()
    gotk = sorted(zip(outk["aid"], outk["bid"]))
    assert gotk == [(2, 11)]   # (1,10) now keys 1 vs 2 -> dropped


def test_q4_exists_via_per_order_max():
    """EXISTS("a lineitem shipped >30d after order date") collapses to
    per-order MAX(shipdate): boundary is strict, out-of-window orders
    drop, multi-lineitem orders count once."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q4_order_priority,
    )

    d = tempfile.mkdtemp(prefix="q4_", dir="/tmp")
    D = 30 * 86_400_000_000
    jul = 804_556_800_000_000           # 1995-07-01, inside the quarter
    may = 788_918_400_000_000           # 1995-01-01, outside
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([jul, jul, may, jul], pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "5-LOW", "1-URGENT", "2-HIGH"])}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
        "l_shipdate": pa.array(
            [jul + D + 1,      # order 1: late -> counted
             jul + D,          # order 2: exactly +30d -> NOT late
             may + D + 1,      # order 3: late but order outside window
             jul + 1,          # order 4: early line ...
             jul + D + 5],     # ... plus a late line -> counted ONCE
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))
    out = q_q4_order_priority(d).to_pandas()
    got = dict(zip(out["o_orderpriority"], out["n"]))
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_q12_late_class_counts():
    """late = ship > orderdate + 90d (strict); high/low classed by
    order priority, grouped by linestatus."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q12_late_shipments,
    )

    d = tempfile.mkdtemp(prefix="q12_", dir="/tmp")
    D = 90 * 86_400_000_000
    t0 = 800_000_000_000_000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([t0, t0, t0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"])}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_linestatus": pa.array(["O", "F", "O"]),
        "l_shipdate": pa.array(
            [t0 + D + 1,   # high, late -> O.high_n
             t0 + D + 2,   # low, late  -> F.low_n
             t0 + D],      # exactly +90d -> NOT late
            pa.timestamp("us"))}),
        os.path.join(d, "lineitem.parquet"))
    out = q_q12_late_shipments(d).to_pandas().set_index("l_linestatus")
    assert out.loc["O", "high_n"] == 1 and out.loc["O", "low_n"] == 0
    assert out.loc["F", "high_n"] == 0 and out.loc["F", "low_n"] == 1


def test_q15_max_ties_and_window():
    """Max-revenue ties BOTH win (exact integer equality); revenue
    outside the quarter never counts."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q15_top_supplier,
    )

    d = tempfile.mkdtemp(prefix="q15_", dir="/tmp")
    q1, before = 820_454_400_000_000, 800_000_000_000_000
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "l_shipdate": pa.array([q1, q1 + 5, q1 + 9, q1 + 2, before],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0, 10.0, 20.0, 5.0, 999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0])}),
        os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s-one", "s-two", "s-three"])}),
        os.path.join(d, "supplier.parquet"))
    out = q_q15_top_supplier(d).to_pandas().sort_values("s_suppkey")
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["s_name"].tolist() == ["s-one", "s-two"]
    assert out["total_units"].tolist() == [200000, 200000]


def test_q17_avg_threshold_exact():
    """`qty < avg/5` evaluated as 5*qty*n < sum_qty: a qty EXACTLY at
    avg/5 is excluded (strict), fractions never round; non-brand parts
    contribute nothing to stats or revenue."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q17_small_quantity_revenue,
    )

    d = tempfile.mkdtemp(prefix="q17_", dir="/tmp")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#17", "Brand#99"]),
        "p_size": pa.array([5, 5], pa.int64())}),
        os.path.join(d, "part.parquet"))
    # part 1 lines: qty 1, 10, 39 -> sum 50, n 3, avg/5 = 10/3 ~ 3.33
    #   qty 1: 5*1*3=15 < 50 -> kept ($1.00)
    #   qty 10: 150 >= 50 -> dropped; qty 39: dropped
    # exactness probe: if avg/5 were floored to 3, qty 3 would be
    # excluded too -- add a (qty=3, $2.00) line: 5*3*4=60 < 53? No --
    # recompute with it included: sum 53, n 4 -> qty=3: 60 >= 53 drop,
    # qty=1: 20 < 53 keep. Use that 4-line layout.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 39.0, 3.0, 1.0]),
        "l_extendedprice": pa.array([1.0, 7.0, 7.0, 2.0, 500.0])}),
        os.path.join(d, "lineitem.parquet"))
    out = q_q17_small_quantity_revenue(d).to_pandas()
    # only part-1 qty=1 survives (cents=100); Brand#99's $500 never seen
    assert out["total_cents"].tolist() == [100]


def test_q19_disjunction_bands():
    """Each clause gates on (brand, size, qty band) jointly; a row
    matching one clause's brand but another's band is dropped; band
    endpoints are inclusive."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q19_disjunctive_revenue,
    )

    d = tempfile.mkdtemp(prefix="q19_", dir="/tmp")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#12"]),
        "p_size": pa.array([5, 10, 6], pa.int64())}),
        os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        # part1 (B12,size5): qty 11 = inclusive upper -> keep ($1);
        #   qty 12 -> drop. part2 (B23,size10): qty 10 = inclusive
        #   lower -> keep ($2); qty 21 (B34's band) -> drop.
        # part3: Brand#12 but size 6 > 5 -> drop even at qty 5.
        "l_quantity": pa.array([11.0, 12.0, 10.0, 21.0, 5.0]),
        "l_extendedprice": pa.array([1.0, 9.0, 2.0, 9.0, 9.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0])}),
        os.path.join(d, "lineitem.parquet"))
    out = q_q19_disjunctive_revenue(d).to_pandas()
    # kept: $1.00 + $2.00 = 300 cents, x100 (pct units) = 30000
    assert out["total_units"].tolist() == [30000]


def test_gated_broadcast_join_empty_small_side_keeps_schema():
    """A filtered-to-empty small side loses its schema in to_pandas()
    (zero columns); the gate must rebuild the key column from plan
    metadata so the merge doesn't KeyError and inner-join returns an
    empty result with the joined schema."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.stages.joins import (
        gated_broadcast_join,
    )

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    right = rd.from_pandas(
        pd.DataFrame({"rk": [1, 2], "name": ["x", "y"]}))

    def drop_all(t: pa.Table) -> pa.Table:
        return t.slice(0, 0)

    empty = right.map_batches(drop_all, batch_format="pyarrow").materialize()
    out = gated_broadcast_join(left, empty, on="k", right_on="rk",
                               threshold=1000, concurrency=1)
    # the DATASET must carry the joined schema (Ray's to_pandas() on a
    # zero-row dataset drops columns — that's outside the join contract)
    assert {"k", "v", "name"} <= set(out.schema().names)
    assert out.count() == 0


def test_q7_cross_nation_and_year_split():
    """Only supp→cust pairs across the two named nations count, same-
    nation and third-nation rows drop at their gates, and revenue
    splits by ship YEAR (1996 vs 1997) with the window end exclusive."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q7_volume_shipping,
    )

    def us(s):
        return int(pd.Timestamp(s).value // 1000)

    d = tempfile.mkdtemp(prefix="q7_", dir="/tmp")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 7, 8], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_7", "NATION_8"])}),
        os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101, 102], pa.int64()),
        "s_nationkey": pa.array([7, 8, 0], pa.int32())}),
        os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([8, 7, 0], pa.int32())}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(d, "orders.parquet"))
    ship = [us("1996-06-01"),  # o10/s100: 7->8, 1996, counts
            us("1996-06-01"),  # o10/s101: 8->8 same nation, drops
            us("1997-03-01"),  # o11/s101: 8->7, 1997, counts
            us("1997-03-01"),  # o11/s100: 7->7 same nation, drops
            us("1996-06-01"),  # o12/s100: cust NATION_0, drops
            us("1996-06-01"),  # o10/s102: supp NATION_0, drops
            us("1998-01-01")]  # o10/s100: window end EXCLUSIVE, drops
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11, 12, 10, 10], pa.int64()),
        "l_suppkey": pa.array([100, 101, 101, 100, 100, 102, 100],
                              pa.int64()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0, 99.0, 20.0, 99.0, 99.0, 99.0,
                                     99.0]),
        "l_discount": pa.array([0.0] * 7)}),
        os.path.join(d, "lineitem.parquet"))
    out = (q_q7_volume_shipping(d).to_pandas()
           .sort_values("l_year").reset_index(drop=True))
    assert out["supp_nation"].tolist() == ["NATION_7", "NATION_8"]
    assert out["cust_nation"].tolist() == ["NATION_8", "NATION_7"]
    assert out["l_year"].tolist() == [1996, 1997]
    assert out["rev_units"].tolist() == [100000, 200000]


def test_q8_market_share_gates_and_units():
    """Part-type, order-year-window, and customer-region gates each
    drop their row; the target-nation numerator is a subset of the
    denominator in exact integer units."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q8_market_share,
    )

    def us(s):
        return int(pd.Timestamp(s).value // 1000)

    d = tempfile.mkdtemp(prefix="q8_", dir="/tmp")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["OTHER", "AMERICA"])}),
        os.path.join(d, "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([3, 5, 6], pa.int64()),
        "n_name": pa.array(["NATION_3", "NATION_5", "NATION_6"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int64())}),
        os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["ECONOMY", "LARGE"])}),
        os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101], pa.int64()),
        "s_nationkey": pa.array([5, 3], pa.int32())}),
        os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([6, 3], pa.int32())}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([us("1996-03-01"), us("1998-02-01"),
                                 us("1996-05-01")], pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 10, 11, 12], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 1, 1], pa.int64()),
        "l_suppkey": pa.array([100, 101, 100, 100, 100], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 40.0, 99.0, 99.0]),
        "l_discount": pa.array([0.0] * 5)}),
        os.path.join(d, "lineitem.parquet"))
    out = q_q8_market_share(d).to_pandas()
    # o11 is outside [1996, 1998); o12's customer is non-AMERICA; the
    # p2 line is the wrong part type. Target supplier contributes
    # 100000 of the 300000 total.
    assert out["o_year"].tolist() == [1996]
    assert out["target_units"].tolist() == [100000]
    assert out["total_units"].tolist() == [300000]


def _q_dir(prefix, tables):
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix=prefix, dir="/tmp")
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(d, f"{name}.parquet"))
    return d


def _nation_region():
    import pyarrow as pa

    return {
        "nation": pa.table({
            "n_nationkey": pa.array([0, 2, 3], pa.int32()),
            "n_name": pa.array(["N_AFRICA", "N_ASIA", "N_EUROPE"]),
            "n_regionkey": pa.array([0, 2, 3], pa.int32())}),
        "region": pa.table({
            "r_regionkey": pa.array([0, 2, 3], pa.int32()),
            "r_name": pa.array(["AFRICA", "ASIA", "EUROPE"])}),
    }


def test_q21_sole_late_supplier_gates():
    """Only the SOLE late supplier on a multi-supplier 'F' order
    waits: two-late orders and single-supplier orders drop, exactly
    +60d is on time (strict >), suppkey 0 survives the Σ(late·supp)
    identity, and the region filter drops non-ASIA suppliers."""
    import pandas as pd
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q21_waiting_suppliers,
    )

    D = 946_684_800_000_000          # 2000-01-01
    LATE = 953_078_400_000_000       # 2000-03-15 (> +60d)
    EDGE = D + 60 * 86_400_000_000   # exactly +60d -> on time
    OK = 947_894_400_000_000         # 2000-01-15

    ts = pa.timestamp("us")
    d = _q_dir("q21_", {
        **_nation_region(),
        "orders": pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_orderdate": pa.array([D] * 5, ts),
            "o_orderstatus": pa.array(["F", "F", "O", "F", "F"])}),
        # o1: s1 late, s2 exactly-on-boundary -> s1 waits
        # o2: s1 and s2 both late -> n_late=2, nobody
        # o3: status 'O' -> excluded even though s1 late
        # o4: s1 late but SOLE supplier -> n_supp=1, nobody
        # o5: s0 late, s1 on time -> s0 waits (suppkey 0 edge)
        "lineitem": pa.table({
            "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 5, 5], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 2, 1, 1, 0, 1], pa.int64()),
            "l_shipdate": pa.array(
                [LATE, EDGE, LATE, LATE, LATE, LATE, LATE, OK], ts)}),
        # s0, s1 in ASIA; s2 in AFRICA (would be filtered if it waited)
        "supplier": pa.table({
            "s_suppkey": pa.array([0, 1, 2], pa.int64()),
            "s_nationkey": pa.array([2, 2, 0], pa.int32()),
            "s_name": pa.array(["S0", "S1", "S2"]),
            "s_acctbal": pa.array([1.0, 1.0, 1.0])}),
    })
    out = (q_q21_waiting_suppliers(d).to_pandas()
           .sort_values("s_name").reset_index(drop=True))
    assert out["s_name"].tolist() == ["S0", "S1"]
    assert out["numwait"].tolist() == [1, 1]
    assert isinstance(out, pd.DataFrame)


def test_q9_profit_units_and_name_filter():
    """profit = cents(ext)·(100−pct) − cents(retail)·qty·100 exactly;
    non-matching part names drop; year comes from the ORDER date."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q9_product_type_profit,
    )

    ts = pa.timestamp("us")
    d = _q_dir("q9_", {
        **_nation_region(),
        "part": pa.table({
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_name": pa.array(["red widget", "blue bolt"]),
            "p_retailprice": pa.array([5.0, 1.0])}),
        "supplier": pa.table({
            "s_suppkey": pa.array([1], pa.int64()),
            "s_nationkey": pa.array([3], pa.int32()),
            "s_name": pa.array(["S1"]),
            "s_acctbal": pa.array([1.0])}),
        "orders": pa.table({
            "o_orderkey": pa.array([1], pa.int64()),
            "o_orderdate": pa.array([862_444_800_000_000], ts)}),  # 1997-05
        "lineitem": pa.table({
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_suppkey": pa.array([1, 1], pa.int64()),
            "l_quantity": pa.array([2.0, 9.0]),
            "l_extendedprice": pa.array([100.0, 999.0]),
            "l_discount": pa.array([0.05, 0.0])}),
    })
    out = q_q9_product_type_profit(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # rev = 10000·95 = 950000; cost = 500·2·100 = 100000
    assert (r.n_name, r.o_year, r.profit_units) == ("N_EUROPE", 1997, 850000)


def test_q16_distinct_suppliers_and_exclusions():
    """Duplicate (part, supplier) pairs count ONCE; Brand#13 / PROMO /
    off-set sizes drop; the acctbal-cents threshold keeps exactly-1000
    and drops 999.99."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q16_parts_supplier_relationship,
    )

    d = _q_dir("q16_", {
        "part": pa.table({
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_brand": pa.array(["Brand#1", "Brand#13", "Brand#2",
                                 "Brand#1"]),
            "p_type": pa.array(["ECONOMY", "ECONOMY", "PROMO", "ECONOMY"]),
            "p_size": pa.array([4, 4, 4, 5], pa.int32())}),
        "supplier": pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_acctbal": pa.array([2000.0, 1000.0, 999.99])}),
        "lineitem": pa.table({
            "l_partkey": pa.array([1, 1, 1, 1, 2, 3, 4, 1], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 2, 1, 1, 1, 3], pa.int64())}),
    })
    out = q_q16_parts_supplier_relationship(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.p_brand, r.p_type, r.p_size, r.supplier_cnt) == (
        "Brand#1", "ECONOMY", 4, 2)


def test_q20_strict_majority_and_window():
    """2·q_ps > q_part is STRICT (exact half loses); out-of-window
    volume is invisible; non-matching part names never qualify."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q20_potential_promotion,
    )

    IN96 = 830_000_000_000_000    # 1996-04-20
    OUT97 = 860_000_000_000_000   # 1997-04
    ts = pa.timestamp("us")
    d = _q_dir("q20_", {
        **_nation_region(),
        "part": pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["red gear", "blue gear", "red bolt"])}),
        "supplier": pa.table({
            "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "s_nationkey": pa.array([3, 3, 3, 3], pa.int32()),
            "s_name": pa.array(["S1", "S2", "S3", "S4"]),
            "s_acctbal": pa.array([1.0] * 4)}),
        # p1: s1=6, s2=5 (11 total) -> only s1 majority; s2's huge 1997
        # row is outside the window; p3: s3=5, s4=5 -> exact half, none
        "lineitem": pa.table({
            "l_partkey": pa.array([1, 1, 1, 3, 3], pa.int64()),
            "l_suppkey": pa.array([1, 2, 2, 3, 4], pa.int64()),
            "l_quantity": pa.array([6.0, 5.0, 100.0, 5.0, 5.0]),
            "l_shipdate": pa.array([IN96, IN96, OUT97, IN96, IN96], ts)}),
    })
    out = q_q20_potential_promotion(d).to_pandas()
    assert out["s_name"].tolist() == ["S1"]


def test_q2_min_tie_and_region_gate():
    """Per-part minimum keeps ALL tied suppliers; a cheaper NON-region
    supplier is invisible to the minimum; filtered part attrs gate."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q2_min_cost_supplier,
    )

    d = _q_dir("q2_", {
        **_nation_region(),
        "part": pa.table({
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_size": pa.array([5, 20, 5], pa.int32()),
            "p_type": pa.array(["STANDARD", "STANDARD", "ECONOMY"])}),
        # s1, s2 EUROPE; s3 ASIA (its cheaper price must NOT win)
        "supplier": pa.table({
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_nationkey": pa.array([3, 3, 2], pa.int32()),
            "s_name": pa.array(["S1", "S2", "S3"]),
            "s_acctbal": pa.array([11.0, 22.0, 33.0])}),
        "lineitem": pa.table({
            "l_partkey": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 2, 3, 1, 1], pa.int64()),
            "l_extendedprice": pa.array(
                [12.0, 10.0, 10.0, 9.0, 1.0, 1.0])}),
    })
    out = (q_q2_min_cost_supplier(d).to_pandas()
           .sort_values("s_name").reset_index(drop=True))
    assert out["s_name"].tolist() == ["S1", "S2"]
    assert out["cost_cents"].tolist() == [1000, 1000]
    assert out["acctbal_cents"].tolist() == [1100, 2200]
    assert out["p_partkey"].tolist() == [1, 1]
    assert out["n_name"].tolist() == ["N_EUROPE", "N_EUROPE"]


def test_q11_mean_threshold_exact():
    """val·n > 2·total is strict at the boundary: a part at exactly
    2× the mean drops, one cent above survives; non-region suppliers'
    volume never enters the total."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_q11_important_stock,
    )

    def build(p1_price):
        return _q_dir("q11_", {
            **_nation_region(),
            # s1 AMERICA-analog: use AFRICA dim? query pins AMERICA —
            # give nation 0 the name but region must be AMERICA
            "nation": pa.table({
                "n_nationkey": pa.array([0, 2], pa.int32()),
                "n_name": pa.array(["N_AM", "N_ASIA"]),
                "n_regionkey": pa.array([1, 2], pa.int32())}),
            "region": pa.table({
                "r_regionkey": pa.array([1, 2], pa.int32()),
                "r_name": pa.array(["AMERICA", "ASIA"])}),
            "supplier": pa.table({
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([0, 2], pa.int32()),
                "s_name": pa.array(["S1", "S2"]),
                "s_acctbal": pa.array([1.0, 1.0])}),
            # s2 (non-AMERICA) ships p9 at a huge price -> invisible
            "lineitem": pa.table({
                "l_partkey": pa.array([1, 2, 3, 4, 9], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array(
                    [p1_price, 1.0, 1.0, 1.0, 9999.0])}),
        })

    # p1 = 3.00 -> total 600, n 4: 300·4 = 1200 = 2·600 -> NOT kept
    out = q_q11_important_stock(build(3.0)).to_pandas()
    assert len(out) == 0
    # p1 = 3.01 -> total 601, n 4: 301·4 = 1204 > 1202 -> kept
    out2 = q_q11_important_stock(build(3.01)).to_pandas()
    assert out2["l_partkey"].tolist() == [1]
    assert out2["value_cents"].tolist() == [301]


def test_pattern_match_order_and_nonoverlap():
    """Matches respect (ts, event_id) order, count non-overlapping,
    clicks absorb greedily, and errors between view and purchase
    break the pattern."""
    import pyarrow as pa

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_events_pattern_match,
    )

    ts = pa.timestamp("us")
    # user 1: v c c p v p        -> 2 matches
    # user 2: v e p              -> 0 (error breaks vc*p)
    # user 3: p v (id tiebreak: same ts, ids order v before p -> "vp") -> 1
    d = _q_dir("pm_", {
        "events": pa.table({
            "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 2, 2, 3, 3],
                                pa.int64()),
            "ts": pa.array([10, 20, 30, 40, 50, 60, 10, 20, 30, 10, 10],
                           ts),
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 10],
                                 pa.int64()),
            "event_type": pa.array(
                ["view", "click", "click", "purchase", "view", "purchase",
                 "view", "error", "purchase", "purchase", "view"]),
            "value": pa.array([0.0] * 11),
            "props": pa.array(["{}"] * 11)}),
    })
    out = (q_events_pattern_match(d).to_pandas()
           .sort_values("n_matches").reset_index(drop=True))
    # n_matches 0 -> 1 user (u2), 1 -> 1 user (u3), 2 -> 1 user (u1)
    assert out["n_matches"].tolist() == [0, 1, 2]
    assert out["n_users"].tolist() == [1, 1, 1]


def test_skew_hybrid_join_routes_and_matches_plain_join():
    """Hot/cold routing is invisible in the result: with a forced-low
    threshold the giant key takes the broadcast route and the long
    tail the hash route, and the union equals the plain join row for
    row; detect_hot_keys finds exactly the giant key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.joins import (
        bucketed_hash_join,
        detect_hot_keys,
        skew_hybrid_join,
    )

    # 8 blocks; key 7 is the Zipf head (half of all rows)
    blocks = []
    for b in range(8):
        ks = [7] * 8 + list(range(b * 2, b * 2 + 8))
        blocks.append(pa.table({
            "k": pa.array(ks, pa.int64()),
            "x": pa.array([b * 100 + i for i in range(len(ks))],
                          pa.int64())}))
    left = rd.from_arrow(blocks)
    right = rd.from_arrow(pa.table({
        "k": pa.array(list(range(16)) + [99], pa.int64()),
        "y": pa.array([k * 10 for k in range(16)] + [990], pa.int64())}))

    hot = detect_hot_keys(left.materialize(), "k", threshold_rows=30)
    assert hot == [7]
    assert detect_hot_keys(left.materialize(), "k",
                           threshold_rows=10_000) == []

    out = (skew_hybrid_join(left, right, on="k", threshold_rows=30)
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    ref = (bucketed_hash_join(left, right, on="k")
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    assert len(out) == len(ref) > 0
    pd.testing.assert_frame_equal(
        out[["k", "x", "y"]].astype("int64"),
        ref[["k", "x", "y"]].astype("int64"))
    # the giant key's rows all survived exactly once: 8 head copies
    # per block + the 4 tail ranges (b=0..3) that also contain 7
    assert (out["k"] == 7).sum() == 68


def test_skew_hybrid_join_left_outer_composes():
    """how='left': null-fill composes per route (a cold left row can
    only match cold right rows and vice versa), equal to the plain
    left join including unmatched hot and cold rows."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.joins import (
        bucketed_hash_join,
        skew_hybrid_join,
    )

    blocks = [pa.table({"k": pa.array([7] * 6 + [b, 100 + b], pa.int64()),
                        "x": pa.array(list(range(8)), pa.int64())})
              for b in range(4)]
    left = rd.from_arrow(blocks)
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 0, 1], pa.int64()),
        "y": pa.array([70, 0, 10], pa.int64())}))

    out = (skew_hybrid_join(left, right, on="k", how="left",
                            threshold_rows=10)
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    ref = (bucketed_hash_join(left, right, on="k", how="left")
           .to_pandas().sort_values(["k", "x"]).reset_index(drop=True))
    assert len(out) == len(ref) == 32
    assert out[["k", "x"]].equals(ref[["k", "x"]])
    assert (out["y"].fillna(-1) == ref["y"].fillna(-1)).all()
    # unmatched keys (100+b) carried through with null y
    assert out.loc[out["k"] >= 100, "y"].isna().all()


def test_interval_gap_stats_hand():
    """Gap stats pin: single-island users report (0,0,0); gaps are the
    distances between merged-island extents; idle_s divides the SUM
    once (not per gap); max gap picked across >2 islands."""
    from opentelemetry_collector_contrib_ray.stages.windows import interval_gap_stats

    base = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(1, "m")
    df = pd.DataFrame({
        # user 1: islands [0,40) (merged 0+10), [120,150), [300,330)
        #   → gaps 80min and 150min: n=2, idle=230min, max=150min
        # user 2: single event → single island → (0, 0, 0)
        "u": [1, 1, 1, 1, 2],
        "ts": [base, base + 10 * M, base + 120 * M, base + 300 * M,
               base + 121 * M],
    })
    out = interval_gap_stats(rd.from_pandas(df).repartition(2), "u", "ts",
                             1800, num_partitions=2).to_pandas()
    got = {r.u: (r.n_gaps, r.idle_s, r.max_gap_s) for r in out.itertuples()}
    assert got == {1: (2, 230 * 60, 150 * 60), 2: (0, 0, 0)}


def test_session_entry_exit_boundary_and_bounce():
    """Entry/exit pins: a gap of EXACTLY gap_s stays in-session (only
    strictly larger gaps break), 1-event sessions are bounces, entry
    and exit come from the total (ts, order) order."""
    from opentelemetry_collector_contrib_ray.stages.windows import session_entry_exit

    base = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(1, "s")
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2],
        "ts": [base, base + 1800 * S,            # exactly 30min → SAME session
               base + 10_000 * S, base + 10_100 * S,   # session 2: view→buy
               base + 50 * S],                   # user 2: bounce
        "eid": [1, 2, 3, 4, 5],
        "v": ["view", "click", "view", "buy", "err"],
    })
    out = session_entry_exit(rd.from_pandas(df).repartition(2), key="u",
                             ts_col="ts", order_col="eid", val_col="v",
                             gap_s=1800, num_partitions=2).to_pandas()
    got = {(r.entry, r.exit): (r.n_sessions, r.n_bounces)
           for r in out.itertuples()}
    assert got == {("view", "click"): (1, 0), ("view", "buy"): (1, 0),
                   ("err", "err"): (1, 1)}


def test_survival_km_parts_censoring_and_risk():
    """KM pins: lifetime bucketing, tail censoring vs death, and the
    at-risk suffix cumsum over buckets."""
    from opentelemetry_collector_contrib_ray.stages.windows import survival_km_parts

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = [
        (1, base), (1, base + np.timedelta64(210, "m")),  # 3.5h → bucket 3, died
        (2, base + 1 * H), (2, base + 5 * H),             # 4h → bucket 4, censored
        (3, base + 10 * H),                               # bucket 0, censored (at mx)
        (4, base), (4, base + np.timedelta64(30, "m")),   # bucket 0, died
    ]
    df = pd.DataFrame({"u": [u for u, _ in rows], "ts": [t for _, t in rows]})
    out = (survival_km_parts(rd.from_pandas(df).repartition(3), key="u",
                             ts_col="ts", bucket_s=3600, censor_tail_s=21600)
           .to_pandas().set_index("t_bucket").sort_index())
    assert out.loc[0].tolist() == [4, 1, 1]   # n_risk, n_died, n_censored
    assert out.loc[3].tolist() == [2, 1, 0]
    assert out.loc[4].tolist() == [1, 0, 1]


def test_burst_hours_dense_spine_and_warmup():
    """Burst pins: trailing window over the DENSE spine (missing hours
    are zeros), the first `window` hours never flag, cross-multiplied
    threshold, zero-baseline bursts."""
    from opentelemetry_collector_contrib_ray.stages.windows import burst_hours

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = []
    # key a: 1/hour for hours 0..23, then 4 at hour 24, 1 at hour 25
    rows += [("a", base + h * H) for h in range(24)]
    rows += [("a", base + 24 * H)] * 4 + [("a", base + 25 * H)]
    # key b: burst of 5 at hour 0 (warm-up, never flagged), silence,
    # then 2 at hour 30 over an all-zero trailing window
    rows += [("b", base)] * 5 + [("b", base + 30 * H)] * 2
    df = pd.DataFrame({"k": [k for k, _ in rows], "ts": [t for _, t in rows]})
    out = burst_hours(rd.from_pandas(df).repartition(3), key="k",
                      ts_col="ts", window=24, factor=3).to_pandas()
    got = {(r.k, r.hour - 473352): (r.n, r.trail) for r in out.itertuples()}
    # 473352 = epoch hours of 2024-01-01
    assert got == {("a", 24): (4, 24), ("b", 30): (2, 0)}




def test_suffix_budget_strict_truncation():
    """Suffix-budget pins: the kept set is the longest SUFFIX (most
    recent turns), an exactly-at-budget suffix stays kept, a single
    over-budget last turn keeps 0, and token counting ignores empty
    runs ('' and multi-space)."""
    from opentelemetry_collector_contrib_ray.stages.windows import suffix_budget_stats

    df = pd.DataFrame({
        # conv a: turn tokens [4, 3, 3] budget 6 → suffix sums from the
        # end: 3, 6, 10 → keeps 2 turns / 6 tokens, drops 4
        # conv b: single turn of 7 tokens > 6 → keeps 0, drops 7
        # conv c: '' + 'x  y' → tokens [0, 2] → keeps 2 turns / 2 tokens
        "conv": ["a", "a", "a", "b", "c", "c"],
        "turn": [0, 1, 2, 0, 0, 1],
        "text": ["w w w w", "x y z", "a b c",
                 "t t t t t t t", "", "x  y"],
    })
    out = suffix_budget_stats(rd.from_pandas(df).repartition(2),
                              key="conv", order_col="turn",
                              text_col="text", budget=6).to_pandas()
    got = {r.n_turns_kept: (r.n_convs, r.sum_tokens_kept,
                            r.sum_tokens_dropped)
           for r in out.itertuples()}
    assert got == {2: (2, 8, 4), 0: (1, 0, 7)}


def test_seasonal_naive_error_dense_spine_and_short_span():
    """Seasonal-error pins: missing hours are REAL zeros on the spine
    (both baselines see them), the evaluable horizon starts exactly
    season hours after the key's first hour, and a key spanning fewer
    than season+1 hours emits nothing."""
    from opentelemetry_collector_contrib_ray.stages.windows import seasonal_naive_error

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = []
    # key a with season=2: hours 0..4 values [5, 0(missing), 3, 1, 4]
    #   evaluable h=2,3,4: seasonal |3-5|+|1-0|+|4-3| = 4
    #                      naive    |3-0|+|1-3|+|4-1| = 8
    rows += [("a", 0, 5), ("a", 2, 3), ("a", 3, 1), ("a", 4, 4)]
    # key b: span 2 hours (0,1) < season+1=3 → absent
    rows += [("b", 0, 9), ("b", 1, 9)]
    df = pd.DataFrame({"k": [k for k, _, _ in rows],
                       "ts": [base + h * H for _, h, _ in rows],
                       "v": [v for _, _, v in rows]})
    out = seasonal_naive_error(rd.from_pandas(df).repartition(2), key="k",
                               ts_col="ts", val_col="v",
                               season=2).to_pandas()
    got = {r.k: (r.n_hours, r.sum_abs_seasonal, r.sum_abs_naive)
           for r in out.itertuples()}
    assert got == {"a": (3, 4, 8)}


def test_tool_runs_break_on_interruption():
    """Tool-run pins (the conv_tool_runs rail): a non-tool turn between
    two calls of the same tool BREAKS the run — run_compress runs over
    the full turn order, so ['t','t','','t','t','t'] is a 2-run and a
    3-run, not a 5-run."""
    from opentelemetry_collector_contrib_ray.stages.windows import run_compress

    df = pd.DataFrame({
        "conv": ["c"] * 6,
        "turn": list(range(6)),
        "tool": ["t", "t", "", "t", "t", "t"],
    })
    runs = run_compress(rd.from_pandas(df).repartition(2), ["conv"],
                        ["turn"], "tool").to_pandas()
    t_runs = sorted(runs.loc[runs["tool"] == "t", "run_len"].tolist())
    assert t_runs == [2, 3]


def test_context_cost_prefix_resumming():
    """Context-cost pins: a conversation of token counts [3, 2, 4] has
    context mass 3 + (3+2) + (3+2+4) = 17; a single-turn conversation
    costs exactly its own tokens; lengths bucket separately."""
    from opentelemetry_collector_contrib_ray.stages.windows import context_cost_stats

    df = pd.DataFrame({
        "conv": ["a", "a", "a", "b"],
        "turn": [0, 1, 2, 0],
        "text": ["x y z", "p q", "a b c d", "solo turn here"],
    })
    out = context_cost_stats(rd.from_pandas(df).repartition(2), key="conv",
                             order_col="turn", text_col="text").to_pandas()
    got = {r.n_turns: (r.n_convs, r.sum_tokens, r.sum_context_tokens)
           for r in out.itertuples()}
    assert got == {3: (1, 9, 17), 1: (1, 3, 3)}


def test_cuped_parts_window_split_and_single_window_users(tmp_path):
    """CUPED pins: the midpoint splits min/max inclusive-right (an
    event AT the midpoint is post), a user active only pre carries
    y=0, and the cross-moment row reproduces hand-computed sums."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.queries import q_events_cuped_parts

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    # span 0..4h → mid = 2h. user 0 (variant 0): pre 1.00 @0h, post
    # 2.00 @2h (AT mid → post) and 3.00 @4h → x=100, y=500.
    # user 2 (variant 0): pre-only 4.00 @1h → x=400, y=0.
    # user 1 (variant 1): post-only 5.00 @3h → x=0, y=500.
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([base, base + 2 * H, base + 4 * H, base + 1 * H,
                        base + 3 * H]),
        "user_id": pa.array([0, 0, 0, 2, 1], pa.int64()),
        "event_type": ["view"] * 5,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        "props": ["{}"] * 5,
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_cuped_parts(str(tmp_path)).to_pandas()
    got = {r.variant: (r.n_users, r.sum_x, r.sum_y, r.sum_xx, r.sum_xy,
                       r.sum_yy) for r in out.itertuples()}
    # variant 0: users 0,2 → Σx=500, Σy=500, Σx²=100²+400²=170000,
    #   Σxy=100·500+0=50000, Σy²=250000
    # variant 1: user 1 → (1, 0, 500, 0, 0, 250000)
    assert got == {0: (2, 500, 500, 170000, 50000, 250000),
                   1: (1, 0, 500, 0, 0, 250000)}


def test_q21_fused_vs_unfused_paths(ray_session, monkeypatch):
    """The r5 fused single-exchange q21 plan (orders under the
    broadcast gate) must equal the 3-exchange fallback plan forced by
    a zero threshold — same rows, same dtypes."""
    from opentelemetry_collector_contrib_ray.pipelines import queries as Q
    from opentelemetry_collector_contrib_ray.stages import joins

    sf = "/root/testdata/sf0.001"
    fused = (Q.QUERIES["q21_waiting_suppliers"](sf).to_pandas()
             .sort_values(["s_name"]).reset_index(drop=True))
    # 100: over-gate for the F-filtered orders dim (~750 rows at
    # sf0.001) -> forces the 3-exchange fallback plan, while the tiny
    # waits/supplier/nation dims stay on their broadcast paths
    monkeypatch.setattr(joins, "BROADCAST_ROWS_THRESHOLD", 100)
    unfused = (Q.QUERIES["q21_waiting_suppliers"](sf).to_pandas()
               .sort_values(["s_name"]).reset_index(drop=True))
    assert list(fused.columns) == list(unfused.columns)
    assert fused.equals(unfused)
    assert len(fused) > 0


def test_q9_q5_fused_vs_unfused_paths(ray_session, monkeypatch):
    """The r5 zero-wide-exchange q9/q5 plans (order/customer maps under
    the broadcast gate) must equal the hash-exchange fallback plans
    forced by a low threshold. sf0.01 so the fallback's partials fill
    every partition (the empty-partition join quirk is a small-data
    artifact the production fallback regime never sees)."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.pipelines import queries as Q
    from opentelemetry_collector_contrib_ray.stages import joins

    sf = "/root/testdata/sf0.01"

    def run(name):
        out = Q.QUERIES[name](sf)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    for name in ("q9_product_type_profit", "q5_local_supplier_volume"):
        monkeypatch.setattr(joins, "BROADCAST_ROWS_THRESHOLD", 2_000_000)
        fused = run(name)
        # 1000: over-gate for the order map (~15k at sf0.01) and the
        # customer map, under-gate for part/supplier dims
        monkeypatch.setattr(joins, "BROADCAST_ROWS_THRESHOLD", 1000)
        unfused = run(name)
        assert fused.equals(unfused), name
        assert len(fused) > 0
