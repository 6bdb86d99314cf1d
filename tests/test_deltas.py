"""Temporality conversion stages (stages/deltas.py) — hand cases,
initial_value modes, cross-parallelism determinism, interval_last
tie-breaks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.deltas import (
    cumulative_to_delta,
    delta_to_cumulative,
    delta_to_rate,
    interval_last,
)


def ts_arr(vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"))


def _stream_table():
    # two streams (a: ids 1,2,3 / b: ids 4,5), deliberately out of order
    return pa.table({
        "k": ["a", "b", "a", "a", "b"],
        "id": [2, 5, 1, 3, 4],
        "ts": ts_arr(["2024-01-01T00:00:10", "2024-01-01T00:01:00",
                      "2024-01-01T00:00:00", "2024-01-01T00:00:30",
                      "2024-01-01T00:00:20"]),
        "v": [10, 100, 3, 14, 40],
    })


def test_cumulative_to_delta_hand():
    ds = rd.from_arrow(_stream_table())
    out = (cumulative_to_delta(ds, ["k"], "ts", "v", tie="id", num_partitions=4)
           .to_pandas().sort_values("id"))
    # stream a: 3 -> 10 -> 14 gives deltas 7, 4; stream b: 40 -> 100 gives 60
    assert out["id"].tolist() == [2, 3, 5]
    assert out["delta"].tolist() == [7, 4, 60]


def test_cumulative_to_delta_keep_first():
    ds = rd.from_arrow(_stream_table())
    out = (cumulative_to_delta(ds, ["k"], "ts", "v", tie="id",
                               initial_value="keep", num_partitions=4)
           .to_pandas().sort_values("id"))
    assert out["id"].tolist() == [1, 2, 3, 4, 5]
    # first point of each stream emitted verbatim (tracker.go InitialValueKeep)
    assert out["delta"].tolist() == [3, 7, 4, 40, 60]


def test_delta_to_cumulative_inverts_deltas():
    ds = rd.from_arrow(_stream_table())
    out = (delta_to_cumulative(ds, ["k"], "ts", "v", tie="id", num_partitions=4)
           .to_pandas().sort_values("id"))
    # running totals in ts order per stream
    assert out["cumulative"].tolist() == [3, 13, 27, 40, 140]


def test_delta_to_rate():
    ds = rd.from_arrow(_stream_table())
    out = (delta_to_rate(ds, ["k"], "ts", "v", tie="id", num_partitions=4)
           .to_pandas().sort_values("id"))
    # stream a: +7 over 10s, +4 over 20s; stream b: +60 over 40s
    assert np.allclose(out["rate"].to_numpy(), [0.7, 0.2, 1.5])


def test_deltas_parallelism_invariant():
    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "k": rng.integers(0, 40, n),
        "id": np.arange(n),
        "ts": pa.array(rng.integers(0, 10**7, n).astype("datetime64[us]")),
        "v": rng.integers(0, 1000, n),
    })
    outs = []
    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        df = (delta_to_cumulative(ds, ["k"], "ts", "v", tie="id", num_partitions=8)
              .to_pandas().sort_values("id").reset_index(drop=True))
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_interval_last_tie_break():
    # two points at the SAME ts in one interval: the higher tie id wins
    t = pa.table({
        "k": ["a", "a", "a", "b"],
        "id": [1, 2, 3, 9],
        "ts": ts_arr(["2024-01-01T00:00:05", "2024-01-01T00:00:05",
                      "2024-01-01T01:00:00", "2024-01-01T00:00:07"]),
        "v": [11, 22, 33, 44],
    })
    out = (interval_last(rd.from_arrow(t), ["k"], "ts", size_s=3600,
                         carry=["id", "v"], num_partitions=4)
           .to_pandas().sort_values(["k", "window_start"]).reset_index(drop=True))
    assert out["id"].tolist() == [2, 3, 9]
    assert out["v"].tolist() == [22, 33, 44]
    assert out["window_start"].tolist() == [
        1704067200000000, 1704070800000000, 1704067200000000]


def test_interval_last_combiner_merge():
    # many blocks: per-batch partials must merge to the true global last
    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table({
        "k": rng.integers(0, 10, n),
        "id": np.arange(n),
        "ts": pa.array(rng.integers(0, 86400 * 10**6, n).astype("datetime64[us]")),
        "v": rng.integers(0, 100, n),
    })
    df = t.to_pandas()
    df["w"] = (df["ts"].astype("int64") // (3600 * 10**6)) * 3600 * 10**6
    exp = (df.sort_values(["k", "w", "ts", "id"])
           .drop_duplicates(subset=["k", "w"], keep="last")
           .sort_values(["k", "w"]).reset_index(drop=True))
    out = (interval_last(rd.from_arrow(t).repartition(9), ["k"], "ts", 3600,
                         carry=["id", "v"], num_partitions=4)
           .to_pandas().sort_values(["k", "window_start"]).reset_index(drop=True))
    assert out["id"].tolist() == exp["id"].tolist()
    assert out["v"].tolist() == exp["v"].tolist()


def test_latest_state_upsert_and_tombstone():
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.deltas import latest_state

    log = pa.table({
        "k": [1, 1, 1, 2, 2, 3],
        "seq": [10, 30, 20, 5, 6, 1],
        "op": ["U", "U", "U", "U", "D", "U"],
        "v": ["a", "final", "b", "x", "gone", "solo"],
    })
    out = latest_state(
        rd.from_arrow(log).repartition(4), key="k", seq="seq",
        delete_expr=lambda t: pc.equal(t["op"], "D"), num_partitions=3,
    ).to_pandas()
    got = dict(zip(out["k"], out["v"]))
    # key 1: seq 30 wins; key 2: latest is a delete -> absent; key 3 kept
    assert got == {1: "final", 3: "solo"}


def test_monotonic_increase_reset_semantics():
    from opentelemetry_collector_contrib_ray.stages.deltas import monotonic_increase

    # stream a: 3 -> 10 -> 4 (reset, climb 4) -> 9 : increase 7+4+5=16, 1 reset
    # stream b: 40 -> 100 : increase 60, 0 resets
    # stream c: single point -> no output row
    t = pa.table({
        "k": ["a", "a", "a", "a", "b", "b", "c"],
        "id": [1, 2, 3, 4, 5, 6, 7],
        "ts": ts_arr(["2024-01-01T00:00:00", "2024-01-01T00:00:10",
                      "2024-01-01T00:00:20", "2024-01-01T00:00:30",
                      "2024-01-01T00:01:00", "2024-01-01T00:01:30",
                      "2024-01-01T00:02:00"]),
        "v": [3, 10, 4, 9, 40, 100, 7],
    })
    out = (monotonic_increase(rd.from_arrow(t), ["k"], "ts", "v", tie="id",
                              num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == ["a", "b"]
    assert out["total_increase"].tolist() == [16, 60]
    assert out["n_resets"].tolist() == [1, 0]
    assert out["n_obs"].tolist() == [3, 1]
    assert out["elapsed_us"].tolist() == [30_000_000, 30_000_000]


def test_monotonic_increase_matches_pandas_reference():
    from opentelemetry_collector_contrib_ray.stages.deltas import monotonic_increase

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n).astype(str),
        "id": np.arange(n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "v": rng.integers(0, 1000, n),
    })

    def ref(df):
        rows = []
        for k, g in df.sort_values(["ts", "id"]).groupby("k"):
            v = g["v"].to_numpy()
            if len(v) < 2:
                continue
            inc = sum(int(b) if b < a else int(b - a)
                      for a, b in zip(v[:-1], v[1:]))
            rst = int(sum(b < a for a, b in zip(v[:-1], v[1:])))
            us = g["ts"].astype("int64") // 1000  # ns -> us
            rows.append((k, inc, rst, len(v) - 1,
                         int(us.max() - us.min())))
        return pd.DataFrame(rows, columns=["k", "total_increase", "n_resets",
                                           "n_obs", "elapsed_us"])

    expect = ref(df).sort_values("k").reset_index(drop=True)
    for npart in (1, 8):
        got = (monotonic_increase(
                   rd.from_pandas(df).repartition(6), ["k"], "ts", "v",
                   tie="id", num_partitions=npart)
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"total_increase": "int64", "n_resets": "int64",
                        "n_obs": "int64", "elapsed_us": "int64"}),
            expect.astype({"total_increase": "int64", "n_resets": "int64",
                           "n_obs": "int64", "elapsed_us": "int64"}))
