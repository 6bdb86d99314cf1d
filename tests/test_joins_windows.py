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
