"""Tail sampling (stages/tailsampling.py) — per-policy hand cases,
and/not composition, broadcast vs shuffle keep paths, block invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.tailsampling import tail_sample


def ts_arr(vals):
    return pa.array(np.array(vals, dtype="datetime64[us]"))


def _traces():
    # trace 1: has an error; trace 2: long (2h), 3 spans;
    # trace 3: short, 2 spans, no error; trace 4: 4 spans, 1h
    return pa.table({
        "trace": [1, 1, 2, 2, 2, 3, 3, 4, 4, 4, 4],
        "id": list(range(11)),
        "status": ["ok", "error", "ok", "ok", "ok", "ok", "ok",
                   "ok", "ok", "ok", "ok"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0],
        "ts": ts_arr(["2024-01-01T00:00:00", "2024-01-01T00:10:00",
                      "2024-01-01T00:00:00", "2024-01-01T01:00:00",
                      "2024-01-01T02:00:00", "2024-01-01T00:00:00",
                      "2024-01-01T00:05:00", "2024-01-01T00:00:00",
                      "2024-01-01T00:20:00", "2024-01-01T00:40:00",
                      "2024-01-01T01:00:00"]),
    })


def _kept(policies, keep_mode="broadcast", blocks=3):
    ds = rd.from_arrow(_traces()).repartition(blocks)
    out = tail_sample(ds, "trace", "ts", policies, num_partitions=4,
                      keep_mode=keep_mode).to_pandas()
    return sorted(out["trace"].unique())


def test_status_code_policy():
    assert _kept([{"type": "status_code", "col": "status",
                   "values": ["error"]}]) == [1]


def test_string_attr_invert():
    assert _kept([{"type": "string_attr", "col": "status",
                   "values": ["error"], "invert": True}]) == [2, 3, 4]


def test_latency_policy_with_upper():
    # duration: t1=10m t2=2h t3=5m t4=1h
    assert _kept([{"type": "latency", "threshold_ms": 3600 * 1000}]) == [2, 4]
    assert _kept([{"type": "latency", "threshold_ms": 30 * 60 * 1000,
                   "upper_threshold_ms": 90 * 60 * 1000}]) == [4]


def test_span_count_and_numeric():
    assert _kept([{"type": "span_count", "min": 3, "max": 3}]) == [2]
    assert _kept([{"type": "numeric_attr", "col": "v",
                   "min": 10.5, "max": 99.0}]) == [4]


def test_and_composition_and_always():
    pols = [{"type": "and", "sub": [
        {"type": "span_count", "min": 3},
        {"type": "latency", "threshold_ms": 90 * 60 * 1000},
    ]}]
    assert _kept(pols) == [2]
    assert _kept([{"type": "always"}]) == [1, 2, 3, 4]


def test_or_of_policies_and_not():
    pols = [{"type": "status_code", "col": "status", "values": ["error"]},
            {"type": "span_count", "min": 4}]
    assert _kept(pols) == [1, 4]
    assert _kept([{"type": "not", "sub": {"type": "span_count", "min": 3}}]) == [1, 3]


def test_shuffle_keep_mode_matches_broadcast():
    pols = [{"type": "latency", "threshold_ms": 3600 * 1000}]
    assert _kept(pols, keep_mode="shuffle") == _kept(pols, keep_mode="broadcast")


def test_block_invariance():
    pols = [{"type": "span_count", "min": 3},
            {"type": "probabilistic", "percent": 50.0}]
    assert _kept(pols, blocks=1) == _kept(pols, blocks=5)
