"""Edit-distance similarity join (stages/editjoin.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.editjoin import (
    deletion_keys,
    edit_join_pairs,
    one_edit_dist,
)


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    return d[len(b)]


@given(st.lists(st.tuples(st.text(alphabet="abcZ", max_size=7),
                          st.text(alphabet="abcZ", max_size=7)),
                min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_one_edit_dist_matches_dp(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = one_edit_dist(a, b)
    want = [min(_lev(x, y), 2) for x, y in pairs]
    assert got.tolist() == want


def test_deletion_keys_complete_for_one_edit():
    # any pair at distance <= 1 must share a deletion-variant key
    strs = ["abcde", "abde", "abXde", "abcde", "x", "", "a"]
    t = pa.table({"sid": pa.array(range(len(strs)), pa.int64()),
                  "s": pa.array(strs)})
    out = deletion_keys(t, "s", "sid")
    by_sid = {}
    for k, sid in zip(out["key"].to_pylist(), out["sid"].to_pylist()):
        by_sid.setdefault(sid, set()).add(k)
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _lev(strs[i], strs[j]) <= 1:
                assert by_sid[i] & by_sid[j], (strs[i], strs[j])


def test_edit_join_pairs_exact():
    strs = {
        0: "log line alpha one",
        1: "log line alpha one",     # exact dup of 0
        2: "log line alpha one!",    # insertion vs 0
        3: "log lane alpha one",     # substitution vs 0
        4: "completely different",
        5: "completely differen",    # deletion vs 4
        6: "og line alpha one",      # deletion at position 0 vs 0
    }
    ds = rd.from_arrow(pa.table({
        "sid": pa.array(list(strs), pa.int64()),
        "s": pa.array(list(strs.values())),
    }))
    got = {(r["sid_a"], r["sid_b"]): r["dist"]
           for r in edit_join_pairs(ds, num_partitions=8).take_all()}
    want = {}
    ids = list(strs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = _lev(strs[ids[i]], strs[ids[j]])
            if d <= 1:
                want[(ids[i], ids[j])] = d
    assert got == want
    assert got[(0, 1)] == 0 and got[(0, 2)] == 1 and got[(4, 5)] == 1


def test_edit_join_parallelism_invariant():
    rng = np.random.default_rng(11)
    base = ["".join(rng.choice(list("abcd"), 12)) for _ in range(80)]
    rows, sid = [], 0
    for s in base:
        rows.append((sid, s)); sid += 1
        if sid % 3 == 0:
            rows.append((sid, s[:5] + s[6:])); sid += 1
    t = pa.table({"sid": pa.array([r[0] for r in rows], pa.int64()),
                  "s": pa.array([r[1] for r in rows])})
    res = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = edit_join_pairs(ds, num_partitions=16).take_all()
        res.append(sorted((r["sid_a"], r["sid_b"], r["dist"]) for r in out))
    assert res[0] == res[1] and len(res[0]) > 0
    # cross-check the full result against brute force
    want = sorted((a, b, _lev(sa, sb))
                  for (a, sa) in rows for (b, sb) in rows
                  if a < b and _lev(sa, sb) <= 1)
    assert res[0] == want


def test_edit_join_max_len_guard():
    ds = rd.from_arrow(pa.table({"sid": pa.array([0], pa.int64()),
                                 "s": pa.array(["x" * 300])}))
    with pytest.raises(Exception, match="max_len"):
        edit_join_pairs(ds).take_all()


def test_edit_join_max_bucket_valve():
    # 40 identical strings would emit C(40,2) pairs; the valve drops
    # over-shared keys so the exact-dup flood is suppressed
    t = pa.table({"sid": pa.array(range(40), pa.int64()),
                  "s": pa.array(["same text"] * 40)})
    out = edit_join_pairs(rd.from_arrow(t), num_partitions=4,
                          max_bucket=8).take_all()
    assert out == []
