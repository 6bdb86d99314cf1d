"""KMV / theta sketches — mergeable distinct-value sketches that,
unlike HyperLogLog (agg.py approx_distinct), support SET ALGEBRA:
union, intersection and difference cardinalities between sketched sets
(Beyer et al. 2007 "On Synopses for Distinct-Value Estimation under
Multiset Operations"; the Apache DataSketches theta-sketch family is
the production analog — all public algorithms).

Scale shape: one streaming pass; every block emits, per group, a blob
of its ≤k smallest distinct hash values (k·8 bytes max, independent of
block size), partials merge per group inside ``map_groups`` (one tiny
exchange of blobs), and the driver holds only the final O(k) sketch
per group.  No shuffle of raw values, no COUNT DISTINCT exchange.

Hash: the repo's standard Knuth multiplicative ``(x·2654435761) mod
2^32`` (sampler.py) — odd multiplier ⇒ bijective on the 32-bit ring,
so distinct keys never collide, and the whole computation has an exact
HUGEINT SQL twin.  Exactness discipline (the repo's sketch convention,
like CMS/KLL/Misra–Gries): run the ORACLE configuration with k ≥ the
true distinct count — the sketch is then exact and equals COUNT
(DISTINCT …) set algebra in SQL; the saturated (approximate) regime is
covered by error-bound pytest instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = np.uint64(2654435761)
SPACE = np.uint64(1) << np.uint64(32)   # hash ring size


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * KNUTH) % SPACE


def _k_smallest(vals: np.ndarray, k: int) -> np.ndarray:
    vals = np.unique(vals)          # sorted distinct
    return vals[:k]


class KMVPartial:
    """Per-block partial: for every group value, the ≤k smallest
    distinct hashes of ``id_col`` as one binary blob row."""

    def __init__(self, group_col: str, id_col: str, k: int):
        self.group_col, self.id_col, self.k = group_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        groups, blobs = [], []
        keys = pc.cast(t[self.group_col], pa.string())
        ids = pc.cast(t[self.id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        h = _hash_ids(ids)
        key_np = keys.to_numpy(zero_copy_only=False)
        for g in np.unique(key_np[key_np != None]):  # noqa: E711
            sk = _k_smallest(h[key_np == g], self.k)
            groups.append(str(g))
            blobs.append(sk.tobytes())
        return pa.table({self.group_col: pa.array(groups, pa.string()),
                         "__kmv": pa.array(blobs, pa.binary())})


def kmv_sketches(ds, group_col: str, id_col: str, k: int) -> dict[str, np.ndarray]:
    """group value → merged KMV sketch (sorted uint64 array, ≤k)."""
    partials = ds.map_batches(KMVPartial(group_col, id_col, k),
                              batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        allv = np.concatenate([
            np.frombuffer(b, dtype=np.uint64)
            for b in t["__kmv"].to_pylist()]) if t.num_rows else \
            np.empty(0, np.uint64)
        sk = _k_smallest(allv, k)
        return pa.table({group_col: t[group_col][:1],
                         "__kmv": pa.array([sk.tobytes()], pa.binary())})

    merged = partials.groupby(group_col).map_groups(
        merge, batch_format="pyarrow").materialize()
    out: dict[str, np.ndarray] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for g, blob in zip(b[group_col].to_pylist(), b["__kmv"].to_pylist()):
            out[g] = np.frombuffer(blob, dtype=np.uint64)
    return out


def kmv_estimate(sk: np.ndarray, k: int) -> float:
    """Distinct-count estimate: exact when unsaturated, else the
    classic (k-1)·M/v_k KMV estimator."""
    if sk.size < k:
        return float(sk.size)
    return (k - 1) * float(SPACE) / float(sk[k - 1])


def kmv_set_ops(a: np.ndarray, b: np.ndarray, k: int) -> dict[str, int]:
    """Union / intersection / difference cardinalities from two
    sketches (theta-sketch style: evaluate membership below the union
    sketch's threshold).  Exact integers when both sketches are
    unsaturated; rounded estimates otherwise."""
    if a.size < k and b.size < k:            # exact regime
        sa, sb = set(a.tolist()), set(b.tolist())
        return {"n_a": len(sa), "n_b": len(sb),
                "n_union": len(sa | sb), "n_intersect": len(sa & sb),
                "n_a_only": len(sa - sb)}
    union = _k_smallest(np.concatenate([a, b]), k)
    theta = float(union[k - 1]) if union.size >= k else float(SPACE)
    n_u = kmv_estimate(union, k)
    below = union[union < theta] if union.size >= k else union
    in_both = np.intersect1d(np.intersect1d(below, a), b).size
    frac = in_both / max(below.size, 1)
    n_i = frac * n_u
    n_a, n_b = kmv_estimate(a, k), kmv_estimate(b, k)
    return {"n_a": round(n_a), "n_b": round(n_b),
            "n_union": round(n_u), "n_intersect": round(n_i),
            "n_a_only": round(n_a - n_i)}
