"""Edit-distance similarity join (string fuzzy-matching at corpus scale).

Finds every pair of short strings within Levenshtein distance ≤ 1 using
FastSS / SymSpell **deletion-neighborhood blocking** (Bocek et al. 2007,
"Fast Similarity Search in Large Dictionaries"; Garbe's SymSpell): two
strings are within one edit iff they share a member of their
{identity} ∪ {single-character-deletion} variant sets. The blocking is
COMPLETE for k = 1 (no candidate is missed), so after a vectorized
one-edit verification the result is exact — which is what lets the
DuckDB ``levenshtein()`` brute-force self-join serve as a hash oracle.

Reference parity note: the OTel collector has no fuzzy string join; this
belongs to the training-data-curation op set required by the build brief
(near-duplicate keys, log-template collapse, user-agent/URL variant
folding).

Scale shape (one wide exchange, strings shuffle once):

1. per batch, compute each string's 64-bit polynomial rolling hash AND
   the hashes of all single-deletion variants WITHOUT materializing the
   variants: the hash base B is odd, hence invertible mod 2^64, so
   ``H(s minus position i) = P_i + (H - P_{i+1}) · B⁻¹`` from one
   prefix-sum matrix — O(total_chars) numpy work, no per-row Python.
2. hash-partition the (key, sid, s) rows on the variant key (strings of
   length L emit L+1 rows — bounded: this operator is for SHORT join
   keys, cap with ``max_len``); within each partition a pandas
   self-merge on key yields candidates, verified by a vectorized
   one-edit check (common-prefix/common-suffix length rule over padded
   codepoint matrices).
3. the surviving (sid_a, sid_b, dist) int rows — tiny — deduplicate
   across partitions with one ``compact_groupby``.

Skew valve: ``max_bucket`` drops variant keys shared by more than that
many strings (a key shared by m strings emits O(m²) candidates; for
exact-duplicate-heavy corpora run ``exact_dedup`` first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .base import pa_from_pandas, arrow_out

_B = np.uint64(1099511628211)  # FNV-64 prime; odd => invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))

# pad sentinels above the Unicode codepoint range so a-pad never equals
# b-pad (or any real character) in the verification matrices
_PAD_A = np.uint64(1) << np.uint64(40)
_PAD_B = np.uint64(1) << np.uint64(41)


def _code_matrix(strs: list[str], pad: np.uint64):
    """(n, maxlen) uint64 codepoint matrix, padded, plus lengths."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    L = max(1, int(lens.max()) if n else 1)
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    flat = flat.astype(np.uint64)
    off = np.zeros(n, np.int64)
    off[1:] = np.cumsum(lens[:-1])
    codes = np.full((n, L), pad, np.uint64)
    col = np.arange(L)
    mask = col < lens[:, None]
    codes[mask] = flat[(off[:, None] + col)[mask]]
    return codes, lens


def deletion_keys(t: pa.Table, col: str, id_col: str,
                  out_id: str = "sid") -> pa.Table:
    """Explode each string into (key, sid, s) rows: its own hash plus
    every single-deletion variant hash, via the invertible-base
    prefix-sum identity (no variant strings are built)."""
    strs = t[col].to_pylist()
    sids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(strs)
    if n == 0:
        return pa.table({"key": pa.array([], pa.int64()),
                         out_id: pa.array([], pa.int64()),
                         "s": pa.array([], pa.string())})
    codes, lens = _code_matrix(strs, np.uint64(0))
    L = codes.shape[1]
    pw = np.ones(L, np.uint64)
    pw[1:] = _B
    pw = np.cumprod(pw)              # B^j mod 2^64 (uint64 wraparound)
    term = codes * pw
    P = np.cumsum(term, axis=1)      # inclusive prefix hashes, wraps mod 2^64
    valid = np.arange(L) < lens[:, None]
    H = P[np.arange(n), np.maximum(lens - 1, 0)]
    H = np.where(lens > 0, H, np.uint64(0))
    # deletion-variant hashes: H_i = P_excl_i + (H - P_i) * B^-1
    P_excl = np.zeros_like(P)
    P_excl[:, 1:] = P[:, :-1]
    Hdel = P_excl + (H[:, None] - P) * _BINV
    # gather: one identity key per row + one key per valid position
    keys = np.concatenate([H, Hdel[valid]])
    row_of = np.concatenate([np.arange(n),
                             np.broadcast_to(np.arange(n)[:, None],
                                             valid.shape)[valid]])
    s_arr = pa.array(strs, pa.string())
    return pa.table({
        "key": pa.array(keys.view(np.int64)),
        out_id: pa.array(sids[row_of]),
        "s": s_arr.take(pa.array(row_of)),
    })


def one_edit_dist(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized per-pair distance in {0, 1, 2}, where 2 means "> 1".

    Rule: with common-prefix length p and common-suffix length q,
    ed(a,b) ≤ 1 iff (equal) or (|la−lb| = 0 and p+q ≥ la−1) or
    (|la−lb| = 1 and p+q ≥ min(la,lb))."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    ca, la = _code_matrix(a, _PAD_A)
    cb, lb = _code_matrix(b, _PAD_B)
    L = max(ca.shape[1], cb.shape[1])
    if ca.shape[1] < L:
        ca = np.concatenate([ca, np.full((n, L - ca.shape[1]), _PAD_A)], 1)
    if cb.shape[1] < L:
        cb = np.concatenate([cb, np.full((n, L - cb.shape[1]), _PAD_B)], 1)
    neq = ca != cb
    pref = np.where(neq.any(1), neq.argmax(1), L)
    # reversed alignment for the common suffix
    ra = _reverse_rows(ca, la, _PAD_A)
    rb = _reverse_rows(cb, lb, _PAD_B)
    rneq = ra != rb
    suf = np.where(rneq.any(1), rneq.argmax(1), L)
    mn, mx = np.minimum(la, lb), np.maximum(la, lb)
    equal = (la == lb) & (pref >= la)
    sub1 = (la == lb) & ~equal & (pref + suf >= la - 1)
    del1 = (mx - mn == 1) & (pref + suf >= mn)
    return np.where(equal, 0, np.where(sub1 | del1, 1, 2)).astype(np.int64)


def _reverse_rows(codes: np.ndarray, lens: np.ndarray, pad: np.uint64):
    n, L = codes.shape
    col = np.arange(L)
    idx = lens[:, None] - 1 - col
    ok = idx >= 0
    out = np.full((n, L), pad, np.uint64)
    out[ok] = codes[np.arange(n)[:, None].repeat(L, 1)[ok], idx[ok]]
    return out


def edit_join_pairs(ds, col: str = "s", id_col: str = "sid",
                    num_partitions: int = 64, max_bucket: int = 64,
                    max_len: int = 256):
    """All (sid_a, sid_b, dist) pairs with Levenshtein distance ≤ 1.

    ``max_len`` guards the L+1 key expansion (this is a short-key join);
    longer strings raise rather than silently explode the exchange."""

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows and pc.max(pc.utf8_length(t[col])).as_py() > max_len:
            raise ValueError(
                f"edit_join_pairs: string over max_len={max_len}; "
                "join on a bounded key (prefix/line), not whole documents")
        return deletion_keys(t, col, id_col)

    def add_part(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__p", pa.array(((k * np.uint64(0x9E3779B97F4A7C15))
                             % np.uint64(num_partitions)).astype(np.int64)))

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        df = g[["key", "sid", "s"]].drop_duplicates(["key", "sid"])
        if max_bucket is not None:
            df = df[df.groupby("key")["sid"].transform("size") <= max_bucket]
        m = df.merge(df, on="key", suffixes=("_a", "_b"))
        m = m[m["sid_a"] < m["sid_b"]].drop_duplicates(["sid_a", "sid_b"])
        if not len(m):
            return pa.table({"sid_a": pa.array([], pa.int64()),
                             "sid_b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        dist = one_edit_dist(m["s_a"].tolist(), m["s_b"].tolist())
        keep = dist <= 1
        return pa.table({"sid_a": pa.array(m["sid_a"].to_numpy()[keep]),
                         "sid_b": pa.array(m["sid_b"].to_numpy()[keep]),
                         "dist": pa.array(dist[keep])})

    from .agg import compact_groupby

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
               .map_batches(add_part, batch_format="pyarrow")
               .groupby("__p")
               .map_groups(arrow_out(pairs_partition), batch_format="pandas"))
    # a pair verified in several partitions emits identical rows; one
    # tiny compact pass dedups them (pair cardinality ~ true duplicates)
    out = compact_groupby(pairs, ["sid_a", "sid_b", "dist"],
                          count_alias="__n")
    return out.select_columns(["sid_a", "sid_b", "dist"])
