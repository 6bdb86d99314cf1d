"""Probabilistic sampler — deterministic hash-bucket sampling.

Parity: /root/reference/processor/probabilisticsamplerprocessor/
logsprocessor.go:51-90 — hash the sampling source value with a seed,
keep the record when the bucket falls under the percentage threshold;
``sampling_priority`` attribute overrides.

Determinism contract: for integer keys the hash is the Knuth
multiplicative scheme ``(x * 2654435761) mod 2^32`` — chosen because it
is exactly expressible in ANSI SQL (HUGEINT arithmetic), so the DuckDB
oracle reproduces the sample bit-for-bit. String keys use FNV-1a
(logsprocessor.go uses fnv) — checked rows-only by the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .base import BatchOp, arrow_out

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(4294967296)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_hash_strings(col: pa.Array) -> np.ndarray:
    """FNV-1a over each string's UTF-8 bytes (null → empty string),
    bit-identical to the per-byte reference loop but vectorized ACROSS
    rows: FNV-1a is sequential in the byte index, so iterate byte
    POSITIONS (≤ longest string) and update every still-active row's
    state with one gather + one xor/multiply per position — no per-row
    Python. Log keys are short (tens of bytes), so the position loop is
    tiny while each iteration touches the whole batch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    b = pc.cast(pc.fill_null(pc.cast(col, pa.string()), ""), pa.large_binary())
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(b.buffers()[1], dtype=np.int64)[b.offset : b.offset + n + 1]
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8) if b.buffers()[2] else np.empty(0, np.uint8)
    lens = np.diff(offs)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lens.max()) if n else 0
    # rows sorted by length would let us shrink the active set cheaply;
    # a boolean mask per position is simpler and the tail is short
    with np.errstate(over="ignore"):
        for j in range(max_len):
            active = np.nonzero(lens > j)[0]
            bj = data[offs[:-1][active] + j].astype(np.uint64)
            h[active] = (h[active] ^ bj) * _FNV_PRIME
    return h


def knuth_hash_sql(col_sql: str) -> str:
    """The SQL twin of the integer-key hash."""
    return f"((CAST({col_sql} AS HUGEINT) * 2654435761) % 4294967296)"


def sample_threshold(percent: float) -> int:
    """Scaled keep-threshold over the 2^32 hash space — supports
    fractional percentages (the reference probabilisticsampler scales
    over numHashBuckets rather than truncating to integer percent)."""
    return int(round(percent / 100.0 * 4294967296))


def sample_keep_sql(col_sql: str, percent: float) -> str:
    """SQL twin of the sampler keep predicate."""
    return f"({knuth_hash_sql(col_sql)}) < {sample_threshold(percent)}"


class ProbabilisticSampler(BatchOp):
    def __init__(self, percent: float, attribute_source: str,
                 priority_col: str | None = None, **kw):
        super().__init__(**kw)
        self.percent = percent
        self.source = attribute_source
        self.priority_col = priority_col

    def _hash(self, col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            x = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                return (x * KNUTH) % MOD32
        return fnv1a_hash_strings(col) % MOD32

    def transform(self, t: pa.Table) -> pa.Table:
        h = self._hash(t[self.source])
        keep = h < np.uint64(sample_threshold(self.percent))
        if self.priority_col and self.priority_col in t.column_names:
            prio = pc.fill_null(pc.cast(t[self.priority_col], pa.float64(), safe=False), 0)
            keep = keep | (np.asarray(prio) > 0)
        return t.filter(pa.array(keep))


def cap_per_key(ds, key_col: str, n: int, id_col: str, num_partitions: int = 64):
    """Deterministic per-key cap — corpus curation's "at most N docs per
    domain/user": within each key, keep the N rows with the smallest
    ``(knuth_hash(id), id)`` — a uniform, seedless, reproducible choice
    (same SQL twin as the sampler:
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY hash, id) <= N``).

    Shape: hash-partition on the key (many whole key groups per
    partition), one vectorized pandas pass per partition (sort +
    cumcount — no per-key Python). Rows move once; per-worker memory
    ≈ rows/num_partitions.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = k.astype(np.uint64)
        else:
            h = pd.util.hash_array(k.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def cap_partition(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.uint64)
        g = g.assign(__h=(ids * np.uint64(2654435761)) % np.uint64(2**32))
        g = g.sort_values([key_col, "__h", id_col], kind="mergesort")
        # dropna=False: a NULL key is one group (SQL PARTITION BY semantics)
        keep = g.groupby(key_col, sort=False, dropna=False).cumcount() < n
        return g.loc[keep].drop(columns=["__h", "__p"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(cap_partition), batch_format="pandas")
    )


def stratified_cap(ds, stratum_col: str, quotas: dict, default_n: int,
                   id_col: str, num_partitions: int = 64):
    """Stratified quota sampling — corpus rebalancing's "at most Q_s
    docs per language/domain s": ``cap_per_key`` generalized to a
    per-stratum quota table. Within each stratum, keep the Q_s rows
    with the smallest ``(knuth_hash(id), id)`` — deterministic,
    seedless, reproducible, and exactly SQL-twinnable
    (``ROW_NUMBER() OVER (PARTITION BY s ORDER BY hash, id) <= CASE s
    …``).

    Same shape as cap_per_key: one hash exchange on the stratum, many
    whole strata per partition, one vectorized pandas pass (the quota
    lookup is a vectorized map, not per-row Python). The quota dict is
    driver-tiny (one entry per stratum) and ships in the task closure.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def add_part(t: pa.Table) -> pa.Table:
        k = t[stratum_col].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = k.astype(np.uint64)
        else:
            h = pd.util.hash_array(k.astype("U"))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def cap_partition(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.uint64)
        g = g.assign(__h=(ids * np.uint64(2654435761)) % np.uint64(2**32))
        g = g.sort_values([stratum_col, "__h", id_col], kind="mergesort")
        q = g[stratum_col].map(quotas).fillna(default_n).to_numpy()
        keep = g.groupby(stratum_col, sort=False, dropna=False).cumcount().to_numpy() < q
        return g.loc[keep].drop(columns=["__h", "__p"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(cap_partition), batch_format="pandas")
    )


def upsample_by_weight(t, stratum_col: str, weights: dict, default_w: float,
                       id_col: str):
    """Deterministic weighted upsampling — training-data mixture
    weights ("repeat wikipedia 2.5 epochs"): each row is emitted
    ``floor(w)`` times plus one more iff ``knuth_hash(id) <
    frac(w)·2^32`` — seedless, reproducible, and independent per row
    (NO shuffle: this is a pure ``map_batches`` expansion). Emits a
    ``rep_idx`` (0..reps-1) column so downstream packing/shuffling can
    distinguish copies.

    Per-stratum thresholds are precomputed once on the driver (ints),
    so the per-batch work is one map + compare + ``np.repeat``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def _split(w: float) -> tuple[int, int]:
        fl = int(np.floor(w))
        return fl, int((w - fl) * 2**32)

    table = {k: _split(v) for k, v in weights.items()}
    dfl, dthr = _split(default_w)

    s = pd.Series(t[stratum_col].to_numpy(zero_copy_only=False))
    fl = s.map({k: v[0] for k, v in table.items()}).fillna(dfl).to_numpy(np.int64)
    thr = s.map({k: v[1] for k, v in table.items()}).fillna(dthr).to_numpy(np.uint64)
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = (ids * KNUTH) % MOD32
    reps = fl + (h < thr)
    idx = np.repeat(np.arange(len(reps), dtype=np.int64), reps)
    ends = np.cumsum(reps)
    rep_idx = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) \
        - np.repeat(ends - reps, reps)
    out = t.take(pa.array(idx))
    return out.append_column("rep_idx", pa.array(rep_idx))


def upsample_sql_cases(stratum_sql: str, weights: dict, default_w: float):
    """(floor_case, threshold_case) SQL expressions with the SAME
    integer thresholds the Python side uses."""
    import numpy as np

    def _split(w: float) -> tuple[int, int]:
        fl = int(np.floor(w))
        return fl, int((w - fl) * 2**32)

    fls = " ".join(f"WHEN '{k}' THEN {_split(v)[0]}" for k, v in weights.items())
    ths = " ".join(f"WHEN '{k}' THEN {_split(v)[1]}" for k, v in weights.items())
    dfl, dthr = _split(default_w)
    return (f"CASE {stratum_sql} {fls} ELSE {dfl} END",
            f"CASE {stratum_sql} {ths} ELSE {dthr} END")


def stratified_cap_sql(stratum_sql: str, id_sql: str, quotas: dict,
                       default_n: int, src: str) -> str:
    """SQL twin row-filter CTE body for ``stratified_cap``."""
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in quotas.items())
    return (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {stratum_sql} "
        f"ORDER BY {knuth_hash_sql(id_sql)}, {id_sql}) AS __rn FROM {src}) "
        f"WHERE __rn <= CASE {stratum_sql} {cases} ELSE {default_n} END"
    )


def cap_per_key_sql(key_sql: str, id_sql: str, n: int, src: str = "events") -> str:
    """SQL twin row-filter CTE body for ``cap_per_key``."""
    return (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_sql} "
        f"ORDER BY {knuth_hash_sql(id_sql)}, {id_sql}) AS __rn FROM {src}) "
        f"WHERE __rn <= {n}"
    )


def assign_split(t, id_col: str, fractions: dict[str, float]):
    """Deterministic dataset splitting ("train"/"valid"/"test"):
    assign each row a split by where ``knuth_hash(id)`` falls among
    cumulative-fraction thresholds over the 2^32 hash space — seedless,
    reproducible, disjoint, and exactly SQL-twinnable (a CASE over the
    same integer thresholds). Pure per-row arithmetic: a zero-shuffle
    ``map_batches`` stage.

    ``fractions`` maps split name → fraction (must sum to ~1; the last
    split absorbs rounding).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    thr = np.array([int(c * 2**32) for c in cum[:-1]], dtype=np.uint64)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    if ids.dtype.kind in "iu":
        h = (ids.astype(np.uint64) * KNUTH) % MOD32
    else:
        h = fnv1a_hash_strings(pa.array(ids)) % MOD32
    idx = np.searchsorted(thr, h, side="right")
    split = pd.Categorical.from_codes(idx, categories=names)
    return t.append_column("split", pa.array(split.astype(str)))


def split_thresholds_sql(id_sql: str, fractions: dict[str, float]) -> str:
    """CASE expression with the SAME integer thresholds assign_split
    uses."""
    import numpy as np

    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    arms = " ".join(
        f"WHEN {knuth_hash_sql(id_sql)} < {int(c * 2**32)} THEN '{n}'"
        for n, c in zip(names[:-1], cum[:-1]))
    return f"CASE {arms} ELSE '{names[-1]}' END"


def rate_limit(ds, key_col: str, ts_col: str, max_per_window: int,
               window_s: int, id_col: str, num_partitions: int = 64):
    """Time-windowed rate limiter / throttle: within each
    ``(key, tumbling window)`` cell keep only the FIRST
    ``max_per_window`` rows in ``(ts, id)`` arrival order and drop the
    rest — the batch analog of a per-tenant token bucket (the
    deterministic ``id`` tiebreak makes equal-timestamp order, and so
    the kept set, reproducible under any parallelism; SQL twin:
    ``ROW_NUMBER() OVER (PARTITION BY key, window ORDER BY ts, id)
    <= N``).

    Shape: the window index is pure per-row arithmetic; one hash
    exchange on (key, window) co-locates each cell whole, then a single
    vectorized sort + groupby-cumcount pass per partition — no per-key
    Python, per-worker memory ≈ rows/num_partitions, and a hot key's
    cells spread over partitions because the window participates in the
    hash."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    width_us = int(window_s) * 1_000_000

    def add_cols(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        w = pc.divide(us, width_us)
        t = t.append_column("__w", pc.cast(w, pa.int64()))
        k = t[key_col].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            h = k.astype(np.uint64)
        else:
            h = pd.util.hash_array(k.astype("U"))
        with np.errstate(over="ignore"):
            h = h * np.uint64(1000003) + np.asarray(pc.cast(w, pa.uint64()))
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    def limit_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__w", ts_col, id_col], kind="mergesort")
        keep = (g.groupby([key_col, "__w"], sort=False, dropna=False).cumcount()
                < max_per_window)
        return g.loc[keep].drop(columns=["__w", "__p"])

    return (
        ds.map_batches(add_cols, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(limit_partition), batch_format="pandas")
    )


def rate_limit_sql(key_sql: str, ts_sql: str, id_sql: str,
                   max_per_window: int, window_s: int,
                   src: str = "events") -> str:
    """SQL twin row-filter CTE body for ``rate_limit``."""
    return (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_sql}, "
        f"epoch_us({ts_sql}) // {int(window_s) * 1_000_000} "
        f"ORDER BY {ts_sql}, {id_sql}) AS __rn FROM {src}) "
        f"WHERE __rn <= {max_per_window}"
    )
