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

from .base import BatchOp

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(4294967296)


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
        # FNV-1a per string (cold path; prefer integer keys at scale)
        out = np.empty(len(col), dtype=np.uint64)
        for i, s in enumerate(col.to_pylist()):
            h = 0xCBF29CE484222325
            for b in ("" if s is None else s).encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return out % MOD32

    def transform(self, t: pa.Table) -> pa.Table:
        h = self._hash(t[self.source])
        keep = h < np.uint64(sample_threshold(self.percent))
        if self.priority_col and self.priority_col in t.column_names:
            prio = pc.fill_null(pc.cast(t[self.priority_col], pa.float64(), safe=False), 0)
            keep = keep | (np.asarray(prio) > 0)
        return t.filter(pa.array(keep))
