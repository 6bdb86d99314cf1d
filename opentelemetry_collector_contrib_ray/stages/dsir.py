"""DSIR-style data selection via importance resampling (Xie et al.
2023, arXiv:2302.03169): score every raw document by the hashed-n-gram
log-likelihood ratio between a small TARGET corpus and the raw corpus,
then keep the top of the distribution — the standard
select-pretraining-data-that-looks-like-the-target recipe.

Design (Ray-Data-first, integer-exact for the oracle):

- Features are Karp-Rabin byte-window hashes mod 2^64
  (``stages/text._window_hashes`` — one vectorized prefix-sum pass per
  batch, no per-row Python) bucketed to ``n_buckets`` by modulus; the
  same polynomial is exactly expressible in DuckDB HUGEINT arithmetic,
  which is what makes the twin possible.
- Pass 1 (counts): each batch emits ONE ``n_buckets``-row partial of
  (target, raw) bucket counts (``np.bincount``); partials merge
  driver-side into two length-B integer vectors — O(B) driver state,
  corpus-size independent, zero shuffle.
- Weights: ``w[f] = floor(S·ln(((t_f+1)(R+B)) / ((r_f+1)(T+B))) + 0.5)``
  — the add-one-smoothed log ratio, quantized half-up to an integer at
  scale ``S`` the same way on both engines (the ratio's numerator and
  denominator are exact integers converted to double before one ln, so
  the float value is bit-identical in numpy and DuckDB).
- Pass 2 (score): weights broadcast in the task closure; each doc's
  score is an exact int64 ``np.add.reduceat`` over its windows'
  bucket weights. Zero shuffle; text never leaves its block.

Scale shape at 100 TB: two streaming passes over the text, O(B) driver
and per-task state, no exchange at all. ``n_buckets`` trades bias for
memory exactly as in the paper (they use 10^4 hash buckets).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dsir_weights(ds, target_col: str, text_col: str = "text",
                 window: int = 4, n_buckets: int = 256,
                 scale: int = 1_000_000) -> np.ndarray:
    """Pass 1: fit the quantized log-ratio weight vector (length
    ``n_buckets``, int64) from one streaming count pass."""
    B = n_buckets

    def count_partial(t: pa.Table) -> pa.Table:
        from .text import _window_hashes

        hv, _, counts = _window_hashes(t[text_col], window)
        bk = (hv % np.uint64(B)).astype(np.int64)
        tgt = pc.fill_null(pc.cast(t[target_col], pa.bool_()), False) \
            .to_numpy(zero_copy_only=False)
        tgt_w = np.repeat(tgt, counts)
        rc = np.bincount(bk, minlength=B)
        tc = np.bincount(bk[tgt_w], minlength=B)
        return pa.table({
            "bucket": pa.array(np.arange(B, dtype=np.int64)),
            "tc": pa.array(tc.astype(np.int64)),
            "rc": pa.array(rc.astype(np.int64)),
        })

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("bucket").sum()
    tc = np.zeros(B, dtype=object)
    rc = np.zeros(B, dtype=object)
    tc[g.index.to_numpy()] = g["tc"].to_numpy()
    rc[g.index.to_numpy()] = g["rc"].to_numpy()
    T, R = int(sum(tc)), int(sum(rc))
    w = np.empty(B, dtype=np.int64)
    for f in range(B):
        num = (int(tc[f]) + 1) * (R + B)
        den = (int(rc[f]) + 1) * (T + B)
        # exact ints → double BEFORE one ln, mirroring the SQL
        # CAST(AS DOUBLE)/CAST(AS DOUBLE) → bit-identical input to libm
        w[f] = math.floor(scale * math.log(float(num) / float(den)) + 0.5)
    return w


def dsir_scores(ds, target_col: str, text_col: str = "text",
                id_col: str = "doc_id", window: int = 4,
                n_buckets: int = 256, scale: int = 1_000_000):
    """Fit weights (pass 1) then score every document (pass 2).
    Returns ``(id, n_grams, dsir_score)`` — rank or threshold
    ``dsir_score`` downstream to select the target-like subset."""
    B = n_buckets
    w = dsir_weights(ds, target_col, text_col, window, B, scale)

    def score(t: pa.Table) -> pa.Table:
        from .text import _window_hashes

        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "dsir_score": pa.array([], pa.int64())})
        hv, red_starts, counts = _window_hashes(t[text_col], window)
        wv = w[(hv % np.uint64(B)).astype(np.int64)]
        sums = np.add.reduceat(wv, red_starts)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "n_grams": pa.array(counts.astype(np.int64)),
            "dsir_score": pa.array(sums.astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")
