"""Benchmark decontamination — drop/flag training documents that share
word n-grams with an evaluation/benchmark set (the standard
train-test-overlap guard in LLM data pipelines; public practice per
GPT-3 §C / PaLM app. / Dolma — n-gram collision against held-out sets).

The reference engine has no such stage; this is one of the brief's
first-class training-data-pipeline operations.

Shape for 100 TB: the benchmark side is tiny (eval sets are MBs), so
its distinct n-gram set is collected ONCE on the driver and broadcast
with ``ray.put``; the training corpus then streams through one
``map_batches`` doing a vectorized ``pc.is_in`` membership test —
zero shuffles, text never leaves its block. Gram construction is the
same whole-batch token machinery as ``ShingleRows``
(one split kernel, ``np.char`` joins, boundary-masked), with REAL gram
strings (not hashes) so membership is exact and the SQL twin matches
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _word_ngrams(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Batch string column → (doc_index, gram_string) occurrence rows,
    grams never crossing document boundaries."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(pc.cast(col, pa.string()), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(filled), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    counts = offsets[1:] - offsets[:-1]
    tok_np = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
    m = len(tok_np)
    if m < n:
        return (np.array([], dtype=np.int64),
                np.array([], dtype="U1"))
    parts = tok_np[: m - n + 1].copy()
    for j in range(1, n):
        parts = np.char.add(np.char.add(parts, " "), tok_np[j: m - n + 1 + j])
    doc_of = np.repeat(np.arange(len(counts)), counts)
    head = doc_of[: m - n + 1]
    valid = head == doc_of[n - 1:]
    return head[valid], parts[valid]


def collect_benchmark_ngrams(bench_ds, n: int = 3, col: str = "text") -> pa.Array:
    """Distinct word n-grams of the (small) benchmark set, as one
    driver-side string array ready for ``ray.put``. Benchmark sets are
    eval corpora — MBs, not TBs — so a driver collect is the right
    call; the distinct-per-batch combiner keeps the transfer minimal."""
    def grams(t: pa.Table) -> pa.Table:
        _, g = _word_ngrams(t[col], n)
        return pa.table({"gram": pa.array(np.unique(g).astype(object),
                                          type=pa.string())})

    parts = bench_ds.map_batches(grams, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "gram" not in parts.columns:
        return pa.array([], type=pa.string())
    return pa.array(np.unique(parts["gram"].to_numpy()).astype(object),
                    type=pa.string())


def decontaminate(train_ds, bench_grams, n: int = 3, col: str = "text",
                  min_hits: int = 1, out_hits: str = "n_bad",
                  out_flag: str = "contaminated"):
    """Tag each training doc with the number of DISTINCT n-grams it
    shares with the benchmark set and a contamination flag
    (``n_bad >= min_hits``). ``bench_grams`` is a ``pa.Array`` of gram
    strings or a ``ray.ObjectRef`` to one."""
    import ray

    ref = bench_grams if isinstance(bench_grams, ray.ObjectRef) \
        else ray.put(bench_grams)

    def tag(t: pa.Table) -> pa.Table:
        grams_set = ray.get(ref)
        doc_idx, grams = _word_ngrams(t[col], n)
        nrows = t.num_rows
        if len(grams) == 0 or len(grams_set) == 0:
            n_bad = np.zeros(nrows, dtype=np.int64)
        else:
            hit = pc.is_in(pa.array(grams.astype(object), type=pa.string()),
                           value_set=grams_set).to_numpy(zero_copy_only=False)
            # distinct (doc, gram) among the (rare) hits only
            uniq = pd.DataFrame({
                "d": doc_idx[hit], "g": grams[hit],
            }).drop_duplicates()
            n_bad = np.bincount(uniq["d"].to_numpy(), minlength=nrows
                                ).astype(np.int64)
        t = t.append_column(out_hits, pa.array(n_bad))
        return t.append_column(out_flag, pa.array(n_bad >= min_hits))

    return train_ds.map_batches(tag, batch_format="pyarrow")
