"""Recombine — stateful multiline/turn join as a grouped shuffle.

Parity: /root/reference/pkg/stanza/operator/transformer/recombine/
transformer.go:95-189 — group consecutive entries per
``source_identifier``, join ``combine_field`` with ``combine_with``,
flush on ``max_batch_size`` overflow, base entry = oldest/newest
(``overwrite_with``, flush at 206-227).

Batch-engine rendering (SURVEY.md §2.10): wall-clock flush timers
(``force_flush_period``) become flush-at-group-end; "consecutive
buffer" state becomes a ``groupby(source).map_groups`` hash shuffle
with an in-group sort — the Ray-idiomatic replacement for the
mutex-guarded batchMap (transformer.go:38-51). Hot sources (Zipf
conv_ids) are bounded by ``max_batch_size`` chunking, the reference's
own overflow valve (transformer.go:182-188).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .base import arrow_out


def recombine(
    ds,
    source_col: str = "conv_id",
    order_col: str = "turn_idx",
    combine_col: str = "text",
    combine_with: str = "\n",
    max_batch_size: int | None = None,
    max_log_size: int | None = None,
    overwrite_with: str = "oldest",
    is_first_entry: str | None = None,
    is_last_entry: str | None = None,
):
    """One output row per (source, chunk): the joined ``combine_col`` plus
    the base row's other fields, and ``n_combined``.

    ``is_first_entry``: optional pandas-eval boolean expression over the
    group (e.g. ``"role == 'user'"``) that starts a new chunk at each
    matching row — the reference's start-pattern mode
    (recombine/config.go:49-62). ``is_last_entry`` (mutually exclusive,
    same as the reference's Build validation): the END-pattern mode —
    a matching row flushes the batch INCLUDING itself (matched-line
    flush, transformer.go:95-189), the usual shape for stack-trace
    joining anchored on the final line. Without either (and without
    ``max_batch_size``) a whole source joins to one row.
    """
    if is_first_entry and is_last_entry:
        raise ValueError("only one of is_first_entry and is_last_entry can be set")

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    num_partitions = 64

    # Hot-key bound (SURVEY §7.4 skew): with max_batch_size and an integer
    # order column, pre-chunk the SHUFFLE KEY itself — groups become
    # (source, order // max_batch_size), so a conversation holding 5% of a
    # 100 TB stream never has to fit one worker; chunk boundaries coincide
    # with the reference's overflow flush (transformer.go:182-188).
    prechunk = bool(max_batch_size) and isinstance(order_col, str)
    group_keys = [source_col, "__ck"] if prechunk else [source_col]

    def add_chunk_key(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        ck = pc.cast(
            pc.floor(pc.divide(pc.cast(t[order_col], pa.float64()), max_batch_size)),
            pa.int64(),
        )
        return t.append_column("__ck", ck)

    # One hash partition holds MANY whole (source[, order-chunk]) groups;
    # boundaries are computed in a single vectorized pass over the sorted
    # partition — no Ray-level call per source.
    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(group_keys + order_cols, kind="mergesort")
        kv = [g[k].to_numpy() for k in group_keys]
        new_src = np.ones(len(g), dtype=bool)
        new_src[1:] = False
        for col in kv:
            new_src[1:] |= col[1:] != col[:-1]
        if is_first_entry:
            starts = g.eval(is_first_entry).to_numpy(dtype=bool) | new_src
        elif is_last_entry:
            # end-pattern: boundary AFTER each matching row, which stays
            # in the chunk it closes (matched-line flush)
            ends = g.eval(is_last_entry).to_numpy(dtype=bool)
            starts = new_src.copy()
            starts[1:] |= ends[:-1]
        elif max_batch_size:
            # position within the source modulo the cap
            idx = np.arange(len(g))
            src_start = np.maximum.accumulate(np.where(new_src, idx, 0))
            starts = new_src | (((idx - src_start) % max_batch_size) == 0)
        elif max_log_size:
            lens = g[combine_col].astype(str).str.len().to_numpy() + len(combine_with)
            starts = new_src.copy()
            acc = 0
            for i in range(len(g)):  # size valve: inherently sequential
                if starts[i]:
                    acc = 0
                elif acc + lens[i] > max_log_size and acc > 0:
                    starts[i] = True
                    acc = 0
                acc += lens[i]
        else:
            starts = new_src
        chunk = np.cumsum(starts) - 1
        g = g.assign(__chunk=chunk)
        base_pick = "first" if overwrite_with == "oldest" else "last"
        agg = {
            c: base_pick
            for c in g.columns
            if c not in (combine_col, "__chunk", "__p", "__ck")
        }
        agg[combine_col] = lambda s: combine_with.join(s.astype(str))
        out = g.groupby("__chunk", sort=True).agg(agg)
        out["n_combined"] = g.groupby("__chunk", sort=True).size()
        return out.reset_index(drop=True)

    from .joins import _add_part

    if prechunk:
        ds = ds.map_batches(add_chunk_key, batch_format="pyarrow")
    keyed = ds.map_batches(_add_part(group_keys, num_partitions), batch_format="pyarrow")
    return keyed.groupby("__p").map_groups(arrow_out(join_partition), batch_format="pandas")
