"""2-D skyline (Pareto frontier) over a distributed table.

A row survives iff NO other row weakly dominates it: ``b`` dominates
``a`` when ``b.x >= a.x`` and ``b.y >= a.y`` with at least one strict
inequality (classic Börzsönyi/Kossmann/Stocker skyline semantics;
duplicate (x, y) points do not dominate each other, so every copy of a
frontier point survives).

Scale shape — local-then-merge, NO shuffle of the raw table:

1. each block computes its LOCAL skyline with an O(n log n) vectorized
   kernel (sort by x desc / y desc, survivors are the per-x max-y rows
   whose y strictly exceeds the running max over strictly-larger x);
2. the surviving candidates (≤ Σ per-block frontier sizes, typically
   tiny vs the input) gather into ONE task that runs the same kernel
   once more.

Why the merge is exact: a global skyline point is undominated anywhere,
hence undominated in its own block, hence a candidate — and every
globally dominated candidate is dominated by SOME global skyline point
(strict dominance is acyclic, so follow dominators to a maximal one),
which is itself a candidate; the final pass therefore removes exactly
the dominated candidates.  Partitioning assumption: the candidate union
fits one task — per-block frontiers are O(sqrt) of uniformly random
blocks in expectation; a pathological all-frontier input (perfectly
anti-correlated, fully distinct) degrades to one task holding the
output, which IS the result anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean survivor mask for the weak-dominance 2-D skyline."""
    n = x.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))            # x desc, then y desc
    xs, ys = x[order], y[order]
    new_x = np.empty(n, dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    # per-x-group max y = y of the group's first row (y desc inside x)
    grp = np.cumsum(new_x) - 1
    gmax = ys[new_x][grp]
    # running max of group-max over STRICTLY larger x groups (exclusive)
    gm = ys[new_x]
    run = np.empty(gm.size, dtype=np.int64)
    run[0] = np.iinfo(np.int64).min
    if gm.size > 1:
        run[1:] = np.maximum.accumulate(gm[:-1])
    keep_sorted = (ys == gmax) & (gmax > run[grp])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def pareto_front(ds, x_col: str, y_col: str):
    """Distributed 2-D max-skyline: keeps every input column of the
    surviving rows. ``x_col``/``y_col`` must be integer-valued."""

    def local(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_local_skyline_mask(x, y)))

    candidates = ds.map_batches(local, batch_format="pyarrow")
    # ONE final task over the (small) candidate union — same kernel
    return candidates.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None)
