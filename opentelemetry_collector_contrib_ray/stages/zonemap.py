"""Zone maps (per-partition min/max statistics) and predicate-driven
pruned reads — the data-layout machinery that makes "prune at the read"
work for a 100 TB corpus: write once partitioned by a layout key, keep
an O(partitions) stats table, and answer range predicates by scanning
only the partitions whose [min, max] envelope intersects the predicate.

This is the batch-engine analog of Parquet row-group statistics lifted
to the partition level (and of the reference's grouping file exporter's
one-directory-per-key layout, exporter/fileexporter — here the layout
additionally carries queryable stats).

Scale shape: the stats pass is partial+final grouped min/max/count —
one tiny (key × columns) row per block leaves each map task, the final
reduce is a single bounded block.  Pruning is a driver-side filter over
the O(partitions) stats table; the pruned read lists only the surviving
``key=value`` directories, so query cost tracks the selectivity of the
predicate, not the corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def zone_stats(ds, key: str, cols: list[str]):
    """Per-``key`` zone map: min/max of every column in ``cols`` plus a
    row count.  Partial per-block arrow group_by → one bounded final
    reduce (compact partial+final, no shuffle-aggregate)."""
    aggs = [(c, "min") for c in cols] + [(c, "max") for c in cols]

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by([key]).aggregate(aggs + [([], "count_all")])

    def final(t: pa.Table) -> pa.Table:
        out = t.group_by([key]).aggregate(
            [(f"{c}_min", "min") for c in cols]
            + [(f"{c}_max", "max") for c in cols]
            + [("count_all", "sum")])
        ren = {f"{c}_min_min": f"{c}_min" for c in cols}
        ren.update({f"{c}_max_max": f"{c}_max" for c in cols})
        ren["count_all_sum"] = "n_rows"
        return out.rename_columns([ren.get(c, c) for c in out.column_names])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(1)
              .map_batches(final, batch_format="pyarrow"))


def collect_stats(ds, key: str, cols: list[str]) -> pa.Table:
    """Materialize the zone map driver-side (O(partitions) rows)."""
    stats = zone_stats(ds, key, cols).materialize()
    return pa.concat_tables(list(stats.iter_batches(batch_format="pyarrow")))


def prune_keys(stats: pa.Table, key: str,
               ranges: dict[str, tuple]) -> list:
    """Partition keys whose zone envelopes intersect every predicate.

    ``ranges``: {col: (lo, hi)} — keep partitions where
    ``col_max >= lo AND col_min < hi`` (half-open [lo, hi); pass None
    to leave a side unbounded).  The key column itself may be used
    when the layout key is the predicate column.
    """
    mask = pa.array([True] * stats.num_rows)
    for col, (lo, hi) in ranges.items():
        mx = stats[f"{col}_max"] if f"{col}_max" in stats.column_names \
            else stats[key]
        mn = stats[f"{col}_min"] if f"{col}_min" in stats.column_names \
            else stats[key]
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(mx, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less(mn, hi))
    return pc.filter(stats[key], mask).to_pylist()


def zorder_key(x, y, bits: int = 8):
    """Morton/Z-order interleave of two ``bits``-bit dimensions
    (numpy int64 arrays or arrow columns) — the multidimensional
    clustering key: sorting/bucketing by z keeps BOTH dimensions
    range-bounded inside every bucket, so zone maps prune on either
    predicate column.  Pure bit arithmetic, so the identical 2·bits-term
    expression runs in SQL."""
    xv = x.to_numpy(zero_copy_only=False) if hasattr(x, "to_numpy") else x
    yv = y.to_numpy(zero_copy_only=False) if hasattr(y, "to_numpy") else y
    xv = xv.astype(np.int64) & ((1 << bits) - 1)
    yv = yv.astype(np.int64) & ((1 << bits) - 1)
    z = np.zeros(len(xv), dtype=np.int64)
    for b in range(bits):
        z |= ((xv >> b) & 1) << (2 * b + 1)
        z |= ((yv >> b) & 1) << (2 * b)
    return z


def zorder_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """The SQL twin of :func:`zorder_key` (one flat bit-term sum)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"((({y_expr}) >> {b}) & 1) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def pruned_paths(root: str, key: str, keys: list) -> list[str]:
    """Hive directory layout → the parquet files of surviving keys
    (explicit file globs: Ray's multi-path read_parquet wants files,
    not directories)."""
    import glob
    import os

    files: list[str] = []
    for k in keys:
        files.extend(sorted(glob.glob(
            os.path.join(root, f"{key}={k}", "*.parquet"))))
    return files
