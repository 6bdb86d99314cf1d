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


def compact_by_range(ds, root: str, bucket_col: str, sort_cols: list[str],
                     drop_bucket: bool = False):
    """Small-file compaction: coalesce a many-small-files dataset into
    EXACTLY ONE sorted parquet file per range bucket — the maintenance
    op every long-lived 100 TB table needs (streaming ingest produces
    file counts proportional to task counts; reads want few large
    sorted files so row-group stats and zone maps prune).

    One group exchange on ``bucket_col``; each group task sorts its
    bucket and writes ``<root>/<bucket_col>=<v>/part.parquet`` via
    temp + atomic rename (idempotent — re-running a failed compaction
    overwrites cleanly).  Returns the list of written bucket values.
    Buckets must each fit a worker (pick range boundaries accordingly);
    a giant bucket would shard into part-N files instead.
    """
    import os

    import pyarrow.parquet as pq

    def write_one(t: pa.Table) -> pa.Table:
        b = t[bucket_col][0].as_py()
        idx = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in sort_cols])
        out = t.take(idx)
        if drop_bucket:
            out = out.drop_columns([bucket_col])
        d = os.path.join(root, f"{bucket_col}={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "part.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(d, "part.parquet"))
        return pa.table({bucket_col: pa.array([b], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    written = ds.groupby(bucket_col).map_groups(
        write_one, batch_format="pyarrow").materialize()
    out = pa.concat_tables(list(written.iter_batches(
        batch_format="pyarrow")))
    return sorted(out[bucket_col].to_pylist())


KNUTH = np.uint64(2654435761)
_RING = np.uint64(1) << np.uint64(32)


def _bloom_hash(ids: np.ndarray, j: int, m: int, salt: int) -> np.ndarray:
    """j-th bloom hash: Knuth multiplicative over a salted shift —
    pure integer ring arithmetic, so the identical expression runs in
    SQL (HUGEINT % 2^32 % m) and even the index's FALSE POSITIVES are
    reproducible across engines."""
    return (((ids.astype(np.uint64) + np.uint64(j * salt)) * KNUTH)
            % _RING % np.uint64(m)).astype(np.int64)


def bloom_index(ds, bucket_col: str, key_col: str, m: int = 4096,
                k: int = 3, salt: int = 1_000_003):
    """Per-bucket bloom index over ``key_col`` for point-lookup file
    skipping: the index is the DISTINCT (bucket, j, bit) row set —
    O(buckets × k × min(keys, m)) rows total regardless of corpus
    size. Per-block distinct partials → one compact exchange."""
    from .agg import compact_groupby

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        bks = pc.cast(t[bucket_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        outs = []
        for j in range(k):
            bit = _bloom_hash(ids, j, m, salt)
            packed = bks * (m * k) + j * m + bit
            outs.append(np.unique(packed))
        u = np.unique(np.concatenate(outs)) if outs else \
            np.empty(0, np.int64)
        return pa.table({
            "bucket": pa.array(u // (m * k), pa.int64()),
            "j": pa.array((u % (m * k)) // m, pa.int64()),
            "bit": pa.array(u % m, pa.int64())})

    # count_alias collapses duplicates across blocks; the count itself
    # is discarded — the index is the key set
    idx = compact_groupby(ds.map_batches(partial, batch_format="pyarrow"),
                          ["bucket", "j", "bit"], count_alias="__c")
    return idx.map_batches(
        lambda t: t.select(["bucket", "j", "bit"]),
        batch_format="pyarrow")


def bloom_probe(index: pa.Table, probes: list[int], m: int = 4096,
                k: int = 3, salt: int = 1_000_003) -> dict[int, list]:
    """probe id → buckets whose bloom has ALL k bits set (may include
    false positives — deterministically, matching the SQL twin)."""
    import collections

    have = collections.defaultdict(set)
    for b, j, bit in zip(index["bucket"].to_pylist(),
                         index["j"].to_pylist(),
                         index["bit"].to_pylist()):
        have[b].add((j, bit))
    out = {}
    for u in probes:
        bits = [(j, int(_bloom_hash(np.array([u]), j, m, salt)[0]))
                for j in range(k)]
        out[u] = sorted(b for b, s in have.items()
                        if all(x in s for x in bits))
    return out


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
