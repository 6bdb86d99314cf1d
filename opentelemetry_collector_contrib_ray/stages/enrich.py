"""Stateful lookup enrichment — the k8sattributes-processor analog.

Parity: /root/reference/processor/k8sattributesprocessor/processor.go:
110-160,256-272 — a per-process metadata cache consulted per record to
attach resource attributes. Ray-native shape: a callable CLASS used as
an actor pool via ``map_batches(LookupEnricher, concurrency=N)``; the
lookup tables are built ONCE per actor in ``__init__`` (broadcast via
``ray.put`` when large), and each ``__call__`` does a fully vectorized
dictionary join (``pc.index_in`` + ``take``) — the broadcast-small-side
pattern instead of a shuffle join (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Any, Mapping

import pyarrow as pa
import pyarrow.compute as pc

from .base import norm_concurrency


class LookupEnricher:
    """Attach columns from a small key→attrs table.

    Parameters
    ----------
    key_col: input column to look up.
    table: ``{key: {out_col: value}}`` mapping, or a ``ray.ObjectRef``
        to one (resolved once per actor).
    defaults: values for keys not in the table (else null).
    """

    def __init__(
        self,
        key_col: str,
        table: Mapping[Any, Mapping[str, Any]] | "object",
        defaults: Mapping[str, Any] | None = None,
    ):
        try:
            import ray

            if isinstance(table, ray.ObjectRef):
                table = ray.get(table)
        except ImportError:  # pragma: no cover
            pass
        self.key_col = key_col
        defaults = dict(defaults or {})
        keys = list(table.keys())
        out_cols: set[str] = set(defaults)
        for v in table.values():
            out_cols.update(v)
        self.keys = pa.array([str(k) for k in keys])
        # value arrays with the default appended at index len(keys) for misses
        self.values: dict[str, pa.Array] = {}
        for c in sorted(out_cols):
            vals = [table[k].get(c, defaults.get(c)) for k in keys]
            vals.append(defaults.get(c))
            self.values[c] = pa.array(vals)
        self.miss_idx = len(keys)

    def __call__(self, t: pa.Table) -> pa.Table:
        key = t[self.key_col]
        if not pa.types.is_string(key.type):
            key = pc.cast(key, pa.string())
        idx = pc.index_in(key, value_set=self.keys)
        idx = pc.fill_null(idx, self.miss_idx)
        for c, vals in self.values.items():
            arr = vals.take(idx)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if c in t.column_names:
                t = t.set_column(t.column_names.index(c), c, arr)
            else:
                t = t.append_column(c, arr)
        return t


def enrich(ds, key_col: str, table, defaults=None, concurrency: int = 4,
           batch_size: int = 32_768, num_cpus: float = 1):
    """Attach a LookupEnricher actor pool to a Dataset."""
    return ds.map_batches(
        LookupEnricher,
        fn_constructor_kwargs={"key_col": key_col, "table": table, "defaults": defaults},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=norm_concurrency(concurrency),
        num_cpus=num_cpus,
    )


class LongestPrefixRouter:
    """Longest-prefix-match enrichment — the hierarchical cousin of the
    flat dictionary join above (IP-prefix / URL-path routing-table
    shape; same broadcast-small-side discipline as LookupEnricher).

    ``table``: {prefix: label}.  Each row's key column is matched
    against the LONGEST prefix that is a string prefix of it
    (``starts_with`` semantics).  Vectorized as one pass PER DISTINCT
    PREFIX LENGTH, descending: slice every still-unmatched key to that
    length and dictionary-join the slice against that length's prefix
    set — O(#distinct lengths) arrow kernels per batch, never per-row
    Python.  The table ships in the task closure (tiny) or via
    ``ray.put`` when large.
    """

    def __init__(self, key_col: str, table: Mapping[str, str],
                 out_col: str = "route", default: str = "unmatched"):
        self.key_col, self.out_col, self.default = key_col, out_col, default
        by_len: dict[int, dict[str, str]] = {}
        for p, label in table.items():
            by_len.setdefault(len(p), {})[p] = label
        # longest first: first match wins ⇒ longest-prefix semantics
        self.levels = sorted(by_len.items(), key=lambda kv: -kv[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        keys = pc.cast(t[self.key_col], pa.string())
        out = np.full(t.num_rows, self.default, dtype=object)
        unmatched = np.ones(t.num_rows, dtype=bool)
        for length, entries in self.levels:
            if not unmatched.any():
                break
            sliced = pc.utf8_slice_codeunits(keys, 0, length)
            mapped = pd.Series(
                sliced.to_pandas().astype(object)).map(entries)
            hit = mapped.notna().to_numpy() & unmatched
            out[hit] = mapped.to_numpy(dtype=object)[hit]
            unmatched &= ~hit
        return t.append_column(self.out_col, pa.array(out, pa.string()))


class RangeLookupEnricher:
    """Numeric range→label lookup — the geoip-processor / stanza
    ``ip_resolver`` analog (SURVEY §2.8): a FIXED-SIZE table of sorted,
    non-overlapping ``[start, end)`` ranges (a GeoIP block DB is a few
    million rows at ANY corpus scale) maps a numeric column (an IPv4 as
    uint32, a port, an id band) to a label.

    Ray-native shape: the range arrays ship ONCE per actor
    (``ray.ObjectRef`` resolved in ``__init__``, or directly in the
    task closure for tiny tables); each ``__call__`` is one
    ``np.searchsorted`` + one bound check per batch — broadcast lookup,
    never a shuffle, exactly like ``LookupEnricher`` but over ranges
    instead of keys.

    ``ranges``: ``(starts, ends, labels)`` — int64 arrays sorted by
    start, labels a list/array of strings — or an ObjectRef to that
    tuple.
    """

    def __init__(self, value_col: str, ranges, out_col: str = "label",
                 default: str = "unknown"):
        import ray

        if hasattr(ranges, "hex"):  # ObjectRef duck-check
            ranges = ray.get(ranges)
        starts, ends, labels = ranges
        import numpy as np

        self.starts = np.asarray(starts, dtype=np.int64)
        self.ends = np.asarray(ends, dtype=np.int64)
        self.labels = np.asarray(labels, dtype=object)
        if np.any(self.starts[1:] < self.ends[:-1]):
            raise ValueError("ranges must be sorted and non-overlapping")
        self.value_col = value_col
        self.out_col = out_col
        self.default = default

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        v = pc.cast(t[self.value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(self.starts) == 0:
            lab = np.full(t.num_rows, self.default, dtype=object)
        else:
            pos = np.searchsorted(self.starts, v, side="right") - 1
            safe = np.maximum(pos, 0)
            hit = (pos >= 0) & (v < self.ends[safe])
            lab = np.where(hit, self.labels[safe], self.default)
        return t.append_column(self.out_col,
                               pa.array(lab.astype(object), pa.string()))


def range_lookup(ds, value_col: str, starts, ends, labels,
                 out_col: str = "label", default: str = "unknown",
                 concurrency=(2, 8)):
    """Apply :class:`RangeLookupEnricher` as an actor-pool stage; the
    range table broadcasts once via ``ray.put``."""
    import ray

    ref = ray.put((starts, ends, labels))
    return ds.map_batches(
        RangeLookupEnricher,
        fn_constructor_kwargs={"value_col": value_col, "ranges": ref,
                               "out_col": out_col, "default": default},
        batch_format="pyarrow",
        concurrency=norm_concurrency(concurrency),
    )
