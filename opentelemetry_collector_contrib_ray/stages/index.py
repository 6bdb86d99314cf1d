"""Distributed inverted text index — build once, query with partition
pruning.

The build writes posting rows (term, doc_id) as Parquet Hive-partitioned
by ``bucket = hash(term) % n_buckets``; a keyword search then reads ONLY
the buckets its query terms hash to (typically a few of 64+), so query
cost is independent of corpus size in every term the query doesn't
mention. This is the shared-index pattern the brief calls out (a "shared
mutable index" is the one case for state outside the Dataset API) made
immutable-and-resumable instead: the index IS a partitioned dataset.

Scale notes: posting rows are 2 small columns (the text never leaves the
map stage); the build is one streaming pass + one partitioned write.
Search is a pruned read + one doc-hash exchange for the AND/OR
resolution (a doc's postings for the query terms can land in different
buckets, so membership counts merge on doc_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .base import pa_from_pandas


def _term_bucket(terms: np.ndarray, n_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(terms.astype("U")) % np.uint64(n_buckets)).astype(np.int64)


def build_inverted_index(ds, out_dir: str, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 64):
    """One streaming pass: per batch, distinct (term, doc) posting rows
    from whitespace tokenization, bucketed by term hash, written as
    Hive-partitioned Parquet (``bucket=N/``). Deterministic content;
    re-running overwrites per-partition files idempotently."""

    def postings(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(pc.cast(t[text_col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        df = pd.DataFrame({"term": flat[keep], id_col: ids[keep]}).drop_duplicates()
        terms = df["term"].to_numpy().astype("U")
        df["bucket"] = _term_bucket(terms, n_buckets)
        return pa_from_pandas(df)

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def search_index(out_dir: str, terms: list[str], id_col: str = "doc_id",
                 mode: str = "and", n_buckets: int = 64,
                 num_partitions: int = 16):
    """Keyword search against a built index: read ONLY the Hive
    partitions the query terms hash to (partition pruning — cost scales
    with the query, not the corpus), filter to the exact terms, and
    resolve AND/OR with a doc-hash-partitioned membership count."""
    import os

    import ray.data as rd
    from ray.data.aggregate import Sum

    import glob

    uniq = sorted(set(terms))
    buckets = sorted(set(_term_bucket(np.array(uniq, dtype="U"), n_buckets).tolist()))
    # multi-path read_parquet wants files, not dirs — enumerate the
    # pruned buckets' fragments explicitly
    paths = [f for b in buckets
             for f in sorted(glob.glob(os.path.join(out_dir, f"bucket={b}", "*.parquet")))]
    ds = rd.read_parquet(paths, columns=["term", id_col])

    tset = pa.array(uniq, pa.string())

    def member(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=tset))
        # distinct within the block; cross-block dups collapse in the merge
        df = t.to_pandas().drop_duplicates()
        g = df.groupby(id_col, as_index=False).agg(n_terms=("term", "nunique"))
        g["n_terms"] = g["n_terms"].astype("int64")
        return pa_from_pandas(g)

    counts = (
        ds.map_batches(member, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n_terms", alias_name="n_terms"))
    )
    if mode == "and":
        need = len(uniq)

        def keep_all(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["n_terms"], need)).select([id_col])

        return counts.map_batches(keep_all, batch_format="pyarrow")
    return counts.select_columns([id_col])
