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


def build_positional_index(ds, out_dir: str, text_col: str = "text",
                           id_col: str = "doc_id", n_buckets: int = 64):
    """Positional postings (term, doc, pos) — the phrase-query index.
    Same one-streaming-pass Hive-bucketed build as the boolean index;
    positions are 0-based offsets into the whitespace token list, so a
    posting row is ~3 small columns and the text never leaves the map
    stage. (term, doc, pos) is unique by construction — no dedup."""

    def postings(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.fill_null(pc.cast(t[text_col], pa.string()), "")),
            r"\s+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(len(flat), dtype=np.int64) - starts
        keep = flat != ""
        df = pd.DataFrame({"term": flat[keep], id_col: ids[keep],
                           "pos": pos[keep]})
        df["bucket"] = _term_bucket(df["term"].to_numpy().astype("U"),
                                    n_buckets)
        return pa_from_pandas(df)

    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def phrase_search(out_dir: str, phrase: list[str], id_col: str = "doc_id",
                  n_buckets: int = 64):
    """Exact phrase query against a positional index: read ONLY the
    buckets the phrase's distinct terms hash to, turn every posting of
    slot-j's term into an (doc, anchor = pos − j, slot) vote, and a doc
    matches when some anchor collects ALL k slots. Postings are unique,
    so the slot count per (doc, anchor) equals the number of satisfied
    slots — one compact (doc, anchor) exchange resolves it; repeated
    phrase terms ('batch batch') just vote the same postings into two
    slots. Query cost scales with the phrase's term postings, never the
    corpus."""
    import glob
    import os

    import ray.data as rd

    from .agg import hash_groupby_sum

    k = len(phrase)
    uniq = sorted(set(phrase))
    buckets = sorted(set(
        _term_bucket(np.array(uniq, dtype="U"), n_buckets).tolist()))
    paths = [f for b in buckets
             for f in sorted(glob.glob(
                 os.path.join(out_dir, f"bucket={b}", "*.parquet")))]
    ds = rd.read_parquet(paths, columns=["term", id_col, "pos"])

    slots: dict[str, list[int]] = {}
    for j, term in enumerate(phrase):
        slots.setdefault(term, []).append(j)
    tset = pa.array(uniq, pa.string())

    def anchors(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["term"], value_set=tset))
        df = t.to_pandas()
        outs = []
        for term, js in slots.items():
            sub = df[df["term"] == term]
            for j in js:
                outs.append(pd.DataFrame({
                    id_col: sub[id_col].to_numpy(),
                    "anchor": sub["pos"].to_numpy() - j,
                    "one": np.ones(len(sub), np.int64)}))
        out = (pd.concat(outs) if outs else
               pd.DataFrame({id_col: [], "anchor": [], "one": []}))
        out = out[out["anchor"] >= 0]
        return pa_from_pandas(out.astype({id_col: "int64",
                                          "anchor": "int64",
                                          "one": "int64"}))

    per_anchor = hash_groupby_sum(
        ds.map_batches(anchors, batch_format="pyarrow"),
        [id_col, "anchor"], "one", out_col="nslots")

    def hit_docs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["nslots"], k))
        df = t.to_pandas()[[id_col]].drop_duplicates()
        df["one"] = np.ones(len(df), np.int64)
        return pa_from_pandas(df)

    docs = hash_groupby_sum(
        per_anchor.map_batches(hit_docs, batch_format="pyarrow"),
        [id_col], "one", out_col="n_anchors_parts")
    return docs.map_batches(lambda t: t.select([id_col]),
                            batch_format="pyarrow")
