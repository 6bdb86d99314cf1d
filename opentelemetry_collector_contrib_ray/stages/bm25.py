"""BM25 scored retrieval (Robertson–Spärck Jones / Okapi BM25, public
algorithm) — the ranking layer over the inverted-index machinery
(stages/index.py): score docs for a query term set and return the
global top-k.

Integer-exactness discipline (the repo's oracle convention):

- ``k1 = 6/5, b = 3/4`` cross-multiplied so the tf normalization is ONE
  exact integer ratio::

      tf_norm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
              = 44·D·tf / (20·D·tf + 6·D + 18·dl·N)      (D = Σdl)

  quantized ``(S2·num) // den`` — HUGEINT-reproducible in SQL.
- IDF uses the DSIR recipe (stages/dsir.py): exact integers
  ``(2N−2df+1) / (2df+1)`` converted to double before ONE ``ln``, then
  half-up quantized — both engines evaluate the identical double
  expression.  Negative IDF (df > N/2) flows through as a negative
  integer.

Scale shape: pass 1 builds the document-frequency table with one
word-hash exchange (per-block distinct (doc, word) combiner first);
query-term selection is a bounded top-n; pass 2 re-derives per-doc term
stats block-locally (docs are rows, so a doc never spans blocks),
scores against the 3-row closure-shipped IDF dict, and feeds the
block-local top-k combiner — no corpus-scale exchange at all in the
scoring pass.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .base import pa_from_pandas

S1 = 1_000_000      # IDF quantization
S2 = 10_000         # tf-normalization quantization


def _block_words(t: pa.Table, text_col: str, id_col: str):
    """(doc_id, word) exploded rows + per-doc length — block-local
    (each document is one row, so its stats never span blocks)."""
    c = pc.utf8_lower(pc.replace_substring_regex(
        pc.fill_null(pc.cast(t[text_col], pa.string()), ""),
        "[^A-Za-z]+", " "))
    segs = pc.split_pattern(c, " ")
    if isinstance(segs, pa.ChunkedArray):
        segs = segs.combine_chunks()
    offsets = np.asarray(segs.offsets, dtype=np.int64)
    flat = segs.flatten().to_numpy(zero_copy_only=False)
    ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    d = np.repeat(ids, offsets[1:] - offsets[:-1])
    keep = flat != ""
    return pd.DataFrame({"d": d[keep], "w": flat[keep]})


def doc_freq(docs, text_col: str = "text", id_col: str = "doc_id",
             num_partitions: int = 64):
    """(word, df) — one word-hash exchange over per-block distinct
    (doc, word) indicator partials."""
    from .agg import hash_groupby_sum

    def partial(t: pa.Table) -> pa.Table:
        dw = _block_words(t, text_col, id_col).drop_duplicates()
        out = dw.groupby("w", as_index=False).size() \
            .rename(columns={"size": "df"})
        return pa_from_pandas(out)

    return hash_groupby_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["w"], "df", out_col="df", num_partitions=num_partitions)


def idf_int(n_docs: int, df: int) -> int:
    """DSIR-style quantized BM25 IDF (exact ints → one double ln)."""
    return math.floor(
        S1 * math.log((2 * n_docs - 2 * df + 1) / (2 * df + 1)) + 0.5)


def bm25_topk(docs, qterms: dict[str, int], n_docs: int, total_dl: int,
              k: int = 10, text_col: str = "text",
              id_col: str = "doc_id"):
    """Top-k docs for the query ``{term: quantized_idf}`` — one
    scoring pass, block-local top-k combiner, no corpus exchange."""
    from .agg import topn_per_group

    terms = dict(qterms)
    D, N = int(total_dl), int(n_docs)

    def score(t: pa.Table) -> pa.Table:
        dw = _block_words(t, text_col, id_col)
        if not len(dw):
            return pa.table({"g": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        dl = dw.groupby("d", sort=False)["w"].transform("size") \
            .to_numpy(np.int64)
        dw = dw.assign(dl=dl)
        hit = dw[dw.w.isin(terms)]
        if not len(hit):
            return pa.table({"g": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        g = hit.groupby(["d", "w"], as_index=False) \
            .agg(tf=("w", "size"), dl=("dl", "first"))
        tf = g.tf.to_numpy(np.int64)
        dlv = g.dl.to_numpy(np.int64)
        num = S2 * 44 * D * tf
        den = 20 * D * tf + 6 * D + 18 * dlv * N
        tfq = num // den
        idf = g.w.map(terms).to_numpy(np.int64)
        g = g.assign(contrib=idf * tfq)
        sc = g.groupby("d", as_index=False)["contrib"].sum() \
            .rename(columns={"d": "doc_id", "contrib": "score"})
        sc["g"] = np.int64(0)
        return pa_from_pandas(sc[["g", "doc_id", "score"]])

    out = topn_per_group(docs.map_batches(score, batch_format="pyarrow"),
                         ["g"], "score", k, tie_cols=["doc_id"],
                         descending=True, compact=True)
    return out.map_batches(
        lambda t: t.select(["doc_id", "score", "rank"]),
        batch_format="pyarrow")
