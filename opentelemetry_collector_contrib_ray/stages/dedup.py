"""Deduplication family for large-scale training-data pipelines.

Beyond reference parity (the reference dedups only file fingerprints,
pkg/stanza/fileconsumer/internal/fingerprint — record-level dedup is a
required capability of this engine per the build brief):

- exact:      content hash → hash-partitioned groupby → first per group
- minhash:    shingle → minhash → LSH bands → bucket groupby → candidate
              pairs → Jaccard verify (classic MinHash-LSH, Broder '97)
- simhash:    64-bit simhash (Charikar '02) + hamming-ball bucketing
- ngram:      exact n-gram Jaccard on candidate pairs
- embedding:  cosine near-dup over an embedding column (see similarity)

Scale notes: every variant pre-reduces inside ``map_batches`` before
its one ``groupby`` shuffle; minhash signatures are fixed-width numpy
matrices (vectorized, no per-row hashing loops over shingles beyond a
single pass); band buckets are int64 keys so the shuffle moves small
columns, never the documents themselves (doc text stays behind — only
(band, bucket, doc_id) rows shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .base import norm_concurrency
import pyarrow.compute as pc

# ------------------------------------------------------------- exact dedup


def add_content_hash(t: pa.Table, col: str = "text", out: str = "__hash") -> pa.Table:
    """Vectorized 64-bit content hash column."""
    h = pd.util.hash_array(t[col].to_numpy(zero_copy_only=False).astype("U"))
    return t.append_column(out, pa.array(h.view(np.int64)))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content value.

    hash-partition + per-group first (the brief's required shape): the
    groupby key is the 64-bit content hash (cheap to shuffle); ties on
    hash are resolved by comparing the actual value inside the group.
    """

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([col, id_col], kind="mergesort").groupby(col, sort=False).head(1)

    return (
        ds.map_batches(lambda t: add_content_hash(t, col), batch_format="pyarrow")
        .groupby("__hash")
        .map_groups(first_per_group, batch_format="pandas")
        .drop_columns(["__hash"])
    )


# ------------------------------------------------------------- minhash LSH

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Per-actor state: the permutation parameters (built once)."""

    def __init__(self, num_perm: int = 64, shingle: int = 3, seed: int = 7,
                 col: str = "text", id_col: str = "doc_id"):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle
        self.col = col
        self.id_col = id_col

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        if len(toks) < self.shingle:
            toks = toks + [""] * (self.shingle - len(toks))
        sh = [" ".join(toks[i : i + self.shingle]) for i in range(len(toks) - self.shingle + 1)]
        return pd.util.hash_array(np.array(sh, dtype="U")).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sv = self.shingles(text) % _MERSENNE
        # (num_perm, n_shingles) universal hash, min over shingles
        with np.errstate(over="ignore"):
            m = (np.outer(self.a, sv) + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.col].to_pylist()
        sigs = np.stack([self.signature(x or "") for x in texts])
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "__sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm
                ),
            }
        )


def minhash_bands(t: pa.Table, bands: int, rows: int, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band, bucket, id) rows — the only data that
    shuffles."""
    sig = np.asarray(t["__sig"].combine_chunks().flatten()).view(np.uint64).reshape(
        t.num_rows, bands * rows
    )
    ids = t[id_col].to_numpy(zero_copy_only=False)
    out_band, out_bucket, out_id = [], [], []
    for b in range(bands):
        chunk = sig[:, b * rows : (b + 1) * rows]
        bucket = pd.util.hash_array(
            np.ascontiguousarray(chunk).view([("", np.uint64)] * rows).ravel()
        ).view(np.int64)
        out_band.append(np.full(t.num_rows, b, dtype=np.int32))
        out_bucket.append(bucket)
        out_id.append(ids)
    return pa.table(
        {
            "band": pa.array(np.concatenate(out_band)),
            "bucket": pa.array(np.concatenate(out_bucket)),
            id_col: pa.array(np.concatenate(out_id)),
        }
    )


def minhash_candidate_pairs(ds, num_perm: int = 64, bands: int = 16, shingle: int = 3,
                            col: str = "text", id_col: str = "doc_id",
                            concurrency: int = 4, max_bucket: int = 200):
    """Dataset → candidate near-dup id pairs via MinHash-LSH.

    Stages: signature (actor pool) → band explode → groupby(band,bucket)
    → pairs within bucket (capped at ``max_bucket`` ids per bucket — a
    skew valve; overflowing buckets are near-identical spam anyway, we
    keep the first ``max_bucket`` by id for determinism and log the cap
    via the ``capped`` column).
    """
    rows = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm, "shingle": shingle, "col": col, "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=norm_concurrency(concurrency),
    )
    bands_ds = sigs.map_batches(
        lambda t: minhash_bands(t, bands, rows, id_col), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        capped = len(ids) > max_bucket
        ids = ids[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "capped": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "capped": bool}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "capped": capped})

    cand = bands_ds.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")
    # dedup pairs found in multiple bands
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Word n-gram Jaccard similarity (verification step)."""

    def grams(s):
        toks = s.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / len(ga | gb)


def verify_pairs_jaccard(pairs_ds, docs_by_id_ref, threshold: float = 0.8,
                         n: int = 3, concurrency: int = 2):
    """Verify candidate pairs with exact n-gram Jaccard. ``docs_by_id_ref``
    = ``ray.put({id: text})`` broadcast of the (small) candidate corpus —
    at 100 TB you'd instead re-join text by id; candidates are rare."""

    class Verify:
        def __init__(self):
            import ray

            self.docs = ray.get(docs_by_id_ref) if not isinstance(docs_by_id_ref, dict) else docs_by_id_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            ja = [
                jaccard_ngrams(self.docs.get(a, ""), self.docs.get(b, ""), n)
                for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist())
            ]
            t = t.append_column("jaccard", pa.array(ja, type=pa.float64()))
            return t.filter(pc.greater_equal(t["jaccard"], threshold))

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=concurrency)


# ------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash over whitespace tokens (Charikar '02)."""

    def __init__(self, col: str = "text", id_col: str = "doc_id"):
        self.col = col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> np.uint64:
        toks = np.array(text.split(), dtype="U")
        if len(toks) == 0:
            return np.uint64(0)
        hs = pd.util.hash_array(toks).astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).sum(axis=0)
        vote = bits * 2 > len(hs)
        out = np.uint64(0)
        for i in np.nonzero(vote)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = np.array([self.simhash64(x or "") for x in t[self.col].to_pylist()])
        return t.append_column("simhash", pa.array(hs.view(np.int64)))


def simhash_buckets(ds, col: str = "text", id_col: str = "doc_id",
                    prefix_bits: int = 16, concurrency: int = 2):
    """simhash + bucket by the top ``prefix_bits`` — candidate grouping
    for hamming-distance verification inside each bucket."""
    hashed = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"col": col, "id_col": id_col},
        batch_format="pyarrow", concurrency=norm_concurrency(concurrency),
    )
    shift = np.uint64(64 - prefix_bits)

    def bucketize(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column("simhash_bucket", pa.array((h >> shift).view(np.int64)))

    return hashed.map_batches(bucketize, batch_format="pyarrow")
