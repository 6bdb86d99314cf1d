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

from .base import norm_concurrency, pa_from_pandas, arrow_out
import pyarrow.compute as pc

# ------------------------------------------------------------- exact dedup


def add_content_hash(t: pa.Table, col: str = "text", out: str = "__hash") -> pa.Table:
    """Vectorized 64-bit content hash column."""
    h = pd.util.hash_array(t[col].to_numpy(zero_copy_only=False).astype("U"))
    return t.append_column(out, pa.array(h.view(np.int64)))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id", num_partitions: int = 64):
    """Keep the min-id row per distinct content value.

    hash-partition + per-group first (the brief's required shape): the
    shuffle key is ``hash(content) % num_partitions`` so one worker
    handles MANY whole content groups and resolves them in one
    vectorized pandas pass (per-distinct-value ``map_groups`` would pay
    a Python call per group); ties on hash are resolved by comparing
    the actual value inside the partition."""

    def first_per_group(g: pd.DataFrame) -> pa.Table:
        out = g.sort_values([col, id_col], kind="mergesort").groupby(col, sort=False).head(1)
        # arrow return via pa_from_pandas: a raw pandas return would
        # convert inside Ray WITH pandas schema metadata, which is
        # unhashable and defeats downstream shuffle schema dedup
        return pa_from_pandas(out.drop(columns=["__hash", "__p"]))

    def add_keys(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, col)
        h = t["__hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64))
        )

    return (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(first_per_group), batch_format="pandas")
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
        """Reference per-row path — used only for short docs (< shingle
        tokens); the batch path in ``__call__`` produces bit-identical
        signatures for everything else."""
        sv = self.shingles(text) % _MERSENNE
        # (num_perm, n_shingles) universal hash, min over shingles
        with np.errstate(over="ignore"):
            m = (np.outer(self.a, sv) + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def _batch_signatures(self, texts_col) -> np.ndarray:
        """Whole-batch vectorized signatures: ONE split kernel, ONE
        ``np.char`` shingle join over the flattened token array, ONE
        hash_array call, then per-doc segment-min via
        ``np.minimum.reduceat`` — no per-row hashing loop."""
        k = self.shingle
        filled = pc.fill_null(pc.cast(texts_col, pa.string()), "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(filled), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        flat = toks.flatten()
        tok_np = flat.to_numpy(zero_copy_only=False).astype("U")
        n = len(tok_np)
        ndocs = len(counts)
        sigs = np.empty((ndocs, self.num_perm), dtype=np.uint64)

        # regex-split gives [""] for whitespace-only docs where
        # ``str.split()`` gives [] — treat those as zero tokens
        eff = counts.copy()
        if n:
            starts = offsets[:-1].clip(0, n - 1)
            eff[(counts == 1) & (tok_np[starts] == "")] = 0
        vec = eff >= k

        if vec.any() and n >= k:
            parts = tok_np[: n - k + 1].copy()
            for j in range(1, k):
                parts = np.char.add(np.char.add(parts, " "), tok_np[j : n - k + 1 + j])
            doc_of = np.repeat(np.arange(ndocs), counts)
            head = doc_of[: n - k + 1]
            valid = (head == doc_of[k - 1 :]) & vec[head]
            sv = pd.util.hash_array(parts[valid]).astype(np.uint64) % _MERSENNE
            seg_doc = head[valid]
            seg_starts = np.flatnonzero(np.r_[True, seg_doc[1:] != seg_doc[:-1]])
            seg_docs = seg_doc[seg_starts]
            with np.errstate(over="ignore"):
                for p0 in range(0, self.num_perm, 16):
                    p1 = min(p0 + 16, self.num_perm)
                    m = (self.a[p0:p1, None] * sv[None, :] + self.b[p0:p1, None]) % _MERSENNE
                    sigs[seg_docs, p0:p1] = np.minimum.reduceat(m, seg_starts, axis=1).T

        # short docs: the padded per-row path (rare)
        for i in np.flatnonzero(~vec):
            s = filled[int(i)].as_py()
            sigs[i] = self.signature(s)
        return sigs

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sigs = self._batch_signatures(col)
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

    # task closure: the hasher's permutation params derive from a seed
    # (cheap, small) — no pool startup, width = read parallelism
    sigs = ds.map_batches(
        MinHasher(num_perm=num_perm, shingle=shingle, col=col, id_col=id_col),
        batch_format="pyarrow",
    )
    bands_ds = sigs.map_batches(
        lambda t: minhash_bands(t, bands, rows, id_col), batch_format="pyarrow"
    )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        """One hash partition = many whole (band, bucket) groups; only
        buckets with ≥2 members (rare) do any per-bucket work."""
        multi = g.groupby(["band", "bucket"], sort=False)[id_col].transform("size") >= 2
        g = g.loc[multi].sort_values(["band", "bucket", id_col], kind="mergesort")
        out_a, out_b, out_c = [], [], []
        for _, sub in g.groupby(["band", "bucket"], sort=False):
            ids = sub[id_col].to_numpy()
            capped = len(ids) > max_bucket
            ids = ids[:max_bucket]
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_c.append(np.full(len(ia), capped))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "capped": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "capped": bool}
            )
        df = pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "capped": np.concatenate(out_c),
            }
        )
        # local combiner: same pair from multiple bands in this
        # partition collapses here; capped flag is max-merged
        return df.groupby(["id_a", "id_b"], as_index=False)["capped"].max()

    from .joins import _add_part

    cand = (
        bands_ds.map_batches(_add_part(["band", "bucket"], 64), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(pairs_partition), batch_format="pandas")
    )
    # dedup pairs found in multiple bands: local combiner inside the
    # band partition (np.unique over pair rows, max(capped) per pair)
    # then a pair-hash-partitioned vectorized merge — NOT a Ray
    # groupby().max() whose per-group overhead is pathological once
    # candidate pairs number in the millions (same fix as
    # ngram_jaccard_pairs step 3).

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)
        return t.append_column("__q", pa.array((h % np.uint64(64)).astype(np.int64)))

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["id_a", "id_b"], as_index=False)["capped"].max()
        return agg.astype({"id_a": np.int64, "id_b": np.int64, "capped": bool})

    return (
        cand.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(arrow_out(merge_pairs), batch_format="pandas")
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
    """64-bit SimHash over whitespace tokens (Charikar '02).

    Batch path: one split kernel + ONE hash_array over the flattened
    token array, bit-plane sums per doc via ``np.add.reduceat`` — no
    per-row hashing. ``simhash64`` is the single-string reference
    implementation (bit-identical)."""

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

    def _batch_simhash(self, col) -> np.ndarray:
        filled = pc.fill_null(pc.cast(col, pa.string()), "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(filled), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        tok_np = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        n = len(tok_np)
        ndocs = len(counts)
        out = np.zeros(ndocs, dtype=np.uint64)
        eff = counts.copy()
        if n:
            starts = offsets[:-1].clip(0, n - 1)
            eff[(counts == 1) & (tok_np[starts] == "")] = 0
        # segment boundaries must cover EVERY doc that owns flat tokens
        # (a whitespace-only doc still holds one "" token) — select the
        # wanted rows only after the reduceat
        docs_tok = np.flatnonzero(counts > 0)
        keep = eff[docs_tok] > 0
        if not keep.any():
            return out
        hs = pd.util.hash_array(tok_np).astype(np.uint64)
        seg_starts = offsets[:-1][docs_tok]
        seg_counts = counts[docs_tok]
        tgt = docs_tok[keep]
        for b0 in range(0, 64, 16):
            shifts = np.arange(b0, b0 + 16, dtype=np.uint64)
            bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            sums = np.add.reduceat(bits, seg_starts, axis=0)
            vote = (sums * 2 > seg_counts[:, None]).astype(np.uint64)
            out[tgt] |= (vote << shifts).sum(axis=1, dtype=np.uint64)[keep]
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hs = self._batch_simhash(col)
        return t.append_column("simhash", pa.array(hs.view(np.int64)))


class CharSimHasher:
    """64-bit SimHash over byte n-gram features (character-shingle
    SimHash — the standard alternative to word tokens for near-dup web
    text). Feature hash = the Karp-Rabin byte-window polynomial mod
    2^64 (``stages/text._window_hashes``), every occurrence votes:
    bit k of the signature is 1 iff a strict majority of the doc's
    windows have bit k set.

    Chosen over the word-token SimHasher for the ORACLE query because
    the polynomial-mod-2^64 feature hash is exactly expressible in
    DuckDB HUGEINT arithmetic (hex-pair byte extraction + ``//2^k %2``
    bit planes), so per-doc signatures are value-hash-verified — see
    ``pipelines/queries._char_simhash_sql``. Vectorized across the
    whole batch: one prefix-sum hash pass, then 64 bit-plane
    ``np.add.reduceat`` segment sums (in blocks of 16)."""

    def __init__(self, window: int = 4, col: str = "text", id_col: str = "doc_id",
                 out: str = "simhash"):
        self.window = window
        self.col = col
        self.id_col = id_col
        self.out = out

    def signatures(self, col) -> np.ndarray:
        from .text import _window_hashes

        hv, red_starts, counts = _window_hashes(col, self.window)
        ndocs = len(counts)
        out = np.zeros(ndocs, dtype=np.uint64)
        if not len(hv):
            return out
        for b0 in range(0, 64, 16):
            shifts = np.arange(b0, b0 + 16, dtype=np.uint64)
            bits = ((hv[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bits, red_starts, axis=0)
            vote = (ones * 2 > counts[:, None]).astype(np.uint64)
            out |= (vote << shifts).sum(axis=1, dtype=np.uint64)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return t.append_column(self.out, pa.array(self.signatures(col).view(np.int64)))


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


def log_dedup(ds, key_cols: list[str], ts_col: str = "ts", interval_s: int = 3600,
              id_col: str | None = None):
    """Windowed log deduplication — the logdedup-processor shape (newer
    contrib; not in the reference tree, included as a first-class
    log/training op): identical records (same ``key_cols``) within a
    tumbling ``interval_s`` window collapse to one output row carrying
    ``log.record.count`` (and the first ``id_col`` seen, for lineage).

    Pure partial+final aggregate — the window key is a vectorized
    column, the groupby pre-aggregates inside blocks before the
    shuffle, so only one tiny row per (window, key) crosses the wire.
    """
    import pyarrow.compute as _pc

    from ray.data.aggregate import Count, Min

    def add_window(t: pa.Table) -> pa.Table:
        us = _pc.cast(_pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        epoch = _pc.divide(us, 1_000_000)  # int floor-div: epoch seconds
        win = _pc.multiply(_pc.floor(_pc.divide(
            _pc.cast(epoch, pa.float64()), float(interval_s))), float(interval_s))
        return t.append_column("window_start", _pc.cast(win, pa.int64()))

    aggs = [Count(alias_name="log.record.count")]
    if id_col:
        aggs.append(Min(id_col, alias_name="first_id"))
    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start", *key_cols])
        .aggregate(*aggs)
    )


class ShingleRows:
    """Vectorized distinct word-n-gram extraction: batch → (id, gram)
    int64 rows, one row per DISTINCT n-gram per doc. Same whole-batch
    token machinery as ``MinHasher._batch_signatures`` (one split
    kernel, one ``np.char`` join, one ``hash_array`` call, per-doc
    distinct via one ``np.unique``) — the text column never leaves the
    stage; only small int rows shuffle."""

    def __init__(self, n: int = 3, col: str = "text", id_col: str = "doc_id"):
        self.n = n
        self.col = col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.n
        col = t[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(pc.cast(col, pa.string()), "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(filled), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        tok_np = toks.flatten().to_numpy(zero_copy_only=False).astype("U")
        n = len(tok_np)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        if n < k:
            return pa.table({self.id_col: pa.array([], type=pa.int64()),
                             "gram": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        parts = tok_np[: n - k + 1].copy()
        for j in range(1, k):
            parts = np.char.add(np.char.add(parts, " "), tok_np[j : n - k + 1 + j])
        doc_of = np.repeat(np.arange(len(counts)), counts)
        head = doc_of[: n - k + 1]
        valid = head == doc_of[k - 1 :]  # gram must not cross doc boundary
        hashes = pd.util.hash_array(parts[valid]).astype(np.uint64)
        docs = head[valid]
        pair = np.unique(np.stack([docs.astype(np.uint64), hashes], axis=1), axis=0)
        doc_idx = pair[:, 0].astype(np.int64)
        # |doc|: distinct-gram count, carried ON each gram row so the
        # final Jaccard test needs no second pass over the corpus
        per_doc = np.bincount(doc_idx, minlength=len(counts))
        return pa.table({
            self.id_col: pa.array(ids[doc_idx], type=pa.int64()),
            "gram": pa.array(pair[:, 1].view(np.int64)),
            "c": pa.array(per_doc[doc_idx], type=pa.int64()),
        })


def _pairs_from_runs(doc: np.ndarray, gram: np.ndarray, c: np.ndarray,
                     max_df: int | None):
    """All (id_a < id_b) co-occurrence pairs from gram-sorted rows,
    with each side's distinct-gram count carried along. Runs of equal
    length are processed together (one combinations index per distinct
    run length) — no per-run Python loop."""
    order = np.lexsort((doc, gram))
    gram, doc, c = gram[order], doc[order], c[order]
    starts = np.flatnonzero(np.r_[True, gram[1:] != gram[:-1]])
    lens = np.diff(np.r_[starts, len(gram)])
    out = []
    for d in np.unique(lens):
        if d < 2 or (max_df is not None and d > max_df):
            continue
        runs = starts[lens == d]
        idx = runs[:, None] + np.arange(d)[None, :]  # (n_runs, d)
        block, cblock = doc[idx], c[idx]
        ia, ib = np.triu_indices(int(d), k=1)
        a, b = block[:, ia].ravel(), block[:, ib].ravel()
        ca, cb = cblock[:, ia].ravel(), cblock[:, ib].ravel()
        swap = a > b
        out.append((np.where(swap, b, a), np.where(swap, a, b),
                    np.where(swap, cb, ca), np.where(swap, ca, cb)))
    if not out:
        z = np.array([], dtype=np.int64)
        return z, z, z.copy(), z.copy()
    return tuple(np.concatenate([o[i] for o in out]) for i in range(4))


def ngram_jaccard_pairs(ds, threshold_num: int = 8, threshold_den: int = 10,
                        n: int = 3, col: str = "text", id_col: str = "doc_id",
                        max_df: int | None = None, num_partitions: int = 64,
                        mode: str = "jaccard", keep_counts: bool = False):
    """All-pairs word-n-gram Jaccard ≥ threshold via a distributed
    inverted shingle index — the exact counterpart to MinHash-LSH:

    1. ``ShingleRows``: docs → distinct (id, gram-hash, |doc|) int rows
       (narrow; text stays behind; |doc| = the doc's distinct-gram
       count, computed in the same pass and carried on every row so no
       second corpus pass or broadcast map is ever needed).
    2. hash-partition by gram; per partition, emit co-occurrence pairs
       per gram run — ``max_df`` drops grams shared by more than that
       many docs (the stopword-gram skew valve; at web scale a gram in
       10k docs would emit 10⁸ pairs) — then LOCALLY pre-aggregate
       identical pairs (``np.unique`` with counts: the combiner).
    3. hash-partition by pair; one vectorized pandas groupby-sum per
       partition merges cross-partition partials AND applies the
       Jaccard test in the same pass. (NOT a Ray
       ``groupby().aggregate()`` — millions of tiny groups pay
       per-group overhead there; 2 partition-wise vectorized passes
       replace it, 236 s → ~3 s at sf0.1.)
    4. Jaccard ≥ num/den as the INTEGER test
       ``den·C ≥ num·(|A| + |B| − C)``.

    ONE streaming pipeline, two all-to-all exchanges (by gram, by
    pair); the rational threshold keeps everything integer-exact — the
    SQL twin hashes identically.
    """
    grams = ds.map_batches(ShingleRows(n=n, col=col, id_col=id_col),
                           batch_format="pyarrow")

    def add_gram_part(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("__p", pa.array((g % num_partitions).astype(np.int64)))

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        # returns ARROW (metadata-free): a pandas return would make Ray
        # re-attach b'pandas' schema metadata on the next conversion,
        # and the second shuffle's reduce tasks then fail to hash-dedup
        # the schemas (pyarrow Schema.__hash__ raises on metadata)
        a, b, ca, cb = _pairs_from_runs(
            g[id_col].to_numpy(), g["gram"].to_numpy(), g["c"].to_numpy(), max_df
        )
        df = pd.DataFrame({"id_a": a, "id_b": b, "c_a": ca, "c_b": cb})
        if not len(a):
            df["shared"] = np.array([], dtype=np.int64)
            return pa_from_pandas(df)
        # local combiner (hashed pandas groupby — np.unique(axis=0)
        # pays a full row lexsort and loses to it badly)
        return pa_from_pandas(
            df.groupby(["id_a", "id_b", "c_a", "c_b"], as_index=False).agg(
                shared=("c_a", "size")
            ))

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ b.astype(np.uint64)
        return t.append_column("__q", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def merge_and_filter(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["id_a", "id_b", "c_a", "c_b"], as_index=False)["shared"].sum()
        c = agg["shared"].to_numpy()
        if mode == "containment":
            # containment toward the SMALLER gram set — detects one doc
            # embedded in / near-superset of another even when their
            # Jaccard is low (the quote/boilerplate-copy case)
            denom = np.minimum(agg["c_a"].to_numpy(), agg["c_b"].to_numpy())
        else:
            denom = agg["c_a"].to_numpy() + agg["c_b"].to_numpy() - c
        keep = threshold_den * c >= threshold_num * denom
        cols = (["id_a", "id_b", "c_a", "c_b", "shared"] if keep_counts
                else ["id_a", "id_b", "shared"])
        return agg.loc[keep, cols]

    return (
        grams.map_batches(add_gram_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(pairs_partition), batch_format="pandas")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(arrow_out(merge_and_filter), batch_format="pandas")
    )


# ----------------------------------------------------- segment-level dedup


def segment_dedup(ds, col: str = "text", id_col: str = "doc_id",
                  sep: str = "\n", num_partitions: int = 64):
    """Corpus-wide EXACT segment (line/paragraph) deduplication: split
    every document on the literal ``sep``, keep only the globally FIRST
    occurrence (min ``(doc_id, idx)``) of each distinct segment, and
    rebuild documents from their surviving segments — the exact
    line-dedup used by RefinedWeb / the exact-substring variant of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"), at segment granularity.

    Shape for 100 TB (three exchanges, text shuffles ONCE):

    1. explode — per batch, one ``pc.split_pattern`` → int occurrence
       rows ``(h=hash64(segment), doc_id, idx)``; text stays behind.
    2. decide — hash-partition the int rows on ``h``; within each
       partition one vectorized pandas pass marks every non-first
       occurrence of each ``h`` (sort + ``duplicated``). Only the DROP
       rows ``(doc_id, idx)`` survive — duplicates only, a small
       fraction of the corpus.
    3. apply — drop rows and documents are co-partitioned on
       ``hash(doc_id)`` (one union + groupby: the single text
       shuffle); each partition re-splits its docs, anti-joins the
       drop set on ``(doc_id, idx)`` and re-joins survivors with
       ``sep``.

    Segment identity is 64-bit-hash equality (``pd.util.hash_array``):
    at trillion-segment scale swap in a 128-bit hash; the decision is
    deterministic either way. Output: ``(id_col, col, n_segs,
    n_dropped)`` with ``col`` rebuilt (empty string when every segment
    of a doc was dropped)."""
    from .text import _ragged_arange

    P = num_partitions

    def explode(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        segs = pc.split_pattern(pc.fill_null(pc.cast(c, pa.string()), ""), sep)
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        offsets = np.asarray(segs.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        flat = segs.flatten().to_numpy(zero_copy_only=False).astype("U")
        h = pd.util.hash_array(flat)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        idx, _ = _ragged_arange(counts)
        return pa.table({
            "d": pa.array(np.repeat(ids, counts), type=pa.int64()),
            "i": pa.array(idx),
            "h": pa.array(h.view(np.int64)),
            "__p": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    def decide_drops(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", "d", "i"], kind="mergesort")
        dup = g.duplicated("h").to_numpy()
        d = g["d"].to_numpy()[dup]
        i = g["i"].to_numpy()[dup]
        # arrow output with pinned types: an EMPTY pandas object column
        # would convert to arrow null and break the union schema match
        return pa.table({
            "d": pa.array(d, type=pa.int64()),
            "i": pa.array(i, type=pa.int64()),
            col: pa.array([""] * len(d), type=pa.string()),
            "__q": pa.array((d.astype(np.uint64)
                             * np.uint64(0x9E3779B97F4A7C15)
                             % np.uint64(P)).astype(np.int64)),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        q = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(P)).astype(np.int64)
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return pa.table({
            "d": pa.array(ids, type=pa.int64()),
            "i": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            col: pc.fill_null(pc.cast(c, pa.string()), ""),
            "__q": pa.array(q),
        })

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        docs = g[g["i"] < 0]
        drops = g.loc[g["i"] >= 0, ["d", "i"]]
        if len(docs) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             col: pa.array([], type=pa.string()),
                             "n_segs": pa.array([], type=pa.int64()),
                             "n_dropped": pa.array([], type=pa.int64())})
        ex = docs[["d"]].copy()
        ex["s"] = docs[col].str.split(sep, regex=False)
        ex = ex.reset_index(drop=True).explode("s")
        ex["i"] = ex.groupby(level=0).cumcount()
        merged = ex.merge(drops, on=["d", "i"], how="left", indicator=True)
        kept = merged[merged["_merge"] == "left_only"]
        doc_ids = docs["d"].to_numpy()
        text = kept.groupby("d", sort=False)["s"].agg(sep.join) \
            .reindex(doc_ids, fill_value="")
        n_segs = ex.groupby("d", sort=False).size().reindex(doc_ids, fill_value=0)
        n_kept = kept.groupby("d", sort=False).size().reindex(doc_ids, fill_value=0)
        return pd.DataFrame({
            id_col: doc_ids,
            col: text.to_numpy(),
            "n_segs": n_segs.to_numpy().astype(np.int64),
            "n_dropped": (n_segs.to_numpy() - n_kept.to_numpy()).astype(np.int64),
        })

    drop_ds = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(decide_drops), batch_format="pandas")
    )
    docs_tagged = ds.map_batches(tag_docs, batch_format="pyarrow")
    return docs_tagged.union(drop_ds).groupby("__q") \
        .map_groups(arrow_out(rebuild), batch_format="pandas")


def span_dedup(ds, k: int = 8, col: str = "text", id_col: str = "doc_id",
               num_partitions: int = 64):
    """Corpus-wide EXACT duplicate-SPAN removal: every window of ``k``
    consecutive whitespace tokens that occurs ≥2 times anywhere in the
    corpus (across or within documents) is masked out of all but its
    globally FIRST occurrence (min ``(doc_id, pos)``) — the
    exact-substring dedup of Lee et al. 2021 ("Deduplicating Training
    Data Makes Language Models Better") at fixed window granularity,
    keep-first like RefinedWeb's variant. Overlapping duplicated
    windows mask the UNION of their token ranges; documents are
    rebuilt from surviving tokens.

    Shape for 100 TB (three exchanges, text shuffles ONCE — the
    segment_dedup skeleton with windows instead of lines):

    1. explode — per batch, one split + k shifted slices of the FLAT
       token array joined by ``binary_join_element_wise`` (no per-doc
       Python); rows ``(h=hash64(gram), d, pos)``, windows never
       crossing doc boundaries.
    2. decide — hash-partition on ``h``; one vectorized sort +
       ``duplicated`` pass keeps the DROP occurrences only.
    3. apply — drops and docs co-partitioned on ``hash(d)``; covered
       tokens via interval scatter (+1 at pos, −1 at pos+k over the
       partition's flat token array — windows never span docs, so the
       running sum returns to 0 at every doc end and cannot bleed),
       surviving tokens re-joined with ONE ``pc.binary_join`` kernel.

    Gram identity is 64-bit-hash equality over the separator-joined
    window string (``pd.util.hash_array``); swap in a 128-bit hash at
    trillion-window scale. Output: ``(id_col, col, n_tokens,
    n_masked)`` with ``col`` rebuilt (single-space joined)."""
    P = num_partitions
    SEP = "\x1f"
    STEP = np.uint64(0x9E3779B97F4A7C15)

    def _tokens(t: pa.Table):
        """flat token StringArray + per-doc counts (empty docs → 0)."""
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(pc.fill_null(pc.cast(c, pa.string()), ""))
        segs = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(segs, pa.ChunkedArray):
            segs = segs.combine_chunks()
        offsets = np.asarray(segs.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        empty = np.asarray(pc.equal(pc.utf8_length(trimmed), 0))
        flat = segs.flatten()
        if empty.any():
            # an empty doc splits to [''] — drop those phantom tokens
            keep = np.ones(len(flat), dtype=bool)
            starts = offsets[:-1]
            keep[starts[empty]] = False
            flat = flat.filter(pa.array(keep))
            counts = np.where(empty, 0, counts)
        return flat, counts

    def explode(t: pa.Table) -> pa.Table:
        flat, counts = _tokens(t)
        n = len(flat)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if n < k:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "i": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64()),
                             "__p": pa.array([], type=pa.int64())})
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, n - k + 1) for j in range(k)], SEP)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pos_flat = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        head = docidx[: n - k + 1]
        valid = head == docidx[k - 1:]          # window inside one doc
        h = pd.util.hash_array(grams.to_numpy(zero_copy_only=False).astype("U"))[valid]
        return pa.table({
            "d": pa.array(np.repeat(ids, counts)[: n - k + 1][valid], type=pa.int64()),
            "i": pa.array(pos_flat[: n - k + 1][valid]),
            "h": pa.array(h.view(np.int64)),
            "__p": pa.array((h % np.uint64(P)).astype(np.int64)),
        })

    def decide_drops(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["h", "d", "i"], kind="mergesort")
        dup = g.duplicated("h").to_numpy()
        d = g["d"].to_numpy()[dup]
        i = g["i"].to_numpy()[dup]
        return pa.table({
            "d": pa.array(d, type=pa.int64()),
            "i": pa.array(i, type=pa.int64()),
            col: pa.array([""] * len(d), type=pa.string()),
            "__q": pa.array((d.astype(np.uint64) * STEP
                             % np.uint64(P)).astype(np.int64)),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return pa.table({
            "d": pa.array(ids, type=pa.int64()),
            "i": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            col: pc.fill_null(pc.cast(c, pa.string()), ""),
            "__q": pa.array((ids.astype(np.uint64) * STEP
                             % np.uint64(P)).astype(np.int64)),
        })

    def rebuild(g: pd.DataFrame) -> "pd.DataFrame | pa.Table":
        g = g.reset_index(drop=True)
        docs = g[g["i"] < 0]
        drops = g.loc[g["i"] >= 0, ["d", "i"]]
        if len(docs) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             col: pa.array([], type=pa.string()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "n_masked": pa.array([], type=pa.int64())})
        flat, counts = _tokens(pa.table({
            id_col: pa.array(docs["d"].to_numpy(), type=pa.int64()),
            col: pa.array(docs[col].to_numpy(), type=pa.string()),
        }))
        total = len(flat)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        doc_ids = docs["d"].to_numpy()
        ordinal = pd.Series(np.arange(len(doc_ids)), index=doc_ids)
        dflat = bounds[ordinal.loc[drops["d"]].to_numpy()] \
            + drops["i"].to_numpy() if len(drops) else np.array([], dtype=np.int64)
        delta = np.zeros(total + k + 1, dtype=np.int64)
        np.add.at(delta, dflat, 1)
        np.add.at(delta, dflat + k, -1)
        covered = np.cumsum(delta[:total]) > 0
        kept = ~covered
        flat_kept = flat.filter(pa.array(kept))
        ck = np.concatenate(([0], np.cumsum(kept)))
        new_off = ck[bounds]
        lists = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()),
            pc.cast(flat_kept, pa.large_string()))
        text = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        n_kept = new_off[1:] - new_off[:-1]
        return pa.table({
            id_col: pa.array(doc_ids, type=pa.int64()),
            col: pc.cast(text, pa.string()),
            "n_tokens": pa.array(counts, type=pa.int64()),
            "n_masked": pa.array(counts - n_kept, type=pa.int64()),
        })

    drop_ds = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(decide_drops), batch_format="pandas")
    )
    docs_tagged = ds.map_batches(tag_docs, batch_format="pyarrow")
    return docs_tagged.union(drop_ds).groupby("__q") \
        .map_groups(arrow_out(rebuild), batch_format="pandas")


def ngram_jaccard_prefix_pairs(ds, threshold_num: int = 8,
                               threshold_den: int = 10, n: int = 3,
                               col: str = "text", id_col: str = "doc_id",
                               num_partitions: int = 64):
    """AllPairs/PPJoin-style prefix-filtered EXACT n-gram Jaccard join
    (Chaudhuri et al. SSJoin 2006; Xiao et al. PPJoin 2008) — the
    no-df-cap scale path beside ``ngram_jaccard_pairs`` (whose
    ``max_df`` valve truncates stopword grams out of the intersection):
    only each doc's PREFIX — its |d| − ⌈t·|d|⌉ + 1 globally RAREST
    grams under the total order (df, gram) — enters pair generation,
    so frequent grams never fan out quadratically; a per-candidate
    verification pass then computes the FULL exact intersection. If
    J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so the intersection must hit A's
    prefix (and B's): with one shared global order the two prefixes
    provably share a gram — no true pair is ever missed, and the
    verifier kills every false candidate.

    Six narrow integer exchanges (text never moves):
    1. by gram: df = run length (a gram's rows co-locate), attached.
    2. by doc: per-doc (df, gram) sort → prefix rows.
    3. by gram over PREFIX rows only: run pairs = candidates.
    4. by pair: distinct candidates.
    5. by doc: each candidate fans to its two member docs and picks up
       that doc's full gram list (cost Σ(|A|+|B|) over candidates —
       the verification volume PPJoin pays instead of a df cap).
    6. by pair: grams seen from BOTH sides = |A∩B|; keep when
       den·C ≥ num·(|A|+|B|−C). Gram rows re-derive from the source on
       pass 5 (a map over the pruned read — streaming, never
       materialized)."""
    from .base import pa_from_pandas

    grams = ds.map_batches(ShingleRows(n=n, col=col, id_col=id_col),
                           batch_format="pyarrow")

    def mix_part(colname: str):
        def fn(t: pa.Table) -> pa.Table:
            v = t[colname].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = v * np.uint64(0x9E3779B97F4A7C15)
            return t.append_column("__p", pa.array(
                (h % np.uint64(num_partitions)).astype(np.int64)))
        return fn

    # 1) df per gram, attached to each row inside the gram partition
    def attach_df(g: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "gram": g["gram"].to_numpy(),
            "c": g["c"].to_numpy(),
            "df": g.groupby("gram")["gram"].transform("size")
                   .to_numpy().astype(np.int64)})
        return pa_from_pandas(out)

    wdf = (grams.map_batches(mix_part("gram"), batch_format="pyarrow")
                .groupby("__p").map_groups(attach_df,
                                           batch_format="pandas"))

    # 2) per-doc rarest-first prefix
    def prefixes(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([id_col, "df", "gram"], kind="mergesort")
        c = g["c"].to_numpy().astype(np.int64)
        p = c - (-(-threshold_num * c) // threshold_den) + 1
        ids = g[id_col].to_numpy().astype(np.int64)
        new = np.r_[True, ids[1:] != ids[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        rank = idx - idx[new][np.cumsum(new) - 1]
        out = g.loc[rank < p, [id_col, "gram", "c"]]
        return pa_from_pandas(out.astype("int64"))

    pref = (wdf.map_batches(mix_part(id_col), batch_format="pyarrow")
               .groupby("__p").map_groups(arrow_out(prefixes), batch_format="pandas"))

    # 3) candidates from prefix-gram runs
    def cand_partition(g: pd.DataFrame) -> pa.Table:
        a, b, ca, cb = _pairs_from_runs(
            g[id_col].to_numpy(), g["gram"].to_numpy(),
            g["c"].to_numpy(), None)
        return pa_from_pandas(pd.DataFrame(
            {"id_a": a, "id_b": b, "c_a": ca, "c_b": cb})
            .drop_duplicates())

    def pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        return t.append_column("__p", pa.array(
            (h % np.uint64(num_partitions)).astype(np.int64)))

    # 4) global distinct candidates
    def distinct_cands(g: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(
            g.drop(columns="__p").drop_duplicates().astype("int64"))

    cands = (pref.map_batches(mix_part("gram"), batch_format="pyarrow")
                 .groupby("__p").map_groups(cand_partition,
                                            batch_format="pandas")
                 .map_batches(pair_part, batch_format="pyarrow")
                 .groupby("__p").map_groups(distinct_cands,
                                            batch_format="pandas"))

    # 5) fan candidates to member docs, pick up full gram lists
    def fan_sides(t: pa.Table) -> pa.Table:
        both = pa.concat_tables([
            pa.table({"doc": t["id_a"], "id_a": t["id_a"],
                      "id_b": t["id_b"], "c_a": t["c_a"],
                      "c_b": t["c_b"]}),
            pa.table({"doc": t["id_b"], "id_a": t["id_a"],
                      "id_b": t["id_b"], "c_a": t["c_a"],
                      "c_b": t["c_b"]})])
        z = pa.nulls(both.num_rows, pa.int64())
        return pa.table({"doc": both["doc"], "id_a": both["id_a"],
                         "id_b": both["id_b"], "c_a": both["c_a"],
                         "c_b": both["c_b"], "gram": z,
                         "__side": pa.array(["c"] * both.num_rows)})

    def gram_side(t: pa.Table) -> pa.Table:
        z = pa.nulls(t.num_rows, pa.int64())
        return pa.table({"doc": t[id_col], "id_a": z, "id_b": z,
                         "c_a": z, "c_b": z, "gram": t["gram"],
                         "__side": pa.array(["g"] * t.num_rows)})

    unioned = (cands.map_batches(fan_sides, batch_format="pyarrow")
               .union(grams.map_batches(gram_side,
                                        batch_format="pyarrow"))
               .map_batches(mix_part("doc"), batch_format="pyarrow"))

    def pickup(g: pd.DataFrame) -> pa.Table:
        cs = g.loc[g["__side"] == "c",
                   ["doc", "id_a", "id_b", "c_a", "c_b"]]
        gs = g.loc[g["__side"] == "g", ["doc", "gram"]]
        m = cs.merge(gs, on="doc")
        return pa_from_pandas(
            m[["id_a", "id_b", "c_a", "c_b", "gram"]].astype("int64"))

    pair_grams = (unioned.groupby("__p")
                  .map_groups(arrow_out(pickup), batch_format="pandas"))

    # 6) exact intersection + threshold
    def verify(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["id_a", "id_b", "c_a", "c_b", "gram"],
                        as_index=False).size()
        both = cnt[cnt["size"] >= 2]
        agg = (both.groupby(["id_a", "id_b", "c_a", "c_b"],
                            as_index=False).size()
               .rename(columns={"size": "shared"}))
        c = agg["shared"].to_numpy().astype(np.int64)
        keep = threshold_den * c >= threshold_num * (
            agg["c_a"].to_numpy().astype(np.int64)
            + agg["c_b"].to_numpy().astype(np.int64) - c)
        return agg.loc[keep, ["id_a", "id_b", "shared"]].astype("int64")

    return (pair_grams.map_batches(pair_part, batch_format="pyarrow")
            .groupby("__p").map_groups(arrow_out(verify), batch_format="pandas"))
