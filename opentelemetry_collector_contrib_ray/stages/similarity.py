"""Similarity search over an embedding column (list<float>).

- ``BruteForceTopK``: exact cosine top-k per batch against a broadcast
  query matrix (numpy matmul; one partial top-k per block, merged at
  the end) — the baseline.
- ``lsh_bucket_topk``: random-hyperplane LSH bucketing (the scale path):
  queries and corpus hash to sign-pattern buckets; only same-bucket
  candidates are scored. Approximate; recall grows with ``n_tables``.

Scale design: the corpus streams (never materialized); query matrix is
small and broadcast with ``ray.put``; each block emits ≤ k rows per
query, so the final merge handles #blocks × k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .base import norm_concurrency, pa_from_pandas, arrow_out


def _merge_topk_partials(partial, k: int, id_col: str) -> pa.Table:
    """Global top-k per query from block-local partials — one vectorized
    lexsort + per-group rank instead of a per-row Python heap (the r2
    driver-side heap serialized at thousands of queries). Input is
    bounded (≤ #blocks × k × nq rows), so a single concat is safe; ties
    broken by id for determinism, output sorted (query, -cosine, id)."""
    parts = [pa.table(b) for b in partial.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(parts) if parts else None
    if t is None or t.num_rows == 0:
        return pa.table({
            "query_id": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        })
    q = t["query_id"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    sims = t["cosine"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims, q))  # by query, cosine desc, id asc
    q, ids, sims = q[order], ids[order], sims[order]
    new_grp = np.ones(len(q), dtype=bool)
    new_grp[1:] = q[1:] != q[:-1]
    grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(q)), 0))
    rank = np.arange(len(q)) - grp_start
    keep = rank < k
    return pa.table({
        "query_id": pa.array(q[keep], type=pa.int64()),
        id_col: pa.array(ids[keep], type=pa.int64()),
        "cosine": pa.array(sims[keep], type=pa.float64()),
    })


def _to_matrix(col) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(a, pa.FixedSizeListArray):
        dim = a.type.list_size
        return np.asarray(a.flatten(), dtype=np.float64).reshape(len(a), dim)
    flat = np.asarray(a.flatten(), dtype=np.float64)
    offs = np.asarray(a.offsets)
    dim = int(offs[1] - offs[0])
    return flat.reshape(len(a), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _searcher_stage(ds, cls, kwargs, concurrency, mode):
    """Attach a searcher stage either as an actor pool (big broadcast
    state, built once per actor) or a task closure (cheap state, fuses
    with the read, no pool startup, unbounded width)."""
    if mode == "task":
        return ds.map_batches(cls(**kwargs), batch_format="pyarrow")
    return ds.map_batches(cls, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow",
                          concurrency=norm_concurrency(concurrency))


class BruteForceTopK:
    """Actor-pool stage: per batch, cosine of every row against the
    broadcast query matrix; emits the batch-local top-k per query."""

    def __init__(self, queries, k: int = 10, emb_col: str = "embedding",
                 id_col: str = "vec_id", query_ids=None):
        import ray

        if not isinstance(queries, np.ndarray):
            queries = ray.get(queries)
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(self.q))
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t[self.emb_col]))
        sims = self.q @ m.T  # (nq, batch)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            sel = part[qi]
            out_q.append(np.full(k, self.qids[qi]))
            out_id.append(ids[sel])
            out_sim.append(sims[qi, sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )


def brute_force_topk(ds, queries, k: int = 10, emb_col: str = "embedding",
                     id_col: str = "vec_id", query_ids=None,
                     concurrency: int = 4, mode: str = "actor"):
    """Exact top-k: block-local top-k → tiny vectorized global merge
    over ≤ #blocks × k × nq partial rows — never a full-dataset
    materialization, and no per-row Python on the driver.

    ``mode="task"``: the searcher instance (with its normalized query
    matrix) ships in the task closure — fuses with the read, no pool
    startup, unbounded width. Right when the query matrix is small;
    keep actor mode for big broadcast matrices (constructed once per
    actor from a ``ray.put`` ref instead of pickled per stage)."""
    if mode == "task":
        partial = ds.map_batches(
            BruteForceTopK(queries, k=k, emb_col=emb_col, id_col=id_col,
                           query_ids=query_ids),
            batch_format="pyarrow",
        )
    else:
        partial = ds.map_batches(
            BruteForceTopK,
            fn_constructor_kwargs={
                "queries": queries, "k": k, "emb_col": emb_col,
                "id_col": id_col, "query_ids": query_ids,
            },
            batch_format="pyarrow",
            concurrency=norm_concurrency(concurrency),
        )
    return _merge_topk_partials(partial, k, id_col)


class HyperplaneHasher:
    """Random-hyperplane signs → int bucket (per actor, deterministic)."""

    def __init__(self, dim: int, n_bits: int = 12, seed: int = 11,
                 emb_col: str = "embedding"):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((dim, n_bits))
        self.weights = (1 << np.arange(n_bits)).astype(np.int64)
        self.emb_col = emb_col

    def bucket(self, m: np.ndarray) -> np.ndarray:
        return ((m @ self.planes) > 0).astype(np.int64) @ self.weights

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _to_matrix(t[self.emb_col])
        return t.append_column("lsh_bucket", pa.array(self.bucket(m)))


def _probe_buckets(buckets: np.ndarray, n_bits: int, n_probes: int) -> set:
    """Exact buckets plus (multi-probe) their single-bit-flip neighbors —
    the ``n_probes`` nearest alternative buckets per LSH convention
    (flipping the lowest-margin bits; we flip the first n_probes-1 bits
    deterministically, a simple but effective probe schedule)."""
    out = set(int(b) for b in buckets)
    if n_probes > 1:
        for b in list(out):
            for bit in range(min(n_probes - 1, n_bits)):
                out.add(b ^ (1 << bit))
    return out


class _LshCandidateFilter:
    """Actor-pool stage: keep rows matching ANY of ``n_tables``
    independent hyperplane tables' allowed bucket sets (union of
    query buckets + multi-probe neighbors). State (planes, allowed
    sets) built once per actor."""

    def __init__(self, dim, n_bits, seed, emb_col, q_ref, n_tables, n_probes):
        import ray

        q = q_ref if isinstance(q_ref, np.ndarray) else ray.get(q_ref)
        self.hashers = [
            HyperplaneHasher(dim, n_bits, seed + i, emb_col) for i in range(n_tables)
        ]
        self.allowed = [
            np.fromiter(_probe_buckets(h.bucket(q), n_bits, n_probes), dtype=np.int64)
            for h in self.hashers
        ]
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _to_matrix(t[self.emb_col])
        keep = np.zeros(t.num_rows, dtype=bool)
        for h, allowed in zip(self.hashers, self.allowed):
            keep |= np.isin(h.bucket(m), allowed)
        return t.filter(pa.array(keep))


def lsh_bucket_topk(ds, queries, k: int = 10, dim: int | None = None,
                    n_bits: int = 8, seed: int = 11, emb_col: str = "embedding",
                    id_col: str = "vec_id", query_ids=None, concurrency: int = 4,
                    n_tables: int = 1, n_probes: int = 1, mode: str = "actor"):
    """Approximate top-k: score only corpus rows that land in an allowed
    LSH bucket. Recall levers (classic LSH):
    - ``n_tables``: independent hyperplane tables OR-ed together;
    - ``n_probes``: also probe neighboring buckets (bit flips).
    Defaults reproduce the single-table exact-bucket behavior."""
    import ray

    q = queries if isinstance(queries, np.ndarray) else ray.get(queries)
    q = np.asarray(q, dtype=np.float64)
    dim = dim or q.shape[1]

    cand = _searcher_stage(
        ds, _LshCandidateFilter,
        {"dim": dim, "n_bits": n_bits, "seed": seed, "emb_col": emb_col,
         "q_ref": q, "n_tables": n_tables, "n_probes": n_probes},
        concurrency, mode)
    return brute_force_topk(cand, q, k=k, emb_col=emb_col, id_col=id_col,
                            query_ids=query_ids, concurrency=concurrency,
                            mode=mode)


def train_ivf_centroids(ds, n_clusters: int = 64, n_iters: int = 15,
                        seed: int = 17, emb_col: str = "embedding",
                        sample_size: int = 100_000) -> np.ndarray:
    """Train an IVF coarse quantizer: deterministic Lloyd k-means over a
    BOUNDED sample (first ``sample_size`` rows — the only materialized
    piece; the corpus itself never leaves the stream). Centroids are
    L2-normalized so nearest-centroid-by-dot-product = cosine cell.

    At 100 TB the sample is still ``sample_size`` rows: training cost is
    independent of corpus size, and the centroid matrix
    (n_clusters × dim) is broadcast once with ``ray.put``.
    """
    import ray

    # materialize() before to_arrow_refs: the lazy path executes once
    # for the refs and AGAIN (limit-1) for the schema probe
    tables = ray.get(
        ds.limit(sample_size).select_columns([emb_col])
        .materialize().to_arrow_refs())
    col = pa.concat_tables(tables)[emb_col]
    sample = _normalize(_to_matrix(col))
    rng = np.random.Generator(np.random.PCG64(seed))
    n_clusters = min(n_clusters, len(sample))
    cent = sample[rng.choice(len(sample), size=n_clusters, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IvfSearcher:
    """Actor-pool IVF search stage. State built once per actor:
    centroids + the cluster→probing-queries inverted map. Per batch:
    assign rows to cells (one matmul), then for each cell present score
    its rows ONLY against the queries that probe that cell, emitting
    block-local top-k partials."""

    def __init__(self, cent_ref, q_ref, k, n_probe, emb_col, id_col, query_ids):
        import ray

        cent = cent_ref if isinstance(cent_ref, np.ndarray) else ray.get(cent_ref)
        q = q_ref if isinstance(q_ref, np.ndarray) else ray.get(q_ref)
        self.cent = _normalize(np.asarray(cent, dtype=np.float64))
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.qids = np.asarray(query_ids) if query_ids is not None else np.arange(len(self.q))
        n_probe = min(n_probe, len(self.cent))
        probes = np.argpartition(-(self.q @ self.cent.T), n_probe - 1, axis=1)[:, :n_probe]
        self.cell_queries: dict[int, np.ndarray] = {}
        for qi, cells in enumerate(probes):
            for c in cells:
                self.cell_queries.setdefault(int(c), []).append(qi)
        self.cell_queries = {c: np.asarray(v) for c, v in self.cell_queries.items()}
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t[self.emb_col]))
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        cells = np.argmax(m @ self.cent.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for c in np.unique(cells):
            qsel = self.cell_queries.get(int(c))
            if qsel is None:
                continue
            rows = np.nonzero(cells == c)[0]
            sims = self.q[qsel] @ m[rows].T  # (nq_cell, n_rows_cell)
            k = min(self.k, sims.shape[1])
            part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            for j, qi in enumerate(qsel):
                sel = part[j]
                out_q.append(np.full(k, self.qids[qi]))
                out_id.append(ids[rows][sel])
                out_sim.append(sims[j, sel])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                self.id_col: pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            self.id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
        })


def ivf_topk(ds, queries, k: int = 10, n_clusters: int = 64, n_probe: int = 4,
             n_iters: int = 15, seed: int = 17, emb_col: str = "embedding",
             id_col: str = "vec_id", query_ids=None, concurrency: int = 4,
             centroids: np.ndarray | None = None, sample_size: int = 100_000,
             mode: str = "actor"):
    """IVF approximate top-k — the classic scale path next to LSH:
    train a coarse quantizer on a bounded sample, then stream the corpus
    once; each row is scored only against the queries probing its cell
    (work ∝ n_probe/n_clusters of brute force). Recall lever: ``n_probe``
    (= n_clusters ⇒ exact). Final merge = bounded vectorized lexsort
    (≤ blocks × k × nq rows), same as brute force."""
    import ray

    q = queries if isinstance(queries, np.ndarray) else ray.get(queries)
    q = np.asarray(q, dtype=np.float64)
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_clusters, n_iters, seed, emb_col, sample_size)
    cent_ref = ray.put(centroids)

    partial = _searcher_stage(
        ds, _IvfSearcher,
        {"cent_ref": cent_ref, "q_ref": q, "k": k, "n_probe": n_probe,
         "emb_col": emb_col, "id_col": id_col, "query_ids": query_ids},
        concurrency, mode)
    return _merge_topk_partials(partial, k, id_col)


def assign_ivf_clusters(ds, centroids, emb_col: str = "embedding",
                        cluster_col: str = "ivf_cluster", concurrency: int = 4):
    """Index build: add each row's IVF cell id — write the result
    partitioned by ``cluster_col`` for a resumable, cell-pruned index."""
    import ray

    cent_ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t[emb_col]))
            return t.append_column(
                cluster_col, pa.array(np.argmax(m @ self.cent.T, axis=1), type=pa.int32())
            )

    return ds.map_batches(Assign, batch_format="pyarrow",
                          concurrency=norm_concurrency(concurrency))


def lsh_near_dup_pairs(ds, threshold: float = 0.9, n_bits: int = 4,
                       n_tables: int = 16, seed: int = 11,
                       emb_col: str = "embedding", id_col: str = "vec_id",
                       num_partitions: int = 64, concurrency: int = 4):
    """Multi-table LSH-blocked near-duplicate pairs — the scale path
    when no natural blocking column exists:

    1. ONE pass computes every table's hyperplane bucket and explodes
       each row to ``n_tables`` (table, bucket, id, embedding) rows —
       a single all-to-all exchange (vs one shuffle per table).
    2. hash-partition by (table, bucket); per bucket, exact all-pairs
       cosine ≥ threshold (numpy matmul over the bucket's rows).
    3. pair-hash-partitioned dedup keeps one row per (id_a, id_b)
       found in several tables.

    The cosine filter is EXACT — only recall is approximate, rising
    with ``n_tables`` (P[pair found] = 1 − (1 − p^n_bits)^n_tables,
    p = 1 − θ/π). Per-worker memory ≈ n_tables × rows / num_partitions
    embeddings; bucket count 2^n_bits trades bucket size vs recall."""

    class _ExplodeBuckets:
        def __init__(self):
            # one hasher per table, deterministic per (seed, table)
            self.hashers = None

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _to_matrix(t[emb_col])
            if self.hashers is None:
                self.hashers = [
                    HyperplaneHasher(m.shape[1], n_bits, seed + i, emb_col)
                    for i in range(n_tables)
                ]
            n = t.num_rows
            ids = t[id_col].to_numpy(zero_copy_only=False)
            emb = t[emb_col]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            tables, buckets = [], []
            for i, h in enumerate(self.hashers):
                tables.append(np.full(n, i, dtype=np.int32))
                buckets.append(h.bucket(m))
            idx = np.tile(np.arange(n), n_tables)
            return pa.table({
                "__t": pa.array(np.concatenate(tables)),
                "__b": pa.array(np.concatenate(buckets)),
                id_col: pa.array(np.tile(ids, n_tables)),
                emb_col: emb.take(pa.array(idx)),
            })

    def add_part(t: pa.Table) -> pa.Table:
        tt = t["__t"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = t["__b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (tt * np.uint64(0x9E3779B97F4A7C15)) ^ bb
        return t.append_column("__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for _, sub in g.groupby(["__t", "__b"], sort=False):
            if len(sub) < 2:
                continue
            m = _normalize(np.stack(sub[emb_col].to_numpy()).astype(np.float64))
            ids = sub[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            m, ids = m[order], ids[order]
            sims = m @ m.T
            ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
            out_a.append(ids[ia]); out_b.append(ids[ib]); out_c.append(sims[ia, ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "cosine": np.concatenate(out_c)})

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        return t.append_column("__q", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["id_a", "id_b"], as_index=False)["cosine"].first()

    return (
        # task closure: hashers derive lazily from (seed, table) on the
        # first batch — no pool startup, width = read parallelism
        ds.map_batches(_ExplodeBuckets(), batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(bucket_pairs), batch_format="pandas")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(arrow_out(dedup_pairs), batch_format="pandas")
    )


def cosine_near_dup_pairs(ds, threshold: float = 0.9, emb_col: str = "embedding",
                          id_col: str = "vec_id", block_col: str | None = None):
    """Embedding-cosine near-duplicate pairs.

    With ``block_col`` (e.g. an LSH bucket or label) the comparison is
    blocked per group — the scalable path. Without it, per-group =
    whole set (only for small corpora).
    """

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(np.stack(g[emb_col].to_numpy()).astype(np.float64))
        ids = g[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        m, ids = m[order], ids[order]
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cosine": sims[ia, ib]}
        )

    if block_col is None:
        import pyarrow as _pa

        def all_one(t: _pa.Table) -> _pa.Table:
            return t.append_column("__blk", _pa.array(np.zeros(t.num_rows, dtype=np.int8)))

        ds = ds.map_batches(all_one, batch_format="pyarrow")
        block_col = "__blk"
    return ds.groupby(block_col).map_groups(arrow_out(pairs), batch_format="pandas")


def label_centroids(ds, emb_col: str = "embedding", label_col: str = "label",
                    num_partitions: int = 8):
    """Per-class embedding centroids (prototype vectors — the building
    block of nearest-class-mean classifiers, k-means seeding, and
    class-balanced coreset selection).

    Partial+final mean: each block computes per-label (sum, count)
    over its embedding matrix in ONE pandas groupby-sum over d columns
    (zero-copy flatten → reshape; no per-row Python), emitting
    labels×d tiny partial rows; the merge exchange is label-hash
    partitioned. Embeddings themselves never shuffle.

    Output: ``(label, dim, centroid)`` long-format rows (labels × d).
    """
    import pandas as pd

    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        offs = np.asarray(emb.offsets, dtype=np.int64)
        widths = offs[1:] - offs[:-1]
        d = int(widths[0]) if len(widths) else 0
        if len(widths) and not (widths == d).all():
            raise ValueError("ragged embedding column")
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        mat = flat.reshape(-1, d) if d else flat.reshape(0, 0)
        labels = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(mat)
        df["__l"] = labels
        g = df.groupby("__l", dropna=False)
        sums = g.sum()
        ns = g.size()
        out = sums.reset_index().melt(id_vars="__l", var_name="dim",
                                      value_name="s")
        out["dim"] = out["dim"].astype(np.int64)
        out["n"] = ns.reindex(out["__l"]).to_numpy(np.int64)
        out["__p"] = (out["__l"].to_numpy(np.uint64)
                      % np.uint64(P)).astype(np.int64)
        return pa_from_pandas(out.rename(columns={"__l": "label"}))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["label", "dim"], as_index=False, dropna=False) \
            .agg(s=("s", "sum"), n=("n", "sum"))
        agg["centroid"] = agg["s"] / agg["n"]
        return agg[["label", "dim", "centroid"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    )


def nearest_centroid_confusion(ds, emb_col: str = "embedding",
                               label_col: str = "label",
                               num_partitions: int = 8):
    """Nearest-class-mean classification audit: assign every vector to
    its nearest label centroid (squared L2, ties → smallest label) and
    report the confusion counts ``(label, pred, n)`` — the standard
    quick check of embedding-space class separability.

    Two passes: the centroid table (labels × d — tiny) comes from
    ``label_centroids`` and broadcasts in the task closure; the
    classify pass is one numpy matmul per batch (argmin of
    ``|c|² − 2·X·Cᵀ``, same first-minimum tie rule as SQL's
    ``ORDER BY dist, label``) with per-block pre-counted confusion
    partials. Embeddings never shuffle.
    """
    import pandas as pd

    cent = label_centroids(ds, emb_col, label_col, num_partitions) \
        .to_pandas().sort_values(["label", "dim"])
    labels = np.sort(cent["label"].unique())
    d = int(cent["dim"].max()) + 1
    C = cent.pivot(index="label", columns="dim", values="centroid") \
        .loc[labels].to_numpy(np.float64)          # (L, d) label-ascending
    c2 = (C * C).sum(axis=1)

    def classify(t: pa.Table) -> pa.Table:
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, d)
        # argmin_j |x−c_j|² = argmin_j (|c_j|² − 2·x·c_j); first minimum
        # wins, and rows of C are label-ascending → ties pick the
        # smallest label, matching the SQL ORDER BY dist, label rule
        scores = c2[None, :] - 2.0 * (X @ C.T)
        pred = labels[np.argmin(scores, axis=1)]
        df = pd.DataFrame({
            "label": t[label_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "pred": pred.astype(np.int64),
        })
        out = df.groupby(["label", "pred"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["__p"] = (out["label"].to_numpy(np.uint64)
                      % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["label", "pred"], as_index=False)["n"].sum()
        return out.astype({"label": "int64", "pred": "int64", "n": "int64"})

    return (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def kmeans_fit(ds, k: int = 4, iters: int = 2,
               emb_col: str = "embedding", id_col: str = "vec_id"):
    """The fit loop of distributed Lloyd's k-means (shared by
    ``kmeans_lloyd`` and ``semdedup``): seeds are the ``k`` vectors with
    the smallest ids (cluster label = seed id, label-ascending), each
    iteration assigns every vector to its nearest centroid (squared L2,
    smallest-label ties) and recomputes centroids as exact means.

    Distribution shape per iteration — the textbook scalable k-means:
    centroids broadcast (k×d floats), ONE matmul-argmin pass per batch
    emitting per-cluster (sum, count) partials (k×d rows per block),
    driver-merged update. Embeddings never shuffle; seeds come from a
    per-block min-k combiner, not a sort.

    Returns ``(labels, C)``: the k cluster labels (seed ids, ascending)
    and the final (k, d) centroid matrix.
    """

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="mergesort")[:k]
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return pa.table({id_col: pa.array(ids[take], type=pa.int64()),
                         emb_col: emb.take(pa.array(take))})

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values(id_col).head(k)
    labels = seeds[id_col].to_numpy(np.int64)
    C = np.stack(seeds[emb_col].to_numpy()).astype(np.float64)
    d = C.shape[1]

    def make_assign(Cmat):
        c2 = (Cmat * Cmat).sum(axis=1)

        def assign(t: pa.Table) -> pa.Table:
            emb = t[emb_col]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            X = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, d)
            a = np.argmin(c2[None, :] - 2.0 * (X @ Cmat.T), axis=1)
            return a, X

        return assign

    for _ in range(iters):
        assign = make_assign(C)

        def moment(t: pa.Table, _assign=assign) -> pa.Table:
            a, X = _assign(t)
            sums = np.zeros((k, d))
            np.add.at(sums, a, X)
            ns = np.bincount(a, minlength=k)
            nz = np.nonzero(ns)[0]
            return pa.table({
                "c": pa.array(nz, type=pa.int64()),
                "n": pa.array(ns[nz], type=pa.int64()),
                "s": pa.array(list(sums[nz]), type=pa.list_(pa.float64())),
            })

        parts = ds.map_batches(moment, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, d))
        ns = np.zeros(k, dtype=np.int64)
        for _, row in parts.iterrows():
            sums[row["c"]] += np.asarray(row["s"])
            ns[row["c"]] += row["n"]
        nonempty = ns > 0
        C = np.where(nonempty[:, None], sums / np.maximum(ns, 1)[:, None], C)

    return labels, C


def _centroid_assigner(labels: np.ndarray, C: np.ndarray, emb_col: str):
    """Per-batch nearest-centroid assignment closure over a fitted
    (labels, C): argmin of ``|c|² − 2·X·Cᵀ`` with first-minimum ties →
    smallest label (rows of C are label-ascending), matching the SQL
    ``ROW_NUMBER() OVER (ORDER BY d2, cl)`` rule."""
    c2 = (C * C).sum(axis=1)
    d = C.shape[1]

    def assign(t: pa.Table):
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        X = np.asarray(emb.flatten(), dtype=np.float64).reshape(-1, d)
        return np.argmin(c2[None, :] - 2.0 * (X @ C.T), axis=1), X

    return assign


def kmeans_lloyd(ds, k: int = 4, iters: int = 2,
                 emb_col: str = "embedding", id_col: str = "vec_id",
                 num_partitions: int = 8):
    """Distributed Lloyd's k-means (see ``kmeans_fit`` for the loop
    shape); after ``iters`` exact updates the final assignment is
    rolled up per cluster.

    Output: ``(cluster, n, sum_ids)`` for the final assignment.
    """
    labels, C = kmeans_fit(ds, k, iters, emb_col, id_col)
    assign = _centroid_assigner(labels, C, emb_col)

    def final(t: pa.Table) -> pa.Table:
        a, _ = assign(t)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cluster": labels[a], "id": ids})
        out = df.groupby("cluster", as_index=False).agg(
            n=("id", "size"), sum_ids=("id", "sum"))
        return pa_from_pandas(out)

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cluster", as_index=False).agg(
            n=("n", "sum"), sum_ids=("sum_ids", "sum"))
        return out.astype({"cluster": "int64", "n": "int64",
                           "sum_ids": "int64"})

    return (
        ds.map_batches(final, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def semdedup(ds, k: int = 4, iters: int = 2, threshold: float = 0.9,
             emb_col: str = "embedding", id_col: str = "vec_id",
             num_partitions: int = 64):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters the embedding space, cosine
    near-duplicate pairs are found WITHIN each cluster only, and each
    connected near-dup group keeps its smallest id. Returns every row
    tagged ``(id, cluster_id, keep)`` — filter ``keep`` downstream for
    the semantically deduplicated corpus.

    Scale shape: the k-means fit broadcasts k×d centroids per iteration
    and never shuffles embeddings (``kmeans_fit``); the assignment pass
    is one matmul-argmin ``map_batches`` adding an int cluster column;
    the pairwise stage shuffles embeddings ONCE on the cluster key and
    is O(|cluster|²) per group — at corpus scale, size k so clusters
    stay bounded (the paper uses k ≈ n/100; cost falls k-fold vs
    all-pairs). Component completion reuses the distributed min-label
    propagation of ``stages/cluster.py``.
    """
    from .cluster import dedup_by_clusters

    labels, C = kmeans_fit(ds, k, iters, emb_col, id_col)
    assign = _centroid_assigner(labels, C, emb_col)

    def tag(t: pa.Table) -> pa.Table:
        a, _ = assign(t)
        return t.append_column("__cl", pa.array(labels[a], type=pa.int64()))

    pairs = cosine_near_dup_pairs(
        ds.map_batches(tag, batch_format="pyarrow"),
        threshold=threshold, emb_col=emb_col, id_col=id_col,
        block_col="__cl")
    pairs = pairs.map_batches(
        lambda t: pa.table({"id_a": pa.array(
            t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "id_b": pa.array(
            t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64))}),
        batch_format="pyarrow")
    ids = ds.select_columns([id_col])
    return dedup_by_clusters(ids, pairs, id_col=id_col,
                             num_partitions=num_partitions)


def gram_power_iteration(ds, col: str = "embedding", scale: int = 10_000):
    """Distributed EXACT Gram matrix + 2-step power iteration — the
    dominant-direction probe of PCA, made bit-exact: embeddings are
    quantized to integers (``floor(x·scale + 0.5)``, the same half-up
    rule as the cents transform), each batch reduces to ONE d×d int64
    matmul partial ``Qᵀ Q`` (exact — no float summation order), partials
    merge in a tiny (i, j) groupby-sum, and the driver runs the power
    steps ``v₂ = G (G 1)`` in arbitrary-precision Python ints on the
    d² ≈ 4k-row matrix. Every value is exactly reproducible at any
    parallelism, and a SQL twin follows via HUGEINT arithmetic.

    Scale shape: embeddings never shuffle; the wire carries d² int64
    rows per block; driver state is d², independent of corpus size.
    Returns one row per dimension: (dim, v2) with v2 as a decimal
    string (the magnitudes exceed int64; HUGEINT prints the same)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        e = t[col]
        if isinstance(e, pa.ChunkedArray):
            e = e.combine_chunks()
        d = len(e[0])
        x = e.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        x = x.reshape(-1, d)
        q = np.floor(x * scale + 0.5).astype(np.int64)
        g = q.T @ q
        ii, jj = np.indices((d, d))
        return pa.table({"i": pa.array(ii.ravel(), pa.int64()),
                         "j": pa.array(jj.ravel(), pa.int64()),
                         "v": pa.array(g.ravel(), pa.int64())})

    gram = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("v", alias_name="v"))
        .to_pandas()
    )
    d = int(gram["i"].max()) + 1
    M = [[0] * d for _ in range(d)]
    for i, j, v in zip(gram["i"], gram["j"], gram["v"]):
        M[int(i)][int(j)] = int(v)  # exact Python ints from here on
    v1 = [sum(M[i][j] for j in range(d)) for i in range(d)]
    v2 = [sum(M[i][j] * v1[j] for j in range(d)) for i in range(d)]
    return pa.table({"dim": pa.array(range(d), pa.int64()),
                     "v2": pa.array([str(x) for x in v2], pa.string())})


def knn_graph(ds, k: int = 3, emb_col: str = "embedding",
              id_col: str = "vec_id", pairs_per_task: int = 1):
    """Exact all-kNN self-join (the kNN-graph construction behind
    SemDeDup-style curation, UMAP neighborhoods and graph-based dedup):
    every vector's top-k cosine neighbors, self excluded.

    Distributed shape: the corpus materializes once into object-store
    blocks; a Dataset of (query-block, corpus-block) index pairs fans
    the O(B²) block-pair matmuls out as tasks (each task zero-copy
    reads two blocks via their refs — the corpus is never broadcast
    whole and never re-shipped per task pair beyond the object store's
    locality-aware fetch). Block-local top-k partials merge with the
    same vectorized lexsort merge as ``brute_force_topk`` — bounded by
    B × k rows per query.

    Exact all-pairs is inherently O(n²·d) compute; this is the
    oracle-verifiable baseline. The scale path is the same top-k merge
    fed by IVF/LSH candidate blocking (``ivf_topk`` / ``lsh_bucket_topk``
    with the corpus as queries, or ``cosine_near_dup_pairs`` /
    ``semdedup`` for threshold graphs)."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs = [r for r in mat.to_arrow_refs()]
    B = len(refs)

    def score(t: pa.Table) -> pa.Table:
        outs = []
        for qi, cj in zip(t["qi"].to_pylist(), t["cj"].to_pylist()):
            tq, tc = ray.get(refs[qi]), ray.get(refs[cj])
            if tq.num_rows == 0 or tc.num_rows == 0:
                continue
            Xq = _normalize(_to_matrix(tq[emb_col]))
            Xc = _normalize(_to_matrix(tc[emb_col]))
            qids = tq[id_col].to_numpy(zero_copy_only=False)
            cids = tc[id_col].to_numpy(zero_copy_only=False)
            sims = Xq @ Xc.T
            sims[qids[:, None] == cids[None, :]] = -np.inf  # no self edge
            kk = min(k, sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(len(qids)), kk)
            cols = part.ravel()
            keep = np.isfinite(sims[rows, cols])
            outs.append(pa.table({
                "query_id": pa.array(qids[rows[keep]]),
                id_col: pa.array(cids[cols[keep]]),
                "cosine": pa.array(sims[rows[keep], cols[keep]],
                                   type=pa.float64()),
            }))
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    pairs = rd.from_items([{"qi": i, "cj": j}
                           for i in range(B) for j in range(B)])
    partial = pairs.map_batches(score, batch_format="pyarrow",
                                batch_size=pairs_per_task)
    return _merge_topk_partials(partial, k, id_col)


class HardNegativeTopK(BruteForceTopK):
    """Hard-negative mining for metric learning: per probe, the top-k
    most-similar vectors whose LABEL DIFFERS from the probe's (the
    embedding-space confusables a contrastive objective needs). Same
    block-local top-k partial shape as BruteForceTopK with a vectorized
    (same-label ∪ self-id) mask; invalid candidates score -inf and are
    dropped at emit, so under-filled blocks never leak sentinel rows."""

    def __init__(self, queries, query_labels, k: int = 10,
                 emb_col: str = "embedding", id_col: str = "vec_id",
                 label_col: str = "label", query_ids=None):
        super().__init__(queries, k, emb_col, id_col, query_ids)
        self.qlabels = np.asarray(query_labels)
        self.label_col = label_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(t[self.emb_col]))
        sims = self.q @ m.T
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = t[self.label_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        mask = (labels[None, :] == self.qlabels[:, None]) | \
               (ids[None, :] == self.qids[:, None])
        sims = np.where(mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            sel = part[qi]
            ok = np.isfinite(sims[qi, sel])
            out_q.append(np.full(int(ok.sum()), self.qids[qi]))
            out_id.append(ids[sel][ok])
            out_sim.append(sims[qi, sel][ok])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
            self.id_col: pa.array(np.concatenate(out_id)),
            "cosine": pa.array(np.concatenate(out_sim), pa.float64()),
        })


def hard_negatives(ds, probe_filter, k: int = 3,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   label_col: str = "label"):
    """Mine top-k hard negatives for every probe row (``probe_filter``:
    arrow-compute predicate over the table). Probes collect driver-side
    (they are FEW by construction); the corpus streams once through the
    masked scorer in task closures; the global merge is the shared
    bounded lexsort."""
    probes = ds.map_batches(
        lambda t: t.filter(probe_filter(t)), batch_format="pyarrow"
    ).materialize()
    pt = pa.concat_tables(list(probes.iter_batches(batch_format="pyarrow")))
    q = _to_matrix(pt[emb_col])
    scorer = HardNegativeTopK(
        q, pt[label_col].to_numpy(zero_copy_only=False).astype(np.int64),
        k=k, emb_col=emb_col, id_col=id_col, label_col=label_col,
        query_ids=pt[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
    partial = ds.map_batches(scorer, batch_format="pyarrow")
    return _merge_topk_partials(partial, k, id_col)


def _pq_fit(ds, splits: list[tuple[int, int]], k: int, iters: int,
            emb_col: str, id_col: str):
    """Train one Lloyd codebook per dimension slice on PROJECTED views
    (slice-reshape per batch — embeddings never shuffle). Returns
    [(labels, C, lo, hi), …] in split order."""
    fitted = []
    for lo, hi in splits:
        def project(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            emb = t[emb_col]
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            n = len(t)
            if n == 0:
                return pa.table({id_col: t[id_col], emb_col: emb})
            flat = np.asarray(emb.flatten(), dtype=np.float32)
            sub = np.ascontiguousarray(
                flat.reshape(n, flat.size // n)[:, lo:hi])
            return pa.table({
                id_col: t[id_col],
                emb_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(sub.ravel()), hi - lo)})

        labels, C = kmeans_fit(ds.map_batches(project, batch_format="pyarrow"),
                               k=k, iters=iters, emb_col=emb_col,
                               id_col=id_col)
        fitted.append((labels, C, lo, hi))
    return fitted


def pq_codes(ds, splits: list[tuple[int, int]], k: int = 4, iters: int = 2,
             emb_col: str = "embedding", id_col: str = "vec_id"):
    """Product quantization (Jégou, Douze & Schmid 2011, "Product
    Quantization for Nearest Neighbor Search"): train an independent
    k-codeword Lloyd codebook per dimension SLICE, assign every vector
    its tuple of per-subspace codes, and roll up the code-tuple
    histogram — the codebook/assignment layer an IVF-PQ index builds
    on. Codes are the per-subspace cluster labels (seed ids,
    ascending), so the SQL twin is the SAME unrolled kmeans CTE chain
    per subspace with a dim-range filter.

    Scale shape: each subspace fit is ``kmeans_fit`` on a PROJECTED
    view (slice reshape per batch — embeddings never shuffle, k×d_sub
    centroid partials only); the final pass assigns all m codes in one
    read and emits per-block (code tuple, n) partials into a compact
    exchange. Train-on-sample is the production escape hatch; here
    every vector trains so the oracle is exact."""
    from .agg import compact_groupby

    fitted = _pq_fit(ds, splits, k, iters, emb_col, id_col)
    names = [f"code_{chr(ord('a') + i)}" for i in range(len(splits))]

    def assign_codes(t: pa.Table) -> pa.Table:
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(t)
        cols = {}
        if n == 0:
            return pa.table({nm: pa.array([], pa.int64()) for nm in names}
                            | {"n": pa.array([], pa.int64())})
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        X = flat.reshape(n, flat.size // n)
        for nm, (labels, C, lo, hi) in zip(names, fitted):
            c2 = (C * C).sum(axis=1)
            a = np.argmin(c2[None, :] - 2.0 * (X[:, lo:hi] @ C.T), axis=1)
            cols[nm] = labels[a]
        df = pd.DataFrame(cols)
        out = df.groupby(names, as_index=False).size().rename(
            columns={"size": "n"})
        return pa_from_pandas(out.astype({nm: "int64" for nm in names}
                                         | {"n": "int64"}))

    return compact_groupby(ds.map_batches(assign_codes,
                                          batch_format="pyarrow"),
                           names, sum_cols={"n": "n"})


def pq_adc_topk(ds, query: np.ndarray, splits: list[tuple[int, int]],
                k_codes: int = 4, iters: int = 2, topk: int = 10,
                emb_col: str = "embedding", id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over PQ codes (Jégou et al.
    2011 §IV): per subspace, precompute the k-entry table
    ``dist_s[j] = ‖q_s − C_s[j]‖²`` ONCE, then every vector's
    approximate distance is m table lookups + a sum — the search never
    touches raw floats again. Per-block local top-k partials merge in
    one vectorized lexsort pass (no full-dataset sort, no driver heap).
    Ties break by id ascending; output is the topk id list with the
    approximate distance."""
    fitted = _pq_fit(ds, splits, k_codes, iters, emb_col, id_col)
    q = np.asarray(query, dtype=np.float64).ravel()
    tables = [((C - q[lo:hi][None, :]) ** 2).sum(axis=1)
              for (_, C, lo, hi) in fitted]

    def local_topk(t: pa.Table) -> pa.Table:
        emb = t[emb_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(t)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        flat = np.asarray(emb.flatten(), dtype=np.float64)
        X = flat.reshape(n, flat.size // n)
        dist = np.zeros(n, dtype=np.float64)
        for (labels, C, lo, hi), tab in zip(fitted, tables):
            c2 = (C * C).sum(axis=1)
            a = np.argmin(c2[None, :] - 2.0 * (X[:, lo:hi] @ C.T), axis=1)
            dist += tab[a]
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dist))[:topk]
        # negative distance rides the shared "cosine desc" merge rail
        return pa.table({"query_id": pa.array(np.zeros(len(order), np.int64)),
                         id_col: pa.array(ids[order]),
                         "cosine": pa.array(-dist[order])})

    partial = ds.map_batches(local_topk, batch_format="pyarrow")
    merged = _merge_topk_partials(partial, topk, id_col)
    return pa.table({id_col: merged[id_col],
                     "adc_dist": pa.array(
                         -merged["cosine"].to_numpy(zero_copy_only=False))})
