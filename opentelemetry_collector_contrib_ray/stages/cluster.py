"""Connected-components clustering over a near-duplicate pair graph,
plus the keep-one-canonical-per-cluster step that completes a
production dedup pipeline: pairs (MinHash-LSH / exact n-gram Jaccard /
embedding near-dup) → components → keep min-id doc per component.

The reference engine has no graph stage — this is one of the
"operations a large-scale training-data pipeline would need" from the
brief (fuzzy dedup in practice is pair generation THEN clustering;
dropping only one side of each pair over-deletes on transitive chains
A~B~C).

Algorithm: distributed min-label propagation ("hash-min"), the classic
MapReduce connected-components scheme (Rastogi et al., "Finding
Connected Components in Map-Reduce in Logarithmic Rounds" /
Kiveris et al. CC-MR — public literature):

- State: one ``(node, label)`` row per node of the PAIR GRAPH (not the
  corpus); labels start as the node id and only ever decrease.
- Round: edges and labels are co-partitioned by ``node % P``; inside a
  partition a vectorized pandas merge sends each node's label along its
  out-edges; messages re-partition by destination and a min-reduce
  yields the new labels. Two small-int-row exchanges per round; the
  corpus text never participates.
- Convergence: the min label of a component spreads ≥1 hop per round,
  so rounds ≤ graph diameter (near-dup clusters are shallow, typically
  2–4). Labels are non-increasing, so an unchanged ``sum(label)`` (one
  cheap aggregate on the tiny label table) detects the fixpoint.

Scale notes (100 TB): the label/edge tables are proportional to the
number of near-duplicate DOCUMENTS/PAIRS, not corpus bytes — orders of
magnitude smaller than the input. Per-round ``materialize()`` on the
label table is deliberate (iterative algorithms must pin each round's
result or the lineage re-executes); it is the only materialization and
it is on the small side. The final cluster-id attach over the corpus is
a broadcast (labels ``ray.put`` once, ``np.searchsorted`` per batch),
not a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .base import arrow_out


_EMPTY_LABELS = pa.table({
    "node": pa.array([], type=pa.int64()),
    "label": pa.array([], type=pa.int64()),
})


def _local_cc(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Driver-local vectorized min-label propagation with pointer
    jumping — O(E) numpy scatter per round, O(log n) rounds."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(nodes))
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, ia, lab[ib])
        np.minimum.at(nxt, ib, lab[ia])
        nxt = nxt[nxt]  # pointer jumping halves tree depth per round
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    # nodes is ascending, so the min label INDEX is the min node id
    return nodes, nodes[lab]


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                         num_partitions: int = 64, max_iters: int = 64,
                         local_threshold: int = 4_000_000):
    """Pair Dataset → ``(node, label)`` Dataset, label = min node id in
    the node's connected component. Only nodes that appear in ``pairs``
    are returned (singletons are their own cluster by definition —
    ``attach_clusters`` fills them in without a shuffle).

    Size-gated execution: the edge table is materialized once (also
    needed by the loop), and when it holds ≤ ``local_threshold``
    directed rows (default 4M ≈ 64 MB of int64 — trivially
    driver-safe) the fixpoint runs as driver-local numpy min-label
    propagation with pointer jumping instead of the distributed loop —
    the per-round Ray exchange latency (~1 s × 2 exchanges × rounds)
    would otherwise dwarf the microseconds of real work on a small
    graph. Above the gate the distributed loop takes over unchanged."""
    import ray

    P = np.int64(num_partitions)

    def to_edges(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table({
            "part": pa.array(src % P),
            "a": pa.array(src),
            "b": pa.array(dst),
            "is_edge": pa.array(np.ones(len(src), dtype=np.int8)),
        })

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_EMPTY_LABELS)
    if n_edges <= local_threshold:
        et = edges.to_pandas()
        src = et["a"].to_numpy().astype(np.int64)
        dst = et["b"].to_numpy().astype(np.int64)
        nodes, labels = _local_cc(src, dst)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "label": pa.array(labels, type=pa.int64()),
        }))

    def init_labels(g: pd.DataFrame) -> pa.Table:
        nodes = np.unique(g["a"].to_numpy())
        return pa.table({
            "part": pa.array(nodes % P), "a": pa.array(nodes),
            "b": pa.array(nodes),
            "is_edge": pa.array(np.zeros(len(nodes), dtype=np.int8)),
        })

    labels = (
        edges.groupby("part")
        .map_groups(arrow_out(init_labels), batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("b")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        """One node-partition: push each co-located node's label along
        its out-edges; keep the identity row so no node loses its
        label. Local min-combiner before the exchange."""
        e = g[g["is_edge"] == 1]
        l = g[g["is_edge"] == 0]
        l = l.astype({"a": np.int64, "b": np.int64})
        m = e.merge(l[["a", "b"]].rename(columns={"b": "lab"}), on="a", how="inner")
        node = np.concatenate([m["b"].to_numpy(), l["a"].to_numpy()])
        cand = np.concatenate([m["lab"].to_numpy(), l["b"].to_numpy()])
        df = pd.DataFrame({"node": node, "cand": cand})
        df = df.groupby("node", as_index=False)["cand"].min()
        nodes = df["node"].to_numpy()
        return pa.table({
            "part": pa.array(nodes % P), "node": pa.array(nodes),
            "cand": pa.array(df["cand"].to_numpy()),
        })

    def reduce_min(g: pd.DataFrame) -> pa.Table:
        m = g.groupby("node", as_index=False)["cand"].min()
        nodes = m["node"].to_numpy()
        return pa.table({
            "part": pa.array(nodes % P), "a": pa.array(nodes),
            "b": pa.array(m["cand"].to_numpy()),
            "is_edge": pa.array(np.zeros(len(m), dtype=np.int8)),
        })

    for _ in range(max_iters):
        msgs = edges.union(labels).groupby("part").map_groups(
            emit, batch_format="pandas"
        )
        labels = (
            msgs.groupby("part")
            .map_groups(arrow_out(reduce_min), batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.sum("b")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["a"], "label": t["b"]}),
        batch_format="pyarrow",
    )


def attach_clusters(docs, labels, id_col: str = "doc_id",
                    out_col: str = "cluster_id", keep_col: str = "keep",
                    broadcast_threshold: int | None = None):
    """Attach the component-label table to the corpus: every doc gets
    ``cluster_id`` (= itself for singletons) and ``keep`` (is it the
    canonical min-id member).

    Size-gated (the ``gated_broadcast_join`` contract from
    stages/joins.py): a label table at or under the broadcast
    threshold ships ONCE via ``ray.put`` and resolves with a
    ``np.searchsorted`` lookup per batch — no shuffle over the corpus.
    Above the threshold the label table is corpus-proportional (high
    dup rates at 100 TB make the near-dup node set scale with the
    input), so broadcasting it to every task would replicate
    gigabytes; the plan falls back to ONE hash-partitioned native
    left join on the id column, then a vectorized null-fill — same
    rows, one exchange of the (narrow) id/label columns."""
    import ray

    from .joins import (BROADCAST_ROWS_THRESHOLD, _rows_estimate,
                        bucketed_hash_join)

    thr = (BROADCAST_ROWS_THRESHOLD if broadcast_threshold is None
           else broadcast_threshold)
    n = _rows_estimate(labels)
    if n is None:
        labels = labels.materialize()
        n = labels.count()

    if n > thr:
        joined = bucketed_hash_join(docs, labels, on=id_col,
                                    right_on="node", how="left")

        def finalize(t: pa.Table) -> pa.Table:
            ids = pc.cast(t[id_col], pa.int64())
            lab_c = pc.cast(t["label"], pa.int64())
            cluster = pc.if_else(pc.is_null(lab_c), ids, lab_c)
            t = t.drop_columns(["label"])
            t = t.append_column(out_col, cluster)
            return t.append_column(keep_col, pc.equal(cluster, ids))

        return joined.map_batches(finalize, batch_format="pyarrow")

    lab = labels.to_pandas()
    if len(lab) == 0 or "node" not in lab.columns:
        nodes = np.array([], dtype=np.int64)
        labs = np.array([], dtype=np.int64)
    else:
        nodes = lab["node"].to_numpy().astype(np.int64)
        labs = lab["label"].to_numpy().astype(np.int64)
    order = np.argsort(nodes, kind="stable")
    ref = ray.put((nodes[order], labs[order]))

    def tag(t: pa.Table) -> pa.Table:
        nodes_s, labs_s = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nodes_s) == 0:
            cluster = ids
        else:
            pos = np.minimum(np.searchsorted(nodes_s, ids), len(nodes_s) - 1)
            cluster = np.where(nodes_s[pos] == ids, labs_s[pos], ids)
        t = t.append_column(out_col, pa.array(cluster, type=pa.int64()))
        return t.append_column(keep_col, pa.array(cluster == ids))

    return docs.map_batches(tag, batch_format="pyarrow")


def dedup_by_clusters(docs, pairs, id_col: str = "doc_id",
                      id_a: str = "id_a", id_b: str = "id_b",
                      num_partitions: int = 64,
                      broadcast_threshold: int | None = None):
    """End-to-end fuzzy-dedup completion: pairs → components → tag the
    corpus with ``cluster_id``/``keep``. Filter ``keep`` downstream to
    materialize the deduplicated corpus."""
    labels = connected_components(pairs, id_a=id_a, id_b=id_b,
                                  num_partitions=num_partitions)
    return attach_clusters(docs, labels, id_col=id_col,
                           broadcast_threshold=broadcast_threshold)


def _sorted_lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray,
                   default: int = -1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized sorted-array dict: returns (found_mask, value-or-default)
    for each probe id. ``keys`` must be sorted ascending."""
    if len(keys) == 0:
        return (np.zeros(len(probe), dtype=bool),
                np.full(len(probe), default, dtype=np.int64))
    pos = np.minimum(np.searchsorted(keys, probe), len(keys) - 1)
    found = keys[pos] == probe
    return found, np.where(found, vals[pos], default)


def dbscan_labels(points, pairs, id_col: str = "vec_id", min_pts: int = 5,
                  num_partitions: int = 64):
    """DBSCAN (Ester et al., KDD 1996 — public literature) over a
    precomputed ε-neighbor PAIR Dataset: the density-based clustering a
    semantic-grouping / fuzzy-dedup pipeline reaches for when flat
    connected components over-merge — a single sparse bridge point
    chains two dense groups, while DBSCAN only walks cluster identity
    through CORE points, so bridges demote to border/noise instead of
    gluing clusters.

    Deterministic semantics (classic DBSCAN's border assignment is
    scan-order-dependent; this pins it so a SQL twin can agree exactly):

    - ``degree(p)`` = # ε-neighbors in the pair graph; core ⇔
      ``degree + 1 ≥ min_pts`` (the point itself counts).
    - clusters = connected components of the CORE-CORE subgraph,
      labeled min core id (an isolated core keeps its own id).
    - border = non-core with ≥1 core neighbor → MIN over its core
      neighbors' cluster ids.
    - noise = everything else; ``cluster_id`` −1.

    Scale shape: the pair Dataset materializes ONCE (it is O(ε-pairs),
    the same contract as ``connected_components``); degree and the
    border-min are each ONE hash exchange of narrow int64 rows
    (``hash_groupby_agg`` — unbounded key cardinality); the
    core/label/border tables ride the ``attach_clusters`` broadcast
    contract (∝ ε-graph nodes, NOT corpus bytes — swap the attaches for
    ``large_semi_join``/``bucketed_hash_join`` when the ε-graph itself
    is corpus-scale). Embeddings/text never shuffle: pair generation is
    the caller's choice (LSH-blocked at 100 TB, exact all-pairs in
    tests).

    Returns one row per ``points`` row: (id_col, role ∈
    {core,border,noise}, cluster_id int64).
    """
    import ray

    from .agg import hash_groupby_agg

    pm = pairs.materialize()

    def explode(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": np.concatenate([a, b]),
                         "one": np.ones(2 * len(a), dtype=np.int64)})

    deg = hash_groupby_agg(pm.map_batches(explode, batch_format="pyarrow"),
                           ["node"], {"one": ("sum", "n")},
                           num_partitions=num_partitions)
    degf = deg.to_pandas()
    if len(degf) == 0:
        core_nodes = np.array([], dtype=np.int64)
    else:
        dn = degf["node"].to_numpy().astype(np.int64)
        core_nodes = np.sort(dn[degf["n"].to_numpy().astype(np.int64) + 1
                                >= min_pts])

    # core-core subgraph → components (min-core-id labels)
    def core_pairs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        fa, _ = _sorted_lookup(core_nodes, core_nodes, a)
        fb, _ = _sorted_lookup(core_nodes, core_nodes, b)
        m = fa & fb
        return pa.table({"id_a": a[m], "id_b": b[m]})

    labels = connected_components(pm.map_batches(core_pairs,
                                                 batch_format="pyarrow"),
                                  num_partitions=num_partitions).to_pandas()
    lab_k = (labels["node"].to_numpy().astype(np.int64)
             if len(labels) else np.array([], dtype=np.int64))
    lab_v = (labels["label"].to_numpy().astype(np.int64)
             if len(labels) else np.array([], dtype=np.int64))
    o = np.argsort(lab_k, kind="stable")
    lab_k, lab_v = lab_k[o], lab_v[o]
    # corelab: component label if the core has core neighbors, else self
    _, core_clusters = _sorted_lookup(lab_k, lab_v, core_nodes)
    core_clusters = np.where(core_clusters < 0, core_nodes, core_clusters)

    # border candidates: one (node, cand) row per (non-core, core) pair
    # side — ONE hash exchange min-reduces them per node
    def border_cands(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        fa, ca = _sorted_lookup(core_nodes, core_clusters, a)
        fb, cb = _sorted_lookup(core_nodes, core_clusters, b)
        # a not core, b core  → a gets cb;  b not core, a core → b gets ca
        na = ~fa & fb
        nb = ~fb & fa
        return pa.table({
            "node": np.concatenate([a[na], b[nb]]),
            "cand": np.concatenate([cb[na], ca[nb]]),
        })

    bmin = hash_groupby_agg(pm.map_batches(border_cands,
                                           batch_format="pyarrow"),
                            ["node"], {"cand": ("min", "cluster_id")},
                            num_partitions=num_partitions).to_pandas()
    bk = (bmin["node"].to_numpy().astype(np.int64)
          if len(bmin) else np.array([], dtype=np.int64))
    bv = (bmin["cluster_id"].to_numpy().astype(np.int64)
          if len(bmin) else np.array([], dtype=np.int64))
    o = np.argsort(bk, kind="stable")
    bk, bv = bk[o], bv[o]

    ref = ray.put((core_nodes, core_clusters, bk, bv))

    def tag(t: pa.Table) -> pa.Table:
        cn, cc, bkk, bvv = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_core, ccl = _sorted_lookup(cn, cc, ids)
        is_bord, bcl = _sorted_lookup(bkk, bvv, ids)
        role = np.where(is_core, "core", np.where(is_bord, "border", "noise"))
        cluster = np.where(is_core, ccl, np.where(is_bord, bcl, -1))
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "role": pa.array(role.astype(object), type=pa.string()),
            "cluster_id": pa.array(cluster, type=pa.int64()),
        })

    return points.map_batches(tag, batch_format="pyarrow")
