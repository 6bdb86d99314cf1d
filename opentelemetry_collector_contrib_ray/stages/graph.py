"""Distributed graph analytics: exact triangle counting.

``triangle_counts`` implements the degree-ordered wedge-join algorithm
(Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of the
Last Reducer"; the node-iterator++ of Schank & Wagner 2005): orient
every edge from its lower-ranked endpoint to its higher-ranked one
under the total order (degree, node); generate wedges only at each
edge's LOWEST-ranked node — so a node of degree d contributes
O(min(d, √E)²) wedges, the arboricity bound that kills the hub-node
quadratic blowup a naive neighbor-pairing suffers — and hash-join the
wedge pairs against the distinct edge set. Each triangle is found
exactly once (at its unique lowest-ranked vertex).

Companion to the servicegraph/pagerank connectors (stages/
servicegraph.py): those aggregate EDGES from span pairs; this computes
closed-triad structure (triangles, clustering numerators) on any edge
table.

Scale shape: two all-to-all exchanges (distinct-edges by pair hash,
wedges+edges by pair hash) plus one compact rollup; the degree table
(O(nodes)) is broadcast once via ``ray.put`` for the orientation pass —
the documented assumption is node cardinality ≪ edge cardinality
(millions of nodes ≈ tens of MB; for billions of nodes the orientation
would become a hash join on each endpoint instead)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import compact_groupby
from .base import pa_from_pandas, arrow_out
from .tailsampling import ray_get_tables

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pair_part(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    h = a.astype(np.uint64) * _MIX ^ b.astype(np.uint64)
    return (h % np.uint64(n)).astype(np.int64)


def _wedge_pairs(u: np.ndarray, v: np.ndarray):
    """All (v_i, v_j) neighbor pairs per u-run — one combinations index
    per distinct run length, no per-run Python loop."""
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    lens = np.diff(np.r_[starts, len(u)])
    outs = []
    for d in np.unique(lens):
        if d < 2:
            continue
        runs = starts[lens == d]
        idx = runs[:, None] + np.arange(d)[None, :]
        block = v[idx]
        ia, ib = np.triu_indices(int(d), k=1)
        x, y = block[:, ia].ravel(), block[:, ib].ravel()
        swap = x > y
        outs.append((np.where(swap, y, x), np.where(swap, x, y),
                     np.repeat(u[runs], len(ia))))
    if not outs:
        z = np.array([], np.int64)
        return z, z.copy(), z.copy()
    return tuple(np.concatenate([o[i] for o in outs]) for i in range(3))


def _local_triangles(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Single-task triangle count on a collected distinct edge list —
    the same wedge-join, all numpy (dense-remapped node ids so pair
    keys fit int64). Identical output to the distributed path."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    nn = len(nodes)
    deg = np.bincount(ai, minlength=nn) + np.bincount(bi, minlength=nn)
    # orientation under (degree, node): dense ids are already
    # node-ordered, so (deg, dense_id) is the same total order
    a_first = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
    u = np.where(a_first, ai, bi)
    v = np.where(a_first, bi, ai)
    x, y, w = _wedge_pairs(u, v)
    ekey = np.sort(ai * nn + bi)
    wkey = x * nn + y
    if len(ekey):
        pos = np.minimum(np.searchsorted(ekey, wkey), len(ekey) - 1)
        match = ekey[pos] == wkey
    else:
        match = np.zeros(0, bool)
    tri = np.bincount(np.concatenate([w[match], x[match], y[match]]),
                      minlength=nn).astype(np.int64)
    degi = deg.astype(np.int64)
    return pa.table({"node": pa.array(nodes.astype(np.int64)),
                     "degree": pa.array(degi),
                     "triangles": pa.array(tri),
                     "wedges": pa.array(degi * (degi - 1) // 2)})


def triangle_counts(edges, src: str = "src", dst: str = "dst",
                    num_partitions: int = 64,
                    local_edges: int = 4_000_000) -> pa.Table:
    """Per-node (node, degree, triangles, wedges) over the undirected
    simple graph induced by the edge dataset (self-loops dropped,
    parallel edges collapsed). ``wedges = C(degree, 2)`` is the exact
    clustering-coefficient denominator, kept integer so the result is
    hash-comparable (cc = triangles / wedges downstream).

    Size gate (same pattern as cluster completion): once the DISTINCT
    edge list is known, a graph at or under ``local_edges`` edges runs
    the identical wedge-join in one numpy task instead of paying two
    more sort-exchanges of fixed latency; the distributed path is the
    over-gate shape."""
    import ray

    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src], pa.int64())
        b = pc.cast(t[dst], pa.int64())
        lo, hi = pc.min_element_wise(a, b), pc.max_element_wise(a, b)
        tt = pa.table({"a": lo, "b": hi}).filter(pc.not_equal(lo, hi))
        df = tt.to_pandas().drop_duplicates()        # local combiner
        an, bn = df["a"].to_numpy(), df["b"].to_numpy()
        return pa_from_pandas(df).append_column(
            "__p", pa.array(_pair_part(an, bn, num_partitions)))

    def distinct_part(g: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(g[["a", "b"]].drop_duplicates())

    e = (edges.map_batches(canon, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(distinct_part), batch_format="pandas")
              .materialize())     # reused by degrees, orientation, match

    if e.count() <= local_edges:
        # empty __p partitions emit schema-less zero-column blocks
        # (the known Ray map_groups empty-partition quirk) — drop them
        tabs = [t for t in ray_get_tables(e) if t.num_rows]
        if not tabs:
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "degree": z,
                             "triangles": z, "wedges": z})
        et = pa.concat_tables(tabs)
        return _local_triangles(et["a"].to_numpy(zero_copy_only=False),
                                et["b"].to_numpy(zero_copy_only=False))

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})

    deg_t = pa.concat_tables(ray_get_tables(compact_groupby(
        e.map_batches(node_rows, batch_format="pyarrow"),
        ["node"], count_alias="degree")))
    nodes = deg_t["node"].to_numpy(zero_copy_only=False)
    degs = deg_t["degree"].to_numpy(zero_copy_only=False)
    order = np.argsort(nodes)
    deg_ref = ray.put((nodes[order], degs[order]))

    def orient(t: pa.Table) -> pa.Table:
        ns, ds_ = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da, db = ds_[np.searchsorted(ns, a)], ds_[np.searchsorted(ns, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        u, v = np.where(a_first, a, b), np.where(a_first, b, a)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "__w": pa.array((u.astype(np.uint64) * _MIX
                                          % np.uint64(num_partitions))
                                         .astype(np.int64))})

    def wedges_part(g: pd.DataFrame) -> pa.Table:
        x, y, w = _wedge_pairs(g["u"].to_numpy(), g["v"].to_numpy())
        return pa.table({
            "x": pa.array(x), "y": pa.array(y), "w": pa.array(w),
            "kind": pa.array(np.ones(len(x), np.int8)),
            "__q": pa.array(_pair_part(x, y, num_partitions))})

    wedges = (e.map_batches(orient, batch_format="pyarrow")
               .groupby("__w")
               .map_groups(arrow_out(wedges_part), batch_format="pandas"))

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": t["a"], "y": t["b"],
            "w": pa.array(np.full(len(a), -1, np.int64)),
            "kind": pa.array(np.zeros(len(a), np.int8)),
            "__q": pa.array(_pair_part(a, b, num_partitions))})

    def match(g: pd.DataFrame) -> pa.Table:
        ed = g.loc[g["kind"] == 0, ["x", "y"]]
        wd = g.loc[g["kind"] == 1, ["x", "y", "w"]]
        m = wd.merge(ed, on=["x", "y"])
        node = np.concatenate([m["w"].to_numpy(), m["x"].to_numpy(),
                               m["y"].to_numpy()]).astype(np.int64)
        return pa.table({"node": pa.array(node)})

    tri_t = pa.concat_tables(ray_get_tables(compact_groupby(
        wedges.union(e.map_batches(edge_rows, batch_format="pyarrow"))
              .groupby("__q")
              .map_groups(arrow_out(match), batch_format="pandas"),
        ["node"], count_alias="triangles")))

    # final assembly on the two per-node tables (both already tiny)
    dd = pd.DataFrame({"node": nodes[order], "degree": degs[order]})
    td = tri_t.to_pandas()
    out = dd.merge(td, on="node", how="left")
    tri = out["triangles"].fillna(0).to_numpy().astype(np.int64)
    deg = out["degree"].to_numpy().astype(np.int64)
    return pa.table({
        "node": pa.array(out["node"].to_numpy().astype(np.int64)),
        "degree": pa.array(deg),
        "triangles": pa.array(tri),
        "wedges": pa.array(deg * (deg - 1) // 2),
    })


def kcore_degrees(edges, src: str = "src", dst: str = "dst", k: int = 3,
                  rounds: int = 8):
    """k-core peeling (Seidman 1983; Batagelj–Zaveršnik is the serial
    classic) bounded to ``rounds`` rounds: repeatedly drop nodes whose
    surviving degree is < k, then report each survivor's degree inside
    the core subgraph. ``rounds`` makes the operator deterministic and
    SQL-unrollable; when peeling converges earlier the extra rounds
    are no-ops, so the result IS the exact k-core.

    Scale shape: self-loops drop and endpoints canonicalize per block,
    per-block arrow distinct shrinks the stream BEFORE anything moves,
    then one compact exchange lands the O(distinct edges) rows in a
    single task that peels vectorized (value_counts + isin per round —
    never per-node Python). Right when the node domain is a fixed
    projection (as in the query twin); for billion-node graphs swap
    the final fold for ``rounds`` × (degree aggregate + two
    large_semi_joins on u and v) — same semantics, per-round
    exchanges instead of one."""

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(a, b)
        return pa.table({"a": pc.cast(a, pa.int64()),
                         "b": pc.cast(b, pa.int64())}).filter(keep)

    distinct = compact_groupby(edges.map_batches(canon, batch_format="pyarrow"),
                               ["a", "b"], count_alias="n")

    def peel(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b"]]
        for _ in range(rounds):
            if df.empty:
                break
            deg = pd.concat([df["a"], df["b"]]).value_counts()
            alive = deg[deg >= k].index
            keep = df["a"].isin(alive) & df["b"].isin(alive)
            if keep.all():
                break
            df = df[keep]
        deg = (pd.concat([df["a"], df["b"]]).value_counts()
               .rename_axis("node").reset_index(name="degree"))
        deg["node"] = deg["node"].astype("int64")
        deg["degree"] = deg["degree"].astype("int64")
        return pa.Table.from_pandas(deg, preserve_index=False)

    return distinct.map_batches(peel, batch_format="pyarrow", batch_size=None)


def label_propagation(edges, src: str = "src", dst: str = "dst",
                      rounds: int = 2):
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007), ``rounds`` rounds: every node starts
    labeled with itself, then each round adopts the most frequent
    label among its neighbors (ties → smallest label), all nodes
    updating simultaneously — deterministic, so the SQL twin unrolls
    the SAME rounds as MATERIALIZED CTE pairs (count → argmin-rank).

    Scale shape: identical front end to ``kcore_degrees`` (per-block
    canon + distinct before one compact exchange), then a vectorized
    groupby-count/sort/first fold per round over O(edges) compact
    rows; the per-round distributed variant is one label join + one
    (node, label) count exchange per round."""

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(a, b)
        return pa.table({"a": pc.cast(a, pa.int64()),
                         "b": pc.cast(b, pa.int64())}).filter(keep)

    distinct = compact_groupby(edges.map_batches(canon, batch_format="pyarrow"),
                               ["a", "b"], count_alias="n")

    def propagate(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b"]]
        sym = pd.DataFrame({
            "u": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
            "v": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()])})
        nodes = np.unique(sym["u"].to_numpy())
        lab = pd.Series(nodes, index=nodes)
        for _ in range(rounds):
            nl = sym.assign(lab=lab.reindex(sym["v"]).to_numpy())
            cnt = (nl.groupby(["u", "lab"], as_index=False).size()
                   .rename(columns={"size": "c"}))
            cnt = cnt.sort_values(["u", "c", "lab"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            first = cnt.groupby("u", as_index=False).first()
            lab = pd.Series(first["lab"].to_numpy(np.int64),
                            index=first["u"].to_numpy())
        out = pd.DataFrame({"node": lab.index.to_numpy(np.int64),
                            "label": lab.to_numpy(np.int64)})
        return pa.Table.from_pandas(out, preserve_index=False)

    return distinct.map_batches(propagate, batch_format="pyarrow",
                                batch_size=None)


def bfs_hops(edges, seed_mod: int, max_hops: int = 6,
             src: str = "src", dst: str = "dst"):
    """Multi-source breadth-first search: shortest hop distance from a
    seed set (nodes with ``node % seed_mod == 0``) to every reachable
    node within ``max_hops`` hops of the undirected simple graph — the
    blast-radius / dependency-distance query a service graph answers
    ("everything within k hops of the failing tier"). Capping the hop
    count makes the operator deterministic and SQL-twinnable: the
    recursive-CTE twin carries the same ``hop < max_hops`` guard, and
    both engines report MIN(hop) per node, so when BFS converges before
    the cap the result IS the exact hop distance.

    Scale shape: same front end as ``kcore_degrees`` (per-block
    canonicalize + arrow distinct shrink BEFORE anything moves, one
    compact exchange of O(distinct edges) int64 pairs), then a
    vectorized frontier loop — searchsorted node indexing + boolean
    scatter per round, never per-node Python. Right when the node
    domain is a fixed projection (as in the query twin); for
    billion-node graphs the swap-in is the per-round distributed
    frontier: ``max_hops`` × (frontier semi-join on the edge table +
    anti-join against the visited set), each round ONE hash exchange
    of (node,) rows — same semantics, bounded rounds.
    """

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(a, b)
        return pa.table({"a": pc.cast(a, pa.int64()),
                         "b": pc.cast(b, pa.int64())}).filter(keep)

    distinct = compact_groupby(edges.map_batches(canon, batch_format="pyarrow"),
                               ["a", "b"], count_alias="n")

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b"]]
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        nodes = np.unique(u)
        ui = np.searchsorted(nodes, u)
        vi = np.searchsorted(nodes, v)
        hop = np.full(len(nodes), -1, dtype=np.int64)
        frontier = (nodes % seed_mod) == 0
        hop[frontier] = 0
        for h in range(1, max_hops + 1):
            reach = np.zeros(len(nodes), dtype=bool)
            reach[vi[frontier[ui]]] = True
            frontier = reach & (hop < 0)
            if not frontier.any():
                break
            hop[frontier] = h
        keep = hop >= 0
        return pa.table({"node": pa.array(nodes[keep]),
                         "hop": pa.array(hop[keep])})

    return distinct.map_batches(expand, batch_format="pyarrow",
                                batch_size=None)


def shortest_paths(edges, seed_mod: int, rounds: int = 4,
                   src: str = "src", dst: str = "dst", weight: str = "w"):
    """Bounded-round Bellman–Ford: minimum WEIGHTED distance from the
    seed set (``node % seed_mod == 0``) over paths of at most
    ``rounds`` edges of the undirected graph — the weighted companion
    to ``bfs_hops`` (latency-weighted blast radius instead of hop
    count). Synchronous relaxation (each round reads the PREVIOUS
    round's distances) makes round r exact over ≤ r-edge paths, which
    is precisely what the recursive-CTE twin's hop-guarded
    accumulation + MIN(dist) computes — so the twin is exact even when
    ``rounds`` is below the graph's weighted diameter.

    Scale shape: per-block canonicalize keeps the MINIMUM weight per
    parallel edge (min-combine, not distinct), one compact exchange of
    O(distinct edges) rows, then a vectorized ``np.minimum.at``
    scatter per round. The distributed swap-in is the classic
    per-round exchange: join the frontier's distances onto the edge
    table, min-reduce per target node — ``rounds`` × one hash
    exchange."""

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(a, b)
        return pa.table({"a": pc.cast(a, pa.int64()),
                         "b": pc.cast(b, pa.int64()),
                         "w": pc.cast(t[weight], pa.int64())}).filter(keep)

    # distinct on (a, b, w): a parallel edge surviving with a LARGER
    # weight can never win a min-distance relaxation, so keeping one
    # row per distinct weight (instead of a min-combine) is exact —
    # and it rides the same compact front end as kcore/bfs_hops.
    distinct = compact_groupby(edges.map_batches(canon, batch_format="pyarrow"),
                               ["a", "b", "w"], count_alias="n")

    def relax(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b", "w"]]
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        ww = np.concatenate([w, w])
        nodes = np.unique(u)
        ui = np.searchsorted(nodes, u)
        vi = np.searchsorted(nodes, v)
        INF = np.int64(2**62)
        dist = np.full(len(nodes), INF, dtype=np.int64)
        dist[(nodes % seed_mod) == 0] = 0
        for _ in range(rounds):
            prev = dist.copy()
            cand = prev[ui]
            ok = cand < INF
            relaxed = cand[ok] + ww[ok]
            np.minimum.at(dist, vi[ok], relaxed)
        keep = dist < INF
        return pa.table({"node": pa.array(nodes[keep]),
                         "dist": pa.array(dist[keep])})

    return distinct.map_batches(relax, batch_format="pyarrow",
                                batch_size=None)
