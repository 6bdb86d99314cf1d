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


_ROUND_SCHEMA = ["part", "u", "v", "kind", "f"]


def _empty_round_table(extra: list[str] | None = None) -> pa.Table:
    cols = _ROUND_SCHEMA[:3] + (extra or []) + _ROUND_SCHEMA[3:]
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def _frontier_active(visited) -> int:
    """Sum of the f flag over a (materialized) round table — 0 means
    the frontier is empty and the fixpoint is reached. Guarded per
    block because a ``map_groups`` upstream can emit zero-column
    blocks for empty sort partitions (the known Ray quirk)."""

    def cnt(t: pa.Table) -> pa.Table:
        n = (0 if ("f" not in t.column_names or t.num_rows == 0)
             else (pc.sum(t["f"]).as_py() or 0))
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    s = visited.map_batches(cnt, batch_format="pyarrow",
                            batch_size=None).sum("n")
    return int(s) if s is not None else 0


def _kind_split(kind_val: int, extra: list[str] | None = None):
    """Per-block kind filter that tolerates the zero-column empty
    blocks Ray's map_groups emits for empty sort partitions."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "kind" not in t.column_names:
            return _empty_round_table(extra)
        return t.filter(pc.equal(t["kind"], kind_val))

    return fn


def _distributed_bfs(pre, seed_mod: int, max_hops: int, P: int):
    """Per-round distributed frontier BFS over the canonicalized (but
    not yet globally distinct) edge dataset ``pre`` (columns a, b).

    Layout: ONE row schema (part, u, v, kind, f) unions edges, visited
    and candidate rows so every exchange is a plain ``groupby("part")``
    over narrow int64 columns — the connected_components layout:

    - kind=1 edge row: u→v, co-partitioned with u's state (part=u%P);
      global dedup happens in the same exchange that symmetrizes.
    - kind=0 visited row: u=node, v=hop, f=1 while the node is on the
      current frontier.
    - kind=2 candidate row: u=node, v=proposed hop.

    Each hop = 2 hash exchanges of O(frontier-adjacent) rows: frontier
    semi-join along co-located out-edges (emit), then min/anti-join
    against the visited set at the destination partition (step). The
    per-round ``materialize()`` pins the iteration state (mandatory for
    loops — lineage would otherwise re-execute every prior round), and
    it is O(reached nodes), never corpus-scale. Early exit on an empty
    frontier makes post-convergence rounds free."""
    import ray

    Pn = np.int64(P)

    def to_sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        z = np.zeros(len(u), np.int64)
        return pa.table({"part": pa.array(u % Pn), "u": pa.array(u),
                         "v": pa.array(v),
                         "kind": pa.array(z + 1), "f": pa.array(z)})

    def dedupe_and_seed(g: pd.DataFrame) -> pa.Table:
        """One u-partition: exact global edge dedup (all (u,*) rows of
        a node live here) + emit the partition's seed rows."""
        e = g[["part", "u", "v", "kind", "f"]].drop_duplicates(["u", "v"])
        nodes = np.unique(e["u"].to_numpy(np.int64))
        seeds = nodes[nodes % seed_mod == 0]
        srows = pd.DataFrame({
            "part": seeds % Pn, "u": seeds,
            "v": np.zeros(len(seeds), np.int64),
            "kind": np.zeros(len(seeds), np.int64),
            "f": np.ones(len(seeds), np.int64)})
        return pa_from_pandas(pd.concat([e, srows], ignore_index=True))

    state = (pre.map_batches(to_sym, batch_format="pyarrow")
                .groupby("part")
                .map_groups(arrow_out(dedupe_and_seed),
                            batch_format="pandas")
                .materialize())
    edges_k = state.map_batches(_kind_split(1),
                                batch_format="pyarrow").materialize()
    visited = state.map_batches(_kind_split(0),
                                batch_format="pyarrow").materialize()

    for h in range(1, max_hops + 1):
        if _frontier_active(visited) == 0:
            break

        def emit(g: pd.DataFrame, hop=h) -> pa.Table:
            e = g[g["kind"] == 1]
            fr = g[(g["kind"] == 0) & (g["f"] == 1)]
            if e.empty or fr.empty:
                return _empty_round_table()
            m = e.merge(fr[["u"]].drop_duplicates(), on="u")
            tv = np.unique(m["v"].to_numpy(np.int64))
            return pa.table({
                "part": pa.array(tv % Pn), "u": pa.array(tv),
                "v": pa.array(np.full(len(tv), hop, np.int64)),
                "kind": pa.array(np.full(len(tv), 2, np.int64)),
                "f": pa.array(np.zeros(len(tv), np.int64))})

        msgs = (edges_k.union(visited).groupby("part")
                .map_groups(arrow_out(emit), batch_format="pandas"))

        def step(g: pd.DataFrame, hop=h) -> pa.Table:
            vis = g[g["kind"] == 0]
            cand = g[g["kind"] == 2]
            new = np.setdiff1d(np.unique(cand["u"].to_numpy(np.int64)),
                               vis["u"].to_numpy(np.int64))
            keep = vis[["part", "u", "v", "kind"]].copy()
            keep["f"] = np.int64(0)
            nrows = pd.DataFrame({
                "part": new % Pn, "u": new,
                "v": np.full(len(new), hop, np.int64),
                "kind": np.zeros(len(new), np.int64),
                "f": np.ones(len(new), np.int64)})
            return pa_from_pandas(pd.concat([keep, nrows],
                                            ignore_index=True))

        visited = (msgs.union(visited).groupby("part")
                   .map_groups(arrow_out(step), batch_format="pandas")
                   .materialize())

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "hop": z})
        return pa.table({"node": t["u"], "hop": t["v"]})

    return visited.map_batches(project, batch_format="pyarrow")


def bfs_hops(edges, seed_mod: int, max_hops: int = 6,
             src: str = "src", dst: str = "dst",
             local_edges: int = 4_000_000, num_partitions: int = 64):
    """Multi-source breadth-first search: shortest hop distance from a
    seed set (nodes with ``node % seed_mod == 0``) to every reachable
    node within ``max_hops`` hops of the undirected simple graph — the
    blast-radius / dependency-distance query a service graph answers
    ("everything within k hops of the failing tier"). Capping the hop
    count makes the operator deterministic and SQL-twinnable: the
    recursive-CTE twin carries the same ``hop < max_hops`` guard, and
    both engines report MIN(hop) per node, so when BFS converges before
    the cap the result IS the exact hop distance.

    Size-gated execution (the triangle_counts pattern): per-block
    canonicalize + block-local dedup shrink the stream BEFORE anything
    moves, and the surviving row count (an upper bound on the distinct
    edge count — cross-block duplicates can only inflate it) picks the
    plan. At or under ``local_edges`` the whole graph collapses through
    ONE repartition(1) exchange into a single vectorized frontier loop
    (searchsorted node indexing + boolean scatter per round — right for
    bounded projections like a service graph). Above the gate the
    per-round distributed frontier takes over: ``max_hops`` × (frontier
    semi-join along co-partitioned out-edges + anti-join against the
    visited set), 2 narrow hash exchanges per hop and never a
    single-block collapse — the corpus-scale shape (billion-node
    user×user / doc×doc graphs)."""

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        tt = pa.table({"a": pc.cast(a, pa.int64()),
                       "b": pc.cast(b, pa.int64())}).filter(
            pc.not_equal(a, b))
        return pa_from_pandas(tt.to_pandas().drop_duplicates())

    pre = edges.map_batches(canon, batch_format="pyarrow").materialize()

    if pre.count() > local_edges:
        return _distributed_bfs(pre, seed_mod, max_hops, num_partitions)

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b"]].drop_duplicates()
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

    return pre.repartition(1).map_batches(expand, batch_format="pyarrow",
                                          batch_size=None)


def _distributed_sssp(pre, seed_mod: int, rounds: int, P: int):
    """Per-round distributed Bellman–Ford over the canonicalized edge
    dataset ``pre`` (columns a, b, w). Same (part, u, v, w, kind, f)
    single-schema layout as ``_distributed_bfs`` — kind=1 edge rows
    (u→v weight w) co-partitioned with u's state, kind=0 distance rows
    (v=dist, f=1 while improved last round), kind=2 candidates
    (v=proposed dist). Delta relaxation — only nodes improved in the
    previous round re-propose — is exact for the min: an unchanged
    node's proposals were already beaten or matched in the round it
    last changed. 2 narrow hash exchanges per round, per-round
    materialize pins the state, early exit when nothing improves (the
    remaining bounded rounds are then no-ops by definition)."""
    Pn = np.int64(P)
    EXTRA = ["w"]

    def to_sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        ww = np.concatenate([w, w])
        z = np.zeros(len(u), np.int64)
        return pa.table({"part": pa.array(u % Pn), "u": pa.array(u),
                         "v": pa.array(v), "w": pa.array(ww),
                         "kind": pa.array(z + 1), "f": pa.array(z)})

    def dedupe_and_seed(g: pd.DataFrame) -> pa.Table:
        cols = ["part", "u", "v", "w", "kind", "f"]
        e = g[cols].drop_duplicates(["u", "v", "w"])
        nodes = np.unique(e["u"].to_numpy(np.int64))
        seeds = nodes[nodes % seed_mod == 0]
        z = np.zeros(len(seeds), np.int64)
        srows = pd.DataFrame({"part": seeds % Pn, "u": seeds, "v": z,
                              "w": z, "kind": z, "f": z + 1})
        return pa_from_pandas(pd.concat([e, srows], ignore_index=True))

    state = (pre.map_batches(to_sym, batch_format="pyarrow")
                .groupby("part")
                .map_groups(arrow_out(dedupe_and_seed),
                            batch_format="pandas")
                .materialize())
    edges_k = state.map_batches(_kind_split(1, EXTRA),
                                batch_format="pyarrow").materialize()
    dist = state.map_batches(_kind_split(0, EXTRA),
                             batch_format="pyarrow").materialize()

    for _ in range(rounds):
        if _frontier_active(dist) == 0:
            break

        def emit(g: pd.DataFrame) -> pa.Table:
            e = g[g["kind"] == 1]
            fr = g[(g["kind"] == 0) & (g["f"] == 1)]
            if e.empty or fr.empty:
                return _empty_round_table(EXTRA)
            m = e.merge(fr[["u", "v"]].rename(columns={"v": "du"}),
                        on="u")
            cand = (pd.DataFrame({"tv": m["v"].to_numpy(np.int64),
                                  "d": m["du"].to_numpy(np.int64)
                                  + m["w"].to_numpy(np.int64)})
                    .groupby("tv", as_index=False)["d"].min())
            tv = cand["tv"].to_numpy(np.int64)
            z = np.zeros(len(tv), np.int64)
            return pa.table({"part": pa.array(tv % Pn),
                             "u": pa.array(tv),
                             "v": pa.array(cand["d"].to_numpy(np.int64)),
                             "w": pa.array(z),
                             "kind": pa.array(z + 2),
                             "f": pa.array(z)})

        msgs = (edges_k.union(dist).groupby("part")
                .map_groups(arrow_out(emit), batch_format="pandas"))

        def step(g: pd.DataFrame) -> pa.Table:
            vis = g[g["kind"] == 0]
            cand = (g[g["kind"] == 2].groupby("u", as_index=False)["v"]
                    .min())
            # pure-int64 sorted-union merge: an outer pandas merge
            # would push absent sides through float64, losing exactness
            # for distances above 2^53
            vu = vis["u"].to_numpy(np.int64)
            vv = vis["v"].to_numpy(np.int64)
            cu = cand["u"].to_numpy(np.int64)
            cv = cand["v"].to_numpy(np.int64)
            INF = np.int64(2**62)
            allu = np.union1d(vu, cu)
            old = np.full(len(allu), INF, np.int64)
            old[np.searchsorted(allu, vu)] = vv
            new = np.full(len(allu), INF, np.int64)
            new[np.searchsorted(allu, cu)] = cv
            best = np.minimum(old, new)
            improved = (new < old).astype(np.int64)
            z = np.zeros(len(allu), np.int64)
            return pa.table({"part": pa.array(allu % Pn),
                             "u": pa.array(allu),
                             "v": pa.array(best), "w": pa.array(z),
                             "kind": pa.array(z), "f": pa.array(improved)})

        dist = (msgs.union(dist).groupby("part")
                .map_groups(arrow_out(step), batch_format="pandas")
                .materialize())

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "dist": z})
        return pa.table({"node": t["u"], "dist": t["v"]})

    return dist.map_batches(project, batch_format="pyarrow")


def shortest_paths(edges, seed_mod: int, rounds: int = 4,
                   src: str = "src", dst: str = "dst", weight: str = "w",
                   local_edges: int = 4_000_000, num_partitions: int = 64):
    """Bounded-round Bellman–Ford: minimum WEIGHTED distance from the
    seed set (``node % seed_mod == 0``) over paths of at most
    ``rounds`` edges of the undirected graph — the weighted companion
    to ``bfs_hops`` (latency-weighted blast radius instead of hop
    count). Synchronous relaxation (each round reads the PREVIOUS
    round's distances) makes round r exact over ≤ r-edge paths, which
    is precisely what the recursive-CTE twin's hop-guarded
    accumulation + MIN(dist) computes — so the twin is exact even when
    ``rounds`` is below the graph's weighted diameter.

    Size-gated like ``bfs_hops``: per-block canonicalize + block-local
    dedup on (a, b, w) shrink the stream first (a parallel edge with a
    LARGER weight can never win a min-distance relaxation, so distinct
    triples are exact); at or under ``local_edges`` surviving rows the
    graph collapses through one repartition(1) into a vectorized
    ``np.minimum.at`` relaxation loop, above it ``_distributed_sssp``
    runs the classic per-round exchange (frontier distances join onto
    co-partitioned out-edges, min-reduce per target) — 2 narrow hash
    exchanges per round, no single-block collapse."""

    def canon(t: pa.Table) -> pa.Table:
        a = pc.min_element_wise(t[src], t[dst])
        b = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(a, b)
        tt = pa.table({"a": pc.cast(a, pa.int64()),
                       "b": pc.cast(b, pa.int64()),
                       "w": pc.cast(t[weight], pa.int64())}).filter(keep)
        return pa_from_pandas(tt.to_pandas().drop_duplicates())

    pre = edges.map_batches(canon, batch_format="pyarrow").materialize()

    if pre.count() > local_edges:
        return _distributed_sssp(pre, seed_mod, rounds, num_partitions)

    def relax(t: pa.Table) -> pa.Table:
        df = t.to_pandas()[["a", "b", "w"]].drop_duplicates()
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

    return pre.repartition(1).map_batches(relax, batch_format="pyarrow",
                                          batch_size=None)
