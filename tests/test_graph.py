"""Distributed triangle counting (stages/graph.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.graph import _wedge_pairs, triangle_counts


def _random_graph(n, p, seed):
    rng = np.random.default_rng(seed)
    A = rng.random((n, n)) < p
    A = np.triu(A, 1)
    return A | A.T


def test_wedge_pairs_canonical_and_complete():
    u = np.array([1, 1, 1, 2, 2, 3], np.int64)
    v = np.array([9, 5, 7, 4, 6, 8], np.int64)
    x, y, w = _wedge_pairs(u, v)
    got = sorted(zip(w, x, y))
    assert got == [(1, 5, 7), (1, 5, 9), (1, 7, 9), (2, 4, 6)]
    assert (x < y).all()


def test_triangle_counts_vs_brute_force():
    A = _random_graph(60, 0.15, 5)
    src, dst = np.nonzero(np.triu(A, 1))
    # duplicates, reversed edges and self-loops must all be cleaned
    src2 = np.concatenate([src, dst, src[:10], np.arange(5)])
    dst2 = np.concatenate([dst, src, dst[:10], np.arange(5)])
    ds = rd.from_arrow(pa.table({"src": pa.array(src2),
                                 "dst": pa.array(dst2)})).repartition(5)
    out = triangle_counts(ds, num_partitions=16, local_edges=0).to_pandas()
    out = out.set_index("node").sort_index()
    tri = np.diag(A.astype(np.int64) @ A @ A) // 2
    deg = A.sum(1)
    present = deg > 0
    assert list(out.index) == list(np.nonzero(present)[0])
    assert (out["degree"].to_numpy() == deg[present]).all()
    assert (out["triangles"].to_numpy() == tri[present]).all()
    assert (out["wedges"].to_numpy()
            == deg[present] * (deg[present] - 1) // 2).all()


def test_triangle_counts_parallelism_invariant():
    A = _random_graph(40, 0.2, 9)
    src, dst = np.nonzero(np.triu(A, 1))
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    outs = []
    for nblocks, nparts in ((1, 4), (7, 32)):
        out = triangle_counts(rd.from_arrow(t).repartition(nblocks),
                              num_partitions=nparts,
                              local_edges=0).to_pandas()
        outs.append(out.sort_values("node").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_triangle_counts_hub_graph():
    # star graph: no triangles no matter the hub degree; plus one triad
    hub_edges = [(0, i) for i in range(1, 30)]
    tri_edges = [(100, 101), (101, 102), (100, 102)]
    e = hub_edges + tri_edges
    t = pa.table({"src": pa.array([a for a, _ in e], pa.int64()),
                  "dst": pa.array([b for _, b in e], pa.int64())})
    out = triangle_counts(rd.from_arrow(t)).to_pandas().set_index("node")
    assert out.loc[0, "triangles"] == 0 and out.loc[0, "degree"] == 29
    assert (out.loc[[100, 101, 102], "triangles"] == 1).all()


def test_triangle_counts_local_gate_matches_distributed():
    A = _random_graph(50, 0.18, 13)
    src_, dst_ = np.nonzero(np.triu(A, 1))
    t = pa.table({"src": pa.array(src_), "dst": pa.array(dst_)})
    lo = triangle_counts(rd.from_arrow(t), local_edges=10**6).to_pandas()
    hi = triangle_counts(rd.from_arrow(t), local_edges=0).to_pandas()
    lo = lo.sort_values("node").reset_index(drop=True)
    hi = hi.sort_values("node").reset_index(drop=True)
    assert lo.equals(hi)


def test_kcore_peeling_clique_plus_chain():
    """3-core of a 5-clique with a pendant chain = exactly the clique
    (degrees 4); the chain needs multiple peel rounds to vanish."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import kcore_degrees

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    df = pd.DataFrame(clique + chain, columns=["src", "dst"])
    out = (kcore_degrees(rd.from_pandas(df).repartition(3), k=3, rounds=8)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out.node.tolist() == [0, 1, 2, 3, 4]
    assert out.degree.tolist() == [4] * 5

    # k above the max degree -> empty core, schema preserved
    empty = kcore_degrees(rd.from_pandas(df), k=10, rounds=8).to_pandas()
    assert len(empty) == 0
    assert set(empty.columns) == {"node", "degree"} or empty.empty


def test_label_propagation_two_cliques_bridge():
    """Two triangles joined by one bridge edge: after 2 synchronous
    min-tie rounds each triangle converges to its smallest member's
    label; differential vs a direct NetworkX-free reimplementation."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import label_propagation

    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(2, 10)]
    df = pd.DataFrame(tri1 + tri2 + bridge, columns=["src", "dst"])
    out = (label_propagation(rd.from_pandas(df).repartition(3), rounds=2)
           .to_pandas().sort_values("node"))
    got = dict(zip(out.node, out.label))

    # direct synchronous reference
    import collections
    adj = collections.defaultdict(list)
    for s, d in tri1 + tri2 + bridge:
        adj[s].append(d); adj[d].append(s)
    lab = {n: n for n in adj}
    for _ in range(2):
        new = {}
        for n in adj:
            cnt = collections.Counter(lab[m] for m in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    assert got == lab


def test_bfs_hops_path_and_multi_seed():
    """BFS pins: exact hop distance on a path graph, the max_hops cap,
    multi-seed MIN semantics, and unreachable-component absence."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import bfs_hops

    # path 0-1-2-...-10 plus a disconnected edge 501-502 (no seed)
    src = list(range(10)) + [501]
    dst = list(range(1, 11)) + [502]
    ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())})).repartition(3)
    # seed_mod=1000: only node 0 is a seed → hop = index, capped at 6
    out = bfs_hops(ds, seed_mod=1000, max_hops=6).to_pandas()
    got = dict(zip(out["node"], out["hop"]))
    assert got == {i: i for i in range(7)}  # 7..10 beyond cap; 501/502 absent

    # seed_mod=5: seeds {0,5,10} → distance to the nearest seed
    out2 = bfs_hops(ds, seed_mod=5, max_hops=6).to_pandas()
    got2 = dict(zip(out2["node"], out2["hop"]))
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0,
                    6: 1, 7: 2, 8: 2, 9: 1, 10: 0}


def test_shortest_paths_weights_rounds_and_parallel_edges():
    """Bellman–Ford pins: weighted distance beats hop count, parallel
    edges resolve to the cheapest, and the round cap bounds path
    LENGTH (not distance)."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import shortest_paths

    # 0 —10— 1 —10— 2 —1— 3 —1— 4, shortcut 0—100—2, parallel 0—3—1
    t = pa.table({
        "src": pa.array([0, 1, 0, 0, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 2, 1, 3, 4], pa.int64()),
        "w":   pa.array([10, 10, 100, 3, 1, 1], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = shortest_paths(ds, seed_mod=1000, rounds=4).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {0: 0, 1: 3, 2: 13, 3: 14, 4: 15}

    # rounds=2: only ≤2-edge paths — node 2 must fall back to the
    # expensive direct edge, node 3 to the 2-edge 0-2-3, node 4 absent
    out2 = shortest_paths(ds, seed_mod=1000, rounds=2).to_pandas()
    got2 = dict(zip(out2["node"], out2["dist"]))
    assert got2 == {0: 0, 1: 3, 2: 13, 3: 101}


def test_bfs_sssp_distributed_vs_local_differential():
    """The size-gated distributed per-round frontier (local_edges=0
    forces it) must equal the single-task vectorized loop row-for-row
    on random graphs with duplicates, reversed edges and self-loops —
    including hop/round caps that bite before convergence."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import (
        bfs_hops, shortest_paths)

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 400))
        nn = int(rng.integers(8, 120))
        src = rng.integers(0, nn, n).astype(np.int64)
        dst = rng.integers(0, nn, n).astype(np.int64)
        w = rng.integers(1, 90, n).astype(np.int64)
        # dirty the stream: dup + reversed + self-loop rows
        src2 = np.concatenate([src, dst, src[:7], np.arange(3)])
        dst2 = np.concatenate([dst, src, dst[:7], np.arange(3)])
        w2 = np.concatenate([w, w, w[:7], np.ones(3, np.int64)])
        t = pa.table({"src": pa.array(src2), "dst": pa.array(dst2),
                      "w": pa.array(w2)})
        sm = int(rng.integers(2, 15))
        cap = int(rng.integers(1, 6))

        loc = (bfs_hops(rd.from_arrow(t).repartition(4), seed_mod=sm,
                        max_hops=cap)
               .to_pandas().sort_values("node").reset_index(drop=True))
        dis = (bfs_hops(rd.from_arrow(t).repartition(4), seed_mod=sm,
                        max_hops=cap, local_edges=0, num_partitions=8)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert loc.equals(dis), f"bfs mismatch seed={seed}"

        loc2 = (shortest_paths(rd.from_arrow(t).repartition(4),
                               seed_mod=sm, rounds=cap)
                .to_pandas().sort_values("node").reset_index(drop=True))
        dis2 = (shortest_paths(rd.from_arrow(t).repartition(4),
                               seed_mod=sm, rounds=cap, local_edges=0,
                               num_partitions=8)
                .to_pandas().sort_values("node").reset_index(drop=True))
        assert loc2.equals(dis2), f"sssp mismatch seed={seed}"


def test_bfs_sssp_distributed_on_oracle_projection_graph():
    """The exact oracle inputs (graph_bfs_hops / graph_shortest_paths
    at sf0.001 — the 256-node event projection) through the FORCED
    distributed path must equal the hash-verified local-path result,
    so both oracles are green through both plans."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.graph import (
        bfs_hops, shortest_paths)

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        import pytest
        pytest.skip("testdata not present")
    eid = pq.read_table(os.path.join(sf, "events.parquet"),
                        columns=["event_id"])["event_id"]
    eid = eid.to_numpy(zero_copy_only=False).astype(np.int64)
    s = ((eid * 2654435761) % 1000003) % 256
    d = ((eid * 40503 + 17) % 999983) % 256
    t = pa.table({"src": pa.array(s), "dst": pa.array(d),
                  "w": pa.array((s + d) % 50 + 1)})

    loc = (bfs_hops(rd.from_arrow(t), seed_mod=29, max_hops=6)
           .to_pandas().sort_values("node").reset_index(drop=True))
    dis = (bfs_hops(rd.from_arrow(t), seed_mod=29, max_hops=6,
                    local_edges=0)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert loc.equals(dis)

    loc2 = (shortest_paths(rd.from_arrow(t), seed_mod=29, rounds=4)
            .to_pandas().sort_values("node").reset_index(drop=True))
    dis2 = (shortest_paths(rd.from_arrow(t), seed_mod=29, rounds=4,
                           local_edges=0)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert loc2.equals(dis2)
