"""Connected-components dedup clustering (stages/cluster.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.cluster import (
    attach_clusters,
    connected_components,
    dedup_by_clusters,
)


def _labels_df(pairs_tbl, **kw):
    import pandas as pd

    ds = rd.from_arrow(pairs_tbl)
    df = connected_components(ds, **kw).to_pandas()
    if "node" not in df.columns:  # Ray drops columns on empty to_pandas
        df = pd.DataFrame({"node": [], "label": []})
    return df.sort_values("node").reset_index(drop=True)


def test_transitive_chains_collapse():
    # chain 1-2-3, pair 10-11, chain 20-21-22-23 (shuffled edge order);
    # threshold 0 forces the distributed loop
    pairs = pa.table({"id_a": [2, 1, 10, 21, 20, 22], "id_b": [3, 2, 11, 22, 21, 23]})
    lab = _labels_df(pairs, num_partitions=8, local_threshold=0)
    got = dict(zip(lab["node"], lab["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_empty_pairs():
    pairs = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    lab = _labels_df(pairs)
    assert len(lab) == 0
    docs = rd.from_arrow(pa.table({"doc_id": [7, 8]}))
    out = (
        attach_clusters(docs, rd.from_arrow(pairs).map_batches(
            lambda t: pa.table({"node": pa.array([], pa.int64()),
                                "label": pa.array([], pa.int64())}),
            batch_format="pyarrow"))
        .to_pandas().sort_values("doc_id")
    )
    assert list(out["cluster_id"]) == [7, 8]
    assert list(out["keep"]) == [True, True]


def _uf_reference(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@pytest.mark.parametrize("num_partitions,local_threshold",
                         [(3, 0), (16, 0), (8, 4_000_000)])
def test_random_graph_matches_union_find(num_partitions, local_threshold):
    # local_threshold=0 forces the distributed loop; the default gate
    # routes a graph this small through the driver-local numpy path —
    # both must match the union-find reference exactly.
    rng = np.random.default_rng(11)
    a = rng.integers(0, 400, size=600)
    b = rng.integers(0, 400, size=600)
    m = a != b
    a, b = a[m], b[m]
    pairs = pa.table({"id_a": pa.array(a, pa.int64()),
                      "id_b": pa.array(b, pa.int64())})
    lab = _labels_df(pairs, num_partitions=num_partitions,
                     local_threshold=local_threshold)
    got = dict(zip(lab["node"], lab["label"]))
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    want = _uf_reference(list(zip(a.tolist(), b.tolist())), nodes)
    assert got == want


def test_dedup_by_clusters_tags_corpus():
    pairs = pa.table({"id_a": [1, 2], "id_b": [2, 9]})
    docs = rd.from_arrow(pa.table({"doc_id": [1, 2, 5, 9]}))
    out = (
        dedup_by_clusters(docs, rd.from_arrow(pairs), num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["cluster_id"]) == [1, 1, 5, 1]
    assert list(out["keep"]) == [True, False, True, False]


def test_golden_records_survivorship_rules():
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.fusion import golden_records

    df = pd.DataFrame({
        "c": [1, 1, 1, 2, 2],
        "o": [10, 20, 30, 10, 20],
        "s": ["aa", None, "b", None, None],     # latest non-null / longest
        "v": [5, 9, 7, 3, 1],
    })
    out = (golden_records(rd.from_pandas(df).repartition(3), "c", "o",
                          rules={"last_s": ("s", "latest"),
                                 "long_s": ("s", "longest"),
                                 "first_s": ("s", "earliest"),
                                 "vmax": ("v", "max"),
                                 "vmin": ("v", "min")},
                          num_partitions=4)
           .to_pandas().sort_values("c").reset_index(drop=True))
    assert out["n_records"].tolist() == [3, 2]
    # latest NON-NULL: o=30 row wins for c=1; c=2 has no value -> null
    assert out["last_s"].tolist()[0] == "b" and pd.isna(out["last_s"][1])
    # longest: 'aa' (len 2) beats 'b' even though 'b' is later
    assert out["long_s"][0] == "aa" and pd.isna(out["long_s"][1])
    assert out["first_s"][0] == "aa"
    assert out["vmax"].tolist() == [9, 3]
    assert out["vmin"].tolist() == [5, 1]

    # longest tie -> latest
    df2 = pd.DataFrame({"c": [1, 1], "o": [1, 2], "s": ["xy", "ab"],
                        "v": [0, 0]})
    out2 = golden_records(rd.from_pandas(df2), "c", "o",
                          rules={"long_s": ("s", "longest")}).to_pandas()
    assert out2["long_s"][0] == "ab"

    try:
        golden_records(rd.from_pandas(df2), "c", "o",
                       rules={"x": ("s", "modal")})
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_cluster_representatives_longest_tie_smallest(tmp_path):
    """The docs_cluster_representatives keep rule: longest text wins
    within a near-dup cluster, ties break to the smallest doc_id, and
    singletons report themselves with cluster_size 1."""
    import pandas as pd

    # docs 1/2/3 are trigram-identical up to one extra sentence (so
    # Jaccard >= 0.8 pairs them); doc 3 is longest -> representative.
    # docs 10/11 are identical (tie on length -> smallest id 10 wins).
    # doc 99 shares nothing -> singleton.
    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 99],
        "text": [base * 8, base * 8 + "tail", base * 8 + "tail more",
                 "totally different words here " * 6,
                 "totally different words here " * 6,
                 "zzz qqq vvv unrelated content entirely"],
    })
    docs["n_chars"] = docs["text"].str.len()
    d = tmp_path / "documents.parquet"
    docs.to_parquet(d)

    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_cluster_representatives,
    )

    out = (q_docs_cluster_representatives(str(tmp_path)).to_pandas()
           .sort_values("cluster_id").reset_index(drop=True))
    by_cluster = {int(r.cluster_id): r for r in out.itertuples()}
    assert set(by_cluster) == {1, 10, 99}
    # longest of {1,2,3} is doc 3
    assert by_cluster[1].rep_doc_id == 3 and by_cluster[1].cluster_size == 3
    # identical lengths -> smallest id
    assert by_cluster[10].rep_doc_id == 10 and by_cluster[10].cluster_size == 2
    assert by_cluster[99].rep_doc_id == 99 and by_cluster[99].cluster_size == 1
    assert by_cluster[99].rep_n_chars == len(docs.loc[5, "text"])


def test_dbscan_core_border_noise_and_bridge():
    """Hand graph pinning every DBSCAN rule (min_pts=3 → core needs
    degree ≥ 2):

      dense A: 1-2-3 triangle (+ leaf 4 off node 1) → cores 1,2,3
      bridge: 50 touches A(3) and B(11) only → degree 2... make it 1
      dense B: 10-11-12 triangle → cores 10,11,12
      leaf 4: border of A; 99: isolated noise (no pairs at all)
      bridge 50: neighbors {3, 11} = degree 2 → CORE at min_pts=3?
    degree+1 >= 3 means degree >= 2, so 50 WOULD be core and merge A,B.
    Use min_pts=4 instead: core needs degree ≥ 3 → triangle nodes with
    an extra edge are cores; the bridge (degree 2) demotes to border
    and A/B stay separate clusters — the exact over-merge flat
    components would commit.
    """
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.cluster import dbscan_labels

    # A: 1,2,3 triangle + leaf 4 on 1 and 5 on 2 and 6 on 3 (so each of
    # 1,2,3 has degree 3 → core at min_pts=4); B likewise 10,11,12 with
    # leaves 13,14,15; bridge 50 connects 3 and 11 (degree 2 → not core)
    pairs = pa.table({
        "id_a": [1, 1, 2, 1, 2, 3, 10, 10, 11, 10, 11, 12, 3, 11],
        "id_b": [2, 3, 3, 4, 5, 6, 11, 12, 12, 13, 14, 15, 50, 50],
    })
    pts = rd.from_arrow(pa.table({"vec_id": [1, 2, 3, 4, 5, 6, 10, 11, 12,
                                             13, 14, 15, 50, 99]}))
    out = (dbscan_labels(pts, rd.from_arrow(pairs), id_col="vec_id",
                         min_pts=4, num_partitions=4)
           .to_pandas().set_index("vec_id"))
    for n in (1, 2, 3):
        assert out.loc[n, "role"] == "core" and out.loc[n, "cluster_id"] == 1
    for n in (10, 11, 12):
        assert out.loc[n, "role"] == "core" and out.loc[n, "cluster_id"] == 10
    # leaves: border of their triangle's cluster
    for n, c in [(4, 1), (5, 1), (6, 1), (13, 10), (14, 10), (15, 10)]:
        assert out.loc[n, "role"] == "border" and out.loc[n, "cluster_id"] == c
    # bridge: border with MIN core-neighbor cluster (1 < 10) — clusters
    # did NOT merge through it
    assert out.loc[50, "role"] == "border" and out.loc[50, "cluster_id"] == 1
    # isolated: noise
    assert out.loc[99, "role"] == "noise" and out.loc[99, "cluster_id"] == -1


def test_dbscan_isolated_core_keeps_own_id():
    """A star (hub 7 with 3 leaves) at min_pts=4: hub degree 3 → core,
    leaves degree 1 → border; NO core-core edges exist, so the hub is
    an isolated core labeled by itself."""
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.cluster import dbscan_labels

    pairs = pa.table({"id_a": [7, 7, 7], "id_b": [8, 9, 10]})
    pts = rd.from_arrow(pa.table({"vec_id": [7, 8, 9, 10]}))
    out = (dbscan_labels(pts, rd.from_arrow(pairs), id_col="vec_id",
                         min_pts=4, num_partitions=4)
           .to_pandas().set_index("vec_id"))
    assert out.loc[7, "role"] == "core" and out.loc[7, "cluster_id"] == 7
    for n in (8, 9, 10):
        assert out.loc[n, "role"] == "border" and out.loc[n, "cluster_id"] == 7


def test_dbscan_empty_pairs_all_noise():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.cluster import dbscan_labels

    pairs = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    pts = rd.from_arrow(pa.table({"vec_id": [1, 2]}))
    out = (dbscan_labels(pts, rd.from_arrow(pairs), id_col="vec_id",
                         min_pts=2).to_pandas().sort_values("vec_id"))
    assert list(out["role"]) == ["noise", "noise"]
    assert list(out["cluster_id"]) == [-1, -1]


def test_attach_clusters_joined_path_matches_broadcast():
    """broadcast_threshold=0 forces the hash-partitioned left-join
    attach; it must equal the broadcast searchsorted path row-for-row
    (columns, dtypes, singleton fill, keep flags)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.cluster import dedup_by_clusters

    def mk():
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(30, dtype=np.int64)),
            "text": pa.array([f"d{i}" for i in range(30)])})).repartition(3)
        pairs = rd.from_arrow(pa.table({
            "id_a": pa.array([1, 2, 5, 7, 20], pa.int64()),
            "id_b": pa.array([2, 3, 6, 1, 21], pa.int64())}))
        return docs, pairs

    d1, p1 = mk()
    a = (dedup_by_clusters(d1, p1).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    d2, p2 = mk()
    b = (dedup_by_clusters(d2, p2, broadcast_threshold=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)
    # spot semantics: 1-2-3-7 one cluster labeled 1; singleton keeps
    got = dict(zip(a["doc_id"], a["cluster_id"]))
    assert got[1] == got[2] == got[3] == got[7] == 1
    assert got[10] == 10 and a.loc[a.doc_id == 10, "keep"].item()


def test_pmi_joined_path_matches_broadcast():
    """broadcast_threshold=0 forces hash_groupby_agg marginals + two
    bucketed joins; same rows/dtypes as the broadcast attach."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.text import pmi_bigram_parts

    txts = ["the cat sat on the mat", "the cat ran",
            "a dog sat on the mat", "", "the the the"] * 3

    p1 = (pmi_bigram_parts(
            rd.from_arrow(pa.table({"text": pa.array(txts)})),
            min_count=2, num_partitions=4)
          .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))
    p2 = (pmi_bigram_parts(
            rd.from_arrow(pa.table({"text": pa.array(txts)})),
            min_count=2, num_partitions=4, broadcast_threshold=0)
          .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))
    assert list(p1.columns) == list(p2.columns)
    assert p1.equals(p2)
    assert (p1["pair_n"] >= 2).all()
