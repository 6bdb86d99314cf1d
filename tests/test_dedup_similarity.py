import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.dedup import (
    SimHasher,
    exact_dedup,
    jaccard_ngrams,
    minhash_candidate_pairs,
    simhash_buckets,
    verify_pairs_jaccard,
)
from opentelemetry_collector_contrib_ray.stages.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def docs():
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs before noon today",
        "how vexingly quick daft zebras jump over fences at dawn",
        "sphinx of black quartz judge my vow said the old man",
    ]
    rows = []
    i = 0
    for b in base:
        rows.append((i, b)); i += 1
        rows.append((i, b)); i += 1                       # exact dup
        rows.append((i, b.replace("the", "a", 1))); i += 1  # near dup
        rows.append((i, " ".join(reversed(b.split())))); i += 1
    return pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                     "text": [r[1] for r in rows]})


def test_exact_dedup(docs):
    out = exact_dedup(rd.from_arrow(docs)).to_pandas()
    texts = docs["text"].to_pylist()
    assert len(out) == len(set(texts))
    # keeps the min doc_id per distinct text
    expect = {}
    for i, s in zip(docs["doc_id"].to_pylist(), texts):
        expect.setdefault(s, i)
    got = dict(zip(out["text"], out["doc_id"]))
    assert got == expect


def test_minhash_finds_near_dups(docs):
    pairs = minhash_candidate_pairs(
        rd.from_arrow(docs), num_perm=64, bands=32, concurrency=1
    ).to_pandas()
    cand = set(zip(pairs["id_a"], pairs["id_b"]))
    # every exact-dup pair (4k, 4k+1) must be a candidate
    for k in range(4):
        assert (4 * k, 4 * k + 1) in cand
    docs_by_id = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    verified = verify_pairs_jaccard(
        rd.from_arrow(pa.Table.from_pandas(pairs)), docs_by_id, threshold=0.8
    ).to_pandas()
    vset = set(zip(verified["id_a"], verified["id_b"]))
    for k in range(4):
        assert (4 * k, 4 * k + 1) in vset
    # reversed docs are not >=0.8 trigram-jaccard similar
    assert all(b - a != 3 for a, b in vset)


def test_jaccard_ngrams():
    assert jaccard_ngrams("a b c d", "a b c d") == 1.0
    assert jaccard_ngrams("a b c d", "x y z w") == 0.0


def test_simhash_exact_dups_same_bucket(docs):
    out = simhash_buckets(rd.from_arrow(docs), concurrency=1).to_pandas()
    h = dict(zip(out["doc_id"], out["simhash"]))
    for k in range(4):
        assert h[4 * k] == h[4 * k + 1]
    # simhash is order-insensitive over tokens → reversed text identical hash
    assert h[0] == h[3]


def test_simhash_value_deterministic():
    a = SimHasher.simhash64("hello world foo bar")
    b = SimHasher.simhash64("hello world foo bar")
    assert a == b and a != 0


def test_simhash_batch_matches_per_row():
    """The vectorized batch path must be bit-identical to the per-string
    reference implementation, including empty/whitespace/None rows."""
    texts = [
        "hello world foo bar", "", "   ", None, "single",
        "the quick brown fox", "a b c d e f g h i j k",
    ]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = SimHasher()(t)["simhash"].to_numpy().view(np.uint64)
    for i, s in enumerate(texts):
        assert out[i] == SimHasher.simhash64(s or ""), f"row {i}: {s!r}"


def test_minhash_batch_matches_per_row():
    from opentelemetry_collector_contrib_ray.stages.dedup import MinHasher

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "", "  ", None, "one two", "tiny",
        "pack my box with five dozen liquor jugs today",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    mh = MinHasher(num_perm=32)
    out = mh(t)
    sigs = np.asarray(out["__sig"].combine_chunks().flatten()).view(np.uint64).reshape(
        len(texts), 32
    )
    for i, s in enumerate(texts):
        ref = mh.signature(s or "")
        assert (sigs[i] == ref).all(), f"row {i}: {s!r}"


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.Generator(np.random.PCG64(5))
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = [base]
    rows.append(base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01)
    m = np.concatenate(rows)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(m)), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in m], type=pa.list_(pa.float32())),
        }
    )


def oracle_topk(m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = mn @ qn
    return list(np.argsort(-sims)[:k])


def test_brute_force_topk_matches_oracle(embeddings):
    m = np.stack([np.array(v) for v in embeddings["embedding"].to_pylist()]).astype(np.float64)
    q = m[3:4]
    out = brute_force_topk(
        rd.from_arrow(embeddings).repartition(3), q, k=5, concurrency=1
    )
    got = out.to_pandas()
    assert got[got.query_id == 0]["vec_id"].tolist() == oracle_topk(m, m[3], 5)


def test_lsh_topk_contains_self(embeddings):
    m = np.stack([np.array(v) for v in embeddings["embedding"].to_pylist()]).astype(np.float64)
    out = lsh_bucket_topk(rd.from_arrow(embeddings), m[7:8], k=3, n_bits=4, concurrency=1)
    got = out.to_pandas()
    assert 7 in got["vec_id"].tolist()  # the vector itself survives bucketing


def test_lsh_multitable_improves_recall(embeddings):
    """More tables + probes must find at least as much of the exact
    top-k as the single-table exact-bucket path (classic LSH recall
    levers)."""
    m = np.stack([np.array(v) for v in embeddings["embedding"].to_pylist()]).astype(np.float64)
    q = m[7:8]
    exact = set(oracle_topk(m, m[7], 5))

    def recall(**kw):
        out = lsh_bucket_topk(rd.from_arrow(embeddings), q, k=5, n_bits=6,
                              concurrency=1, **kw).to_pandas()
        return len(set(out["vec_id"]) & exact) / len(exact)

    r1 = recall()
    r3 = recall(n_tables=8, n_probes=4)
    assert r3 >= r1
    assert r3 >= 0.8  # near-exact with 8 tables + probes at this size


def test_cosine_near_dup_pairs(embeddings):
    out = cosine_near_dup_pairs(rd.from_arrow(embeddings), threshold=0.99).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    for k in range(5):
        assert (k, 20 + k) in pairs  # the perturbed copies
    assert len(pairs) == 5


def test_ivf_exact_when_probing_all_cells(embeddings):
    from opentelemetry_collector_contrib_ray.stages.similarity import ivf_topk

    m = np.stack([np.array(v) for v in embeddings["embedding"].to_pylist()]).astype(np.float64)
    q = m[3:4]
    out = ivf_topk(
        rd.from_arrow(embeddings).repartition(3), q, k=5,
        n_clusters=4, n_probe=4, concurrency=1, sample_size=100,
    ).to_pandas()
    # probing every cell == exact brute force
    assert out[out.query_id == 0]["vec_id"].tolist() == oracle_topk(m, m[3], 5)


def test_ivf_recall_grows_with_n_probe(embeddings):
    from opentelemetry_collector_contrib_ray.stages.similarity import ivf_topk

    rng = np.random.Generator(np.random.PCG64(9))
    big = rng.standard_normal((400, 16)).astype(np.float64)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(big)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in big], type=pa.list_(pa.float32())),
    })
    q = big[:5]

    def recall(n_probe):
        out = ivf_topk(rd.from_arrow(t), q, k=10, n_clusters=16,
                       n_probe=n_probe, concurrency=1, sample_size=400).to_pandas()
        hits = 0
        for qi in range(5):
            truth = set(oracle_topk(big, big[qi], 10))
            got = set(out[out.query_id == qi]["vec_id"])
            hits += len(truth & got)
        return hits / 50.0

    r1, r16 = recall(1), recall(16)
    assert r16 == 1.0  # all cells probed = exact
    assert r16 >= r1
    assert recall(6) >= 0.6  # multi-probe recovers most of the truth


def test_assign_ivf_clusters_partitions(embeddings):
    from opentelemetry_collector_contrib_ray.stages.similarity import (
        assign_ivf_clusters,
        train_ivf_centroids,
    )

    ds = rd.from_arrow(embeddings)
    cent = train_ivf_centroids(ds, n_clusters=4, sample_size=100)
    assert cent.shape == (4, 16)
    out = assign_ivf_clusters(ds, cent, concurrency=1).to_pandas()
    assert out["ivf_cluster"].between(0, 3).all()
    # exact duplicates land in the same cell
    m = np.stack([np.array(v) for v in embeddings["embedding"].to_pylist()])
    assert len(out) == len(m)


def test_ngram_jaccard_pairs_exact():
    from opentelemetry_collector_contrib_ray.stages.dedup import ngram_jaccard_pairs

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",   # high overlap with 1
            "completely different words entirely here now",
            "the quick brown fox jumps over the lazy dog",   # exact dup of 1
        ],
    })
    out = ngram_jaccard_pairs(rd.from_arrow(docs), threshold_num=1,
                              threshold_den=2, n=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # doc1 vs doc4: identical → J=1; doc1 vs doc2: 5 shared of 9 union → 5/9 ≥ 1/2
    assert (1, 4) in got and (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)
    # strict threshold keeps only the exact dup
    out2 = ngram_jaccard_pairs(rd.from_arrow(docs), threshold_num=9,
                               threshold_den=10, n=3).to_pandas()
    assert set(zip(out2["id_a"], out2["id_b"])) == {(1, 4)}


def test_ngram_jaccard_max_df_valve():
    from opentelemetry_collector_contrib_ray.stages.dedup import ngram_jaccard_pairs

    # every doc shares the same grams → with max_df=2 no gram survives,
    # so no pairs are generated (the hot-shingle skew valve)
    docs = pa.table({
        "doc_id": pa.array(list(range(5)), type=pa.int64()),
        "text": ["common shared gram text here"] * 5,
    })
    out = ngram_jaccard_pairs(rd.from_arrow(docs), threshold_num=1,
                              threshold_den=2, n=3, max_df=2).to_pandas()
    assert len(out) == 0


def test_ngram_jaccard_parallelism_invariant():
    # identical pair set regardless of block structure
    from opentelemetry_collector_contrib_ray.stages.dedup import ngram_jaccard_pairs

    texts = [f"alpha beta gamma delta epsilon zeta {i % 7} eta theta" for i in range(60)]
    docs = pa.table({
        "doc_id": pa.array(list(range(60)), type=pa.int64()),
        "text": texts,
    })

    def run(nblocks):
        out = ngram_jaccard_pairs(
            rd.from_arrow(docs).repartition(nblocks), threshold_num=1,
            threshold_den=2, n=3,
        ).to_pandas()
        return sorted(zip(out["id_a"], out["id_b"]))

    a, b = run(1), run(16)
    assert a == b and len(a) > 0


def test_char_simhash_matches_reference():
    """CharSimHasher (byte 4-gram simhash) vs a direct per-doc
    reference: explicit window hashes + bit-plane majority votes."""
    from opentelemetry_collector_contrib_ray.stages.dedup import CharSimHasher

    def ref(s, window=4):
        base = np.uint64(1099511628211)
        b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
        if len(b) < window:
            b = np.pad(b, (0, window - len(b)))
        sw = np.lib.stride_tricks.sliding_window_view(b, window).astype(np.uint64)
        with np.errstate(over="ignore"):
            hv = (sw * (base ** np.arange(window, dtype=np.uint64))).sum(axis=1)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).sum(axis=0)
        vote = bits * 2 > len(hv)
        out = np.uint64(0)
        for i in np.nonzero(vote)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return int(out.view(np.int64))

    texts = ["hello world document", "héllo … 中文 wörld", "", "abc",
             "the quick brown fox jumps over the lazy dog " * 4]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    got = CharSimHasher(window=4)(t)["simhash"].to_pylist()
    assert got == [ref(s) for s in texts]
    # near-identical docs → small hamming distance, disjoint docs → large
    a = CharSimHasher()(pa.table({"doc_id": [0], "text": [texts[4]]}))["simhash"][0].as_py()
    b = CharSimHasher()(pa.table({"doc_id": [0], "text": [texts[4] + " tail"]}))["simhash"][0].as_py()
    ham = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham <= 8


def test_lsh_near_dup_pairs_recall_and_exact_cosine(embeddings):
    """Multi-table LSH near-dup: enough tables ⇒ finds every exact pair
    (the perturbed copies at cosine ≈ 1); emitted cosines are exact;
    no pair is duplicated across tables."""
    from opentelemetry_collector_contrib_ray.stages.similarity import (
        cosine_near_dup_pairs, lsh_near_dup_pairs)

    exact = cosine_near_dup_pairs(rd.from_arrow(embeddings), threshold=0.99).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    out = lsh_near_dup_pairs(rd.from_arrow(embeddings).repartition(3),
                             threshold=0.99, n_bits=3, n_tables=16,
                             concurrency=1).to_pandas()
    got_pairs = list(zip(out["id_a"], out["id_b"]))
    assert len(got_pairs) == len(set(got_pairs))  # pair dedup across tables
    assert set(got_pairs) == exact_pairs  # recall 1 at 16 tables here
    # fewer tables can only shrink the pair set (still a subset of exact)
    small = lsh_near_dup_pairs(rd.from_arrow(embeddings), threshold=0.99,
                               n_bits=6, n_tables=1, concurrency=1).to_pandas()
    assert set(zip(small["id_a"], small["id_b"])) <= exact_pairs


# ---------------------------------------------------------- segment dedup


def _segment_dedup_oracle(docs: list[tuple[int, str]], sep: str):
    """Brute-force first-occurrence line dedup."""
    seen = set()
    out = {}
    for did, text in docs:
        kept, n_drop = [], 0
        segs = text.split(sep)
        for s in segs:
            if s in seen:
                n_drop += 1
            else:
                seen.add(s)
                kept.append(s)
        out[did] = (sep.join(kept), len(segs), n_drop)
    return out


def test_segment_dedup_hand_case():
    from opentelemetry_collector_contrib_ray.stages.dedup import segment_dedup

    rows = [
        (1, "a\nb\nc"),
        (2, "b\nx\na"),      # b, a are global dups
        (3, "a\nb"),         # everything dropped -> empty text
        (4, ""),             # empty doc: one empty segment, kept (first "" )
        (5, "\n"),           # two empty segments, both dup of doc4's
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": [r[1] for r in rows],
    }))
    got = segment_dedup(ds, sep="\n").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _segment_dedup_oracle(rows, "\n")
    for _, r in got.iterrows():
        text, n_segs, n_drop = want[r["doc_id"]]
        assert r["text"] == text, r["doc_id"]
        assert r["n_segs"] == n_segs
        assert r["n_dropped"] == n_drop
    assert len(got) == len(rows)


def test_segment_dedup_parallelism_invariant(docs):
    from opentelemetry_collector_contrib_ray.stages.dedup import segment_dedup

    # multi-word separator + many blocks: decisions are global, so the
    # result must not depend on block layout
    t = pa.table({
        "doc_id": docs["doc_id"],
        "text": pc.replace_substring(docs["text"], " ", "||"),
    })
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        outs.append(segment_dedup(ds, sep="||", num_partitions=5)
                    .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = _segment_dedup_oracle(rows, "||")
    for _, r in outs[0].iterrows():
        assert r["text"] == want[r["doc_id"]][0]


# ---------------------------------------------------------------- span dedup


def _span_dedup_oracle(docs, k):
    """Brute-force keep-first duplicate-window masking."""
    toks = {d: (s.split() if s.split() else []) for d, s in docs}
    occ = {}
    for d, s in docs:
        w = toks[d]
        for p in range(len(w) - k + 1):
            occ.setdefault(tuple(w[p:p + k]), []).append((d, p))
    covered = {d: set() for d, _ in docs}
    for g, places in occ.items():
        if len(places) >= 2:
            for d, p in sorted(places)[1:]:
                covered[d].update(range(p, p + k))
    out = []
    for d, _ in docs:
        w = toks[d]
        keep = [t for i, t in enumerate(w) if i not in covered[d]]
        out.append((d, " ".join(keep), len(w), len(w) - len(keep)))
    import pandas as pd

    return pd.DataFrame(out, columns=["doc_id", "text", "n_tokens",
                                      "n_masked"]).sort_values("doc_id") \
        .reset_index(drop=True)


def test_span_dedup_hand_case():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dedup import span_dedup

    rows = [(0, "a b c d e f"), (1, "x y a b c d q"), (2, "  "),
            (3, "a b c d"), (4, "p q r"), (5, "a b c d a b c d")]
    ds = rd.from_arrow(pa.table({"doc_id": [r[0] for r in rows],
                                 "text": [r[1] for r in rows]})).repartition(3)
    got = span_dedup(ds, k=4, num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _span_dedup_oracle(rows, 4)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_span_dedup_random_vs_brute_force_and_parallelism():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dedup import span_dedup

    rng = np.random.default_rng(23)
    vocab = [f"w{j}" for j in range(12)]  # small vocab => many dup windows
    rows = [(i, " ".join(rng.choice(vocab, rng.integers(0, 25))))
            for i in range(60)]
    t = pa.table({"doc_id": [r[0] for r in rows],
                  "text": [r[1] for r in rows]})
    want = _span_dedup_oracle(rows, 3)

    def run(blocks, parts):
        return span_dedup(rd.from_arrow(t).repartition(blocks), k=3,
                          num_partitions=parts).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    a = run(1, 2)
    b = run(8, 16)
    pd.testing.assert_frame_equal(a[want.columns], want)
    pd.testing.assert_frame_equal(b[want.columns], want)


def test_label_centroids_match_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.similarity import label_centroids

    rng = np.random.default_rng(5)
    n, d = 80, 6
    mat = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 4, n).astype(np.int32)
    t = pa.table({"embedding": pa.array(list(mat), pa.list_(pa.float32())),
                  "label": pa.array(labels)})

    out = label_centroids(rd.from_arrow(t).repartition(5), num_partitions=3) \
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    for lab in range(4):
        want = mat[labels == lab].astype(np.float64).mean(axis=0)
        got = out[out["label"] == lab]["centroid"].to_numpy()
        assert np.allclose(got, want, atol=1e-12)


def test_nearest_centroid_confusion_vs_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.similarity import (
        nearest_centroid_confusion,
    )

    rng = np.random.default_rng(13)
    # 3 well-separated clusters with a few strays
    centers = np.array([[0.0] * 4, [10.0] * 4, [-10.0, 10.0, -10.0, 10.0]])
    labels = rng.integers(0, 3, 120)
    X = centers[labels] + rng.normal(0, 1.0, (120, 4))
    t = pa.table({"embedding": pa.array(list(X.astype(np.float32)),
                                        pa.list_(pa.float32())),
                  "label": pa.array(labels.astype(np.int32))})
    out = nearest_centroid_confusion(rd.from_arrow(t).repartition(5),
                                     num_partitions=3).to_pandas()
    # reference: numpy means + argmin
    Xd = X.astype(np.float32).astype(np.float64)
    C = np.stack([Xd[labels == j].mean(axis=0) for j in range(3)])
    pred = np.argmin(((Xd[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
    import pandas as pd

    want = pd.DataFrame({"label": labels.astype(np.int64), "pred": pred}) \
        .groupby(["label", "pred"], as_index=False).size() \
        .rename(columns={"size": "n"})
    got = out.sort_values(["label", "pred"]).reset_index(drop=True)
    want = want.sort_values(["label", "pred"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_kmeans_lloyd_matches_local_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(21)
    centers = np.array([[0.0] * 4, [12.0] * 4, [-12.0, 12.0, -12.0, 12.0]])
    X = np.concatenate([c + rng.normal(0, 1, (40, 4)) for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X.astype(np.float32)),
                                        pa.list_(pa.float32()))})
    out = kmeans_lloyd(rd.from_arrow(t).repartition(5), k=3, iters=2) \
        .to_pandas().sort_values("cluster").reset_index(drop=True)

    # local reference Lloyd with the same seed/tie rules
    Xd = X.astype(np.float32).astype(np.float64)
    C = Xd[:3].copy()
    for _ in range(2):
        a = np.argmin(((Xd[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
        for j in range(3):
            if (a == j).any():
                C[j] = Xd[a == j].mean(axis=0)
    a = np.argmin(((Xd[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
    import pandas as pd

    want = pd.DataFrame({"cluster": ids[:3][a], "id": ids}) \
        .groupby("cluster", as_index=False).agg(n=("id", "size"),
                                                sum_ids=("id", "sum")) \
        .sort_values("cluster").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), want.astype("int64"))


def test_ngram_containment_mode():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dedup import ngram_jaccard_pairs

    small = "alpha beta gamma delta epsilon"           # 3 grams
    big = small + " zeta eta theta iota kappa lam mu"  # superset, many more grams
    other = "one two three four five six seven"
    docs = pa.table({"doc_id": [1, 2, 3], "text": [small, big, other]})
    ds = rd.from_arrow(docs).repartition(2)
    # containment of small in big = 1.0 -> pair found even though
    # Jaccard is low
    cont = ngram_jaccard_pairs(ds, threshold_num=9, threshold_den=10,
                               mode="containment", num_partitions=4).to_pandas()
    assert sorted(zip(cont["id_a"], cont["id_b"])) == [(1, 2)]
    jac = ngram_jaccard_pairs(ds, threshold_num=9, threshold_den=10,
                              num_partitions=4).to_pandas()
    assert len(jac) == 0


def test_semdedup_brute_force_and_cross_cluster_blindness():
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.similarity import semdedup

    # two well-separated centers; within each, a tight trio of near-dups
    # plus isolated points. Pairs 0-1-2 and 10-11 are near-dups; 0 and 10
    # are NOT (different clusters), so semdedup must keep both.
    rng = np.random.default_rng(7)
    base_a = np.array([10.0, 0.0, 0.0, 0.0])
    base_b = np.array([-10.0, 0.0, 0.0, 0.0])
    rows = [base_a, base_a * 1.001, base_a * 0.999,          # ids 0,1,2 dups
            base_a + np.array([0, 9, 0, 0]),                  # id 3 far in-cluster
            base_b, base_b * 1.002,                           # ids 4,5 dups
            base_b + np.array([0, 0, 9, 0])]                  # id 6 isolated
    rows += [rng.normal(0, 2.5, 4) + base_a for _ in range(3)]  # 7,8,9 noise
    X = np.stack(rows).astype(np.float32)
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X), pa.list_(pa.float32()))})
    out = semdedup(rd.from_arrow(t).repartition(3), k=2, iters=2,
                   threshold=0.999, num_partitions=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)

    assert len(out) == len(ids)
    by = dict(zip(out["vec_id"], zip(out["cluster_id"], out["keep"])))
    # dup trio keeps only the smallest id
    assert by[0] == (0, True) and by[1] == (0, False) and by[2] == (0, False)
    # second cluster's dup pair keeps 4, drops 5 — cross-cluster pair
    # (0, 4) must NOT merge even though cos(base_a, base_a) == cos rule
    assert by[4] == (4, True) and by[5] == (4, False)
    # isolated rows are their own singleton clusters, kept
    for i in (3, 6):
        assert by[i] == (i, True)
    # exactly the three dup followers are dropped
    assert int((~out["keep"]).sum()) == 3


def test_knn_graph_exact_and_parallelism_invariant(embeddings):
    from opentelemetry_collector_contrib_ray.stages.similarity import knn_graph, _to_matrix

    m = _to_matrix(embeddings["embedding"])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    k = 3
    want = set()
    for q in range(len(m)):
        order = np.lexsort((np.arange(len(m)), -sims[q]))[:k]
        want |= {(q, int(j)) for j in order}

    got_sets = []
    for nblocks in (1, 6):
        ds = rd.from_arrow(embeddings).repartition(nblocks)
        out = knn_graph(ds, k=k).to_pandas()
        assert (out["query_id"] != out["vec_id"]).all()  # no self edges
        assert out.groupby("query_id").size().eq(k).all()
        got_sets.append(set(zip(out["query_id"], out["vec_id"])))
    assert got_sets[0] == got_sets[1] == want


def test_hard_negatives_masks_same_label_and_self():
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.similarity import (
        hard_negatives,
    )

    rng = np.random.default_rng(17)
    n, d = 120, 8
    vecs = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(np.int64)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.astype(np.float32).tolist()
                               for v in vecs]),
        "label": pa.array(labels),
    })
    for nblocks in (1, 4):
        out = hard_negatives(
            rd.from_arrow(t).repartition(nblocks),
            lambda b: pc.less(pc.cast(b["vec_id"], pa.int64()), 5), k=4)
        assert out.num_rows == 5 * 4
        q = out["query_id"].to_numpy(zero_copy_only=False)
        v = out["vec_id"].to_numpy(zero_copy_only=False)
        assert (q != v).all()                       # never self
        assert (labels[v] != labels[q]).all()       # never same label
        # brute-force reference
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vn[:5] @ vn.T
        for qi in range(5):
            s = sims[qi].copy()
            s[labels == labels[qi]] = -np.inf
            s[qi] = -np.inf
            order = np.lexsort((np.arange(n), -s))[:4]
            assert sorted(v[q == qi].tolist()) == sorted(order.tolist())


def test_mmr_prefers_diversity_over_pure_relevance():
    # hand-built: probe at e0; two near-duplicates along e0 (highest
    # rel) and one orthogonal-ish vector; MMR must pick the orthogonal
    # one at step 2 even though the second duplicate has higher rel
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_emb_mmr_select,
    )
    import tempfile, os
    import pyarrow.parquet as pq

    d = 4
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],          # probe
        1: [0.99, 0.1, 0.0, 0.0],         # dup A (top rel)
        2: [0.98, 0.12, 0.0, 0.0],        # dup B (2nd rel)
        3: [0.5, 0.0, 0.86, 0.0],         # diverse, lower rel
        4: [0.4, 0.0, 0.0, 0.9],          # diverse, lowest rel
    }
    t = pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([np.asarray(vecs[i], np.float32).tolist()
                               for i in sorted(vecs)]),
        "label": pa.array([0] * len(vecs), pa.int32()),
    })
    tmp = tempfile.mkdtemp(prefix="mmr_", dir="/tmp")
    pq.write_table(t, os.path.join(tmp, "embeddings.parquet"))
    out = q_emb_mmr_select(tmp).to_pandas().sort_values("step")
    picks = out.vec_id.tolist()
    assert picks[0] == 1                  # pure relevance first
    assert picks[1] in (3, 4)             # diversity beats dup B
    assert 2 in picks[2:] or 2 not in picks  # dup B only after diverse


def test_incremental_dedup_matches_full_recompute():
    """Two-run incremental dedup (run 1 persists key state, run 2
    self-dedups then anti-joins the state) must equal one-shot
    keep-first over the concatenation ordered by (batch, id)."""
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.joins import large_anti_join

    b0 = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                   "k": ["a", "b", "a", "c"]})       # dup 'a' within batch 0
    b1 = pa.table({"doc_id": pa.array([5, 6, 7, 8], pa.int64()),
                   "k": ["b", "d", "d", "e"]})       # 'b' dups state, 'd' dups itself

    kept0 = exact_dedup(rd.from_arrow(b0), col="k", id_col="doc_id",
                        num_partitions=4).materialize()
    state = rd.from_arrow(pa.table({"k": pa.concat_tables(
        [t.select(["k"]) for t in kept0.iter_batches(batch_format="pyarrow")]
    )["k"]}))
    kept1 = large_anti_join(
        exact_dedup(rd.from_arrow(b1), col="k", id_col="doc_id",
                    num_partitions=4),
        state, on="k", num_partitions=4)
    got = kept0.union(kept1).to_pandas().sort_values("doc_id")

    full = pd.concat([b0.to_pandas(), b1.to_pandas()])
    want = full.drop_duplicates("k", keep="first").sort_values("doc_id")
    assert got.doc_id.tolist() == want.doc_id.tolist() == [1, 2, 4, 6, 8]


def test_pq_codes_separable_subspaces():
    """4 tight well-separated groups per subspace with seeds (ids 0-3)
    one in each group -> codes == group membership, and the two
    subspaces code INDEPENDENTLY (vector 4 pairs group 0 in subspace a
    with group 1 in subspace b)."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.similarity import pq_codes

    def vec(ga, gb, eps):
        return [10.0 * ga + eps, 10.0 * ga - eps,
                10.0 * gb + eps, 10.0 * gb - eps]

    rows = [vec(0, 0, 0.1), vec(1, 1, 0.1), vec(2, 2, 0.1), vec(3, 3, 0.1),
            vec(0, 1, 0.2), vec(0, 1, 0.3), vec(2, 3, 0.2)]
    df = pd.DataFrame({"vec_id": range(len(rows)), "embedding": rows})
    out = (pq_codes(rd.from_pandas(df).repartition(3),
                    splits=[(0, 2), (2, 4)], k=4, iters=2)
           .to_pandas().sort_values(["code_a", "code_b"])
           .reset_index(drop=True))
    got = {(r.code_a, r.code_b): r.n for r in out.itertuples()}
    # seeds 0-3 self-code; ids 4,5 -> (0,1); id 6 -> (2,3)
    assert got == {(0, 0): 1, (1, 1): 1, (2, 2): 1, (3, 3): 1,
                   (0, 1): 2, (2, 3): 1}


def test_pq_adc_topk_prefers_query_cluster():
    """ADC distance of vectors sharing the query's subspace clusters is
    ~0; far clusters rank last; self (seed of its own code) is top-1."""
    import pandas as pd
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.stages.similarity import pq_adc_topk

    def vec(ga, gb, eps):
        return [10.0 * ga + eps, 10.0 * ga - eps,
                10.0 * gb + eps, 10.0 * gb - eps]

    rows = [vec(0, 0, 0.1), vec(1, 1, 0.1), vec(2, 2, 0.1), vec(3, 3, 0.1),
            vec(0, 0, 0.2), vec(3, 3, 0.2), vec(0, 3, 0.1)]
    df = pd.DataFrame({"vec_id": range(len(rows)), "embedding": rows})
    q = [10.0, 10.0, 10.0, 10.0]            # dead-center of group (1,1)
    out = pq_adc_topk(rd.from_pandas(df).repartition(3), q,
                      splits=[(0, 2), (2, 4)], k_codes=4, iters=2, topk=3)
    got = out.to_pandas()
    assert got.vec_id.iloc[0] == 1           # code (1,1) — distance ≈ 0
    assert got.adc_dist.iloc[0] < got.adc_dist.iloc[1] or (
        got.adc_dist.iloc[0] == got.adc_dist.iloc[1])
    assert len(got) == 3


def test_candidate_eval_composition(tmp_path):
    """tp/fp/fn partition the union of blocker and truth pair sets:
    tp + fp = |candidates|, tp + fn = |exact|."""
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_docs_candidate_eval, q_docs_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    ev = q_docs_candidate_eval(sf).to_pandas().set_index("category")["n"]
    exact = q_docs_ngram_jaccard(sf).to_pandas()
    assert ev.get("tp", 0) + ev.get("fn", 0) == len(exact)
    assert ev.get("tp", 0) >= 0 and ev.get("fp", 0) >= 0


def test_prefix_jaccard_matches_inverted_index_exact():
    """PPJoin prefix filtering + exact verification equals the
    inverted-index all-pairs join with no df cap — including on a
    corpus with a stopword gram shared by EVERY doc (the case the
    prefix must skip without losing pairs)."""
    import pandas as pd
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    stop = "the quick brown "       # shared trigram in every doc
    body = "alpha beta gamma delta epsilon zeta eta theta "
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [stop + body * 4,
                 stop + body * 4 + "tail",          # near-dup of 1
                 stop + body * 4 + "tail extra",    # near-dup of 1, 2
                 stop + "totally different words here repeated " * 5,
                 stop + "yet another unrelated document body " * 5],
    })
    ds = rd.from_pandas(docs).repartition(3)

    def pairset(out):
        df = out.to_pandas()
        if len(df) == 0:
            return set()
        return set(zip(df["id_a"], df["id_b"], df["shared"]))

    exact = pairset(ngram_jaccard_pairs(
        rd.from_pandas(docs).repartition(3),
        threshold_num=8, threshold_den=10, n=3, max_df=None))
    pref = pairset(ngram_jaccard_prefix_pairs(
        ds, threshold_num=8, threshold_den=10, n=3))
    assert pref == exact and len(pref) >= 1

    # no-pair corpus -> empty both ways
    lonely = pd.DataFrame({"doc_id": [1, 2],
                           "text": ["one two three four five six",
                                    "seven eight nine ten eleven twelve"]})
    assert pairset(ngram_jaccard_prefix_pairs(
        rd.from_pandas(lonely), threshold_num=8, threshold_den=10,
        n=3)) == set()
