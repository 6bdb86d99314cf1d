"""Sequence packing (stages/pack.py) — brute-force equivalence,
parallelism invariance, partial-sequence drop, empty docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.pack import doc_offsets, pack_sequences


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": ids, "text": texts})


def _brute_pack(texts, ids, seq_len):
    """Reference packer: python concat-and-split."""
    rows = []
    off = 0
    for i, s in zip(ids, texts):
        toks = s.split()
        if toks:
            for seq in range(off // seq_len, (off + len(toks) - 1) // seq_len + 1):
                rows.append((seq, i))
        off += len(toks)
    n_full = off // seq_len
    df = pd.DataFrame(rows, columns=["seq_id", "doc_id"])
    df = df[df.seq_id < n_full]
    return (df.groupby("seq_id", as_index=False)
            .agg(n_docs=("doc_id", "size"), first_doc=("doc_id", "min"),
                 last_doc=("doc_id", "max"))
            .sort_values("seq_id").reset_index(drop=True))


def _run(texts, ids=None, seq_len=4, blocks=3, num_buckets=5):
    ids = ids if ids is not None else list(range(len(texts)))
    ds = rd.from_arrow(_docs(texts, ids)).repartition(blocks)
    out = (pack_sequences(ds, seq_len=seq_len, num_buckets=num_buckets)
           .to_pandas().sort_values("seq_id").reset_index(drop=True))
    return out[["seq_id", "n_docs", "first_doc", "last_doc"]]


def test_matches_brute_force():
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 9)))
             for _ in range(40)]
    ids = list(range(100, 140))
    got = _run(texts, ids, seq_len=4)
    want = _brute_pack(texts, ids, 4)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_doc_offsets_are_global_cumsum():
    texts = ["a b c", "", "d e", "f", "g h i j"]
    ds = rd.from_arrow(_docs(texts)).repartition(2)
    offs, total = doc_offsets(ds, num_buckets=3)
    df = offs.to_pandas().sort_values("doc_id")
    assert total == 10
    assert df["offset"].tolist() == [0, 3, 3, 5, 6]
    assert df["n_tok"].tolist() == [3, 0, 2, 1, 4]


def test_partial_sequence_dropped():
    # 7 tokens, seq_len 4 -> only sequence 0 is full
    out = _run(["a b c", "d e f g"], seq_len=4)
    assert out["seq_id"].tolist() == [0]
    assert out["n_docs"].tolist() == [2]


def test_parallelism_invariance():
    rng = np.random.default_rng(11)
    texts = [" ".join("x" * 1 for _ in range(rng.integers(0, 15)))
             for _ in range(60)]
    a = _run(texts, seq_len=8, blocks=1, num_buckets=2)
    b = _run(texts, seq_len=8, blocks=7, num_buckets=9)
    pd.testing.assert_frame_equal(a, b)


def test_doc_spanning_many_sequences():
    # one 20-token doc followed by small ones; seq_len 4
    texts = [" ".join(f"t{j}" for j in range(20)), "a b", "c d e f"]
    got = _run(texts, seq_len=4)
    want = _brute_pack(texts, [0, 1, 2], 4)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
