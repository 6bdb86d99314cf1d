"""Benchmark decontamination (stages/decontam.py)."""

import pyarrow as pa
import ray.data as rd

from opentelemetry_collector_contrib_ray.stages.decontam import (
    collect_benchmark_ngrams,
    decontaminate,
)


def _run(train_rows, bench_rows, n=3, min_hits=1):
    bench = rd.from_arrow(pa.table({
        "doc_id": list(range(len(bench_rows))),
        "text": bench_rows,
    }))
    train = rd.from_arrow(pa.table({
        "doc_id": list(range(100, 100 + len(train_rows))),
        "text": train_rows,
    }))
    grams = collect_benchmark_ngrams(bench, n=n)
    out = decontaminate(train, grams, n=n, min_hits=min_hits)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_overlapping_trigram_flags_doc():
    df = _run(
        train_rows=[
            "the quick brown fox jumps",      # shares "quick brown fox"
            "entirely different words here",  # clean
            "quick brown fox quick brown fox",  # distinct overlap counted once per gram
        ],
        bench_rows=["a quick brown fox ran"],
    )
    assert list(df["contaminated"]) == [True, False, True]
    # doc 0: grams {the quick brown, quick brown fox, brown fox jumps} -> 1 hit
    assert df["n_bad"][0] == 1
    # doc 2 has distinct grams {quick brown fox, brown fox quick, fox quick brown};
    # only "quick brown fox" is in the bench set
    assert df["n_bad"][2] == 1


def test_short_and_null_docs_clean():
    train = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["two words", None, ""],
    }))
    bench = rd.from_arrow(pa.table({"doc_id": [0], "text": ["two words only"]}))
    grams = collect_benchmark_ngrams(bench, n=3)
    df = decontaminate(train, grams, n=3).to_pandas().sort_values("doc_id")
    assert list(df["n_bad"]) == [0, 0, 0]
    assert not df["contaminated"].any()


def test_min_hits_threshold():
    df = _run(
        train_rows=["alpha beta gamma delta epsilon zeta"],
        bench_rows=["alpha beta gamma delta"],
        min_hits=3,
    )
    # shared grams: "alpha beta gamma", "beta gamma delta" -> 2 < 3
    assert df["n_bad"][0] == 2
    assert not df["contaminated"][0]


def test_empty_benchmark():
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    grams = collect_benchmark_ngrams(bench, n=3)
    assert len(grams) == 0
    train = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b c d"]}))
    df = decontaminate(train, grams, n=3).to_pandas()
    assert list(df["n_bad"]) == [0]
