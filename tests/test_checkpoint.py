"""Generic resume: result-level ``checkpointed`` for global queries and
per-shard ``run_partitioned`` for map-style pipelines (non-flagship)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.state import checkpointed, run_partitioned


def _docs_table(n=40, seed=1):
    rng = np.random.Generator(np.random.PCG64(seed))
    texts = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"], 8))
        for _ in range(n - n // 4)
    ]
    texts += texts[: n - len(texts)]  # exact dups → guaranteed pairs
    return pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                     "text": pa.array(texts)})


def test_checkpointed_global_query_skips_recompute(tmp_path):
    """docs_ngram_jaccard-style global pipeline under ``checkpointed``:
    second run must NOT re-execute (it streams the stored result)."""
    from opentelemetry_collector_contrib_ray.stages.dedup import ngram_jaccard_pairs

    docs = _docs_table()
    calls = []

    def run():
        calls.append(1)
        return ngram_jaccard_pairs(rd.from_arrow(docs), threshold_num=1,
                                   threshold_den=2, n=3)

    first = checkpointed("ngram", run, str(tmp_path))
    assert calls == [1]
    second = checkpointed("ngram", run, str(tmp_path))
    assert calls == [1], "committed query was re-executed"
    key = lambda t: sorted(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()))
    assert key(first) == key(second) and len(first) > 0


def test_checkpointed_killed_run_recomputes(tmp_path):
    """A run that dies mid-computation leaves no manifest: the rerun
    recomputes from scratch (no partial output is visible)."""
    calls = []

    def dies():
        calls.append("dead")
        raise RuntimeError("killed")

    with pytest.raises(RuntimeError):
        checkpointed("q", dies, str(tmp_path))

    def ok():
        calls.append("ok")
        return pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})

    out = checkpointed("q", ok, str(tmp_path))
    assert calls == ["dead", "ok"]
    assert out["x"].to_pylist() == [1, 2, 3]
    # and now it's committed
    assert checkpointed("q", dies, str(tmp_path))["x"].to_pylist() == [1, 2, 3]


def test_run_partitioned_nonflagship_skips_committed_shards(tmp_path):
    """Per-shard resume on a row-wise (shardable) query — rolling
    fingerprints: commit 2 of 3 shards, then a full run executes ONLY
    the remaining shard and total output is identical to a fresh run."""
    from opentelemetry_collector_contrib_ray.stages.text import rolling_fingerprint

    shards = {}
    for i in range(3):
        p = tmp_path / f"shard{i}.parquet"
        pq.write_table(_docs_table(20, seed=i), p)
        shards[f"shard{i}"] = [str(p)]

    executed = []

    def pipeline(files):
        executed.append(files[0])
        ds = rd.read_parquet(files).map_batches(
            lambda t: rolling_fingerprint(t).select(["doc_id", "fingerprint"]),
            batch_format="pyarrow")
        return {"fp": ds}

    root = str(tmp_path / "out")
    run_partitioned({k: shards[k] for k in ["shard0", "shard1"]}, pipeline, root)
    assert len(executed) == 2
    lineage = run_partitioned(shards, pipeline, root)
    assert len(executed) == 3, "committed shards were re-executed"
    assert sorted(r["partition"] for r in lineage) == ["shard0", "shard1", "shard2"]
    assert all(r["rows_out"]["fp"] == 20 for r in lineage)


def test_resumable_sweep_kill_resume_revenue_by_nation(ray_session, tmp_path,
                                                       monkeypatch):
    """Kill/resume on the real expensive-query sweep: the sweep dies
    INSIDE revenue_by_nation after two queries committed; the rerun
    skips the committed ones (their pipelines never execute again) and
    recomputes only the dead query, with results identical to a direct
    run."""
    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ckpt")
    names = ["orders_customer_join", "route_sink_counts", "revenue_by_nation"]
    calls = []
    real = {n: Q.QUERIES[n] for n in names}

    def spied(n):
        def fn(sf_dir):
            calls.append(n)
            return real[n](sf_dir)
        return fn

    for n in names:
        monkeypatch.setitem(Q.QUERIES, n, spied(n))
    # revenue dies mid-run on the first sweep (the "kill")
    monkeypatch.setitem(
        Q.QUERIES, "revenue_by_nation",
        lambda sf_dir: (_ for _ in ()).throw(RuntimeError("killed mid-query")))

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        Q.run_resumable_sweep(sf, names=names, root=root)
    assert calls == ["orders_customer_join", "route_sink_counts"]

    # "restart": restore the real query, rerun the sweep
    monkeypatch.setitem(Q.QUERIES, "revenue_by_nation",
                        spied("revenue_by_nation"))
    out = Q.run_resumable_sweep(sf, names=names, root=root)
    # committed queries did NOT re-execute; only the dead one ran
    assert calls == ["orders_customer_join", "route_sink_counts",
                     "revenue_by_nation"]
    direct = real["revenue_by_nation"](sf).to_pandas().sort_values(
        "n_name").reset_index(drop=True)
    got = out["revenue_by_nation"].to_pandas().sort_values(
        "n_name").reset_index(drop=True)
    assert got.equals(direct[got.columns.tolist()])
    # third sweep: everything streams from the store, zero executions
    Q.run_resumable_sweep(sf, names=names, root=root)
    assert len(calls) == 3


# --------------------------------------------- snapshot time travel


def test_snapshot_manifests_isolate_versions(tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.state.snapshots import (
        commit_snapshot,
        latest_version,
        read_snapshot_files,
    )

    root = str(tmp_path)
    f1 = os.path.join(root, "a.parquet")
    f2 = os.path.join(root, "b.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), f1)
    pq.write_table(pa.table({"x": [3]}), f2)
    commit_snapshot(root, 1, [f1])
    commit_snapshot(root, 2, [f2], parent=1)
    assert read_snapshot_files(root, 1) == [f1]
    assert read_snapshot_files(root, 2) == [f1, f2]
    assert latest_version(root) == 2
    # committing v3 doesn't disturb v1/v2 readers
    f3 = os.path.join(root, "c.parquet")
    pq.write_table(pa.table({"x": [9]}), f3)
    commit_snapshot(root, 3, [f3], parent=2)
    assert read_snapshot_files(root, 1) == [f1]
    assert read_snapshot_files(root, 3) == [f1, f2, f3]


def test_snapshot_tombstones_merge_on_read(tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.state.snapshots import (
        commit_snapshot,
        read_snapshot,
        read_snapshot_delete_keys,
    )

    root = str(tmp_path)
    f1 = os.path.join(root, "d.parquet")
    pq.write_table(pa.table({"id": [1, 2, 3, 4]}), f1)
    commit_snapshot(root, 1, [f1])
    t1 = os.path.join(root, "del1.parquet")
    pq.write_table(pa.table({"id": [2]}), t1)
    commit_snapshot(root, 2, [], parent=1, delete_files=[t1])
    t2 = os.path.join(root, "del2.parquet")
    pq.write_table(pa.table({"id": [4]}), t2)
    commit_snapshot(root, 3, [], parent=2, delete_files=[t2])

    assert read_snapshot_delete_keys(root, 1, "id").to_pylist() == []
    assert read_snapshot_delete_keys(root, 2, "id").to_pylist() == [2]
    # deletes accumulate through parents
    assert sorted(read_snapshot_delete_keys(root, 3, "id").to_pylist()) \
        == [2, 4]
    assert read_snapshot(root, 3)["files"] == ["d.parquet"]


def test_snapshot_upserts_last_writer_wins(tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.state.snapshots import (
        commit_snapshot,
        read_snapshot_upserts,
    )

    root = str(tmp_path)
    base = os.path.join(root, "base.parquet")
    pq.write_table(pa.table({"id": [1, 2, 3], "v": [10, 20, 30]}), base)
    commit_snapshot(root, 1, [base])
    u1 = os.path.join(root, "u1.parquet")
    pq.write_table(pa.table({"id": [2, 3], "v": [21, 31]}), u1)
    commit_snapshot(root, 2, [], parent=1, upsert_files=[u1])
    u2 = os.path.join(root, "u2.parquet")
    pq.write_table(pa.table({"id": [3], "v": [32]}), u2)
    commit_snapshot(root, 3, [], parent=2, upsert_files=[u2])

    mk, repl = read_snapshot_upserts(root, 1, "id")
    assert len(mk) == 0 and repl is None
    mk, repl = read_snapshot_upserts(root, 3, "id")
    got = dict(zip(repl["id"].to_pylist(), repl["v"].to_pylist()))
    assert got == {2: 21, 3: 32}          # newest writer wins for id 3
    assert sorted(mk.to_pylist()) == [2, 3]
    mk2, repl2 = read_snapshot_upserts(root, 2, "id")
    assert dict(zip(repl2["id"].to_pylist(),
                    repl2["v"].to_pylist())) == {2: 21, 3: 31}


def test_round4_heavy_queries_resume_from_store(ray_session, tmp_path):
    """The round-4 RESUMABLE_QUERIES additions roundtrip through the
    result store: first run computes + commits, second run streams the
    committed result (pipeline NOT re-executed) with identical values."""
    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ckpt")
    for name in ["docs_bpe_merges", "docs_bm25_topk"]:
        first = Q.resumable_query(name, sf, root=root).to_pandas()
        real = Q.QUERIES[name]
        try:
            Q.QUERIES[name] = lambda sf_dir: (_ for _ in ()).throw(
                AssertionError("must not re-execute"))
            second = Q.resumable_query(name, sf, root=root).to_pandas()
        finally:
            Q.QUERIES[name] = real
        cols = sorted(first.columns)
        a = first[cols].sort_values(cols).reset_index(drop=True)
        b = second[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b)


def test_resumable_sweep_kill_resume_conv_curation_e2e(ray_session, tmp_path,
                                                       monkeypatch):
    """Same kill/resume contract on the transcripts-axis flagship
    composition: a sweep dying inside conv_curation_e2e resumes
    without re-executing the committed query, and the recovered funnel
    equals a direct run row-for-row."""
    from opentelemetry_collector_contrib_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ckpt")
    names = ["conv_template_dedup", "conv_curation_e2e"]
    calls = []
    real = {n: Q.QUERIES[n] for n in names}

    def spied(n):
        def fn(sf_dir):
            calls.append(n)
            return real[n](sf_dir)
        return fn

    monkeypatch.setitem(Q.QUERIES, "conv_template_dedup",
                        spied("conv_template_dedup"))
    monkeypatch.setitem(
        Q.QUERIES, "conv_curation_e2e",
        lambda sf_dir: (_ for _ in ()).throw(RuntimeError("killed")))

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        Q.run_resumable_sweep(sf, names=names, root=root)
    assert calls == ["conv_template_dedup"]

    monkeypatch.setitem(Q.QUERIES, "conv_curation_e2e",
                        spied("conv_curation_e2e"))
    out = Q.run_resumable_sweep(sf, names=names, root=root)
    assert calls == ["conv_template_dedup", "conv_curation_e2e"]
    direct = real["conv_curation_e2e"](sf).to_pandas().sort_values(
        "stage").reset_index(drop=True)
    got = out["conv_curation_e2e"].to_pandas().sort_values(
        "stage").reset_index(drop=True)
    assert got.equals(direct[got.columns.tolist()])


def test_sigkill_mid_shuffle_resume_hash_identical(ray_session, tmp_path):
    """REAL kill/resume on a shuffle-heavy query: a separate driver
    process joins this session's cluster, starts the checkpointed
    docs_ngram_jaccard (inverted-shingle exchange + pair-hash
    exchange) and is SIGKILLed mid-execution — while the shuffle is in
    flight. The atomic temp-dir + manifest protocol must leave NO
    committed state, and the resumed run must recompute a result
    hash-identical to a direct run."""
    import os
    import signal
    import subprocess
    import sys
    import time

    import pandas as pd

    import opentelemetry_collector_contrib_ray as pkg
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        QUERIES, resumable_query)
    from opentelemetry_collector_contrib_ray.state.checkpoint import PartitionCheckpointer

    sf = "/root/testdata/sf0.01"
    root = str(tmp_path / "ckpt")
    os.makedirs(root, exist_ok=True)
    child = tmp_path / "child.py"
    child.write_text(
        "import os, sys\n"
        "import ray\n"
        "root, sf = sys.argv[1], sys.argv[2]\n"
        "ray.init(address='auto', include_dashboard=False,"
        " log_to_driver=False)\n"
        "open(os.path.join(root, 'started'), 'w').write('1')\n"
        "from opentelemetry_collector_contrib_ray.pipelines.queries import resumable_query\n"
        "resumable_query('docs_ngram_jaccard', sf, root=root)\n"
        "open(os.path.join(root, 'finished'), 'w').write('1')\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(pkg.__file__))

    p = subprocess.Popen([sys.executable, str(child), root, sf], env=env,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    t0 = time.time()
    while (not os.path.exists(os.path.join(root, "started"))
           and time.time() - t0 < 90):
        time.sleep(0.05)
    assert os.path.exists(os.path.join(root, "started"))
    time.sleep(1.2)  # the query runs ~3 s on this cluster: mid-shuffle
    os.kill(p.pid, signal.SIGKILL)
    p.wait()

    # the kill landed before completion and committed NOTHING
    assert not os.path.exists(os.path.join(root, "finished"))
    slug = sf.rstrip("/").replace("/", "_").lstrip("_")
    ck = PartitionCheckpointer(root)
    assert not ck.is_done(f"docs_ngram_jaccard@{slug}")

    # resume: recomputes (no manifest) and commits
    res = resumable_query("docs_ngram_jaccard", sf, root=root)
    assert ck.is_done(f"docs_ngram_jaccard@{slug}")
    direct = QUERIES["docs_ngram_jaccard"](sf)
    a = res.to_pandas()
    b = direct if isinstance(direct, pd.DataFrame) else direct.to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    # third pass streams from the store without executing
    res2 = resumable_query("docs_ngram_jaccard", sf, root=root)
    assert res2.to_pandas()[cols].sort_values(cols).reset_index(
        drop=True).equals(a)
