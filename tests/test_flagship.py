"""End-to-end flagship invariants (FIXTURES.md §6):
per-turn text equality, routed-set and count equality vs a
single-process oracle, determinism across parallelism, resume."""

import glob
import json
import os
import re

import pyarrow as pa
import pyarrow.dataset as pads
import pytest
import ray.data as rd

from opentelemetry_collector_contrib_ray.pipelines.flagship import (
    LOG_RE,
    TOOL_SERVICE,
    TOOL_SERVICE_DEFAULTS,
    build_parse_chain,
    flagship,
    run_flagship,
)
from opentelemetry_collector_contrib_ray.sources.transcripts import (
    ensure_transcripts_parquet,
    generate_transcripts,
)


def oracle_flagship(t: pa.Table):
    """Row-at-a-time python oracle of parse+enrich+route."""
    rx = re.compile(LOG_RE)
    rows = t.to_pylist()
    sinks = {s: [] for s in ["search", "errors", "audit", "tools", "default"]}
    for i, r in enumerate(rows):
        level = status = None
        m = rx.match(r["text"])
        if m:
            level = m.group("level")
            status = int(m.group("status"))
        elif r["text"].startswith("latency_ms=") and "status=" in r["text"]:
            sm = re.search(r"(?:^| )status=([^ ]*)", r["text"])
            if sm and sm.group(1).isdigit():
                status = int(sm.group(1))
        sev = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}.get(
            level or "", 0
        )
        service = TOOL_SERVICE.get(r["tool"], TOOL_SERVICE_DEFAULTS)["service"]
        key = (r["conv_id"], r["turn_idx"])
        if service == "search-svc":
            sinks["search"].append(key)
        elif sev >= 17:
            sinks["errors"].append(key)
        elif status is not None and status >= 500:
            sinks["errors"].append(key)
            sinks["audit"].append(key)
        elif r["role"] == "tool":
            sinks["tools"].append(key)
        else:
            sinks["default"].append(key)
    return sinks


@pytest.fixture(scope="module")
def t10k():
    return generate_transcripts(10_000)


def test_routed_sets_and_text_equality(t10k):
    sinks, _ = flagship(rd.from_arrow(t10k), enrich_concurrency=2)
    expected = oracle_flagship(t10k)
    text_of = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t10k.to_pylist()
    }
    for name, ds in sinks.items():
        df = ds.to_pandas()
        got = sorted(zip(df["conv_id"], df["turn_idx"]))
        assert got == sorted(expected[name]), f"routed-set mismatch in {name}"
        # north-rule invariant: per-turn text equality under (conv_id, turn_idx)
        for _, row in df.iterrows():
            assert row["text"] == text_of[(row["conv_id"], row["turn_idx"])]


def test_counts_match_routed_rows(t10k):
    sinks, counts = flagship(rd.from_arrow(t10k), enrich_concurrency=2)
    for name in sinks:
        n = sinks[name].count()
        cdf = counts[name].to_pandas()
        turn_count = cdf[cdf.metric == "turn.count"]["count"].sum()
        assert turn_count == n, f"count connector disagrees with sink {name}"
        by_rt = cdf[cdf.metric == "turns.by.role.tool"]["count"].sum()
        assert by_rt == n


def test_determinism_across_parallelism(t10k):
    a_sinks, _ = flagship(rd.from_arrow(t10k).repartition(1), enrich_concurrency=1)
    b_sinks, _ = flagship(rd.from_arrow(t10k).repartition(7), enrich_concurrency=3)
    for name in a_sinks:
        a = a_sinks[name].to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = b_sinks[name].to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert a[["conv_id", "turn_idx", "text"]].equals(b[["conv_id", "turn_idx", "text"]])


def test_run_flagship_resume(tmp_path):
    inp = ensure_transcripts_parquet(4000, root=str(tmp_path / "in"))
    # shard the input into 2 files for 2 partitions
    import pyarrow.parquet as pq

    t = generate_transcripts(4000)
    os.makedirs(tmp_path / "shards", exist_ok=True)
    pq.write_table(t.slice(0, 2000), tmp_path / "shards" / "s0.parquet")
    pq.write_table(t.slice(2000), tmp_path / "shards" / "s1.parquet")

    root = str(tmp_path / "out")
    lineage = run_flagship(str(tmp_path / "shards"), root)
    assert len(lineage) == 2 and all(l["status"] == "done" for l in lineage)

    def snapshot():
        out = {}
        for d in glob.glob(os.path.join(root, "*", "*")):
            if os.path.isdir(d):
                out[d] = pads.dataset(d).count_rows()
        return out

    first = snapshot()
    # delete one partition's manifest → only that partition reruns
    os.remove(os.path.join(root, "_manifests", "s0.json"))
    lineage2 = run_flagship(str(tmp_path / "shards"), root)
    assert snapshot() == first  # byte-identical row counts after resume
    recommitted = [l for l in lineage2 if l["partition"] == "s0"]
    assert recommitted and recommitted[0]["status"] == "done"
    # s1 must NOT have been recomputed (manifest timestamp unchanged)
    t1a = [l for l in lineage if l["partition"] == "s1"][0]["committed_at"]
    t1b = [l for l in lineage2 if l["partition"] == "s1"][0]["committed_at"]
    assert t1a == t1b


def test_two_pass_counts_survive_task_retry(tmp_path):
    """Inject a real task failure + Ray retry into a streaming pass:
    counts derived from the COMMITTED output (two_pass mode) are
    unchanged — the write is idempotent per output file, so a
    re-executed task cannot double-count. (The inline collector is
    documented as not retry-safe; this is why two_pass is the
    default.)"""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    t = generate_transcripts(4000)
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(t, inp / "t.parquet")
    marker = str(tmp_path / "boom_once")

    def flaky(b: pa.Table) -> pa.Table:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            raise RuntimeError("injected failure — Ray must retry this task")
        except FileExistsError:
            return b

    ds = rd.read_parquet(str(inp), override_num_blocks=4).map_batches(
        flaky, batch_format="pyarrow", retry_exceptions=True, max_retries=4,
    )
    out = tmp_path / "sinks"
    ds.write_parquet(str(out))
    assert os.path.exists(marker)  # the failure really fired
    assert pads.dataset(str(out)).count_rows() == 4000  # exactly once


def test_single_pass_counts_match_flagship(tmp_path):
    """Inline sidecar counts == per-sink lazy aggregates == two-pass."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.pipelines.single_pass import run_single_pass

    t = generate_transcripts(6000)
    inp = tmp_path / "in"
    inp.mkdir()
    pq.write_table(t, inp / "t.parquet")

    r_inline = run_single_pass(str(inp), str(tmp_path / "o1"),
                               enrich_concurrency=2, counts_mode="inline")
    r_two = run_single_pass(str(inp), str(tmp_path / "o2"),
                            enrich_concurrency=2, counts_mode="two_pass")
    r_part = run_single_pass(str(inp), str(tmp_path / "o3"),
                             enrich_concurrency=2, counts_mode="partials")
    assert set(r_inline["counts"]) == set(r_two["counts"]) == set(r_part["counts"])
    for s in r_two["counts"]:
        a = r_inline["counts"][s].sort_values(["metric", "attrs"]).reset_index(drop=True)
        b = r_two["counts"][s].sort_values(["metric", "attrs"]).reset_index(drop=True)
        p = r_part["counts"][s].sort_values(["metric", "attrs"]).reset_index(drop=True)
        assert a.equals(b), f"sink {s} inline vs two_pass"
        assert list(p["metric"]) == list(b["metric"]) and list(p["count"]) == list(
            b["count"]
        ), f"sink {s} partials vs two_pass"
    # and against the lazy flagship fan-out counts
    _, lazy_counts = flagship(rd.from_arrow(t), enrich_concurrency=2)
    for s, cds in lazy_counts.items():
        lz = cds.to_pandas().sort_values(["metric", "attrs"]).reset_index(drop=True)
        b = r_two["counts"][s].sort_values(["metric", "attrs"]).reset_index(drop=True)
        assert lz["count"].tolist() == b["count"].tolist(), f"sink {s} lazy vs single-pass"


def test_job_entrypoint_flagship_and_query(ray_session, tmp_path):
    """``ray job submit`` surface: a SECOND driver process joins the
    test cluster (address=auto — exactly what the job supervisor
    does), runs the flagship job over a small transcript corpus and a
    registry query job, and each prints one machine-readable summary
    line; outputs land as parquet."""
    import json
    import os
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts_parquet,
    )

    inp = ensure_transcripts_parquet(2000, root=str(tmp_path / "corpus"))

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)   # job.py falls back to address=auto
    env["PYTHONPATH"] = "/root/repo"

    out1 = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_contrib_ray.job",
         "--input", inp, "--out", str(tmp_path / "out"),
         "--summary-json", str(tmp_path / "summary.json")],
        env=env, capture_output=True, text=True, timeout=300)
    assert out1.returncode == 0, out1.stderr[-2000:]
    summary = json.loads(out1.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "flagship" and summary["counts"]
    assert os.path.isdir(summary["sinks"])
    assert json.loads(open(tmp_path / "summary.json").read()) == summary

    # query mode: any registry operator is cluster-runnable
    ev = pa.table({
        "event_id": pa.array(np.arange(1, 21), pa.int64()),
        "ts": pa.array(
            np.arange(20) * np.timedelta64(1, "h")
            + np.datetime64("2024-01-01T00:00:00", "us")),
        "user_id": pa.array(np.arange(20) % 3 + 1, pa.int64()),
        "event_type": ["view", "click"] * 10,
        "value": [1.0] * 20,
        "props": ["{}"] * 20,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(ev, sf / "events.parquet")
    out2 = subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_contrib_ray.job",
         "--query", "events_dow_hour_matrix", "--sf-dir", str(sf),
         "--out", str(tmp_path / "qout")],
        env=env, capture_output=True, text=True, timeout=300)
    assert out2.returncode == 0, out2.stderr[-2000:]
    s2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert s2["mode"] == "query" and s2["rows"] > 0
    back = pq.read_table(f"{tmp_path}/qout/events_dow_hour_matrix")
    assert back.num_rows == s2["rows"]
