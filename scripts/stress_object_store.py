"""Memory-pressure stress (r4 verdict task #5): cap the object store
and run the headline pipeline + the widest-shuffle queries at sf0.1,
asserting completion — the closest single-node proxy to multi-node
spill behavior: a 4 GB store cannot hold the working set of the
headline's 30M-row parse→enrich→route→count pass or the join/dedup
exchanges, so Ray MUST spill to disk and the pipelines MUST keep
streaming rather than OOM.

Usage:  python scripts/stress_object_store.py <cap_bytes|none> [sf_dir]
Prints one JSON line: {"cap": ..., "headline": sec, "queries": {...},
"sentinel": [...], "spilled_mb": ...}.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WIDE_QUERIES = [
    "q21_waiting_suppliers",      # 4-table multi-join battery
    "revenue_by_nation",          # large join + combiner
    "events_skew_join",           # hot/cold hybrid exchange
    "docs_ngram_jaccard",         # inverted-shingle + pair exchanges
    "conv_curation_e2e",          # conv-hash + content-hash funnel
]


def sentinel_sec() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((1200, 1200))
    t0 = time.time()
    for _ in range(3):
        a = a @ a
        a /= np.abs(a).max()
    return round(time.time() - t0, 4)


def main() -> None:
    cap = sys.argv[1] if len(sys.argv) > 1 else "none"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cap_bytes = None if cap == "none" else int(cap)

    import ray

    kw = {}
    if cap_bytes:
        kw["object_store_memory"] = cap_bytes
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES
    from opentelemetry_collector_contrib_ray.pipelines.single_pass import run_single_pass
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts_parquet, rows_for_sf)

    n_rows = rows_for_sf(sf_dir)
    inp = ensure_transcripts_parquet(n_rows)

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    rd.read_parquet(inp).count()  # warm page cache
    rd.range(64, override_num_blocks=64).map_batches(
        lambda t: t, batch_size=1).count()  # warm worker pool

    sent = [sentinel_sec()]
    out_root = "/tmp/otelray/stress_out"
    shutil.rmtree(out_root, ignore_errors=True)
    os.sync()
    t0 = time.time()
    run_single_pass(inp, out_root, enrich_concurrency=32,
                    counts_mode="partials")
    headline = round(time.time() - t0, 3)

    qtimes = {}
    for name in WIDE_QUERIES:
        t0 = time.time()
        out = QUERIES[name](sf_dir)
        if isinstance(out, (pa.Table, pd.DataFrame)):
            n = len(out)
        else:
            n = out.count()
        assert n >= 0
        qtimes[name] = round(time.time() - t0, 3)
    sent.append(sentinel_sec())

    # spill evidence from the session's raylet accounting (the raylet
    # state-dump reports cumulative spill requests; RAY_ADDRESS=local
    # sessions live under /tmp/ray/ray/)
    spill_requests = None
    try:
        import glob
        import re

        for base in ("/tmp/ray/ray/session_latest",
                     "/tmp/ray/session_latest"):
            logs = glob.glob(base + "/logs/raylet.out")
            if logs:
                txt = open(logs[0], errors="ignore").read()
                hits = re.findall(r"cumulative spill requests: (\d+)", txt)
                if hits:
                    spill_requests = int(hits[-1])
                break
    except Exception:
        pass

    ray.shutdown()
    print(json.dumps({
        "cap_bytes": cap_bytes, "sf": sf_dir, "num_cpus": 32,
        "headline": headline, "queries": qtimes,
        "sentinel": sent,
        "spill_requests": spill_requests,
    }))


if __name__ == "__main__":
    main()
