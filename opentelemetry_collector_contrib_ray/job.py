"""Cluster job entrypoint — the ``ray job submit`` surface.

The north-star deployment runs the flagship parse → enrich → route →
count pipeline on a fixed-size multi-node cluster::

    ray job submit --working-dir . -- \
        python -m opentelemetry_collector_contrib_ray.job \
        --input /data/transcripts --out /data/out

The driver process this module runs in JOINS an existing cluster
(``address="auto"`` under the Ray job supervisor, or ``$RAY_ADDRESS``
when set — ``local`` in the test sandbox); it never owns a cluster
lifecycle beyond its own connection. Any registry operator is also
cluster-runnable via ``--query <name> --sf-dir <dir>``, writing its
result as parquet under ``--out`` — so the whole oracle-verified
surface, not just the flagship, can ship as a job.

One JSON summary line goes to stdout (and ``--summary-json`` if
given): wall seconds, sink directory, per-sink count-connector totals
(flagship) or result row count (query mode). Sinks and count partials
use the digest-named idempotent write contract, so a re-submitted job
after a mid-run failure resumes without double-writing
(state/checkpoint.py; the kill/resume pytest coverage drives exactly
this path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _connect():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_flagship_job(input_path: str, out_root: str,
                     enrich_concurrency: int = 8,
                     batch_size: int = 65_536,
                     counts_mode: str = "partials") -> dict:
    from .pipelines.single_pass import run_single_pass

    t0 = time.time()
    res = run_single_pass(input_path, out_root,
                          enrich_concurrency=enrich_concurrency,
                          batch_size=batch_size,
                          counts_mode=counts_mode)
    wall = time.time() - t0
    counts = {s: df.to_dict("records") for s, df in res["counts"].items()}
    return {"mode": "flagship", "sinks": res["sinks"],
            "wall_s": round(wall, 3), "counts": counts}


def run_query_job(name: str, sf_dir: str, out_root: str) -> dict:
    import pandas as pd
    import pyarrow as pa

    from .pipelines.queries import QUERIES

    if name not in QUERIES:
        raise SystemExit(f"unknown query {name!r}; see SURVEY.md §2 / "
                         "pipelines/queries.py")
    t0 = time.time()
    res = QUERIES[name](sf_dir)
    out_dir = os.path.join(out_root, name)
    if isinstance(res, pd.DataFrame):
        os.makedirs(out_dir, exist_ok=True)
        pa_tbl = pa.Table.from_pandas(res, preserve_index=False)
        import pyarrow.parquet as pq

        pq.write_table(pa_tbl, os.path.join(out_dir, "part-0.parquet"))
        n = len(res)
    elif isinstance(res, pa.Table):
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(res, os.path.join(out_dir, "part-0.parquet"))
        n = res.num_rows
    else:  # ray Dataset — streaming write, no driver materialization
        res.write_parquet(out_dir)
        import ray.data as rd

        n = rd.read_parquet(out_dir).count()
    return {"mode": "query", "query": name, "out": out_dir,
            "rows": int(n), "wall_s": round(time.time() - t0, 3)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m opentelemetry_collector_contrib_ray.job",
        description="Run the flagship pipeline (default) or any "
                    "registry query on the connected Ray cluster.")
    p.add_argument("--input", help="transcript parquet path (flagship)")
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--query", default="",
                   help="registry query name instead of the flagship")
    p.add_argument("--sf-dir", default="",
                   help="table directory for --query")
    p.add_argument("--enrich-concurrency", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=65_536)
    p.add_argument("--counts-mode", default="partials",
                   choices=["partials", "inline", "scan"])
    p.add_argument("--summary-json", default="",
                   help="also write the summary JSON to this path")
    args = p.parse_args(argv)

    _connect()
    if args.query:
        if not args.sf_dir:
            p.error("--query requires --sf-dir")
        summary = run_query_job(args.query, args.sf_dir, args.out)
    else:
        if not args.input:
            p.error("flagship mode requires --input")
        summary = run_flagship_job(args.input, args.out,
                                   args.enrich_concurrency,
                                   args.batch_size, args.counts_mode)
    line = json.dumps(summary, default=str)
    print(line)
    if args.summary_json:
        with open(args.summary_json, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
