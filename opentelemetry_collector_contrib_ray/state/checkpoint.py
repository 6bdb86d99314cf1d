"""Per-partition checkpoint manifests + lineage — resumable batch runs.

Reference parity: the filelog receiver persists per-file offsets +
fingerprints each poll cycle and skips already-consumed data on restart
(/root/reference/pkg/stanza/fileconsumer/file.go:130-139,46-57;
checkpoint.go:20-94; bbolt storage filestorage/client.go:49-120).

Batch rendering (SURVEY.md §4): the unit of progress is an *input
partition* (a group of immutable Parquet shards). For each partition we
run the pipeline, write every sink to ``<root>/<sink>/<partition>/``
via temp-dir + atomic rename, then commit a manifest JSON recording
inputs, per-sink row counts and timings (the lineage record). A rerun
skips partitions whose manifests are committed — outputs are
byte-identical because partition → output naming is deterministic and
the pipeline itself is deterministic. At cluster scale, partitions are
sized so one partition saturates the cluster; parallelism lives INSIDE
a partition (Ray Data streaming execution), while the partition loop
provides coarse-grained resume.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable
from ..stages.base import pa_from_pandas


class PartitionCheckpointer:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def manifest_path(self, pid: str) -> str:
        return os.path.join(self.manifest_dir, f"{pid}.json")

    def is_done(self, pid: str) -> bool:
        p = self.manifest_path(pid)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                return json.load(f).get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    def sink_dir(self, sink: str, pid: str) -> str:
        return os.path.join(self.root, sink, pid)

    def commit(self, pid: str, record: dict) -> None:
        record = {**record, "partition": pid, "status": "done",
                  "committed_at": time.time()}
        tmp = self.manifest_path(pid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path(pid))  # atomic commit

    def lineage(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out


def checkpointed(name: str, fn: Callable[[], "object"], root: str,
                 resume: bool = True):
    """Result-level checkpoint for ANY query — the generic resume
    wrapper for pipelines whose semantics are GLOBAL (aggregates,
    joins, all-pairs dedup) and therefore cannot be re-sharded by input
    partition without changing the answer (``run_partitioned`` is the
    finer-grained wrapper for per-shard map-style pipelines).

    ``fn() -> Dataset | pyarrow.Table | pandas.DataFrame``. On success
    the result is materialized to ``<root>/result/<name>/`` Parquet via
    temp-dir + atomic rename, and a manifest commits. A rerun with a
    committed manifest SKIPS the computation entirely and streams the
    stored result back (a killed run left no manifest → recomputes).
    Returns a pyarrow Table."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    ck = PartitionCheckpointer(root)
    final = ck.sink_dir("result", name)
    if resume and ck.is_done(name) and os.path.isdir(final):
        return pads.dataset(final).to_table()

    t0 = time.time()
    out = fn()
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    if isinstance(out, pd.DataFrame):
        out = pa_from_pandas(out)
    if isinstance(out, pa.Table):
        pq.write_table(out, os.path.join(tmp, "part-0.parquet"))
    else:  # ray Dataset — streamed write, never materialized on the driver
        out.write_parquet(tmp)
        if not any(n.endswith(".parquet") for n in os.listdir(tmp)):
            # zero-row datasets write no files; pin the schema anyway
            pq.write_table(pa.table({}, schema=out.schema().base_schema),
                           os.path.join(tmp, "part-0.parquet"))
    rows = pads.dataset(tmp).count_rows()
    if os.path.exists(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(tmp, final)
    ck.commit(name, {"rows_out": {"result": rows},
                     "wall_sec": round(time.time() - t0, 3)})
    return pads.dataset(final).to_table()


def run_partitioned(
    partitions: dict[str, list[str]],
    pipeline_fn: Callable[[list[str]], dict[str, "object"]],
    root: str,
    resume: bool = True,
) -> list[dict]:
    """Run ``pipeline_fn(files) -> {sink_name: Dataset}`` per partition
    with checkpoint/skip semantics. Returns the lineage records.

    ``partitions``: partition id → list of input parquet files.
    """
    ck = PartitionCheckpointer(root)
    for pid, files in partitions.items():
        if resume and ck.is_done(pid):
            continue
        t0 = time.time()
        sinks = pipeline_fn(files)
        rows_out = {}
        for sink, ds in sinks.items():
            final = ck.sink_dir(sink, pid)
            tmp = final + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            ds.write_parquet(tmp)
            import pyarrow.parquet as pq
            import pyarrow.dataset as pads

            rows_out[sink] = pads.dataset(tmp).count_rows()
            os.replace(tmp, final)
        import pyarrow.parquet as _pq

        rows_in = 0
        for f in files:
            try:
                rows_in += _pq.ParquetFile(f).metadata.num_rows  # metadata only
            except OSError:
                pass
        ck.commit(
            pid,
            {
                "inputs": files,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": round(time.time() - t0, 3),
            },
        )
    return ck.lineage()
