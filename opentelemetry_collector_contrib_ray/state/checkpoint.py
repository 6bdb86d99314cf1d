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
