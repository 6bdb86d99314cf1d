"""Manifest-versioned table snapshots — time-travel reads for a
long-lived batch table (the lakehouse snapshot-isolation shape:
immutable data files + tiny versioned manifests listing them; a commit
is one atomic manifest rename, a historical read is "resolve manifest
vN → read exactly its files").

Builds on the same discipline as state/checkpoint.py (atomic
temp+rename, JSON manifests): data files are written once and never
mutated (compact_by_range's per-bucket files fit naturally); appending
a version reuses the parent's file list plus the new files, so manifest
size is O(files), commits are O(1) renames, and concurrent readers of
older versions are never disturbed — at 100 TB the manifests stay KBs
while the data is immutable Parquet.
"""

from __future__ import annotations

import json
import os


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "_snapshots", f"v{version}.json")


def commit_snapshot(root: str, version: int, files: list[str],
                    parent: int | None = None) -> list[str]:
    """Atomically commit manifest ``version`` = parent's files + new
    ``files`` (paths stored relative to ``root``). Returns the full
    file list of the new version."""
    os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
    rel = [os.path.relpath(f, root) for f in files]
    full = (read_snapshot_files(root, parent, relative=True)
            if parent is not None else []) + rel
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "parent": parent, "files": full},
                  f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root, version))
    return [os.path.join(root, p) for p in full]


def read_snapshot_files(root: str, version: int,
                        relative: bool = False) -> list[str]:
    """Resolve a version to its exact file list (time-travel read)."""
    with open(_manifest_path(root, version)) as f:
        m = json.load(f)
    return m["files"] if relative else \
        [os.path.join(root, p) for p in m["files"]]


def latest_version(root: str) -> int:
    d = os.path.join(root, "_snapshots")
    vs = [int(f[1:-5]) for f in os.listdir(d)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs)
