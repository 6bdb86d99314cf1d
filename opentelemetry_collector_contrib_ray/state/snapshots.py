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
                    parent: int | None = None,
                    delete_files: list[str] | None = None,
                    upsert_files: list[str] | None = None) -> list[str]:
    """Atomically commit manifest ``version`` = parent's files + new
    ``files`` (paths stored relative to ``root``). ``delete_files`` are
    tombstone parquet files (key lists) applied at read time —
    merge-on-read deletes: data files stay immutable, a delete is one
    tiny key file + a manifest rename, readers of older versions never
    see it. Returns the full file list of the new version."""
    os.makedirs(os.path.join(root, "_snapshots"), exist_ok=True)
    rel = [os.path.relpath(f, root) for f in files]
    full = (read_snapshot_files(root, parent, relative=True)
            if parent is not None else []) + rel
    dels = ((read_snapshot(root, parent)["deletes"]
             if parent is not None else [])
            + [os.path.relpath(f, root) for f in (delete_files or [])])
    ups = ((read_snapshot(root, parent)["upserts"]
            if parent is not None else [])
           + [os.path.relpath(f, root) for f in (upsert_files or [])])
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "parent": parent, "files": full,
                   "deletes": dels, "upserts": ups},
                  f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root, version))
    return [os.path.join(root, p) for p in full]


def read_snapshot(root: str, version: int) -> dict:
    """Full manifest (relative paths) — files + delete files."""
    with open(_manifest_path(root, version)) as f:
        m = json.load(f)
    m.setdefault("deletes", [])
    m.setdefault("upserts", [])
    return m


def read_snapshot_files(root: str, version: int,
                        relative: bool = False) -> list[str]:
    """Resolve a version to its exact file list (time-travel read)."""
    m = read_snapshot(root, version)
    return m["files"] if relative else \
        [os.path.join(root, p) for p in m["files"]]


def read_snapshot_delete_keys(root: str, version: int, key_col: str):
    """Union of a version's tombstone key lists (arrow array; empty if
    the version carries no deletes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = read_snapshot(root, version)
    if not m["deletes"]:
        return pa.array([], pa.int64())
    tbls = [pq.read_table(os.path.join(root, p), columns=[key_col])
            for p in m["deletes"]]
    return pa.concat_tables(tbls)[key_col].combine_chunks()


def read_snapshot_upserts(root: str, version: int, key_col: str):
    """Resolve a version's upserts with LAST-WRITER-WINS: returns
    (mask_keys, replacement_table) — readers drop base rows whose key is
    in mask_keys, then union the replacement rows. Walks upsert files
    newest→oldest keeping each key's first (newest) row; O(upserted
    keys) state, the merge-on-read upsert shape (a compaction folds
    upserts back into data files when they grow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    m = read_snapshot(root, version)
    if not m["upserts"]:
        return pa.array([], pa.int64()), None
    seen: set = set()
    keep = []
    for p in reversed(m["upserts"]):
        t = pq.read_table(os.path.join(root, p))
        keys = t[key_col].to_pylist()
        mask = [k not in seen for k in keys]
        seen.update(keys)
        keep.append(t.filter(pa.array(mask, pa.bool_())))
    repl = pa.concat_tables(keep)
    return repl[key_col].combine_chunks(), repl


def latest_version(root: str) -> int:
    d = os.path.join(root, "_snapshots")
    vs = [int(f[1:-5]) for f in os.listdir(d)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs)
