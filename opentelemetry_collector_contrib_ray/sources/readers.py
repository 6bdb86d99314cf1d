"""Readers: Parquet sources + the events→transcripts derivation.

``transcripts_from_events`` deterministically reshapes the testdata
``events`` table into the transcript envelope with embedded parseable
text. Its whole derivation is also expressed as ANSI SQL
(``TRANSCRIPTS_FROM_EVENTS_SQL``) so every downstream pipeline stage
gets a DuckDB oracle on the *same* logical input — the engine-vs-oracle
equality is then end-to-end through construction + parse + route +
aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ..stages.base import arrow_out


def _clean_schema(path: str, columns: list[str] | None):
    """Metadata-free (sub)schema of a parquet file/dir — one footer read.

    pandas-written parquet carries ``b'pandas'`` schema metadata, and
    pyarrow's ``Schema.__hash__`` raises on ANY metadata, which defeats
    Ray's per-block schema deduplication in every hash-shuffle stage
    downstream (transform_pyarrow.unify_schemas) and floods the logs
    with ``Failed to hash the schemas`` warnings. Passing an explicit
    metadata-free schema to ``read_parquet`` makes every read block
    hashable while keeping the read a plain op (metadata row counts
    still work for join partition derivation)."""
    import os

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
        if not names:
            return None
        f = os.path.join(path, names[0])
    s = pq.read_schema(f)
    if columns is not None:
        s = pa.schema([s.field(c) for c in columns])
    return s.remove_metadata()


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """Column-pruned Parquet read of one testdata table as a Dataset."""
    import ray.data as rd

    path = f"{sf_dir}/{name}.parquet"
    return rd.read_parquet(path, columns=columns,
                           schema=_clean_schema(path, columns))


def read_transcripts(path: str):
    import ray.data as rd

    return rd.read_parquet(path, schema=_clean_schema(path, None))


def read_lines(paths, encoding: str = "utf-8",
               line_start_pattern: str | None = None,
               line_end_pattern: str | None = None,
               include_file_path: bool = True,
               header_pattern: str | None = None,
               header_ops=None,
               framing: str | None = None):
    """Framed line source — the fileconsumer split/encoding surface
    (pkg/stanza/fileconsumer/file.go:23-36, pkg/stanza/split/split.go,
    file attrs fileconsumer/attrs/attrs.go:14-17).

    - ``encoding``: any Python codec (utf-8, latin-1, utf-16, ...);
      undecodable bytes are replaced, matching the reference's lenient
      decoder behavior.
    - ``line_start_pattern``: multiline framing — an entry runs from one
      match to the next (content before the first match is its own
      entry, the reference's flush-at-EOF for a partial first token).
    - ``line_end_pattern``: an entry ends with (and includes) the line
      containing the match.
    - neither: plain newline split.
    - ``framing``: RFC6587 transport framing for syslog streams
      (parser/syslog/config.go:55-83, parser.go:300):
      ``"octet_counting"`` — each message is prefixed with its byte
      length (``"123 <34>1 ..."``); split on the length prefixes
      (best-effort: a malformed prefix makes the remainder one entry).
      ``"non_transparent"`` — messages terminated by a NUL trailer.
      Mutually exclusive with the line patterns.
    - ``header_pattern`` + ``header_ops``: file-header metadata
      (fileconsumer/internal/header/reader.go:46-71, config.go:28-67).
      Leading entries matching the pattern are consumed (not emitted);
      each runs through the ``header_ops`` sub-chain and every non-
      ``text`` column it produces is upserted into the file's attribute
      set, which is attached as columns to all remaining entries of
      that file. Like the reference, the header ends at the first
      non-matching entry.

    One input file = one read task; files are the natural partitions
    (rotation-bounded in log workloads). Emits ``text`` plus
    ``log.file.path`` / ``log.file.name`` attribute columns.
    """
    import os

    import ray.data as rd

    if line_start_pattern and line_end_pattern:
        raise ValueError("only one of line_start_pattern / line_end_pattern")
    if framing is not None:
        if framing not in ("octet_counting", "non_transparent"):
            raise ValueError(f"unknown framing {framing!r}")
        if line_start_pattern or line_end_pattern:
            raise ValueError("framing is mutually exclusive with line patterns")
    if (header_pattern is None) != (header_ops is None):
        raise ValueError("header_pattern and header_ops must be given together")
    import re as _re

    start_rx = _re.compile(line_start_pattern, _re.MULTILINE) if line_start_pattern else None
    end_rx = _re.compile(line_end_pattern, _re.MULTILINE) if line_end_pattern else None
    header_rx = _re.compile(header_pattern) if header_pattern else None

    def frame(s: str) -> list[str]:
        if start_rx is not None:
            starts = [m.start() for m in start_rx.finditer(s)]
            if not starts:
                return [s.rstrip("\n")] if s else []
            bounds = ([0] if starts[0] != 0 else []) + starts + [len(s)]
            return [s[a:b].rstrip("\n") for a, b in zip(bounds[:-1], bounds[1:])]
        if end_rx is not None:
            out, prev = [], 0
            for m in end_rx.finditer(s):
                # entry includes the full line containing the match
                nl = s.find("\n", m.end())
                cut = len(s) if nl < 0 else nl + 1
                out.append(s[prev:cut].rstrip("\n"))
                prev = cut
            if prev < len(s):
                out.append(s[prev:].rstrip("\n"))  # EOF flush
            return out
        return s.splitlines()

    def frame_bytes(data: bytes) -> list[str]:
        """RFC6587 framing over the raw byte stream (length prefixes
        count BYTES, so framing happens before decode)."""
        if framing == "non_transparent":
            return [
                seg.decode(encoding, errors="replace").rstrip("\n")
                for seg in data.split(b"\x00")
                if seg
            ]
        out, i, n = [], 0, len(data)
        while i < n:
            j = i
            while j < n and 0x30 <= data[j] <= 0x39:
                j += 1
            if j == i or j >= n or data[j] != 0x20:  # malformed prefix
                out.append(data[i:].decode(encoding, errors="replace"))
                break
            ln = int(data[i:j])
            out.append(data[j + 1 : j + 1 + ln].decode(encoding, errors="replace"))
            i = j + 1 + ln
        return out

    plain = (encoding == "utf-8" and framing is None and header_rx is None
             and start_rx is None and end_rx is None)
    if plain:
        # newline-split fast path: one block per file (Ray's
        # TextDatasource reads each file whole), many files → many
        # blocks; the framed/encoded/header paths below additionally
        # need whole-file context for multiline state.
        # drop_empty_lines=False: Ray's default silently skips
        # whitespace-only lines, which the splitlines paths keep —
        # same function must yield the same rows on every path.
        import pyarrow.compute as pc

        ds = rd.read_text(paths, include_paths=True, drop_empty_lines=False)

        def finish(t: pa.Table) -> pa.Table:
            cols = {"text": t["text"]}
            if include_file_path:
                cols["log.file.path"] = t["path"]
                cols["log.file.name"] = pc.replace_substring_regex(
                    t["path"], r"^.*/", ""
                )
            return pa.table(cols)

        return ds.map_batches(finish, batch_format="pyarrow")

    ds = rd.read_binary_files(paths, include_paths=True)

    def file_header_attrs(lines: list[str]) -> tuple[list[str], dict]:
        """Consume leading header lines; return (remaining, attrs)."""
        n = 0
        while n < len(lines) and header_rx.match(lines[n]):
            n += 1
        if n == 0:
            return lines, {}
        from ..stages.base import Chain

        out = Chain(header_ops)(pa.table({"text": pa.array(lines[:n], type=pa.string())}))
        attrs: dict = {}
        for name in out.column_names:
            if name == "text" or name.startswith("__"):
                continue
            # upsert per header entry in order — last non-null wins,
            # matching the reference's per-line attribute copy loop
            for v in out[name].to_pylist():
                if v is not None:
                    attrs[name] = v
        return lines[n:], attrs

    def split_batch(t: pa.Table) -> pa.Table:
        texts, fpaths, file_attrs = [], [], []
        for data, path in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            if framing is not None:
                lines = frame_bytes(data)
            else:
                lines = frame(data.decode(encoding, errors="replace"))
            attrs = {}
            if header_rx is not None:
                lines, attrs = file_header_attrs(lines)
            for line in lines:
                texts.append(line)
                fpaths.append(path)
                file_attrs.append(attrs)
        cols = {"text": pa.array(texts, type=pa.string())}
        if include_file_path:
            cols["log.file.path"] = pa.array(fpaths, type=pa.string())
            cols["log.file.name"] = pa.array(
                [os.path.basename(p) for p in fpaths], type=pa.string()
            )
        if header_rx is not None:
            keys = sorted({k for a in file_attrs for k in a})
            for k in keys:
                cols[k] = pa.array([a.get(k) for a in file_attrs])
        return pa.table(cols)

    return ds.map_batches(split_batch, batch_format="pyarrow")


# SQL prefix: CTEs `_ev` and `transcripts` over the pre-registered
# `events` view. Oracles append `SELECT ... FROM transcripts`.
TRANSCRIPTS_FROM_EVENTS_SQL = """
WITH _ev AS (
  SELECT event_id, user_id, event_type, value, ts,
         CAST(floor(value * 10) AS BIGINT) AS lat,
         (CASE WHEN event_type = 'error' THEN 500 ELSE 200 END + event_id % 7) AS status,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'click' THEN 'DEBUG'
              WHEN event_type = 'view' THEN 'TRACE'
              ELSE 'INFO' END AS level,
         event_id % 10 AS bucket
  FROM events
), transcripts AS (
  SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         CASE WHEN event_type = 'error' THEN 'system'
              WHEN event_type = 'signup' OR event_type = 'click' THEN 'user'
              WHEN event_type = 'view' THEN 'tool'
              ELSE 'assistant' END AS role,
         CASE WHEN bucket < 5 THEN level || ' latency_ms=' || CAST(lat AS VARCHAR)
                   || ' status=' || CAST(status AS VARCHAR) || ' msg=evt_' || event_type
              WHEN bucket < 7 THEN '{"event": "' || event_type || '", "latency_ms": '
                   || CAST(lat AS VARCHAR) || '}'
              WHEN bucket < 9 THEN 'latency_ms=' || CAST(lat AS VARCHAR) || ' status='
                   || CAST(status AS VARCHAR) || ' region=r' || CAST(event_id % 5 AS VARCHAR)
              WHEN event_id % 3 = 0 THEN ''
              WHEN event_id % 3 = 1 THEN '{broken json'
              ELSE 'latency_ms=' END AS text,
         CASE WHEN event_type = 'view' THEN 'browser'
              WHEN event_type = 'purchase' THEN 'db_query'
              ELSE '' END AS tool,
         ts
  FROM _ev
)
"""


def _events_batch_to_transcripts(t: pa.Table) -> pa.Table:
    """Vectorized per-batch derivation (all but turn_idx — that needs a
    per-conversation shuffle, added by ``transcripts_from_events``)."""
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    etype = t["event_type"].to_numpy(zero_copy_only=False).astype("U16")
    val = t["value"].to_numpy(zero_copy_only=False)

    lat = np.floor(val * 10).astype(np.int64)
    status = np.where(etype == "error", 500, 200) + eid % 7
    level = np.select(
        [etype == "error", etype == "click", etype == "view"],
        ["ERROR", "DEBUG", "TRACE"],
        default="INFO",
    )
    bucket = eid % 10

    lat_s = lat.astype("U")
    st_s = status.astype("U")
    logline = np.char.add(
        np.char.add(np.char.add(level, " latency_ms="), lat_s),
        np.char.add(np.char.add(" status=", st_s), np.char.add(" msg=evt_", etype)),
    )
    jsons = np.char.add(
        np.char.add('{"event": "', etype),
        np.char.add(np.char.add('", "latency_ms": ', lat_s), "}"),
    )
    kv = np.char.add(
        np.char.add(np.char.add("latency_ms=", lat_s), np.char.add(" status=", st_s)),
        np.char.add(" region=r", (eid % 5).astype("U")),
    )
    bad = np.select([eid % 3 == 0, eid % 3 == 1], ["", "{broken json"], default="latency_ms=")
    text = np.select([bucket < 5, bucket < 7, bucket < 9], [logline, jsons, kv], default=bad)

    role = np.select(
        [etype == "error", (etype == "signup") | (etype == "click"), etype == "view"],
        ["system", "user", "tool"],
        default="assistant",
    )
    tool = np.select([etype == "view", etype == "purchase"], ["browser", "db_query"], default="")
    conv_id = np.char.add("conv-", np.char.zfill(uid.astype("U"), 8))

    return pa.table(
        {
            "conv_id": pa.array(conv_id.astype(object)),
            "event_id": t["event_id"],
            "role": pa.array(role.astype(object)),
            "text": pa.array(text.astype(object)),
            "tool": pa.array(tool.astype(object)),
            "ts": t["ts"],
        }
    )


def transcripts_from_events(sf_dir: str, with_turn_idx: bool = True):
    """events table → transcript-shaped Dataset.

    turn_idx = rank within conversation by (ts, event_id) — computed with a
    ``groupby(conv_id).map_groups`` hash shuffle (the one wide step this
    source needs). With ``with_turn_idx=False`` the derivation is fully
    narrow/streaming.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value", "ts"])
    ds = ds.map_batches(_events_batch_to_transcripts, batch_format="pyarrow")
    if not with_turn_idx:
        return ds

    # rank within conversation, computed per HASH PARTITION (many whole
    # conversations per call) in one vectorized pass — not per-conv
    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = conv[1:] != conv[:-1]
        idx = np.arange(len(g))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        g["turn_idx"] = (idx - start).astype(np.int32)
        return g[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]

    from ..stages.joins import _add_part

    return (
        ds.map_batches(_add_part(["conv_id"], 64), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(rank_partition), batch_format="pandas")
    )
