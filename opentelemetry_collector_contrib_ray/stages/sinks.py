"""Sinks — exporter analogs (SURVEY.md §2.2).

- ``write_grouped_parquet``: Hive-partitioned parquet by grouping
  columns — the grouping_file_exporter
  (/root/reference/exporter/fileexporter/grouping_file_exporter.go:25-70)
  and awss3exporter time-partitioning (s3_writer.go:26-44) analog.
- ``write_time_partitioned``: adds year/month/day/hour partition
  columns derived from a timestamp column before the partitioned write.
- ``write_json_lines``: fileexporter JSON marshal analog.
- ``stdout_sink`` / ``drop_sink``: stanza stdout/drop outputs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def write_grouped_parquet(ds, path: str, group_cols: list[str], **kw):
    return ds.write_parquet(path, partition_cols=group_cols, **kw)


def write_time_partitioned(ds, path: str, ts_col: str = "ts",
                           granularity: str = "day", **kw):
    parts = ["year", "month"]
    if granularity in ("day", "hour"):
        parts.append("day")
    if granularity == "hour":
        parts.append("hour")

    def add_parts(t: pa.Table) -> pa.Table:
        c = t[ts_col]
        t = t.append_column("year", pc.cast(pc.year(c), pa.int32()))
        t = t.append_column("month", pc.cast(pc.month(c), pa.int32()))
        if "day" in parts:
            t = t.append_column("day", pc.cast(pc.day(c), pa.int32()))
        if "hour" in parts:
            t = t.append_column("hour", pc.cast(pc.hour(c), pa.int32()))
        return t

    return ds.map_batches(add_parts, batch_format="pyarrow").write_parquet(
        path, partition_cols=parts, **kw
    )


def write_json_lines(ds, path: str, **kw):
    return ds.write_json(path, **kw)


def stdout_sink(ds, limit: int = 20):
    """Debug sink (stanza stdout output)."""
    for row in ds.take(limit):
        print(row)


def drop_sink(ds):
    """Null sink: consume the stream, keep nothing (stanza drop output).
    Forces execution via a count (no materialization)."""
    return ds.count()


def failover_write(ds, levels, max_retries: int = 1):
    """Priority-level sink failover — the failoverconnector analog
    (/root/reference/connector/failoverconnector: ``priority_levels``
    1..n, route to the highest healthy level, ``max_retries`` per
    level). Batch semantics replace the streaming health machinery
    (retry_interval / retry_gap wall-clock probes, SURVEY §2.10): each
    level is attempted up to ``max_retries`` times for THIS run; on
    failure the next level gets the data.

    ``levels``: ordered list of sink callables ``fn(ds) -> Any``
    (highest priority first). Returns ``(level_index, result)``.
    Raises the last error if every level fails.
    """
    last_err: Exception | None = None
    for i, sink in enumerate(levels):
        for _ in range(max(1, max_retries)):
            try:
                return i, sink(ds)
            except Exception as e:  # noqa: BLE001 — any sink failure demotes
                last_err = e
    raise RuntimeError(f"all {len(levels)} failover levels failed") from last_err
