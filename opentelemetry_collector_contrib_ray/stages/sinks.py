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
