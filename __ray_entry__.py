"""Driver contract for the Ray Data engine (see README.md).

``entry``: flagship parse→enrich→route→count pipeline over transcripts
derived from /root/testdata/sf0.001.
``queries`` / ``oracle_sql``: one entry per implemented operator or
pipeline from SURVEY.md §2 (+ the training-data ops), with DuckDB SQL
twins where SQL-expressible.

Ray is initialised by the driver before import — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001; returns per-sink count-connector
    totals as one pandas DataFrame (sink, metric, attrs, count)."""
    import pandas as pd

    from opentelemetry_collector_contrib_ray.pipelines.flagship import flagship
    from opentelemetry_collector_contrib_ray.sources.readers import transcripts_from_events

    ds = transcripts_from_events("/root/testdata/sf0.001", with_turn_idx=False)
    sinks, counts = flagship(ds, enrich_concurrency=2)
    frames = []
    for name in sorted(counts):
        df = counts[name].to_pandas()
        df.insert(0, "sink", name)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out["count"] = out["count"].fillna(0).astype("int64")
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from opentelemetry_collector_contrib_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentelemetry_collector_contrib_ray.pipelines.queries import ORACLES
    from opentelemetry_collector_contrib_ray.stages.multimodal import (
        ensure_mm_oracle_tables,
    )

    # the multimodal oracle re-decodes payload BYTES in DuckDB; write
    # the deterministic payload parquet now (pure pyarrow, no Ray) so
    # the SQL runs whichever side the driver executes first
    ensure_mm_oracle_tables()
    return dict(ORACLES)
