"""Distribution-drift monitoring between adjacent time periods.

Training-data and telemetry pipelines watch for feature/metric drift:
did today's value distribution move vs yesterday's?  The standard
monitoring scores (PSI, KL) need logs of ratios — float, order-
sensitive, un-twinnable.  Total variation distance over a FIXED bin
domain is the integer-exact alternative: with per-period bin counts
``a_i`` (previous, total A) and ``b_i`` (current, total B),

    TVD = 1/2 · Σ_i |a_i/A − b_i/B|  =  Σ_i |a_i·B − b_i·A| / (2·A·B)

so the NUMERATOR ``Σ|a_i·B − b_i·A|`` is a pure integer statistic
(drift score = tvd_num / (2·A·B) downstream; alert on a threshold of
the exact ratio).  Holds as long as each period×group count stays
below ~2^31 so the cross products fit int64 — at larger scale shard
periods or lift to 128-bit, as the SQL twin's HUGEINT does natively.

Scale shape: ONE compact partial+final exchange builds the (group,
period, bin) counts (per-block arrow group_by first — only tiny count
rows move); the adjacent-period pairing and the Σ|cross-product| fold
run over those O(groups × periods × bins) rows in the single final
task.  The raw table is read once and never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import compact_groupby
from .base import pa_from_pandas


def histogram_drift(ds, group_col: str, period_col: str, bin_col: str,
                    n_bins: int):
    """Per (group, period) drift vs the group's PREVIOUS period (period
    order = string sort, e.g. ISO dates).  Emits ``group, period,
    prev_period, na, nb, tvd_num`` — one row per period that has a
    predecessor.  ``bin_col`` must already hold integer bins in
    ``[0, n_bins)`` (fixed domain: missing bins count 0 on both
    sides)."""

    counts = compact_groupby(ds, [group_col, period_col, bin_col],
                             count_alias="n")

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_rows = []
        for grp, g in df.groupby(group_col, sort=True):
            periods = sorted(g[period_col].unique())
            dense = {}
            for p in periods:
                v = np.zeros(n_bins, dtype=np.int64)
                rows = g[g[period_col] == p]
                v[rows[bin_col].to_numpy().astype(np.int64)] = \
                    rows["n"].to_numpy().astype(np.int64)
                dense[p] = v
            for prev, cur in zip(periods[:-1], periods[1:]):
                a, b = dense[prev], dense[cur]
                na, nb = int(a.sum()), int(b.sum())
                tvd = int(np.abs(a * nb - b * na).sum())
                out_rows.append((grp, cur, prev, na, nb, tvd))
        out = pd.DataFrame(out_rows, columns=[group_col, period_col,
                                              "prev_period", "na", "nb",
                                              "tvd_num"])
        for c in ("na", "nb", "tvd_num"):
            out[c] = out[c].astype("int64")
        return pa_from_pandas(out)

    return counts.map_batches(fold, batch_format="pyarrow",
                              batch_size=None)


def histogram_drift_sql(src: str, group_col: str, period_col: str,
                        bin_col: str, n_bins: int) -> str:
    """SQL twin: LAG over distinct periods, fixed-domain bin expansion
    via range(), |cross-product| fold."""
    return f"""
WITH b AS (SELECT {group_col}, {period_col}, {bin_col} AS bin,
                  COUNT(*) AS n FROM {src} GROUP BY 1, 2, 3),
t AS (SELECT {group_col}, {period_col}, SUM(n) AS tot
      FROM b GROUP BY 1, 2),
p AS (SELECT {group_col}, {period_col}, tot,
             LAG({period_col}) OVER w AS prev_period,
             LAG(tot) OVER w AS prev_tot
      FROM t WINDOW w AS (PARTITION BY {group_col} ORDER BY {period_col})),
j AS (SELECT p.*, r.range AS bin FROM p, range({n_bins}) r
      WHERE p.prev_period IS NOT NULL),
v AS (SELECT j.{group_col}, j.{period_col}, j.prev_period,
             j.prev_tot AS na, j.tot AS nb,
             COALESCE(bp.n, 0) AS pn, COALESCE(bc.n, 0) AS cn
      FROM j
      LEFT JOIN b bc ON bc.{group_col} = j.{group_col}
                    AND bc.{period_col} = j.{period_col} AND bc.bin = j.bin
      LEFT JOIN b bp ON bp.{group_col} = j.{group_col}
                    AND bp.{period_col} = j.prev_period AND bp.bin = j.bin)
SELECT {group_col}, {period_col}, prev_period,
       CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       CAST(SUM(ABS(pn * nb - cn * na)) AS BIGINT) AS tvd_num
FROM v GROUP BY 1, 2, 3, 4, 5
"""
