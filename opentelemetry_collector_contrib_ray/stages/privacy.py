"""k-anonymity auditing over quasi-identifier generalization ladders.

Governance companion to the redaction/PII stages (stages/redact.py,
stages/text.py PII scan): redaction removes DIRECT identifiers; this
measures re-identification risk from QUASI-identifiers — rows whose
quasi-id equivalence class has fewer than ``k`` members are
k-anonymity violations (Sweeney 2002, public).  The operator evaluates
a GENERALIZATION LADDER (most→least specific quasi-id projections,
e.g. (type, day, user-bucket) → (type, day) → (type,)) and reports,
per level, the class count, the smallest class, and the rows at risk —
plus which level is the minimal generalization that achieves
k-anonymity (global-recoding model: one level for the whole table).

Scale shape: ONE pass.  Every ladder level is a projection of the
FINEST level, so only the finest equivalence classes are built
distributedly (compact_groupby: per-block arrow partials, one compact
merge — O(classes × blocks) tiny rows move, never the raw table); all
coarser levels re-aggregate those O(classes) rows in the single final
task.  Driver holds nothing.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .agg import compact_groupby
from .base import pa_from_pandas


def k_anonymity_ladder(ds, ladder: list[list[str]], k: int):
    """Per-level k-anonymity stats over ``ladder`` (level 0 = finest;
    every later level must use a subset of level 0's columns).  Emits
    one row per level: ``level, n_classes, min_class_size,
    rows_at_risk, chosen`` (chosen=1 on the first level whose smallest
    class reaches ``k``; all 0 if none does)."""
    finest = ladder[0]
    for cols in ladder[1:]:
        if not set(cols) <= set(finest):
            raise ValueError(f"ladder level {cols} is not a projection "
                             f"of the finest level {finest}")

    classes = compact_groupby(ds, finest, count_alias="n")

    def stats(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for lvl, cols in enumerate(ladder):
            g = (df.groupby(list(cols))["n"].sum() if cols
                 else pd.Series([df["n"].sum()]))
            at_risk = int(g[g < k].sum()) if len(g) else 0
            rows.append((lvl, len(g), int(g.min()) if len(g) else 0,
                         at_risk))
        st = pd.DataFrame(rows, columns=["level", "n_classes",
                                         "min_class_size", "rows_at_risk"])
        ok = st[st["min_class_size"] >= k]
        chosen = int(ok["level"].min()) if len(ok) else -1
        st["chosen"] = (st["level"] == chosen).astype("int64")
        for c in st.columns:
            st[c] = st[c].astype("int64")
        return pa_from_pandas(st)

    return classes.map_batches(stats, batch_format="pyarrow",
                               batch_size=None)


def l_diversity_audit(ds, quasi_cols: list[str], sensitive_col: str,
                      l: int):
    """Distinct l-diversity audit (Machanavajjhala et al. 2007,
    public): a quasi-id equivalence class leaks its members' sensitive
    attribute when it holds fewer than ``l`` DISTINCT sensitive values
    — k-anonymity alone cannot see this (a class of 50 rows that all
    share one diagnosis is 50-anonymous and fully disclosed).  Emits
    one row per equivalence class: ``quasi…, class_size, n_sensitive,
    at_risk``.

    Scale shape: one compact partial+final exchange over (quasi tuple,
    sensitive value) — per-block arrow group_by dedups duplicates
    before anything moves, so at most ``classes × |sensitive domain| ×
    blocks`` tiny rows shuffle; the final task folds value rows into
    per-class stats."""

    pairs = compact_groupby(ds, [*quasi_cols, sensitive_col],
                            count_alias="n")

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(quasi_cols).agg(
            class_size=("n", "sum"), n_sensitive=("n", "size")
        ).reset_index()
        g["class_size"] = g["class_size"].astype("int64")
        g["n_sensitive"] = g["n_sensitive"].astype("int64")
        g["at_risk"] = (g["n_sensitive"] < l).astype("int64")
        return pa_from_pandas(g)

    return pairs.map_batches(fold, batch_format="pyarrow",
                             batch_size=None)


def k_anonymity_sql(src: str, ladder: list[list[str]], k: int) -> str:
    """SQL twin: finest GROUP BY, per-level re-aggregation CTEs, and
    the minimal-satisfying-level rule."""
    finest = ", ".join(ladder[0])
    parts = [f"WITH f0 AS (SELECT {finest}, COUNT(*) AS n FROM {src} "
             f"GROUP BY {finest})"]
    levels = []
    for lvl, cols in enumerate(ladder):
        tbl = "f0" if lvl == 0 else f"f{lvl}"
        if lvl > 0:
            sel = ", ".join(cols) if cols else ""
            grp = f"GROUP BY {sel}" if cols else ""
            parts.append(f"f{lvl} AS (SELECT {sel + ', ' if sel else ''}"
                         f"CAST(SUM(n) AS BIGINT) AS n FROM f0 {grp})")
        parts.append(
            f"l{lvl} AS (SELECT {lvl} AS level, COUNT(*) AS n_classes, "
            f"MIN(n) AS min_class_size, "
            f"COALESCE(SUM(CASE WHEN n < {k} THEN n END), 0) AS rows_at_risk "
            f"FROM {tbl})")
        levels.append(f"SELECT * FROM l{lvl}")
    parts.append(f"s AS ({' UNION ALL '.join(levels)})")
    return (", ".join(parts)
            + " SELECT CAST(level AS BIGINT) AS level,"
              " CAST(n_classes AS BIGINT) AS n_classes,"
              " CAST(min_class_size AS BIGINT) AS min_class_size,"
              " CAST(rows_at_risk AS BIGINT) AS rows_at_risk,"
              " CAST(CASE WHEN level = (SELECT MIN(level) FROM s"
              f" WHERE min_class_size >= {k}) THEN 1 ELSE 0 END AS BIGINT)"
              " AS chosen FROM s")


def randomized_response_counts(ds, group_col: str, true_col: str,
                               hash_col: str, flip_mod: int = 4):
    """Local-differential-privacy count release via RANDOMIZED RESPONSE
    (Warner 1965; the RAPPOR-family primitive) made deterministic for
    testing: each row's true boolean ``true_col`` is reported FLIPPED
    when a Knuth multiplicative hash of ``hash_col`` lands on 0 mod
    ``flip_mod`` — a stand-in for the client's coin with flip
    probability p = 1/flip_mod that both engines can derive exactly.
    Per group the release is (n, n_reported) plus the debiased integer
    numerator ``est_num = flip_mod·n_reported − n`` of the estimator
    t̂ = est_num / (flip_mod − 2) — the division stays on the driver so
    the oracle never compares floats (flip_mod=4: t̂ = est_num/2).

    Shape: one vectorized hash+xor kernel per block, then the compact
    per-group rollup — O(groups × blocks) partial rows move, never raw
    rows. The aggregator only ever sees the noised bit, mirroring the
    LDP trust model."""
    import numpy as np
    import pyarrow.compute as pc

    from .agg import compact_groupby

    fm = int(flip_mod)

    def respond(t: pa.Table) -> pa.Table:
        h = pc.multiply(pc.cast(t[hash_col], pa.int64()), 2654435761)
        h = pc.subtract(h, pc.multiply(pc.divide(h, 4294967296), 4294967296))
        flip = pc.equal(pc.subtract(h, pc.multiply(pc.divide(h, fm), fm)), 0)
        reported = pc.xor(pc.cast(t[true_col], pa.bool_()), flip)
        return pa.table({
            group_col: t[group_col],
            "reported": pc.cast(reported, pa.int64()),
        })

    out = compact_groupby(ds.map_batches(respond, batch_format="pyarrow"),
                          [group_col], sum_cols={"reported": "n_reported"},
                          count_alias="n")

    def debias(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t[group_col],
            "n": pc.cast(t["n"], pa.int64()),
            "n_reported": pc.cast(t["n_reported"], pa.int64()),
            "est_num": pc.cast(
                pc.subtract(pc.multiply(t["n_reported"], fm), t["n"]),
                pa.int64()),
        })

    return out.map_batches(debias, batch_format="pyarrow")
