"""Skew-aware aggregation helpers: salted two-phase groupby.

The brief's skew requirement (SURVEY.md §7.3): Zipf-hot keys (e.g. a
few conversations holding ~10% of rows) make a naive
``groupby(key).sum()`` shuffle dump a hot key's entire traffic on one
reducer. The standard fix is salting: phase 1 groups on
``(key, salt)`` where ``salt = row_hash % S`` (spreading a hot key over
S reducers), phase 2 re-groups the S partial rows per key. For
count/sum-shaped aggregates the partial per-*block* pre-aggregation in
``map_batches`` already bounds shuffle volume to O(keys × blocks);
salting additionally bounds *reducer* load to O(keys × S) rows — use it
when the distinct-key count is small but per-key volume is huge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .base import pa_from_pandas, arrow_out


def compact_groupby(ds, keys: list[str], sum_cols: dict[str, str] | None = None,
                    count_alias: str | None = None):
    """Partial+final sum/count aggregate for SMALL final group
    cardinality (≤ ~100k groups) — the shape every per-category rollup
    in this repo ends with.

    Phase 1: one vectorized ``pyarrow.Table.group_by`` per block emits
    one partial row per (key tuple, block) — so at most
    ``groups × blocks`` tiny rows leave the map stage. Phase 2: the
    partials coalesce into ONE block (``repartition(1)`` — bounded, the
    partials are the only thing moving) and reduce with a single arrow
    group_by. No Ray ``Aggregate`` operator at all, which also means no
    empty per-partition output blocks: Ray's shuffle-based aggregate
    emits zero-column empty bundles for partitions with no groups,
    tripping the streaming executor's schema-divergence warning
    (streaming_executor_state.py:793) whenever partitions > groups.
    For high-cardinality or skewed keys use ``salted_groupby_sum`` /
    a hash-partitioned ``map_groups`` instead.

    ``sum_cols``: {input_col: output_alias}; ``count_alias``: emit a
    row count under this name. Empty input blocks produce
    schema-carrying empty partials (arrow group_by preserves schema).
    """
    sum_cols = sum_cols or {}

    def combine(t: pa.Table, first: bool) -> pa.Table:
        proj = {k: t[k] for k in keys}
        for c in sum_cols:
            proj[c] = pc.cast(t[c], pa.int64()) if pa.types.is_integer(t[c].type) else t[c]
        if count_alias:
            # first pass counts rows; the final pass re-SUMS the partials
            proj["__cnt"] = (pa.array(np.ones(t.num_rows, np.int64))
                             if first else pc.cast(t["__cnt"], pa.int64()))
        aggs = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append(("__cnt", "sum"))
        g = pa.table(proj).group_by(keys).aggregate(aggs)
        # arrow names sum outputs "<col>_sum"; restore input names so
        # the final pass re-applies the same combiner
        return g.rename_columns(keys + list(sum_cols) + (["__cnt"] if count_alias else []))

    def partial(t: pa.Table) -> pa.Table:
        return combine(t, True)

    def final(t: pa.Table) -> pa.Table:
        g = combine(t, False)
        names = keys + [sum_cols[c] for c in sum_cols] + ([count_alias] if count_alias else [])
        return g.rename_columns(names)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def salted_groupby_sum(ds, keys: list[str], value_col: str, salt: int = 16,
                       out_col: str | None = None):
    """Two-phase salted sum: groupby(keys + salt) → groupby(keys).

    Phase 0 additionally pre-aggregates inside each block, so the first
    shuffle moves at most (distinct keys × salt) rows per block.
    """
    out_col = out_col or f"sum_{value_col}"

    def pre(t: pa.Table) -> pa.Table:
        n = t.num_rows
        s = pa.array((np.arange(n) % salt).astype(np.int32))
        proj = pa.table(
            {**{k: t[k] for k in keys}, "__salt": s, value_col: t[value_col]}
        )
        return proj.group_by(keys + ["__salt"]).aggregate([(value_col, "sum")]).rename_columns(
            keys + ["__salt", value_col]
        )

    phase1 = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    phase2 = phase1.groupby(keys + ["__salt"]).sum(value_col)
    final = phase2.groupby(keys).sum(f"sum({value_col})")

    def clean(t: pa.Table) -> pa.Table:
        names = [c if not c.startswith("sum(") else out_col for c in t.column_names]
        t = t.rename_columns(names)
        keep = [c for c in t.column_names if c != "__salt"]
        return t.select(keep)

    return final.map_batches(clean, batch_format="pyarrow")


def salted_count(ds, keys: list[str], salt: int = 16, out_col: str = "n"):
    """Salted two-phase row count per key tuple."""

    def pre(t: pa.Table) -> pa.Table:
        n = t.num_rows
        proj = pa.table(
            {**{k: t[k] for k in keys},
             "__salt": pa.array((np.arange(n) % salt).astype(np.int32))}
        )
        g = proj.group_by(keys + ["__salt"]).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["__salt", out_col])

    phase1 = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    phase2 = phase1.groupby(keys + ["__salt"]).sum(out_col)
    final = phase2.groupby(keys).sum(f"sum({out_col})")

    def clean(t: pa.Table) -> pa.Table:
        names = [c if not c.startswith("sum(") else out_col for c in t.column_names]
        t = t.rename_columns(names)
        return t.select([c for c in t.column_names if c != "__salt"])

    return final.map_batches(clean, batch_format="pyarrow")


class HLLPartial:
    """HyperLogLog partial sketch per batch (Flajolet et al. 2007,
    public algorithm): hash the column, bucket by the top ``p`` bits,
    register = max leading-zero rank of the rest. Each batch emits ONE
    row carrying its 2^p int8 registers — the classic partial+final
    sketch shape: partials are ~4 KB regardless of batch size, so the
    merge input is #blocks rows, never the data."""

    def __init__(self, col: str, p: int = 12):
        self.col = col
        self.p = p
        self.m = 1 << p

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as _pd

        h = _pd.util.hash_array(
            t[self.col].to_numpy(zero_copy_only=False).astype("U")
            if t[self.col].type == pa.string()
            else t[self.col].to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1 (rest has low bits set so
        # rank is bounded by 64 - p + 1)
        lz = np.zeros(len(h), dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        rank = lz + 1
        regs = np.zeros(self.m, dtype=np.int64)
        np.maximum.at(regs, idx, rank)
        return pa.table({"__hll": pa.array([regs.astype(np.int8).tobytes()],
                                           type=pa.binary())})


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT DISTINCT via HyperLogLog: one streaming pass,
    per-block 2^p-byte partials, register-max merge on the driver
    (bounded by #blocks rows). Deterministic for a given input set
    (order/partitioning invariant: merge is an elementwise max).
    Standard error ≈ 1.04/√2^p (~1.6% at p=12)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int8)
    partial = ds.map_batches(HLLPartial(col, p), batch_format="pyarrow")
    for b in partial.iter_batches(batch_format="pyarrow"):
        for buf in b["__hll"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, dtype=np.int8))
    r = regs.astype(np.float64)
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(np.exp2(-r))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:  # small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def int_quantiles(ds, col: str, qs: dict[str, float],
                  num_partitions: int = 64) -> pa.Table:
    """EXACT distributed quantiles over an integer column, without a
    global sort: per-batch ``np.bincount``-style value-counts combiner
    → value-hash partition merge → the merged ``(value, count)``
    histogram (≤ |distinct values| rows — bounded for bounded-domain
    stats like token/char counts no matter the corpus size) collects
    to the driver, where one cumsum + searchsorted answers every
    quantile. Selection rule matches DuckDB ``quantile_disc``:
    ``idx = max(ceil(q*n) - 1, 0)`` over the ascending ordered column
    (verified empirically across n and q). Returns a ONE-ROW table
    ``{name: value}``; use q=0.0 / 1.0 entries for min / max.

    For unbounded/continuous domains, pre-bucket the column (the
    result is then quantiles of the bucketed values); the exchange
    stays tiny either way — only (value, partial-count) int rows ever
    cross the wire."""
    import math

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        h = pd.util.hash_array(vals)
        return pa.table({
            "v": pa.array(vals),
            "n": pa.array(cnts.astype(np.int64)),
            "__p": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False)["n"].sum()[["v", "n"]]

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(merge), batch_format="pandas")
    ).to_pandas()
    hist = hist.sort_values("v")
    vals = hist["v"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for name, q in qs.items():
        if n == 0:
            out[name] = pa.array([None], type=pa.int64())
            continue
        idx = max(math.ceil(np.float64(q) * n) - 1, 0)
        pos = int(np.searchsorted(cum, idx + 1))
        out[name] = pa.array([int(vals[min(pos, len(vals) - 1)])],
                             type=pa.int64())
    return pa.table(out)


def grouped_outliers(ds, key: str, val: str, z: float = 2.0):
    """Per-group z-score outlier profiling: for every ``key`` group,
    count values with ``|v − mean| > z·stddev_pop`` — the data-quality
    screen that precedes metric alerting and training-data value
    clipping.

    Two streaming passes, no value shuffle:

    1. moment partials — one ``(key, n, Σv, Σv²)`` pandas-combined row
       per key per block; the merged moment table is ONE row per
       distinct key (assumed driver-bounded: group keys here are
       categorical dimensions, not ids) and broadcasts in the task
       closure.
    2. threshold count — vectorized per-block compare + groupby-sum
       partials, final tiny rollup.

    Output: ``(key, n, n_outliers)`` over non-null values (SQL
    avg/stddev semantics).
    """
    import pandas as pd

    def moments(t: pa.Table) -> pa.Table:
        v = t[val].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t[key].to_numpy(zero_copy_only=False)
        m = ~np.isnan(v)
        df = pd.DataFrame({"k": k[m], "v": v[m]})
        df["v2"] = df["v"] * df["v"]
        g = df.groupby("k", as_index=False, dropna=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("v2", "sum"))
        return pa_from_pandas(g)

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    stats = parts.groupby("k", as_index=False, dropna=False).agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))
    mean = stats["s"] / stats["n"]
    var = stats["ss"] / stats["n"] - mean * mean
    sd = np.sqrt(np.maximum(var.to_numpy(), 0.0))
    lo = dict(zip(stats["k"], mean.to_numpy() - z * sd))
    hi = dict(zip(stats["k"], mean.to_numpy() + z * sd))

    def count_outliers(t: pa.Table) -> pa.Table:
        v = t[val].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t[key].to_numpy(zero_copy_only=False)
        m = ~np.isnan(v)
        kk, vv = k[m], v[m]
        s = pd.Series(kk)
        out = (vv < s.map(lo).to_numpy()) | (vv > s.map(hi).to_numpy())
        df = pd.DataFrame({"k": kk, "o": out.astype(np.int64)})
        g = df.groupby("k", as_index=False, dropna=False).agg(
            n=("o", "size"), n_outliers=("o", "sum"))
        return pa_from_pandas(g)

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False, dropna=False).agg(
            n=("n", "sum"), n_outliers=("n_outliers", "sum"))
        return out.rename(columns={"k": key}).astype(
            {"n": "int64", "n_outliers": "int64"})

    return (
        ds.map_batches(count_outliers, batch_format="pyarrow")
        .groupby("k")
        .map_groups(arrow_out(rollup), batch_format="pandas")
    )


def grouped_int_quantiles(ds, group_col: str, col: str, qs: dict[str, float],
                          num_partitions: int = 64):
    """EXACT per-group quantiles over an integer column, no sort and no
    driver collection: per-batch (group, value) count combiner →
    GROUP-hash exchange (every group's full histogram lands in one
    partition) → per-partition vectorized cumsum + the quantile_disc
    selection rule (``idx = max(ceil(q·n) − 1, 0)``, same rule
    int_quantiles pins empirically against DuckDB).

    Unlike the global op, the histogram never touches the driver —
    per-worker state is one group's distinct values, so group count
    scales freely. Output: one row per group with a column per
    quantile name.
    """
    import math

    import pandas as pd

    names = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = df.groupby(["g", "v"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_array(out["g"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def quantiles_per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["g", "v"], as_index=False, dropna=False)["n"].sum()
        g = g.sort_values(["g", "v"], kind="mergesort")
        rows = []
        for key, grp in g.groupby("g", sort=False, dropna=False):
            vals = grp["v"].to_numpy()
            cum = grp["n"].to_numpy().cumsum()
            n = int(cum[-1])
            row = {group_col: key}
            for name in names:
                idx = max(math.ceil(np.float64(qs[name]) * n) - 1, 0)
                pos = int(np.searchsorted(cum, idx + 1))
                row[name] = int(vals[min(pos, len(vals) - 1)])
            rows.append(row)
        return pd.DataFrame(rows, columns=[group_col] + names)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(arrow_out(quantiles_per_group), batch_format="pandas")
    )


def bounded_histogram(ds, key_col: str, value_col: str,
                      bounds: list[float]):
    """Explicit-bucket histogram with OTel data-point semantics
    (opentelemetry metrics: bucket i counts values ≤ bounds[i],
    upper-inclusive; the last bucket is the > bounds[-1] overflow) —
    the aggregation a metrics connector emits per key.

    Shape: the bucket index is one ``np.searchsorted`` per batch; the
    partial is a pandas groupby over (key, bucket) emitting count +
    integer-cents sum rows (≤ keys×(len(bounds)+1) rows per block), and
    the final merge is a tiny Ray groupby-sum. Values never shuffle.
    Null values are ignored (SQL aggregate semantics); null keys form
    their own group."""
    import pandas as pd
    from ray.data.aggregate import Sum

    b = np.asarray(sorted(bounds), dtype=np.float64)

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        valid = pc.is_valid(v)
        t = t.filter(valid)
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], t.schema.field(key_col).type),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_cents": pa.array([], pa.int64())})
        vv = pc.cast(t[value_col], pa.float64()).to_numpy()
        idx = np.searchsorted(b, vv, side="left")
        cents = np.floor(vv * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({key_col: t[key_col].to_numpy(zero_copy_only=False),
                           "bucket": idx.astype(np.int64), "c": cents})
        g = (df.groupby([key_col, "bucket"], as_index=False, dropna=False)
             .agg(n=("c", "size"), sum_cents=("c", "sum")))
        return pa_from_pandas(g)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "bucket"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


def bounded_histogram_sql(key_sql: str, value_sql: str, bounds: list[float],
                          src: str = "events") -> str:
    """SQL twin: bucket = count of bounds strictly below the value
    (same upper-inclusive rule as np.searchsorted side='left')."""
    b = sorted(bounds)
    idx = " + ".join(f"(CASE WHEN {value_sql} > {x} THEN 1 ELSE 0 END)" for x in b)
    return f"""
SELECT {key_sql}, CAST(({idx}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor({value_sql} * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM {src} WHERE {value_sql} IS NOT NULL
GROUP BY {key_sql}, bucket
"""


def rollup_counts(ds, keys: list[str], total_marker: str = "*"):
    """Hierarchical rollup — counts at every prefix level of ``keys``
    plus the grand total (SQL ``GROUP BY ROLLUP``), the multi-level
    metrics rollup a chain of count connectors would otherwise compute
    with one pass per level. Here every level's partial comes out of
    the SAME single pass (len(keys)+1 tiny pandas groupbys per block),
    and one groupby-sum merges them; rolled-up key positions carry
    ``total_marker`` so the group key stays a plain string (no
    null-group edge cases in the exchange)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        outs = []
        for lvl in range(len(keys), -1, -1):
            if lvl:
                g = (df.groupby(keys[:lvl], dropna=False).size()
                     .reset_index(name="n"))
            else:
                g = pd.DataFrame({"n": [len(df)]})
            for k in keys[lvl:]:
                g[k] = total_marker
            outs.append(g[keys + ["n"]])
        out = pd.concat(outs, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return pa_from_pandas(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("n", alias_name="n"))
    )


def rollup_counts_sql(keys: list[str], src: str,
                      total_marker: str = "*") -> str:
    """SQL twin: GROUP BY ROLLUP with GROUPING() mapped to the marker."""
    sel = ", ".join(
        f"CASE WHEN GROUPING({k}) = 1 THEN '{total_marker}' ELSE {k} END AS {k}"
        for k in keys
    )
    return (f"SELECT {sel}, CAST(count(*) AS BIGINT) AS n FROM {src} "
            f"GROUP BY ROLLUP ({', '.join(keys)})")


def cube_agg(ds, keys: list[str], sum_col: str | None = None,
             sum_alias: str = "total", count_alias: str = "n",
             total_marker: str = "*"):
    """Full CUBE in ONE pass — counts (and an optional integer sum) at
    ALL 2^len(keys) grouping sets (SQL ``GROUP BY CUBE``), the superset
    of rollup_counts' prefix hierarchy.  A naive rendering re-reads the
    input once per grouping set; here each block aggregates at the
    FINEST grain first (one arrow group_by), and only those compact
    partial rows fan out ×2^k with rolled-up positions replaced by
    ``total_marker`` — so the exchange moves O(2^k · finest-groups ×
    blocks) tiny rows, never the raw table, and the final merge is the
    compact_groupby shape (repartition(1) + one arrow group_by; same
    bounded-cardinality discipline and the same schema-carrying
    empty-partial behavior)."""
    nsets = 1 << len(keys)

    def partial(t: pa.Table) -> pa.Table:
        proj = {k: pc.cast(t[k], pa.string()) for k in keys}
        proj["__cnt"] = pa.array(np.ones(t.num_rows, np.int64))
        if sum_col is not None:
            proj["__sum"] = pc.cast(t[sum_col], pa.int64())
        aggs = [("__cnt", "sum")] + ([("__sum", "sum")] if sum_col else [])
        g = pa.table(proj).group_by(keys).aggregate(aggs)
        g = g.rename_columns(keys + ["__cnt"] + (["__sum"] if sum_col else []))
        marker = pa.array([total_marker] * g.num_rows, pa.string())
        parts = []
        for mask in range(nsets):
            cols = {k: (g[k] if (mask >> i) & 1 else marker)
                    for i, k in enumerate(keys)}
            cols["__cnt"] = g["__cnt"]
            if sum_col is not None:
                cols["__sum"] = g["__sum"]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    def final(t: pa.Table) -> pa.Table:
        aggs = [("__cnt", "sum")] + ([("__sum", "sum")] if sum_col else [])
        g = t.group_by(keys).aggregate(aggs)
        return g.rename_columns(
            keys + [count_alias] + ([sum_alias] if sum_col else []))

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .repartition(1)
              .map_batches(final, batch_format="pyarrow", batch_size=None))


def cube_agg_sql(keys: list[str], src: str, sum_sql: str | None = None,
                 sum_alias: str = "total", count_alias: str = "n",
                 total_marker: str = "*") -> str:
    """SQL twin: GROUP BY CUBE with GROUPING() mapped to the marker."""
    sel = ", ".join(
        f"CASE WHEN GROUPING({k}) = 1 THEN '{total_marker}' "
        f"ELSE CAST({k} AS VARCHAR) END AS {k}" for k in keys)
    sums = f", CAST(SUM({sum_sql}) AS BIGINT) AS {sum_alias}" if sum_sql else ""
    return (f"SELECT {sel}, CAST(count(*) AS BIGINT) AS {count_alias}{sums} "
            f"FROM {src} GROUP BY CUBE ({', '.join(keys)})")


def profile_columns(ds, int_cols: list[str], str_cols: list[str]):
    """One-pass column profiler (the ANALYZE staple): per column, row
    count, null count, and min/max — integer columns compare as int64,
    string columns lexicographically (typed min/max columns survive the
    merge; rendering to strings happens only at the end, so '9' vs '10'
    ordering bugs can't occur). Each block reduces to one row per
    column; the merge is a tiny groupby."""
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        cols, ns, nulls, mni, mxi, mns, mxs = [], [], [], [], [], [], []
        for c in int_cols:
            col = pc.cast(t[c], pa.int64())
            valid = pc.drop_null(col)
            cols.append(c); ns.append(t.num_rows); nulls.append(col.null_count)
            mni.append(pc.min(valid).as_py() if len(valid) else None)
            mxi.append(pc.max(valid).as_py() if len(valid) else None)
            mns.append(None); mxs.append(None)
        for c in str_cols:
            col = pc.cast(t[c], pa.string())
            valid = pc.drop_null(col)
            cols.append(c); ns.append(t.num_rows); nulls.append(col.null_count)
            mni.append(None); mxi.append(None)
            mns.append(pc.min(valid).as_py() if len(valid) else None)
            mxs.append(pc.max(valid).as_py() if len(valid) else None)
        return pa.table({
            "column": pa.array(cols, pa.string()),
            "n_rows": pa.array(ns, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "min_i": pa.array(mni, pa.int64()),
            "max_i": pa.array(mxi, pa.int64()),
            "min_s": pa.array(mns, pa.string()),
            "max_s": pa.array(mxs, pa.string()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_nulls", alias_name="n_nulls"),
                   Min("min_i", alias_name="min_i"),
                   Max("max_i", alias_name="max_i"),
                   Min("min_s", alias_name="min_s"),
                   Max("max_s", alias_name="max_s"))
    )
    int_set = set(int_cols)

    def render(df: pd.DataFrame) -> pd.DataFrame:
        is_int = df["column"].isin(int_set)
        df["min_v"] = np.where(is_int,
                               df["min_i"].map(lambda x: "" if pd.isna(x) else str(int(x))),
                               df["min_s"].fillna(""))
        df["max_v"] = np.where(is_int,
                               df["max_i"].map(lambda x: "" if pd.isna(x) else str(int(x))),
                               df["max_s"].fillna(""))
        out = df[["column", "n_rows", "n_nulls", "min_v", "max_v"]]
        return out.astype({"n_rows": "int64", "n_nulls": "int64"})

    return merged.map_batches(arrow_out(render), batch_format="pandas")


def heavy_hitters(ds, col: str, k: int = 256):
    """Misra–Gries heavy hitters: bounded-state streaming top-k counts.

    The mergeable-summary shape (Agarwal et al., "Mergeable summaries",
    PODS'12): each batch reduces to an EXACT value_counts, compressed to
    at most ``k`` counters with the MG decrement (subtract the (k+1)-th
    largest count from all, drop ≤0); partials merge by summed counts
    and compress again. State is O(k) per task and O(k × blocks) on the
    exchange regardless of corpus size — the 100 TB path for "which
    users/domains dominate" without a full-cardinality groupby.

    Guarantees: every true count c is estimated in
    [c − n/(k+1), c] (n = total rows); when ``k`` ≥ the number of
    distinct values no decrement ever fires and the counts are EXACT —
    the configuration the SQL oracle pins (the approximate regime is
    covered by the error-bound pytest).

    Returns one block of (value, est_count) sorted by est_count desc,
    value asc.
    """
    import pandas as pd

    def _compress(vals: np.ndarray, cnts: np.ndarray, k: int):
        if len(vals) <= k:
            return vals, cnts
        order = np.argsort(-cnts, kind="stable")
        vals, cnts = vals[order], cnts[order]
        dec = cnts[k]  # the (k+1)-th largest
        cnts = cnts - dec
        keep = cnts > 0
        return vals[keep][:k], cnts[keep][:k]

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[col].to_numpy(zero_copy_only=False))
        vc = s.value_counts(dropna=True)
        vals, cnts = _compress(vc.index.to_numpy(),
                               vc.to_numpy().astype(np.int64), k)
        return pa_from_pandas(pd.DataFrame({"value": vals,
                                            "est_count": cnts}))

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("value", as_index=False)["est_count"].sum()
        vals, cnts = _compress(g["value"].to_numpy(),
                               g["est_count"].to_numpy().astype(np.int64), k)
        out = (pd.DataFrame({"value": vals, "est_count": cnts})
               .sort_values(["est_count", "value"],
                            ascending=[False, True], kind="mergesort"))
        return pa_from_pandas(out.reset_index(drop=True))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


class _KLLSketch:
    """Deterministic MRL/KLL-style mergeable quantile summary over
    int64 values: a stack of levels where an item at level h stands for
    ``2^h`` original values. A level over its capacity ``k`` sorts and
    keeps alternating elements (parity flips per compaction — the
    deterministic compactor of Manku–Rajagopalan–Lindsay; KLL replaces
    the parity with a coin, same structure), pushing survivors one
    level up. The sketch carries its own CERTIFIED rank-error budget:
    each compaction at level h perturbs any rank by at most ``2^h``, so
    ``budget = Σ 2^h`` over all compactions bounds the final rank error
    — tests assert against the sketch's own certificate, and when no
    compaction ever fires (k ≥ n) the budget is 0 and every quantile is
    exact (the oracle configuration)."""

    def __init__(self, k: int):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self.parity: list[int] = [0]
        self.budget = 0

    def _compact(self, h: int):
        arr = np.sort(self.levels[h], kind="mergesort")
        p = self.parity[h] & 1
        self.parity[h] += 1
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.int64))
            self.parity.append(0)
        self.levels[h] = np.empty(0, np.int64)
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], arr[p::2]])
        self.budget += 1 << h

    def _settle(self):
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self.k:
                self._compact(h)
            else:
                h += 1

    def insert(self, vals: np.ndarray):
        self.levels[0] = np.concatenate([self.levels[0],
                                         vals.astype(np.int64)])
        self._settle()

    def merge(self, other: "_KLLSketch"):
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.int64))
            self.parity.append(0)
        for h, arr in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], arr])
            self.parity[h] += other.parity[h]
        self.budget += other.budget
        self._settle()

    def to_rows(self) -> pa.Table:
        lvls = [np.full(len(a), h, np.int64)
                for h, a in enumerate(self.levels)]
        lvls.append(np.array([-1], np.int64))          # budget sentinel row
        vals = list(self.levels) + [np.array([self.budget], np.int64)]
        return pa.table({"level": pa.array(np.concatenate(lvls)),
                         "value": pa.array(np.concatenate(vals))})

    @classmethod
    def from_rows(cls, level: np.ndarray, value: np.ndarray,
                  k: int) -> "_KLLSketch":
        s = cls(k)
        s.budget = int(value[level == -1].sum())
        hmax = int(level.max(initial=0))
        s.levels = [value[level == h].astype(np.int64)
                    for h in range(hmax + 1)]
        s.parity = [0] * len(s.levels)
        s._settle()
        return s

    def quantiles(self, phis: list[float]) -> list[int]:
        """Weighted quantile_disc rule: with all weights 1 (budget 0)
        this IS DuckDB's ``idx = max(ceil(q·n) − 1, 0)`` selection."""
        import math

        vals = np.concatenate(self.levels)
        wts = np.concatenate([np.full(len(a), 1 << h, np.int64)
                              for h, a in enumerate(self.levels)])
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = int(cum[-1]) if len(cum) else 0
        out = []
        for q in phis:
            if total == 0:
                out.append(0)
                continue
            idx = max(math.ceil(q * total) - 1, 0)
            out.append(int(vals[np.searchsorted(cum, idx, side="right")]))
        return out


def kll_quantiles(ds, col: str, qs: dict[str, float], k: int = 4096):
    """Mergeable ε-approximate quantiles over an UNBOUNDED int64 domain
    — the bounded-state sibling of ``int_quantiles`` (whose exchange is
    O(distinct values); this one is O(k·log(n/k)) per block no matter
    the value domain — the 100 TB path for continuous measures).

    Per-block KLL partials serialize as (level, value) rows; one
    O(k log n × blocks) collect merges them driver-free in a single
    final task. Returns ONE row: a column per quantile name plus
    ``err_budget``, the sketch's certified max rank error (0 ⇒ exact —
    the configuration the SQL ``quantile_disc`` oracle pins; the
    approximate regime is covered by the certificate-bound pytest)."""

    def partial(t: pa.Table) -> pa.Table:
        s = _KLLSketch(k)
        v = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
        s.insert(v.astype(np.int64))
        return s.to_rows()

    def final(t: pa.Table) -> pa.Table:
        lv = t["level"].to_numpy(zero_copy_only=False)
        vv = t["value"].to_numpy(zero_copy_only=False)
        s = _KLLSketch.from_rows(lv, vv, k)
        vals = s.quantiles(list(qs.values()))
        cols = {name: pa.array([v], pa.int64())
                for name, v in zip(qs.keys(), vals)}
        cols["err_budget"] = pa.array([s.budget], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ------------------------------------------------------ count-min sketch

#: per-depth polynomial bases (odd => well-mixed under mod-2^64 powers);
#: the hash is SQL-reproducible: byte-polynomial mod 2^64 == DuckDB
#: HUGEINT arithmetic (the homomorphic trick shared with minhash/dsir)
CMS_BASES = (0x100000001B3, 0x9E3779B97F4A7C15,
             0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def cms_hashes(strs: list[str], depth: int,
               max_key_len: int = 32) -> np.ndarray:
    """(n, depth) uint64 byte-polynomial hashes, one base per depth."""
    n = len(strs)
    if n == 0:
        return np.zeros((0, depth), np.uint64)
    bs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    if lens.max(initial=0) > max_key_len:
        raise ValueError(f"cms key over max_key_len={max_key_len}")
    L = max(1, int(lens.max(initial=1)))
    flat = np.frombuffer(b"".join(bs), np.uint8).astype(np.uint64)
    off = np.zeros(n, np.int64)
    off[1:] = np.cumsum(lens[:-1])
    codes = np.zeros((n, L), np.uint64)
    col = np.arange(L)
    mask = col < lens[:, None]
    codes[mask] = flat[(off[:, None] + col)[mask]]
    out = np.empty((n, depth), np.uint64)
    for j in range(depth):
        pw = np.full(L, np.uint64(CMS_BASES[j]))
        pw[0] = 1
        out[:, j] = (codes * np.cumprod(pw)).sum(axis=1)
    return out


def cms_frequency(ds, key_col: str, depth: int = 3, width: int = 8,
                  query_keys: list[str] | None = None):
    """Count-Min sketch (Cormode & Muthukrishnan '05) frequency
    estimates: mergeable depth×width int64 cell matrix, O(d·w) state
    per block partial and on the merge — frequency estimation whose
    memory is INDEPENDENT of key cardinality (the 100 TB companion to
    ``misra_gries_topk``: MG surfaces candidate heavy keys, CMS prices
    any key post-hoc without a second full aggregation).

    Per block: value-counts (vectorized) → hash only the block's
    DISTINCT keys → scatter-add counts into d×w cells → emit
    (depth, bucket, cnt) rows; a compact_groupby merges the partials
    (sketch merge = cell-wise sum — exact mergeability is what the
    parallelism-invariance test pins). Estimates — min over depths of
    the key's cell — are then priced for ``query_keys`` (default: the
    observed distinct keys, exact-counted in the same pass structure)
    and returned with ``exact_cnt`` so the overestimate is visible.
    The whole construction is deterministic, so the SQL twin reproduces
    the ESTIMATES exactly, collisions included."""

    def partials(t: pa.Table) -> pa.Table:
        vc = pc.drop_null(t[key_col]).value_counts()
        keys = vc.field(0).to_pylist()
        cnts = vc.field(1).to_numpy(zero_copy_only=False).astype(np.int64)
        h = cms_hashes(keys, depth) % np.uint64(width)
        mat = np.zeros((depth, width), np.int64)
        for j in range(depth):
            np.add.at(mat[j], h[:, j].astype(np.int64), cnts)
        d, b = np.divmod(np.arange(depth * width), width)
        return pa.table({"depth": pa.array(d), "bucket": pa.array(b),
                         "cnt": pa.array(mat.ravel())})

    from .tailsampling import ray_get_tables

    cells_t = pa.concat_tables(ray_get_tables(compact_groupby(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["depth", "bucket"], sum_cols={"cnt": "cnt"})))
    cells = np.zeros((depth, width), np.int64)
    cells[cells_t["depth"].to_numpy(), cells_t["bucket"].to_numpy()] = \
        cells_t["cnt"].to_numpy()

    if query_keys is None:
        kt = pa.concat_tables(ray_get_tables(compact_groupby(
            ds, [key_col], count_alias="exact_cnt")))
        query_keys = kt[key_col].to_pylist()
        exact = dict(zip(query_keys, kt["exact_cnt"].to_pylist()))
    else:
        exact = None
    qh = (cms_hashes(query_keys, depth) % np.uint64(width)).astype(np.int64)
    est = cells[np.arange(depth)[None, :], qh].min(axis=1)
    out = {key_col: pa.array(query_keys, pa.string()),
           "cms_est": pa.array(est, pa.int64())}
    if exact is not None:
        out["exact_cnt"] = pa.array([exact[k] for k in query_keys],
                                    pa.int64())
    return pa.table(out)




# --------------------------------------------------- per-group top-N


def topn_per_group(ds, group_cols: list[str], order_col: str, n: int,
                   tie_cols: list[str] | None = None,
                   descending: bool = True, num_partitions: int = 64,
                   compact: bool = False):
    """Distributed top-N rows per group by ``order_col`` (ties broken by
    ``tie_cols`` ascending — pass enough columns to make the order
    total, or the result is nondeterministic under re-partitioning).

    Scale shape: a block-local top-N COMBINER first (one stable
    multi-key sort + head(n) per block — at most n × groups-in-block
    rows leave the map stage), then ONE hash exchange on the group key
    and the same vectorized pass per partition, which also assigns the
    1-based ``rank``. Group count is unbounded (nothing ever
    repartitions to 1); per-group state never exceeds n rows.

    ``compact=True`` replaces the group-key hash exchange with a
    repartition(1) final — right when group count is SMALL (the
    partials are at most n × groups × blocks tiny rows), wrong for
    unbounded groups; same trade as ``compact_groupby`` vs the
    hash-partitioned path, avoiding a sort-exchange's fixed latency."""
    tie_cols = tie_cols or []
    by = group_cols + [order_col] + tie_cols
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tie_cols)

    def _local(df: "pd.DataFrame", with_rank: bool) -> "pd.DataFrame":
        out = (df.sort_values(by, ascending=asc, kind="mergesort")
                 .groupby(group_cols, sort=False))
        head = out.head(n)
        if with_rank:
            head = head.assign(rank=(head.groupby(group_cols, sort=False)
                                     .cumcount() + 1).astype(np.int64))
        return head

    import pandas as pd  # noqa: F811 (local alias for the closure)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        head = _local(df, with_rank=False)
        if compact:
            return pa_from_pandas(head)
        h = pd.util.hash_pandas_object(head[group_cols], index=False).to_numpy()
        return pa_from_pandas(head).append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def final(g: "pd.DataFrame") -> pa.Table:
        return pa_from_pandas(
            _local(g.drop(columns="__p"), with_rank=True))

    if compact:
        def final_compact(t: pa.Table) -> pa.Table:
            return pa_from_pandas(_local(t.to_pandas(), with_rank=True))

        return (ds.map_batches(partial, batch_format="pyarrow")
                  .repartition(1)
                  .map_batches(final_compact, batch_format="pyarrow",
                               batch_size=None))

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(final), batch_format="pandas"))


# --------------------------------------------- grouped cross-moments


def grouped_corr_components(ds, group_cols: list[str], x_col: str,
                            y_col: str):
    """Per-group Pearson-correlation components as EXACT integers:
    (n, sum_x, sum_y, sum_xx, sum_yy, sum_xy) — the mergeable monoid
    behind corr/cov/OLS-slope, kept integer (quantize inputs upstream)
    so the result is hash-comparable and deterministic under any
    parallelism; r = (n·Σxy − Σx·Σy) / √((n·Σxx − Σx²)(n·Σyy − Σy²))
    is one driver-side float away. One arrow group_by per block (the
    combiner) + one compact merge — the same two-pass shape as every
    rollup here. Caller owns the overflow budget: |x|,|y| ≤ 2^21 keeps
    Σxy under int64 for 2^21 rows per group; quantize coarser or
    pre-scale when the corpus is bigger."""

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.int64())
        y = pc.cast(t[y_col], pa.int64())
        proj = {k: t[k] for k in group_cols}
        proj["sum_x"] = x
        proj["sum_y"] = y
        proj["sum_xx"] = pc.multiply_checked(x, x)
        proj["sum_yy"] = pc.multiply_checked(y, y)
        proj["sum_xy"] = pc.multiply_checked(x, y)
        return pa.table(proj)

    return compact_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), group_cols,
        sum_cols={c: c for c in
                  ("sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")},
        count_alias="n")


def hash_groupby_sum(ds, keys: list[str], value_col: str,
                     out_col: str | None = None, num_partitions: int = 64):
    """Unbounded-cardinality grouped sum in ONE exchange: arrow
    group_by per block (the combiner) → hash-partition on the key
    tuple → one vectorized pandas groupby-sum per partition. The
    partial+final shape of ``compact_groupby`` without its
    repartition(1) group-count bound, and half the exchanges of
    ``salted_groupby_sum`` (which exists for HOT-key skew: salt splits
    a single giant key across reducers; use that when one key
    dominates, this when keys are many)."""
    out_col = out_col or f"sum_{value_col}"
    import pandas as pd

    def pre(t: pa.Table) -> pa.Table:
        proj = pa.table({**{k: t[k] for k in keys},
                         value_col: pc.cast(t[value_col], pa.int64())
                         if pa.types.is_integer(t[value_col].type)
                         else t[value_col]})
        g = proj.group_by(keys).aggregate([(value_col, "sum")])
        g = g.rename_columns(keys + [out_col])
        h = pd.util.hash_pandas_object(
            g.select(keys).to_pandas(), index=False).to_numpy()
        return g.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def final(g: "pd.DataFrame") -> pa.Table:
        out = g.groupby(keys, as_index=False, sort=False)[out_col].sum()
        return pa_from_pandas(out)

    return (ds.map_batches(pre, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(final), batch_format="pandas"))


def hash_groupby_agg(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                     num_partitions: int = 64):
    """``hash_groupby_sum`` generalized to any SELF-DECOMPOSABLE
    aggregate (max of maxes = max, min of mins = min, sum of sums =
    sum) — still exactly ONE exchange: an arrow ``group_by`` combiner
    per block, a hash partition on the key tuple, one vectorized
    pandas groupby per partition. ``aggs``: {input_col: (fn, alias)}
    with fn ∈ {"sum", "max", "min"}. Unbounded group cardinality;
    only (keys + aliases) partial rows move."""
    import pandas as pd

    fns = {c: f for c, (f, _) in aggs.items()}
    aliases = {c: a for c, (_, a) in aggs.items()}

    def pre(t: pa.Table) -> pa.Table:
        proj = pa.table({**{k: t[k] for k in keys},
                         **{c: t[c] for c in aggs}})
        g = proj.group_by(keys).aggregate([(c, fns[c]) for c in aggs])
        g = g.rename_columns(keys + [aliases[c] for c in aggs])
        h = pd.util.hash_pandas_object(
            g.select(keys).to_pandas(), index=False).to_numpy()
        return g.append_column(
            "__p", pa.array((h % np.uint64(num_partitions)).astype(np.int64)))

    def final(g: "pd.DataFrame") -> pa.Table:
        out = g.groupby(keys, as_index=False, sort=False).agg(
            {aliases[c]: fns[c] for c in aggs})
        return pa_from_pandas(out)

    return (ds.map_batches(pre, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(final), batch_format="pandas"))


def pivot_counts(ds, key: str, col: str, values: list[str],
                 value_col: str | None = None,
                 total_alias: str = "total"):
    """Pivot (long → wide) with a FIXED column set — the only pivot
    shape that scales: the output schema is declared up front (one
    int64 column per pivot value + a total), so the whole operation is
    per-block conditional aggregation feeding one compact_groupby — no
    second pass to discover columns, no driver-side schema negotiation.
    ``value_col=None`` counts rows; otherwise sums that column."""

    def partial(t: pa.Table) -> pa.Table:
        cv = pc.cast(t[col], pa.string())
        base = pc.cast(t[value_col], pa.int64()) if value_col else \
            pa.array(np.ones(t.num_rows, np.int64))
        proj = {key: t[key], total_alias: base}
        for v in values:
            proj[f"n_{v}"] = pc.if_else(pc.equal(cv, v), base,
                                        pa.scalar(0, pa.int64()))
        return pa.table(proj)

    cols = {f"n_{v}": f"n_{v}" for v in values}
    cols[total_alias] = total_alias
    return compact_groupby(ds.map_batches(partial, batch_format="pyarrow"),
                           [key], sum_cols=cols)


def exponential_histogram(ds, key: str, val_col: str, scale_note: str = ""):
    """OTel exponential-histogram bucketing at scale 0 (power-of-2
    boundaries; opentelemetry-proto ExponentialHistogramDataPoint
    base-2 index family — here lower-inclusive on the quantized grid:
    bucket b holds cents ∈ [2^b, 2^(b+1)), plus a dedicated
    zero/negative bucket at -1). Values quantize to
    cents first, then the bucket is the INTEGER MSB index — computed
    as floor(log2) with an exact integer-shift correction, so the
    result never depends on libm rounding and matches the SQL twin
    bit-for-bit.

    Compact shape: per-block (key, bucket) count/sum partials, one
    tiny exchange (keys × ~40 buckets)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(t[val_col], pa.float64()), 100.0), 0.5)),
            pa.int64()).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore"):
            b = np.floor(np.log2(np.maximum(cents, 1))).astype(np.int64)
        # exact correction: ensure 2^b <= cents < 2^(b+1) (integers)
        b -= ((np.int64(1) << np.maximum(b, 0)) > cents).astype(np.int64)
        b += ((np.int64(1) << np.maximum(b + 1, 0)) <= cents).astype(np.int64)
        b = np.where(cents <= 0, np.int64(-1), b)   # zero/neg bucket
        df = pd.DataFrame({key: t[key].to_numpy(zero_copy_only=False),
                           "bucket": b, "c": cents})
        out = df.groupby([key, "bucket"], as_index=False).agg(
            n=("c", "size"), sum_cents=("c", "sum"))
        return pa_from_pandas(out.astype({"bucket": "int64", "n": "int64",
                                          "sum_cents": "int64"}))

    return compact_groupby(ds.map_batches(partial, batch_format="pyarrow"),
                           [key, "bucket"],
                           sum_cols={"n": "n", "sum_cents": "sum_cents"})


def grouped_trimmed_sum(ds, group_col: str, col: str,
                        trim_num: int = 1, trim_den: int = 20,
                        num_partitions: int = 64):
    """EXACT per-group trimmed aggregate over an integer column — the
    robust-mean building block (drop the ``k = ⌊n·trim_num/trim_den⌋``
    smallest and largest values, sum the middle). Reports the integer
    pieces (n, k, sum_total, sum_trimmed); the trimmed MEAN is a
    driver-side division over this compact output, keeping the oracle
    float-free.

    Same rail as ``grouped_int_quantiles``: per-batch (group, value)
    histogram combiner → ONE group-hash exchange (each group's full
    histogram lands in one partition — rows moved are distinct values,
    not raw rows) → per-partition cumsum arithmetic: with value-sorted
    counts ``n_i`` and weighted sums ``v_i·n_i``, the bottom-k sum is
    ``cumsv[p−1] + (k − cumn[p−1])·v_p`` at the crossing position
    (multiplicity-aware partial take), top-k symmetric from the tail —
    no per-row sort anywhere.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = df.groupby(["g", "v"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_array(out["g"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def trimmed_per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["g", "v"], as_index=False, dropna=False)["n"].sum()
        g = g.sort_values(["g", "v"], kind="mergesort")
        rows = []
        for key, grp in g.groupby("g", sort=False, dropna=False):
            vals = grp["v"].to_numpy()
            cnt = grp["n"].to_numpy()
            cumn = cnt.cumsum()
            cumsv = (vals * cnt).cumsum()
            n = int(cumn[-1])
            total = int(cumsv[-1])
            k = (n * trim_num) // trim_den
            if 2 * k >= n:  # everything trimmed away
                rows.append({group_col: key, "n": n, "k": k,
                             "sum_total": total, "sum_trimmed": 0})
                continue

            def head_sum(kk: int) -> int:
                if kk == 0:
                    return 0
                p = int(np.searchsorted(cumn, kk))  # first pos with cumn >= kk
                before = int(cumsv[p - 1]) if p else 0
                nbefore = int(cumn[p - 1]) if p else 0
                return before + (kk - nbefore) * int(vals[p])

            def tail_sum(kk: int) -> int:
                if kk == 0:
                    return 0
                rn = cnt[::-1].cumsum()
                rs = (vals[::-1] * cnt[::-1]).cumsum()
                p = int(np.searchsorted(rn, kk))
                before = int(rs[p - 1]) if p else 0
                nbefore = int(rn[p - 1]) if p else 0
                return before + (kk - nbefore) * int(vals[::-1][p])

            rows.append({group_col: key, "n": n, "k": k,
                         "sum_total": total,
                         "sum_trimmed": total - head_sum(k) - tail_sum(k)})
        return pd.DataFrame(rows,
                            columns=[group_col, "n", "k",
                                     "sum_total", "sum_trimmed"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(trimmed_per_group), batch_format="pandas"))


def grouped_ks_statistic(ds, group_col: str, split_col: str, col: str,
                         num_partitions: int = 64):
    """Two-sample Kolmogorov–Smirnov statistic per group, INTEGER-EXACT:
    with samples A (``split_col`` = 0) and B (= 1) of sizes n1, n2, the
    KS distance is ``max_v |F1(v) − F2(v)|``; reporting the integer
    numerator ``d_num = max_v |c1(v)·n2 − c2(v)·n1|`` together with
    (n1, n2) avoids every float division — D = d_num/(n1·n2) on the
    driver. The sup over the pooled support is exact (the ECDF gap only
    changes at observed values).

    Same histogram rail as ``grouped_int_quantiles``: per-batch
    (group, value) → (c1, c2) partial counts, ONE group-hash exchange
    of distinct-value rows, per-partition value sort + two cumsums +
    one vectorized |cross-product| max. Finer-grained than the binned
    TVD drift op — no bin domain to pick.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        s = t[split_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
            "c1": (s == 0).astype(np.int64),
            "c2": (s == 1).astype(np.int64),
        })
        out = df.groupby(["g", "v"], as_index=False, dropna=False).agg(
            {"c1": "sum", "c2": "sum"})
        h = pd.util.hash_array(out["g"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def ks_per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["g", "v"], as_index=False, dropna=False).agg(
            {"c1": "sum", "c2": "sum"})
        g = g.sort_values(["g", "v"], kind="mergesort")
        rows = []
        for key, grp in g.groupby("g", sort=False, dropna=False):
            cc1 = grp["c1"].to_numpy().cumsum()
            cc2 = grp["c2"].to_numpy().cumsum()
            n1, n2 = int(cc1[-1]), int(cc2[-1])
            d_num = int(np.max(np.abs(cc1 * n2 - cc2 * n1))) if len(cc1) else 0
            rows.append({group_col: key, "n1": n1, "n2": n2,
                         "d_num": d_num})
        return pd.DataFrame(rows, columns=[group_col, "n1", "n2", "d_num"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(ks_per_group), batch_format="pandas"))


def grouped_emd_to_global(ds, group_col: str, col: str,
                          num_partitions: int = 64):
    """t-closeness distance (Li et al., ICDE 2007): for each
    quasi-identifier group, the ordered Earth-Mover's Distance between
    the group's sensitive-value distribution and the GLOBAL one,
    reported as the integer numerator ``emd_num = Σ_v |cc_g(v)·N −
    cc_all(v)·n_g|`` over the pooled support (t = emd_num/(n_g·N·(m−1))
    is a driver division) — no float division in either engine.
    Completes the k-anonymity / l-diversity / t-closeness privacy trio.

    Shape: ONE partial pass emits distinct (group, value) counts; the
    materialized partials serve BOTH sides — the global histogram folds
    from them (compact, bounded quantized domain — same contract as
    bounded_histogram) and broadcasts driver-side, while the partials
    take the group-hash exchange and each partition aligns its groups'
    step functions to the broadcast support via searchsorted. Raw rows
    never move twice; int64 is exact while n_g·N·m fits (true at any
    bench scale; shard the sum at 10^12-row corpora).
    """
    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = df.groupby(["g", "v"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "c"})
        h = pd.util.hash_array(out["g"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    glob = compact_groupby(partials, keys=["v"], sum_cols={"c": "c"}) \
        .to_pandas().sort_values("v")
    sup = glob["v"].to_numpy().astype(np.int64)
    cc_all = glob["c"].to_numpy().astype(np.int64).cumsum()
    n_total = int(cc_all[-1]) if len(cc_all) else 0
    ref = ray.put((sup, cc_all))

    def emd_per_group(g: pd.DataFrame) -> pd.DataFrame:
        sup_b, cc_all_b = ray.get(ref)
        g = g.groupby(["g", "v"], as_index=False, dropna=False)["c"].sum()
        g = g.sort_values(["g", "v"], kind="mergesort")
        rows = []
        for key, grp in g.groupby("g", sort=False, dropna=False):
            gv = grp["v"].to_numpy()
            gcum = grp["c"].to_numpy().cumsum()
            n_g = int(gcum[-1])
            # group step function evaluated at every pooled support point
            pos = np.searchsorted(gv, sup_b, side="right")
            cc_g = np.where(pos > 0, gcum[np.maximum(pos - 1, 0)], 0)
            emd = int(np.abs(cc_g * n_total - cc_all_b * n_g).sum())
            rows.append({group_col: key, "n_g": n_g,
                         "m": len(sup_b), "emd_num": emd})
        return pd.DataFrame(rows, columns=[group_col, "n_g", "m", "emd_num"])

    return (partials.groupby("__p")
            .map_groups(arrow_out(emd_per_group), batch_format="pandas"))


def grouped_mode(ds, group_col: str, col: str, num_partitions: int = 64):
    """Exact per-group MODE of an integer column (most frequent value,
    ties → smallest value) with its multiplicity and the group size —
    the "typical value" descriptive statistic, deterministic so a
    row_number() twin hashes identically.

    Rides the grouped-histogram rail (same as ``grouped_trimmed_sum`` /
    ``grouped_ks_statistic``): per-batch (group, value) distinct-count
    partials take the ONE group-hash exchange — rows moved are distinct
    values per block, never raw rows — then each partition folds its
    groups' full histograms with one stable sort + groupby-first. State
    per group is its distinct-value count, which the rail already
    assumes bounded (quantized cents domain)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_numpy(zero_copy_only=False),
            "v": t[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = df.groupby(["g", "v"], as_index=False, dropna=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_array(out["g"].to_numpy().astype("U"))
        out["__p"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return pa_from_pandas(out)

    def mode_per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["g", "v"], as_index=False, dropna=False)["n"].sum()
        tot = g.groupby("g", dropna=False)["n"].transform("sum")
        g = g.assign(tot=tot).sort_values(
            ["g", "n", "v"], ascending=[True, False, True], kind="mergesort")
        first = g.groupby("g", as_index=False, sort=False, dropna=False).first()
        return pd.DataFrame({
            group_col: first["g"],
            "mode_value": first["v"].astype("int64"),
            "n_mode": first["n"].astype("int64"),
            "n_rows": first["tot"].astype("int64"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(arrow_out(mode_per_group), batch_format="pandas"))


def fd_audit(ds, fds: dict[str, tuple[str, str]]):
    """Functional-dependency audit (data-contract screen): for each
    candidate FD ``det → dep``, does every determinant value map to a
    single dependent value? Reports one row per FD: the determinant
    count, how many determinants VIOLATE (≥2 distinct dependents), the
    worst determinant's distinct-dependent count, and the row count
    living under violating determinants — the prioritized fix list a
    schema-inference run consults.

    Shape: one column-pruned pass per FD — per-block distinct
    (det, dep) partials into the compact exchange (O(distinct pairs ×
    blocks) rows move), the per-FD verdict folds on the single compact
    block, results union. Bounded-domain contract (same as every
    compact_groupby consumer); an id-like determinant wants the
    hash-partitioned rail instead."""

    def report_for(name: str, det: str, dep: str):
        pairs = compact_groupby(ds, [det, dep], count_alias="n_rows")

        def verdict(t: pa.Table) -> pa.Table:
            import pandas as pd
            df = t.to_pandas()
            per = df.groupby(det, dropna=False).agg(
                nv=(dep, "size"), nr=("n_rows", "sum"))
            bad = per[per["nv"] > 1]
            return pa.table({
                "fd": pa.array([name]),
                "n_det": pa.array([len(per)], pa.int64()),
                "n_violating": pa.array([len(bad)], pa.int64()),
                "max_values": pa.array([int(per["nv"].max()) if len(per)
                                        else 0], pa.int64()),
                "n_rows_violating": pa.array([int(bad["nr"].sum())],
                                             pa.int64()),
            })

        return pairs.map_batches(verdict, batch_format="pyarrow",
                                 batch_size=None)

    out = None
    for name, (det, dep) in fds.items():
        part = report_for(name, det, dep)
        out = part if out is None else out.union(part)
    return out


def grid_neighborhood(cell_ds, x_col: str, y_col: str, n_col: str,
                      grid: int = 64):
    """3×3 neighborhood smoothing over a COMPACT per-cell table (the
    hotspot / KDE-lite step of a spatial pipeline): appends
    ``nbr_events`` = the sum of ``n_col`` over the cell's 3×3
    neighborhood, boundary-truncated (no wraparound). Expects the
    single-block output of ``compact_groupby`` keyed on integer cells
    in [0, grid)²; the smoothing is a vectorized 9-shift scatter-add
    on that one block — never a self-join of the fact table. Absent
    cells contribute 0 and emit nothing, matching a
    join-of-existing-cells SQL twin exactly."""

    def neigh(t: pa.Table) -> pa.Table:
        cx = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # the scatter below relies on cells in [0, grid); a negative
        # index would silently wrap to the opposite edge (numpy
        # negative indexing) and corrupt the smoothing — fail loudly
        if len(cx) and not ((cx >= 0).all() and (cx < grid).all()
                            and (cy >= 0).all() and (cy < grid).all()):
            raise ValueError("grid_neighborhood: cell index out of "
                             f"[0, {grid}) range")
        g = np.zeros((grid, grid), np.int64)
        g[cx, cy] = n
        acc = np.zeros((grid + 2, grid + 2), np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                acc[1 + dx:grid + 1 + dx, 1 + dy:grid + 1 + dy] += g
        return t.append_column(
            "nbr_events", pa.array(acc[1:grid + 1, 1:grid + 1][cx, cy]))

    return cell_ds.map_batches(neigh, batch_format="pyarrow",
                               batch_size=None)
