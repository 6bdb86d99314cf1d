"""Join strategies — custom operators beyond the reference's lookup-only
surface (SURVEY.md §2.8), built Ray-Data-first.

- broadcast_join: small side broadcast via ``ray.put``, resolved ONCE
  per actor, vectorized merge per batch (the k8sattributesprocessor
  lookup pattern generalized to whole tables). No shuffle.
- semi_join / anti_join: broadcast key set resolved once per actor,
  vectorized ``pc.is_in`` membership mask. For a large right side use
  large_semi_join / large_anti_join (hash-partitioned native join).
- bucketed_hash_join: both sides large — Ray Data's native
  hash-partitioned ``Dataset.join``; the partition count is derived
  from the input row counts (rows-per-partition target) so per-worker
  memory stays bounded no matter the total size, instead of a fixed
  bucket count that would concentrate ~total/n_buckets rows per worker.
- asof_join: for each left row, the latest right row with
  ``right.ts <= left.ts`` (backward) per key.
  * scalable path (``bucket_width_s`` set): shuffle on
    ``(key, time_bucket)`` so one worker holds only one key's rows for
    one time slice. Cross-bucket lookback is handled by computing one
    summary row per (key, bucket) on the right side and replicating the
    latest-earlier summary ("carry row") into every left bucket — so a
    single co-grouped pass resolves every row. Partitioning assumption:
    one key's rows within one bucket fit a worker; pick the width from
    event density.
  * fallback (``bucket_width_s=None``): single shuffle on key; one
    key's entire history must fit one worker (fine for bounded keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .base import arrow_out

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "outer": "full_outer",
}

# Target rows per hash-join partition: bounds each aggregator worker's
# heap at roughly rows_per_partition × row_width × 2 sides regardless of
# total input size.
DEFAULT_ROWS_PER_PARTITION = 1_000_000


def broadcast_join(ds, small_ref, on: str, how: str = "left",
                   concurrency: int = 4, mode: str = "actor"):
    """``small_ref``: pandas DataFrame or ``ray.put`` ref of one (must
    include ``on``). Resolved once per actor; vectorized pandas merge
    per batch — no shuffle. Emits metadata-free Arrow blocks (a pandas
    return would make Ray re-attach ``b'pandas'`` schema metadata on
    the next conversion, defeating downstream schema dedup).

    ``mode="task"``: plain-function stage instead of an actor pool —
    fuses with the upstream read into one task op and skips actor
    startup (~1-2 s of fixed latency). ``ray.get`` of the broadcast
    ref inside a task is a zero-copy local-object-store hit after the
    first resolve, so per-task resolution costs nothing; prefer task
    mode for small dims on short pipelines, actor mode when the stage
    also carries real per-actor state."""
    from .base import norm_concurrency, pa_from_pandas

    if mode == "task":
        def join_fn(b: pd.DataFrame) -> pa.Table:
            import ray

            small = (ray.get(small_ref)
                     if not isinstance(small_ref, pd.DataFrame) else small_ref)
            return pa_from_pandas(b.merge(small, on=on, how=how))

        return ds.map_batches(arrow_out(join_fn), batch_format="pandas")

    class Joiner:
        def __init__(self):
            import ray

            self.small = (
                ray.get(small_ref) if not isinstance(small_ref, pd.DataFrame) else small_ref
            )

        def __call__(self, b: pd.DataFrame) -> pa.Table:
            return pa_from_pandas(b.merge(self.small, on=on, how=how))

    return ds.map_batches(
        Joiner, batch_format="pandas", concurrency=norm_concurrency(concurrency)
    )


class _KeySetMasker:
    """Membership filter against a broadcast key set — the key array is
    resolved from the object store ONCE per actor (``__init__``), and
    each batch is masked with one vectorized ``pc.is_in`` call."""

    def __init__(self, keys_ref, on: str, keep_matches: bool):
        import ray

        keys = keys_ref if isinstance(keys_ref, (set, frozenset, list)) else ray.get(keys_ref)
        self.value_set = pa.array(sorted(keys) if isinstance(keys, (set, frozenset)) else list(keys))
        self.on = on
        self.keep = keep_matches

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        member = pc.is_in(col, value_set=self.value_set.cast(col.type))
        mask = member if self.keep else pc.invert(member)
        return t.filter(pc.fill_null(mask, not self.keep))


def _key_set_stage(ds, keys_ref, on: str, keep: bool, concurrency,
                   mode: str = "task"):
    """Default TASK mode: the masker (sorted key array built once,
    driver-side) ships in the task closure — fuses with the upstream
    op, no pool startup, no width cap. Large key sets ride the object
    store either way (closure capture puts them once, same as
    ``ray.put``). Actor mode remains for callers that want per-actor
    construction from a ref."""
    from .base import norm_concurrency

    if mode == "task":
        return ds.map_batches(
            _KeySetMasker(keys_ref, on, keep), batch_format="pyarrow")
    return ds.map_batches(
        _KeySetMasker, fn_constructor_args=(keys_ref, on, keep),
        batch_format="pyarrow", concurrency=norm_concurrency(concurrency),
    )


def semi_join(ds, keys_ref, on: str, concurrency: int = 4):
    """Keep rows whose key is in the broadcast key set."""
    return _key_set_stage(ds, keys_ref, on, True, concurrency)


def anti_join(ds, keys_ref, on: str, concurrency: int = 4):
    """Drop rows whose key is in the broadcast key set."""
    return _key_set_stage(ds, keys_ref, on, False, concurrency)


def _strip_schema_metadata(ds):
    """Zero-copy ``replace_schema_metadata(None)`` per block, fused
    into the upstream task op. Ray's hash-shuffle aggregators
    deduplicate block schemas before unifying, and a schema carrying
    ANY metadata is unhashable in pyarrow (``Schema.__hash__`` raises
    ``unhashable type: 'dict'``), forcing the slow unify path on EVERY
    bundle — at 100 TB that is millions of redundant unify calls in
    the aggregator hot loop. ``pa_from_pandas`` keeps repo-built
    blocks clean, but a ``map_groups``/``map_batches`` UDF returning a
    RAW pandas frame converts inside Ray (metadata attached), so the
    native-join wrappers scrub both inputs here — the consumption
    point — instead of chasing every producer."""

    def strip(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)


def large_semi_join(left, right, on: str, right_on: str | None = None,
                    num_partitions: int | None = None):
    """Semi join where the right side is too large to broadcast —
    native hash-partitioned left_semi join."""
    np_ = num_partitions or _derive_partitions(left, right)
    return _strip_schema_metadata(left).join(
        _strip_schema_metadata(right), join_type="left_semi",
        num_partitions=np_, on=(on,), right_on=(right_on or on,))


def large_anti_join(left, right, on: str, right_on: str | None = None,
                    num_partitions: int | None = None):
    """Anti join against a large right side — native left_anti join."""
    np_ = num_partitions or _derive_partitions(left, right)
    return _strip_schema_metadata(left).join(
        _strip_schema_metadata(right), join_type="left_anti",
        num_partitions=np_, on=(on,), right_on=(right_on or on,))


DEFAULT_JOIN_PARTITIONS = 64

# Rows above which a "small" side is no longer broadcast to every actor
# / materialized on the driver, and the plan falls back to the
# hash-partitioned path. ~2M rows ≈ tens of MB for narrow key+value
# schemas — cheap to ship once per actor; beyond that the dim scales
# with the corpus (TPC-H customer is SF×150k) and must shuffle.
BROADCAST_ROWS_THRESHOLD = 2_000_000


def _side_rows(ds, size_hint=None) -> int | None:
    """Upper-bound row count for the gate: an explicit ``size_hint``
    (int, or a Dataset whose metadata count bounds the side — e.g. the
    pre-filter read, since filters only shrink), else the side's own
    metadata count. None = unknown (derived lineage)."""
    if isinstance(size_hint, int):
        return size_hint
    if size_hint is not None:
        return _rows_estimate(size_hint)
    return _rows_estimate(ds)


def gated_semi_join(ds, right, on: str, right_on: str | None = None,
                    size_hint=None, threshold: int | None = None,
                    concurrency=4, num_partitions: int | None = None):
    """Semi join that picks its strategy from the right side's size:
    provably small (≤ threshold rows by metadata / size_hint) → key set
    materialized ONCE, broadcast, vectorized ``pc.is_in`` per batch (no
    shuffle); unknown or large → hash-partitioned native left_semi join.
    The threshold is a parameter so tests can force either path."""
    import ray

    thr = BROADCAST_ROWS_THRESHOLD if threshold is None else threshold
    n = _side_rows(right, size_hint)
    key = right_on or on
    if n is not None and n <= thr:
        keys = [r[key] for r in right.take_all()]
        return semi_join(ds, ray.put(set(keys)), on, concurrency=concurrency)
    return large_semi_join(ds, right, on, right_on=key,
                           num_partitions=num_partitions)


def gated_broadcast_join(large, small, on: str, right_on: str | None = None,
                         how: str = "inner", size_hint=None,
                         threshold: int | None = None, concurrency=4,
                         num_partitions: int | None = None):
    """Inner/left join that broadcasts the small side when it is
    provably small (≤ threshold rows), else falls back to the
    hash-partitioned native join. The broadcast path materializes the
    small side ONCE (bounded by the threshold), renames its key to the
    left key, and ships it to every actor via ``ray.put``."""
    import ray

    thr = BROADCAST_ROWS_THRESHOLD if threshold is None else threshold
    n = _side_rows(small, size_hint)
    key = right_on or on
    if n is not None and n <= thr:
        sm = small.to_pandas()
        if sm.shape[1] == 0:
            # an EMPTY dataset's to_pandas() loses its schema; rebuild
            # the zero-row frame from plan metadata so the merge key
            # survives (pandas raises KeyError on a columnless merge)
            sch = small.schema()
            base = getattr(sch, "base_schema", sch)
            sm = base.empty_table().to_pandas()
        if key != on:
            sm = sm.rename(columns={key: on})
        # task mode: fuses with the large side's read into one task op
        # (actor-pool startup is pure fixed latency for a stateless
        # merge; the ref resolve is a local zero-copy hit per task)
        return broadcast_join(large, ray.put(sm), on=on, how=how,
                              mode="task")
    return bucketed_hash_join(large, small, on=on, how=how, right_on=key,
                              num_partitions=num_partitions)


def _rows_estimate(ds) -> int | None:
    """Row count WITHOUT executing the lineage: plan metadata only
    (``Dataset._meta_count`` — populated for plain file reads and
    already-materialized datasets; None for derived lineages)."""
    try:
        return ds._meta_count()
    except Exception:
        return None


def _derive_partitions(left, right,
                       rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION) -> int:
    """Partition count from input sizes: ceil(total_rows / target),
    clamped to [8, 1024]. Uses metadata-only row counts — a derived
    dataset (map/filter lineage) has no metadata count, and executing
    it here would run the whole upstream pipeline just to size the
    join, so those fall back to ``DEFAULT_JOIN_PARTITIONS`` (pass
    ``num_partitions`` explicitly to tune). Either way the count is
    capped at 4× the cluster's CPUs: Ray's hash-join spawns one
    0.125-CPU aggregator actor per partition and blocks until ALL are
    scheduled, so a partition count sized for a big cluster deadlocks
    a small one (observed: 64 partitions on 4 CPUs never starts)."""
    cap = 1024
    try:
        import ray

        cpus = ray.cluster_resources().get("CPU") if ray.is_initialized() else None
        if cpus:
            cap = max(8, int(cpus) * 4)
    except Exception:
        pass
    lc, rc = _rows_estimate(left), _rows_estimate(right)
    if lc is None or rc is None:
        return min(DEFAULT_JOIN_PARTITIONS, cap)
    total = lc + rc
    return int(min(max(-(-total // rows_per_partition), 8), cap))


def detect_hot_keys(left, on: str, per_block_k: int = 16,
                    threshold_rows: int | None = None) -> list:
    """Deterministic hot-key detection in ONE compact pass: each block
    contributes its ``per_block_k`` most frequent keys with their
    counts (a key that dominates a partition is by definition frequent
    inside most blocks, so block-local top-k never misses a true hot
    key; it can only UNDER-count, never over-count), the partials fold
    into one tiny block, and keys whose summed count exceeds
    ``threshold_rows`` come back as a plain list. O(k × blocks) rows
    move — independent of both table size and key cardinality."""
    thr = (DEFAULT_ROWS_PER_PARTITION // 4 if threshold_rows is None
           else threshold_rows)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({on: t[on], "__n": pa.array([], pa.int64())})
        g = t.select([on]).group_by([on]).aggregate([([], "count_all")])
        g = g.rename_columns([on, "__n"])
        if g.num_rows > per_block_k:
            order = pc.select_k_unstable(
                g, k=per_block_k, sort_keys=[("__n", "descending")])
            g = g.take(order)
        return g

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by([on]).aggregate([("__n", "sum")])
        g = g.rename_columns([on, "__n"])
        return g.filter(pc.greater(g["__n"], pa.scalar(thr, pa.int64())))

    rows = (left.map_batches(partial, batch_format="pyarrow")
                .repartition(1)
                .map_batches(fold, batch_format="pyarrow")
                .take_all())
    return [r[on] for r in rows]


def skew_hybrid_join(left, right, on: str, how: str = "inner",
                     right_on: str | None = None,
                     per_block_k: int = 16,
                     threshold_rows: int | None = None,
                     num_partitions: int | None = None):
    """Skew-aware large × large join: the classic hot/cold split. A
    hash-partitioned join concentrates each key on ONE aggregator, so
    a Zipf-hot key turns the exchange into a single-worker straggler
    (at 100 TB, one key with 1% of rows = one worker holding 1 TB).
    This operator routes around it:

    1. ``detect_hot_keys`` — one compact top-k-per-block pass over the
       MATERIALIZED left (materialized once, reused by every pass
       below; no lineage re-execution).
    2. HOT rows: ``left ∩ hot`` joins via broadcast — the right side's
       hot-key slice replicates to every task instead of the left
       side's giant key concentrating on one worker. Gated: if the
       right hot slice exceeds the broadcast threshold the whole thing
       falls back to the plain hash join (both sides hot = no cheap
       plan; document, don't guess).
    3. COLD rows: both sides filtered to cold keys take the normal
       hash-partitioned join — now free of stragglers.
    4. Results union; routing is invisible in the output (the oracle
       is the PLAIN join — hot/cold placement cannot change a single
       row, only the schedule).

    ``how``: inner or left (left-outer null-fill happens per route —
    a cold left row can only match cold right rows and vice versa, so
    per-route left joins compose exactly)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError("skew_hybrid_join supports inner/left")
    key = right_on or on
    lm = left.materialize()
    # the right is consumed by BOTH the hot-slice scan and the cold
    # route; without a materialize its whole lineage (often a rollup
    # with its own exchange) re-executes once per consumer
    rm = right.materialize()
    hot = detect_hot_keys(lm, on, per_block_k=per_block_k,
                          threshold_rows=threshold_rows)
    if not hot:
        return bucketed_hash_join(lm, rm, on=on, how=how, right_on=key,
                                  num_partitions=num_partitions)

    hot_arr = pa.array(hot)

    def split(keep_hot: bool, col: str):
        def fn(t: pa.Table) -> pa.Table:
            c = t[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            m = pc.is_in(c, value_set=hot_arr.cast(c.type))
            return t.filter(m if keep_hot else pc.invert(m))
        return fn

    r_hot = rm.map_batches(split(True, key),
                           batch_format="pyarrow").materialize()
    if (r_hot.count() or 0) > BROADCAST_ROWS_THRESHOLD:
        # hot on BOTH sides — no broadcast plan exists; pay the skewed
        # exchange rather than OOM an actor replicating a huge side
        return bucketed_hash_join(lm, rm, on=on, how=how, right_on=key,
                                  num_partitions=num_partitions)

    sm = r_hot.to_pandas()
    if key != on:
        sm = sm.rename(columns={key: on})
    hot_join = broadcast_join(lm.map_batches(split(True, on),
                                             batch_format="pyarrow"),
                              ray.put(sm), on=on, how=how, mode="task")
    # the cold right coalesces through one split-repartition: a
    # groupby().map_groups upstream (every rollup rail here) emits a
    # ZERO-COLUMN block for each empty sort partition, map stages
    # never see empty blocks (so no UDF can re-schema them), and the
    # native join's aggregator unify races on them (FieldRef "no
    # match" — the q15/q22 gate dodges documented this); repartition
    # concat-merges empties into schema-carrying blocks. Cost: one
    # block-level exchange of the (dim-scale) cold right only.
    cold_right = (rm.map_batches(split(False, key),
                                 batch_format="pyarrow")
                    .repartition(8))
    cold_join = bucketed_hash_join(
        lm.map_batches(split(False, on), batch_format="pyarrow"),
        cold_right, on=on, how=how, right_on=key,
        num_partitions=num_partitions)
    return hot_join.union(cold_join)


def bucketed_hash_join(left, right, on: str, how: str = "inner",
                       right_on: str | None = None,
                       num_partitions: int | None = None,
                       rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
                       n_buckets: int | None = None):
    """Large × large hash join via Ray Data's native hash-partitioned
    ``Dataset.join``. Each of the ``num_partitions`` partitions is
    joined independently by an aggregator worker, so per-worker memory
    is ~(total rows / num_partitions) — derived from the input row
    counts unless given explicitly (``n_buckets`` is the deprecated
    alias)."""
    if num_partitions is None:
        num_partitions = n_buckets or _derive_partitions(left, right, rows_per_partition)
    return _strip_schema_metadata(left).join(
        _strip_schema_metadata(right),
        join_type=_JOIN_TYPES.get(how, how),
        num_partitions=int(num_partitions),
        on=(on,),
        right_on=(right_on or on,),
    )


# ------------------------------------------------------------------ as-of


def _with_bucket(ts: str, width_us: int):
    def fn(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts], pa.timestamp("us")), pa.int64())
        b = pc.divide(us, width_us)
        return t.append_column("__b", pc.cast(b, pa.int64()))

    return fn


def _pa_type(typ) -> pa.DataType:
    """ray.data.Schema.types yields Python classes (e.g. ``object``) for
    pandas-backed datasets — map those to a best-effort Arrow type."""
    if isinstance(typ, pa.DataType):
        return typ
    return pa.string()


def _align_union(tagged, all_fields: dict):
    """Union tables with different columns: add each side's missing
    columns as typed nulls so every block shares one schema.
    ``all_fields``: name → pa.DataType for the unified schema (built by
    the caller from the INPUT schemas — derived datasets like
    ``map_groups`` outputs can't report a schema without executing)."""

    def pad(t: pa.Table) -> pa.Table:
        cols = []
        for name, typ in all_fields.items():
            if name not in t.column_names:
                cols.append(pa.nulls(t.num_rows, typ))
            else:
                c = t[name]
                cols.append(c if c.type == typ else pc.cast(c, typ))
        return pa.table(dict(zip(all_fields, cols)))

    out = tagged[0].map_batches(pad, batch_format="pyarrow")
    for ds in tagged[1:]:
        out = out.union(ds.map_batches(pad, batch_format="pyarrow"))
    return out


def _tag(side: str):
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array([side] * t.num_rows))

    return fn


def _add_part(keys: list, n_parts: int):
    """Append ``__p = hash(keys) % n_parts`` — the explicit shuffle key.
    Vectorized; combining hash for composite keys."""
    from .transformers import _hash_u64

    def fn(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keys:
                h = h * np.uint64(1000003) + _hash_u64(t[k])
        return t.append_column("__p", pa.array((h % np.uint64(n_parts)).astype(np.int64)))

    return fn


def asof_join(left, right, key: str, ts: str, direction: str = "backward",
              suffix: str = "_r", allow_exact_matches: bool = True,
              bucket_width_s: int | None = None,
              num_partitions: int | None = None,
              tolerance_s: float | None = None):
    """As-of join (see module docstring for the partitioning design).

    Execution shape: both paths shuffle on a HASH PARTITION column
    (``__p``) rather than the raw key, so one worker processes one
    partition containing MANY whole key groups, and the asof itself is
    a single vectorized ``pd.merge_asof(..., by=key)`` per partition —
    no per-key Python call. ``num_partitions`` bounds per-worker memory
    at ~total/num_partitions rows (derived from input sizes when not
    given)."""
    lschema, rschema = left.schema(), right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    rvals = [c for c in rcols if c not in (key, ts)]
    out_names = {c: (c + suffix if c in lcols else c) for c in rvals}
    base_fields: dict = {}
    for s in (lschema, rschema):
        for name, typ in zip(s.names, s.types):
            base_fields.setdefault(name, _pa_type(typ))
    n_parts = num_partitions or _derive_partitions(left, right, 500_000)

    def merge_part(by_cols):
        """One partition (= many whole key/bucket groups): vectorized
        multi-key asof in a single C call."""

        def fn(g: pd.DataFrame) -> pd.DataFrame:
            l = g.loc[g["__side"] == "l", lcols + by_cols[1:]]
            l = l.sort_values(ts, kind="mergesort")
            r = g.loc[g["__side"] == "r", [key, ts] + rvals + by_cols[1:]]
            r = r.dropna(subset=[ts]).sort_values(ts, kind="mergesort")
            m = pd.merge_asof(
                l, r, on=ts, by=by_cols, direction=direction, suffixes=("", suffix),
                allow_exact_matches=allow_exact_matches,
                tolerance=(pd.Timedelta(seconds=tolerance_s)
                           if tolerance_s is not None else None),
            )
            m = m.rename(columns={c + suffix: out_names[c] for c in rvals if c + suffix in m.columns})
            return m[lcols + [out_names[c] for c in rvals]]

        return fn

    if bucket_width_s is None or direction != "backward":
        # partition on hash(key): a key's whole history in one worker
        both = _align_union([
            left.map_batches(_tag("l"), batch_format="pyarrow"),
            right.map_batches(_tag("r"), batch_format="pyarrow"),
        ], dict(base_fields, __side=pa.string()))
        both = both.map_batches(_add_part([key], n_parts), batch_format="pyarrow")
        return both.groupby("__p").map_groups(merge_part([key]), batch_format="pandas")

    width_us = int(bucket_width_s) * 1_000_000
    # each side feeds two consumers (summary/bucket scan + final
    # co-group) — materialize once into the (spillable) object store so
    # the read+bucket lineage doesn't execute twice
    lb = left.map_batches(_with_bucket(ts, width_us), batch_format="pyarrow").materialize()
    rb = right.map_batches(_with_bucket(ts, width_us), batch_format="pyarrow").materialize()

    # one summary row per (key, bucket) = the right row with max ts —
    # shuffles only the right side; computed vectorized per partition
    def last_rows(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(ts, kind="mergesort").groupby([key, "__b"], sort=False).tail(1)
        )

    summaries = (
        rb.map_batches(_add_part([key], n_parts), batch_format="pyarrow")
        .groupby("__p").map_groups(arrow_out(last_rows), batch_format="pandas")
    )

    # distinct (key, bucket) pairs present on the LEFT — two ints/row,
    # Ray-native aggregate (no Python per group)
    left_buckets = (
        lb.select_columns([key, "__b"]).groupby([key, "__b"]).count()
        .select_columns([key, "__b"])
    )

    # carry rows: for each left bucket, the latest summary from any
    # STRICTLY EARLIER bucket, re-tagged to that left bucket — itself an
    # asof on the bucket index, vectorized per partition
    def make_carries(g: pd.DataFrame) -> pd.DataFrame:
        tgt = g.loc[g["__c"] == "t", [key, "__b"]].sort_values("__b", kind="mergesort")
        src = g.loc[g["__c"] == "s"].drop(columns=["__c", "__p"]).sort_values("__b", kind="mergesort")
        if tgt.empty or src.empty:
            return src.iloc[0:0]
        m = pd.merge_asof(tgt, src, on="__b", by=key, suffixes=("", "__s"),
                          allow_exact_matches=False)
        return m.dropna(subset=[ts])[src.columns.tolist()]

    tagged_s = summaries.map_batches(
        lambda t: t.append_column("__c", pa.array(["s"] * t.num_rows)), batch_format="pyarrow"
    )
    tagged_t = left_buckets.map_batches(
        lambda t: t.append_column("__c", pa.array(["t"] * t.num_rows)), batch_format="pyarrow"
    )
    rb_fields = {name: _pa_type(typ) for name, typ in zip(rschema.names, rschema.types)}
    rb_fields["__b"] = pa.int64()
    carries = (
        _align_union([tagged_s, tagged_t], dict(rb_fields, __c=pa.string()))
        .map_batches(_add_part([key], n_parts), batch_format="pyarrow")
        .groupby("__p").map_groups(arrow_out(make_carries), batch_format="pandas")
    )

    # final co-grouped pass: partition on hash(key, bucket) — hot keys
    # spread across time buckets; each partition resolved in one
    # vectorized merge_asof(by=[key, bucket])
    both = _align_union([
        lb.map_batches(_tag("l"), batch_format="pyarrow"),
        rb.map_batches(_tag("r"), batch_format="pyarrow"),
        carries.map_batches(_tag("r"), batch_format="pyarrow"),
    ], dict(base_fields, __b=pa.int64(), __side=pa.string()))
    both = both.map_batches(_add_part([key, "__b"], n_parts), batch_format="pyarrow")
    return both.groupby("__p").map_groups(
        merge_part([key, "__b"]), batch_format="pandas"
    )


# ------------------------------------------------------------------ range


def _replicate_intervals(key: str, start: str, end: str, width_us: int,
                         closed_end: bool):
    """Explode each interval row into one replica per time bucket it
    overlaps (replication factor = interval_len / bucket_width + 1).
    Vectorized: np.repeat over row indices + an intra-row arange for the
    bucket offsets. Rows with a null key/bound or an empty interval are
    dropped (inner-join semantics, matching SQL comparison-with-NULL)."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t[start], pa.timestamp("us")), pa.int64())
        e = pc.cast(pc.cast(t[end], pa.timestamp("us")), pa.int64())
        nonempty = pc.greater_equal(e, s) if closed_end else pc.greater(e, s)
        valid = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t[key]), nonempty),
            pc.and_kleene(pc.is_valid(s), pc.is_valid(e)),
        )
        t = t.filter(pc.fill_null(valid, False))
        if t.num_rows == 0:
            return t.append_column("__b", pa.array([], pa.int64()))
        s = pc.cast(pc.cast(t[start], pa.timestamp("us")), pa.int64()).to_numpy()
        e = pc.cast(pc.cast(t[end], pa.timestamp("us")), pa.int64()).to_numpy()
        # last bucket that can contain a matching ts: end inclusive →
        # e // W; exclusive → (e - 1) // W (ts < e)
        b0 = s // width_us
        b1 = (e if closed_end else e - 1) // width_us
        n = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(n)), n)
        offs = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        out = t.take(pa.array(idx))
        return out.append_column("__b", pa.array(b0[idx] + offs, pa.int64()))

    return fn


def range_join(left, intervals, key: str, ts: str, start: str, end: str,
               bucket_width_s: int, suffix: str = "_r",
               closed_start: bool = True, closed_end: bool = False,
               num_partitions: int | None = None):
    """Range (interval) join: one output row per (left row, interval)
    pair with ``left[key] == intervals[key]`` and ``left[ts]`` inside
    ``[start, end)`` (bounds configurable via ``closed_start`` /
    ``closed_end``). The reference has no interval join; this is the
    custom wide operator the brief names next to as-of.

    Scale shape: each interval is replicated into every time bucket it
    overlaps (factor len/width + 1 — pick ``bucket_width_s`` ≈ the max
    interval length so it stays ≤ 2); left rows carry their single
    bucket. ONE hash exchange on (key, bucket) co-locates every
    possible match, and each partition resolves with one vectorized
    pandas merge + mask. A left row lives in exactly one bucket, so no
    pair is emitted twice and per-partition left rows are globally
    disjoint (downstream per-left aggregates can roll up without a
    distinct pass). Partitioning assumption: the rows of one (key,
    bucket) cell fit one worker — pick the bucket width from event
    density, same contract as asof_join."""
    lschema = left.schema()
    ischema = intervals.schema()
    lcols = list(lschema.names)
    icols = [c for c in ischema.names if c != key]
    out_names = {c: (c + suffix if c in lcols else c) for c in icols}
    width_us = int(bucket_width_s) * 1_000_000
    n_parts = num_partitions or _derive_partitions(left, intervals, 500_000)

    base_fields: dict = {}
    for s in (lschema, ischema):
        for name, typ in zip(s.names, s.types):
            base_fields.setdefault(name, _pa_type(typ))

    lb = left.map_batches(_with_bucket(ts, width_us), batch_format="pyarrow")
    ib = intervals.map_batches(
        _replicate_intervals(key, start, end, width_us, closed_end),
        batch_format="pyarrow",
    )

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", lcols + ["__b"]]
        r = g.loc[g["__side"] == "r", [key, "__b"] + icols]
        m = l.merge(r, on=[key, "__b"], suffixes=("", suffix))
        sc, ec = out_names.get(start, start), out_names.get(end, end)
        lo = (m[ts] >= m[sc]) if closed_start else (m[ts] > m[sc])
        hi = (m[ts] <= m[ec]) if closed_end else (m[ts] < m[ec])
        m = m[lo & hi]
        return m[lcols + [out_names[c] for c in icols]]

    both = _align_union(
        [lb.map_batches(_tag("l"), batch_format="pyarrow"),
         ib.map_batches(_tag("r"), batch_format="pyarrow")],
        dict(base_fields, __b=pa.int64(), __side=pa.string()),
    )
    both = both.map_batches(_add_part([key, "__b"], n_parts), batch_format="pyarrow")
    return both.groupby("__p").map_groups(arrow_out(join_part), batch_format="pandas")


class _BroadcastRangeJoiner:
    """Per-batch resolver for the broadcast range join: the interval
    table (provably small) is pre-sorted by (key, start) driver-side;
    every left batch finds its covering intervals with two vectorized
    ``searchsorted`` probes per key segment — candidates are bounded by
    the segment's max interval length, then the end bound filters
    exactly. Ships in the task closure (stateless after __init__), so
    the stage fuses with the read: ZERO shuffle, no pair emitted twice
    (each left row is processed exactly once)."""

    def __init__(self, intervals: pa.Table, key: str, ts: str, start: str,
                 end: str, suffix: str, left_names: list[str],
                 closed_start: bool, closed_end: bool):
        import pandas as pd

        self.key, self.ts = key, ts
        self.closed_start, self.closed_end = closed_start, closed_end
        self.icols = [c for c in intervals.column_names if c != key]
        self.out_names = {c: (c + suffix if c in left_names else c)
                          for c in self.icols}
        s = pc.cast(pc.cast(intervals[start], pa.timestamp("us")), pa.int64())
        e = pc.cast(pc.cast(intervals[end], pa.timestamp("us")), pa.int64())
        nonempty = pc.greater_equal(e, s) if closed_end else pc.greater(e, s)
        valid = pc.and_kleene(
            pc.and_kleene(pc.is_valid(intervals[key]), nonempty),
            pc.and_kleene(pc.is_valid(s), pc.is_valid(e)))
        intervals = intervals.filter(pc.fill_null(valid, False))
        order = pc.sort_indices(
            pa.table({"k": intervals[key],
                      "s": pc.cast(pc.cast(intervals[start],
                                           pa.timestamp("us")), pa.int64())}),
            sort_keys=[("k", "ascending"), ("s", "ascending")])
        self.itable = intervals.take(order).combine_chunks()
        self.starts = pc.cast(pc.cast(self.itable[start], pa.timestamp("us")),
                              pa.int64()).to_numpy()
        self.ends = pc.cast(pc.cast(self.itable[end], pa.timestamp("us")),
                            pa.int64()).to_numpy()
        kv = self.itable[key].to_pandas()
        self.segments: dict = {}
        if len(kv):
            grp = pd.RangeIndex(len(kv)).to_series().groupby(kv.values)
            for k, idx in grp.groups.items():
                lo, hi = int(idx[0]), int(idx[-1]) + 1
                mx = int((self.ends[lo:hi] - self.starts[lo:hi]).max())
                self.segments[k] = (lo, hi, mx)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        tsv = pc.cast(pc.cast(t[self.ts], pa.timestamp("us")),
                      pa.int64()).to_numpy(zero_copy_only=False)
        kv = t[self.key].to_pandas()
        row_parts, cand_parts = [], []
        if len(kv):
            grp = pd.RangeIndex(len(kv)).to_series().groupby(kv.values)
            for k, idx in grp.groups.items():
                seg = self.segments.get(k)
                if seg is None:
                    continue
                lo_s, hi_s, mx = seg
                rows = np.asarray(idx, dtype=np.int64)
                tk = tsv[rows]
                seg_starts = self.starts[lo_s:hi_s]
                # start bound: closed → start ≤ ts; open → start < ts
                hi = np.searchsorted(
                    seg_starts, tk, side="right" if self.closed_start else "left")
                # any qualifying interval has start ≥ ts − max_len
                lo = np.searchsorted(seg_starts, tk - mx, side="left")
                cnt = (hi - lo).clip(min=0)
                total = int(cnt.sum())
                if total == 0:
                    continue
                rep = np.repeat(np.arange(len(rows)), cnt)
                intra = np.arange(total, dtype=np.int64) - \
                    np.repeat(np.cumsum(cnt) - cnt, cnt)
                cand = np.repeat(lo, cnt) + intra + lo_s
                ends = self.ends[cand]
                tt = tk[rep]
                keep = (ends >= tt) if self.closed_end else (ends > tt)
                row_parts.append(rows[rep[keep]])
                cand_parts.append(cand[keep])
        if row_parts:
            row_idx = np.concatenate(row_parts)
            cand_idx = np.concatenate(cand_parts)
        else:
            row_idx = np.empty(0, dtype=np.int64)
            cand_idx = np.empty(0, dtype=np.int64)
        cols, names = [], []
        for c in t.column_names:
            names.append(c)
            cols.append(t[c].take(pa.array(row_idx)))
        for c in self.icols:
            names.append(self.out_names[c])
            cols.append(self.itable[c].take(pa.array(cand_idx)))
        return pa.table(dict(zip(names, cols)))


def gated_range_join(left, intervals, key: str, ts: str, start: str,
                     end: str, bucket_width_s: int, suffix: str = "_r",
                     closed_start: bool = True, closed_end: bool = False,
                     threshold: int | None = None,
                     num_partitions: int | None = None):
    """Range join that broadcasts the interval side when it is provably
    small, else falls back to the (key, bucket) exchange of
    ``range_join`` — the range-join sibling of ``gated_broadcast_join``.

    The interval side is materialized ONCE to learn its row count (the
    exchange path would execute that lineage anyway); at or under the
    threshold the sorted interval arrays ship in the task closure and
    the join fuses with the left read (zero shuffle — at sf0.1 this
    cuts the all-to-all sort that dominated the exchange path). Above
    it, nothing is driver-resident and the hash exchange runs."""
    import ray

    thr = BROADCAST_ROWS_THRESHOLD if threshold is None else threshold
    mat = intervals if _rows_estimate(intervals) is not None \
        else intervals.materialize()
    n = _rows_estimate(mat)
    if n is not None and n <= thr:
        parts = [pa.table(b) for b in mat.iter_batches(batch_format="pyarrow")]
        if parts:
            tbl = pa.concat_tables(parts)
        else:
            s = mat.schema()
            tbl = pa.schema([(nm, _pa_type(tp))
                             for nm, tp in zip(s.names, s.types)]).empty_table()
        joiner = _BroadcastRangeJoiner(
            tbl, key, ts, start, end, suffix, list(left.schema().names),
            closed_start, closed_end)
        return left.map_batches(joiner, batch_format="pyarrow")
    return range_join(left, mat, key, ts, start, end, bucket_width_s,
                      suffix=suffix, closed_start=closed_start,
                      closed_end=closed_end, num_partitions=num_partitions)


# ------------------------------------------------------------------ bloom

_B1 = np.uint64(0x9E3779B97F4A7C15)
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing (Kirsch–Mitzenmacher):
    pos_i = (h1 + i·h2) mod m, all uint64 vectorized."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = x * _B1
        h2 = (x * _B2) | np.uint64(1)
        return np.stack(
            [(h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(k)],
            axis=1,
        )


def bloom_filter_build(ds, col: str, m_bits: int = 1 << 20, k: int = 4) -> bytes:
    """Build a Bloom filter of a column's values: each block reduces to
    one m/8-byte bitmap partial; partials OR together on the driver in
    a constant-memory stream (one bitmap resident at a time). The
    bitmap is what you broadcast when the key SET itself is too big to
    ship — filter size is fixed regardless of key count."""
    nbytes = m_bits // 8

    def partial(t: pa.Table) -> pa.Table:
        keys = t[col].to_numpy(zero_copy_only=False)
        bm = np.zeros(nbytes, dtype=np.uint8)
        if len(keys):
            pos = _bloom_positions(keys, m_bits, k).ravel()
            np.bitwise_or.at(bm, (pos // 8).astype(np.int64),
                             np.left_shift(1, (pos % 8).astype(np.int64)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    acc = np.zeros(nbytes, dtype=np.uint8)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for buf in batch["bm"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint8)
    return acc.tobytes()


def bloom_prefilter(ds, col: str, bloom_ref, m_bits: int = 1 << 20, k: int = 4,
                    concurrency=4):
    """Drop rows whose key is definitely NOT in the Bloom filter (no
    false negatives — survivors are a superset of true matches, so an
    exact join downstream stays exact while its shuffle input shrinks).
    The bitmap resolves from the object store once per actor; the probe
    is one gather + bit-test per hash, whole-batch."""

    class Probe:
        def __init__(self):
            import ray

            b = bloom_ref if isinstance(bloom_ref, (bytes, bytearray)) else ray.get(bloom_ref)
            self.bm = np.frombuffer(b, dtype=np.uint8)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t[col].to_numpy(zero_copy_only=False)
            if not len(keys):
                return t
            pos = _bloom_positions(keys, m_bits, k)
            bits = (self.bm[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            return t.filter(pa.array(bits.all(axis=1)))

    from .base import norm_concurrency

    if m_bits <= (1 << 24):  # ≤2 MiB bitmap → task closure, full width
        return ds.map_batches(Probe(), batch_format="pyarrow")
    return ds.map_batches(Probe, batch_format="pyarrow",
                          concurrency=norm_concurrency(concurrency))


def snapshot_diff(left, right, key: str, cmp_cols: list[str],
                  group_col: str | None = None,
                  num_partitions: int | None = None):
    """Snapshot diff audit (the table-versioning "what changed between
    v1 and v2" report): classify every key as added (right only),
    removed (left only), changed (both sides, any ``cmp_cols``
    differs) or unchanged, and roll counts up per ``group_col``.

    One key-hash exchange of the tagged union (only key + compared
    columns move), vectorized per-partition classify (sort + adjacent
    compare — a key appears at most once per side per snapshot),
    compact (group, category, n) partials. Assumes ``key`` is unique
    within each snapshot — the uniqueness expectation in
    stages/expectations.py is the companion check."""
    lschema = left.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    wanted = [key] + ([group_col] if group_col else []) + list(cmp_cols)
    base_fields = {c: _pa_type(ltypes[c]) for c in wanted}
    n_parts = num_partitions or _derive_partitions(left, right, 500_000)

    both = _align_union([
        left.map_batches(_tag("l"), batch_format="pyarrow"),
        right.map_batches(_tag("r"), batch_format="pyarrow"),
    ], dict(base_fields, __side=pa.string()))
    both = both.map_batches(_add_part([key], n_parts), batch_format="pyarrow")

    gcols = [group_col] if group_col else []

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].set_index(key)
        r = g[g["__side"] == "r"].set_index(key)
        common = l.index.intersection(r.index)
        changed = pd.Series(False, index=common)
        for c in cmp_cols:
            lv, rv = l.loc[common, c], r.loc[common, c]
            changed |= (lv != rv) & ~(lv.isna() & rv.isna())
        rows = []
        def emit(idx_side, cat, idx):
            if group_col:
                grp = idx_side.loc[idx, group_col]
                cnt = grp.groupby(grp).size()
                rows.extend((gv, cat, int(n)) for gv, n in cnt.items())
            else:
                rows.append((cat, int(len(idx))))
        emit(r, "added", r.index.difference(l.index))
        emit(l, "removed", l.index.difference(r.index))
        emit(r, "changed", common[changed.to_numpy()])
        emit(r, "unchanged", common[~changed.to_numpy()])
        cols = gcols + ["category", "n"]
        return pd.DataFrame(rows, columns=cols)

    from .agg import compact_groupby

    per_part = both.groupby("__p").map_groups(classify,
                                              batch_format="pandas")
    return compact_groupby(per_part, gcols + ["category"],
                           sum_cols={"n": "n"})


def interval_overlap_join(left, right, start: str, end: str,
                          bucket_width_s: int, key: str | None = None,
                          suffix: str = "_r",
                          num_partitions: int | None = None):
    """Interval × interval overlap join: one output row per (left,
    right) pair with ``max(starts) ≤ min(ends)`` (closed-closed
    overlap) and equal ``key`` (or globally when ``key=None``) — the
    shape ``range_join`` cannot express because BOTH sides are
    intervals. Each side replicates into every time bucket it overlaps
    (factor len/width + 1 — pick ``bucket_width_s`` ≈ the max interval
    length), ONE hash exchange on (key, bucket) co-locates all
    candidates, and a pair is emitted ONLY in its canonical bucket —
    the bucket containing ``max(s_l, s_r)``, an instant both intervals
    span, so exactly one replica pair survives with NO distinct pass
    (downstream aggregates roll up directly). Partitioning assumption:
    one (key, bucket) cell fits a worker, same contract as range_join/
    asof_join."""
    k = key or "__k"
    width_us = int(bucket_width_s) * 1_000_000
    n_parts = num_partitions or _derive_partitions(left, right, 500_000)

    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    ren = {c: (c + suffix if c in lcols else c)
           for c in rschema.names if c != key}
    rstart, rend = ren.get(start, start), ren.get(end, end)

    def add_const(t: pa.Table) -> pa.Table:
        return t.append_column(k, pa.array(
            np.zeros(t.num_rows, np.int64)))

    def rename_right(t: pa.Table) -> pa.Table:
        return t.rename_columns([ren.get(c, c) for c in t.column_names])

    lb = left
    rb = right.map_batches(rename_right, batch_format="pyarrow")
    if key is None:
        lb = lb.map_batches(add_const, batch_format="pyarrow")
        rb = rb.map_batches(add_const, batch_format="pyarrow")
    lb = lb.map_batches(
        _replicate_intervals(k, start, end, width_us, closed_end=True),
        batch_format="pyarrow")
    rb = rb.map_batches(
        _replicate_intervals(k, rstart, rend, width_us, closed_end=True),
        batch_format="pyarrow")

    base_fields: dict = {}
    for s in (lschema,):
        for name, typ in zip(s.names, s.types):
            base_fields.setdefault(name, _pa_type(typ))
    for name, typ in zip(rschema.names, rschema.types):
        base_fields.setdefault(ren.get(name, name), _pa_type(typ))
    if key is None:
        base_fields[k] = pa.int64()

    out_l = [c for c in lcols]
    out_r = [ren.get(c, c) for c in rschema.names if c != key]

    def _us(col) -> np.ndarray:
        v = col.to_numpy()
        if v.dtype.kind == "M":
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == "l", list(dict.fromkeys(
            out_l + [k, "__b"]))]
        r = g.loc[g["__side"] == "r", list(dict.fromkeys(
            out_r + [k, "__b"]))]
        m = l.merge(r, on=[k, "__b"])
        if len(m) == 0:
            return m[out_l + out_r]
        s_l, e_l = _us(m[start]), _us(m[end])
        s_r, e_r = _us(m[rstart]), _us(m[rend])
        smax = np.maximum(s_l, s_r)
        keep = (smax <= np.minimum(e_l, e_r)) & \
               (smax // width_us == m["__b"].to_numpy().astype(np.int64))
        return m.loc[keep, out_l + out_r]

    both = _align_union(
        [lb.map_batches(_tag("l"), batch_format="pyarrow"),
         rb.map_batches(_tag("r"), batch_format="pyarrow")],
        dict(base_fields, __b=pa.int64(), __side=pa.string()),
    )
    both = both.map_batches(_add_part([k, "__b"], n_parts),
                            batch_format="pyarrow")
    return both.groupby("__p").map_groups(arrow_out(join_part), batch_format="pandas")
