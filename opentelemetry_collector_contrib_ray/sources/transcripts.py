"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Schema = BASELINE.json input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
 ts:timestamp[us]).

Design for scale: generation is *index-addressable* — ``_gen_range(a, b)``
produces rows [a, b) of the global table from nothing but the row index,
a seed, and a small per-conversation size table, so shards can be
generated in parallel with ``ray.data.range(n).map_batches`` and the
result is byte-identical regardless of parallelism. Mirrors the
reference's synthetic load generator
(/root/reference/pkg/stanza/operator/input/generate/config.go:14 and
testbed LoadGenerator) but deterministic.

Text template mix (per-row hash, FIXTURES.md §1):
  55% prose | 20% log-line "LEVEL latency_ms=N status=M msg=..." |
  10% JSON | 10% key=value | 5% malformed/empty.
conv sizes are Zipf-skewed with 2 designated hot conversations holding
~5% of rows each (skew / salting tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_SCHEMA

_LEVELS = np.array(["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"])
# cumulative weights out of 64: INFO-heavy, like real logs
_LEVEL_CUM = np.array([4, 14, 44, 54, 62, 64])
_STATUS = np.array([200, 201, 204, 301, 400, 404, 500, 503], dtype=np.int64)
_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "code_exec", "browser", "db_query", "calculator"])
_EVENTS = np.array(["click", "retry", "timeout", "cache_hit", "fallback"])
_MALFORMED = np.array(["", "{broken json", "latency_ms=", "%%%%", "???==???"])

_VOCAB = (
    "the quick brown agent ran a tool call and returned results for the user "
    "model context window tokens stream batch shuffle partition arrow vector "
    "please summarize this document carefully noting all key figures and dates"
).split()


def _prose_pool(seed: int) -> np.ndarray:
    """256 deterministic prose sentences (pooled: parse-irrelevant content)."""
    rng = np.random.Generator(np.random.PCG64(seed ^ 0x9E3779B9))
    pool = []
    for _ in range(256):
        n = int(rng.integers(5, 14))
        idx = rng.integers(0, len(_VOCAB), n)
        pool.append(" ".join(_VOCAB[i] for i in idx))
    return np.array(pool)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — cheap vectorized per-row hash."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def conv_sizes(n_rows: int, n_convs: int, seed: int = 42) -> np.ndarray:
    """Deterministic per-conversation row counts, Zipf-ish + 2 hot convs."""
    n_convs = max(3, min(n_convs, n_rows))
    rng = np.random.Generator(np.random.PCG64(seed))
    hot = max(1, int(0.05 * n_rows))
    rest = n_rows - 2 * hot
    k = n_convs - 2
    p = 1.0 / np.power(np.arange(1, k + 1), 0.8)
    p /= p.sum()
    sizes = rng.multinomial(rest, p)
    out = np.concatenate([[hot, hot], sizes]).astype(np.int64)
    assert out.sum() == n_rows
    return out


def _gen_range(a: int, b: int, starts: np.ndarray, seed: int) -> pa.Table:
    """Rows [a, b) of the global transcript table. ``starts`` = cumsum(sizes)
    exclusive-prefix (starts[i] = first global row of conversation i)."""
    n = b - a
    gidx = np.arange(a, b, dtype=np.int64)
    conv = np.searchsorted(starts, gidx, side="right") - 1
    turn = (gidx - starts[conv]).astype(np.int32)
    h = _mix64(gidx.astype(np.uint64) + np.uint64(seed) * np.uint64(0x100000001B3))

    # role: 40/40/5/15 (FIXTURES §1)
    r = (h % np.uint64(100)).astype(np.int64)
    role_i = np.select([r < 40, r < 80, r < 85], [0, 1, 2], default=3)
    role = _ROLES[role_i]

    # tool: tools mostly when role == "tool"
    h2 = _mix64(h)
    tool = np.where(
        (role_i == 3) | ((h2 % np.uint64(50)) == 0),
        _TOOLS[(h2 % np.uint64(len(_TOOLS))).astype(np.int64)],
        "",
    )

    # ts: strictly increasing within a conversation
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = (
        base
        + conv * 3_600_000_000
        + turn.astype(np.int64) * 1_000_000
        + (h % np.uint64(999_999)).astype(np.int64)
    )

    # text templates — assembled with Arrow C++ string kernels (numpy
    # U-dtype concat is memory-bandwidth-bound and kills parallel gen)
    import pyarrow.compute as pc

    h3 = _mix64(h2)
    bucket = (h3 % np.uint64(100)).astype(np.int64)
    lat = pc.cast(pa.array((h3 % np.uint64(2000)).astype(np.int64)), pa.string())
    status = pc.cast(
        pa.array(_STATUS[(h2 % np.uint64(len(_STATUS))).astype(np.int64)]), pa.string()
    )
    lvl = pa.array(
        _LEVELS[np.searchsorted(_LEVEL_CUM, (h % np.uint64(64)).astype(np.int64), side="right")]
    )
    evt = pa.array(_EVENTS[(h3 % np.uint64(len(_EVENTS))).astype(np.int64)])
    word = pa.array(np.array(_VOCAB)[(h3 % np.uint64(len(_VOCAB))).astype(np.int64)])

    prose = pa.array(
        _PROSE_POOLS.setdefault(seed, _prose_pool(seed))[(h3 % np.uint64(256)).astype(np.int64)]
    )
    j = pc.binary_join_element_wise
    logline = j(lvl, " latency_ms=", lat, " status=", status, " msg=", word, "")
    jsons = j('{"event": "', evt, '", "latency_ms": ', lat, ', "tags": ["a", "b"]}', "")
    kv = j("latency_ms=", lat, " status=", status, " region=", word, "")
    bad = pa.array(_MALFORMED[(h3 % np.uint64(len(_MALFORMED))).astype(np.int64)])
    text = pc.if_else(
        pa.array(bucket < 55), prose,
        pc.if_else(
            pa.array(bucket < 75), logline,
            pc.if_else(
                pa.array(bucket < 85), jsons,
                pc.if_else(pa.array(bucket < 95), kv, bad),
            ),
        ),
    )

    conv_id = j(
        "conv-",
        pc.utf8_lpad(pc.cast(pa.array(conv), pa.string()), width=8, padding="0"),
        "",
    )
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(role),
            "text": text,
            "tool": pa.array(tool),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


_PROSE_POOLS: dict[int, np.ndarray] = {}


def generate_transcripts(n_rows: int, n_convs: int | None = None, seed: int = 42) -> pa.Table:
    """Whole table in one vectorized shot (driver-side; use for <~5M rows)."""
    n_convs = n_convs or max(3, n_rows // 30)
    sizes = conv_sizes(n_rows, n_convs, seed)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    return _gen_range(0, n_rows, starts, seed)


def transcripts_dataset(n_rows: int, n_convs: int | None = None, seed: int = 42,
                        shard_rows: int = 250_000):
    """Parallel generation as a Ray Dataset — each shard built independently
    from its index range; byte-identical to ``generate_transcripts``."""
    import ray.data as rd

    n_convs = n_convs or max(3, n_rows // 30)
    sizes = conv_sizes(n_rows, n_convs, seed)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    n_shards = max(1, (n_rows + shard_rows - 1) // shard_rows)

    def gen_shard(batch: pa.Table) -> pa.Table:
        out = []
        for sid in batch["id"].to_pylist():
            lo = sid * shard_rows
            hi = min(n_rows, lo + shard_rows)
            out.append(_gen_range(lo, hi, starts, seed))
        return pa.concat_tables(out)

    return rd.range(n_shards, override_num_blocks=n_shards).map_batches(
        gen_shard, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
    )


def rows_for_sf(sf_dir: str) -> int:
    """Transcript rows for a testdata scale-factor dir: 30M × sf (large
    enough at sf0.1 that per-execution startup overhead amortizes and
    the streaming executor gets full block parallelism)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "") or 0.001) if name.startswith("sf") else 0.001
    return max(2000, int(sf * 300_000_000))


def ensure_transcripts_parquet(n_rows: int, seed: int = 42,
                               root: str = "/tmp/otelray/transcripts",
                               shard: int = 250_000) -> str:
    """Generate-once cache: write the table to a deterministic path and
    return it. Sharded files so Ray reads get natural partitions.
    Uses parallel Ray generation when a session is up and the table is
    big; falls back to driver-side numpy."""
    path = os.path.join(root, f"n{n_rows}_s{seed}")
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    use_ray = n_rows >= 1_000_000
    if use_ray:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:  # pragma: no cover
            use_ray = False
    if use_ray:
        ds = transcripts_dataset(n_rows, seed=seed, shard_rows=shard)
        ds.write_parquet(path)
    else:
        n_convs = max(3, n_rows // 30)
        sizes = conv_sizes(n_rows, n_convs, seed)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        for i, lo in enumerate(range(0, n_rows, shard)):
            t = _gen_range(lo, min(n_rows, lo + shard), starts, seed)
            pq.write_table(t, os.path.join(path, f"part-{i:05d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return path
