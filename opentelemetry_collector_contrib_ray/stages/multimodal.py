"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar metadata
columns (``media_type``, ``width``, ``height``, ``sample_rate``…).
Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.

Decode is REAL for the formats parseable without codec libraries —
BMP / P6-PPM images and RIFF PCM WAV audio (``stages/codecs.py``, pure
numpy byte parsing; the default codec sniffs magic bytes). Compressed
formats (PNG/JPEG/MP3/H.264) need PIL/ffmpeg, absent in this
container: supply ``codec=`` to inject one, or ``fake=True`` for a
deterministic fake decode that exercises the full Ray-side plumbing
(schema, batch sizing, actor signature, output layout). Video frame
EXTRACTION stays stubbed (no container-decodable video format);
``FrameSampler`` is real sampling arithmetic over metadata.

Scale notes: binary payload batches must stay small
(``batch_size`` ≤ ~64 for MB-scale payloads) so batch × concurrency
fits worker heaps; blocks carry payloads zero-copy through the object
store; outputs (features) are small numeric columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import norm_concurrency, arrow_out

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # e.g. image/png, audio/wav
        pa.field("payload", pa.large_binary()),
        pa.field("meta.width", pa.int32()),
        pa.field("meta.height", pa.int32()),
        pa.field("meta.sample_rate", pa.int32()),
        pa.field("meta.duration_ms", pa.int32()),
    ]
)


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → tiled uint8 HxWx3."""
    b = np.frombuffer(payload or b"\0", dtype=np.uint8)
    n = max(1, int(width or 4)) * max(1, int(height or 4)) * 3
    return np.resize(b, n).reshape(max(1, int(height or 4)), max(1, int(width or 4)), 3)


class ImageDecoder:
    """Actor-pool decode stage: payload binary → pixel tensor column.

    Default codec REALLY decodes BMP / P6-PPM payloads (magic-byte
    sniffing, ``stages/codecs.decode_image``) and raises for formats
    needing external libraries; ``codec=`` injects e.g. a PIL opener,
    ``fake=True`` swaps in the deterministic fake. Decoded geometry
    REPLACES the metadata width/height (payload wins over sidecar)."""

    def __init__(self, codec=None, fake: bool = False, payload_col: str = "payload"):
        if codec is None:
            if fake:
                codec = _fake_decode_image
            else:
                from .codecs import decode_image

                codec = decode_image
        self.codec = codec
        self.payload_col = payload_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ws = t["meta.width"].to_pylist()
        hs = t["meta.height"].to_pylist()
        out = [
            self.codec(p, w, h)
            for p, w, h in zip(t[self.payload_col].to_pylist(), ws, hs)
        ]
        pixels = pa.array([a.reshape(-1) for a in out], type=pa.list_(pa.uint8()))
        heights = pa.array([a.shape[0] for a in out], type=pa.int32())
        widths = pa.array([a.shape[1] for a in out], type=pa.int32())
        t = t.drop_columns([self.payload_col, "meta.width", "meta.height"])
        t = t.append_column("meta.width", widths)
        t = t.append_column("meta.height", heights)
        return t.append_column("pixels", pixels)


class ImageResizer:
    """Nearest-neighbor resize of decoded HxWx3 pixel arrays to a fixed
    ``(out_h, out_w)`` — REAL numpy index-gather math (no codec needed:
    it runs after the decode stage on raw pixel arrays). Updates
    ``meta.width`` / ``meta.height`` so downstream stages see the new
    geometry. Per-row loop over ragged shapes is inherent (each image
    has its own dims); the gather itself is vectorized per image."""

    def __init__(self, out_h: int = 64, out_w: int = 64):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, t: pa.Table) -> pa.Table:
        ws = t["meta.width"].to_pylist()
        hs = t["meta.height"].to_pylist()
        out = []
        for px, w, h in zip(t["pixels"].to_pylist(), ws, hs):
            a = np.asarray(px, dtype=np.uint8)
            if h and w and a.size == h * w * 3:
                a = a.reshape(h, w, 3)
            else:  # malformed: best-effort blank frame
                a = np.zeros((1, 1, 3), dtype=np.uint8)
                h, w = 1, 1
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            out.append(a[yi[:, None], xi[None, :], :].reshape(-1))
        pixels = pa.array([o.tolist() for o in out], type=pa.list_(pa.uint8()))
        t = t.drop_columns(["pixels", "meta.width", "meta.height"])
        n = t.num_rows
        t = t.append_column("meta.width", pa.array([self.out_w] * n, type=pa.int32()))
        t = t.append_column("meta.height", pa.array([self.out_h] * n, type=pa.int32()))
        return t.append_column("pixels", pixels)


class ImageFeatures:
    """Feature extraction over decoded pixels: channel means/std
    (stands in for a model forward pass) — vectorized across the WHOLE
    batch: one flatten of the ragged pixel column, per-image channel
    sums via ``np.add.reduceat`` over the list offsets, std from
    E[x²]−mean² (population std, matching ``np.std``). No per-row
    loop."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = np.asarray(col.flatten(), dtype=np.float64)
        n = t.num_rows
        lens = np.diff(offs)
        ok = (lens > 0) & (lens % 3 == 0)
        # malformed rows (not a multiple of 3) feature as a zero image
        npx = np.where(ok, lens // 3, 1).astype(np.float64)
        m = np.zeros((n, 6), dtype=np.float64)
        if flat.size:
            if flat.size % 3 or not ok.all():
                # mask malformed rows out, then flatten
                keep = np.repeat(ok, lens)
                flat = flat[keep]
                lens = np.where(ok, lens, 0)
                offs = np.concatenate([[0], np.cumsum(lens)])
            px = flat.reshape(-1, 3)
            # reduceat only at NON-EMPTY rows' starts (strictly
            # increasing, all in range — indices for empty rows would
            # truncate the preceding row's range), scatter back
            nz = np.flatnonzero(lens > 0)
            if len(px) and len(nz):
                starts3 = offs[:-1][nz] // 3
                sums = np.add.reduceat(px, starts3, axis=0)
                sqs = np.add.reduceat(px * px, starts3, axis=0)
                npx_nz = npx[nz][:, None]
                mean = sums / npx_nz
                var = np.maximum(sqs / npx_nz - mean * mean, 0.0)
                m[nz, :3] = mean
                m[nz, 3:] = np.sqrt(var)
        col_out = pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), type=pa.float32()), 6
        )
        return t.drop_columns(["pixels"]).append_column("features", col_out)


class FrameSampler:
    """Video frame-sampling plumbing: payload → every-Nth fake frames.
    Real codec goes through ``codec=``; stub raises unless fake."""

    def __init__(self, every_ms: int = 1000, codec=None, fake: bool = False):
        self.every_ms = every_ms
        self.fake = fake
        self.codec = codec
        if codec is None and not fake:
            raise NotImplementedError(
                "video codec not available; construct with fake=True or codec="
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        n_frames = [
            max(1, int((d or 0) / self.every_ms))
            for d in t["meta.duration_ms"].to_pylist()
        ]
        return t.append_column("n_frames_sampled", pa.array(n_frames, type=pa.int32()))


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(rng.integers(2, 8, n).astype(np.int32)),
            "meta.height": pa.array(rng.integers(2, 8, n).astype(np.int32)),
            "meta.sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.duration_ms": pa.array(rng.integers(0, 5000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Synthetic media table whose payloads are REAL encoded files —
    alternating BMP and P6-PPM images with deterministic pixel content
    (so the decode → feature path has golden values), matching
    MEDIA_SCHEMA."""
    from .codecs import encode_bmp, encode_ppm

    rng = np.random.Generator(np.random.PCG64(seed))
    payloads, types, ws, hs = [], [], [], []
    for i in range(n):
        h = int(rng.integers(2, 9))
        w = int(rng.integers(2, 9))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if i % 2 == 0:
            payloads.append(encode_bmp(img))
            types.append("image/bmp")
        else:
            payloads.append(encode_ppm(img))
            types.append("image/x-portable-pixmap")
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(np.array(ws, dtype=np.int32)),
            "meta.height": pa.array(np.array(hs, dtype=np.int32)),
            "meta.sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_real_audio_table(n: int, seed: int = 43,
                           sample_rate: int = 8000) -> pa.Table:
    """Synthetic audio table with REAL 16-bit PCM WAV payloads
    (deterministic sine bursts), matching MEDIA_SCHEMA."""
    from .codecs import encode_wav

    rng = np.random.Generator(np.random.PCG64(seed))
    payloads, durs = [], []
    for _ in range(n):
        dur_ms = int(rng.integers(50, 300))
        freq = float(rng.uniform(100, 1000))
        tt = np.arange(int(sample_rate * dur_ms / 1000)) / sample_rate
        wave = 0.5 * np.sin(2 * np.pi * freq * tt)
        payloads.append(encode_wav(wave, sample_rate))
        durs.append(dur_ms)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["audio/wav"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.height": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
            "meta.duration_ms": pa.array(np.array(durs, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_near_dup_media_table(n_base: int = 64, n_dups: int = 32,
                               seed: int = 7) -> pa.Table:
    """Synthetic media table with PLANTED NEAR-DUPLICATES for the
    perceptual-dedup path: ``n_base`` random BMP/PPM images plus
    ``n_dups`` copies of the first bases with ≤3 single-channel ±1
    pixel perturbations — visually identical, byte-different. All
    deterministic (fixed PCG64 seed)."""
    from .codecs import encode_bmp, encode_ppm

    rng = np.random.Generator(np.random.PCG64(seed))
    imgs = []
    for _ in range(n_base):
        h = int(rng.integers(10, 17))
        w = int(rng.integers(10, 17))
        imgs.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    for i in range(n_dups):
        src = imgs[i % n_base].copy()
        for _ in range(int(rng.integers(1, 4))):
            y = int(rng.integers(0, src.shape[0]))
            x = int(rng.integers(0, src.shape[1]))
            c = int(rng.integers(0, 3))
            src[y, x, c] = np.uint8(min(254, src[y, x, c]) + 1)
        imgs.append(src)
    payloads, types, ws, hs = [], [], [], []
    for i, img in enumerate(imgs):
        if i % 2 == 0:
            payloads.append(encode_bmp(img))
            types.append("image/bmp")
        else:
            payloads.append(encode_ppm(img))
            types.append("image/x-portable-pixmap")
        hs.append(img.shape[0])
        ws.append(img.shape[1])
    n = len(imgs)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(np.array(ws, dtype=np.int32)),
            "meta.height": pa.array(np.array(hs, dtype=np.int32)),
            "meta.sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def dhash64(t: pa.Table, out: str = "dhash") -> pa.Table:
    """Perceptual difference-hash over DECODED pixels: grid-sample a
    9×8 luminance plane (integer 299/587/114 weights — exact), set bit
    ``k = y*8 + x`` when ``lum(y, x) > lum(y, x+1)``. All-integer math
    so a DuckDB twin can re-derive every hash from the payload bytes.
    The per-image loop is inherent (each image has its own geometry,
    like ImageResizer); the 72-sample gather per image is vectorized."""
    col = t["pixels"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ws = t["meta.width"].to_pylist()
    hs = t["meta.height"].to_pylist()
    ky = np.arange(8)
    kx = np.arange(9)
    hashes = np.zeros(t.num_rows, dtype=np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(8, 8)
    for i, (px, w, h) in enumerate(zip(col.to_pylist(), ws, hs)):
        a = np.asarray(px, dtype=np.int64)
        if not (h and w) or a.size != h * w * 3:
            continue
        a = a.reshape(h, w, 3)
        yi = (ky * h) // 8
        xi = (kx * w) // 9
        s = a[yi[:, None], xi[None, :], :]  # (8, 9, 3)
        lum = 299 * s[:, :, 0] + 587 * s[:, :, 1] + 114 * s[:, :, 2]
        bits = (lum[:, :8] > lum[:, 1:]).astype(np.uint64)
        hashes[i] = np.sum(bits * weights, dtype=np.uint64)
    return t.drop_columns(["pixels"]).append_column(
        out, pa.array(hashes.view(np.int64)))


def hash_band_pairs(hashed_ds, hash_col: str, max_hamming: int,
                    id_col: str = "media_id"):
    """Near-dup pairs over a 64-bit perceptual-hash column: LSH banding
    → exact hamming filter.

    Scale shape: the hash splits into ``max_hamming + 1`` disjoint bit
    bands — by pigeonhole, two hashes within ``max_hamming`` agree on
    at least one whole band, so banding has RECALL 1 while only
    (band, value, id, hash) int rows shuffle (payloads stay behind;
    same design as the SimHash prefix bucketing in stages/dedup.py).
    Candidates pair inside each band bucket, verify with one vectorized
    xor-popcount, and dedup across bands."""
    import pandas as pd

    from .base import pa_from_pandas

    n_bands = max_hamming + 1
    bounds = [round(b * 64 / n_bands) for b in range(n_bands + 1)]

    def to_bands(t: pa.Table) -> pa.Table:
        hv = t[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        parts = []
        for b in range(n_bands):
            lo, hi = bounds[b], bounds[b + 1]
            val = ((hv >> np.uint64(lo))
                   & np.uint64((1 << (hi - lo)) - 1)).astype(np.int64)
            parts.append(pa.table({
                "band": pa.array(np.full(len(ids), b, np.int64)),
                "val": pa.array(val),
                id_col: pa.array(ids.astype(np.int64)),
                hash_col: t[hash_col],
            }))
        return pa.concat_tables(parts)

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        hv = g[hash_col].to_numpy().view(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        x = hv[iu] ^ hv[ju]
        # vectorized popcount via byte LUT
        lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                            axis=1).sum(axis=1)
        ham = lut[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pa_from_pandas(pd.DataFrame({
            "id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
            "hamming": ham[keep]}))

    pairs = (
        hashed_ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band", "val"])
        .map_groups(arrow_out(bucket_pairs), batch_format="pandas")
    )

    def dedup_pairs(g: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(g.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "hamming"]])

    return pairs.groupby(["id_a", "id_b"]).map_groups(
        dedup_pairs, batch_format="pandas")


def dhash_pairs(media_ds, max_hamming: int = 6, id_col: str = "media_id",
                concurrency=2):
    """Perceptual image near-dup pairs: decode → dhash64 →
    hash_band_pairs (pigeonhole banding, recall 1)."""
    from .base import norm_concurrency

    hashed = media_ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=norm_concurrency(concurrency),
    ).map_batches(dhash64, batch_format="pyarrow")
    return hash_band_pairs(hashed, "dhash", max_hamming, id_col)


def afp64(t: pa.Table, out: str = "afp") -> pa.Table:
    """Time-domain audio fingerprint over the DECODED waveform: the
    exact int16 samples split into 65 equal frames (boundaries
    ``(j·n)//65``), frame energy = Σ sample² (int64-exact), bit
    ``k`` set when ``energy(k+1) > energy(k)`` — a 1-D dHash. No FFT,
    so a DuckDB twin can re-derive every fingerprint from the WAV
    payload bytes. Tolerant to small amplitude perturbations, sensitive
    to temporal structure."""
    col = t["waveform"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.asarray(col.offsets, dtype=np.int64)
    offs = offs - offs[0]
    flat = np.round(np.asarray(col.flatten(), dtype=np.float64)
                    * 32768.0).astype(np.int64)
    sq = flat * flat
    hashes = np.zeros(t.num_rows, dtype=np.uint64)
    w = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i in range(t.num_rows):
        s, e = offs[i], offs[i + 1]
        n = e - s
        if n < 65:
            continue
        b = s + (np.arange(66, dtype=np.int64) * n) // 65
        energy = np.add.reduceat(sq[s:e], b[:-1] - s)
        bits = (energy[1:] > energy[:-1]).astype(np.uint64)
        hashes[i] = np.sum(bits * w, dtype=np.uint64)
    return t.drop_columns(["waveform"]).append_column(
        out, pa.array(hashes.view(np.int64)))


def audio_fp_pairs(media_ds, max_hamming: int = 6, id_col: str = "media_id",
                   concurrency=2):
    """Audio near-dup pairs: WAV decode → afp64 → hash_band_pairs."""
    from .base import norm_concurrency

    hashed = media_ds.map_batches(
        AudioDecoder, batch_format="pyarrow", batch_size=64,
        concurrency=norm_concurrency(concurrency),
    ).map_batches(afp64, batch_format="pyarrow")
    return hash_band_pairs(hashed, "afp", max_hamming, id_col)


def synth_near_dup_audio_table(n_base: int = 40, n_dups: int = 24,
                               seed: int = 17, sample_rate: int = 8000) -> pa.Table:
    """WAV table with PLANTED NEAR-DUPLICATE clips: random sine bursts
    plus copies with a tiny (±1/32768) perturbation on a few samples —
    audibly identical, byte-different."""
    from .codecs import encode_wav

    rng = np.random.Generator(np.random.PCG64(seed))
    waves = []
    for _ in range(n_base):
        dur_ms = int(rng.integers(80, 250))
        freq = float(rng.uniform(100, 900))
        tt = np.arange(int(sample_rate * dur_ms / 1000)) / sample_rate
        waves.append(0.5 * np.sin(2 * np.pi * freq * tt)
                     + 0.05 * np.sin(2 * np.pi * 3.7 * freq * tt))
    for i in range(n_dups):
        src = waves[i % n_base].copy()
        for _ in range(int(rng.integers(1, 4))):
            j = int(rng.integers(0, len(src)))
            src[j] = min(1.0, src[j] + 1.0 / 32768.0)
        waves.append(src)
    payloads = [encode_wav(w, sample_rate) for w in waves]
    n = len(waves)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["audio/wav"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.height": pa.array(np.zeros(n, dtype=np.int32)),
            "meta.sample_rate": pa.array(np.full(n, sample_rate, dtype=np.int32)),
            "meta.duration_ms": pa.array(
                np.array([len(w) * 1000 // sample_rate for w in waves],
                         dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


MM_ORACLE_DIR = "/tmp/otelray/mm_oracle"


def ensure_mm_oracle_tables(dir_: str = MM_ORACLE_DIR, n_img: int = 256,
                            n_aud: int = 64) -> str:
    """Write the deterministic synthetic media/audio tables as parquet
    so the DuckDB oracle can independently re-decode the payload BYTES
    (pixel/sample values at fixed offsets via hex(payload) arithmetic)
    against this engine's codec output. Pure pyarrow (no Ray) — callable
    from ``oracle_sql()`` as well, so the files exist whichever side the
    driver runs first. Atomic + always rewritten (content is
    deterministic; rewriting keeps a stale file from an older generator
    version from poisoning the comparison)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(dir_, exist_ok=True)
    for name, tbl in (("media", synth_real_media_table(n_img)),
                      ("audio", synth_real_audio_table(n_aud)),
                      ("media_dup", synth_near_dup_media_table()),
                      ("audio_dup", synth_near_dup_audio_table()),
                      ("video", synth_real_video_table())):
        path = f"{dir_}/{name}.parquet"
        tmp = f"{path}.tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return dir_


def _ragged_checksums(col, ids, kind: str, values: np.ndarray) -> pa.Table:
    """Per-row (n_units, sum, linear-index-weighted sum) over a ragged
    list column's flattened ``values`` — one ``np.add.reduceat`` per
    statistic, no per-row loop. The weighted sum pins the exact VALUE
    ORDER (a row-flip / channel-swap / stride bug reorders values and
    shifts the weighted sum even when the plain sum survives)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = np.asarray(col.offsets, dtype=np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    n = len(lens)
    sums = np.zeros(n, dtype=np.int64)
    wsums = np.zeros(n, dtype=np.int64)
    nz = np.flatnonzero(lens > 0)
    if len(values) and len(nz):
        pos = np.arange(len(values), dtype=np.int64) - np.repeat(offs[:-1], lens) + 1
        sums[nz] = np.add.reduceat(values, offs[:-1][nz])
        wsums[nz] = np.add.reduceat(values * pos, offs[:-1][nz])
    return pa.table({
        "media_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "kind": pa.array([kind] * n),
        "n_units": pa.array(lens.astype(np.int64)),
        "sum_units": pa.array(sums),
        "wsum_units": pa.array(wsums),
    })


def pixel_checksums(t: pa.Table) -> pa.Table:
    """Decoded pixels → per-image integer checksums in (y, x, channel)
    RGB row-major order (the ImageDecoder output layout)."""
    col = t["pixels"]
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(c.flatten(), dtype=np.int64)
    return _ragged_checksums(col, t["media_id"].to_numpy(zero_copy_only=False),
                             "image", flat)


def waveform_checksums(t: pa.Table) -> pa.Table:
    """Decoded waveform → per-clip integer checksums over the EXACT
    int16 PCM samples: the float32 waveform is i/32768 with |i| ≤ 32767
    (exactly representable in float32), so round(w·32768) recovers the
    encoded sample losslessly."""
    col = t["waveform"]
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    i16 = np.round(np.asarray(c.flatten(), dtype=np.float64) * 32768.0).astype(np.int64)
    return _ragged_checksums(col, t["media_id"].to_numpy(zero_copy_only=False),
                             "audio", i16)


def silence_stats(t: pa.Table, thr: int = 3277) -> pa.Table:
    """Decoded waveform → per-clip silence profile on the EXACT int16
    samples: (n_samples, n_silent, lead_silent) where a sample is
    silent iff |i16| < ``thr`` (default 3277 ≈ −20 dBFS) and
    ``lead_silent`` is the leading silent run — the trim point a
    speech-curation pass cuts at; a fully-silent clip (the drop case)
    reads lead_silent == n_samples. All integer, no per-clip loop:
    one reduceat for the counts, one ``np.minimum.at`` scatter for
    the first-loud index."""
    col = t["waveform"]
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.asarray(c.offsets, dtype=np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    n = len(lens)
    i16 = np.round(np.asarray(c.flatten(), dtype=np.float64) * 32768.0).astype(np.int64)
    loud = np.abs(i16) >= thr
    n_silent = np.zeros(n, dtype=np.int64)
    nz = np.flatnonzero(lens > 0)
    if len(i16) and len(nz):
        n_silent[nz] = np.add.reduceat((~loud).astype(np.int64), offs[:-1][nz])
    lead = lens.astype(np.int64).copy()
    if len(i16):
        pos = np.arange(len(i16), dtype=np.int64) - np.repeat(offs[:-1], lens)
        clip = np.repeat(np.arange(n, dtype=np.int64), lens)
        li = np.flatnonzero(loud)
        if len(li):
            first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(first, clip[li], pos[li])
            has = first != np.iinfo(np.int64).max
            lead[has] = first[has]
    return pa.table({
        "media_id": pa.array(t["media_id"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)),
        "n_samples": pa.array(lens.astype(np.int64)),
        "n_silent": pa.array(n_silent),
        "lead_silent": pa.array(lead),
    })


def motion_stats(t: pa.Table) -> pa.Table:
    """Per-video motion profile over RAWV payloads — the
    static-vs-action screen of a video curation pass (a near-zero
    total L1 motion flags a still-image-as-video; the max single
    transition is the hardest cut): (n_frames, sum_motion,
    max_frame_diff) over every adjacent-frame L1 distance, as exact
    integers for the blob-SQL oracle. Same decode/loop contract as
    ``keyframe_stats``."""
    from .codecs import decode_rawv

    ids = t["media_id"].to_numpy(zero_copy_only=False)
    mids, nfs, sms, mxs = [], [], [], []
    for mid, payload in zip(ids, t["payload"].to_pylist()):
        fr = decode_rawv(payload).astype(np.int64)
        nf = fr.shape[0]
        if nf > 1:
            d = np.abs(fr[1:] - fr[:-1]).reshape(nf - 1, -1).sum(axis=1)
        else:
            d = np.zeros(0, np.int64)
        mids.append(int(mid))
        nfs.append(nf)
        sms.append(int(d.sum()))
        mxs.append(int(d.max()) if len(d) else 0)
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "n_frames": pa.array(nfs, pa.int64()),
        "sum_motion": pa.array(sms, pa.int64()),
        "max_frame_diff": pa.array(mxs, pa.int64()),
    })


def decode_pipeline(ds, fake: bool = True, concurrency: int = 2, batch_size: int = 64,
                    resize_to: tuple[int, int] | None = None):
    """payload → pixels [→ resize] → features, small batches for big
    payloads."""
    ds = ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=norm_concurrency(concurrency),
    )
    if resize_to is not None:
        ds = ds.map_batches(ImageResizer(*resize_to), batch_format="pyarrow",
                            batch_size=batch_size)
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=norm_concurrency(concurrency),
    )


def _fake_decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """Deterministic fake PCM decode: payload bytes → float32 mono wave."""
    b = np.frombuffer(payload or b"\0", dtype=np.uint8).astype(np.float32)
    n = max(8, int((sample_rate or 8000) * (duration_ms or 100) / 1000))
    return (np.resize(b, n) - 127.5) / 127.5


class AudioDecoder:
    """Actor-pool audio decode stage: payload binary → waveform column.
    Default codec REALLY decodes RIFF PCM WAV payloads
    (``stages/codecs.decode_audio``); ``codec=`` injects an external
    decoder for compressed formats, ``fake=True`` swaps in the
    deterministic fake."""

    def __init__(self, codec=None, fake: bool = False, payload_col: str = "payload",
                 max_samples: int = 16_000):
        if codec is None:
            if fake:
                codec = _fake_decode_audio
            else:
                from .codecs import decode_audio

                codec = decode_audio
        self.codec = codec
        self.payload_col = payload_col
        self.max_samples = max_samples

    def __call__(self, t: pa.Table) -> pa.Table:
        waves = [
            self.codec(p, sr, d)[: self.max_samples]
            for p, sr, d in zip(
                t[self.payload_col].to_pylist(),
                t["meta.sample_rate"].to_pylist(),
                t["meta.duration_ms"].to_pylist(),
            )
        ]
        col = pa.array([w.tolist() for w in waves], type=pa.list_(pa.float32()))
        return t.drop_columns([self.payload_col]).append_column("waveform", col)


class AudioFeatures:
    """RMS energy + zero-crossing rate per clip (stands in for a
    spectrogram/model pass) — vectorized across the batch: one flatten
    of the ragged waveform column, per-clip ``np.add.reduceat`` sums of
    squares and of sign changes (crossings at clip boundaries masked
    out). No per-row loop."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["waveform"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offs = np.asarray(col.offsets, dtype=np.int64)
        offs = offs - offs[0]
        flat = np.asarray(col.flatten(), dtype=np.float64)
        n = t.num_rows
        lens = np.diff(offs)
        rms = np.zeros(n, dtype=np.float64)
        zcr = np.zeros(n, dtype=np.float64)
        if flat.size:
            nz = np.flatnonzero(lens > 0)
            if len(nz):
                sq = np.add.reduceat(flat * flat, offs[:-1][nz])
                rms[nz] = np.sqrt(sq / lens[nz])
            if flat.size > 1:
                # ranged prefix-sums [start, end-1) per clip exclude the
                # diff positions that straddle two clips by construction
                cross = (np.diff(np.signbit(flat)) != 0).astype(np.float64)
                cs = np.concatenate([[0.0], np.cumsum(cross)])
                c = cs[np.minimum(offs[1:] - 1, flat.size - 1)] - cs[
                    np.minimum(offs[:-1], flat.size - 1)]
                zcr = np.where(lens > 1, c / np.maximum(lens - 1, 1), 0.0)
        t = t.drop_columns(["waveform"])
        t = t.append_column("rms", pa.array(rms, type=pa.float64()))
        return t.append_column("zcr", pa.array(zcr, type=pa.float64()))


def synth_real_video_table(n: int = 48, seed: int = 47) -> pa.Table:
    """Synthetic media table whose payloads are REAL RAWV videos
    (stages/codecs.py encode_rawv): deterministic per-video geometry
    (w,h ∈ [2,6], 2–9 frames) and pixel content, so the SQL blob
    oracle re-decodes the same bytes at computable offsets."""
    from .codecs import encode_rawv

    rng = np.random.Generator(np.random.PCG64(seed))
    payloads, ws, hs, nf = [], [], [], []
    for _ in range(n):
        w = int(rng.integers(2, 7)); h = int(rng.integers(2, 7))
        f = int(rng.integers(2, 10))
        frames = rng.integers(0, 256, (f, h, w, 3), dtype=np.uint8)
        payloads.append(encode_rawv(frames))
        ws.append(w); hs.append(h); nf.append(f)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media_type": pa.array(["video/rawv"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta.width": pa.array(np.array(ws, np.int32)),
            "meta.height": pa.array(np.array(hs, np.int32)),
            "meta.sample_rate": pa.array(np.zeros(n, np.int32)),
            # 1 fps: duration carries the frame count for the sampler
            "meta.duration_ms": pa.array(np.array(nf, np.int32) * 1000),
        },
        schema=MEDIA_SCHEMA,
    )


def sampled_frame_checksums(t: pa.Table, stride: int = 3) -> pa.Table:
    """Decode RAWV payloads and checksum every ``stride``-th frame's
    pixel bytes in (frame, y, x, channel) order — the frame-sampling
    feature-extraction plumbing with the same integer-checksum contract
    as pixel_checksums, so the oracle is byte-exact. Per-payload decode
    is inherent (ragged container), the arithmetic is numpy."""
    from .codecs import decode_rawv

    payloads = t["payload"].to_pylist()
    chunks, lens = [], []
    for p in payloads:
        fr = decode_rawv(p)[::stride]
        b = np.ascontiguousarray(fr).reshape(-1).astype(np.int64)
        chunks.append(b)
        lens.append(len(b))
    values = np.concatenate(chunks) if chunks else np.array([], np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    col = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                   pa.array(values, pa.int64()))
    return _ragged_checksums(col, t["media_id"].to_numpy(zero_copy_only=False),
                             "video", values)


def keyframe_stats(t: pa.Table, per_pixel_threshold: int = 85) -> pa.Table:
    """Frame-difference keyframe selection over RAWV payloads — the
    shot-boundary primitive of a video curation pipeline (a frame
    whose summed per-pixel L1 distance from its predecessor exceeds
    ``per_pixel_threshold × frame_size`` starts a new shot; frame 0
    always keys). Per video: (n_frames, n_keyframes, sum_key_diff) —
    all exact integers so the blob-SQL oracle re-derives them from the
    payload bytes.

    Runs inside map_batches (decode parallelism = block parallelism);
    the per-video numpy diff is vectorized, only the video loop is
    Python — the same contract as the other codec stages."""
    from .codecs import decode_rawv

    ids = t["media_id"].to_numpy(zero_copy_only=False)
    mids, nfs, nks, skds = [], [], [], []
    for mid, payload in zip(ids, t["payload"].to_pylist()):
        fr = decode_rawv(payload).astype(np.int64)
        nf = fr.shape[0]
        fsz = int(fr[0].size)
        if nf > 1:
            d = np.abs(fr[1:] - fr[:-1]).reshape(nf - 1, -1).sum(axis=1)
        else:
            d = np.zeros(0, np.int64)
        key = d > per_pixel_threshold * fsz
        mids.append(int(mid))
        nfs.append(nf)
        nks.append(1 + int(key.sum()))
        skds.append(int(d[key].sum()))
    return pa.table({
        "media_id": pa.array(mids, pa.int64()),
        "n_frames": pa.array(nfs, pa.int64()),
        "n_keyframes": pa.array(nks, pa.int64()),
        "sum_key_diff": pa.array(skds, pa.int64()),
    })
