"""Dependency-free media codecs (pure numpy byte parsing).

The container has no PIL/ffmpeg/librosa, but several classic formats
are simple enough to parse directly — making the multimodal decode
path REAL for those formats instead of fake-only:

- BMP  (24-bit uncompressed BI_RGB, the baseline Windows bitmap)
- PPM  (P6 binary RGB, maxval 255 — the netpbm interchange format)
- WAV  (RIFF PCM, 8-bit unsigned / 16-bit signed, any channel count)

Encoders for the same formats exist so tests and the synthetic media
table can produce REAL payloads with known pixel/sample values
(golden-value checks decode what was encoded, byte for byte).

Compressed formats (PNG/JPEG/MP3/H.264) stay behind the explicit
``codec=`` injection point / ``fake=True`` stubs in multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- BMP


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 → 24-bit bottom-up BI_RGB BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixel_bytes = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_bytes), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes),
                       2835, 2835, 0, 0)
    return header + info + pixel_bytes


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → HxWx3 RGB uint8 (top-down)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={comp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return np.ascontiguousarray(rows if top_down else rows[::-1])


# --------------------------------------------------------------------- PPM


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 RGB uint8 → binary P6 PPM bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM bytes (maxval ≤ 255, # comments allowed) → HxWx3
    RGB uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, # comments skipped
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def decode_image(data: bytes, width=None, height=None) -> np.ndarray:
    """Magic-byte sniffing image decode: BMP or P6 PPM → HxWx3 RGB.
    (``width``/``height`` hints from metadata are ignored — the real
    geometry comes from the payload; the shared codec signature keeps
    it swappable with the fake decoder.) Other formats raise."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise NotImplementedError(
        "only BMP/P6 payloads decodable without codec libraries; "
        "pass codec= for other formats"
    )


# --------------------------------------------------------------------- WAV


def encode_wav(wave: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float mono waveform in [-1, 1] → RIFF PCM WAV bytes."""
    w = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    if bits == 16:
        frames = (w * 32767.0).round().astype("<i2").tobytes()
    elif bits == 8:
        frames = ((w * 127.0).round() + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    byte_rate = sample_rate * bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, bits // 8, bits)
    data = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV bytes → (float32 mono waveform in [-1, 1],
    sample_rate). 8-bit unsigned and 16-bit signed PCM; multi-channel
    is averaged to mono."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format={audio_format})")
    if bits == 16:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32), sample_rate


def decode_audio(data: bytes, sample_rate=None, duration_ms=None) -> np.ndarray:
    """Codec-signature adapter: WAV payload → float32 mono waveform
    (metadata hints ignored; real values come from the payload).
    Non-RIFF payloads raise NotImplementedError, mirroring
    ``decode_image``'s contract for formats needing external codecs."""
    if data[:4] != b"RIFF":
        raise NotImplementedError(
            "only RIFF/WAV payloads decodable without codec libraries; "
            "pass codec= for other formats"
        )
    wave, _sr = decode_wav(data)
    return wave


def encode_rawv(frames: "np.ndarray") -> bytes:
    """Minimal raw-video container (this repo's video test format, the
    moral equivalent of BMP/PPM for stills): magic b'RAWV', then
    uint16-LE width, height, n_frames, then n_frames dense RGB frames
    row-major — every byte at a computable offset, so a SQL blob
    oracle can re-decode it independently."""
    import numpy as np
    import struct

    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    if c != 3:
        raise ValueError("RAWV frames must be (n, h, w, 3)")
    return b"RAWV" + struct.pack("<HHH", w, h, n) + f.tobytes()


def decode_rawv(data: bytes) -> "np.ndarray":
    """RAWV → (n_frames, h, w, 3) uint8. Raises on bad magic/length —
    real codec behavior, not a stub."""
    import numpy as np
    import struct

    if data[:4] != b"RAWV":
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack_from("<HHH", data, 4)
    need = 10 + n * h * w * 3
    if len(data) < need:
        raise ValueError("truncated RAWV payload")
    return np.frombuffer(data, np.uint8, n * h * w * 3, 10).reshape(n, h, w, 3)
