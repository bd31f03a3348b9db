"""Stdlib-only media codecs for the multimodal operators.

Real, dependency-free decoders for the formats this sandbox can handle —
PNG (zlib + struct: chunk walk, inflate, per-scanline de-filter), WAV
(the ``wave`` module), and JPEG (round 4: two-tier — runtime-compiled
libjpeg C shim `_jpegnative` as the production path, pure-numpy baseline
codec `media_jpeg` as the portable reference; ``decode_jpeg`` below picks
automatically) — plus deterministic feature extractors and a
nearest-neighbor resize. These make the multimodal path genuinely run
end-to-end in this sandbox; only video remains behind the pluggable
``decode_fn`` contract (multimodal.extract_image_features) where a real
deployment injects an ffmpeg frame sampler. The pure-Python
de-filter/huffman loops are NOT the 100-TB hot path — they are the
correctness reference; at scale the same ``mapInPandas`` plumbing calls
the C-backed tier.

PNG scope (documented): 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), non-interlaced. Palette/16-bit/interlaced raise
ValueError with the reason.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per color type
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array. Stdlib only."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color} (palette?)")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = line + prev
        elif ftype == 1:  # Sub — sequential in pixel units, vector per lane
            recon = line
            for i in range(ch, stride):
                recon[i] = (int(recon[i]) + int(recon[i - ch])) & 0xFF
        elif ftype == 3:  # Average
            recon = line
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                recon[i] = (int(recon[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line
            for i in range(stride):
                a = int(recon[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[i] = (int(recon[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 → PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scanlines = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, C) uint8, tiered like the string-distance
    kernels: libjpeg shim (`_jpegnative`, runtime-compiled C — the
    production path) when available, else the pure-numpy baseline decoder
    (`media_jpeg` — the portable correctness reference, cross-validated
    against libjpeg to ±2/255 in tests)."""
    from capelinker_spark.operators import _jpegnative, media_jpeg

    out = None
    if _jpegnative.available():
        out = _jpegnative.decode(payload)
    if out is None:
        out = media_jpeg.decode_jpeg(payload)
    return out


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(H, W[, C]) uint8 → baseline JPEG bytes; libjpeg shim when
    available, numpy baseline encoder otherwise."""
    from capelinker_spark.operators import _jpegnative, media_jpeg

    if _jpegnative.available():
        try:
            out = _jpegnative.encode(arr, quality, subsample)
        except ValueError:
            out = None  # shim failure on valid input → numpy tier decides
        if out is not None:
            return out
    return media_jpeg.encode_jpeg(arr, quality, subsample)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the resize step of the
    multimodal mandate) — pure integer index math, no interpolation grid
    ambiguity across libraries."""
    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return a[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] shaped (n, channels), rate).
    PCM 8/16/32-bit via the stdlib ``wave`` module."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, ch, width, rate = (
            wf.getnframes(), wf.getnchannels(), wf.getsampwidth(), wf.getframerate(),
        )
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # unsigned
        x = (np.frombuffer(raw, dtype="u1").astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(a.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def image_feature_vector(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic per-image features: dims + per-channel mean/std +
    8-bin global luminance histogram, padded/truncated to ``dim``."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    feats = [float(h), float(w), float(ch)]
    for c in range(min(ch, 4)):
        feats.append(float(a[:, :, c].mean()) / 255.0)
        feats.append(float(a[:, :, c].std()) / 255.0)
    lum = a.mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    feats.extend((hist / max(lum.size, 1)).tolist())
    out = np.zeros(dim, dtype=np.float64)
    n = min(dim, len(feats))
    out[:n] = feats[:n]
    return out


def audio_feature_vector(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic audio features: duration, rms, zero-crossing rate and
    an 8-band magnitude-spectrum profile (rfft), padded to ``dim``."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = x.size
    feats = [n / float(rate), float(np.sqrt(np.mean(x**2))) if n else 0.0]
    if n > 1:
        feats.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))))
    else:
        feats.append(0.0)
    if n:
        mag = np.abs(np.fft.rfft(x))
        bands = np.array_split(mag, 8)
        total = mag.sum() or 1.0
        feats.extend(float(b.sum()) / total for b in bands)
    out = np.zeros(dim, dtype=np.float64)
    m = min(dim, len(feats))
    out[:m] = feats[:m]
    return out
