"""Runtime-compiled libjpeg shim loader (the `functions/_native.py` pattern
applied to media decode): compile `_jpegshim.c` with ``cc -O2 -shared
-ljpeg`` into a per-user temp cache, load via ctypes, expose
``decode(payload) -> np.ndarray`` / ``encode(arr, quality, subsample) ->
bytes``. Any failure — no compiler, no libjpeg, zip-resident source not
readable — degrades to ``available() == False`` and callers fall back to
the pure-numpy baseline codec (`media_jpeg`).

Like the string-distance kernel, the .so is built once per source hash and
raced atomically by concurrent executor workers; set
``CAPELINKER_NO_NATIVE=1`` to force the pure-Python paths everywhere.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_jpegshim.c")
_LIB = None
_TRIED = False


def _read_src() -> bytes | None:
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        pass
    path = _SRC
    parts: list[str] = []
    while path and path != os.path.dirname(path):
        if os.path.isfile(path):
            try:
                import zipfile

                with zipfile.ZipFile(path) as z:
                    return z.read("/".join(parts))
            except Exception:
                return None
        path, tail = os.path.split(path)
        parts.insert(0, tail)
    return None


def _build() -> str | None:
    src = _read_src()
    if src is None:
        return None
    tag = hashlib.md5(src).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(), f"capelinker_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"jpegshim_{tag}.so")
    if not os.path.exists(so):
        csrc = os.path.join(cache, f"jpegshim_{tag}.c")
        if not os.path.exists(csrc):
            ctmp = csrc + f".tmp{os.getpid()}"
            with open(ctmp, "wb") as f:
                f.write(src)
            os.replace(ctmp, csrc)
        tmp = so + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["cc", "-O2", "-fPIC", "-shared", "-o", tmp, csrc, "-ljpeg"],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so)
        except Exception:
            return None
    return so


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CAPELINKER_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_probe.argtypes = [u8p, ctypes.c_long, i32p, i32p, i32p]
        lib.jpeg_probe.restype = ctypes.c_int
        lib.jpeg_decode.argtypes = [u8p, ctypes.c_long, u8p, ctypes.c_long]
        lib.jpeg_decode.restype = ctypes.c_int
        lib.jpeg_encode.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_long,
        ]
        lib.jpeg_encode.restype = ctypes.c_long
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_u8p(buf) -> ctypes.POINTER(ctypes.c_ubyte):
    return ctypes.cast(
        (ctypes.c_ubyte * len(buf)).from_buffer_copy(buf),
        ctypes.POINTER(ctypes.c_ubyte),
    )


def decode(payload: bytes) -> np.ndarray | None:
    """JPEG bytes → (H, W, C) uint8 via libjpeg; None when the shim is
    unavailable. Raises ValueError on corrupt payloads."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    src = _as_u8p(payload)
    if lib.jpeg_probe(src, len(payload), ctypes.byref(w),
                      ctypes.byref(h), ctypes.byref(ch)) != 0:
        raise ValueError("libjpeg: corrupt or unsupported JPEG")
    out = np.empty(h.value * w.value * ch.value, dtype=np.uint8)
    if lib.jpeg_decode(
        src, len(payload),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), out.size,
    ) != 0:
        raise ValueError("libjpeg: decode failed")
    return out.reshape(h.value, w.value, ch.value)


def encode(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes | None:
    """(H, W[, C]) uint8 → JPEG bytes via libjpeg; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    pix = np.ascontiguousarray(arr, dtype=np.uint8)
    cap = h * w * ch + 65536
    out = np.empty(cap, dtype=np.uint8)
    n = lib.jpeg_encode(
        pix.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h, ch,
        int(quality), 1 if subsample else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), cap,
    )
    if n < 0:
        raise ValueError("libjpeg: encode failed")
    return bytes(out[:n])
