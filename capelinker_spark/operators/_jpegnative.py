"""ctypes loader for the libjpeg shim (`_jpegshim.c`): compiled at runtime
through the SAME cache/zip-read/atomic-race machinery as the string-distance
kernel (``functions._native.build_shared`` — one implementation, two native
tiers), plus ``-ljpeg``. Exposes ``decode(payload) -> np.ndarray`` /
``encode(arr, quality, subsample) -> bytes``. Any failure — no compiler, no
libjpeg, zip-resident source unreadable — degrades to ``available() ==
False`` and callers fall back to the pure-numpy baseline codec
(`media_jpeg`). ``CAPELINKER_NO_NATIVE=1`` forces the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from capelinker_spark.functions._native import build_shared

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_jpegshim.c")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CAPELINKER_NO_NATIVE"):
        return None
    so = build_shared(_SRC, "jpegshim", ("-ljpeg",))
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
    if ch.value not in (1, 3):
        # tier contract: the numpy baseline raises ValueError on 4-component
        # (CMYK/YCCK) streams, so the native tier must too — otherwise
        # decode_jpeg's result shape/failure mode would depend on whether a
        # compiler+libjpeg happened to be available (round-4 advice)
        raise ValueError(
            f"unsupported JPEG component count {ch.value} (contract: 1 or 3)"
        )
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
    """(H, W[, C]) uint8 → JPEG bytes via libjpeg; None when unavailable.

    The shim returns -(needed) when the output buffer is too small (a
    high-entropy image at high quality CAN exceed its raw size — review
    finding r4), so a one-shot retry with the exact needed capacity makes
    buffer sizing a non-issue; -1 is a genuine encode error."""
    lib = _load()
    if lib is None:
        return None
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    pix = np.ascontiguousarray(arr, dtype=np.uint8)
    cap = h * w * ch + 65536
    for _ in range(2):
        out = np.empty(cap, dtype=np.uint8)
        n = lib.jpeg_encode(
            pix.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h, ch,
            int(quality), 1 if subsample else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), cap,
        )
        if n >= 0:
            return bytes(out[:n])
        if n == -1:
            raise ValueError("libjpeg: encode failed")
        cap = -n  # overflow: retry once with the exact needed size
    raise ValueError("libjpeg: encode buffer retry failed")
