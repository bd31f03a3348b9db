"""ctypes loader for the C string-distance kernels (_strdistc.c).

The pure-Python kernels in strdist.py are the semantics oracle; these C
batch kernels are the throughput path (~100× per core — the round-1 plan
audit found the interpreted JW loop was 70% of pipeline wall time). The C
code mirrors the Python float-expression order exactly, so outputs are
bit-identical (locked by tests/test_strdist.py); any compile/load failure
falls back to pure Python silently — same results, slower.

Compilation: one `cc -O2 -shared` at first import into a per-user cache
dir (gcc is present on the target fleet; workers each compile once).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_strdistc.c")
_LIB = None
_TRIED = False


def read_pkg_source(src_path: str) -> bytes | None:
    """Read a package-resident source file — including when the package is
    zip-resident (``spark-submit --py-files``: __file__ points inside the
    shipped .zip, where plain open() fails)."""
    try:
        with open(src_path, "rb") as f:
            return f.read()
    except OSError:
        pass
    # walk up until an existing FILE (the zip archive), read the remainder
    path = src_path
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


def build_shared(src_path: str, prefix: str, extra_cc_args: tuple = ()) -> str | None:
    """Compile a package C source into the per-user cache and return the
    .so path (None on any failure → caller falls back to pure Python).
    Shared by every native tier (_strdistc, _jpegshim): one md5-tagged
    build per source version; concurrent workers race safely on the
    atomic rename."""
    src = read_pkg_source(src_path)
    if src is None:
        return None
    tag = hashlib.md5(src).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(), f"capelinker_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"{prefix}_{tag}.so")
    if not os.path.exists(so):
        csrc = os.path.join(cache, f"{prefix}_{tag}.c")
        if not os.path.exists(csrc):
            ctmp = csrc + f".tmp{os.getpid()}"
            with open(ctmp, "wb") as f:
                f.write(src)
            os.replace(ctmp, csrc)
        tmp = so + f".tmp{os.getpid()}"
        try:
            subprocess.run(
                ["cc", "-O2", "-fPIC", "-shared", "-o", tmp, csrc,
                 *extra_cc_args],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so)  # atomic: concurrent workers race safely
        except Exception:
            return None
    return so


def _build() -> str | None:
    return build_shared(_SRC, "strdistc")


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
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.jw_batch.argtypes = [
            u32p, i64p, u32p, i64p, ctypes.c_int64, ctypes.c_double, f64p,
        ]
        lib.jw_batch.restype = None
        lib.osa_batch.argtypes = [
            u32p, i64p, u32p, i64p, ctypes.c_int64, ctypes.c_int, f64p,
        ]
        lib.osa_batch.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _pack(strings: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Flat UTF-32 codepoint buffer + offsets for a list of strings.

    One ''.join + one encode for the whole batch (utf-32-le of the join is
    the concatenation of the members' encodings) — no per-string Python
    beyond len()."""
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    if strings:
        np.cumsum([len(s) for s in strings], out=offs[1:])
    buf = np.frombuffer("".join(strings).encode("utf-32-le"), dtype=np.uint32)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint32)  # valid pointer for the C call
    return buf, offs


_U32P = ctypes.POINTER(ctypes.c_uint32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_F64P = ctypes.POINTER(ctypes.c_double)


def jw_batch(ss: list[str], ts: list[str], p: float) -> np.ndarray | None:
    """Jaro-Winkler distances for aligned string lists (no Nones). Returns
    None if the native library is unavailable or signals failure."""
    lib = _load()
    if lib is None:
        return None
    bs, os_ = _pack(ss)
    bt, ot = _pack(ts)
    out = np.empty(len(ss), dtype=np.float64)
    lib.jw_batch(
        bs.ctypes.data_as(_U32P), os_.ctypes.data_as(_I64P),
        bt.ctypes.data_as(_U32P), ot.ctypes.data_as(_I64P),
        len(ss), p, out.ctypes.data_as(_F64P),
    )
    if len(out) and out[0] == -1.0 and (out == -1.0).all():
        return None  # malloc failure sentinel
    return out


def osa_batch(ss: list[str], ts: list[str], normalize: bool) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    bs, os_ = _pack(ss)
    bt, ot = _pack(ts)
    out = np.empty(len(ss), dtype=np.float64)
    lib.osa_batch(
        bs.ctypes.data_as(_U32P), os_.ctypes.data_as(_I64P),
        bt.ctypes.data_as(_U32P), ot.ctypes.data_as(_I64P),
        len(ss), 1 if normalize else 0, out.ctypes.data_as(_F64P),
    )
    if len(out) and out[0] == -1.0 and (out == -1.0).all():
        return None
    return out
