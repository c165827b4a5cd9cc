"""Native host-side components (C++ via ctypes, no pybind11).

``decode_batch`` — multithreaded JPEG decode + bilinear resize backed by
``decode.cpp`` (libjpeg + std::thread). Built on first use with g++ and
cached next to the source; falls back cleanly when a toolchain or
libjpeg is unavailable (``available()`` reports the outcome) — callers
(data/dataset.py) then use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cpp")
_SO = os.path.join(_DIR, "libsurya_decode.so")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-ljpeg", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        src_mtime = (os.path.getmtime(_SRC) if os.path.exists(_SRC)
                     else 0.0)  # source stripped post-build: keep .so
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.surya_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.surya_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_batch(paths: list[str], out_size: int,
                 n_threads: int = 0) -> tuple[np.ndarray, int]:
    """Decode+resize a list of JPEG paths → ((N, S, S, 3) uint8, n_ok).

    Failed images come back zero-filled (black), mirroring the
    reference's corrupt-input fallbacks. Releases the GIL for the whole
    batch (the work happens in C++ threads).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable "
                           "(no g++/libjpeg); use the PIL path")
    n = len(paths)
    out = np.zeros((n, out_size, out_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    n_ok = lib.surya_decode_batch(
        arr, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads)
    return out, int(n_ok)
