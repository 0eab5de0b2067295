"""Native data-loader runtime (C++/libjpeg) with ctypes binding.

``native_available()`` is True once ``libwut_loader.so`` is built
(``make -C weather_unet_tpu/runtime``; ``build()`` does it from Python).
``decode_batch(paths, out_size)`` decodes + resizes a batch of JPEGs in C++
threads with the GIL released — the host-side feeding path for the TPU input
pipeline.  Falls back transparently to the PIL path in ``data/datasets.py``
when the library isn't built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwut_loader.so")
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in place.  Returns success."""
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=quiet)
        return load() is not None
    except Exception:
        return False


def load():
    """Load (and cache) the shared library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.wut_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_uint8)]
    lib.wut_decode_file.restype = ctypes.c_int
    lib.wut_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.wut_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return load() is not None


def decode_file(path: str, out_size: int) -> Optional[np.ndarray]:
    """Decode one JPEG to (out_size, out_size, 3) uint8; None on failure."""
    lib = load()
    if lib is None:
        return None
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.wut_decode_file(
        path.encode(), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode_batch(paths: Sequence[str], out_size: int,
                 n_threads: int = 0) -> Tuple[np.ndarray, List[bool]]:
    """Decode a batch in parallel C++ threads.

    Returns ``(batch_u8 (N, S, S, 3), ok_flags)``; failed slots are
    zero-filled with ``ok=False``.
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native loader not built; run runtime.build()")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    ok = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.wut_decode_batch(
        arr, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return out, [bool(r == 0) for r in ok]
