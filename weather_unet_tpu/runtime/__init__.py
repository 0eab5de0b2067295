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
    try:
        lib.wut_decode_file.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_uint8)]
        lib.wut_decode_file.restype = ctypes.c_int
        lib.wut_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int]
        lib.wut_decode_batch.restype = ctypes.c_int
    except AttributeError:  # .so without even the core entries: unusable
        return None
    try:
        lib.wut_decode_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.wut_decode_bytes.restype = ctypes.c_int
    except AttributeError:  # stale .so from before the bytes entry
        pass
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    try:
        lib.wut_make_affine.argtypes = [
            ctypes.c_int, ctypes.c_int, f32p, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, f32p]
        lib.wut_make_affine.restype = None
        lib.wut_augment_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_int, u8p]
        lib.wut_augment_u8.restype = ctypes.c_int
        lib.wut_decode_augment_file.argtypes = [
            ctypes.c_char_p, f32p, f32p, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, u8p]
        lib.wut_decode_augment_file.restype = ctypes.c_int
    except AttributeError:  # stale .so from before the augment entries:
        pass                # decode still works; augment_available() is False
    _lib = lib
    return _lib


def native_available() -> bool:
    return load() is not None


_AUGMENT_SYMBOLS = ("wut_make_affine", "wut_augment_u8",
                    "wut_decode_augment_file")


def augment_available() -> bool:
    """True when the built .so exports the fused-augment entry points (a
    stale pre-augment build decodes but can't augment — callers must fall
    back to the PIL ``HostAugment`` path)."""
    lib = load()
    return lib is not None and all(hasattr(lib, s) for s in _AUGMENT_SYMBOLS)


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


def decode_bytes(data: bytes, out_size: int) -> Optional[np.ndarray]:
    """Decode an in-memory JPEG (e.g. an HTTP upload) to
    (out_size, out_size, 3) uint8; None on failure or when the library (or a
    stale build without the bytes entry) is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "wut_decode_bytes"):
        return None
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.wut_decode_bytes(
        data, len(data), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def make_affine(h: int, w: int, uniforms: np.ndarray, *, degrees: float,
                resized_crop: bool, crop_scale, crop_ratio, hflip: bool,
                out_size: int) -> np.ndarray:
    """Native affine-from-uniforms (mirrors
    ``data.transforms.affine_from_uniforms``); returns a (2, 3) float32 map."""
    lib = load()
    if not augment_available():
        raise RuntimeError(
            "native augment entries unavailable (library unbuilt or a stale "
            "pre-augment .so); run runtime.build()")
    u = np.ascontiguousarray(uniforms, dtype=np.float32)
    mat = np.empty(6, dtype=np.float32)
    lib.wut_make_affine(
        h, w, u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        float(degrees), int(resized_crop), float(crop_scale[0]),
        float(crop_scale[1]), float(crop_ratio[0]), float(crop_ratio[1]),
        int(hflip), out_size,
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return mat.reshape(2, 3)


def augment_u8(image_u8: np.ndarray, mat: np.ndarray, jitter: np.ndarray,
               out_size: int) -> np.ndarray:
    """Native affine resample + color jitter of a decoded uint8 HWC image
    (host twin of the device kernel in ``data/transforms.py``)."""
    lib = load()
    if not augment_available():
        raise RuntimeError(
            "native augment entries unavailable (library unbuilt or a stale "
            "pre-augment .so); run runtime.build()")
    src = np.ascontiguousarray(image_u8, dtype=np.uint8)
    h, w, c = src.shape
    if c != 3:
        raise ValueError(f"expected HWC RGB, got shape {src.shape}")
    m = np.ascontiguousarray(mat, dtype=np.float32).reshape(6)
    j = np.ascontiguousarray(jitter, dtype=np.float32)
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.wut_augment_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        j.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"wut_augment_u8 failed rc={rc}")
    return out


def decode_augment_file(path: str, uniforms: np.ndarray, jitter: np.ndarray, *,
                        degrees: float, resized_crop: bool, crop_scale,
                        crop_ratio, hflip: bool,
                        out_size: int) -> Optional[np.ndarray]:
    """Fused JPEG decode -> affine augment -> jitter; one GIL-free C call.

    Returns the augmented (out_size, out_size, 3) uint8 image, or None on a
    decode failure (caller applies its skip-on-corrupt policy).
    """
    lib = load()
    if not augment_available():
        raise RuntimeError(
            "native augment entries unavailable (library unbuilt or a stale "
            "pre-augment .so); run runtime.build()")
    u = np.ascontiguousarray(uniforms, dtype=np.float32)
    j = np.ascontiguousarray(jitter, dtype=np.float32)
    out = np.empty((out_size, out_size, 3), dtype=np.uint8)
    rc = lib.wut_decode_augment_file(
        path.encode(), u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        j.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), float(degrees),
        int(resized_crop), float(crop_scale[0]), float(crop_scale[1]),
        float(crop_ratio[0]), float(crop_ratio[1]), int(hflip), out_size,
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
