"""ctypes bindings for the native (C++) prefetch image loader.

The library is built on demand from `native/` (g++ is part of the target
image); if the build or load fails, callers fall back to the PIL path in
datasets/euroc.py. See native/prefetch_loader.cc for the design.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsvotpu_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.svo_loader_create.restype = ctypes.c_void_p
    lib.svo_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.svo_loader_next.restype = ctypes.c_int
    lib.svo_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.svo_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.svo_png_decode_gray8.restype = ctypes.c_int
    lib.svo_png_decode_gray8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def decode_png_gray8(data: bytes) -> Optional[np.ndarray]:
    lib = load_library()
    if lib is None:
        return None
    max_px = 4096 * 4096
    out = np.empty((max_px,), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.svo_png_decode_gray8(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_px, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """In-order threaded image stream over a list of PNG paths."""

    def __init__(self, paths: list[str], capacity: int = 8,
                 n_threads: int = 3):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.svo_loader_create(arr, len(self._paths),
                                             capacity, n_threads)
        self._n = len(paths)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= self._n:
            raise StopIteration
        max_px = 4096 * 4096
        out = np.empty((max_px,), np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.svo_loader_next(
            self._handle,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            max_px, ctypes.byref(w), ctypes.byref(h))
        self._i += 1
        if rc != 0:
            raise RuntimeError(f"native decode failed rc={rc}")
        return out[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._handle:
            self._lib.svo_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
