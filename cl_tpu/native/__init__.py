"""ctypes bindings for the native host-side components.

The shared library is built lazily with g++ on first import (no pybind11 in
this image; plain C ABI + ctypes — see rasterizer.cpp header). The build is
cached next to the source keyed by its mtime; delete ``_build/`` to force a
rebuild. ``available()`` gates callers so every native path has a Python
fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rasterizer.cpp")
_BUILD = os.path.join(_DIR, "_build")
_LIB_PATH = os.path.join(_BUILD, "libcl_native.so")

_lock = threading.Lock()
_lib = None
_load_error: str | None = None


def _build() -> None:
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cl_rasterize.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.cl_rasterize_batch.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
            _lib = lib
        except Exception as e:  # missing toolchain => Python fallback
            _load_error = str(e)
        return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def rasterize(seed: int, index: int, size: int, classes,
              max_shapes: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """One (image uint8 [S,S,3], mask uint8 [S,S]) example."""
    lib = _load()
    assert lib is not None, f"native library unavailable: {_load_error}"
    cls = np.ascontiguousarray(np.asarray(classes, np.int64))
    img = np.empty((size, size, 3), np.uint8)
    mask = np.empty((size, size), np.uint8)
    lib.cl_rasterize(seed, index, size, _i64p(cls), len(cls), max_shapes,
                     _u8p(img), _u8p(mask))
    return img, mask


def rasterize_batch(seed: int, indices, size: int, classes,
                    max_shapes: int = 4, n_threads: int = 0
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Threaded batch rasterization into contiguous uint8 buffers."""
    lib = _load()
    assert lib is not None, f"native library unavailable: {_load_error}"
    idx = np.ascontiguousarray(np.asarray(indices, np.int64))
    cls = np.ascontiguousarray(np.asarray(classes, np.int64))
    n = len(idx)
    imgs = np.empty((n, size, size, 3), np.uint8)
    masks = np.empty((n, size, size), np.uint8)
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    lib.cl_rasterize_batch(seed, _i64p(idx), n, size, _i64p(cls), len(cls),
                           max_shapes, _u8p(imgs), _u8p(masks), n_threads)
    return imgs, masks
