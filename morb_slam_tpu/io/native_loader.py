"""ctypes bridge to the native prefetching image loader (native/loader.cc).

The reference's data path is C++ (cv::imread on the feed thread of every
example main); this module is its TPU-runtime equivalent: a worker pool in
a small C++ shared library decodes PNG/PGM frames ahead of the consumer so
the Python feed loop overlaps disk + decode latency with TPU compute.

The library is compiled on first use with g++ (cached next to the source);
when the toolchain or zlib is unavailable everything falls back to the
cv2-based loaders in io/datasets.py transparently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "loader.cc")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libmorbloader.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB_PATH, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if
    unavailable (callers then fall back to cv2). Set MORB_NATIVE_LOADER=0
    to skip the native path entirely (no g++ compile on first imread)."""
    global _lib, _lib_failed
    if os.environ.get("MORB_NATIVE_LOADER", "1") in ("0", "off"):
        return None
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or \
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.decode_image.restype = ctypes.c_int
        lib.decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def decode_gray(path: str) -> Optional[np.ndarray]:
    """Synchronous single-image decode via the native library; None if the
    library or format is unsupported (caller falls back to cv2)."""
    lib = get_lib()
    if lib is None:
        return None
    cap = 16 * 1024 * 1024
    buf = np.empty(cap, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.decode_image(path.encode(),
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          cap, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """In-order prefetching frame stream over a list of image paths.

    Iterating yields (index, float32 (H, W) image). Decoding runs in C++
    worker threads up to `prefetch` frames ahead (reference: the example
    mains' synchronous cv::imread, now overlapped)."""

    def __init__(self, paths: List[str], n_workers: int = 2,
                 prefetch: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        w = ctypes.c_int()
        h = ctypes.c_int()
        self._h = lib.loader_create(arr, len(self._paths), n_workers,
                                    prefetch, ctypes.byref(w),
                                    ctypes.byref(h))
        self.width = w.value
        self.height = h.value
        self._n = len(paths)
        self._buf = np.empty(max(self.width * self.height, 1), np.float32)

    def __iter__(self):
        for _ in range(self._n):
            rc = self._lib.loader_next(
                self._h,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._buf.size)
            if rc == -1:
                return
            if rc < 0:
                raise IOError(f"native decode failed (rc={rc})")
            yield rc, self._buf.reshape(self.height, self.width).copy()

    def close(self):
        if self._h is not None:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
