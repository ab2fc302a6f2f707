"""Native (C++) data-loading path: build-on-first-use + ctypes bindings.

`decode_resize_batch(paths, size_hw)` decodes JPEGs and bicubic-resizes
them into one (N, H, W, 3) uint8 batch with a C++ thread pool (libjpeg,
PIL-compatible antialiased resampling — see loader.cc). Falls back cleanly:
callers should catch NativeUnavailable if no compiler/libjpeg exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_LIB = os.path.join(_DIR, "libreid_loader.so")

_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"native loader build failed: {detail}")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.reid_decode_resize_batch.restype = ctypes.c_int
    lib.reid_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
    ]
    lib.reid_decode_jpeg.restype = ctypes.c_long
    lib.reid_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.reid_pool_create.restype = ctypes.c_void_p
    lib.reid_pool_create.argtypes = [ctypes.c_int]
    lib.reid_pool_run.restype = ctypes.c_int
    lib.reid_pool_run.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.reid_pool_destroy.restype = None
    lib.reid_pool_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def decode_resize_batch(
    paths: Sequence[str],
    size_hw: Tuple[int, int],
    out: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode + resize JPEGs into (N, H, W, 3) uint8. Failed decodes are
    zero-filled (a warning count is raised as ValueError if ALL fail)."""
    lib = _load()
    n = len(paths)
    h, w = size_hw
    if out is None:
        out = np.zeros((n, h, w, 3), np.uint8)
    assert out.shape == (n, h, w, 3) and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(max(os.cpu_count() or 8, 1), 16)
    failures = lib.reid_decode_resize_batch(
        arr, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n_threads,
    )
    if failures == n and n > 0:
        raise ValueError(f"all {n} JPEG decodes failed (first: {paths[0]})")
    return out


class DecodePool:
    """Persistent native worker pool for batch decode+resize.

    Unlike decode_resize_batch (which spins a C++ thread pool up and down
    per call), workers here park between batches — one pool lives for a
    whole gallery sweep. Python-side double buffering comes from
    BatchLoader's producer/queue; this removes the per-batch thread churn
    underneath it."""

    def __init__(self, n_threads: int = 0):
        self._lib = _load()
        if n_threads <= 0:
            n_threads = min(max(os.cpu_count() or 8, 1), 16)
        self._pool = self._lib.reid_pool_create(n_threads)

    def run(
        self,
        paths: Sequence[str],
        size_hw: Tuple[int, int],
        out: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        n = len(paths)
        h, w = size_hw
        if out is None:
            out = np.zeros((n, h, w, 3), np.uint8)
        assert out.shape == (n, h, w, 3) and out.dtype == np.uint8
        assert out.flags["C_CONTIGUOUS"]
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self._lib.reid_pool_run(
            self._pool, arr, n, h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if failures == n and n > 0:
            raise ValueError(
                f"all {n} JPEG decodes failed (first: {paths[0]})"
            )
        return out

    def close(self) -> None:
        if getattr(self, "_pool", None):
            self._lib.reid_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_jpeg(path: str) -> np.ndarray:
    """Decode one JPEG to (H, W, 3) uint8."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = np.zeros(32 * 1024 * 1024, np.uint8)  # 32MB ceiling
    got = lib.reid_decode_jpeg(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        buf.size, ctypes.byref(w), ctypes.byref(h),
    )
    if got <= 0:
        raise ValueError(f"decode failed for {path}")
    return buf[:got].reshape(h.value, w.value, 3).copy()
