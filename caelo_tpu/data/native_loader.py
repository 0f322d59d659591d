"""ctypes bindings for the native C++ scan loader/prefetcher.

Builds ``caelo_tpu/data/native/loader.cpp`` on first use (g++, ~1 s) and
falls back to pure numpy when no compiler is available, so the framework
never hard-depends on the native path.  See ``loader.cpp`` for why this
replaces the reference's multiprocessing loaders.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libcaeloloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.caelo_load_scan.restype = ctypes.c_int
        lib.caelo_load_scan.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.caelo_prefetch_create.restype = ctypes.c_void_p
        lib.caelo_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.caelo_prefetch_next.restype = ctypes.c_int
        lib.caelo_prefetch_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.caelo_prefetch_destroy.restype = None
        lib.caelo_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_scan(path: str, max_points: int, n_cols: int = 4):
    """Load + zero-pad one scan.  Returns (array (max_points, n_cols), mask)."""
    lib = get_lib()
    out = np.zeros((max_points, n_cols), np.float32)
    if lib is not None:
        n = lib.caelo_load_scan(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points, n_cols,
        )
        if n < 0:
            raise FileNotFoundError(path)
    else:  # numpy fallback
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, n_cols)
        n = min(raw.shape[0], max_points)
        out[:n] = raw[:n]
    mask = np.zeros((max_points,), bool)
    mask[:n] = True
    return out, mask


class ScanPrefetcher:
    """Ordered background prefetch over a list of scan files.

    The in-process analog of the reference's 4 loader subprocesses
    (``PoseEstimation.py:91-119``): IO overlaps with device compute, frames
    are delivered strictly in order.
    """

    def __init__(self, paths, max_points: int, n_cols: int = 4,
                 depth: int = 8, n_threads: int = 2):
        self.paths = list(paths)
        self.max_points = max_points
        self.n_cols = n_cols
        self._lib = get_lib()
        self._i = 0
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._keepalive = arr
            self._h = self._lib.caelo_prefetch_create(
                arr, len(self.paths), max_points, n_cols, depth, n_threads
            )
        else:
            self._h = None

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self.paths):
            raise StopIteration
        out = np.zeros((self.max_points, self.n_cols), np.float32)
        if self._h is not None:
            n = self._lib.caelo_prefetch_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if n < 0:
                raise StopIteration
        else:
            out, mask = load_scan(
                self.paths[self._i], self.max_points, self.n_cols
            )
            self._i += 1
            return out, mask
        self._i += 1
        mask = np.zeros((self.max_points,), bool)
        mask[: max(n, 0)] = True
        return out, mask

    def close(self):
        if self._h is not None:
            self._lib.caelo_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
