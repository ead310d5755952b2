"""ctypes bindings for the C++ native runtime (``native/tensorops_native.cpp``)
with build-on-demand and graceful fallback.

The shared library is compiled once with g++ into ``native/build/`` at
first use (no pybind11 in the image — plain C ABI + ctypes per the
environment constraints); every entry point has a pure-Python fallback so
the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "tensorops_native.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libtensorops_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # Compile to a PID-suffixed temp path and os.replace() into place:
    # concurrent first-use builds (e.g. multiple dp ranks) must never
    # dlopen a partially written .so or clobber each other mid-write —
    # rename is atomic on POSIX, so every process sees a complete library.
    tmp = f"{_SO}.{os.getpid()}.tmp"
    # portable flags: the .so may be built on one host and (re)used on
    # another; -march=native would SIGILL on a weaker ISA
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if no
    toolchain / build failure (callers fall back to Python)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.top_gmul.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.top_transpose.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.top_loader_create.restype = ctypes.c_void_p
        lib.top_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.top_loader_next.restype = ctypes.c_int64
        lib.top_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.top_loader_next_idx.restype = ctypes.c_int64
        lib.top_loader_next_idx.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.top_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_gmul(lm: int, lo: int, ln: int, x: np.ndarray, y: np.ndarray
                ) -> Optional[np.ndarray]:
    """gmul via the C++ kernel; None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    ms = x.shape[:lm]
    os_ = np.asarray(x.shape[lm:], dtype=np.int64)
    ns = y.shape[lo:]
    M = int(np.prod(ms)) if ms else 1
    O = int(np.prod(os_)) if lo else 1
    N = int(np.prod(ns)) if ns else 1
    out = np.zeros(ms + ns, dtype=np.float64)
    lib.top_gmul(
        _dp(x), _dp(y), _dp(out),
        os_.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), lo, M, O, N,
    )
    return out


def native_transpose(x: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    shape = np.asarray(x.shape, dtype=np.int64)
    out = np.empty(tuple(reversed(x.shape)), dtype=np.float64)
    lib.top_transpose(
        _dp(x), _dp(out),
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), x.ndim,
    )
    return out


class DevicePrefetcher:
    """Keep the next ``depth`` batches already in flight to the device.

    ``jax.device_put`` is asynchronous, so enqueueing batch k+1's
    host->HBM transfer before batch k's step finishes overlaps transfer
    with compute — the pinned-memory double-buffer pattern layered on
    the C++ threaded loader (which already overlaps shuffle/assembly
    with everything else).  ``put(xb, yb)`` performs the actual
    transfer (plain ``asarray`` or a sharded ``device_put``)."""

    def __init__(self, loader, put, depth: int = 2):
        if depth < 1:
            raise ValueError("prefetch depth must be >= 1")
        from collections import deque

        self.loader = loader
        self.put = put
        self._q = deque()
        for _ in range(depth):
            self._q.append(put(*loader.next()))

    def next(self):
        out = self._q.popleft()
        self._q.append(self.put(*self.loader.next()))
        return out


class NativeLoader:
    """Threaded shuffled minibatch loader (C++ worker + ring buffer);
    falls back to a NumPy generator when the native lib is absent."""

    def __init__(self, X: np.ndarray, Y: np.ndarray, batch: int,
                 seed: int = 0, drop_last: bool = False,
                 shard: Optional[Tuple[int, int]] = None,
                 index_mode: bool = False):
        """``shard=(index, count)`` keeps only every count-th row starting
        at index — the data-parallel per-host partition (each dp rank
        constructs its own loader with its rank; shards are disjoint and
        cover the set).  The shuffle stays per-shard and seeded, so runs
        are reproducible per rank.

        ``index_mode=True`` makes the loader emit batch INDICES
        (``next_indices()``) instead of assembling rows — the chained
        training path gathers rows on-device from the HBM-resident
        dataset, and a single host thread copying 13 MB batches could
        never feed a ~30k steps/s device.  The index stream uses the
        SAME shuffle machinery (identical seed => identical batches to
        a gathered-mode loader); ``next()`` still works, gathering on
        the host from the indices (bitwise-identical rows)."""
        if shard is not None:
            idx, n = shard
            if not (0 <= idx < n):
                raise ValueError(f"shard index {idx} not in [0, {n})")
            X = X[idx::n]
            Y = Y[idx::n]
        self.shard = shard
        self.X = np.ascontiguousarray(X, dtype=np.float32)
        self.Y = np.ascontiguousarray(Y, dtype=np.float32)
        if self.X.ndim != 2 or self.Y.ndim != 2:
            raise ValueError(
                f"NativeLoader expects 2-D X and Y, got {self.X.shape} / "
                f"{self.Y.shape} (one-hot or reshape labels to (n, 1))")
        if drop_last and self.X.shape[0] < batch:
            raise ValueError(
                f"drop_last with dataset ({self.X.shape[0]}) smaller than "
                f"one batch ({batch}) would never yield a batch")
        self.batch = int(batch)
        self.seed = int(seed)
        self.drop_last = drop_last
        self.index_mode = bool(index_mode)
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.top_loader_create(
                _fp(self.X), _fp(self.Y), self.X.shape[0],
                self.X.shape[1], self.Y.shape[1], self.batch,
                self.seed, int(drop_last), int(self.index_mode),
            )
        else:
            self._rng = np.random.default_rng(seed)
            self._perm = self._rng.permutation(self.X.shape[0])
            self._cursor = 0

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        if self.index_mode:
            # host gather from the index stream: the float rows are
            # bitwise the rows the gathered mode would have memcpy'd
            idx = self.next_indices()
            return self.X[idx], self.Y[idx]
        if self._handle is not None:
            xout = np.empty((self.batch, self.X.shape[1]), dtype=np.float32)
            yout = np.empty((self.batch, self.Y.shape[1]), dtype=np.float32)
            took = self._lib.top_loader_next(self._handle, _fp(xout), _fp(yout))
            return xout[:took], yout[:took]
        n = self.X.shape[0]
        if self._cursor >= n:
            self._perm = self._rng.permutation(n)
            self._cursor = 0
        take = min(self.batch, n - self._cursor)
        if self.drop_last and take < self.batch:
            # mirror the native path: reshuffle and emit a full batch
            self._perm = self._rng.permutation(n)
            self._cursor = 0
            take = self.batch
        idx = self._perm[self._cursor : self._cursor + take]
        self._cursor += take
        return self.X[idx], self.Y[idx]

    def next_indices(self) -> np.ndarray:
        """Row indices of the next batch (``index_mode=True`` only).

        Same perm/cursor stream as ``next()``: an index-mode loader and
        a gathered-mode loader built with one seed agree batch for
        batch — ``X[loader.next_indices()] == other.next()[0]``
        bitwise.  The chained fit consumes these and gathers on-device
        from the HBM-resident dataset."""
        if not self.index_mode:
            raise ValueError(
                "next_indices() requires NativeLoader(index_mode=True) "
                "— the gathered-mode worker consumes the permutation as "
                "assembled rows, so the two streams cannot be mixed")
        if self._handle is not None:
            iout = np.empty(self.batch, dtype=np.int64)
            took = self._lib.top_loader_next_idx(
                self._handle, iout.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)))
            return iout[:took]
        n = self.X.shape[0]
        if self._cursor >= n:
            self._perm = self._rng.permutation(n)
            self._cursor = 0
        take = min(self.batch, n - self._cursor)
        if self.drop_last and take < self.batch:
            self._perm = self._rng.permutation(n)
            self._cursor = 0
            take = self.batch
        idx = self._perm[self._cursor : self._cursor + take]
        self._cursor += take
        return np.asarray(idx, dtype=np.int64)

    def skip(self, n: int) -> None:
        """Advance the stream by ``n`` batches without using their data.

        Exact resume positioning: a resumed ``fit`` skips to its restored
        global step, so stream position == global step holds across any
        number of crash/resume cycles and no batch is replayed.  The
        NumPy path advances indices only (no gathers); the native path
        drains assembled batches from the ring (one memcpy each)."""
        if n <= 0:
            return
        if self._handle is not None:
            if self.index_mode:
                iout = np.empty(self.batch, dtype=np.int64)
                ip = iout.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
                for _ in range(n):
                    self._lib.top_loader_next_idx(self._handle, ip)
                return
            xout = np.empty((self.batch, self.X.shape[1]), dtype=np.float32)
            yout = np.empty((self.batch, self.Y.shape[1]), dtype=np.float32)
            for _ in range(n):
                self._lib.top_loader_next(self._handle, _fp(xout), _fp(yout))
            return
        nrows = self.X.shape[0]
        for _ in range(n):
            if self._cursor >= nrows:
                self._perm = self._rng.permutation(nrows)
                self._cursor = 0
            take = min(self.batch, nrows - self._cursor)
            if self.drop_last and take < self.batch:
                self._perm = self._rng.permutation(nrows)
                self._cursor = 0
                take = self.batch
            self._cursor += take

    def close(self):
        if self._handle is not None:
            self._lib.top_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
