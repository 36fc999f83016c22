"""ctypes bindings for the native (C++) threaded batch producer.

The reference's data layer is a Julia Channel producer task
(src/train_brain.jl:197-206); this is its native equivalent: shuffling,
gathering and (optionally) flip-augmenting batches on a C++ thread with a
4-deep prefetch ring, so the host-side training loop only memcpys.

The shared library builds lazily with g++ on first use (no pybind11 in this
environment — plain C ABI + ctypes) and caches next to the source. If no
compiler is available, :class:`NativeBatcher` transparently falls back to a
pure-numpy implementation with identical semantics (not identical RNG).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "batcher.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libigdmbatcher.so")
_lib = None
_lib_lock = threading.Lock()


def _build_library() -> str | None:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB_PATH)
    if os.path.isfile(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", lib],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return lib
    except (OSError, subprocess.SubprocessError):
        return None


def load_library():
    """Load (building if needed) the native library, or None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        path = _build_library()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.igdm_batcher_create.restype = ctypes.c_void_p
        lib.igdm_batcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.igdm_batcher_next.restype = ctypes.c_int64
        lib.igdm_batcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.igdm_batcher_destroy.restype = None
        lib.igdm_batcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    return load_library() is not None


class NativeBatcher:
    """Infinite shuffled-minibatch stream backed by the C++ producer.

    Args:
      imgs: (N, H, W, C) float32 array (held alive for the batcher's life).
      batch_size: examples per batch; the final short batch of an epoch is
        yielded unless drop_remainder.
      augment_flip: random horizontal flips (augmentation the reference
        lacks; useful for the CIFAR-class stretch configs).
    """

    def __init__(
        self,
        imgs: np.ndarray,
        batch_size: int,
        *,
        seed: int = 0,
        augment_flip: bool = False,
        drop_remainder: bool = False,
    ):
        self.imgs = np.ascontiguousarray(imgs, dtype=np.float32)
        if self.imgs.ndim != 4:
            raise ValueError(f"expected (N,H,W,C), got {self.imgs.shape}")
        self.batch_size = int(batch_size)
        self.augment_flip = augment_flip
        self.drop_remainder = drop_remainder
        self._out = np.empty((self.batch_size, *self.imgs.shape[1:]), np.float32)
        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            n, h, w, c = self.imgs.shape
            self._handle = self._lib.igdm_batcher_create(
                self.imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n, h, w, c, self.batch_size, seed,
                int(augment_flip), int(drop_remainder),
            )
        else:  # pure-numpy fallback, same semantics
            self._rng = np.random.default_rng(seed)
            self._perm = self._rng.permutation(self.imgs.shape[0])
            self._cursor = 0

    def next(self) -> np.ndarray:
        """Return the next batch (count, H, W, C); count < batch_size only on
        an epoch's final short batch."""
        if self._handle is not None:
            count = self._lib.igdm_batcher_next(
                self._handle, self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            return self._out[:count].copy()
        n = self.imgs.shape[0]
        if self._cursor >= n or (
            self.drop_remainder and n - self._cursor < self.batch_size
        ):
            self._perm = self._rng.permutation(n)
            self._cursor = 0
        take = min(self.batch_size, n - self._cursor)
        sel = self._perm[self._cursor : self._cursor + take]
        self._cursor += take
        batch = self.imgs[sel].copy()
        if self.augment_flip:
            flips = self._rng.integers(0, 2, take).astype(bool)
            batch[flips] = batch[flips, :, ::-1, :]
        return batch

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.igdm_batcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
