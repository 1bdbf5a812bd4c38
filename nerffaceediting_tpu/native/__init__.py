"""Native runtime: ctypes bindings for the C++ data loader.

Builds loader.cpp on first use (g++ → .so cached next to the source) and
exposes `NativeDataLoader`, an infinite prefetching batch iterator matching
train.dataset.data_iterator's contract. Falls back gracefully: callers
should catch `NativeLoaderUnavailable` and use the Python loader.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "loader.cpp")


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build() -> str:
    """Compile loader.cpp on demand. The artifact is keyed on the source
    hash (never committed — a stale or unauditable prebuilt blob must not
    be loadable), cached next to the source."""
    with open(_SRC, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:16]
    so = os.path.join(os.path.dirname(__file__), f"_loader-{tag}.so")
    if os.path.exists(so):
        return so
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", so + ".tmp", "-lpng", "-ljpeg", "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(f"loader build failed: {detail}") from e
    os.replace(so + ".tmp", so)
    return so


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.loader_open.restype = ctypes.c_void_p
        lib.loader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.loader_len.argtypes = [ctypes.c_void_p]
        lib.loader_label_dim.argtypes = [ctypes.c_void_p]
        lib.loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeDataLoader:
    """Infinite prefetching batch iterator over a dataset zip.

    Yields {'image': (B,3,R,R) float32 in (−1,1), 'label': (B, label_dim)}.
    """

    def __init__(self, path: str, resolution: int, batch_size: int,
                 num_threads: int = 4, seed: int = 0, rank: int = 0,
                 num_replicas: int = 1):
        if not path.endswith(".zip"):
            raise NativeLoaderUnavailable("native loader requires a zip dataset")
        lib = _load_lib()
        self._lib = lib
        self._handle = lib.loader_open(
            path.encode(), resolution, batch_size, num_threads,
            seed, rank, num_replicas)
        if not self._handle:
            raise NativeLoaderUnavailable(f"could not open {path}")
        self.batch_size = batch_size
        self.resolution = resolution
        self.label_dim = lib.loader_label_dim(self._handle)
        self.dataset_size = lib.loader_len(self._handle)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        images = np.empty((self.batch_size, 3, self.resolution, self.resolution), np.float32)
        labels = np.empty((self.batch_size, max(self.label_dim, 1)), np.float32)
        ok = self._lib.loader_next(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if not ok:
            raise StopIteration
        return {"image": images, "label": labels[:, : self.label_dim]}

    def close(self) -> None:
        if self._handle:
            self._lib.loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
