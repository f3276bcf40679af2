"""ctypes binding for the native batch loader (``native/fastloader.cpp``).

The native library mmaps a raw float32 dataset ``[n_theta, n_pos, h, w]``
and assembles minibatches on a worker thread so batch staging overlaps the
previous training step.  Gracefully unavailable when no compiler/so exists
— the driver falls back to numpy gathers.

Use :func:`convert_h5_to_raw` once to turn an ``exchange/data`` HDF5 file
into the raw magnitude file the loader maps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, '..', '..', 'native'))
_SO_PATH = os.path.join(_NATIVE_DIR, 'libfastloader.so')
_SRC_PATH = os.path.join(_NATIVE_DIR, 'fastloader.cpp')


def _build_library() -> Optional[str]:
    if os.path.exists(_SO_PATH) and (
            not os.path.exists(_SRC_PATH)
            or os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH)):
        return _SO_PATH
    if not os.path.exists(_SRC_PATH):
        return None
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-pthread',
             '-o', _SO_PATH, _SRC_PATH],
            check=True, capture_output=True)
        return _SO_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = _build_library()
        if path is None:
            raise RuntimeError('native fastloader unavailable '
                               '(no compiler / build failed)')
        lib = ctypes.CDLL(path)
        lib.loader_open.restype = ctypes.c_void_p
        lib.loader_open.argtypes = [ctypes.c_char_p] + [ctypes.c_int64] * 6
        lib.loader_close.argtypes = [ctypes.c_void_p]
        lib.loader_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.loader_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.loader_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


def convert_h5_to_raw(h5_path: str, raw_path: str) -> tuple:
    """One-time conversion: |exchange/data| magnitudes -> raw float32 file.
    Returns the dataset shape."""
    import h5py
    with h5py.File(h5_path, 'r') as f:
        dset = f['exchange/data']
        shape = dset.shape
        with open(raw_path, 'wb') as out:
            for i in range(shape[0]):
                np.abs(np.asarray(dset[i])).astype(np.float32).tofile(out)
    return shape


class FastLoader:
    """Async minibatch loader over a raw dataset file."""

    def __init__(self, raw_path: str, shape, n_slots: int = 2,
                 max_batch: int = 256):
        n_theta, n_pos, h, w = (int(s) for s in shape)
        self.shape = (n_theta, n_pos, h, w)
        self.max_batch = max_batch
        self._h = _lib().loader_open(raw_path.encode(), n_theta, n_pos, h,
                                     w, n_slots, max_batch)
        if not self._h:
            raise RuntimeError(f'failed to map {raw_path}')

    def prefetch(self, slot: int, i_theta: int, indices: Sequence[int]):
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        _lib().loader_prefetch(
            self._h, slot, int(i_theta),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx))

    def get(self, slot: int, n: int) -> np.ndarray:
        out = np.empty((n, self.shape[2], self.shape[3]), np.float32)
        _lib().loader_get(self._h, slot,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n)
        return out

    def gather(self, i_theta: int, indices: Sequence[int]) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.shape[2], self.shape[3]), np.float32)
        _lib().loader_gather(
            self._h, int(i_theta),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def close(self):
        if self._h:
            _lib().loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
