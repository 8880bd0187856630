"""ctypes bridge to the native host runtime (native/qehost.cpp).

Builds the shared library on first use (g++ via the Makefile) and falls back
to numpy implementations when no toolchain is available, so the engine works
everywhere and is merely faster where the native library loads.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SO = _ROOT / "native" / "build" / "libqehost.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            subprocess.run(
                ["make", "-C", str(_ROOT / "native")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.qe_first_unsorted_u32.restype = ctypes.c_int64
        lib.qe_first_unsorted_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
        ]
        lib.qe_random_u32.restype = None
        lib.qe_random_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        lib.qe_shuffled_permutation.restype = None
        lib.qe_shuffled_permutation.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_uint64,
        ]
        lib.qe_radix_sort_pairs_u32.restype = None
        lib.qe_radix_sort_pairs_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _u32ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def available() -> bool:
    return _load() is not None


def first_unsorted(keys: np.ndarray) -> int:
    """Index of the first order violation, or -1 if sorted."""
    keys = np.ascontiguousarray(keys, dtype=np.uint32)
    lib = _load()
    if lib is not None:
        return int(lib.qe_first_unsorted_u32(_u32ptr(keys), keys.shape[0]))
    bad = np.nonzero(keys[1:] < keys[:-1])[0]
    return int(bad[0] + 1) if bad.size else -1


def random_keys(n: int, seed: int = 0) -> np.ndarray:
    out = np.empty(n, dtype=np.uint32)
    lib = _load()
    if lib is not None:
        lib.qe_random_u32(_u32ptr(out), n, seed)
        return out
    return np.random.default_rng(seed).integers(
        0, 2**32, size=n, dtype=np.uint32
    )


def shuffled_permutation(n: int, seed: int = 0) -> np.ndarray:
    """The reference's demo dataset: shuffled 0..N-1 (main.cpp:120-125)."""
    out = np.empty(n, dtype=np.uint32)
    lib = _load()
    if lib is not None:
        lib.qe_shuffled_permutation(_u32ptr(out), n, seed)
        return out
    return np.random.default_rng(seed).permutation(n).astype(np.uint32)


def radix_sort_pairs(keys: np.ndarray, idx: np.ndarray | None = None):
    """Stable CPU oracle sort of (key, index) pairs, in place; returns them."""
    keys = np.ascontiguousarray(keys, dtype=np.uint32).copy()
    if idx is None:
        idx = np.arange(keys.shape[0], dtype=np.uint32)
    else:
        idx = np.ascontiguousarray(idx, dtype=np.uint32).copy()
    lib = _load()
    if lib is not None:
        lib.qe_radix_sort_pairs_u32(_u32ptr(keys), _u32ptr(idx), keys.shape[0])
        return keys, idx
    order = np.argsort(keys, kind="stable")
    return keys[order], idx[order]
