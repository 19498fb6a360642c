"""Native (C++) host-side helpers, loaded via ctypes.

The shared library is compiled on first use with the system g++ and cached
next to the source; everything degrades gracefully to the pure-Python
implementations when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "chordal.cpp")
_LIB = os.path.join(_HERE, "_chordal.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                # compile to a per-process temp file and rename into place:
                # os.rename is atomic, so a concurrent process either sees
                # the old library or the complete new one, never a torn write
                tmp = f"{_LIB}.{os.getpid()}.tmp"
                try:
                    subprocess.run(
                        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                        check=True, capture_output=True, timeout=120,
                    )
                    os.rename(tmp, _LIB)
                finally:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
            lib = ctypes.CDLL(_LIB)
            I64 = ctypes.POINTER(ctypes.c_int64)
            lib.min_degree.restype = ctypes.c_int64
            lib.min_degree.argtypes = [ctypes.c_int64, ctypes.c_int64, I64, I64, I64]
            lib.symbolic_cholesky.restype = ctypes.c_int64
            lib.symbolic_cholesky.argtypes = [
                ctypes.c_int64, ctypes.c_int64, I64, I64, I64,
                ctypes.c_int64, I64, I64,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def available() -> bool:
    return _load() is not None


def _edges_from_adj(adj: List[set]):
    ii, jj = [], []
    for v, nbrs in enumerate(adj):
        for u in nbrs:
            ii.append(v)
            jj.append(u)
    return (
        np.asarray(ii, dtype=np.int64),
        np.asarray(jj, dtype=np.int64),
    )


def min_degree_ordering(adj: List[set]) -> Optional[np.ndarray]:
    """Native greedy minimum-degree; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(adj)
    i, j = _edges_from_adj(adj)
    perm = np.empty(n, dtype=np.int64)
    lib.min_degree(n, i.size, _ptr(i), _ptr(j), _ptr(perm))
    return perm


def symbolic_cholesky(adj: List[set], perm: np.ndarray) -> Optional[List[np.ndarray]]:
    """Native symbolic factor pattern; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(adj)
    i, j = _edges_from_adj(adj)
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    cap = max(4 * i.size + 4 * n, 1024)
    for _ in range(3):
        colptr = np.empty(n + 1, dtype=np.int64)
        rowval = np.empty(cap, dtype=np.int64)
        ret = lib.symbolic_cholesky(
            n, i.size, _ptr(i), _ptr(j), _ptr(perm), cap, _ptr(colptr), _ptr(rowval)
        )
        if ret >= 0:
            return [
                rowval[colptr[c] : colptr[c + 1]].copy() for c in range(n)
            ]
        cap = int(-ret) + 16
    return None
