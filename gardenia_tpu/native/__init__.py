"""ctypes binding for the native graph-text parser (graph_io.cpp).

Compiled lazily with g++ on first use and cached next to the source;
every entry point degrades gracefully to the NumPy parsers in
gardenia_tpu.core.io when the toolchain or the .so is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_io.cpp")
_SO = os.path.join(_HERE, "libgtio.so")
_LOCK = threading.Lock()
_LIB = None
_FAILED = False

FMT = {"mtx": 0, "el": 1, "gr": 2, "graph": 3}


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def _lib():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        path = _SO if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if path is None:
            _FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.gt_parse_edges.restype = ctypes.c_int
            lib.gt_parse_edges.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ]
            lib.gt_free.restype = None
            lib.gt_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except OSError:
            _FAILED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def parse_edges(path: str, fmt: str
                ) -> Optional[Tuple[int, int, np.ndarray, np.ndarray,
                                    Optional[np.ndarray]]]:
    """Parse a graph text file natively. Returns (m, n, src, dst, wt)
    or None if the native path is unavailable/failed."""
    lib = _lib()
    if lib is None or fmt not in FMT:
        return None
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    src_p = ctypes.POINTER(ctypes.c_int32)()
    dst_p = ctypes.POINTER(ctypes.c_int32)()
    wt_p = ctypes.POINTER(ctypes.c_double)()
    rc = lib.gt_parse_edges(path.encode(), FMT[fmt],
                            ctypes.byref(m), ctypes.byref(n),
                            ctypes.byref(nnz), ctypes.byref(src_p),
                            ctypes.byref(dst_p), ctypes.byref(wt_p))
    if rc != 0:
        return None
    k = nnz.value
    try:
        src = np.ctypeslib.as_array(src_p, shape=(k,)).copy()
        dst = np.ctypeslib.as_array(dst_p, shape=(k,)).copy()
        wt = None
        if wt_p:
            wt = np.ctypeslib.as_array(wt_p, shape=(k,)).copy()
    finally:
        lib.gt_free(src_p)
        lib.gt_free(dst_p)
        if wt_p:
            lib.gt_free(wt_p)
    return m.value, n.value, src, dst, wt
