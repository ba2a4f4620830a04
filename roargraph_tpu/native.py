"""ctypes bindings for the C++ CPU runtime (``csrc/roar_native.cpp``).

The shared library is compiled on first use (g++ -O3 -march=native -fopenmp)
into ``build/libroar_native.so``. The CPU engine provides (a) a serving path
on hosts without a TPU and (b) the measured CPU baseline for bench.py —
mirroring the reference's OpenMP query drivers
(``tests/test_search_roargraph.cpp:203-209``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

from .config import Metric, SearchConfig
from .graph import PaddedGraph

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "build", "libroar_native.so")
_SRC = os.path.join(_REPO, "csrc", "roar_native.cpp")
_lib = None


def _metric_code(metric: Metric) -> int:
    return 0 if metric is Metric.L2 else 1  # COSINE = normalized IP


def build_library(force: bool = False) -> str:
    """Compile the shared library if missing/stale. Returns its path."""
    if (not force and os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-std=c++17", "-fPIC",
           "-shared", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.roar_search_batch.restype = None
        lib.roar_brute_knn.restype = None
        lib.roar_max_threads.restype = None
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def max_threads() -> int:
    lib = _load()
    out = ctypes.c_int32(0)
    lib.roar_max_threads(ctypes.byref(out))
    return out.value


def _cptr(arr, ct):
    return arr.ctypes.data_as(ctypes.POINTER(ct))


def search_native(
    graph: PaddedGraph, base: np.ndarray, queries: np.ndarray,
    config: SearchConfig, *, num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """CPU beam search; same result contract as
    :func:`roargraph_tpu.search.search`."""
    lib = _load()
    base = np.ascontiguousarray(base, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    adj = np.ascontiguousarray(graph.ids, np.int32)
    n, dim = base.shape
    nq = queries.shape[0]
    k, L = config.k, config.L_pq
    out_ids = np.empty((nq, k), np.int32)
    out_d = np.empty((nq, k), np.float32)
    out_cmps = np.empty((nq,), np.int32)
    out_hops = np.empty((nq,), np.int32)
    lib.roar_search_batch(
        _cptr(base, ctypes.c_float), ctypes.c_int64(n), ctypes.c_int64(dim),
        _cptr(adj, ctypes.c_int32), ctypes.c_int64(adj.shape[1]),
        ctypes.c_int32(graph.ep),
        _cptr(queries, ctypes.c_float), ctypes.c_int64(nq),
        ctypes.c_int32(k), ctypes.c_int32(L),
        ctypes.c_int32(_metric_code(config.metric)),
        ctypes.c_int32(num_threads),
        _cptr(out_ids, ctypes.c_int32), _cptr(out_d, ctypes.c_float),
        _cptr(out_cmps, ctypes.c_int32), _cptr(out_hops, ctypes.c_int32))
    return out_ids, out_d, out_cmps, out_hops


def brute_knn_native(base, queries, k: int, metric, *, num_threads: int = 0):
    lib = _load()
    metric = Metric.parse(metric)
    base = np.ascontiguousarray(base, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, dim = base.shape
    nq = queries.shape[0]
    out_ids = np.empty((nq, k), np.int32)
    out_d = np.empty((nq, k), np.float32)
    lib.roar_brute_knn(
        _cptr(base, ctypes.c_float), ctypes.c_int64(n), ctypes.c_int64(dim),
        _cptr(queries, ctypes.c_float), ctypes.c_int64(nq),
        ctypes.c_int32(k), ctypes.c_int32(_metric_code(metric)),
        ctypes.c_int32(num_threads),
        _cptr(out_ids, ctypes.c_int32), _cptr(out_d, ctypes.c_float))
    return out_ids, out_d
