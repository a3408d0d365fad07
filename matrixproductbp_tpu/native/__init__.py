"""ctypes loader for the native graph-preprocessing library.

Builds ``libgraphbuild.so`` on first use if the toolchain is available
(g++ is baked into the image); callers fall back to the pure-Python path when
the library cannot be loaded.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgraphbuild.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.mpbp_graph_degrees.restype = ctypes.c_int32
    lib.mpbp_graph_degrees.argtypes = [ctypes.c_int32, ctypes.c_int64,
                                       i32p, i32p, i32p]
    lib.mpbp_graph_build.restype = None
    lib.mpbp_graph_build.argtypes = [ctypes.c_int32, ctypes.c_int64, i32p,
                                     i32p, ctypes.c_int32, i32p, i32p, i32p,
                                     i32p, u8p, i32p, i32p]
    lib.mpbp_partition.restype = None
    lib.mpbp_partition.argtypes = [ctypes.c_int32, ctypes.c_int64, i32p,
                                   i32p, ctypes.c_int32, i32p, i32p]
    _lib = lib
    return _lib


def build_graph_native(N: int, pairs: np.ndarray, dmax_req=None):
    """pairs: [m, 2] unique undirected edges. Returns the Graph field arrays
    or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    u = np.ascontiguousarray(pairs[:, 0], np.int32)
    v = np.ascontiguousarray(pairs[:, 1], np.int32)
    m = len(pairs)
    degree = np.zeros(N, np.int32)
    dmax = int(lib.mpbp_graph_degrees(N, m, u, v, degree))
    if dmax_req is not None:
        assert dmax_req >= dmax
        dmax = dmax_req
    dmax = max(dmax, 1)
    E = 2 * m
    edge_src = np.zeros(E, np.int32)
    edge_dst = np.zeros(E, np.int32)
    rev_edge = np.zeros(E, np.int32)
    in_edges = np.zeros((N, dmax), np.int32)
    in_mask = np.zeros((N, dmax), np.uint8)
    nbr = np.zeros((N, dmax), np.int32)
    lib.mpbp_graph_build(N, m, u, v, dmax, edge_src, edge_dst, rev_edge,
                         in_edges.reshape(-1), in_mask.reshape(-1),
                         nbr.reshape(-1), degree)
    return (E, dmax, edge_src, edge_dst, rev_edge, in_edges,
            in_mask.astype(bool), nbr, degree)


def partition_native(graph, nparts: int, order: np.ndarray):
    lib = _load()
    if lib is None:
        return None
    part = np.zeros(graph.N, np.int32)
    lib.mpbp_partition(graph.N, graph.E,
                       np.ascontiguousarray(graph.edge_src, np.int32),
                       np.ascontiguousarray(graph.edge_dst, np.int32),
                       nparts, np.ascontiguousarray(order, np.int32), part)
    return part
