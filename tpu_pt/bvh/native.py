"""ctypes bridge to the native C++ BVH builder (native/bvh_builder.cpp).

Drop-in replacement for the Python SAH build + octant pack: one call
produces the PackedBVH tables.  Falls back to the Python path when the
shared library is missing (tests assert both paths agree).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from tpu_pt.bvh.packed import PackedBVH
from tpu_pt.bvh.sah import prim_bounds
from tpu_pt.scene.types import Scene

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native", "libbvh.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.bvh_emit.restype = None
        lib.bvh_emit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
        ]
        if hasattr(lib, "bvh_count_leaves"):
            lib.bvh_count_leaves.restype = ctypes.c_int
            lib.bvh_count_leaves.argtypes = [ctypes.c_void_p]
            lib.bvh_emit_leaves.restype = None
            lib.bvh_emit_leaves.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
        _lib = lib
    return _lib


def build_leaves(scene: Scene, max_leaf: int):
    """Native SAH build -> (start, count, lo, hi, prim_perm) leaf arrays in
    DFS order (the cluster-BVH host build).  None if lib missing/old."""
    lib = _load()
    if lib is None or not hasattr(lib, "bvh_count_leaves"):
        return None
    lo, hi = prim_bounds(scene)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = lo.shape[0]
    n_nodes = ctypes.c_int(0)
    handle = lib.bvh_build(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, max_leaf, ctypes.byref(n_nodes),
    )
    n_leaves = lib.bvh_count_leaves(ctypes.c_void_p(handle))
    l_lo = np.empty((n_leaves, 3), np.float32)
    l_hi = np.empty((n_leaves, 3), np.float32)
    start = np.empty((n_leaves,), np.int32)
    count = np.empty((n_leaves,), np.int32)
    perm = np.empty((n,), np.int32)
    lib.bvh_emit_leaves(
        ctypes.c_void_p(handle),
        l_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        l_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        start.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return start, count, l_lo, l_hi, perm


def _prim_rows(scene: Scene, pid: np.ndarray) -> np.ndarray:
    """Packed 16-wide primitive rows in leaf order (same as packed.pack_bvh)."""
    v = np.asarray(scene.vertices)
    ti = np.asarray(scene.tri_idx)
    tm = np.asarray(scene.tri_mat)
    sc = np.asarray(scene.sph_center)
    sr = np.asarray(scene.sph_radius)
    sm = np.asarray(scene.sph_mat)
    n_tris = ti.shape[0]
    rows = np.zeros((len(pid), 16), np.float32)
    is_tri = pid < n_tris
    tg = pid[is_tri]
    v0 = v[ti[tg, 0]]
    rows[is_tri, 0:3] = v0
    rows[is_tri, 3:6] = v[ti[tg, 1]] - v0
    rows[is_tri, 6:9] = v[ti[tg, 2]] - v0
    rows[is_tri, 9] = tm[tg].astype(np.int32).view(np.float32)
    sg = pid[~is_tri] - n_tris
    rows[~is_tri, 0:3] = sc[sg]
    rows[~is_tri, 3] = sr[sg]
    rows[~is_tri, 9] = sm[sg].astype(np.int32).view(np.float32)
    rows[~is_tri, 10] = 1.0
    return rows


def build_packed(scene: Scene, max_leaf: int = 4) -> Optional[PackedBVH]:
    """Native binned-SAH build → PackedBVH.  None if the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    lo, hi = prim_bounds(scene)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = lo.shape[0]
    n_nodes = ctypes.c_int(0)
    handle = lib.bvh_build(
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, max_leaf, ctypes.byref(n_nodes),
    )
    nodes = np.empty((8, n_nodes.value, 8), np.float32)
    perm = np.empty((n,), np.int32)
    lib.bvh_emit(
        ctypes.c_void_p(handle),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return PackedBVH.build(nodes=nodes, prims=_prim_rows(scene, perm),
                           prim_gid=perm, max_leaf=max_leaf)


def build_packed_any(scene: Scene, max_leaf: int = 4) -> PackedBVH:
    """Native if available, else Python fallback."""
    out = build_packed(scene, max_leaf)
    if out is not None:
        return out
    from tpu_pt.bvh.packed import pack_bvh
    from tpu_pt.bvh.sah import build_bvh

    return pack_bvh(build_bvh(scene, max_leaf), scene, max_leaf)
