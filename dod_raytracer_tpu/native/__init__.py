"""ctypes wrappers over the native (C++) host runtime components.

Each wrapper raises on unavailability; callers fall back to the numpy
implementations with the identical contract (accel/_kdtree_np.py,
mesh.load_obj).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .build import ensure_built

_libs: dict = {}


def _load(name: str):
    if name in _libs:
        if _libs[name] is None:
            raise RuntimeError(f"native lib {name} unavailable")
        return _libs[name]
    path = ensure_built(name)
    if path is None or not os.path.exists(path):
        _libs[name] = None
        raise RuntimeError(f"native lib {name} unavailable")
    lib = ctypes.CDLL(path)
    _libs[name] = lib
    return lib


class kdtree_native:
    """Native SAH builder (kdtree_build.cpp) — same contract as
    accel._kdtree_np.build."""

    @staticmethod
    def build(tri_verts: np.ndarray, lane_size: int = 8, max_prims: int = 8,
              intersect_cost: float = 80.0, traversal_cost: float = 80.0,
              empty_bonus: float = 0.0):
        from ..accel import _kdtree_np

        lib = _load("kdtree_build")
        lib.kd_build.restype = ctypes.c_void_p
        lib.kd_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        for fn in ("kd_num_nodes", "kd_num_prims", "kd_max_leaf_lanes", "kd_max_depth"):
            getattr(lib, fn).restype = ctypes.c_int32
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.kd_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        lib.kd_free.argtypes = [ctypes.c_void_p]

        mins, maxs = _kdtree_np.lane_bounds(tri_verts, lane_size)
        mins = np.ascontiguousarray(mins, np.float32)
        maxs = np.ascontiguousarray(maxs, np.float32)
        h = lib.kd_build(
            mins.ctypes.data_as(ctypes.c_void_p), maxs.ctypes.data_as(ctypes.c_void_p),
            np.int32(mins.shape[0]), np.int32(max_prims),
            float(intersect_cost), float(traversal_cost), float(empty_bonus))
        try:
            m = lib.kd_num_nodes(h)
            k = lib.kd_num_prims(h)
            flag = np.empty(m, np.int32)
            split = np.empty(m, np.float32)
            right = np.empty(m, np.int32)
            leaf_start = np.empty(m, np.int32)
            leaf_lanes = np.empty(m, np.int32)
            prims = np.empty(k, np.int32)
            lib.kd_copy(h, *(a.ctypes.data_as(ctypes.c_void_p)
                             for a in (flag, split, right, leaf_start, leaf_lanes, prims)))
            return _kdtree_np.BuiltKD(
                node_flag=flag, node_split=split, node_right=right,
                node_leaf_start=leaf_start, node_leaf_lanes=leaf_lanes,
                bounds_min=mins.min(axis=0), bounds_max=maxs.max(axis=0),
                prim_nums=prims,
                max_leaf_lanes=int(lib.kd_max_leaf_lanes(h)),
                max_depth=int(lib.kd_max_depth(h)),
            )
        finally:
            lib.kd_free(h)


class objloader_native:
    """Native OBJ parser (objloader.cpp) — same contract as mesh.load_obj."""

    @staticmethod
    def load_obj(path: str):
        lib = _load("objloader")
        lib.obj_load.restype = ctypes.c_void_p
        lib.obj_load.argtypes = [ctypes.c_char_p]
        for fn in ("obj_num_verts", "obj_num_faces", "obj_has_normals"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.obj_copy.argtypes = [ctypes.c_void_p] * 4
        lib.obj_free.argtypes = [ctypes.c_void_p]

        h = lib.obj_load(path.encode())
        if not h:
            return None
        try:
            nv = lib.obj_num_verts(h)
            nf = lib.obj_num_faces(h)
            has_n = lib.obj_has_normals(h)
            verts = np.empty((nv, 3), np.float32)
            faces = np.empty((nf, 3), np.int32)
            fnormals = np.empty((nf, 3, 3), np.float32) if has_n else np.empty((0,), np.float32)
            lib.obj_copy(h, verts.ctypes.data_as(ctypes.c_void_p),
                         faces.ctypes.data_as(ctypes.c_void_p),
                         fnormals.ctypes.data_as(ctypes.c_void_p))
            return verts, faces, (fnormals if has_n else None)
        finally:
            lib.obj_free(h)
