"""Host-side mesh pipeline: OBJ loading, vertex joining, smooth normals.

Functional equivalent of the reference's assimp import (``mesh.cpp:11-14``:
``aiProcess_Triangulate | JoinIdenticalVertices | GenSmoothNormals``) and
the per-face flattening into triangle lanes (``mesh.cpp:36-48``), without
the external C++ dependency:

* ``load_obj``       — minimal OBJ parser (v / vn / f with fan
  triangulation of polygons == aiProcess_Triangulate).
* ``join_identical`` — exact-position vertex dedup (JoinIdenticalVertices).
* ``smooth_normals`` — per-vertex average of adjacent normalized face
  normals (GenSmoothNormals with the default all-smoothing angle).
* ``mesh_to_triangles`` — flatten to the renderer's (T, 3, 3) soup.

A fast C++ parser (``native/objloader.cpp``) is used when built; this
numpy path is the oracle and fallback.

``dragon`` asset note: the reference scene loads ``assets/dragon.obj``
(main.cpp:135) but the blob was stripped from the snapshot
(``/root/reference/.MISSING_LARGE_BLOBS:1`` — ~870k tris per
BASELINE.json).  ``procedural_dragon`` synthesizes a deterministic
coiled-knot mesh with a matching triangle count (default 869,888) so the
dragon-scale benchmarks and kd-tree stress paths remain exercisable.
"""

from __future__ import annotations

import os

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def load_obj(path: str, use_native: bool = True):
    """Parse an OBJ file -> (verts (V,3) f32, faces (F,3) i32, vn or None).

    Supports ``v``, ``vn`` and ``f`` records; face vertices may be ``i``,
    ``i/t``, ``i//n`` or ``i/t/n`` and may be negative (relative); polygons
    are fan-triangulated (aiProcess_Triangulate equivalent).
    """
    if use_native:
        try:
            from .native import objloader_native

            out = objloader_native.load_obj(path)
            if out is not None:
                return out
        except Exception:
            pass
    verts, normals, faces, face_normals = [], [], [], []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("vn "):
                parts = line.split()
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                parts = line.split()[1:]
                idx = []
                nidx = []
                for p in parts:
                    comps = p.split("/")
                    vi = int(comps[0])
                    idx.append(vi - 1 if vi > 0 else len(verts) + vi)
                    if len(comps) >= 3 and comps[2]:
                        ni = int(comps[2])
                        nidx.append(ni - 1 if ni > 0 else len(normals) + ni)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))
                    if len(nidx) == len(idx):
                        face_normals.append((nidx[0], nidx[k], nidx[k + 1]))
    v = np.asarray(verts, np.float32)
    fc = np.asarray(faces, np.int32)
    vn = None
    if normals and len(face_normals) == len(faces):
        vn = np.asarray(normals, np.float32)[np.asarray(face_normals, np.int32)]  # (F,3,3)
    return v, fc, vn


def join_identical(verts: np.ndarray, faces: np.ndarray):
    """Merge exactly-coincident vertices (aiProcess_JoinIdenticalVertices)."""
    uniq, inverse = np.unique(verts, axis=0, return_inverse=True)
    return uniq.astype(np.float32), inverse.astype(np.int32)[faces]


def smooth_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Per-vertex smooth normals: normalize(sum of adjacent unit face
    normals) — aiProcess_GenSmoothNormals at the default (all-smoothing)
    angle.  Degenerate faces contribute zero."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    fn = np.cross(b - a, c - a)
    ln = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = np.divide(fn, ln, out=np.zeros_like(fn), where=ln > 0)
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    ln = np.linalg.norm(vn, axis=1, keepdims=True)
    vn = np.divide(vn, ln, out=np.zeros_like(vn), where=ln > 0)
    return vn.astype(np.float32)


def mesh_to_triangles(verts: np.ndarray, faces: np.ndarray, vertex_normals: np.ndarray):
    """Flatten to the renderer's soup: ((T,3,3) verts, (T,3,3) normals),
    one row per face corner in A/B/C order (Triangle::create protocol,
    triangle.cpp:262-292)."""
    tv = verts[faces]  # (T, 3, 3)
    tn = vertex_normals[faces]
    return tv.astype(np.float32), tn.astype(np.float32)


def load_mesh(path: str):
    """Full assimp-equivalent pipeline for one OBJ file."""
    verts, faces, vn_per_face = load_obj(path)
    if vn_per_face is not None:
        return verts[faces].astype(np.float32), vn_per_face.astype(np.float32)
    verts, faces = join_identical(verts, faces)
    vn = smooth_normals(verts, faces)
    return mesh_to_triangles(verts, faces, vn)


def procedural_dragon(num_tris: int = 869_888, seed: int = 7):
    """Deterministic high-poly dragon stand-in: a trefoil-knot tube with
    radial displacement ripples, scaled into the reference's +-5 box.

    (p, q) = (3, 2) torus knot; ``num_tris`` rounds to segments*rings*2.
    """
    rings = 368
    segs = max(4, int(round(num_tris / (2 * rings))))
    t = np.linspace(0.0, 2.0 * np.pi, segs, endpoint=False, dtype=np.float64)
    p, q = 3.0, 2.0
    r = np.cos(q * t) + 2.0
    center = np.stack([r * np.cos(p * t), r * np.sin(p * t), -np.sin(q * t)], axis=1)
    # Frenet-ish frame
    dt = np.roll(center, -1, axis=0) - np.roll(center, 1, axis=0)
    tang = dt / np.linalg.norm(dt, axis=1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    side = np.cross(tang, up)
    side /= np.linalg.norm(side, axis=1, keepdims=True)
    up2 = np.cross(side, tang)

    theta = np.linspace(0.0, 2.0 * np.pi, rings, endpoint=False, dtype=np.float64)
    tube_r = 0.55 + 0.12 * np.sin(9.0 * t)[:, None] + 0.05 * np.cos(7.0 * theta)[None, :]
    circ = (
        center[:, None, :]
        + tube_r[..., None] * (np.cos(theta)[None, :, None] * side[:, None, :]
                               + np.sin(theta)[None, :, None] * up2[:, None, :])
    )  # (segs, rings, 3)
    # scale into the box, teapot-like footprint
    circ *= 1.05
    verts = circ.reshape(-1, 3).astype(np.float32)

    i = np.arange(segs)[:, None]
    j = np.arange(rings)[None, :]
    v00 = (i * rings + j).ravel()
    v01 = (i * rings + (j + 1) % rings).ravel()
    v10 = (((i + 1) % segs) * rings + j).ravel()
    v11 = (((i + 1) % segs) * rings + (j + 1) % rings).ravel()
    faces = np.concatenate(
        [np.stack([v00, v10, v11], axis=1), np.stack([v00, v11, v01], axis=1)], axis=0
    ).astype(np.int32)
    vn = smooth_normals(verts, faces)
    return mesh_to_triangles(verts, faces, vn)


def load_mesh_asset(name: str):
    """Named asset loader: 'teapot' (the committed reference mesh),
    'dragon' (procedural stand-in, cached), or a filesystem path."""
    if name == "teapot":
        return load_mesh(os.path.join(_ASSET_DIR, "teapot.obj"))
    if name == "dragon":
        cache = os.path.join(_ASSET_DIR, "dragon_proc.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            return z["verts"], z["normals"]
        tv, tn = procedural_dragon()
        try:
            np.savez_compressed(cache, verts=tv, normals=tn)
        except OSError:
            pass
        return tv, tn
    return load_mesh(name)
