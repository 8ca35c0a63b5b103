"""Pallas TPU kernel: ray-tile x triangle-tile Möller–Trumbore closest hit.

The speed-of-light tile kernel from SURVEY.md §7 PR6: a (TILE_R rays) x
(TILE_T tris) block of the reference's 8-wide AVX intersector
(triangle.cpp:22-140) evaluated entirely in VMEM on the VPU — the AVX lane
axis becomes the 128-lane triangle axis, rays occupy sublanes.

Grid: (ray_tiles, tri_chunks); tri chunks stream through VMEM while the
per-ray running (t_best, idx_best) accumulates in the revisited output
block (matmul-K-loop pattern).  Tie-breaking matches the reference lane
scan (lowest triangle index wins) via a min-over-(t, index) pair.

Inputs are pre-swizzled once per scene:
  rays:  (N, 8)  [ox oy oz dx dy dz pad pad]
  tris:  (9, T)  [Ax Ay Az e1x e1y e1z e2x e2y e2z]  (e1 = B-A, e2 = C-A)

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float('inf')


def _mt_kernel(rays_ref, tris_ref, t_ref, idx_ref, *, tile_t: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # ray components as (TILE_R, 1) columns
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]

    # triangle SoA rows as (1, TILE_T)
    ax = tris_ref[0:1, :]
    ay = tris_ref[1:2, :]
    az = tris_ref[2:3, :]
    e1x = tris_ref[3:4, :]
    e1y = tris_ref[4:5, :]
    e1z = tris_ref[5:6, :]
    e2x = tris_ref[6:7, :]
    e2y = tris_ref[7:8, :]
    e2z = tris_ref[8:9, :]

    # pvec = d x e2  -> (TILE_R, TILE_T)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    valid = jnp.abs(det) > 0.0
    inv_det = jnp.where(valid, 1.0, 0.0) / jnp.where(valid, det, 1.0)

    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    u = (tx * px + ty * py + tz * pz) * inv_det
    valid &= (u > 0.0) & (u < 1.0)

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    valid &= (v > 0.0) & (u + v < 1.0)

    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid &= t > 0.0
    t = jnp.where(valid, t, _INF)

    # first-occurrence argmin via (t, col) lexicographic min
    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    t_min = jnp.min(t, axis=1, keepdims=True)  # (TILE_R, 1)
    col_min = jnp.min(jnp.where(t == t_min, cols, jnp.int32(2**30)), axis=1, keepdims=True)

    better = t_min < t_ref[:]
    t_ref[:] = jnp.where(better, t_min, t_ref[:])
    idx_ref[:] = jnp.where(better, j * tile_t + col_min, idx_ref[:])


def swizzle_tris(verts: jnp.ndarray, tile_t: int = 512) -> jnp.ndarray:
    """(T, 3, 3) -> padded (9, T') SoA [A, e1, e2]; zero padding never hits."""
    T = verts.shape[0]
    pad = (-T) % tile_t
    if pad:
        verts = jnp.concatenate([verts, jnp.zeros((pad, 3, 3), verts.dtype)], 0)
    A = verts[:, 0, :]
    e1 = verts[:, 1, :] - A
    e2 = verts[:, 2, :] - A
    return jnp.concatenate([A, e1, e2], axis=1).T  # (9, T')


def swizzle_rays(o: jnp.ndarray, d: jnp.ndarray, tile_r: int = 256):
    """(N,3)x2 -> padded (N', 8); padding rays have d=0 (det==0, no hits)."""
    n = o.shape[0]
    pad = (-n) % tile_r
    z = jnp.zeros((o.shape[0], 2), o.dtype)
    r = jnp.concatenate([o, d, z], axis=1)  # (N, 8)
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, 8), o.dtype)], 0)
    return r, n


@functools.partial(jax.jit, static_argnames=("tile_r", "tile_t", "interpret"))
def mt_closest_pallas(tris_soa: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray,
                      tile_r: int = 256, tile_t: int = 512,
                      interpret: bool = False):
    """Closest-hit over all triangles: returns (t (N,), idx (N,)).

    ``tris_soa`` from :func:`swizzle_tris` (its padding must match tile_t).
    """
    rays, n = swizzle_rays(o, d, tile_r)
    n_pad = rays.shape[0]
    t_total = tris_soa.shape[1]
    assert t_total % tile_t == 0
    grid = (n_pad // tile_r, t_total // tile_t)

    t_out, idx_out = pl.pallas_call(
        functools.partial(_mt_kernel, tile_t=tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(rays, tris_soa)
    return t_out[:n, 0], idx_out[:n, 0]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
