"""Pallas TPU kernel: MXU-formulated ray-triangle closest hit (Plücker).

The VPU-bound Möller–Trumbore kernel (mt_kernel.py) spends ~60 elementwise
ops per ray-triangle pair.  This kernel reformulates the test so the bulk
of the arithmetic is ONE matmul on the MXU (systolic array):

  ray feature vector   r = [d, o x d, o, 1]                  (10,)
  per-triangle matrix  G in R^{10 x 5} with columns
    s0 = d.(AxB) + (B-A).(oxd)     edge AB side   (Plücker permuted dot)
    s1 = d.(BxC) + (C-B).(oxd)     edge BC side
    s2 = d.(CxA) + (A-C).(oxd)     edge CA side
    den = n.d                       (n = (B-A)x(C-A);  den == -det_MT)
    num = n.A - n.o

  S = r @ G  -> [s0 s1 s2 den num] per pair;  hit iff the three edge
  sides share a strict sign and den != 0;  t = num / den > 0.

Mathematically equivalent to the reference's Möller–Trumbore validity
ladder (triangle.cpp:73-111: strict inequalities, double-sided, det==0
rejected) with different floating-point rounding — this is the *fast*
path; the mt kernels remain the bit-faithful parity path.

Layout: G is packed host/XLA-side as (5, 10, T) so each tri tile is a
contiguous (5, 10, TILE_T) block; the kernel issues five K=10 matmuls per
tile and reduces on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mt_kernel import swizzle_rays

_INF = float("inf")


def plucker_pack(verts: jnp.ndarray, tile_t: int = 512) -> jnp.ndarray:
    """(T, 3, 3) -> (5, 10, T') packed per-triangle matrices (zero-padded;
    a zero G column yields s=den=0 -> rejected)."""
    T = verts.shape[0]
    pad = (-T) % tile_t
    if pad:
        verts = jnp.concatenate([verts, jnp.zeros((pad, 3, 3), verts.dtype)], 0)
    A = verts[:, 0, :]
    B = verts[:, 1, :]
    C = verts[:, 2, :]
    n = jnp.cross(B - A, C - A)
    zeros3 = jnp.zeros_like(A)
    zeros1 = jnp.zeros_like(A[:, :1])
    ones1 = jnp.ones_like(zeros1)

    def col(d_rows, w_rows, o_rows, const):
        return jnp.concatenate([d_rows, w_rows, o_rows, const], axis=1)  # (T', 10)

    s0 = col(jnp.cross(A, B), B - A, zeros3, zeros1)
    s1 = col(jnp.cross(B, C), C - B, zeros3, zeros1)
    s2 = col(jnp.cross(C, A), A - C, zeros3, zeros1)
    den = col(n, zeros3, zeros3, zeros1)
    num = col(zeros3, zeros3, -n, jnp.sum(n * A, axis=1, keepdims=True))
    G = jnp.stack([s0, s1, s2, den, num], axis=0)  # (5, T', 10)
    return jnp.transpose(G, (0, 2, 1))  # (5, 10, T')


def _plucker_kernel(rays_ref, g_ref, t_ref, idx_ref, *, tile_t: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    r = rays_ref[:, 0:10]  # (TILE_R, 10): [d, oxd, o, 1]
    # HIGHEST: the default TPU f32 dot is one-pass bf16, which loses
    # geometric precision and flips borderline hits vs the exact VPU oracle
    hi = jax.lax.Precision.HIGHEST
    s0 = jnp.dot(r, g_ref[0], preferred_element_type=jnp.float32, precision=hi)
    s1 = jnp.dot(r, g_ref[1], preferred_element_type=jnp.float32, precision=hi)
    s2 = jnp.dot(r, g_ref[2], preferred_element_type=jnp.float32, precision=hi)
    den = jnp.dot(r, g_ref[3], preferred_element_type=jnp.float32, precision=hi)
    num = jnp.dot(r, g_ref[4], preferred_element_type=jnp.float32, precision=hi)

    pos = (s0 > 0.0) & (s1 > 0.0) & (s2 > 0.0)
    neg = (s0 < 0.0) & (s1 < 0.0) & (s2 < 0.0)
    valid = (pos | neg) & (den != 0.0)
    t = jnp.where(valid, num, 0.0) / jnp.where(valid, den, 1.0)
    valid &= t > 0.0
    t = jnp.where(valid, t, _INF)

    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    t_min = jnp.min(t, axis=1, keepdims=True)
    col_min = jnp.min(jnp.where(t == t_min, cols, jnp.int32(2**30)), axis=1, keepdims=True)
    better = t_min < t_ref[:]
    t_ref[:] = jnp.where(better, t_min, t_ref[:])
    idx_ref[:] = jnp.where(better, j * tile_t + col_min, idx_ref[:])


def swizzle_rays_plucker(o: jnp.ndarray, d: jnp.ndarray, tile_r: int = 256):
    """(N,3)x2 -> padded (N', 16) [d, oxd, o, 1, 0...]; padding rays have
    d = 0 so every side/den is 0 -> rejected."""
    n = o.shape[0]
    w = jnp.cross(o, d)
    ones = jnp.ones((n, 1), o.dtype)
    zeros = jnp.zeros((n, 6), o.dtype)
    r = jnp.concatenate([d, w, o, ones, zeros], axis=1)  # (N, 16)
    pad = (-n) % tile_r
    if pad:
        r = jnp.concatenate([r, jnp.zeros((pad, 16), o.dtype)], 0)
    return r, n


@functools.partial(jax.jit, static_argnames=("tile_r", "tile_t", "interpret"))
def plucker_closest(g_packed: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray,
                    tile_r: int = 256, tile_t: int = 512,
                    interpret: bool = False):
    """Closest hit over all triangles: returns (t (N,), idx (N,))."""
    rays, n = swizzle_rays_plucker(o, d, tile_r)
    n_pad = rays.shape[0]
    t_total = g_packed.shape[2]
    assert t_total % tile_t == 0 and g_packed.shape[:2] == (5, 10)
    grid = (n_pad // tile_r, t_total // tile_t)

    t_out, idx_out = pl.pallas_call(
        functools.partial(_plucker_kernel, tile_t=tile_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 10, tile_t), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
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
    )(rays, g_packed)
    return t_out[:n, 0], idx_out[:n, 0]
