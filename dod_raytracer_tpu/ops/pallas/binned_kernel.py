"""Pallas TPU kernel: binned leaf-dense intersection (wavefront regrouping).

The dragon-scale traversal bottleneck is the per-ray leaf gather (measured
~1.7ms/round for a (16k, 64, 9) row gather — ~22GB/s effective).  This
kernel exploits ray coherence instead: the traversal sorts active rays by
their current kd leaf *block* each round, then a Pallas kernel walks tiles
of TR sorted rays — each tile DMAs ONE precomputed Plücker block matrix
(the tile's lead ray's block, via scalar prefetch) into VMEM and
intersects the whole ray tile against it with one MXU matmul per side
vector (plucker_kernel.py math).  Rays in the tile whose block differs
from the lead are left unprocessed and retry next round (sortedness makes
this rare for coherent rays).

All geometry preprocessing (edge Plücker coordinates, normals) happens
XLA-side in ``pack_block_g`` — the kernel body is just matmul + compare +
min, which keeps Mosaic lowering trivial (jnp.cross/concatenate inside
kernels trips "offset mismatch on non-concat dimension" layout bugs).

This is the wavefront-regrouping mitigation from SURVEY.md §7 hard part #1
and the "speed-of-light" leaf stage: one contiguous ~13KB block DMA + one
ray-tile matmul per tile, instead of TR scattered row gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG_I = 2**30


def pack_block_g(block_verts: jnp.ndarray) -> jnp.ndarray:
    """(B, S, 3, 3) block vertices -> (B, 5, 10, S) per-block Plücker
    matrices [s0|s1|s2|den|num] (plucker_kernel.py math; zero rows from
    vertex padding yield s=den=0 -> rejected)."""
    A = block_verts[..., 0, :]  # (B, S, 3)
    Bv = block_verts[..., 1, :]
    C = block_verts[..., 2, :]
    n = jnp.cross(Bv - A, C - A)
    z3 = jnp.zeros_like(A)
    z1 = jnp.zeros_like(A[..., :1])

    def col(d_rows, w_rows, o_rows, const):
        return jnp.concatenate([d_rows, w_rows, o_rows, const], axis=-1)  # (B, S, 10)

    s0 = col(jnp.cross(A, Bv), Bv - A, z3, z1)
    s1 = col(jnp.cross(Bv, C), C - Bv, z3, z1)
    s2 = col(jnp.cross(C, A), A - C, z3, z1)
    den = col(n, z3, z3, z1)
    num = col(z3, z3, -n, jnp.sum(n * A, axis=-1, keepdims=True))
    G = jnp.stack([s0, s1, s2, den, num], axis=1)  # (B, 5, S, 10)
    return jnp.swapaxes(G, 2, 3)  # (B, 5, 10, S)


def _binned_kernel(lead_ref, rays_ref, keys_ref, g_ref, orig_ref,
                   t_ref, idx_ref, done_ref):
    i = pl.program_id(0)
    lead = lead_ref[i]

    r = rays_ref[:, 0:10]  # (TR, 10) [d, oxd, o, 1]
    keys = keys_ref[:, 0]  # (TR,)
    process = (keys == lead)[:, None]  # (TR, 1)

    s0 = jnp.dot(r, g_ref[0, 0], preferred_element_type=jnp.float32)  # (TR, S)
    s1 = jnp.dot(r, g_ref[0, 1], preferred_element_type=jnp.float32)
    s2 = jnp.dot(r, g_ref[0, 2], preferred_element_type=jnp.float32)
    den = jnp.dot(r, g_ref[0, 3], preferred_element_type=jnp.float32)
    num = jnp.dot(r, g_ref[0, 4], preferred_element_type=jnp.float32)

    orig = orig_ref[0, 0]  # (S,)
    pos = (s0 > 0.0) & (s1 > 0.0) & (s2 > 0.0)
    neg = (s0 < 0.0) & (s1 < 0.0) & (s2 < 0.0)
    valid = (pos | neg) & (den != 0.0) & (orig >= 0)[None, :]
    t = jnp.where(valid, num, 0.0) / jnp.where(valid, den, 1.0)
    valid &= t > 0.0
    t = jnp.where(valid & process, t, _INF)

    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    t_min = jnp.min(t, axis=1, keepdims=True)  # (TR, 1)
    col_min = jnp.min(jnp.where(t == t_min, cols, _BIG_I), axis=1, keepdims=True)
    # original tri id of the winner (col -> orig gather via min-where)
    orig_b = jnp.broadcast_to(orig[None, :], t.shape)
    idx_min = jnp.min(jnp.where(cols == col_min, orig_b, _BIG_I), axis=1, keepdims=True)

    t_ref[:] = t_min
    idx_ref[:] = idx_min
    done_ref[:] = process.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def binned_block_intersect(lead_blocks, rays_sorted, keys_sorted,
                           block_g, block_orig,
                           tile_r: int = 256, interpret: bool = False):
    """Per sorted ray: (t_cand, orig_idx_cand, processed).

    Args:
      lead_blocks: (N/TR,) i32 — block id each tile intersects (clamped).
      rays_sorted: (N, 16) f32 Plücker ray rows [d, oxd, o, 1, pad].
      keys_sorted: (N, 1) i32 — each ray's block id (or big sentinel).
      block_g: (B, 5, 10, S) f32 from pack_block_g; block_orig: (B, S) i32.
    """
    n = rays_sorted.shape[0]
    assert n % tile_r == 0
    grid = (n // tile_r,)
    S = block_g.shape[3]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 16), lambda i, lead: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, lead: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, 10, S), lambda i, lead: (lead[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, S): Mosaic requires the last two block dims divisible by
            # (8, 128) or equal to the array dims — (1, S) over (B, S) is not
            pl.BlockSpec((1, 1, S), lambda i, lead: (lead[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_r, 1), lambda i, lead: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, lead: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i, lead: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    t, idx, done = pl.pallas_call(
        _binned_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(lead_blocks, rays_sorted, keys_sorted, block_g, block_orig[:, None, :])
    return t[:, 0], idx[:, 0], done[:, 0].astype(bool)
