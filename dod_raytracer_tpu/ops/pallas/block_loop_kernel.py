"""Pallas TPU kernel: sort-free leaf stage — per-tile distinct-block loop.

A binned design that sorted rays by leaf block every round was measured 8x
SLOWER than the plain row gather on v5e (per-round lax.sort + permutes).
This kernel keeps rays in their fixed tiles and instead loops INSIDE the
kernel over the distinct blocks the tile's rays currently need,
smallest-first:

  while any ray unprocessed:
      blk  = min(remaining keys)            # scalar, VPU reduction
      DMA  block_g[blk] HBM -> VMEM         # one contiguous ~25-50KB copy
      hit  = one (TR,16)x(16,5*Spad) MXU matmul vs the block
      fold results into rays with key==blk; mark them processed

Every ray with work processes exactly its current block each call —
identical semantics to the gather traversal (same per-ray block order,
same strict-min tie-breaks) with zero sorts and zero HBM row gathers.
Cost per tile is (distinct blocks in tile) x (DMA + matmul); camera and
shadow wavefronts are spatially coherent so distinct-block counts stay
small.

Block matrix layout (pack_block_g): (B, 16, 5*Spad) f32 where Spad is the
block triangle count padded to the 128-lane tile, and the five Spad-wide
sections are the Plücker side/denominator/numerator columns
[s0|s1|s2|den|num] (plucker_kernel.py math).  The 16 feature rows match
the swizzled ray vector [d, oxd, o, 1, 0...]; zero rows keep the matmul
K-dim at the MXU-friendly 16.  Section boundaries at multiples of Spad
keep every in-kernel slice 128-aligned (Mosaic DMA/slice requirement).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG_I = 2**30  # plain int: a jnp scalar would be a captured constant in the kernel


def pad_blocks(S: int) -> int:
    """Triangle-axis padding: Mosaic slices must be 128-lane aligned."""
    return ((S + 127) // 128) * 128


def pack_block_g(block_verts: jnp.ndarray) -> jnp.ndarray:
    """(B, S, 3, 3) block vertices -> (B, 16, 5*Spad) Plücker matrices."""
    B, S = block_verts.shape[:2]
    spad = pad_blocks(S)
    A = block_verts[..., 0, :]  # (B, S, 3)
    Bv = block_verts[..., 1, :]
    C = block_verts[..., 2, :]
    n = jnp.cross(Bv - A, C - A)
    z3 = jnp.zeros_like(A)
    z1 = jnp.zeros_like(A[..., :1])

    def col(d_rows, w_rows, o_rows, const):
        # feature layout must match swizzle_rays_plucker: [d, oxd, o, 1, 0x6]
        return jnp.concatenate([d_rows, w_rows, o_rows, const,
                                jnp.tile(z1, (1, 1, 6))], axis=-1)  # (B, S, 16)

    s0 = col(jnp.cross(A, Bv), Bv - A, z3, z1)
    s1 = col(jnp.cross(Bv, C), C - Bv, z3, z1)
    s2 = col(jnp.cross(C, A), A - C, z3, z1)
    den = col(n, z3, z3, z1)
    num = col(z3, z3, -n, jnp.sum(n * A, axis=-1, keepdims=True))
    G = jnp.stack([s0, s1, s2, den, num], axis=1)  # (B, 5, S, 16)
    if spad != S:
        G = jnp.pad(G, ((0, 0), (0, 0), (0, spad - S), (0, 0)))
    G = jnp.swapaxes(G, 2, 3)  # (B, 5, 16, Spad)
    return G.transpose(0, 2, 1, 3).reshape(B, 16, 5 * spad)


def _kernel(rays_ref, keys_ref, g_hbm, orig_hbm, t_ref, idx_ref,
            g_vmem, orig_vmem, sem_g, sem_o, *, num_blocks: int, spad: int):
    r = rays_ref[:]             # (TR, 16) [d, oxd, o, 1, 0...]
    keys = keys_ref[:, 0:1]     # (TR, 1)

    t_ref[:] = jnp.full_like(t_ref, _INF)
    idx_ref[:] = jnp.full_like(idx_ref, _BIG_I)

    sentinel = jnp.int32(_BIG_I)

    def cond(state):
        remaining, _, _ = state
        return jnp.min(remaining) < sentinel

    def body(state):
        remaining, t_acc, idx_acc = state
        blk = jnp.min(remaining)  # scalar i32 — smallest outstanding block

        cp_g = pltpu.make_async_copy(g_hbm.at[blk], g_vmem, sem_g)
        cp_o = pltpu.make_async_copy(orig_hbm.at[blk], orig_vmem, sem_o)
        cp_g.start()
        cp_o.start()
        cp_g.wait()
        cp_o.wait()

        # HIGHEST: one-pass-bf16 default rounds ray/plane coefficients and
        # flips borderline hits vs the exact-f32 XLA traversal
        out = jnp.dot(r, g_vmem[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)  # (TR, 5*Spad)
        s0 = out[:, 0 * spad:1 * spad]
        s1 = out[:, 1 * spad:2 * spad]
        s2 = out[:, 2 * spad:3 * spad]
        den = out[:, 3 * spad:4 * spad]
        num = out[:, 4 * spad:5 * spad]

        orig = orig_vmem[0]  # (Spad,) i32
        pos = (s0 > 0.0) & (s1 > 0.0) & (s2 > 0.0)
        neg = (s0 < 0.0) & (s1 < 0.0) & (s2 < 0.0)
        valid = (pos | neg) & (den != 0.0) & (orig >= 0)[None, :]
        t = jnp.where(valid, num, 0.0) / jnp.where(valid, den, 1.0)
        valid &= t > 0.0

        process = remaining == blk  # (TR, 1)
        t = jnp.where(valid & process, t, _INF)

        cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        t_min = jnp.min(t, axis=1, keepdims=True)      # (TR, 1)
        col_min = jnp.min(jnp.where(t == t_min, cols, _BIG_I), axis=1, keepdims=True)
        orig_b = jnp.broadcast_to(orig[None, :], t.shape)
        idx_min = jnp.min(jnp.where(cols == col_min, orig_b, _BIG_I), axis=1,
                          keepdims=True)

        hit = process & (t_min < _INF)
        t_acc = jnp.where(hit, t_min, t_acc)
        idx_acc = jnp.where(hit, idx_min, idx_acc)
        remaining = jnp.where(process, sentinel, remaining)
        return remaining, t_acc, idx_acc

    remaining0 = jnp.where(keys < num_blocks, keys, sentinel)
    _, t_out, idx_out = jax.lax.while_loop(
        cond, body, (remaining0, t_ref[:], idx_ref[:]))
    t_ref[:] = t_out
    idx_ref[:] = idx_out


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def block_loop_intersect(rays, keys, block_g, block_orig,
                         tile_r: int = 256, interpret: bool = False):
    """Per ray: (t_cand (N,), orig_idx_cand (N,)) for its current block.

    Rays with keys >= num_blocks get (inf, big).  No sorting; rays stay in
    their natural (coherent) order.  ``block_orig`` is the (B, S) original
    triangle id array; it is padded here to the kernel's Spad lanes.
    """
    n = rays.shape[0]
    assert n % tile_r == 0
    grid = (n // tile_r,)
    B, K, SP5 = block_g.shape
    assert K == 16 and SP5 % 5 == 0
    spad = SP5 // 5
    S = block_orig.shape[1]
    orig = block_orig
    if S != spad:
        orig = jnp.pad(orig, ((0, 0), (0, spad - S)), constant_values=-1)

    t, idx = pl.pallas_call(
        functools.partial(_kernel, num_blocks=B, spad=spad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # block_g stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # block_orig stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, 5 * spad), jnp.float32),
            pltpu.VMEM((1, spad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(rays, keys, block_g, orig[:, None, :])
    return t[:, 0], idx[:, 0]
