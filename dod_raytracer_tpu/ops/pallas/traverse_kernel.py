"""Pallas TPU megakernel: the ENTIRE kd traversal in one kernel.

The XLA wavefront traversal (ops/traverse.py) is gather-bound: every
interior step pays a ~200us (N-row) HBM table gather and every leaf round
a ~1.7ms block gather, because XLA row gathers on v5e run at ~13ns/row +
~37GB/s.  This kernel keeps ALL traversal state and the node table in
VMEM, so an interior step is a handful of VPU ops and a leaf round is one
contiguous DMA + one MXU matmul per distinct block:

  grid over 1024-ray tiles; per tile:
    node table (Mpad, 8) resident in VMEM
    while any ray active:
        descend: per-step one-hot MXU row lookup + near/far logic
        leaf:    distinct-block loop — DMA block_g[blk] + Plücker matmul
        pop:     one-hot stack restore

The per-ray node lookup CANNOT be a ``tpu.dynamic_gather``: Mosaic
requires the source to fit a single vreg along the gather dimension
(8 sublanes for f32), and the node table has up to 1024 rows.  Instead
the lookup is a (TILE, Mpad) one-hot @ (Mpad, 8) MXU matmul — exact,
because each one-hot row has a single 1.0 so every output element is a
plain f32 product with no accumulation.  The fetched row is carried in
loop state so each descend step pays exactly one matmul.  Cost is
O(TILE * M) per step, which is why the kernel is gated to M <= 1024
(the caller falls back to the XLA traversal for bigger trees).

Semantics are the reference pbrt-style walk (kdtree.cpp:263-361), matching
ops/traverse.py exactly: near/far ordering with the origin-on-plane tie
rule, far-skip rules, fixed worklist stack, strict-improvement leaf hits,
early any-hit exit, and the clip-vs-tmin break check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG_I = 2**30

TILE = 256  # rays per tile — the (TILE, Mpad) one-hot transient, the carried
# (TILE, 128) row and the stacks all scale with TILE; 1024 blows VMEM
MAX_NODES = 1024  # one-hot lookup is O(M) per ray-step; cap the table


def pack_nodes_mega(kd, tile: int = TILE) -> jnp.ndarray:
    """(Mpad, 8) f32 node table [flag|split|right|leaf_start|leaf_lanes|
    block0|0...]; int columns are stored as *values* (exact in f32 below 2^24),
    not bitcasts, so the in-kernel decode is a cheap float->int convert.
    block0 = leaf_start // block_lanes precomputed per leaf.  Rows padded to
    a 128 multiple (matmul K dim); columns padded to 128 (one full MXU tile,
    and the natural layout for the loop-carried fetched row)."""
    M = kd.node_flag.shape[0]
    assert M <= MAX_NODES, (M, MAX_NODES)
    mpad = max(128, -(-M // 128) * 128)
    f = lambda a: a.astype(jnp.float32)
    block0 = kd.node_leaf_start // max(kd.block_lanes, 1)
    tbl = jnp.stack([
        f(kd.node_flag), kd.node_split, f(kd.node_right),
        f(kd.node_leaf_start), f(kd.node_leaf_lanes), f(block0)], axis=1)
    return jnp.pad(tbl, ((0, mpad - M), (0, 128 - tbl.shape[1])))


def _kernel(tbl_ref, o_ref, d_ref, invd_ref, tmin_ref, tmax_ref, act_ref,
            rays_ref, g_hbm, orig_hbm,
            t_ref, idx_ref, found_ref,
            g_vmem, orig_vmem, sem_g, sem_o,
            *, num_blocks: int, spad: int, block_lanes: int, stack_depth: int,
            any_hit: bool):
    tbl = tbl_ref[:]                    # (Mpad, 128) f32 (6 used cols)
    o = o_ref[:]                        # (TILE, 4) [x y z pad]
    d = d_ref[:]
    inv_d = invd_ref[:]
    r16 = rays_ref[:]                   # (TILE, 16) Plücker rows

    tmin0 = tmin_ref[:, 0:1]            # (TILE, 1)
    tmax0 = tmax_ref[:, 0:1]
    t_max = tmax_ref[:, 1:2]            # column 1 carries the clip (t_max)
    act0_i = act_ref[:, 0:1]            # i32 0/1 — i1 can't be loop state

    zero_i = jnp.zeros_like(tmin0, dtype=jnp.int32)  # (TILE, 1) i32

    def fetch(node):
        """node (TILE,1) i32 -> that node's row, (TILE,128) f32.

        One-hot MXU lookup (see module docstring): Mosaic's dynamic_gather
        cannot cross vregs along the gather dim, so gather-by-matmul.
        Exact — one 1.0 per row means every output is a single product."""
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (node.shape[0], tbl.shape[0]), 1)
        onehot = (cols == node).astype(jnp.float32)
        # HIGHEST: the default one-pass bf16 dot would round node ids
        # (>8 mantissa bits).  bf16x3 (Precision.HIGH) would already be
        # exact for a one-hot operand, but Mosaic only implements
        # DEFAULT/HIGHEST ("Unsupported dot precision: HIGH").
        return jnp.dot(onehot, tbl, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def stack_set(st, sp, value, do):
        rows = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        hit = (rows == sp[:, 0][None, :]) & do[:, 0][None, :]
        return jnp.where(hit, value[:, 0][None, :].astype(st.dtype), st)

    def stack_get(st, sp):
        rows = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        onehot = rows == sp[:, 0][None, :]
        lo = jnp.float32(-3e38) if st.dtype == jnp.float32 else jnp.int32(-_BIG_I)
        return jnp.max(jnp.where(onehot, st, lo), axis=0)[:, None]

    def axis_sel(v, axis):
        """v (TILE,4), axis (TILE,1) in {0..3} -> (TILE,1).  Mosaic's
        dynamic_gather needs operand.shape == indices.shape."""
        idx = jnp.broadcast_to(axis, v.shape)
        return jnp.take_along_axis(v, idx, axis=1)[:, 0:1]

    state0 = dict(
        active=act0_i,
        node=zero_i,
        row=fetch(zero_i),
        tmin=tmin0, tmax=tmax0,
        sp=zero_i,
        cursor=zero_i,
        t_best=t_max,
        prim_best=jnp.full_like(zero_i, -1),
        found=jnp.zeros_like(zero_i),
        stn=jnp.zeros((stack_depth, o.shape[0]), jnp.int32),
        stt=jnp.zeros((stack_depth, o.shape[0]), jnp.float32),
        stx=jnp.zeros((stack_depth, o.shape[0]), jnp.float32),
    )

    def outer_cond(s):
        return jnp.any(s["active"] != 0)

    def outer_body(s):
        # ---------------- descend to leaves ----------------
        def des_cond(s2):
            fl = s2["row"][:, 0:1]
            return jnp.any((s2["active"] != 0) & (fl < 2.5))

        def des_body(s2):
            row = s2["row"]
            flag = row[:, 0:1]
            split = row[:, 1:2]
            right = row[:, 2:3].astype(jnp.int32)
            act_in = s2["active"] != 0
            clip = jnp.minimum(s2["t_best"], t_max)
            act = act_in & ~(clip < s2["tmin"])
            interior = act & (flag < 2.5)

            axis = flag.astype(jnp.int32)
            o_ax = axis_sel(o, axis)
            d_ax = axis_sel(d, axis)
            inv_ax = axis_sel(inv_d, axis)
            t_plane = (split - o_ax) * inv_ax
            left_first = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))
            node = s2["node"]
            near = jnp.where(left_first, node + 1, right)
            far = jnp.where(left_first, right, node + 1)

            skip_far = (t_plane > s2["tmax"]) | (t_plane <= 0.0)
            skip_near = ~skip_far & (t_plane < s2["tmin"])
            push = ~skip_far & ~skip_near

            node_i = jnp.where(skip_far | push, near, jnp.where(skip_near, far, near))
            tmax_i = jnp.where(push, t_plane, s2["tmax"])

            do_push = interior & push
            sp = s2["sp"]
            sp_c = jnp.minimum(sp, stack_depth - 1)
            stn = stack_set(s2["stn"], sp_c, far, do_push)
            stt = stack_set(s2["stt"], sp_c, t_plane, do_push)
            stx = stack_set(s2["stx"], sp_c, s2["tmax"], do_push)
            sp = jnp.where(do_push, sp + 1, sp)

            was_interior = act_in & (flag < 2.5)
            node_new = jnp.where(interior, node_i, node)
            active_new = (was_interior & act) | (~was_interior & act_in)
            return dict(
                s2,
                active=active_new.astype(jnp.int32),
                node=node_new,
                row=fetch(node_new),
                tmax=jnp.where(interior, tmax_i, s2["tmax"]),
                sp=sp, stn=stn, stt=stt, stx=stx,
            )

        s = jax.lax.while_loop(des_cond, des_body, s)

        # ---------------- leaf: distinct-block loop ----------------
        row = s["row"]
        leaf_lanes = row[:, 4:5].astype(jnp.int32)
        block0 = row[:, 5:6].astype(jnp.int32)

        act = s["active"] != 0
        clip = jnp.minimum(s["t_best"], t_max)
        act = act & ~(clip < s["tmin"])
        has_work = act & (s["cursor"] < leaf_lanes)
        key = jnp.where(has_work, block0 + s["cursor"] // block_lanes,
                        jnp.int32(_BIG_I))

        def blk_cond(bs):
            remaining, _, _, _ = bs
            return jnp.min(remaining) < jnp.int32(_BIG_I)

        def blk_body(bs):
            remaining, t_best, prim_best, found = bs
            blk = jnp.min(remaining)

            cp_g = pltpu.make_async_copy(g_hbm.at[blk], g_vmem, sem_g)
            cp_o = pltpu.make_async_copy(orig_hbm.at[blk], orig_vmem, sem_o)
            cp_g.start()
            cp_o.start()
            cp_g.wait()
            cp_o.wait()

            out = jnp.dot(r16, g_vmem[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            s0 = out[:, 0 * spad:1 * spad]
            s1 = out[:, 1 * spad:2 * spad]
            s2_ = out[:, 2 * spad:3 * spad]
            den = out[:, 3 * spad:4 * spad]
            num = out[:, 4 * spad:5 * spad]

            orig = orig_vmem[0]
            pos = (s0 > 0.0) & (s1 > 0.0) & (s2_ > 0.0)
            neg = (s0 < 0.0) & (s1 < 0.0) & (s2_ < 0.0)
            valid = (pos | neg) & (den != 0.0) & (orig >= 0)[None, :]
            t = jnp.where(valid, num, 0.0) / jnp.where(valid, den, 1.0)
            valid &= t > 0.0

            process = remaining == blk
            t = jnp.where(valid & process, t, _INF)

            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            t_min = jnp.min(t, axis=1, keepdims=True)
            col_min = jnp.min(jnp.where(t == t_min, cols, _BIG_I), axis=1,
                              keepdims=True)
            orig_b = jnp.broadcast_to(orig[None, :], t.shape)
            idx_min = jnp.min(jnp.where(cols == col_min, orig_b, _BIG_I),
                              axis=1, keepdims=True)

            clip_b = jnp.minimum(t_best, t_max)
            improved = process & (t_min < clip_b)
            t_best = jnp.where(improved, t_min, t_best)
            prim_best = jnp.where(improved, idx_min, prim_best)
            found = found | improved.astype(jnp.int32)
            remaining = jnp.where(process, jnp.int32(_BIG_I), remaining)
            return remaining, t_best, prim_best, found

        _, t_best, prim_best, found = jax.lax.while_loop(
            blk_cond, blk_body, (key, s["t_best"], s["prim_best"], s["found"]))

        cursor = jnp.where(has_work, s["cursor"] + block_lanes, s["cursor"])
        leaf_done = act & (cursor >= leaf_lanes)
        if any_hit:
            newly = t_best < s["t_best"]
            leaf_done = leaf_done & ~newly
            act = act & ~newly

        sp = s["sp"]
        can_pop = sp > 0
        pop = leaf_done & can_pop
        sp_pop = jnp.maximum(sp - 1, 0)
        node = jnp.where(pop, stack_get(s["stn"], sp_pop), s["node"])
        tmin = jnp.where(pop, stack_get(s["stt"], sp_pop), s["tmin"])
        tmax = jnp.where(pop, stack_get(s["stx"], sp_pop), s["tmax"])
        act = act & ~(leaf_done & ~can_pop)
        sp = jnp.where(pop, sp - 1, sp)
        cursor = jnp.where(pop, 0, cursor)

        return dict(
            s, active=act.astype(jnp.int32), node=node, row=fetch(node),
            tmin=tmin, tmax=tmax, sp=sp, cursor=cursor, t_best=t_best,
            prim_best=prim_best, found=found,
        )

    out = jax.lax.while_loop(outer_cond, outer_body, state0)
    t_ref[:] = out["t_best"]
    idx_ref[:] = out["prim_best"]
    found_ref[:] = out["found"].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_lanes", "stack_depth",
                                             "any_hit", "interpret"))
def mega_traverse(tbl, o4, d4, invd4, tmin, tmax_clip, active, rays,
                  block_g, block_orig_p,
                  block_lanes: int, stack_depth: int,
                  any_hit: bool = False, interpret: bool = False):
    """Full kd traversal for N rays (N % TILE == 0).

    Args (all padded to TILE multiples by the caller):
      tbl: (Mpad, 128) node table from pack_nodes_mega.
      o4/d4/invd4: (N, 4) ray origin/dir/inverse-dir (4th col padding).
      tmin: (N, 1) entry t; tmax_clip: (N, 2) [exit t, clip t_max].
      active: (N, 1) i32 root-hit mask.
      rays: (N, 16) Plücker rows; block_g: (B, 16, 5*Spad);
      block_orig_p: (B, 1, Spad) i32 (padded, -1 fill).
    Returns (t_best (N,1), prim (N,1), found (N,1) i32).
    """
    n = o4.shape[0]
    assert n % TILE == 0
    grid = (n // TILE,)
    B, K, SP5 = block_g.shape
    spad = SP5 // 5
    assert K == 16
    mpad = tbl.shape[0]

    return pl.pallas_call(
        functools.partial(_kernel, num_blocks=B, spad=spad,
                          block_lanes=block_lanes, stack_depth=stack_depth,
                          any_hit=any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mpad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((16, SP5), jnp.float32),
            pltpu.VMEM((1, spad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(tbl, o4, d4, invd4, tmin, tmax_clip, active, rays, block_g, block_orig_p)
