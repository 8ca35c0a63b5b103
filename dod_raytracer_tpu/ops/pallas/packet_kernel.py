"""Pallas TPU packet megakernel: shared (per-tile) kd descend, per-ray masks.

The per-ray wavefront walks (ops/traverse.py XLA walk, traverse_kernel.py
megakernel) pay their cost in per-ray *data-dependent node state*: every
interior step needs each ray's node row, which on TPU is either an XLA HBM
row gather (~200us/step at 16k rays) or an O(TILE x M) one-hot MXU matmul,
and every stack op is a one-hot masked select over (depth, TILE) arrays.

This kernel exploits wavefront coherence instead — the TPU-native analogue
of CPU packet tracing (the reference is itself an 8-wide packet tracer
over primitives, sphere.cpp:26-160).  A whole ray tile traverses the tree
TOGETHER with ONE scalar node cursor and ONE scalar stack pointer:

  * the node fetch is a scalar SMEM read (no gather, no one-hot matmul);
  * stack pushes/pops are dynamic-slice writes at a scalar index
    (nstack[sp] = node / tn_stack[sp] = vec) — no one-hot selects;
  * per-ray divergence is carried as (TR//128, 128) interval vectors
    [tn, tx] — full-width VPU registers (the per-ray walks' (TILE, 1)
    state uses 1 of 128 lanes);
  * a leaf is one contiguous block DMA + one (TR,16)x(16,5*Spad) Plücker
    MXU matmul against the whole tile, folded with per-ray validity.

Visit-set semantics: the packet visits the UNION of the nodes its rays
would visit individually (a ray's segment-vs-cell overlap decides its
per-child interval exactly as kdtree.cpp:312-319).  Visiting a superset of
leaves per ray cannot change the closest hit — every accepted candidate is
a real intersection with t in (0, clip), and min over a superset of the
pruning-correct set is the same min (kd pruning only ever excludes leaves
that cannot contain closer hits).  What CAN differ from the strictly
near-to-far per-ray walk is the winner among EXACTLY-equal t values
(duplicated straddler lanes resolve to the first-visited copy,
kdtree.cpp:334-344); tests accept prim flips only where both candidates'
t agree exactly (tests/test_packet.py).

Any-hit mode keeps full blocking semantics (blocked iff ANY triangle hits
strictly before t_max) and stops per-ray work on the first hit; the tile
exits once every ray is done.

NaN edges (split == o_ax with inv_ax = +-inf => t_plane = NaN) are handled
conservatively: all interval tests are written so NaN keeps the ray alive
and visiting both children — a superset of the reference's visit set,
never a subset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")

TILE = 1024  # rays per packet: per-ray state is (TILE//128, 128) = full vregs


def _kernel(flag_s, split_s, right_s, blk0_s, nblk_s,
            o_ref, d_ref, invd_ref, tmin_ref, tmax_ref, clip_ref, act_ref,
            rays_ref, g_hbm, orig_hbm,
            t_ref, prim_ref, found_ref,
            tn_ref, tx_ref, done_ref, nstack_s, tn_stk, tx_stk,
            g_vmem, orig_vmem, sem_g, sem_o,
            *, spad: int, stack_depth: int, any_hit: bool, r8: int):
    r16 = rays_ref[:]                   # (TR, 16) Plücker rows
    clip0 = clip_ref[:]                 # per-ray t_max (R8, 128)
    act0 = act_ref[:] != 0

    # ---- init persistent per-ray state ----
    t_ref[:] = clip0                    # t_best starts at the clip
    prim_ref[:] = jnp.full((r8, 128), -1, jnp.int32)
    found_ref[:] = jnp.zeros((r8, 128), jnp.int32)
    done_ref[:] = (~act0).astype(jnp.int32)
    tn_ref[:] = tmin_ref[:]
    tx_ref[:] = tmax_ref[:]

    def alive_mask(tn, tx):
        """Rays whose current interval may still contain a closer hit.
        NaN-conservative: every comparison keeps NaN rays alive."""
        clip = jnp.minimum(t_ref[:], clip0)
        return (done_ref[:] == 0) & ~(tx < tn) & ~(clip < tn)

    def axis_of(v_ref, axis):
        return jax.lax.switch(axis, [lambda: v_ref[0], lambda: v_ref[1],
                                     lambda: v_ref[2]])

    # ---------------- leaf: process one node's blocks ----------------
    def leaf_fn(node):
        blk0 = blk0_s[node]
        nb = nblk_s[node]

        def blk_cond(carry):
            i, cont = carry
            return (i < nb) & cont

        def blk_body(carry):
            i, _ = carry
            blk = blk0 + i
            cp_g = pltpu.make_async_copy(g_hbm.at[blk], g_vmem, sem_g)
            cp_o = pltpu.make_async_copy(orig_hbm.at[blk], orig_vmem, sem_o)
            cp_g.start()
            cp_o.start()
            cp_g.wait()
            cp_o.wait()

            # (TR, 5*Spad) — HIGHEST: one-pass bf16 would round geometry
            out = jnp.dot(r16, g_vmem[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            s0 = out[:, 0 * spad:1 * spad]
            s1 = out[:, 1 * spad:2 * spad]
            s2 = out[:, 2 * spad:3 * spad]
            den = out[:, 3 * spad:4 * spad]
            num = out[:, 4 * spad:5 * spad]

            orig = orig_vmem[0]         # (Spad,) i32
            pos = (s0 > 0.0) & (s1 > 0.0) & (s2 > 0.0)
            neg = (s0 < 0.0) & (s1 < 0.0) & (s2 < 0.0)
            valid = (pos | neg) & (den != 0.0) & (orig >= 0)[None, :]
            t = jnp.where(valid, num, 0.0) / jnp.where(valid, den, 1.0)
            t = jnp.where(valid & (t > 0.0), t, _INF)

            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            t_min = jnp.min(t, axis=1, keepdims=True)          # (TR, 1)
            col_min = jnp.min(jnp.where(t == t_min, cols, spad), axis=1,
                              keepdims=True)
            orig_b = jnp.broadcast_to(orig[None, :], t.shape)
            idx_min = jnp.min(jnp.where(cols == col_min, orig_b, 2**30),
                              axis=1, keepdims=True)

            tm = t_min.reshape(r8, 128)
            im = idx_min.reshape(r8, 128)
            clip = jnp.minimum(t_ref[:], clip0)
            improved = (done_ref[:] == 0) & (tm < clip)
            t_ref[:] = jnp.where(improved, tm, t_ref[:])
            prim_ref[:] = jnp.where(improved, im, prim_ref[:])
            found_ref[:] = found_ref[:] | improved.astype(jnp.int32)
            if any_hit:
                done_ref[:] = done_ref[:] | improved.astype(jnp.int32)
                return i + 1, jnp.any(done_ref[:] == 0)
            return i + 1, True

        jax.lax.while_loop(blk_cond, blk_body, (jnp.int32(0), True))
        # cell consumed: empty the interval; next iteration pops
        tn_ref[:] = jnp.full((r8, 128), _INF, jnp.float32)
        tx_ref[:] = jnp.full((r8, 128), -_INF, jnp.float32)
        return node

    # ---------------- interior: one shared descend step ----------------
    def interior_fn(node, sp, alive):
        flag = flag_s[node]
        split = split_s[node]
        right = right_s[node]
        left = node + 1
        tn = tn_ref[:]
        tx = tx_ref[:]

        o_ax = axis_of(o_ref, flag)
        d_ax = axis_of(d_ref, flag)
        inv_ax = axis_of(invd_ref, flag)
        t_plane = (split - o_ax) * inv_ax
        near_is_left = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))

        # per-ray far/near skip rules (kdtree.cpp:312-319)
        skip_far = (t_plane > tx) | (t_plane <= 0.0)
        push = ~skip_far & ~(t_plane < tn)
        vis_near = skip_far | push          # == ~skip_near when not skip_far
        vis_far = ~skip_far
        tn_near = tn
        tx_near = jnp.where(push, t_plane, tx)
        tn_far = jnp.where(push, t_plane, tn)
        tx_far = tx

        def child_iv(is_this_near, vis_n, vis_f):
            sel_n = is_this_near & vis_n & alive
            sel_f = ~is_this_near & vis_f & alive
            tni = jnp.where(sel_n, tn_near, jnp.where(sel_f, tn_far, _INF))
            txi = jnp.where(sel_n, tx_near, jnp.where(sel_f, tx_far, -_INF))
            return tni, txi

        tnL, txL = child_iv(near_is_left, vis_near, vis_far)
        tnR, txR = child_iv(~near_is_left, vis_near, vis_far)

        clip = jnp.minimum(t_ref[:], clip0)
        live = done_ref[:] == 0
        aliveL = live & ~(txL < tnL) & ~(clip < tnL)
        aliveR = live & ~(txR < tnR) & ~(clip < tnR)
        nl = jnp.sum(aliveL.astype(jnp.int32))
        nr = jnp.sum(aliveR.astype(jnp.int32))
        # majority near-first ordering (a termination heuristic only: any
        # order is correct, near-first tightens t_best sooner)
        either = aliveL | aliveR
        n_near_left = jnp.sum((either & near_is_left).astype(jnp.int32))
        left_first = 2 * n_near_left >= jnp.sum(either.astype(jnp.int32))

        def both(_):
            def lf(_):
                sp_c = jnp.minimum(sp, stack_depth - 1)
                nstack_s[sp_c] = right
                tn_stk[sp_c] = tnR
                tx_stk[sp_c] = txR
                tn_ref[:] = tnL
                tx_ref[:] = txL
                return left, sp + 1

            def rf(_):
                sp_c = jnp.minimum(sp, stack_depth - 1)
                nstack_s[sp_c] = left
                tn_stk[sp_c] = tnL
                tx_stk[sp_c] = txL
                tn_ref[:] = tnR
                tx_ref[:] = txR
                return right, sp + 1

            return jax.lax.cond(left_first, lf, rf, 0)

        def only_left(_):
            tn_ref[:] = tnL
            tx_ref[:] = txL
            return left, sp

        def only_right(_):
            tn_ref[:] = tnR
            tx_ref[:] = txR
            return right, sp

        def neither(_):
            tn_ref[:] = jnp.full((r8, 128), _INF, jnp.float32)
            tx_ref[:] = jnp.full((r8, 128), -_INF, jnp.float32)
            return node, sp

        case = jnp.where(nl > 0, jnp.where(nr > 0, 3, 1),
                         jnp.where(nr > 0, 2, 0))
        return jax.lax.switch(case, [neither, only_left, only_right, both], 0)

    # ---------------- outer walk ----------------
    def cond(carry):
        node, sp, run = carry
        return run != 0

    def body(carry):
        node, sp, _ = carry
        alive = alive_mask(tn_ref[:], tx_ref[:])
        any_alive = jnp.any(alive)

        def visit(_):
            is_leaf = flag_s[node] >= 3

            def at_leaf(_):
                leaf_fn(node)
                return node, sp, jnp.int32(1)

            def at_interior(_):
                node2, sp2 = interior_fn(node, sp, alive)
                return node2, sp2, jnp.int32(1)

            return jax.lax.cond(is_leaf, at_leaf, at_interior, 0)

        def pop_or_finish(_):
            def do_pop(_):
                sp2 = sp - 1
                node2 = nstack_s[sp2]
                tn_ref[:] = tn_stk[sp2]
                tx_ref[:] = tx_stk[sp2]
                return node2, sp2, jnp.int32(1)

            def finish(_):
                return node, sp, jnp.int32(0)

            return jax.lax.cond(sp > 0, do_pop, finish, 0)

        return jax.lax.cond(any_alive, visit, pop_or_finish, 0)

    run0 = jnp.any(act0 & ~(tx_ref[:] < tn_ref[:])).astype(jnp.int32)
    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), run0))


@functools.partial(jax.jit, static_argnames=(
    "stack_depth", "any_hit", "interpret", "tile"))
def packet_traverse(flag, split, right, blk0, nblk,
                    o3, d3, invd3, tmin, tmax, clip, act, rays,
                    block_g, block_orig_p,
                    stack_depth: int, any_hit: bool = False,
                    interpret: bool = False, tile: int = TILE):
    """Packet kd traversal for N rays (N % tile == 0).

    Args:
      flag/split/right/blk0/nblk: (M,) node fields (i32/f32/i32/i32/i32);
        blk0 = leaf_start // block_lanes, nblk = ceil(leaf_lanes / block_lanes).
      o3/d3/invd3: (3, N//128, 128) ray origin/dir/inv-dir, lane-major.
      tmin/tmax/clip: (N//128, 128) root-slab entry/exit t and per-ray t_max.
      act: (N//128, 128) i32 root-hit mask.
      rays: (N, 16) Plücker rows; block_g: (B, 16, 5*Spad) f32;
      block_orig_p: (B, 1, Spad) i32 (-1 fill).
    Returns (t_best, prim, found) each (N//128, 128).
    """
    n128 = tmin.shape[0]
    n = n128 * 128
    assert n % tile == 0 and tile % 128 == 0
    r8 = tile // 128
    grid = (n // tile,)
    B, K, SP5 = block_g.shape
    spad = SP5 // 5
    assert K == 16

    vec = lambda: pl.BlockSpec((r8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    return pl.pallas_call(
        functools.partial(_kernel, spad=spad, stack_depth=stack_depth,
                          any_hit=any_hit, r8=r8),
        grid=grid,
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(), vec(),
            pl.BlockSpec((tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[vec(), vec(), vec()],
        out_shape=[
            jax.ShapeDtypeStruct((n128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r8, 128), jnp.float32),       # tn
            pltpu.VMEM((r8, 128), jnp.float32),       # tx
            pltpu.VMEM((r8, 128), jnp.int32),         # done
            pltpu.SMEM((max(stack_depth, 2),), jnp.int32),
            pltpu.VMEM((max(stack_depth, 2), r8, 128), jnp.float32),
            pltpu.VMEM((max(stack_depth, 2), r8, 128), jnp.float32),
            pltpu.VMEM((16, SP5), jnp.float32),
            pltpu.VMEM((1, spad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(flag, split, right, blk0, nblk, o3, d3, invd3, tmin, tmax, clip, act,
      rays, block_g, block_orig_p)
