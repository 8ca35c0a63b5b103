"""Pallas TPU forest megakernel: whole kd traversal for BIG trees.

The single-table megakernel (traverse_kernel.py) holds the entire node
table in VMEM and is gated to <= MAX_NODES nodes because its per-step
one-hot MXU row fetch is O(TILE * M).  This kernel removes the gate with a
two-level walk over the treelet forest the builder already emits
(accel/_kdtree_np.py cut_treelets/pack_treelet_tables/build_top_table):

  top table  (Ttop_pad, 128)  - the interior nodes ABOVE the treelet cuts,
                                VMEM-resident, super-leaf rows point at
                                treelets; one-hot fetch is O(TILE * Ttop).
  treelets   (T, cap, 128)    - HBM; the consensus loop DMAs ONE treelet
                                table at a time into VMEM and runs the
                                resident-table walk for the rays that need
                                it; fetches are O(TILE * cap).

Per 256-ray tile:
  while any ray active:
    phase T: descend top-mode rays through the top table; a ray reaching a
             super-leaf stalls with cur_tre = that treelet
    phase C: tr = min outstanding treelet; DMA tre_tbl[tr] -> VMEM;
             rays with cur_tre == tr run the FULL inner walk to completion
             (descend / leaf distinct-block DMA loop / pop)

Exactness: node preorder is preserved under restriction to top nodes, a
treelet is a complete subtree, and the worklist is LIFO — so every push a
ray makes inside a treelet is popped before any pre-entry stack element
surfaces (the subtree property).  The shared per-ray stack therefore needs
only a watermark ``sp_enter``: pops above it restore LOCAL node ids (stay
inner), the pop AT it restores a TOP id (ray returns to top mode).  Visit
order, t_max tightening, strict-improvement tie-breaks, the clip-vs-tmin
break check (kdtree.cpp:286-289) and any-hit early exit all match the
single-tree walk (kdtree.cpp:263-361) and ops/traverse.py exactly.

One-hot fetches and the Plücker leaf matmul run at Precision.HIGHEST:
the default one-pass bf16 dot would round node ids / geometry.  (bf16x3
would already be exact for the one-hot fetch, but Mosaic only implements
DEFAULT/HIGHEST — "Unsupported dot precision: HIGH".)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG_I = 2**30

TILE = 256  # rays per grid step; one-hot transients scale as TILE x cap
TOP_LEAF = 4  # top-table super-leaf flag (accel/_kdtree_np.py TOP_LEAF_FLAG)


def _kernel(top_ref, o_ref, d_ref, invd_ref, tmin_ref, tmax_ref, act_ref,
            rays_ref, tre_hbm, g_hbm, orig_hbm,
            t_ref, idx_ref, found_ref,
            tre_vmem, g_vmem, orig_vmem, sem_t, sem_g, sem_o,
            *, cap: int, num_tre: int, spad: int, block_lanes: int,
            stack_depth: int, any_hit: bool):
    top = top_ref[:]                    # (Ttop_pad, 128) f32
    o = o_ref[:]                        # (TILE, 4) [x y z pad]
    d = d_ref[:]
    inv_d = invd_ref[:]
    r16 = rays_ref[:]                   # (TILE, 16) Plücker rows

    tmin0 = tmin_ref[:, 0:1]            # (TILE, 1)
    tmax0 = tmax_ref[:, 0:1]
    t_max = tmax_ref[:, 1:2]            # column 1 carries the clip (t_max)
    act0_i = act_ref[:, 0:1]            # i32 0/1 — i1 can't be loop state

    zero_i = jnp.zeros_like(tmin0, dtype=jnp.int32)

    hi3 = jax.lax.Precision.HIGHEST  # Mosaic implements only DEFAULT/HIGHEST

    def fetch(tbl, node):
        """node (TILE,1) i32 -> that row of tbl, (TILE,128) f32."""
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (node.shape[0], tbl.shape[0]), 1)
        onehot = (cols == node).astype(jnp.float32)
        return jnp.dot(onehot, tbl, preferred_element_type=jnp.float32,
                       precision=hi3)

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
        idx = jnp.broadcast_to(axis, v.shape)
        return jnp.take_along_axis(v, idx, axis=1)[:, 0:1]

    def descend_step(s, row, eligible):
        """One interior step (near/far + far push) for ``eligible`` rays at
        the interior node described by ``row``; pushed ids come from
        ``row``'s child column so they are top ids in top mode and local
        ids in inner mode.  Returns the updated state pieces."""
        flag = row[:, 0:1]
        split = row[:, 1:2]
        right = row[:, 2:3].astype(jnp.int32)

        axis = jnp.clip(flag.astype(jnp.int32), 0, 2)
        o_ax = axis_sel(o, axis)
        d_ax = axis_sel(d, axis)
        inv_ax = axis_sel(inv_d, axis)
        t_plane = (split - o_ax) * inv_ax
        left_first = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))
        node = s["node"]
        near = jnp.where(left_first, node + 1, right)
        far = jnp.where(left_first, right, node + 1)

        skip_far = (t_plane > s["tmax"]) | (t_plane <= 0.0)
        skip_near = ~skip_far & (t_plane < s["tmin"])
        push = ~skip_far & ~skip_near

        node_i = jnp.where(skip_near, far, near)
        tmax_i = jnp.where(push, t_plane, s["tmax"])

        do_push = eligible & push
        sp = s["sp"]
        sp_c = jnp.minimum(sp, stack_depth - 1)
        stn = stack_set(s["stn"], sp_c, far, do_push)
        stt = stack_set(s["stt"], sp_c, t_plane, do_push)
        stx = stack_set(s["stx"], sp_c, s["tmax"], do_push)
        sp = jnp.where(do_push, sp + 1, sp)

        return dict(
            s,
            node=jnp.where(eligible, node_i, node),
            tmax=jnp.where(eligible, tmax_i, s["tmax"]),
            sp=sp, stn=stn, stt=stt, stx=stx,
        )

    state0 = dict(
        active=act0_i,
        intre=zero_i,                   # 0 = top mode, 1 = inside a treelet
        node=zero_i,                    # top id (top mode) / local id (inner)
        cur_tre=jnp.full_like(zero_i, _BIG_I),
        sp_enter=zero_i,
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
        # ---------------- phase T: top-table descend ----------------
        def top_cond(s2):
            return jnp.any((s2["active"] != 0) & (s2["intre"] == 0))

        def top_body(s2):
            act = s2["active"] != 0
            eligible = act & (s2["intre"] == 0)
            clip = jnp.minimum(s2["t_best"], t_max)
            dead = eligible & (clip < s2["tmin"])  # break (kdtree.cpp:286-289)
            eligible = eligible & ~dead

            row = fetch(top, s2["node"])
            is_super = row[:, 0:1] > (TOP_LEAF - 0.5)
            step_it = eligible & ~is_super
            enter = eligible & is_super

            s2 = descend_step(s2, row, step_it)
            return dict(
                s2,
                active=(act & ~dead).astype(jnp.int32),
                intre=jnp.where(enter, 1, s2["intre"]),
                cur_tre=jnp.where(enter, row[:, 3:4].astype(jnp.int32),
                                  s2["cur_tre"]),
                node=jnp.where(enter, 0, s2["node"]),
                sp_enter=jnp.where(enter, s2["sp"], s2["sp_enter"]),
                cursor=jnp.where(enter, 0, s2["cursor"]),
            )

        s = jax.lax.while_loop(top_cond, top_body, s)
        # rays that died in phase T with intre==1 never reach here with
        # stale cur_tre because matched() requires active

        # ---------------- phase C: one treelet, inner walk --------------
        waiting = (s["active"] != 0) & (s["intre"] == 1)
        tr = jnp.min(jnp.where(waiting, s["cur_tre"], jnp.int32(_BIG_I)))
        tr_c = jnp.clip(tr, 0, num_tre - 1)

        cp_t = pltpu.make_async_copy(tre_hbm.at[tr_c], tre_vmem, sem_t)
        cp_t.start()
        cp_t.wait()
        tre = tre_vmem[:]               # (cap, 128)

        def matched(s2):
            return ((s2["active"] != 0) & (s2["intre"] == 1)
                    & (s2["cur_tre"] == tr))

        def inner_cond(s2):
            return jnp.any(matched(s2))

        def inner_body(s2):
            # descend matched rays to their next leaf within the treelet;
            # the fetched row is loop-carried so each step pays ONE fetch
            def des_cond(carry):
                s3, row = carry
                return jnp.any(matched(s3) & (row[:, 0:1] < 2.5))

            def des_body(carry):
                s3, row = carry
                m = matched(s3)
                clip = jnp.minimum(s3["t_best"], t_max)
                dead = m & (clip < s3["tmin"])
                step_it = m & ~dead & (row[:, 0:1] < 2.5)
                s3 = descend_step(s3, row, step_it)
                s3 = dict(s3, active=jnp.where(
                    dead, 0, s3["active"]).astype(jnp.int32))
                return s3, fetch(tre, s3["node"])

            s2, row = jax.lax.while_loop(
                des_cond, des_body, (s2, fetch(tre, s2["node"])))

            # leaf: distinct-block DMA loop (kdtree.cpp:331-344 semantics)
            m = matched(s2)
            clip = jnp.minimum(s2["t_best"], t_max)
            dead = m & (clip < s2["tmin"])
            s2 = dict(s2, active=jnp.where(dead, 0, s2["active"]).astype(jnp.int32))
            m = matched(s2)

            leaf_lanes = row[:, 4:5].astype(jnp.int32)
            block0 = row[:, 5:6].astype(jnp.int32)
            has_work = m & (s2["cursor"] < leaf_lanes)
            key = jnp.where(has_work, block0 + s2["cursor"] // block_lanes,
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
                blk_cond, blk_body,
                (key, s2["t_best"], s2["prim_best"], s2["found"]))

            act = s2["active"] != 0
            cursor = jnp.where(has_work, s2["cursor"] + block_lanes,
                               s2["cursor"])
            leaf_done = m & (cursor >= leaf_lanes)
            if any_hit:
                newly = m & (t_best < s2["t_best"])
                leaf_done = leaf_done & ~newly
                act = act & ~newly

            # pop: above the watermark -> local id (stay inner); AT the
            # watermark -> top id (back to top mode); empty -> done
            sp = s2["sp"]
            pop_inner = leaf_done & (sp > s2["sp_enter"])
            pop_top = leaf_done & (sp == s2["sp_enter"]) & (sp > 0)
            pop = pop_inner | pop_top
            sp_pop = jnp.maximum(sp - 1, 0)
            node = jnp.where(pop, stack_get(s2["stn"], sp_pop), s2["node"])
            tmin = jnp.where(pop, stack_get(s2["stt"], sp_pop), s2["tmin"])
            tmax = jnp.where(pop, stack_get(s2["stx"], sp_pop), s2["tmax"])
            act = act & ~(leaf_done & ~pop)  # empty stack: traversal done
            sp = jnp.where(pop, sp - 1, sp)
            cursor = jnp.where(pop, 0, cursor)
            # a top pop returns the ray to top mode (the restored id is a
            # top-table id by the watermark invariant)
            exit_tre = pop_top
            return dict(
                s2,
                active=act.astype(jnp.int32),
                intre=jnp.where(exit_tre, 0, s2["intre"]),
                cur_tre=jnp.where(exit_tre, jnp.int32(_BIG_I), s2["cur_tre"]),
                node=node, tmin=tmin, tmax=tmax, sp=sp, cursor=cursor,
                t_best=t_best, prim_best=prim_best, found=found,
            )

        return jax.lax.while_loop(inner_cond, inner_body, s)

    out = jax.lax.while_loop(outer_cond, outer_body, state0)
    t_ref[:] = out["t_best"]
    idx_ref[:] = out["prim_best"]
    found_ref[:] = out["found"].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_lanes", "stack_depth",
                                             "any_hit", "interpret", "tile"))
def forest_traverse(top_tbl, tre_tbl, o4, d4, invd4, tmin, tmax_clip, active,
                    rays, block_g, block_orig_p,
                    block_lanes: int, stack_depth: int,
                    any_hit: bool = False, interpret: bool = False,
                    tile: int = TILE):
    """Full kd traversal through the treelet forest for N rays (N % TILE == 0).

    Args (all ray arrays padded to TILE multiples by the caller):
      top_tbl: (Ttop_pad, 128) from build_top_table.
      tre_tbl: (T, cap, 128) from pack_treelet_tables (stays in HBM).
      o4/d4/invd4: (N, 4) ray origin/dir/inverse-dir (4th col padding).
      tmin: (N, 1) entry t; tmax_clip: (N, 2) [exit t, clip t_max].
      active: (N, 1) i32 root-hit mask.
      rays: (N, 16) Plücker rows; block_g: (B, 16, 5*Spad);
      block_orig_p: (B, 1, Spad) i32 (padded, -1 fill).
    Returns (t_best (N,1), prim (N,1), found (N,1) i32).
    """
    n = o4.shape[0]
    assert n % tile == 0
    grid = (n // tile,)
    B, K, SP5 = block_g.shape
    spad = SP5 // 5
    assert K == 16
    num_tre, cap, w = tre_tbl.shape
    assert w == 128 and cap % 128 == 0
    tpad = top_tbl.shape[0]

    return pl.pallas_call(
        functools.partial(_kernel, cap=cap, num_tre=num_tre, spad=spad,
                          block_lanes=block_lanes, stack_depth=stack_depth,
                          any_hit=any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tpad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # tre_tbl in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # block_g in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # block_orig in HBM
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cap, 128), jnp.float32),
            pltpu.VMEM((16, SP5), jnp.float32),
            pltpu.VMEM((1, spad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(top_tbl, o4, d4, invd4, tmin, tmax_clip, active, rays,
      tre_tbl, block_g, block_orig_p)
