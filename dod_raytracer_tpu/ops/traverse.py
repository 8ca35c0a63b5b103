"""Wavefront kd-tree traversal.

TPU-native replacement for the reference's pbrt-style pointer walk
(``KDTree::intersect``, ``kdtree.cpp:263-361``): the whole ray batch steps
in lockstep through one ``lax.while_loop`` — each ray carries its own node
cursor, [tmin, tmax] interval and a fixed-depth worklist stack (the
reference's ``workItem worklist[64]``, kdtree.cpp:279, as (N, 64) arrays)
— and divergence is handled by per-ray masks instead of thread divergence.

Per iteration each active ray performs exactly one reference while-loop
step: an interior descend (near/far child ordering + optional far push,
kdtree.cpp:290-329) or one *chunk* of a leaf's triangle lanes
(``Triangle::intersectInRange`` over the contiguous reordered span,
kdtree.cpp:334-344), with multi-chunk leaves spanning iterations via a
lane cursor.  All scene data is gathered from flat device tensors.

Semantics preserved:
* early break when the tightened clip falls below the node tmin
  (kdtree.cpp:286-289);
* near/far ordering including the origin-on-plane tie rule
  (kdtree.cpp:297-299);
* far-child skip rules ``tPlane > tmax || tPlane <= 0`` / ``tPlane < tmin``
  (kdtree.cpp:312-319);
* strict-improvement leaf hits with duplicated straddler lanes resolving
  to the first-tested copy.

The traversal is int-valued (winning triangle id): callers stop-gradient
it and recompute the hit differentiably (SURVEY.md §7 — gradients flow
through hit geometry, not traversal decisions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .aabb import slab_test
from .ray import INF
from .triangle import mt_t, mt_t_edges


def _stack_set(stack, sp, value, do):
    """stack[sp[i], i] = value[i] where do[i] — as a one-hot masked select.

    XLA lowers per-row scatter/gather-along-axis poorly on TPU (serialized
    updates); a (D, N) elementwise select over a row-iota one-hot runs
    entirely on the VPU instead.  Stacks are stored depth-MAJOR so the big
    ray axis is the 128-lane minor dim — a (N, D<128) layout would pad D up
    to 128 lanes and multiply HBM traffic ~8x.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 0)
    hit = (rows == sp[None, :]) & do[None, :]
    return jnp.where(hit, value[None, :].astype(stack.dtype), stack)


def _stack_get(stack, sp):
    """stack[sp[i], i] — one-hot masked reduction (VPU-friendly gather)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 0)
    onehot = rows == sp[None, :]
    if stack.dtype == jnp.int32:
        return jnp.max(jnp.where(onehot, stack, jnp.iinfo(jnp.int32).min), axis=0)
    return jnp.max(jnp.where(onehot, stack, -jnp.inf), axis=0)


def _axis_get(v, axis):
    """v[i, axis[i]] for (N, 3) v — one-hot select instead of gather."""
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.sum(jnp.where(cols == axis[:, None], v, 0.0), axis=1)


def _pack_nodes(kd):
    """(M, 5) f32 node table [flag|split|right|leaf_start|leaf_lanes]
    (ints bitcast) — ONE contiguous 20-byte row gather per traversal step
    instead of five scattered single-word gathers.  Loop-invariant, so XLA
    hoists the pack out of the traversal while_loop."""
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    return jnp.stack([
        bc(kd.node_flag), kd.node_split, bc(kd.node_right),
        bc(kd.node_leaf_start), bc(kd.node_leaf_lanes)], axis=1)


def _decode_nodes(pk):
    """(N, 5) gathered rows -> per-field arrays."""
    bci = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    return (bci(pk[:, 0]), pk[:, 1], bci(pk[:, 2]), bci(pk[:, 3]), bci(pk[:, 4]))


def _gather_leaf_t(kd, tri_verts, o, d, leaf_start, cursor, lanes_this,
                   lane_size, chunk_lanes):
    """Candidate t over one chunk of reordered lanes per ray.

    Blocked fast path (kd.block_tris present): leaves are block-aligned,
    so the chunk is exactly one row of the pre-gathered (B, S, 9) block
    array — a single contiguous ~2.3KB gather per ray instead of S
    scattered 36-byte vertex rows.

    Returns (t (N, C*lane), orig_tri (N, C*lane)) with +inf where invalid.
    """
    if kd.block_tris is not None:
        assert kd.block_lanes == chunk_lanes, (kd.block_lanes, chunk_lanes)
        block = jnp.clip((leaf_start + cursor) // chunk_lanes, 0,
                         kd.block_tris.shape[0] - 1)
        rows = kd.block_tris[block]  # (N, S, 9)
        orig = kd.block_orig[block]  # (N, S)
        t = mt_t_edges(rows[..., 0:3], rows[..., 3:6], rows[..., 6:9], o, d)
        return jnp.where(orig >= 0, t, INF), orig

    tri_perm = kd.tri_perm
    chunk = chunk_lanes * lane_size
    base_slot = (leaf_start + cursor) * lane_size  # (N,)
    slot = base_slot[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]  # (N, C)
    in_leaf = jnp.arange(chunk, dtype=jnp.int32)[None, :] < (lanes_this * lane_size)[:, None]
    slot_c = jnp.clip(slot, 0, tri_perm.shape[0] - 1)
    orig = tri_perm[slot_c]  # (N, C) — -1 for padding slots
    valid = in_leaf & (orig >= 0)
    verts = tri_verts[jnp.maximum(orig, 0)]  # (N, C, 3, 3)
    t = mt_t(verts, o, d, pairwise=False)
    return jnp.where(valid, t, INF), orig


def _make_interior_step(tbl, o, d, inv_d, t_max, cfg):
    """Factory for the per-iteration interior-node stepper shared by the
    gather and binned traversals (kdtree.cpp:290-329).

    State carries ``pk`` — the (N, 5) packed node row of each ray's current
    node — so a step performs exactly one table gather (for the node it
    moves to) and the descend-loop condition reads the flag from state."""

    def interior_step(s):
        act = s["active"]
        clip = jnp.minimum(s["t_best"], t_max)
        act = act & ~(clip < s["tmin"])  # break check (kdtree.cpp:286-289)
        node = s["node"]
        flag, split, right, _, _ = _decode_nodes(s["pk"])
        do_interior = act & (flag != 3)

        axis = jnp.clip(flag, 0, 2)
        o_ax = _axis_get(o, axis)
        d_ax = _axis_get(d, axis)
        inv_ax = _axis_get(inv_d, axis)
        t_plane = (split - o_ax) * inv_ax
        left_first = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))
        near = jnp.where(left_first, node + 1, right)
        far = jnp.where(left_first, right, node + 1)

        skip_far = (t_plane > s["tmax"]) | (t_plane <= 0.0)
        skip_near = ~skip_far & (t_plane < s["tmin"])
        push = ~skip_far & ~skip_near

        node_i = jnp.where(skip_far, near, jnp.where(skip_near, far, near))
        tmax_i = jnp.where(push, t_plane, s["tmax"])

        do_push = do_interior & push
        sp = s["sp"]
        sp_c = jnp.clip(sp, 0, s["stack_node"].shape[0] - 1)
        stack_node = _stack_set(s["stack_node"], sp_c, far, do_push)
        stack_tmin = _stack_set(s["stack_tmin"], sp_c, t_plane, do_push)
        stack_tmax = _stack_set(s["stack_tmax"], sp_c, s["tmax"], do_push)
        sp = jnp.where(do_push, sp + 1, sp)

        node_new = jnp.where(do_interior, node_i, node)
        return dict(
            s,
            active=jnp.where(s["active"] & (flag != 3), act, s["active"]),
            node=node_new,
            pk=tbl[node_new],
            tmax=jnp.where(do_interior, tmax_i, s["tmax"]),
            sp=sp, stack_node=stack_node, stack_tmin=stack_tmin,
            stack_tmax=stack_tmax,
        )

    return interior_step


def _descend_cond(s):
    """Any active ray still at an interior node (flag != 3)?"""
    flag = jax.lax.bitcast_convert_type(s["pk"][:, 0], jnp.int32)
    return jnp.any(s["active"] & (flag != 3))


def _stack_depth(kd, cfg):
    """Worklist depth: one push max per tree level, so the build's depth
    budget (+1 margin) bounds occupancy; cfg.stack_depth (=64, the
    reference's worklist size, kdtree.cpp:279) is the upper clamp."""
    if kd.max_depth:
        return min(cfg.stack_depth, kd.max_depth + 1)
    return cfg.stack_depth


def _vzeros(ref):
    """Per-ray zero vectors that INHERIT ref's shard_map varying axes —
    a plain jnp.zeros carry init is 'unvarying' and fails while_loop
    vma-consistency when the traversal runs inside shard_map."""
    vz = ref.astype(jnp.float32) * 0.0
    return vz, vz.astype(jnp.int32)


def _traverse(kd, tri_verts, o, d, t_max, cfg, any_hit: bool):
    n = o.shape[0]
    stack_depth = _stack_depth(kd, cfg)
    chunk_lanes = cfg.leaf_chunk_lanes
    lane_size = kd.lane_size

    inv_d = 1.0 / d
    root_hit, tmin0, tmax0 = slab_test(kd.bounds_min, kd.bounds_max, o, inv_d, t_max)
    # kdtree.cpp:274 — also reject when tmin > clippingDistance
    active0 = root_hit & ~(tmin0 > t_max)

    tbl = _pack_nodes(kd)
    vz, zi = _vzeros(t_max)
    state = dict(
        active=active0,
        node=zi,
        pk=tbl[zi],
        tmin=tmin0,
        tmax=tmax0,
        sp=zi,
        stack_node=jnp.zeros((stack_depth, 1), jnp.int32) + zi[None, :],
        stack_tmin=jnp.zeros((stack_depth, 1), jnp.float32) + vz[None, :],
        stack_tmax=jnp.zeros((stack_depth, 1), jnp.float32) + vz[None, :],
        cursor=zi,
        t_best=t_max.astype(jnp.float32),
        prim_best=zi - 1,
        found=vz > 1.0,
    )

    def cond(s):
        return jnp.any(s["active"])

    interior_step = _make_interior_step(tbl, o, d, inv_d, t_max, cfg)

    def body(s):
        # ---------- phase A: descend all rays to their next leaf ----------
        # (node stepping only — no triangle gathers are issued until every
        # active ray sits at a leaf, so HBM traffic is leaf-work only)
        s = jax.lax.while_loop(_descend_cond, interior_step, s)

        act = s["active"]
        clip = jnp.minimum(s["t_best"], t_max)
        act = act & ~(clip < s["tmin"])
        node = s["node"]
        do_leaf = act  # every active ray is at a leaf now
        sp = s["sp"]
        stack_node, stack_tmin, stack_tmax = s["stack_node"], s["stack_tmin"], s["stack_tmax"]

        # ---------- phase B: leaf chunk (kdtree.cpp:331-358) ----------
        _, _, _, leaf_start, leaf_lanes = _decode_nodes(s["pk"])
        lanes_this = jnp.clip(leaf_lanes - s["cursor"], 0, chunk_lanes)
        t_chunk, orig = _gather_leaf_t(
            kd, tri_verts, o, d, leaf_start, s["cursor"], lanes_this,
            lane_size, chunk_lanes)
        t_chunk = jnp.where(do_leaf[:, None], t_chunk, INF)
        a = jnp.argmin(t_chunk, axis=1)
        t_leaf = jnp.take_along_axis(t_chunk, a[:, None], axis=1)[:, 0]
        prim_leaf = jnp.take_along_axis(orig, a[:, None], axis=1)[:, 0]
        improved = do_leaf & (t_leaf < clip)
        t_best = jnp.where(improved, t_leaf, s["t_best"])
        prim_best = jnp.where(improved, prim_leaf, s["prim_best"])
        found = s["found"] | improved

        cursor = jnp.where(do_leaf, s["cursor"] + chunk_lanes, s["cursor"])
        leaf_done = do_leaf & (cursor >= leaf_lanes)
        if any_hit:
            # returnOnAny (kdtree.cpp:338-341): stop this ray immediately
            leaf_done = leaf_done & ~improved
            act = act & ~(do_leaf & improved)

        # pop worklist or finish (kdtree.cpp:347-357)
        can_pop = sp > 0
        pop = leaf_done & can_pop
        sp_pop = jnp.clip(sp - 1, 0, stack_node.shape[0] - 1)
        node_p = _stack_get(stack_node, sp_pop)
        tmin_p = _stack_get(stack_tmin, sp_pop)
        tmax_p = _stack_get(stack_tmax, sp_pop)
        act = act & ~(leaf_done & ~can_pop)

        # ---------- merge ----------
        node = jnp.where(pop, node_p, node)
        tmin = jnp.where(pop, tmin_p, s["tmin"])
        tmax = jnp.where(pop, tmax_p, s["tmax"])
        sp = jnp.where(pop, sp - 1, sp)
        cursor = jnp.where(pop, 0, cursor)

        return dict(
            active=act, node=node, pk=tbl[node], tmin=tmin, tmax=tmax, sp=sp,
            stack_node=stack_node, stack_tmin=stack_tmin, stack_tmax=stack_tmax,
            cursor=cursor, t_best=t_best, prim_best=prim_best, found=found,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["t_best"], out["prim_best"], out["found"]


def _traverse_binned(kd, o, d, t_max, cfg, any_hit: bool):
    """Binned wavefront traversal: descend phase identical to ``_traverse``;
    the leaf phase feeds each ray's current block id to the sort-free
    Pallas block-loop kernel (block_loop_kernel.py) — each fixed ray tile
    loops over its distinct blocks smallest-first with one VMEM DMA + one
    Plücker MXU matmul per block.  Every ray with work processes exactly
    its current block per round, so per-ray block processing ORDER — and
    hence strict-min tie-break semantics — match the gather traversal."""
    from .pallas.block_loop_kernel import block_loop_intersect
    from .pallas.mt_kernel import on_tpu
    from .pallas.plucker_kernel import swizzle_rays_plucker

    assert kd.block_tris is not None, "binned traversal needs the blocked layout"
    tile_r = 256
    n0 = o.shape[0]
    pad = (-n0) % tile_r
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, fill])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    n = o.shape[0]
    interpret = not on_tpu()

    inv_d = 1.0 / d
    root_hit, tmin0, tmax0 = slab_test(kd.bounds_min, kd.bounds_max, o, inv_d, t_max)
    active0 = root_hit & ~(tmin0 > t_max)
    ray_rows, _ = swizzle_rays_plucker(o, d, tile_r)  # (n, 16), static per call

    block_lanes = kd.block_lanes
    big = jnp.int32(2**30)

    tbl = _pack_nodes(kd)
    vz, zi = _vzeros(t_max)
    state = dict(
        active=active0,
        node=zi,
        pk=tbl[zi],
        tmin=tmin0,
        tmax=tmax0,
        sp=zi,
        stack_node=jnp.zeros((_stack_depth(kd, cfg), 1), jnp.int32) + zi[None, :],
        stack_tmin=jnp.zeros((_stack_depth(kd, cfg), 1), jnp.float32) + vz[None, :],
        stack_tmax=jnp.zeros((_stack_depth(kd, cfg), 1), jnp.float32) + vz[None, :],
        cursor=zi,
        t_best=t_max.astype(jnp.float32),
        prim_best=zi - 1,
        found=vz > 1.0,
    )

    interior_step = _make_interior_step(tbl, o, d, inv_d, t_max, cfg)

    def cond(s):
        return jnp.any(s["active"])

    def body(s):
        s = jax.lax.while_loop(_descend_cond, interior_step, s)

        act = s["active"]
        clip = jnp.minimum(s["t_best"], t_max)
        act = act & ~(clip < s["tmin"])
        node = s["node"]
        sp = s["sp"]
        stack_node, stack_tmin, stack_tmax = s["stack_node"], s["stack_tmin"], s["stack_tmax"]

        _, _, _, leaf_start, leaf_lanes = _decode_nodes(s["pk"])
        has_work = act & (s["cursor"] < leaf_lanes)
        key = jnp.where(has_work, (leaf_start + s["cursor"]) // block_lanes, big)

        t_cand, prim_cand = block_loop_intersect(
            ray_rows, key[:, None], kd.block_g, kd.block_orig,
            tile_r=tile_r, interpret=interpret)

        improved = has_work & (t_cand < clip)
        t_best = jnp.where(improved, t_cand, s["t_best"])
        prim_best = jnp.where(improved, prim_cand, s["prim_best"])
        found = s["found"] | improved

        cursor = jnp.where(has_work, s["cursor"] + block_lanes, s["cursor"])
        leaf_done = act & (cursor >= leaf_lanes)
        if any_hit:
            leaf_done = leaf_done & ~improved
            act = act & ~improved

        can_pop = sp > 0
        pop = leaf_done & can_pop
        sp_pop = jnp.clip(sp - 1, 0, stack_node.shape[0] - 1)
        node = jnp.where(pop, _stack_get(stack_node, sp_pop), node)
        tmin = jnp.where(pop, _stack_get(stack_tmin, sp_pop), s["tmin"])
        tmax = jnp.where(pop, _stack_get(stack_tmax, sp_pop), s["tmax"])
        act = act & ~(leaf_done & ~can_pop)
        sp = jnp.where(pop, sp - 1, sp)
        cursor = jnp.where(pop, 0, cursor)

        return dict(
            active=act, node=node, pk=tbl[node], tmin=tmin, tmax=tmax, sp=sp,
            stack_node=stack_node, stack_tmin=stack_tmin, stack_tmax=stack_tmax,
            cursor=cursor, t_best=t_best, prim_best=prim_best, found=found,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["t_best"][:n0], out["prim_best"][:n0], out["found"][:n0]


def _traverse_packet(kd, o, d, t_max, cfg, any_hit: bool):
    """Packet megakernel (packet_kernel.py): shared scalar descend per ray
    tile, per-ray [tn, tx] interval masks, MXU Plücker leaf stage.  Visits
    a superset of each ray's reference visit set, so t/hit results match
    the per-ray walks exactly; equal-t straddler ties may resolve to a
    different duplicate (see packet_kernel.py docstring)."""
    from .pallas.mt_kernel import on_tpu
    from .pallas.packet_kernel import TILE, packet_traverse
    from .pallas.plucker_kernel import swizzle_rays_plucker

    # Mosaic block shapes need the sublane dim divisible by 8, so the
    # packet tile must be a multiple of 8*128 = 1024 rays
    tile = int(getattr(cfg, "packet_tile", 0)) or TILE
    tile = max(1024, -(-tile // 1024) * 1024)
    n0 = o.shape[0]
    pad = (-n0) % tile
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, fill])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    n = o.shape[0]

    inv_d = 1.0 / d
    root_hit, tmin0, tmax0 = slab_test(kd.bounds_min, kd.bounds_max, o, inv_d, t_max)
    active0 = root_hit & ~(tmin0 > t_max)

    lanes = lambda v: v.reshape(n // 128, 128)
    vec3 = lambda v: v.T.reshape(3, n // 128, 128)
    rays, _ = swizzle_rays_plucker(o, d, tile)
    blk0 = kd.node_leaf_start // kd.block_lanes
    nblk = (kd.node_leaf_lanes + kd.block_lanes - 1) // kd.block_lanes
    spad = kd.block_g.shape[2] // 5
    orig = kd.block_orig
    if orig.shape[1] != spad:
        orig = jnp.pad(orig, ((0, 0), (0, spad - orig.shape[1])), constant_values=-1)

    t_best, prim, found = packet_traverse(
        kd.node_flag, kd.node_split, kd.node_right, blk0, nblk, kd.block_aabb,
        vec3(o), vec3(d), vec3(inv_d), lanes(tmin0), lanes(tmax0),
        lanes(t_max.astype(jnp.float32)), lanes(active0.astype(jnp.int32)),
        rays, kd.block_g, orig[:, None, :],
        stack_depth=_stack_depth(kd, cfg), any_hit=any_hit,
        interpret=not on_tpu(), tile=tile,
        fold_groups=int(getattr(cfg, "fold_groups", 8) or 8),
        fifo=int(getattr(cfg, "dma_fifo", 0) or 2))
    flat = lambda v: v.reshape(n)[:n0]
    return flat(t_best), flat(prim), flat(found).astype(bool)


def _traverse_mega(kd, o, d, t_max, cfg, any_hit: bool):
    """Whole-traversal Pallas megakernel (traverse_kernel.py) — valid when
    the node table fits a ray tile (M <= TILE); caller guards that."""
    from .pallas.mt_kernel import on_tpu
    from .pallas.plucker_kernel import swizzle_rays_plucker
    from .pallas.traverse_kernel import TILE, mega_traverse, pack_nodes_mega

    n0 = o.shape[0]
    pad = (-n0) % TILE
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, fill])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    n = o.shape[0]

    inv_d = 1.0 / d
    root_hit, tmin0, tmax0 = slab_test(kd.bounds_min, kd.bounds_max, o, inv_d, t_max)
    active0 = root_hit & ~(tmin0 > t_max)

    pad4 = lambda v: jnp.concatenate([v, jnp.zeros((n, 1), v.dtype)], axis=1)
    rays, _ = swizzle_rays_plucker(o, d, TILE)
    tbl = pack_nodes_mega(kd, TILE)
    spad = kd.block_g.shape[2] // 5
    orig = kd.block_orig
    if orig.shape[1] != spad:
        orig = jnp.pad(orig, ((0, 0), (0, spad - orig.shape[1])), constant_values=-1)

    t_best, prim, found = mega_traverse(
        tbl, pad4(o), pad4(d), pad4(inv_d), tmin0[:, None],
        jnp.stack([tmax0, t_max.astype(jnp.float32)], axis=1),
        active0[:, None].astype(jnp.int32), rays,
        kd.block_g, orig[:, None, :],
        block_lanes=kd.block_lanes, stack_depth=_stack_depth(kd, cfg),
        any_hit=any_hit, interpret=not on_tpu())
    return t_best[:n0, 0], prim[:n0, 0], found[:n0, 0].astype(bool)


def _backend(kd, cfg):
    be = getattr(cfg, "traversal_backend", "xla")
    if be == "auto":
        # Fetch-synchronized real-device measurements on v5e (BASELINE.md
        # round 4; every dispatch-side comparison before commit 4430169
        # was timing fiction): the packet kernel's shared scalar descend
        # beats every per-ray walk (r3-era honest: teapot mega 5.9 ms,
        # dragon binned 43.7 ms per 16k-ray closest-hit; packet removes
        # the per-ray node-state cost those pay).  XLA gather walk
        # off-TPU.
        from .pallas.mt_kernel import on_tpu

        be = "packet" if on_tpu() else "xla"
    if be == "packet":
        if kd.block_g is None:
            return "xla"
        if kd.block_aabb is None:
            # blocks exist but no per-block AABBs (shouldn't happen for
            # production builds — both kdtree.refresh_kd_blocks and the
            # leaf-sharded _blocks_for populate them): degrade to the
            # fast per-ray walks, not the slow XLA gather walk
            from .pallas.traverse_kernel import MAX_NODES

            return ("binned" if kd.node_flag.shape[0] > MAX_NODES
                    else "mega")
        # the packet kernel keeps node fields + block AABBs in SMEM
        # (1 MB on v5e — measured overflow at mp=16 dragon trees);
        # oversized trees fall back to the binned walk
        m = kd.node_flag.shape[0]
        b = kd.block_aabb.shape[1]
        if 5 * 4 * m + 6 * 4 * b > 900_000:
            return "binned"
    if be in ("mega", "forest"):
        from .pallas.traverse_kernel import MAX_NODES

        if kd.block_g is None:
            return "xla"
        big = kd.node_flag.shape[0] > MAX_NODES
        if be == "forest" or big:
            if be == "forest" and kd.tre_tbl is not None and kd.top_tbl is not None:
                return "forest"
            return "binned" if big else "mega"
        return "mega"
    return be


def _traverse_forest(kd, o, d, t_max, cfg, any_hit: bool):
    """Treelet-forest Pallas megakernel (forest_kernel.py) — big trees:
    VMEM-resident top table + per-tile DMA'd treelet tables."""
    from .pallas.forest_kernel import TILE, forest_traverse
    from .pallas.mt_kernel import on_tpu
    from .pallas.plucker_kernel import swizzle_rays_plucker

    tile = int(getattr(cfg, "forest_tile", 0)) or TILE
    n0 = o.shape[0]
    pad = (-n0) % tile
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, fill])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    n = o.shape[0]

    inv_d = 1.0 / d
    root_hit, tmin0, tmax0 = slab_test(kd.bounds_min, kd.bounds_max, o, inv_d, t_max)
    active0 = root_hit & ~(tmin0 > t_max)

    pad4 = lambda v: jnp.concatenate([v, jnp.zeros((n, 1), v.dtype)], axis=1)
    rays, _ = swizzle_rays_plucker(o, d, tile)
    spad = kd.block_g.shape[2] // 5
    orig = kd.block_orig
    if orig.shape[1] != spad:
        orig = jnp.pad(orig, ((0, 0), (0, spad - orig.shape[1])), constant_values=-1)

    t_best, prim, found = forest_traverse(
        kd.top_tbl, kd.tre_tbl, pad4(o), pad4(d), pad4(inv_d), tmin0[:, None],
        jnp.stack([tmax0, t_max.astype(jnp.float32)], axis=1),
        active0[:, None].astype(jnp.int32), rays,
        kd.block_g, orig[:, None, :],
        block_lanes=kd.block_lanes, stack_depth=_stack_depth(kd, cfg),
        any_hit=any_hit, interpret=not on_tpu(), tile=tile)
    return t_best[:n0, 0], prim[:n0, 0], found[:n0, 0].astype(bool)


def kd_closest(kd, triangles, o, d, t_max, cfg):
    """Closest-hit traversal -> (t_best (N,), orig tri idx (N,), hit (N,)).

    Forward-only (inputs stop-gradiented); recompute attributes via
    ``triangle_hit_attrs`` for gradients.
    """
    verts = jax.lax.stop_gradient(triangles.verts)
    o_s = jax.lax.stop_gradient(o)
    d_s = jax.lax.stop_gradient(d)
    t_s = jax.lax.stop_gradient(t_max)
    be = _backend(kd, cfg)
    if be == "packet":
        t_best, prim, found = _traverse_packet(kd, o_s, d_s, t_s, cfg, any_hit=False)
    elif be == "binned":
        t_best, prim, found = _traverse_binned(kd, o_s, d_s, t_s, cfg, any_hit=False)
    elif be == "mega":
        t_best, prim, found = _traverse_mega(kd, o_s, d_s, t_s, cfg, any_hit=False)
    elif be == "forest":
        t_best, prim, found = _traverse_forest(kd, o_s, d_s, t_s, cfg, any_hit=False)
    else:
        t_best, prim, found = _traverse(kd, verts, o_s, d_s, t_s, cfg, any_hit=False)
    return t_best, jnp.maximum(prim, 0), found & (t_best < t_s)


def kd_any(kd, triangles, o, d, t_max, cfg):
    """Any-hit traversal (shadow rays): True where occluded before t_max."""
    verts = jax.lax.stop_gradient(triangles.verts)
    o_s = jax.lax.stop_gradient(o)
    d_s = jax.lax.stop_gradient(d)
    t_s = jax.lax.stop_gradient(t_max)
    be = _backend(kd, cfg)
    if be == "packet":
        _, _, found = _traverse_packet(kd, o_s, d_s, t_s, cfg, any_hit=True)
    elif be == "binned":
        _, _, found = _traverse_binned(kd, o_s, d_s, t_s, cfg, any_hit=True)
    elif be == "mega":
        _, _, found = _traverse_mega(kd, o_s, d_s, t_s, cfg, any_hit=True)
    elif be == "forest":
        _, _, found = _traverse_forest(kd, o_s, d_s, t_s, cfg, any_hit=True)
    else:
        _, _, found = _traverse(kd, verts, o_s, d_s, t_s, cfg, any_hit=True)
    return found
