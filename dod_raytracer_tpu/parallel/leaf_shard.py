"""Leaf-sharded scene distribution: triangles + kd-tree sharded over a mesh
axis (the model-parallel analogue from SURVEY.md §5 / BASELINE: "scene
replicated or leaf-sharded in HBM").

Host side, the triangle soup is Morton-ordered by centroid (a Z-curve
spatial sort) and split into ``ndev`` equal contiguous shards, so each
shard covers a compact region of space instead of an arbitrary index
range — per-shard kd root boxes overlap minimally and most rays
slab-reject all but one or two shards.  An independent kd-tree is built
per shard with the SAME production layout as the monolithic build
(aligned leaves + pre-packed triangle blocks), padded to a common size
and stacked with a leading device axis.  Inside ``shard_map`` each device
traverses only its local shard; the winning hit is combined across the
axis with a pmin on t (ties broken by the lowest stacked triangle index),
and hit attributes are psum'd from the owning device.

Composes with ray data-parallelism on a 2D ('dp', 'mp') mesh: rays
sharded over 'dp', triangles over 'mp', everything else replicated —
``make_train_step_2d`` runs the full inverse-rendering step with vertex
gradients living sharded over 'mp' and loss/grad reduction over 'dp'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ray import FamilyHit, INF
from ..ops.triangle import triangle_hit_attrs
from ..scene import KDArrays, Scene, Triangles

_BIG_I32 = jnp.int32(2**31 - 1)


# --------------------------------------------------------------------------
# host-side build
# --------------------------------------------------------------------------

def _morton_order(tv: np.ndarray) -> np.ndarray:
    """Z-curve order of triangle centroids (10 bits/axis): a spatial sort
    whose equal contiguous chunks are compact regions of space."""
    c = tv.mean(axis=1)
    span = np.maximum(c.max(0) - c.min(0), 1e-30)
    q = np.clip(((c - c.min(0)) / span * 1023.0), 0, 1023).astype(np.uint64)
    code = np.zeros(c.shape[0], np.uint64)
    for b in range(10):
        for a in range(3):
            code |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b + a)
    return np.argsort(code, kind="stable")


def _blocks_for(v, orig):
    """One shard's pre-packed leaf blocks from its (S,3,3) verts and
    (B, block) original-id table (the monolithic refresh_kd_blocks math),
    including the per-block vertex AABBs the packet kernel's pre-DMA
    prune needs (same [+inf,-inf]-for-empty-slots convention as
    accel.kdtree.refresh_kd_blocks)."""
    from ..ops.pallas.block_loop_kernel import pack_block_g

    gv = jnp.where((orig >= 0)[..., None, None], v[jnp.maximum(orig, 0)], 0.0)
    A = gv[..., 0, :]
    rows = jnp.concatenate([A, gv[..., 1, :] - A, gv[..., 2, :] - A], axis=-1)
    vmask = (orig >= 0)[..., None, None]
    vmin = jnp.where(vmask, gv, jnp.inf).min(axis=(1, 2))    # (B, 3)
    vmax = jnp.where(vmask, gv, -jnp.inf).max(axis=(1, 2))   # (B, 3)
    aabb = jnp.concatenate([vmin, vmax], axis=1).T           # (6, B)
    return rows, pack_block_g(gv), aabb


def refresh_kd_blocks_stacked(kd: KDArrays, verts_stacked) -> KDArrays:
    """Re-materialize the per-shard leaf blocks after a vertex update
    (stacked analogue of accel.kdtree.refresh_kd_blocks).  block_aabb is
    refreshed too — a stale AABB would make the packet kernel's pre-DMA
    prune unsound after vertex updates."""
    if kd.block_orig is None:
        return kd
    rows, g, aabb = jax.vmap(_blocks_for)(
        jax.lax.stop_gradient(verts_stacked), kd.block_orig)
    return kd.replace(block_tris=rows, block_g=g, block_aabb=aabb)


def build_leaf_sharded_triangles(tv: np.ndarray, tn: np.ndarray, tm: np.ndarray,
                                 cfg, ndev: int):
    """Morton-order the soup, split into ndev equal spatial shards, and
    build an independent production-layout kd tree per shard (aligned
    leaves + pre-packed triangle blocks — the same fast traversal path as
    the monolithic build), padded and stacked with a leading device axis.

    Returns (triangles_stacked, kd_stacked, shard_size) where array leaves
    have shape (ndev, ...) ready for shard_map in_spec P(axis).
    """
    from ..accel._kdtree_np import align_leaves, build, perm_from_prim_nums

    order = _morton_order(tv)
    tv, tn, tm = tv[order], tn[order], tm[order]

    T = tv.shape[0]
    shard = -(-T // ndev)
    pad = shard * ndev - T
    if pad:
        tv = np.concatenate([tv, np.zeros((pad, 3, 3), np.float32)], 0)
        tn = np.concatenate([tn, np.zeros((pad, 3, 3), np.float32)], 0)
        tm = np.concatenate([tm, np.zeros((pad,), np.int32)], 0)

    builts = []
    for i in range(ndev):
        sl = slice(i * shard, (i + 1) * shard)
        b = build(tv[sl], lane_size=cfg.lane_size, max_prims=cfg.MaxPrims,
                  intersect_cost=float(cfg.IntersectCost),
                  traversal_cost=float(cfg.TraversalCost),
                  empty_bonus=float(cfg.EmptyBonus))
        builts.append(align_leaves(b, cfg.leaf_chunk_lanes))

    max_nodes = max(b.node_flag.shape[0] for b in builts)
    max_prims = max(b.prim_nums.shape[0] for b in builts)
    max_leaf = max(b.max_leaf_lanes for b in builts)
    block = cfg.leaf_chunk_lanes * cfg.lane_size
    assert max_prims % cfg.leaf_chunk_lanes == 0  # align_leaves guarantees

    def pad_nodes(a, fill):
        out = np.full((max_nodes,), fill, a.dtype)
        out[: a.shape[0]] = a
        return out

    flag = np.stack([pad_nodes(b.node_flag, 3) for b in builts])
    split = np.stack([pad_nodes(b.node_split, 0.0) for b in builts])
    right = np.stack([pad_nodes(b.node_right, 0) for b in builts])
    leaf_start = np.stack([pad_nodes(b.node_leaf_start, 0) for b in builts])
    leaf_lanes = np.stack([pad_nodes(b.node_leaf_lanes, 0) for b in builts])
    bmin = np.stack([b.bounds_min for b in builts])
    bmax = np.stack([b.bounds_max for b in builts])

    perms = []
    for b in builts:
        p = perm_from_prim_nums(b.prim_nums, shard, cfg.lane_size)
        full = np.full((max_prims * cfg.lane_size,), -1, np.int32)
        full[: p.shape[0]] = p
        perms.append(full)
    perm = np.stack(perms)

    verts = jnp.asarray(tv.reshape(ndev, shard, 3, 3))
    tris = Triangles(
        verts=verts,
        normals=jnp.asarray(tn.reshape(ndev, shard, 3, 3)),
        mesh_id=jnp.asarray(tm.reshape(ndev, shard)),
    )

    # pre-packed leaf blocks per shard (block-loop kernel + contiguous
    # row-gather fast paths), vmapped over the shard axis
    block_orig = jnp.asarray(perm).reshape(ndev, -1, block)
    block_tris, block_g, block_aabb = jax.vmap(_blocks_for)(
        jax.lax.stop_gradient(verts), block_orig)

    kd = KDArrays(
        node_flag=jnp.asarray(flag), node_split=jnp.asarray(split),
        node_right=jnp.asarray(right), node_leaf_start=jnp.asarray(leaf_start),
        node_leaf_lanes=jnp.asarray(leaf_lanes),
        bounds_min=jnp.asarray(bmin), bounds_max=jnp.asarray(bmax),
        tri_perm=jnp.asarray(perm),
        block_orig=block_orig, block_tris=block_tris, block_g=block_g,
        block_aabb=block_aabb,
        lane_size=int(cfg.lane_size), num_lanes=int(max_prims),
        max_leaf_lanes=int(max_leaf),
        block_lanes=int(cfg.leaf_chunk_lanes),
        max_depth=int(max(b.max_depth for b in builts)),
    )
    return tris, kd, shard


def make_leaf_sharded_scene(builder, cfg, ndev: int) -> Scene:
    """Build a Scene whose triangle/kd leaves carry a leading (ndev,)
    shard axis; all other families are replicated as usual."""
    base_cfg_kdtree = cfg.use_kdtree
    cfg.use_kdtree = False  # skip the monolithic build
    scene = builder.build(cfg)
    cfg.use_kdtree = base_cfg_kdtree

    tv = np.concatenate(builder._tri_verts, 0) if builder._tri_verts else np.zeros((1, 3, 3), np.float32)
    tn = np.concatenate(builder._tri_normals, 0) if builder._tri_normals else np.zeros((1, 3, 3), np.float32)
    tm = np.concatenate(builder._tri_mesh, 0) if builder._tri_mesh else np.zeros((1,), np.int32)
    tris, kd, shard = build_leaf_sharded_triangles(tv, tn, tm, cfg, ndev)
    return scene.replace(triangles=tris, kd=kd)


def scene_specs(scene: Scene, axis: str):
    """in_spec pytree: triangle/kd array leaves sharded on ``axis`` along
    their leading device dim, everything else replicated."""
    tri_spec = jax.tree_util.tree_map(lambda _: P(axis), scene.triangles)
    kd_spec = jax.tree_util.tree_map(lambda _: P(axis), scene.kd)
    rest = jax.tree_util.tree_map(lambda _: P(), scene)
    return rest.replace(triangles=tri_spec, kd=kd_spec)


def local_scene(scene: Scene) -> Scene:
    """Inside shard_map: squeeze the leading (1,) shard dim off the local
    triangle/kd slices."""
    tris = jax.tree_util.tree_map(lambda x: x[0], scene.triangles)
    kd = jax.tree_util.tree_map(lambda x: x[0], scene.kd)
    return scene.replace(triangles=tris, kd=kd)


# --------------------------------------------------------------------------
# device-side combine
# --------------------------------------------------------------------------

def sharded_triangles_closest(scene, o, d, t_max, cfg, axis: str) -> FamilyHit:
    """Local kd traversal + cross-shard min-combine (called from
    intersect._triangles_closest inside shard_map; scene holds the LOCAL
    shard)."""
    from ..ops.traverse import kd_closest

    shard = scene.triangles.verts.shape[0]
    offset = jax.lax.axis_index(axis).astype(jnp.int32) * shard

    t_loc, idx_loc, hit_loc = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
    t_loc = jnp.where(hit_loc, t_loc, INF)
    t_min = jax.lax.pmin(t_loc, axis)
    contend = hit_loc & (t_loc == t_min)
    gidx = jnp.where(contend, offset + idx_loc, _BIG_I32)
    gidx_min = jax.lax.pmin(gidx, axis)
    mine = contend & (gidx == gidx_min)

    fh = triangle_hit_attrs(scene.triangles, o, d, idx_loc, mine, scene.mesh_colors)
    normal = jax.lax.psum(jnp.where(mine[:, None], fh.normal, 0.0), axis)
    color = jax.lax.psum(jnp.where(mine[:, None], fh.color, 0.0), axis)
    return FamilyHit(t=t_min, normal=normal, color=color)


def sharded_triangles_occluded(scene, o, d, t_max, cfg, axis: str) -> jnp.ndarray:
    from ..ops.traverse import kd_any

    blocked = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
    return jax.lax.psum(blocked.astype(jnp.int32), axis) > 0


def make_train_step_2d(cfg, mesh: Mesh, dp_axis: str = "dp",
                       mp_axis: str = "mp", lr: float = 0.1):
    """Full inverse-rendering step on a 2D (dp, mp) mesh: rays + target
    sharded over dp, triangle vertices + kd tables sharded over mp (the
    tp-like axis), other scene tensors replicated.

    Vertex gradients live SHARDED: each device backprops through its local
    shard's hit recomputation (cotangents route through the pmin/psum hit
    combine automatically) and the resulting per-shard grad is psum'd over
    dp only — no all-gather of the vertex tensor ever happens, which is
    the point of leaf sharding.  Returns step(scene, target_flat) ->
    (loss, new_scene) with the updated verts still mp-sharded.
    """
    from ..camera import primary_rays
    from ..render import render_rays, _FrozenConfig

    frozen = _FrozenConfig.from_config(cfg)
    assert frozen.tri_shard_axis == mp_axis
    ndp = mesh.shape[dp_axis]

    def _pad(x):
        pad = (-x.shape[0]) % ndp
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x

    def make_specs(scene):
        return scene_specs(scene, mp_axis)

    @jax.jit
    def step(scene, target_flat):
        o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
        o, d, d_raw, target = _pad(o), _pad(d), _pad(d_raw), _pad(target_flat)
        specs = make_specs(scene)
        tri_spec = jax.tree_util.tree_map(lambda _: P(mp_axis), scene.triangles)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(specs, P(dp_axis), P(dp_axis), P(dp_axis), P(dp_axis)),
            out_specs=(P(), tri_spec),
            check_rep=False,
        )
        def grad_shard(scene, o, d, d_raw, target):
            local = local_scene(scene)

            def loss_fn(verts):
                s = local.replace(triangles=local.triangles.replace(verts=verts))
                colors = render_rays(s, o, d, d_raw, frozen)
                return jnp.sum((colors - target) ** 2) / (target.size * ndp)

            loss, g = jax.value_and_grad(loss_fn)(local.triangles.verts)
            loss = jax.lax.psum(loss, dp_axis)
            g = jax.lax.psum(g, dp_axis)  # dp replicas of MY shard only
            new_verts = local.triangles.verts - lr * g
            tris_out = jax.tree_util.tree_map(
                lambda x: x[None], local.triangles.replace(verts=new_verts))
            return loss, tris_out

        loss, tris = grad_shard(scene, o, d, d_raw, target)
        kd = refresh_kd_blocks_stacked(scene.kd, tris.verts)
        return loss, scene.replace(triangles=tris, kd=kd)

    return step


# --------------------------------------------------------------------------
# full-frame leaf-sharded render
# --------------------------------------------------------------------------

def render_image_leaf_sharded(scene: Scene, cfg, mesh: Mesh,
                              dp_axis: str = "dp", mp_axis: str = "mp"):
    """Full-frame render on a 2D (dp, mp) mesh: rays sharded over dp,
    triangles+kd over mp, other families replicated."""
    from ..camera import primary_rays
    from ..render import render_rays, _FrozenConfig

    frozen = _FrozenConfig.from_config(cfg)
    assert frozen.tri_shard_axis == mp_axis, (
        "set cfg.tri_shard_axis to the mp axis name before building specs")
    o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
    n = o.shape[0]
    ndp = mesh.shape[dp_axis]
    pad = (-n) % ndp
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, fill])
        d_raw = jnp.concatenate([d_raw, fill])

    specs = scene_specs(scene, mp_axis)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P(dp_axis), P(dp_axis), P(dp_axis)),
        out_specs=P(dp_axis),
        check_rep=False,
    )
    def run(scene, o, d, d_raw):
        return render_rays(local_scene(scene), o, d, d_raw, frozen)

    colors = run(scene, o, d, d_raw)
    return colors[:n].reshape(frozen.Height, frozen.Width, 3)
