"""kd-tree build orchestration: host build -> device KDArrays.

The build itself is O(N log N) pointer-chasing — a host workload, not a TPU
one (SURVEY.md §2 #12): runs in C++ (native/kdtree_build.cpp) when the
shared library is built, else the numpy reference builder.  The *output* is
flat device tensors consumed by the Pallas/XLA traversal.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import _kdtree_np
from ..scene import KDArrays


def build_kdtree(tri_verts: np.ndarray, cfg) -> KDArrays:
    built = None
    try:
        from ..native import kdtree_native

        built = kdtree_native.build(
            tri_verts,
            lane_size=cfg.lane_size,
            max_prims=cfg.MaxPrims,
            intersect_cost=float(cfg.IntersectCost),
            traversal_cost=float(cfg.TraversalCost),
            empty_bonus=float(cfg.EmptyBonus),
        )
    except Exception:
        built = None
    if built is None:
        built = _kdtree_np.build(
            tri_verts,
            lane_size=cfg.lane_size,
            max_prims=cfg.MaxPrims,
            intersect_cost=float(cfg.IntersectCost),
            traversal_cost=float(cfg.TraversalCost),
            empty_bonus=float(cfg.EmptyBonus),
        )

    # build stats — the one observability output the reference prints
    # (lane duplication count, triangle.cpp:356; node walk printfs,
    # kdtree.cpp:255-257), as structured logging (SURVEY.md §5)
    num_lanes_in = (tri_verts.shape[0] + cfg.lane_size - 1) // cfg.lane_size
    from ..utils.profiling import logger

    logger.info(
        "kd build: %d tris, %d nodes (%d leaves), depth %d, "
        "%d reordered lanes (dup ratio %.3f)",
        tri_verts.shape[0], built.node_flag.shape[0],
        int((built.node_flag == _kdtree_np.LEAF_FLAG).sum()), built.max_depth,
        built.prim_nums.shape[0],
        built.prim_nums.shape[0] / max(num_lanes_in, 1),
    )

    built = _kdtree_np.align_leaves(built, cfg.leaf_chunk_lanes)
    perm = _kdtree_np.perm_from_prim_nums(built.prim_nums, tri_verts.shape[0], cfg.lane_size)
    block = cfg.leaf_chunk_lanes * cfg.lane_size

    # treelet forest for the Pallas forest megakernel when the tree exceeds
    # one VMEM-resident table (ops/pallas/traverse_kernel.py MAX_NODES)
    tre_tbl = top_tbl = None
    from ..ops.pallas.traverse_kernel import MAX_NODES

    cap = int(getattr(cfg, "treelet_cap", 0)) or MAX_NODES
    if built.node_flag.shape[0] > cap:
        roots, sizes = _kdtree_np.cut_treelets(built, cap)
        tre_tbl = jnp.asarray(_kdtree_np.pack_treelet_tables(
            built, roots, sizes, cfg.leaf_chunk_lanes, cap))
        top_tbl = jnp.asarray(_kdtree_np.build_top_table(built, roots))

    kd = KDArrays(
        tre_tbl=tre_tbl,
        top_tbl=top_tbl,
        node_flag=jnp.asarray(built.node_flag),
        node_split=jnp.asarray(built.node_split),
        node_right=jnp.asarray(built.node_right),
        node_leaf_start=jnp.asarray(built.node_leaf_start),
        node_leaf_lanes=jnp.asarray(built.node_leaf_lanes),
        bounds_min=jnp.asarray(built.bounds_min),
        bounds_max=jnp.asarray(built.bounds_max),
        tri_perm=jnp.asarray(perm),
        block_orig=jnp.asarray(perm).reshape(-1, block),
        lane_size=int(cfg.lane_size),
        num_lanes=int(built.prim_nums.shape[0]),
        max_leaf_lanes=int(built.max_leaf_lanes),
        block_lanes=int(cfg.leaf_chunk_lanes),
        max_depth=int(built.max_depth),
    )
    return refresh_kd_blocks(kd, jnp.asarray(tri_verts))


def refresh_kd_blocks(kd: KDArrays, tri_verts) -> KDArrays:
    """(Re)materialize the pre-gathered triangle blocks from the current
    vertex array.  Must be called after vertex updates (e.g. each
    inverse-rendering step) so the traversal's forward data stays in sync;
    the gather itself is differentiable-free (traversal is stop-grad)."""
    import jax

    from ..ops.pallas.block_loop_kernel import pack_block_g

    if kd.block_orig is None:
        return kd
    orig = kd.block_orig  # (B, S)
    verts = jax.lax.stop_gradient(tri_verts)[jnp.maximum(orig, 0)]  # (B, S, 3, 3)
    verts = jnp.where((orig >= 0)[..., None, None], verts, 0.0)
    A = verts[..., 0, :]
    e1 = verts[..., 1, :] - A
    e2 = verts[..., 2, :] - A
    rows = jnp.concatenate([A, e1, e2], axis=-1)  # (B, S, 9)
    # per-block vertex AABB for the packet kernel's pre-DMA prune; empty
    # slots get [+inf, -inf] so they never extend the box
    vmask = (orig >= 0)[..., None, None]
    vmin = jnp.where(vmask, verts, jnp.inf).min(axis=(1, 2))   # (B, 3)
    vmax = jnp.where(vmask, verts, -jnp.inf).max(axis=(1, 2))  # (B, 3)
    aabb = jnp.concatenate([vmin, vmax], axis=1).T  # (6, B)
    return kd.replace(block_tris=rows, block_g=pack_block_g(verts),
                      block_aabb=aabb)
