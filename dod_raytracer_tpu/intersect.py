"""Scene-level closest-hit and any-hit queries.

Fuses the per-family kernels with the reference driver's chaining protocol
(``main.cpp:314-321``): families are queried in the order
sphere -> plane -> cylinder -> triangles(kd-tree), each clipped at the
running closest t, and a later family wins only on a *strictly* smaller t.
In the wavefront design this is a single masked min-reduction; the kd-tree
still receives the tightened clip from the cheap families first, preserving
both the pruning and the tie semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import cylinder as cyl_ops
from .ops import plane as plane_ops
from .ops import sphere as sphere_ops
from .ops import triangle as tri_ops
from .ops.ray import INF, FamilyHit, Hit, closer, miss_like


def _prefer_brute(scene, cfg) -> bool:
    """Small-mesh crossover (SURVEY.md §7 hard part 4): below a triangle
    count threshold the batched brute-force test beats the serial
    descend of the tree walk outright (measured on v5e: unclipped teapot
    at 6.3k tris runs >600x faster brute through the MXU than through
    the kd walk — BASELINE.md).  The kd-tree still gets BUILT for such
    scenes; the query path just bypasses it."""
    thr = int(getattr(cfg, "brute_threshold", 0))
    return 0 < scene.n_triangles <= thr


def _triangles_closest(scene, o, d, t_max, cfg) -> FamilyHit:
    if scene.n_triangles == 0:
        return miss_like(o.shape[0])
    axis = getattr(cfg, "tri_shard_axis", "")
    if axis:
        from .parallel.leaf_shard import sharded_triangles_closest

        return sharded_triangles_closest(scene, o, d, t_max, cfg, axis)
    if scene.kd is not None and not _prefer_brute(scene, cfg):
        from jax.ad_checkpoint import checkpoint_name

        from .ops.traverse import kd_closest

        t_best, idx, hit = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        # saved through remat_bounces so the backward re-derives shading
        # from the SAME discrete winners instead of re-traversing
        idx = checkpoint_name(idx, "traversal")
        hit = checkpoint_name(hit, "traversal")
        return tri_ops.triangle_hit_attrs(scene.triangles, o, d, idx, hit, scene.mesh_colors)
    backend = getattr(cfg, "triangle_backend", "jnp")
    if backend in ("pallas", "plucker"):
        from .ops.pallas.mt_kernel import mt_closest_pallas, on_tpu, swizzle_tris

        verts = jax.lax.stop_gradient(scene.triangles.verts)
        o_s = jax.lax.stop_gradient(o)
        d_s = jax.lax.stop_gradient(d)
        if backend == "plucker":
            from .ops.pallas.plucker_kernel import plucker_closest, plucker_pack

            t_best, idx = plucker_closest(plucker_pack(verts), o_s, d_s,
                                          interpret=not on_tpu())
        else:
            t_best, idx = mt_closest_pallas(swizzle_tris(verts), o_s, d_s,
                                            interpret=not on_tpu())
        hit = t_best < t_max
        return tri_ops.triangle_hit_attrs(scene.triangles, o, d, idx, hit, scene.mesh_colors)
    return tri_ops.intersect_triangles_brute(scene.triangles, scene.mesh_colors, o, d, t_max)


def _triangles_occluded(scene, o, d, t_max, cfg) -> jnp.ndarray:
    if scene.n_triangles == 0:
        return jnp.zeros(o.shape[:-1], bool)
    axis = getattr(cfg, "tri_shard_axis", "")
    if axis:
        from .parallel.leaf_shard import sharded_triangles_occluded

        return sharded_triangles_occluded(scene, o, d, t_max, cfg, axis)
    if scene.kd is not None and not _prefer_brute(scene, cfg):
        from .ops.traverse import kd_any

        return kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
    return tri_ops.occluded_triangles_brute(jax.lax.stop_gradient(scene.triangles.verts), o, d, t_max)


def closest_hit(scene, o, d, cfg, t_max=None) -> Hit:
    """Globally closest hit across all families (the per-pixel family chain
    of main.cpp:312-321 collapsed into one fused reduction)."""
    n = o.shape[0]
    if t_max is None:
        t_max = jnp.full((n,), INF, jnp.float32)
    eps = cfg.Epsilon

    best = sphere_ops.intersect_spheres(scene.spheres, o, d, t_max)
    best = closer(best, plane_ops.intersect_planes(scene.planes, o, d, jnp.minimum(best.t, t_max), eps))
    best = closer(
        best,
        cyl_ops.intersect_cylinders(
            scene.cylinders, o, d, jnp.minimum(best.t, t_max), eps,
            color_bug=cfg.replicate_reference_bugs,
            n_valid=scene.n_cylinders,
        ),
    )
    best = closer(best, _triangles_closest(scene, o, d, jnp.minimum(best.t, t_max), cfg))

    mask = best.t < t_max
    t_safe = jnp.where(mask, best.t, 0.0)
    point = o + d * t_safe[:, None]
    hit = Hit(t=best.t, point=point, normal=best.normal, color=best.color, mask=mask)
    # saved through remat_bounces (policy save_only_these_names): pins the
    # fused family-chain winner so the backward's recompute cannot flip a
    # borderline closest-hit comparison, and skips re-running every
    # family kernel + kd walk.  ~11 words/ray/bounce of residuals vs the
    # ~100+ the shading stage alone would otherwise store.
    from jax.ad_checkpoint import checkpoint_name

    return jax.tree_util.tree_map(lambda x: checkpoint_name(x, "traversal"), hit)


def occluded_families(scene, o, d, t_max, cfg) -> jnp.ndarray:
    """Any-hit over the non-triangle families only (spheres keep the
    reference's orientation-dependent origin-inside-misses quirk, so
    reversed-shadow mode must run them with forward rays)."""
    eps = cfg.Epsilon
    blocked = sphere_ops.occluded_spheres(scene.spheres, o, d, t_max)
    blocked |= plane_ops.occluded_planes(scene.planes, o, d, t_max, eps)
    blocked |= cyl_ops.occluded_cylinders(scene.cylinders, o, d, t_max, eps, n_valid=scene.n_cylinders)
    return blocked


def occluded_triangles(scene, o, d, t_max, cfg) -> jnp.ndarray:
    """Any-hit over the triangle mesh only (public split for the
    reversed-shadow path)."""
    return _triangles_occluded(scene, o, d, t_max, cfg)


def occluded(scene, o, d, t_max, cfg) -> jnp.ndarray:
    """Any-hit visibility query: True where something blocks strictly before
    t_max (canSeeLight's family chain, main.cpp:198-218, as one OR).

    Rays already blocked by a cheap family skip the kd walk entirely
    (t_max=-1 kills them at the root slab test) — the wavefront analogue
    of canSeeLight's early returns (main.cpp:198-218); the OR is
    unchanged, so results are identical."""
    blocked = occluded_families(scene, o, d, t_max, cfg)
    t_tri = jnp.where(blocked, -1.0, t_max)
    blocked |= _triangles_occluded(scene, o, d, t_tri, cfg)
    return blocked
