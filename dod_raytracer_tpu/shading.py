"""Differentiable Whitted shading: ambient + Lambert + Phong + shadows.

Replicates ``getLightingFactor`` and its helpers (``main.cpp:156-244``):

  factor = 0.2                                   # shadeAmbientFactor :156-159
         + sum over visible lights of
             ( max(0, n . normalize(lp - p))     # shadeDiffuseFactor :161-166
             + max(0, reflect(ldir, n) . pixdir)^7  # shadeSpecularFactor :173-180
             ) * intensity / |lp - p|^2          # quadratic falloff :231-233

Reference quirks preserved for pixel parity:
  * the specular term dots against the *original un-normalized pixel ray
    direction* at every bounce (main.cpp:328 passes the outer ``rayDir``);
  * glm::reflect's sign convention reflect(L, N) = L - 2 (N.L) N with L
    pointing *toward* the light;
  * shadow ray origin offset is ``hit + 0.01 * ldir`` (main.cpp:192), not
    Config::Epsilon.

Visibility is a step function: its gradient is defined a.e. and we
stop-gradient the boolean (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .intersect import occluded

AMBIENT = 0.2  # main.cpp:158
SPECULAR_POW = 7.0  # main.cpp:178
SHADOW_OFFSET = 0.01  # main.cpp:192


def light_visibility(scene, points, cfg, active=None, relevant=None) -> jnp.ndarray:
    """(N, L) bool — canSeeLight (main.cpp:182-219) for all rays x lights.

    Two execution shapes, bit-identical results (occlusion is elementwise
    over rays):

    * ``shadow_batch_lights`` (default): ONE any-hit traversal over the
      flattened (L*N,) shadow wavefront.  The lockstep walk's dominant
      real cost is per-iteration fixed overhead, not per-ray work
      (fetch-synchronized measurement, BASELINE.md round 3), so one
      9N-ray walk costs far less than 9 serial N-ray walks.
    * sequential ``lax.map`` over lights, keeping the wavefront at N
      rays — for backends/hosts where the L*N working set (e.g. the
      (L*N, S, 9) leaf gather of the XLA path) would blow memory.

    Rays masked out by ``active`` — and (ray, light) pairs masked out by
    ``relevant`` (N, L) — get t_max=-1 so every occlusion kernel's
    root/entry test rejects them instantly (no wasted traversal work).
    Irrelevant pairs report *visible*; callers only pass relevant=False
    where the light's shading contribution is exactly zero, so the
    returned visibility is never consumed (exact-semantics skip).
    """
    kill0 = jnp.zeros(points.shape[:1], bool)
    if active is not None:
        kill0 |= ~active

    batch = getattr(cfg, "shadow_batch_lights", None)
    if batch is None:
        # auto: batch only where the Pallas traversal backends are
        # available (TPU) — they stream leaf blocks through VMEM so the
        # L*N wavefront costs no extra transient memory.  On CPU/GPU the
        # XLA gather path's (L*N, S, 9) leaf gather would blow memory
        # (~21 GB at flagship shapes), so keep the sequential per-light
        # walk there (same predicate as ops/traverse._backend).
        from .ops.pallas.mt_kernel import on_tpu

        batch = on_tpu()
    if batch:
        lp = scene.lights.position  # (L, 3)
        L, n = lp.shape[0], points.shape[0]
        to_light = lp[:, None, :] - points[None, :, :]  # (L, N, 3)
        dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1))  # (L, N)
        ldir = to_light / jnp.maximum(dist, 1e-30)[..., None]
        o = points[None, :, :] + ldir * SHADOW_OFFSET
        kill = jnp.broadcast_to(kill0[None, :], (L, n))
        if relevant is not None:
            kill = kill | ~relevant.T
        dist = jnp.where(kill, -1.0, dist)
        o_f = o.reshape(L * n, 3)
        d_f = ldir.reshape(L * n, 3)
        t_f = dist.reshape(L * n)
        reverse = getattr(cfg, "shadow_reverse", None)
        if reverse is None:
            from .ops.pallas.mt_kernel import on_tpu

            reverse = on_tpu()
        if reverse:
            # Reversed TRIANGLE occlusion: origin just past the light,
            # direction toward the surface — every ray of a light shares
            # ONE origin, so sorted packets are perfect cones and the
            # shared kd descend degenerates to a single-ray-like walk.
            # The tested segment is identical in exact arithmetic
            # (o_r = l + 0.01*ldir, d_r = -ldir, same dist window), but
            # f32 rounds the reversed intersection parameters
            # differently, so boundary-grazing occluders can flip vs the
            # forward orientation — an epsilon-level deviation, opt-in.
            # The sphere/plane/cylinder families ALWAYS run forward: the
            # reference's origin-inside-misses sphere quirk is
            # orientation-dependent and must see the true ray origin.
            from .intersect import occluded_families, occluded_triangles

            blocked_fam = occluded_families(scene, o_f, d_f, t_f, cfg)
            # o_r = l + 0.01*ldir (just PAST the light): the reversed
            # window u in (0, dist) then covers exactly t_fwd in (0, dist)
            o_r = jnp.broadcast_to(lp[:, None, :], (L, n, 3)) + ldir * SHADOW_OFFSET
            d_r = -ldir
            o_f2 = o_r.reshape(L * n, 3)
            d_f2 = d_r.reshape(L * n, 3)
            t_f2 = jnp.where(blocked_fam, -1.0, t_f)
        sort_shadow = getattr(cfg, "sort_shadow", None)
        if sort_shadow is None:
            # auto: the (L*N,) key sort is a fixed per-bounce cost; it
            # pays only when the per-ray shadow walks it makes coherent
            # are expensive — i.e. over big trees (config.py sort_shadow)
            kd = scene.kd
            sort_shadow = kd is not None and kd.block_g is not None \
                and kd.block_g.shape[0] >= 1024
        if sort_shadow:
            # group each light's rays by hit-point locality: shadow rays
            # from clustered origins to one point light form a tight beam
            # (packet-traversal-friendly).  Exact permutation; killed
            # pairs sort to the back of their light segment so live
            # packets stay dense.
            from .render import _sort_keys

            full_key = _sort_keys(scene, o_f, d_f)
            if reverse:
                # shared-origin cones: group by direction bin (origins
                # are all ~the light, morton is constant)
                key = full_key >> 21  # 9-bit dirbin
                kill_key, seg = 1 << 10, 1 << 11
                tkill = t_f2
            else:
                key = full_key & ((1 << 21) - 1)  # hit-point morton
                kill_key, seg = 1 << 21, 1 << 22
                tkill = t_f
            key = jnp.where(tkill < 0.0, kill_key, key)  # killed -> tail
            light_ix = jax.lax.broadcasted_iota(jnp.int32, (L, n), 0)
            key = key + light_ix.reshape(L * n) * seg
            _, perm = jax.lax.sort_key_val(
                key, jax.lax.broadcasted_iota(jnp.int32, (L * n,), 0))
            if reverse:
                from .intersect import occluded_triangles

                blk_s = occluded_triangles(scene, o_f2[perm], d_f2[perm],
                                           t_f2[perm], cfg)
            else:
                blk_s = occluded(scene, o_f[perm], d_f[perm], t_f[perm], cfg)
            _, blocked = jax.lax.sort_key_val(perm, blk_s)
            blocked = blocked.reshape(L, n)
            if reverse:
                blocked = blocked | blocked_fam.reshape(L, n)
        elif reverse:
            blocked = (blocked_fam
                       | occluded_triangles(scene, o_f2, d_f2, t_f2, cfg)
                       ).reshape(L, n)
        else:
            blocked = occluded(scene, o_f, d_f, t_f, cfg).reshape(L, n)
        return ~blocked.T

    def one_light(args):
        lp, rel = args
        to_light = lp[None, :] - points  # (N, 3)
        dist = jnp.sqrt(jnp.sum(to_light * to_light, axis=-1))
        ldir = to_light / jnp.maximum(dist, 1e-30)[:, None]
        o = points + ldir * SHADOW_OFFSET
        kill = kill0
        if rel is not None:
            kill = kill | ~rel
        dist = jnp.where(kill, -1.0, dist)
        return occluded(scene, o, ldir, dist, cfg)

    if relevant is None:
        blocked = jax.lax.map(lambda lp: one_light((lp, None)),
                              scene.lights.position)  # (L, N)
    else:
        blocked = jax.lax.map(one_light,
                              (scene.lights.position, relevant.T))
    return ~blocked.T


def lighting_factor(scene, points, normals, pixel_dirs, cfg, active=None) -> jnp.ndarray:
    """(N,) scalar lighting factor (getLightingFactor, main.cpp:221-244).

    ``pixel_dirs`` is the un-normalized primary direction (parity quirk).
    ``active`` masks rays whose shadow queries should be skipped (their
    factor is still computed but visibility is forced False to avoid
    wasted-ray NaNs from garbage hit points).

    The Lambert/Phong terms are evaluated BEFORE the shadow pass so
    (ray, light) pairs with exactly zero contribution (light behind the
    surface AND no specular lobe — roughly half the 9 reference lights for
    any given hit) never launch a shadow traversal: visibility is
    multiplied by zero either way, so skipping is exact (amortizes the
    main.cpp:182-219 per-light loop, VERDICT r1 item 5).
    """
    lp = scene.lights.position  # (L, 3)
    li = scene.lights.intensity  # (L,)

    to_light = lp[None, :, :] - points[:, None, :]  # (N, L, 3)
    dist_sq = jnp.maximum(jnp.sum(to_light * to_light, axis=-1), 1e-30)
    ldir = to_light * jax.lax.rsqrt(dist_sq)[..., None]
    dist_factor = li[None, :] / dist_sq  # main.cpp:233

    diffuse = jnp.maximum(0.0, jnp.sum(normals[:, None, :] * ldir, axis=-1))  # :164
    refl = ldir - 2.0 * jnp.sum(normals[:, None, :] * ldir, axis=-1, keepdims=True) * normals[:, None, :]  # glm::reflect(ldir, n)
    spec_dot = jnp.maximum(0.0, jnp.sum(refl * pixel_dirs[:, None, :], axis=-1))  # :178 vs raw pixel dir
    specular = spec_dot ** SPECULAR_POW

    relevant = jax.lax.stop_gradient(diffuse + specular) > 0.0  # (N, L)
    visible = jax.lax.stop_gradient(
        light_visibility(scene, points, cfg, active, relevant))  # (N, L)
    # saved through remat_bounces: the backward must NOT re-run the 9
    # shadow traversals (nor risk flipping a borderline visibility bit)
    visible = jax.ad_checkpoint.checkpoint_name(visible, "traversal")
    if active is not None:
        visible &= active[:, None]
    # irrelevant pairs come back "visible" but multiply a zero term
    per_light = jnp.where(visible, (diffuse + specular) * dist_factor, 0.0)
    return AMBIENT + jnp.sum(per_light, axis=-1)
