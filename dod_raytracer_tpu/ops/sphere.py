"""Batched ray-sphere intersection.

Replicates the reference's AVX geometric test (``sphere.cpp:26-160``) as a
``(N rays) x (S spheres)`` broadcast on the VPU; the 8-wide lane axis of the
reference becomes the sphere axis here.  Validity mask exactly matches the
vectorized path:

  valid = (|L|^2 > r^2)        # ray origin strictly outside (sphere.cpp:70)
        & (d2   < r^2)         # closest approach inside      (sphere.cpp:88)
        & (t0 >= 0) & (t1 >= 0)  # sphere fully in front     (sphere.cpp:103-105)
  t = min(t0, t1)

and the reported hit requires t strictly below the incoming clipping
distance (sphere.cpp:127,134).  Ties keep the lowest sphere index
(first-improvement scan, sphere.cpp:125-132) == jnp.argmin first-occurrence.

Differentiable w.r.t. center, radius and color: the winning index is
discrete (stop-gradient), after which t / normal are recomputed from the
gathered winner analytically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import dot, safe_sqrt
from .ray import FamilyHit, INF


def sphere_candidate_t(center, radius, o, d):
    """All-pairs candidate t: (N, S) with +inf for invalid pairs."""
    L = center[None, :, :] - o[:, None, :]  # (N, S, 3)
    dist_sq = jnp.sum(L * L, axis=-1)
    r_sq = (radius * radius)[None, :]
    tca = jnp.sum(L * d[:, None, :], axis=-1)
    d2 = dist_sq - tca * tca
    thc = safe_sqrt(r_sq - d2)
    t0 = tca - thc
    t1 = tca + thc
    valid = (dist_sq > r_sq) & (d2 < r_sq) & (t0 >= 0.0) & (t1 >= 0.0)
    return jnp.where(valid, jnp.minimum(t0, t1), INF)


def _recompute_t(center_w, radius_w, o, d, valid):
    """Differentiable t for the already-selected sphere (N, 3)/(N,)."""
    L = center_w - o
    dist_sq = dot(L, L)
    r_sq = radius_w * radius_w
    tca = dot(L, d)
    d2 = dist_sq - tca * tca
    thc = safe_sqrt(jnp.where(valid, r_sq - d2, 1.0))
    return tca - thc  # == min(t0, t1) given t0,t1 >= 0


def intersect_spheres(spheres, o, d, t_max) -> FamilyHit:
    """Closest-hit over the sphere family.

    Args:
      spheres: scene.Spheres (S-padded, padding radius == 0 never hits).
      o, d: (N, 3) ray origins / directions.
      t_max: (N,) incoming clipping distance (strict upper bound).
    """
    t_all = sphere_candidate_t(spheres.center, spheres.radius, o, d)  # (N, S)
    idx = jax.lax.stop_gradient(jnp.argmin(t_all, axis=1))  # (N,)
    t_fwd = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0]
    hit = t_fwd < t_max

    center_w = spheres.center[idx]
    radius_w = spheres.radius[idx]
    t = _recompute_t(center_w, radius_w, o, d, hit)
    t = jnp.where(hit, t, INF)

    point = o + d * jnp.where(hit, t, 0.0)[:, None]
    # hitNormal = normalize(hitPoint - center) (sphere.cpp:157)
    delta = point - center_w
    nrm_sq = jnp.maximum(dot(delta, delta), 1e-30)
    normal = delta * jax.lax.rsqrt(nrm_sq)[:, None]
    return FamilyHit(t=t, normal=normal, color=spheres.color[idx])


def occluded_spheres(spheres, o, d, t_max) -> jnp.ndarray:
    """Any-hit query: does any sphere hit strictly before t_max?
    (sphere.cpp:138-141 returnOnAny reduces to the same boolean)."""
    t_all = sphere_candidate_t(spheres.center, spheres.radius, o, d)
    return jnp.any(t_all < t_max[:, None], axis=1)
