"""Batched ray-plane intersection.

Replicates the reference's vectorized plane test (``plane.cpp:27-139``):

  t = ((p0 - O) . n) / (d . n)
  valid = (|d . n| > eps) & (t > eps) & (t < clip)

The hit normal is the stored plane normal, deliberately NOT flipped toward
the ray (plane.cpp:134 keeps the unflipped normal; the flip is commented
out).  Ties keep the lowest plane index (first-improvement scan,
plane.cpp:105-112).  Zero-normal padding planes are rejected by the
parallel mask, which also makes the reference's no-op last-lane mask
(plane.cpp:33-36) irrelevant here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import safe_div
from .ray import FamilyHit, INF


def plane_candidate_t(point, normal, o, d, eps):
    """All-pairs candidate t: (N, P), +inf for invalid pairs."""
    denom = jnp.einsum("nk,pk->np", d, normal)
    num = jnp.einsum("npk,pk->np", point[None, :, :] - o[:, None, :], normal)
    not_parallel = jnp.abs(denom) > eps
    t = safe_div(num, denom, not_parallel)
    valid = not_parallel & (t > eps)
    return jnp.where(valid, t, INF)


def intersect_planes(planes, o, d, t_max, eps) -> FamilyHit:
    t_all = plane_candidate_t(planes.point, planes.normal, o, d, eps)  # (N, P)
    idx = jax.lax.stop_gradient(jnp.argmin(t_all, axis=1))
    hit = jnp.take_along_axis(t_all, idx[:, None], axis=1)[:, 0] < t_max

    p_w = planes.point[idx]
    n_w = planes.normal[idx]
    denom = jnp.sum(d * n_w, axis=-1)
    num = jnp.sum((p_w - o) * n_w, axis=-1)
    t = safe_div(num, denom, hit)
    t = jnp.where(hit, t, INF)
    return FamilyHit(t=t, normal=n_w, color=planes.color[idx])


def occluded_planes(planes, o, d, t_max, eps) -> jnp.ndarray:
    t_all = plane_candidate_t(planes.point, planes.normal, o, d, eps)
    return jnp.any(t_all < t_max[:, None], axis=1)
