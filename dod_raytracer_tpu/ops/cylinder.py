"""Batched finite capped-cylinder intersection.

Replicates the reference's scalar cylinder path (``cylinder.cpp:35-210``):
per cylinder three candidates — the quadratic body test
(``intersect_cylinder_body``, cylinder.cpp:76-118) and two cap discs at
offsets 0 and height (``intersect_cylinder_disc``, cylinder.cpp:120-152) —
fused by a first-occurrence strict min in candidate order
[body, bottom cap, top cap] per cylinder, cylinders in creation order
(cylinder.cpp:168-193).

Validity rules, exactly as the reference:
  body:  discriminant >= eps; t = minNonNegative(tSub, tAdd) finite;
         0 <= dot(hit - base, axis) <= height.  (No eps lower bound on t,
         no internal clip test — the caller's strict t_max chain applies.)
  disc:  |d . axis| >= eps; eps <= t <= clip; |hit - center|^2 <= r^2.
  body normal: normalize(hit - base - axis * dot(hit - base, axis))
  disc normal: -axis if d . axis > 0 else axis  (cylinder.cpp:150)

NOTE the reference drops the hit color/attrs on cylinder hits (the
assignments at cylinder.cpp:204-207 are commented out, leaving the
zero-initialized HitRecord color) — a behavioral bug.  We implement color
correctly; pass ``color_bug=True`` (cfg.replicate_reference_bugs) to
reproduce the reference's black cylinders bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import dot, safe_div, safe_sqrt
from .ray import FamilyHit, INF


def cylinder_candidate_t(cyl, o, d, t_max, eps, n_valid=None):
    """Candidates (N, C, 3) in order [body, discA(0), discB(height)].

    ``n_valid``: static count of real (non-padding) cylinders; padded
    columns are masked to +inf so degenerate padding can never hit nor
    poison gradients.
    """
    base, axis = cyl.base, cyl.axis  # (C,3)
    r_sq = (cyl.radius * cyl.radius)[None, :]  # (1,C)
    height = cyl.height[None, :]

    o_b = o[:, None, :]  # (N,1,3)
    d_b = d[:, None, :]
    ax = axis[None, :, :]  # (1,C,3)

    # --- body (cylinder.cpp:76-118) ---
    delta_p = o_b - base[None, :, :]
    d_dot_a = jnp.sum(d_b * ax, axis=-1)  # (N,C)
    v_rem = d_b - d_dot_a[..., None] * ax
    dp_dot_a = jnp.sum(delta_p * ax, axis=-1)
    dp_rem = delta_p - dp_dot_a[..., None] * ax

    a = jnp.sum(v_rem * v_rem, axis=-1)
    b = 2.0 * jnp.sum(v_rem * dp_rem, axis=-1)
    c = jnp.sum(dp_rem * dp_rem, axis=-1) - r_sq
    disc = b * b - 4.0 * a * c
    disc_ok = disc >= eps  # reference: disc < eps -> miss (cylinder.cpp:87)
    sq = safe_sqrt(jnp.where(disc_ok, disc, 0.0))
    inv_2a = safe_div(jnp.ones_like(a), 2.0 * a, disc_ok & (a != 0.0))
    t_sub = (-b - sq) * inv_2a
    t_add = (-b + sq) * inv_2a
    # minNonNegative (cylinder.cpp:8-26): inf when both negative
    t_body = jnp.where(
        (t_sub < 0.0) & (t_add < 0.0), INF,
        jnp.where(t_sub < 0.0, t_add, jnp.where(t_add < 0.0, t_sub, jnp.minimum(t_sub, t_add))),
    )
    body_finite = disc_ok & (a != 0.0) & jnp.isfinite(t_body)
    hit_pt = o_b + d_b * jnp.where(body_finite, t_body, 0.0)[..., None]
    axis_factor = jnp.sum((hit_pt - base[None, :, :]) * ax, axis=-1)
    body_ok = body_finite & (axis_factor >= 0.0) & (axis_factor <= height)
    t_body = jnp.where(body_ok, t_body, INF)

    # --- caps (cylinder.cpp:120-152) ---
    def disc_t(offset):
        center = base[None, :, :] + ax * offset[..., None]
        denom = d_dot_a
        not_par = jnp.abs(denom) >= eps
        t = safe_div(jnp.sum((center - o_b) * ax, axis=-1), denom, not_par)
        ok = not_par & (t >= eps) & (t <= t_max[:, None])
        pt = o_b + d_b * jnp.where(ok, t, 0.0)[..., None]
        on_plane = pt - center
        ok = ok & (jnp.sum(on_plane * on_plane, axis=-1) <= r_sq)
        return jnp.where(ok, t, INF)

    t_disc_a = disc_t(jnp.zeros_like(height))
    t_disc_b = disc_t(height)

    cand = jnp.stack([t_body, t_disc_a, t_disc_b], axis=-1)  # (N, C, 3)
    if n_valid is not None and n_valid < cyl.base.shape[0]:
        col_ok = jnp.arange(cyl.base.shape[0]) < n_valid
        cand = jnp.where(col_ok[None, :, None], cand, INF)
    return cand


def intersect_cylinders(cyl, o, d, t_max, eps, color_bug: bool = False, n_valid=None) -> FamilyHit:
    t_cand = cylinder_candidate_t(cyl, o, d, t_max, eps, n_valid)  # (N, C, 3)
    n = o.shape[0]
    flat = t_cand.reshape(n, -1)  # cylinder-major, candidate-minor: ref order
    idx = jax.lax.stop_gradient(jnp.argmin(flat, axis=1))
    t_fwd = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    hit = t_fwd < t_max
    ci = idx // 3  # winning cylinder
    kind = idx % 3  # 0 body, 1 discA, 2 discB

    base_w, axis_w = cyl.base[ci], cyl.axis[ci]
    r_w, h_w = cyl.radius[ci], cyl.height[ci]

    # differentiable recompute of the winning candidate's t
    d_dot_a = dot(d, axis_w)
    is_body = kind == 0
    # body t: quadratic root -b - sqrt(disc) or -b + sqrt depending on sign;
    # recompute via same formula and pick the same minNonNegative branch.
    delta_p = o - base_w
    v_rem = d - d_dot_a[:, None] * axis_w
    dp_rem = delta_p - dot(delta_p, axis_w)[:, None] * axis_w
    a = dot(v_rem, v_rem)
    b = 2.0 * dot(v_rem, dp_rem)
    c = dot(dp_rem, dp_rem) - r_w * r_w
    disc = b * b - 4.0 * a * c
    sq = safe_sqrt(jnp.where(is_body & hit, disc, 1.0))
    inv_2a = safe_div(jnp.ones_like(a), 2.0 * a, is_body & hit)
    t_sub = (-b - sq) * inv_2a
    t_add = (-b + sq) * inv_2a
    t_body = jnp.where(
        (t_sub < 0.0) & (t_add < 0.0), INF,
        jnp.where(t_sub < 0.0, t_add, jnp.where(t_add < 0.0, t_sub, jnp.minimum(t_sub, t_add))),
    )
    # cap t
    off = jnp.where(kind == 2, h_w, 0.0)
    center = base_w + axis_w * off[:, None]
    t_cap = safe_div(dot(center - o, axis_w), d_dot_a, (~is_body) & hit)
    t = jnp.where(is_body, t_body, t_cap)
    t = jnp.where(hit, t, INF)

    point = o + d * jnp.where(hit, t, 0.0)[:, None]
    # body normal (cylinder.cpp:113-116)
    ax_fac = dot(point - base_w, axis_w)
    radial = point - base_w - axis_w * ax_fac[:, None]
    rad_sq = jnp.maximum(dot(radial, radial), 1e-30)
    n_body = radial * jax.lax.rsqrt(rad_sq)[:, None]
    # disc normal (cylinder.cpp:150)
    n_disc = jnp.where((d_dot_a > 0.0)[:, None], -axis_w, axis_w)
    normal = jnp.where(is_body[:, None], n_body, n_disc)

    color = jnp.zeros_like(cyl.color[ci]) if color_bug else cyl.color[ci]
    return FamilyHit(t=t, normal=normal, color=color)


def occluded_cylinders(cyl, o, d, t_max, eps, n_valid=None) -> jnp.ndarray:
    t_cand = cylinder_candidate_t(cyl, o, d, t_max, eps, n_valid)
    return jnp.any(t_cand.reshape(o.shape[0], -1) < t_max[:, None], axis=1)
