"""Axis-aligned bounding-box slab test.

Replicates ``AxisAlignedBoundingBox::intersect`` (``box.cpp:33-53``),
including its NaN behavior: when a ray origin component lies exactly on a
slab with a parallel direction, 0 * inf = NaN comparisons are False so the
slab is skipped — identical to the C++ ternaries.
"""

from __future__ import annotations

import jax.numpy as jnp


def slab_test(bounds_min, bounds_max, o, inv_d, t_clip):
    """Batched slab test against a single box.

    Args:
      bounds_min, bounds_max: (3,) box corners.
      o: (N, 3) ray origins; inv_d: (N, 3) 1/direction (+-inf allowed).
      t_clip: (N,) initial tmax (the clipping distance, box.cpp:36).
    Returns:
      (hit (N,) bool, tmin (N,), tmax (N,)).
    """
    tmin = jnp.zeros(o.shape[:-1], o.dtype)
    tmax = t_clip
    hit = jnp.ones(o.shape[:-1], bool)
    for axis in range(3):
        t_near = (bounds_min[axis] - o[..., axis]) * inv_d[..., axis]
        t_far = (bounds_max[axis] - o[..., axis]) * inv_d[..., axis]
        swap = t_near > t_far  # NaN -> False, like std::swap guard box.cpp:43
        t_near, t_far = jnp.where(swap, t_far, t_near), jnp.where(swap, t_near, t_far)
        tmin = jnp.where(t_near > tmin, t_near, tmin)  # NaN -> keep (box.cpp:46)
        tmax = jnp.where(t_far < tmax, t_far, tmax)
        hit &= ~(tmin > tmax)
    return hit, tmin, tmax


def aabb_union(mins, maxs):
    """Union over leading axis: (K, 3) -> ((3,), (3,))."""
    return jnp.min(mins, axis=0), jnp.max(maxs, axis=0)


def surface_area(bmin, bmax):
    """2(xy + xz + yz) (box.cpp:27-31)."""
    d = bmax - bmin
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2])
