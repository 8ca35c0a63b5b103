"""Ray and hit-record SoA pytrees.

TPU-native form of the reference's per-ray ``_Intersect`` parameter struct
and ``HitRecord`` (``src/shapes/base_shape.h:8-15``, ``hitrecord.h:4-10``):
the single ray becomes a wavefront batch ``(N,)``; ``returnOnAny`` becomes a
separate any-hit query; ``clippingDistance`` is the ``t_max`` array.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

INF = jnp.inf


@struct.dataclass
class Rays:
    origin: jnp.ndarray  # (N, 3) f32
    direction: jnp.ndarray  # (N, 3) f32 (normalized for shading parity)

    @property
    def batch_shape(self):
        return self.origin.shape[:-1]


@struct.dataclass
class FamilyHit:
    """Per-family closest-hit candidate: t == +inf encodes a miss."""

    t: jnp.ndarray  # (N,) f32, +inf on miss
    normal: jnp.ndarray  # (N, 3) f32 (garbage on miss)
    color: jnp.ndarray  # (N, 3) f32 (garbage on miss)


@struct.dataclass
class Hit:
    """Fused scene hit record (HitRecord equivalent, hitrecord.h:4-10)."""

    t: jnp.ndarray  # (N,) f32, +inf on miss
    point: jnp.ndarray  # (N, 3) f32
    normal: jnp.ndarray  # (N, 3) f32
    color: jnp.ndarray  # (N, 3) f32
    mask: jnp.ndarray  # (N,) bool — True where something was hit


def miss_like(n: int) -> FamilyHit:
    return FamilyHit(
        t=jnp.full((n,), INF, jnp.float32),
        normal=jnp.zeros((n, 3), jnp.float32),
        color=jnp.zeros((n, 3), jnp.float32),
    )


def closer(a: FamilyHit, b: FamilyHit) -> FamilyHit:
    """Fuse two family candidates with the reference's chaining protocol:
    the *later* family wins only on a strictly smaller t (main.cpp:314-321 —
    each family only reports hits strictly closer than the incoming
    clippingDistance)."""
    take_b = b.t < a.t
    return FamilyHit(
        t=jnp.where(take_b, b.t, a.t),
        normal=jnp.where(take_b[..., None], b.normal, a.normal),
        color=jnp.where(take_b[..., None], b.color, a.color),
    )
