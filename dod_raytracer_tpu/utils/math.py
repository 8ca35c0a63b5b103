"""Small vector-math substrate on batched ``(..., 3)`` arrays.

TPU-native replacement for the reference's glm scalar math and the 8-wide
AVX helpers (``src/utils/avx_utils.h:5-60``): the AVX lane axis becomes the
ray-batch axis, so every helper here is elementwise over arbitrary leading
batch dims and maps onto the VPU under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched vec3 dot product -> (...,). avx_utils.h:13-22 equivalent."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched vec3 cross product. avx_utils.h:24-33 equivalent."""
    return jnp.cross(a, b)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot(a, a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """glm::normalize equivalent: a / |a| (no epsilon guard by default,
    matching glm's fast path). Pass ``eps`` to guard degenerate vectors."""
    n = norm(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def safe_normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize with a NaN-free gradient at |a| == 0 (maps 0 -> 0)."""
    sq = dot(a, a)
    good = sq > 0.0
    inv = jnp.where(good, jnp.sqrt(jnp.where(good, sq, 1.0)), 1.0)
    return a / inv[..., None]


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """glm::reflect: I - 2*dot(N, I)*N (used at main.cpp:176,332)."""
    return incident - 2.0 * dot(normal, incident)[..., None] * normal


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 with a finite gradient for x <= 0.

    Needed wherever the forward math takes sqrt of an expression that is
    masked out when negative (e.g. sphere thc, sphere.cpp:96-97): a plain
    ``sqrt(max(x, 0))`` still produces NaN cotangents at x == 0.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_div(a: jnp.ndarray, b: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """a / b where ``valid`` else 0, with no NaN/Inf in forward or backward."""
    denom = jnp.where(valid, b, 1.0)
    return jnp.where(valid, a, 0.0) / denom
