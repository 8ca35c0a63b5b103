"""Primary-ray generation.

Replicates the reference's hardcoded pinhole sweep (``main.cpp:275-279,
294-345``): origin fixed at (0, 0, -4.9); the un-normalized image-plane
direction for pixel (row i, col j) is

  dir = (-Ratio + j * 2*Ratio/W,  1 - i * 2/H,  1)

The *un-normalized* per-pixel direction is kept alongside the normalized one
because the reference feeds the raw ``rayDir`` (not ``rayNorm``, and not the
current bounce direction) into the specular term at every bounce
(main.cpp:328 passes ``rayDir``; cf. shadeSpecularFactor main.cpp:173-180).
"""

from __future__ import annotations

import jax.numpy as jnp

ORIGIN = (0.0, 0.0, -4.9)  # main.cpp:275,308


def primary_ray_dirs(width: int, height: int, row0: int = 0, row1: int | None = None):
    """Un-normalized primary directions for rows [row0, row1).

    Returns (R*W, 3) flattened row-major, matching the framebuffer layout
    (main.cpp:294-299).
    """
    if row1 is None:
        row1 = height
    ratio = jnp.float32(width) / jnp.float32(height)
    wstep = 2.0 * ratio / width  # main.cpp:278
    hstep = 2.0 / height  # main.cpp:279
    cols = jnp.arange(width, dtype=jnp.float32)
    rows = jnp.arange(row0, row1, dtype=jnp.float32)
    x = -ratio + cols * wstep  # main.cpp:276,342
    y = 1.0 - rows * hstep  # main.cpp:276,295,345
    xx, yy = jnp.meshgrid(x, y)  # (R, W)
    d = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # (R, W, 3)
    return d.reshape(-1, 3)


def primary_rays(width: int, height: int, row0: int = 0, row1: int | None = None):
    """(origins (N,3), dirs_normalized (N,3), dirs_unnormalized (N,3))."""
    d_raw = primary_ray_dirs(width, height, row0, row1)
    norm = jnp.sqrt(jnp.sum(d_raw * d_raw, axis=-1, keepdims=True))
    d = d_raw / norm  # main.cpp:304 rayNorm
    o = jnp.broadcast_to(jnp.asarray(ORIGIN, jnp.float32), d.shape)
    return o, d, d_raw
