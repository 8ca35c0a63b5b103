"""Inverse-rendering utilities: losses, parameter gradients, update steps.

All-new capability (the reference renderer is forward-only): the whole
pipeline in this package is differentiable end-to-end — pixel loss ->
gradients w.r.t. vertex positions, sphere parameters, material albedo and
light intensity (BASELINE.json north star) — because

* every intersection op recomputes the winning primitive's hit
  analytically after a stop-gradient argmin / kd-traversal (gradients flow
  through hit geometry, never through discrete traversal decisions), and
* shadow visibility is a stop-gradient step function (gradient defined
  almost everywhere).

``render_loss_and_grads`` is the building block the distributed training
step wraps with psum (parallel/sharding.py).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from .camera import primary_rays
from .render import render_rays, _FrozenConfig


def render_for_grad(scene, cfg, width=None, height=None):
    """Un-tiled differentiable render at a (small) resolution."""
    w = width or cfg.Width
    h = height or cfg.Height
    o, d, d_raw = primary_rays(w, h)
    colors = render_rays(scene, o, d, d_raw, cfg)
    return colors.reshape(h, w, 3)


def mse_loss(scene, target, cfg, width=None, height=None):
    img = render_for_grad(scene, cfg, width, height)
    return jnp.mean((img - target) ** 2)


def split_float_params(scene, params: Sequence[str]) -> dict:
    """Extract the selected scene parameters as a grad-ready dict.

    Entries are either a whole family subtree ('spheres', 'lights', ...)
    or a dotted leaf path ('spheres.color', 'lights.intensity',
    'triangles.verts') for fine-grained optimization.  Integer leaves are
    dropped (None) so the result is a valid grad input.
    """
    def keep(x):
        return x if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact) else None

    diff = {}
    for p in params:
        if "." in p:
            fam, field = p.split(".", 1)
            diff[p] = keep(getattr(getattr(scene, fam), field))
        else:
            diff[p] = jax.tree_util.tree_map(keep, getattr(scene, p))
    return diff


def merge_params(scene, diff: dict):
    """Inverse of split_float_params: None leaves keep the scene's value."""
    updates: dict = {}
    for p, sub in diff.items():
        if "." in p:
            fam, field = p.split(".", 1)
            cur = updates.get(fam, getattr(scene, fam))
            if sub is not None:
                cur = cur.replace(**{field: sub})
            updates[fam] = cur
        else:
            assert p not in updates, f"mixing '{p}' with dotted paths of the same family"
            orig = getattr(scene, p)
            updates[p] = jax.tree_util.tree_map(
                lambda o_leaf, d_leaf: o_leaf if d_leaf is None else d_leaf,
                orig, sub, is_leaf=lambda x: x is None,
            )
    out = scene.replace(**updates)
    # vertex updates invalidate the kd-tree's pre-gathered triangle blocks
    # (the traversal's forward data): refresh them from the new vertices.
    touched_verts = any(p == "triangles" or p.startswith("triangles.") for p in diff)
    if touched_verts and out.kd is not None and out.kd.block_tris is not None:
        from .accel.kdtree import refresh_kd_blocks

        out = out.replace(kd=refresh_kd_blocks(out.kd, out.triangles.verts))
    return out


def loss_and_param_grads(scene, target, cfg, params: Sequence[str] = ("spheres", "lights")):
    """Value and gradients of the pixel MSE w.r.t. selected scene subtrees.

    ``params`` selects top-level Scene fields ('spheres', 'planes',
    'cylinders', 'triangles', 'mesh_colors', 'lights'); everything else is
    treated as constant.  Integer leaves are excluded automatically.
    """
    frozen = _FrozenConfig.from_config(cfg)

    def loss_fn(diff):
        return mse_loss(merge_params(scene, diff), target, frozen)

    val, grads = jax.value_and_grad(loss_fn)(split_float_params(scene, params))
    return val, grads


def sgd_step(scene, grads: dict, lr: float):
    """Apply a plain gradient step to the selected subtrees (None leaves in
    ``grads`` — excluded integer fields — are left untouched)."""
    stepped = {
        name: jax.tree_util.tree_map(
            lambda g, p: None if g is None else p - lr * g,
            g, getattr(scene, name), is_leaf=lambda x: x is None)
        for name, g in grads.items()
    }
    return merge_params(scene, stepped)


def finite_difference(f: Callable[[Any], jnp.ndarray], x: jnp.ndarray, eps: float = 1e-3):
    """Central finite differences of a scalar function at every element of
    x (test utility for VJP validation, SURVEY.md §4)."""
    import numpy as np

    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy()
        xm = x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (float(f(jnp.asarray(xp, jnp.float32))) - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
        it.iternext()
    return g
