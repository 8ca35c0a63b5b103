#!/usr/bin/env python
"""On-hardware exactness checks for the Pallas traversal kernels.

The pytest suite runs the kernels in interpret mode (CPU); Mosaic's real
lowering differs (one-pass-bf16 defaults, i1 vector rules, DMA paths), so
this script re-runs the exact-match comparisons on the actual chip:

  mega   : teapot tree (<=1024 nodes) through the single-table megakernel
  forest : teapot at treelet_cap=128 AND a 40k-tri mesh past MAX_NODES
           through the treelet-forest kernel
  binned : the sort-free block-loop leaf kernel

Each comparison is closest-hit (t, prim id, hit mask) and any-hit vs the
XLA gather walk.  Sized small (512-2048 rays) so every dispatch finishes
in seconds — the axon runtime must never see a killed mid-flight client.

Run: python scripts/tpu_exact.py [mega|forest|binned ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
from dod_raytracer_tpu.ops.traverse import _backend, kd_any, kd_closest
from dod_raytracer_tpu.scene import SceneBuilder


def rays(n, seed, spread=6.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3), dtype=np.float32) * 2 - 1) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def compare(scene, cfg_ref, cfg_test, n, seed, label):
    o, d = rays(n, seed)
    t_max = jnp.full((n,), jnp.inf)
    t_g, p_g, h_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg_ref)
    t_t, p_t, h_t = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg_test)
    h_g, h_t = np.asarray(h_g), np.asarray(h_t)
    ok_h = (h_g == h_t).all()
    h = h_g & h_t
    ok_p = (np.asarray(p_g)[h] == np.asarray(p_t)[h]).all()
    dt = np.abs(np.asarray(t_g)[h] - np.asarray(t_t)[h])
    rel = dt / np.maximum(np.abs(np.asarray(t_g)[h]), 1e-9)
    a_g = np.asarray(kd_any(scene.kd, scene.triangles, o, d,
                            jnp.full((n,), 5.0), cfg_ref))
    a_t = np.asarray(kd_any(scene.kd, scene.triangles, o, d,
                            jnp.full((n,), 5.0), cfg_test))
    ok_a = (a_g == a_t).all()
    print(f"RESULT {label}: hits {int(h_g.sum())}/{n} mask_match={ok_h} "
          f"prim_match={ok_p} max_rel_dt={rel.max() if h.any() else 0:.2e} "
          f"anyhit_match={ok_a}", flush=True)
    return ok_h and ok_p and ok_a and (not h.any() or rel.max() < 1e-3)


def scene_for(cfg, mesh="teapot", tris=0):
    tv, tn = (load_mesh_asset("teapot") if mesh == "teapot"
              else procedural_dragon(num_tris=tris))
    b = SceneBuilder()
    b.add_mesh(tv, tn)
    b.add_light((0, 3, -3), 3.0)
    return b.build(cfg)


def main():
    want = sys.argv[1:] or ["mega", "binned", "forest"]
    ok = True
    if "mega" in want:
        cfg = Config(use_kdtree=True, traversal_backend="mega")
        ref = Config(use_kdtree=True, traversal_backend="xla")
        s = scene_for(cfg)
        assert _backend(s.kd, cfg) == "mega"
        ok &= compare(s, ref, cfg, 2048, 3, "mega/teapot")
    if "binned" in want:
        cfg = Config(use_kdtree=True, traversal_backend="binned")
        ref = Config(use_kdtree=True, traversal_backend="xla")
        s = scene_for(cfg)
        ok &= compare(s, ref, cfg, 2048, 4, "binned/teapot")
    if "forest" in want:
        cfg = Config(use_kdtree=True, traversal_backend="forest",
                     treelet_cap=128)
        ref = Config(use_kdtree=True, traversal_backend="xla",
                     treelet_cap=128)
        s = scene_for(cfg)
        assert _backend(s.kd, cfg) == "forest"
        ok &= compare(s, ref, cfg, 512, 5, "forest/teapot-cap128")
        cfg2 = Config(use_kdtree=True, traversal_backend="forest",
                      MaxPrims=32, leaf_chunk_lanes=32)
        ref2 = Config(use_kdtree=True, traversal_backend="xla",
                      MaxPrims=32, leaf_chunk_lanes=32)
        s2 = scene_for(cfg2, mesh="pd", tris=40000)
        assert _backend(s2.kd, cfg2) == "forest"
        ok &= compare(s2, ref2, cfg2, 512, 6, "forest/40k-default-cap")
    print("ALL OK" if ok else "MISMATCHES FOUND", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
