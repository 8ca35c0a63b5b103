"""Flagship-tile phase attribution on the real chip.

Times, on one dragon@1080p ray tile (16,384 rays):
  1. closest_hit alone (1 kd traversal)
  2. one bounce: closest_hit + shading incl. 9-light shadow pass
  3. the full 10-bounce integrator tile (the bench.py unit)

Run: python scripts/tpu_phase.py [tile_index]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, repeats=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    run_s = float(np.median(times))
    print(f"{name}: compile+1st {compile_s:.2f}s, run {run_s * 1e3:.3f}ms",
          flush=True)
    return run_s


def main():
    tile_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 60  # center-ish
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig, render_rays
    from dod_raytracer_tpu.scene import default_scene
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.shading import lighting_factor
    from dod_raytracer_tpu.camera import primary_rays

    cfg = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=16384,
                 MaxPrims=32, leaf_chunk_lanes=32)
    frozen = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh="dragon").build(cfg)
    o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
    tile = frozen.ray_tile
    sl = slice(tile_idx * tile, (tile_idx + 1) * tile)
    o, d, d_raw = o[sl], d[sl], d_raw[sl]
    n = o.shape[0]
    print(f"tile {tile_idx}, {n} rays", flush=True)

    @jax.jit
    def ch(scene, o, d):
        hit = closest_hit(scene, o, d, frozen, t_max=jnp.full((n,), jnp.inf))
        return hit.t, hit.point

    @jax.jit
    def one_bounce(scene, o, d, d_raw):
        hit = closest_hit(scene, o, d, frozen, t_max=jnp.full((n,), jnp.inf))
        f = lighting_factor(scene, hit.point, hit.normal, d_raw, frozen,
                            hit.mask)
        return hit.color * f[:, None]

    @jax.jit
    def full(scene, o, d, d_raw):
        return render_rays(scene, o, d, d_raw, frozen)

    t_ch = timeit("closest_hit x1", ch, scene, o, d)
    t_b1 = timeit("bounce1 (ch + 9-light shadow + shade)", one_bounce,
                  scene, o, d, d_raw)
    t_full = timeit("full 10-bounce tile", full, scene, o, d, d_raw)
    print(f"shadow+shade per bounce: {(t_b1 - t_ch) * 1e3:.3f}ms "
          f"({(t_b1 - t_ch) / max(t_ch, 1e-12):.1f}x closest-hit)", flush=True)
    print(f"full/bounce1 ratio: {t_full / max(t_b1, 1e-12):.2f} "
          f"(10 bounces would be 10.0 if un-amortized)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
