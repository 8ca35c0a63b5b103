"""Small-scale on-TPU tile-size exactness check (teapot @ 512x512).

512x512 = 262,144 rays: rendered as ONE 262144-ray tile vs 16 tiles of
16384 — the exact tile sizes the flagship retune swaps between — with a
scene that builds in seconds and fetches while the process is young (the
relay transfer path degrades after long compile/dispatch sessions).

Covers the same code paths as the dragon check (dynamic-slice tiling,
lockstep kd traversal at both batch sizes); dragon only scales the tree.

Run: python scripts/tpu_tilecheck_small.py
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


def main():
    np.asarray(jax.jit(lambda: jnp.arange(65536, dtype=jnp.float32))())
    print("transfer path warm", flush=True)

    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import (_FrozenConfig, _padded_frame_rays,
                                          _tile_starts, render_frame_tiles)
    from dod_raytracer_tpu.scene import default_scene
    from dod_raytracer_tpu.utils.fetch import guarded_device_get

    def frame(rt):
        cfg = Config(Width=512, Height=512, use_kdtree=True, ray_tile=rt,
                     MaxPrims=32, leaf_chunk_lanes=32)
        fz = _FrozenConfig.from_config(cfg)
        scene = default_scene(seed=0, cfg=cfg, mesh="teapot").build(cfg)
        o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(fz)
        starts = _tile_starts(num_tiles, tile)
        jax.block_until_ready([o, d, d_raw] + starts)
        t0 = time.perf_counter()
        outs = render_frame_tiles(scene, o, d, d_raw, starts, fz, tile)
        dt = time.perf_counter() - t0
        cat = outs[0] if num_tiles == 1 else jnp.concatenate(outs, 0)
        print(f"rt={rt}: {num_tiles} tiles, {dt*1e3:.1f} ms (incl compile)",
              flush=True)
        return cat[:n]

    a = frame(16384)
    b = frame(262144)
    diff = jax.jit(
        lambda a, b: jnp.broadcast_to(jnp.abs(a - b).max(), (65536,)))(a, b)
    diff.block_until_ready()
    t0 = time.perf_counter()
    v = float(guarded_device_get(diff, timeout_s=1200.0, what="tile diff")[0])
    print(f"fetch took {time.perf_counter()-t0:.1f}s", flush=True)
    print(f"RESULT max|rt262144 - rt16384| = {v:.3e}", flush=True)
    os._exit(0 if v == 0.0 or v < 1e-4 else 1)


if __name__ == "__main__":
    main()
