"""Verify large-ray_tile frames are bit-identical to the 16k-tile frames,
and that the fused grad tile fits HBM at large tiles.

The round-3 tilesize sweep (scripts/tpu_r3.py) showed full-frame forward
time drops ~30x going 16384 -> 524288 rays/tile: the lockstep traversal
is per-iteration-overhead-bound at small batches (same while-loop trip
count, 32x more VPU work per trip).  This probe guards the config change:
 1. max |frame(rt) - frame(16384)| == 0 on device for rt in {64k, 256k, 512k};
 2. one fused grad-tile dispatch at large rt completes (no OOM) and its
    grad matches the 16k-tile accumulation.

Run: python scripts/tpu_tilecheck.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools

import jax.numpy as jnp
import numpy as np


def flagship(rt):
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    cfg = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=rt,
                 MaxPrims=32, leaf_chunk_lanes=32)
    frozen = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh="dragon").build(cfg)
    return scene, frozen


def frame(scene, frozen):
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles)

    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)
    starts = _tile_starts(num_tiles, tile)
    jax.block_until_ready([o, d, d_raw] + starts)
    outs = render_frame_tiles(scene, o, d, d_raw, starts, frozen, tile)
    cat = outs[0] if num_tiles == 1 else jnp.concatenate(outs, 0)
    return cat[:n]


@jax.jit
def _maxdiff(a, b):
    # jitted end-to-end: eager op dispatches through the relay can poison
    # the queue and stall subsequent device->host fetches
    return jnp.broadcast_to(jnp.abs(a - b).max(), (65536,))


@jax.jit
def _reldiff(a, b):
    return jnp.broadcast_to(
        jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30), (65536,))


def fetch_scalar(x, what):
    # post-render fetches on the relay runtime can take many minutes to
    # initialize (quantize_u8 uses the same 1800s patience)
    from dod_raytracer_tpu.utils.fetch import guarded_device_get

    x.block_until_ready()
    t0 = time.perf_counter()
    v = float(guarded_device_get(x, timeout_s=1500.0, what=what)[0])
    print(f"  [fetch {what}: {time.perf_counter()-t0:.1f}s]", flush=True)
    return v


def main():
    # warm the transfer path while the process is young (clean-process
    # fetches complete in ~14s; post-compile first fetches can stall)
    np.asarray(jax.jit(lambda: jnp.arange(65536, dtype=jnp.float32))())
    print("transfer path warm", flush=True)

    scene, fz16 = flagship(16384)
    ref = frame(scene, fz16)

    for rt in (262144,):
        _, fz = flagship(rt)
        t0 = time.perf_counter()
        img = frame(scene, fz)
        dt = time.perf_counter() - t0
        diff = fetch_scalar(_maxdiff(img, ref), f"diff rt={rt}")
        print(f"rt={rt:6d}: frame {dt*1e3:7.2f} ms (incl compile on first) "
              f"max|diff vs 16k| = {diff:.3e}", flush=True)

    # grad check: one large fused grad tile vs the 16k accumulation
    from dod_raytracer_tpu.render import render_rays, _padded_frame_rays

    def grad_tiles(scene, frozen):
        o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)

        @functools.partial(jax.jit, static_argnames=("tile",))
        def tile_grad(sc, o, d, d_raw, start, tile):
            ot = jax.lax.dynamic_slice_in_dim(o, start, tile, 0)
            dt_ = jax.lax.dynamic_slice_in_dim(d, start, tile, 0)
            rtw = jax.lax.dynamic_slice_in_dim(d_raw, start, tile, 0)

            def f(v):
                s = sc.replace(triangles=sc.triangles.replace(verts=v))
                return jnp.sum(render_rays(s, ot, dt_, rtw, frozen) ** 2)

            return jax.grad(f)(sc.triangles.verts)

        g = jnp.zeros_like(scene.triangles.verts)
        t0 = time.perf_counter()
        for i in range(num_tiles):
            g = g + tile_grad(scene, o, d, d_raw,
                              jnp.asarray(i * tile, jnp.int32), tile=tile)
            if (i + 1) % 8 == 0:
                g.block_until_ready()
        g.block_until_ready()
        return g, time.perf_counter() - t0

    g16, t16 = grad_tiles(scene, fz16)
    print(f"grad rt=16384: {t16*1e3:.1f} ms (incl compile)", flush=True)
    for rt in (131072,):
        try:
            _, fz = flagship(rt)
            g, t = grad_tiles(scene, fz)
            rel = fetch_scalar(_reldiff(g, g16), f"grad diff rt={rt}")
            print(f"grad rt={rt}: {t*1e3:.1f} ms (incl compile) "
                  f"rel max|dg| = {rel:.3e}", flush=True)
        except Exception as e:
            print(f"grad rt={rt}: FAILED {type(e).__name__}: {e}", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
