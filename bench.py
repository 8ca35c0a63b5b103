#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Flagship workload (BASELINE.md): the reference scene recipe with the
dragon-scale mesh (~870k tris, procedural stand-in for the stripped
``assets/dragon.obj``) at 1080p — 16 spheres + 6 walls + cylinder + 9 point
lights, 10-bounce Whitted with shadowed Phong, kd-tree traversal — on one
TPU chip.

Metric: primary rays/sec over the FULL 1080p frame (every tile of the
frame is rendered per repeat — no tile sampling, no spatial bias; a full
frame is ~80ms so whole-frame timing is affordable).  Each primary ray
spawns up to 10 bounces x (1 closest-hit + 9 shadow any-hits), so total
ray casts/sec is up to ~100x this number.

``vs_baseline`` compares against the round-2 full-frame measurement pinned
in ``BASELINE_RAYS_PER_SEC`` (the reference itself publishes no numbers —
SURVEY.md §6); >1.0 means faster than the pinned TPU build.

Usage:
  python bench.py            # flagship: dragon @1080p fwd, full frame
  python bench.py --small    # teapot @512x512 (smoke)
  python bench.py --grad     # dragon fwd+bwd (vertex-position gradients)
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

# Round-2 pinned measurement (primary rays/sec, 1 TPU v5e chip, dragon@1080p
# fwd, FULL-frame timing, 2026-08-19). Update only when re-baselining is
# explicitly intended.  The round-1 pin (27.98M) timed a 4-tile top-of-frame
# sample — biased toward wall-only tiles; this pin times every tile.
BASELINE_RAYS_PER_SEC = 26_000_000.0
BASELINE_RAYS_PER_SEC_GRAD = 3_600_000.0


def build_flagship(small: bool):
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    # ray_tile=16384: traversal throughput is flat in batch size on v5e
    # (0.19 Mrays/s @16k vs 0.18 @65k) and the smaller program compiles
    # far faster through the remote-compile tunnel.
    # MaxPrims/leaf_chunk_lanes=32 (256-tri leaf blocks): TPU-tuned tree
    # shape — fat leaves are near-free on the MXU while every interior
    # step pays a fixed-rate HBM row gather; measured +61% over the
    # reference's CPU-tuned MaxPrims=8 on dragon@v5e (scripts/tpu_sweep.py)
    if small:
        cfg = Config(Width=512, Height=512, use_kdtree=True, ray_tile=16384,
                     MaxPrims=32, leaf_chunk_lanes=32)
        mesh = "teapot"
    else:
        cfg = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=16384,
                     MaxPrims=32, leaf_chunk_lanes=32)
        mesh = "dragon"
    frozen = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh=mesh).build(cfg)
    return scene, frozen


def _frame_tiles(cfg):
    """All ray tiles of the frame, padded like render_image."""
    from dod_raytracer_tpu.camera import primary_rays

    o, d, d_raw = primary_rays(cfg.Width, cfg.Height)
    n = o.shape[0]
    tile = min(cfg.ray_tile, n)
    pad = (-n) % tile
    if pad:
        fill = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, fill], 0)
        d_raw = jnp.concatenate([d_raw, fill], 0)
    return o, d, d_raw, n, tile, (n + pad) // tile


def bench_forward(scene, cfg, repeats=5):
    """Primary rays/sec through the full integrator, whole 1080p frame.

    Every repeat renders EVERY tile of the frame through the single jitted
    per-tile program render_image dispatches, so the number is the honest
    full-frame throughput (dragon-covering center tiles and wall-only edge
    tiles both included at their true frequency).
    """
    from dod_raytracer_tpu.render import _render_tile_jit

    o, d, d_raw, n, tile, num_tiles = _frame_tiles(cfg)
    # warmup tile 0: compile + first run
    img = _render_tile_jit(scene, o[:tile], d[:tile], d_raw[:tile], cfg)
    img.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = []
        for i in range(num_tiles):
            sl = slice(i * tile, (i + 1) * tile)
            outs.append(_render_tile_jit(scene, o[sl], d[sl], d_raw[sl], cfg))
            # cap in-flight executions: the axon runtime stalls with a long
            # unblocked dispatch queue (127 in flight hangs; <=8 is safe)
            if len(outs) >= 8:
                jax.block_until_ready(outs)
                del outs[:-1]
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    spread = (max(times) - min(times)) / t
    assert not bool(jnp.isnan(outs[0]).any()), "NaNs in benchmark render"
    return n / t, t, spread


def bench_grad(scene, cfg, repeats=3):
    """Forward+backward throughput over the full frame: per-tile grad
    accumulation dispatched from the host (one compile; same structure as
    train.fit's render-loss step)."""
    from dod_raytracer_tpu.render import render_rays

    o, d, d_raw, n, tile, num_tiles = _frame_tiles(cfg)

    @jax.jit
    def tile_grad(verts, ot, dt, rt):
        def f(v):
            s = scene.replace(triangles=scene.triangles.replace(verts=v))
            return jnp.sum(render_rays(s, ot, dt, rt, cfg) ** 2)

        return jax.value_and_grad(f)(verts)

    def full():
        total = 0.0
        g_acc = None
        for i in range(num_tiles):
            sl = slice(i * tile, (i + 1) * tile)
            val, g = tile_grad(scene.triangles.verts, o[sl], d[sl], d_raw[sl])
            total += val
            g_acc = g if g_acc is None else g_acc + g
        return total, g_acc

    val, g = full()  # compile + warmup
    g.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        val, g = full()
        g.block_until_ready()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    spread = (max(times) - min(times)) / t
    assert bool(jnp.isfinite(val)), val
    return n / t, t, spread


def main():
    small = "--small" in sys.argv
    grad = "--grad" in sys.argv
    scene, cfg = build_flagship(small)
    if grad:
        rays_s, sec, spread = bench_grad(scene, cfg)
        metric = "primary_rays_per_sec_fwd_bwd"
        base = BASELINE_RAYS_PER_SEC_GRAD
    else:
        rays_s, sec, spread = bench_forward(scene, cfg)
        metric = "primary_rays_per_sec_fwd"
        base = BASELINE_RAYS_PER_SEC
    if small:
        metric += "_teapot512"
    vs = rays_s / base if base else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(rays_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        "frame_seconds": round(sec, 4),
        "rep_spread": round(spread, 3),
    }))


if __name__ == "__main__":
    main()
