"""Fetch-synchronized ground-truth timing (the ONLY honest timing on axon).

Round-3 discovery: on the axon relay, ``block_until_ready`` returns
immediately even for arbitrarily heavy programs (a chain of 1000 4096^3
matmuls "completes" in <0.5 ms -> implied 899 PFLOP/s).  Executions
queue lazily; the only operation that truly synchronizes with device
compute is a device->host TRANSFER.  Every dispatch-side wall-clock
number ever measured through block_until_ready on this runtime is a
dispatch-rate, not a compute time — including BENCH_r01/r02/r03-era
rays/s figures.  (The famous "transfer stalls" were real compute
backlogs draining.)

Protocol here:
  T(k) = wall time of [dispatch k frames -> fetch a checksum that
         depends on ALL of them], measured for k=1 and k=1+K.
  real_frame_time ~= (T(1+K) - T(1)) / K   (fetch-init overhead cancels)

Usage: python scripts/tpu_truth.py [teapot|dragon|matmul] ...
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


def fetch(x, what, timeout_s=3000.0):
    from dod_raytracer_tpu.utils.fetch import guarded_device_get

    t0 = time.perf_counter()
    h = guarded_device_get(x, timeout_s=timeout_s, what=what)
    return h, time.perf_counter() - t0


@jax.jit
def _checksum(parts):
    # one (65536,) array summarizing every tile of every frame
    s = sum(jnp.sum(p) for p in parts)
    m = sum(jnp.max(jnp.abs(p)) for p in parts)
    return jnp.broadcast_to(jnp.stack([s, m]), (32768, 2)).reshape(65536)


def scene_cfg(mesh, rt):
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    if mesh == "teapot":
        cfg = Config(Width=512, Height=512, use_kdtree=True, ray_tile=rt,
                     MaxPrims=32, leaf_chunk_lanes=32)
    else:
        cfg = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=rt,
                     MaxPrims=32, leaf_chunk_lanes=32)
    fz = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh=mesh).build(cfg)
    return scene, fz


def timed_frames(mesh="teapot", rt=262144, k_extra=4):
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles)

    scene, fz = scene_cfg(mesh, rt)
    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(fz)
    starts = _tile_starts(num_tiles, tile)

    def frames(k):
        outs = []
        for _ in range(k):
            outs += render_frame_tiles(scene, o, d, d_raw, starts, fz, tile)
        return outs

    # warmup: compile + one fully-synced frame
    _, t_warm = fetch(_checksum(frames(1)), "warmup checksum")
    print(f"{mesh} rt={rt}: warmup(compile+frame+fetch) {t_warm:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    h1, tf1 = fetch(_checksum(frames(1)), "k=1 checksum")
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    hk, tfk = fetch(_checksum(frames(1 + k_extra)), f"k={1+k_extra} checksum")
    tk = time.perf_counter() - t0
    per = (tk - t1) / k_extra
    rays = n / per if per > 0 else float("inf")
    print(f"{mesh} rt={rt}: T(1)={t1:.3f}s  T({1+k_extra})={tk:.3f}s  "
          f"-> frame={per:.3f}s  {rays/1e6:.1f} M rays/s  "
          f"checksum={h1[0]:.5e}/{hk[0]:.5e}", flush=True)
    return per


def matmul_calibration():
    """Known-FLOPs workload: verifies the protocol reports a plausible
    TFLOP/s for the chip (v5e ~ 100-200 TFLOP/s f32->bf16 mix)."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        return jax.lax.fori_loop(0, k, lambda i, a: a @ x, x)

    x = (jnp.eye(4096, dtype=jnp.bfloat16) * 0.999)
    _, tw = fetch(chain(x, 8)[:1, :1].reshape(1), "mm warmup")
    for k in (64, 512):
        t0 = time.perf_counter()
        _, tf = fetch(chain(x, k)[:1, :1].reshape(1), f"mm k={k}")
        dt = time.perf_counter() - t0
        print(f"matmul k={k}: {dt:.3f}s -> "
              f"{2*4096**3*k/dt/1e12:.1f} TFLOP/s", flush=True)


def main():
    want = sys.argv[1:] or ["matmul", "teapot"]
    if "matmul" in want:
        matmul_calibration()
    if "teapot" in want:
        timed_frames("teapot", rt=262144, k_extra=4)
        timed_frames("teapot", rt=16384, k_extra=4)
    if "dragon" in want:
        timed_frames("dragon", rt=262144, k_extra=2)
    if "dragon16" in want:
        timed_frames("dragon", rt=16384, k_extra=2)
    os._exit(0)


if __name__ == "__main__":
    main()
