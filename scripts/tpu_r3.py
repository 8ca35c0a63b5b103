"""Round-3 TPU measurements with PIPELINED timing.

Every round-1/2 comparison (backend choice, MaxPrims, brute/kd
crossover) was timed synchronously: one dispatch, block, repeat.  On the
relay-tunneled runtime a dispatch round trip costs ~0.2-0.6 ms, which
drowns per-tile device times of ~40 us — the comparisons were ordering
noise (BASELINE.md round 3).  This harness times K dispatches pipelined
through the queue (sliding in-flight window, one block at the end), so
sub-millisecond programs measure their actual device time.

Run: python scripts/tpu_r3.py [section ...]
Sections: backend maxprims tilesize shadow
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

WINDOW = 8


def timeit_pipelined(name, fn, args_list, repeats=3, inner=20):
    """Median wall time of `inner` pipelined dispatches of fn.

    ``args_list``: list of argument tuples cycled through (pre-resident on
    device).  Returns seconds per dispatch.
    """
    # warmup / compile
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = []
        for i in range(inner):
            outs.append(fn(*args_list[i % len(args_list)]))
            if len(outs) > WINDOW:
                jax.block_until_ready(outs[-WINDOW - 1])
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / inner)
    t = float(np.median(times))
    print(f"{name}: {t * 1e6:8.1f} us/dispatch  "
          f"(spread {(max(times) - min(times)) / t:.2f})", flush=True)
    return t


def flagship_scene(mesh="dragon", **over):
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    kw = dict(Width=1920, Height=1080, use_kdtree=True, ray_tile=16384,
              MaxPrims=32, leaf_chunk_lanes=32)
    kw.update(over)
    cfg = Config(**kw)
    frozen = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh=mesh).build(cfg)
    return scene, frozen


def center_tiles(frozen, k=6):
    """k ray tiles straddling the frame center (dragon-covering)."""
    from dod_raytracer_tpu.render import _padded_frame_rays

    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)
    mid = num_tiles // 2
    lo = max(0, mid - k // 2)
    outs = []
    for i in range(lo, lo + k):
        sl = slice(i * tile, (i + 1) * tile)
        outs.append((jnp.asarray(o[sl]), jnp.asarray(d[sl]),
                     jnp.asarray(d_raw[sl])))
    jax.block_until_ready(outs)
    return outs, tile


def section_backend():
    """Closest-hit cost per backend on the dragon tree (in-scene rays:
    center tiles, t_max=inf — the kd query's own cost, no wall clipping)."""
    import functools

    from dod_raytracer_tpu.intersect import closest_hit

    for be in ("xla", "forest", "brute"):
        over = {"traversal_backend": be} if be != "brute" else {
            "traversal_backend": "xla", "use_kdtree": False}
        try:
            scene, frozen = flagship_scene(**over)
            tiles, tile = center_tiles(frozen)

            @functools.partial(jax.jit, static_argnames=())
            def ch(scene, o, d):
                hit = closest_hit(scene, o, d, frozen,
                                  t_max=jnp.full((tile,), jnp.inf))
                return hit.t

            timeit_pipelined(f"closest_hit dragon [{be}]", ch,
                             [(scene, o, d) for (o, d, _) in tiles])
        except Exception as e:
            print(f"closest_hit dragon [{be}]: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_maxprims():
    """Full-tile integrator cost vs tree shape (MaxPrims = lanes/leaf)."""
    from dod_raytracer_tpu.render import _render_tile_jit

    for mp in (8, 16, 32, 64):
        scene, frozen = flagship_scene(MaxPrims=mp, leaf_chunk_lanes=mp)
        tiles, tile = center_tiles(frozen)
        timeit_pipelined(
            f"render tile mp={mp}", _render_tile_jit,
            [(scene, o, d, r, frozen) for (o, d, r) in tiles])


def section_tilesize():
    """Full-frame forward time vs ray_tile (bench_forward structure)."""
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles)

    for rt in (16384, 65536, 131072, 262144, 524288):
        scene, frozen = flagship_scene(ray_tile=rt)
        o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)
        starts = _tile_starts(num_tiles, tile)
        jax.block_until_ready([o, d, d_raw] + starts)
        try:
            render_frame_tiles(scene, o, d, d_raw, starts, frozen, tile)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                render_frame_tiles(scene, o, d, d_raw, starts, frozen, tile)
                times.append(time.perf_counter() - t0)
            t = float(np.median(times))
            print(f"frame ray_tile={rt:6d} ({num_tiles:3d} tiles): "
                  f"{t * 1e3:6.2f} ms -> {n / t / 1e6:7.1f} M rays/s",
                  flush=True)
        except Exception as e:
            print(f"frame ray_tile={rt}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_shadow():
    """Per-bounce cost split at dragon scale: closest-hit vs 9-light
    shadow pass (VERDICT r1 item 5: want shadow < 3x closest-hit)."""
    import functools

    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.shading import lighting_factor

    scene, frozen = flagship_scene()
    tiles, tile = center_tiles(frozen)

    @jax.jit
    def ch(scene, o, d):
        return closest_hit(scene, o, d, frozen,
                           t_max=jnp.full((tile,), jnp.inf)).t

    @jax.jit
    def bounce(scene, o, d, d_raw):
        hit = closest_hit(scene, o, d, frozen,
                          t_max=jnp.full((tile,), jnp.inf))
        return lighting_factor(scene, hit.point, hit.normal, d_raw, frozen,
                               hit.mask)

    t_ch = timeit_pipelined("closest_hit only", ch,
                            [(scene, o, d) for (o, d, _) in tiles])
    t_b = timeit_pipelined("closest_hit + shadow/shade", bounce,
                           [(scene, o, d, r) for (o, d, r) in tiles])
    print(f"shadow+shade: {(t_b - t_ch) * 1e6:.1f} us "
          f"= {(t_b - t_ch) / max(t_ch, 1e-12):.2f}x closest-hit", flush=True)


def main():
    sections = sys.argv[1:] or ["backend", "maxprims", "tilesize", "shadow"]
    print("devices:", jax.devices(), flush=True)
    for s in sections:
        print(f"--- {s} ---", flush=True)
        globals()[f"section_{s}"]()
    os._exit(0)


if __name__ == "__main__":
    main()
