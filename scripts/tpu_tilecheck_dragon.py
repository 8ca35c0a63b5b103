"""Dragon-scale tile-size exactness check, structured exactly like
bench.py (which is known to run clean on the relay): build scene, render
the full 1080p frame at ray_tile=16384 and =262144, compare ON DEVICE,
fetch one broadcast diff at the very end behind a watchdog, always
os._exit.

No early warm fetch, no mid-run fetches — scripts/tpu_tilecheck.py
variants that fetched early or interleaved fetches with large H2D
uploads wedged the relay (BASELINE.md hazard 3).

Run: python scripts/tpu_tilecheck_dragon.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def frame(rt):
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import (_FrozenConfig, _padded_frame_rays,
                                          _tile_starts, render_frame_tiles)
    from dod_raytracer_tpu.scene import default_scene

    cfg = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=rt,
                 MaxPrims=32, leaf_chunk_lanes=32)
    fz = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh="dragon").build(cfg)
    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(fz)
    starts = _tile_starts(num_tiles, tile)
    jax.block_until_ready([o, d, d_raw] + starts)
    t0 = time.perf_counter()
    outs = render_frame_tiles(scene, o, d, d_raw, starts, fz, tile)
    dt = time.perf_counter() - t0
    print(f"rt={rt}: {num_tiles} tiles, frame {dt*1e3:.1f} ms (incl compile)",
          flush=True)
    cat = outs[0] if num_tiles == 1 else jnp.concatenate(outs, 0)
    return cat[:n]


@jax.jit
def _delay_encode(bit):
    """Data-dependent delay: ~1 iteration if bit is False, 2M vector
    iterations (~seconds) if True.  D2H transfers stall in dragon-scale
    processes, but dispatch + block_until_ready stays reliable — so the
    one bit comes back through wall time instead of the transfer path."""
    iters = jnp.where(bit, 2_000_000, 1)

    def body(c):
        i, acc = c
        return i + 1, acc * 1.0000001 + 0.5

    _, acc = jax.lax.while_loop(
        lambda c: c[0] < iters, body,
        (jnp.int32(0), jnp.ones((8, 128), jnp.float32)))
    return acc


def read_bit(bit, label):
    """Time the delay dispatch twice (warm) and threshold."""
    _delay_encode(jnp.bool_(False)).block_until_ready()  # compile + calib
    t0 = time.perf_counter()
    _delay_encode(jnp.bool_(False)).block_until_ready()
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    _delay_encode(bit).block_until_ready()
    t_bit = time.perf_counter() - t0
    val = t_bit > max(4 * t_ref, 0.5)
    print(f"  bit[{label}] = {val}  (ref {t_ref*1e3:.0f} ms vs {t_bit*1e3:.0f} ms)",
          flush=True)
    return val


def main():
    a = frame(16384)
    b = frame(262144)
    diff = jax.jit(lambda a, b: jnp.abs(a - b).max())(a, b)
    diff.block_until_ready()
    print("diff computed on device; reading via timing channel...", flush=True)
    nonzero = read_bit(jax.jit(lambda d: d > 0.0)(diff), "diff > 0")
    if nonzero:
        big = read_bit(jax.jit(lambda d: d > 1e-4)(diff), "diff > 1e-4")
        print(f"RESULT rt262144 vs rt16384: NOT bit-exact; "
              f"{'diff > 1e-4' if big else 'diff <= 1e-4'}", flush=True)
    else:
        print("RESULT rt262144 vs rt16384: BIT-EXACT (diff == 0)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
