"""Fetch-synchronized phase + backend attribution (real device time).

tpu_r3.py's sections used dispatch-side timing, which on this runtime
measures dispatch rate, not compute (see tpu_truth.py).  Every number
here is a T(base+K)-T(base) difference of [dispatch -> checksum-fetch]
walls, so fetch overhead cancels and the result is real device time.

Sections (run: python scripts/tpu_truth2.py [section ...]):
  phases   : closest-hit / shadow pass / 1-bounce / 10-bounce on a
             16k-ray dragon center tile
  backends : xla vs binned vs brute closest-hit, dragon center tile
  teapot   : xla vs mega vs brute closest-hit, teapot, 16k rays
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

    return guarded_device_get(x, timeout_s=timeout_s, what=what)


@jax.jit
def _checksum(parts):
    s = sum(jnp.sum(jnp.where(jnp.isfinite(p), p, 0.0).astype(jnp.float32))
            for p in parts)
    return jnp.broadcast_to(s, (65536,))


def truth_time(fn, args_list, label, k=4):
    """Real seconds per call of fn via T(1+k)-T(1) differencing.

    args_list entries cycle; outputs of every call feed the fetched
    checksum so nothing is dead-code-eliminated."""
    def run(count):
        outs = []
        for i in range(count):
            r = fn(*args_list[i % len(args_list)])
            outs.extend(jax.tree_util.tree_leaves(r))
        t0 = time.perf_counter()
        fetch(_checksum(outs), f"{label} checksum")
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = run(1)
    tk = run(1 + k)
    per = (tk - t1) / k
    print(f"{label}: {per*1e3:9.2f} ms/call  (T1 {t1:.2f}s, T{1+k} {tk:.2f}s)",
          flush=True)
    return per


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


def center_tiles(frozen, k=4):
    from dod_raytracer_tpu.render import _padded_frame_rays

    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)
    mid = num_tiles // 2
    lo = max(0, mid - k // 2)
    outs = []
    for i in range(lo, lo + k):
        sl = slice(i * tile, (i + 1) * tile)
        outs.append((jnp.asarray(o[sl]), jnp.asarray(d[sl]),
                     jnp.asarray(d_raw[sl])))
    return outs, tile


def section_phases():
    from dod_raytracer_tpu.intersect import closest_hit, occluded
    from dod_raytracer_tpu.render import render_rays
    from dod_raytracer_tpu.shading import lighting_factor

    scene, fz = flagship_scene()
    tiles, tile = center_tiles(fz)
    inf = jnp.full((tile,), jnp.inf)

    @jax.jit
    def ch(scene, o, d):
        return closest_hit(scene, o, d, fz, t_max=inf).t

    @jax.jit
    def occ(scene, o, d):
        # one shadow-like any-hit walk, clipped at 8 units
        return occluded(scene, o, d, jnp.full((tile,), 8.0), fz)

    @jax.jit
    def bounce(scene, o, d, d_raw):
        hit = closest_hit(scene, o, d, fz, t_max=inf)
        return lighting_factor(scene, hit.point, hit.normal, d_raw, fz,
                               hit.mask)

    @jax.jit
    def full(scene, o, d, d_raw):
        return render_rays(scene, o, d, d_raw, fz)

    truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
               "dragon closest_hit 16k", k=4)
    truth_time(occ, [(scene, o, d) for (o, d, _) in tiles],
               "dragon occluded   16k", k=4)
    truth_time(bounce, [(scene, o, d, r) for (o, d, r) in tiles],
               "dragon ch+shadowx9 16k", k=2)
    truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
               "dragon 10-bounce  16k", k=1)


def section_backends():
    from dod_raytracer_tpu.intersect import closest_hit

    for be, over in (("forest", {"traversal_backend": "forest"}),
                     ("binned", {"traversal_backend": "binned"}),
                     ("brute", {"use_kdtree": False})):
        try:
            scene, fz = flagship_scene(**over)
            tiles, tile = center_tiles(fz)
            inf = jnp.full((tile,), jnp.inf)

            @jax.jit
            def ch(scene, o, d):
                return closest_hit(scene, o, d, fz, t_max=inf).t

            k = 1 if be == "brute" else 4
            truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                       f"dragon closest_hit [{be}]", k=k)
        except Exception as e:
            print(f"dragon closest_hit [{be}]: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_teapot():
    from dod_raytracer_tpu.intersect import closest_hit

    for be, over in (("xla", {"traversal_backend": "xla"}),
                     ("mega", {"traversal_backend": "mega"}),
                     ("brute", {"use_kdtree": False})):
        try:
            scene, fz = flagship_scene(
                mesh="teapot", Width=512, Height=512, **over)
            tiles, tile = center_tiles(fz)
            inf = jnp.full((tile,), jnp.inf)

            @jax.jit
            def ch(scene, o, d):
                return closest_hit(scene, o, d, fz, t_max=inf).t

            truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                       f"teapot closest_hit [{be}]", k=4)
        except Exception as e:
            print(f"teapot closest_hit [{be}]: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_sweep():
    """binned backend: tile size x tree shape (fat leaves = shallow tree
    = fewer descend rounds; the MXU leaf stage barely cares)."""
    from dod_raytracer_tpu.intersect import closest_hit

    for rt, mp in ((16384, 32), (16384, 64), (16384, 128),
                   (262144, 32), (262144, 64), (262144, 128)):
        try:
            scene, fz = flagship_scene(
                traversal_backend="binned", ray_tile=rt,
                MaxPrims=mp, leaf_chunk_lanes=mp)
            tiles, tile = center_tiles(fz, k=2)
            inf = jnp.full((tile,), jnp.inf)

            @jax.jit
            def ch(scene, o, d):
                return closest_hit(scene, o, d, fz, t_max=inf).t

            per = truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                             f"dragon ch [binned rt={rt} mp={mp}]", k=2)
            print(f"   -> {tile/per/1e6:.2f} M rays/s", flush=True)
        except Exception as e:
            print(f"dragon ch [binned rt={rt} mp={mp}]: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


def section_flagship():
    """New flagship config (auto->binned, mp=128, batched shadows):
    1. exactness: binned vs XLA walk on a dragon center tile (fetches
       run FIRST, while the process is light — the transfer path
       degrades after heavy dispatch sessions);
    2. honest bounce + frame cost via checksum-fetch differencing."""
    from dod_raytracer_tpu.intersect import closest_hit, occluded
    from dod_raytracer_tpu.ops.traverse import kd_any, kd_closest
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles, render_rays)
    from dod_raytracer_tpu.shading import lighting_factor

    over = dict(MaxPrims=128, leaf_chunk_lanes=128)
    scene, fz = flagship_scene(traversal_backend="binned", **over)
    _, fzx = flagship_scene(traversal_backend="xla", **over)
    tiles, tile = center_tiles(fz, k=2)
    inf = jnp.full((tile,), jnp.inf)

    # --- 1. exactness (binned vs xla, same mp=128 tree) ---
    o, d, _ = tiles[0]
    tb, pb, hb = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fz))(scene, o, d)
    tx, px, hx = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fzx))(scene, o, d)
    ab = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fz))(scene, o, d)
    ax = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fzx))(scene, o, d)
    hb_, hx_ = np.asarray(hb), np.asarray(hx)
    both = hb_ & hx_
    flips = int((np.asarray(pb)[both] != np.asarray(px)[both]).sum())
    print(f"exact: hits {hb_.sum()}/{tile} mask_match={(hb_ == hx_).all()} "
          f"prim_flips={flips}/{int(both.sum())} "
          f"max|dt|={np.abs(np.asarray(tb)[both] - np.asarray(tx)[both]).max():.2e} "
          f"anyhit_match={(np.asarray(ab) == np.asarray(ax)).all()}", flush=True)

    # --- 2. honest per-phase + frame ---
    @jax.jit
    def bounce(scene, o, d, d_raw):
        hit = closest_hit(scene, o, d, fz, t_max=inf)
        return lighting_factor(scene, hit.point, hit.normal, d_raw, fz,
                               hit.mask)

    truth_time(bounce, [(scene, o, d, r) for (o, d, r) in tiles],
               "flagship ch+batched-shadow 16k", k=2)

    @jax.jit
    def full(scene, o, d, d_raw):
        return render_rays(scene, o, d, d_raw, fz)

    truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
               "flagship 10-bounce tile", k=1)

    o, d, d_raw, n, rtile, num_tiles = _padded_frame_rays(fz)
    starts = _tile_starts(num_tiles, rtile)

    def frame():
        return render_frame_tiles(scene, o, d, d_raw, starts, fz, rtile)

    t0 = time.perf_counter()
    fetch(_checksum(frame()), "frame checksum 1")
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(_checksum(frame() + frame()), "frame checksum 2")
    t2 = time.perf_counter() - t0
    per = t2 - t1
    print(f"flagship FULL FRAME: {per:.2f}s -> {n/per/1e6:.2f} M rays/s "
          f"(T1 {t1:.1f}s incl compile, T2 {t2:.1f}s)", flush=True)


def section_scandebug():
    """Why does the 10-bounce scan cost 4.8x the standalone bounce in the
    new config (vs 1.35x in the old)?  Isolate: backend x shadow-batch x
    recursion depth."""
    from dod_raytracer_tpu.render import render_rays

    def run(label, depth, **over):
        try:
            scene, fz = flagship_scene(recursion_depth=depth, **over)
            tiles, tile = center_tiles(fz, k=2)

            @jax.jit
            def full(scene, o, d, d_raw):
                return render_rays(scene, o, d, d_raw, fz)

            truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"{label} depth={depth}", k=1)
        except Exception as e:
            print(f"{label} depth={depth}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    new = dict(traversal_backend="binned", MaxPrims=128, leaf_chunk_lanes=128)
    run("binned128+batch", 1, **new)
    run("binned128+batch", 3, **new)
    run("binned128+batch", 10, **new)
    run("binned128+seq  ", 10, shadow_batch_lights=False, **new)
    run("xla32+batch    ", 10, traversal_backend="xla",
        MaxPrims=32, leaf_chunk_lanes=32)


def main():
    sections = sys.argv[1:] or ["teapot", "phases", "backends"]
    for s in sections:
        print(f"--- {s} ---", flush=True)
        globals()[f"section_{s}"]()
    os._exit(0)


if __name__ == "__main__":
    main()
