"""Round-4 packet-kernel measurements (fetch-synchronized, real device).

Sections (run: python scripts/tpu_r4.py [section ...]):
  exact    : packet vs binned vs xla on a dragon center tile (fetch first,
             while the transfer path is fresh)
  packet   : closest / any-hit / bounce / 10-bounce honest times for the
             packet backend on dragon center tiles, vs binned
  sweep    : packet_tile x tree shape (MaxPrims) honest sweep
  sweep2/3 : tree-shape / packet-tile re-sweeps with the final kernel
  keysweep : bounce-sort key composition (dir-major vs origin-major)
  attrib1  : shadow-share attribution (1 light vs 9)
  revshadow: reversed shadow cones on/off + bit-flip rate
  depths   : per-bounce marginal cost curve
  tiles    : per-tile closest-hit cost around frame center
  grad16   : honest fwd+bwd on a center tile
  prod     : 262k-ray production-shape probes (NB: 262k 10-bounce in one
             program crashes the TPU worker - runtime watchdog)
  teapot   : teapot closest-hit packet vs mega
  frame    : honest full-frame dragon@1080p (min-of-3 per-frame walls)
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


def fetch(x, what, timeout_s=1800.0):
    from dod_raytracer_tpu.utils.fetch import guarded_device_get

    return guarded_device_get(x, timeout_s=timeout_s, what=what)


@jax.jit
def _checksum(parts):
    s = sum(jnp.sum(jnp.where(jnp.isfinite(p), p, 0.0).astype(jnp.float32))
            for p in parts)
    return jnp.broadcast_to(s, (65536,))


def truth_time(fn, args_list, label, k=4):
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


def section_exact():
    from dod_raytracer_tpu.ops.traverse import kd_any, kd_closest

    scene, fzp = flagship_scene(traversal_backend="packet")
    _, fzb = flagship_scene(traversal_backend="binned")
    tiles, tile = center_tiles(fzp, k=1)
    o, d, _ = tiles[0]
    inf = jnp.full((tile,), jnp.inf)

    tp, pp, hp = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fzp))(scene, o, d)
    tb, pb, hb = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fzb))(scene, o, d)
    ap = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fzp))(scene, o, d)
    ab = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fzb))(scene, o, d)
    hp_, hb_ = np.asarray(hp), np.asarray(hb)
    both = hp_ & hb_
    flips = int((np.asarray(pp)[both] != np.asarray(pb)[both]).sum())
    dt = np.abs(np.asarray(tp)[both] - np.asarray(tb)[both])
    print(f"exact: hits {hp_.sum()}/{tile} mask_match={(hp_ == hb_).all()} "
          f"prim_flips={flips}/{int(both.sum())} max|dt|={dt.max():.2e} "
          f"anyhit_match={(np.asarray(ap) == np.asarray(ab)).all()}", flush=True)


def section_packet():
    from dod_raytracer_tpu.intersect import closest_hit, occluded
    from dod_raytracer_tpu.render import render_rays
    from dod_raytracer_tpu.shading import lighting_factor

    for be, over in (("packet", {"traversal_backend": "packet",
                                 "MaxPrims": 64, "leaf_chunk_lanes": 64}),
                     ("binned", {"traversal_backend": "binned"})):
        scene, fz = flagship_scene(**over)
        tiles, tile = center_tiles(fz)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        @jax.jit
        def occ(scene, o, d):
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
                   f"dragon ch        [{be}] 16k", k=4)
        truth_time(occ, [(scene, o, d) for (o, d, _) in tiles],
                   f"dragon occluded  [{be}] 16k", k=4)
        truth_time(bounce, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon bounce    [{be}] 16k", k=2)
        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [{be}] 16k", k=1)


def section_sweep():
    from dod_raytracer_tpu.intersect import closest_hit

    for pt, mp in ((512, 32), (1024, 32), (2048, 32),
                   (1024, 16), (1024, 64), (1024, 128)):
        try:
            scene, fz = flagship_scene(
                traversal_backend="packet", packet_tile=pt,
                MaxPrims=mp, leaf_chunk_lanes=mp)
            tiles, tile = center_tiles(fz, k=2)
            inf = jnp.full((tile,), jnp.inf)

            @jax.jit
            def ch(scene, o, d):
                return closest_hit(scene, o, d, fz, t_max=inf).t

            per = truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                             f"dragon ch [packet pt={pt} mp={mp}]", k=2)
            print(f"   -> {tile/per/1e6:.2f} M casts/s", flush=True)
        except Exception as e:
            print(f"dragon ch [packet pt={pt} mp={mp}]: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


def section_prod():
    """Production shapes: 262144-ray tiles (the flagship ray_tile), packet
    vs binned, closest / batched-shadow / 1-bounce / 10-bounce.  The 16k
    probes understate the packet advantage: the binned XLA descend is
    lockstep (per-iteration cost scales with the whole wavefront x max
    visit count), the packet kernel is work-proportional per 1024-ray
    packet."""
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import render_rays
    from dod_raytracer_tpu.shading import lighting_factor

    for be, mp in (("packet", 64), ("binned", 64), ("binned", 32)):
        try:
            scene, fz = flagship_scene(
                traversal_backend=be, ray_tile=262144,
                MaxPrims=mp, leaf_chunk_lanes=mp)
            tiles, tile = center_tiles(fz, k=2)
            inf = jnp.full((tile,), jnp.inf)

            @jax.jit
            def ch(scene, o, d):
                return closest_hit(scene, o, d, fz, t_max=inf).t

            @jax.jit
            def bounce(scene, o, d, d_raw):
                hit = closest_hit(scene, o, d, fz, t_max=inf)
                return lighting_factor(scene, hit.point, hit.normal, d_raw,
                                       fz, hit.mask)

            @jax.jit
            def full(scene, o, d, d_raw):
                return render_rays(scene, o, d, d_raw, fz)

            tag = f"[{be} mp={mp}] 262k"
            truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                       f"dragon ch        {tag}", k=2)
            truth_time(bounce, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"dragon bounce    {tag}", k=2)
            truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"dragon 10-bounce {tag}", k=1)
        except Exception as e:
            print(f"prod [{be} mp={mp}]: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_sorted():
    """sort_bounces on/off: 10-bounce tile cost, packet mp=64."""
    from dod_raytracer_tpu.render import render_rays

    for srt in (True, False):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            sort_bounces=srt)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [packet64 sort={srt}] 16k", k=1)


def section_depths():
    """Marginal per-bounce cost: sorted packet, depth 1/2/3/5/10 — where
    do the late (incoherent) bounces actually spend."""
    from dod_raytracer_tpu.render import render_rays

    for depth in (1, 2, 3, 5, 10):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            sort_bounces=True, recursion_depth=depth)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon bounce-depth={depth:2d} [packet64 sorted] 16k",
                   k=2 if depth < 5 else 1)


def section_tiles():
    """Per-tile closest-hit cost around the frame center (packet mp=64):
    which tiles are pathological and by how much."""
    from dod_raytracer_tpu.intersect import closest_hit

    scene, fz = flagship_scene(traversal_backend="packet",
                               MaxPrims=64, leaf_chunk_lanes=64)
    from dod_raytracer_tpu.render import _padded_frame_rays

    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(fz)
    inf = jnp.full((tile,), jnp.inf)

    @jax.jit
    def ch(scene, o, d):
        return closest_hit(scene, o, d, fz, t_max=inf).t

    mid = num_tiles // 2
    for i in range(mid - 4, mid + 4):
        sl = slice(i * tile, (i + 1) * tile)
        args = [(scene, jnp.asarray(o[sl]), jnp.asarray(d[sl]))]
        truth_time(ch, args, f"tile {i:3d} ch", k=2)


def section_attrib1():
    """Shadow-share attribution: the flagship scene with 1 light vs 9.
    If the 10-bounce collapses, the 9-light shadow pass dominates."""
    from dod_raytracer_tpu.render import render_rays
    from dod_raytracer_tpu.scene import reference_lights

    for nl in (1, 9):
        scene, fz = flagship_scene(traversal_backend="packet",
                                   MaxPrims=64, leaf_chunk_lanes=64)
        if nl == 1:
            lights = scene.lights
            scene = scene.replace(lights=lights.replace(
                position=lights.position[:1], intensity=lights.intensity[:1]))
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [{nl} light(s)] 16k", k=1)


def section_keysweep():
    """Bounce-sort key composition: dir-major vs origin-major 10-bounce."""
    from dod_raytracer_tpu.render import render_rays

    for dm in (True, False):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            sort_dir_major=dm)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [dir_major={dm}] 16k", k=1)


def section_sweep3():
    """packet_tile sweep with the final kernel (chunked fold + mailbox +
    reversed shadows): 10-bounce tile cost."""
    from dod_raytracer_tpu.render import render_rays

    for pt in (1024, 2048, 4096):
        try:
            scene, fz = flagship_scene(
                traversal_backend="packet", packet_tile=pt,
                MaxPrims=64, leaf_chunk_lanes=64)
            tiles, tile = center_tiles(fz, k=2)

            @jax.jit
            def full(scene, o, d, d_raw):
                return render_rays(scene, o, d, d_raw, fz)

            truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"dragon 10-bounce [pt={pt}] 16k", k=1)
        except Exception as e:
            print(f"sweep3 pt={pt}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_revshadow():
    """shadow_reverse on/off: 10-bounce cost + bit-flip rate on a center
    tile (quantifies the epsilon deviation the mode trades for speed)."""
    from dod_raytracer_tpu.render import render_rays

    outs = {}
    for rev in (True, False):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            shadow_reverse=rev)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [rev={rev}] 16k", k=1)
        o, d, r = tiles[0]
        outs[rev] = full(scene, o, d, r)
    a = fetch(outs[True], "rev img")
    b = fetch(outs[False], "fwd img")
    diff = np.abs(a - b).max(axis=-1)
    print(f"rev-vs-fwd: {(diff > 1e-3).mean():.5f} of rays differ >1e-3, "
          f"max {diff.max():.3e}", flush=True)


def section_sweep2():
    """Tree-shape re-sweep with the chunked+mailbox kernel: 10-bounce
    cost (the number that matters), mp in {32, 64, 96}."""
    from dod_raytracer_tpu.render import render_rays

    for mp in (32, 64, 96):
        try:
            scene, fz = flagship_scene(
                traversal_backend="packet",
                MaxPrims=mp, leaf_chunk_lanes=mp)
            tiles, tile = center_tiles(fz, k=2)

            @jax.jit
            def full(scene, o, d, d_raw):
                return render_rays(scene, o, d, d_raw, fz)

            truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"dragon 10-bounce [packet mp={mp}] 16k", k=1)
        except Exception as e:
            print(f"sweep2 mp={mp}: FAILED {type(e).__name__}: {e}",
                  flush=True)


def section_grad16():
    """Honest fwd+bwd (vertex grads) on a 16k dragon center tile."""
    import functools

    from dod_raytracer_tpu.render import render_rays

    scene, fz = flagship_scene(traversal_backend="packet",
                               MaxPrims=64, leaf_chunk_lanes=64)
    tiles, tile = center_tiles(fz, k=2)

    @jax.jit
    def tile_grad(sc, o, d, d_raw):
        def f(v):
            s = sc.replace(triangles=sc.triangles.replace(verts=v))
            return jnp.sum(render_rays(s, o, d, d_raw, fz) ** 2)

        return jax.value_and_grad(f)(sc.triangles.verts)

    truth_time(tile_grad, [(scene, o, d, r) for (o, d, r) in tiles],
               "dragon fwd+bwd 10-bounce [packet64] 16k", k=1)


def section_teapot():
    from dod_raytracer_tpu.intersect import closest_hit

    for be, over in (("packet", {"traversal_backend": "packet"}),
                     ("mega", {"traversal_backend": "mega"})):
        scene, fz = flagship_scene(mesh="teapot", Width=512, Height=512, **over)
        tiles, tile = center_tiles(fz)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                   f"teapot ch [{be}] 16k", k=4)


def section_frame():
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles)

    scene, fz = flagship_scene(traversal_backend="packet", ray_tile=32768,
                               MaxPrims=64, leaf_chunk_lanes=64)
    o, d, d_raw, n, rtile, num_tiles = _padded_frame_rays(fz)
    starts = _tile_starts(num_tiles, rtile)

    def frame(k):
        outs = []
        for _ in range(k):
            outs += render_frame_tiles(scene, o, d, d_raw, starts, fz, rtile)
        return outs

    t0 = time.perf_counter()
    fetch(_checksum(frame(1)), "frame warm")
    print(f"frame warm(compile+1) {time.perf_counter()-t0:.1f}s", flush=True)
    # per-frame [dispatch -> fetch] walls: each individually synchronized
    # (an honest upper bound incl. one checksum fetch) and robust to a
    # single relay wedge — min of 3 is the headline
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        fetch(_checksum(frame(1)), f"frame {i}")
        ts.append(time.perf_counter() - t0)
        print(f"frame {i}: {ts[-1]:.1f}s", flush=True)
    per = min(ts)
    print(f"packet FULL FRAME: {per:.2f}s (upper bound incl fetch; runs "
          f"{[round(t,1) for t in ts]}) -> {n/per/1e3:.1f} k rays/s",
          flush=True)


def main():
    sections = sys.argv[1:] or ["exact", "packet"]
    for s in sections:
        print(f"--- {s} ---", flush=True)
        try:
            globals()[f"section_{s}"]()
        except Exception as e:
            print(f"section {s} FAILED: {type(e).__name__}: {e}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
