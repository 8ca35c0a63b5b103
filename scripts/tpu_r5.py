"""Round-5 measurements (fetch-synchronized, real device).

Round 5 is the performance round: the measured competitor (REFBENCH.json,
2-core AVX2 host) renders dragon@1080p in 89.2 s / teapot@512 in 3.12 s,
and round 4 ended at 122.2 s / 5.54 s.  The levers under test here:

  * fold_groups — group-gated fold epilogue (the 9x-the-matmul VPU cost
    now runs per 16-row group, gated on candidate rays)
  * kill-to-tail bounce-sort keys (dead rays stop diluting live packets)
  * lean argmin (min-orig tie break, no cols pass)

Sections (run: python scripts/tpu_r5.py [section ...]):
  exact     : packet vs binned exactness on a dragon center tile
  foldsweep : fold_groups in {1, 4, 8, 16} on closest-hit + 10-bounce tile
  depths    : per-bounce marginal cost with the new kernel
  teapot    : teapot@512 closest-hit + 10-bounce, packet vs mega
  frame     : honest full-frame dragon@1080p (min-of-3)
  frame512  : honest full-frame teapot@512
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

from tpu_r4 import (_checksum, center_tiles, fetch, flagship_scene,
                    truth_time)


def section_exact(mp=64, bl=None):
    from dod_raytracer_tpu.ops.traverse import kd_any, kd_closest

    scene, fzp = flagship_scene(traversal_backend="packet",
                                MaxPrims=mp, leaf_chunk_lanes=bl or mp)
    _, fzb = flagship_scene(traversal_backend="binned")
    tiles, tile = center_tiles(fzp, k=1)
    o, d, _ = tiles[0]
    inf = jnp.full((tile,), jnp.inf)

    tp, pp, hp = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fzp))(scene, o, d)
    tb, pb, hb = jax.jit(lambda s, o, d: kd_closest(s.kd, s.triangles, o, d, inf, fzb))(scene, o, d)
    ap = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fzp))(scene, o, d)
    ab = jax.jit(lambda s, o, d: kd_any(s.kd, s.triangles, o, d, jnp.full((tile,), 8.0), fzb))(scene, o, d)
    hp_, hb_ = fetch(hp, "hp").astype(bool), fetch(hb, "hb").astype(bool)
    both = hp_ & hb_
    flips = int((fetch(pp, "pp")[both] != fetch(pb, "pb")[both]).sum())
    dt = np.abs(fetch(tp, "tp")[both] - fetch(tb, "tb")[both])
    print(f"exact: hits {hp_.sum()}/{tile} mask_match={(hp_ == hb_).all()} "
          f"prim_flips={flips}/{int(both.sum())} max|dt|={dt.max():.2e} "
          f"anyhit_match={(fetch(ap,'ap') == fetch(ab,'ab')).all()}",
          flush=True)


def section_exact48():
    section_exact(mp=48)


def section_exact192():
    section_exact(mp=192, bl=48)


def section_framedwin():
    _frame("dragon", 1920, 1080, MaxPrims=192, leaf_chunk_lanes=48)


def section_foldsweep():
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import render_rays

    for fg in (1, 4, 8, 16):
        scene, fz = flagship_scene(traversal_backend="packet",
                                   MaxPrims=64, leaf_chunk_lanes=64,
                                   fold_groups=fg)
        tiles, tile = center_tiles(fz, k=2)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                   f"dragon ch        [fg={fg:2d}] 16k", k=4)
        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [fg={fg:2d}] 16k", k=1)


def section_killsweep():
    from dod_raytracer_tpu.render import render_rays

    for kt in (False, True):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            sort_kill_tail=kt)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [kill_tail={kt}] 16k", k=1)


def section_depths():
    from dod_raytracer_tpu.render import render_rays

    for depth in (1, 3, 10):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            recursion_depth=depth)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon depth={depth:2d} [fg8] 16k",
                   k=2 if depth < 5 else 1)


def section_teapot():
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import render_rays

    for be in ("packet", "mega"):
        scene, fz = flagship_scene(mesh="teapot", Width=512, Height=512,
                                   traversal_backend=be,
                                   MaxPrims=64, leaf_chunk_lanes=64)
        tiles, tile = center_tiles(fz)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                   f"teapot ch        [{be}] 16k", k=4)
        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"teapot 10-bounce [{be}] 16k", k=1)


def _frame(mesh, width, height, **over):
    from dod_raytracer_tpu.render import (_padded_frame_rays, _tile_starts,
                                          render_frame_tiles)

    kw = dict(traversal_backend="packet", ray_tile=32768,
              MaxPrims=64, leaf_chunk_lanes=64, Width=width, Height=height)
    kw.update(over)
    scene, fz = flagship_scene(mesh=mesh, **kw)
    o, d, d_raw, n, rtile, num_tiles = _padded_frame_rays(fz)
    starts = _tile_starts(num_tiles, rtile)

    def frame():
        return render_frame_tiles(scene, o, d, d_raw, starts, fz, rtile)

    t0 = time.perf_counter()
    fetch(_checksum(frame()), "frame warm")
    print(f"frame warm(compile+1) {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        fetch(_checksum(frame()), f"frame {i}")
        ts.append(time.perf_counter() - t0)
        print(f"frame {i}: {ts[-1]:.1f}s", flush=True)
    per = min(ts)
    print(f"FULL FRAME {mesh}@{width}x{height}: {per:.2f}s (runs "
          f"{[round(t,1) for t in ts]}) -> {n/per/1e3:.1f} k rays/s",
          flush=True)


def section_frame():
    _frame("dragon", 1920, 1080)


def section_frame512():
    _frame("teapot", 512, 512)


def section_knobs512():
    """Teapot@512 frame under knob variants: at teapot scale the kd walk
    is cheap (1.9 ms/16k closest), so per-bounce FIXED costs — the two
    wavefront sorts and the (9*N,) shadow sort — may dominate the frame.
    Each variant is a full honest frame (min-of-3)."""
    variants = [
        ("baseline", {}),
        ("no_shadow_sort", dict(sort_shadow=False)),
        ("no_bounce_sort", dict(sort_bounces=False)),
        ("no_sorts", dict(sort_shadow=False, sort_bounces=False)),
        ("pt2048", dict(packet_tile=2048)),
        ("rt65536", dict(ray_tile=65536)),
    ]
    for name, over in variants:
        print(f"--- knobs512 {name} ---", flush=True)
        _frame("teapot", 512, 512, **over)


def section_split():
    """Attribute the 10-bounce dragon tile (702 ms) across its remaining
    cost centers: the (L*N,) shadow sort per bounce, the shadow walks
    themselves (1 light vs 9), and the raw XLA sort primitive at shadow
    shape.  Shadow rays inherit hit-point clustering from the BOUNCE sort
    (their origins are the sorted hit points), so the dedicated shadow
    sort may be paying more than its coherence wins."""
    from dod_raytracer_tpu.render import render_rays

    # raw sort cost at shadow shape (9*16384 rows) and bounce shape
    for n in (16384, 9 * 16384):
        keys = jnp.arange(n, dtype=jnp.int32)[::-1]

        @jax.jit
        def srt(k):
            return jax.lax.sort_key_val(
                k, jax.lax.broadcasted_iota(jnp.int32, k.shape, 0))[1]

        truth_time(srt, [(keys,)], f"sort_key_val n={n}", k=8)

    for name, over in (("baseline", {}),
                       ("no_shadow_sort", dict(sort_shadow=False)),
                       ("no_reverse", dict(shadow_reverse=False)),
                       ("seq_shadow", dict(shadow_batch_lights=False))):
        scene, fz = flagship_scene(traversal_backend="packet", MaxPrims=64,
                                   leaf_chunk_lanes=64, **over)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [{name}] 16k", k=1)

    # 1 light vs 9: marginal shadow-walk cost
    scene, fz = flagship_scene(traversal_backend="packet", MaxPrims=64,
                               leaf_chunk_lanes=64)
    l1 = scene.replace(lights=jax.tree_util.tree_map(
        lambda v: v[:1], scene.lights))
    tiles, tile = center_tiles(fz, k=2)

    @jax.jit
    def full(scene, o, d, d_raw):
        return render_rays(scene, o, d, d_raw, fz)

    truth_time(full, [(l1, o, d, r) for (o, d, r) in tiles],
               "dragon 10-bounce [1 light] 16k", k=1)


def section_knobs512b():
    """Teapot tree-shape sweep (tiny tree: fold cost per visit scales
    with block Spad, so smaller blocks may win where the dragon prefers
    mp=64), plus teapot@1080p — REFBENCH's reference CPU renders that in
    22.5 s."""
    for name, over in (
            ("mp32", dict(MaxPrims=32, leaf_chunk_lanes=32)),
            ("mp16", dict(MaxPrims=16, leaf_chunk_lanes=16)),
            ("mp128", dict(MaxPrims=128, leaf_chunk_lanes=128)),
    ):
        print(f"--- knobs512b {name} ---", flush=True)
        _frame("teapot", 512, 512, **over)


def section_frame1080t():
    _frame("teapot", 1920, 1080)


def section_knobs512c():
    for name, over in (
            ("mp32_fg16", dict(MaxPrims=32, leaf_chunk_lanes=32,
                               fold_groups=16)),
            ("mp32_fg4", dict(MaxPrims=32, leaf_chunk_lanes=32,
                              fold_groups=4)),
            ("mp48", dict(MaxPrims=48, leaf_chunk_lanes=48)),
    ):
        print(f"--- knobs512c {name} ---", flush=True)
        _frame("teapot", 512, 512, **over)


def section_knobs512d():
    """Decoupled leaf/block shapes for the teapot (the dragon's
    mp192/bl48 discovery, scaled to a 6.3k-tri mesh)."""
    for name, over in (
            ("mp96_bl48", dict(MaxPrims=96, leaf_chunk_lanes=48)),
            ("mp144_bl48", dict(MaxPrims=144, leaf_chunk_lanes=48)),
            ("mp96_bl32", dict(MaxPrims=96, leaf_chunk_lanes=32)),
    ):
        print(f"--- knobs512d {name} ---", flush=True)
        _frame("teapot", 512, 512, **over)


def section_frame1080t32():
    _frame("teapot", 1920, 1080, MaxPrims=32, leaf_chunk_lanes=32)


def section_frame1080t48():
    _frame("teapot", 1920, 1080, MaxPrims=48, leaf_chunk_lanes=48)


def section_frame1080twin():
    _frame("teapot", 1920, 1080, MaxPrims=96, leaf_chunk_lanes=48)


def section_dragon48():
    """mp48 surprised on teapot (2.85 s vs 3.24 @mp32 / 3.37 @mp64);
    check the dragon tile at the same shape before trying a frame."""
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import render_rays

    for mp in (48, 64):
        scene, fz = flagship_scene(traversal_backend="packet",
                                   MaxPrims=mp, leaf_chunk_lanes=mp)
        tiles, tile = center_tiles(fz, k=2)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                   f"dragon ch        [mp{mp}] 16k", k=4)
        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [mp{mp}] 16k", k=1)


def section_framed48():
    _frame("dragon", 1920, 1080, MaxPrims=48, leaf_chunk_lanes=48)


def section_dragonmp():
    """Dragon tree-shape re-sweep at fg=8: the mp=64 pin predates the
    gated folds — bigger blocks mean fewer per-block fixed costs (2 gate
    syncs + mailbox + FIFO bookkeeping per block) amortized over more
    candidates, at the price of wider per-block AABBs (less selective
    gates)."""
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import render_rays

    for mp in (80, 96, 112):
        scene, fz = flagship_scene(traversal_backend="packet",
                                   MaxPrims=mp, leaf_chunk_lanes=mp)
        tiles, tile = center_tiles(fz, k=2)
        inf = jnp.full((tile,), jnp.inf)

        @jax.jit
        def ch(scene, o, d):
            return closest_hit(scene, o, d, fz, t_max=inf).t

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(ch, [(scene, o, d) for (o, d, _) in tiles],
                   f"dragon ch        [mp{mp} fg8] 16k", k=4)
        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [mp{mp} fg8] 16k", k=1)


def section_dragonsplit():
    """Decouple leaf size (MaxPrims) from block size (leaf_chunk_lanes):
    coarse leaves reduce node visits + straddler duplication while small
    blocks keep per-block AABB gates selective (nb>1 blocks per leaf
    stream through the same FIFO)."""
    from dod_raytracer_tpu.render import render_rays

    for mp, bl, fg in ((192, 48, 8), (256, 48, 8), (224, 48, 8),
                       (160, 64, 8)):
        scene, fz = flagship_scene(traversal_backend="packet", MaxPrims=mp,
                                   leaf_chunk_lanes=bl, fold_groups=fg)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [mp{mp} bl{bl} fg{fg}] 16k", k=1)


def section_resweep():
    """Re-sweep DMA FIFO depth and packet size at fg=8: both pins were
    measured BEFORE the gated folds changed the per-block compute/DMA
    balance (process cost per block dropped ~4x, so transfer latency may
    now bind where ring bookkeeping used to)."""
    from dod_raytracer_tpu.render import render_rays

    for name, over in (
            ("fifo2 pt1024 fg8", {}),
            ("fifo3 pt1024 fg8", dict(dma_fifo=3)),
            ("fifo4 pt1024 fg8", dict(dma_fifo=4)),
            ("fifo2 pt2048 fg8", dict(packet_tile=2048)),
            ("fifo2 pt2048 fg4", dict(packet_tile=2048, fold_groups=4)),
            ("fifo4 pt2048 fg8", dict(packet_tile=2048, dma_fifo=4)),
    ):
        scene, fz = flagship_scene(traversal_backend="packet", MaxPrims=64,
                                   leaf_chunk_lanes=64, **over)
        tiles, tile = center_tiles(fz, k=2)

        @jax.jit
        def full(scene, o, d, d_raw):
            return render_rays(scene, o, d, d_raw, fz)

        truth_time(full, [(scene, o, d, r) for (o, d, r) in tiles],
                   f"dragon 10-bounce [{name}] 16k", k=1)


def section_gradtile():
    """Per-tile fwd+bwd (vertex grads) cost at 16384 vs 32768 rays,
    with/without remat_bounces — VERDICT r4 item 5: the grad FRAME pays
    tile-size (16384 pinned for liveness), not autodiff; if 32768(+remat)
    fits, the grad frame drops to ~forward+overhead."""
    import functools

    from dod_raytracer_tpu.render import render_rays

    for rt, remat in ((16384, False), (32768, False), (32768, True)):
        scene, fz = flagship_scene(
            traversal_backend="packet", MaxPrims=64, leaf_chunk_lanes=64,
            ray_tile=rt, remat_bounces=remat)
        tiles, tile = center_tiles(fz, k=2)

        @functools.partial(jax.jit, donate_argnames=("g_acc",))
        def tile_grad(scene, o, d, d_raw, g_acc):
            def f(v):
                s = scene.replace(triangles=scene.triangles.replace(verts=v))
                return jnp.sum(render_rays(s, o, d, d_raw, fz) ** 2)

            val, g = jax.value_and_grad(f)(scene.triangles.verts)
            return g_acc + g, val

        def call(scene, o, d, r):
            g0 = jnp.zeros_like(scene.triangles.verts)
            g, v = tile_grad(scene, o, d, r, g0)
            return v  # checksum on the loss only: grads ride the same program

        try:
            truth_time(call, [(scene, o, d, r) for (o, d, r) in tiles],
                       f"grad tile rt={rt} remat={int(remat)}", k=1)
        except Exception as e:
            print(f"grad rt={rt} remat={remat} FAILED: {type(e).__name__}: {e}",
                  flush=True)


def main():
    sections = sys.argv[1:] or ["exact", "foldsweep"]
    for s in sections:
        print(f"--- {s} ---", flush=True)
        try:
            globals()[f"section_{s}"]()
        except Exception as e:
            print(f"section {s} FAILED: {type(e).__name__}: {e}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
