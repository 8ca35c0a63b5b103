"""Command-line renderer — the reference binary's ``main()`` as a CLI.

``python -m dod_raytracer_tpu.cli [options]`` reproduces the reference
driver (src/main.cpp:349-397): load ``config.ini`` from the working
directory, build the default scene (16 random spheres, 6 walls, cylinder,
mesh, 9 lights), render, write ``output.png`` — with a seeded PRNG instead
of ``srand(time(NULL))`` (main.cpp:351) and actual flags (the reference
has none).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="config.ini", help="reference-format ini file")
    p.add_argument("--output", default="output.png", help="output PNG (main.cpp:396)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--seed", type=int, default=0, help="scene PRNG seed")
    p.add_argument("--mesh", default="teapot",
                   help="'teapot', 'dragon' (procedural stand-in), a path, or 'none'")
    p.add_argument("--no-kdtree", action="store_true")
    p.add_argument("--depth", type=int, default=10, help="bounce depth (main.cpp:301)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from .config import Config
    from .io import write_png
    from .render import quantize_u8, render_image
    from .scene import default_scene
    from .utils.profiling import log_render_stats, phase

    overrides = {}
    if args.width:
        overrides["Width"] = args.width
    if args.height:
        overrides["Height"] = args.height
    overrides["use_kdtree"] = not args.no_kdtree
    overrides["recursion_depth"] = args.depth
    cfg = Config.load(args.config if os.path.exists(args.config) else None, **overrides)

    with phase("scene_build"):
        mesh = None if args.mesh == "none" else args.mesh
        scene = default_scene(seed=args.seed, cfg=cfg, mesh=mesh).build(cfg)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    with phase("render"):
        img = render_image(scene, cfg)
        img.block_until_ready()
    dt = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()

    with phase("png_write"):
        write_png(args.output, quantize_u8(img))
    rays = cfg.Width * cfg.Height
    log_render_stats(rays, dt)
    print(f"rendered {cfg.Width}x{cfg.Height} in {dt:.3f}s "
          f"({rays / dt / 1e6:.2f} Mprimary-rays/s) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
