#!/usr/bin/env python
"""Scaling-efficiency harness (BASELINE target: >=80% efficiency 1 -> N).

Renders the same frame data-parallel on 1, 2, 4, ... N devices of the
available backend and reports rays/sec plus efficiency vs the 1-device
run.  On the real pod this measures ICI/DCN scaling; this container
exposes ONE physical TPU chip, so there the harness can only run the
N=1 row — on CPU it exercises the full mechanics over the 8 virtual
devices (`--cpu`, the tests' backend), which validates the measurement
path end-to-end even though host-core contention makes the CPU numbers
hardware-meaningless.

Usage:
  python scripts/scaling_bench.py [--cpu] [--width W --height H] [--mesh M]

Prints one JSON line per mesh size:
  {"devices": n, "rays_per_sec": r, "efficiency_vs_1": e, ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-virtual-device CPU backend")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--mesh", default="teapot")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.parallel.sharding import (
        make_mesh, render_image_sharded, replicate_scene)
    from dod_raytracer_tpu.scene import default_scene

    cfg = Config(Width=args.width, Height=args.height, use_kdtree=True,
                 ray_tile=args.width * args.height)
    scene = default_scene(seed=0, cfg=cfg, mesh=args.mesh).build(cfg)
    total = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= total]
    rays = args.width * args.height
    base = None
    for n in sizes:
        mesh = make_mesh(n)
        sc = replicate_scene(scene, mesh)
        img = render_image_sharded(sc, cfg, mesh)  # compile + warm
        jax.block_until_ready(img)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            img = render_image_sharded(sc, cfg, mesh)
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        rps = rays / t
        if base is None:
            base = rps
        eff = rps / (base * n)
        print(json.dumps({
            "devices": n,
            "rays_per_sec": round(rps, 1),
            "seconds": round(t, 5),
            "efficiency_vs_1": round(eff, 3),
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
