#!/usr/bin/env python
"""Inverse-rendering demo: recover scene parameters from a target image.

Renders a ground-truth scene, perturbs the sphere albedos and light
intensities, then gradient-descends the pixel MSE back toward the target
through the full differentiable pipeline (kd-tree traversal included —
discrete winners are stop-gradiented, hit attributes recomputed
analytically).  Writes target / initial / recovered PNGs side by side.

Run (CPU, ~1 min):   python examples/inverse_rendering.py
Run on TPU:          python examples/inverse_rendering.py --tpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="stay on the TPU backend")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--outdir", default="/tmp/inverse_demo")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dod_raytracer_tpu import Config, quantize_u8, render_image
    from dod_raytracer_tpu.io import write_png
    from dod_raytracer_tpu.scene import SceneBuilder
    from dod_raytracer_tpu.train import fit

    cfg = Config(Width=96, Height=64, use_kdtree=False, recursion_depth=3,
                 ray_tile=96 * 64)

    def build(colors, intensity):
        b = SceneBuilder()
        b.add_sphere((-1.2, 0.0, 2.5), 1.0, colors[0])
        b.add_sphere((1.2, 0.4, 3.0), 0.9, colors[1])
        b.add_plane((0.0, -1.5, 0.0), (0.0, 1.0, 0.0), (0.35, 0.35, 0.4))
        b.add_plane((0.0, 0.0, 6.0), (0.0, 0.0, -1.0), (0.25, 0.3, 0.45))
        b.add_light((0.0, 3.0, -1.0), intensity)
        b.add_light((-2.0, 1.5, 0.5), 1.0)
        return b.build(cfg)

    true_scene = build([(0.85, 0.2, 0.15), (0.15, 0.4, 0.85)], 3.0)
    target = render_image(true_scene, cfg)

    start_scene = build([(0.4, 0.4, 0.4), (0.4, 0.4, 0.4)], 1.5)
    recovered, losses = fit(
        start_scene, target, cfg,
        params=("spheres.color", "lights.intensity"),
        steps=args.steps, lr=0.08, log_every=10)

    os.makedirs(args.outdir, exist_ok=True)
    write_png(f"{args.outdir}/target.png", quantize_u8(target))
    write_png(f"{args.outdir}/initial.png",
              quantize_u8(render_image(start_scene, cfg)))
    write_png(f"{args.outdir}/recovered.png",
              quantize_u8(render_image(recovered, cfg)))

    c_err = float(jnp.abs(recovered.spheres.color[:2]
                          - true_scene.spheres.color[:2]).max())
    i_err = float(jnp.abs(recovered.lights.intensity[0]
                          - true_scene.lights.intensity[0]))
    print(f"loss {losses[0]:.4e} -> {losses[-1]:.4e} over {args.steps} steps")
    print(f"max albedo error {c_err:.3f}, light-intensity error {i_err:.3f}")
    print(f"PNGs in {args.outdir}/")


if __name__ == "__main__":
    main()
