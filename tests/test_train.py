"""Inverse-rendering integration tests: recover perturbed scene parameters
from a target render (BASELINE configs 3-4 in miniature)."""

import jax.numpy as jnp
import numpy as np

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.grad import render_for_grad
from dod_raytracer_tpu.scene import SceneBuilder
from dod_raytracer_tpu.train import fit

CFG = Config(Width=24, Height=24, use_kdtree=False, recursion_depth=2)


def make_scene(albedo, intensity):
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 2.0), 1.2, albedo)
    b.add_plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0), (0.3, 0.3, 0.6))
    b.add_light((1.0, 3.0, -2.0), intensity)
    return b.build(CFG)


def test_recover_albedo_and_light():
    true_scene = make_scene((0.8, 0.3, 0.2), 3.0)
    target = render_for_grad(true_scene, CFG)

    start = make_scene((0.4, 0.6, 0.5), 1.8)
    fitted, losses = fit(start, target, CFG,
                         params=("spheres.color", "lights.intensity"),
                         steps=150, lr=0.05, verbose=False)
    assert losses[-1] < losses[0] * 0.02, (losses[0], losses[-1])
    np.testing.assert_allclose(np.asarray(fitted.spheres.color[0]),
                               [0.8, 0.3, 0.2], atol=0.05)
    assert abs(float(fitted.lights.intensity[0]) - 3.0) < 0.3


def test_fit_checkpoint_resume(tmp_path):
    true_scene = make_scene((0.7, 0.2, 0.5), 2.5)
    target = render_for_grad(true_scene, CFG)
    start = make_scene((0.4, 0.4, 0.4), 2.0)

    ckpt = str(tmp_path / "fit.npz")
    s1, l1 = fit(start, target, CFG, steps=20, lr=0.05,
                 checkpoint_path=ckpt, checkpoint_every=10, verbose=False)
    # resume from step 20 and continue to 40
    s2, l2 = fit(start, target, CFG, steps=40, lr=0.05,
                 checkpoint_path=ckpt, checkpoint_every=10, verbose=False)
    assert len(l2) == 20  # only steps 20..40 ran
    assert l2[-1] <= l1[-1] * 1.05  # loss kept descending (allow jitter)
