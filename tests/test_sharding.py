"""Distributed tests on the virtual 8-device CPU mesh: sharded render and
train step must be numerically invariant vs the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.grad import loss_and_param_grads
from dod_raytracer_tpu.parallel import make_mesh, make_train_step, render_image_sharded, replicate_scene
from dod_raytracer_tpu.render import render_image
from dod_raytracer_tpu.scene import SceneBuilder


def build_scene(cfg):
    b = SceneBuilder()
    b.add_sphere((0.0, 0.3, 2.0), 1.1, (0.8, 0.3, 0.2))
    b.add_sphere((-1.5, -0.5, 3.5), 0.9, (0.2, 0.7, 0.3))
    b.add_plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0), (0.3, 0.3, 0.6))
    b.add_light((1.0, 3.0, -2.0), 3.0)
    return b.build(cfg)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_render_matches_single(ndev):
    cfg = Config(Width=40, Height=24, use_kdtree=False, recursion_depth=3, ray_tile=960)
    scene = build_scene(cfg)
    mesh = make_mesh(ndev)
    scene_r = replicate_scene(scene, mesh)
    img_sharded = np.asarray(render_image_sharded(scene_r, cfg, mesh))
    img_single = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)


def test_train_step_matches_single_device_grads():
    cfg = Config(Width=32, Height=16, use_kdtree=False, recursion_depth=2)
    scene = build_scene(cfg)
    target = jnp.full((16, 32, 3), 0.25)

    mesh = make_mesh(8)
    step = make_train_step(cfg, mesh, params=("spheres", "lights"), lr=0.0)
    loss_dist, _ = step(replicate_scene(scene, mesh), target.reshape(-1, 3))

    loss_single, _ = loss_and_param_grads(scene, target, cfg, params=("spheres", "lights"))
    np.testing.assert_allclose(float(loss_dist), float(loss_single), rtol=1e-5)


def test_train_step_descends():
    cfg = Config(Width=32, Height=16, use_kdtree=False, recursion_depth=2)
    scene = build_scene(cfg)
    target = jnp.full((16 * 32, 3), 0.25)
    mesh = make_mesh(8)
    step = make_train_step(cfg, mesh, params=("spheres", "lights"), lr=0.3)
    scene = replicate_scene(scene, mesh)
    losses = []
    for _ in range(3):
        loss, scene = step(scene, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_render_with_kdtree_matches_single():
    """kd traversal inside shard_map (the flagship's actual DP path):
    the while-loop carries must inherit the rays' varying axes, and the
    sharded render must match single-device exactly."""
    from dod_raytracer_tpu.mesh import load_mesh_asset

    cfg = Config(Width=32, Height=24, use_kdtree=True, recursion_depth=3,
                 ray_tile=768)
    tv, tn = load_mesh_asset("teapot")
    b = SceneBuilder()
    b.add_mesh(tv[:3000], tn[:3000])
    b.add_sphere((2.0, 1.0, 1.0), 0.8, (0.9, 0.3, 0.2))
    b.add_plane((0.0, 0.0, 5.0), (0.0, 0.0, -1.0), (0.2, 0.4, 0.6))
    b.add_light((0.0, 3.0, -3.0), 3.0)
    scene = b.build(cfg)
    mesh = make_mesh(8)
    img_sharded = np.asarray(render_image_sharded(
        replicate_scene(scene, mesh), cfg, mesh))
    img_single = np.asarray(render_image(scene, cfg))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)
