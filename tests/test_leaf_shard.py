"""Leaf-sharded (model-parallel) scene tests: triangles+kd sharded over a
mesh axis must render identically to the replicated single-device path."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset
from dod_raytracer_tpu.parallel.leaf_shard import make_leaf_sharded_scene, render_image_leaf_sharded
from dod_raytracer_tpu.render import render_image
from dod_raytracer_tpu.scene import SceneBuilder


def build(cfg):
    tv, tn = load_mesh_asset("teapot")
    b = SceneBuilder()
    b.add_mesh(tv[:2000], tn[:2000])
    b.add_sphere((2.0, 1.0, 1.0), 0.8, (0.9, 0.3, 0.2))
    b.add_plane((0.0, 0.0, 5.0), (0.0, 0.0, -1.0), (0.2, 0.4, 0.6))
    b.add_light((0.0, 3.0, -3.0), 3.0)
    b.add_light((3.0, 1.0, -2.0), 2.0)
    return b


@pytest.mark.parametrize("ndp,nmp", [(2, 4), (4, 2), (1, 8)])
def test_leaf_sharded_matches_replicated(ndp, nmp):
    cfg_ref = Config(Width=32, Height=24, use_kdtree=True, recursion_depth=3, ray_tile=768)
    ref = np.asarray(render_image(build(cfg_ref).build(cfg_ref), cfg_ref))

    cfg = Config(Width=32, Height=24, use_kdtree=True, recursion_depth=3,
                 tri_shard_axis="mp")
    scene = make_leaf_sharded_scene(build(cfg), cfg, nmp)
    devices = np.asarray(jax.devices()[: ndp * nmp]).reshape(ndp, nmp)
    mesh = Mesh(devices, ("dp", "mp"))
    img = np.asarray(render_image_leaf_sharded(scene, cfg, mesh))
    np.testing.assert_allclose(img, ref, atol=2e-5)
