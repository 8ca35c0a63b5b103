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


def test_train_step_2d_decreases_loss():
    """Full dp x mp inverse-rendering step: vertex grads stay mp-sharded
    (psum over dp only), loss is finite, decreases over steps, and the kd
    leaf blocks are refreshed so step N+1 traverses the updated mesh."""
    from dod_raytracer_tpu.parallel.leaf_shard import make_train_step_2d
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config(Width=32, Height=24, use_kdtree=True, recursion_depth=3,
                 tri_shard_axis="mp")
    scene = make_leaf_sharded_scene(build(cfg), cfg, 2)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "mp"))
    scene = jax.device_put(scene, NamedSharding(mesh, P()))

    target = jnp.zeros((cfg.Width * cfg.Height, 3))
    step = make_train_step_2d(cfg, mesh, lr=0.02)
    s = scene
    losses = []
    for _ in range(3):
        loss, s = step(s, target)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
    moved = float(jnp.abs(s.triangles.verts - scene.triangles.verts).max())
    assert moved > 0.0
    # blocks were refreshed from the updated verts
    assert float(jnp.abs(s.kd.block_tris - scene.kd.block_tris).max()) > 0.0
