"""Packet megakernel traversal tests (interpret mode on CPU).

The packet walk visits a SUPERSET of each ray's reference visit set
(packet_kernel.py docstring), so t/hit-mask results must match the gather
traversal exactly up to Plücker-vs-MT float reassociation; the winning
prim may differ ONLY where two candidates' t are exactly tied (duplicated
straddler lanes) — verified by recomputing both winners' t.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset
from dod_raytracer_tpu.ops.traverse import _backend, kd_any, kd_closest
from dod_raytracer_tpu.scene import SceneBuilder


@pytest.fixture(scope="module")
def teapot_scene():
    cfg = Config(use_kdtree=True)
    b = SceneBuilder()
    b.add_mesh(*load_mesh_asset("teapot"))
    b.add_light((0, 3, -3), 3.0)
    return b.build(cfg), cfg


def random_rays(n, seed=0, spread=6.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3), dtype=np.float32) * 2 - 1) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def _mt_t(verts, o, d):
    """Reference Möller–Trumbore t for (N,) prim ids (numpy, f64-free)."""
    a = verts[:, 0]
    e1 = verts[:, 1] - a
    e2 = verts[:, 2] - a
    p = np.cross(d, e2)
    det = np.sum(e1 * p, axis=1)
    s = o - a
    q = np.cross(s, e1)
    return np.sum(e2 * q, axis=1) / det


def assert_packet_matches(scene, t_g, prim_g, hit_g, t_p, prim_p, hit_p, o, d):
    np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_g))
    h = np.asarray(hit_g)
    np.testing.assert_allclose(np.asarray(t_p)[h], np.asarray(t_g)[h], rtol=1e-3)
    pg = np.asarray(prim_g)[h]
    pp = np.asarray(prim_p)[h]
    flip = pg != pp
    if flip.any():
        verts = np.asarray(scene.triangles.verts)
        oo = np.asarray(o)[h][flip]
        dd = np.asarray(d)[h][flip]
        tg = _mt_t(verts[pg[flip]], oo, dd)
        tp = _mt_t(verts[pp[flip]], oo, dd)
        # a flip is legitimate only when both candidates hit at the same t
        np.testing.assert_allclose(tp, tg, rtol=1e-5)


class TestPacketTraversal:
    @pytest.fixture(scope="class")
    def packet_cfg(self):
        return Config(use_kdtree=True, traversal_backend="packet",
                      packet_tile=256)

    def test_backend_resolves(self, teapot_scene, packet_cfg):
        scene, _ = teapot_scene
        assert _backend(scene.kd, packet_cfg) == "packet"

    def test_closest_matches_gather(self, teapot_scene, packet_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=3)
        t_max = jnp.full((512,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_p, prim_p, hit_p = kd_closest(scene.kd, scene.triangles, o, d, t_max, packet_cfg)
        assert_packet_matches(scene, t_g, prim_g, hit_g, t_p, prim_p, hit_p, o, d)

    def test_clipped_t_max(self, teapot_scene, packet_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=4)
        t_max = jnp.full((512,), 4.0)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_p, prim_p, hit_p = kd_closest(scene.kd, scene.triangles, o, d, t_max, packet_cfg)
        assert_packet_matches(scene, t_g, prim_g, hit_g, t_p, prim_p, hit_p, o, d)

    def test_any_hit_matches_gather(self, teapot_scene, packet_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=5)
        t_max = jnp.full((512,), 5.0)
        a_g = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
        a_p = kd_any(scene.kd, scene.triangles, o, d, t_max, packet_cfg)
        np.testing.assert_array_equal(np.asarray(a_p), np.asarray(a_g))

    def test_unaligned_ray_count_padding(self, teapot_scene, packet_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(300, seed=7)  # not a multiple of packet_tile
        t_max = jnp.full((300,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_p, prim_p, hit_p = kd_closest(scene.kd, scene.triangles, o, d, t_max, packet_cfg)
        assert_packet_matches(scene, t_g, prim_g, hit_g, t_p, prim_p, hit_p, o, d)

    def test_rays_from_inside(self, teapot_scene, packet_cfg):
        scene, cfg = teapot_scene
        rng = np.random.default_rng(11)
        o = jnp.asarray((rng.random((256, 3)) * 0.5 - 0.25).astype(np.float32))
        d = rng.standard_normal((256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        t_max = jnp.full((256,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_p, prim_p, hit_p = kd_closest(scene.kd, scene.triangles, o, d, t_max, packet_cfg)
        assert_packet_matches(scene, t_g, prim_g, hit_g, t_p, prim_p, hit_p, o, d)
