"""Pallas kernel tests (interpret mode on CPU; the same kernels compile on
TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset
from dod_raytracer_tpu.ops.pallas.mt_kernel import mt_closest_pallas, swizzle_rays, swizzle_tris
from dod_raytracer_tpu.ops.triangle import brute_force_closest
from dod_raytracer_tpu.scene import SceneBuilder


def rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = ((rng.random((n, 3)) * 2 - 1) * 6).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


class TestMTKernel:
    def test_matches_brute_force_teapot(self):
        tv, _ = load_mesh_asset("teapot")
        o, d = rays(512)
        soa = swizzle_tris(jnp.asarray(tv))
        t_p, i_p = mt_closest_pallas(soa, o, d, interpret=True)
        t_b, i_b = brute_force_closest(jnp.asarray(tv), o, d)
        hp, hb = np.isfinite(np.asarray(t_p)), np.isfinite(np.asarray(t_b))
        np.testing.assert_array_equal(hp, hb)
        np.testing.assert_allclose(np.asarray(t_p)[hp], np.asarray(t_b)[hp], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i_p)[hp], np.asarray(i_b)[hp])

    def test_non_multiple_sizes(self):
        rng = np.random.default_rng(1)
        tv = (rng.standard_normal((37, 3, 3)) * 2).astype(np.float32)
        o, d = rays(100, seed=2)
        soa = swizzle_tris(jnp.asarray(tv), tile_t=512)
        t_p, i_p = mt_closest_pallas(soa, o, d, tile_r=256, interpret=True)
        assert t_p.shape == (100,)
        t_b, i_b = brute_force_closest(jnp.asarray(tv), o, d)
        hp = np.isfinite(np.asarray(t_p))
        np.testing.assert_array_equal(hp, np.isfinite(np.asarray(t_b)))
        np.testing.assert_array_equal(np.asarray(i_p)[hp], np.asarray(i_b)[hp])

    def test_swizzle_shapes(self):
        tv = jnp.zeros((10, 3, 3))
        soa = swizzle_tris(tv, tile_t=512)
        assert soa.shape == (9, 512)
        o = jnp.zeros((10, 3))
        r, n = swizzle_rays(o, o, tile_r=256)
        assert r.shape == (256, 8) and n == 10


class TestPluckerKernel:
    def test_matches_brute_force_teapot(self):
        from dod_raytracer_tpu.ops.pallas.plucker_kernel import plucker_closest, plucker_pack

        tv, _ = load_mesh_asset("teapot")
        o, d = rays(512)
        g = plucker_pack(jnp.asarray(tv))
        t_p, i_p = plucker_closest(g, o, d, interpret=True)
        t_b, i_b = brute_force_closest(jnp.asarray(tv), o, d)
        hp, hb = np.isfinite(np.asarray(t_p)), np.isfinite(np.asarray(t_b))
        np.testing.assert_array_equal(hp, hb)
        np.testing.assert_allclose(np.asarray(t_p)[hp], np.asarray(t_b)[hp], rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(i_p)[hp], np.asarray(i_b)[hp])

    def test_double_sided_and_degenerate(self):
        from dod_raytracer_tpu.ops.pallas.plucker_kernel import plucker_closest, plucker_pack

        tri = jnp.asarray([[[-1, -1, 2], [1, -1, 2], [0, 1, 2]],
                           [[0, 0, 0], [0, 0, 0], [0, 0, 0]]], jnp.float32)
        g = plucker_pack(tri)
        o = jnp.asarray([[0, 0, 0], [0, 0, 4]], jnp.float32)
        d = jnp.asarray([[0, 0, 1], [0, 0, -1]], jnp.float32)  # front + back side
        t, idx = plucker_closest(g, o, d, interpret=True)
        np.testing.assert_allclose(np.asarray(t), [2.0, 2.0], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), [0, 0])


def test_pallas_backend_render_matches_jnp():
    from dod_raytracer_tpu import render_image

    rng = np.random.default_rng(3)
    tv = (rng.standard_normal((64, 3, 3)) * 1.5).astype(np.float32)
    tn = np.tile(np.eye(3)[None], (64, 1, 1)).astype(np.float32)

    def build(backend):
        cfg = Config(Width=24, Height=16, use_kdtree=False, ray_tile=512,
                     recursion_depth=2, triangle_backend=backend)
        b = SceneBuilder()
        b.add_mesh(tv, tn, color=(0.6, 0.5, 0.4))
        b.add_light((0.0, 2.0, -3.0), 4.0)
        return b.build(cfg), cfg

    s1, c1 = build("jnp")
    s2, c2 = build("pallas")
    img1 = np.asarray(render_image(s1, c1))
    img2 = np.asarray(render_image(s2, c2))
    np.testing.assert_allclose(img1, img2, atol=1e-5)
