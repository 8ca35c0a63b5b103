"""Per-kernel oracle tests: batched JAX intersectors vs the scalar numpy
oracle — the reference's dual-path AVX-vs-scalar pattern (SURVEY.md §4)
made into pytest."""

import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.oracle import renderer as oracle
from dod_raytracer_tpu.scene import SceneBuilder
from dod_raytracer_tpu.ops.sphere import intersect_spheres, occluded_spheres
from dod_raytracer_tpu.ops.plane import intersect_planes
from dod_raytracer_tpu.ops.cylinder import intersect_cylinders
from dod_raytracer_tpu.ops.triangle import intersect_triangles_brute
from dod_raytracer_tpu.ops.aabb import slab_test

EPS = 1.0e-4
CFG = Config(use_kdtree=False)


def random_rays(rng, n, spread=1.0):
    o = (rng.random((n, 3), dtype=np.float32) * 2 - 1) * 4.0 * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


def scene_pair(build_fn):
    b = SceneBuilder()
    build_fn(b)
    return b.build(CFG), oracle.OracleScene.from_builder(b)


def check_family(jax_fn, oracle_fn, scene, oscene, o, d, atol=1e-4):
    n = o.shape[0]
    t_max = jnp.full((n,), jnp.inf)
    fh = jax_fn(scene, jnp.asarray(o), jnp.asarray(d), t_max)
    for i in range(n):
        ref = oracle_fn(oscene, o[i], d[i], np.float32(np.inf))
        t_jax = float(fh.t[i])
        if ref is None:
            assert not np.isfinite(t_jax), f"ray {i}: jax hit t={t_jax}, oracle miss"
        else:
            t_ref, hp, nrm, col = ref
            assert np.isfinite(t_jax), f"ray {i}: jax miss, oracle t={t_ref}"
            assert abs(t_jax - t_ref) < atol, (i, t_jax, t_ref)
            np.testing.assert_allclose(np.asarray(fh.normal[i]), nrm, atol=1e-3)
            np.testing.assert_allclose(np.asarray(fh.color[i]), col, atol=1e-5)


class TestSphere:
    def test_vs_oracle(self):
        rng = np.random.default_rng(1)
        scene, oscene = scene_pair(lambda b: [
            b.add_sphere(rng.standard_normal(3) * 2, 0.5 + rng.random(), rng.random(3))
            for _ in range(7)
        ])
        o, d = random_rays(rng, 256)
        check_family(lambda s, o, d, t: intersect_spheres(s.spheres, o, d, t),
                     oracle.intersect_sphere_family, scene, oscene, o, d)

    def test_origin_inside_is_miss(self):
        # reference quirk: ray starting inside a sphere misses (sphere.cpp:70)
        scene, _ = scene_pair(lambda b: b.add_sphere((0, 0, 0), 2.0, (1, 0, 0)))
        fh = intersect_spheres(scene.spheres, jnp.zeros((1, 3)),
                               jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([jnp.inf]))
        assert not bool(jnp.isfinite(fh.t[0]))

    def test_behind_is_miss(self):
        scene, _ = scene_pair(lambda b: b.add_sphere((0, 0, -5), 1.0, (1, 0, 0)))
        fh = intersect_spheres(scene.spheres, jnp.zeros((1, 3)),
                               jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([jnp.inf]))
        assert not bool(jnp.isfinite(fh.t[0]))

    def test_occlusion(self):
        rng = np.random.default_rng(2)
        scene, oscene = scene_pair(lambda b: [
            b.add_sphere(rng.standard_normal(3) * 2, 1.0, (1, 1, 1)) for _ in range(5)
        ])
        o, d = random_rays(rng, 128)
        t_max = np.full((128,), 6.0, np.float32)
        got = np.asarray(occluded_spheres(scene.spheres, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)))
        for i in range(128):
            ref = oracle.intersect_sphere_family(oscene, o[i], d[i], t_max[i])
            assert bool(got[i]) == (ref is not None), i


class TestPlane:
    def test_vs_oracle(self):
        rng = np.random.default_rng(3)
        def build(b):
            for _ in range(5):
                n = rng.standard_normal(3)
                b.add_plane(rng.standard_normal(3) * 3, n, rng.random(3))
        scene, oscene = scene_pair(build)
        o, d = random_rays(rng, 256)
        check_family(lambda s, o, d, t: intersect_planes(s.planes, o, d, t, EPS),
                     lambda os, o, d, c: oracle.intersect_plane_family(os, o, d, c, np.float32(EPS)),
                     scene, oscene, o, d)

    def test_normal_not_flipped(self):
        # plane.cpp:134 — hit normal is stored normal even when backfacing
        scene, _ = scene_pair(lambda b: b.add_plane((0, 0, 5), (0, 0, 1), (1, 1, 1)))
        fh = intersect_planes(scene.planes, jnp.zeros((1, 3)),
                              jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([jnp.inf]), EPS)
        assert bool(jnp.isfinite(fh.t[0]))
        np.testing.assert_allclose(np.asarray(fh.normal[0]), [0, 0, 1])


class TestCylinder:
    def test_vs_oracle(self):
        rng = np.random.default_rng(4)
        def build(b):
            for _ in range(3):
                b.add_cylinder(rng.standard_normal(3), rng.standard_normal(3),
                               0.5 + rng.random(), 1.0 + 2 * rng.random(), rng.random(3))
        scene, oscene = scene_pair(build)
        o, d = random_rays(rng, 256)
        check_family(
            lambda s, o, d, t: intersect_cylinders(s.cylinders, o, d, t, EPS),
            lambda os, o, d, c: oracle.intersect_cylinder_family(os, o, d, c, np.float32(EPS)),
            scene, oscene, o, d, atol=5e-4)

    def test_color_fixed_not_bug(self):
        # our build fixes the reference's dropped cylinder color (cylinder.cpp:204)
        scene, _ = scene_pair(lambda b: b.add_cylinder((0, -1, 3), (0, 1, 0), 1.0, 2.0, (0.3, 0.5, 0.7)))
        fh = intersect_cylinders(scene.cylinders, jnp.zeros((1, 3)),
                                 jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([jnp.inf]), EPS)
        assert bool(jnp.isfinite(fh.t[0]))
        np.testing.assert_allclose(np.asarray(fh.color[0]), [0.3, 0.5, 0.7], atol=1e-6)

    def test_color_bug_replication(self):
        scene, _ = scene_pair(lambda b: b.add_cylinder((0, -1, 3), (0, 1, 0), 1.0, 2.0, (0.3, 0.5, 0.7)))
        fh = intersect_cylinders(scene.cylinders, jnp.zeros((1, 3)),
                                 jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([jnp.inf]), EPS,
                                 color_bug=True)
        np.testing.assert_allclose(np.asarray(fh.color[0]), [0.0, 0.0, 0.0])


class TestTriangle:
    def test_vs_oracle(self):
        rng = np.random.default_rng(5)
        tris = rng.standard_normal((40, 3, 3)).astype(np.float32) * 2
        normals = rng.standard_normal((40, 3, 3)).astype(np.float32)
        def build(b):
            b.add_mesh(tris, normals, color=(0.1, 0.8, 0.3))
        scene, oscene = scene_pair(build)
        o, d = random_rays(rng, 256)
        check_family(
            lambda s, o, d, t: intersect_triangles_brute(s.triangles, s.mesh_colors, o, d, t, chunk=16),
            oracle.intersect_triangle_family, scene, oscene, o, d)

    def test_degenerate_padding_misses(self):
        scene, _ = scene_pair(lambda b: None)  # empty -> all-zero padding tri
        fh = intersect_triangles_brute(scene.triangles, scene.mesh_colors,
                                       jnp.zeros((4, 3)), jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1)),
                                       jnp.full((4,), jnp.inf))
        assert not bool(jnp.any(jnp.isfinite(fh.t)))


class TestAABB:
    def test_slab_matches_reference_semantics(self):
        rng = np.random.default_rng(6)
        bmin = jnp.asarray([-1.0, -2.0, -3.0])
        bmax = jnp.asarray([1.0, 2.0, 3.0])
        o, d = random_rays(rng, 512, spread=2.0)
        inv = 1.0 / d
        hit, tmin, tmax = slab_test(bmin, bmax, jnp.asarray(o), jnp.asarray(inv), jnp.full((512,), jnp.inf))
        # reference scalar reimplementation (box.cpp:33-53)
        for i in range(64):
            t0, t1 = 0.0, np.inf
            ok = True
            for ax in range(3):
                tn = (float(bmin[ax]) - o[i, ax]) * inv[i, ax]
                tf = (float(bmax[ax]) - o[i, ax]) * inv[i, ax]
                if tn > tf:
                    tn, tf = tf, tn
                t0 = tn if tn > t0 else t0
                t1 = tf if tf < t1 else t1
                if t0 > t1:
                    ok = False
                    break
            assert bool(hit[i]) == ok, i
            if ok:
                assert abs(float(tmin[i]) - t0) < 1e-4
                assert abs(float(tmax[i]) - t1) < 1e-4

    def test_axis_parallel_ray(self):
        bmin = jnp.asarray([-1.0, -1.0, -1.0])
        bmax = jnp.asarray([1.0, 1.0, 1.0])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        inv = 1.0 / d
        hit, _, _ = slab_test(bmin, bmax, jnp.asarray([[0.5, 0.5, -3.0]]), inv, jnp.asarray([jnp.inf]))
        assert bool(hit[0])
        hit, _, _ = slab_test(bmin, bmax, jnp.asarray([[2.0, 0.5, -3.0]]), inv, jnp.asarray([jnp.inf]))
        assert not bool(hit[0])
