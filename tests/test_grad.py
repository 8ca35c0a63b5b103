"""Gradient correctness: analytic VJPs vs central finite differences for
every differentiable scene-parameter family (BASELINE.md target:
vertex positions, sphere params, albedo, light intensity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.grad import finite_difference, loss_and_param_grads, mse_loss, render_for_grad, sgd_step
from dod_raytracer_tpu.mesh import load_mesh_asset
from dod_raytracer_tpu.render import _FrozenConfig
from dod_raytracer_tpu.scene import SceneBuilder

W, H = 24, 24
CFG = _FrozenConfig.from_config(Config(Width=W, Height=H, use_kdtree=False, recursion_depth=3))


def small_scene():
    b = SceneBuilder()
    b.add_sphere((0.0, 0.3, 2.0), 1.1, (0.8, 0.3, 0.2))
    b.add_sphere((-1.5, -0.5, 3.5), 0.9, (0.2, 0.7, 0.3))
    b.add_plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0), (0.3, 0.3, 0.6))
    b.add_light((1.0, 3.0, -2.0), 3.0)
    b.add_light((-2.0, 2.0, 1.0), 1.5)
    return b.build(CFG)


@pytest.fixture(scope="module")
def scene_and_target():
    scene = small_scene()
    target = jnp.asarray(np.asarray(render_for_grad(scene, CFG)) * 0.8 + 0.02)
    return scene, target


def check_fd(scene, target, set_param, get_param, rtol=0.08, atol=2e-4, eps=2e-3):
    """Compare jax.grad against central differences elementwise.

    The renderer is discontinuous at silhouette/shadow edges (the reference
    forward semantics are step functions there; gradients are defined
    a.e.).  FD estimates at edge-dominated elements are O(1) noise, so we
    first filter to elements where FD is self-consistent across two step
    sizes, then demand tight agreement on that smooth subset.
    """
    def loss_of(p):
        return mse_loss(set_param(scene, p), target, CFG)

    p0 = get_param(scene)
    g = np.asarray(jax.grad(loss_of)(p0), np.float64)
    fd1 = finite_difference(loss_of, p0, eps=eps)
    fd2 = finite_difference(loss_of, p0, eps=2 * eps)
    scale = np.maximum(np.abs(fd1), np.abs(fd2))
    smooth = np.abs(fd1 - fd2) <= (atol + 0.1 * scale)
    assert smooth.mean() >= 0.5, f"only {smooth.mean():.0%} of FD elements stable"
    denom = np.maximum(np.abs(fd1), np.abs(g))
    bad = smooth & (np.abs(g - fd1) > (atol + rtol * denom))
    assert bad.sum() == 0, (
        f"{bad.sum()} smooth elements off\njax:\n{g}\nfd:\n{fd1}\nsmooth:\n{smooth}")


class TestFiniteDifference:
    def test_sphere_center(self, scene_and_target):
        scene, target = scene_and_target
        check_fd(scene, target,
                 lambda s, p: s.replace(spheres=s.spheres.replace(center=p)),
                 lambda s: s.spheres.center)

    def test_sphere_radius(self, scene_and_target):
        scene, target = scene_and_target
        check_fd(scene, target,
                 lambda s, p: s.replace(spheres=s.spheres.replace(radius=p)),
                 lambda s: s.spheres.radius)

    def test_sphere_albedo(self, scene_and_target):
        scene, target = scene_and_target
        check_fd(scene, target,
                 lambda s, p: s.replace(spheres=s.spheres.replace(color=p)),
                 lambda s: s.spheres.color, rtol=0.02, atol=1e-5)

    def test_light_intensity(self, scene_and_target):
        scene, target = scene_and_target
        check_fd(scene, target,
                 lambda s, p: s.replace(lights=s.lights.replace(intensity=p)),
                 lambda s: s.lights.intensity, rtol=0.02, atol=1e-5)

    def test_plane_albedo(self, scene_and_target):
        scene, target = scene_and_target
        check_fd(scene, target,
                 lambda s, p: s.replace(planes=s.planes.replace(color=p)),
                 lambda s: s.planes.color, rtol=0.02, atol=1e-5)


class TestMeshGrads:
    def test_vertex_positions_brute_and_kd_agree(self):
        """Vertex-position gradients through the kd-tree path must equal the
        brute-force path (same recompute; traversal is stop-grad)."""
        rng = np.random.default_rng(0)
        tris = (rng.standard_normal((64, 3, 3)) * 1.5).astype(np.float32)
        normals = np.tile(np.eye(3)[None, :, :], (64, 1, 1)).astype(np.float32)

        def build(use_kd):
            cfg = _FrozenConfig.from_config(
                Config(Width=16, Height=16, use_kdtree=use_kd, recursion_depth=2))
            b = SceneBuilder()
            b.add_mesh(tris, normals, color=(0.6, 0.5, 0.4))
            b.add_light((0.0, 2.0, -3.0), 4.0)
            return b.build(cfg), cfg

        grads = {}
        for use_kd in (False, True):
            scene, cfg = build(use_kd)
            target = jnp.zeros((16, 16, 3))

            def loss(v):
                s = scene.replace(triangles=scene.triangles.replace(verts=v))
                return mse_loss(s, target, cfg)

            grads[use_kd] = np.asarray(jax.grad(loss)(scene.triangles.verts))
        assert np.isfinite(grads[False]).all()
        assert np.abs(grads[False]).max() > 0
        np.testing.assert_allclose(grads[True], grads[False], rtol=1e-4, atol=1e-7)

    def test_vertex_fd_small(self):
        """FD check on a 2-triangle mesh (every vertex coordinate)."""
        tris = np.asarray(
            [[[-1, -1, 2], [1, -1, 2], [0, 1, 2]],
             [[-2, -1, 3], [0.5, -1, 3.2], [-0.8, 1.2, 3.1]]], np.float32)
        normals = np.tile(np.asarray([0, 0, -1], np.float32), (2, 3, 1))
        cfg = _FrozenConfig.from_config(
            Config(Width=16, Height=16, use_kdtree=False, recursion_depth=1))
        b = SceneBuilder()
        b.add_mesh(tris, normals, color=(0.7, 0.6, 0.2))
        b.add_light((0.0, 0.0, -3.0), 5.0)
        scene = b.build(cfg)
        target = jnp.zeros((16, 16, 3))

        def loss(v):
            s = scene.replace(triangles=scene.triangles.replace(verts=v))
            return mse_loss(s, target, cfg)

        g = np.asarray(jax.grad(loss)(scene.triangles.verts), np.float64)
        fd = finite_difference(loss, scene.triangles.verts, eps=2e-3)
        denom = np.maximum(np.abs(fd), np.abs(g))
        bad = np.abs(g - fd) > (3e-4 + 0.1 * denom)
        assert bad.mean() <= 0.2, f"{bad.mean():.2%}\n{g}\n{fd}"


class TestInverseRendering:
    def test_albedo_recovery_step(self, scene_and_target):
        """One SGD step on albedo+intensity reduces the loss (the
        inverse-rendering demo loop, SURVEY.md §7 PR5)."""
        scene, target = scene_and_target
        val0, grads = loss_and_param_grads(scene, target, CFG, params=("spheres", "lights"))
        scene1 = sgd_step(scene, grads, lr=0.5)
        val1, _ = loss_and_param_grads(scene1, target, CFG, params=("spheres", "lights"))
        assert float(val1) < float(val0)

    def test_grads_finite_everywhere(self, scene_and_target):
        scene, target = scene_and_target
        _, grads = loss_and_param_grads(
            scene, target, CFG,
            params=("spheres", "planes", "cylinders", "triangles", "mesh_colors", "lights"))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


def test_remat_bounces_grads_identical():
    """remat_bounces=True changes memory behavior, not semantics: values
    allclose and gradients match except on a vanishing fraction of
    borderline-silhouette elements — the VJP's rematerialized predicates
    can round differently at exact decision boundaries, where the true
    gradient is discontinuous and either branch is a valid a.e.
    subgradient."""
    import jax
    import jax.numpy as jnp

    from dod_raytracer_tpu.camera import primary_rays
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import render_rays, _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    def grad_for(remat):
        cfg = _FrozenConfig.from_config(
            Config(Width=24, Height=16, use_kdtree=True, recursion_depth=4,
                   remat_bounces=remat))
        scene = default_scene(seed=3, cfg=cfg, mesh="teapot",
                              num_spheres=4).build(cfg)
        o, d, d_raw = primary_rays(cfg.Width, cfg.Height)

        def loss(verts):
            s = scene.replace(triangles=scene.triangles.replace(verts=verts))
            return jnp.sum(render_rays(s, o, d, d_raw, cfg) ** 2)

        return jax.value_and_grad(loss)(scene.triangles.verts)

    v0, g0 = grad_for(False)
    v1, g1 = grad_for(True)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    g0, g1 = np.asarray(g0), np.asarray(g1)
    close = np.isclose(g0, g1, rtol=1e-4, atol=1e-6)
    frac_off = 1.0 - close.mean()
    assert frac_off < 1e-3, f"{frac_off:.2e} of grad elements differ"
    # and the ones that differ are genuinely borderline-small in aggregate
    assert np.abs(g0 - g1).sum() / max(np.abs(g0).sum(), 1e-9) < 1e-3
