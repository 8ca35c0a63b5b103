"""Tests for the debug/verification harness (compare_hits, checked, assert_finite_tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.utils.debug import assert_finite_tree, checked, compare_hits


def test_compare_hits_reports():
    t_a = np.array([1.0, np.inf, 2.0, 3.0])
    t_b = np.array([1.005, 2.0, np.inf, 3.5])
    stats = compare_hits(t_a, t_b, eps=0.01, max_report=0)
    assert stats["hit_miss_mismatches"] == 2
    assert stats["t_mismatches"] == 1  # 3.0 vs 3.5


def test_checked_raises_on_nan():
    def f(x):
        return jnp.log(x)  # nan for x < 0

    g = checked(f)
    with pytest.raises(Exception):
        g(jnp.asarray([-1.0]))


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(AssertionError):
        assert_finite_tree({"a": jnp.asarray([1.0, jnp.nan])})


def test_global_mesh_shapes():
    from dod_raytracer_tpu.parallel.multihost import global_mesh

    m = global_mesh(("dp",))
    assert m.devices.size == len(jax.devices())
    m2 = global_mesh(("dp", "mp"), shape=(2, 4))
    assert m2.shape == {"dp": 2, "mp": 4}


def test_guarded_fetch_helpers():
    """guarded_device_get / guarded_scalar_get round-trip values on a
    healthy backend (the watchdog only matters on the relay runtime)."""
    from dod_raytracer_tpu.utils.fetch import guarded_device_get, guarded_scalar_get

    x = jnp.arange(12.0)
    np.testing.assert_array_equal(guarded_device_get(x, timeout_s=30.0), np.arange(12.0))
    assert float(guarded_scalar_get(jnp.float32(3.5), timeout_s=30.0)) == 3.5
    assert bool(guarded_scalar_get(jnp.isfinite(x).all(), timeout_s=30.0))


def test_auto_ray_tile_cpu():
    """ray_tile=0 resolves to a bounded CPU tile and renders identically
    to an explicit tile."""
    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.render import _auto_ray_tile
    from dod_raytracer_tpu.scene import default_scene

    assert _auto_ray_tile(10 ** 9) == 32768  # conftest forces cpu
    assert _auto_ray_tile(100) == 100
    cfg_a = Config(Width=31, Height=17, use_kdtree=False, ray_tile=0)
    cfg_b = Config(Width=31, Height=17, use_kdtree=False, ray_tile=200)
    scene = default_scene(seed=0, cfg=cfg_a, mesh=None).build(cfg_a)
    a = np.asarray(render_image(scene, cfg_a))
    b = np.asarray(render_image(scene, cfg_b))
    np.testing.assert_allclose(a, b, atol=2e-4)
