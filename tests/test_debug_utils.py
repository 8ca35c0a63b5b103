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
