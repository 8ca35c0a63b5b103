"""Multi-host bootstrap helpers (parallel/multihost.py): exercised on the
8-virtual-device CPU backend — a single process standing in for the
coordinator, with mesh construction, collectives over the resulting mesh,
and initialize() idempotency all verified (SURVEY.md §5 distributed
backend; the reference has no distributed runtime at all)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from dod_raytracer_tpu.parallel import multihost


def test_global_mesh_1d():
    mesh = multihost.global_mesh()
    assert mesh.axis_names == ("dp",)
    assert mesh.shape["dp"] == len(jax.devices()) == 8


def test_global_mesh_2d_default_shape():
    # single process: hosts axis is devices/local = 1, chips axis = 8
    mesh = multihost.global_mesh(axes=("dp", "mp"))
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8
    assert mesh.shape["mp"] == jax.local_device_count()


def test_global_mesh_explicit_shape():
    mesh = multihost.global_mesh(axes=("dp", "mp"), shape=(4, 2))
    assert mesh.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        multihost.global_mesh(axes=("a", "b", "c"))


def test_mesh_carries_collectives():
    mesh = multihost.global_mesh(axes=("dp", "mp"), shape=(4, 2))

    @functools.partial(shard_map, mesh=mesh, in_specs=P("dp", "mp"),
                       out_specs=P("dp", "mp"))
    def f(x):
        return x + jax.lax.psum(x, "mp") + jax.lax.psum(x, "dp")

    x = jnp.arange(8.0).reshape(4, 2)
    out = f(x)
    expect = x + x.sum(axis=1, keepdims=True) + x.sum(axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))


def test_initialize_single_process_noop_and_idempotent():
    # On a single-process CPU backend initialize() must not raise and must
    # be safely repeatable (it guards on process_count / the env marker).
    multihost.initialize()
    multihost.initialize()
    assert multihost.is_coordinator()
    assert jax.process_count() == 1
