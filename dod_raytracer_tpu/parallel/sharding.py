"""Multi-chip / multi-host distribution.

The reference's entire parallelism story is row-block data parallelism over
``get_nprocs()`` pthreads with a shared framebuffer (``main.cpp:371-394``).
The TPU-native equivalent: a ``jax.sharding.Mesh`` over all chips, primary
rays sharded along a ``'dp'`` axis (tiles of pixels instead of row blocks),
scene tensors replicated in HBM (teapot ~0.5 MB, dragon ~60 MB — both fit
replicated, SURVEY.md §5), and scene-parameter gradients all-reduced with
``psum`` inside ``shard_map``.

Collective/compute overlap: the psums are emitted INSIDE the shard_map'd
backward, per parameter, so XLA's latency-hiding scheduler is free to run
each all-reduce concurrently with the remaining backward sweep — but this
environment has a single physical chip, so the overlap cannot be profiled
here and is NOT claimed as measured (BASELINE.md records this).  What is
verified: sharded-vs-single numerical invariance (tests/test_sharding.py)
and the full multi-device step executing on an 8-device mesh.

Multi-host: the same code runs under ``jax.distributed.initialize`` — the
mesh spans all processes' devices and shard_map only touches the local
shard; DP gradient sync rides ICI within a host and DCN across hosts.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import primary_rays
from ..render import render_rays, _FrozenConfig


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _pad_to(x, multiple):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        fill = jnp.tile(x[-1:], (pad,) + (1,) * (x.ndim - 1))
        x = jnp.concatenate([x, fill], axis=0)
    return x, pad


def render_image_sharded(scene, cfg, mesh: Mesh, axis: str = "dp"):
    """Data-parallel full-frame render: rays sharded, scene replicated."""
    frozen = _FrozenConfig.from_config(cfg)
    o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
    n = o.shape[0]
    ndev = mesh.shape[axis]
    o, _ = _pad_to(o, ndev)
    d, _ = _pad_to(d, ndev)
    d_raw, _ = _pad_to(d_raw, ndev)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def shard_render(scene, o, d, d_raw):
        return render_rays(scene, o, d, d_raw, frozen)

    colors = shard_render(scene, o, d, d_raw)
    return colors[:n].reshape(frozen.Height, frozen.Width, 3)


def make_train_step(cfg, mesh: Mesh, params: Sequence[str] = ("spheres", "lights"),
                    axis: str = "dp", lr: float = 0.1):
    """Build the jitted distributed inverse-rendering step.

    Each device renders its ray shard, computes the local pixel loss
    against its target shard, backprops to the selected scene parameters,
    and ``psum``s the gradients across the mesh — the DP gradient
    all-reduce overlapped with the backward sweep (BASELINE north star).
    Returns ``step(scene, target_flat) -> (loss, new_scene)`` where
    ``target_flat`` is the (H*W, 3) target image.
    """
    frozen = _FrozenConfig.from_config(cfg)
    ndev = mesh.shape[axis]

    from ..grad import merge_params, sgd_step, split_float_params

    def local_loss(diff, scene, o, d, d_raw, target):
        scene = merge_params(scene, diff)
        colors = render_rays(scene, o, d, d_raw, frozen)
        # mean over the *global* pixel count: local sum / global N
        return jnp.sum((colors - target) ** 2) / (target.size * ndev)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def grad_shard(scene, o, d, d_raw, target):
        diff = split_float_params(scene, params)
        loss, grads = jax.value_and_grad(local_loss)(diff, scene, o, d, d_raw, target)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)
        return loss, grads

    @jax.jit
    def step(scene, target_flat):
        o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
        o, _ = _pad_to(o, ndev)
        d, _ = _pad_to(d, ndev)
        d_raw, _ = _pad_to(d_raw, ndev)
        target, _ = _pad_to(target_flat, ndev)
        loss, grads = grad_shard(scene, o, d, d_raw, target)
        return loss, sgd_step(scene, grads, lr)

    return step


def replicate_scene(scene, mesh: Mesh):
    """Place every scene tensor replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)
