"""Inverse-rendering training loop (optax) with checkpoint/resume.

The end-to-end consumer of the gradient machinery (BASELINE.json configs
3-4: recover albedo/light, then vertex positions, from target images).
Single-device here; the distributed variant wraps the same loss with
shard_map (parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .grad import merge_params, mse_loss, split_float_params
from .render import _FrozenConfig
from .utils.fetch import FetchTimeout, guarded_device_get


@dataclasses.dataclass
class TrainState:
    scene: object
    opt_state: object
    step: int = 0


def make_optimizer(lr: float = 0.05) -> optax.GradientTransformation:
    return optax.adam(lr)


def make_update_fn(cfg, params: Sequence[str], optimizer,
                   loss_fn: Optional[Callable] = None):
    """jitted (scene, opt_state, target) -> (loss, scene, opt_state)."""
    frozen = _FrozenConfig.from_config(cfg)
    loss_fn = loss_fn or (lambda scene, target: mse_loss(scene, target, frozen))

    @jax.jit
    def update(scene, opt_state, target):
        diff = split_float_params(scene, params)

        def f(diff):
            return loss_fn(merge_params(scene, diff), target)

        loss, grads = jax.value_and_grad(f)(diff)
        updates, opt_state = optimizer.update(grads, opt_state, diff)
        diff = optax.apply_updates(diff, updates)
        return loss, merge_params(scene, diff), opt_state

    return update


def fit(scene, target, cfg, params: Sequence[str] = ("spheres", "lights"),
        steps: int = 100, lr: float = 0.05,
        checkpoint_path: Optional[str] = None, checkpoint_every: int = 25,
        log_every: int = 10, verbose: bool = True):
    """Run inverse rendering; returns (scene, losses)."""
    optimizer = make_optimizer(lr)
    diff0 = split_float_params(scene, params)
    opt_state = optimizer.init(diff0)
    start_step = 0

    if checkpoint_path is not None:
        import os

        from .checkpoint import restore_scene_params

        if os.path.exists(checkpoint_path):
            scene, opt_state_r, start_step = restore_scene_params(
                checkpoint_path, scene, params=params, opt_state_template=opt_state)
            if opt_state_r is not None:
                opt_state = opt_state_r
            start_step = start_step or 0

    update = make_update_fn(cfg, params, optimizer)
    losses = []  # device scalars until the final batched fetch
    log_ok = True
    for step in range(start_step, steps):
        loss, scene, opt_state = update(scene, opt_state, target)
        losses.append(loss)
        if verbose and log_ok and (step % log_every == 0 or step == steps - 1):
            # per-step scalar fetches stall on hostile transfer paths
            # (utils/fetch.py); degrade to silent after the first stall
            # instead of hanging the loop
            try:
                v = float(guarded_device_get(loss, timeout_s=15.0,
                                             what="loss scalar"))
                print(f"step {step}: loss {v:.6e}")
            except FetchTimeout:
                log_ok = False
                print("step-loss fetches stalling; logging disabled "
                      "(losses still returned at the end)")
        if checkpoint_path is not None and (step + 1) % checkpoint_every == 0:
            from .checkpoint import save_scene_params

            save_scene_params(checkpoint_path, scene, params=params,
                              step=step + 1, opt_state=opt_state)
    if losses:
        host = guarded_device_get(jnp.stack(losses), what="loss history")
        losses = [float(v) for v in host]
    return scene, losses
