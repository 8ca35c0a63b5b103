"""Tracing / profiling helpers.

The reference has no tracing at all — only printf progress markers around
the tree build (kdtree.cpp:255-257).  Here (SURVEY.md §5): named
``jax.profiler`` trace annotations around the pipeline phases
(scene-build / ray-gen / traverse / shade / backward) that show up in
xprof/tensorboard captures, plus a lightweight wall-time phase log and
rays/sec counters.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

logger = logging.getLogger("dod_raytracer_tpu")

_phase_times: dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Annotate a host-side phase: shows up in jax.profiler traces (as a
    TraceAnnotation) and accumulates wall time in ``phase_times()``."""
    import jax

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    _phase_times[name] = _phase_times.get(name, 0.0) + dt
    logger.debug("phase %s: %.3fs", name, dt)


def annotate(name: str):
    """Decorator form of ``phase`` for jitted-function call sites."""
    def wrap(fn):
        def inner(*a, **k):
            with phase(name):
                return fn(*a, **k)
        return inner
    return wrap


def phase_times() -> dict[str, float]:
    return dict(_phase_times)


def reset_phase_times() -> None:
    _phase_times.clear()


def log_render_stats(n_rays: int, seconds: float, n_casts: int | None = None) -> dict:
    """Structured rays/sec record (SURVEY.md §5 observability)."""
    stats = {
        "primary_rays": n_rays,
        "seconds": seconds,
        "primary_rays_per_sec": n_rays / seconds if seconds > 0 else float("inf"),
    }
    if n_casts is not None:
        stats["total_casts"] = n_casts
        stats["casts_per_sec"] = n_casts / seconds
    logger.info("render stats: %s", stats)
    return stats
