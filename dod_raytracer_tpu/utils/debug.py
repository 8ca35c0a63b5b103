"""Debug & numerical-guard utilities.

* ``compare_hits`` — the reference's ``compareHitRecords`` diff harness
  (main.cpp:246-271) for batches: reports hit/miss disagreements and
  t-mismatches (same eps=0.01 default) between two hit sets, keyed by ray
  index.  Used when cross-checking kernel backends.
* ``checked`` — wrap a function with jax.experimental.checkify to surface
  NaN/inf and out-of-bounds indexing as errors instead of garbage
  (SURVEY.md §5: the race/sanitizer story — JAX purity removes data races
  by construction; this covers numerical faults).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compare_hits(t_a, t_b, eps: float = 0.01, max_report: int = 20, label_a="A", label_b="B"):
    """Compare two per-ray hit distances (+inf = miss).  Returns a dict of
    mismatch stats and prints up to ``max_report`` diagnostics
    (compareHitRecords semantics, main.cpp:246-271)."""
    t_a = np.asarray(t_a)
    t_b = np.asarray(t_b)
    hit_a = np.isfinite(t_a)
    hit_b = np.isfinite(t_b)
    miss_mismatch = np.nonzero(hit_a ^ hit_b)[0]
    both = hit_a & hit_b
    t_mismatch = np.nonzero(both & (np.abs(t_a - t_b) > eps))[0]
    for i in miss_mismatch[:max_report]:
        a, b = ("HIT", "MISS") if hit_a[i] else ("MISS", "HIT")
        print(f"({i:6d}) - {label_a} {a} - {label_b} {b}")
    for i in t_mismatch[:max_report]:
        print(f"({i:6d}) - T mismatch -- {label_a}: {t_a[i]:f}, {label_b}: {t_b[i]:f}")
    return {
        "rays": t_a.shape[0],
        "hit_miss_mismatches": int(miss_mismatch.size),
        "t_mismatches": int(t_mismatch.size),
    }


def checked(fn, *, check_nans: bool = True, check_oob: bool = True):
    """Return (checked_fn) raising on NaN/inf or OOB indexing inside jit."""
    from jax.experimental import checkify

    errors = set()
    if check_nans:
        errors |= checkify.float_checks
    if check_oob:
        errors |= checkify.index_checks

    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise AssertionError(
                f"{name}{jax.tree_util.keystr(path)} contains "
                f"{np.isnan(arr).sum()} NaN / {np.isinf(arr).sum()} inf values")
