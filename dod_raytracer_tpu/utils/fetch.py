"""Watchdogged device->host transfers for hostile transfer paths.

On the tunneled TPU runtime this repo benches on, dispatch and
``block_until_ready`` are fast but the *transfer* path is pathological:
the first device->host fetch of a process takes minutes to initialize and
tiny (scalar) fetches can stall indefinitely, while ~100 KB+ array
fetches eventually complete (BASELINE.md round-3 "relay-runtime
hazards").  Library code that must materialize results on the host (PNG
write, checksums) goes through :func:`guarded_device_get` so a stalled
transfer degrades into a diagnosable timeout instead of a silent hang.

On healthy runtimes (CPU, normal TPU) the watchdog never fires and the
only cost is one thread spawn per call.
"""

from __future__ import annotations

import threading

import numpy as np


class FetchTimeout(TimeoutError):
    """Device->host transfer did not complete within the deadline."""


def guarded_device_get(x, timeout_s: float = 600.0, what: str = "array"):
    """``np.asarray(x)`` bounded in wall time.

    Runs the transfer on a daemon thread and joins with ``timeout_s``.
    Returns the host array, or raises :class:`FetchTimeout` if the
    transfer path stalled (the daemon thread is left behind; it holds no
    locks the caller needs).  Any exception raised by the transfer is
    re-raised in the caller.
    """
    result: dict = {}

    def worker():
        try:
            result["ok"] = np.asarray(x)
        except BaseException as e:  # pragma: no cover - backend-specific
            result["err"] = e

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    th.join(timeout_s)
    if "ok" in result:
        return result["ok"]
    if "err" in result:
        raise result["err"]
    raise FetchTimeout(
        f"device->host fetch of {what} did not complete in {timeout_s:.0f}s "
        "(transfer path stalled; compute already finished — retry with a "
        "longer timeout or fetch a larger batch first)")


def guarded_scalar_get(x, timeout_s: float = 600.0, what: str = "scalar"):
    """Fetch a device scalar through the stall-resistant path.

    The relay runtime stalls on tiny transfers while ~100 KB+ fetches
    complete, so the scalar is broadcast on device to a >=256 KB array
    and one element of the host copy is returned.  Sub-4-byte dtypes
    (bool, i8/16, f16/bf16) are widened to f32 first so the broadcast
    clears the ~100 KB stall threshold; >=4-byte dtypes keep their own
    dtype end-to-end — an i32/i64 counter above 2^24 would be silently
    truncated by an f32 round-trip.
    """
    import jax
    import jax.numpy as jnp

    dt = jnp.asarray(x).dtype
    carrier = dt if dt.itemsize >= 4 else jnp.float32
    arr = jax.jit(lambda s: jnp.broadcast_to(
        jnp.asarray(s).astype(carrier), (65536,)))(x)
    host = guarded_device_get(arr, timeout_s=timeout_s, what=what)
    return x.dtype.type(host[0]) if hasattr(x, "dtype") else host[0]
