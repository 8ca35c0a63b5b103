"""Multi-host runtime bootstrap.

The reference has no distributed communication at all (pthreads over
shared memory, SURVEY.md §2 #19); this is the TPU-native replacement:
``jax.distributed`` process group + a device mesh spanning all hosts.
Collectives ride ICI within a host and DCN across hosts; the render/train
code (sharding.py, leaf_shard.py) is topology-agnostic — it just sees a
bigger mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Start the jax.distributed runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-bootstrap
    (GCE metadata / megascale env vars); arguments mirror
    ``jax.distributed.initialize`` for manual clusters.
    """
    if jax.process_count() > 1 or os.environ.get("_DOD_RT_DIST_INIT"):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        os.environ["_DOD_RT_DIST_INIT"] = "1"
    except (RuntimeError, ValueError):
        pass  # single-process run


def global_mesh(axes: Sequence[str] = ("dp",), shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL processes' devices.

    Default: 1D 'dp' over every chip.  Pass axes=('dp','mp') with a shape
    (or None to put hosts on dp and local chips on mp — rays sharded
    across hosts over DCN, triangles leaf-sharded within a host over ICI).
    """
    devs = np.asarray(jax.devices())
    if shape is None:
        if len(axes) == 1:
            shape = (devs.size,)
        elif len(axes) == 2:
            local = jax.local_device_count()
            shape = (devs.size // local, local)
        else:
            raise ValueError("provide an explicit shape for >2 axes")
    return Mesh(devs.reshape(tuple(shape)), tuple(axes))


def is_coordinator() -> bool:
    return jax.process_index() == 0
