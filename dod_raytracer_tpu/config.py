"""Typed render/runtime configuration.

TPU-native equivalent of the reference's static ``Config`` + ini loader
(``src/utils/config.h:4-38``, ``src/utils/config_loader.h:10-72``).  Same
parameter names and defaults; the ini format is the reference's
colon-separated ``Key: Value`` per line (``config.ini:1-2``).

Extensions over the reference (all new capability, not ported behavior):
render tiling, bounce depth, kd-tree lane width, and distribution knobs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    # --- reference-parity keys (src/utils/config.h:6-14 defaults) ---
    Height: int = 1080
    Width: int = 1920
    Epsilon: float = 1.0e-4
    FrustrumMax: float = 1000.0  # loaded-but-unused in the reference; kept for parity
    IntersectCost: int = 80
    TraversalCost: int = 80
    EmptyBonus: float = 0.0
    MaxPrims: int = 8  # kd-tree: max *lanes* per leaf before forced split attempt

    # --- new knobs (TPU build) ---
    recursion_depth: int = 10  # reference hardcodes 10 (src/main.cpp:301)
    # rays processed per sequential tile inside render; 0 = auto (backend-
    # tuned: big tiles on TPU — the lockstep traversal is per-iteration-
    # overhead-bound at small batches, 16k->262k tiles measured ~10x
    # frame throughput on v5e, scripts/tpu_r3.py tilesize — conservative
    # 32k elsewhere)
    ray_tile: int = 32768
    lane_size: int = 8  # triangles per kd-tree lane (reference c_triangleLaneSz)
    leaf_chunk_lanes: int = 8  # lanes intersected per traversal step
    stack_depth: int = 64  # traversal worklist depth (kdtree.cpp:279)
    use_kdtree: bool = True
    triangle_backend: str = "jnp"  # brute-force path: 'jnp' | 'pallas' | 'plucker'
    # kd traversal backend: 'auto' resolves to the packet megakernel on TPU
    # (shared scalar descend per ray tile — packet_kernel.py), else the XLA
    # wavefront loop; 'mega' on a big tree resolves to the treelet-forest
    # kernel.  All backends return identical t/hit results; packet may
    # resolve exact-t straddler ties to a different duplicate.
    traversal_backend: str = "auto"  # 'auto'|'xla'|'packet'|'binned'|'mega'|'forest'
    treelet_cap: int = 0  # forest treelet node cap (0 = kernel MAX_NODES); 128-multiple
    forest_tile: int = 0  # forest kernel rays/tile (0 = kernel TILE default)
    packet_tile: int = 0  # packet kernel rays/tile (0 = kernel TILE default, 128-mult)
    # packet fold-epilogue gating granularity: the per-chunk matmul +
    # VPU epilogue runs per group of 128/fold_groups rays, gated by
    # bit-packed candidate words computed once at DMA-enqueue time
    # (exact skip: skipped sub-chunks merge as no-improvement).  Measured
    # on v5e (scripts/tpu_r5.py foldsweep, dragon 16k 10-bounce tile):
    # fg=1 1032 ms, fg=4 736 ms, fg=8 702 ms, fg=16 761 ms — late-bounce
    # packets fold 1-2 sparse sub-chunks instead of a full 128-wide fold.
    fold_groups: int = 8  # in {1, 2, 4, 8, 16}
    # packet pending-block DMA pipeline depth (0 = kernel default 2);
    # re-sweepable because the gated folds changed the compute/DMA
    # balance the original depth-2 pin was measured under
    dma_fifo: int = 0
    # move terminated rays to the tail of every bounce re-sort (exact:
    # dead rays are pass-through rows).  Compacts live rays into fewer,
    # denser packets at the cost of spatially wider per-packet unions;
    # measured per-scene (scripts/tpu_r5.py killsweep)
    sort_kill_tail: bool = False
    # frame rays in 8x128 screen-block order (compact per-packet frustums
    # for the packet traversal); auto-disabled when W/H don't divide
    block_ray_order: bool = True
    # re-sort the wavefront every bounce by morton(origin)|octant(dir):
    # restores packet coherence after reflections scatter the rays (the
    # result is an exact permutation — bit-identical output).  None =
    # auto: ON on TPU (the packet descend depends on coherence), OFF on
    # CPU/GPU hosts (nothing there amortizes over packets).
    sort_bounces: Optional[bool] = None
    # rematerialize each bounce in the backward pass (jax.checkpoint):
    # trades a second forward sweep for not storing per-bounce residuals
    remat_bounces: bool = False
    # lax.cond-skip whole bounce rounds whose rays have all terminated:
    # exact; helps open scenes, irrelevant for the closed reference box
    bounce_skip: bool = False
    # one flattened (L*N,) any-hit walk for the whole shadow pass instead
    # of L sequential N-ray walks — bit-identical results.  None = auto:
    # ON off-CPU (the lockstep walk's real cost driver there is
    # per-iteration fixed overhead, BASELINE.md r3), OFF on CPU hosts
    # (bytes dominate; the L*N working set measured ~4x slower).
    shadow_batch_lights: Optional[bool] = None
    # sort the batched shadow wavefront per light by hit-point morton so
    # each light's rays form packet-friendly beams (exact permutation).
    # None = auto: sort only over BIG trees (>= 1024 leaf blocks).  The
    # (L*N,) key sort is a fixed per-bounce cost that pays for itself
    # only when shadow walks are expensive: measured on v5e
    # (scripts/tpu_r5.py split/knobs512), dragon 10-bounce tile 684 ms
    # sorted vs 1069 ms unsorted (keep), teapot@512 frame 3.66 s sorted
    # vs 3.37 s unsorted (drop — teapot has 38 blocks, walks are cheap).
    sort_shadow: Optional[bool] = None
    # trace shadow-ray TRIANGLE occlusion FROM the light toward the
    # surface: per-light shared-origin packets walk the tree like a
    # single ray (measured 1.6x on the 10-bounce flagship tile with
    # bit-identical output).  Identical segment in exact arithmetic; f32
    # rounding of the reversed intersection parameters can flip
    # boundary-grazing occluders (epsilon-level image deviation; zero
    # flips observed on dragon tiles).  None = auto: ON on TPU, OFF on
    # CPU/GPU (keeps host renders bit-exact vs the scalar oracle).
    shadow_reverse: Optional[bool] = None
    # small-mesh crossover: meshes with <= this many triangles bypass the
    # kd walk for the batched brute-force intersector (0 = always use the
    # tree when built); threshold measured by scripts/tpu_sweep.py
    brute_threshold: int = 0
    tri_shard_axis: str = ""  # mesh axis name when triangles are leaf-sharded
    replicate_reference_bugs: bool = False  # e.g. cylinder hit color dropped
    # bounce-sort key composition: origin-major (morton clusters, dirbin
    # minor) measured 12% faster than direction-major on the 10-bounce
    # flagship tile (chunk gating rewards origin-consecutive rays more
    # than parallel directions; scripts/tpu_r4.py section_keysweep)
    sort_dir_major: bool = False

    @property
    def Ratio(self) -> float:
        # src/utils/config.h:8 — recomputed from W/H, not independently loadable.
        return float(self.Width) / float(self.Height)

    @classmethod
    def load(cls, path: Optional[str] = None, **overrides) -> "Config":
        """Build a Config from an ini file plus keyword overrides.

        Mirrors ``Config::Load`` (``config.h:16-37``): unknown keys in the
        file are ignored with defaults retained; the file may set any subset.
        """
        cfg = cls()
        if path is not None:
            for key, value in _parse_ini(path).items():
                if not hasattr(cfg, key):
                    continue
                field_type = type(getattr(cfg, key))
                if field_type is bool:
                    setattr(cfg, key, value.strip().lower() in ("1", "true", "yes"))
                else:
                    setattr(cfg, key, field_type(value))
        for key, value in overrides.items():
            if not hasattr(cfg, key):
                raise KeyError(f"unknown config key: {key}")
            setattr(cfg, key, value)
        return cfg


def _parse_ini(path: str) -> dict:
    """Parse the reference's ``Key: Value`` format (config_loader.h:26-56).

    Lines without a colon are skipped; whitespace around key and value is
    stripped; later duplicates win.
    """
    out = {}
    with open(path, "r") as f:
        for line in f:
            if ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip()
            value = value.strip()
            if key:
                out[key] = value
    return out
