"""Whitted-style wavefront integrator.

TPU-native replacement for the reference's per-pixel recursion loop
(``rayTrace``, ``main.cpp:273-347``): instead of one pixel at a time through
a 10-deep bounce loop, a whole SoA wavefront of rays advances bounce-by-
bounce under ``lax.scan``, with inactive (missed) rays masked out — the
break at main.cpp:322-325 becomes a persistent active mask.

Per-bounce semantics (main.cpp:312-334), preserved exactly:
  weight  w_k = 2^-k
  final   = (1 - w_k) * final + w_k * (hit.color * lightingFactor)
  bounce  d' = reflect(d, n);  o' = hit + d' * Epsilon
and rays terminate at the first miss.

The image API tiles rays through ``lax.map`` so arbitrarily large frames
render in bounded memory; tiles are the unit later sharded across chips
(the reference's row-block threading, main.cpp:371-394, becomes data
parallelism over ray tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .camera import primary_rays
from .config import Config
from .intersect import closest_hit
from .shading import lighting_factor
from .utils.math import reflect


def _part1by2(v):
    """Spread 10 bits of v to every 3rd bit (Morton interleave helper)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _sort_keys(scene, o, d):
    """Direction-major sort key: finely binned direction, then origin
    morton — groups near-parallel rays from nearby origins into tight
    BEAMS (a packet of one spatial cluster pointing everywhere still
    sweeps the whole tree; a beam sweeps one corridor).  The wavefront
    analogue of CPU packet reordering, tuned for the packet traversal's
    shared descend.

    dir bin (9 bits): dominant face (6) x 3+3-bit in-face (u, v);
    origin (21 bits): 7-bit/axis morton of the position inside the kd
    world bounds."""
    kd = scene.kd
    if kd is not None:
        bmin, bmax = kd.bounds_min, kd.bounds_max
    else:
        bmin = jnp.full((3,), -6.0)
        bmax = jnp.full((3,), 6.0)
    q = jnp.clip((o - bmin[None, :]) / jnp.maximum(bmax - bmin, 1e-6)[None, :],
                 0.0, 1.0)
    cell = (q * 127.0).astype(jnp.int32)  # 7 bits/axis -> 21-bit morton
    morton = (_part1by2(cell[:, 0]) | (_part1by2(cell[:, 1]) << 1)
              | (_part1by2(cell[:, 2]) << 2))

    ad = jnp.abs(d)
    axis = jnp.argmax(ad, axis=1)  # dominant axis
    mx = jnp.maximum(jnp.max(ad, axis=1), 1e-30)
    d_ax = jnp.take_along_axis(d, axis[:, None], axis=1)[:, 0]
    face = axis * 2 + (d_ax < 0)  # 6 faces
    # the two minor components, in dominant-axis order
    others = jnp.stack([d[:, 1], d[:, 2], d[:, 0]], axis=1)
    others2 = jnp.stack([d[:, 2], d[:, 0], d[:, 1]], axis=1)
    u = jnp.take_along_axis(others, axis[:, None], axis=1)[:, 0] / mx
    v = jnp.take_along_axis(others2, axis[:, None], axis=1)[:, 0] / mx
    qu = jnp.clip(((u + 1.0) * 3.5).astype(jnp.int32), 0, 7)  # 3 bits
    qv = jnp.clip(((v + 1.0) * 3.5).astype(jnp.int32), 0, 7)
    dirbin = (face * 64 + qu * 8 + qv).astype(jnp.int32)  # 9 bits
    return dirbin * (1 << 21) + morton


def render_rays(scene, o, d, pixel_dirs, cfg: Config) -> jnp.ndarray:
    """Trace a wavefront of rays to final linear RGB colors (N, 3)."""
    n = o.shape[0]
    sort_bounces = getattr(cfg, "sort_bounces", None)
    if sort_bounces is None:
        from .ops.pallas.mt_kernel import on_tpu

        sort_bounces = on_tpu()
    pdirs0 = pixel_dirs

    def live_bounce(carry, k):
        if sort_bounces:
            o, d, pixel_dirs, final, active, slot_pix = carry
            # re-group the scattered wavefront (exact permutation: every
            # per-ray quantity rides along, slot_pix tracks the inverse)
            key = _sort_keys(scene, o, d)
            if not getattr(cfg, "sort_dir_major", True):
                # origin-major variant: morton high bits, dirbin low
                key = (key & ((1 << 21) - 1)) * (1 << 9) + (key >> 21)
            if getattr(cfg, "sort_kill_tail", False):
                # killed rays sort to the tail (both key variants are
                # < 2^30); trailing all-dead packets then skip via the
                # kernel's root-mask early-out (run0 == 0).  Exact: dead
                # rays are pure pass-through rows.  Trade-off: live rays
                # compact into fewer but spatially WIDER packets, which
                # can grow per-packet visit unions — measured per-scene.
                key = jnp.where(active, key, jnp.int32(1) << 30)
            _, perm = jax.lax.sort_key_val(
                key,
                jax.lax.broadcasted_iota(jnp.int32, (o.shape[0],), 0))
            o, d, pixel_dirs = o[perm], d[perm], pixel_dirs[perm]
            final, active, slot_pix = final[perm], active[perm], slot_pix[perm]
        else:
            o, d, final, active = carry
            pixel_dirs = pdirs0
        # dead rays get t_max=-1: the root slab test rejects them instantly,
        # so the lockstep traversal loops run only as long as live rays need
        t_max = jnp.where(active, jnp.inf, -1.0)
        hit = closest_hit(scene, o, d, cfg, t_max=t_max)
        active = active & hit.mask
        factor = lighting_factor(scene, hit.point, hit.normal, pixel_dirs, cfg, active)
        color = hit.color * factor[:, None]
        w = jnp.exp2(-k.astype(jnp.float32))  # main.cpp:326
        blended = (1.0 - w) * final + w * color
        final = jnp.where(active[:, None], blended, final)
        d_new = reflect(d, hit.normal)  # main.cpp:332
        o_new = hit.point + d_new * cfg.Epsilon  # main.cpp:333
        o = jnp.where(active[:, None], o_new, o)
        d = jnp.where(active[:, None], d_new, d)
        if sort_bounces:
            return (o, d, pixel_dirs, final, active, slot_pix)
        return (o, d, final, active)

    body = live_bounce
    if getattr(cfg, "remat_bounces", False):
        # recompute-not-store through the backward, EXCEPT the traversal
        # outputs (winning hit record, prim ids, shadow visibility bits),
        # which are tagged checkpoint_name('traversal') at their call
        # sites: saving those few words per ray means the VJP never
        # re-runs a kd walk or shadow traversal — the SURVEY §7 "save
        # prim-id, re-derive the rest" recipe.  Rematerialized *shading*
        # predicates can still round differently at exact decision
        # boundaries (both branches are valid a.e. subgradients there;
        # see tests/test_grad.py::test_remat_bounces_grads_identical).
        body = jax.checkpoint(
            live_bounce,
            policy=jax.checkpoint_policies.save_only_these_names("traversal"))

    if getattr(cfg, "bounce_skip", False):
        # skip the whole round once every ray in the (shard of the) tile
        # has terminated — the first-miss break of main.cpp:322-325 lifted
        # to the wavefront; a dead round is an exact identity since every
        # update above is masked by ``active``.  lax.cond (not while_loop)
        # keeps the integrator reverse-mode differentiable.  Opt-in: a big
        # win for open scenes (rays die at the first miss), near-zero for
        # the closed reference box (rays always hit a wall and live all 10
        # rounds), and the per-bounce cond noticeably slows XLA:TPU
        # compilation of the 10-round scan.
        inner = body
        act_ix = 4 if sort_bounces else 3

        def bounce(carry, k):
            return jax.lax.cond(
                jnp.any(carry[act_ix]), lambda c: inner(c, k), lambda c: c,
                carry
            ), None
    else:
        def bounce(carry, k):
            return body(carry, k), None

    # derive carry init from the (possibly shard_map-varying) ray arrays so
    # the scan carry has consistent varying-manual-axes under shard_map
    ks = jnp.arange(cfg.recursion_depth)
    if sort_bounces:
        # derive from a ray array (+ zeros) so the carry slot is VARYING
        # under shard_map like every other carry element — a bare iota is
        # unvarying while the bounce-permuted slot_pix after round 1 is
        # varying, which violates scan's carry vma-consistency
        slot_pix0 = (jnp.zeros_like(o[:, 0], dtype=jnp.int32)
                     + jax.lax.broadcasted_iota(jnp.int32, (n,), 0))
        init = (o, d, pdirs0, jnp.zeros_like(o),
                jnp.ones_like(o[:, 0], dtype=bool), slot_pix0)
        (_, _, _, final, _, slot_pix), _ = jax.lax.scan(bounce, init, ks)
        # undo the accumulated bounce permutations: slot i holds pixel
        # slot_pix[i]'s color — sort rows back into pixel order
        _, r = jax.lax.sort_key_val(slot_pix, final[:, 0])
        _, g = jax.lax.sort_key_val(slot_pix, final[:, 1])
        _, b = jax.lax.sort_key_val(slot_pix, final[:, 2])
        return jnp.stack([r, g, b], axis=1)
    init = (o, d, jnp.zeros_like(o), jnp.ones_like(o[:, 0], dtype=bool))
    (_, _, final, _), _ = jax.lax.scan(bounce, init, ks)
    return final


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_tile_jit(scene, o, d, d_raw, cfg) -> jnp.ndarray:
    return render_rays(scene, o, d, d_raw, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "tile"))
def _render_tile_at_jit(scene, o, d, d_raw, start, cfg, tile) -> jnp.ndarray:
    """Render rays [start, start+tile) of pre-generated frame rays.

    The tile slice happens ON DEVICE (lax.dynamic_slice): the host passes
    the full ray arrays by reference plus a device-resident scalar start.
    Host-side eager slicing (``o[sl]``) costs a relay round trip per slice
    on the axon runtime — 3 slices/tile turned a 6 ms device frame into an
    80 ms latency-bound one (BASELINE.md round 3).
    """
    ot = jax.lax.dynamic_slice_in_dim(o, start, tile, 0)
    dt = jax.lax.dynamic_slice_in_dim(d, start, tile, 0)
    rt = jax.lax.dynamic_slice_in_dim(d_raw, start, tile, 0)
    return render_rays(scene, ot, dt, rt, cfg)


# The axon runtime stalls when too many executions sit unblocked in the
# dispatch queue (127 in flight hangs; <=8 measured safe).
_MAX_IN_FLIGHT = 8


@jax.jit
def _tile_probe(x):
    # scalar that depends on every element of a tile's output; fetched
    # (not block_until_ready'd) to genuinely bound in-flight executions
    return jnp.sum(x)


def _auto_ray_tile(n: int) -> int:
    """Backend-tuned tile size for ray_tile=0 (auto).

    On TPU the packet kernel is work-proportional (per-1024-ray packets
    inside one pallas grid), so the XLA-level tile only sets the
    per-dispatch program size: 32768 keeps a worst-case 10-bounce tile
    program well under the TPU runtime's execution watchdog (a 262144-ray
    10-bounce program was observed to crash the worker — BASELINE.md
    round 4) while per-dispatch overhead (~0.2 ms relay) stays <1% of a
    tile.  (Retracted: the r3 "10x faster at 262144" tile sweep was
    dispatch-rate fiction.)  On CPU/GPU hosts stay small so tests and
    laptops bound their working set (the XLA path's leaf-block gather is
    ~2.4 GB at 262144 rays — an OOM on consumer GPUs).  Currently the
    same cap everywhere; kept as a function so the next honest sweep can
    re-split by backend."""
    return min(32768, n)


# Screen-block ray order: packets of 8 rows x 128 cols of pixels instead
# of row-major 1 x tile slivers.  A 1024-ray packet then covers a compact
# 8x128-pixel frustum, which shrinks the union visit set of the packet
# traversal (packet_kernel.py) — the TPU analogue of the reference's
# row-block-per-thread decomposition staying cache-local (main.cpp:371-394).
_BLOCK_H, _BLOCK_W = 8, 128


def _block_order(frozen) -> bool:
    return (getattr(frozen, "block_ray_order", True)
            and frozen.Width % _BLOCK_W == 0 and frozen.Height % _BLOCK_H == 0)


def _to_block_order(v, h: int, w: int):
    """(H*W, C) row-major -> screen-block-major (pure reshape/transpose —
    no gathers; exactly invertible by _from_block_order)."""
    c = v.shape[-1]
    v = v.reshape(h // _BLOCK_H, _BLOCK_H, w // _BLOCK_W, _BLOCK_W, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(h * w, c)


def _from_block_order(v, h: int, w: int):
    c = v.shape[-1]
    v = v.reshape(h // _BLOCK_H, w // _BLOCK_W, _BLOCK_H, _BLOCK_W, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(h * w, c)


def _padded_frame_rays(frozen):
    """Frame primary rays padded to a tile multiple: (o, d, d_raw, n, tile,
    num_tiles).  Rays are in screen-block order when the frame divides into
    8x128 pixel blocks (see _block_order); ``render_image`` inverts the
    order on the rendered colors.  Padding rays point down +z from the
    origin (any unit-ish dir works; their output rows are dropped)."""
    o, d, d_raw = primary_rays(frozen.Width, frozen.Height)
    n = o.shape[0]
    if _block_order(frozen):
        d = _to_block_order(d, frozen.Height, frozen.Width)
        d_raw = _to_block_order(d_raw, frozen.Height, frozen.Width)
    tile = min(frozen.ray_tile, n) if frozen.ray_tile else _auto_ray_tile(n)
    pad = (-n) % tile
    if pad:
        fill_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], 0)
        d = jnp.concatenate([d, fill_d], 0)
        d_raw = jnp.concatenate([d_raw, fill_d], 0)
    return o, d, d_raw, n, tile, (n + pad) // tile


def _tile_starts(num_tiles: int, tile: int):
    """Device-resident per-tile start offsets (ONE host->device transfer;
    per-dispatch scalar uploads cost ~50us each through the relay)."""
    starts = jax.device_put(np.arange(num_tiles, dtype=np.int32) * tile)
    return [starts[i] for i in range(num_tiles)]


def render_frame_tiles(scene, o, d, d_raw, starts, cfg, tile):
    """Dispatch every tile of a frame, capped in-flight; returns the list
    of per-tile color arrays (device).

    The cap is enforced by a device->host FETCH of a per-tile checksum,
    not ``block_until_ready``: on the relay runtime block_until_ready
    returns before device compute finishes (BASELINE.md measurement rule
    1), so a wait on it bounds nothing.  Every _MAX_IN_FLIGHT dispatches
    we fetch the checksum of a tile 3 back from the head; execution is
    in-order, so when that fetch returns every earlier tile has
    retired — outstanding executions stay <= _MAX_IN_FLIGHT + 3 while
    the 3 queued tiles behind the probe keep the device busy through the
    next dispatch burst (no pipeline bubble)."""
    from .utils.fetch import guarded_scalar_get

    outs = []
    for i, s in enumerate(starts):
        outs.append(_render_tile_at_jit(scene, o, d, d_raw, s, cfg, tile))
        if (i + 1) % _MAX_IN_FLIGHT == 0 and i >= 3:
            guarded_scalar_get(_tile_probe(outs[i - 3]),
                               what=f"tile {i - 3} throttle probe")
    jax.block_until_ready(outs)
    return outs


def render_image(scene, cfg: Config) -> jnp.ndarray:
    """Render the full frame to linear float RGB (H, W, 3).

    Tiles are dispatched from the host against ONE jitted per-tile
    program (all tiles share the shape, so there is a single compile and
    tiles pipeline through the device queue).  A device-side loop
    (lax.map/scan over tiles) is deliberately avoided: wrapping the
    traversal while_loop in another compiled loop explodes compile time
    and has crashed the TPU runtime at production sizes.
    """
    frozen = _FrozenConfig.from_config(cfg)
    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(frozen)
    starts = _tile_starts(num_tiles, tile)
    outs = render_frame_tiles(scene, o, d, d_raw, starts, frozen, tile)
    colors = outs[0] if num_tiles == 1 else jnp.concatenate(outs, axis=0)
    colors = colors[:n]
    if _block_order(frozen):
        colors = _from_block_order(colors, frozen.Height, frozen.Width)
    return colors.reshape(frozen.Height, frozen.Width, 3)


def quantize_u8(img: jnp.ndarray, fetch_timeout_s: float = 1800.0) -> np.ndarray:
    """clamp(c*255, 0, 255) then truncating u8 cast — toOutputChannelType
    (main.cpp:168-171) followed by glm's float->uint8 static_cast.

    The device->host fetch goes through the watchdogged path: on the
    tunneled TPU runtime a first-of-process transfer can take minutes
    (utils/fetch.py); a stall raises FetchTimeout instead of hanging."""
    from .utils.fetch import guarded_device_get

    arr = guarded_device_get(jnp.clip(img * 255.0, 0.0, 255.0),
                             timeout_s=fetch_timeout_s, what="rendered frame")
    return arr.astype(np.uint8)


class _FrozenConfig:
    """Hashable, immutable view of Config for use as a jit static arg."""

    __slots__ = ("_items",)

    def __init__(self, items: tuple):
        object.__setattr__(self, "_items", items)

    @classmethod
    def from_config(cls, cfg: Config):
        if isinstance(cfg, cls):
            return cfg
        items = tuple(sorted((k, getattr(cfg, k)) for k in cfg.__dataclass_fields__))
        return cls(items)

    def __getattr__(self, name):
        for k, v in self._items:
            if k == name:
                return v
        raise AttributeError(name)

    @property
    def Ratio(self):
        return float(self.Width) / float(self.Height)

    def __hash__(self):
        return hash(self._items)

    def __eq__(self, other):
        return isinstance(other, _FrozenConfig) and self._items == other._items
