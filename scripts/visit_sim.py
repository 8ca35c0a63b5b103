"""Offline packet-walk visit simulator (numpy, no TPU).

Replays the packet megakernel's traversal semantics
(ops/pallas/packet_kernel.py) per 1024-ray packet on REAL wavefronts and
reports where the time model says the cost is:

  * descend steps, leaf visits, blocks processed (post-mailbox),
  * chunk folds (128-ray matmul+epilogue units — the kernel's cost unit),
  * 16-row fold-group occupancy (validates/refutes sub-chunk gating),
  * candidate-ray totals vs the PER-RAY-OPTIMAL lower bound: for each
    ray, the number of blocks whose vertex AABB its [0, t_final] segment
    enters — the irreducible per-ray test set.  packet/chunk cost over
    that bound IS the visit amplification VERDICT r4 names.

Wavefronts: bounce-k closest wavefronts are produced by simulating the
mirror integrator with the simulator's own fold results (real hits: MT
over the winning block's triangles), re-sorted per bounce with the same
key as render._sort_keys.  Shadow cones replicate shading.light_visibility's
reversed per-light sort.

Usage: python scripts/visit_sim.py [--mesh dragon] [--mp 64] [--tile-rays 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_MBOX = 8
_INF = np.inf


def build_scene(mesh="dragon", mp=64, width=1920, height=1080):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene

    cfg = Config(Width=width, Height=height, use_kdtree=True,
                 MaxPrims=mp, leaf_chunk_lanes=mp, ray_tile=16384)
    fz = _FrozenConfig.from_config(cfg)
    scene = default_scene(seed=0, cfg=cfg, mesh=mesh).build(cfg)
    return scene, fz


def center_tile_rays(fz, tile_rays):
    from dod_raytracer_tpu.render import _padded_frame_rays

    o, d, d_raw, n, tile, num_tiles = _padded_frame_rays(fz)
    o, d = np.asarray(o), np.asarray(d)
    mid = (num_tiles // 2) * tile
    return o[mid:mid + tile_rays], d[mid:mid + tile_rays]


class KD:
    def __init__(self, kd):
        self.flag = np.asarray(kd.node_flag)
        self.split = np.asarray(kd.node_split)
        self.right = np.asarray(kd.node_right)
        self.leaf_start = np.asarray(kd.node_leaf_start)
        self.leaf_lanes = np.asarray(kd.node_leaf_lanes)
        self.bmin = np.asarray(kd.bounds_min)
        self.bmax = np.asarray(kd.bounds_max)
        self.block_aabb = np.asarray(kd.block_aabb)  # (6, B)
        self.block_orig = np.asarray(kd.block_orig)  # (B, S)
        self.block_lanes = kd.block_lanes
        self.blk0 = self.leaf_start // kd.block_lanes
        self.nblk = (self.leaf_lanes + kd.block_lanes - 1) // kd.block_lanes


def mt_t(verts, o, d):
    """Möller–Trumbore t for each (ray, tri): verts (T,3,3), o/d (N,3)
    -> t (N,T) with +inf for miss (sign-agnostic accept, t>0)."""
    A, B, C = verts[:, 0], verts[:, 1], verts[:, 2]
    e1, e2 = B - A, C - A
    p = np.cross(d[:, None, :], e2[None, :, :])          # (N,T,3)
    det = np.einsum("tk,ntk->nt", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        s = o[:, None, :] - A[None, :, :]
        u = np.einsum("ntk,ntk->nt", s, p) * inv
        q = np.cross(s, e1[None, :, :])
        v = np.einsum("nk,ntk->nt", d, q) * inv
        t = np.einsum("tk,ntk->nt", e2, q) * inv
    ok = (np.abs(det) > 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    return np.where(ok, t, _INF)


def slab(bmin, bmax, o, inv):
    t0 = (bmin[None, :] - o) * inv
    t1 = (bmax[None, :] - o) * inv
    tn = np.minimum(t0, t1).max(axis=1)
    tx = np.maximum(t0, t1).min(axis=1)
    return tn, tx


def walk_packet(kd: KD, tv, o, d, clip0, act, any_hit=False):
    """Replay the kernel walk for one packet; returns (stats, t_best, prim)."""
    n = o.shape[0]
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    # root slab with tmin floored at 0 and tmax clipped (ops/aabb.slab_test)
    tn0, tx0 = slab(kd.bmin, kd.bmax, o, inv)
    tn0 = np.maximum(tn0, 0.0)
    tx0 = np.minimum(tx0, clip0)
    ok = act & (tn0 <= tx0)
    tn = np.where(ok, tn0, _INF)
    tx = np.where(ok, tx0, -_INF)
    t_best = clip0.astype(np.float64).copy()
    prim = np.full(n, -1, np.int64)
    done = ~act.copy() if any_hit else np.zeros(n, bool)

    st = dict(descend=0, leaf=0, blocks=0, chunks=0, groups16=0,
              cand_rays=0, fold_ray_slots=0)
    mbox = [-1] * _MBOX
    mcur = 0
    stack = []
    node = 0

    aabb = kd.block_aabb

    def alive():
        clip = np.minimum(t_best, clip0)
        return (~done) & ~(tx < tn) & ~(clip < tn)

    def candidates(blk):
        t0 = (aabb[0:3, blk][None, :] - o) * inv
        t1 = (aabb[3:6, blk][None, :] - o) * inv
        lo = np.minimum(t0, t1).max(axis=1)
        hi = np.maximum(t0, t1).min(axis=1)
        clip = np.minimum(t_best, clip0)
        rej = (lo > hi) | (hi <= 0) | (lo >= clip)
        return (~done) & ~rej

    def process(blk):
        nonlocal t_best, prim, done
        cand = candidates(blk)
        st["blocks"] += 1
        st["cand_rays"] += int(cand.sum())
        orig = kd.block_orig[blk]
        real = orig >= 0
        verts = tv[np.maximum(orig, 0)][real]
        oid = orig[real]
        for c in range(n // 128):
            rows = slice(c * 128, (c + 1) * 128)
            cm = cand[rows]
            if not cm.any():
                continue
            st["chunks"] += 1
            st["fold_ray_slots"] += 128
            g16 = cm.reshape(16, 8).any(axis=1)
            st["groups16"] += int(g16.sum())
            t = mt_t(verts, o[rows], d[rows])  # (128, S)
            tm = t.min(axis=1)
            im = np.where(np.isfinite(tm),
                          oid[np.argmin(t, axis=1)], -1)
            clip = np.minimum(t_best[rows], clip0[rows])
            if any_hit:
                hit = (~done[rows]) & (tm < clip)
                done[rows] |= hit
            else:
                imp = (~done[rows]) & (tm < clip)
                t_best[rows] = np.where(imp, tm, t_best[rows])
                prim[rows] = np.where(imp, im, prim[rows])

    while True:
        # pop-collapse
        while stack and not alive().any():
            node, tn, tx = stack.pop()
        if not alive().any():
            break
        f = kd.flag[node]
        if f >= 3:  # leaf
            st["leaf"] += 1
            for i in range(kd.nblk[node]):
                blk = kd.blk0[node] + i
                if any_hit and done.all():
                    break
                if blk in mbox:
                    continue
                if candidates(blk).any():
                    mbox[mcur] = blk
                    mcur = (mcur + 1) % _MBOX
                    process(blk)
            tn = np.full(n, _INF)
            tx = np.full(n, -_INF)
        else:
            st["descend"] += 1
            split = kd.split[node]
            right = kd.right[node]
            left = node + 1
            o_ax, d_ax, i_ax = o[:, f], d[:, f], inv[:, f]
            with np.errstate(invalid="ignore"):
                t_pl = (split - o_ax) * i_ax
            near_left = (o_ax < split) | ((o_ax == split) & (d_ax <= 0))
            skip_far = (t_pl > tx) | (t_pl <= 0)
            push = ~skip_far & ~(t_pl < tn)
            vis_near = skip_far | push
            vis_far = ~skip_far
            tx_near = np.where(push, t_pl, tx)
            tn_far = np.where(push, t_pl, tn)
            al = alive()

            def civ(is_near):
                sn = is_near & vis_near & al
                sf = ~is_near & vis_far & al
                tni = np.where(sn, tn, np.where(sf, tn_far, _INF))
                txi = np.where(sn, tx_near, np.where(sf, tx, -_INF))
                return tni, txi

            tnL, txL = civ(near_left)
            tnR, txR = civ(~near_left)
            clip = np.minimum(t_best, clip0)
            live = ~done
            aL = live & ~(txL < tnL) & ~(clip < tnL)
            aR = live & ~(txR < tnR) & ~(clip < tnR)
            if aL.any() and aR.any():
                either = aL | aR
                left_first = 2 * (either & near_left).sum() >= either.sum()
                if left_first:
                    stack.append((right, tnR, txR))
                    node, tn, tx = left, tnL, txL
                else:
                    stack.append((left, tnL, txL))
                    node, tn, tx = right, tnR, txR
            elif aL.any():
                node, tn, tx = left, tnL, txL
            elif aR.any():
                node, tn, tx = right, tnR, txR
            else:
                tn = np.full(n, _INF)
                tx = np.full(n, -_INF)
    return st, t_best, prim


def per_ray_optimal_blocks(kd: KD, o, d, t_final, act):
    """Lower bound: per ray, #blocks whose vertex AABB the [0, t_final]
    segment enters (vectorized over rays x blocks, batched)."""
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    B = kd.block_aabb.shape[1]
    total = 0
    bs = 4096
    a = kd.block_aabb
    for s in range(0, B, bs):
        e = min(B, s + bs)
        t0 = (a[0:3, s:e].T[None, :, :] - o[:, None, :]) * inv[:, None, :]
        t1 = (a[3:6, s:e].T[None, :, :] - o[:, None, :]) * inv[:, None, :]
        lo = np.minimum(t0, t1).max(axis=2)
        hi = np.maximum(t0, t1).min(axis=2)
        enter = (lo <= hi) & (hi > 0) & (lo < t_final[:, None]) & act[:, None]
        total += int(enter.sum())
    return total


def sort_keys_np(bmin, bmax, o, d, dir_major=False):
    """Port of render._sort_keys (origin-major default)."""
    def part1by2(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    q = np.clip((o - bmin[None, :]) / np.maximum(bmax - bmin, 1e-6)[None, :], 0, 1)
    cell = (q * 127.0).astype(np.int64)
    morton = (part1by2(cell[:, 0]) | (part1by2(cell[:, 1]) << 1)
              | (part1by2(cell[:, 2]) << 2))
    ad = np.abs(d)
    axis = ad.argmax(axis=1)
    mx = np.maximum(ad.max(axis=1), 1e-30)
    d_ax = np.take_along_axis(d, axis[:, None], 1)[:, 0]
    face = axis * 2 + (d_ax < 0)
    others = np.stack([d[:, 1], d[:, 2], d[:, 0]], 1)
    others2 = np.stack([d[:, 2], d[:, 0], d[:, 1]], 1)
    u = np.take_along_axis(others, axis[:, None], 1)[:, 0] / mx
    v = np.take_along_axis(others2, axis[:, None], 1)[:, 0] / mx
    qu = np.clip(((u + 1.0) * 3.5).astype(np.int64), 0, 7)
    qv = np.clip(((v + 1.0) * 3.5).astype(np.int64), 0, 7)
    dirbin = face * 64 + qu * 8 + qv
    key = dirbin * (1 << 21) + morton
    if not dir_major:
        key = (key & ((1 << 21) - 1)) * (1 << 9) + (key >> 21)
    return key


def run_tile(kd, tv, o, d, clip0, act, tag, any_hit=False, opt=True):
    n = o.shape[0]
    tot = dict(descend=0, leaf=0, blocks=0, chunks=0, groups16=0,
               cand_rays=0, fold_ray_slots=0)
    t_out = np.empty(n)
    p_out = np.empty(n, np.int64)
    pkts = 0
    for s in range(0, n, 1024):
        sl = slice(s, s + 1024)
        if not act[sl].any():
            continue
        pkts += 1
        st, tb, pr = walk_packet(kd, tv, o[sl], d[sl], clip0[sl], act[sl],
                                 any_hit)
        t_out[sl], p_out[sl] = tb, pr
        for k in tot:
            tot[k] += st[k]
    t_fin = np.where(np.isfinite(t_out), t_out, 20.0)
    optb = (per_ray_optimal_blocks(kd, o, d, t_fin, act) if opt else 0)
    live = int(act.sum())
    amp_slots = tot["fold_ray_slots"] / max(tot["cand_rays"], 1)
    amp_cand = tot["cand_rays"] / max(optb, 1) if opt else float("nan")
    print(f"{tag}: live={live:6d} pkts={pkts:3d} descend={tot['descend']:6d} "
          f"leaf={tot['leaf']:6d} blocks={tot['blocks']:6d} "
          f"chunks={tot['chunks']:6d} grp16={tot['groups16']:6d} "
          f"cand={tot['cand_rays']:8d} opt={optb:8d} "
          f"slot_amp={amp_slots:5.2f} cand_amp={amp_cand:5.2f} "
          f"grp_density={tot['groups16'] / max(16 * tot['chunks'], 1):4.2f}",
          flush=True)
    return t_out, p_out


# the 6 reference walls (normal, point) — main.cpp:54-103
_WALLS = [((0.0, 0.0, -1.0), (0.0, 0.0, 5.0)),
          ((0.0, 0.0, 1.0), (0.0, 0.0, -5.0)),
          ((0.0, -1.0, 0.0), (0.0, 5.0, 0.0)),
          ((0.0, 1.0, 0.0), (0.0, -5.0, 0.0)),
          ((1.0, 0.0, 0.0), (-5.0, 0.0, 0.0)),
          ((-1.0, 0.0, 0.0), (5.0, 0.0, 0.0))]


def wall_hit(o, d):
    """Closest positive wall hit (t, normal) — the family-chain clip that
    bounds every kd walk in the real pipeline (main.cpp:314-321)."""
    best_t = np.full(o.shape[0], _INF)
    best_n = np.zeros_like(o)
    for n_, p_ in _WALLS:
        n_ = np.asarray(n_)
        dn = d @ n_
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((np.asarray(p_) - o) @ n_) / dn
        upd = (np.abs(dn) > 1e-12) & (t > 1e-4) & (t < best_t)
        best_t = np.where(upd, t, best_t)
        best_n = np.where(upd[:, None], n_[None, :], best_n)
    return best_t, best_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="dragon")
    ap.add_argument("--mp", type=int, default=64)
    ap.add_argument("--tile-rays", type=int, default=16384)
    ap.add_argument("--bounces", type=int, default=6)
    ap.add_argument("--shadow-bounces", type=int, default=10)
    args = ap.parse_args()

    t0 = time.time()
    scene, fz = build_scene(args.mesh, args.mp)
    kd = KD(scene.kd)
    tv = np.asarray(scene.triangles.verts)
    lights = np.asarray(scene.lights.position)
    print(f"scene built in {time.time()-t0:.0f}s: nodes={kd.flag.shape[0]} "
          f"blocks={kd.block_aabb.shape[1]} spad={kd.block_orig.shape[1]}",
          flush=True)

    o, d = center_tile_rays(fz, args.tile_rays)
    n = o.shape[0]
    act = np.ones(n, bool)

    for k in range(args.bounces):
        t_wall, n_wall = wall_hit(o, d)
        t_b, p_b = run_tile(kd, tv, o, d, t_wall, act, f"bounce{k} closest")
        hit_mesh = act & (t_b < t_wall)
        t_hit = np.where(hit_mesh, t_b, t_wall)
        pts = o + d * np.where(act, t_hit, 0.0)[:, None]
        # shadow cones for this bounce (reversed, per light, dirbin sort
        # like shading.light_visibility's reversed branch)
        if k < args.shadow_bounces:
            for li in (0, 4):
                lp = lights[li]
                to_l = lp[None, :] - pts
                dist = np.linalg.norm(to_l, axis=1)
                ldir = to_l / np.maximum(dist, 1e-30)[:, None]
                o_r = lp[None, :] + ldir * 0.01
                d_r = -ldir
                key = sort_keys_np(kd.bmin, kd.bmax, o_r, d_r,
                                   dir_major=True) >> 21
                srt = np.argsort(np.where(act, key, 1 << 40), kind="stable")
                run_tile(kd, tv, o_r[srt], d_r[srt],
                         np.where(act, dist, -1.0)[srt], act[srt],
                         f"bounce{k} shadow L{li}", any_hit=True, opt=False)
        # mirror bounce: geometric normal of winning prim, or the wall's
        A = tv[np.maximum(p_b, 0), 0]
        e1 = tv[np.maximum(p_b, 0), 1] - A
        e2 = tv[np.maximum(p_b, 0), 2] - A
        gn = np.cross(e1, e2)
        gn /= np.maximum(np.linalg.norm(gn, axis=1), 1e-30)[:, None]
        gn = np.where((np.einsum("nk,nk->n", gn, d) > 0)[:, None], -gn, gn)
        nrm = np.where(hit_mesh[:, None], gn, n_wall)
        d_new = d - 2 * np.einsum("nk,nk->n", nrm, d)[:, None] * nrm
        o_new = pts + d_new * 1e-4
        o = np.where(act[:, None], o_new, o)
        d = np.where(act[:, None], d_new, d)
        # bounce re-sort (origin-major, live rays keep relative order)
        key = sort_keys_np(kd.bmin, kd.bmax, o, d)
        srt = np.argsort(key, kind="stable")
        o, d, act = o[srt], d[srt], act[srt]


if __name__ == "__main__":
    main()
