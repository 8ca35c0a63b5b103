"""Pallas TPU packet megakernel: shared (per-tile) kd descend, per-ray masks.

The per-ray wavefront walks (ops/traverse.py XLA walk, traverse_kernel.py
megakernel) pay their cost in per-ray *data-dependent node state*: every
interior step needs each ray's node row, which on TPU is either an XLA HBM
row gather (~200us/step at 16k rays) or an O(TILE x M) one-hot MXU matmul,
and every stack op is a one-hot masked select over (depth, TILE) arrays.

This kernel exploits wavefront coherence instead — the TPU-native analogue
of CPU packet tracing (the reference is itself an 8-wide packet tracer
over primitives, sphere.cpp:26-160).  A whole ray tile traverses the tree
TOGETHER with ONE scalar node cursor and ONE scalar stack pointer:

  * the node fetch is a scalar SMEM read (no gather, no one-hot matmul);
  * stack pushes/pops are dynamic-slice writes at a scalar index
    (nstack[sp] = node / tn_stack[sp] = vec) — no one-hot selects;
  * per-ray divergence is carried as (TR//128, 128) interval vectors
    [tn, tx] — full-width VPU registers (the per-ray walks' (TILE, 1)
    state uses 1 of 128 lanes);
  * a leaf block is pre-screened against its VERTEX AABB (tighter than
    the kd cell; 6 scalar SMEM reads + ~20 VPU ops) and only then pays
    the HBM DMA + (TR,16)x(16,5*Spad) Plücker MXU matmul;
  * block DMAs run through a 2-slot pending pipeline: a block's transfer
    overlaps the PREVIOUS block's matmul/fold and any descend steps in
    between, so DMA latency is hidden behind compute.

Visit-set semantics: the packet visits the UNION of the nodes its rays
would visit individually (a ray's segment-vs-cell overlap decides its
per-child interval exactly as kdtree.cpp:312-319).  Visiting a superset of
leaves per ray cannot change the closest hit — every accepted candidate is
a real intersection with t in (0, clip), and min over a superset of the
pruning-correct set is the same min (kd pruning only ever excludes leaves
that cannot contain closer hits).  What CAN differ from the strictly
near-to-far per-ray walk is the winner among EXACTLY-equal t values
(duplicated straddler lanes resolve to the first-visited copy,
kdtree.cpp:334-344); tests accept prim flips only where both candidates'
t agree exactly (tests/test_packet.py).

Any-hit mode keeps full blocking semantics (blocked iff ANY triangle hits
strictly before t_max); rays stop accumulating once hit, and the walk
drains as soon as no live ray remains.

NaN edges (split == o_ax with inv_ax = +-inf => t_plane = NaN) are handled
conservatively: every interval/AABB test is written so NaN keeps the ray
alive and the block processed — a superset of the reference's visit set,
never a subset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")

TILE = 1024  # rays per packet: per-ray state is (TILE//128, 128) = full vregs
_MBOX = 8  # recently-processed-block mailbox ring (straddler dedup).
# Measured on the d10 flagship tile: 16 entries is a wash (719 vs
# 702-714 ms) — the 8-ring already catches the adjacent-leaf dups.
_FIFO = 2  # pending-block DMA pipeline depth (slots).  Measured on the
# 10-bounce flagship tile: depth 4 is ~4% SLOWER than 2 (block DMA is
# already hidden behind one fold interval; deeper rings only add scalar
# ring bookkeeping per enqueue) — keep 2.


def _kernel(flag_s, split_s, right_s, blk0_s, nblk_s, aabb_s,
            o_ref, d_ref, invd_ref, tmin_ref, tmax_ref, clip_ref, act_ref,
            rays_ref, g_hbm, orig_hbm,
            t_ref, prim_ref, found_ref,
            tn_ref, tx_ref, done_ref, nstack_s, tn_stk, tx_stk,
            mbox_s, pfifo_s, pwords_s, g_vmem, orig_vmem, sem_g, sem_o,
            *, spad: int, stack_depth: int, any_hit: bool, r8: int,
            fold_groups: int, fifo: int = _FIFO):
    r16 = rays_ref[:]                   # (TR, 16) Plücker rows
    clip0 = clip_ref[:]                 # per-ray t_max (R8, 128)
    act0 = act_ref[:] != 0
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    ivx, ivy, ivz = invd_ref[0], invd_ref[1], invd_ref[2]

    # ---- init persistent per-ray state ----
    t_ref[:] = clip0                    # t_best starts at the clip
    prim_ref[:] = jnp.full((r8, 128), -1, jnp.int32)
    found_ref[:] = jnp.zeros((r8, 128), jnp.int32)
    done_ref[:] = (~act0).astype(jnp.int32)
    tn_ref[:] = tmin_ref[:]
    tx_ref[:] = tmax_ref[:]
    for i in range(_MBOX):
        mbox_s[i] = jnp.int32(-1)
    mbox_s[_MBOX] = jnp.int32(0)  # ring insert cursor

    # packet mean origin (one-time reduces): the interior near-first vote
    # is a pure scalar comparison against this instead of a per-node
    # majority reduce (ordering is a heuristic; any order is correct)
    inv_n = 1.0 / (r8 * 128)
    o_mean = (jnp.sum(ox) * inv_n, jnp.sum(oy) * inv_n, jnp.sum(oz) * inv_n)
    gsz = 128 // fold_groups      # rays per gated fold sub-chunk
    nwords = -(-r8 * fold_groups // 32)  # bit-packed gate words per block

    def alive_mask():
        """Rays whose current interval may still contain a closer hit.
        NaN-conservative: every comparison keeps NaN rays alive."""
        tn = tn_ref[:]
        clip = jnp.minimum(t_ref[:], clip0)
        return (done_ref[:] == 0) & ~(tx_ref[:] < tn) & ~(clip < tn)

    def axis_of(v_ref, axis):
        return jax.lax.switch(axis, [lambda: v_ref[0], lambda: v_ref[1],
                                     lambda: v_ref[2]])

    # ---------------- pending-block DMA pipeline ----------------
    def dma_pair(blk, slot):
        return (pltpu.make_async_copy(g_hbm.at[blk], g_vmem.at[slot],
                                      sem_g.at[slot]),
                pltpu.make_async_copy(orig_hbm.at[blk], orig_vmem.at[slot],
                                      sem_o.at[slot]))

    def block_candidates(blk):
        """(R8, 128) bool: rays whose [0+, clip] segment touches the
        block's vertex AABB and are not done.  EXACT superset of rays
        that could fold an improvement from this block: a real hit with
        t < clip lies inside the AABB, so its segment intersects it.
        NaN-conservative (NaN compares false -> kept)."""
        t0x = (aabb_s[0, blk] - ox) * ivx
        t1x = (aabb_s[3, blk] - ox) * ivx
        t0y = (aabb_s[1, blk] - oy) * ivy
        t1y = (aabb_s[4, blk] - oy) * ivy
        t0z = (aabb_s[2, blk] - oz) * ivz
        t1z = (aabb_s[5, blk] - oz) * ivz
        tlo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                      jnp.minimum(t0y, t1y)),
                          jnp.minimum(t0z, t1z))
        thi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.maximum(t0z, t1z))
        clip = jnp.minimum(t_ref[:], clip0)
        rejected = (tlo > thi) | (thi <= 0.0) | (tlo >= clip)
        return (done_ref[:] == 0) & ~rejected

    def candidate_words(blk):
        """Bit-packed (chunk, group) candidate gates: per-group
        lane-reduces give (r8, 1) any-bits (pure vector work), each
        (c, g) gate gets a distinct power-of-two weight, and the sum of
        distinct powers of two IS the bitwise-or (no carries) — ONE
        vector->scalar sync per 32 gate bits instead of one per chunk.
        Computed once at enqueue time; t_best only tightens afterwards,
        so the stored gates are a superset of the process-time candidate
        set and gating with them is exact."""
        cand = block_candidates(blk)    # (R8, 128)
        row_ix = jax.lax.broadcasted_iota(jnp.int32, (r8, 1), 0)
        words = []
        for w in range(nwords):
            acc = None
            for g in range(fold_groups):
                ga = jnp.any(cand[:, g * gsz:(g + 1) * gsz], axis=1,
                             keepdims=True)          # (r8, 1) lane-reduce
                bit = row_ix * fold_groups + g
                inw = (bit // 32) == w
                # 1 << 31 wraps to int32 min via the vector shift — the
                # scalar bit test below is shift+mask, sign-agnostic
                wgt = jnp.where(ga & inw,
                                jnp.left_shift(jnp.int32(1), bit % 32), 0)
                acc = wgt if acc is None else acc + wgt
            words.append(jnp.sum(acc))               # the ONE sync
        return words

    def process(blk, slot):
        """Wait the slot's DMA and fold the block into the per-ray state,
        sub-chunk by sub-chunk: the VPU epilogue (sign ladder, divide,
        min/argmin — the 9x-the-matmul cost, BASELINE.md speed-of-light
        table) runs per GROUP of 128/fold_groups matmul rows, gated by
        the bit-packed candidate words stored at enqueue time — zero
        vector->scalar syncs here.  With the beam-sorted wavefront an
        incoherent late-bounce packet pays 1-2 sub-chunks instead of a
        full 128-wide fold per visit; skipped sub-chunks merge as +inf
        (no improvement), which is exact."""
        cg, co = dma_pair(blk, slot)
        cg.wait()
        co.wait()
        orig = orig_vmem[slot, 0]       # (Spad,) i32

        def fold_sub(c, g):
            """Matmul + epilogue for rays [c*128 + g*gsz, +gsz), merged
            into this sub-chunk's lanes of the per-ray state."""
            r0 = c * 128 + g * gsz
            out = jnp.dot(r16[r0:r0 + gsz, :], g_vmem[slot],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            s0 = out[:, 0 * spad:1 * spad]
            s1 = out[:, 1 * spad:2 * spad]
            s2 = out[:, 2 * spad:3 * spad]
            den = out[:, 3 * spad:4 * spad]
            num = out[:, 4 * spad:5 * spad]
            # same-strict-sign via min/max: lo>0 <=> all sides >0,
            # hi<0 <=> all <0 — exactly (pos|neg) of the reference
            # ladder.  No den!=0 / orig-mask passes needed: empty
            # lanes have all-zero Plücker columns (lo=hi=0 ->
            # invalid) and den==0 yields inf/NaN t which the strict
            # (t>0, t<clip) folds reject.
            lo = jnp.minimum(jnp.minimum(s0, s1), s2)
            hi = jnp.maximum(jnp.maximum(s0, s1), s2)
            valid = (lo > 0.0) | (hi < 0.0)
            t = num / den
            tq = jnp.where(valid & (t > 0.0), t, _INF)
            tmin = jnp.min(tq, axis=1, keepdims=True)   # (gsz, 1)
            tm = tmin.reshape(1, gsz)
            lsl = slice(g * gsz, (g + 1) * gsz)  # this sub-chunk's lanes
            row = t_ref[c:c + 1, lsl]
            clip = jnp.minimum(row, clip0[c:c + 1, lsl])

            if any_hit:
                # shadows need only "any t strictly inside (0, clip)"
                # == "min t < clip" — no argmin
                hit = (done_ref[c:c + 1, lsl] == 0) & (tm < clip)
                found_ref[c:c + 1, lsl] = (found_ref[c:c + 1, lsl]
                                           | hit.astype(jnp.int32))
                done_ref[c:c + 1, lsl] = (done_ref[c:c + 1, lsl]
                                          | hit.astype(jnp.int32))
                return

            # equal-t ties break to the smallest original prim id
            # (the per-ray walks break by visit order; flips are
            # only possible at EXACTLY equal t — the tolerance
            # the straddler-duplicate semantics already grant)
            ob = jnp.broadcast_to(orig[None, :], tq.shape)
            im = jnp.min(jnp.where(tq == tmin, ob, 2**30),
                         axis=1, keepdims=True).reshape(1, gsz)
            improved = (done_ref[c:c + 1, lsl] == 0) & (tm < clip)
            t_ref[c:c + 1, lsl] = jnp.where(improved, tm, row)
            prim_ref[c:c + 1, lsl] = jnp.where(
                improved, im, prim_ref[c:c + 1, lsl])
            found_ref[c:c + 1, lsl] = (found_ref[c:c + 1, lsl]
                                       | improved.astype(jnp.int32))

        words = [pwords_s[slot, w] for w in range(nwords)]  # scalar reads
        for c in range(r8):
            for g in range(fold_groups):
                bit = c * fold_groups + g
                gate = (words[bit // 32] >> (bit % 32)) & 1

                @pl.when(gate != 0)
                def _(c=c, g=g):
                    fold_sub(c, g)

    def block_seen(blk):
        """Mailbox test (pure scalar ops): duplicated straddler lanes put
        the same block in many leaves (kdtree.cpp:229-244); a block
        tested once this walk cannot fold anything new (same candidates,
        clip only tightens), so a small ring of recently-processed block
        ids skips retests — exact."""
        seen = mbox_s[0] == blk
        for i in range(1, _MBOX):
            seen = seen | (mbox_s[i] == blk)
        return seen

    def mbox_insert(blk):
        cur = mbox_s[_MBOX]
        mbox_s[cur] = blk
        mbox_s[_MBOX] = jax.lax.rem(cur + 1, _MBOX)

    def leaf_fn(node, count, head):
        """Queue this leaf's surviving blocks through the pending-FIFO
        pipeline: start each block's DMA into a free slot; when the ring
        is full, process the OLDEST block (whose transfer has had up to
        fifo-1 process intervals to land)."""
        blk0 = blk0_s[node]
        nb = nblk_s[node]

        def blk_cond(c):
            i, _, _, live = c
            return (i < nb) & (live != 0)

        def blk_body(c):
            i, count, head, _ = c
            blk = blk0 + i

            def check_enqueue(args):
                count, head = args
                # nwords vector->scalar syncs: the block's only ones —
                # they double as the pre-DMA prune AND the stored
                # per-sub-chunk fold gates
                words = candidate_words(blk)
                wanted = words[0]
                for w in words[1:]:
                    wanted = wanted | w

                def enqueue(args2):
                    count, head = args2

                    @pl.when(count == fifo)
                    def _():
                        process(pfifo_s[head], head)

                    count2 = jnp.where(count == fifo, fifo - 1, count)
                    head2 = jnp.where(count == fifo,
                                      jax.lax.rem(head + 1, fifo), head)
                    slot = jax.lax.rem(head2 + count2, fifo)
                    cg, co = dma_pair(blk, slot)
                    cg.start()
                    co.start()
                    mbox_insert(blk)
                    pfifo_s[slot] = blk
                    for w in range(nwords):
                        pwords_s[slot, w] = words[w]
                    return count2 + 1, head2

                return jax.lax.cond(wanted != 0, enqueue, lambda a: a,
                                    (count, head))

            count, head = jax.lax.cond(
                ~block_seen(blk), check_enqueue, lambda a: a, (count, head))
            live = (jnp.any(done_ref[:] == 0).astype(jnp.int32)
                    if any_hit else jnp.int32(1))
            return i + 1, count, head, live

        _, count, head, _ = jax.lax.while_loop(
            blk_cond, blk_body, (jnp.int32(0), count, head, jnp.int32(1)))
        # cell consumed: empty the interval; the pop-collapse advances us
        tn_ref[:] = jnp.full((r8, 128), _INF, jnp.float32)
        tx_ref[:] = jnp.full((r8, 128), -_INF, jnp.float32)
        return count, head

    # ---------------- interior: one shared descend step ----------------
    def interior_fn(node, sp, alive):
        flag = flag_s[node]
        split = split_s[node]
        right = right_s[node]
        left = node + 1
        tn = tn_ref[:]
        tx = tx_ref[:]

        o_ax = axis_of(o_ref, flag)
        d_ax = axis_of(d_ref, flag)
        inv_ax = axis_of(invd_ref, flag)
        t_plane = (split - o_ax) * inv_ax
        near_is_left = (o_ax < split) | ((o_ax == split) & (d_ax <= 0.0))

        # per-ray far/near skip rules (kdtree.cpp:312-319)
        skip_far = (t_plane > tx) | (t_plane <= 0.0)
        push = ~skip_far & ~(t_plane < tn)
        vis_near = skip_far | push
        vis_far = ~skip_far
        tn_near = tn
        tx_near = jnp.where(push, t_plane, tx)
        tn_far = jnp.where(push, t_plane, tn)
        tx_far = tx

        def child_iv(is_this_near):
            sel_n = is_this_near & vis_near & alive
            sel_f = ~is_this_near & vis_far & alive
            tni = jnp.where(sel_n, tn_near, jnp.where(sel_f, tn_far, _INF))
            txi = jnp.where(sel_n, tx_near, jnp.where(sel_f, tx_far, -_INF))
            return tni, txi

        tnL, txL = child_iv(near_is_left)
        tnR, txR = child_iv(~near_is_left)

        clip = jnp.minimum(t_ref[:], clip0)
        live = done_ref[:] == 0
        aliveL = live & ~(txL < tnL) & ~(clip < tnL)
        aliveR = live & ~(txR < tnR) & ~(clip < tnR)
        # ONE packed scalar reduce instead of four (each vector->scalar
        # sync costs ~0.3-0.5 us and this runs per interior node):
        # s1 packs [nl | nr<<15]; counts <= tile fit 15 bits (asserted at
        # trace time).  The near-first ordering vote uses the packet's
        # precomputed mean origin vs the split plane — a pure scalar
        # comparison.  Ordering is a termination heuristic only (any
        # order is correct; equal-t ties break by prim id, not visit
        # order), so the cheaper vote cannot change results.
        assert r8 * 128 < (1 << 15), "packed descend counters overflow"
        s1 = jnp.sum(aliveL.astype(jnp.int32)
                     + (aliveR.astype(jnp.int32) << 15))
        nl = s1 & ((1 << 15) - 1)
        nr = s1 >> 15
        o_mean_ax = jax.lax.switch(flag, [lambda: o_mean[0],
                                          lambda: o_mean[1],
                                          lambda: o_mean[2]])
        left_first = o_mean_ax < split

        def both(_):
            def push_second(second, tns, txs, first, tnf, txf):
                # overflow (possible only when the kd depth exceeds
                # cfg.stack_depth) degrades to dropping the deepest
                # entry: clamp the returned sp like the write index, so
                # pops never read past the stack
                sp_c = jnp.minimum(sp, stack_depth - 1)
                nstack_s[sp_c] = second
                tn_stk[sp_c] = tns
                tx_stk[sp_c] = txs
                tn_ref[:] = tnf
                tx_ref[:] = txf
                return first, jnp.minimum(sp + 1, stack_depth)

            def lf(_):
                return push_second(right, tnR, txR, left, tnL, txL)

            def rf(_):
                return push_second(left, tnL, txL, right, tnR, txR)

            return jax.lax.cond(left_first, lf, rf, 0)

        def only_left(_):
            tn_ref[:] = tnL
            tx_ref[:] = txL
            return left, sp

        def only_right(_):
            tn_ref[:] = tnR
            tx_ref[:] = txR
            return right, sp

        def neither(_):
            tn_ref[:] = jnp.full((r8, 128), _INF, jnp.float32)
            tx_ref[:] = jnp.full((r8, 128), -_INF, jnp.float32)
            return node, sp

        case = jnp.where(nl > 0, jnp.where(nr > 0, 3, 1),
                         jnp.where(nr > 0, 2, 0))
        node2, sp2 = jax.lax.switch(
            case, [neither, only_left, only_right, both], 0)
        # the chosen child's aliveness IS next iteration's aliveness — the
        # outer loop carries it instead of re-reducing at its top
        return node2, sp2, (case != 0).astype(jnp.int32)

    # ---------------- outer walk ----------------
    # Aliveness of the CURRENT interval rides the carry (computed by the
    # previous visit: a descend knows its chosen child's aliveness, a
    # consumed leaf is dead by construction, a pop recomputes it), so the
    # loop top pays no per-iteration vector->scalar sync.
    def cond(carry):
        return (carry[2] != 0) | (carry[1] > 0)

    def body(carry):
        node, sp, aa_in, count, head = carry

        # pop-collapse: drain dead stack entries in one outer iteration.
        # The loop cond must be pure on the carry (a cond that read the
        # refs would see pre-loop state under discharge), so the
        # keep-popping flag is computed INSIDE the body after the writes.
        def pcond(c):
            return c[2] != 0

        def pbody(c):
            _, sp2, _, _ = c
            sp2 = sp2 - 1
            tn_ref[:] = tn_stk[sp2]
            tx_ref[:] = tx_stk[sp2]
            aa = jnp.any(alive_mask())
            more = (sp2 > 0) & ~aa
            return (nstack_s[sp2], sp2, more.astype(jnp.int32),
                    aa.astype(jnp.int32))

        more0 = (sp > 0) & (aa_in == 0)
        node, sp, _, any_alive = jax.lax.while_loop(
            pcond, pbody, (node, sp, more0.astype(jnp.int32), aa_in))

        def visit(_):
            is_leaf = flag_s[node] >= 3

            def at_leaf(_):
                count2, head2 = leaf_fn(node, count, head)
                # leaf_fn empties the interval: dead until the next pop
                return node, sp, jnp.int32(0), count2, head2

            def at_interior(_):
                node2, sp2, aa2 = interior_fn(node, sp, alive_mask())
                return node2, sp2, aa2, count, head

            return jax.lax.cond(is_leaf, at_leaf, at_interior, 0)

        def finish(_):
            return node, sp, jnp.int32(0), count, head

        return jax.lax.cond(any_alive != 0, visit, finish, 0)

    aa_init = jnp.any(alive_mask()).astype(jnp.int32)
    _, _, _, count, head = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), aa_init,
                     jnp.int32(0), jnp.int32(0)))

    # drain the pipeline: up to fifo blocks may still be in flight
    def drain_cond(c):
        return c[0] > 0

    def drain_body(c):
        cnt, hd = c
        process(pfifo_s[hd], hd)
        return cnt - 1, jax.lax.rem(hd + 1, fifo)

    jax.lax.while_loop(drain_cond, drain_body, (count, head))


@functools.partial(jax.jit, static_argnames=(
    "stack_depth", "any_hit", "interpret", "tile", "fold_groups", "fifo"))
def packet_traverse(flag, split, right, blk0, nblk, aabb,
                    o3, d3, invd3, tmin, tmax, clip, act, rays,
                    block_g, block_orig_p,
                    stack_depth: int, any_hit: bool = False,
                    interpret: bool = False, tile: int = TILE,
                    fold_groups: int = 8, fifo: int = _FIFO):
    """Packet kd traversal for N rays (N % tile == 0).

    Args:
      flag/split/right/blk0/nblk: (M,) node fields (i32/f32/i32/i32/i32);
        blk0 = leaf_start // block_lanes, nblk = ceil(leaf_lanes / block_lanes).
      aabb: (6, B) per-block vertex AABB [minx,miny,minz,maxx,maxy,maxz].
      o3/d3/invd3: (3, N//128, 128) ray origin/dir/inv-dir, lane-major.
      tmin/tmax/clip: (N//128, 128) root-slab entry/exit t and per-ray t_max.
      act: (N//128, 128) i32 root-hit mask.
      rays: (N, 16) Plücker rows; block_g: (B, 16, 5*Spad) f32;
      block_orig_p: (B, 1, Spad) i32 (-1 fill).
    Returns (t_best, prim, found) each (N//128, 128).
    """
    n128 = tmin.shape[0]
    n = n128 * 128
    assert n % tile == 0 and tile % 128 == 0
    assert fold_groups in (1, 2, 4, 8, 16), fold_groups
    r8 = tile // 128
    grid = (n // tile,)
    B, K, SP5 = block_g.shape
    spad = SP5 // 5
    assert K == 16

    vec = lambda: pl.BlockSpec((r8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    return pl.pallas_call(
        functools.partial(_kernel, spad=spad, stack_depth=stack_depth,
                          any_hit=any_hit, r8=r8, fold_groups=fold_groups,
                          fifo=fifo),
        grid=grid,
        in_specs=[
            smem(), smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, r8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(), vec(),
            pl.BlockSpec((tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[vec(), vec(), vec()],
        out_shape=[
            jax.ShapeDtypeStruct((n128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n128, 128), jnp.int32),
            jax.ShapeDtypeStruct((n128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r8, 128), jnp.float32),       # tn
            pltpu.VMEM((r8, 128), jnp.float32),       # tx
            pltpu.VMEM((r8, 128), jnp.int32),         # done
            pltpu.SMEM((max(stack_depth, 2),), jnp.int32),
            pltpu.VMEM((max(stack_depth, 2), r8, 128), jnp.float32),
            pltpu.VMEM((max(stack_depth, 2), r8, 128), jnp.float32),
            pltpu.SMEM((_MBOX + 1,), jnp.int32),      # mailbox ring + cursor
            pltpu.SMEM((fifo,), jnp.int32),           # pending-block ids
            pltpu.SMEM((fifo, -(-r8 * fold_groups // 32)),
                       jnp.int32),                    # pending gate words
            pltpu.VMEM((fifo, 16, SP5), jnp.float32),  # pipelined blocks
            pltpu.VMEM((fifo, 1, spad), jnp.int32),
            pltpu.SemaphoreType.DMA((fifo,)),
            pltpu.SemaphoreType.DMA((fifo,)),
        ],
        interpret=interpret,
    )(flag, split, right, blk0, nblk, aabb, o3, d3, invd3, tmin, tmax, clip,
      act, rays, block_g, block_orig_p)
