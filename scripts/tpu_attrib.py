"""Traversal cost attribution: time each ingredient of the kd while-loop
body in isolation (same shapes/iteration counts as the teapot@16k probe)
to find where the ~450us/step actually goes.

Run: python scripts/tpu_attrib.py [N] [sections]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

OUTER = 27     # leaf rounds measured on teapot@16k
INNER = 169    # interior steps measured on teapot@16k
DEPTH = 12     # stack depth after max_depth bound


def timeit(name, fn, *args, repeats=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    run_s = float(np.median(times))
    print(f"{name}: compile+1st {compile_s:.2f}s, run {run_s * 1e3:.2f}ms", flush=True)
    return run_s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    sections = set((sys.argv[2] if len(sys.argv) > 2
                    else "leaf,interior,stack,pk,axis").split(","))
    print("devices:", jax.devices(), flush=True)

    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.mesh import load_mesh_asset
    from dod_raytracer_tpu.scene import SceneBuilder
    import dod_raytracer_tpu.ops.traverse as T

    cfg = Config(use_kdtree=True)
    tv, tn = load_mesh_asset("teapot")
    b = SceneBuilder()
    b.add_mesh(tv, tn)
    b.add_light((0, 3, -3), 3.0)
    scene = b.build(cfg)
    kd = scene.kd
    B = kd.block_tris.shape[0]
    M = kd.node_flag.shape[0]

    rng = np.random.default_rng(0)
    o = jnp.asarray(((rng.random((n, 3)) * 2 - 1) * 4).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    timeit("floor", jax.jit(lambda o: (o * 2).sum()), o)

    if "leaf" in sections:
        # OUTER x (block row gather + MT + argmin) with rotating random blocks
        from dod_raytracer_tpu.ops.triangle import mt_t_edges

        def leaf(o, d, idx0):
            def step(i, carry):
                acc, idx = carry
                rows = kd.block_tris[idx]          # (N, S, 9) row gather
                orig = kd.block_orig[idx]
                t = mt_t_edges(rows[..., 0:3], rows[..., 3:6], rows[..., 6:9], o, d)
                t = jnp.where(orig >= 0, t, jnp.inf)
                acc = jnp.minimum(acc, jnp.min(t, axis=1))
                return acc, (idx * 1103515245 + 12345) % B
            acc, _ = jax.lax.fori_loop(0, OUTER, step, (jnp.full((n,), jnp.inf), idx0))
            return acc

        idx0 = jnp.asarray(rng.integers(0, B, n).astype(np.int32))
        s = timeit(f"leaf gather+MT x{OUTER}", jax.jit(leaf), o, d, idx0)
        print(f"  -> {s / OUTER * 1e6:.0f}us/round", flush=True)

    if "interior" in sections:
        # INNER x one packed-row gather + arithmetic (no stacks)
        tbl = T._pack_nodes(kd)

        def interior(o, d, node0):
            inv_d = 1.0 / d
            def step(i, carry):
                node, acc = carry
                pk = tbl[node]
                flag, split, right, _, _ = T._decode_nodes(pk)
                axis = jnp.clip(flag, 0, 2)
                o_ax = T._axis_get(o, axis)
                inv_ax = T._axis_get(inv_d, axis)
                t_plane = (split - o_ax) * inv_ax
                nxt = jnp.where(t_plane > 0, jnp.minimum(node + 1, M - 1), right % M)
                return nxt, acc + t_plane
            _, acc = jax.lax.fori_loop(0, INNER, step, (node0, jnp.zeros((n,))))
            return acc

        node0 = jnp.asarray(rng.integers(0, M, n).astype(np.int32))
        s = timeit(f"interior gather+math x{INNER}", jax.jit(interior), o, d, node0)
        print(f"  -> {s / INNER * 1e6:.0f}us/step", flush=True)

    if "stack" in sections:
        # INNER x (3 one-hot sets) + OUTER x (3 one-hot gets), (DEPTH, N)
        def stacks(sp0, val):
            st = (jnp.zeros((DEPTH, n), jnp.int32), jnp.zeros((DEPTH, n)),
                  jnp.zeros((DEPTH, n)))
            def push(i, carry):
                (a, b, c), sp = carry
                do = val > 0
                a = T._stack_set(a, sp, (val * i).astype(jnp.int32), do)
                b = T._stack_set(b, sp, val, do)
                c = T._stack_set(c, sp, val + i, do)
                return (a, b, c), (sp + 1) % DEPTH
            (a, b, c), sp = jax.lax.fori_loop(0, INNER, push, (st, sp0))
            def pop(i, acc):
                return (acc + T._stack_get(b, (sp + i) % DEPTH)
                        + T._stack_get(c, (sp - i) % DEPTH)
                        + T._stack_get(a, (sp * 0 + i) % DEPTH))
            return jax.lax.fori_loop(0, OUTER, pop, jnp.zeros((n,)))

        sp0 = jnp.asarray(rng.integers(0, DEPTH, n).astype(np.int32))
        s = timeit(f"stack 3set x{INNER} + 3get x{OUTER}", jax.jit(stacks), sp0, o[:, 0])
        print(f"  -> {s / (INNER + OUTER) * 1e6:.0f}us/step", flush=True)

    if "pk" in sections:
        # carry cost of the (N,5) pk state alone: gather + trivial use
        tbl = T._pack_nodes(kd)

        def pkloop(node0):
            def step(i, carry):
                node, acc = carry
                pk = tbl[node]
                acc = acc + pk[:, 1]
                node = (node + 1) % M
                return node, acc
            _, acc = jax.lax.fori_loop(0, INNER + OUTER, step, (node0, jnp.zeros((n,))))
            return acc

        node0 = jnp.asarray(rng.integers(0, M, n).astype(np.int32))
        s = timeit(f"pk gather x{INNER + OUTER}", jax.jit(pkloop), node0)
        print(f"  -> {s / (INNER + OUTER) * 1e6:.0f}us/step", flush=True)

    if "gwidth" in sections:
        # gather cost vs row width: if per-row overhead dominates (flat in
        # width), packing k tree levels per row gives ~k fewer gathers
        for W in (1, 5, 16, 40):
            tblw = jnp.asarray(rng.random((max(M, 8), W), np.float32))

            def gloop(node0, tblw=tblw):
                def step(i, carry):
                    node, acc = carry
                    row = tblw[node]
                    acc = acc + row[:, 0]
                    node = (node + 7) % M
                    return node, acc
                _, acc = jax.lax.fori_loop(0, INNER, step, (node0, jnp.zeros((n,))))
                return acc

            node0 = jnp.asarray(rng.integers(0, M, n).astype(np.int32))
            s = timeit(f"gather (N,{W}) x{INNER}", jax.jit(gloop), node0)
            print(f"  -> {s / INNER * 1e6:.0f}us/step", flush=True)

    if "sort" in sections:
        # per-round sort cost of the binned leaf stage: key sort + payload
        # permute + unsort-index build (27 rounds like the teapot probe)
        def sortloop(keys0, payload):
            rows = jnp.arange(n, dtype=jnp.int32)
            def step(i, carry):
                keys, acc = carry
                ks, perm = jax.lax.sort_key_val(keys, rows)
                pay = payload[perm]               # (N, 16) permute gather
                _, inv = jax.lax.sort_key_val(perm, rows)
                acc = acc + pay[:, 0][inv]
                keys = (keys * 1103515245 + 12345) % 997
                return keys, acc
            _, acc = jax.lax.fori_loop(0, OUTER, step, (keys0, jnp.zeros((n,))))
            return acc

        keys0 = jnp.asarray(rng.integers(0, 997, n).astype(np.int32))
        payload = jnp.asarray(rng.random((n, 16), np.float32))
        s = timeit(f"sort+permute x{OUTER}", jax.jit(sortloop), keys0, payload)
        print(f"  -> {s / OUTER * 1e6:.0f}us/round", flush=True)

    if "onehot" in sections:
        # node-table lookup as an MXU one-hot matmul instead of a gather:
        # out = onehot(node) @ tbl — candidate replacement for the 220us
        # native row gather (valid while M stays matmul-sized)
        tbl = T._pack_nodes(kd)
        Mpad = ((M + 127) // 128) * 128
        tblp = jnp.pad(tbl, ((0, Mpad - M), (0, 3)))  # (Mpad, 8)

        def onehot_loop(node0):
            ids = jnp.arange(Mpad, dtype=jnp.int32)
            def step(i, carry):
                node, acc = carry
                oh = (node[:, None] == ids[None, :]).astype(jnp.bfloat16)  # (N, Mpad)
                pk = jnp.dot(oh, tblp.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)  # (N, 8)
                acc = acc + pk[:, 1]
                node = (node + 1) % M
                return node, acc
            _, acc = jax.lax.fori_loop(0, INNER, step, (node0, jnp.zeros((n,))))
            return acc

        node0 = jnp.asarray(rng.integers(0, M, n).astype(np.int32))
        s = timeit(f"onehot-matmul gather x{INNER}", jax.jit(onehot_loop), node0)
        print(f"  -> {s / INNER * 1e6:.0f}us/step", flush=True)

    if "axis" in sections:
        # the three one-hot axis selects per interior step
        def axloop(axis0):
            def step(i, acc):
                ax = (axis0 + i) % 3
                return acc + T._axis_get(o, ax) + T._axis_get(d, ax)
            return jax.lax.fori_loop(0, INNER, step, jnp.zeros((n,)))

        axis0 = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
        s = timeit(f"axis one-hot x{INNER}", jax.jit(axloop), axis0)
        print(f"  -> {s / INNER * 1e6:.0f}us/step", flush=True)


if __name__ == "__main__":
    main()
