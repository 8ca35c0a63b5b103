"""TPU microbenchmark probe: time the candidate triangle-intersection
paths in isolation to pick the production configuration.

Run: python scripts/tpu_probe.py [N_rays] [mesh] [sections]
  sections: comma-set of {pallas,plucker,jnp,kd,binned} (default: all).
  Pallas compiles go through the slow remote-compile path — run the XLA
  sections (jnp,kd) separately when the tunnel is congested.
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

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
from dod_raytracer_tpu.scene import SceneBuilder


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
    print(f"{name}: compile+1st {compile_s:.2f}s, run {run_s * 1e3:.1f}ms", flush=True)
    return out, run_s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    mesh_name = sys.argv[2] if len(sys.argv) > 2 else "teapot"
    sections = set((sys.argv[3] if len(sys.argv) > 3
                    else "pallas,plucker,jnp,kd,binned").split(","))
    print("devices:", jax.devices(), flush=True)

    if mesh_name == "dragon":
        tv, tn = procedural_dragon()
    else:
        tv, tn = load_mesh_asset(mesh_name)
    cfg = Config(use_kdtree=True)
    b = SceneBuilder()
    b.add_mesh(tv, tn)
    b.add_light((0, 3, -3), 3.0)
    scene = b.build(cfg)
    print(f"mesh {mesh_name}: {tv.shape[0]} tris, kd nodes "
          f"{scene.kd.node_flag.shape[0]}, reordered lanes {scene.kd.num_lanes}", flush=True)

    rng = np.random.default_rng(0)
    if "camera" in sections:
        # coherent wavefront: the first n primary rays of the 1080p frame
        from dod_raytracer_tpu.camera import primary_rays

        o_all, d_all, _ = primary_rays(1920, 1080)
        mid = (o_all.shape[0] - n) // 2  # center rows: rays that actually hit
        o, d = o_all[mid:mid + n], d_all[mid:mid + n]
        print("rays: camera (coherent)", flush=True)
    else:
        o = jnp.asarray(((rng.random((n, 3)) * 2 - 1) * 4).astype(np.float32))
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
    t_max = jnp.full((n,), jnp.inf)

    # 0. dispatch floor: a trivial jitted op on the same data — measures the
    # tunnel/dispatch round trip that inflates every small measurement below
    timeit("dispatch floor", jax.jit(lambda o, d: (o + d).sum()), o, d)

    hb = hk = None

    if "jnp" in sections:
        from dod_raytracer_tpu.ops.triangle import brute_force_closest

        # scene arrays must be jit ARGUMENTS: closed-over constants are
        # rematerialized per execution on axon (~100x slowdown)
        (t_b, i_b), s_jnp = timeit(
            "jnp brute", jax.jit(lambda v, o, d: brute_force_closest(v, o, d)),
            scene.triangles.verts, o, d)
        print(f"  -> {n / s_jnp / 1e6:.2f} Mrays/s", flush=True)
        hb = np.isfinite(np.asarray(t_b))

    if "kd" in sections:
        from dod_raytracer_tpu.ops.traverse import kd_closest

        (t_k, i_k, h_k), s_kd = timeit(
            "kd traversal",
            jax.jit(lambda s, o, d, t: kd_closest(s.kd, s.triangles, o, d, t, cfg)),
            scene, o, d, t_max)
        print(f"  -> {n / s_kd / 1e6:.2f} Mrays/s", flush=True)
        hk = np.asarray(h_k)
        if hb is not None:
            print(f"  kd vs jnp: hit mismatch {int((hk ^ hb).sum())}", flush=True)

    if "pallas" in sections:
        from dod_raytracer_tpu.ops.pallas.mt_kernel import mt_closest_pallas, swizzle_tris

        soa = swizzle_tris(jnp.asarray(tv))
        (t_p, i_p), s_pallas = timeit(
            "pallas brute", jax.jit(lambda soa, o, d: mt_closest_pallas(soa, o, d)),
            soa, o, d)
        print(f"  -> {n / s_pallas / 1e6:.2f} Mrays/s, "
              f"{n * tv.shape[0] / s_pallas / 1e12:.2f} Tpair/s", flush=True)
        if hb is not None:
            hp = np.isfinite(np.asarray(t_p))
            print(f"  pallas vs jnp: hit mismatch {int((hp ^ hb).sum())}", flush=True)

    if "plucker" in sections:
        from dod_raytracer_tpu.ops.pallas.plucker_kernel import plucker_closest, plucker_pack

        g = plucker_pack(jnp.asarray(tv))
        (t_pk, i_pk), s_pk = timeit(
            "plucker MXU brute", jax.jit(lambda g, o, d: plucker_closest(g, o, d)),
            g, o, d)
        print(f"  -> {n / s_pk / 1e6:.2f} Mrays/s, "
              f"{n * tv.shape[0] / s_pk / 1e9:.1f} Gpair/s", flush=True)

    if "mega" in sections:
        from dod_raytracer_tpu.config import Config as _C
        from dod_raytracer_tpu.ops.traverse import kd_closest as _kdc2

        cfg_m = _C(use_kdtree=True, traversal_backend="mega")
        (t_mg, i_mg, h_mg), s_mg = timeit(
            "kd mega",
            jax.jit(lambda s, o, d, t: _kdc2(s.kd, s.triangles, o, d, t, cfg_m)),
            scene, o, d, t_max)
        print(f"  -> {n / s_mg / 1e6:.2f} Mrays/s", flush=True)
        if hk is not None:
            print(f"  mega vs kd: hit mismatch {int((np.asarray(h_mg) ^ hk).sum())}", flush=True)

    if "binned" in sections:
        from dod_raytracer_tpu.config import Config as _C
        from dod_raytracer_tpu.ops.traverse import kd_closest as _kdc

        cfg_b = _C(use_kdtree=True, traversal_backend="binned")
        (t_bn, i_bn, h_bn), s_bn = timeit(
            "kd binned",
            jax.jit(lambda s, o, d, t: _kdc(s.kd, s.triangles, o, d, t, cfg_b)),
            scene, o, d, t_max)
        print(f"  -> {n / s_bn / 1e6:.2f} Mrays/s", flush=True)
        if hk is not None:
            print(f"  binned vs kd: hit mismatch {int((np.asarray(h_bn) ^ hk).sum())}", flush=True)


if __name__ == "__main__":
    main()
