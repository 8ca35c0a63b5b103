"""Sweep kd-tree shape knobs on TPU; each config runs in a fresh
subprocess (the axon claim path sometimes wedges a process) with retry."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', %(root)r + '/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
x = jnp.ones((128,128)); x = (x@x).block_until_ready()  # warm the claim/compile path
print('WARM ok', flush=True)
from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
from dod_raytracer_tpu.ops.traverse import kd_closest
from dod_raytracer_tpu.scene import SceneBuilder
n = %(n)d
tv, tn = (procedural_dragon() if %(mesh)r == 'dragon' else load_mesh_asset(%(mesh)r))
rng = np.random.default_rng(0)
if %(camera)r:
    from dod_raytracer_tpu.camera import primary_rays
    o_all, d_all, _ = primary_rays(1920, 1080)
    mid = (o_all.shape[0] - n) // 2  # center rows: rays that actually hit
    o, d = o_all[mid:mid + n], d_all[mid:mid + n]
else:
    o = jnp.asarray(((rng.random((n,3))*2-1)*4).astype(np.float32))
    d = rng.standard_normal((n,3)).astype(np.float32); d /= np.linalg.norm(d,axis=1,keepdims=True)
    d = jnp.asarray(d)
t_max = jnp.full((n,), jnp.inf)
cfg = Config(use_kdtree=True, MaxPrims=%(mp)d, leaf_chunk_lanes=%(chunk)d,
             traversal_backend=%(backend)r)
b = SceneBuilder(); b.add_mesh(tv, tn); b.add_light((0,3,-3),3.0)
scene = b.build(cfg)
fn = jax.jit(lambda s,o,d,t: kd_closest(s.kd, s.triangles, o, d, t, cfg))
print('BUILT scene', flush=True)
t0=time.time(); out = fn(scene,o,d,t_max); jax.block_until_ready(out); c1=time.time()-t0
ts=[]
for _ in range(3):
    t0=time.time(); out=fn(scene,o,d,t_max); jax.block_until_ready(out); ts.append(time.time()-t0)
run=float(np.median(ts)); hits=int(np.asarray(out[2]).sum())
bt = scene.kd.block_tris
print('RESULT mp=%(mp)d chunk=%(chunk)d nodes=%%d blocks=%%s compile=%%.1fs run=%%.1fms Mrays/s=%%.3f hits=%%d'
      %% (scene.kd.node_flag.shape[0], tuple(bt.shape) if bt is not None else None, c1, run*1e3, n/run/1e6, hits), flush=True)
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    mesh = sys.argv[2] if len(sys.argv) > 2 else "teapot"
    configs = [(8, 8), (16, 16), (32, 32), (64, 64), (128, 128)]
    if len(sys.argv) > 3:
        configs = [tuple(int(x) for x in c.split(",")) for c in sys.argv[3].split(";")]
    backend = sys.argv[4] if len(sys.argv) > 4 else "xla"
    camera = len(sys.argv) > 5 and sys.argv[5] == "camera"
    for mp, chunk in configs:
        code = CHILD % {"root": ROOT, "n": n, "mesh": mesh, "mp": mp, "chunk": chunk,
                        "backend": backend, "camera": camera}
        for attempt in range(3):
            try:
                r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                                   text=True, timeout=240)
                out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
                if out:
                    print(out[0], flush=True)
                    break
                tail = [l for l in (r.stdout + r.stderr).splitlines() if l.strip()][-3:]
                print(f"mp={mp} chunk={chunk}: attempt {attempt} no result (rc={r.returncode}) {tail}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"mp={mp} chunk={chunk}: attempt {attempt} TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
