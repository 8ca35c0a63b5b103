"""Capture a jax.profiler trace of the kd traversal on the TPU and print
the op-level self-time breakdown (via tensorboard_plugin_profile).

Run: python scripts/tpu_profile.py [N] [mesh] [outdir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    mesh_name = sys.argv[2] if len(sys.argv) > 2 else "teapot"
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/kd_trace"
    print("devices:", jax.devices(), flush=True)

    from dod_raytracer_tpu.config import Config
    from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
    from dod_raytracer_tpu.ops.traverse import kd_closest
    from dod_raytracer_tpu.scene import SceneBuilder

    tv, tn = procedural_dragon() if mesh_name == "dragon" else load_mesh_asset(mesh_name)
    cfg = Config(use_kdtree=True)
    b = SceneBuilder()
    b.add_mesh(tv, tn)
    b.add_light((0, 3, -3), 3.0)
    scene = b.build(cfg)

    rng = np.random.default_rng(0)
    o = jnp.asarray(((rng.random((n, 3)) * 2 - 1) * 4).astype(np.float32))
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_max = jnp.full((n,), jnp.inf)

    fn = jax.jit(lambda o, d, t: kd_closest(scene.kd, scene.triangles, o, d, t, cfg))
    out = fn(o, d, t_max)
    jax.block_until_ready(out)
    print("compiled; capturing", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        out = fn(o, d, t_max)
        jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print("trace captured ->", outdir, flush=True)
    summarize(outdir)


def summarize(outdir):
    files = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        print("no xplane.pb found under", outdir)
        return
    path = max(files, key=os.path.getmtime)
    print("parsing", path, flush=True)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([path], "framework_op_stats", {})
    import gzip
    import json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    tbl = json.loads(data)
    # tool data: list of tables; first has op rows
    rows = tbl[1]["p"] if isinstance(tbl, list) and len(tbl) > 1 else None
    print(json.dumps(tbl, indent=0)[:4000])


if __name__ == "__main__":
    main()
