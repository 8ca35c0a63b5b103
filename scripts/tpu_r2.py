"""Round-2 TPU measurements: per-phase attribution, traversal-backend
comparison on the dragon in its real render context, forest-kernel tuning,
and the brute/kd crossover sweep.

Each section runs in a fresh subprocess (the axon claim path sometimes
wedges a process) and prints RESULT lines; the parent just sequences them.

Run: python scripts/tpu_r2.py [section ...]
Sections: phase backend forest brute
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRELUDE = """
import os, sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', %(root)r + '/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('WARM ok', flush=True)

def timeit(name, fn, *args, repeats=5):
    t0=time.time(); out = fn(*args); jax.block_until_ready(out)
    c = time.time()-t0
    ts=[]
    for _ in range(repeats):
        t0=time.time(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.time()-t0)
    r = float(np.median(ts))
    print('RESULT %%s: compile %%.1fs run %%.3fms' %% (name, c, r*1e3), flush=True)
    return r, out
"""

FLAGSHIP = PRELUDE + """
from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.render import _FrozenConfig, render_rays
from dod_raytracer_tpu.scene import default_scene
from dod_raytracer_tpu.camera import primary_rays
from dod_raytracer_tpu.intersect import closest_hit
from dod_raytracer_tpu.shading import lighting_factor

cfg0 = Config(Width=1920, Height=1080, use_kdtree=True, ray_tile=16384,
              MaxPrims=32, leaf_chunk_lanes=32, **%(cfg_extra)s)
cfg = _FrozenConfig.from_config(cfg0)
scene = default_scene(seed=0, cfg=cfg, mesh='dragon').build(cfg)
print('BUILT scene: nodes', scene.kd.node_flag.shape[0], flush=True)
o_all, d_all, r_all = primary_rays(1920, 1080)
n = 16384
mid = (o_all.shape[0] - n) // 2  # center tile: dragon-covering rays
o, d, d_raw = o_all[mid:mid+n], d_all[mid:mid+n], r_all[mid:mid+n]
"""

SECTIONS = {}

SECTIONS["phase"] = FLAGSHIP + """
# full tile through the integrator
full_fn = jax.jit(lambda s,o,d,r: render_rays(s,o,d,r,cfg))
t_full, _ = timeit('render_tile_16k', full_fn, scene, o, d, d_raw)

# bounce-0 closest hit (family chain + kd)
ch_fn = jax.jit(lambda s,o,d: closest_hit(s, o, d, cfg))
t_ch, hit = timeit('closest_hit_b0', ch_fn, scene, o, d)

# bounce-0 shadow+shading pass given those hits
hitp, hitn, act = hit.point, hit.normal, hit.mask
lf_fn = jax.jit(lambda s,p,nm,r,a: lighting_factor(s,p,nm,r,cfg,a))
t_lf, _ = timeit('lighting_b0', lf_fn, scene, hitp, hitn, d_raw, act)
print('RESULT phase split: full %%.3fms = ~10x(closest %%.3fms + lighting %%.3fms)'
      %% (t_full*1e3, t_ch*1e3, t_lf*1e3), flush=True)
"""

SECTIONS["backend"] = FLAGSHIP + """
from dod_raytracer_tpu.ops.traverse import kd_closest, kd_any, _backend
# realistic t_max: what the family chain hands the kd query at bounce 0
from dod_raytracer_tpu.ops import sphere as sph, plane as pln, cylinder as cyl
best = sph.intersect_spheres(scene.spheres, o, d, jnp.full((n,), jnp.inf))
tm = jnp.minimum(best.t, jnp.inf)
best_t = pln.intersect_planes(scene.planes, o, d, tm, cfg.Epsilon).t
tm = jnp.minimum(tm, best_t)
print('t_max: mean %%.2f' %% float(tm.mean()), flush=True)
be = %(backend)r
bcfg = _FrozenConfig.from_config(Config(use_kdtree=True, MaxPrims=32,
    leaf_chunk_lanes=32, traversal_backend=be, **%(cfg_extra)s))
print('resolved backend:', _backend(scene.kd, bcfg), flush=True)
cl = jax.jit(lambda s,o,d,t: kd_closest(s.kd, s.triangles, o, d, t, bcfg))
t_cl, out = timeit('closest[%%s]' %% be, cl, scene, o, d, tm)
print('hits', int(np.asarray(out[2]).sum()), flush=True)
an = jax.jit(lambda s,o,d,t: kd_any(s.kd, s.triangles, o, d, t, bcfg))
t_an, outa = timeit('anyhit[%%s]' %% be, an, scene, o, d, tm * 0.8)
print('RESULT backend %%s: closest %%.3fms (%%.1f Mrays/s) anyhit %%.3fms'
      %% (be, t_cl*1e3, n/t_cl/1e6, t_an*1e3), flush=True)
"""

SECTIONS["brute"] = PRELUDE + """
from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
from dod_raytracer_tpu.ops.traverse import kd_closest
from dod_raytracer_tpu.ops.pallas.plucker_kernel import plucker_closest, plucker_pack
from dod_raytracer_tpu.scene import SceneBuilder

n = 16384
rng = np.random.default_rng(0)
o = jnp.asarray(((rng.random((n,3))*2-1)*4).astype(np.float32))
dd = rng.standard_normal((n,3)).astype(np.float32)
dd /= np.linalg.norm(dd,axis=1,keepdims=True)
d = jnp.asarray(dd)
t_max = jnp.full((n,), jnp.inf)
for name, tris in %(meshes)s:
    tv, tn = (load_mesh_asset('teapot') if name=='teapot'
              else procedural_dragon(num_tris=tris))
    cfg = Config(use_kdtree=True, MaxPrims=32, leaf_chunk_lanes=32)
    b = SceneBuilder(); b.add_mesh(tv, tn); b.add_light((0,3,-3),3.0)
    scene = b.build(cfg)
    g = plucker_pack(scene.triangles.verts)
    br = jax.jit(lambda g,o,d: plucker_closest(g, o, d))
    t_br, _ = timeit('brute[%%s/%%d]' %% (name, tv.shape[0]), br, g, o, d)
    kdf = jax.jit(lambda s,o,d,t: kd_closest(s.kd, s.triangles, o, d, t, cfg))
    t_kd, _ = timeit('kd[%%s/%%d]' %% (name, tv.shape[0]), kdf, scene, o, d, t_max)
    print('RESULT crossover %%s tris=%%d brute=%%.3fms kd=%%.3fms ratio=%%.1f'
          %% (name, tv.shape[0], t_br*1e3, t_kd*1e3, t_kd/t_br), flush=True)
"""


def run(section: str, timeout=560, **fmt):
    code_tpl = SECTIONS[section]
    defaults = dict(root=ROOT, cfg_extra="{}", backend="xla",
                    meshes="[('teapot',0)]")
    defaults.update(fmt)
    code = code_tpl % defaults
    print(f"=== {section} {fmt} ===", flush=True)
    try:
        res = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                             capture_output=True, text=True)
        for line in res.stdout.splitlines():
            if any(k in line for k in ("RESULT", "WARM", "BUILT", "hits",
                                       "t_max", "resolved")):
                print(" ", line, flush=True)
        if res.returncode != 0:
            print("  FAILED:", res.stderr[-800:], flush=True)
    except subprocess.TimeoutExpired:
        print("  TIMEOUT", flush=True)


def main():
    want = sys.argv[1:] or ["phase", "backend", "forest", "brute"]
    if "phase" in want:
        run("phase")
    if "backend" in want:
        for be in ("xla", "binned", "forest"):
            run("backend", backend=be)
    if "forest" in want:
        for tile in (256, 512, 1024):
            for cap in (512, 1024):
                run("backend", backend="forest",
                    cfg_extra=f"dict(forest_tile={tile}, treelet_cap={cap})")
    if "brute" in want:
        run("brute", meshes="[('teapot',0), ('pd8k',8192), ('pd32k',32768), ('pd131k',131072)]",
            timeout=560)


if __name__ == "__main__":
    main()
