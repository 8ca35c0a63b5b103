#!/usr/bin/env python
"""Time the ACTUAL compiled C++ reference binary on this host's CPU.

VERDICT r4 item 2: "seconds to tens of seconds" was folklore, not a
benchmark.  This script makes the competitor number measured: it builds
the unmodified reference sources (via scripts/build_reference.py's glm
shim + text-mesh loader), patches in steady_clock timing around the
kd-tree build and the threaded render loop (src/main.cpp:368-394), and
runs the three flagship shapes head-to-head with bench.py:

  * teapot @ 512x512
  * teapot @ 1920x1080
  * procedural dragon (the same 869,888-tri mesh our TPU bench renders,
    exported with identical smooth normals) @ 1920x1080

The binary uses get_nprocs() threads (src/main.cpp:371) and -march=native
AVX2, i.e. the reference's full parallelism strategy on this host.

Output: one JSON line per config + REFBENCH.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO))

import build_reference  # noqa: E402

# Timing patches appended after build_reference's own patches (applied in
# order, so anchors created by earlier patches are available).
build_reference.PATCHES.extend([
    ("static FILE *g_sceneDump;",
     "#include <chrono>\nstatic FILE *g_sceneDump;"),
    ("    const KDTree tree = KDTree::buildTree();",
     "    auto __tb0 = std::chrono::steady_clock::now();\n"
     "    const KDTree tree = KDTree::buildTree();\n"
     "    auto __tb1 = std::chrono::steady_clock::now();"),
    ("    threads.clear();",
     "    threads.clear();\n"
     "    auto __tr1 = std::chrono::steady_clock::now();\n"
     "    printf(\"BUILD_SECONDS: %.3f\\n\", "
     "std::chrono::duration<double>(__tb1 - __tb0).count());\n"
     "    printf(\"RENDER_SECONDS: %.3f\\n\", "
     "std::chrono::duration<double>(__tr1 - __tb1).count());\n"
     "    fflush(stdout);"),
])


def export_mesh(wd: pathlib.Path, asset: str) -> int:
    """Write asset triangles+normals as the text soup the shim loader reads."""
    import numpy as np

    from dod_raytracer_tpu.mesh import load_mesh_asset

    tv, tn = load_mesh_asset(asset)
    rows = np.concatenate([np.asarray(tv).reshape(-1, 9),
                           np.asarray(tn).reshape(-1, 9)], axis=1)
    np.savetxt(wd / "mesh.tris", rows, fmt="%.9g")
    return rows.shape[0]


def run_config(exe: pathlib.Path, wd: pathlib.Path, asset: str,
               width: int, height: int, repeats: int) -> dict:
    (wd / "config.ini").write_text(f"Width: {width}\nHeight: {height}\n")
    best = None
    for _ in range(repeats):
        t0 = time.monotonic()
        res = subprocess.run([str(exe)], cwd=wd, capture_output=True,
                             text=True, timeout=4 * 3600)
        wall = time.monotonic() - t0
        if res.returncode != 0:
            raise RuntimeError(f"reference run failed: {res.stderr[-500:]}")
        build_s = render_s = None
        for line in res.stdout.splitlines():
            if line.startswith("BUILD_SECONDS:"):
                build_s = float(line.split(":")[1])
            elif line.startswith("RENDER_SECONDS:"):
                render_s = float(line.split(":")[1])
        rec = {"asset": asset, "width": width, "height": height,
               "wall_s": round(wall, 3), "kd_build_s": build_s,
               "render_s": render_s,
               "primary_rays_per_s": round(width * height / render_s, 1)
               if render_s else None}
        if best is None or rec["render_s"] < best["render_s"]:
            best = rec
    return best


def main():
    nproc = os.cpu_count()
    wd = REPO / "build" / "refbench"
    wd.mkdir(parents=True, exist_ok=True)
    exe = build_reference.build(wd)

    configs = [
        ("teapot", 512, 512, 2),
        ("teapot", 1920, 1080, 1),
        ("dragon", 1920, 1080, 1),
    ]
    results = {"host_cpus": nproc,
               "cpu_model": next((ln.split(":", 1)[1].strip()
                                  for ln in open("/proc/cpuinfo")
                                  if ln.startswith("model name")), "?"),
               "runs": []}
    cur_asset = None
    for asset, w, h, reps in configs:
        if asset != cur_asset:
            ntris = export_mesh(wd, asset)
            cur_asset = asset
            print(f"# exported {asset}: {ntris} tris", flush=True)
        rec = run_config(exe, wd, asset, w, h, reps)
        print(json.dumps(rec), flush=True)
        results["runs"].append(rec)
        (REPO / "REFBENCH.json").write_text(json.dumps(results, indent=1))
    print("# wrote REFBENCH.json", flush=True)


if __name__ == "__main__":
    main()
