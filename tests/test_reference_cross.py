"""Cross-check against the ACTUAL compiled C++ reference binary.

The reference's own CMake build FetchContent-clones glm/assimp and cannot
run offline; scripts/build_reference.py compiles the unmodified reference
sources against a minimal glm shim, with assimp replaced by a text-format
mesh loader fed the SAME teapot geometry + smooth normals this repo's
mesh pipeline produces, a fixed seed, and a scene-parameter dump (so both
renderers consume identical scenes).  See that script's docstring for the
documented FetchContent failure.

Tolerances: the reference reduces hits in AVX lane order with strict-min
chaining while we reduce in XLA order, so borderline silhouette pixels
can flip hit/miss and a 10-bounce reflection chain amplifies a single
flip into a large color diff on isolated pixels.  The check therefore
bounds the mean error and the outlier fraction rather than demanding
bit-exactness (which even two compilations of the reference with
different -march would not achieve).
"""

import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
W, H = 320, 180


@pytest.fixture(scope="module")
def reference_run(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    if not pathlib.Path("/root/reference/src").exists():
        pytest.skip("reference sources not mounted")
    wd = tmp_path_factory.mktemp("refx")
    build = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_reference.py"),
         str(wd), "--width", str(W), "--height", str(H)],
        capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        pytest.skip(f"reference shim build failed: {build.stderr[-500:]}")

    from dod_raytracer_tpu.mesh import load_mesh_asset

    tv, tn = load_mesh_asset("teapot")
    rows = np.concatenate([tv.reshape(-1, 9), tn.reshape(-1, 9)], axis=1)
    np.savetxt(wd / "mesh.tris", rows, fmt="%.9g")
    run = subprocess.run([str(wd / "dod_ref")], cwd=wd,
                         capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stderr
    assert (wd / "output.png").exists() and (wd / "scene_dump.csv").exists()
    return wd


def test_pixels_match_reference_binary(reference_run):
    from PIL import Image

    from dod_raytracer_tpu import Config, quantize_u8, render_image
    from dod_raytracer_tpu.mesh import load_mesh_asset
    from dod_raytracer_tpu.scene import SceneBuilder, reference_lights

    spheres, cyl_color = [], None
    for line in (reference_run / "scene_dump.csv").read_text().splitlines():
        p = line.split(",")
        if p[0] == "sphere":
            spheres.append([float(x) for x in p[1:]])
        elif p[0] == "cylinder":
            cyl_color = [float(x) for x in p[1:]]
    assert len(spheres) == 16 and cyl_color is not None

    cfg = Config(Width=W, Height=H, use_kdtree=True, ray_tile=16384,
                 replicate_reference_bugs=True)
    b = SceneBuilder()
    for x, y, z, r, cr, cg, cb in spheres:
        b.add_sphere((x, y, z), r, (cr, cg, cb))
    walls = [  # main.cpp:54-103
        ((0.0, 0.0, -1.0), (0.0, 0.0, 5.0), (0.195, 0.410, 0.610)),
        ((0.0, 0.0, 1.0), (0.0, 0.0, -5.0), (0.493, 0.265, 0.590)),
        ((0.0, -1.0, 0.0), (0.0, 5.0, 0.0), (0.276, 0.600, 0.411)),
        ((0.0, 1.0, 0.0), (0.0, -5.0, 0.0), (0.292, 0.680, 0.674)),
        ((1.0, 0.0, 0.0), (-5.0, 0.0, 0.0), (0.720, 0.288, 0.389)),
        ((-1.0, 0.0, 0.0), (5.0, 0.0, 0.0), (0.680, 0.224, 0.224)),
    ]
    for n_, p_, c_ in walls:
        b.add_plane(p_, n_, c_)
    b.add_cylinder(base=(-2.0, 0.0, 2.0), axis=(2.2, 5.0, 2.0), radius=1.5,
                   height=4.0, color=cyl_color)
    tv, tn = load_mesh_asset("teapot")
    b.add_mesh(tv, tn)
    for pos, inten in reference_lights():
        b.add_light(pos, inten)
    scene = b.build(cfg)

    ours = quantize_u8(render_image(scene, cfg)).astype(np.int64)
    ref = np.asarray(Image.open(reference_run / "output.png")).astype(np.int64)
    assert ref.shape == ours.shape

    per_px = np.abs(ref - ours).max(axis=2)
    mean_abs = np.abs(ref - ours).mean()
    within2 = (per_px <= 2).mean()
    outliers = (per_px > 8).mean()
    # measured 2026-08-19: mean 0.24, within-2 98.2%, outliers 0.60%
    assert mean_abs < 0.75, mean_abs
    assert within2 > 0.96, within2
    assert outliers < 0.015, outliers
