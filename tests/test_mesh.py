"""Mesh pipeline tests: OBJ parsing, vertex joining, smooth normals
(assimp-equivalence contract, mesh.cpp:11-14)."""

import numpy as np

from dod_raytracer_tpu.mesh import (
    join_identical,
    load_mesh,
    load_mesh_asset,
    load_obj,
    procedural_dragon,
    smooth_normals,
)


def test_load_obj_basic(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\n"
        "f 2 4 3\n"
    )
    v, f, vn = load_obj(str(p), use_native=False)
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert vn is None


def test_load_obj_polygon_fan_and_indices(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1 4//1\n"  # quad -> 2 triangles (fan)
    )
    v, f, vn = load_obj(str(p), use_native=False)
    assert f.shape == (2, 3)
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])
    assert vn is not None and vn.shape == (2, 3, 3)
    np.testing.assert_allclose(vn, np.tile([0, 0, 1], (2, 3, 1)))


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    _, f, _ = load_obj(str(p), use_native=False)
    np.testing.assert_array_equal(f, [[0, 1, 2]])


def test_join_identical():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 3], [2, 1, 3]], np.int32)
    v2, f2 = join_identical(v, f)
    assert v2.shape[0] == 3
    assert np.array_equal(f2[0], f2[1])  # both faces now share the merged vertex


def test_smooth_normals_flat_quad():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = smooth_normals(v, f)
    np.testing.assert_allclose(n, np.tile([0, 0, 1], (4, 1)), atol=1e-6)


def test_smooth_normals_unit_and_shared():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((20, 3)).astype(np.float32)
    f = rng.integers(0, 20, (30, 3)).astype(np.int32)
    f = f[(f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])]
    n = smooth_normals(v, f)
    ln = np.linalg.norm(n, axis=1)
    used = np.zeros(20, bool)
    used[f.ravel()] = True
    assert np.allclose(ln[used], 1.0, atol=1e-5)


def test_teapot_loads():
    tv, tn = load_mesh_asset("teapot")
    assert tv.shape == (6320, 3, 3)  # reference asset: 6,320 faces
    assert tn.shape == (6320, 3, 3)
    ln = np.linalg.norm(tn.reshape(-1, 3), axis=1)
    assert np.all(ln > 0.99)  # smooth normals generated & unit


def test_procedural_dragon_scale():
    tv, tn = procedural_dragon(num_tris=20_000)
    assert abs(tv.shape[0] - 20_000) < 800
    # fits the reference's +-5 box
    assert np.abs(tv).max() < 5.0
    assert np.isfinite(tv).all() and np.isfinite(tn).all()
