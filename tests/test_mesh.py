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


# ---------------- PLY importer (reference CMakeLists.txt:36-46) ----------------

_PLY_ASCII = """ply
format ascii 1.0
comment made by test
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
0 1 0
1 1 0
3 0 1 2
3 1 3 2
"""


def _write_binary_ply(path, verts, faces, endian="<", normals=None):
    import struct

    fmt_name = ("binary_little_endian" if endian == "<"
                else "binary_big_endian")
    props = ["property float x", "property float y", "property float z"]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    header = (
        "ply\nformat {} 1.0\nelement vertex {}\n{}\n"
        "element face {}\nproperty list uchar int vertex_indices\nend_header\n"
    ).format(fmt_name, len(verts), "\n".join(props), len(faces))
    with open(path, "wb") as f:
        f.write(header.encode())
        for i, v in enumerate(verts):
            row = list(v) + (list(normals[i]) if normals is not None else [])
            f.write(struct.pack(endian + "f" * len(row), *row))
        for face in faces:
            f.write(struct.pack(endian + "B" + "i" * len(face), len(face), *face))


def test_load_ply_ascii_matches_obj(tmp_path):
    from dod_raytracer_tpu.mesh import load_ply

    p = tmp_path / "quad.ply"
    p.write_text(_PLY_ASCII)
    v, f, vn = load_ply(str(p))
    assert vn is None
    po = tmp_path / "quad.obj"
    po.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3\nf 2 4 3\n")
    vo, fo, _ = load_obj(str(po), use_native=False)
    np.testing.assert_array_equal(v, vo)
    np.testing.assert_array_equal(f, fo)


def test_load_ply_binary_roundtrip(tmp_path):
    from dod_raytracer_tpu.mesh import load_ply

    rng = np.random.default_rng(3)
    verts = rng.standard_normal((9, 3)).astype(np.float32)
    faces = [(0, 1, 2), (2, 3, 4, 5), (6, 7, 8)]  # quad fan-triangulates
    for endian in ("<", ">"):
        p = tmp_path / f"m{endian == '<'}.ply"
        _write_binary_ply(str(p), verts, faces, endian=endian)
        v, f, vn = load_ply(str(p))
        np.testing.assert_array_equal(v, verts)
        assert f.shape == (4, 3)
        np.testing.assert_array_equal(f[1], (2, 3, 4))
        np.testing.assert_array_equal(f[2], (2, 4, 5))


def test_load_ply_vertex_normals_and_load_mesh(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (3, 1))
    p = tmp_path / "tri.ply"
    _write_binary_ply(str(p), verts, [(0, 1, 2)], normals=normals)
    tv, tn = load_mesh(str(p))
    assert tv.shape == (1, 3, 3) and tn.shape == (1, 3, 3)
    np.testing.assert_array_equal(tv[0], verts)
    np.testing.assert_array_equal(tn[0], normals)


def test_load_mesh_ply_equals_obj_pipeline(tmp_path):
    tv_o, tn_o = load_mesh_asset("teapot")
    # re-export a slice of the teapot as PLY (positions only) and compare
    # the full join+smooth pipeline output between formats
    sub = tv_o[:64].reshape(-1, 3)
    verts, inv = np.unique(sub, axis=0, return_inverse=True)
    faces = inv.reshape(-1, 3)
    p = tmp_path / "sub.ply"
    _write_binary_ply(str(p), verts.astype(np.float32), faces.tolist())
    po = tmp_path / "sub.obj"
    with open(po, "w") as f:
        for v in verts:
            f.write("v {} {} {}\n".format(*(repr(float(x)) for x in v)))
        for a, b, c in faces:
            f.write(f"f {a+1} {b+1} {c+1}\n")
    tv_p, tn_p = load_mesh(str(p))
    tv_q, tn_q = load_mesh(str(po))
    np.testing.assert_allclose(tv_p, tv_q, rtol=1e-6)
    np.testing.assert_allclose(tn_p, tn_q, rtol=1e-5, atol=1e-6)
