"""Native C++ components vs their numpy oracles (identical contracts)."""

import numpy as np
import pytest

from dod_raytracer_tpu.accel import _kdtree_np
from dod_raytracer_tpu.mesh import load_mesh_asset, load_obj

native = pytest.importorskip("dod_raytracer_tpu.native")


def _native_or_skip(name):
    try:
        native._load(name)
    except RuntimeError:
        pytest.skip(f"native lib {name} not buildable")


@pytest.mark.parametrize("seed,ntris", [(0, 100), (1, 999), (2, 4096)])
def test_kd_builder_matches_numpy(seed, ntris):
    _native_or_skip("kdtree_build")
    rng = np.random.default_rng(seed)
    tv = (rng.standard_normal((ntris, 3, 3)) * 2.0).astype(np.float32)
    a = _kdtree_np.build(tv)
    b = native.kdtree_native.build(tv)
    np.testing.assert_array_equal(a.node_flag, b.node_flag)
    np.testing.assert_array_equal(a.node_right, b.node_right)
    np.testing.assert_allclose(a.node_split, b.node_split)
    np.testing.assert_array_equal(a.node_leaf_start, b.node_leaf_start)
    np.testing.assert_array_equal(a.node_leaf_lanes, b.node_leaf_lanes)
    np.testing.assert_array_equal(a.prim_nums, b.prim_nums)
    assert a.max_leaf_lanes == b.max_leaf_lanes
    assert a.max_depth == b.max_depth


def test_kd_builder_teapot():
    _native_or_skip("kdtree_build")
    tv, _ = load_mesh_asset("teapot")
    a = _kdtree_np.build(tv)
    b = native.kdtree_native.build(tv)
    np.testing.assert_array_equal(a.node_flag, b.node_flag)
    np.testing.assert_array_equal(a.prim_nums, b.prim_nums)


def test_objloader_matches_python_teapot():
    _native_or_skip("objloader")
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "assets", "teapot.obj")
    v_py, f_py, n_py = load_obj(path, use_native=False)
    out = native.objloader_native.load_obj(path)
    assert out is not None
    v_c, f_c, n_c = out
    np.testing.assert_allclose(v_c, v_py)
    np.testing.assert_array_equal(f_c, f_py)
    assert (n_c is None) == (n_py is None)


def test_objloader_normals_and_polygons(tmp_path):
    _native_or_skip("objloader")
    p = tmp_path / "poly.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 0 0 -1\n"
        "f 1//1 2//1 3//2 4//2\n"
        "f -4//-2 -3//-2 -2//-1\n"
    )
    v_py, f_py, n_py = load_obj(str(p), use_native=False)
    v_c, f_c, n_c = native.objloader_native.load_obj(str(p))
    np.testing.assert_allclose(v_c, v_py)
    np.testing.assert_array_equal(f_c, f_py)
    np.testing.assert_allclose(n_c, n_py)
