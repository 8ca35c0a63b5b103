"""kd-tree build + traversal tests: structural invariants of the SAH
builder and exact agreement of the wavefront traversal with brute force
(the traversal's oracle), plus end-to-end kd-vs-brute renders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.accel._kdtree_np import LEAF_FLAG, build, perm_from_prim_nums
from dod_raytracer_tpu.mesh import load_mesh_asset, procedural_dragon
from dod_raytracer_tpu.ops.traverse import kd_any, kd_closest
from dod_raytracer_tpu.ops.triangle import brute_force_closest, occluded_triangles_brute
from dod_raytracer_tpu.scene import SceneBuilder


@pytest.fixture(scope="module")
def teapot():
    return load_mesh_asset("teapot")


@pytest.fixture(scope="module")
def teapot_scene(teapot):
    cfg = Config(use_kdtree=True)
    b = SceneBuilder()
    b.add_mesh(*teapot)
    b.add_light((0, 3, -3), 3.0)
    return b.build(cfg), cfg


def random_rays(n, seed=0, spread=6.0):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3), dtype=np.float32) * 2 - 1) * spread
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


class TestBuilder:
    def test_structure_invariants(self, teapot):
        tv, _ = teapot
        built = build(tv)
        M = built.node_flag.shape[0]
        leaves = built.node_flag == LEAF_FLAG
        interior = ~leaves
        # right children point forward and within bounds (preorder layout)
        ri = built.node_right[interior]
        assert (ri > np.nonzero(interior)[0]).all() and (ri < M).all()
        # every leaf's lane span is inside prim_nums
        ends = built.node_leaf_start[leaves] + built.node_leaf_lanes[leaves]
        assert (ends <= built.prim_nums.shape[0]).all()
        # leaf spans exactly tile prim_nums (contiguous, in order)
        spans = sorted(zip(built.node_leaf_start[leaves], ends))
        pos = 0
        for s, e in spans:
            assert s == pos
            pos = e
        assert pos == built.prim_nums.shape[0]
        # all lanes appear in at least one leaf (no lost primitives)
        num_lanes = (tv.shape[0] + 7) // 8
        assert np.unique(built.prim_nums).shape[0] == num_lanes

    def test_world_bounds(self, teapot):
        tv, _ = teapot
        built = build(tv)
        np.testing.assert_allclose(built.bounds_min, tv.reshape(-1, 3).min(0), atol=1e-6)
        np.testing.assert_allclose(built.bounds_max, tv.reshape(-1, 3).max(0), atol=1e-6)

    def test_perm_expansion(self):
        prim_nums = np.array([2, 0], np.int32)
        perm = perm_from_prim_nums(prim_nums, num_tris=18, lane_size=8)
        np.testing.assert_array_equal(perm[:8], [16, 17, -1, -1, -1, -1, -1, -1])
        np.testing.assert_array_equal(perm[8:], np.arange(8))

    def test_single_lane_mesh_is_leaf_root(self):
        rng = np.random.default_rng(1)
        tv = rng.standard_normal((5, 3, 3)).astype(np.float32)
        built = build(tv)
        assert built.node_flag.shape[0] == 1 and built.node_flag[0] == LEAF_FLAG


class TestTraversal:
    def test_matches_brute_force(self, teapot_scene):
        scene, cfg = teapot_scene
        o, d = random_rays(1024, seed=3)
        t_max = jnp.full((1024,), jnp.inf)
        t_kd, prim_kd, hit_kd = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_bf, prim_bf = brute_force_closest(scene.triangles.verts, o, d)
        hit_bf = t_bf < t_max
        np.testing.assert_array_equal(np.asarray(hit_kd), np.asarray(hit_bf))
        h = np.asarray(hit_kd)
        np.testing.assert_allclose(np.asarray(t_kd)[h], np.asarray(t_bf)[h], rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(prim_kd)[h], np.asarray(prim_bf)[h])

    def test_clipped_t_max(self, teapot_scene):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=4)
        t_max = jnp.full((512,), 4.0)
        t_kd, _, hit_kd = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_bf, _ = brute_force_closest(scene.triangles.verts, o, d)
        np.testing.assert_array_equal(np.asarray(hit_kd), np.asarray(t_bf < 4.0))
        h = np.asarray(hit_kd)
        np.testing.assert_allclose(np.asarray(t_kd)[h], np.asarray(t_bf)[h])

    def test_any_hit(self, teapot_scene):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=5)
        t_max = jnp.full((512,), 5.0)
        a_kd = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
        a_bf = occluded_triangles_brute(scene.triangles.verts, o, d, t_max)
        np.testing.assert_array_equal(np.asarray(a_kd), np.asarray(a_bf))

    def test_rays_from_inside_bbox(self, teapot_scene):
        scene, cfg = teapot_scene
        o, d = random_rays(256, seed=6, spread=1.5)  # inside the teapot bounds
        t_max = jnp.full((256,), jnp.inf)
        t_kd, _, hit_kd = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_bf, _ = brute_force_closest(scene.triangles.verts, o, d)
        np.testing.assert_array_equal(np.asarray(hit_kd), np.asarray(t_bf < np.inf))
        h = np.asarray(hit_kd)
        np.testing.assert_allclose(np.asarray(t_kd)[h], np.asarray(t_bf)[h])


class TestBinnedTraversal:
    """The binned (sort + Pallas block kernel) leaf stage must agree exactly
    with the gather traversal — same per-ray block processing order, same
    strict-min tie-break (SURVEY.md §7 hard part #1 wavefront regrouping)."""

    @pytest.fixture(scope="class")
    def binned_cfg(self):
        return Config(use_kdtree=True, traversal_backend="binned")

    def test_closest_matches_gather(self, teapot_scene, binned_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=3)
        t_max = jnp.full((512,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_b, prim_b, hit_b = kd_closest(scene.kd, scene.triangles, o, d, t_max, binned_cfg)
        np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_g))
        h = np.asarray(hit_g)
        # Plücker t differs from Möller–Trumbore t only by float reassociation
        np.testing.assert_allclose(np.asarray(t_b)[h], np.asarray(t_g)[h], rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(prim_b)[h], np.asarray(prim_g)[h])

    def test_any_hit_matches_gather(self, teapot_scene, binned_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=5)
        t_max = jnp.full((512,), 5.0)
        a_g = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
        a_b = kd_any(scene.kd, scene.triangles, o, d, t_max, binned_cfg)
        np.testing.assert_array_equal(np.asarray(a_b), np.asarray(a_g))

    def test_unaligned_ray_count_padding(self, teapot_scene, binned_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(300, seed=7)  # not a multiple of tile_r=256
        t_max = jnp.full((300,), jnp.inf)
        t_g, _, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_b, _, hit_b = kd_closest(scene.kd, scene.triangles, o, d, t_max, binned_cfg)
        np.testing.assert_array_equal(np.asarray(hit_b), np.asarray(hit_g))
        h = np.asarray(hit_g)
        np.testing.assert_allclose(np.asarray(t_b)[h], np.asarray(t_g)[h], rtol=1e-3)


class TestMegaTraversal:
    """The whole-traversal Pallas megakernel must agree exactly with the
    gather traversal (same walk, same strict-min tie-breaks)."""

    @pytest.fixture(scope="class")
    def mega_cfg(self):
        return Config(use_kdtree=True, traversal_backend="mega")

    def test_closest_matches_gather(self, teapot_scene, mega_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=3)
        t_max = jnp.full((512,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_m, prim_m, hit_m = kd_closest(scene.kd, scene.triangles, o, d, t_max, mega_cfg)
        np.testing.assert_array_equal(np.asarray(hit_m), np.asarray(hit_g))
        h = np.asarray(hit_g)
        # Plücker t differs from Möller–Trumbore t only by float reassociation
        np.testing.assert_allclose(np.asarray(t_m)[h], np.asarray(t_g)[h], rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(prim_m)[h], np.asarray(prim_g)[h])

    def test_clipped_t_max(self, teapot_scene, mega_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(256, seed=4)
        t_max = jnp.full((256,), 4.0)
        t_g, _, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        t_m, _, hit_m = kd_closest(scene.kd, scene.triangles, o, d, t_max, mega_cfg)
        np.testing.assert_array_equal(np.asarray(hit_m), np.asarray(hit_g))
        h = np.asarray(hit_g)
        np.testing.assert_allclose(np.asarray(t_m)[h], np.asarray(t_g)[h], rtol=1e-3)

    def test_any_hit_matches_gather(self, teapot_scene, mega_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(512, seed=5)
        t_max = jnp.full((512,), 5.0)
        a_g = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
        a_m = kd_any(scene.kd, scene.triangles, o, d, t_max, mega_cfg)
        np.testing.assert_array_equal(np.asarray(a_m), np.asarray(a_g))

    def test_rays_from_inside(self, teapot_scene, mega_cfg):
        scene, cfg = teapot_scene
        o, d = random_rays(256, seed=6, spread=1.5)
        t_max = jnp.full((256,), jnp.inf)
        _, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        _, prim_m, hit_m = kd_closest(scene.kd, scene.triangles, o, d, t_max, mega_cfg)
        np.testing.assert_array_equal(np.asarray(hit_m), np.asarray(hit_g))
        h = np.asarray(hit_g)
        np.testing.assert_array_equal(np.asarray(prim_m)[h], np.asarray(prim_g)[h])


def test_render_kd_equals_brute(teapot):
    from dod_raytracer_tpu import render_image

    tv, tn = teapot
    lights = [((0.0, 0.0, -2.0), 3.0), ((4.0, 4.3, 3.3), 1.0)]

    def build_scene(use_kd):
        cfg = Config(Width=48, Height=32, use_kdtree=use_kd, ray_tile=2048)
        b = SceneBuilder()
        b.add_mesh(tv, tn)
        b.add_plane((0.0, 0.0, 5.0), (0.0, 0.0, -1.0), (0.2, 0.4, 0.6))
        for p, i in lights:
            b.add_light(p, i)
        return b.build(cfg), cfg

    s_kd, cfg_kd = build_scene(True)
    s_bf, cfg_bf = build_scene(False)
    img_kd = np.asarray(render_image(s_kd, cfg_kd))
    img_bf = np.asarray(render_image(s_bf, cfg_bf))
    np.testing.assert_allclose(img_kd, img_bf, atol=1e-5)


class TestForestTraversal:
    """The treelet-forest Pallas kernel (big trees: VMEM-windowed treelet
    tables + compact top tree) must agree exactly with the gather traversal
    — the two-level walk preserves visit order, t_max tightening and
    strict-min tie-breaks via the LIFO subtree property."""

    @pytest.fixture(scope="class")
    def forest_scene(self, teapot):
        # treelet_cap=128 forces a real forest out of the ~300-node teapot
        # tree (several treelets + a non-trivial top tree), exercising the
        # same code path the dragon takes at MAX_NODES
        cfg = Config(use_kdtree=True, treelet_cap=128,
                     traversal_backend="forest")
        b = SceneBuilder()
        b.add_mesh(*teapot)
        b.add_light((0, 3, -3), 3.0)
        scene = b.build(cfg)
        assert scene.kd.tre_tbl is not None and scene.kd.tre_tbl.shape[0] > 1
        assert scene.kd.top_tbl is not None
        return scene, cfg

    @pytest.fixture(scope="class")
    def gather_cfg(self):
        return Config(use_kdtree=True, treelet_cap=128,
                      traversal_backend="xla")

    def test_closest_matches_gather(self, forest_scene, gather_cfg):
        scene, cfg = forest_scene
        o, d = random_rays(512, seed=3)
        t_max = jnp.full((512,), jnp.inf)
        t_g, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, gather_cfg)
        t_f, prim_f, hit_f = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        np.testing.assert_array_equal(np.asarray(hit_f), np.asarray(hit_g))
        h = np.asarray(hit_g)
        # Plücker t differs from Möller–Trumbore t only by float reassociation
        np.testing.assert_allclose(np.asarray(t_f)[h], np.asarray(t_g)[h], rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(prim_f)[h], np.asarray(prim_g)[h])

    def test_clipped_t_max(self, forest_scene, gather_cfg):
        scene, cfg = forest_scene
        o, d = random_rays(256, seed=4)
        t_max = jnp.full((256,), 4.0)
        t_g, _, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, gather_cfg)
        t_f, _, hit_f = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        np.testing.assert_array_equal(np.asarray(hit_f), np.asarray(hit_g))
        h = np.asarray(hit_g)
        np.testing.assert_allclose(np.asarray(t_f)[h], np.asarray(t_g)[h], rtol=1e-3)

    def test_any_hit_matches_gather(self, forest_scene, gather_cfg):
        scene, cfg = forest_scene
        o, d = random_rays(512, seed=5)
        t_max = jnp.full((512,), 5.0)
        a_g = kd_any(scene.kd, scene.triangles, o, d, t_max, gather_cfg)
        a_f = kd_any(scene.kd, scene.triangles, o, d, t_max, cfg)
        np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_g))

    def test_rays_from_inside(self, forest_scene, gather_cfg):
        scene, cfg = forest_scene
        o, d = random_rays(256, seed=6, spread=1.5)
        t_max = jnp.full((256,), jnp.inf)
        _, prim_g, hit_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, gather_cfg)
        _, prim_f, hit_f = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg)
        np.testing.assert_array_equal(np.asarray(hit_f), np.asarray(hit_g))
        h = np.asarray(hit_g)
        np.testing.assert_array_equal(np.asarray(prim_f)[h], np.asarray(prim_g)[h])

    def test_top_table_structure(self, teapot):
        from dod_raytracer_tpu.accel._kdtree_np import (
            TOP_LEAF_FLAG, build, align_leaves, build_top_table, cut_treelets)

        tv, _ = teapot
        built = align_leaves(build(tv), 8)
        roots, sizes = cut_treelets(built, 128)
        assert (sizes <= 128).all()
        top = build_top_table(built, roots)
        flags = top[:, 0]
        n_super = int((flags == TOP_LEAF_FLAG).sum())
        assert n_super == len(roots)
        # treelets + the top interiors partition the node array exactly
        assert sizes.sum() + (n_super - 1) == built.node_flag.shape[0]
        # a binary top tree over T super-leaves has T-1 interiors;
        # padding rows are zero (axis-0 interior) but unreachable
        n_top_rows = n_super + (n_super - 1)
        interior = flags[:n_top_rows] != TOP_LEAF_FLAG
        # right links point forward within the top table
        ri = top[:n_top_rows, 2][interior].astype(np.int64)
        assert (ri > np.nonzero(interior)[0]).all() and (ri < n_top_rows).all()
        # super-leaf treelet ids are a permutation of range(T)
        tre_ids = np.sort(top[:n_top_rows, 3][~interior].astype(np.int64))
        np.testing.assert_array_equal(tre_ids, np.arange(len(roots)))


def test_forest_matches_gather_at_scale():
    """Dragon-shaped mesh big enough to overflow MAX_NODES (the real
    production cut): forest backend must agree exactly with the gather
    walk, closest and any-hit (VERDICT r1 item 1)."""
    from dod_raytracer_tpu.mesh import procedural_dragon
    from dod_raytracer_tpu.ops.traverse import _backend

    tv, tn = procedural_dragon(num_tris=40000)
    cfg_f = Config(use_kdtree=True, MaxPrims=32, leaf_chunk_lanes=32,
                   traversal_backend="forest")
    cfg_x = Config(use_kdtree=True, MaxPrims=32, leaf_chunk_lanes=32,
                   traversal_backend="xla")
    b = SceneBuilder()
    b.add_mesh(tv, tn)
    b.add_light((0, 3, -3), 3.0)
    scene = b.build(cfg_f)
    assert scene.kd.node_flag.shape[0] > 1024  # genuinely past the mega gate
    assert _backend(scene.kd, cfg_f) == "forest"

    o, d = random_rays(256, seed=3)
    t_max = jnp.full((256,), jnp.inf)
    t_g, p_g, h_g = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg_x)
    t_f, p_f, h_f = kd_closest(scene.kd, scene.triangles, o, d, t_max, cfg_f)
    np.testing.assert_array_equal(np.asarray(h_f), np.asarray(h_g))
    h = np.asarray(h_g)
    assert h.sum() > 0
    np.testing.assert_allclose(np.asarray(t_f)[h], np.asarray(t_g)[h], rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(p_f)[h], np.asarray(p_g)[h])
    a_g = kd_any(scene.kd, scene.triangles, o, d, jnp.full((256,), 5.0), cfg_x)
    a_f = kd_any(scene.kd, scene.triangles, o, d, jnp.full((256,), 5.0), cfg_f)
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(a_g))


def test_brute_threshold_crossover_exact(teapot):
    """brute_threshold reroutes small meshes around the kd walk; the jnp
    brute intersector shares the MT formula so renders stay bit-exact."""
    from dod_raytracer_tpu import render_image

    tv, tn = teapot

    def build_scene(thr):
        cfg = Config(Width=48, Height=32, use_kdtree=True, ray_tile=2048,
                     brute_threshold=thr)
        b = SceneBuilder()
        b.add_mesh(tv, tn)
        b.add_plane((0.0, 0.0, 5.0), (0.0, 0.0, -1.0), (0.2, 0.4, 0.6))
        b.add_light((0.0, 0.0, -2.0), 3.0)
        return b.build(cfg), cfg

    s_kd, cfg_kd = build_scene(0)
    s_bt, cfg_bt = build_scene(10_000)  # teapot (6,320 tris) under threshold
    img_kd = np.asarray(render_image(s_kd, cfg_kd))
    img_bt = np.asarray(render_image(s_bt, cfg_bt))
    np.testing.assert_allclose(img_kd, img_bt, atol=1e-6)
