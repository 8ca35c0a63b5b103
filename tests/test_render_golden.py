"""Golden-image tests: the jitted wavefront renderer vs the scalar numpy
oracle, pixel-allclose (SURVEY.md §4; BASELINE.md pixel-parity target)."""

import numpy as np
import pytest

from dod_raytracer_tpu import Config, SceneBuilder, render_image, quantize_u8
from dod_raytracer_tpu.oracle import renderer as oracle


def build_small_scene():
    """BASELINE config 2 style: spheres + walls + cylinder + lights."""
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 2.0), 1.0, (0.9, 0.2, 0.2))
    b.add_sphere((-2.0, 1.0, 3.0), 1.0, (0.2, 0.9, 0.2))
    b.add_sphere((2.0, -1.0, 1.0), 0.7, (0.2, 0.2, 0.9))
    walls = [
        ((0.0, 0.0, -1.0), (0.0, 0.0, 5.0), (0.195, 0.410, 0.610)),
        ((0.0, 0.0, 1.0), (0.0, 0.0, -5.0), (0.493, 0.265, 0.590)),
        ((0.0, -1.0, 0.0), (0.0, 5.0, 0.0), (0.276, 0.600, 0.411)),
        ((0.0, 1.0, 0.0), (0.0, -5.0, 0.0), (0.292, 0.680, 0.674)),
        ((1.0, 0.0, 0.0), (-5.0, 0.0, 0.0), (0.720, 0.288, 0.389)),
        ((-1.0, 0.0, 0.0), (5.0, 0.0, 0.0), (0.680, 0.224, 0.224)),
    ]
    for n, p, c in walls:
        b.add_plane(p, n, c)
    b.add_cylinder((-2.0, 0.0, 2.0), (2.2, 5.0, 2.0), 1.5, 4.0, (0.5, 0.4, 0.1))
    b.add_light((0.0, 0.0, -2.0), 3.0)
    b.add_light((4.0, 4.3, 3.3), 1.0)
    b.add_light((-2.9, 4.2, 3.8), 1.0)
    return b


@pytest.mark.parametrize("size", [(24, 32)])
def test_render_matches_oracle(size):
    h, w = size
    cfg = Config(Width=w, Height=h, use_kdtree=False, ray_tile=1024)
    b = build_small_scene()
    scene = b.build(cfg)
    oscene = oracle.OracleScene.from_builder(b)

    img = np.asarray(render_image(scene, cfg))
    ref = oracle.render(oscene, w, h, eps=cfg.Epsilon, depth=cfg.recursion_depth)

    # float32 associativity differences across 10 bounces: allow small abs tol
    bad = np.abs(img - ref) > 2e-3
    frac_bad = bad.mean()
    assert frac_bad < 0.01, f"{frac_bad:.4%} of channels off; max diff {np.abs(img - ref).max()}"
    # quantized images agree except at most a few edge pixels
    q_jax, q_ref = quantize_u8(img), oracle.quantize_u8(ref)
    diff = (np.abs(q_jax.astype(int) - q_ref.astype(int)) > 1).mean()
    assert diff < 0.01, f"u8 mismatch fraction {diff:.4%}"


def test_render_sphere_lambert_minimal():
    """BASELINE config 1: single sphere + one light."""
    cfg = Config(Width=32, Height=32, use_kdtree=False, ray_tile=1024, recursion_depth=1)
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 2.0), 1.0, (1.0, 0.0, 0.0))
    b.add_light((0.0, 3.0, -2.0), 3.0)
    scene = b.build(cfg)
    oscene = oracle.OracleScene.from_builder(b)
    img = np.asarray(render_image(scene, cfg))
    ref = oracle.render(oscene, 32, 32, depth=1)
    np.testing.assert_allclose(img, ref, atol=1e-4)


def test_miss_is_black_and_bounce_weights():
    cfg = Config(Width=16, Height=16, use_kdtree=False, ray_tile=256)
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 3.0), 0.5, (1.0, 1.0, 1.0))
    b.add_light((0.0, 0.0, -4.0), 5.0)
    scene = b.build(cfg)
    img = np.asarray(render_image(scene, cfg))
    # corner pixels miss everything -> exactly black (main.cpp:303,322-325)
    assert img[0, 0].max() == 0.0
    assert img[-1, -1].max() == 0.0
    # center hits
    assert img[8, 8].max() > 0.0


def test_bounce_skip_render_identical():
    """bounce_skip=True (cond-skip of dead rounds) must be pixel-exact vs
    the plain scan — every bounce update is active-masked, so a skipped
    round is an identity."""
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.mesh import load_mesh_asset
    from dod_raytracer_tpu.scene import SceneBuilder

    tv, tn = load_mesh_asset("teapot")

    def render(skip):
        # OPEN scene (no enclosing box): rays die at the first miss, so
        # skipped rounds actually occur
        cfg = Config(Width=48, Height=32, use_kdtree=True, ray_tile=1536,
                     bounce_skip=skip)
        b = SceneBuilder()
        b.add_mesh(tv, tn)
        b.add_sphere((2.5, 0.0, 1.0), 0.8, (0.9, 0.3, 0.2))
        b.add_light((0.0, 3.0, -3.0), 3.0)
        return np.asarray(render_image(b.build(cfg), cfg))

    np.testing.assert_array_equal(render(True), render(False))


def test_tiling_invariance():
    """render_image must be invariant to ray_tile (the dynamic-slice
    tiling path, incl. the padded last tile, is a pure re-batching of the
    work — BASELINE.md round-3 dispatch restructure).  Tolerance, not
    exact: XLA reduction/fusion order legitimately varies with batch
    shape, and the 10-bounce chain amplifies the last-ulp differences."""
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.scene import default_scene

    imgs = []
    # 31*17=527 rays: prime-ish so small tiles force padding; one tile
    # covers the whole frame at 1024
    for tile in (64, 200, 1024):
        cfg = Config(Width=31, Height=17, use_kdtree=False, ray_tile=tile)
        scene = default_scene(seed=0, cfg=cfg, mesh=None).build(cfg)
        imgs.append(np.asarray(render_image(scene, cfg)))
    np.testing.assert_allclose(imgs[0], imgs[1], atol=2e-4)
    np.testing.assert_allclose(imgs[0], imgs[2], atol=2e-4)


def test_shadow_batch_lights_identical():
    """The flattened (L*N,) shadow walk must match L sequential N-ray
    walks.  The visibility BITS are identical (occlusion is elementwise
    over rays — verified directly); the final image only allclose: XLA
    fuses the (L, N, 3) dist/ldir math differently from the per-light
    (N, 3) layout, and the last-ulp differences (~1e-7 relative at
    depth 1) are amplified by the 10-bounce mirror chain."""
    import jax.numpy as jnp
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.camera import primary_rays
    from dod_raytracer_tpu.intersect import closest_hit
    from dod_raytracer_tpu.render import _FrozenConfig
    from dod_raytracer_tpu.scene import default_scene
    from dod_raytracer_tpu.shading import light_visibility

    imgs, vis = [], []
    for batch in (False, True):
        cfg = Config(Width=24, Height=16, use_kdtree=True, ray_tile=512,
                     shadow_batch_lights=batch)
        scene = default_scene(seed=3, cfg=cfg, mesh="teapot").build(cfg)
        imgs.append(np.asarray(render_image(scene, cfg)))
        fz = _FrozenConfig.from_config(cfg)
        o, d, _ = primary_rays(24, 16)
        hit = closest_hit(scene, o, d, fz,
                          t_max=jnp.full((o.shape[0],), jnp.inf))
        vis.append(np.asarray(light_visibility(scene, hit.point, fz, hit.mask)))

    np.testing.assert_array_equal(vis[0], vis[1])  # bits: exact
    np.testing.assert_allclose(imgs[0], imgs[1], atol=5e-3)


def test_block_ray_order_identical():
    """Screen-block ray order (8x128 packet frustums) is a pure exact
    permutation of the wavefront: render_image output must be bit-identical
    to row-major order (each ray's computation is independent)."""
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.scene import default_scene

    imgs = []
    for block in (False, True):
        cfg = Config(Width=128, Height=16, use_kdtree=False, ray_tile=512,
                     block_ray_order=block)
        scene = default_scene(seed=5, cfg=cfg, mesh=None).build(cfg)
        imgs.append(np.asarray(render_image(scene, cfg)))
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_sort_bounces_identical():
    """Per-bounce ray sorting is an exact permutation (every per-ray
    quantity rides along; inverse applied at the end): output must be
    bit-identical to the unsorted integrator."""
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.scene import default_scene

    imgs = []
    for srt in (False, True):
        cfg = Config(Width=48, Height=24, use_kdtree=True, ray_tile=512,
                     sort_bounces=srt)
        scene = default_scene(seed=6, cfg=cfg, mesh="teapot").build(cfg)
        imgs.append(np.asarray(render_image(scene, cfg)))
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_shadow_reverse_near_identical():
    """Reversed (light-origin) shadow rays test the same segment in exact
    arithmetic; only f32 boundary rounding may flip isolated occluders.
    The images must agree everywhere except a tiny fraction of pixels."""
    import numpy as np

    from dod_raytracer_tpu import Config, render_image
    from dod_raytracer_tpu.scene import default_scene

    imgs = []
    for rev in (False, True):
        cfg = Config(Width=48, Height=24, use_kdtree=True, ray_tile=512,
                     shadow_batch_lights=True, shadow_reverse=rev)
        scene = default_scene(seed=6, cfg=cfg, mesh="teapot").build(cfg)
        imgs.append(np.asarray(render_image(scene, cfg)))
    diff = np.abs(imgs[0] - imgs[1]).max(axis=-1)
    frac = float((diff > 1e-3).mean())
    assert frac < 0.02, f"{frac:.4f} of pixels differ beyond 1e-3"
