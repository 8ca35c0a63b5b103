"""Checkpoint/resume tests: scene-parameter round trips and tile-granular
render resume (SURVEY.md §5)."""

import numpy as np

from dod_raytracer_tpu.checkpoint import (
    TiledRenderJob,
    restore_scene_params,
    save_scene_params,
)
from dod_raytracer_tpu.config import Config
from dod_raytracer_tpu.render import render_image
from dod_raytracer_tpu.scene import SceneBuilder


def make_scene(cfg, intensity=3.0):
    b = SceneBuilder()
    b.add_sphere((0.0, 0.0, 2.0), 1.0, (0.9, 0.2, 0.2))
    b.add_plane((0.0, -2.0, 0.0), (0.0, 1.0, 0.0), (0.3, 0.3, 0.6))
    b.add_light((0.0, 3.0, -2.0), intensity)
    return b.build(cfg)


def test_scene_param_roundtrip(tmp_path):
    cfg = Config(Width=16, Height=16, use_kdtree=False)
    scene_a = make_scene(cfg, intensity=3.0)
    scene_b = make_scene(cfg, intensity=7.5)
    path = str(tmp_path / "ckpt.npz")
    save_scene_params(path, scene_a, params=("spheres", "lights"), step=42)
    restored, _, step = restore_scene_params(path, scene_b, params=("spheres", "lights"))
    assert step == 42
    np.testing.assert_allclose(np.asarray(restored.lights.intensity), [3.0])
    np.testing.assert_allclose(np.asarray(restored.spheres.color),
                               np.asarray(scene_a.spheres.color))


def test_tiled_render_resume(tmp_path):
    cfg = Config(Width=24, Height=16, use_kdtree=False, ray_tile=64)
    scene = make_scene(cfg)
    ref = np.asarray(render_image(scene, cfg))

    job = TiledRenderJob(str(tmp_path / "job"), cfg, tile=64)
    # simulate a crash: render only owner-0 tiles of a 2-owner split
    partial = TiledRenderJob(str(tmp_path / "job"), cfg, tile=64, owner=0, num_owners=2)
    assert partial.run(scene) is None  # half the tiles -> not assemblable
    done_before = set(partial.done_tiles())
    assert 0 < len(done_before) < job.num_tiles

    # resume with full ownership: only the missing tiles get rendered
    img = job.run(scene)
    assert img is not None
    np.testing.assert_allclose(img, ref, atol=1e-6)
    assert set(job.done_tiles()) == set(range(job.num_tiles))
