"""CLI driver + image IO coverage: the reference binary's main() surface
(config.ini load, scene build, render, PNG write — main.cpp:349-397) as
exposed by cli.main, plus quantize/write/read round-trips."""

import numpy as np
import pytest

from dod_raytracer_tpu.io import write_png
from dod_raytracer_tpu.render import quantize_u8


def test_quantize_clamps_and_truncates():
    img = np.array([[[-0.5, 0.0, 0.25], [0.999, 1.0, 2.0]]], np.float32)
    q = quantize_u8(img)
    # clamp(c*255, 0, 255) then truncating cast (main.cpp:168-171)
    np.testing.assert_array_equal(q, [[[0, 0, 63], [254, 255, 255]]])
    assert q.dtype == np.uint8


def test_png_round_trip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_cli_end_to_end(tmp_path, capsys):
    from PIL import Image

    from dod_raytracer_tpu.cli import main

    ini = tmp_path / "config.ini"
    ini.write_text("Width: 40\nHeight: 24\n")
    out = tmp_path / "out.png"
    rc = main(["--config", str(ini), "--output", str(out),
               "--mesh", "none", "--depth", "3", "--seed", "1"])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (24, 40, 3)
    assert img.max() > 10  # rendered something, not a black frame
    assert "rendered 40x24" in capsys.readouterr().out


def test_cli_rejects_unknown_config_key():
    from dod_raytracer_tpu.config import Config

    with pytest.raises(KeyError):
        Config.load(None, NotAKey=3)
