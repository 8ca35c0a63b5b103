"""Host-side image I/O.

Replaces the vendored stb_image_write usage (``main.cpp:396``) with PIL;
the quantization contract lives in ``render.quantize_u8``.
"""

from __future__ import annotations

import numpy as np


def write_png(path: str, img_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as PNG (stbi_write_png equivalent)."""
    from PIL import Image

    assert img_u8.dtype == np.uint8 and img_u8.ndim == 3 and img_u8.shape[2] == 3
    Image.fromarray(img_u8, mode="RGB").save(path)


def read_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))
