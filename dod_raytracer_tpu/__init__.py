"""dod_raytracer_tpu — a TPU-native differentiable Whitted ray tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
CPU tracer AVassilev98/dod_raytracer (see SURVEY.md): wavefront SoA ray
batching, fused primitive intersection kernels, SAH kd-tree acceleration,
Whitted shading with point lights and shadows, end-to-end differentiability
(pixel loss -> scene-parameter gradients), and multi-chip scaling via
jax.sharding.
"""

from .config import Config
from .scene import Scene, SceneBuilder, default_scene
from .render import render_image, render_rays, quantize_u8
from .intersect import closest_hit, occluded

__all__ = [
    "Config",
    "Scene",
    "SceneBuilder",
    "default_scene",
    "render_image",
    "render_rays",
    "quantize_u8",
    "closest_hit",
    "occluded",
]

__version__ = "0.1.0"
