"""tpu-ray-tracer: a TPU-native differentiable ray tracer in JAX/Pallas.

A from-scratch re-design of the capabilities of JaworWr/CUDA-ray-tracer
(implicit algebraic surfaces of degree <= 3, analytic root solving, Lambertian
shading with shadows and mirror reflections, YAML scenes) built TPU-first:
vectorized batched math lowered by XLA, a fused Pallas tile kernel for the hot
path, implicit-function-theorem custom VJPs for differentiability, and
``shard_map`` pixel-grid sharding for multi-chip scaling.
"""

from .models.loader import load_from_file, load_from_string
from .models.scene import Scene, build_scene
from .models.errors import SceneError
from .ops.camera import Camera
from .render.pipeline import (
    FAST_CONFIG,
    GOLDEN_CONFIG,
    RenderConfig,
    render_image,
    render_rays,
)

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "FAST_CONFIG",
    "GOLDEN_CONFIG",
    "RenderConfig",
    "Scene",
    "SceneError",
    "build_scene",
    "load_from_file",
    "load_from_string",
    "render_image",
    "render_rays",
]
