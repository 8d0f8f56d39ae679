"""Reflection-chain semantics under deep bounces: a mirror corridor (two
facing reflective planes) forces the chain to the max_reflections cap,
exercising the reference's cumulative-ratio blend and at-cap background
absorption (reference: src/update-cpu.cpp:96-117) in both renderers."""

import dataclasses

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer.render import reference_cpu as ref

CORRIDOR = """
width: 32
height: 24
fov: 40
bg_color: [0.9, 0.2, 0.1]
max_reflections: {max_reflections}
objects:
  - {{type: plane, origin: [-3, 0, 0], normal: [1, 0, 0], color: [0.2, 0.8, 0.2], reflection_ratio: 0.8}}
  - {{type: plane, origin: [3, 0, 0], normal: [-1, 0, 0], color: [0.2, 0.2, 0.8], reflection_ratio: 0.8}}
  - {{type: sphere, center: [0, 0, 12], radius: 2, color: [0.9, 0.9, 0.2]}}
light_sources:
  - {{type: directional, direction: [0.2, -1, 0.3], color: [1, 1, 1], intensity: 2}}
"""


def _scene(max_reflections):
    return trt.load_from_string(CORRIDOR.format(max_reflections=max_reflections))


def test_cap_changes_image():
    """With mirrors at ratio 0.8 the chain survives to the cap: raising
    max_reflections must change the image (more corridor bounces resolved)."""
    shallow = ref.render_image_np(_scene(1))
    deep = ref.render_image_np(_scene(5))
    assert np.abs(shallow - deep).max() > 0.01


def test_fast_path_matches_golden_at_cap():
    import jax.numpy as jnp

    for max_reflections in (1, 3, 5):
        scene = _scene(max_reflections)
        gold = ref.render_image_np(scene)
        fast = np.asarray(trt.render_image(
            scene,
            config=dataclasses.replace(trt.FAST_CONFIG, chunk_px=None),
        ))
        err = np.abs(fast - gold).max(axis=-1)
        frac = float((err > 2.0 / 255.0).mean())
        assert frac <= 0.02, (max_reflections, frac, err.max())


def test_zero_reflectivity_ignores_max_reflections():
    """Non-reflective variant: the loop never enters, so max_reflections is
    irrelevant (loop-entry condition, reference update-cpu.cpp:97)."""
    scene = _scene(5)
    no_refl = dataclasses.replace(
        scene, reflection=np.zeros_like(np.asarray(scene.reflection))
    )
    a = ref.render_image_np(no_refl)
    b = ref.render_image_np(dataclasses.replace(no_refl, max_reflections=1))
    np.testing.assert_array_equal(a, b)
