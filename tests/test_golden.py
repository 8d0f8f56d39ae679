"""Golden-image parity: the JAX fast path (f32 + Newton polish) vs the
NumPy float64 golden renderer, on all 8 reference scenes at reduced
resolution (SURVEY.md §4.1) and at the reference's initial camera pose.

Tolerance model: geometry in f32 cannot be bitwise-equal to f64; we require
(a) small max color error away from decision boundaries, via a fraction-of-
pixels bound at the CUDA path's quantization step (2/255), and (b) exact
agreement of the vast majority of pixels.
"""

import dataclasses

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer.render import reference_cpu as ref

from conftest import SCENE_NAMES, scene_path

SMALL_W, SMALL_H = 64, 48
# Allowed fraction of pixels whose max channel error exceeds 2/255 —
# decision-boundary pixels (silhouettes, shadow edges) flip under f32.
MAX_BAD_FRACTION = 0.01


def _small(scene):
    return dataclasses.replace(scene, width=SMALL_W, height=SMALL_H)


@pytest.fixture(scope="module")
def fast_config():
    return dataclasses.replace(trt.FAST_CONFIG, chunk_px=None)


@pytest.mark.parametrize("name", SCENE_NAMES)
def test_fast_path_matches_golden(name, fast_config):
    scene = _small(trt.load_from_file(scene_path(name)))
    golden = ref.render_image_np(scene)
    fast = np.asarray(trt.render_image(scene, config=fast_config))
    assert fast.shape == golden.shape == (SMALL_H, SMALL_W, 3)
    assert np.isfinite(fast).all()
    err = np.abs(fast - golden).max(axis=-1)
    bad_fraction = float((err > 2.0 / 255.0).mean())
    assert bad_fraction <= MAX_BAD_FRACTION, (
        f"{name}: {bad_fraction:.4%} pixels off by more than 2/255 "
        f"(max err {err.max():.4f})"
    )


def test_golden_renderer_nonempty_and_bounded():
    for name in SCENE_NAMES:
        scene = _small(trt.load_from_file(scene_path(name)))
        img = ref.render_image_np(scene)
        assert np.isfinite(img).all(), name
        assert (img >= 0).all() and (img <= 1.0).all(), name


def test_background_only_when_camera_faces_away():
    """Yaw 270 looks down -z: all of 20spheres' (bounded) geometry sits at
    z in [13, 18], so the frame must be pure background."""
    scene = _small(trt.load_from_file(scene_path("20spheres")))
    img = ref.render_image_np(scene, yaw_deg=270.0)
    np.testing.assert_allclose(
        img, np.broadcast_to(np.asarray(scene.bg_color), img.shape), atol=1e-6
    )


def test_reflection_chain_darkens_mirror_plane():
    """reflection_test: the plane blends in sphere/background color; the
    rendered plane must differ from a no-reflection render of the same
    scene."""
    scene = _small(trt.load_from_file(scene_path("reflection_test")))
    with_refl = ref.render_image_np(scene)
    no_refl = dataclasses.replace(
        scene, reflection=np.zeros_like(np.asarray(scene.reflection))
    )
    without = ref.render_image_np(no_refl)
    assert np.abs(with_refl - without).max() > 0.01
