"""Native (C++) scene loader vs the Python loader on the full corpus,
including error paths (reference: src/scene.cpp semantics through the
C ABI)."""

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer import native
from tpu_ray_tracer.models.errors import SceneError

from conftest import SCENE_NAMES, scene_path

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for libtrtscene"
)


@pytest.mark.parametrize("name", SCENE_NAMES)
def test_native_matches_python_loader(name):
    a = native.load_from_file(scene_path(name))
    b = trt.load_from_file(scene_path(name))
    assert (a.width, a.height, a.max_reflections) == (
        b.width, b.height, b.max_reflections
    )
    np.testing.assert_allclose(np.asarray(a.coefs), np.asarray(b.coefs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.colors), np.asarray(b.colors))
    np.testing.assert_allclose(np.asarray(a.reflection), np.asarray(b.reflection))
    np.testing.assert_allclose(np.asarray(a.light_p), np.asarray(b.light_p), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(a.light_color), np.asarray(b.light_color), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.light_is_spherical), np.asarray(b.light_is_spherical)
    )
    np.testing.assert_allclose(np.asarray(a.bg_color), np.asarray(b.bg_color))
    assert float(np.asarray(a.tan_half_fov)) == pytest.approx(
        float(np.asarray(b.tan_half_fov)), rel=1e-12
    )


def test_native_missing_file():
    with pytest.raises(SceneError, match="Cannot read the file"):
        native.load_from_file("/nonexistent/scene.yml")


def test_native_missing_key(tmp_path):
    path = tmp_path / "bad.yml"
    path.write_text("width: 10\nheight: 10\nobjects: []\nlight_sources: []\n")
    with pytest.raises(SceneError, match="Value 'fov' undefined"):
        native.load_from_file(str(path))


def test_native_unknown_surface(tmp_path):
    path = tmp_path / "bad.yml"
    path.write_text(
        "width: 10\nheight: 10\nfov: 30\n"
        "objects:\n  - {type: torus, color: [1, 0, 0]}\nlight_sources: []\n"
    )
    with pytest.raises(SceneError, match="Unknown surface type: 'torus'"):
        native.load_from_file(str(path))


def test_native_negative_radius(tmp_path):
    path = tmp_path / "bad.yml"
    path.write_text(
        "width: 10\nheight: 10\nfov: 30\n"
        "objects:\n  - {type: sphere, radius: -2, color: [1, 0, 0]}\n"
        "light_sources: []\n"
    )
    with pytest.raises(SceneError, match="Negative value for sphere radius"):
        native.load_from_file(str(path))


def test_native_block_style_scene(tmp_path):
    """Block-style (reference formatting) parses identically to flow style."""
    path = tmp_path / "block.yml"
    path.write_text("""
width: 320
height: 200
fov: 45
bg_color: [0, 0.1, 0.2]
objects:
  - type: sphere
    center: [1, 2, 3]
    radius: 2
    color: [0.5, 0.5, 0.5]
    reflection_ratio: 0.25
  - type: polynomial
    coefficients:
      x3: 1
      y: 10
      c: 5
    color: [0.8, 0.8, 0.8]
light_sources:
  - type: directional
    intensity: 3
    direction: [0.8, -0.3, 0.2]
    color: [1, 1, 1]
  - type: spherical
    intensity: 800
    position: [0, 4, 4]
    color: [1, 0.8, 0.4]
""")
    a = native.load_from_file(str(path))
    b = trt.load_from_file(str(path))
    np.testing.assert_allclose(np.asarray(a.coefs), np.asarray(b.coefs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.reflection), np.asarray(b.reflection))
    np.testing.assert_allclose(
        np.asarray(a.light_color), np.asarray(b.light_color), rtol=1e-6
    )
