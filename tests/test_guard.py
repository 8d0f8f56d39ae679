"""Device-error surface (utils/guard.py) — the checkCudaErrors analog
(reference: include/helper_cuda_opengl.h:13-44)."""

import dataclasses

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer.utils.guard import (
    RenderCheckError, check_image, checked, find_nonfinite,
)

from conftest import scene_path


def test_find_nonfinite_indices():
    img = np.zeros((4, 5, 3), np.float32)
    img[1, 2, 0] = np.nan
    img[3, 0, 2] = np.inf
    assert find_nonfinite(img) == [(1, 2), (3, 0)]
    assert find_nonfinite(np.ones((2, 2, 3))) == []


def test_check_image_raises_with_indices():
    img = np.zeros((4, 5, 3), np.float32)
    img[2, 3] = np.nan
    with pytest.raises(RenderCheckError, match=r"\(2,3\)"):
        check_image(img, context="scene.yml")
    # clean image passes through
    ok = np.ones((2, 2, 3), np.float32)
    assert check_image(ok) is ok


def test_checked_render_passes_on_real_scene():
    import jax.numpy as jnp

    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("quadratic")), width=32, height=16
    )
    config = RenderConfig(geom_dtype="float32", polish_iters=2, bounces=0,
                          chunk_px=None)
    cam = trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(90.0, jnp.float32),
        pitch_deg=jnp.asarray(0.0, jnp.float32),
    )
    fn = checked(lambda s, c: _render_image_jit(s, c, config))
    img = fn(scene, cam)
    assert np.isfinite(np.asarray(img)).all()


def test_checked_raises_on_device():
    """The finiteness check runs inside the jitted computation and raises
    RenderCheckError at the call site."""
    import jax
    import jax.numpy as jnp

    bad = checked(jax.jit(lambda x: x / x))  # 0/0 -> NaN
    with pytest.raises(RenderCheckError, match="non-finite"):
        bad(jnp.zeros((2, 2, 3)))
    # and a clean call returns the image
    good = checked(jax.jit(lambda x: x + 1.0))
    out = good(jnp.ones((2, 2, 3)))
    assert float(np.asarray(out).min()) == 2.0


def test_cli_render_check_flag(tmp_path):
    from tpu_ray_tracer.cli import main

    out = tmp_path / "img.png"
    rc = main(["render", scene_path("quadratic"), "--size", "32", "16",
               "--check", "-o", str(out)])
    assert rc == 0
    assert out.exists()
