"""Fused Pallas kernel parity (interpreter mode on CPU) vs the NumPy
golden oracle, including the reflection chain, plus the custom-VJP
gradient path."""

import dataclasses
import os

import numpy as np
import pytest

os.environ.setdefault("TRT_PALLAS_INTERPRET", "1")

import tpu_ray_tracer as trt

from conftest import scene_path


@pytest.fixture(scope="module")
def jaxmod():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _cam(jnp):
    return trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(90.0, jnp.float32),
        pitch_deg=jnp.asarray(0.0, jnp.float32),
    )


@pytest.mark.parametrize("name,max_bad", [
    ("quadratic", 0.0),
    ("dingdong", 0.01),
    ("reflection_test", 0.005),
])
def test_pallas_kernel_matches_golden(jaxmod, name, max_bad):
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pallas_backend import render_image_pallas
    from tpu_ray_tracer.render.reference_cpu import render_image_np

    scene = dataclasses.replace(
        trt.load_from_file(scene_path(name)), width=64, height=48
    )
    img = np.asarray(render_image_pallas(scene, _cam(jnp)))
    gold = render_image_np(scene)
    assert img.shape == gold.shape
    assert np.isfinite(img).all()
    err = np.abs(img - gold).max(axis=-1)
    frac = float((err > 2.0 / 255.0).mean())
    assert frac <= max_bad, f"{name}: {frac:.4%} bad pixels (max err {err.max():.4f})"


def test_pallas_matches_xla_pipeline(jaxmod):
    """Kernel vs the XLA fast path: same algorithm, near-identical output."""
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pallas_backend import render_image_pallas
    from tpu_ray_tracer.render.pipeline import RenderConfig, render_image

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("dingdong")), width=64, height=48
    )
    cam = _cam(jnp)
    a = np.asarray(render_image_pallas(scene, cam))
    b = np.asarray(render_image(
        scene, cam,
        RenderConfig(geom_dtype="float32", polish_iters=3, bounces=0, chunk_px=None),
    ))
    err = np.abs(a - b).max(axis=-1)
    assert float((err > 2.0 / 255.0).mean()) < 0.005


def test_pallas_gradient_path(jaxmod):
    """The pallas render is differentiable (backward via the XLA pipeline)."""
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pallas_backend import render_image_pallas

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("quadratic")), width=32, height=16
    )
    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
    cam = _cam(jnp)

    def loss(coefs):
        s = dataclasses.replace(scene32, coefs=coefs)
        return jnp.mean(render_image_pallas(s, cam))

    g = np.asarray(jax.jit(jax.grad(loss))(scene32.coefs))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
