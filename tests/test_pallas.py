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


def test_pallas_fused_backward_matches_xla(jaxmod):
    """The fused analytic backward kernel (bounces == 0) reproduces
    jax.grad of the XLA pipeline for every differentiable input: surface
    coefficients, object colors, light position/color, background, fov,
    and camera pose. dingdong exercises cubics + both light kinds + the
    degree partition."""
    jax, jnp = jaxmod
    import dataclasses as dc

    from tpu_ray_tracer.render.pallas_backend import render_image_pallas
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

    scene = dc.replace(
        trt.load_from_file(scene_path("dingdong")), width=32, height=16
    )
    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
    cam = trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(90.0, jnp.float32),
        pitch_deg=jnp.asarray(5.0, jnp.float32),
    )
    config = RenderConfig(geom_dtype="float32", polish_iters=3, bounces=0,
                          chunk_px=None)
    # non-uniform cotangent so every pixel's contribution is distinct
    w = jnp.linspace(0.1, 1.0, 32 * 16 * 3).reshape(16, 32, 3)

    def make_loss(render):
        def loss(coefs, lcolor, lp, colors, bgc, thf, pos, yaw, pitch):
            s = dc.replace(scene32, coefs=coefs, light_color=lcolor,
                           light_p=lp, colors=colors, bg_color=bgc,
                           tan_half_fov=thf)
            c = trt.Camera(position=pos, yaw_deg=yaw, pitch_deg=pitch)
            return jnp.sum(w * render(s, c))
        return loss

    args = (scene32.coefs, scene32.light_color, scene32.light_p,
            scene32.colors, scene32.bg_color, scene32.tan_half_fov,
            cam.position, cam.yaw_deg, cam.pitch_deg)
    argnums = tuple(range(len(args)))
    g_pallas = jax.grad(
        make_loss(lambda s, c: render_image_pallas(s, c, bounces=0)), argnums
    )(*args)
    g_xla = jax.grad(
        make_loss(lambda s, c: _render_image_jit(s, c, config)), argnums
    )(*args)

    names = ["coefs", "light_color", "light_p", "colors", "bg", "tanf",
             "pos", "yaw", "pitch"]
    for name, a, b in zip(names, g_pallas, g_xla):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = max(np.abs(b).max(), 1e-6)
        relerr = np.abs(a - b).max() / scale
        # small-magnitude grads (pitch) carry more f32 cancellation noise
        tol = 2e-3 if np.abs(b).max() > 1.0 else 2e-2
        assert relerr < tol, f"{name}: relerr {relerr:.2e}"


def test_pallas_gradient_path(jaxmod):
    """The pallas render is differentiable (fused backward kernel at
    bounces == 0; XLA-pipeline recompute fallback with reflections)."""
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


def test_pallas_gradient_with_reflections(jaxmod):
    """With bounces > 0 the backward falls back to the XLA-pipeline
    recompute; the gradient must stay finite and nonzero."""
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pallas_backend import render_image_pallas

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("reflection_test")), width=32, height=16
    )
    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))

    def loss(coefs):
        s = dataclasses.replace(scene32, coefs=coefs)
        return jnp.mean(render_image_pallas(s, _cam(jnp)))

    g = np.asarray(jax.jit(jax.grad(loss))(scene32.coefs))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
