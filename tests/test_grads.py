"""Differentiability tests (SURVEY.md §4.3): the implicit-function-theorem
custom VJP on the root solve vs central finite differences, and gradient
flow through the full pipeline (surface coefs, light params, camera pose)."""

import dataclasses

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer.models import surface

from conftest import scene_path


@pytest.fixture(scope="module")
def jaxmod():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def test_ift_vjp_matches_finite_differences(jaxmod, rng):
    jax, jnp = jaxmod
    from tpu_ray_tracer.ops.intersect import intersect_all, valid_hit_mask

    # one sphere + one cubic, rays that hit both regions
    coefs = np.stack([
        surface.sphere((0.0, 0.0, 5.0), 1.5),
        surface.ding_dong((0.0, 0.0, 8.0)),
    ])
    origins = np.zeros((4, 3))
    # keep |dir_y| well away from 0: the ding-dong's only cubic monomial is
    # y^3, so rays with tiny dir_y make t3 ~ EPS and the hit validity
    # becomes discontinuous — FD would straddle the discontinuity.
    dirs = np.stack([
        [0.0, 0.3, 1.0],
        [0.05, 0.25, 1.0],
        [-0.08, -0.3, 1.0],
        [0.02, -0.35, 1.0],
    ])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    def total_t(coefs, origins, dirs):
        t = intersect_all(coefs, origins, dirs, 0)
        return jnp.sum(jnp.where(valid_hit_mask(t), t, 0.0))

    f = jax.jit(jax.grad(total_t, argnums=(0, 1, 2)))
    g_coefs, g_o, g_d = [np.asarray(g) for g in
                         f(jnp.asarray(coefs), jnp.asarray(origins), jnp.asarray(dirs))]

    # finite differences on a handful of coordinates
    val = jax.jit(total_t)
    base_args = (jnp.asarray(coefs), jnp.asarray(origins), jnp.asarray(dirs))
    h = 1e-6

    def fd(arg_idx, index):
        args_hi = [np.array(a, dtype=np.float64) for a in base_args]
        args_lo = [np.array(a, dtype=np.float64) for a in args_hi]
        args_hi[arg_idx][index] += h
        args_lo[arg_idx][index] -= h
        hi = float(val(*[jnp.asarray(a) for a in args_hi]))
        lo = float(val(*[jnp.asarray(a) for a in args_lo]))
        return (hi - lo) / (2 * h)

    checks = [
        (0, (0, surface.COEF_INDEX["c"])),
        (0, (0, surface.COEF_INDEX["x"])),
        (0, (1, surface.COEF_INDEX["y3"])),
        (0, (1, surface.COEF_INDEX["c"])),
        (1, (0, 2)),
        (2, (1, 0)),
    ]
    grads = {0: g_coefs, 1: g_o, 2: g_d}
    for arg_idx, index in checks:
        expected = fd(arg_idx, index)
        got = grads[arg_idx][index]
        # FD truncation dominates near sensitive cubic roots; 1e-3 relative
        # cleanly separates a correct IFT VJP from sign/shape errors.
        assert got == pytest.approx(expected, rel=1e-3, abs=1e-6), (
            f"arg {arg_idx} index {index}: AD {got} vs FD {expected}"
        )


def test_full_pipeline_gradient_vs_fd(jaxmod):
    """Gradient of a pixel-mean loss w.r.t. a surface coefficient through
    trace + shade + shadows, f64 golden config, small frame."""
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

    scene = trt.load_from_file(scene_path("quadratic"))
    scene = dataclasses.replace(scene, width=16, height=12)
    config = RenderConfig(geom_dtype="float64", polish_iters=0, bounces=0,
                          chunk_px=None)
    camera = trt.Camera.initial(jnp.float64)
    scene64 = scene.astype(jnp.float64)

    def loss(coefs):
        s = dataclasses.replace(scene64, coefs=coefs)
        img = _render_image_jit(s, camera, config)
        return jnp.mean(img)

    coefs0 = jnp.asarray(scene64.coefs)
    g = np.asarray(jax.jit(jax.grad(loss))(coefs0))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    idx = (0, surface.COEF_INDEX["c"])
    h = 1e-5
    c_hi = np.array(coefs0); c_hi[idx] += h
    c_lo = np.array(coefs0); c_lo[idx] -= h
    lf = jax.jit(loss)
    fd = (float(lf(jnp.asarray(c_hi))) - float(lf(jnp.asarray(c_lo)))) / (2 * h)
    assert g[idx] == pytest.approx(fd, rel=5e-3, abs=1e-8)


def test_camera_pose_gradient_flows(jaxmod):
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("20spheres")), width=16, height=12
    )
    config = RenderConfig(geom_dtype="float64", polish_iters=0, bounces=0,
                          chunk_px=None)
    scene64 = scene.astype(jnp.float64)

    def loss(yaw):
        cam = trt.Camera(
            position=jnp.zeros(3, jnp.float64),
            yaw_deg=yaw,
            pitch_deg=jnp.asarray(0.0, jnp.float64),
        )
        return jnp.mean(_render_image_jit(scene64, cam, config))

    g = float(jax.jit(jax.grad(loss))(jnp.asarray(90.0, jnp.float64)))
    assert np.isfinite(g)

    h = 1e-4
    lf = jax.jit(loss)
    fd = (float(lf(jnp.asarray(90.0 + h))) - float(lf(jnp.asarray(90.0 - h)))) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-2, abs=1e-7)


def test_light_gradient_flows(jaxmod):
    jax, jnp = jaxmod
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

    scene = dataclasses.replace(
        trt.load_from_file(scene_path("monkey_saddle")), width=16, height=12
    )
    config = RenderConfig(geom_dtype="float64", polish_iters=0, bounces=0,
                          chunk_px=None)
    scene64 = scene.astype(jnp.float64)

    def loss(light_color):
        s = dataclasses.replace(scene64, light_color=light_color)
        return jnp.mean(_render_image_jit(s, camera=trt.Camera.initial(jnp.float64),
                                          config=config))

    g = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(scene64.light_color)))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
