"""Soft-visibility inverse rendering (diff/soft.py).

Pins the BASELINE.json stretch configuration the r1 verdict called out:
recovering a perturbed Clebsch surface constant term (0.8 -> 1.0) by
gradient descent. The hard render's IFT gradient points AWAY from the truth
on both sides of that minimum (the loss trend is carried by root-pair
creation/annihilation jumps — see ARCHITECTURE.md); the soft render blends
across those events using the cubic discriminant, restoring a usable
descent direction.
"""

import dataclasses

import numpy as np
import pytest

import tpu_ray_tracer as trt
from tpu_ray_tracer.models.surface import COEF_INDEX

from conftest import scene_path


@pytest.fixture(scope="module")
def jaxmod():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _clebsch(width=32, height=24):
    return dataclasses.replace(
        trt.load_from_file(scene_path("clebsch")), width=width, height=height
    )


def test_soft_render_converges_to_hard(jaxmod):
    """As tau -> 0 the soft render equals the hard pipeline away from
    pair-event boundaries (and everywhere on a quadric-only scene, where
    there is no pair concept at all)."""
    jax, jnp = jaxmod
    from tpu_ray_tracer.diff.soft import render_rays_soft
    from tpu_ray_tracer.render.pipeline import RenderConfig, render_image
    from tpu_ray_tracer.render.reference_cpu import camera_rays_np

    config = RenderConfig(geom_dtype="float32", polish_iters=2, bounces=0,
                          chunk_px=None)
    for name in ("clebsch", "quadratic"):
        scene = dataclasses.replace(
            trt.load_from_file(scene_path(name)), width=32, height=24
        )
        hard = np.asarray(render_image(scene, config=config))
        o_np, d_np = camera_rays_np(scene)
        s32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
        soft = np.asarray(render_rays_soft(
            s32, jnp.asarray(o_np, jnp.float32), jnp.asarray(d_np, jnp.float32),
            polish_iters=2, tau=1e-4,
        ))
        frac = (np.abs(soft - hard).max(-1) > 2.0 / 255.0).mean()
        assert frac < 0.02, f"{name}: {frac:.4f}"


def test_recover_clebsch_constant_term_by_descent(jaxmod):
    """The literal BASELINE.json inverse configuration: the Clebsch surface
    constant term, perturbed 1.0 -> 0.8, recovered by Adam on the
    soft-visibility loss (tau = 0.15) through the sharded loss pipeline.
    The hard loss stalls here by construction (its a.e. gradient has the
    wrong sign on both branches — measured in-session and documented in
    ARCHITECTURE.md)."""
    jax, jnp = jaxmod
    import optax

    from tpu_ray_tracer.diff.inverse import (
        InverseProblem, make_loss_fn, pad_target,
    )
    from tpu_ray_tracer.parallel.sharding import make_mesh, render_image_sharded
    from tpu_ray_tracer.render.pipeline import RenderConfig

    mesh = make_mesh()
    config = RenderConfig(geom_dtype="float32", polish_iters=2, bounces=0,
                          chunk_px=None)
    scene = _clebsch()
    camera = trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(90.0, jnp.float32),
        pitch_deg=jnp.asarray(0.0, jnp.float32),
    )
    target = render_image_sharded(scene, camera, mesh, config)
    tgt = pad_target(jnp.asarray(target, jnp.float32), mesh, scene.height)

    problem = InverseProblem(scene_template=scene, config=config,
                             param_fields=("coefs",), soft_tau=0.15)
    loss_fn = make_loss_fn(problem, mesh)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    ci = COEF_INDEX["c"]
    mask = np.zeros((1, 20), np.float32)
    mask[0, ci] = 1.0
    mask = jnp.asarray(mask)
    c0 = np.asarray(scene.coefs, np.float32).copy()
    c0[0, ci] = 0.8
    coefs = jnp.asarray(c0)
    opt = optax.adam(2e-2)
    st = opt.init(coefs)
    first_loss = None
    for _ in range(100):
        loss, g = vg({"coefs": coefs}, camera, tgt)
        if first_loss is None:
            first_loss = float(loss)
        up, st = opt.update(g["coefs"] * mask, st)
        coefs = optax.apply_updates(coefs, up)
    c_final = float(coefs[0, ci])
    assert np.isfinite(c_final)
    assert abs(c_final - 1.0) < 0.03, f"recovered c = {c_final}"
    assert float(loss) < first_loss * 0.5
