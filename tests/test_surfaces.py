"""Unit tests for surface factories and the polynomial expansion.

Strategy per SURVEY.md §4.2: factories vs closed forms (reference:
src/surface.cpp), and the ray-restriction expansion validated against direct
polynomial evaluation — two independent code paths that must agree.
"""

import numpy as np
import pytest

from tpu_ray_tracer.models import surface
from tpu_ray_tracer.models.errors import SceneError
from tpu_ray_tracer.render import reference_cpu as ref


def test_coef_order_matches_reference():
    assert surface.COEF_NAMES == (
        "x3", "y3", "z3", "x2y", "xy2", "x2z", "xz2", "y2z", "yz2", "xyz",
        "x2", "y2", "z2", "xy", "xz", "yz", "x", "y", "z", "c",
    )
    assert surface.N_COEFS == 20


def test_sphere_closed_form(rng):
    center = rng.normal(size=3)
    radius = 2.5
    coefs = surface.sphere(center, radius)
    for _ in range(10):
        p = rng.normal(size=3) * 3
        expected = np.dot(p - center, p - center) - radius * radius
        assert surface.evaluate(coefs, p) == pytest.approx(expected, rel=1e-12)


def test_sphere_negative_radius_rejected():
    with pytest.raises(SceneError, match="Negative value for sphere radius"):
        surface.sphere((0, 0, 0), -1.0)


def test_plane_closed_form(rng):
    origin = rng.normal(size=3)
    normal = rng.normal(size=3)
    coefs = surface.plane(origin, normal)
    for _ in range(10):
        p = rng.normal(size=3) * 3
        expected = np.dot(normal, p - origin)
        assert surface.evaluate(coefs, p) == pytest.approx(expected, rel=1e-12, abs=1e-12)


def test_ding_dong_at_origin():
    coefs = surface.ding_dong((0, 0, 0))
    # x^2 + y^3 - y^2 + z^2
    for p in [(1.0, 2.0, 3.0), (0.5, -1.0, 0.25)]:
        x, y, z = p
        assert surface.evaluate(coefs, p) == pytest.approx(
            x * x + y**3 - y * y + z * z, rel=1e-12
        )


def test_ding_dong_translated(rng):
    origin = rng.normal(size=3)
    coefs = surface.ding_dong(origin)
    base = surface.ding_dong((0, 0, 0))
    for _ in range(5):
        p = rng.normal(size=3) * 2
        assert surface.evaluate(coefs, p) == pytest.approx(
            surface.evaluate(base, p - origin), rel=1e-9, abs=1e-9
        )


def test_clebsch_z3_quirk_preserved():
    coefs = surface.clebsch()
    # The reference's double-assignment typo leaves z3 = 0
    # (reference: src/surface.cpp:44).
    assert coefs[surface.COEF_INDEX["x3"]] == 81.0
    assert coefs[surface.COEF_INDEX["y3"]] == 81.0
    assert coefs[surface.COEF_INDEX["z3"]] == 0.0
    assert coefs[surface.COEF_INDEX["xyz"]] == 54.0
    assert coefs[surface.COEF_INDEX["c"]] == 1.0


def test_cayley_values():
    coefs = surface.cayley()
    for name in ("x2y", "x2z", "xy2", "y2z", "xz2", "yz2"):
        assert coefs[surface.COEF_INDEX[name]] == -5.0
    for name in ("xy", "yz", "xz"):
        assert coefs[surface.COEF_INDEX[name]] == 2.0
    assert coefs[surface.COEF_INDEX["x3"]] == 0.0


def test_from_named_rejects_unknown():
    with pytest.raises(KeyError):
        surface.from_named(x4=1.0)


def test_ray_expansion_matches_direct_evaluation(rng):
    """t3 t^3 + t2 t^2 + t1 t + t0 must equal F(o + t d) for random rays."""
    coefs = rng.normal(size=(4, 20)) * 3
    origin = rng.normal(size=(6, 3)) * 2
    dirs = rng.normal(size=(6, 3))
    t3, t2, t1, t0 = ref.ray_poly_coeffs_np(coefs, origin, dirs)
    for ti in [0.0, 0.5, 1.7, -2.3]:
        horner = ((t3 * ti + t2) * ti + t1) * ti + t0  # [6, 4]
        points = origin + ti * dirs
        for ray in range(6):
            for obj in range(4):
                direct = surface.evaluate(coefs[obj], points[ray])
                assert horner[ray, obj] == pytest.approx(direct, rel=1e-9, abs=1e-9)


def test_jax_expansion_matches_numpy(rng):
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import poly

    coefs = rng.normal(size=(5, 20))
    origin = rng.normal(size=(7, 3))
    dirs = rng.normal(size=(7, 3))
    np_out = ref.ray_poly_coeffs_np(coefs, origin, dirs)
    jax_out = poly.ray_poly_coeffs(jnp.asarray(coefs), jnp.asarray(origin), jnp.asarray(dirs))
    for a, b in zip(np_out, jax_out):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-12, atol=1e-12)


def test_gradient_matches_finite_difference(rng):
    coefs = rng.normal(size=(3, 20))
    points = rng.normal(size=(3, 3)) * 2
    grad = ref.poly_gradient_np(coefs, points)
    h = 1e-6
    for i in range(3):
        for axis in range(3):
            p_hi = points[i].copy(); p_hi[axis] += h
            p_lo = points[i].copy(); p_lo[axis] -= h
            fd = (surface.evaluate(coefs[i], p_hi) - surface.evaluate(coefs[i], p_lo)) / (2 * h)
            assert grad[i, axis] == pytest.approx(fd, rel=1e-5, abs=1e-5)


def test_jax_gradient_matches_numpy(rng):
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import poly

    coefs = rng.normal(size=(4, 20))
    points = rng.normal(size=(4, 3))
    np_grad = ref.poly_gradient_np(coefs, points)
    jax_grad = poly.poly_gradient(jnp.asarray(coefs), jnp.asarray(points))
    np.testing.assert_allclose(np_grad, np.asarray(jax_grad), rtol=1e-12, atol=1e-12)
