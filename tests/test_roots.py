"""Root-solver tests against a ``numpy.roots`` oracle.

The reference's selection semantics (reference: include/surface_impl.h:106-154)
are peculiar — Cardano's single real root is returned unconditionally even if
negative; the three-real-roots case starts from the largest root and only
replaces it by strictly smaller candidates that are >= EPS. We verify both
the numpy golden solver and the JAX solver implement exactly these semantics
using numpy.roots as an independent oracle.
"""

import numpy as np
import pytest

from tpu_ray_tracer.ops.constants import EPS
from tpu_ray_tracer.render.reference_cpu import min_positive_root_np


def reference_semantics_oracle(t3, t2, t1, t0):
    """Scalar oracle from numpy.roots implementing the reference's selection."""
    if abs(t3) > EPS:
        roots = np.roots([t3, t2, t1, t0])
        real = sorted(r.real for r in roots if abs(r.imag) < 1e-9 * max(1.0, abs(r.real)))
        # classify via the discriminant as the reference does
        a, b, c = t2 / t3, t1 / t3, t0 / t3
        q = (3 * b - a * a) / 9.0
        r_ = (9 * a * b - 27 * c - 2 * a**3) / 54.0
        delta = q**3 + r_**2
        if delta > 0:
            # single real root, returned unconditionally
            return real[-1] if real else None
        # three real roots (possibly repeated): start from the largest,
        # replace by smaller candidates that are >= EPS
        x = real[-1]
        for cand in real[:-1]:
            if cand >= EPS and cand < x:
                x = cand
        return x
    if abs(t2) > EPS:
        disc = t1 * t1 - 4 * t2 * t0
        if disc < 0:
            return -1.0
        sd = np.sqrt(disc)
        lo = (-t1 - sd) / (2 * t2)
        hi = (-t1 + sd) / (2 * t2)
        return lo if lo >= EPS else hi
    if abs(t1) > EPS:
        return -t0 / t1
    return -1.0


def _run_cases(cases, solver, rtol=1e-7, atol=1e-9):
    t3, t2, t1, t0 = (np.asarray([c[i] for c in cases], dtype=np.float64) for i in range(4))
    got = np.asarray(solver(t3, t2, t1, t0))
    for i, c in enumerate(cases):
        expected = reference_semantics_oracle(*c)
        assert expected is not None, f"oracle failed for {c}"
        assert got[i] == pytest.approx(expected, rel=rtol, abs=atol), (
            f"case {c}: got {got[i]}, oracle {expected}"
        )


def _random_cases(rng, n, kind):
    cases = []
    while len(cases) < n:
        if kind == "cubic":
            c = rng.normal(size=4) * rng.choice([0.1, 1.0, 10.0])
            if abs(c[0]) <= EPS:
                continue
        elif kind == "quad":
            c = np.concatenate([[0.0], rng.normal(size=3) * 5])
            if abs(c[1]) <= EPS:
                continue
        elif kind == "linear":
            c = np.array([0.0, 0.0, rng.normal() * 3, rng.normal() * 3])
            if abs(c[2]) <= EPS:
                continue
        cases.append(tuple(c))
    return cases


@pytest.mark.parametrize("kind", ["cubic", "quad", "linear"])
def test_numpy_solver_matches_oracle(rng, kind):
    _run_cases(_random_cases(rng, 200, kind), min_positive_root_np)


@pytest.mark.parametrize("kind", ["cubic", "quad", "linear"])
def test_jax_solver_matches_oracle(rng, kind):
    import jax
    import jax.numpy as jnp
    from tpu_ray_tracer.ops.roots import min_positive_root

    solver = jax.jit(min_positive_root)

    def run(t3, t2, t1, t0):
        return np.asarray(solver(jnp.asarray(t3), jnp.asarray(t2),
                                 jnp.asarray(t1), jnp.asarray(t0)))

    _run_cases(_random_cases(rng, 200, kind), run)


def test_known_roots_cubic():
    """(t-1)(t-2)(t-3): all roots >= EPS, reference picks the smallest."""
    got = min_positive_root_np(
        np.asarray([1.0]), np.asarray([-6.0]), np.asarray([11.0]), np.asarray([-6.0])
    )
    assert got[0] == pytest.approx(1.0, rel=1e-10)


def test_cubic_negative_roots_cardano():
    """t^3 + 1 = 0: single real root -1, returned unconditionally."""
    got = min_positive_root_np(
        np.asarray([1.0]), np.asarray([0.0]), np.asarray([0.0]), np.asarray([1.0])
    )
    assert got[0] == pytest.approx(-1.0, rel=1e-10)


def test_cubic_trig_mixed_signs():
    """(t+1)(t-2)(t-4): largest root 4 is start, 2 is valid and smaller."""
    # expand: t^3 -5t^2 + 2t + 8
    got = min_positive_root_np(
        np.asarray([1.0]), np.asarray([-5.0]), np.asarray([2.0]), np.asarray([8.0])
    )
    assert got[0] == pytest.approx(2.0, rel=1e-10)


def test_cubic_trig_all_negative_keeps_largest():
    """(t+1)(t+2)(t+4): no candidate >= EPS, keeps the largest (-1)."""
    # expand: t^3 + 7t^2 + 14t + 8
    got = min_positive_root_np(
        np.asarray([1.0]), np.asarray([7.0]), np.asarray([14.0]), np.asarray([8.0])
    )
    assert got[0] == pytest.approx(-1.0, rel=1e-10)


def test_quadratic_smaller_root_negative():
    """(t+1)(t-3): smaller root < EPS -> larger root returned."""
    got = min_positive_root_np(
        np.asarray([0.0]), np.asarray([1.0]), np.asarray([-2.0]), np.asarray([-3.0])
    )
    assert got[0] == pytest.approx(3.0, rel=1e-12)


def test_quadratic_no_real_roots():
    got = min_positive_root_np(
        np.asarray([0.0]), np.asarray([1.0]), np.asarray([0.0]), np.asarray([1.0])
    )
    assert got[0] == -1.0


def test_degenerate_all_zero():
    got = min_positive_root_np(
        np.asarray([0.0]), np.asarray([0.0]), np.asarray([0.0]), np.asarray([5.0])
    )
    assert got[0] == -1.0


def test_sphere_intersection_end_to_end():
    """Unit sphere at z=5, ray from origin along +z: entry hit at t=4."""
    from tpu_ray_tracer.models import surface
    from tpu_ray_tracer.render.reference_cpu import ray_poly_coeffs_np

    coefs = surface.sphere((0.0, 0.0, 5.0), 1.0)[None, :]
    o = np.zeros((1, 3))
    d = np.asarray([[0.0, 0.0, 1.0]])
    t = min_positive_root_np(*ray_poly_coeffs_np(coefs, o, d))
    assert t[0, 0] == pytest.approx(4.0, rel=1e-12)
