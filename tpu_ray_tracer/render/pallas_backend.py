"""Fused Pallas TPU render kernel.

The TPU-native replacement for the reference's per-pixel CUDA kernel
(reference: src/update-cuda.cu:104-158). Where the CUDA kernel maps one
thread to one pixel in 8x8 blocks, this kernel maps one grid program to an
(8, 128)-pixel tile (one VPU vreg shape): ray generation, the per-object
intersection loop, shadowing/shading over lights, and the reflection chain
all execute inside a single kernel — the only HBM traffic is the final
framebuffer write. Scene tables (<= a few KB) live in SMEM and are read as
scalars inside ``fori_loop``s over objects/lights, mirroring the CUDA
kernel's constant-memory + global-table reads (reference: update-cuda.cu:17-27).

The math is the same refined f32 scheme as the XLA pipeline
(tpu_ray_tracer/ops/roots.py): scale-normalized analytic cubic/quadratic
solve for candidate roots, direct-evaluation Newton refinement, residual
rejection of phantom candidates, smallest-genuine-root selection.

The public entry ``render_image_pallas`` is differentiable: its custom VJP
recomputes through the (mathematically identical) XLA pipeline, so the fused
kernel serves the forward hot path while autodiff uses the composable graph.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import Scene
from ..models.surface import MONOMIAL_POWERS, N_COEFS
from ..ops import camera as camera_ops
from ..ops.constants import EPS, MAX_T, SHADOW_BIAS, TWO_THIRD_PI
from ..ops.poly import _EXPANSION
from ..render import pipeline as xla_pipeline

TILE_ROWS = 8
TILE_LANES = 128
TILE_PX = TILE_ROWS * TILE_LANES

_FAKE_ROOT = 2e6
_RESIDUAL_TOL = 1e-5


# --- Mosaic-lowerable transcendental substitutes ---
# The TPU Pallas lowering has no cbrt/acos primitives (exp/log/pow/cos/sqrt
# are available). Candidate roots only need seed-level accuracy — the Newton
# polish supplies the final bits — so cheap substitutes suffice.

def _cbrt(x):
    """sign(x) * |x|^(1/3) via the pow lowering (exp(log|x|/3))."""
    return jnp.sign(x) * jnp.power(jnp.abs(x), 1.0 / 3.0)


def _acos(x):
    """Abramowitz & Stegun 4.4.45 polynomial acos, |err| < 7e-5 rad.

    acos(|x|) ~= sqrt(1-|x|) * P(|x|); negative x by acos(-x) = pi - acos(x).
    """
    ax = jnp.abs(x)
    p = 1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * (-0.0187293)))
    pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0, np.float32(math.pi) - pos, pos)


# --- scalar-coefficient polynomial helpers (per object, tile-vectorized) ---

# Monomial index 10 starts the degree-<=2 block (x2..c) in the reference's
# coefficient order (reference: include/surface.h:12-14); objects whose first
# 10 (cubic) coefficients are exactly zero yield t3 == 0 for EVERY ray, so
# the solver can statically skip the cubic machinery for them.
QUAD_START = 10


def _powers3(x, y, z, max_pow=3):
    """Cache powers up to max_pow of three (8,128) arrays."""
    cache = [[None] * 4 for _ in range(3)]
    for axis, comp in enumerate((x, y, z)):
        cache[axis][1] = comp
        cache[axis][2] = comp * comp
        if max_pow >= 3:
            cache[axis][3] = cache[axis][2] * comp
    return cache


def _prod(cache, pows, one):
    out = None
    for axis, e in enumerate(pows):
        if e == 0:
            continue
        out = cache[axis][e] if out is None else out * cache[axis][e]
    return one if out is None else out


def _ray_coeffs_scalar(coef, o_pows, d_pows, one, m_start=0, k_max=3):
    """t-polynomial coefficients for ONE object whose 20 coefficients are
    traced scalars; basis products are (8,128) arrays (VPU FMAs).

    m_start=QUAD_START restricts to the degree-<=2 monomials (for objects
    with identically-zero cubic coefficients); k_max trims the returned
    degree accordingly."""
    out = []
    for k in range(k_max, -1, -1):
        acc = None
        for m in range(m_start, N_COEFS):
            c = coef[m]
            term_sum = None
            for w, o_p, d_p in _EXPANSION[k][m]:
                t = _prod(o_pows, o_p, one) * _prod(d_pows, d_p, one)
                if w != 1.0:
                    t = t * w
                term_sum = t if term_sum is None else term_sum + t
            if term_sum is None:
                continue
            contrib = c * term_sum
            acc = contrib if acc is None else acc + contrib
        out.append(acc if acc is not None else jnp.zeros_like(one))
    return out  # [t3, t2, t1, t0]


def _eval_F_and_grad(coef, px, py, pz, m_start=0):
    """F(p), dF(p) for scalar coefficients at (8,128) points."""
    p = _powers3(px, py, pz, max_pow=3 if m_start == 0 else 2)
    one = jnp.ones_like(px)
    f = None
    mag = None
    g = [None, None, None]
    for m, pows in enumerate(MONOMIAL_POWERS):
        if m < m_start:
            continue
        mono = _prod(p, pows, one)
        term = coef[m] * mono
        f = term if f is None else f + term
        a = jnp.abs(term)
        mag = a if mag is None else mag + a
        for axis in range(3):
            e = pows[axis]
            if e == 0:
                continue
            dpows = list(pows)
            dpows[axis] = e - 1
            dterm = coef[m] * float(e) * _prod(p, dpows, one)
            g[axis] = dterm if g[axis] is None else g[axis] + dterm
    zero = jnp.zeros_like(px)
    return f, mag, [gi if gi is not None else zero for gi in g]


def _polish(coef, ox, oy, oz, dx, dy, dz, t, iters, m_start=0, reject=True):
    """Newton refinement against direct F evaluation + residual rejection
    (kernel-local analogue of ops.roots.make_newton_polisher).

    reject=False skips the residual test: analytic quadratic/linear roots
    are genuine by construction (no branch misclassification is possible
    when t3 == 0 exactly), so only cancellation needs repair."""
    seed = t
    for _ in range(iters):
        px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
        f, _, g = _eval_F_and_grad(coef, px, py, pz, m_start)
        df = g[0] * dx + g[1] * dy + g[2] * dz
        ok = jnp.abs(df) > 1e-12
        step = jnp.where(ok, f / jnp.where(ok, df, 1.0), 0.0)
        t_new = t - step
        t = jnp.where(jnp.isfinite(t_new), t_new, t)
    if not reject:
        return t
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
    f, mag, _ = _eval_F_and_grad(coef, px, py, pz, m_start)
    genuine = jnp.abs(f) <= _RESIDUAL_TOL * mag
    return jnp.where(genuine, t, jnp.where(seed < 0, seed, _FAKE_ROOT))


def _solve_object(coef, ox, oy, oz, dx, dy, dz, polish_iters):
    """Reference-semantics root for one object over an (8,128) ray tile
    (kernel-local analogue of ops.roots.min_positive_root, refined mode)."""
    one = jnp.ones_like(ox)
    o_pows = _powers3(ox, oy, oz)
    d_pows = _powers3(dx, dy, dz)
    t3, t2, t1, t0 = _ray_coeffs_scalar(coef, o_pows, d_pows, one)

    pol = partial(_polish, coef, ox, oy, oz, dx, dy, dz, iters=polish_iters)

    is_cubic = jnp.abs(t3) > EPS
    is_quad = jnp.abs(t2) > EPS
    is_lin = jnp.abs(t1) > EPS

    # cubic branch, scale-normalized
    s3 = jnp.where(is_cubic, t3, one)
    a = t2 / s3
    b = t1 / s3
    c = t0 / s3
    s = jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.sqrt(jnp.abs(b))),
        jnp.maximum(_cbrt(jnp.abs(c)), 1e-30),
    )
    a = a / s
    b = b / (s * s)
    c = c / (s * s * s)
    q = (3.0 * b - a * a) / 9.0
    r = (9.0 * a * b - 27.0 * c - 2.0 * a * a * a) / 54.0
    delta = q * q * q + r * r
    sq_delta = jnp.sqrt(jnp.maximum(delta, 0.0))
    cand_cardano = pol(t=s * (_cbrt(r + sq_delta) + _cbrt(r - sq_delta) - a / 3.0))

    q_neg = jnp.maximum(-q, 0.0)
    denom = jnp.sqrt(q_neg * q_neg * q_neg)
    ratio = jnp.clip(r / jnp.where(denom == 0, one, denom), -1.0, 1.0)
    theta = _acos(ratio) / 3.0
    two_sq = 2.0 * jnp.sqrt(q_neg)
    a3 = a / 3.0
    trig = [
        pol(t=s * (two_sq * jnp.cos(theta + k * TWO_THIRD_PI) - a3))
        for k in (0.0, 1.0, 2.0)
    ]

    # dominant-balance quadratic seeds (near-degenerate |t3|)
    sq2 = jnp.where(is_quad, t2, one)
    qdisc = t1 * t1 - 4.0 * t2 * t0
    qsq = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    sub_lo = pol(t=(-t1 - qsq) / (2.0 * sq2))
    sub_hi = pol(t=(-t1 + qsq) / (2.0 * sq2))

    big = jnp.full_like(one, 2.0 * _FAKE_ROOT)
    cubic_root = big
    for cand in (cand_cardano, *trig, sub_lo, sub_hi):
        take = (cand >= EPS) & (cand < cubic_root)
        cubic_root = jnp.where(take, cand, cubic_root)
    cubic_root = jnp.where(cubic_root >= big, -1.0, cubic_root)

    quad_root = jnp.where(qdisc < 0, -1.0, jnp.where(sub_lo >= EPS, sub_lo, sub_hi))
    lin_root = -t0 / jnp.where(is_lin, t1, one)

    return jnp.where(
        is_cubic, cubic_root,
        jnp.where(is_quad, quad_root, jnp.where(is_lin, lin_root, -1.0)),
    )


def _solve_quadric(coef, ox, oy, oz, dx, dy, dz, polish_iters):
    """Reference-semantics root for an object with identically-zero cubic
    coefficients: t3 == 0 for every ray, so only the quadratic/linear/miss
    cascade of the reference can fire (surface_impl.h:138-154). Skips the
    whole Cardano/trig machinery — ~10x cheaper than ``_solve_object``."""
    one = jnp.ones_like(ox)
    o_pows = _powers3(ox, oy, oz, max_pow=2)
    d_pows = _powers3(dx, dy, dz, max_pow=2)
    t2, t1, t0 = _ray_coeffs_scalar(coef, o_pows, d_pows, one,
                                    m_start=QUAD_START, k_max=2)

    pol = partial(_polish, coef, ox, oy, oz, dx, dy, dz,
                  iters=polish_iters, m_start=QUAD_START, reject=False)

    is_quad = jnp.abs(t2) > EPS
    is_lin = jnp.abs(t1) > EPS

    s2 = jnp.where(is_quad, t2, one)
    disc = t1 * t1 - 4.0 * t2 * t0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    lo = pol(t=(-t1 - sq) / (2.0 * s2))
    hi = pol(t=(-t1 + sq) / (2.0 * s2))
    quad_root = jnp.where(disc < 0, -1.0, jnp.where(lo >= EPS, lo, hi))
    lin_root = -t0 / jnp.where(is_lin, t1, one)

    return jnp.where(
        is_quad, quad_root, jnp.where(is_lin, lin_root, -1.0)
    )


def _read_coef_row(coefs_ref, i):
    return [coefs_ref[i, m] for m in range(N_COEFS)]


# --- the kernel ---

def _make_kernel(n_objects: int, n_lights: int, width: int, height: int,
                 polish_iters: int, bounces: int, n_cubic: int | None = None):
    inv_pi = np.float32(1.0 / math.pi)
    four_pi = np.float32(4.0 * math.pi)
    if n_cubic is None:
        n_cubic = n_objects  # no degree info: treat every object as cubic

    def nearest_hit(coefs_ref, orig_ref, ox, oy, oz, dx, dy, dz):
        """Best valid hit over all objects (reference update-cuda.cu:65-77).

        Objects are laid out cubics-first (host-side partition); slots
        >= n_cubic take the cheap quadric solve. The reference scans in
        original order with strict <, so ties are broken by the ORIGINAL
        index (orig_ref), not the permuted slot."""
        one = jnp.ones_like(ox)

        def make_body(solver):
            def body(i, carry):
                best_t, best_idx, best_orig = carry
                coef = _read_coef_row(coefs_ref, i)
                t = solver(coef, ox, oy, oz, dx, dy, dz, polish_iters)
                valid = (t >= EPS) & (t < MAX_T)
                orig = orig_ref[i]
                better = valid & (
                    (t < best_t) | ((t == best_t) & (orig < best_orig))
                )
                best_t = jnp.where(better, t, best_t)
                best_idx = jnp.where(better, i, best_idx)
                best_orig = jnp.where(better, orig, best_orig)
                return best_t, best_idx, best_orig

            return body

        carry = (
            jnp.full_like(one, MAX_T),
            jnp.full_like(one, -1, dtype=jnp.int32),
            jnp.full_like(one, np.int32(2**30), dtype=jnp.int32),
        )
        if n_cubic > 0:
            carry = jax.lax.fori_loop(0, n_cubic, make_body(_solve_object), carry)
        if n_cubic < n_objects:
            carry = jax.lax.fori_loop(
                n_cubic, n_objects, make_body(_solve_quadric), carry
            )
        best_t, best_idx, _ = carry
        hit = best_idx >= 0
        return hit, best_idx, jnp.where(hit, best_t, 0.0)

    def gather_object(coefs_ref, colors_ref, refl_ref, idx):
        """Per-pixel object attributes via a masked sweep (the TPU analogue
        of the CUDA kernel's pointer gather objects[idx])."""
        zero = jnp.zeros_like(idx, dtype=jnp.float32)
        coef = [zero] * N_COEFS
        col = [zero] * 3
        refl = zero
        for i in range(n_objects):
            m = (idx == i)
            row = _read_coef_row(coefs_ref, i)
            coef = [jnp.where(m, row[k], coef[k]) for k in range(N_COEFS)]
            col = [jnp.where(m, colors_ref[i, k], col[k]) for k in range(3)]
            refl = jnp.where(m, refl_ref[i], refl)
        return coef, col, refl

    def shade(coefs_ref, lights_ref, sel_coef, obj_col, px, py, pz, nx, ny, nz):
        """Shadow-tested Lambertian sum over lights, clamped
        (reference update-cpu.cpp:60-77)."""
        zero = jnp.zeros_like(px)
        acc = [zero, zero, zero]
        sox = px + SHADOW_BIAS * nx
        soy = py + SHADOW_BIAS * ny
        soz = pz + SHADOW_BIAS * nz
        for li in range(n_lights):
            is_sph = lights_ref[li, 0]
            lpx, lpy, lpz = lights_ref[li, 1], lights_ref[li, 2], lights_ref[li, 3]
            lcr, lcg, lcb = lights_ref[li, 4], lights_ref[li, 5], lights_ref[li, 6]
            sph = is_sph > 0.5
            # shadow ray: unnormalized to-light (spherical, max_t 1) or the
            # stored unit direction (directional, max_t MAX_T); passed
            # through f32 as in the reference (light_impl.h:17)
            tox, toy, toz = lpx - px, lpy - py, lpz - pz
            sdx = jnp.where(sph, tox, lpx)
            sdy = jnp.where(sph, toy, lpy)
            sdz = jnp.where(sph, toz, lpz)
            max_t = jnp.where(sph, 1.0, MAX_T)

            # Carry the occlusion mask as f32 (0/1): Mosaic cannot carry
            # vector<i1> through scf loops.
            def make_occ_body(solver):
                def occ_body(i, occluded):
                    coef = _read_coef_row(coefs_ref, i)
                    t = solver(coef, sox, soy, soz, sdx, sdy, sdz, polish_iters)
                    hit_f = ((t > EPS) & (t < max_t)).astype(jnp.float32)
                    return jnp.maximum(occluded, hit_f)

                return occ_body

            occluded_f = jnp.zeros_like(px)
            if n_cubic > 0:
                occluded_f = jax.lax.fori_loop(
                    0, n_cubic, make_occ_body(_solve_object), occluded_f
                )
            if n_cubic < n_objects:
                occluded_f = jax.lax.fori_loop(
                    n_cubic, n_objects, make_occ_body(_solve_quadric), occluded_f
                )
            occluded = occluded_f > 0.5

            dist2 = tox * tox + toy * toy + toz * toz
            dn = jnp.sqrt(dist2)
            inv_dn = 1.0 / jnp.where(dn > 0, dn, 1.0)
            ldx = jnp.where(sph, tox * inv_dn, lpx)
            ldy = jnp.where(sph, toy * inv_dn, lpy)
            ldz = jnp.where(sph, toz * inv_dn, lpz)
            falloff = 1.0 / (four_pi * dist2)
            lam = jnp.maximum(0.0, nx * ldx + ny * ldy + nz * ldz)
            w = jnp.where(occluded, 0.0, lam * inv_pi)
            scale = jnp.where(sph, falloff, 1.0) * w
            acc[0] = acc[0] + obj_col[0] * lcr * scale
            acc[1] = acc[1] + obj_col[1] * lcg * scale
            acc[2] = acc[2] + obj_col[2] * lcb * scale
        return [jnp.minimum(1.0, a) for a in acc]

    def normal_at(sel_coef, px, py, pz):
        _, _, g = _eval_F_and_grad(sel_coef, px, py, pz)
        norm = jnp.sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2])
        inv = 1.0 / jnp.where(norm > 0, norm, 1.0)
        return g[0] * inv, g[1] * inv, g[2] * inv

    def trace_and_shade(coefs_ref, orig_ref, colors_ref, refl_ref, lights_ref,
                        ox, oy, oz, dx, dy, dz):
        hit, idx, t = nearest_hit(coefs_ref, orig_ref, ox, oy, oz, dx, dy, dz)
        px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
        sel_coef, obj_col, refl = gather_object(coefs_ref, colors_ref, refl_ref, idx)
        nx, ny, nz = normal_at(sel_coef, px, py, pz)
        lit = shade(coefs_ref, lights_ref, sel_coef, obj_col, px, py, pz, nx, ny, nz)
        return hit, idx, refl, (px, py, pz), (nx, ny, nz), lit

    def kernel(coefs_ref, orig_ref, colors_ref, refl_ref, lights_ref, cam_ref,
               out_ref):
        # --- ray generation (reference update-cuda.cu:111-116) ---
        pid = pl.program_id(0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
        pixel = pid * TILE_PX + row_ids * TILE_LANES + lane_ids
        pix_y = pixel // width
        pix_x = pixel - pix_y * width

        aspect_tanf = cam_ref[12]
        tanf = cam_ref[13]
        ndc_x = (pix_x.astype(jnp.float32) + 0.5) * np.float32(1.0 / width)
        ndc_y = (pix_y.astype(jnp.float32) + 0.5) * np.float32(1.0 / height)
        cx = (2.0 * ndc_x - 1.0) * aspect_tanf
        cy = (2.0 * ndc_y - 1.0) * tanf
        # dir = normalize(R @ (cx, cy, 1)); R columns in cam_ref[0:9]
        tx = cx * cam_ref[0] + cy * cam_ref[3] + cam_ref[6]
        ty = cx * cam_ref[1] + cy * cam_ref[4] + cam_ref[7]
        tz = cx * cam_ref[2] + cy * cam_ref[5] + cam_ref[8]
        inv_len = jax.lax.rsqrt(tx * tx + ty * ty + tz * tz)
        dx, dy, dz = tx * inv_len, ty * inv_len, tz * inv_len
        ox = jnp.full_like(dx, cam_ref[9])
        oy = jnp.full_like(dx, cam_ref[10])
        oz = jnp.full_like(dx, cam_ref[11])

        bg = (cam_ref[14], cam_ref[15], cam_ref[16])

        hit, idx, refl, point, normal, lit = trace_and_shade(
            coefs_ref, orig_ref, colors_ref, refl_ref, lights_ref,
            ox, oy, oz, dx, dy, dz
        )
        result = [jnp.where(hit, lit[k], bg[k]) for k in range(3)]

        if bounces > 0:
            # reflection chain (reference update-cuda.cu:126-146) as a
            # lockstep masked loop
            # active mask carried as f32 (0/1): no vector<i1> loop carries.
            def bounce(_, carry):
                result, ratio, active_f, refl_c, point, normal, d = carry
                enter = (active_f > 0.5) & (refl_c > EPS)
                ratio = jnp.where(enter, ratio * refl_c, ratio)
                px, py, pz = point
                nx, ny, nz = normal
                ddx, ddy, ddz = d
                dot = ddx * nx + ddy * ny + ddz * nz
                rdx = ddx - 2.0 * dot * nx
                rdy = ddy - 2.0 * dot * ny
                rdz = ddz - 2.0 * dot * nz
                nox = px + SHADOW_BIAS * nx
                noy = py + SHADOW_BIAS * ny
                noz = pz + SHADOW_BIAS * nz
                h2, _i2, r2, p2, n2, l2 = trace_and_shade(
                    coefs_ref, orig_ref, colors_ref, refl_ref, lights_ref,
                    nox, noy, noz, rdx, rdy, rdz,
                )
                bcol = [jnp.where(h2, l2[k], bg[k]) for k in range(3)]
                result = [
                    jnp.where(enter, (1.0 - ratio) * result[k] + ratio * bcol[k],
                              result[k])
                    for k in range(3)
                ]
                adv = enter & h2
                refl_c = jnp.where(adv, r2, refl_c)
                point = tuple(jnp.where(adv, p2[k], point[k]) for k in range(3))
                normal = tuple(jnp.where(adv, n2[k], normal[k]) for k in range(3))
                d = (jnp.where(enter, rdx, ddx), jnp.where(enter, rdy, ddy),
                     jnp.where(enter, rdz, ddz))
                return result, ratio, adv.astype(jnp.float32), refl_c, point, normal, d

            init = (result, jnp.ones_like(dx), hit.astype(jnp.float32), refl,
                    point, normal, (dx, dy, dz))
            result, ratio, active_f, refl_c, *_rest = jax.lax.fori_loop(
                0, bounces, bounce, init
            )
            # at-cap background blend
            enter = (active_f > 0.5) & (refl_c > EPS)
            rr = ratio * refl_c
            result = [
                jnp.where(enter, (1.0 - rr) * result[k] + rr * bg[k], result[k])
                for k in range(3)
            ]

        out_ref[0, :, :] = result[0]
        out_ref[1, :, :] = result[1]
        out_ref[2, :, :] = result[2]

    return kernel


def _pack_lights(scene: Scene):
    """[L, 7] f32: is_spherical, p(3), color(3)."""
    table = jnp.concatenate(
        [
            scene.light_is_spherical.astype(jnp.float32)[:, None],
            scene.light_p.astype(jnp.float32),
            scene.light_color.astype(jnp.float32),
        ],
        axis=1,
    )
    return table


def _pack_camera(scene: Scene, camera: camera_ops.Camera):
    rotation, eye = camera_ops.camera_frame(camera)
    tanf = scene.tan_half_fov.astype(jnp.float32)
    return jnp.concatenate(
        [
            rotation.astype(jnp.float32).T.reshape(-1),  # columns flattened
            eye.astype(jnp.float32),
            (tanf * scene.aspect_ratio)[None],
            tanf[None],
            scene.bg_color.astype(jnp.float32),
        ]
    )


import os

# CPU tests run the kernel in the Pallas interpreter (no Mosaic backend).
_INTERPRET = os.environ.get("TRT_PALLAS_INTERPRET", "0") == "1"


def _degree_partition(coefs):
    """Host-side cubics-first permutation from CONCRETE coefficients.

    Returns (perm, n_cubic): perm lists original object indices, cubic
    objects first (stable order within each class). An object is "cubic"
    iff any of its 10 cubic monomial coefficients is nonzero; otherwise
    t3 == 0 identically and only the reference's quadratic/linear branches
    can ever fire for it, so the partition is semantics-preserving."""
    cc = np.asarray(coefs)
    is_cubic = (np.abs(cc[:, :QUAD_START]) > 0).any(axis=1)
    perm = np.argsort(~is_cubic, kind="stable").astype(np.int32)
    return perm, int(is_cubic.sum())


# Tiny memo so the per-frame hot loop doesn't re-derive the partition (a
# host-side np reduction over [N, 10]) for the same coefficient table.
_PARTITION_CACHE: dict = {}


def _render_pallas_raw(scene: Scene, camera: camera_ops.Camera,
                       polish_iters: int, bounces: int):
    """Non-jitted wrapper: degree-partitions the object table host-side
    (cubics first), then dispatches the jitted kernel with the permutation
    as STATIC data (compiled in — the scene arrays pass through unchanged,
    so per-frame calls hit the jit cache with zero extra transfers). Under
    tracing (e.g. inside an outer jit/grad where coefficients are abstract)
    the partition is unavailable and every object takes the cubic solve."""
    if isinstance(scene.coefs, jax.core.Tracer) or scene.n_objects == 0:
        perm = tuple(range(scene.n_objects))
        n_cubic = scene.n_objects
    else:
        key = id(scene.coefs)
        cached = _PARTITION_CACHE.get(key)
        if cached is None:
            p, n_cubic = _degree_partition(scene.coefs)
            cached = (tuple(int(i) for i in p), n_cubic)
            if len(_PARTITION_CACHE) > 64:
                _PARTITION_CACHE.clear()
            _PARTITION_CACHE[key] = cached
        perm, n_cubic = cached
    return _render_pallas_jit(scene, camera, polish_iters, bounces,
                              n_cubic, perm)


@partial(jax.jit,
         static_argnames=("polish_iters", "bounces", "n_cubic", "perm"))
def _render_pallas_jit(scene: Scene, camera: camera_ops.Camera,
                       polish_iters: int, bounces: int, n_cubic: int,
                       perm: tuple):
    height, width = scene.height, scene.width
    n_px = height * width
    n_tiles = -(-n_px // TILE_PX)
    rows_padded = n_tiles * TILE_ROWS

    scene32 = scene.astype(jnp.float32)
    camera32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), camera)
    # Apply the static cubics-first permutation inside jit: XLA constant-
    # folds the gather, and callers' scene arrays stay cache-stable.
    orig_index = jnp.asarray(np.asarray(perm, np.int32))
    if any(perm[i] != i for i in range(len(perm))):
        import dataclasses as _dc

        idx = jnp.asarray(np.asarray(perm, np.int64))
        scene32 = _dc.replace(
            scene32,
            coefs=jnp.take(scene32.coefs, idx, axis=0),
            colors=jnp.take(scene32.colors, idx, axis=0),
            reflection=jnp.take(scene32.reflection, idx, axis=0),
        )
    lights = _pack_lights(scene32)
    cam = _pack_camera(scene32, camera32)

    kernel = _make_kernel(
        scene.n_objects, scene.n_lights, width, height, polish_iters, bounces,
        n_cubic=n_cubic,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coefs [N, 20]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # orig index [N] i32
            pl.BlockSpec(memory_space=pltpu.SMEM),  # colors [N, 3]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # refl [N]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights [L, 7]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # camera [17]
        ],
        out_specs=pl.BlockSpec(
            (3, TILE_ROWS, TILE_LANES),
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, rows_padded, TILE_LANES), jnp.float32),
        interpret=_INTERPRET,
    )(
        scene32.coefs,
        orig_index.astype(jnp.int32),
        scene32.colors,
        scene32.reflection,
        lights,
        cam,
    )
    flat = out.reshape(3, rows_padded * TILE_LANES)[:, :n_px]
    return jnp.transpose(flat.reshape(3, height, width), (1, 2, 0))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _render_pallas_diff(scene: Scene, camera, polish_iters: int, bounces: int):
    return _render_pallas_raw(scene, camera, polish_iters, bounces)


def _diff_fwd(scene, camera, polish_iters, bounces):
    return _render_pallas_diff(scene, camera, polish_iters, bounces), (scene, camera)


def _diff_bwd(polish_iters, bounces, res, g):
    scene, camera = res
    config = xla_pipeline.RenderConfig(
        geom_dtype="float32", polish_iters=polish_iters,
        bounces=bounces, chunk_px=None,
    )
    _, vjp_fn = jax.vjp(
        lambda s, c: xla_pipeline._render_image_jit(s, c, config), scene, camera
    )
    ds, dc = vjp_fn(g)
    return ds, dc


_render_pallas_diff.defvjp(_diff_fwd, _diff_bwd)


def render_image_pallas(scene: Scene, camera: camera_ops.Camera | None = None,
                        polish_iters: int = 3, bounces: int | None = None):
    """Render a full frame with the fused Pallas kernel -> [H, W, 3] f32.

    Differentiable: the backward pass recomputes through the XLA pipeline
    (identical math), so ``jax.grad`` works on losses of this output.
    """
    if camera is None:
        camera = camera_ops.Camera.initial(jnp.float32)
    if bounces is None:
        bounces = xla_pipeline.resolve_bounces(
            scene, xla_pipeline.RenderConfig()
        )
    return _render_pallas_diff(scene, camera, int(polish_iters), int(bounces))
