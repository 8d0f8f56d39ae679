"""Round-5 TPU follow-up sweep.

1. 20spheres parity discrepancy: the r5 direct render measured bad-px
   1.04e-3 where BENCH_r04 recorded 1.7e-5 — render the parity frame both
   ways (direct _render_pallas_raw vs inside an outer jit alongside the
   lax.map batch, exactly like bench.py's fwd_many) and diff the IMAGES.
2. TRT_SCREEN_ITERS A/B (new knob): does a 3-step candidate screen win
   back the dingdong screening-restructure drift (0.0016 -> 0.0025), and
   at what cost?
3. Tile rows 32 vs 64 with bench-grade amortization (32 frames/batch,
   min-of-3): today's 16-frame sweep showed 64 fastest; decide the default.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[sweep2 t={time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


T0 = time.perf_counter()

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

import tpu_ray_tracer as trt
from tpu_ray_tracer.render.pallas_backend import _render_pallas_raw
from tpu_ray_tracer.render.pipeline import RenderConfig, resolve_bounces

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
log(f"devices: {jax.devices()}")


def cam(yaw=90.0):
    return trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(yaw, jnp.float32),
        pitch_deg=jnp.asarray(0.0, jnp.float32),
    )


def load(name):
    scene = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
    return scene, jax.tree.map(jnp.asarray, scene.astype(jnp.float32))


def golden(name):
    return np.load(os.path.join(REPO, "bench_goldens", name + ".npz"))[
        "image"].astype(np.float32)


def frac(img, gold):
    return float((np.abs(np.asarray(img) - gold).max(axis=-1)
                  > 2.0 / 255.0).mean())


results = {}

# ---------------- 1: 20spheres parity, direct vs in-jit ----------------
log("1: 20spheres parity, direct vs bench-style in-jit")
raw, sph = load("20spheres")
bounces = resolve_bounces(raw, RenderConfig())
gold = golden("20spheres")

img_direct = np.asarray(_render_pallas_raw(sph, cam(), 3, bounces))

yaws = 90.0 + 1e-3 * jnp.arange(4, dtype=jnp.float32)


@jax.jit
def fwd_many(yaws):
    sums = jax.lax.map(
        lambda y: jnp.sum(_render_pallas_raw(sph, cam(y), 3, bounces)), yaws)
    parity = _render_pallas_raw(sph, cam(90.0), 3, bounces)
    return sums, parity


_, img_injit = fwd_many(yaws)
img_injit = np.asarray(img_injit)
d = np.abs(img_direct - img_injit)
r1 = {
    "direct_bad_px": frac(img_direct, gold),
    "injit_bad_px": frac(img_injit, gold),
    "direct_vs_injit_maxdiff": float(d.max()),
    "direct_vs_injit_diffpx": float((d.max(-1) > 2.0 / 255.0).mean()),
}
results["sph_parity"] = r1
log(json.dumps(r1))

# ---------------- 2: screen-iters A/B ----------------
log("2: TRT_SCREEN_ITERS A/B (dingdong + 20spheres + cayley full res)")
r2 = {}
for name in ["dingdong", "20spheres", "cayley"]:
    raw, s32 = load(name)
    b = resolve_bounces(raw, RenderConfig())
    g = golden(name)
    per = {}
    for si in ["2", "3"]:
        os.environ["TRT_SCREEN_ITERS"] = si
        img = np.asarray(_render_pallas_raw(s32, cam(), 3, b))
        fr = frac(img, g)

        yaws32 = 90.0 + 1e-3 * jnp.arange(32, dtype=jnp.float32)

        @jax.jit
        def batch(yaws, s32=s32, b=b):
            return jax.lax.map(
                lambda y: jnp.sum(_render_pallas_raw(s32, cam(y), 3, b)),
                yaws)

        np.asarray(batch(yaws32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(batch(yaws32))
            best = min(best, (time.perf_counter() - t0) / 32)
        per[si] = {"bad_px": fr, "ms": round(best * 1e3, 3)}
        log(f"  {name} screen={si}: bad_px {fr:.6f}  {best*1e3:.3f} ms")
    os.environ.pop("TRT_SCREEN_ITERS", None)
    r2[name] = per
results["screen_ab"] = r2
print("SCREEN_AB " + json.dumps(r2), flush=True)

# ---------------- 3: tile rows 32 vs 64, bench-grade ----------------
log("3: tile rows 32 vs 64, 32-frame batches")
r3 = {}
for name in ["dingdong", "monkey_saddle", "quadratic", "20spheres"]:
    raw, s32 = load(name)
    b = resolve_bounces(raw, RenderConfig())
    per = {}
    for rows in ["32", "64"]:
        os.environ["TRT_TILE_ROWS"] = rows
        yaws32 = 90.0 + 1e-3 * jnp.arange(32, dtype=jnp.float32)

        @jax.jit
        def batch(yaws, s32=s32, b=b):
            return jax.lax.map(
                lambda y: jnp.sum(_render_pallas_raw(s32, cam(y), 3, b)),
                yaws)

        np.asarray(batch(yaws32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(batch(yaws32))
            best = min(best, (time.perf_counter() - t0) / 32)
        per[rows] = round(best * 1e3, 3)
        log(f"  {name} rows={rows}: {best*1e3:.3f} ms")
    os.environ.pop("TRT_TILE_ROWS", None)
    r3[name] = per
results["rows_3264"] = r3
print("ROWS_3264 " + json.dumps(r3), flush=True)

with open("/tmp/r5_sweep2.json", "w") as f:
    json.dump(results, f, indent=1)
log("done -> /tmp/r5_sweep2.json")
