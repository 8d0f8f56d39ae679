"""Round-5 final parity pass: all 8 scenes, direct (API-path) renders,
with the r5 fixes in (3-step candidate screen default + exact-precision
direction-form table). These numbers are the ratchet basis for bench.py's
per-scene parity gates, plus a throughput confirmation on the headline
scenes (32-frame batches, min-of-3, one process)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"[sweep3 t={time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


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


results = {"parity": {}, "ms": {}}
for name in ["dingdong", "monkey_saddle", "20spheres", "reflection_test",
             "quadratic", "cubic", "clebsch", "cayley"]:
    raw = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
    s32 = jax.tree.map(jnp.asarray, raw.astype(jnp.float32))
    b = resolve_bounces(raw, RenderConfig())
    gold = np.load(os.path.join(REPO, "bench_goldens", name + ".npz"))[
        "image"].astype(np.float32)
    img = np.asarray(_render_pallas_raw(s32, cam(), 3, b))
    frac = float((np.abs(img - gold).max(axis=-1) > 2.0 / 255.0).mean())
    results["parity"][name] = frac
    log(f"{name}: bad_px {frac:.6f}")

    if name in ("dingdong", "20spheres", "monkey_saddle", "quadratic"):
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
        results["ms"][name] = round(best * 1e3, 3)
        log(f"{name}: {best*1e3:.3f} ms/frame")

print("FINAL " + json.dumps(results), flush=True)
with open("/tmp/r5_sweep3.json", "w") as f:
    json.dump(results, f, indent=1)
log("done")
