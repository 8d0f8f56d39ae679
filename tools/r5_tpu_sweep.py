"""Round-5 TPU measurement sweep (single process, sequential stages).

Stage A — parity drift attribution (VERDICT r4 #1a): dingdong full-res
  bad-pixel fraction vs the committed f64 golden, with each r4 perf lever
  flipped back one at a time (TRT_SHADOW_POLISH=3 uniform occlusion
  polish, TRT_TILE_ROWS=8, TRT_DIR_TABLE=0), plus all-at-once. The 1-D
  candidate screening has no knob (hardcoded min(2, polish_iters)); its
  contribution is the residual left when every knob is at its r3 setting
  (r3 measured 0.0016).

Stage B — per-grid-step overhead decomposition (VERDICT r4 #3, empirical
  alternative to a device trace): frame time vs tile height (8/16/32/64
  rows) on three scenes. Per-frame time = n_tiles * (fixed_step_overhead +
  per_tile_work); quadrupling the tile quarters n_tiles at ~constant
  total vector work, so the curve separates fixed per-step cost from
  work, and the 64-row point quantifies the regression r4 guessed was
  VMEM pressure.

Stage C — current XLA-fallback cost A/B (VERDICT r4 hygiene): fwd+bwd
  through the fused analytic backward vs recompute-through-XLA AD, same
  scene/loss/process, min-of-3 in-jit (replaces the r1-vintage claim).

Timing methodology per .claude/skills/verify/SKILL.md: N frames with
distinct poses inside ONE jit via lax.map, each reduced to a scalar,
fetched; never pipelined dispatch through the axon relay.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[sweep t={time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


T0 = time.perf_counter()

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

import tpu_ray_tracer as trt
from tpu_ray_tracer.render.pallas_backend import _render_pallas_raw
from tpu_ray_tracer.render.pipeline import (
    RenderConfig, _render_image_jit, resolve_bounces,
)

log(f"devices: {jax.devices()}")


def cam(yaw=90.0, pitch=0.0):
    return trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(yaw, jnp.float32),
        pitch_deg=jnp.asarray(pitch, jnp.float32),
    )


def load(name):
    scene = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
    return jax.tree.map(jnp.asarray, scene.astype(jnp.float32))


def golden(name, scene):
    path = os.path.join(REPO, "bench_goldens", name + ".npz")
    g = np.load(path)["image"].astype(np.float32)
    assert g.shape == (scene.height, scene.width, 3), g.shape
    return g


def parity_frac(img, gold):
    err = np.abs(np.asarray(img) - gold).max(axis=-1)
    return float((err > 2.0 / 255.0).mean())


def frame_ms(scene, bounces, frames=16, reps=3):
    """min-of-reps of an in-jit lax.map frame batch; returns ms/frame."""
    yaws = 90.0 + 1e-3 * jnp.arange(frames, dtype=jnp.float32)

    @jax.jit
    def batch(yaws):
        return jax.lax.map(
            lambda y: jnp.sum(_render_pallas_raw(scene, cam(y), 3, bounces)),
            yaws)

    np.asarray(batch(yaws))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(batch(yaws))
        best = min(best, (time.perf_counter() - t0) / frames)
    return best * 1e3


results = {}

# ---------------- Stage A: parity drift attribution ----------------
log("Stage A: parity attribution (dingdong 1280x720)")
ding = load("dingdong")
ding_gold = golden("dingdong", ding)
ding_bounces = resolve_bounces(trt.load_from_file(
    os.path.join(REPO, "scenes", "dingdong.yml")), RenderConfig())

CONFIGS = [
    ("default", {}),
    ("shadow_polish3", {"TRT_SHADOW_POLISH": "3"}),
    ("tile_rows8", {"TRT_TILE_ROWS": "8"}),
    ("dir_table_off", {"TRT_DIR_TABLE": "0"}),
    ("r3_knobs", {"TRT_SHADOW_POLISH": "3", "TRT_TILE_ROWS": "8",
                  "TRT_DIR_TABLE": "0"}),
]
KNOBS = ["TRT_SHADOW_POLISH", "TRT_TILE_ROWS", "TRT_DIR_TABLE"]
stage_a = {}
for label, env in CONFIGS:
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    img = np.asarray(_render_pallas_raw(ding, cam(), 3, ding_bounces))
    frac = parity_frac(img, ding_gold)
    ms = frame_ms(ding, ding_bounces, frames=16, reps=3)
    stage_a[label] = {"bad_px": frac, "ms": round(ms, 3)}
    log(f"  {label}: bad_px {frac:.6f}  frame {ms:.3f} ms")
for k in KNOBS:
    os.environ.pop(k, None)
results["parity_attribution"] = stage_a
print("STAGE_A " + json.dumps(stage_a), flush=True)

# ---------------- Stage A2: all-8 parity at defaults ----------------
log("Stage A2: all-8 full-res parity at shipped defaults (ratchet basis)")
stage_a2 = {}
for name in ["dingdong", "monkey_saddle", "20spheres", "reflection_test",
             "quadratic", "cubic", "clebsch", "cayley"]:
    scene = load(name)
    raw = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
    bounces = resolve_bounces(raw, RenderConfig())
    img = np.asarray(_render_pallas_raw(scene, cam(), 3, bounces))
    frac = parity_frac(img, golden(name, scene))
    stage_a2[name] = frac
    log(f"  {name}: bad_px {frac:.6f}")
results["parity_all8"] = stage_a2
print("STAGE_A2 " + json.dumps(stage_a2), flush=True)

# ---------------- Stage B: tile-rows decomposition ----------------
log("Stage B: tile-rows timing curve (fixed-overhead decomposition)")
stage_b = {}
for name in ["dingdong", "monkey_saddle", "quadratic"]:
    scene = load(name)
    raw = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
    bounces = resolve_bounces(raw, RenderConfig())
    n_px = scene.width * scene.height
    curve = {}
    for rows in [8, 16, 32, 64]:
        os.environ["TRT_TILE_ROWS"] = str(rows)
        ms = frame_ms(scene, bounces, frames=16, reps=3)
        n_tiles = -(-n_px // (rows * 128))
        curve[rows] = {"ms": round(ms, 3), "n_tiles": n_tiles,
                       "us_per_tile": round(ms * 1e3 / n_tiles, 3)}
        log(f"  {name} rows={rows}: {ms:.3f} ms, {n_tiles} tiles, "
            f"{ms * 1e3 / n_tiles:.2f} us/tile")
    os.environ.pop("TRT_TILE_ROWS", None)
    stage_b[name] = curve
results["tile_rows_curve"] = stage_b
print("STAGE_B " + json.dumps(stage_b), flush=True)

# ---------------- Stage C: XLA-fallback fwd+bwd A/B ----------------
log("Stage C: fused analytic backward vs XLA-recompute AD (dingdong)")
config = RenderConfig(geom_dtype="float32", polish_iters=3,
                      bounces=ding_bounces, chunk_px=None)
frames = 8
yaws = 90.0 + 1e-3 * jnp.arange(frames, dtype=jnp.float32)


def loss_fused(coefs, y):
    s = dataclasses.replace(ding, coefs=coefs)
    return jnp.sum(_render_pallas_raw(s, cam(y), 3, ding_bounces))


def loss_xla(coefs, y):
    s = dataclasses.replace(ding, coefs=coefs)
    return jnp.sum(_render_image_jit(s, cam(y), config))


stage_c = {}
for label, fn in [("fused", loss_fused), ("xla_recompute", loss_xla)]:
    @jax.jit
    def batch(coefs, yaws, fn=fn):
        return jax.lax.map(
            lambda y: jnp.sum(jax.grad(fn)(coefs, y) ** 2), yaws)

    np.asarray(batch(ding.coefs, yaws))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(batch(ding.coefs, yaws))
        best = min(best, (time.perf_counter() - t0) / frames)
    stage_c[label] = round(best * 1e3, 3)
    log(f"  {label}: {best * 1e3:.3f} ms/frame fwd+bwd")
results["xla_fallback_ab"] = stage_c
print("STAGE_C " + json.dumps(stage_c), flush=True)

with open("/tmp/r5_sweep.json", "w") as f:
    json.dump(results, f, indent=1)
log("done -> /tmp/r5_sweep.json")
