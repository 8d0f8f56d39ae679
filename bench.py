"""Benchmark: forward Mrays/s on the reference's headline config.

Renders scenes/dingdong.yml (1280x720, 3 objects, 2 lights — the scene the
reference publishes ~25 ms / ~36.9 Mrays/s for its CUDA backend on,
BASELINE.md) with the fused Pallas kernel on the available accelerator and
prints ONE JSON line. ``vs_baseline`` is the ratio to the reference GPU's
derived 36.9 Mrays/s. monkey_saddle (the reference's second published
datapoint, 28.2 Mrays/s) and 20spheres (many lights x many objects) are
measured as aux figures, as is forward+backward throughput (gradients
w.r.t. surface coefficients and light colors through the fused analytic
backward kernel).

Timing methodology (see .claude/skills/verify/SKILL.md): N frames with
DISTINCT camera poses inside ONE jit via ``lax.map``, each frame reduced to
a scalar, the result FETCHED — wall time / N. Pipelined async dispatch
through the axon TPU relay is untrustworthy (the relay elides computations
whose outputs are never fetched; block_until_ready alone does not force
execution), so it is not used anywhere here.

Parity is a GATE, not a report: each benched scene's full-resolution frame
is compared against the f64 NumPy golden oracle, and the process exits
nonzero if any scene exceeds its committed bad-pixel threshold — a kernel
change that wins throughput by breaking parity turns the bench red.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
try:  # installed package (pip install -e . --no-build-isolation)
    import tpu_ray_tracer  # noqa: F401
except ImportError:  # fresh checkout without install: run from the repo
    sys.path.insert(0, REPO)

BASELINE_MRAYS = 36.864  # 921600 px / 25 ms (BASELINE.md, derived row 1)
BASELINE_MRAYS_MONKEY = 28.235  # 480000 px / 17 ms (BASELINE.md, derived row 2)

# Committed full-resolution parity gates: bad-pixel fraction (max channel
# error > 2/255 vs the f64 NumPy golden) per scene. Headline dingdong
# measured 0.0016 on TPU v5e in r1; the others leave the same margin over
# their measured values. Exceeding a gate exits nonzero.
PARITY_GATES = {
    "dingdong": 0.006,
    "monkey_saddle": 0.006,
    "20spheres": 0.006,
    "reflection_test": 0.006,
}

FWD_FRAMES = 32
FWDBWD_FRAMES = 8


def _bench_scene(name, scene, *, fwd_frames=FWD_FRAMES, measure_bwd=False,
                 bounces=0):
    """Measure one scene -> dict of numbers. Everything rides the fused
    Pallas kernel (interpreter off-TPU would be meaninglessly slow, so
    off-TPU this falls back to the XLA pipeline for a smoke number)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.diff.inverse import apply_params, extract_params
    from tpu_ray_tracer.render.pallas_backend import _render_pallas_raw
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit
    from tpu_ray_tracer.render.reference_cpu import render_image_np

    n_px = scene.width * scene.height
    on_tpu = jax.devices()[0].platform != "cpu"
    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
    config = RenderConfig(geom_dtype="float32", polish_iters=3,
                          bounces=bounces, chunk_px=None)

    def cam(yaw):
        return trt.Camera(
            position=jnp.zeros(3, jnp.float32),
            yaw_deg=jnp.asarray(yaw, jnp.float32),
            pitch_deg=jnp.asarray(0.0, jnp.float32),
        )

    if on_tpu:
        render = lambda s, c: _render_pallas_raw(s, c, config.polish_iters,
                                                 bounces)
    else:
        render = lambda s, c: _render_image_jit(s, c, config)

    # parity gate input: one full frame at the reference pose
    image = np.asarray(render(scene32, cam(90.0)))
    golden = render_image_np(scene)
    err = np.abs(image - golden).max(axis=-1)
    bad_px_fraction = float((err > 2.0 / 255.0).mean())

    # forward throughput: fwd_frames distinct poses inside ONE jit
    yaws = 90.0 + 1e-3 * jnp.arange(fwd_frames, dtype=jnp.float32)

    @jax.jit
    def fwd_many(yaws):
        return jax.lax.map(lambda y: jnp.sum(render(scene32, cam(y))), yaws)

    np.asarray(fwd_many(yaws))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(fwd_many(yaws))  # fetch forces real execution
    fwd_s = (time.perf_counter() - t0) / fwd_frames
    out = {
        "frame_ms_fwd": fwd_s * 1e3,
        "mrays_fwd": n_px / fwd_s / 1e6,
        "parity_bad_px_fraction": bad_px_fraction,
    }

    if measure_bwd:
        template = scene32
        params = extract_params(template)

        def loss_fn(params, yaw):
            s = apply_params(template, params)
            img = render(s, cam(yaw))
            return jnp.mean(img * img)

        @jax.jit
        def fwdbwd_many(params, yaws):
            def one(y):
                g = jax.grad(loss_fn)(params, y)
                return sum(jnp.sum(v) for v in g.values())
            return jax.lax.map(one, yaws)

        yaws_b = yaws[:FWDBWD_FRAMES]
        np.asarray(fwdbwd_many(params, yaws_b))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(fwdbwd_many(params, yaws_b))
        fwdbwd_s = (time.perf_counter() - t0) / FWDBWD_FRAMES
        out["frame_ms_fwd_bwd"] = fwdbwd_s * 1e3
        out["mrays_fwd_bwd"] = n_px / fwdbwd_s / 1e6
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

    import tpu_ray_tracer as trt

    scenes = {
        name: trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
        for name in ("dingdong", "monkey_saddle", "20spheres",
                     "reflection_test")
    }
    ding = _bench_scene("dingdong", scenes["dingdong"], measure_bwd=True)
    monkey = _bench_scene("monkey_saddle", scenes["monkey_saddle"])
    spheres = _bench_scene("20spheres", scenes["20spheres"],
                           fwd_frames=FWDBWD_FRAMES)
    # the reflective scene runs its full 5-bounce chain, fwd AND fused
    # analytic bwd through the chain (reference update-cuda.cu:126-146)
    refl = _bench_scene("reflection_test", scenes["reflection_test"],
                        fwd_frames=FWDBWD_FRAMES, measure_bwd=True,
                        bounces=scenes["reflection_test"].max_reflections)

    results = {"dingdong": ding, "monkey_saddle": monkey,
               "20spheres": spheres, "reflection_test": refl}
    print(json.dumps({
        "metric": "mrays_per_s_fwd_dingdong_1280x720",
        "value": round(ding["mrays_fwd"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(ding["mrays_fwd"] / BASELINE_MRAYS, 3),
        "aux": {
            "frame_ms_fwd_dingdong": round(ding["frame_ms_fwd"], 3),
            "mrays_per_s_fwd_bwd_dingdong": round(ding["mrays_fwd_bwd"], 2),
            "frame_ms_fwd_bwd_dingdong": round(ding["frame_ms_fwd_bwd"], 3),
            "mrays_per_s_fwd_monkey_saddle": round(monkey["mrays_fwd"], 2),
            "monkey_saddle_vs_baseline": round(
                monkey["mrays_fwd"] / BASELINE_MRAYS_MONKEY, 3),
            "mrays_per_s_fwd_20spheres": round(spheres["mrays_fwd"], 2),
            "frame_ms_fwd_20spheres": round(spheres["frame_ms_fwd"], 3),
            "mrays_per_s_fwd_reflection5b": round(refl["mrays_fwd"], 2),
            "mrays_per_s_fwd_bwd_reflection5b": round(
                refl["mrays_fwd_bwd"], 2),
            "parity_bad_px_fraction": {
                k: round(v["parity_bad_px_fraction"], 6)
                for k, v in results.items()
            },
            "forward_backend": ("pallas"
                                if jax.devices()[0].platform != "cpu"
                                else "xla"),
            "device": str(jax.devices()[0]),
        },
    }))

    failures = [
        f"{k}: {results[k]['parity_bad_px_fraction']:.6f} > {PARITY_GATES[k]}"
        for k in results
        if results[k]["parity_bad_px_fraction"] > PARITY_GATES[k]
    ]
    if failures:
        print("PARITY GATE FAILED: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
