"""Benchmark: forward Mrays/s on the reference's headline config.

Renders scenes/dingdong.yml (1280x720, 3 objects, 2 lights — the scene the
reference publishes ~25 ms / ~36.9 Mrays/s for its CUDA backend on,
BASELINE.md) with the fused Pallas kernel on the available accelerator and
prints the headline JSON line. ``vs_baseline`` is the ratio to the reference
GPU's derived 36.9 Mrays/s. monkey_saddle (the reference's second published
datapoint, 28.2 Mrays/s), 20spheres (many lights x many objects), and the
5-bounce reflection scene are measured as aux figures, as is
forward+backward throughput (gradients w.r.t. surface coefficients and
light colors through the fused analytic backward kernel).

Incremental emission (round-3 restructure): the bench prints a complete
cumulative JSON line after EVERY stage, headline scene first — if the
driver's timeout lands mid-run, the tail still holds the latest complete
result with the remaining stages listed under ``aux.pending``/``skipped``.
A wall-clock budget (TRT_BENCH_BUDGET_S, default 1500 s) is checked between
stages; stages that would not fit are skipped explicitly rather than dying
silently. Progress heartbeats go to stderr so a timed-out run shows where
it was.

Cold-compile cost is minimized: each forward stage is ONE jitted function
returning (per-frame sums, parity frame), and the full-resolution f64 NumPy
parity goldens are precomputed in bench_goldens/*.npz (20spheres alone
costs ~335 s of NumPy time; see tools/make_bench_goldens.py).

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
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
try:  # installed package (pip install -e . --no-build-isolation)
    import tpu_ray_tracer  # noqa: F401
except ImportError:  # fresh checkout without install: run from the repo
    sys.path.insert(0, REPO)

BASELINE_MRAYS = 36.864  # 921600 px / 25 ms (BASELINE.md, derived row 1)
BASELINE_MRAYS_MONKEY = 28.235  # 480000 px / 17 ms (BASELINE.md, derived row 2)

# Committed full-resolution parity gates: bad-pixel fraction (max channel
# error > 2/255 vs the f64 NumPy golden) per scene — ALL 8 bundled scenes.
# RATCHET (VERDICT r4 #1b): each gate is ~2x the value measured on TPU v5e
# with the shipped kernel (r5 final sweep, 2026-08-21: dingdong 0.001335,
# cayley 0.000327, 20spheres 1.7e-5, reflection 3.7e-6, clebsch 2.1e-6,
# monkey/quadratic/cubic exactly 0.0), floored at 1e-4 (~92 px at 720p)
# so a one-pixel wobble cannot flake the gate. A kernel change that moves
# parity must update its gate IN THE SAME COMMIT, with the new measured
# value in the message — throughput wins can no longer silently spend the
# margin. Exceeding a gate exits nonzero.
PARITY_GATES = {
    "dingdong": 0.0027,
    "monkey_saddle": 1e-4,
    "20spheres": 1e-4,
    "reflection_test": 1e-4,
    "quadratic": 1e-4,
    "cayley": 7e-4,
    "clebsch": 1e-4,
    "cubic": 1e-4,
}

FWD_FRAMES = int(os.environ.get("TRT_BENCH_FRAMES", "32"))
# same in-jit frame count as the forward: at 8 frames the fixed relay
# dispatch cost (~10 ms/call) dominated the ~0.2 ms true backward-kernel
# increment, under-reporting fwd+bwd by ~40% (decomposition 2026-08-21:
# specialized fwd 3.59 ms, +aux ~0, +bwd 0.20 ms per frame)
FWDBWD_FRAMES = int(os.environ.get("TRT_BENCH_FRAMES", "32"))
BUDGET_S = float(os.environ.get("TRT_BENCH_BUDGET_S", "1500"))
# Debug knob: scale scene resolutions down for fast structural runs
# (disables the committed full-res goldens; never set by the driver).
SCALE = float(os.environ.get("TRT_BENCH_SCALE", "1"))

_T0 = time.perf_counter()
_STAGE = ["startup"]


def _elapsed():
    return time.perf_counter() - _T0


def _log(msg):
    print(f"[bench t={_elapsed():7.1f}s] {msg}", file=sys.stderr, flush=True)


def _heartbeat():
    while True:
        time.sleep(60.0)
        _log(f"heartbeat: stage={_STAGE[0]}")


def _load_golden(name, scene):
    """Committed f16 golden if present and matching, else live NumPy f64."""
    from tpu_ray_tracer.render.reference_cpu import render_image_np
    import numpy as np

    path = os.path.join(REPO, "bench_goldens", name + ".npz")
    if SCALE == 1 and os.path.exists(path):
        golden = np.load(path)["image"].astype(np.float32)
        if golden.shape == (scene.height, scene.width, 3):
            return golden
        _log(f"golden {name}: committed shape {golden.shape} stale, recomputing")
    _log(f"golden {name}: computing live (NumPy f64)")
    return render_image_np(scene)


def _bench_fwd(name, scene, *, fwd_frames=FWD_FRAMES, bounces=0):
    """Forward throughput + parity frame for one scene, ONE compiled
    executable: lax.map over fwd_frames distinct poses (each reduced to a
    scalar) plus the parity frame at the reference pose — fetched, so the
    axon relay cannot elide the work. Everything rides the fused Pallas
    kernel (off-TPU this falls back to the XLA pipeline for a smoke
    number)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.render.pallas_backend import _render_pallas_raw
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

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

    yaws = 90.0 + 1e-3 * jnp.arange(fwd_frames, dtype=jnp.float32)

    @jax.jit
    def fwd_many(yaws):
        sums = jax.lax.map(lambda y: jnp.sum(render(scene32, cam(y))), yaws)
        parity = render(scene32, cam(90.0))  # reference pose, same kernel
        return sums, parity

    _STAGE[0] = f"{name}:fwd compile"
    _log(f"{name}: compiling fwd ({fwd_frames} frames + parity frame)")
    sums, image = fwd_many(yaws)
    image = np.asarray(image)  # fetch -> forces the warm run to execute
    np.asarray(sums)
    _STAGE[0] = f"{name}:fwd measure"
    t0 = time.perf_counter()
    np.asarray(fwd_many(yaws)[0])  # fetch sums only; the executable runs whole
    # the executable renders fwd_frames map frames + 1 parity frame
    fwd_s = (time.perf_counter() - t0) / (fwd_frames + 1)
    _log(f"{name}: fwd {fwd_s*1e3:.3f} ms/frame ({n_px/fwd_s/1e6:.1f} Mrays/s)")

    _STAGE[0] = f"{name}:parity"
    golden = _load_golden(name, scene)
    err = np.abs(image - golden).max(axis=-1)
    bad_px_fraction = float((err > 2.0 / 255.0).mean())
    _log(f"{name}: parity bad-px fraction {bad_px_fraction:.6f}")

    return {
        "frame_ms_fwd": fwd_s * 1e3,
        "mrays_fwd": n_px / fwd_s / 1e6,
        "parity_bad_px_fraction": bad_px_fraction,
    }


def _bench_fwdbwd(name, scene, *, bounces=0):
    """Forward+backward throughput: per-frame grads of a scalar image loss
    w.r.t. surface coefficients + light colors, through the fused analytic
    backward kernel (or XLA recompute off-TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.diff.inverse import apply_params, extract_params
    from tpu_ray_tracer.render.pallas_backend import (
        _light_kinds_of,
        _render_pallas_jit,
        _statics_for,
    )
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit

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
        # Specialize the kernel on the CONCRETE scene's degree partition and
        # light kinds even under jax.grad tracing (where coefficients are
        # abstract and _render_pallas_raw would fall back to the
        # conservative all-cubic routing): the bench evaluates gradients AT
        # this scene, the partition only affects solver routing, and the
        # IFT backward uses the full 20-monomial basis regardless — so
        # gradients (incl. w.r.t. cubic coefficients of quadric objects)
        # are identical, just ~25% faster.
        perm, n_cubic, posdef = _statics_for(scene32.coefs)
        kinds = _light_kinds_of(scene32.light_is_spherical)
        render = lambda s, c: _render_pallas_jit(
            s, c, config.polish_iters, bounces, n_cubic, perm, None, kinds,
            posdef)
    else:
        render = lambda s, c: _render_image_jit(s, c, config)

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

    yaws_b = 90.0 + 1e-3 * jnp.arange(FWDBWD_FRAMES, dtype=jnp.float32)
    _STAGE[0] = f"{name}:fwdbwd compile"
    _log(f"{name}: compiling fwd+bwd ({FWDBWD_FRAMES} frames)")
    np.asarray(fwdbwd_many(params, yaws_b))  # compile + warm
    _STAGE[0] = f"{name}:fwdbwd measure"
    t0 = time.perf_counter()
    np.asarray(fwdbwd_many(params, yaws_b))
    fwdbwd_s = (time.perf_counter() - t0) / FWDBWD_FRAMES
    _log(f"{name}: fwd+bwd {fwdbwd_s*1e3:.3f} ms/frame "
         f"({n_px/fwdbwd_s/1e6:.1f} Mrays/s)")
    return {
        "frame_ms_fwd_bwd": fwdbwd_s * 1e3,
        "mrays_fwd_bwd": n_px / fwdbwd_s / 1e6,
    }


def _emit(results, pending, skipped):
    """Print one complete cumulative JSON line from whatever is measured so
    far. The driver keeps the LAST parseable line in its tail."""
    import jax

    ding = results.get("dingdong", {})
    if "mrays_fwd" not in ding:
        return  # nothing headline-worthy yet
    aux = {
        "frame_ms_fwd_dingdong": round(ding["frame_ms_fwd"], 3),
    }
    # the reflective scene runs its full 5-bounce chain -> distinct key
    display = {"reflection_test": "reflection5b"}
    for key, r in results.items():
        name = display.get(key, key)
        if key != "dingdong" and "mrays_fwd" in r:
            aux[f"mrays_per_s_fwd_{name}"] = round(r["mrays_fwd"], 2)
        if "mrays_fwd_bwd" in r:
            aux[f"mrays_per_s_fwd_bwd_{name}"] = round(r["mrays_fwd_bwd"], 2)
    if "mrays_fwd_bwd" in ding:
        aux["frame_ms_fwd_bwd_dingdong"] = round(ding["frame_ms_fwd_bwd"], 3)
    monkey = results.get("monkey_saddle", {})
    if "mrays_fwd" in monkey:
        aux["monkey_saddle_vs_baseline"] = round(
            monkey["mrays_fwd"] / BASELINE_MRAYS_MONKEY, 3)
    spheres = results.get("20spheres", {})
    if "mrays_fwd" in spheres:
        aux["frame_ms_fwd_20spheres"] = round(spheres["frame_ms_fwd"], 3)
    aux["parity_bad_px_fraction"] = {
        k: round(v["parity_bad_px_fraction"], 6)
        for k, v in results.items() if "parity_bad_px_fraction" in v
    }
    failed = sorted(
        s for v in results.values() for s in v.get("failed_stages", ())
    )
    if failed:
        aux["failed"] = failed
    if pending:
        aux["pending"] = list(pending)
    if skipped:
        aux["skipped"] = list(skipped)
    aux["elapsed_s"] = round(_elapsed(), 1)
    aux["forward_backend"] = ("pallas"
                              if jax.devices()[0].platform != "cpu"
                              else "xla")
    aux["device"] = str(jax.devices()[0])
    print(json.dumps({
        "metric": "mrays_per_s_fwd_dingdong_1280x720",
        "value": round(ding["mrays_fwd"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(ding["mrays_fwd"] / BASELINE_MRAYS, 3),
        "aux": aux,
    }), flush=True)


def main():
    threading.Thread(target=_heartbeat, daemon=True).start()
    _log(f"starting: budget={BUDGET_S:.0f}s scale={SCALE} "
         f"frames={FWD_FRAMES}")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

    import dataclasses

    import tpu_ray_tracer as trt

    def load(name):
        scene = trt.load_from_file(
            os.path.join(REPO, "scenes", name + ".yml"))
        if SCALE != 1:
            scene = dataclasses.replace(
                scene, width=max(8, int(scene.width * SCALE)),
                height=max(8, int(scene.height * SCALE)))
        return scene

    _STAGE[0] = "device probe"
    _log(f"devices: {jax.devices()}")

    # Stage list, headline first; each entry = (key, scene name, callable).
    # 20spheres goes last: it is the largest compile, and with incremental
    # emission its loss under a timeout costs only its own row.
    refl_name = "reflection_test"
    stages = []
    scenes = {}

    def scene_for(name):
        if name not in scenes:
            scenes[name] = load(name)
        return scenes[name]

    results = {}

    stages.append(("dingdong.fwd", "dingdong",
                   lambda: _bench_fwd("dingdong", scene_for("dingdong"))))
    stages.append(("dingdong.fwdbwd", "dingdong",
                   lambda: _bench_fwdbwd("dingdong", scene_for("dingdong"))))
    stages.append(("monkey_saddle.fwd", "monkey_saddle",
                   lambda: _bench_fwd("monkey_saddle",
                                      scene_for("monkey_saddle"))))
    # backward on the pure-cubic polynomial scene (VERDICT r3 #2)
    stages.append(("monkey_saddle.fwdbwd", "monkey_saddle",
                   lambda: _bench_fwdbwd("monkey_saddle",
                                         scene_for("monkey_saddle"))))
    # the reflective scene runs its full 5-bounce chain, fwd AND fused
    # analytic bwd through the chain (reference update-cuda.cu:126-146)
    stages.append((f"{refl_name}.fwd", refl_name,
                   lambda: _bench_fwd(
                       refl_name, scene_for(refl_name),
                       fwd_frames=FWDBWD_FRAMES,
                       bounces=scene_for(refl_name).max_reflections)))
    stages.append((f"{refl_name}.fwdbwd", refl_name,
                   lambda: _bench_fwdbwd(
                       refl_name, scene_for(refl_name),
                       bounces=scene_for(refl_name).max_reflections)))
    stages.append(("20spheres.fwd", "20spheres",
                   lambda: _bench_fwd("20spheres", scene_for("20spheres"),
                                      fwd_frames=FWDBWD_FRAMES)))
    # backward where the unrolled per-object gather/scatter is widest
    # (20 objects x 19 lights — VERDICT r3 #2)
    stages.append(("20spheres.fwdbwd", "20spheres",
                   lambda: _bench_fwdbwd("20spheres",
                                         scene_for("20spheres"))))
    # remaining corpus: full-resolution forward + parity gate per scene
    # (VERDICT r3 #3 — parity_bad_px_fraction must cover all 8 scenes)
    for extra in ("quadratic", "cubic", "clebsch", "cayley"):
        stages.append((f"{extra}.fwd", extra,
                       lambda extra=extra: _bench_fwd(
                           extra, scene_for(extra),
                           fwd_frames=FWDBWD_FRAMES)))

    skipped = []
    for i, (stage_name, scene_key, run) in enumerate(stages):
        remaining = [s[0] for s in stages[i + 1:]]
        if _elapsed() > BUDGET_S and "dingdong" in results:
            _log(f"budget exhausted ({_elapsed():.0f}s > {BUDGET_S:.0f}s): "
                 f"skipping {stage_name} and the rest")
            skipped = [stage_name] + remaining
            break
        _STAGE[0] = stage_name
        try:
            out = run()
        except Exception as exc:  # one broken stage must not kill the rest
            _log(f"STAGE FAILED {stage_name}: {type(exc).__name__}: {exc}")
            import traceback
            traceback.print_exc(file=sys.stderr)
            results.setdefault(scene_key, {}).setdefault(
                "failed_stages", []).append(stage_name)
            # emit so the failure is visible in aux.failed, not silently
            # dropped from pending (ADVICE r3 bench.py finding)
            _emit(results, pending=remaining, skipped=[])
            continue
        results.setdefault(scene_key, {}).update(out)
        _emit(results, pending=remaining, skipped=[])
    _emit(results, pending=[], skipped=skipped)

    if "mrays_fwd" not in results.get("dingdong", {}):
        # no headline number was ever produced: the bench as a whole failed
        # and must not exit 0 with no JSON line (ADVICE r3)
        print("BENCH FAILED: headline stage dingdong.fwd produced no result",
              file=sys.stderr)
        sys.exit(1)

    failures = [
        f"{k}: {results[k]['parity_bad_px_fraction']:.6f} > {PARITY_GATES[k]}"
        for k in results
        if "parity_bad_px_fraction" in results[k]
        and results[k]["parity_bad_px_fraction"] > PARITY_GATES[k]
    ]
    if failures:
        print("PARITY GATE FAILED: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)
    _log("done")


if __name__ == "__main__":
    main()
