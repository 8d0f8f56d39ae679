"""Minutes-scale TPU smoke test: real Mosaic lowering on all 8 scenes.

The pytest suite runs the Pallas kernels in interpreter mode on CPU, which
cannot catch Mosaic-lowering regressions (e.g. scalar-predicate vector<i1>
selects — see .claude/skills/verify/SKILL.md). This script renders every
bundled scene at 64x48 through the REAL Mosaic compile on the attached TPU,
gates each frame against the live f64 NumPy oracle, and runs one
fused-analytic-backward gradient (dingdong) asserting finite, nonzero
grads. Run with the default environment (JAX_PLATFORMS=axon), host
otherwise idle:

    python tools/tpu_smoke.py            # ~8 compiles; <10 min warm cache

Exit 0 = every scene within its committed bad-pixel gate and the gradient
healthy. Also runs on CPU (interpreter) as a structural check.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W, H = 64, 48

# Bad-pixel fraction gates (max channel err > 2/255 vs the f64 NumPy oracle)
# at 64x48. Low resolution inflates the silhouette-pixel fraction relative
# to the full-res gates in bench.py; these bounds carry >2x margin over the
# values measured on TPU v5e (see docs/performance.md).
GATES = {
    "quadratic": 0.02,
    "20spheres": 0.02,
    "reflection_test": 0.02,
    "dingdong": 0.03,   # nastiest numerics: near-degenerate cubics at y=0
    "cayley": 0.02,
    "clebsch": 0.02,
    "cubic": 0.02,
    "monkey_saddle": 0.02,
}


def main():
    t_start = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.render.pallas_backend import render_image_pallas
    from tpu_ray_tracer.render.pipeline import RenderConfig, resolve_bounces
    from tpu_ray_tracer.render.reference_cpu import render_image_np

    device = jax.devices()[0]
    mode = "mosaic" if device.platform != "cpu" else "interpreter"
    print(f"[smoke] device={device} mode={mode}", flush=True)

    failures = []
    for name in GATES:
        scene = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
        scene = dataclasses.replace(scene, width=W, height=H)
        bounces = resolve_bounces(scene, RenderConfig())
        t0 = time.perf_counter()
        image = np.asarray(render_image_pallas(scene, bounces=bounces))
        dt = time.perf_counter() - t0
        golden = render_image_np(scene)
        bad = float((np.abs(image - golden).max(axis=-1) > 2 / 255).mean())
        ok = bad <= GATES[name] and np.isfinite(image).all()
        status = "ok" if ok else "FAIL"
        print(f"[smoke] {name:16s} bounces={bounces} bad_px={bad:.4f} "
              f"(gate {GATES[name]}) compile+run {dt:.1f}s {status}",
              flush=True)
        if not ok:
            failures.append(f"{name}: bad_px {bad:.4f} > {GATES[name]}")

    # one gradient through the fused analytic backward kernel (Mosaic bwd)
    scene = trt.load_from_file(os.path.join(REPO, "scenes", "dingdong.yml"))
    scene = dataclasses.replace(scene, width=W, height=H).astype(jnp.float32)

    def loss(coefs):
        img = render_image_pallas(
            dataclasses.replace(scene, coefs=coefs), bounces=0)
        return jnp.mean(jnp.square(img))

    t0 = time.perf_counter()
    g = np.asarray(jax.jit(jax.grad(loss))(scene.coefs))
    dt = time.perf_counter() - t0
    g_ok = np.isfinite(g).all() and np.abs(g).max() > 0
    print(f"[smoke] fused-bwd grad |g|max={np.abs(g).max():.3e} "
          f"compile+run {dt:.1f}s {'ok' if g_ok else 'FAIL'}", flush=True)
    if not g_ok:
        failures.append("fused backward gradient non-finite or zero")

    total = time.perf_counter() - t_start
    if failures:
        print(f"[smoke] FAILED in {total:.0f}s: " + "; ".join(failures))
        return 1
    print(f"[smoke] all green in {total:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
