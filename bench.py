"""Benchmark: forward Mrays/s on the reference's headline config.

Renders scenes/dingdong.yml (1280x720, 3 objects, 2 lights — the scene the
reference publishes ~25 ms / ~36.9 Mrays/s for its CUDA backend on,
BASELINE.md) with the f32 fast path on the available accelerator, and prints
ONE JSON line. ``vs_baseline`` is the ratio to the reference GPU's derived
36.9 Mrays/s.

Also measures forward+backward (gradient w.r.t. surface coefficients and
light colors) as an auxiliary figure, since the TPU build is differentiable.
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")
    import jax.numpy as jnp
    import numpy as np

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.diff.inverse import apply_params, extract_params
    from tpu_ray_tracer.render.pallas_backend import _render_pallas_raw
    from tpu_ray_tracer.render.pipeline import RenderConfig, _render_image_jit
    from tpu_ray_tracer.render.reference_cpu import render_image_np

    scene = trt.load_from_file(os.path.join(REPO, "scenes", "dingdong.yml"))
    n_px = scene.width * scene.height
    config = RenderConfig(geom_dtype="float32", polish_iters=3, bounces=0,
                          chunk_px=None)
    camera = trt.Camera(
        position=jnp.zeros(3, jnp.float32),
        yaw_deg=jnp.asarray(90.0, jnp.float32),
        pitch_deg=jnp.asarray(0.0, jnp.float32),
    )

    # Hot path: the fused Pallas tile kernel (falls back to the XLA pipeline
    # off-TPU, where Mosaic isn't available).
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        # No outer jit: the wrapper degree-partitions the object table
        # host-side (cubics-first), then calls a jitted kernel.
        fwd = lambda s, c: _render_pallas_raw(s, c, config.polish_iters, 0)
    else:
        fwd = jax.jit(lambda s, c: _render_image_jit(s, c, config))
    image = fwd(scene, camera)
    image.block_until_ready()  # compile

    # correctness gate: the timed kernel must match the f64 golden oracle
    golden = render_image_np(scene)
    err = np.abs(np.asarray(image) - golden).max(axis=-1)
    bad_px_fraction = float((err > 2.0 / 255.0).mean())

    # single-call latency (includes one host<->device round trip; on this
    # rig the TPU is reached through a relay whose round trip dominates)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        fwd(scene, camera).block_until_ready()
        times.append(time.perf_counter() - t0)
    latency_s = min(times)

    # device throughput: pipeline many async dispatches of the (cached)
    # frame and block once — the dispatches overlap the relay round trip,
    # so per-frame time converges to sustained device+feed throughput.
    # This is what a real-time loop achieves and the number comparable to
    # the reference's per-frame kernel time.
    import dataclasses as _dc

    frames = 50
    cameras = [
        _dc.replace(camera, yaw_deg=camera.yaw_deg + 1e-3 * k)
        for k in range(frames)
    ]
    # warm the pipeline
    fwd(scene, cameras[0]).block_until_ready()
    t0 = time.perf_counter()
    out = None
    for cam_k in cameras:
        out = fwd(scene, cam_k)
    out.block_until_ready()
    fwd_s = (time.perf_counter() - t0) / frames
    mrays_fwd = n_px / fwd_s / 1e6

    # forward+backward: grad of mean-image loss w.r.t. scene params.
    # On TPU this exercises the fused Pallas forward (which saves per-pixel
    # t/slot/occlusion) + the fused analytic backward kernel; off-TPU it
    # falls back to autodiff through the XLA pipeline.
    template = scene.astype(jnp.float32)
    params = extract_params(template)

    if on_tpu:
        from tpu_ray_tracer.render.pallas_backend import (
            _degree_partition, _render_pallas_jit,
        )

        perm_np, n_cubic = _degree_partition(template.coefs)
        perm = tuple(int(i) for i in perm_np)

        def render_fn(s, c):
            return _render_pallas_jit(s, c, config.polish_iters, 0,
                                      n_cubic, perm)
    else:
        def render_fn(s, c):
            return _render_image_jit(s, c, config)

    def loss_fn(params, camera):
        s = apply_params(template, params)
        img = render_fn(s, camera)
        return jnp.mean(img * img)

    grad_fn = jax.jit(jax.grad(loss_fn))
    jax.block_until_ready(grad_fn(params, camera))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(grad_fn(params, camera))
        times.append(time.perf_counter() - t0)
    fwdbwd_s = min(times)

    # pipelined fwd+bwd throughput (same rationale as the forward number:
    # overlapping dispatches hide the relay round trip)
    grads = None
    t0 = time.perf_counter()
    for cam_k in cameras[:20]:
        grads = grad_fn(params, cam_k)
    jax.block_until_ready(grads)
    fwdbwd_pipelined_s = (time.perf_counter() - t0) / 20
    mrays_fwdbwd = n_px / fwdbwd_pipelined_s / 1e6

    print(json.dumps({
        "metric": "mrays_per_s_fwd_dingdong_1280x720",
        "value": round(mrays_fwd, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_fwd / BASELINE_MRAYS, 3),
        "aux": {
            "frame_ms_fwd_device": round(fwd_s * 1e3, 3),
            "single_call_latency_ms": round(latency_s * 1e3, 3),
            "mrays_per_s_fwd_bwd": round(mrays_fwdbwd, 2),
            "frame_ms_fwd_bwd_device": round(fwdbwd_pipelined_s * 1e3, 3),
            "frame_ms_fwd_bwd_single_call": round(fwdbwd_s * 1e3, 3),
            "parity_bad_px_fraction_vs_f64_golden": round(bad_px_fraction, 6),
            "forward_backend": "pallas" if on_tpu else "xla",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
