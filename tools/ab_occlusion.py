"""A/B sweep for the r4 occlusion-classifier specializations on real TPU.

Configs (all in ONE process — relay wall-clock varies +-20% between
processes, so cross-process A/Bs of <25% deltas are noise):
  base   — generic occlusion classifier, no direction table (the r4
           solver restructures and tile height are NOT disabled here;
           set TRT_TILE_ROWS=8 for a closer r3 baseline)
  posdef — + static positive-definite-Q specialization
  table  — + precomputed per-(light, object) direction-form SMEM table

Methodology: N frames with distinct poses inside ONE jit via lax.map,
each reduced to a scalar, result fetched; min-of-REPS wall/N. Same as
bench.py (the axon relay elides unfetched work — see verify skill).

Run with the DEFAULT env (TPU), host otherwise idle:
    python tools/ab_occlusion.py [scene ...]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/trt_bench_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import tpu_ray_tracer as trt  # noqa: E402
from tpu_ray_tracer.render import pallas_backend as pb  # noqa: E402

FRAMES = int(os.environ.get("TRT_AB_FRAMES", "32"))
REPS = int(os.environ.get("TRT_AB_REPS", "3"))


def measure(label, scene, *, posdef, table):
    os.environ["TRT_DIR_TABLE"] = "1" if table else "0"
    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
    perm, n_cubic, pd_real = pb._statics_for(scene32.coefs)
    kinds = pb._light_kinds_of(scene32.light_is_spherical)
    pd = pd_real if posdef else None
    coefs, colors, refl = scene32.coefs, scene32.colors, scene32.reflection
    if any(perm[i] != i for i in range(len(perm))):
        idx = jnp.asarray(np.asarray(perm, np.int64))
        coefs = jnp.take(coefs, idx, axis=0)
        colors = jnp.take(colors, idx, axis=0)
        refl = jnp.take(refl, idx, axis=0)
    lights = pb._pack_lights(scene32)

    def render(yaw):
        cam = trt.Camera(position=jnp.zeros(3, jnp.float32),
                         yaw_deg=yaw, pitch_deg=jnp.asarray(0.0, jnp.float32))
        packed_cam = pb._pack_camera(scene32, cam)
        return pb._packed_render(
            coefs, colors, refl, lights, packed_cam,
            scene.width, scene.height, 3, 0, n_cubic, perm, 1, None,
            kinds, pd,
        )

    # fresh lambda per config: a distinct outer-jit identity, so flipping
    # the env knob between configs cannot hit a stale trace
    many = jax.jit(lambda yaws: jax.lax.map(
        lambda y: jnp.sum(render(y)), yaws))
    yaws = 90.0 + 1e-3 * jnp.arange(FRAMES, dtype=jnp.float32)
    t0 = time.perf_counter()
    np.asarray(many(yaws))  # compile + warm (fetch forces execution)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(many(yaws))
        best = min(best, (time.perf_counter() - t0) / FRAMES)
    n_px = scene.width * scene.height
    print(f"{label}: {best*1e3:7.3f} ms/frame  {n_px/best/1e6:7.1f} Mrays/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return best


def main():
    names = sys.argv[1:] or ["20spheres", "dingdong"]
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        scene = trt.load_from_file(os.path.join(REPO, "scenes", name + ".yml"))
        base = measure(f"{name:12s} base  ", scene, posdef=False, table=False)
        pd = measure(f"{name:12s} posdef", scene, posdef=True, table=False)
        tbl = measure(f"{name:12s} +table", scene, posdef=True, table=True)
        print(f"{name}: posdef {base/pd:.2f}x, posdef+table {base/tbl:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
