"""First-principles VPU roofline for the fused Pallas kernel.

Answers the question VERDICT r3 posed: is N Mrays/s on a given scene near
the hardware ceiling or far under it? The reference offers no analogous
analysis (its only perf artifact is two frame times in
presentation/problem_description.tex), so the methodology here is built
from the kernel itself:

1. Trace the EXACT kernel the bench runs (``_render_pallas_raw`` with the
   TPU-default knobs) and pull the Pallas kernel jaxpr out of the
   ``pallas_call`` primitive — no separate cost model that could drift
   from the shipped code.
2. Walk the jaxpr, counting VECTOR instructions: one count per (8, 128)
   vreg an equation writes (a (3, 8, 128) output counts 3). Scalar
   equations (SMEM table reads, scalar Taylor assembly for directional
   lights) are tallied separately — they ride the scalar core, not the
   VPU. Static-trip-count loops (``fori_loop`` over objects lowers to
   ``scan``) multiply their body count by the trip count; ``cond``
   branches contribute their MAXIMUM (the tile-uniform skips mean real
   frames often run the cheap branch, so the estimate is an upper bound
   for sky tiles and exact for worker tiles).
3. Weight transcendentals by throughput-equivalent slots (WEIGHTS below):
   TPUs execute exp/log/cos through multi-slot special-function sequences;
   the default weights are deliberately coarse (2-6x) and printed, so the
   conclusion can be re-derived under different assumptions.
4. Compare ops/frame against the VPU issue roofline: 8x128 lanes x
   ~4 ALU slots/cycle x ~1.5 GHz on TPU v5e (the clock back-derived from
   the public 197 bf16 TFLOP/s with 4 128x128 MXUs: 197e12 / (4*2*128^2)
   = 1.50 GHz). Both constants are printed, not buried.

Usage:  PYTHONPATH= JAX_PLATFORMS=cpu python tools/roofline.py [scene ...]
Emits one JSON line per scene (plus a human-readable table on stderr);
pass measured frame times via --ms dingdong=2.351,... to get utilization.
"""

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Trace the TPU-default kernel shape (interpreter mode keeps the per-light
# cond ON, which is NOT what the TPU runs)
os.environ.setdefault("TRT_PALLAS_INTERPRET", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

VREG = 8 * 128

# Throughput-equivalent VPU slots per vector instruction. 1.0 = a plain
# elementwise ALU op. Transcendentals and divides run through multi-slot
# special-function sequences; these are coarse public-knowledge estimates
# (the TPU ISA is not public), kept explicit so the roofline can be
# recomputed under different assumptions.
WEIGHTS = {
    "exp": 3.0, "log": 3.0, "cos": 3.0, "sin": 3.0, "tan": 4.0,
    "pow": 6.0,          # Mosaic lowers pow as exp(log(x) * y)
    "integer_pow": 2.0,
    "div": 2.0, "sqrt": 2.0, "rsqrt": 2.0, "cbrt": 4.0,
    "atan2": 6.0, "tanh": 3.0, "logistic": 3.0,
}
FREE = {
    # shape/metadata-only: no VPU arithmetic
    "broadcast_in_dim", "reshape", "squeeze", "convert_element_type",
    "transpose", "copy", "slice", "bitcast_convert_type", "stop_gradient",
}


def _count_jaxpr(jaxpr):
    """(vector_slots, vector_instrs, scalar_instrs) for one jaxpr."""
    vec_slots = 0.0
    vec_instrs = 0
    scalar_instrs = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        subs = []
        if prim == "scan":
            body = eqn.params["jaxpr"].jaxpr
            s, vi, sc = _count_jaxpr(body)
            n = eqn.params["length"]
            vec_slots += s * n
            vec_instrs += vi * n
            scalar_instrs += sc * n
            continue
        if prim == "while":
            # trip count is not static; assume 1 (the kernel only uses
            # while via fori_loop with static bounds, which lowers to scan)
            for key in ("cond_jaxpr", "body_jaxpr"):
                s, vi, sc = _count_jaxpr(eqn.params[key].jaxpr)
                vec_slots += s
                vec_instrs += vi
                scalar_instrs += sc
            continue
        if prim == "cond":
            branches = eqn.params["branches"]
            best = (0.0, 0, 0)
            for br in branches:
                c = _count_jaxpr(br.jaxpr)
                if c[0] >= best[0]:
                    best = c
            vec_slots += best[0]
            vec_instrs += best[1]
            scalar_instrs += best[2]
            continue
        if prim in ("pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint"):
            inner = eqn.params.get("jaxpr")
            if inner is not None:
                s, vi, sc = _count_jaxpr(
                    inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                vec_slots += s
                vec_instrs += vi
                scalar_instrs += sc
            continue
        if prim in FREE:
            continue
        # arithmetic: count one instruction per vreg written
        out_elems = max(
            (int(np.prod(v.aval.shape)) for v in eqn.outvars
             if hasattr(v.aval, "shape")),
            default=1,
        )
        if out_elems >= VREG:
            vregs = out_elems / VREG
            vec_instrs += int(round(vregs))
            vec_slots += vregs * WEIGHTS.get(prim, 1.0)
        else:
            scalar_instrs += 1
    return vec_slots, vec_instrs, scalar_instrs


def kernel_counts(scene, bounces=0):
    """Trace the shipped kernel for this scene; count its jaxpr.

    The statics (degree partition, light kinds, posdef mask) are captured
    from the CONCRETE scene first — tracing ``_render_pallas_raw`` directly
    would route through the conservative all-cubic fallback (scene leaves
    are tracers inside ``make_jaxpr``) and overcount by the cubic/quadric
    solver cost ratio."""
    from tpu_ray_tracer.ops.camera import Camera
    from tpu_ray_tracer.render.pallas_backend import (
        _light_kinds_of, _render_pallas_jit, _statics_for,
    )

    scene32 = jax.tree.map(jnp.asarray, scene.astype(jnp.float32))
    perm, n_cubic, posdef = _statics_for(scene32.coefs)
    kinds = _light_kinds_of(scene32.light_is_spherical)
    cam = Camera(position=jnp.zeros(3, jnp.float32),
                 yaw_deg=jnp.asarray(90.0, jnp.float32),
                 pitch_deg=jnp.asarray(0.0, jnp.float32))
    closed = jax.make_jaxpr(
        lambda s, c: _render_pallas_jit(
            s, c, 3, bounces, n_cubic, perm, None, kinds, posdef)
    )(scene32, cam)

    found = []

    def find(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                found.append(eqn.params["jaxpr"])
            for sub in eqn.params.values():
                core = getattr(sub, "jaxpr", None)
                if core is not None:
                    find(core)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        core = getattr(s, "jaxpr", None)
                        if core is not None:
                            find(core)

    find(closed.jaxpr)
    assert found, "no pallas_call in trace (fallback path?)"
    # forward kernel = the first pallas_call (the only one at bounces>=0
    # without grad)
    return _count_jaxpr(found[0])


# v5e TensorCore constants (printed, not hidden): clock back-derived from
# public 197 bf16 TFLOP/s = 4 MXUs * 2*128*128 flops * clock.
CLOCK_HZ = 1.50e9
VPU_SLOTS_PER_CYCLE = 4.0  # ALU issue width per lane group


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scenes", nargs="*",
                    default=["dingdong", "20spheres", "monkey_saddle"])
    ap.add_argument("--ms", default="",
                    help="measured frame times, scene=ms[,scene=ms...]")
    ap.add_argument("--bounces", type=int, default=0)
    args = ap.parse_args()
    measured = {}
    for part in args.ms.split(","):
        if "=" in part:
            k, v = part.split("=")
            measured[k] = float(v)

    import tpu_ray_tracer as trt
    from tpu_ray_tracer.render.pallas_backend import (
        TILE_LANES, _grid_geometry, _tile_rows,
    )
    TILE_PX = _tile_rows() * TILE_LANES

    peak_slots_s = VPU_SLOTS_PER_CYCLE * CLOCK_HZ
    print(f"# VPU issue roofline: {VPU_SLOTS_PER_CYCLE:.0f} slots/cycle x "
          f"{CLOCK_HZ/1e9:.2f} GHz = {peak_slots_s/1e9:.1f} G vector-instr/s "
          f"(each instr = one (8,128) vreg)", file=sys.stderr)
    for name in args.scenes:
        scene = trt.load_from_file(
            os.path.join(REPO, "scenes", name + ".yml"))
        slots, instrs, scalars = kernel_counts(scene, bounces=args.bounces)
        n_px, n_tiles, _ = _grid_geometry(scene.width, scene.height)
        per_frame_slots = slots * n_tiles
        out = {
            "scene": name,
            "objects": int(scene.n_objects),
            "lights": int(scene.n_lights),
            "vector_instrs_per_tile": int(instrs),
            "weighted_slots_per_tile": round(slots, 1),
            "scalar_instrs_per_tile": int(scalars),
            "weighted_slots_per_ray": round(slots / TILE_PX, 1),
            "tiles": n_tiles,
        }
        if name in measured:
            t = measured[name] * 1e-3
            achieved = per_frame_slots / t
            out["frame_ms_measured"] = measured[name]
            out["achieved_g_slots_per_s"] = round(achieved / 1e9, 2)
            out["vpu_utilization"] = round(achieved / peak_slots_s, 3)
            out["speed_of_light_ms"] = round(
                per_frame_slots / peak_slots_s * 1e3, 3)
        print(json.dumps(out))
        print(f"  {name}: {instrs} vec instrs/tile "
              f"({slots:.0f} weighted slots), {scalars} scalar/tile, "
              f"{slots/TILE_PX:.1f} slots/ray"
              + (f", util {out['vpu_utilization']:.0%}"
                 if "vpu_utilization" in out else ""),
              file=sys.stderr)


if __name__ == "__main__":
    main()
