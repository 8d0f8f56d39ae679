"""Committed bench parity goldens stay in sync with the golden oracle.

bench.py gates the Pallas kernel's full-resolution frames against
bench_goldens/*.npz (precomputed f64 NumPy oracle frames stored as f16;
tools/make_bench_goldens.py) so the driver's bench run does not burn ~6 min
recomputing them. If the oracle (render/reference_cpu.py) or a scene YAML
changes, the committed files go stale — these tests catch that by
recomputing the cheap scenes live. 20spheres (~335 s of NumPy) is only
spot-checked by shape/range; its pixels come from the same oracle code
verified on the other three.
"""

import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), os.pardir)
GOLDEN_DIR = os.path.join(REPO, "bench_goldens")

# f16 storage quantization: worst-case 2^-11 for values in [1, 2); images
# are clamped to [0, 1], so absolute error <= 2^-12 + rounding ~ 5e-4 —
# an order of magnitude under bench.py's 2/255 bad-pixel threshold.
F16_TOL = 6e-4

CHEAP_SCENES = ["reflection_test", "monkey_saddle", "dingdong",
                "quadratic", "cubic", "clebsch", "cayley"]


@pytest.mark.parametrize("name", CHEAP_SCENES)
def test_committed_golden_matches_live_oracle(name):
    import tpu_ray_tracer as trt
    from tpu_ray_tracer.render.reference_cpu import render_image_np

    from conftest import scene_path

    path = os.path.join(GOLDEN_DIR, name + ".npz")
    assert os.path.exists(path), f"missing committed golden {path}"
    committed = np.load(path)["image"].astype(np.float32)
    scene = trt.load_from_file(scene_path(name))
    live = render_image_np(scene)
    assert committed.shape == live.shape
    assert np.abs(committed - live).max() <= F16_TOL


def test_20spheres_golden_shape_and_range():
    import tpu_ray_tracer as trt

    from conftest import scene_path

    path = os.path.join(GOLDEN_DIR, "20spheres.npz")
    assert os.path.exists(path)
    committed = np.load(path)["image"]
    scene = trt.load_from_file(scene_path("20spheres"))
    assert committed.shape == (scene.height, scene.width, 3)
    assert committed.dtype == np.float16
    assert np.isfinite(committed.astype(np.float32)).all()
    assert committed.min() >= 0.0 and committed.max() <= 1.0
    # not a uniform/degenerate image (std on the f32 cast: the f16 sum
    # overflows to inf, which would pass the assertion vacuously)
    assert committed.astype(np.float32).std() > 0.01
