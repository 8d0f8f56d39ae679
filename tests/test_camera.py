"""Camera math tests against an independent lookAt-based oracle
(reference: src/ray-tracer.cpp:44-58, src/update-cpu.cpp:84-89)."""

import math

import numpy as np
import pytest


def lookat_inverse_oracle(position, yaw_deg, pitch_deg):
    """Straight transliteration of glm: inverse(lookAt(pos, pos - dir, up))
    computed via explicit matrix inversion."""
    yaw, pitch = math.radians(yaw_deg), math.radians(pitch_deg)
    direction = np.array([
        math.cos(yaw) * math.cos(pitch),
        math.sin(pitch),
        math.sin(yaw) * math.cos(pitch),
    ])
    eye = np.asarray(position, dtype=np.float64)
    center = eye - direction
    up = np.array([0.0, 1.0, 0.0])
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    world_to_cam = np.eye(4)
    world_to_cam[0, :3] = s
    world_to_cam[1, :3] = u
    world_to_cam[2, :3] = -f
    world_to_cam[0, 3] = -np.dot(s, eye)
    world_to_cam[1, 3] = -np.dot(u, eye)
    world_to_cam[2, 3] = np.dot(f, eye)
    return np.linalg.inv(world_to_cam)


@pytest.mark.parametrize("pose", [
    ((0, 0, 0), 90.0, 0.0),          # reference initial pose
    ((1.5, -2.0, 3.0), 45.0, 20.0),
    ((-4.0, 0.5, 10.0), 200.0, -60.0),
])
def test_camera_matrix_matches_lookat_inverse(pose):
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import camera as cam

    position, yaw, pitch = pose
    oracle = lookat_inverse_oracle(position, yaw, pitch)
    c = cam.Camera(
        position=jnp.asarray(position, jnp.float64),
        yaw_deg=jnp.asarray(yaw, jnp.float64),
        pitch_deg=jnp.asarray(pitch, jnp.float64),
    )
    got = np.asarray(cam.camera_matrix(c))
    np.testing.assert_allclose(got, oracle, rtol=1e-12, atol=1e-12)


def test_initial_pose_rays_point_forward():
    """At the initial pose the camera looks down +z with x right, y up."""
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import camera as cam

    c = cam.Camera.initial(jnp.float64)
    rotation, eye = cam.camera_frame(c)
    np.testing.assert_allclose(np.asarray(eye), [0, 0, 0])
    np.testing.assert_allclose(np.asarray(rotation), np.eye(3), atol=1e-15)

    dirs = np.asarray(cam.pixel_directions(rotation, 4, 4, 1.0, jnp.float64(1.0)))
    assert dirs.shape == (4, 4, 3)
    # center symmetric, all unit length, +z forward
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, rtol=1e-12)
    assert (dirs[..., 2] > 0).all()
    # pixel x increases to the right (+x), pixel row y increases upward (+y)
    assert dirs[0, 3, 0] > dirs[0, 0, 0]
    assert dirs[3, 0, 1] > dirs[0, 0, 1]


def test_pixel_directions_match_reference_formula(rng):
    """Ray direction = normalize(M @ (cx, cy, 1, 1) - origin) per
    reference update-cpu.cpp:84-89."""
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import camera as cam

    position, yaw, pitch = (1.0, 2.0, -3.0), 120.0, 35.0
    matrix = lookat_inverse_oracle(position, yaw, pitch)
    width, height, fov_deg = 8, 6, 50.0
    tanf = math.tan(0.5 * math.radians(fov_deg))
    aspect = width / height

    c = cam.Camera(
        position=jnp.asarray(position, jnp.float64),
        yaw_deg=jnp.asarray(yaw, jnp.float64),
        pitch_deg=jnp.asarray(pitch, jnp.float64),
    )
    rotation, eye = cam.camera_frame(c)
    got = np.asarray(cam.pixel_directions(rotation, width, height, aspect, jnp.float64(tanf)))

    origin = matrix @ np.array([0.0, 0.0, 0.0, 1.0])
    for py in range(height):
        for px in range(width):
            ndc_x = (px + 0.5) / width
            ndc_y = (py + 0.5) / height
            cx = (2 * ndc_x - 1) * aspect * tanf
            cy = (2 * ndc_y - 1) * tanf
            world = matrix @ np.array([cx, cy, 1.0, 1.0])
            d = world[:3] - origin[:3]
            d = d / np.linalg.norm(d)
            np.testing.assert_allclose(got[py, px], d, rtol=1e-12, atol=1e-12)


def test_row_slicing_consistent():
    import jax.numpy as jnp
    from tpu_ray_tracer.ops import camera as cam

    c = cam.Camera.initial(jnp.float64)
    rotation, _ = cam.camera_frame(c)
    full = np.asarray(cam.pixel_directions(rotation, 16, 12, 16 / 12, jnp.float64(0.5)))
    part = np.asarray(
        cam.pixel_directions(rotation, 16, 12, 16 / 12, jnp.float64(0.5), y0=4, rows=3)
    )
    np.testing.assert_allclose(part, full[4:7])
