"""Fly camera: Euler angles -> camera-to-world frame -> per-pixel rays.

Replicates the reference camera exactly (reference: src/ray-tracer.cpp:24-58):

* ``direction = (cos yaw cos pitch, sin pitch, sin yaw cos pitch)`` with yaw
  and pitch in degrees (yaw init 90, pitch init 0, pitch clamped to +-89 by
  the interactive shell).
* ``camera_matrix = inverse(lookAt(position, position - direction, up))``
  with ``up = (0, 1, 0)`` — i.e. the camera-to-world rigid transform whose
  rotation columns are (right, up', backward=direction_normalized).
* Ray generation (reference: src/update-cpu.cpp:84-89): for pixel (x, y),
  ndc = (p + 0.5)/dim, camera-space target = ((2 ndc_x - 1) * aspect * tan_fov,
  (2 ndc_y - 1) * tan_fov, 1); dir = normalize(R @ target). Row y = 0 is the
  *bottom* of the image (OpenGL texture convention).

The camera pose is a pytree (position, yaw_deg, pitch_deg) of arrays, so the
whole renderer is differentiable w.r.t. camera pose.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jax.Array   # [3]
    yaw_deg: jax.Array    # scalar
    pitch_deg: jax.Array  # scalar

    @staticmethod
    def initial(dtype=jnp.float64) -> "Camera":
        """Reference initial pose: position (0,0,0), yaw 90, pitch 0
        (reference: src/ray-tracer.cpp:25, 31-32)."""
        return Camera(
            position=jnp.zeros(3, dtype=dtype),
            yaw_deg=jnp.asarray(90.0, dtype=dtype),
            pitch_deg=jnp.asarray(0.0, dtype=dtype),
        )


def view_direction(yaw_deg, pitch_deg):
    """Euler angles (degrees) -> view direction (reference:
    src/ray-tracer.cpp:44-49)."""
    yaw = jnp.deg2rad(yaw_deg)
    pitch = jnp.deg2rad(pitch_deg)
    return jnp.stack(
        [
            jnp.cos(yaw) * jnp.cos(pitch),
            jnp.sin(pitch),
            jnp.sin(yaw) * jnp.cos(pitch),
        ],
        axis=-1,
    )


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def camera_frame(camera: Camera):
    """Camera-to-world rotation (3x3, columns = right/up/forward-into-scene)
    and eye position.

    Equivalent to inverse(lookAt(position, position - direction, up))
    (reference: src/ray-tracer.cpp:54-58): with f = normalize(center - eye) =
    -direction_hat, s = normalize(cross(f, up)), u = cross(s, f), the inverse
    has columns (s, u, -f) and translation eye. Note -f = +direction_hat, so
    camera +z looks along the view direction.
    """
    d = view_direction(camera.yaw_deg, camera.pitch_deg)
    f = _normalize(-d)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=d.dtype)
    s = _normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    rotation = jnp.stack([s, u, -f], axis=-1)  # columns
    return rotation, camera.position


def camera_matrix(camera: Camera):
    """Full 4x4 camera-to-world matrix (for parity with the reference API)."""
    rotation, eye = camera_frame(camera)
    mat = jnp.eye(4, dtype=rotation.dtype)
    mat = mat.at[:3, :3].set(rotation)
    mat = mat.at[:3, 3].set(eye)
    return mat


def pixel_directions(rotation, width: int, height: int, aspect_ratio, tan_half_fov,
                     y0: int = 0, rows: int | None = None):
    """Unit ray directions for a row-range of the pixel grid.

    Args:
      rotation: [3, 3] camera-to-world rotation (columns s/u/forward).
      width, height: full image dimensions (static).
      aspect_ratio: width/height as in reference Scene::aspect_ratio.
      tan_half_fov: tan(fov/2), precomputed (reference: update-cpu.cpp:28).
      y0, rows: render rows [y0, y0+rows) — the unit of pixel-grid sharding.

    Returns:
      [rows, width, 3] unit directions; row 0 of the output is image row y0
      (image row 0 = bottom of frame).
    """
    if rows is None:
        rows = height
    dtype = rotation.dtype
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width
    # y0 enters additively so it may be a traced value (each device of a
    # row-sharded mesh computes its own offset from its axis index).
    ys = (jnp.arange(rows, dtype=dtype) + (jnp.asarray(y0, dtype) + 0.5)) / height
    cam_x = (2.0 * xs - 1.0) * aspect_ratio * tan_half_fov   # [W]
    cam_y = (2.0 * ys - 1.0) * tan_half_fov                  # [rows]
    # target = R @ (cx, cy, 1) = cx * col0 + cy * col1 + col2
    target = (
        cam_x[None, :, None] * rotation[:, 0]
        + cam_y[:, None, None] * rotation[:, 1]
        + rotation[:, 2]
    )
    return _normalize(target)
