"""Shading math: shadow rays, Lambertian surface response, reflections.

Vectorized over rays *and* lights; the spherical/directional split is a mask
instead of a branch. Mirrors reference include/light_impl.h:17-49:

* ``shadow_ray``: spherical light -> the *unnormalized* vector to the light
  with max_t = 1 (t parametrizes [surface, light]); directional -> the stored
  unit direction with max_t = 1e6. The reference returns a single-precision
  ``glm::vec3`` here even from double inputs (light_impl.h:17) — we replicate
  that quantization in the golden path for bit parity.
* ``surface_color``: Lambertian albedo/pi * light color * max(0, n.l);
  spherical lights add an inverse-square 1/(4 pi r^2) falloff
  (light_impl.h:29-44). Color math is f32 (glm vec3), geometry dots are
  computed in the geometry dtype then cast, as in the reference.
* ``reflect_ray``: d - 2 (d.n) n (light_impl.h:46-49).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .constants import MAX_T


def shadow_ray_dirs(light_p, light_is_spherical, point):
    """Shadow-ray directions and parametric range for all lights.

    Args:
      light_p: [L, 3] (geometry dtype).
      light_is_spherical: [L] bool.
      point: [..., 3] surface points.

    Returns:
      (shadow_dir [..., L, 3], max_t [L]) — shadow_dir is passed through f32
      as in the reference (vec3 return type, light_impl.h:17).
    """
    to_light = light_p - point[..., None, :]                      # [..., L, 3]
    sdir = jnp.where(light_is_spherical[..., None], to_light, light_p)
    sdir = sdir.astype(jnp.float32).astype(point.dtype)
    max_t = jnp.where(light_is_spherical, 1.0, MAX_T).astype(point.dtype)
    return sdir, max_t


def surface_color(light_p, light_is_spherical, light_color, point, normal,
                  object_color):
    """Per-light Lambertian contribution (reference: light_impl.h:29-44).

    Args:
      light_p: [L, 3], light_is_spherical: [L], light_color: [L, 3] f32.
      point/normal: [..., 3] geometry dtype.
      object_color: [..., 3] f32.

    Returns:
      [..., L, 3] f32 contributions (not yet shadow-masked or clamped).
    """
    inv_pi = jnp.float32(1.0 / math.pi)
    to_light = light_p - point[..., None, :]                      # [..., L, 3]
    dist2 = jnp.sum(to_light * to_light, axis=-1)                 # geometry dtype
    norm = jnp.sqrt(dist2)
    unit_to_light = to_light / jnp.where(norm > 0, norm, 1.0)[..., None]
    ldir = jnp.where(light_is_spherical[..., None], unit_to_light, light_p)

    falloff = light_color / (
        jnp.float32(4.0 * math.pi) * dist2.astype(jnp.float32)[..., None]
    )
    color = jnp.where(light_is_spherical[..., None], falloff, light_color)

    ndotl = jnp.sum(normal[..., None, :] * ldir, axis=-1)
    lambert = jnp.maximum(jnp.float32(0.0), ndotl.astype(jnp.float32))
    return object_color[..., None, :] * inv_pi * color * lambert[..., None]


def reflect_ray(dir, normal):
    """Mirror reflection d - 2 (d.n) n (reference: light_impl.h:46-49)."""
    return dir - 2.0 * jnp.sum(dir * normal, axis=-1, keepdims=True) * normal
