"""Pinhole camera + batched primary-ray generation.

Reproduces the reference camera model (src/rt.cpp:755-759, 787):
  camera ray   o = (0, 11.2, 214), look dir d = normalize(0, -0.042612, -1)
  cx = (w * 0.5095 / h, 0, 0)
  cy = normalize(cx x d) * 0.5095
  per-sample dir = cx*((x + u - .5)/w - .5) + cy*((y + v - .5)/h - .5) + d

All parameters are pytree leaves so the camera is differentiable (pose and
fov gradients for inverse rendering).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from ..core import rng

__all__ = ["Camera", "default_camera", "look_at", "primary_rays"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    origin: jnp.ndarray     # (3,)
    direction: jnp.ndarray  # (3,) unit look direction
    fov_scale: jnp.ndarray  # scalar — the 0.5095 screen half-extent factor


def default_camera(dtype=jnp.float32) -> Camera:
    return Camera(
        origin=jnp.asarray([0.0, 11.2, 214.0], dtype),
        direction=vm.normalize(jnp.asarray([0.0, -0.042612, -1.0], dtype)),
        fov_scale=jnp.asarray(0.5095, dtype),
    )


def look_at(origin, target, fov_scale: float = 0.5095,
            dtype=jnp.float32) -> Camera:
    """Camera at `origin` looking at `target` (convenience constructor —
    the reference hardcodes its one camera at src/rt.cpp:755-759).
    fov_scale is the reference's 0.5095 screen half-extent factor; the
    up-vector convention is the same cx/cy basis as screen_basis."""
    o = jnp.asarray(origin, dtype)
    return Camera(
        origin=o,
        direction=vm.normalize(jnp.asarray(target, dtype) - o),
        fov_scale=jnp.asarray(fov_scale, dtype),
    )


def screen_basis(camera: Camera, width: int, height: int):
    """(cx, cy) screen-plane basis vectors per src/rt.cpp:758-759."""
    dtype = camera.origin.dtype
    cx = jnp.stack(
        [width * camera.fov_scale / height,
         jnp.zeros((), dtype), jnp.zeros((), dtype)]
    )
    cy = vm.normalize(vm.cross(cx, camera.direction)) * camera.fov_scale
    return cx, cy


def rays_for_pixels(
    camera: Camera,
    width: int,
    height: int,
    pixel_ids: jnp.ndarray,
    key: jax.Array,
    jitter: bool = True,
):
    """Generate one jittered primary ray per flat pixel id.

    pixel_ids: (N,) int32 flat indices in TOP-DOWN row-major order (row 0 is
    the top of the image — the reference stores bottom-up and flips at
    src/rt.cpp:773; emitting top-down directly is equivalent).
    Returns (origins, directions), each (N, 3).
    """
    dtype = camera.origin.dtype
    px = (pixel_ids % width).astype(dtype)
    # convert top-down row back to the reference's bottom-up y
    py = (height - 1 - pixel_ids // width).astype(dtype)

    if jitter:
        u, v = rng.uniform(
            rng.fold(key, rng.Tag.PIXEL_JITTER), (2, pixel_ids.shape[0]), dtype
        )
    else:
        u = jnp.full_like(px, 0.5)
        v = jnp.full_like(py, 0.5)

    cx, cy = screen_basis(camera, width, height)
    sx = (px + u - 0.5) / width - 0.5
    sy = (py + v - 0.5) / height - 0.5
    d = cx[None, :] * sx[:, None] + cy[None, :] * sy[:, None] + camera.direction[None, :]
    d = vm.normalize(d)
    o = jnp.broadcast_to(camera.origin, d.shape)
    return o, d


def primary_rays(camera: Camera, width: int, height: int, key: jax.Array,
                 jitter: bool = True):
    """All-pixels convenience wrapper around rays_for_pixels."""
    ids = jnp.arange(width * height, dtype=jnp.int32)
    return rays_for_pixels(camera, width, height, ids, key, jitter)
