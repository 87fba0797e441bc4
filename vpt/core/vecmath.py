"""Vector math on batched (..., 3) arrays.

TPU-native replacement for the reference's scalar 3-vector class
(reference: include/Vector.h:10-36, include/mathUtilities.h:10-45).
Everything here operates on arrays whose trailing axis is xyz, so a "vector"
is any (..., 3) jnp array and all ops vectorize over leading (lane) axes on
the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "dot",
    "norm",
    "norm2",
    "normalize",
    "cross",
    "build_onb",
    "to_local",
    "from_local",
    "clamp01",
    "to_display_value",
]


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing xyz axis. Returns (...,)."""
    return jnp.sum(a * b, axis=-1)


def norm2(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(norm2(a))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector; matches Vector::normalize (reference include/Vector.h:33).

    With eps > 0 the division is guarded for zero vectors (the reference
    happily divides by zero; we keep eps=0 default for parity and let callers
    opt into the guard).
    """
    n2 = norm2(a)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0)), 1.0)[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product (reference operator%, include/Vector.h:24)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def build_onb(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Orthonormal basis (s, t) around unit normal n.

    Branch-free reimplementation of coordinateSystem
    (reference include/mathUtilities.h:10-19): if |n.x| > |n.y| then
    t = (n.z, 0, -n.x)/sqrt(nx^2+nz^2) else t = (0, n.z, -n.y)/sqrt(ny^2+nz^2),
    and s = t x n.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    cond = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-20))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-20))
    t = jnp.where(
        cond[..., None],
        jnp.stack([nz * inv_a, jnp.zeros_like(nx), -nx * inv_a], axis=-1),
        jnp.stack([jnp.zeros_like(nx), nz * inv_b, -ny * inv_b], axis=-1),
    )
    s = cross(t, n)
    return s, t


def to_local(n: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """World -> local frame of normal n (reference coordinateTraspose,
    include/mathUtilities.h:21-30): multiplies w by the transposed ONB, so
    the local frame has n mapped to +z."""
    s, t = build_onb(n)
    return jnp.stack([dot(w, s), dot(w, t), dot(w, n)], axis=-1)


def from_local(n: jnp.ndarray, w_local: jnp.ndarray) -> jnp.ndarray:
    """Local frame of n -> world (the s*x + t*y + n*z pattern used throughout
    the reference samplers, e.g. include/samplingFunctions.h:24)."""
    s, t = build_onb(n)
    return (
        s * w_local[..., 0:1] + t * w_local[..., 1:2] + n * w_local[..., 2:3]
    )


def clamp01(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp to [0, 1] (reference include/mathUtilities.h:34-40)."""
    return jnp.clip(x, 0.0, 1.0)


def to_display_value(x: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2.2 quantizer to [0, 255] ints
    (reference include/mathUtilities.h:43-45)."""
    return (jnp.power(clamp01(x), 1.0 / 2.2) * 255.0 + 0.5).astype(jnp.int32)
