"""Homogeneous-medium physics: transmittance and phase function.

Rebuild of reference include/volumetricBasicFunctions.h:14-62 and the phase
sampler of include/vptSamplingFunctions.h:34-51.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import vecmath as vm
from ..sampling import directional as ds
from ..scene.scene import Scene, VOLUME_BOUNDARY

__all__ = [
    "transmittance",
    "multiple_transmittance",
    "isotropic_phase",
    "isotropic_phase_sample",
    "INV_4PI",
]

INV_4PI = 1.0 / (4.0 * math.pi)


def transmittance(x1, x2, sigma_t):
    """Closed-form Beer-Lambert e^(-sigma_t |x2-x1|)
    (volumetricBasicFunctions.h:14-21)."""
    return jnp.exp(-sigma_t * vm.norm(x2 - x1))


def multiple_transmittance(x1, x2, sigma_t, scene: Scene):
    """Product of transmittances through every material==3 boundary sphere
    between two points (volumetricBasicFunctions.h:26-57).

    Matches the reference segment rules on the RAW quadratic roots:
    t2 < 0       -> multiply by exp(-sigma_t * t1)
    t2 - t1 > 0  -> multiply by exp(-sigma_t * (t2 - t1))
    (both factors can apply, like the original). Note the reference does not
    clip segments to the [x1, x2] interval — neither do we.
    """
    from ..geometry import intersect as geo

    w = vm.normalize(x2 - x1, eps=1e-20)
    t1, t2, _ = geo.sphere_roots(x1, w, scene)             # (N, S)
    is_vol = (scene.material == VOLUME_BOUNDARY)[None, :]
    tau = jnp.where(is_vol & (t2 < 0.0), sigma_t * t1, 0.0)
    tau = tau + jnp.where(is_vol & (t2 - t1 > 0.0), sigma_t * (t2 - t1), 0.0)
    return jnp.exp(-jnp.sum(tau, axis=-1))


def isotropic_phase():
    """p = 1/(4 pi) (volumetricBasicFunctions.h:59-62)."""
    return INV_4PI


def isotropic_phase_sample(u1, u2):
    """Uniform-sphere scatter direction (vptSamplingFunctions.h:34-46).
    Returns (wi, pdf)."""
    return ds.uniform_sphere(u1, u2), INV_4PI
