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
    "hg_phase",
    "phase_sample",
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


# --- Henyey-Greenstein anisotropy (NO reference counterpart: the reference
# medium is strictly isotropic). Engine volume family only; the fused
# kernels stay isotropic (build_tile_renderer raises on g != 0). -----------

_G_EPS = 1e-3   # |g| below this is treated as isotropic (the HG inversion
                # divides by 2g and loses all precision there anyway)


def hg_phase(cos_t, g):
    """Henyey-Greenstein phase value p(cos theta) =
    (1/4pi)(1-g^2)/(1+g^2-2g cos)^{3/2}, with theta measured between the
    INCOMING propagation direction and the outgoing direction.

    Written as (1-g^2)/(d*sqrt(d)) so g == 0 evaluates to exactly
    1.0/1.0 == 1 and the result is bit-identical to INV_4PI — the
    quirk-parity tests rely on that."""
    g = jnp.asarray(cos_t) * 0.0 + g       # broadcast traced scalar
    d = 1.0 + g * g - 2.0 * g * cos_t
    d = jnp.maximum(d, 1e-12)
    return INV_4PI * (1.0 - g * g) / (d * jnp.sqrt(d))


def phase_sample(d_in, g, u1, u2):
    """Sample a scatter direction from HG around the incoming propagation
    direction d_in; returns (wi, phase value == pdf, i.e. the continuation
    weight phase/pdf is exactly 1, as for the isotropic sampler).

    For |g| < 1e-3 this reproduces the ISOTROPIC sampler's draws
    bit-identically (same global-frame mapping of (u1, u2) as
    vptSamplingFunctions.h:34-46), so g == 0 scenes render byte-identical
    images through the engine."""
    iso = ds.uniform_sphere(u1, u2)

    aniso = jnp.abs(jnp.asarray(g)) > _G_EPS
    g_safe = jnp.where(aniso, g, 0.5)      # keep the unselected lane finite
    s = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_t = (1.0 + g_safe * g_safe - s * s) / (2.0 * g_safe)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * math.pi * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                      axis=-1)
    hg_dir = vm.normalize(vm.from_local(d_in, local))

    wi = jnp.where(jnp.broadcast_to(aniso, u1.shape)[..., None], hg_dir, iso)
    pdf = jnp.where(aniso, hg_phase(cos_t, g_safe), INV_4PI)
    return wi, pdf
