"""Smooth dielectric: Fresnel, mirror reflection, refraction.

Rebuild of reference include/microFacetUtilities.h:107-141. The refraction
routine deliberately reproduces the reference's stray "- 1" in the
transmitted cosine (microFacetUtilities.h:133) — a documented quirk of the
original estimator, kept so renders match; pass ``fix_refraction_quirk=True``
for the physically correct Snell refraction.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm

__all__ = ["fresnel_dielectric", "reflect", "refract"]


def fresnel_dielectric(eta_i, eta_t, cos_t, cos_i):
    """Unpolarized dielectric Fresnel, average of parallel/perpendicular
    (microFacetUtilities.h:107-112)."""
    par = (eta_t * cos_i - eta_i * cos_t) / (eta_t * cos_i + eta_i * cos_t)
    perp = (eta_i * cos_i - eta_t * cos_t) / (eta_i * cos_i + eta_t * cos_t)
    return 0.5 * (par * par + perp * perp)


def reflect(wi, n):
    """Mirror reflection of OUTGOING wi about n (microFacetUtilities.h:117-120)."""
    return -wi + n * (2.0 * vm.dot(n, wi))[..., None]


def refract(eta_i, eta_t, wi, n, fix_refraction_quirk: bool = False):
    """Refraction via the local frame (microFacetUtilities.h:123-141).

    Reference recipe: wi_local = to_local(n, wi); ratio = -eta_t/eta_i;
    cos_t = sqrt(1 - (eta_i/eta_t)^2 (1 - cos_i^2)) - 1  <-- the quirky -1;
    wt_local = (wi_local.x * ratio, wi_local.y * ratio, cos_t) -> world.
    Note the reference never normalizes here; callers normalize after.
    """
    wi_local = vm.to_local(n, wi)
    cos_i = vm.dot(wi, n)
    inv_ratio = eta_i / eta_t
    # positive floor keeps sqrt' finite for AD at the TIR boundary
    s2 = jnp.maximum(1.0 - inv_ratio * inv_ratio * (1.0 - cos_i * cos_i), 1e-12)
    cos_t = jnp.sqrt(s2)
    if fix_refraction_quirk:
        # Proper Snell refraction: tangential scaled by eta_i/eta_t and
        # flipped, transmitted cosine below the surface.
        wt_local = jnp.stack(
            [-inv_ratio * wi_local[..., 0], -inv_ratio * wi_local[..., 1], -cos_t],
            axis=-1,
        )
    else:
        ratio = -(eta_t / eta_i)
        wt_local = jnp.stack(
            [wi_local[..., 0] * ratio, wi_local[..., 1] * ratio, cos_t - 1.0],
            axis=-1,
        )  # reference quirk: the stray -1 (microFacetUtilities.h:133)
    return vm.from_local(n, wt_local)
