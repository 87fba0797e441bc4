"""Beckmann microfacet conductor BRDF (Cook-Torrance) and conductor Fresnel.

Rebuild of reference include/microFacetUtilities.h:11-100. All functions are
batched over leading axes; eta/kappa are (..., 3) RGB spectral IORs.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import vecmath as vm

__all__ = [
    "fresnel_conductor",
    "ndf_beckmann",
    "g1_beckmann",
    "g_smith",
    "microfacet_pdf",
    "fr_microfacet",
]


def fresnel_conductor(cos_wh, eta, kappa):
    """Exact per-channel conductor Fresnel (microFacetUtilities.h:11-29).

    cos_wh: (...,) cosine w.r.t. the half vector; eta, kappa: (..., 3).
    Returns (..., 3).
    """
    cos = cos_wh[..., None]
    # positive floors keep sqrt' finite for reverse-mode AD at cos == +-1
    sin2 = jnp.maximum(1.0 - cos * cos, 1e-12)
    sin = jnp.sqrt(sin2)
    e2k2 = eta * eta - kappa * kappa - sin2
    a2b2 = jnp.sqrt(jnp.maximum(
        e2k2 * e2k2 + 4.0 * (eta * eta) * (kappa * kappa), 1e-12))
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + eta * eta - kappa * kappa - sin2), 1e-12))
    perp = (a2b2 + cos * cos - 2.0 * a * cos) / (a2b2 + cos * cos + 2.0 * a * cos)
    sin4 = sin2 * sin2
    par = perp * (a2b2 * cos * cos + sin4 - 2.0 * a * cos * sin2) / (
        a2b2 * cos * cos + sin4 + 2.0 * a * cos * sin2
    )
    return 0.5 * (par + perp)


def ndf_beckmann(cosine, alpha):
    """Beckmann NDF of cos(theta_h) (microFacetUtilities.h:34-45); 0 for
    back-facing half vectors."""
    c2 = cosine * cosine
    # Floors sized so denom^2 in the division VJP stays f32-representable
    # (pi*a2*c2^2 >= ~3e-16): with 1e-12 floors, denom^2 underflows to 0 and
    # reverse-mode AD produces 0/0. NDF values are unaffected — exp(-tan2/a2)
    # is already exactly 0 wherever the floors bind.
    safe_c2 = jnp.maximum(c2, 1e-4)
    a2 = jnp.maximum(alpha * alpha, 1e-8)
    tan2 = jnp.maximum(1.0 - c2, 0.0) / safe_c2
    val = jnp.exp(-tan2 / a2) / (math.pi * a2 * safe_c2 * safe_c2)
    return jnp.where(cosine >= 0.0, val, 0.0)


def g1_beckmann(n, wv, wh, alpha):
    """Smith G1 with the Schlick-Beckmann rational fit for a < 1.6
    (microFacetUtilities.h:47-61)."""
    cos = vm.dot(n, wv)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    tan = sin / jnp.where(cos != 0.0, cos, 1e-12)
    # a = 1/(alpha*tan), sign of tan preserved like the reference; tan == 0
    # (normal incidence) gives a -> +inf -> G = 1.
    a = 1.0 / (jnp.maximum(alpha, 1e-6) * jnp.where(tan != 0.0, tan, 1e-12))
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    g = jnp.where(a < 1.6, rational, 1.0)
    same_side = (vm.dot(wv, wh) / jnp.where(cos != 0.0, cos, 1e-12)) > 0.0
    return jnp.where(same_side, g, 0.0)


def g_smith(n, wi, wo, wh, alpha):
    """G1(wi) * G1(wo) (microFacetUtilities.h:63-68)."""
    return g1_beckmann(n, wi, wh, alpha) * g1_beckmann(n, wo, wh, alpha)


def microfacet_pdf(wo, wh, alpha, n):
    """pdf = NDF(wh.n) * (wh.n) / (4 |wo.wh|) (microFacetUtilities.h:86-92)."""
    coswh = vm.dot(wh, n)
    den = 4.0 * jnp.maximum(jnp.abs(vm.dot(wo, wh)), 1e-12)
    return ndf_beckmann(coswh, alpha) * coswh / den


def fr_microfacet(eta, kappa, wi, wh, wo, alpha, n):
    """Cook-Torrance fr = F(wi.wh) D(n.wh) G / (4 |n.wi| |n.wo|)
    (microFacetUtilities.h:95-100). All vectors must share one frame."""
    den = 4.0 * jnp.maximum(jnp.abs(vm.dot(n, wi)) * jnp.abs(vm.dot(n, wo)), 1e-12)
    f = fresnel_conductor(vm.dot(wi, wh), eta, kappa)
    d = ndf_beckmann(vm.dot(n, wh), alpha)
    g = g_smith(n, wi, wo, wh, alpha)
    return f * (d * g / den)[..., None]
