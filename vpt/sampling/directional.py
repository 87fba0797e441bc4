"""Directional samplers and their pdfs.

Rebuild of reference include/samplingFunctions.h:12-94 and the Beckmann
half-vector sampler of include/microFacetUtilities.h:71-92. All samplers are
pure functions of explicit uniforms (u1, u2) so that RNG plumbing lives in
the integrators and every sampler is unit-testable against its pdf.

Shapes: n/wc are (..., 3); u1/u2 broadcast against the leading axes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import vecmath as vm

__all__ = [
    "spherical_direction",
    "uniform_hemisphere",
    "uniform_sphere",
    "cosine_hemisphere",
    "cosine_hemisphere_pdf",
    "cone",
    "cone_pdf",
    "beckmann_half_vector",
]

TWO_PI = 2.0 * math.pi


def spherical_direction(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """(sin t cos p, sin t sin p, cos t) — the local-frame direction every
    reference sampler builds (e.g. samplingFunctions.h:18-20)."""
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1)


def uniform_hemisphere(n, u1, u2):
    """theta = acos(xi) hemisphere around n (samplingFunctions.h:12-28)."""
    local = spherical_direction(jnp.arccos(u1), TWO_PI * u2)
    return vm.normalize(vm.from_local(n, local))


def uniform_sphere(u1, u2):
    """Uniform direction on the sphere, theta = acos(1 - 2 xi)
    (samplingFunctions.h:31-44 / vptSamplingFunctions.h:34-46)."""
    return spherical_direction(jnp.arccos(1.0 - 2.0 * u1), TWO_PI * u2)


def cosine_hemisphere(n, u1, u2):
    """Cosine-weighted hemisphere, theta = acos(sqrt(1 - xi))
    (samplingFunctions.h:47-62)."""
    local = spherical_direction(jnp.arccos(jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))), TWO_PI * u2)
    return vm.normalize(vm.from_local(n, local))


def cosine_hemisphere_pdf(cosine):
    """pdf = cos(theta)/pi (samplingFunctions.h:92-94)."""
    return cosine / math.pi


def cone(wc, cos_theta_max, u1, u2):
    """Uniform cone around wc with half-angle acos(cos_theta_max):
    theta = acos((1-xi) + xi*cos_theta_max) (samplingFunctions.h:65-82).

    Built from (cos, sin) directly instead of the reference's acos/cos/sin
    round-trip: same direction, but reverse-mode AD w.r.t. cos_theta_max
    stays finite at the cone apex (acos' diverges at 1)."""
    ct = jnp.clip((1.0 - u1) + u1 * cos_theta_max, -1.0, 1.0)
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 1e-12))
    phi = TWO_PI * u2
    local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    return vm.normalize(vm.from_local(wc, local))


def cone_pdf(cos_theta_max):
    """pdf = 1 / (2 pi (1 - cos_theta_max)) (samplingFunctions.h:85-87).

    Divergence (documented): as cos_theta_max -> 1 (degenerate point-light
    cone) the reference returns +inf and downstream divisions produce the
    zero contribution for r == 0 sources (volumetricBasicFunctions.h:315-319).
    We saturate the denominator at 1e-12 instead — the pdf tops out at
    ~1.6e11, contributions divided by it are still numerically zero, and
    reverse-mode AD stays NaN-free (inf * 0 would otherwise poison grads).
    """
    return 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_theta_max, 1e-12))


def beckmann_half_vector(alpha, u1, u2):
    """Beckmann microfacet half-vector in the LOCAL frame:
    theta = atan(sqrt(-alpha^2 ln(1 - xi))) (microFacetUtilities.h:71-84)."""
    # inner floor keeps d(sqrt)/d(alpha) finite at u1 == 0 for AD
    theta = jnp.arctan(jnp.sqrt(jnp.maximum(
        -(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u1, 1e-20)), 1e-20)))
    return spherical_direction(theta, TWO_PI * u2)
