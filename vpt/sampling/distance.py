"""Distance (free-flight and equi-angular) samplers — the scientific core.

Rebuild of reference include/vptSamplingFunctions.h (free-flight + equi-angular
samplers and pdfs) and the equi-angular parameterization helpers of
include/volumetricBasicFunctions.h:180-223. Pure functions of explicit
uniforms; all differentiable w.r.t. sigma_t / geometry so gradients flow
through the sampled distances (reparameterization).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm

__all__ = [
    "free_flight_sample",
    "free_flight_pdf",
    "pdf_success",
    "pdf_failure",
    "equi_angular_sample",
    "equi_angular_pdf",
    "equi_angular_params",
    "equi_angular_params2",
]


def free_flight_sample(sigma_t, u):
    """d = -ln(1 - xi)/sigma_t (vptSamplingFunctions.h:11-16)."""
    return -jnp.log1p(-u) / sigma_t


def free_flight_pdf(sigma_t, d):
    """pdf = sigma_t * exp(-sigma_t d) (vptSamplingFunctions.h:20-22)."""
    return sigma_t * jnp.exp(-sigma_t * d)


def pdf_success(sigma_t, tmax):
    """P[scatter before surface] = 1 - exp(-sigma_t tmax)
    (vptSamplingFunctions.h:24-26)."""
    return 1.0 - jnp.exp(-sigma_t * tmax)


def pdf_failure(sigma_t, tmax):
    """P[reach surface] = exp(-sigma_t tmax) = transmittance
    (vptSamplingFunctions.h:29-31)."""
    return jnp.exp(-sigma_t * tmax)


def equi_angular_sample(D, theta_a, theta_b, u):
    """t = D tan((1-xi) thetaA + xi thetaB) (vptSamplingFunctions.h:54-57).

    Clamped to +-1e8 (geometry.BIG): f32 tan can return exactly inf at a
    cos == 0 draw, and a heterogeneous optical depth evaluated at t = inf
    is inf*0 = NaN when the ray is horizontal (the homogeneous
    exp(-sigma*inf) = 0 silently hid those lanes)."""
    return jnp.clip(D * jnp.tan((1.0 - u) * theta_a + u * theta_b),
                    -1e8, 1e8)


def equi_angular_pdf(D, theta_a, theta_b, t):
    """pdf = D / (|thetaB - thetaA| (t^2 + D^2)) (vptSamplingFunctions.h:60-62)."""
    return D / (jnp.abs(theta_b - theta_a) * (t * t + D * D))


def equi_angular_params(light_center, o, d, x):
    """Clamped-foot-point parameterization (volumetricBasicFunctions.h:180-207).

    Projects the light center onto the ray, clamps the foot point x0 into
    [o, x], and returns (x0, D, thetaA, thetaB) with thetaA <= 0 measured
    from x0. o, d, x: (N, 3); light_center broadcastable to (N, 3).
    """
    c = jnp.broadcast_to(light_center, o.shape)
    delta = vm.dot(c - o, d) / jnp.maximum(vm.norm2(d), 1e-20)
    x0 = o + d * delta[..., None]
    # clamp x0 into the segment [o, x] (the two sign tests at :186-195)
    x0 = jnp.where((vm.dot(x0 - o, d) < 0.0)[..., None], o, x0)
    x0 = jnp.where((vm.dot(x0 - x, d) > 0.0)[..., None], x, x0)
    # positive floors: a ray aimed straight at the light gives D == 0 (and
    # x0 == o gives a == 0), where sqrt' is inf under reverse-mode AD
    D = jnp.sqrt(jnp.maximum(vm.norm2(x0 - c), 1e-12))
    a = -jnp.sqrt(jnp.maximum(vm.norm2(x0 - o), 1e-24))
    b = jnp.sqrt(jnp.maximum(vm.norm2(x - x0), 1e-24))
    return x0, D, jnp.arctan2(a, D), jnp.arctan2(b, D)


def equi_angular_params2(light_center, o, d, t_max, u):
    """Unclamped parameterization used by the active-family integrators
    (volumetricBasicFunctions.h:209-223): the foot-point offset delta is the
    raw projection length, D from Pythagoras, and the returned distance is
    sample_t + delta measured from the ray origin.

    Returns (d_along_ray, D, thetaA, thetaB, sample_t).
    """
    c = jnp.broadcast_to(light_center, o.shape)
    diff = c - o
    diff_norm2 = vm.norm2(diff)
    delta = vm.dot(diff, d) / jnp.maximum(vm.norm2(d), 1e-20)
    D = jnp.sqrt(jnp.maximum(diff_norm2 - delta * delta, 1e-12))
    theta_a = jnp.arctan2(0.0 - delta, D)
    theta_b = jnp.arctan2(t_max - delta, D)
    sample_t = equi_angular_sample(D, theta_a, theta_b, u)
    return sample_t + delta, D, theta_a, theta_b, sample_t
