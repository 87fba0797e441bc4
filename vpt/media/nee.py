"""Next-event estimation: point-light surface shading and medium
single-scattering (point + spherical sources).

Rebuild of reference `pLight` (vptShadeMethods.h:62-91), `singleScattering`
(volumetricBasicFunctions.h:225-281) and `freeSingleScattering`
(volumetricBasicFunctions.h:284-340).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import vecmath as vm
from ..bxdf import dispatch as bx
from ..bxdf import microfacet as mf
from ..geometry import intersect as geo
from ..sampling import directional as ds
from ..scene.scene import Scene, MICROFACET
from . import medium as med

__all__ = ["plight", "single_scattering", "free_single_scattering"]

# The reference's hardcoded sigma_t for the multipleT fallback in pLight
# (vptShadeMethods.h:72: multipleT(x, light, 0.05+0.009)).
PLIGHT_FALLBACK_SIGMA_T = 0.05 + 0.009


def plight(scene: Scene, obj_id, x, n, wray, intensity, light_p, alpha):
    """Point-light direct lighting at a surface point (vptShadeMethods.h:62-91).

    Visibility cascade: plain `visibility` gives full 1/d^2 radiance; else
    `visibilityVPT` (ignoring volumetric boundaries) attenuates by multipleT
    at the hardcoded sigma_t; else black. fr is evaluated in the local frame.
    """
    light = jnp.broadcast_to(light_p, x.shape)
    d2 = vm.norm2(light - x)
    inv_d2 = 1.0 / jnp.maximum(d2, 1e-20)
    vis = geo.visibility(light, x, scene)
    vis_vpt = geo.visibility_vpt(light, x, scene)
    mt = med.multiple_transmittance(x, light, PLIGHT_FALLBACK_SIGMA_T, scene)
    le_scale = jnp.where(vis, inv_d2, jnp.where(vis_vpt, inv_d2 * mt, 0.0))
    le = intensity * le_scale[..., None]

    wi = vm.normalize(light - x, eps=1e-20)
    wi_local = vm.normalize(vm.to_local(n, wi), eps=1e-20)
    wo_local = vm.normalize(vm.to_local(n, -wray), eps=1e-20)
    wh = vm.normalize(wi_local + wo_local, eps=1e-20)
    n_local = jnp.zeros_like(wi_local).at[..., 2].set(1.0)
    fr_m = mf.fr_microfacet(
        scene.eta[obj_id], scene.kappa[obj_id], wi_local, wh, wo_local, alpha, n_local
    )
    fr_l = scene.albedo[obj_id] * (1.0 / math.pi)
    fr = jnp.where((scene.material[obj_id] == MICROFACET)[..., None], fr_m, fr_l)
    return le * fr * vm.dot(n, wi)[..., None]


def _sphere_light_single_scatter(scene: Scene, xt, idsource, sigma_t, u1, u2):
    """Shared spherical-source cone-sampling branch of both single-scattering
    estimators (volumetricBasicFunctions.h:251-278 / 310-337). Returns
    (contribution, point_killed):

    contribution — the UNWEIGHTED Ls / prob_wl term (caller applies
    T*sigma_s and probSource).

    point_killed — the reference's missing-else quirk: the cone branch runs
    UNCONDITIONALLY after the point branch (volumetricBasicFunctions.h:245-251
    — there is no `else`), so for an r == 0 source the degenerate center ray
    (cos_theta_max == 1 collapses the cone onto wc) can "hit" the zero-radius
    sphere and OVERWRITE Ld with Ls/solidAngleProb(1) == Ls/inf == 0 (see the
    inline comment below for how we reproduce this).
    """
    center = scene.center[idsource]
    wc = center - xt
    wc_mag = vm.norm(wc)
    wc = wc / jnp.maximum(wc_mag, 1e-20)[..., None]
    ratio = scene.radius[idsource] / jnp.maximum(wc_mag, 1e-20)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
    wl = ds.cone(wc, cos_max, u1, u2)
    prob_wl = ds.cone_pdf(cos_max)
    hit, t, hit_id = geo.nearest_hit(xt, wl, scene)
    visible = hit & (hit_id == idsource)
    le = scene.radiance[idsource]
    ls = le * (jnp.exp(-sigma_t * t) * med.INV_4PI)[..., None]
    contrib = ls / jnp.maximum(prob_wl, 1e-20)[..., None]

    # For r == 0 the reference's cone collapses onto wc EXACTLY and its
    # cancellation-prone det = (oc.wc)^2 - oc.oc (Sphere.h:30) rounds >= 0
    # ~87% of the time (measured against the rebuilt binary with a
    # deterministic RNG probe), overwriting the point value with Ls/inf == 0.
    # The coin's per-sample outcome is pure fp rounding noise and cannot be
    # replayed faithfully through XLA (it even differs between eager and
    # jitted evaluation of the same f64 expression), so we take the dominant
    # branch deterministically: the point contribution is killed whenever the
    # degenerate ray would reach the light (distance above the reference's
    # 1e-4 validity epsilon, Sphere.h:34). Documented divergence: the
    # reference retains ~13% of this term as fp-lottery noise; we retain 0%.
    point_killed = wc_mag > geo.EPS_T
    return jnp.where(visible[..., None], contrib, 0.0), point_killed


def _point_light_single_scatter(scene: Scene, xt, idsource, sigma_t):
    """Point-source branch (volumetricBasicFunctions.h:236-244 / 295-303):
    visibility, 1/d^2 falloff, transmittance to the light, isotropic phase."""
    light = scene.center[idsource]
    vis = geo.visibility(light, xt, scene)
    le = scene.radiance[idsource]
    d2 = jnp.maximum(vm.norm2(light - xt), 1e-20)
    ls = le * (med.transmittance(xt, light, sigma_t) * med.INV_4PI / d2)[..., None]
    return jnp.where(vis[..., None], ls, 0.0)


def _combine_point_sphere(scene: Scene, xt, idsource, sigma_t, u1, u2,
                          physical_point_nee: bool = False):
    """Reference branch combination incl. the missing-else overwrite: for
    r == 0 sources the point value survives ONLY when the degenerate cone
    ray misses the point sphere (see _sphere_light_single_scatter).
    physical_point_nee=True disables the overwrite quirk — the physically
    intended if/else the reference author evidently meant to write."""
    is_point = scene.radius[idsource] == 0.0
    point = _point_light_single_scatter(scene, xt, idsource, sigma_t)
    sphere, point_killed = _sphere_light_single_scatter(
        scene, xt, idsource, sigma_t, u1, u2)
    if not physical_point_nee:
        point = jnp.where(point_killed[..., None], 0.0, point)
    return jnp.where(is_point[..., None], point, sphere)


def single_scattering(scene: Scene, xt, idsource, sigma_t, sigma_s,
                      transmittance_xt, prob_source, u1, u2,
                      physical_point_nee: bool = False):
    """NEE from a medium point with explicit T * sigma_s weighting — the
    equi-angular-family estimator (volumetricBasicFunctions.h:225-281)."""
    ls = _combine_point_sphere(scene, xt, idsource, sigma_t, u1, u2,
                               physical_point_nee)
    w = jnp.asarray(transmittance_xt * sigma_s / prob_source)
    return ls * w[..., None]


def free_single_scattering(scene: Scene, xt, idsource, sigma_t, prob_source,
                           u1, u2, physical_point_nee: bool = False):
    """NEE from a medium point WITHOUT the T * sigma_s factor — those cancel
    against the free-flight pdf (the PBRT simplification used by the active
    integrator, volumetricBasicFunctions.h:284-340, vptShadeMethods.h:1248)."""
    ls = _combine_point_sphere(scene, xt, idsource, sigma_t, u1, u2,
                               physical_point_nee)
    inv_p = jnp.asarray(1.0 / prob_source)
    return ls * inv_p[..., None]
