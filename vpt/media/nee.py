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

    Fused: the reference traces the light->x ray twice (visibility,
    visibilityVPT) and the x->light ray once more (multipleT) — three full
    sphere scans per call (vptShadeMethods.h:66-72). One `sphere_roots` pass
    over the light->x ray yields all three: the VPT variant only masks
    material==3 out of the same nearest-hit reduction, and the reversed
    ray's roots are D - t2 / D - t1.
    """
    from ..scene.scene import VOLUME_BOUNDARY

    light = jnp.broadcast_to(light_p, x.shape)
    d2 = vm.norm2(light - x)
    inv_d2 = 1.0 / jnp.maximum(d2, 1e-20)
    distance = jnp.sqrt(jnp.maximum(d2, 1e-20))
    dir_lx = (x - light) / distance[..., None]

    t1, t2, _ = geo.sphere_roots(light, dir_lx, scene)         # (N, S)
    eps = geo.hit_eps(scene)[None, :]
    # Sphere::intersect first-root rescue (Sphere.h:34)
    t_first = jnp.where((t1 < 0.0) | (jnp.abs(t1) < eps), t2, t1)
    valid = (t_first > 0.0) & (jnp.abs(t_first) > eps)
    slack = 1024.0 * float(jnp.finfo(x.dtype).eps)
    is_vol = (scene.material == VOLUME_BOUNDARY)[None, :]

    def nearest_vis(mask):
        tm = jnp.where(mask, t_first, jnp.inf)
        tmin = jnp.min(tm, axis=-1)
        return (tmin > distance * (1.0 - slack)) | ~jnp.isfinite(tmin)

    vis = nearest_vis(valid)
    vis_vpt = nearest_vis(valid & ~is_vol)

    # multipleT on the reversed (x -> light) ray: roots are D-t2, D-t1
    # (volumetricBasicFunctions.h:26-57 applied to r(x, (light-x)/D))
    r1 = distance[..., None] - t2
    r2 = distance[..., None] - t1
    st = PLIGHT_FALLBACK_SIGMA_T
    tau = jnp.where(is_vol & (r2 < 0.0), st * r1, 0.0)
    tau = tau + jnp.where(is_vol & (r2 - r1 > 0.0), st * (r2 - r1), 0.0)
    mt = jnp.exp(-jnp.sum(tau, axis=-1))

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


def _combine_point_sphere(scene: Scene, xt, idsource, sigma_t, u1, u2,
                          physical_point_nee: bool = False,
                          d_in=None, g=0.0, field=None):
    """Reference branch combination incl. the missing-else overwrite: for
    r == 0 sources the point value survives ONLY when the degenerate cone
    ray misses the point sphere (see the quirk note below).
    physical_point_nee=True disables the overwrite quirk — the physically
    intended if/else the reference author evidently meant to write.

    Fused: the point branch's visibility (light -> xt ray,
    volumetricBasicFunctions.h:237) and the sphere branch's cone ray
    (xt -> wl, :327) are ONE batched nearest-hit here — each lane traces the
    ray its branch needs, selected by radius[idsource] == 0."""
    center = scene.center[idsource]
    is_point = scene.radius[idsource] == 0.0
    le = scene.radiance[idsource]

    # sphere-branch cone sample
    wc = center - xt
    wc_mag = vm.norm(wc)
    wc_n = wc / jnp.maximum(wc_mag, 1e-20)[..., None]
    ratio = scene.radius[idsource] / jnp.maximum(wc_mag, 1e-20)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
    wl = ds.cone(wc_n, cos_max, u1, u2)
    prob_wl = ds.cone_pdf(cos_max)

    # one trace: point lanes cast light -> xt (the reference's quirky
    # shadow-ray direction), sphere lanes cast xt -> wl
    o_ray = jnp.where(is_point[..., None], center, xt)
    d_ray = jnp.where(is_point[..., None], -wc_n, wl)
    hit, t, hit_id = geo.nearest_hit(o_ray, d_ray, scene)

    # phase value toward the light (HG anisotropy; g == 0 evaluates to
    # exactly INV_4PI, preserving the reference's isotropic arithmetic)
    if d_in is None:
        phase_pt = phase_sph = med.INV_4PI
    else:
        phase_pt = med.hg_phase(vm.dot(d_in, wc_n), g)
        phase_sph = med.hg_phase(vm.dot(d_in, wl), g)

    # point branch (visibility: first hit beyond xt, or nothing hit)
    slack = 1024.0 * float(jnp.finfo(xt.dtype).eps)
    vis_point = (t > wc_mag * (1.0 - slack)) | ~hit
    d2 = jnp.maximum(wc_mag * wc_mag, 1e-20)
    if field is None:
        tr_pt = med.transmittance(xt, center, sigma_t)
    else:
        # heterogeneous Beer-Lambert toward the light (media/density.py)
        from . import density as den
        tr_pt = den.transmittance_between(field, sigma_t, xt, center)
    point = le * (tr_pt * phase_pt / d2)[..., None]
    point = jnp.where(vis_point[..., None], point, 0.0)
    if not physical_point_nee:
        # missing-else overwrite quirk: the reference's cone branch has no `else`
        # (volumetricBasicFunctions.h:305-337); its degenerate center ray
        # 'hits' the r==0 sphere on an fp-rounding coin ~87% of the time and
        # overwrites Ld with Ls/inf == 0; we take the dominant branch
        # deterministically (documented divergence: ~13% fp-lottery residual)
        point = jnp.where((wc_mag > geo.EPS_T)[..., None], 0.0, point)

    # sphere branch (visibility by id match; Tr over the hit distance)
    vis_sphere = hit & (hit_id == idsource)
    if field is None:
        tr_sph = jnp.exp(-sigma_t * t)
    else:
        from . import density as den
        tr_sph = jnp.exp(-den.optical_depth(field, sigma_t, xt, wl, t))
    ls = le * (tr_sph * phase_sph)[..., None]
    sphere = jnp.where(
        vis_sphere[..., None], ls / jnp.maximum(prob_wl, 1e-20)[..., None], 0.0)

    return jnp.where(is_point[..., None], point, sphere)


def single_scattering(scene: Scene, xt, idsource, sigma_t, sigma_s,
                      transmittance_xt, prob_source, u1, u2,
                      physical_point_nee: bool = False,
                      d_in=None, g=0.0, field=None):
    """NEE from a medium point with explicit T * sigma_s weighting — the
    equi-angular-family estimator (volumetricBasicFunctions.h:225-281).
    d_in/g: incoming propagation direction + HG anisotropy (g=0 keeps the
    reference's isotropic 1/4pi exactly). field: heterogeneous density
    (media/density.py), None = homogeneous."""
    ls = _combine_point_sphere(scene, xt, idsource, sigma_t, u1, u2,
                               physical_point_nee, d_in=d_in, g=g,
                               field=field)
    w = jnp.asarray(transmittance_xt * sigma_s / prob_source)
    return ls * w[..., None]


def free_single_scattering(scene: Scene, xt, idsource, sigma_t, prob_source,
                           u1, u2, physical_point_nee: bool = False,
                           d_in=None, g=0.0, field=None):
    """NEE from a medium point WITHOUT the T * sigma_s factor — those cancel
    against the free-flight pdf (the PBRT simplification used by the active
    integrator, volumetricBasicFunctions.h:284-340, vptShadeMethods.h:1248;
    the cancellation survives heterogeneity because sigma_a and sigma_s
    share the density — see media/density.py).
    d_in/g: incoming propagation direction + HG anisotropy (g=0 keeps the
    reference's isotropic 1/4pi exactly). field: heterogeneous density
    (media/density.py), None = homogeneous."""
    ls = _combine_point_sphere(scene, xt, idsource, sigma_t, u1, u2,
                               physical_point_nee, d_in=d_in, g=g,
                               field=field)
    inv_p = jnp.asarray(1.0 / prob_source)
    return ls * inv_p[..., None]
