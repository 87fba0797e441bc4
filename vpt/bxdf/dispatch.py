"""Material-dispatched BSDF sampling and evaluation.

Rebuild of the reference's twin dispatchers `bdsf` (vptShadeMethods.h:16-59)
and `BDSF` (shadeMethods.h:58-101) — identical in effect, so one function
here — plus the per-material pdf evaluation used by MIS's light strategy
(misSamplingFunctions.h:109-123) and the fr evaluation used by NEE cone
sampling (samplingFunctions.h:187-194).

Branchless on TPU: all three material lobes are computed for every lane and
selected by material code with jnp.where.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import vecmath as vm
from ..sampling import directional as ds
from ..scene.scene import Scene, MICROFACET, DIELECTRIC
from . import dielectric as dl
from . import microfacet as mf

__all__ = ["sample_bsdf", "bsdf_pdf_for_direction", "eval_fr_nee"]

GLASS_ETA_I = 1.0
GLASS_ETA_T = 1.5  # hardcoded throughout the reference (e.g. vptShadeMethods.h:27)


def sample_bsdf(scene: Scene, sphere_id, wray, n, u_choice, u1, u2):
    """Sample the BSDF at a surface point.

    sphere_id: (N,) int; wray: (N,3) INCOMING ray direction (reference passes
    r.d); n: (N,3) outward normal; u_choice: dielectric Fresnel branch draw;
    u1, u2: lobe sample draws. Returns (fs(N,3), wi(N,3), pdf(N,)) exactly as
    the reference's (fs1, aux, prob).
    """
    material = scene.material[sphere_id]
    wo = -wray

    # --- Lambertian (vptShadeMethods.h:20-25)
    wi_l = ds.cosine_hemisphere(n, u1, u2)
    fs_l = scene.albedo[sphere_id] * (1.0 / math.pi)
    pdf_l = ds.cosine_hemisphere_pdf(vm.dot(n, wi_l))

    # --- Smooth dielectric (vptShadeMethods.h:26-46)
    wt = vm.normalize(dl.refract(GLASS_ETA_I, GLASS_ETA_T, wo, n), eps=1e-20)
    fres = dl.fresnel_dielectric(GLASS_ETA_I, GLASS_ETA_T, vm.dot(n, wt), vm.dot(n, wo))
    reflect_branch = u_choice < fres
    wr = vm.normalize(dl.reflect(wo, n), eps=1e-20)
    wi_d = jnp.where(reflect_branch[..., None], wr, wt)
    cos_d = vm.dot(n, wi_d)
    inv_cos = 1.0 / jnp.where(cos_d != 0.0, cos_d, 1e-12)
    scale = jnp.where(
        reflect_branch,
        inv_cos * fres,
        inv_cos * (1.0 - fres) * GLASS_ETA_T * GLASS_ETA_T,
    )
    fs_d = jnp.broadcast_to(scale[..., None], wi_d.shape)
    pdf_d = jnp.where(reflect_branch, fres, 1.0 - fres)

    # --- Beckmann microfacet conductor (vptShadeMethods.h:47-57)
    alpha = scene.alpha[sphere_id]
    wh = vm.from_local(n, ds.beckmann_half_vector(alpha, u1, u2))
    wi_m = -wo + wh * (2.0 * vm.dot(wh, wo))[..., None]
    fs_m = mf.fr_microfacet(
        scene.eta[sphere_id], scene.kappa[sphere_id], wi_m, wh, wo, alpha, n
    )
    pdf_m = mf.microfacet_pdf(wo, wh, alpha, n)

    is_d = (material == DIELECTRIC)[..., None]
    is_m = (material == MICROFACET)[..., None]
    fs = jnp.where(is_m, fs_m, jnp.where(is_d, fs_d, fs_l))
    wi = jnp.where(is_m, wi_m, jnp.where(is_d, wi_d, wi_l))
    pdf = jnp.where(
        material == MICROFACET, pdf_m, jnp.where(material == DIELECTRIC, pdf_d, pdf_l)
    )
    return fs, wi, pdf


def bsdf_pdf_for_direction(scene: Scene, sphere_id, n, wo, wi, u_flip,
                           alpha=None):
    """gpdf of the BSDF strategy for a LIGHT-sampled direction wi — the
    material dispatch inside MIS's light loop (misSamplingFunctions.h:109-123).

    u_flip is the erand48 draw of the dielectric branch
    (misSamplingFunctions.h:115: if u > F then gpdf = 1 - F). `alpha`
    overrides per-sphere roughness (reference passes its own alpha arg,
    misSamplingFunctions.h:45).
    """
    material = scene.material[sphere_id]
    if alpha is None:
        alpha = scene.alpha[sphere_id]
    # Lambert
    pdf_l = ds.cosine_hemisphere_pdf(vm.dot(n, wi))
    # Dielectric: Fresnel of the REFRACTED observation direction
    wt = vm.normalize(dl.refract(GLASS_ETA_I, GLASS_ETA_T, wo, n), eps=1e-20)
    fres = dl.fresnel_dielectric(GLASS_ETA_I, GLASS_ETA_T, vm.dot(n, wt), vm.dot(n, wo))
    pdf_d = jnp.where(u_flip > fres, 1.0 - fres, fres)
    # Microfacet: half vector of (wi, wo), global frame
    wh = vm.normalize(wi + wo, eps=1e-20)
    pdf_m = mf.microfacet_pdf(wo, wh, alpha, n)
    return jnp.where(
        material == MICROFACET, pdf_m, jnp.where(material == DIELECTRIC, pdf_d, pdf_l)
    )


def eval_fr_nee(scene: Scene, sphere_id, n, wray, wi, alpha=None):
    """fr for a light-sampled direction at a surface point, evaluated in the
    LOCAL frame like the reference's cone-sampling shader
    (samplingFunctions.h:163-194): Lambert albedo/pi; dielectric -> 0 (a
    delta lobe can never be hit by light sampling, samplingFunctions.h:190-193);
    microfacet via local-frame Cook-Torrance. `alpha` overrides the
    per-sphere roughness (the legacy surface tracers pass hardcoded values,
    e.g. src/rt.cpp:73).
    """
    material = scene.material[sphere_id]
    fr_l = scene.albedo[sphere_id] * (1.0 / math.pi)
    if alpha is None:
        alpha = scene.alpha[sphere_id]

    wi_local = vm.normalize(vm.to_local(n, wi), eps=1e-20)
    wo_local = vm.normalize(vm.to_local(n, -wray), eps=1e-20)
    wh = vm.normalize(wi_local + wo_local, eps=1e-20)
    n_local = jnp.zeros_like(wi_local).at[..., 2].set(1.0)
    fr_m = mf.fr_microfacet(
        scene.eta[sphere_id], scene.kappa[sphere_id],
        wi_local, wh, wo_local, alpha, n_local,
    )
    is_m = (material == MICROFACET)[..., None]
    is_d = (material == DIELECTRIC)[..., None]
    return jnp.where(is_m, fr_m, jnp.where(is_d, jnp.zeros_like(fr_l), fr_l))
