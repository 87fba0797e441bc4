"""Surface path tracers — the reference's legacy "model zoo" (SURVEY §2.9).

Wavefront (masked-lane) rebuilds of:

  iterative_pt        == iterativePathTracer (shadeMethods.h:104-163), the
                         "definitive" surface PT: per-bounce point-light
                         pLight sum + MIS over sphere lights, RR q=0.4,
                         factor/throughput accumulation
  explicit_recursive  == explicitPath / explicitPathRecursive
                         (src/rt.cpp:108-121, 51-106): MIS NEE with RR q=0.1
  tail_explicit       == tailExplicitPath (src/rt.cpp:124-162)
  implicit_pt         == implicitPath (src/rt.cpp:165-241): no NEE, its own
                         BSDF weights, max 5 bounces + RR q=0.1
  shade               == shade (src/rt.cpp:245-292): single-bounce direct
                         lighting

Reproduced quirks (each one deliberate, cited):
  - iterativePathTracer discards the current bounce's Ld when RR kills the
    path (the accumulation line is commented out, shadeMethods.h:145);
    explicitPathRecursive / tailExplicitPath keep it (src/rt.cpp:80, 153).
  - explicitPathRecursive has NO dielectric branch and hardcodes
    alpha = 0.001 for both MIS and its continuation (src/rt.cpp:73, 88).
  - implicitPath hardcodes alpha = 0.3 (src/rt.cpp:220), uses prob = 1 for
    both dielectric branches with Fresnel folded into the branch choice
    (src/rt.cpp:204-216), credits emitters at ANY depth without terminating
    the path (src/rt.cpp:187-188), and stops at bounces > 5 (src/rt.cpp:190).
  - shade's point-light loop OVERWRITES L instead of accumulating, so only
    the LAST r == 0 sphere contributes (src/rt.cpp:272-277), with
    alpha = 0.0003 for pLight and 0.003 for MIS (src/rt.cpp:274, 278).
  - emitter tests here key on radiance.x > 0 (e.g. shadeMethods.h:122).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import vecmath as vm
from ..geometry import intersect as geo
from ..media import mis as mis_mod
from ..media import nee as nee_mod
from ..bxdf import dispatch as bx
from ..bxdf import dielectric as dl
from ..bxdf import microfacet as mf
from ..sampling import directional as ds
from ..scene.scene import Scene, LAMBERT, MICROFACET, DIELECTRIC

ITERATIVE = "iterative"
EXPLICIT_RECURSIVE = "explicit_recursive"
TAIL = "tail"
IMPLICIT = "implicit"
SHADE = "shade"
MARCH_MEDIA = "march_media"

# explicitPathRecursive2 hardcodes its own medium (vptShadeMethods.h:399-400)
MARCH_SIGMA_A = 0.05
MARCH_SIGMA_S = 0.009
MARCH_STEPS = 100               # vptShadeMethods.h:424


@dataclasses.dataclass(frozen=True)
class SurfaceSpec:
    variant: str = ITERATIVE
    rr_q: float = 0.4           # kill prob; 0.4 iterative, 0.1 legacy
    max_bounces: int = 32


SURFACE_INTEGRATORS: dict[str, SurfaceSpec] = {
    "surface_pt": SurfaceSpec(ITERATIVE, 0.4),
    "iterative_path_tracer": SurfaceSpec(ITERATIVE, 0.4),
    "explicit_path": SurfaceSpec(EXPLICIT_RECURSIVE, 0.1),
    "tail_explicit_path": SurfaceSpec(TAIL, 0.1),
    "implicit_path": SurfaceSpec(IMPLICIT, 0.1, max_bounces=6),
    "shade": SurfaceSpec(SHADE, 0.0, max_bounces=1),
    # explicitPathRecursive2 (vptShadeMethods.h:398-495): surface PT that
    # ray-marches through material==3 boundary spheres
    "explicit_path_march_media": SurfaceSpec(MARCH_MEDIA, 0.1),
}


def point_light_sum(scene: Scene, obj_id, x, n, wray, alpha,
                    overwrite: bool = False):
    """Sum (or, for `shade`, keep only the last of) pLight over every r == 0
    sphere (shadeMethods.h:135-140 / src/rt.cpp:272-277)."""
    total = jnp.zeros_like(x)
    for i in scene.point_idx:
        li = nee_mod.plight(
            scene, obj_id, x, n, wray,
            scene.radiance[i], scene.center[i], alpha,
        )
        total = li if overwrite else total + li
    return total


def _implicit_bsdf(scene: Scene, obj_id, wray, n, u_choice, u1, u2):
    """implicitPath's own BSDF weights (src/rt.cpp:193-228): dielectric with
    prob = 1 and Fresnel in the branch choice; microfacet alpha = 0.3."""
    material = scene.material[obj_id]
    wo = -wray

    wi_l = ds.cosine_hemisphere(n, u1, u2)
    fs_l = scene.albedo[obj_id] * (1.0 / jnp.pi)
    pdf_l = ds.cosine_hemisphere_pdf(vm.dot(n, wi_l))

    wt = vm.normalize(dl.refract(bx.GLASS_ETA_I, bx.GLASS_ETA_T, wo, n), eps=1e-20)
    fres = dl.fresnel_dielectric(
        bx.GLASS_ETA_I, bx.GLASS_ETA_T, vm.dot(n, wt), vm.dot(n, wo))
    reflect_branch = u_choice < fres
    wr = vm.normalize(dl.reflect(wo, n), eps=1e-20)
    wi_d = jnp.where(reflect_branch[..., None], wr, wt)
    inv_cos = 1.0 / jnp.maximum(jnp.abs(vm.dot(n, wi_d)), 1e-12)
    ratio2 = (bx.GLASS_ETA_T / bx.GLASS_ETA_I) ** 2
    fs_d_scalar = jnp.where(reflect_branch, inv_cos, inv_cos * ratio2)
    fs_d = jnp.broadcast_to(fs_d_scalar[..., None], wi_d.shape)
    pdf_d = jnp.ones_like(fs_d_scalar)

    alpha = jnp.full(obj_id.shape, 0.3, n.dtype)   # src/rt.cpp:220
    wh = vm.from_local(n, ds.beckmann_half_vector(alpha, u1, u2))
    wi_m = -wo + wh * (2.0 * vm.dot(wh, wo))[..., None]
    fs_m = mf.fr_microfacet(scene.eta[obj_id], scene.kappa[obj_id],
                            wi_m, wh, wo, alpha, n)
    pdf_m = mf.microfacet_pdf(wo, wh, alpha, n)

    is_d = (material == DIELECTRIC)[..., None]
    is_m = (material == MICROFACET)[..., None]
    fs = jnp.where(is_m, fs_m, jnp.where(is_d, fs_d, fs_l))
    wi = vm.normalize(
        jnp.where(is_m, wi_m, jnp.where(is_d, wi_d, wi_l)), eps=1e-20)
    pdf = jnp.where(material == MICROFACET, pdf_m,
                    jnp.where(material == DIELECTRIC, pdf_d, pdf_l))
    return fs, wi, pdf


def _legacy_bsdf(scene: Scene, obj_id, wray, n, u1, u2):
    """explicitPathRecursive's two-way dispatch (src/rt.cpp:82-96):
    Lambert -> cosine sampling; EVERYTHING ELSE -> microfacet with
    alpha = 0.001 (no dielectric branch)."""
    wo = -wray
    wi_l = ds.cosine_hemisphere(n, u1, u2)
    fs_l = scene.albedo[obj_id] * (1.0 / jnp.pi)
    pdf_l = ds.cosine_hemisphere_pdf(vm.dot(n, wi_l))

    alpha = jnp.full(obj_id.shape, 0.001, n.dtype)  # src/rt.cpp:88
    wh = vm.from_local(n, ds.beckmann_half_vector(alpha, u1, u2))
    wi_m = -wo + wh * (2.0 * vm.dot(wh, wo))[..., None]
    fs_m = mf.fr_microfacet(scene.eta[obj_id], scene.kappa[obj_id],
                            wi_m, wh, wo, alpha, n)
    pdf_m = mf.microfacet_pdf(wo, wh, alpha, n)

    is_l = (scene.material[obj_id] == LAMBERT)
    fs = jnp.where(is_l[..., None], fs_l, fs_m)
    wi = vm.normalize(jnp.where(is_l[..., None], wi_l, wi_m), eps=1e-20)
    pdf = jnp.where(is_l, pdf_l, pdf_m)
    return fs, wi, pdf


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SurfaceState:
    o: jnp.ndarray
    d: jnp.ndarray
    fs: jnp.ndarray       # (N, 3) accumulated BSDF product (reference `fs`)
    factor: jnp.ndarray   # (N,)   cosine/pdf/RR scalar chain
    L: jnp.ndarray
    alive: jnp.ndarray


def surface_bounce(scene: Scene, spec: SurfaceSpec, bounce, key,
                   st: SurfaceState) -> SurfaceState:
    q = spec.rr_q
    cp = 1.0 - q
    N = st.o.shape[0]
    dtype = st.o.dtype
    kb = rng.fold(key, bounce)
    variant = spec.variant

    hit, t, obj_id = geo.nearest_hit(st.o, st.d, scene)
    alive = st.alive & hit
    em_hit = alive & (scene.radiance[obj_id][..., 0] > 0.0)

    x = st.o + t[:, None] * st.d
    n = vm.normalize(x - scene.center[obj_id], eps=1e-20)
    alpha_obj = scene.alpha[obj_id]

    L = st.L
    if variant in (ITERATIVE, EXPLICIT_RECURSIVE):
        # emitter credit only for the primary ray (shadeMethods.h:122-125,
        # src/rt.cpp:118-120); explicit wrapper credits radiance at bounce 0
        credit = em_hit & (jnp.asarray(bounce) == 0)
        L = L + jnp.where(credit[:, None], scene.radiance[obj_id], 0.0)
        alive = alive & ~em_hit
    elif variant == TAIL:
        # tailExplicitPath: emitter hit ends the path with NO credit
        # (src/rt.cpp:132-133)
        alive = alive & ~em_hit
    elif variant == IMPLICIT:
        # implicitPath credits radiance at any depth and KEEPS bouncing
        # (src/rt.cpp:187-188)
        L = L + jnp.where(
            em_hit[:, None], scene.radiance[obj_id] * st.fs
            * st.factor[:, None], 0.0)
    elif variant == SHADE:
        L = L + jnp.where(em_hit[:, None], scene.radiance[obj_id], 0.0)
        alive = alive & ~em_hit

    # --- direct lighting
    if variant == ITERATIVE:
        ld = point_light_sum(scene, obj_id, x, n, st.d, alpha_obj)
        ld = ld + mis_mod.mis(scene, obj_id, x, n, st.d, alpha_obj,
                              rng.fold(kb, rng.Tag.MIS))
    elif variant in (EXPLICIT_RECURSIVE, TAIL):
        alpha_mis = jnp.full((N,), 0.001, dtype)   # src/rt.cpp:73, 146
        ld = mis_mod.mis(scene, obj_id, x, n, st.d, alpha_mis,
                         rng.fold(kb, rng.Tag.MIS))
    elif variant == SHADE:
        ld = point_light_sum(scene, obj_id, x, n, st.d,
                             jnp.full((N,), 0.0003, dtype), overwrite=True)
        ld = ld + mis_mod.mis(scene, obj_id, x, n, st.d,
                              jnp.full((N,), 0.003, dtype),
                              rng.fold(kb, rng.Tag.MIS))
    else:
        ld = jnp.zeros((N, 3), dtype)

    # --- russian roulette + Ld accumulation order (variant quirks)
    u_rr = rng.uniform(rng.fold(kb, rng.Tag.RR), (N,), dtype)
    killed = u_rr < q
    if variant == ITERATIVE:
        # Ld only counts if the path SURVIVES (shadeMethods.h:143-155)
        add = alive & ~killed
        L = L + jnp.where(add[:, None], st.fs * ld * st.factor[:, None], 0.0)
        alive = alive & ~killed
    elif variant in (EXPLICIT_RECURSIVE, TAIL):
        # Ld counts even when RR kills (src/rt.cpp:79-80, 152-153)
        L = L + jnp.where(alive[:, None], st.fs * ld * st.factor[:, None], 0.0)
        alive = alive & ~killed
    elif variant == SHADE:
        L = L + jnp.where(alive[:, None], ld, 0.0)
        alive = jnp.zeros_like(alive)   # single bounce
    # IMPLICIT: RR applied after sampling below (same measure); no Ld

    # --- continuation sampling
    u_b1, u_b2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
    u_choice = rng.uniform(rng.fold(kb, rng.Tag.BSDF_CHOICE), (N,), dtype)
    if variant == IMPLICIT:
        fs1, wi, pdf = _implicit_bsdf(scene, obj_id, st.d, n, u_choice, u_b1, u_b2)
        alive = alive & ~killed
        # implicitPath stops past 5 bounces (src/rt.cpp:190-191)
        if isinstance(bounce, int) and bounce >= 5:
            alive = jnp.zeros_like(alive)
        cosine = jnp.abs(vm.dot(n, wi))
    elif variant == EXPLICIT_RECURSIVE:
        fs1, wi, pdf = _legacy_bsdf(scene, obj_id, st.d, n, u_b1, u_b2)
        cosine = jnp.abs(vm.dot(n, wi))   # src/rt.cpp:102 abs()
    else:
        fs1, wi, pdf = bx.sample_bsdf(scene, obj_id, st.d, n, u_choice, u_b1, u_b2)
        cosine = vm.dot(n, wi) if variant == ITERATIVE else jnp.abs(vm.dot(n, wi))

    fs_new = st.fs * fs1
    factor_new = st.factor * cosine / (jnp.maximum(pdf, 1e-20) * max(cp, 1e-9))

    return SurfaceState(
        o=jnp.where(alive[:, None], x, st.o),
        d=jnp.where(alive[:, None], wi, st.d),
        fs=jnp.where(alive[:, None], fs_new, st.fs),
        factor=jnp.where(alive, factor_new, st.factor),
        L=L,
        alive=alive,
    )


def march_media_bounce(scene: Scene, spec: SurfaceSpec, bounce, key,
                       st: SurfaceState) -> SurfaceState:
    """One bounce of explicitPathRecursive2 (vptShadeMethods.h:398-495):
    a surface PT whose rays MARCH through material==3 boundary spheres
    (100 fixed steps of point-light single scattering via punctualVolumetric)
    and continue, attenuated by the segment transmittance. Its medium
    coefficients are hardcoded (sigma_a=0.05, sigma_s=0.009, :399-400)
    independent of the scene's. Emitter hits return black at ANY depth
    (:414-415); Ld counts even when RR kills (:467-469); the continuation is
    the two-way Lambert/microfacet(alpha=0.001) dispatch (:471-487)."""
    from ..media import medium as med_mod
    from .raymarch import punctual_single_scatter

    sigma_t = MARCH_SIGMA_A + MARCH_SIGMA_S
    q = spec.rr_q
    cp = 1.0 - q
    N = st.o.shape[0]
    dtype = st.o.dtype
    kb = rng.fold(key, bounce)

    hit, t1, t2, obj_id = geo.nearest_hit_both(st.o, st.d, scene)
    alive = st.alive & hit
    em_hit = alive & (scene.radiance[obj_id][..., 0] > 0.0)
    alive = alive & ~em_hit                      # black at any depth (:414)
    x = st.o + t1[:, None] * st.d
    is_m3 = alive & (scene.material[obj_id] == 3)

    # --- material-3 branch: fixed-step march through [t1, t2] ----------
    step = (t2 - t1) / MARCH_STEPS
    ls = jnp.zeros((N, 3), dtype)
    if scene.point_idx:
        def seg(i, acc):
            xt = x + st.d * (step * i)[:, None]
            tr_seg = med_mod.transmittance(x, xt, sigma_t)
            c = acc
            for light in scene.point_idx:
                c = c + punctual_single_scatter(
                    scene, jnp.full((N,), light, jnp.int32), xt,
                    sigma_t, MARCH_SIGMA_S,
                ) * (step * tr_seg)[:, None]
            return c

        ls = jax.lax.fori_loop(0, MARCH_STEPS, seg, ls)
    x_exit = x + st.d * (step * (MARCH_STEPS - 1))[:, None]
    tr_exit = med_mod.transmittance(x, x_exit, sigma_t)
    L = st.L + jnp.where(is_m3[:, None], st.fs * ls * st.factor[:, None], 0.0)

    # --- ordinary surface branch ---------------------------------------
    surf = alive & ~is_m3
    n = vm.normalize(x - scene.center[obj_id], eps=1e-20)
    alpha_obj = scene.alpha[obj_id]
    ld = point_light_sum(scene, obj_id, x, n, st.d, alpha_obj)
    ld = ld + mis_mod.mis(scene, obj_id, x, n, st.d, alpha_obj,
                          rng.fold(kb, rng.Tag.MIS))
    u_rr = rng.uniform(rng.fold(kb, rng.Tag.RR), (N,), dtype)
    killed = u_rr < q
    L = L + jnp.where(surf[:, None], st.fs * ld * st.factor[:, None], 0.0)

    u_b1, u_b2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
    fs1, wi, pdf = _legacy_bsdf(scene, obj_id, st.d, n, u_b1, u_b2)
    cosine = jnp.abs(vm.dot(n, wi))

    surf_alive = surf & ~killed
    alive_new = surf_alive | is_m3
    o_new = jnp.where(is_m3[:, None], x_exit, x)
    d_new = jnp.where(surf_alive[:, None], wi, st.d)
    fs_new = jnp.where(
        is_m3[:, None], st.fs * tr_exit[:, None],
        jnp.where(surf_alive[:, None], st.fs * fs1, st.fs))
    factor_new = jnp.where(
        surf_alive,
        st.factor * cosine / (jnp.maximum(pdf, 1e-20) * cp),
        st.factor)
    return SurfaceState(
        o=jnp.where(alive_new[:, None], o_new, st.o),
        d=jnp.where(alive_new[:, None], d_new, st.d),
        fs=jnp.where(alive_new[:, None], fs_new, st.fs),
        factor=jnp.where(alive_new, factor_new, st.factor),
        L=L,
        alive=alive_new,
    )


def trace_surface(scene: Scene, spec: SurfaceSpec, o, d, key,
                  differentiable: bool = False) -> jnp.ndarray:
    """Trace a surface-PT ray batch; returns radiance (N, 3)."""
    n = o.shape[0]
    st = SurfaceState(
        o=o, d=d,
        fs=jnp.ones((n, 3), o.dtype),
        factor=jnp.ones((n,), o.dtype),
        L=jnp.zeros((n, 3), o.dtype),
        alive=jnp.ones((n,), bool),
    )
    key = rng.fold(key, 0x73757266)
    if spec.variant == IMPLICIT or spec.variant == SHADE:
        # small fixed bounce counts: unrolled python loop keeps the
        # bounce-dependent logic (depth cutoffs) static
        for b in range(spec.max_bounces):
            st = surface_bounce(scene, spec, b, key, st)
        return st.L
    step_fn = march_media_bounce if spec.variant == MARCH_MEDIA else surface_bounce
    if differentiable:
        def body(carry, bounce):
            return step_fn(scene, spec, bounce, key, carry), None
        st, _ = jax.lax.scan(body, st, jnp.arange(spec.max_bounces))
        return st.L

    def cond(carry):
        bounce, st = carry
        return (bounce < spec.max_bounces) & jnp.any(st.alive)

    def body(carry):
        bounce, st = carry
        return bounce + 1, step_fn(scene, spec, bounce, key, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.asarray(0), st))
    return st.L
