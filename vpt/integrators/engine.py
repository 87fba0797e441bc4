"""Wavefront volumetric-path-tracing engine.

The reference's volume integrators (vptShadeMethods.h:816-1481) are recursive
or stack-based scalar loops; every one of them pushes exactly ONE
continuation per bounce, so a path is a linear chain. On TPU that chain maps
to a masked wavefront: a flat batch of N ray lanes advances one bounce per
iteration of a `lax.scan` / `lax.while_loop`, with per-lane alive masks
replacing control flow. Russian roulette gives a geometric tail
(continue-prob 0.6 => mean ~2.5 bounces); a fixed max-bounce bound truncates
a tail whose mass (0.6^32 ~ 8e-9) is far below Monte-Carlo noise.

One parameterized bounce step covers the whole reference family:

  spec.distance = FREE        free-flight sampling (vptSamplingFunctions.h:11)
                  EQUIANGULAR equi-angular sampling (vptSamplingFunctions.h:54)
  spec.nee      = True        explicit single-scattering + MIS NEE
                  False       implicit (emitter-hit only) estimator
  spec.clamped_ea             use the clamped foot-point parameterization
                              (volumetricBasicFunctions.h:180) like
                              implicitVPTracerRecursive (vptShadeMethods.h:884)
                              instead of equiAngularParams2.

Estimator weights follow the reference exactly, including the PBRT
cancellation in the free-flight explicit path (transmittance/pdf == 1/sigma_t
so only sigma_s/sigma_t remains, vptShadeMethods.h:1248,1258) and the
explicit T and pdf factors in the equi-angular paths (vptShadeMethods.h:1146).

Everything is differentiable: sampled distances are reparameterized in
sigma_t, discrete events (RR, surface/medium, light pick) act as detached
decisions, and the continuous chain (transmittance, 1/d^2, fr, pdf weights)
carries the gradient.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import vecmath as vm
from ..geometry import intersect as geo
from ..media import density as den
from ..media import medium as med
from ..media import mis as mis_mod
from ..media import nee as nee_mod
from ..bxdf import dispatch as bx
from ..sampling import distance as dist
from ..scene.scene import Scene

FREE = "free"
EQUIANGULAR = "equiangular"


@dataclasses.dataclass(frozen=True)
class IntegratorSpec:
    """Static (trace-time) integrator configuration."""

    distance: str = FREE
    nee: bool = True
    clamped_ea: bool = False
    continue_prob: float = 0.6   # RR continue (vptShadeMethods.h:1275)
    max_bounces: int = 32
    # True disables the reference's missing-else point-NEE overwrite quirk
    # (see media/nee.py) and restores physical point-light in-scattering.
    physical_point_nee: bool = False
    # Single hardcoded NEE source (prob_source = 1) — the rt.cpp
    # volumetricPathTracerExplicit* family takes idsource as a parameter
    # (src/rt.cpp:361, 472, 603) instead of sampling the emitter set.
    fixed_light: int | None = None
    # NEE over EVERY emitter per bounce instead of sampling one — the
    # volumetricPathTracer3alt strategy (vptShadeMethods.h:285-395).
    nee_all_lights: bool = False
    # Emitter-hit policy: explicit integrators only credit depth 0
    # (vptShadeMethods.h:1308-1313); implicit ones credit at any depth
    # (vptShadeMethods.h:981-983).
    # Score-function (likelihood-ratio) sigma gradients. The detached-
    # sampling estimator drops the boundary terms of the surface/medium
    # event probabilities (pdfSuccess/pdfFailure, vptSamplingFunctions.h:
    # 24-31), which biases d/d(sigma) enough to break sigma inverse
    # rendering. With sigma_score=True the sampled distances are DETACHED
    # (no reparameterized-geometry gradient) and every radiance
    # contribution c_k is multiplied by (1 + S_k - stop_grad(S_k)), where
    # S_k is the path's accumulated log-density of all sigma-dependent
    # sampling decisions up to bounce k:
    #   free-flight   medium:  log(sigma_t) - sigma_t * d_s
    #                 surface: -sigma_t * t
    #   equi-angular  medium:  log(1 - exp(-sigma_t t))   (Bernoulli)
    #                 surface: -sigma_t * t
    # The estimator VALUE is unchanged; its sigma-gradient becomes the
    # unbiased pathwise+score estimator E[dV + V dlog p].
    sigma_score: bool = False
    # Textbook-unbiased estimator mode (NOT in the reference). Two reference
    # quirks bias its estimators away from the transport equation, both
    # reproduced faithfully when physical=False:
    #  1. Terminal Russian-roulette factor: RR runs at the top of every
    #     iteration (vptShadeMethods.h:951-953, 1282) and the 1/continueprob
    #     compensation is applied only to CONTINUATION weights
    #     (:995, 1006, 1330), never to the iteration's own emitter-hit
    #     credit (:981-983, 1308-1313) — so every emitter-hit contribution
    #     is scaled by one uncompensated factor of cp. (NEE contributions
    #     DO carry the 1/continueprob, :1330-1334, so only directly-visible
    #     emitters render cp-dark in explicit mode; in implicit mode the
    #     whole image does.)
    #  2. The implicit FREE-FLIGHT medium weight divides by
    #     pSuccess = ffProb(d) * (1 - TrActual) (vptShadeMethods.h:977,
    #     1006) as though the distance had been drawn from the truncated
    #     exponential — but d is drawn unconditionally and the medium event
    #     IS d < t, so the (1 - TrActual) division double-counts: each
    #     medium bounce contributes E[w * 1{d<t}] = 1/cp * 1/(1)… i.e. the
    #     estimator's expected value gains ~E[Tr_k] per bounce and grows
    #     with max_bounces in enclosed scenes (the white-furnace test pins
    #     this). The equi-angular implicit weight is NOT affected: there
    #     the surface/medium choice is a genuine independent Bernoulli
    #     (:872-880), so its (1 - TrActual) division is correct.
    # physical=True restores the textbook estimator: emitter-hit credits
    # are weighted 1/cp, and the implicit free-flight medium weight uses
    # the PBRT cancellation sigma_s*T/(cp*ffProb) = (sigma_s/sigma_t)/cp.
    # Validated against closed forms in tests/test_furnace.py.
    physical: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PathState:
    o: jnp.ndarray        # (N, 3) ray origin
    d: jnp.ndarray        # (N, 3) ray direction
    tp: jnp.ndarray       # (N, 3) path throughput
    L: jnp.ndarray        # (N, 3) accumulated radiance
    alive: jnp.ndarray    # (N,) bool
    score: jnp.ndarray    # (N,) accumulated sampling log-density (sigma_score)


def init_state(o: jnp.ndarray, d: jnp.ndarray) -> PathState:
    # Derive every leaf from o so that under shard_map the whole carry is
    # device-varying from the start (a fresh jnp.ones would be replicated and
    # trip lax.scan's varying-manual-axes carry check).
    return PathState(
        o=o,
        d=d,
        tp=jnp.ones_like(o),
        L=jnp.zeros_like(o),
        alive=o[..., 0] == o[..., 0],
        score=jnp.zeros_like(o[..., 0]),
    )


def pick_light(scene: Scene, u: jnp.ndarray):
    """Uniform pick among emitters in scene order — the arr[]/count idiom of
    every volume integrator (e.g. vptShadeMethods.h:1293-1303). The emitter
    set is static scene structure (Scene.emitter_idx), so the pick is one
    cheap gather instead of a per-bounce scan over all spheres. Returns
    (idsource (N,), prob_source float, has_lights bool) — the latter two are
    Python constants baked into the trace."""
    count = len(scene.emitter_idx)
    if count == 0:
        return jnp.zeros(u.shape, jnp.int32), 1.0, False
    k = jnp.clip((u * count).astype(jnp.int32), 0, count - 1)
    idsource = jnp.asarray(scene.emitter_idx, jnp.int32)[k]
    return idsource, 1.0 / count, True


def bounce_step(scene: Scene, spec: IntegratorSpec, bounce, key, st: PathState,
                depth=None) -> PathState:
    """Advance every lane one bounce. `bounce` may be traced; it keys the
    iteration's RNG stream. `depth` (N,) overrides the per-lane path depth
    for the emitter-credit test (persistent wavefront mode, where lanes sit
    at different depths); default: every lane is at depth `bounce`."""
    sigma_a = scene.medium.sigma_a
    sigma_s = scene.medium.sigma_s
    sigma_t = sigma_a + sigma_s
    # heterogeneous density field (media/density.py; ours — the reference
    # medium is homogeneous). Supported by the free-flight family: the PBRT
    # cancellation carries over because sigma_a/sigma_s share the density.
    field = scene.medium.density
    # Heterogeneous media run in BOTH distance families (round 3; EA
    # previously raised): the equi-angular transform is pure geometry (its
    # pdf never references the medium), so only the Bernoulli(Tr), the
    # explicit T factor and sigma_s(xt) swap to the field forms.
    # sigma_score + field: the event log-densities swap the homogeneous
    # closed forms for the field's optical depth too
    cp = spec.continue_prob
    q = 1.0 - cp
    N = st.o.shape[0]
    kb = rng.fold(key, bounce)
    dtype = st.o.dtype

    # --- Russian roulette (before anything, incl. the primary bounce:
    # vptShadeMethods.h:1282)
    u_rr = rng.uniform(rng.fold(kb, rng.Tag.RR), (N,), dtype)
    alive = st.alive & (u_rr >= q)

    # --- intersect; on miss t -> "MAXFLOAT", Tr -> 0 (vptShadeMethods.h:1286-1288,
    # 1044-1048)
    hit, t, obj_id = geo.nearest_hit(st.o, st.d, scene)
    t_eff = jnp.where(hit, t, geo.BIG)
    if field is None:
        tr_actual = jnp.where(hit, jnp.exp(-sigma_t * t), 0.0)
    else:
        tr_actual = jnp.where(
            hit, jnp.exp(-den.optical_depth(field, sigma_t, st.o, st.d, t)),
            0.0)
    xs = st.o + t_eff[:, None] * st.d
    nrm = vm.normalize(xs - scene.center[obj_id], eps=1e-20)

    # --- light pick (uniform over emitters; or the fixed idsource of the
    # single-light variants, src/rt.cpp:361/472/603)
    u_pick = rng.uniform(rng.fold(kb, rng.Tag.LIGHT_PICK), (N,), dtype)
    if spec.fixed_light is not None:
        idsource = jnp.full((N,), spec.fixed_light, jnp.int32)
        prob_source, has_lights = 1.0, True
    else:
        idsource, prob_source, has_lights = pick_light(scene, u_pick)
    if not has_lights:
        alive = alive & False
    light_center = scene.center[idsource]                    # (N, 3)

    # --- distance sampling & surface/medium event
    u_dist = rng.uniform(rng.fold(kb, rng.Tag.DISTANCE), (N,), dtype)
    if spec.distance == FREE:
        if field is None:
            d_s = dist.free_flight_sample(sigma_t, u_dist)
            dist_pdf = dist.free_flight_pdf(sigma_t, d_s)
        else:
            # heterogeneous free flight: closed-form CDF inversion
            # (exp_height) or delta tracking (blobs); the pdf never appears
            # explicitly — every weight below is in PBRT-cancelled form
            d_s = den.sample_distance(field, sigma_t, st.o, st.d, u_dist,
                                      rng.fold(kb, rng.Tag.DELTA), t_eff)
            dist_pdf = None
        if spec.sigma_score:
            # geometry detached: the sigma-gradient of the sampling density
            # is carried by the score term instead of reparameterization
            d_s = jax.lax.stop_gradient(d_s)
        surface_event = (d_s > t_eff) & hit
        if field is not None:
            # heterogeneous media can ESCAPE (density decays to vacuum and
            # the flight never scatters, d_s == BIG): on a surface miss the
            # lane dies instead of scattering at a fictitious far point.
            # (A homogeneous free flight is always finite — the reference
            # scatters every missed ray, vptShadeMethods.h:1328.)
            alive = alive & ((d_s < 0.5 * geo.BIG) | surface_event)
        xt = st.o + d_s[:, None] * st.d
    else:
        if spec.clamped_ea:
            x0, D, th_a, th_b = dist.equi_angular_params(light_center, st.o, st.d, xs)
            sample_t = dist.equi_angular_sample(D, th_a, th_b, u_dist)
            xt = x0 + sample_t[:, None] * st.d
            # distance of xt from o along d (x0 = o + delta*d): consumed
            # by the heterogeneous T(o -> xt) below
            d_along = vm.dot(xt - st.o, st.d)
        else:
            d_along, D, th_a, th_b, sample_t = dist.equi_angular_params2(
                light_center, st.o, st.d, t_eff, u_dist
            )
            xt = st.o + d_along[:, None] * st.d
        dist_pdf = dist.equi_angular_pdf(D, th_a, th_b, sample_t)
        u_event = rng.uniform(rng.fold(kb, rng.Tag.EVENT), (N,), dtype)
        surface_event = (u_event <= tr_actual) & hit

    # pSuccess = dist_pdf * (1 - Tr) (vptShadeMethods.h:977, 1093)
    # outer floor: dist_pdf*(1-Tr) can underflow f32 when the medium is
    # thin along the ray (Tr ~ 1) and the EA pdf is tiny; the reciprocal
    # would make inf and a masked 0*inf NaN (kernels floor identically)
    pdf_success = (None if dist_pdf is None
                   else jnp.maximum(
                       dist_pdf * jnp.maximum(1.0 - tr_actual, 1e-20),
                       1e-30))

    # --- score accumulation (see sigma_score on IntegratorSpec) ----------
    if spec.sigma_score:
        t_det = jax.lax.stop_gradient(jnp.where(hit, t, 1.0))
        if spec.distance == FREE:
            if field is None:
                # joint density of the free-flight event:
                # sigma_t e^{-sigma_t d} (medium, hit or miss) /
                # e^{-sigma_t t} (reached the surface)
                s_add = jnp.where(
                    surface_event, -sigma_t * t_det,
                    jnp.log(sigma_t) - sigma_t * d_s)
            else:
                # heterogeneous: p(d) = sigma_t dens(x_d) e^{-tau(d)},
                # P(surf) = e^{-tau(t)} — the optical depth and the local
                # density carry the sigma AND field-param (k, blob weights,
                # grid voxels) dependence, so this one score term makes
                # every field parameter's event gradient unbiased under AD.
                # Escaped flights (d_s == BIG) die and contribute nothing
                # downstream, so their score term is exactly zero — and
                # the gated distance keeps the tau chain (and its VJP)
                # finite (0 * NaN poisons reverse mode otherwise)
                d_gate = jax.lax.stop_gradient(
                    jnp.where(d_s < 0.5 * geo.BIG, d_s, 0.0))
                tau_surf = den.optical_depth(field, sigma_t, st.o, st.d,
                                             t_det)
                tau_med = den.optical_depth(field, sigma_t, st.o, st.d,
                                            d_gate)
                if field.kind == den.GRID:
                    # the sampling pdf's density is the canonical pc
                    # model's own (den.grid_pc_density) — the trilinear
                    # point value would disagree with the law the distance
                    # was actually drawn from (round-4 tomography fix)
                    dens_med = jnp.maximum(
                        den.grid_pc_density(field, st.o, st.d, d_gate),
                        1e-30)
                else:
                    x_med = jax.lax.stop_gradient(
                        st.o + d_gate[:, None] * st.d)
                    dens_med = jnp.maximum(den.density(field, x_med),
                                           1e-30)
                s_add = jnp.where(
                    surface_event, -tau_surf,
                    jnp.log(sigma_t) + jnp.log(dens_med) - tau_med)
        else:
            # Bernoulli(TrActual) event; the EA distance pdf itself is
            # sigma-independent (vptSamplingFunctions.h:60-62)
            if field is None:
                log_tr = -sigma_t * t_det
            else:
                log_tr = -den.optical_depth(field, sigma_t, st.o, st.d,
                                            t_det)
            s_add = jnp.where(
                surface_event, log_tr,
                jnp.where(hit, jnp.log1p(-jnp.exp(log_tr)), 0.0))
        score = st.score + jnp.where(alive, s_add, 0.0)
        w_sc = (1.0 + score - jax.lax.stop_gradient(score))[:, None]
    else:
        score = st.score
        w_sc = 1.0

    # --- SURFACE branch ------------------------------------------------
    em_hit = surface_event & scene.is_emitter()[obj_id]
    depth_v = jnp.asarray(bounce) if depth is None else depth
    if spec.nee:
        credit = em_hit & (depth_v == 0)
    else:
        credit = em_hit
    # physical mode compensates the iteration's own RR survival (quirk 1 on
    # IntegratorSpec.physical); the reference credits without it
    credit_w = (1.0 / cp) if spec.physical else 1.0
    L = st.L + jnp.where(
        (alive & credit)[:, None], scene.radiance[obj_id] * st.tp, 0.0
    ) * (w_sc * credit_w)
    shade = alive & surface_event & ~em_hit

    if spec.nee:
        if spec.nee_all_lights:
            # volumetricPathTracer3alt: pLight for EVERY emitter, prob 1
            # (vptShadeMethods.h:285-395)
            ld_partial = jnp.zeros((N, 3), dtype)
            for e in scene.emitter_idx:
                ec = jnp.broadcast_to(scene.center[e], xs.shape)
                if field is None:
                    trs_e = med.transmittance(xs, ec, sigma_t)
                else:
                    trs_e = den.transmittance_between(field, sigma_t, xs, ec)
                ld_partial = ld_partial + nee_mod.plight(
                    scene, obj_id, xs, nrm, st.d,
                    scene.radiance[e], ec, scene.alpha[obj_id],
                ) * trs_e[:, None]
        else:
            if field is None:
                trs = med.transmittance(xs, light_center, sigma_t)
            else:
                trs = den.transmittance_between(field, sigma_t, xs,
                                                light_center)
            ld_partial = nee_mod.plight(
                scene, obj_id, xs, nrm, st.d,
                scene.radiance[idsource], light_center, scene.alpha[obj_id],
            ) * (trs / prob_source)[:, None]
        ld_mis = mis_mod.mis_v2(
            scene, obj_id, xs, nrm, st.d, scene.alpha[obj_id],
            rng.fold(kb, rng.Tag.MIS), sigma_t, field=field,
        )
        L = L + jnp.where(
            shade[:, None], (ld_partial + ld_mis) * st.tp * (1.0 / cp), 0.0
        ) * w_sc

    u_b1, u_b2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
    u_choice = rng.uniform(rng.fold(kb, rng.Tag.BSDF_CHOICE), (N,), dtype)
    fs, wi_s, pdf_b = bx.sample_bsdf(scene, obj_id, st.d, nrm, u_choice, u_b1, u_b2)
    cosine = vm.dot(nrm, wi_s)
    tp_surface = st.tp * fs * (cosine / (cp * jnp.maximum(pdf_b, 1e-20)))[:, None]

    # --- MEDIUM branch --------------------------------------------------
    medium = alive & ~surface_event
    # Tr(o -> xt) and sigma_s(xt): consumed by the EA family's explicit
    # weights (the free family uses the cancelled forms below). d_along can
    # be negative (the EA transform may sample behind the origin; the
    # reference attenuates over |d_along|) — the field optical depth is odd
    # in t, so |tau| is the segment's depth.
    if field is None:
        t_xt = med.transmittance(st.o, xt, sigma_t)
        sigma_s_x = sigma_s
    elif spec.distance != FREE:
        t_xt = jnp.exp(-jnp.abs(
            den.optical_depth(field, sigma_t, st.o, st.d, d_along)))
        sigma_s_x = sigma_s * den.density(field, xt)
    else:
        t_xt = None
        sigma_s_x = None
    u_c1, u_c2 = rng.uniform(rng.fold(kb, rng.Tag.NEE_CONE), (2, N), dtype)
    u_p1, u_p2 = rng.uniform(rng.fold(kb, rng.Tag.PHASE), (2, N), dtype)
    # HG anisotropy (Medium.g, 0 = the reference's isotropic medium): the
    # sampler importance-samples the phase exactly, so the continuation
    # weight phase/pdf stays 1 for any g; at g == 0 the draws reproduce the
    # isotropic sampler bit-for-bit (media/medium.phase_sample)
    g_hg = scene.medium.g
    wi_m, _ = med.phase_sample(st.d, g_hg, u_p1, u_p2)
    if spec.sigma_score:
        # LR (score-function) term for the phase draw, making dL/dg unbiased
        # the same way the distance terms make dL/dsigma unbiased: the
        # sampled direction is DETACHED (no reparameterized gradient through
        # the HG inversion) and log p(cos | g) joins the path's score. Added
        # AFTER this bounce's w_sc was formed — the phase draw only
        # influences FUTURE contributions. Exactly zero at g == 0.
        wi_m = jax.lax.stop_gradient(wi_m)
        cos_det = jax.lax.stop_gradient(vm.dot(st.d, wi_m))
        phase_s = jnp.log(jnp.maximum(
            med.hg_phase(cos_det, g_hg), 1e-30) * (4.0 * math.pi))
        score = score + jnp.where(medium, phase_s, 0.0)

    if spec.distance == FREE:
        albedo_ratio = sigma_s / sigma_t
        if spec.nee:
            # PBRT cancellation: only sigma_s/sigma_t survives
            # (vptShadeMethods.h:1330-1334)
            if spec.nee_all_lights:
                ld_med = jnp.zeros((N, 3), dtype)
                for j, e in enumerate(scene.emitter_idx):
                    ue1, ue2 = rng.uniform(
                        rng.fold(kb, rng.Tag.NEE_CONE, j + 1), (2, N), dtype)
                    ld_med = ld_med + nee_mod.free_single_scattering(
                        scene, xt, jnp.full((N,), e, jnp.int32), sigma_t,
                        1.0, ue1, ue2,
                        physical_point_nee=spec.physical_point_nee,
                        d_in=st.d, g=g_hg, field=field,
                    )
            else:
                ld_med = nee_mod.free_single_scattering(
                    scene, xt, idsource, sigma_t, prob_source, u_c1, u_c2,
                    physical_point_nee=spec.physical_point_nee,
                    d_in=st.d, g=g_hg, field=field,
                )
            L = L + jnp.where(
                medium[:, None], ld_med * st.tp * (albedo_ratio / cp), 0.0
            ) * w_sc
            tp_medium = st.tp * (albedo_ratio / cp)
        elif spec.physical:
            # textbook weight: the medium event IS d < t under the full
            # exponential, so sigma_s*T/ffProb cancels to sigma_s/sigma_t
            # (quirk 2 on IntegratorSpec.physical) — heterogeneous too:
            # sigma_a/sigma_s share the density field
            tp_medium = st.tp * (albedo_ratio / cp)
        else:
            # implicit free: sigma_s * T / (cp * ffProb * (1 - Tr))
            # (vptShadeMethods.h:977,1006)
            if field is None:
                w = sigma_s * t_xt / (cp * pdf_success)
            else:
                # same weight, PBRT-cancelled: the heterogeneous pdf
                # sigma_t(xt) Tr(xt) cancels sigma_s(xt) Tr(xt) to the
                # constant albedo ratio; the quirky (1 - Tr) division stays
                w = albedo_ratio / (cp * jnp.maximum(1.0 - tr_actual, 1e-20))
            tp_medium = st.tp * w[:, None]
    else:
        if spec.nee:
            # singleScattering already carries T * sigma_s (volumetric-
            # BasicFunctions.h:242); outer weight is 1/(pSuccess * cp)
            # (vptShadeMethods.h:1139-1146)
            if spec.nee_all_lights:
                ld_med = jnp.zeros((N, 3), dtype)
                for j, e in enumerate(scene.emitter_idx):
                    ue1, ue2 = rng.uniform(
                        rng.fold(kb, rng.Tag.NEE_CONE, j + 1), (2, N), dtype)
                    ld_med = ld_med + nee_mod.single_scattering(
                        scene, xt, jnp.full((N,), e, jnp.int32), sigma_t,
                        sigma_s_x, t_xt, 1.0, ue1, ue2,
                        physical_point_nee=spec.physical_point_nee,
                        d_in=st.d, g=g_hg, field=field,
                    )
            else:
                ld_med = nee_mod.single_scattering(
                    scene, xt, idsource, sigma_t, sigma_s_x, t_xt,
                    prob_source, u_c1, u_c2,
                    physical_point_nee=spec.physical_point_nee,
                    d_in=st.d, g=g_hg, field=field,
                )
            L = L + jnp.where(
                medium[:, None], ld_med * st.tp / (pdf_success * cp)[:, None], 0.0
            ) * w_sc
        w = sigma_s_x * t_xt / (cp * pdf_success)
        tp_medium = st.tp * w[:, None]

    # --- merge continuations ---------------------------------------------
    o_new = jnp.where(shade[:, None], xs, xt)
    d_new = jnp.where(shade[:, None], wi_s, wi_m)
    tp_new = jnp.where(shade[:, None], tp_surface, tp_medium)
    alive_new = shade | medium
    return PathState(
        o=jnp.where(alive_new[:, None], o_new, st.o),
        d=jnp.where(alive_new[:, None], d_new, st.d),
        tp=jnp.where(alive_new[:, None], tp_new, st.tp),
        L=L,
        alive=alive_new,
        score=score,
    )


def trace(scene: Scene, spec: IntegratorSpec, o, d, key,
          differentiable: bool = False) -> jnp.ndarray:
    """Trace a batch of rays to completion; returns radiance (N, 3).

    differentiable=True uses a fixed-length lax.scan (reverse-mode friendly);
    otherwise a lax.while_loop that stops as soon as every lane is dead.
    """
    st = init_state(o, d)
    # salt the trace stream so it can't collide with ray-gen draws that fold
    # small tags off the same key
    key = rng.fold(key, 0x74726163)
    if differentiable:
        # remat each bounce: storing every bounce's dozens of (N,·)
        # intermediates for the backward pass is HBM-bound; recomputing a
        # bounce from its 16-float/lane carry is far cheaper
        @jax.checkpoint
        def body(carry, bounce):
            return bounce_step(scene, spec, bounce, key, carry), None

        st, _ = jax.lax.scan(body, st, jnp.arange(spec.max_bounces))
        return st.L

    def cond(carry):
        bounce, st = carry
        return (bounce < spec.max_bounces) & jnp.any(st.alive)

    def body(carry):
        bounce, st = carry
        return bounce + 1, bounce_step(scene, spec, bounce, key, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.asarray(0), st))
    return st.L


def render_persistent(scene: Scene, spec: IntegratorSpec, camera, width, height,
                      pixel_ids, spp: int, key, jitter: bool = True,
                      differentiable: bool = False):
    """Persistent-wavefront renderer with path regeneration.

    One lane per pixel; when a lane's path terminates (RR kill, emitter hit,
    escape) it IMMEDIATELY starts that pixel's next camera sample, so lane
    utilization stays near 100% until the tail. The naive per-sample
    wavefront (`trace`) instead runs every lane for as many iterations as
    the LONGEST surviving path in the batch — with RR continue 0.6 over 64k
    lanes that's ~22+ iterations for an expected path length of ~2.0, a
    ~10x waste the reference's scalar loop (vptShadeMethods.h:1278) never
    pays because each CPU path stops exactly when it dies.

    differentiable=True runs a FIXED number of regeneration iterations under
    lax.scan with per-iteration remat (reverse-mode friendly): enough for
    spp geometric(1-cp) path lengths plus a 6-sigma tail, so the residual
    unfinished-sample mass is far below MC noise (same truncation class as
    max_bounces). Lane utilization stays ~spp*E[len]/K vs the per-sample
    scan's spp*max_bounces iterations.

    Returns summed radiance per lane, (N, 3) — divide by spp for the pixel
    estimate.
    """
    import math as _math

    from ..scene import camera as cam_mod

    N = pixel_ids.shape[0]
    key = rng.fold(key, 0x70657273)
    max_iters = spp * spec.max_bounces + 64

    def regen(st: PathState, depth, samples_done, it):
        """Start the next sample on lanes that are dead with work left."""
        need = (~st.alive) & (samples_done < spp)
        o, d = cam_mod.rays_for_pixels(
            camera, width, height, pixel_ids, rng.fold(key, 0x7265, it), jitter
        )
        st = PathState(
            o=jnp.where(need[:, None], o, st.o),
            d=jnp.where(need[:, None], d, st.d),
            tp=jnp.where(need[:, None], 1.0, st.tp),
            L=st.L,
            alive=st.alive | need,
            score=jnp.where(need, 0.0, st.score),
        )
        return st, jnp.where(need, 0, depth)

    def cond(carry):
        it, st, depth, samples_done = carry
        return (it < max_iters) & jnp.any(samples_done < spp)

    def body(carry):
        it, st, depth, samples_done = carry
        st, depth = regen(st, depth, samples_done, it)
        st2 = bounce_step(scene, spec, it, key, st, depth=depth)
        # per-path depth cap (the scan/while bound of `trace`, SURVEY §7
        # "fixed-bound masked loop")
        alive = st2.alive & (depth + 1 < spec.max_bounces)
        finished = st.alive & ~alive
        st2 = PathState(o=st2.o, d=st2.d, tp=st2.tp, L=st2.L, alive=alive,
                        score=st2.score)
        return (
            it + 1,
            st2,
            jnp.where(alive, depth + 1, depth),
            samples_done + finished.astype(samples_done.dtype),
        )

    if differentiable:
        cp = spec.continue_prob
        mean_len = 1.0 / max(1.0 - cp, 1e-3)
        sigma_len = _math.sqrt(spp * cp) / max(1.0 - cp, 1e-3)
        k_iters = min(int(_math.ceil(spp * mean_len + 6.0 * sigma_len + 8)),
                      max_iters)

        def scan_step(carry, it):
            st, depth, samples_done = carry
            _, st, depth, samples_done = body((it, st, depth, samples_done))
            return (st, depth, samples_done), None

        scan_step = jax.checkpoint(scan_step)
        init = (PathState(
            o=jnp.zeros((N, 3), scene.radius.dtype),
            d=jnp.zeros((N, 3), scene.radius.dtype).at[:, 2].set(1.0),
            tp=jnp.ones((N, 3), scene.radius.dtype),
            L=jnp.zeros((N, 3), scene.radius.dtype),
            alive=jnp.zeros((N,), bool),
            score=jnp.zeros((N,), scene.radius.dtype),
        ), jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32))
        (st, _, _), _ = jax.lax.scan(
            scan_step, init, jnp.arange(k_iters, dtype=jnp.int32))
        return st.L

    o0 = jnp.zeros((N, 3), scene.radius.dtype)
    st = PathState(
        o=o0, d=o0.at[:, 2].set(1.0), tp=jnp.ones_like(o0),
        L=jnp.zeros_like(o0),
        alive=jnp.zeros((N,), bool),   # all dead -> first regen starts sample 0
        score=jnp.zeros((N,), scene.radius.dtype),
    )
    init = (jnp.asarray(0), st, jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,), jnp.int32))
    _, st, _, _ = jax.lax.while_loop(cond, body, init)
    return st.L
