"""Faithful rebuilds of the legacy volume-integrator zoo.

Round 1 aliased these names onto the generic engine specs; their estimators
are observably different (VERDICT r1 §2.9). Each function here reproduces
its reference estimator's exact weights and quirks, cited per variant:

  vpt_minimal_implicit      volumetricPathTracer         src/rt.cpp:297-358
  explicit_single_light     volumetricPathTracerExplicit src/rt.cpp:361-468
  explicit_single_light2    volumetricPathTracerExplicit2 src/rt.cpp:603-740
  vpt3_all_lights           volumetricPathTracer3alt     vptShadeMethods.h:285-395
  vpt_recursive             volumetricPathTracerRecursive vptShadeMethods.h:662-812
  vpt_iterative             volumetricPathTracerIterative vptShadeMethods.h:500-659
  vpt3                      volumetricPathTracer3        vptShadeMethods.h:98-282

Shared legacy motifs (all differ from the active iterativeVPTracerFree):
  - a MISS is black: the path dies instead of scattering into the unbounded
    medium (rt.cpp:303, 382, 618; vptShadeMethods.h:301, 520, 670);
  - non-emitter surface hits KILL the path in the rt.cpp family (no surface
    shading at all: rt.cpp:336 "return Color()", :395, :669);
  - emitter tests use radiance.x > 0 only (rt.cpp:310, 377) — the rt.cpp
    family is blind to a hypothetical (0,g,b) light;
  - medium NEE handles POINT sources only; the spherical branch is an empty
    `else` ("ejecutar rutina de angulo solido", vptShadeMethods.h:257, 378,
    637) with STALE-accumulator fallthrough bugs reproduced below;
  - several variants weight the NEE term by 1/q on the Russian-roulette
    KILL branch and 1/continueprob on the continue branch (rt.cpp:716,
    vptShadeMethods.h:164, 271, 385) — the NEE term is counted ~twice in
    expectation; reproduced as-is.

Everything is a masked wavefront over flat lanes like integrators/engine.py
(one continuation per bounce), except vpt3, whose recursion is a BINARY tree
(a surface-bdsf child AND a medium child per bounce, vptShadeMethods.h:166,
273) and is evaluated by trace-time unrolling of the bounded recursion.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import vecmath as vm
from ..geometry import intersect as geo
from ..media import medium as med
from ..media import nee as nee_mod
from ..bxdf import dispatch as bx
from ..sampling import directional as ds
from ..sampling import distance as dist
from ..scene.scene import Scene

__all__ = ["LegacySpec", "LEGACY_INTEGRATORS", "trace_legacy"]

INV_4PI = med.INV_4PI


@dataclasses.dataclass(frozen=True)
class LegacySpec:
    name: str
    continue_prob: float = 0.6
    max_bounces: int = 32
    # single hardcoded NEE source of the rt.cpp Explicit family; default 7
    # mirrors the driver's commented single-source calls (src/rt.cpp:790)
    fixed_light: int = 7


def _point_visibility(scene: Scene, light, x):
    """Reference `visibility(light, x)`: cast FROM the light TOWARD x, true
    if the first hit is at/beyond x or nothing is hit
    (pathTracingUtilities.h:39-53)."""
    light = jnp.broadcast_to(light, x.shape)
    diff = x - light
    dist_lx = vm.norm(diff)
    d = diff / jnp.maximum(dist_lx, 1e-20)[..., None]
    hit, t, _ = geo.nearest_hit(light, d, scene)
    slack = 1024.0 * float(jnp.finfo(x.dtype).eps)
    return (t > dist_lx * (1.0 - slack)) | ~hit, dist_lx


def _cone_nee_single(scene: Scene, xt, e: int, u1, u2):
    """Cone sample toward sphere source e; id-match visibility
    (rt.cpp:417-447). Returns (Le_contrib_without_weights, cone_pdf):
    contrib = Le * phase * Tr(xt, light_center)."""
    center = jnp.broadcast_to(scene.center[e], xt.shape)
    wc = center - xt
    mag = vm.norm(wc)
    wc_n = wc / jnp.maximum(mag, 1e-20)[..., None]
    ratio = scene.radius[e] / jnp.maximum(mag, 1e-20)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
    wl = ds.cone(wc_n, cos_max, u1, u2)
    hit, _, hid = geo.nearest_hit(xt, wl, scene)
    vis = hit & (hid == e)
    tr = med.transmittance(xt, center, scene.medium.sigma_a
                           + scene.medium.sigma_s)
    le = scene.radiance[e] * (INV_4PI * tr)[..., None]
    return jnp.where(vis[..., None], le, 0.0), ds.cone_pdf(cos_max)


def _point_nee(scene: Scene, xt, idsource, sigma_t):
    """Point-light single scatter: Le/d^2 * phase * Tr(xt, light), the
    reference's probability-1 point routine (rt.cpp:699-712,
    vptShadeMethods.h:246-256). idsource may be per-lane."""
    center = scene.center[idsource]
    vis, dl = _point_visibility(scene, center, xt)
    inv_d2 = 1.0 / jnp.maximum(dl * dl, 1e-20)
    tr = med.transmittance(xt, jnp.broadcast_to(center, xt.shape), sigma_t)
    le = scene.radiance[idsource] * (inv_d2 * INV_4PI * tr)[..., None]
    is_point = scene.radius[idsource] == 0.0
    return jnp.where((vis & is_point)[..., None], le, 0.0)


def _plight_trs_sum(scene: Scene, obj_id, xs, n, d, sigma_t):
    """Sum of pLight * Trs over every POINT source — the surface NEE of the
    older equi-angular family (vptShadeMethods.h:585-591, 752-758)."""
    acc = jnp.zeros_like(xs)
    for e in scene.point_idx:        # every r==0 sphere, emitter or not
        lp = jnp.broadcast_to(scene.center[e], xs.shape)
        trs = med.transmittance(xs, lp, sigma_t)
        acc = acc + nee_mod.plight(
            scene, obj_id, xs, n, d, scene.radiance[e], lp,
            scene.alpha[obj_id]) * trs[..., None]
    return acc


def _pick(scene: Scene, u):
    count = len(scene.emitter_idx)
    k = jnp.clip((u * count).astype(jnp.int32), 0, count - 1)
    return jnp.asarray(scene.emitter_idx, jnp.int32)[k], 1.0 / count


# --------------------------------------------------------------------------
# wavefront variants: one continuation per bounce
# --------------------------------------------------------------------------

def _bounce(scene: Scene, spec: LegacySpec, bounce, key, st):
    """One masked bounce of the named legacy estimator. st is a dict."""
    name = spec.name
    sigma_a, sigma_s = scene.medium.sigma_a, scene.medium.sigma_s
    sigma_t = sigma_a + sigma_s
    cp = spec.continue_prob
    q = 1.0 - cp
    N = st["o"].shape[0]
    kb = rng.fold(key, bounce)
    dtype = st["o"].dtype
    o, d, tp, L, alive, depth = (st["o"], st["d"], st["tp"], st["L"],
                                 st["alive"], st["depth"])

    hit, t, obj_id = geo.nearest_hit(o, d, scene)
    alive = alive & hit                       # miss is black (all variants)
    xs = o + t[:, None] * d
    tr_t = jnp.exp(-sigma_t * t)
    em_x = scene.radiance[obj_id, 0] > 0.0    # the .x>0 emitter test

    u_rr = rng.uniform(rng.fold(kb, rng.Tag.RR), (N,), dtype)
    u_dist = rng.uniform(rng.fold(kb, rng.Tag.DISTANCE), (N,), dtype)
    u_c1, u_c2 = rng.uniform(rng.fold(kb, rng.Tag.NEE_CONE), (2, N), dtype)
    u_p1, u_p2 = rng.uniform(rng.fold(kb, rng.Tag.PHASE), (2, N), dtype)
    wi_phase, _ = med.isotropic_phase_sample(u_p1, u_p2)

    if name == "vpt_minimal_implicit":
        # rt.cpp:297-358: credit radiance*T at ANY depth, then depth cap 5,
        # non-emitter surface event is black, medium weight
        # (sigma_s/sigma_t)/pdfSuccess; NO russian roulette.
        credit = alive & em_x
        L = L + jnp.where(credit[:, None],
                          scene.radiance[obj_id] * tp * tr_t[:, None], 0.0)
        alive = alive & ~em_x & (depth < 5)          # rt.cpp:316
        d_s = dist.free_flight_sample(sigma_t, u_dist)
        medium = alive & (d_s < t)                   # d>=t -> black, :333
        xt = o + d_s[:, None] * d
        w = (sigma_s / sigma_t) / jnp.maximum(1.0 - tr_t, 1e-20)
        tp = jnp.where(medium[:, None], tp * w[:, None], tp)
        o2, d2, cont = xt, wi_phase, medium

    elif name == "explicit_single_light":
        # rt.cpp:361-468: depth-0 emitter credit * Tr, cone NEE toward ONE
        # source, binary pdf on both terms, NO russian roulette (the RR line
        # is commented out, rt.cpp:389).
        credit = alive & em_x & (depth == 0)
        L = L + jnp.where(credit[:, None],
                          scene.radiance[obj_id] * tp * tr_t[:, None], 0.0)
        alive = alive & ~em_x & (depth < 5)
        d_s = dist.free_flight_sample(sigma_t, u_dist)
        medium = alive & (d_s < t)
        xt = o + d_s[:, None] * d
        e = spec.fixed_light
        ld, cone_p = _cone_nee_single(scene, xt, e, u_c1, u_c2)
        t_xt = jnp.exp(-sigma_t * d_s)
        ffp = dist.free_flight_pdf(sigma_t, d_s)
        psucc = jnp.maximum(1.0 - tr_t, 1e-20)
        # Ld*sigma_s*T/(coneProb*ffProb*pSuccess)  (rt.cpp:441-447, 467)
        w_nee = sigma_s * t_xt / (cone_p * ffp * psucc)
        L = L + jnp.where(medium[:, None], ld * tp * w_nee[:, None], 0.0)
        tp = jnp.where(medium[:, None],
                       tp * ((sigma_s / sigma_t) / psucc)[:, None], tp)
        o2, d2, cont = xt, wi_phase, medium

    elif name == "explicit_single_light2":
        # rt.cpp:603-740: NO emitter credit, point NEE at probability 1,
        # free-flight pdf, late RR q=0.1 paying the NEE term 1/q on KILL and
        # 1/cp on continue (the double-count quirk, rt.cpp:716/736).
        d_s = dist.free_flight_sample(sigma_t, u_dist)
        medium = alive & (d_s < t)
        xt = o + d_s[:, None] * d
        t_xt = jnp.exp(-sigma_t * d_s)
        ffp = dist.free_flight_pdf(sigma_t, d_s)
        ld = _point_nee(scene, xt, jnp.full((N,), spec.fixed_light,
                                            jnp.int32), sigma_t)
        ld = ld * (t_xt * sigma_s / ffp)[:, None]    # Ld*T*sigma_s/pdf
        killed = u_rr < q
        w_rr = jnp.where(killed, 1.0 / q, 1.0 / cp)
        L = L + jnp.where(medium[:, None], ld * tp * w_rr[:, None], 0.0)
        cont = medium & ~killed
        tp = jnp.where(cont[:, None], tp * ((sigma_s / sigma_t) / cp), tp)
        o2, d2 = xt, wi_phase

    elif name == "vpt3_all_lights":
        # vptShadeMethods.h:285-395: cp=0.5, point NEE over ALL sources in
        # scene order with the STALE-Ld fallthrough (a spherical source
        # re-adds the previous point source's value, :357-380), late RR with
        # the 1/q kill weight (:385).
        d_s = dist.free_flight_sample(sigma_t, u_dist)
        medium = alive & (d_s < t)
        xt = o + d_s[:, None] * d
        t_xt = jnp.exp(-sigma_t * d_s)
        ffp = dist.free_flight_pdf(sigma_t, d_s)
        accum = jnp.zeros((N, 3), dtype)
        ld_stale = jnp.zeros((N, 3), dtype)
        for e in scene.emitter_idx:
            if e in scene.point_idx:
                ids = jnp.full((N,), e, jnp.int32)
                ld_stale = _point_nee(scene, xt, ids, sigma_t) \
                    * (t_xt * sigma_s)[:, None]
            # spherical source: empty else — ld_stale falls through
            accum = accum + ld_stale
        killed = u_rr < q
        w_rr = jnp.where(killed, 1.0 / q, 1.0 / cp)
        L = L + jnp.where(medium[:, None],
                          accum / ffp[:, None] * tp * w_rr[:, None], 0.0)
        cont = medium & ~killed
        tp = jnp.where(cont[:, None], tp * ((sigma_s / sigma_t) / cp), tp)
        o2, d2 = xt, wi_phase

    elif name == "explicit_single_light_ea":
        # rt.cpp:472-600: depth-0 emitter credit * Tr, RR q=0.1, CLAMPED
        # equi-angular distance toward the single source with NO
        # surface/medium Bernoulli — every surviving bounce scatters at
        # x_new = x0 + d*ray.d inside [o, x]; cone NEE toward the source;
        # both terms / (eaPdf * cp). No depth cap.
        credit = alive & em_x & (depth == 0)
        L = L + jnp.where(credit[:, None],
                          scene.radiance[obj_id] * tp * tr_t[:, None], 0.0)
        alive = alive & ~em_x & (u_rr >= q)
        e = spec.fixed_light
        center = jnp.broadcast_to(scene.center[e], o.shape)
        x0, D, th_a, th_b = dist.equi_angular_params(center, o, d, xs)
        sample_t = dist.equi_angular_sample(D, th_a, th_b, u_dist)
        xt = x0 + sample_t[:, None] * d
        ea_pdf = jnp.maximum(dist.equi_angular_pdf(D, th_a, th_b, sample_t),
                             1e-30)
        ld, cone_p = _cone_nee_single(scene, xt, e, u_c1, u_c2)
        t_xt = med.transmittance(o, xt, sigma_t)
        w_nee = sigma_s * t_xt / (cone_p * ea_pdf * cp)
        L = L + jnp.where(alive[:, None], ld * tp * w_nee[:, None], 0.0)
        tp = jnp.where(alive[:, None],
                       tp * (sigma_s * t_xt / (ea_pdf * cp))[:, None], tp)
        o2, d2, cont = xt, wi_phase, alive

    elif name in ("vpt_recursive", "vpt_iterative"):
        # vptShadeMethods.h:662-812 / 500-659: clamped equi-angular
        # sampling, Tr-Bernoulli event, point-only NEE, pLight*Trs surface
        # NEE over point sources, bdsf surface continuation, NO emitter
        # credit. vpt_recursive re-picks the NEE source in the medium branch
        # (:793) and uses exp(-sigma_t*hypot(D,d)) instead of the true
        # transmittance (:799); vpt_iterative additionally carries the
        # STALE Lo/Ld accumulators across bounces (declared outside the
        # stack loop, :501,506) and splits throughput into a color
        # pathThroughput and scalar factor, reproduced via st carries.
        rr_kill = u_rr < q
        alive = alive & ~rr_kill
        u_pick = rng.uniform(rng.fold(kb, rng.Tag.LIGHT_PICK), (N,), dtype)
        idsource, prob_source = _pick(scene, u_pick)
        light_center = scene.center[idsource]
        x0, D, th_a, th_b = dist.equi_angular_params(light_center, o, d, xs)
        sample_t = dist.equi_angular_sample(D, th_a, th_b, u_dist)
        xt = x0 + sample_t[:, None] * d
        ea_pdf = dist.equi_angular_pdf(D, th_a, th_b, sample_t)
        psucc = jnp.maximum(ea_pdf * jnp.maximum(1.0 - tr_t, 1e-20), 1e-30)
        u_ev = rng.uniform(rng.fold(kb, rng.Tag.EVENT), (N,), dtype)
        surf = u_ev <= tr_t
        nrm = vm.normalize(xs - scene.center[obj_id], eps=1e-20)

        ld_surf = _plight_trs_sum(scene, obj_id, xs, nrm, d, sigma_t)
        u_b1, u_b2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
        u_ch = rng.uniform(rng.fold(kb, rng.Tag.BSDF_CHOICE), (N,), dtype)
        fs, wi_s, pdf_b = bx.sample_bsdf(scene, obj_id, d, nrm, u_ch,
                                         u_b1, u_b2)
        cosine = vm.dot(nrm, wi_s)

        if name == "vpt_recursive":
            u_pick2 = rng.uniform(rng.fold(kb, rng.Tag.MIS_LIGHT),
                                  (N,), dtype)
            nee_src, _ = _pick(scene, u_pick2)
            center2 = scene.center[nee_src]
            vis, dl = _point_visibility(scene, center2, xt)
            inv_d2 = 1.0 / jnp.maximum(dl * dl, 1e-20)
            # the hypot(D, d) pseudo-transmittance quirk (:799)
            tr_q = jnp.exp(-sigma_t * jnp.sqrt(D * D + sample_t * sample_t))
            is_pt = scene.radius[nee_src] == 0.0
            t_xt = med.transmittance(o, xt, sigma_t)
            ls = scene.radiance[nee_src] * (inv_d2 * tr_q)[..., None]
            ld_med = jnp.where((vis & is_pt)[:, None], ls, 0.0) \
                * (t_xt * sigma_s * INV_4PI / prob_source)[:, None]
            s_on = alive & surf
            m_on = alive & ~surf
            L = L + jnp.where(s_on[:, None], ld_surf * tp / cp, 0.0)
            L = L + jnp.where(m_on[:, None],
                              ld_med * tp / (psucc * cp)[:, None], 0.0)
            tp_s = tp * fs * (cosine / (cp * jnp.maximum(pdf_b, 1e-20)))[:, None]
            t_fac = sigma_s * t_xt / (cp * psucc)
            tp = jnp.where(s_on[:, None], tp_s,
                           jnp.where(m_on[:, None], tp * t_fac[:, None], tp))
            o2 = jnp.where(surf[:, None], xs, xt)
            d2 = jnp.where(surf[:, None], wi_s, wi_phase)
            cont = alive
        else:  # vpt_iterative
            t_xt = med.transmittance(o, xt, sigma_t)
            ld_fresh = _point_nee(scene, xt, idsource, sigma_t) \
                * (t_xt * sigma_s / prob_source)[:, None]
            is_pt_vis = jnp.any(ld_fresh != 0.0, axis=-1)
            factor = st["factor"]
            s_on = alive & surf
            m_on = alive & ~surf
            # stale Lo: accumulate then REASSIGN the weighted value (:593)
            lo = st["Lo"] + jnp.where(s_on[:, None], ld_surf, 0.0)
            lo_weighted = tp * lo * (factor / cp)[:, None]
            L = L + jnp.where(s_on[:, None], lo_weighted, 0.0)
            lo = jnp.where(s_on[:, None], lo_weighted, lo)
            # stale Ld: fresh only when the picked source is a visible
            # point; weighted value persists (:637-648)
            ld = jnp.where(is_pt_vis[:, None], ld_fresh, st["Ld"])
            ld_weighted = tp * ld * (factor / (psucc * cp))[:, None]
            L = L + jnp.where(m_on[:, None], ld_weighted, 0.0)
            ld = jnp.where(m_on[:, None], ld_weighted, ld)
            st["Lo"], st["Ld"] = lo, ld
            fac_s = factor * cosine / jnp.maximum(pdf_b, 1e-20) / cp
            fac_m = factor * sigma_s * t_xt / cp / psucc
            st["factor"] = jnp.where(s_on, fac_s,
                                     jnp.where(m_on, fac_m, factor))
            tp = jnp.where(s_on[:, None], tp * fs, tp)
            o2 = jnp.where(surf[:, None], xs, xt)
            d2 = jnp.where(surf[:, None], wi_s, wi_phase)
            cont = alive
    else:
        raise ValueError(f"unknown legacy integrator {name!r}")

    cont = cont & (depth + 1 < spec.max_bounces)
    st = dict(st)
    st.update(
        o=jnp.where(cont[:, None], o2, o),
        d=jnp.where(cont[:, None], d2, d),
        tp=jnp.where(cont[:, None], tp, st["tp"]),
        L=L,
        alive=cont,
        depth=jnp.where(cont, depth + 1, depth),
    )
    return st


def trace_legacy(scene: Scene, spec: LegacySpec, o, d, key,
                 differentiable: bool = False):
    """Trace a flat ray batch with the named legacy estimator; (N, 3)."""
    N = o.shape[0]
    if spec.name == "vpt3":
        return _trace_vpt3(scene, spec, o, d, key)
    st = {
        "o": o, "d": d,
        "tp": jnp.ones_like(o),
        "L": jnp.zeros_like(o),
        "alive": o[..., 0] == o[..., 0],
        "depth": jnp.zeros((N,), jnp.int32),
        "factor": jnp.ones((N,), o.dtype),
        "Lo": jnp.zeros_like(o),
        "Ld": jnp.zeros_like(o),
    }
    key = rng.fold(key, 0x6c656761)

    if differentiable:
        def body(carry, bounce):
            return _bounce(scene, spec, bounce, key, carry), None

        st, _ = jax.lax.scan(body, st, jnp.arange(spec.max_bounces))
        return st["L"]

    def cond(carry):
        bounce, st = carry
        return (bounce < spec.max_bounces) & jnp.any(st["alive"])

    def body(carry):
        bounce, st = carry
        return bounce + 1, _bounce(scene, spec, bounce, key, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.asarray(0), st))
    return st["L"]


# --------------------------------------------------------------------------
# vpt3: binary-tree recursion, trace-time unrolled
# --------------------------------------------------------------------------

def _trace_vpt3(scene: Scene, spec: LegacySpec, o, d, key):
    """volumetricPathTracer3 (vptShadeMethods.h:98-282): per call
      Lo   = sum of pLight over POINT sources, WITHOUT Trs (:137);
      Lo2  = bdsf-sampled surface recursion * fs * cos / pdf (:166-169);
      Ld   = point-source-only medium NEE * T * sigma_s / prob (:246-256);
      Ls   = medium recursion, added BARE (the T*sigma_s `Lind` at :278 is
             computed and discarded — :281 adds plain Ls);
      returns (Lo+Lo2)*Tr1 + Ld/pdf)*(1/cp) + Ls, with depth>5 returning
      Lo*Tr1 (:161), first RR returning Lo*Tr1/q (:164) and second RR
      returning Ld/pdf/q (:271). Misses are black (:117). No emitter credit.

    The two recursive calls per bounce make a binary tree; bounded depth
    (cap 6 + RR) lets us unroll it at trace time: 2^7-1 masked bounce
    evaluations per lane.
    """
    sigma_a, sigma_s = scene.medium.sigma_a, scene.medium.sigma_s
    sigma_t = sigma_a + sigma_s
    cp = 0.9
    q = 1.0 - cp
    N = o.shape[0]
    key = rng.fold(key, 0x76707433)

    def eval_call(o, d, active, depth, path):
        """Returns the call's color for `active` lanes; `path` is the
        static tree-path tuple keying this node's RNG stream."""
        kb = rng.fold(key, *path)
        dtype = o.dtype
        hit, t, obj_id = geo.nearest_hit(o, d, scene)
        active = active & hit
        xs = o + t[:, None] * d
        nrm = vm.normalize(xs - scene.center[obj_id], eps=1e-20)
        tr1 = med.transmittance(o, xs, sigma_t)

        # Lo: point sources, pLight WITHOUT Trs (:133-139)
        lo = jnp.zeros((N, 3), dtype)
        for e in scene.point_idx:
            lp = jnp.broadcast_to(scene.center[e], xs.shape)
            lo = lo + nee_mod.plight(scene, obj_id, xs, nrm, d,
                                     scene.radiance[e], lp,
                                     scene.alpha[obj_id])

        u_b1, u_b2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
        u_ch = rng.uniform(rng.fold(kb, rng.Tag.BSDF_CHOICE), (N,), dtype)
        fs, wi_s, pdf_b = bx.sample_bsdf(scene, obj_id, d, nrm, u_ch,
                                         u_b1, u_b2)
        cosine = vm.dot(nrm, wi_s)

        # depth is a STATIC unrolling level: the cap (:161) closes the
        # recursion at depth 6 for every active lane, before the RR draw
        if depth > 5:
            return jnp.where(active[:, None], lo * tr1[:, None], 0.0)

        u_rr1 = rng.uniform(rng.fold(kb, rng.Tag.RR), (N,), dtype)
        rr1 = u_rr1 < q                          # :162-165
        live = active & ~rr1

        lo2 = eval_call(xs, wi_s, live, depth + 1, path + (1,))
        lo2 = fs * lo2 * (cosine / jnp.maximum(pdf_b, 1e-20))[:, None]

        u_pick = rng.uniform(rng.fold(kb, rng.Tag.LIGHT_PICK), (N,), dtype)
        idsource, prob_source = _pick(scene, u_pick)
        u_dist = rng.uniform(rng.fold(kb, rng.Tag.DISTANCE), (N,), dtype)
        d_s = dist.free_flight_sample(sigma_t, u_dist)
        medium = d_s < t
        xt = o + d_s[:, None] * d
        ffp = dist.free_flight_pdf(sigma_t, d_s)
        t_xt = med.transmittance(o, xt, sigma_t)
        ld = _point_nee(scene, xt, idsource, sigma_t) \
            * (t_xt * sigma_s / prob_source)[:, None]

        u_p1, u_p2 = rng.uniform(rng.fold(kb, rng.Tag.PHASE), (2, N), dtype)
        wi_new, _ = med.isotropic_phase_sample(u_p1, u_p2)
        u_rr2 = rng.uniform(rng.fold(kb, rng.Tag.EVENT), (N,), dtype)
        rr2 = u_rr2 < q                          # :269-272

        ls = eval_call(xt, wi_new, live & medium & ~rr2, depth + 1,
                       path + (2,))

        # assemble (:119, :161, :164, :219, :271, :281)
        surf_col = (lo + lo2) * (tr1 / cp)[:, None]          # d>=t (:219)
        med_col = ((lo + lo2) * tr1[:, None]
                   + ld / ffp[:, None]) / cp + ls            # :281
        med_rr = ld / (ffp * q)[:, None]                     # :271
        out = jnp.where(medium[:, None],
                        jnp.where(rr2[:, None], med_rr, med_col), surf_col)
        out = jnp.where(rr1[:, None], lo * tr1[:, None] / q, out)
        return jnp.where(active[:, None], out, 0.0)

    return eval_call(o, d, o[..., 0] == o[..., 0], 0, (0,))


LEGACY_INTEGRATORS: dict[str, LegacySpec] = {
    "vpt_minimal_implicit": LegacySpec("vpt_minimal_implicit",
                                       continue_prob=1.0, max_bounces=7),
    "explicit_single_light": LegacySpec("explicit_single_light",
                                        continue_prob=1.0, max_bounces=7),
    # the "luz puntual" variant needs a POINT source: index 8 is the
    # cornell scene's (6000,0,0) r==0 light (Sphere.cpp:19)
    "explicit_single_light2": LegacySpec("explicit_single_light2",
                                         continue_prob=0.9, fixed_light=8),
    "explicit_single_light_ea": LegacySpec("explicit_single_light_ea",
                                           continue_prob=0.9),
    "vpt3_all_lights": LegacySpec("vpt3_all_lights", continue_prob=0.5),
    "vpt_recursive": LegacySpec("vpt_recursive", continue_prob=0.6),
    "vpt_iterative": LegacySpec("vpt_iterative", continue_prob=0.6),
    "vpt3": LegacySpec("vpt3", continue_prob=0.9, max_bounces=7),
}
