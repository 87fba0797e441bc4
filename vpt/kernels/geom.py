"""Geometric-gradient fused Pallas renderer: forward-mode dual numbers.

Completes the fast differentiable path over the BASELINE.json #5 parameter
set: kernels/diff.py covers the medium/material block {sigma_a, sigma_s,
albedo, radiance} with a reverse-mode replay kernel; THIS kernel covers the
geometric block — a sphere (light) CENTER, the CAMERA origin, fov, and look
direction — whose reverse-mode adjoint would have to re-derive every
intersection/normal/NEE chain.  Forward mode fits the shape of the problem:
K <= 10 directions (3 center + 3 camera origin + 1 fov + 3 look direction,
the full pose of src/rt.cpp:755-759), millions of pixels, so one dual pass
computes the image AND all K directional image-derivatives in a single
persistent-wavefront kernel sweep — no tape, no replay.

Estimator = the engine's detached-decision pathwise gradient
(integrators/engine.py, tests/test_grad.py): random uniforms and event masks
(hit/miss, surface-vs-medium, RR, light pick, lobe choice, visibility) are
detached; every smooth chain (camera ray, intersection t, normals, cone
directions/pdfs, transmittances, 1/d^2, BxDF values, equi-angular
reparameterization) propagates tangents — kernels/dual.py implements exactly
these conventions, so the tangents are forward-mode transposes of what
jax.grad computes through the engine.

The loop body mirrors kernels/diff.py's forward path draw-for-draw
(identical PCG streams), so the primal plane equals the fused forward
kernel's image at the same seed — tested in tests/test_geom_kernel.py.

KNOWN ESTIMATOR LIMITATION (shared with the engine's AD — both pass the
statistical cross-check in tests/test_geom_kernel.py): detaching event
masks drops the BOUNDARY terms of geometric derivatives — the sweep of
silhouettes, shadow edges, and the emitter's own visible disk across
pixels. Consequences, measured on the real chip (.scratch round-2 logs):
point-light-position recovery in the Cornell scene descends 8 units of
start offset to ~2.3 units of residual bias in ~40 adam steps (the smooth
NEE chains dominate but shadow boundaries shift the fixed point); a bare
emitter whose image is mostly
its own disk cannot be localized at all (the disk motion is 100% boundary
term — fit_geom actively DIVERGES there, 8 -> 17.7 units).

RESOLVED for training (round 2): dist/train_fast.make_fd_geom_train_step /
fit_geom_fd recover the boundary terms with common-random-number central
differences on this kernel's `primal_only=True` mode (theta traced from
SMEM, zero tangent planes). Seed-matched smooth noise cancels to O(h);
event flips between theta-h and theta+h ARE the boundary contribution.
Measured on chip (BASELINE.md "Boundary terms" table): point-light
residual 2.34 -> 0.196, area-light diverges -> 0.020, at ~2x the dual
step's speed. The dual tangents remain the right tool for smooth-chain
gradients (sigma/albedo-style, or jointly with kernels/diff.py); exact
single-sample boundary gradients (edge/silhouette sampling) remain out of
the reference's scope.

Reference: the geometry being differentiated is the hardcoded scene of
Sphere.cpp:7-23 and the camera of src/rt.cpp:755-759; the estimator is the
iterativeVPTracerFree family (vptShadeMethods.h:1263-1340) and the
equi-angular explicitVPTracerRecursive family (vptShadeMethods.h:1014-1149).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene
from . import dual as du
from .prims import (BIG, INV_4PI, LD_ALPHA, TWO_PI, Pcg,
                    ld_offsets, ld_strat, pcg_seed)
from .wavefront import _scene_consts

__all__ = ["make_geom_renderer", "pack_theta"]


def pack_theta(scene: Scene, camera, sphere: int | None):
    """Geometric + medium parameter pytree: the differentiated sphere's
    center, the full camera pose (origin, LOOK DIRECTION, fov scale), and
    the medium coefficients sigma_a/sigma_s (all always present — traced
    from SMEM so training never recompiles; dual tangents only for the
    enabled geometric blocks; sigma rides the primal for CRN-FD /
    re-render use). cam_dir follows the engine convention
    (scene/camera.py primary_rays): it enters the ray chain as stored —
    cy = normalize(cx x d), ray = normalize(cx sx + cy sy + d) — so its
    gradient is w.r.t. the raw stored vector, matching jax.grad through
    the engine."""
    center = (jnp.zeros(3, jnp.float32) if sphere is None
              else jnp.asarray(scene.center[sphere], jnp.float32))
    return {
        "center": center,
        "cam_origin": jnp.asarray(camera.origin, jnp.float32),
        "fov": jnp.asarray(camera.fov_scale, jnp.float32),
        "sigma_a": jnp.asarray(scene.medium.sigma_a, jnp.float32),
        "sigma_s": jnp.asarray(scene.medium.sigma_s, jnp.float32),
        "cam_dir": jnp.asarray(camera.direction, jnp.float32),
    }


def make_geom_renderer(scene: Scene, camera, width: int, height: int,
                       spp: int, *, sphere: int | None,
                       cam_grads: bool = True, dir_grads: bool = False,
                       nee: bool = True,
                       distance: str = "free",
                       continue_prob: float = 0.6, max_bounces: int = 32,
                       tile_rows: int = 8, jitter: bool = True,
                       sampler: str = "random",
                       primal_only: bool = False,
                       physical: bool = False,
                       interpret: bool = False):
    """Build render(theta, seed) -> (img (npix,3), tang (K, npix, 3)).

    theta = pack_theta(...)-shaped dict; `sphere` selects which sphere's
    center carries the 3 center tangent directions (None disables the
    block), cam_grads enables the 3+1 camera origin/fov directions, and
    dir_grads (round 4) the 3 look-direction tangents — full-pose K=10.
    tang[k] is the directional derivative d(img)/d(theta_k) for the basis
    order [center.xyz?, cam_origin.xyz?, fov?, cam_dir.xyz?].

    render.grad_render(theta, seed) is a custom-VJP image function: under
    jax.grad it contracts the tangent planes with the image cotangent and
    returns theta-shaped gradients (usable directly in a training loop).

    primal_only=True drops every tangent plane (K=0) but keeps theta
    traced from SMEM: a theta-parameterized FORWARD kernel at fused-kernel
    speed, re-render at any geometry without recompiling. This is the
    substrate for common-random-number finite differences
    (dist/train_fast.make_fd_geom_train_step), which capture the BOUNDARY
    terms (silhouettes, shadow edges, the emitter's own disk) that the
    detached dual estimator provably drops — see the module docstring's
    known-limitation note.
    """
    if (sphere is None and not cam_grads and not dir_grads
            and not primal_only):
        raise ValueError("no differentiated block enabled")
    if sampler not in ("random", "ld"):
        raise ValueError(f"unknown sampler {sampler!r}")
    sc = _scene_consts(scene)
    g_hg = sc["g"]      # HG anisotropy, baked (wavefront._baked_g snap)
    fc = sc["field"]        # heterogeneous density (None = homogeneous;
    # both distance families take fields — the EA transform is pure
    # geometry, only Tr/T/sigma_s(xt) swap to the dual field forms)
    if fc is not None and fc["kind"] == "grid" and not primal_only:
        raise NotImplementedError(
            "voxel-grid fields: the geometric DUAL planes would need dual "
            "trilinear gathers + a dual canonical march; grids run in the "
            "forward kernel (wavefront.py), the diff pair (diff.py), and "
            "THIS kernel's primal_only mode (round 4) — so geometry "
            "gradients in grid media use CRN finite differences "
            "(dist.train_fast.fit_geom_fd), the boundary-aware estimator "
            "recommended for geometry anyway, or the engine's AD")
    S = len(sc["r"])
    cp = float(continue_prob)
    q = 1.0 - cp
    R = tile_rows
    LANES = R * 128
    npix = width * height
    num_tiles = -(-npix // LANES)
    grid_mode = fc is not None and fc["kind"] == "grid"
    if grid_mode:
        from .wavefront import grid_table
        tab_host = grid_table(scene.medium.density.params)
    else:
        tab_host = None
    fc_base = fc

    n_center = 3 if sphere is not None and not primal_only else 0
    n_cam = 4 if cam_grads and not primal_only else 0
    n_dir = 3 if dir_grads and not primal_only else 0
    K = n_center + n_cam + n_dir
    k_cam = n_center
    k_dir = n_center + n_cam

    emitters = sc["emitters"]
    n_em = len(emitters)
    mis_lights = sc["mis_lights"]
    max_iters = spp * max_bounces + 64
    NPLANES = 3 * (1 + K)

    def basis(k):
        """Tangent seed tuple: 1.0 in direction k, structural zero elsewhere."""
        return tuple(1.0 if i == k else None for i in range(K))

    def kernel(theta_ref, seed_ref, base_ref, *refs):
        # grid mode: the packed voxel table rides as the first VMEM input
        # (wavefront.py pattern); inner closures resolve `fc` to this
        # kernel-local binding
        if grid_mode:
            tab_ref = refs[0]
            outs = refs[1:]
            fc = dict(fc_base, tab=tab_ref[...])
        else:
            outs = refs
            fc = fc_base
        # --- dual parameters from SMEM ---------------------------------
        pc = [theta_ref[i] for i in range(3)]
        co = [theta_ref[3 + i] for i in range(3)]
        fv = theta_ref[6]
        # medium coefficients: TRACED scalars (no tangent seeds — their
        # smooth chain rides the primal; CRN FD differentiates them, the
        # reverse diff kernel remains the pathwise/score alternative).
        # Traced => re-render/fit at any sigma without recompiling, and
        # joint {geometry, sigma} FD recovery runs on ONE kernel.
        sigma_t = theta_ref[7] + theta_ref[8]
        inv_st = 1.0 / sigma_t
        ar_cp = theta_ref[8] * inv_st * (1.0 / cp)
        ss = theta_ref[8]
        if sphere is not None:
            ctr_dual = (pc if primal_only
                        else [du.D(pc[i], basis(i)) for i in range(3)])
        if cam_grads and not primal_only:
            cam_o = [du.D(co[i], basis(k_cam + i)) for i in range(3)]
            fov = du.D(fv, basis(k_cam + 3))
        else:
            cam_o = co
            fov = fv
        # look direction: traced from SMEM (indices 9-11) so CRN-FD can
        # probe it; dual tangents only when dir_grads (round 4, K<=10)
        cd = [theta_ref[9 + i] for i in range(3)]
        if dir_grads and not primal_only:
            cam_d = [du.D(cd[i], basis(k_dir + i)) for i in range(3)]
        else:
            cam_d = cd
        ctr_tab = [ctr_dual if s_ == sphere else
                   [float(v) for v in sc["c"][s_]] for s_ in range(S)]

        # camera frame (src/rt.cpp:755-759): cx along +x scaled by fov,
        # cy = normalize(cx x d) * fov — the normalize cancels the scale
        # tangent, leaving cy's tangent = unit vector (exactly like the
        # engine's AD through scene/camera.py)
        cx = [fov * (width / height), 0.0, 0.0]
        cy_u = du.normalize3(du.cross3(cx, cam_d))
        cy = [cy_u[i] * fov for i in range(3)]

        pid = pl.program_id(0)
        base = base_ref[0] + pid * LANES
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        lane = base + row * 128 + col
        pixel = jnp.minimum(lane, npix - 1)
        px = (pixel % width).astype(jnp.float32)
        py = (height - 1 - pixel // width).astype(jnp.float32)
        z = jnp.zeros((R, 128), jnp.float32)

        if sampler == "ld":
            # shared LD machinery (prims.py). For the FD substrate
            # (primal_only) this also cuts the CRN secant's variance: the
            # strata are FIXED across the theta+-h probes, so the
            # first-segment sampling noise cancels even more exactly.
            A1, A2, A3, A4, A5 = LD_ALPHA
            off_u, off_v, off_w, off_r, off_p = ld_offsets(
                lane, seed_ref[0])
            _strat = ld_strat

        # --- dual <-> flat carry helpers -------------------------------
        def mats(x):
            v, t = du.val(x), du.tan(x)
            out = [v + z]
            for k in range(K):
                tk = None if t is None else t[k]
                out.append(z if tk is None else tk + z)
            return out

        def mat3(vec):
            return [a for c in range(3) for a in mats(vec[c])]

        def und(flat):
            return du.D(flat[0], tuple(flat[1:1 + K]))

        def und3(flat):
            return [und(flat[c * (1 + K):(c + 1) * (1 + K)]) for c in range(3)]

        def camera_ray(rng, samples):
            if sampler == "ld" and jitter:
                s_f = samples.astype(jnp.float32)
                u = _strat(A1, off_u, s_f)
                v = _strat(A2, off_v, s_f)
            elif jitter:
                u, v = rng(), rng()
            else:
                u = jnp.full((R, 128), 0.5, jnp.float32)
                v = jnp.full((R, 128), 0.5, jnp.float32)
            sx = (px + u - 0.5) / width - 0.5
            sy = (py + v - 0.5) / height - 0.5
            d = [cx[i] * sx + cy[i] * sy + cam_d[i] for i in range(3)]
            return du.normalize3(d)

        def light_attrs(u_pick):
            k = jnp.clip((u_pick * n_em).astype(jnp.int32), 0, n_em - 1)
            lc = [z, z, z]
            lrad = [z, z, z]
            lr = z
            lid = jnp.full((R, 128), -1, jnp.int32)
            for j, e in enumerate(emitters):
                m = k == j
                lc = du.sel3(m, ctr_tab[e], lc)
                lrad = du.sel3(m, [float(sc["rad"][e][i]) for i in range(3)],
                               lrad)
                lr = jnp.where(m, jnp.float32(sc["r"][e]), lr)
                lid = jnp.where(m, e, lid)
            return lc, lrad, lr, lid

        def plight_term(at, xs, n, d, lc, lrad):
            """Returns (term, dist) — callers reuse the xs->light distance
            (the light->x unit direction is reused as wi = -dl)."""
            vis, dist, dl = du.visibility_from(sc, ctr_tab, lc, xs)
            le_scale = du.where(vis,
                                1.0 / du.maximum(dist * dist, 1e-20), z)
            wi = [-dl[0], -dl[1], -dl[2]]
            fr = du.eval_fr_nee_plight(at, n, d, wi)
            cosw = du.dot3(n, wi)
            return [lrad[i] * (le_scale * fr[i] * cosw)
                    for i in range(3)], dist

        def mis_v2(rng, at, xs, n, d):
            acc = [z, z, z]
            wo = [-d[0], -d[1], -d[2]]
            for e in mis_lights:
                ec = ctr_tab[e]
                er = float(sc["r"][e])
                cxv = [ec[i] - xs[i] for i in range(3)]
                normcx = du.norm3(cxv)
                inv_ncx = 1.0 / normcx
                wc = du.scale3(cxv, inv_ncx)
                ratio = er * inv_ncx
                cos_max = du.sqrt(du.maximum(1.0 - ratio * ratio, 1e-12))
                wi = du.cone_dir(wc, cos_max, rng(), rng())
                hit, _, sid = du.nearest_id_t(sc, ctr_tab, xs, wi)
                visible = hit & (sid == e)
                fr = du.eval_fr_nee(at, n, d, wi)
                fpdf_inv = TWO_PI * du.maximum(1.0 - cos_max, 1e-12)
                if fc is None:
                    tr = du.exp(normcx * (-sigma_t))
                else:
                    # heterogeneous attenuation: the optical depth carries
                    # dual tangents (xs and the light both move with theta)
                    tr = du.exp(-du.field_tau(fc, sigma_t, xs, wc, normcx))
                w_vis = du.where(visible, tr * du.dot3(n, wi) * fpdf_inv, z)
                gpdf = du.bsdf_pdf_for_dir(at, n, wo, wi, rng())
                wf = du.power_h_invf(fpdf_inv, gpdf)
                for i in range(3):
                    acc[i] = acc[i] + float(sc["rad"][e][i]) * (
                        fr[i] * w_vis * wf)
            # BSDF strategy (misSamplingFunctions.h:132-167)
            u1, u2, u_choice = rng(), rng(), rng()
            wi_l = du.cosine_hemi(n, u1, u2)
            wt_, _ = du.refract_quirk(wo, n)
            fres = du.fresnel_die(du.dot3(n, wt_), du.dot3(n, wo))
            refl = u_choice < du.val(fres)
            ndotwo = du.dot3(n, wo)
            wr = du.normalize3([2.0 * ndotwo * n[i] - wo[i] for i in range(3)])
            wi_d = du.sel3(refl, wr, wt_)
            wh_loc = du.beckmann_wh(at["alpha"], u1, u2)
            wo_loc = du.to_local(n, wo)
            whw = 2.0 * du.dot3(wh_loc, wo_loc)
            wi_m_loc = du.normalize3([whw * wh_loc[i] - wo_loc[i]
                                      for i in range(3)])
            wi_m = du.normalize3(du.from_local(n, wi_m_loc))
            wi_sel = du.sel3(at["is_mic"], wi_m,
                             du.sel3(at["is_die"], wi_d, wi_l))
            hit, _, sid2 = du.nearest_id_t(sc, ctr_tab, xs, wi_sel)
            le = [z, z, z]
            hit_r = z
            hc = [z, z, z]
            for s_ in range(S):
                m = sid2 == s_
                le = du.sel3(m, [float(sc["rad"][s_][i]) for i in range(3)],
                             le)
                hit_r = jnp.where(m, jnp.float32(sc["r"][s_]), hit_r)
                hc = du.sel3(m, ctr_tab[s_], hc)
            cos_l = du.dot3(n, wi_l)
            gpdf_l = cos_l * (1.0 / math.pi)
            # cos_l/gpdf_l == pi (zero tangent) when gpdf_l != 0, else 0
            # (the 1e-12 guard): the ratio collapses to a gate on le*albedo
            nz_l = du.val(gpdf_l) != 0.0
            g_l = [du.where(nz_l, le[i] * at[("ar", "ag", "ab")[i]], z)
                   for i in range(3)]
            cos_d = du.absd(du.dot3(n, wi_d))
            scale_d = (1.0 / du.maximum(cos_d, 1e-12)) * jnp.where(
                refl, 1.0, du.GLASS_ETA_T * du.GLASS_ETA_T)
            g_d = [le[i] * scale_d for i in range(3)]
            gpdf_d = du.where(refl, fres, 1.0 - fres)
            fr_m = du.fr_microfacet(at, wi_m_loc, wh_loc, wo_loc)
            gpdf_m = du.ndf_beckmann(wh_loc[2], at["alpha"]) * wh_loc[2] / (
                4.0 * du.maximum(du.absd(du.dot3(wo_loc, wh_loc)), 1e-12))
            winv_m = wi_m_loc[2] / du.maximum(gpdf_m, 1e-20)
            g_m = [le[i] * (fr_m[i] * winv_m) for i in range(3)]
            g = du.sel3(at["is_mic"], g_m, du.sel3(at["is_die"], g_d, g_l))
            gpdf = du.where(at["is_mic"], gpdf_m,
                            du.where(at["is_die"], gpdf_d, gpdf_l))
            pos_all = ((du.val(g[0]) > 0.0) & (du.val(g[1]) > 0.0)
                       & (du.val(g[2]) > 0.0))
            gate = ((at["is_mic"] & (du.val(g[0]) > 0.0))
                    | (~at["is_mic"] & pos_all))
            hcx = [hc[i] - xs[i] for i in range(3)]
            n2 = du.maximum(du.dot3(hcx, hcx), 1e-20)
            cmax = du.sqrt(du.maximum(1.0 - hit_r * hit_r / n2, 1e-12))
            fpdf_h_inv = TWO_PI * du.maximum(1.0 - cmax, 1e-12)
            wg = du.where(gate & hit, du.power_h_invg(gpdf, fpdf_h_inv), z)
            return [acc[i] + g[i] * wg for i in range(3)]

        def medium_nee(rng, d, xt, lc, lrad, lr, lid):
            wc = [lc[i] - xt[i] for i in range(3)]
            inv_mag = du.rsqrt(du.maximum(du.dot3(wc, wc), 1e-20))
            wc_n = du.scale3(wc, inv_mag)
            ratio = lr * inv_mag
            cos_max = du.sqrt(du.maximum(1.0 - ratio * ratio, 1e-12))
            wl = du.cone_dir(wc_n, cos_max, rng(), rng())
            hit, t, sid = du.nearest_id_t(sc, ctr_tab, xt, wl)
            visible = hit & (sid == lid) & (lr > 0.0)
            if g_hg != 0.0:
                # HG phase toward the cone sample: BOTH the propagation
                # direction d and the light direction wl move with theta,
                # so the phase value carries dual tangents (du.hg_phase)
                phase_2pi = du.hg_phase(du.dot3(d, wl), g_hg) * TWO_PI
            else:
                phase_2pi = INV_4PI * TWO_PI    # folded const, as before
            if fc is None:
                tr_l = du.exp(t * (-sigma_t))
            else:
                tr_l = du.exp(-du.field_tau(fc, sigma_t, xt, wl, t))
            # phase / cone_pdf = phase * 2pi * (1 - cos_max): no dual div
            w = du.where(visible,
                         tr_l * phase_2pi
                         * du.maximum(1.0 - cos_max, 1e-12), z)
            return [lrad[i] * w for i in range(3)]

        # ------------- the persistent loop -----------------------------
        def loop_body(state):
            (o_f, d_f, tp_f, L_f, alive_i, depth, samples, it, rngs) = state
            o, d, tp = und3(o_f), und3(d_f), und3(tp_f)
            L = und3(L_f)
            alive = alive_i > 0
            rng = Pcg(rngs)
            need = (~alive) & (samples < spp)
            nd = camera_ray(rng, samples)
            one = 1.0 + z
            o = du.sel3(need, cam_o, o)
            d = du.sel3(need, nd, d)
            tp = du.sel3(need, [one, one, one], tp)
            alive = alive | need
            depth = jnp.where(need, 0, depth)
            was_alive = alive

            # ---- bounce (same draw order as kernels/diff.py) ----------
            u_rr = rng()
            u_pick = rng()
            u_dist = rng()
            if sampler == "ld":
                s_f = samples.astype(jnp.float32)
                d0 = depth == 0
                u_rr = jnp.where(d0, _strat(A4, off_r, s_f), u_rr)
                u_pick = jnp.where(d0, _strat(A5, off_p, s_f), u_pick)
                u_dist = jnp.where(d0, _strat(A3, off_w, s_f), u_dist)
            alive = alive & (u_rr >= q)
            hit, t, at = du.nearest(sc, ctr_tab, o, d)
            t_eff = du.where(hit, t, BIG + z)
            xs = [o[i] + t_eff * d[i] for i in range(3)]
            nrm = du.normalize3([xs[0] - at["cx"], xs[1] - at["cy"],
                                 xs[2] - at["cz"]])
            lc, lrad, lr, lid = light_attrs(u_pick)
            inv_ps = float(n_em)

            if distance == "free":
                if fc is None:
                    d_s = -jnp.log1p(-u_dist) * inv_st   # sigma-only: plain
                    surface = (t_eff < d_s) & hit
                else:
                    # heterogeneous free flight: exp_height's analytic
                    # inversion REPARAMETERIZES (d_s moves with the dual
                    # ray, as the engine's AD does); blobs' delta tracking
                    # is detached event logic (dual.field_sample_free)
                    d_s = du.field_sample_free(fc, sigma_t, o, d, u_dist,
                                               rng, t_eff)
                    surface = (t_eff < d_s) & hit
                    # escaped flights kill the lane (wavefront.py parity)
                    alive = alive & ((d_s < 0.5 * BIG) | surface)
                xt = [o[i] + d[i] * d_s for i in range(3)]
            else:
                # equiAngularParams2 + Bernoulli(TrActual): the distance
                # transform is pure geometry, so it REPARAMETERIZES — xt
                # moves with the light/camera exactly as in the engine
                # (volumetricBasicFunctions.h:209-223)
                lo_v = [lc[i] - o[i] for i in range(3)]
                delta = du.dot3(lo_v, d)
                Dq = du.sqrt(du.maximum(
                    du.dot3(lo_v, lo_v) - delta * delta, 1e-12))
                th_a = du.atan2_posx(-delta, Dq)
                th_b = du.atan2_posx(t_eff - delta, Dq)
                sample_t = du.clip(Dq * du.tan_sc(
                    th_a * (1.0 - u_dist) + th_b * u_dist), -BIG, BIG)
                d_along = sample_t + delta
                xt = [o[i] + d_along * d[i] for i in range(3)]
                dist_pdf = Dq / (du.maximum(du.absd(th_b - th_a), 1e-12)
                                 * (sample_t * sample_t + Dq * Dq))
                if fc is None:
                    tr_act = du.where(hit, du.exp(t * (-sigma_t)), z)
                    t_xt = du.exp(du.absd(d_along) * (-sigma_t))
                else:
                    # heterogeneous Bernoulli(Tr) + explicit T with dual
                    # optical depths (|tau| = the segment's depth even when
                    # the EA transform samples behind the origin)
                    t_det = du.where(hit, t, z)
                    tr_act = du.where(
                        hit,
                        du.exp(-du.field_tau(fc, sigma_t, o, d, t_det)), z)
                    t_xt = du.exp(-du.absd(
                        du.field_tau(fc, sigma_t, o, d, d_along)))
                u_ev = rng()
                surface = (tr_act >= u_ev) & hit
                one_m_tr = du.maximum(1.0 - tr_act, 1e-20)
                # floored like the forward kernel (f32 underflow -> 0*inf)
                pdf_success = du.maximum(dist_pdf * one_m_tr, 1e-30)
            medium = alive & ~surface
            shade_pre = alive & surface

            em_hit = surface & at["is_em"]
            credit = (alive & em_hit & (depth == 0) if nee
                      else alive & em_hit)
            radh = [at["rr"], at["rg"], at["rb"]]
            for i in range(3):
                add = radh[i] * tp[i]
                if physical:
                    # compensate the iteration's own RR survival
                    # (engine.IntegratorSpec.physical); reference: bare
                    add = add * (1.0 / cp)
                L[i] = L[i] + du.where(credit, add, z)
            shade = alive & surface & ~em_hit

            if nee:
                ldp, dist_ls = plight_term(at, xs, nrm, d, lc, lrad)
                if fc is None:
                    trs = du.exp(dist_ls * (-sigma_t))
                else:
                    inv_dl = 1.0 / du.maximum(dist_ls, 1e-20)
                    wlight = [(lc[i] - xs[i]) * inv_dl for i in range(3)]
                    trs = du.exp(-du.field_tau(fc, sigma_t, xs, wlight,
                                               dist_ls))
                ldm = mis_v2(rng, at, xs, nrm, d)
                for i in range(3):
                    L[i] = L[i] + du.where(
                        shade,
                        (ldp[i] * trs * inv_ps + ldm[i]) * tp[i] * (1.0 / cp),
                        z)

            fs, wi_s, pdf_b = du.sample_bsdf(rng, at, d, nrm)
            cosine = du.dot3(nrm, wi_s)
            wscale = cosine / (du.maximum(pdf_b, 1e-20) * cp)
            tp_surface = [tp[i] * fs[i] * wscale for i in range(3)]

            u_p1, u_p2 = rng(), rng()
            if g_hg != 0.0:
                # HG importance sampling (phase/pdf == 1): local angles
                # are detached uniforms, the frame rotates with d
                wi_m = du.hg_dir(d, g_hg, u_p1, u_p2)
            else:
                wi_m = du.uniform_sphere(u_p1, u_p2)  # plain: pure uniforms
            if distance == "free":
                med_scale = ar_cp                     # traced scalar
            else:
                med_scale = (t_xt / pdf_success) * (ss / cp)
                if fc is not None:
                    # sigma_s(xt) = sigma_s * dens(xt), dual through xt
                    med_scale = med_scale * du.field_density(fc, xt)
            if nee:
                ld_med = medium_nee(rng, d, xt, lc, lrad, lr, lid)
                for i in range(3):
                    L[i] = L[i] + du.where(
                        medium, ld_med[i] * inv_ps * tp[i] * med_scale, z)
            tp_medium = [tp[i] * med_scale for i in range(3)]

            o = du.sel3(shade, xs, du.sel3(medium, xt, o))
            d = du.sel3(shade, wi_s, du.sel3(medium, wi_m, d))
            tp = du.sel3(shade, tp_surface, du.sel3(medium, tp_medium, tp))
            alive2 = (shade | medium) & (depth + 1 < max_bounces)
            depth = jnp.where(alive2, depth + 1, depth)
            finished = was_alive & ~alive2
            samples = samples + finished.astype(jnp.int32)

            return (mat3(o), mat3(d), mat3(tp), mat3(L),
                    alive2.astype(jnp.int32), depth, samples, it + 1, rng.s)

        def loop_cond(state):
            samples, it = state[6], state[7]
            return (it < max_iters) & jnp.any(samples < spp)

        zf = [z] * (3 * (1 + K))
        d0 = list(zf)
        d0[2 * (1 + K)] = 1.0 + z      # d.z primal = 1 (unit init direction)
        state = (
            list(zf), d0, list(zf), list(zf),
            jnp.zeros((R, 128), jnp.int32),
            jnp.zeros((R, 128), jnp.int32),
            jnp.zeros((R, 128), jnp.int32),
            jnp.asarray(0, jnp.int32),
            pcg_seed(lane, seed_ref[0]),
        )
        state = jax.lax.while_loop(loop_cond, loop_body, state)
        L_f = state[3]
        for j in range(NPLANES):
            outs[j][:] = L_f[j]

    interp = pltpu.InterpretParams() if interpret else False

    tab_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if grid_mode
                 else [])
    tab_args = (tab_host,) if grid_mode else ()

    @jax.jit
    def run(theta_vec, seed):
        outs = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + tab_specs,
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(NPLANES)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles * R, 128), jnp.float32)
                for _ in range(NPLANES)
            ],
            interpret=interp,
        )(theta_vec, jnp.reshape(seed, (1,)).astype(jnp.int32),
          jnp.asarray([0], jnp.int32), *tab_args)
        flat = [o.reshape(-1)[:npix] * (1.0 / spp) for o in outs]
        img = jnp.stack([flat[c * (1 + K)] for c in range(3)], axis=-1)
        tang = jnp.stack([
            jnp.stack([flat[c * (1 + K) + 1 + k] for c in range(3)], axis=-1)
            for k in range(K)
        ]) if K else jnp.zeros((0, npix, 3), jnp.float32)
        return img, tang

    def _flatten(theta):
        return jnp.concatenate([
            jnp.reshape(theta["center"], (3,)).astype(jnp.float32),
            jnp.reshape(theta["cam_origin"], (3,)).astype(jnp.float32),
            jnp.reshape(theta["fov"], (1,)).astype(jnp.float32),
            jnp.reshape(theta["sigma_a"], (1,)).astype(jnp.float32),
            jnp.reshape(theta["sigma_s"], (1,)).astype(jnp.float32),
            jnp.reshape(theta["cam_dir"], (3,)).astype(jnp.float32),
        ])

    def render(theta, seed):
        return run(_flatten(theta), seed)

    # --- custom-VJP image function for reverse-mode training loops -----
    @jax.custom_vjp
    def grad_render(theta, seed):
        return run(_flatten(theta), seed)[0]

    def gr_fwd(theta, seed):
        img, tang = run(_flatten(theta), seed)
        return img, tang

    def gr_bwd(tang, gbar):
        # contract each tangent image with the cotangent: dL/dtheta_k
        g = jnp.tensordot(tang, gbar, axes=[[1, 2], [0, 1]])  # (K,)
        gc = g[:n_center] if n_center else jnp.zeros(0, jnp.float32)
        gcam = g[k_cam:k_cam + n_cam]
        gdir = g[k_dir:k_dir + n_dir]
        zero3 = jnp.zeros(3, jnp.float32)
        zero0 = jnp.zeros((), jnp.float32)
        theta_ct = {
            "center": gc if n_center else zero3,
            "cam_origin": gcam[:3] if cam_grads else zero3,
            "fov": gcam[3] if cam_grads else zero0,
            # no sigma duals: the pathwise sigma gradient lives in
            # kernels/diff.py; FD (train_fast) differentiates sigma here
            "sigma_a": zero0,
            "sigma_s": zero0,
            "cam_dir": gdir if dir_grads else zero3,
        }
        return theta_ct, np.zeros((), jax.dtypes.float0)

    grad_render.defvjp(gr_fwd, gr_bwd)

    def make_raw(n_tiles: int):
        """fn(theta_vec (12,), seed i32, base_pixel i32) -> (img_sums
        (n_tiles*LANES, 3), tang_sums (K, n_tiles*LANES, 3)). Per-lane
        radiance SUMS (divide by spp); lanes past npix render a clamped
        duplicate of the last pixel and must be masked by the caller.
        Per-lane PCG streams are keyed by GLOBAL lane id, so a sharded
        render reproduces the whole-frame draws exactly."""

        def raw(theta_vec, seed, base_pixel):
            outs = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
                + tab_specs,
                out_specs=[
                    pl.BlockSpec((R, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(NPLANES)
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_tiles * R, 128), jnp.float32)
                    for _ in range(NPLANES)
                ],
                interpret=interp,
            )(theta_vec, jnp.reshape(seed, (1,)).astype(jnp.int32),
              jnp.reshape(base_pixel, (1,)).astype(jnp.int32), *tab_args)
            flat = [o.reshape(-1) for o in outs]
            img = jnp.stack([flat[c * (1 + K)] for c in range(3)], axis=-1)
            tang = jnp.stack([
                jnp.stack([flat[c * (1 + K) + 1 + k] for c in range(3)],
                          axis=-1)
                for k in range(K)
            ]) if K else jnp.zeros((0, n_tiles * LANES, 3), jnp.float32)
            return img, tang

        return raw

    if not primal_only:
        render.grad_render = grad_render
    render.run_vec = run          # vec-level entry (12 floats): FD substrate
    render.flatten = _flatten
    render.make_raw = make_raw
    render.lanes_per_tile = LANES
    render.num_tiles = num_tiles
    render.K = K
    render.basis_names = (tuple(f"center.{a}" for a in "xyz")[:n_center]
                          + (("cam_origin.x", "cam_origin.y", "cam_origin.z",
                              "fov") if cam_grads else ())
                          + (("cam_dir.x", "cam_dir.y", "cam_dir.z")
                             if dir_grads else ()))
    render.npix = npix
    return render
