"""Differentiable fused Pallas renderer: custom-VJP forward/backward pair.

Closes the forward/backward throughput gap of round 1 (fused fwd ~80M
paths/s vs XLA-engine fwd+bwd ~0.33M): both passes are persistent-wavefront
Pallas kernels sharing kernels/prims.py, and the backward is a SINGLE replay
of the forward paths (identical per-lane PCG streams) that hand-accumulates
parameter gradients in VMEM.

Differentiable parameters (the medium/material set of BASELINE.json #5 —
the reference's raison d'etre is sigma estimation, src/rt.cpp:794):

    params = {"sigma_a": (), "sigma_s": (), "albedo": (S,3), "radiance": (S,3)}

Geometry (centers/radii/camera) stays baked; full-parameter gradients use the
XLA engine (integrators/engine.py).

Heterogeneous media (Medium.density, ours — the reference medium is
homogeneous) are supported in the free-flight family with the field SHAPE
baked (exp_height / blobs params are python consts, like the forward
kernel) and sigma_a/sigma_s traced: because sigma_a/sigma_s share the
density, every transmittance is exp(-sigma_t * I) with the
sigma-independent optical path I = int density (prims.field_tau at
sigma_t=1), so the pathwise tr coefficients swap distance -> I and the
free-flight score becomes 1/sigma_t - I(d) (medium) / -I(t) (surface).
Distance draws replay exactly (analytic inversion consumes the same
uniform; delta tracking consumes the same PCG subsequence).

Gradient estimator (matches engine.IntegratorSpec(sigma_score=True)):
sampled distances/events are DETACHED and the sigma-dependence of the
sampling densities is captured by score-function terms; albedo/radiance and
the explicit sigma factors (transmittances, sigma_s/sigma_t) are pathwise.
For a path contributing c_k = tp_k * e_k at bounces k, three term families:

  1. emission terms: d(e_k)/dtheta weighted by wbar * tp_k  (immediate);
  2. log-throughput factors f_j (sigma_s/sigma_t medium factor, lambert
     albedo in fs): dlog(f_j)/dtheta weighted by wbar * (L_total - L_{j+1});
  3. score terms dlog p_j/d(sigma): free-flight medium 1/sigma_t - d,
     surface -t, weighted by wbar * (L_total - L_j).

L_total (the finished sample's radiance) is unknown mid-path, so deferred
terms accumulate coefficient pairs (A, B) with contribution A*L_total - B,
where A sums the coefficients and B sums coefficient * L_prefix; at path
DEATH L_total is the just-completed per-sample prefix, and the pair is
folded into the gradient and reset. This makes the backward ONE forward-cost
replay plus local derivative arithmetic — no stored tape, no second pass.

Correctness contracts (tests/test_diff_kernel.py):
  - albedo/radiance gradients are EXACT per-seed (no event depends on them):
    finite differences of the fwd kernel at fixed seed match the backward;
  - sigma gradients match finite differences of the seed-averaged loss and
    the XLA engine's sigma_score gradients statistically.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import LAMBERT, MICROFACET, Scene
from . import prims as pr
from .prims import BIG, INV_4PI
from .wavefront import _scene_consts, grid_table

__all__ = ["make_diff_renderer", "pack_params", "unpack_params"]


def pack_params(scene: Scene, with_g: bool = False,
                with_field: bool = False, with_grid: bool = False,
                with_blobs: bool = False):
    """Differentiable parameter pytree from a scene. with_g adds the HG
    anisotropy as a traced leaf (pair with make_diff_renderer(diff_g=True));
    with_field adds the exp_height fog falloff k as "fog_k" (pair with
    diff_field=True); with_grid adds the voxel values as "grid" (pair
    with diff_grid=True — the grid rides as a separate VMEM table, not in
    the packed SMEM vector). The leaf order keeps the first 2+6S packed
    indices stable."""
    p = {
        "sigma_a": jnp.asarray(scene.medium.sigma_a, jnp.float32),
        "sigma_s": jnp.asarray(scene.medium.sigma_s, jnp.float32),
        "albedo": jnp.asarray(scene.albedo, jnp.float32),
        "radiance": jnp.asarray(scene.radiance, jnp.float32),
    }
    if with_g:
        p["g"] = jnp.asarray(scene.medium.g, jnp.float32)
    if with_field:
        fld = scene.medium.density
        if fld is None or fld.kind != "exp_height":
            raise ValueError(
                "with_field=True needs an exp_height Medium.density")
        p["fog_k"] = jnp.asarray(fld.params[0], jnp.float32)
    if with_blobs:
        fld = scene.medium.density
        if fld is None or fld.kind != "blobs":
            raise ValueError("with_blobs=True needs a blobs "
                             "Medium.density")
        p["blobs"] = jnp.asarray(fld.params, jnp.float32)
    if with_grid:
        fld = scene.medium.density
        if fld is None or fld.kind != "grid":
            raise ValueError("with_grid=True needs a voxel-grid "
                             "Medium.density")
        p["grid"] = jnp.asarray(fld.params, jnp.float32)
    return p


def _flatten(params, S):
    parts = [
        jnp.reshape(params["sigma_a"], (1,)).astype(jnp.float32),
        jnp.reshape(params["sigma_s"], (1,)).astype(jnp.float32),
        jnp.reshape(params["albedo"], (3 * S,)).astype(jnp.float32),
        jnp.reshape(params["radiance"], (3 * S,)).astype(jnp.float32),
    ]
    if "g" in params:
        parts.append(jnp.reshape(params["g"], (1,)).astype(jnp.float32))
    if "fog_k" in params:
        parts.append(jnp.reshape(params["fog_k"], (1,)).astype(jnp.float32))
    if "blobs" in params:
        parts.append(jnp.reshape(params["blobs"], (-1,)).astype(jnp.float32))
    return jnp.concatenate(parts)


def unpack_params(vec, S, *, with_g=None, with_field=False,
                  n_blobs=0):
    """Packed gradient vector -> params pytree. with_g=None keeps the
    legacy inference (one extra slot = the traced-g layout) for callers
    that never trace field params. n_blobs > 0 unpacks a trailing
    (n_blobs, 5) "blobs" block."""
    p = {
        "sigma_a": vec[0],
        "sigma_s": vec[1],
        "albedo": vec[2:2 + 3 * S].reshape(S, 3),
        "radiance": vec[2 + 3 * S:2 + 6 * S].reshape(S, 3),
    }
    n_extra = vec.shape[0] - (2 + 6 * S)
    if with_g is None:
        with_g = (n_extra - (1 if with_field else 0) - 5 * n_blobs) >= 1
    idx = 2 + 6 * S
    if with_g:
        p["g"] = vec[idx]
        idx += 1
    if with_field:
        p["fog_k"] = vec[idx]
        idx += 1
    if n_blobs:
        p["blobs"] = vec[idx:idx + 5 * n_blobs].reshape(n_blobs, 5)
    return p


def make_diff_renderer(scene: Scene, camera, width: int, height: int,
                       spp: int, *, nee: bool = True,
                       distance: str = "free",
                       continue_prob: float = 0.6, max_bounces: int = 32,
                       tile_rows: int = 32, jitter: bool = True,
                       sampler: str = "random",
                       physical: bool = False,
                       diff_g: bool = False,
                       diff_field: bool = False,
                       diff_blobs: bool = False,
                       diff_grid: bool = False,
                       interpret: bool = False):
    """Build render(params, seed:int) -> (npix, 3), reverse-differentiable
    w.r.t. params (see module docstring).

    diff_g=True makes the HG anisotropy a TRACED differentiable scalar
    (params from pack_params(scene, with_g=True), packed index 2+6S): the
    scatter draw samples HG at the traced g (prims.hg_dir_traced, with the
    engine's isotropic snap at |g| <= 1e-3), the medium-NEE phase value is
    evaluated at the traced g, and dL/dg is the unbiased estimator of
    engine.IntegratorSpec(sigma_score=True): a pathwise term for the NEE
    phase VALUE plus the phase-draw score d/dg log p(cos|g) deferred
    against future contributions (prims.dlog_hg_dg). Training can then
    recover (sigma_a, sigma_s, g) jointly at kernel speed without
    recompiling per step.

    diff_field=True makes the exp_height fog falloff k a TRACED
    differentiable scalar (params from pack_params(scene, with_field=True),
    "fog_k", packed after g): every field evaluation reads k from SMEM, the
    pathwise transmittance terms gain d(tr)/dk = tr * (-sigma_t * dI/dk)
    (prims.field_tau_dk) and the free-flight event scores gain
    dlog p(d)/dk = -(y_d - y0) - sigma_t dI(d)/dk (medium) /
    -sigma_t dI(t)/dk (surface) — the fog shape is then recoverable from
    images at kernel speed (the engine covers it by AD/FD only).

    distance='free' is the reference's active iterativeVPTracerFree family;
    'equiangular' the explicitVPTracerRecursive family (vptShadeMethods.h:
    1014-1149) — its distance pdf is sigma-independent geometry, so the
    score terms reduce to the Bernoulli(Tr) event log-probs, while the
    explicit T and 1/pSuccess value factors contribute pathwise.

    sampler='ld': same first-5-dimension CP-rotated R5 stratification as
    kernels/wavefront.py. The shared body means the replay-backward
    regenerates the identical stratified draws, so gradients stay exact
    for the stratified estimator; stratified uniforms keep their marginal
    distribution, so every pdf/score formula is unchanged and the gradient
    estimator stays unbiased — with visibly less variance (BASELINE.md)."""
    if sampler not in ("random", "ld"):
        raise ValueError(f"unknown sampler {sampler!r}")
    sc = _scene_consts(scene)
    fc = sc["field"]        # heterogeneous density (None = homogeneous)
    grid_mode = fc is not None and fc["kind"] == "grid"
    if diff_grid:
        # voxel-value gradients: per-sample two-phase replay backward +
        # MXU one-hot scatter (prims.grid_scatter_point). Round 5: BOTH
        # distance families — free-flight scatters the pc event scores
        # (rho_pc + optical paths), equi-angular scatters the Bernoulli
        # (Tr) event scores plus the explicit T/pSuccess/dens(xt) value
        # chains (vptShadeMethods.h:1134-1146 in voxel-gradient form).
        if not grid_mode:
            raise ValueError(
                "diff_grid=True needs a voxel-grid Medium.density")
        if tile_rows != 8:
            raise ValueError(
                "diff_grid needs tile_rows=8 (the scatter one-hot is "
                "(R*128, 128) f32 in VMEM; R=8 keeps it at 512KB)")
    if diff_blobs and (fc is None or fc["kind"] != "blobs"):
        raise NotImplementedError(
            "diff_blobs traces the Gaussian-blob parameters; the scene "
            "needs Medium.density = blobs(...)")
    if diff_field and diff_blobs:
        raise ValueError("diff_field and diff_blobs are mutually "
                         "exclusive (one field kind per scene)")
    if not nee and not physical:
        raise NotImplementedError(
            "the differentiable pair implements the explicit (NEE) and "
            "physical estimators; the non-physical implicit_free (1-Tr) "
            "medium weight is forward-kernel/engine-only — build with "
            "physical=True or nee=True")
    if diff_field and (fc is None or fc["kind"] != "exp_height"):
        raise NotImplementedError(
            "diff_field traces the exp_height fog falloff k; the scene "
            "needs Medium.density = exp_height(...) (blob/grid field "
            "parameters stay baked — use the engine or FD training)")
    S = len(sc["r"])
    K_blob = len(fc["params"]) if (diff_blobs and fc is not None) else 0
    # traced FIELD-parameter slots, one generic mechanism (round 4):
    # diff_field -> 1 slot (exp_height fog_k); diff_blobs -> 5K slots
    # (per-blob cx, cy, cz, r, w). Each slot gets a pathwise-immediate
    # accumulator plus a deferred (A, B) event-score pair.
    n_fp = (1 if diff_field else 0) + 5 * K_blob
    P = 2 + 6 * S + (1 if diff_g else 0) + n_fp
    IG = 2 + 6 * S                      # packed index of g when diff_g
    IK = 2 + 6 * S + (1 if diff_g else 0)   # first field-param slot
    # HG anisotropy, baked const when diff_g=False (scene value frozen like
    # the forward kernel; the phase VALUE in medium NEE and the HG scatter
    # direction are theta-independent, so every gradient family in the
    # module docstring is unchanged in form). diff_g=True traces g instead
    # (see the docstring) and ignores this const.
    g_hg = sc["g"]
    cp = float(continue_prob)
    q = 1.0 - cp
    R = tile_rows
    LANES = R * 128
    npix = width * height
    num_tiles = -(-npix // LANES)

    cam_o = [float(v) for v in np.asarray(camera.origin, np.float64)]
    cam_d = [float(v) for v in np.asarray(camera.direction, np.float64)]
    fov = float(camera.fov_scale)
    cx_np = np.array([width * fov / height, 0.0, 0.0])
    cy_np = np.cross(cx_np, np.asarray(camera.direction, np.float64))
    cy_np = cy_np / np.linalg.norm(cy_np) * fov
    cx = [float(v) for v in cx_np]
    cy = [float(v) for v in cy_np]

    emitters = sc["emitters"]
    n_em = len(emitters)
    mis_lights = sc["mis_lights"]
    max_iters = spp * max_bounces + 64
    is_emitter = tuple(any(v > 0 for v in sc["rad"][s]) for s in range(S))
    # albedo-gradient sphere sets (static): lambert continuation/ MIS parts
    # need material 0; pLight's lambert fr also covers dielectric
    # (vptShadeMethods.h:83-87). Emitters are never shaded (shade excludes
    # em_hit) so their albedo gradient is structurally zero.
    alb_ids = tuple(s for s in range(S)
                    if sc["mat"][s] != MICROFACET and not is_emitter[s])
    lam_ids = tuple(s for s in range(S)
                    if sc["mat"][s] == LAMBERT and not is_emitter[s])

    def make_kernel(grads: bool):
        """One kernel body; grads=False -> forward image sums,
        grads=True -> replay + gradient vector. Identical RNG draws."""

        two_phase = grads and diff_grid

        def kernel(params_ref, seed_ref, base_ref, *outs):
            if grid_mode:
                tab_ref, outs = outs[0], outs[1:]
            if grads and diff_grid:
                (gbar_r, gbar_g, gbar_b, out_g, out_grid) = outs
            elif grads:
                (gbar_r, gbar_g, gbar_b, out_g) = outs
            else:
                (out_r, out_g_, out_b) = outs
            sa = params_ref[0]
            ss = params_ref[1]
            alb = tuple(tuple(params_ref[2 + 3 * s + c] for c in range(3))
                        for s in range(S))
            rad = tuple(tuple(params_ref[2 + 3 * S + 3 * s + c]
                              for c in range(3)) for s in range(S))
            gph = params_ref[IG] if diff_g else None
            if diff_field:
                # exp_height falloff k as a traced SMEM read: every field
                # helper below takes the same fc dict shape, so swapping
                # the baked python const for the traced scalar reuses the
                # exact forward formulas (prims.field_*)
                fck = dict(fc, params=(params_ref[IK], fc["params"][1]))
            elif diff_blobs:
                # every blob parameter as a traced SMEM read
                fck = dict(fc, params=tuple(
                    tuple(params_ref[IK + 5 * b + j] for j in range(5))
                    for b in range(K_blob)))
            elif grid_mode:
                # voxel grid: bind the loaded VMEM table (values baked as
                # an operand; sigma/albedo/radiance stay traced — the
                # sigma scores are unchanged in form because the pc
                # density is sigma-independent)
                fck = dict(fc, tab=tab_ref[...])
            else:
                fck = fc
            # generic traced-field-param derivative hooks: fp_dI(o,d,t)
            # -> n_fp arrays dI/dtheta of the optical path per unit
            # sigma; fp_dlogdens(x) -> n_fp arrays dlog density/dtheta
            if diff_field:
                def fp_dI(o_, d_, t_):
                    return [pr.field_tau_dk(fck, o_, d_, t_)]

                def fp_dlogdens(x_):
                    return [-(x_[1] - fc["params"][1])]
            elif diff_blobs:
                def fp_dI(o_, d_, t_):
                    _, dI = pr.field_blob_tau_grads(fck["params"], o_, d_,
                                                    t_)
                    return [v for tup in dI for v in tup]

                def fp_dlogdens(x_):
                    dens_, dd = pr.field_blob_dens_grads(fck["params"], x_)
                    inv = 1.0 / jnp.maximum(dens_, 1e-30)
                    return [v * inv for tup in dd for v in tup]
            sigma_t = sa + ss
            inv_st = 1.0 / sigma_t
            albedo_ratio = ss * inv_st
            ar_cp = albedo_ratio / cp

            pid = pl.program_id(0)
            base = base_ref[0] + pid * LANES
            row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            lane = base + row * 128 + col
            pixel = jnp.minimum(lane, npix - 1)
            px = (pixel % width).astype(jnp.float32)
            py = (height - 1 - pixel // width).astype(jnp.float32)
            z = jnp.zeros((R, 128), jnp.float32)

            if grads:
                # cotangent per lane: dLoss/d(pixel mean) / spp; padding
                # lanes (duplicated last pixel) must not double-count
                valid = lane < npix
                wt = [jnp.where(valid, gbar_r[:], 0.0) * (1.0 / spp),
                      jnp.where(valid, gbar_g[:], 0.0) * (1.0 / spp),
                      jnp.where(valid, gbar_b[:], 0.0) * (1.0 / spp)]

            if sampler == "ld":
                # shared LD machinery (prims.py); identical in the
                # grads=True replay
                A1, A2, A3, A4, A5 = pr.LD_ALPHA
                off_u, off_v, off_w, off_r, off_p = pr.ld_offsets(
                    lane, seed_ref[0])
                _strat = pr.ld_strat

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
                return pr.normalize3(d)

            def light_attrs(u_pick):
                k = jnp.clip((u_pick * n_em).astype(jnp.int32), 0, n_em - 1)
                lc = [z, z, z]
                lrad = [z, z, z]
                lr = z
                lid = jnp.full((R, 128), -1, jnp.int32)
                for j, e in enumerate(emitters):
                    m = k == j
                    lc = pr.sel3(m, [jnp.float32(sc["c"][e][i]) + z
                                     for i in range(3)], lc)
                    lrad = pr.sel3(m, [rad[e][i] + z for i in range(3)], lrad)
                    lr = jnp.where(m, jnp.float32(sc["r"][e]), lr)
                    lid = jnp.where(m, e, lid)
                return lc, lrad, lr, lid

            def plight_term(at, xs, n, d, lc, lrad):
                """pLight + partials: (ldp, coef=d/dlrad, lam=d/dalb, dist —
                callers reuse the xs->light distance for trs). The
                visibility cascade (incl. material-3 shells' multipleT
                fallback, a theta-independent baked factor) is shared with
                the forward kernel via prims.plight_le_scale."""
                le_scale, dist, dl = pr.plight_le_scale(sc, lc, xs)
                wi = [-dl[0], -dl[1], -dl[2]]
                fr = pr.eval_fr_nee_plight(at, n, d, wi)
                cosw = pr.dot3(n, wi)
                coef = [le_scale * fr[i] * cosw for i in range(3)]
                ldp = [lrad[i] * coef[i] for i in range(3)]
                if not grads:
                    return ldp, None, None, dist
                not_mic = ~at["is_mic"]
                lam = [jnp.where(not_mic,
                                 lrad[i] * le_scale * cosw * (1.0 / math.pi),
                                 0.0) for i in range(3)]
                return ldp, coef, lam, dist

            def mis_v2(rng, at, xs, n, d, wtp=None):
                """MISv2 + partials (see wavefront.mis_v2 for the algorithm;
                misSamplingFunctions.h:96-170). wtp (diff_grid): per-channel
                adjoint weights wt*tp/cp — the per-light scatter sums
                sum_i wtp[i]*term[i] land in misp["scat"] with each
                light-strategy shadow ray's geometry for the voxel-tau
                march scatter."""
                acc = [z, z, z]
                wo = [-d[0], -d[1], -d[2]]
                dsig = [z, z, z]
                drad = {}
                dalb = [z, z, z]
                # d/d(field param) of the light strategy, per slot
                dk = [[z, z, z] for _ in range(n_fp)]
                scat = []               # diff_grid: per-light (w, wc, dist)
                is_lam = (~at["is_mic"]) & (~at["is_die"])
                for e in mis_lights:
                    ec = sc["c"][e]; er = float(sc["r"][e])
                    cxv = [jnp.float32(ec[i]) - xs[i] for i in range(3)]
                    normcx = pr.norm3(cxv)
                    inv_ncx = 1.0 / normcx
                    wc = pr.scale3(cxv, inv_ncx)
                    ratio = er * inv_ncx
                    cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
                    wi = pr.cone_dir(wc, cos_max, rng(), rng())
                    hit, _, sid = pr.nearest_id_t(sc, xs, wi)
                    visible = hit & (sid == e)
                    fr = pr.eval_fr_nee(at, n, d, wi)
                    fpdf_inv = pr.TWO_PI * jnp.maximum(1.0 - cos_max, 1e-12)
                    # att = the optical path per unit sigma_t: the distance
                    # for a homogeneous medium, int density for a field —
                    # tr = exp(-sigma_t*att) and d(tr)/dsigma = -att*tr
                    if fc is None:
                        att = normcx
                    else:
                        att = pr.field_tau(fck, 1.0, xs, wc, normcx,
                                           nonneg=True)
                    tr = jnp.exp(-sigma_t * att)
                    w_vis = jnp.where(visible,
                                      tr * pr.dot3(n, wi) * fpdf_inv, 0.0)
                    gpdf = pr.bsdf_pdf_for_dir(at, n, wo, wi, rng())
                    wf = pr.power_h_invf(fpdf_inv, gpdf)
                    term = [rad[e][i] * fr[i] * w_vis * wf for i in range(3)]
                    for i in range(3):
                        acc[i] += term[i]
                    if grads:
                        for i in range(3):
                            dsig[i] += term[i] * (-att)
                            dalb[i] += jnp.where(
                                is_lam,
                                rad[e][i] * w_vis * wf * (1.0 / math.pi), 0.0)
                        drad[e] = [fr[i] * w_vis * wf for i in range(3)]
                        if diff_grid:
                            w_sc_e = (wtp[0] * term[0] + wtp[1] * term[1]
                                      + wtp[2] * term[2])
                            scat.append((w_sc_e, wc, normcx))
                        if n_fp:
                            # d(tr)/dtheta = tr * (-sigma_t * dI/dtheta)
                            dIs = fp_dI(xs, wc, normcx)
                            for f in range(n_fp):
                                for i in range(3):
                                    dk[f][i] += term[i] * (-sigma_t
                                                           * dIs[f])
                # BSDF strategy
                u1, u2, u_choice = rng(), rng(), rng()
                wi_l = pr.cosine_hemi(n, u1, u2)
                wt_, _ = pr.refract_quirk(wo, n)
                fres = pr.fresnel_die(pr.dot3(n, wt_), pr.dot3(n, wo))
                refl = u_choice < fres
                ndotwo = pr.dot3(n, wo)
                wr = pr.normalize3([2.0 * ndotwo * n[i] - wo[i]
                                    for i in range(3)])
                wi_d = pr.sel3(refl, wr, wt_)
                wh_loc = pr.beckmann_wh(at["alpha"], u1, u2)
                wo_loc = pr.to_local(n, wo)
                whw = 2.0 * pr.dot3(wh_loc, wo_loc)
                wi_m_loc = pr.normalize3([whw * wh_loc[i] - wo_loc[i]
                                          for i in range(3)])
                wi_m = pr.normalize3(pr.from_local(n, wi_m_loc))
                wi_sel = pr.sel3(at["is_mic"], wi_m,
                                 pr.sel3(at["is_die"], wi_d, wi_l))
                hit, _, sid2 = pr.nearest_id_t(sc, xs, wi_sel)
                le = [z, z, z]
                hit_r = z
                hc = [z, z, z]
                for s in range(S):
                    m = sid2 == s
                    le = pr.sel3(m, [rad[s][i] + z for i in range(3)], le)
                    hit_r = jnp.where(m, jnp.float32(sc["r"][s]), hit_r)
                    hc = pr.sel3(m, [jnp.float32(sc["c"][s][i]) + z
                                     for i in range(3)], hc)
                cos_l = pr.dot3(n, wi_l)
                gpdf_l = cos_l * pr.INV_PI
                # cos_l / gpdf_l == pi exactly when gpdf_l != 0, else the
                # 1e-12 guard made it 0 — so coef_l is just the gated albedo
                nz_l = gpdf_l != 0.0
                coef_l = [jnp.where(nz_l, (at["ar"], at["ag"], at["ab"])[i],
                                    0.0) for i in range(3)]
                g_l = [le[i] * coef_l[i] for i in range(3)]
                cos_d = jnp.abs(pr.dot3(n, wi_d))
                scale_d = jnp.where(refl, 1.0,
                                    pr.GLASS_ETA_T * pr.GLASS_ETA_T) \
                    / jnp.maximum(cos_d, 1e-12)
                g_d = [le[i] * scale_d for i in range(3)]
                gpdf_d = jnp.where(refl, fres, 1.0 - fres)
                fr_m = pr.fr_microfacet(at, wi_m_loc, wh_loc, wo_loc)
                gpdf_m = pr.ndf_beckmann(wh_loc[2], at["alpha"]) * wh_loc[2] / (
                    4.0 * jnp.maximum(jnp.abs(pr.dot3(wo_loc, wh_loc)), 1e-12))
                winv_m = wi_m_loc[2] / jnp.maximum(gpdf_m, 1e-20)
                coef_m = [fr_m[i] * winv_m for i in range(3)]
                g_m = [le[i] * coef_m[i] for i in range(3)]
                g = pr.sel3(at["is_mic"], g_m, pr.sel3(at["is_die"], g_d, g_l))
                gpdf = jnp.where(at["is_mic"], gpdf_m,
                                 jnp.where(at["is_die"], gpdf_d, gpdf_l))
                pos_all = (g[0] > 0.0) & (g[1] > 0.0) & (g[2] > 0.0)
                gate = (at["is_mic"] & (g[0] > 0.0)) | (~at["is_mic"] & pos_all)
                hcx = [hc[i] - xs[i] for i in range(3)]
                n2 = jnp.maximum(pr.dot3(hcx, hcx), 1e-20)
                cmax = jnp.sqrt(jnp.maximum(1.0 - hit_r * hit_r / n2, 1e-12))
                fpdf_h_inv = pr.TWO_PI * jnp.maximum(1.0 - cmax, 1e-12)
                wg = jnp.where(gate & hit, pr.power_h_invg(gpdf, fpdf_h_inv),
                               0.0)
                for i in range(3):
                    acc[i] += g[i] * wg
                if not grads:
                    return acc, None
                dle = [pr.sel3(at["is_mic"], coef_m,
                               pr.sel3(at["is_die"], [scale_d] * 3, coef_l))[i]
                       * wg for i in range(3)]
                for i in range(3):
                    dalb[i] += jnp.where(is_lam & nz_l, le[i] * wg, 0.0)
                return acc, {"dsig": dsig, "drad": drad, "dalb": dalb,
                             "dle": dle, "sid2": sid2, "dk": dk,
                             "scat": scat}

            def medium_nee(rng, d, xt, lc, lrad, lr, lid):
                wc = [lc[i] - xt[i] for i in range(3)]
                inv_mag = jax.lax.rsqrt(jnp.maximum(pr.dot3(wc, wc), 1e-20))
                wc_n = pr.scale3(wc, inv_mag)
                ratio = lr * inv_mag
                cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
                wl = pr.cone_dir(wc_n, cos_max, rng(), rng())
                hit, t, sid = pr.nearest_id_t(sc, xt, wl)
                visible = hit & (sid == lid) & (lr > 0.0)
                dlogp = None
                if diff_g:
                    # traced-g phase toward the cone sample + its pathwise
                    # dL/dg factor d/dg log phase (the phase value is the
                    # only g-dependence of this bounce's NEE contribution)
                    cos_nee = pr.dot3(d, wl)
                    phase = pr.hg_phase_const(cos_nee, gph)
                    if grads:
                        dlogp = pr.dlog_hg_dg(cos_nee, gph)
                elif g_hg != 0.0:
                    # HG phase toward the cone sample (theta-independent:
                    # it rides inside w, so the radiance gradient and the
                    # sigma score/value chains stay correct unmodified)
                    phase = pr.hg_phase_const(pr.dot3(d, wl), g_hg)
                else:
                    phase = INV_4PI
                # att: optical path per unit sigma_t toward the light (the
                # plain distance when homogeneous) — callers use -att as
                # the d/dsigma coefficient of this transmittance; the
                # field-param derivatives fp_dI(xt, wl, t) are computed
                # by the caller (it has the returned wl/t)
                if fc is None:
                    att = t
                else:
                    att = pr.field_tau(fck, 1.0, xt, wl, t, nonneg=True)
                # phase / cone_pdf = phase * 2pi * (1 - cos_max): no div
                w = jnp.where(visible,
                              jnp.exp(-sigma_t * att) * (phase * pr.TWO_PI)
                              * jnp.maximum(1.0 - cos_max, 1e-12), 0.0)
                return ([lrad[i] * w for i in range(3)], w, att, dlogp,
                        wl, t)

            # ------------- the persistent loop ---------------------------
            def loop_body(state):
                (o, d, tp, L, Lps, alive_i, depth, samples, it, rngs,
                 acc) = state
                alive = alive_i > 0
                need = (~alive) & (samples < spp)
                if two_phase:
                    # per-sample two-phase replay: phase A (gphase==0)
                    # renders the sample to learn its weighted total
                    # radiance wLtot; phase B restores the SAME PCG state
                    # and replays the identical path, accumulating every
                    # gradient family (incl. the voxel scatters, which
                    # need wLtot) — adjoints are phase-masked via wt_l
                    phB = acc["phase"] > 0
                    rngs = jnp.where(need & phB, acc["rng_save"], rngs)
                    acc["rng_save"] = jnp.where(need & ~phB, rngs,
                                                acc["rng_save"])
                    wt_l = [jnp.where(phB, wt[i], 0.0) for i in range(3)]
                elif grads:
                    wt_l = wt
                rng = pr.Pcg(rngs)
                nd = camera_ray(rng, samples)
                one = 1.0 + z
                o = pr.sel3(need, [jnp.float32(cam_o[i]) + z
                                   for i in range(3)], o)
                d = pr.sel3(need, nd, d)
                tp = pr.sel3(need, [one, one, one], tp)
                alive = alive | need
                depth = jnp.where(need, 0, depth)
                was_alive = alive

                # ---- bounce (same draw order as the forward kernel) -----
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
                hit, t, at = pr.nearest(sc, o, d, alb, rad)
                t_eff = jnp.where(hit, t, BIG)
                xs = [o[i] + t_eff * d[i] for i in range(3)]
                nrm = pr.normalize3([xs[0] - at["cx"], xs[1] - at["cy"],
                                     xs[2] - at["cz"]])
                lc, lrad, lr, lid = light_attrs(u_pick)
                inv_ps = float(n_em)   # 1/prob_source
                inv_cp = 1.0 / cp  # python const: fold the cp divisions

                if distance == "free":
                    if fc is None:
                        d_s = -jnp.log1p(-u_dist) * inv_st
                        surface = (d_s > t_eff) & hit
                    elif grid_mode:
                        # voxel grid (same uniform as the forward kernel):
                        # ONE canonical march yields d_s AND tau(t_eff);
                        # the score optical paths come free — I(d_s) ==
                        # tau*/sigma_t EXACTLY (the march inverts the same
                        # pc tau), I(t_eff) == tau_cap/sigma_t
                        d_s, tau_cap = pr.grid_sample_free_and_tau(
                            fck, sigma_t, o, d, u_dist, t_eff)
                        surface = (d_s > t_eff) & hit
                        alive = alive & ((d_s < 0.5 * BIG) | surface)
                    else:
                        # heterogeneous free flight (same draws as the
                        # forward kernel): analytic CDF inversion
                        # (exp_height) or in-kernel delta tracking (blobs —
                        # consumes the same PCG draws in fwd and replay)
                        d_s = pr.field_sample_free(fck, sigma_t, o, d,
                                                   u_dist, rng, t_eff)
                        surface = (d_s > t_eff) & hit
                        # flights that ESCAPE to vacuum kill the lane
                        # (wavefront.py engine parity); an escaped event's
                        # score would weight exactly zero future
                        # contribution, so no score term is needed
                        alive = alive & ((d_s < 0.5 * BIG) | surface)
                    xt = [o[i] + d_s * d[i] for i in range(3)]
                else:
                    # equiAngularParams2 + Bernoulli(TrActual)
                    # (volumetricBasicFunctions.h:209-223,
                    # vptShadeMethods.h:1093-1096)
                    lo_v = [lc[i] - o[i] for i in range(3)]
                    delta = pr.dot3(lo_v, d)
                    Dq = jnp.sqrt(jnp.maximum(
                        pr.dot3(lo_v, lo_v) - delta * delta, 1e-12))
                    th_a = pr.atan2_posx(-delta, Dq)
                    th_b = pr.atan2_posx(t_eff - delta, Dq)
                    sample_t = jnp.clip(Dq * pr.tan_sc(
                        (1.0 - u_dist) * th_a + u_dist * th_b), -BIG, BIG)
                    d_along = sample_t + delta
                    xt = [o[i] + d_along * d[i] for i in range(3)]
                    dist_pdf = Dq / (jnp.maximum(jnp.abs(th_b - th_a), 1e-12)
                                     * (sample_t * sample_t + Dq * Dq))
                    if fc is None:
                        # att_* = optical path per unit sigma (homogeneous:
                        # plain distances) — shared by the weights here and
                        # the sigma scores/med_dsig below
                        att_t = jnp.where(hit, t, 0.0)
                        att_along = jnp.abs(d_along)
                    else:
                        t_det0 = jnp.where(hit, t, 0.0)
                        att_t = pr.field_tau(fck, 1.0, o, d, t_det0,
                                             nonneg=True)
                        I_along = pr.field_tau(fck, 1.0, o, d, d_along)
                        att_along = jnp.abs(I_along)
                        sign_I = jnp.where(I_along >= 0.0, 1.0, -1.0)
                    tr_act = jnp.where(hit, jnp.exp(-sigma_t * att_t), 0.0)
                    u_ev = rng()
                    surface = (u_ev <= tr_act) & hit
                    one_m_tr = jnp.maximum(1.0 - tr_act, 1e-20)
                    # floored like the forward kernel (f32 underflow of
                    # dist_pdf*(1-Tr) -> 1/0 -> masked 0*inf NaN)
                    pdf_success = jnp.maximum(dist_pdf * one_m_tr, 1e-30)
                    t_xt = jnp.exp(-sigma_t * att_along)
                medium = alive & ~surface
                shade_pre = alive & surface

                if grads:
                    # score (family 3) vs L-prefix BEFORE this bounce
                    if distance == "free":
                        if fc is None:
                            # density: sigma_t e^{-sigma_t d} / e^{-sigma_t t}
                            k_sc = jnp.where(
                                shade_pre, -t_eff,
                                jnp.where(medium, inv_st - d_s, 0.0))
                        elif grid_mode:
                            # p(d) = sigma_t rho_pc(d) e^{-sigma_t I(d)}:
                            # rho_pc is sigma-independent, so dlog/dsigma =
                            # 1/sigma_t - I(d) | -I(t) with both optical
                            # paths already in hand from the sampling march
                            I_surf = tau_cap * inv_st
                            I_med = -jnp.log1p(-u_dist) * inv_st
                            k_sc = jnp.where(
                                shade_pre, -I_surf,
                                jnp.where(medium, inv_st - I_med, 0.0))
                        else:
                            # p(d) = sigma_t*dens(x_d)*e^{-sigma_t I(d)},
                            # P(surf) = e^{-sigma_t I(t)} with I = int dens:
                            # dlog/dsigma = 1/sigma_t - I(d) | -I(t). dens
                            # itself is sigma-independent. Gated distances
                            # keep the tau chains finite (d_s==BIG escapes)
                            t_det = jnp.where(shade_pre, t_eff, 0.0)
                            d_det = jnp.where(medium, d_s, 0.0)
                            I_surf = pr.field_tau(fck, 1.0, o, d, t_det)
                            I_med = pr.field_tau(fck, 1.0, o, d, d_det)
                            k_sc = jnp.where(
                                shade_pre, -I_surf,
                                jnp.where(medium, inv_st - I_med, 0.0))
                    else:
                        # Bernoulli(Tr): surface log Tr = -sigma_t*att_t;
                        # medium log(1 - Tr); pdf itself sigma-independent
                        # (att_t generalizes t to the field optical path)
                        k_med = att_t * tr_act / one_m_tr
                        k_sc = jnp.where(shade_pre, -att_t,
                                         jnp.where(medium & hit, k_med, 0.0))
                    wL0 = wt_l[0] * Lps[0] + wt_l[1] * Lps[1] + wt_l[2] * Lps[2]
                    acc["A_st"] += k_sc
                    acc["B_st"] += k_sc * wL0
                    if diff_grid and distance == "free":
                        # voxel event scores, IMMEDIATE (phase B knows the
                        # sample's wLtot): dlog P(surf)/dv = -sigma dI(t)/dv;
                        # dlog p(d)/dv = dlog rho_pc(d)/dv - sigma dI(d)/dv.
                        # wt_l is zero in phase A, but wLtot is stale there
                        # too — gate explicitly on phB.
                        w_sc = jnp.where(phB & (shade_pre | medium),
                                         acc["wLtot"] - wL0, 0.0)
                        t_detg = jnp.where(shade_pre, t_eff, 0.0)
                        d_detg = jnp.where(medium & (d_s < 0.5 * BIG),
                                           d_s, 0.0)
                        acc["g_grid"] = pr.grid_march_scatter(
                            fck, o, d,
                            jnp.where(shade_pre, -sigma_t * w_sc, 0.0),
                            t_detg,
                            jnp.where(medium, -sigma_t * w_sc, 0.0),
                            d_detg, acc["g_grid"])
                        x_pc, rho_pc = pr.grid_pc_point(fck, o, d, d_detg)
                        acc["g_grid"] = pr.grid_scatter_point(
                            fck, x_pc,
                            jnp.where(medium,
                                      w_sc / jnp.maximum(rho_pc, 1e-30),
                                      0.0),
                            acc["g_grid"])
                    elif diff_grid:
                        # EA Bernoulli(Tr) event scores (round 5): the EA
                        # distance pdf is pure geometry, so the only event
                        # log-density voxel terms are dlog Tr/dv =
                        # -sigma dI(t)/dv (surface) and dlog(1-Tr)/dv =
                        # +sigma dI(t)/dv Tr/(1-Tr) (medium). One march.
                        w_sc = jnp.where(phB & (shade_pre | medium),
                                         acc["wLtot"] - wL0, 0.0)
                        w_ev = jnp.where(
                            shade_pre, -sigma_t * w_sc,
                            jnp.where(medium & hit,
                                      sigma_t * w_sc * tr_act / one_m_tr,
                                      0.0))
                        acc["g_grid"] = pr.grid_march_scatter(
                            fck, o, d, w_ev, t_det0, z, z, acc["g_grid"])
                    if n_fp and distance == "free":
                        # field-param event scores: dlog p(d)/dtheta =
                        # dlog dens(x_d)/dtheta - sigma dI(d)/dtheta
                        # (medium) / dlog P(surf)/dtheta = -sigma
                        # dI(t)/dtheta (surface)
                        dI_s = fp_dI(o, d, t_det)
                        dI_m = fp_dI(o, d, d_det)
                        x_det = [o[j] + d_det * d[j] for j in range(3)]
                        dlogd = fp_dlogdens(x_det)
                        for f in range(n_fp):
                            k_f = jnp.where(
                                shade_pre, -sigma_t * dI_s[f],
                                jnp.where(medium,
                                          dlogd[f] - sigma_t * dI_m[f],
                                          0.0))
                            acc[f"A_fp_{f}"] += k_f
                            acc[f"B_fp_{f}"] += k_f * wL0
                    elif n_fp:
                        # equi-angular Bernoulli(Tr) event scores:
                        # dlog Tr/dtheta = -sigma dI(t); dlog(1-Tr)/
                        # dtheta = sigma dI(t) Tr/(1-Tr)
                        dI_t0 = fp_dI(o, d, t_det0)
                        for f in range(n_fp):
                            k_f = jnp.where(
                                shade_pre, -sigma_t * dI_t0[f],
                                jnp.where(medium & hit,
                                          sigma_t * dI_t0[f] * tr_act
                                          / one_m_tr, 0.0))
                            acc[f"A_fp_{f}"] += k_f
                            acc[f"B_fp_{f}"] += k_f * wL0

                em_hit = surface & at["is_em"]
                credit = (alive & em_hit & (depth == 0) if nee
                          else alive & em_hit)
                radh = [at["rr"], at["rg"], at["rb"]]
                for i in range(3):
                    add = radh[i] * tp[i]
                    if physical:
                        # compensate the iteration's own RR survival
                        # (engine.IntegratorSpec.physical); reference: bare
                        add = add * inv_cp
                    add = jnp.where(credit, add, 0.0)
                    L[i] = L[i] + add
                    Lps[i] = Lps[i] + add
                if grads:
                    for e in emitters:
                        m = credit & (at["sid"] == e)
                        for i in range(3):
                            gw = wt_l[i] * tp[i]
                            if physical:
                                gw = gw * inv_cp
                            acc[f"g_rad_{e}_{i}"] += jnp.where(m, gw, 0.0)
                shade = alive & surface & ~em_hit

                if nee:
                    ldp, ldp_coef, ldp_lam, dist_ls = plight_term(
                        at, xs, nrm, d, lc, lrad)
                    if fc is None:
                        att_pl = dist_ls
                    else:
                        inv_dl = 1.0 / jnp.maximum(dist_ls, 1e-20)
                        wlight = [(lc[i] - xs[i]) * inv_dl for i in range(3)]
                        att_pl = pr.field_tau(fck, 1.0, xs, wlight,
                                              dist_ls, nonneg=True)
                    trs = jnp.exp(-sigma_t * att_pl)
                    wtp = ([wt_l[i] * tp[i] * inv_cp for i in range(3)]
                           if (grads and diff_grid) else None)
                    ldm, misp = mis_v2(rng, at, xs, nrm, d, wtp)
                    for i in range(3):
                        add = jnp.where(
                            shade,
                            (ldp[i] * trs * inv_ps + ldm[i]) * tp[i] * inv_cp, 0.0)
                        L[i] = L[i] + add
                        Lps[i] = Lps[i] + add
                    if grads:
                        # immediate sigma_t terms: d(trs)/dsigma and MIS tr
                        gs = z
                        for i in range(3):
                            gs += wt_l[i] * (ldp[i] * trs * (-att_pl) * inv_ps
                                           + misp["dsig"][i]) * tp[i] * inv_cp
                        acc["g_st"] += jnp.where(shade, gs, 0.0)
                        if diff_grid:
                            gpl = z
                            for i in range(3):
                                gpl += (wt_l[i] * ldp[i] * trs * inv_ps
                                        * tp[i] * inv_cp)
                            gpl = jnp.where(shade, gpl, 0.0)
                        if n_fp:
                            # immediate field-param terms of the surface
                            # NEE trs and the MIS light-strategy trs
                            dI_pl = fp_dI(xs, wlight, dist_ls)
                            for f in range(n_fp):
                                gk = z
                                for i in range(3):
                                    gk += wt_l[i] * (
                                        ldp[i] * trs
                                        * (-sigma_t * dI_pl[f]) * inv_ps
                                        + misp["dk"][f][i]) * tp[i] * inv_cp
                                acc[f"g_fp_{f}"] += jnp.where(shade, gk,
                                                              0.0)
                        # radiance: pLight (picked light) + MIS light strat
                        for e in emitters:
                            m = shade & (lid == e)
                            for i in range(3):
                                g = jnp.where(
                                    m, wt_l[i] * ldp_coef[i] * trs * inv_ps
                                    * tp[i] * inv_cp, 0.0)
                                if e in misp["drad"]:
                                    g += jnp.where(
                                        shade,
                                        wt_l[i] * misp["drad"][e][i] * tp[i] * inv_cp,
                                        0.0)
                                g += jnp.where(
                                    shade & (misp["sid2"] == e),
                                    wt_l[i] * misp["dle"][i] * tp[i] * inv_cp, 0.0)
                                acc[f"g_rad_{e}_{i}"] += g
                        # albedo of the shaded sphere
                        for s in alb_ids:
                            m = shade & (at["sid"] == s)
                            for i in range(3):
                                acc[f"g_alb_{s}_{i}"] += jnp.where(
                                    m, wt_l[i] * (ldp_lam[i] * trs * inv_ps
                                                + misp["dalb"][i]) * tp[i] * inv_cp,
                                    0.0)

                fs, wi_s, pdf_b = pr.sample_bsdf(rng, at, d, nrm)
                cosine = pr.dot3(nrm, wi_s)
                wscale = cosine * inv_cp / jnp.maximum(pdf_b, 1e-20)
                tp_surface = [tp[i] * fs[i] * wscale for i in range(3)]

                u_p1, u_p2 = rng(), rng()
                if diff_g:
                    # HG at the traced g (importance-sampled: phase/pdf==1,
                    # so no throughput factor; the draw's g-dependence is
                    # the deferred score below)
                    wi_m = pr.hg_dir_traced(d, gph, u_p1, u_p2)
                elif g_hg != 0.0:
                    # HG importance sampling: phase/pdf == 1, throughput
                    # weights and score terms unchanged from isotropic
                    wi_m, _ = pr.hg_dir(d, g_hg, u_p1, u_p2)
                else:
                    wi_m = pr.uniform_sphere(u_p1, u_p2)
                if distance == "free":
                    med_scale = ar_cp                   # sigma_s/sigma_t/cp
                    # d(log med_scale)/d(sigma_t-channel); the NEE term adds
                    # its own -t_vis transmittance coefficient below
                    med_dsig = -inv_st + z
                else:
                    # explicit T and 1/pSuccess (vptShadeMethods.h:1139-1146)
                    med_scale = ss * t_xt * inv_cp / pdf_success
                    if fc is not None:
                        # sigma_s(xt) = sigma_s * dens(xt); dens is
                        # sigma-independent so med_dsig is unchanged in form
                        dens_xt = pr.field_density(fck, xt)
                        med_scale = med_scale * dens_xt
                    med_dsig = -att_along - att_t * tr_act / one_m_tr
                    if n_fp:
                        # EA medium value factors: t_xt = e^{-sigma|I|}
                        # (dlog = -sigma sign(I) dI(d_along)), the
                        # 1/pSuccess chain (-sigma dI(t) Tr/(1-Tr)), and
                        # sigma_s(xt) = sigma_s dens(xt) (+dlog dens)
                        d_along_g = jnp.where(medium, d_along, 0.0)
                        xt_g2 = [jnp.where(medium, xt[j], 0.0)
                                 for j in range(3)]
                        dI_along = fp_dI(o, d, d_along_g)
                        dI_tb = fp_dI(o, d, t_det0)
                        dlogd_xt = fp_dlogdens(xt_g2)
                        med_dfp = [
                            -sigma_t * sign_I * dI_along[f]
                            - sigma_t * dI_tb[f] * tr_act / one_m_tr
                            + dlogd_xt[f]
                            for f in range(n_fp)]
                if nee:
                    (ld_med, w_med, att_nee, dlogp_nee, wl_nee,
                     t_nee) = medium_nee(rng, d, xt, lc, lrad, lr, lid)
                    adds = [jnp.where(medium,
                                      ld_med[i] * inv_ps * tp[i] * med_scale,
                                      0.0)
                            for i in range(3)]
                    for i in range(3):
                        L[i] = L[i] + adds[i]
                        Lps[i] = Lps[i] + adds[i]
                    if grads:
                        gs = z
                        gx = z
                        for i in range(3):
                            gs += wt_l[i] * adds[i] * (-att_nee + med_dsig)
                            gx += wt_l[i] * adds[i]
                        acc["g_st"] += gs
                        acc["g_ssx"] += gx * (1.0 / ss)
                        if diff_grid:
                            # pathwise voxel terms of every NEE
                            # transmittance: exp(-sigma I) factors give
                            # -sigma * dI/dv * (adjoint value). pLight
                            # (shade) and medium-NEE (medium) are
                            # exclusive per lane -> ONE merged march;
                            # MIS light-strategy rays march separately
                            o_m = pr.sel3(shade, xs, xt)
                            d_m = pr.sel3(shade, wlight, wl_nee)
                            t_m = jnp.where(shade, dist_ls, t_nee)
                            w_m = (-sigma_t) * (gpl + gx)
                            acc["g_grid"] = pr.grid_march_scatter(
                                fck, o_m, d_m, w_m, t_m, z, z,
                                acc["g_grid"])
                            for (w_e, wc_e, dist_e) in misp["scat"]:
                                acc["g_grid"] = pr.grid_march_scatter(
                                    fck, xs, wc_e,
                                    jnp.where(shade, -sigma_t * w_e, 0.0),
                                    dist_e, z, z, acc["g_grid"])
                        if n_fp:
                            # immediate field-param term of the medium-NEE
                            # transmittance. Gate the INPUT distance on
                            # medium: escaped lanes put xt at BIG where
                            # dI/dtheta overflows f32 (0 * inf = NaN)
                            t_nee_g = jnp.where(medium, t_nee, 0.0)
                            xt_g = [jnp.where(medium, xt[j], 0.0)
                                    for j in range(3)]
                            dI_nee = fp_dI(xt_g, wl_nee, t_nee_g)
                            for f in range(n_fp):
                                acc[f"g_fp_{f}"] += jnp.where(
                                    medium, gx * (-sigma_t * dI_nee[f]),
                                    0.0)
                        if diff_g:
                            # pathwise dL/dg of this bounce's NEE value:
                            # adds carries the phase(cos_nee | g) factor
                            acc["g_g"] += gx * dlogp_nee
                        for e in emitters:
                            m = medium & (lid == e)
                            for i in range(3):
                                acc[f"g_rad_{e}_{i}"] += jnp.where(
                                    m, wt_l[i] * w_med * inv_ps * tp[i]
                                    * med_scale, 0.0)
                tp_medium = [tp[i] * med_scale for i in range(3)]

                if grads:
                    # deferred log-throughput factors (family 2) vs L-prefix
                    # AFTER this bounce's emissions
                    wL1 = wt_l[0] * Lps[0] + wt_l[1] * Lps[1] + wt_l[2] * Lps[2]
                    k_med_st = jnp.where(medium, med_dsig, 0.0)
                    k_med_ssx = jnp.where(medium, 1.0 / ss, 0.0)
                    acc["A_st"] += k_med_st
                    acc["B_st"] += k_med_st * wL1
                    acc["A_ssx"] += k_med_ssx
                    acc["B_ssx"] += k_med_ssx * wL1
                    if n_fp and distance != "free":
                        # deferred EA medium-factor field-param terms
                        for f in range(n_fp):
                            k_f = jnp.where(medium, med_dfp[f], 0.0)
                            acc[f"A_fp_{f}"] += k_f
                            acc[f"B_fp_{f}"] += k_f * wL1
                    if diff_grid and distance != "free":
                        # EA med_scale value-factor voxel chains (round 5).
                        # med_scale enters this bounce's NEE (already
                        # loss-weighted in gx) and every FUTURE emission
                        # (wLtot - wL1, known in phase B) — table-sized
                        # params cannot ride the deferred A/B pairs, so
                        # scatter immediately with the explicit adjoint.
                        adjv = jnp.where(
                            phB & medium,
                            (gx if nee else z) + acc["wLtot"] - wL1, 0.0)
                        # t_xt = e^{-sigma |I(d_along)|}: -sigma d|I|/dv.
                        # |I| marches the forward ray for I >= 0 lanes and
                        # the REVERSED ray for EA samples behind the origin
                        # (field_tau's odd-in-t convention).
                        w_pos = jnp.where(I_along >= 0.0,
                                          -sigma_t * adjv, 0.0)
                        w_neg = jnp.where(I_along < 0.0,
                                          -sigma_t * adjv, 0.0)
                        # 1/pSuccess = 1/(pdf (1-Tr)): dlog/dv =
                        # -sigma dI(t)/dv Tr/(1-Tr); same ray as the
                        # forward-side t_xt chain -> merged march (wA/wB)
                        w_ps = -sigma_t * adjv * tr_act / one_m_tr
                        acc["g_grid"] = pr.grid_march_scatter(
                            fck, o, d, w_pos, jnp.maximum(d_along, 0.0),
                            w_ps, t_det0, acc["g_grid"])
                        acc["g_grid"] = pr.grid_march_scatter(
                            fck, o, [-d[0], -d[1], -d[2]], w_neg,
                            jnp.maximum(-d_along, 0.0), z, z,
                            acc["g_grid"])
                        # sigma_s(xt) = sigma_s dens(xt): appearance
                        # TRILINEAR scatter at the scatter point
                        xt_dg = [jnp.where(medium, xt[j], 0.0)
                                 for j in range(3)]
                        acc["g_grid"] = pr.grid_scatter_point(
                            fck, xt_dg,
                            adjv / jnp.maximum(dens_xt, 1e-30),
                            acc["g_grid"], interp="tri")
                    if diff_g:
                        # phase-draw score d/dg log p(cos|g): the sampled
                        # direction is detached, the draw's g-dependence
                        # reweights FUTURE contributions only — so it joins
                        # the deferred pairs against wL1, which already
                        # includes this bounce's own emissions (the engine
                        # adds phase_s after w_sc the same way)
                        k_g = jnp.where(medium,
                                        pr.dlog_hg_dg(pr.dot3(d, wi_m), gph),
                                        0.0)
                        acc["A_g"] += k_g
                        acc["B_g"] += k_g * wL1
                    for s in lam_ids:
                        m = shade & (at["sid"] == s)
                        for i in range(3):
                            inv_a = jnp.where(alb[s][i] > 0.0,
                                              1.0 / alb[s][i], 0.0)
                            k = jnp.where(m, wt_l[i] * inv_a, 0.0)
                            acc[f"A_alb_{s}_{i}"] += k
                            acc[f"B_alb_{s}_{i}"] += k * Lps[i]

                o = pr.sel3(shade, xs, pr.sel3(medium, xt, o))
                d = pr.sel3(shade, wi_s, pr.sel3(medium, wi_m, d))
                tp = pr.sel3(shade, tp_surface, pr.sel3(medium, tp_medium, tp))
                alive2 = (shade | medium) & (depth + 1 < max_bounces)
                depth = jnp.where(alive2, depth + 1, depth)

                finished = was_alive & ~alive2
                if two_phase:
                    finA = finished & ~phB
                    finB = finished & phB
                    # capture the sample's weighted total with the RAW wt
                    # (wt_l is zero in phase A) BEFORE Lps resets below
                    acc["wLtot"] = jnp.where(
                        finA, wt[0] * Lps[0] + wt[1] * Lps[1]
                        + wt[2] * Lps[2], acc["wLtot"])
                    acc["phase"] = jnp.where(
                        finA, 1, jnp.where(finB, 0, acc["phase"]))
                    samples = samples + finB.astype(jnp.int32)
                else:
                    samples = samples + finished.astype(jnp.int32)
                if grads:
                    # fold deferred pairs: contribution A * L_total - B,
                    # L_total == the finished sample's prefix
                    WL = wt_l[0] * Lps[0] + wt_l[1] * Lps[1] + wt_l[2] * Lps[2]
                    acc["g_st"] += jnp.where(finished,
                                             acc["A_st"] * WL - acc["B_st"],
                                             0.0)
                    acc["g_ssx"] += jnp.where(finished,
                                              acc["A_ssx"] * WL - acc["B_ssx"],
                                              0.0)
                    acc["A_st"] = jnp.where(finished, 0.0, acc["A_st"])
                    acc["B_st"] = jnp.where(finished, 0.0, acc["B_st"])
                    acc["A_ssx"] = jnp.where(finished, 0.0, acc["A_ssx"])
                    acc["B_ssx"] = jnp.where(finished, 0.0, acc["B_ssx"])
                    if diff_g:
                        acc["g_g"] += jnp.where(
                            finished, acc["A_g"] * WL - acc["B_g"], 0.0)
                        acc["A_g"] = jnp.where(finished, 0.0, acc["A_g"])
                        acc["B_g"] = jnp.where(finished, 0.0, acc["B_g"])
                    for f in range(n_fp):
                        acc[f"g_fp_{f}"] += jnp.where(
                            finished,
                            acc[f"A_fp_{f}"] * WL - acc[f"B_fp_{f}"], 0.0)
                        acc[f"A_fp_{f}"] = jnp.where(finished, 0.0,
                                                     acc[f"A_fp_{f}"])
                        acc[f"B_fp_{f}"] = jnp.where(finished, 0.0,
                                                     acc[f"B_fp_{f}"])
                    for s in lam_ids:
                        for i in range(3):
                            a = acc[f"A_alb_{s}_{i}"]
                            b = acc[f"B_alb_{s}_{i}"]
                            acc[f"g_alb_{s}_{i}"] += jnp.where(
                                finished, a * Lps[i] - b, 0.0)
                            acc[f"A_alb_{s}_{i}"] = jnp.where(finished, 0.0, a)
                            acc[f"B_alb_{s}_{i}"] = jnp.where(finished, 0.0, b)
                    Lps = [jnp.where(finished, 0.0, Lps[i]) for i in range(3)]

                return (o, d, tp, L, Lps, alive2.astype(jnp.int32), depth,
                        samples, it + 1, rng.s, acc)

            iters_cap = max_iters * 2 if two_phase else max_iters

            def loop_cond(state):
                samples, it = state[7], state[8]
                return (it < iters_cap) & jnp.any(samples < spp)

            acc = {}
            if grads:
                acc = {"g_st": z, "g_ssx": z, "A_st": z, "B_st": z,
                       "A_ssx": z, "B_ssx": z}
                if diff_grid:
                    acc["g_grid"] = jnp.zeros((C_tab, 128), jnp.float32)
                    acc["phase"] = jnp.zeros((R, 128), jnp.int32)
                    acc["rng_save"] = jnp.zeros((R, 128), jnp.int32)
                    acc["wLtot"] = z
                if diff_g:
                    acc.update({"g_g": z, "A_g": z, "B_g": z})
                for f in range(n_fp):
                    acc.update({f"g_fp_{f}": z, f"A_fp_{f}": z,
                                f"B_fp_{f}": z})
                for e in emitters:
                    for i in range(3):
                        acc[f"g_rad_{e}_{i}"] = z
                for s in alb_ids:
                    for i in range(3):
                        acc[f"g_alb_{s}_{i}"] = z
                for s in lam_ids:
                    for i in range(3):
                        acc[f"A_alb_{s}_{i}"] = z
                        acc[f"B_alb_{s}_{i}"] = z

            state = (
                [z, z, z], [z, z, 1.0 + z], [z, z, z], [z, z, z], [z, z, z],
                jnp.zeros((R, 128), jnp.int32),
                jnp.zeros((R, 128), jnp.int32),
                jnp.zeros((R, 128), jnp.int32),
                jnp.asarray(0, jnp.int32),
                pr.pcg_seed(lane, seed_ref[0]),
                acc,
            )
            state = jax.lax.while_loop(loop_cond, loop_body, state)
            L = state[3]
            if not grads:
                out_r[:] = L[0]
                out_g_[:] = L[1]
                out_b[:] = L[2]
                return
            Lps = state[4]
            acc = state[10]
            # lanes truncated by the iteration cap: fold with their partial
            # prefix (the forward output also keeps their partial radiance)
            wt_sum = wt[0] * Lps[0] + wt[1] * Lps[1] + wt[2] * Lps[2]
            g_st = acc["g_st"] + acc["A_st"] * wt_sum - acc["B_st"]
            g_ssx = acc["g_ssx"] + acc["A_ssx"] * wt_sum - acc["B_ssx"]
            if diff_g:
                g_g = acc["g_g"] + acc["A_g"] * wt_sum - acc["B_g"]
            g_fp = [acc[f"g_fp_{f}"] + acc[f"A_fp_{f}"] * wt_sum
                    - acc[f"B_fp_{f}"] for f in range(n_fp)]
            for s in lam_ids:
                for i in range(3):
                    acc[f"g_alb_{s}_{i}"] += (acc[f"A_alb_{s}_{i}"] * Lps[i]
                                              - acc[f"B_alb_{s}_{i}"])
            # reduce to the packed gradient vector on row 0
            vals = {0: jnp.sum(g_st), 1: jnp.sum(g_st) + jnp.sum(g_ssx)}
            if diff_g:
                vals[IG] = jnp.sum(g_g)
            for f in range(n_fp):
                vals[IK + f] = jnp.sum(g_fp[f])
            for s in alb_ids:
                for i in range(3):
                    vals[2 + 3 * s + i] = jnp.sum(acc[f"g_alb_{s}_{i}"])
            for e in emitters:
                for i in range(3):
                    vals[2 + 3 * S + 3 * e + i] = jnp.sum(acc[f"g_rad_{e}_{i}"])
            grow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            gcol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            out = jnp.zeros((8, 128), jnp.float32)
            for k, v in vals.items():
                out = out + jnp.where((grow == 0) & (gcol == k), v, 0.0)
            out_g[:] = out
            if diff_grid:
                out_grid[:] = acc["g_grid"]

        return kernel

    interp = pltpu.InterpretParams() if interpret else False
    tab_host = (grid_table(scene.medium.density.params) if grid_mode
                else None)
    C_tab = int(tab_host.shape[0]) if grid_mode else 0
    T_grid = (int(np.prod(scene.medium.density.params.shape))
              if grid_mode else 0)
    grid_shape = (tuple(scene.medium.density.params.shape) if grid_mode
                  else None)
    # grid table rides as one extra VMEM input on every call (empty lists
    # keep the non-grid call signatures unchanged)
    tab_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if grid_mode
                 else [])
    tab_args = (tab_host,) if grid_mode else ()

    fwd_kernel = make_kernel(grads=False)
    bwd_kernel = make_kernel(grads=True)

    @functools.partial(jax.jit, static_argnames=())
    def run_fwd(pvec, seed, *tab_arg):
        seeds = jnp.asarray([seed], jnp.int32).reshape(1)
        base = jnp.asarray([0], jnp.int32)
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + tab_specs,
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles * R, 128), jnp.float32)
                for _ in range(3)
            ],
            interpret=interp,
        )(pvec, seeds, base, *tab_arg)
        flat = jnp.stack([o.reshape(-1) for o in outs], axis=-1)
        return flat[:npix] / spp

    @jax.jit
    def run_bwd(pvec, seed, gbar, *tab_arg):
        seeds = jnp.asarray([seed], jnp.int32).reshape(1)
        base = jnp.asarray([0], jnp.int32)
        pad = num_tiles * LANES - npix
        gflat = jnp.pad(gbar, ((0, pad), (0, 0)))
        planes = [gflat[:, i].reshape(num_tiles * R, 128) for i in range(3)]
        out = pl.pallas_call(
            bwd_kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + tab_specs + [
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_specs=([pl.BlockSpec((8, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((C_tab, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
                       if diff_grid else
                       pl.BlockSpec((8, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=([jax.ShapeDtypeStruct((num_tiles * 8, 128),
                                             jnp.float32),
                        jax.ShapeDtypeStruct((num_tiles * C_tab, 128),
                                             jnp.float32)]
                       if diff_grid else
                       jax.ShapeDtypeStruct((num_tiles * 8, 128),
                                            jnp.float32)),
            interpret=interp,
        )(pvec, seeds, base, *tab_arg, *planes)
        if diff_grid:
            out, ggrid = out
            ggrid = ggrid.reshape(num_tiles, C_tab, 128).sum(axis=0)
            gvec = out.reshape(num_tiles, 8, 128)[:, 0, :].sum(axis=0)[:P]
            return gvec, ggrid.reshape(-1)[:T_grid].reshape(grid_shape)
        return out.reshape(num_tiles, 8, 128)[:, 0, :].sum(axis=0)[:P]

    def _check_g_leaf(params):
        if ("g" in params) != diff_g:
            raise ValueError(
                "params must contain a 'g' leaf iff diff_g=True — build "
                "them with pack_params(scene, with_g=diff_g)")
        if ("fog_k" in params) != diff_field:
            raise ValueError(
                "params must contain a 'fog_k' leaf iff diff_field=True — "
                "build them with pack_params(scene, with_field=diff_field)")
        if ("blobs" in params) != diff_blobs:
            raise ValueError(
                "params must contain a 'blobs' leaf iff diff_blobs=True — "
                "build them with pack_params(scene, with_blobs=diff_blobs)")
        if ("grid" in params) != diff_grid:
            raise ValueError(
                "params must contain a 'grid' leaf iff diff_grid=True — "
                "build them with pack_params(scene, with_grid=diff_grid)")

    def _tab_of(params):
        # diff_grid: the table is TRACED (rebuilt from the params leaf);
        # otherwise the baked scene values ride along as a constant
        if not grid_mode:
            return ()
        if diff_grid:
            return (grid_table(params["grid"]),)
        return (tab_host,)

    @jax.custom_vjp
    def render(params, seed):
        _check_g_leaf(params)
        return run_fwd(_flatten(params, S), seed, *_tab_of(params))

    def render_fwd(params, seed):
        _check_g_leaf(params)
        pvec = _flatten(params, S)
        tab = _tab_of(params)
        return run_fwd(pvec, seed, *tab), (pvec, seed, tab)

    def render_bwd(res, gbar):
        pvec, seed, tab = res
        # seed is integer-valued: its cotangent type is float0
        seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)
        if diff_grid:
            gvec, ggrid = run_bwd(pvec, seed, gbar, *tab)
            grads = unpack_params(gvec, S, with_g=diff_g,
                                  with_field=diff_field, n_blobs=K_blob)
            grads["grid"] = ggrid
            return grads, seed_ct
        gvec = run_bwd(pvec, seed, gbar, *tab)
        return unpack_params(gvec, S, with_g=diff_g, with_field=diff_field,
                             n_blobs=K_blob), seed_ct

    render.defvjp(render_fwd, render_bwd)

    def make_shard(n_tiles: int):
        """Shard-range variant for multi-chip kernel TRAINING
        (dist/train_fast.make_sharded_kernel_train_step): render_shard(
        params, seed, base_pixel) -> (n_tiles*LANES, 3) per-lane pixel
        MEANS for the contiguous tile range starting at base_pixel, with a
        matching custom VJP that runs the backward kernel over the same
        range (lanes past npix contribute nothing — the kernel masks them).
        base_pixel is a traced i32 (under shard_map it comes from
        axis_index); seed/base cotangents are float0. With diff_grid the
        voxel table is traced through and the shard's (C,128) grad table
        reduces into grads["grid"] (round 4 — the caller psums it with the
        rest of the gradient pytree)."""

        def fwd_shard(pvec, seed, base_pixel, *tab):
            outs = pl.pallas_call(
                fwd_kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ] + tab_specs,
                out_specs=[
                    pl.BlockSpec((R, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(3)
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_tiles * R, 128), jnp.float32)
                    for _ in range(3)
                ],
                interpret=interp,
            )(pvec, jnp.reshape(seed, (1,)).astype(jnp.int32),
              jnp.reshape(base_pixel, (1,)).astype(jnp.int32), *tab)
            return jnp.stack([o.reshape(-1) for o in outs], axis=-1) / spp

        def bwd_shard(pvec, seed, base_pixel, gbar, *tab):
            planes = [gbar[:, i].reshape(n_tiles * R, 128) for i in range(3)]
            out = pl.pallas_call(
                bwd_kernel,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ] + tab_specs + [
                    pl.BlockSpec((R, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in range(3)
                ],
                out_specs=([pl.BlockSpec((8, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((C_tab, 128), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)]
                           if diff_grid else
                           pl.BlockSpec((8, 128), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)),
                out_shape=([jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                                 jnp.float32),
                            jax.ShapeDtypeStruct((n_tiles * C_tab, 128),
                                                 jnp.float32)]
                           if diff_grid else
                           jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                                jnp.float32)),
                interpret=interp,
            )(pvec, jnp.reshape(seed, (1,)).astype(jnp.int32),
              jnp.reshape(base_pixel, (1,)).astype(jnp.int32), *tab,
              *planes)
            if diff_grid:
                out, ggrid = out
                ggrid = ggrid.reshape(n_tiles, C_tab, 128).sum(axis=0)
                gvec = out.reshape(n_tiles, 8, 128)[:, 0, :].sum(axis=0)[:P]
                return gvec, ggrid.reshape(-1)[:T_grid].reshape(grid_shape)
            return out.reshape(n_tiles, 8, 128)[:, 0, :].sum(axis=0)[:P]

        @jax.custom_vjp
        def render_shard(params, seed, base_pixel):
            return fwd_shard(_flatten(params, S), seed, base_pixel,
                             *_tab_of(params))

        def rs_fwd(params, seed, base_pixel):
            pvec = _flatten(params, S)
            tab = _tab_of(params)
            return (fwd_shard(pvec, seed, base_pixel, *tab),
                    (pvec, seed, base_pixel, tab))

        def rs_bwd(res, gbar):
            pvec, seed, base_pixel, tab = res
            f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
            if diff_grid:
                gvec, ggrid = bwd_shard(pvec, seed, base_pixel, gbar, *tab)
                grads = unpack_params(gvec, S, with_g=diff_g,
                                      with_field=diff_field,
                                      n_blobs=K_blob)
                grads["grid"] = ggrid
                return grads, f0(seed), f0(base_pixel)
            gvec = bwd_shard(pvec, seed, base_pixel, gbar, *tab)
            return (unpack_params(gvec, S, with_g=diff_g,
                                  with_field=diff_field, n_blobs=K_blob),
                    f0(seed), f0(base_pixel))

        render_shard.defvjp(rs_fwd, rs_bwd)
        return render_shard

    render.make_shard = make_shard
    render.lanes_per_tile = LANES
    render.num_tiles = num_tiles
    render.npix = npix
    return render
