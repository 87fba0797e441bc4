"""Fused Pallas TPU render kernel: persistent wavefront, free-flight family.

One `pallas_call` renders a whole pixel tile: camera-ray generation, the
full bounce loop (intersect, NEE, MIS, BSDF continuation, Russian roulette),
path regeneration and sample accumulation all live in VMEM — where the XLA
engine (integrators/engine.py) round-trips dozens of (N,·) intermediates
through HBM per bounce, the kernel touches HBM once per tile (the output).

Design notes (see /opt/skills/guides/pallas_guide.md):
  - lanes are shaped (R, 128): R sublane rows x 128 lanes, f32 native tile;
  - the SCENE IS BAKED IN STATICALLY: sphere centers/radii/materials/
    emitter sets become python-float constants folded into the kernel
    (the reference hardcodes its scene and recompiles to change it,
    Sphere.cpp:7-23 / src/rt.cpp:791-796 — same contract, zero gather cost);
  - per-sphere work is an unrolled loop with branchless nearest-select,
    so attribute "gathers" are S chained `jnp.where`s on (R,128) arrays;
  - RNG is a per-lane PCG32 stream (kernels/prims.Pcg) — the counter-based
    replacement for the reference's racy shared erand48 state (Vector.cpp:8);
  - samplers are rewritten acos/atan-free: cos/sin of the polar angle come
    from algebra (e.g. Beckmann tan^2 = -a^2 ln(1-u) gives cos = 1/sqrt(1+t^2))
    — same distributions, far fewer transcendentals on the VPU;
  - the estimator is iterativeVPTracerFree / implicitVPTracerRecursiveFree
    (vptShadeMethods.h:1263-1340 / 940-1010) with the same weights as the
    XLA engine, including the PBRT cancellation and the point-NEE
    missing-else kill (media/nee.py).

Shared math primitives live in kernels/prims.py (also used by the
differentiable kernel pair in kernels/diff.py). This kernel is
forward-only; differentiable fused renders use kernels/diff.py and
full-parameter differentiable renders the XLA engine.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import Scene, VOLUME_BOUNDARY
from . import prims as pr
from .prims import BIG, INV_4PI

__all__ = ["build_tile_renderer", "render_pallas"]


_G_EPS = 1e-3   # |g| below this is isotropic (media/medium._G_EPS: the HG
                # inversion divides by 2g and loses all precision there)


def _baked_g(scene: Scene) -> float:
    """Medium.g frozen to a python const; tiny |g| snaps to exactly 0 so
    the g == 0 kernel stays bit-identical to the isotropic build."""
    g = float(jnp.asarray(scene.medium.g))
    return g if abs(g) > _G_EPS else 0.0


def _scene_consts(scene: Scene):
    """Freeze the scene into python-float structure for kernel baking."""
    # everything becomes PYTHON floats/ints: weak-typed constants that fold
    # into f32 kernel arithmetic regardless of the x64 flag
    def fl(a):
        return tuple(
            tuple(float(v) for v in row) if np.ndim(row) else float(row)
            for row in np.asarray(a, np.float64)
        )

    s = {
        "r": fl(scene.radius),
        "c": fl(scene.center),
        "alb": fl(scene.albedo),
        "rad": fl(scene.radiance),
        "mat": tuple(int(m) for m in np.asarray(scene.material)),
        "eta": fl(scene.eta),
        "kap": fl(scene.kappa),
        "alpha": fl(scene.alpha),
        "sigma_a": float(scene.medium.sigma_a),
        "sigma_s": float(scene.medium.sigma_s),
        # Henyey-Greenstein anisotropy, baked like everything else (the
        # engine covers a TRACED g; here g != 0 swaps the phase factor in
        # medium NEE and the scatter sampler at build time, and g == 0
        # compiles the exact isotropic kernel — bit-identical images)
        "g": _baked_g(scene),
        "emitters": tuple(scene.emitter_idx),
        "mis_lights": tuple(scene.mis_light_idx),
    }
    # material-3 volumetric boundary shells: the main intersect still sees
    # them as surfaces (the active integrator uses plain `intersect`,
    # vptShadeMethods.h:1286; the engine matches), but pLight's visibility
    # cascade needs the VPT variant + multipleT (vptShadeMethods.h:66-72)
    s["vol"] = tuple(i for i, m in enumerate(s["mat"])
                     if m == VOLUME_BOUNDARY)
    # heterogeneous density field (media/density.py), baked like the rest
    # of the scene: kind/params/majorant become python consts folded into
    # the kernel arithmetic (prims.field_* helpers)
    fld = scene.medium.density
    if fld is None:
        s["field"] = None
    elif fld.kind == "grid":
        # round 4: grids run in the fused kernels. Geometry/quadrature
        # params bake as consts; the VALUES become a padded (C, 128) VMEM
        # operand (fc["tab"], bound inside the kernel) looked up by
        # chunked lane-gathers — see prims.py grid_* and
        # tools/grid_gather_study.py for the measured strategy choice
        from vpt.media import density as _den
        nx, ny, nz = fld.params.shape
        lo, hi = _den._grid_rails(fld)
        diag = float(np.sqrt(sum(
            (n * sp) ** 2 for n, sp in zip((nx, ny, nz),
                                           fld.grid_spacing))))
        s["field"] = {
            "kind": "grid",
            "dims": (int(nx), int(ny), int(nz)),
            "origin": tuple(float(v) for v in fld.grid_origin),
            "spacing": tuple(float(v) for v in fld.grid_spacing),
            "rails": tuple((float(lo[i]), float(hi[i])) for i in range(3)),
            "cap": float(fld.march_extent) * diag,
            "n_march": int(fld.n_march),
            "majorant": float(fld.majorant),
            "interp": str(fld.transport_interp),
            "tab": None,        # bound to the loaded VMEM table in-kernel
        }
    else:
        p = np.asarray(fld.params, np.float64)
        if fld.kind == "exp_height":
            params = (float(p[0]), float(p[1]))
        else:
            params = tuple(tuple(float(v) for v in row)
                           for row in p.reshape(-1, 5))
        s["field"] = {"kind": fld.kind, "params": params,
                      "majorant": float(fld.majorant),
                      "max_null": int(fld.max_null)}
    return s


def grid_table(params) -> jnp.ndarray:
    """Pack the grid's flat values into the (C, 128) z-PAIR lookup table
    the kernels gather from: word j carries bf16(g[j]) in the high 16
    bits and bf16(g[j+1]) in the low 16, so ONE lane gather at a
    trilinear cell's base index returns BOTH z-corners
    (prims.grid_lookup_pair) — halving the gather count, the dominant
    cost of the grid kernels. bf16 quantizes densities to ~0.4% relative;
    the scatter backward differentiates the same rounded model, so
    AD-vs-FD consistency is unaffected."""
    flat = jnp.ravel(jnp.asarray(params, jnp.float32))
    b = flat.astype(jnp.bfloat16)
    u = jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.int32)
    nxt = jnp.concatenate([u[1:], u[-1:]])
    word = jnp.bitwise_or(jnp.left_shift(u, 16), nxt)
    tab = jax.lax.bitcast_convert_type(word, jnp.float32)
    T = tab.shape[0]
    # C rounded to a multiple of 8: the diff_grid backward emits the
    # voxel-grad table as a (C, 128) VMEM block, and Mosaic requires
    # 8-divisible block rows (n=24 -> C=108 failed the lowering)
    C = -(-T // 128)
    C = -(-C // 8) * 8
    return jnp.pad(tab, (0, C * 128 - T)).reshape(C, 128)


def build_tile_renderer(scene: Scene, camera, width: int, height: int,
                        spp: int, *, nee: bool = True,
                        distance: str = "free",
                        continue_prob: float = 0.6, max_bounces: int = 32,
                        tile_rows: int = 32, jitter: bool = True,
                        sampler: str = "random",
                        scatter_tiles: bool = False,
                        physical: bool = False,
                        interpret: bool = False):
    """Build a jitted fn(seed:int32[num_tiles], base:int32[num_tiles])
    -> (num_tiles*R, 128, 3) radiance sums (divide by spp).

    Each grid program renders R*128 pixels to completion (spp samples each,
    path regeneration on death). tile_rows=32 is the measured optimum at
    1024x1024x64 on v5e (166.6M paths/s vs 145.3M at R=128): smaller tiles
    shorten each program's all-lanes-finished tail, and the grid pipelines
    more programs to hide it (r2 sweep: R=8 147.1M, R=32 166.6M, R=64
    156.8M, R=128 145.3M).

    sampler="ld" (low-discrepancy, ours — the reference is pure erand48):
    the first 5 path dimensions (pixel jitter u,v; the depth-0 distance,
    RR and light-pick draws) come from the R5 Kronecker sequence indexed
    by the lane's sample counter, Cranley-Patterson-rotated by a per-pixel
    random offset (so the estimator stays unbiased and seeds stay
    meaningful). The depth-0 RR stratum is the big win: the reference
    estimator kills (1-cp)=40% of camera samples before the first bounce,
    and stratification makes the per-pixel survivor count ~deterministic
    instead of binomial. Deeper bounces remain PCG-random. Costs 5
    fma+floor per first bounce (~free). frac(a*s) in f32 loses ~2^-12 of
    stratum precision by spp=4096 — irrelevant at the spp this renderer
    targets."""
    if sampler not in ("random", "ld"):
        raise ValueError(f"unknown sampler {sampler!r}")
    scatter = bool(scatter_tiles)
    sc = _scene_consts(scene)
    fc = sc["field"]        # heterogeneous density (None = homogeneous)
    # both distance families take heterogeneous fields (round 3; the EA
    # transform is pure geometry — only Tr/T/sigma_s(xt) swap to the field
    # forms, matching the engine)
    S = len(sc["r"])
    cp = float(continue_prob)
    q = 1.0 - cp
    sigma_t = sc["sigma_a"] + sc["sigma_s"]
    albedo_ratio = sc["sigma_s"] / sigma_t if sigma_t > 0 else 0.0
    g_hg = sc["g"]
    R = tile_rows
    LANES = R * 128
    npix = width * height

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
    grid_mode = fc is not None and fc["kind"] == "grid"
    tab_host = (grid_table(scene.medium.density.params) if grid_mode
                else None)
    sc_base, fc_base = sc, fc

    # ---------------- the kernel ----------------------------------------
    def kernel(seed_ref, base_ref, *refs):
        # every inner closure resolves `sc`/`fc` to THESE kernel-local
        # bindings: in grid mode they carry the loaded VMEM table
        if grid_mode:
            tab_ref, out_r, out_g, out_b = refs
            fc = dict(fc_base, tab=tab_ref[...])
            sc = dict(sc_base, field=fc)
        else:
            out_r, out_g, out_b = refs
            fc = fc_base
            sc = sc_base
        pid = pl.program_id(0)
        if scatter:
            # scatter mode: base_ref holds one base pixel PER program —
            # an arbitrary set of tiles rendered in one launch (adaptive
            # sampling's second pass gathers the high-variance tiles)
            base = base_ref[pid]
        else:
            base = base_ref[0] + pid * LANES
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        pixel = jnp.minimum(base + row * 128 + col, npix - 1)
        px = (pixel % width).astype(jnp.float32)
        py = (height - 1 - pixel // width).astype(jnp.float32)

        if sampler == "ld":
            # shared LD machinery (prims.py): depth-0 RR stratification is
            # the big win — the 1-cp kill is the largest single Bernoulli
            # variance source, and stratified, exactly ~q*spp of a pixel's
            # samples die instead of a binomial draw
            A1, A2, A3, A4, A5 = pr.LD_ALPHA
            lane_ = base + row * 128 + col
            off_u, off_v, off_w, off_r, off_p = pr.ld_offsets(
                lane_, seed_ref[0])
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
            sx = (px + u - 0.5) * (1.0 / width) - 0.5
            sy = (py + v - 0.5) * (1.0 / height) - 0.5
            d = [cx[i] * sx + cy[i] * sy + cam_d[i] for i in range(3)]
            return pr.normalize3(d)

        def light_attrs(u_pick):
            """Uniform emitter pick; per-lane light constants via selects."""
            k = jnp.clip((u_pick * n_em).astype(jnp.int32), 0, n_em - 1)
            z = jnp.zeros((R, 128), jnp.float32)
            lc = [z, z, z]
            lrad = [z, z, z]
            lr = z
            lid = jnp.full((R, 128), -1, jnp.int32)
            for j, e in enumerate(emitters):
                m = k == j
                lc = pr.sel3(m, [jnp.float32(sc["c"][e][i]) + z for i in range(3)], lc)
                lrad = pr.sel3(m, [jnp.float32(sc["rad"][e][i]) + z for i in range(3)], lrad)
                lr = jnp.where(m, jnp.float32(sc["r"][e]), lr)
                lid = jnp.where(m, e, lid)
            return lc, lrad, lr, lid

        def plight_term(at, xs, n, d, lc, lrad):
            """pLight (vptShadeMethods.h:62-91). The visibility cascade
            (incl. the material-3 multipleT fallback) lives in
            prims.plight_le_scale, shared with the differentiable pair.
            Matches media/nee.plight."""
            le_scale, dist, dl = pr.plight_le_scale(sc, lc, xs)
            le = [lrad[i] * le_scale for i in range(3)]
            wi = [-dl[0], -dl[1], -dl[2]]   # unit light dir, already built
            fr = pr.eval_fr_nee_plight(at, n, d, wi)
            cosw = pr.dot3(n, wi)
            return [le[i] * fr[i] * cosw for i in range(3)], dist

        def mis_v2(rng, at, xs, n, d):
            """MISv2 (misSamplingFunctions.h:96-170) over the static
            spherical-emitter set."""
            acc = [jnp.zeros((R, 128), jnp.float32) for _ in range(3)]
            wo = [-d[0], -d[1], -d[2]]
            for e in mis_lights:
                ec = sc["c"][e]; er = float(sc["r"][e]); erad = sc["rad"][e]
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
                # 1/fpdf of the cone pdf, division-free; power_h_invf takes
                # the reciprocal directly
                fpdf_inv = pr.TWO_PI * jnp.maximum(1.0 - cos_max, 1e-12)
                if sc["field"] is None:
                    tr = jnp.exp(-sigma_t * normcx)
                else:
                    # MISv2's volumetric light-strategy attenuation with the
                    # heterogeneous closed-form optical depth
                    tr = pr.field_tr_toward(sc["field"], sigma_t, xs, wc,
                                            normcx)
                w_vis = jnp.where(visible, tr * pr.dot3(n, wi) * fpdf_inv,
                                  0.0)
                gpdf = pr.bsdf_pdf_for_dir(at, n, wo, wi, rng())
                wf = pr.power_h_invf(fpdf_inv, gpdf)
                for i in range(3):
                    acc[i] += jnp.float32(erad[i]) * fr[i] * w_vis * wf
            # BSDF strategy: sample all lobes, ONE trace (mis.py rationale)
            u1, u2, u_choice = rng(), rng(), rng()
            wi_l = pr.cosine_hemi(n, u1, u2)
            wt, _ = pr.refract_quirk(wo, n)
            fres = pr.fresnel_die(pr.dot3(n, wt), pr.dot3(n, wo))
            refl = u_choice < fres
            ndotwo = pr.dot3(n, wo)
            wr = pr.normalize3([2.0 * ndotwo * n[i] - wo[i] for i in range(3)])
            wi_d = pr.sel3(refl, wr, wt)
            wh_loc = pr.beckmann_wh(at["alpha"], u1, u2)
            wo_loc = pr.to_local(n, wo)
            whw = 2.0 * pr.dot3(wh_loc, wo_loc)
            wi_m_loc = pr.normalize3([whw * wh_loc[i] - wo_loc[i] for i in range(3)])
            wi_m = pr.normalize3(pr.from_local(n, wi_m_loc))
            wi_sel = pr.sel3(at["is_mic"], wi_m, pr.sel3(at["is_die"], wi_d, wi_l))
            hit, _, sid = pr.nearest_id_t(sc, xs, wi_sel)
            # Le and cos_theta_max of whatever we hit (per-sphere selects)
            z = jnp.zeros((R, 128), jnp.float32)
            le = [z, z, z]
            hit_r = z
            hc = [z, z, z]
            for s in range(S):
                m = sid == s
                le = pr.sel3(m, [jnp.float32(sc["rad"][s][i]) + z for i in range(3)], le)
                hit_r = jnp.where(m, jnp.float32(sc["r"][s]), hit_r)
                hc = pr.sel3(m, [jnp.float32(sc["c"][s][i]) + z for i in range(3)], hc)
            cos_l = pr.dot3(n, wi_l)
            gpdf_l = cos_l * pr.INV_PI
            # (le*a/pi*cos_l) / gpdf_l with gpdf_l = cos_l/pi is exactly
            # le*a (x/x == 1 in IEEE), and 0 when cos_l == 0 (0/1e-12 guard)
            g_l = [jnp.where(gpdf_l != 0.0,
                             le[i] * (at["ar"], at["ag"], at["ab"])[i], 0.0)
                   for i in range(3)]
            cos_d = jnp.abs(pr.dot3(n, wi_d))
            scale_d = jnp.where(refl, 1.0, pr.GLASS_ETA_T * pr.GLASS_ETA_T) / jnp.maximum(cos_d, 1e-12)
            g_d = [le[i] * scale_d for i in range(3)]
            gpdf_d = jnp.where(refl, fres, 1.0 - fres)
            fr_m = pr.fr_microfacet(at, wi_m_loc, wh_loc, wo_loc)
            gpdf_m = pr.ndf_beckmann(wh_loc[2], at["alpha"]) * wh_loc[2] / (
                4.0 * jnp.maximum(jnp.abs(pr.dot3(wo_loc, wh_loc)), 1e-12))
            winv_m = wi_m_loc[2] / jnp.maximum(gpdf_m, 1e-20)
            g_m = [le[i] * fr_m[i] * winv_m for i in range(3)]
            g = pr.sel3(at["is_mic"], g_m, pr.sel3(at["is_die"], g_d, g_l))
            gpdf = jnp.where(at["is_mic"], gpdf_m,
                             jnp.where(at["is_die"], gpdf_d, gpdf_l))
            pos_all = (g[0] > 0.0) & (g[1] > 0.0) & (g[2] > 0.0)
            # logical form: a bool-valued where lowers to an i8->i1 trunc
            # Mosaic rejects
            gate = (at["is_mic"] & (g[0] > 0.0)) | (~at["is_mic"] & pos_all)
            # cos_theta_max toward the hit sphere (cosinethetaMax)
            hcx = [hc[i] - xs[i] for i in range(3)]
            n2 = jnp.maximum(pr.dot3(hcx, hcx), 1e-20)
            cmax = jnp.sqrt(jnp.maximum(1.0 - hit_r * hit_r / n2, 1e-12))
            fpdf_h_inv = pr.TWO_PI * jnp.maximum(1.0 - cmax, 1e-12)
            wg = jnp.where(gate & hit, pr.power_h_invg(gpdf, fpdf_h_inv), 0.0)
            for i in range(3):
                acc[i] += g[i] * wg
            return acc

        def medium_nee(rng, d, xt, lc, lrad, lr, lid):
            """freeSingleScattering (volumetricBasicFunctions.h:284-340)
            with the missing-else point kill => point sources contribute 0
            (media/nee.py); sphere sources: cone sample + id match.
            d is the incoming propagation direction: at g != 0 the phase
            value toward the cone sample is HG (media/nee.py d_in/g)."""
            wc = [lc[i] - xt[i] for i in range(3)]
            inv_mag = jax.lax.rsqrt(jnp.maximum(pr.dot3(wc, wc), 1e-20))
            wc_n = pr.scale3(wc, inv_mag)
            ratio = lr * inv_mag
            cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
            wl = pr.cone_dir(wc_n, cos_max, rng(), rng())
            hit, t, sid = pr.nearest_id_t(sc, xt, wl)
            visible = hit & (sid == lid) & (lr > 0.0)
            if g_hg != 0.0:
                phase = pr.hg_phase_const(pr.dot3(d, wl), g_hg)
            else:
                phase = INV_4PI     # exact const: the reference's 1/4pi
            if sc["field"] is None:
                tr_l = jnp.exp(-sigma_t * t)
            elif sc["field"]["kind"] == "grid":
                # tr is NOT applied here: the caller merges this shadow
                # ray's tau march with the surface-NEE (pLight) march —
                # the two are per-lane exclusive (medium vs shade), so
                # ONE canonical march serves both (the march is the
                # dominant grid-kernel cost)
                tr_l = 1.0
            else:
                tr_l = pr.field_tr_toward(sc["field"], sigma_t, xt, wl, t)
            # phase / cone_pdf = phase * 2pi * (1 - cos_max): no div
            w = jnp.where(visible,
                          tr_l
                          * (phase * pr.TWO_PI)
                          * jnp.maximum(1.0 - cos_max, 1e-12),
                          0.0)
            return [lrad[i] * w for i in range(3)], wl, t

        def bounce(rng, state):
            o, d, tp, L, alive, depth, samples, it = state
            u_rr = rng()
            u_pick = rng()
            if sampler == "ld":
                s_f = samples.astype(jnp.float32)
                d0 = depth == 0
                u_rr = jnp.where(d0, _strat(A4, off_r, s_f), u_rr)
                u_pick = jnp.where(d0, _strat(A5, off_p, s_f), u_pick)
            alive = alive & (u_rr >= q)
            hit, t, at = pr.nearest(sc, o, d, sc["alb"], sc["rad"])
            t_eff = jnp.where(hit, t, BIG)
            xs = [o[i] + t_eff * d[i] for i in range(3)]
            nrm = pr.normalize3([xs[0] - at["cx"], xs[1] - at["cy"], xs[2] - at["cz"]])
            lc, lrad, lr, lid = light_attrs(u_pick)
            inv_cp = 1.0 / cp            # python consts: fold the divisions
            n_em_f = float(n_em)         # 1/prob_source

            u_dist = rng()
            if sampler == "ld":
                # stratify the FIRST segment's distance draw (dimension 3
                # of the path integral); all lanes still consume one rng()
                # so the PCG stream stays lockstep across the tile
                u_dist = jnp.where(
                    depth == 0,
                    _strat(A3, off_w, samples.astype(jnp.float32)), u_dist)
            if distance == "free":
                if fc is None:
                    d_s = -jnp.log1p(-u_dist) * (1.0 / sigma_t)
                    tr_actual = jnp.where(hit, jnp.exp(-sigma_t * t), 0.0)
                elif fc["kind"] == "grid":
                    # voxel grid: ONE canonical march yields the sampled
                    # distance (exact pc-tau inversion) AND tau(t_eff)
                    # for the surface transmittance (prims.
                    # grid_sample_free_and_tau)
                    d_s, tau_cap = pr.grid_sample_free_and_tau(
                        fc, sigma_t, o, d, u_dist, t_eff)
                    tr_actual = jnp.where(hit, jnp.exp(-tau_cap), 0.0)
                else:
                    # heterogeneous free flight: analytic CDF inversion
                    # (exp_height) or in-kernel delta tracking (blobs);
                    # every weight below is already in PBRT-cancelled form
                    d_s = pr.field_sample_free(fc, sigma_t, o, d, u_dist,
                                               rng, t_eff)
                    tr_actual = jnp.where(
                        hit, jnp.exp(-pr.field_tau(fc, sigma_t, o, d, t_eff)),
                        0.0)
                surface = (d_s > t_eff) & hit
                if fc is not None:
                    # heterogeneous flights can ESCAPE to vacuum (d_s ==
                    # BIG on a surface miss): the lane dies instead of
                    # scattering at a fictitious far point (engine parity)
                    alive = alive & ((d_s < 0.5 * BIG) | surface)
                xt = [o[i] + d_s * d[i] for i in range(3)]
                pdf_success = None          # PBRT cancellation (explicit)
                t_xt = None
            elif distance == "equiangular":
                # equi-angular (equiAngularParams2 + sample/pdf,
                # volumetricBasicFunctions.h:209-223, vptSamplingFunctions.h:54-62)
                lo = [lc[i] - o[i] for i in range(3)]
                delta = pr.dot3(lo, d)
                D = jnp.sqrt(jnp.maximum(pr.dot3(lo, lo) - delta * delta, 1e-12))
                th_a = pr.atan2_posx(-delta, D)
                th_b = pr.atan2_posx(t_eff - delta, D)
                # clamped: f32 tan can hit exactly inf (cos == 0); a
                # heterogeneous tau at d_along = inf is inf*0 = NaN when
                # d_y == 0 (homogeneous exp(-sigma*inf) = 0 hid those lanes)
                sample_t = jnp.clip(
                    D * pr.tan_sc((1.0 - u_dist) * th_a + u_dist * th_b),
                    -BIG, BIG)
                d_along = sample_t + delta
                xt = [o[i] + d_along * d[i] for i in range(3)]
                dist_pdf = D / (jnp.maximum(jnp.abs(th_b - th_a), 1e-12)
                                * (sample_t * sample_t + D * D))
                if fc is None:
                    tr_actual = jnp.where(hit, jnp.exp(-sigma_t * t), 0.0)
                    t_xt = jnp.exp(-sigma_t * jnp.abs(d_along))
                else:
                    # heterogeneous Bernoulli(Tr) + explicit T: the optical
                    # depth is odd in t, so |tau| is the segment's depth
                    # even when the EA transform samples behind the origin
                    t_det = jnp.where(hit, t, 0.0)
                    tr_actual = jnp.where(
                        hit,
                        jnp.exp(-pr.field_tau(fc, sigma_t, o, d, t_det,
                                              nonneg=True)),
                        0.0)
                    t_xt = jnp.exp(-jnp.abs(
                        pr.field_tau(fc, sigma_t, o, d, d_along)))
                u_ev = rng()
                surface = (u_ev <= tr_actual) & hit
                # pSuccess = pdf * (1 - Tr) (vptShadeMethods.h:1093);
                # floored: dist_pdf*(1-Tr) can UNDERFLOW f32 when the
                # medium is thin along the ray (Tr ~ 1) AND the EA pdf is
                # tiny — the reciprocal then makes inf and a masked 0*inf
                # NaN (hetero fog exposes it on chip)
                pdf_success = jnp.maximum(
                    dist_pdf * jnp.maximum(1.0 - tr_actual, 1e-20), 1e-30)
            else:
                # CLAMPED equi-angular (equiAngularParams,
                # volumetricBasicFunctions.h:180-207): foot point x0 clamped
                # into [o, xs], D measured from x0 to the light center —
                # implicitVPTracerRecursive's parameterization
                # (vptShadeMethods.h:884); matches engine clamped_ea
                lo = [lc[i] - o[i] for i in range(3)]
                delta = jnp.clip(pr.dot3(lo, d), 0.0, t_eff)
                x0 = [o[i] + delta * d[i] for i in range(3)]
                x0c = [x0[i] - lc[i] for i in range(3)]
                D = jnp.sqrt(jnp.maximum(pr.dot3(x0c, x0c), 1e-12))
                th_a = pr.atan2_posx(-delta, D)
                th_b = pr.atan2_posx(t_eff - delta, D)
                sample_t = jnp.clip(
                    D * pr.tan_sc((1.0 - u_dist) * th_a + u_dist * th_b),
                    -BIG, BIG)                   # clamp: see params2 branch
                d_along = delta + sample_t       # distance from o along d
                xt = [x0[i] + sample_t * d[i] for i in range(3)]
                dist_pdf = D / (jnp.maximum(jnp.abs(th_b - th_a), 1e-12)
                                * (sample_t * sample_t + D * D))
                if fc is None:
                    tr_actual = jnp.where(hit, jnp.exp(-sigma_t * t), 0.0)
                    t_xt = jnp.exp(-sigma_t * jnp.abs(d_along))
                else:
                    # heterogeneous Bernoulli(Tr) + explicit T: the optical
                    # depth is odd in t, so |tau| is the segment's depth
                    # even when the EA transform samples behind the origin
                    t_det = jnp.where(hit, t, 0.0)
                    tr_actual = jnp.where(
                        hit,
                        jnp.exp(-pr.field_tau(fc, sigma_t, o, d, t_det,
                                              nonneg=True)),
                        0.0)
                    t_xt = jnp.exp(-jnp.abs(
                        pr.field_tau(fc, sigma_t, o, d, d_along)))
                u_ev = rng()
                surface = (u_ev <= tr_actual) & hit
                pdf_success = jnp.maximum(
                    dist_pdf * jnp.maximum(1.0 - tr_actual, 1e-20), 1e-30)

            em_hit = surface & at["is_em"]
            credit = alive & em_hit & (depth == 0) if nee else alive & em_hit
            rad = [at["rr"], at["rg"], at["rb"]]
            for i in range(3):
                add = rad[i] * tp[i]
                if physical:
                    # compensate the iteration's own RR survival
                    # (engine.IntegratorSpec.physical, quirk 1); ref: bare
                    add = add * inv_cp
                L[i] = L[i] + jnp.where(credit, add, 0.0)
            shade = alive & surface & ~em_hit

            grid_merge = fc is not None and fc["kind"] == "grid"
            if nee:
                ldp, dist_l = plight_term(at, xs, nrm, d, lc, lrad)
                if fc is None:
                    trs = jnp.exp(-sigma_t * dist_l)  # same xs-light distance
                else:
                    inv_dl = 1.0 / jnp.maximum(dist_l, 1e-20)
                    wlight = [(lc[i] - xs[i]) * inv_dl for i in range(3)]
                    if grid_merge:
                        trs = None   # merged with the medium-NEE march
                    else:
                        trs = pr.field_tr_toward(fc, sigma_t, xs, wlight,
                                                 dist_l)
                ldm = mis_v2(rng, at, xs, nrm, d)
                if not grid_merge:
                    for i in range(3):
                        ld = ldp[i] * (trs * n_em_f) + ldm[i]
                        L[i] = L[i] + jnp.where(shade, ld * tp[i] * inv_cp,
                                                0.0)

            fs, wi_s, pdf_b = pr.sample_bsdf(rng, at, d, nrm)
            cosine = pr.dot3(nrm, wi_s)
            wscale = cosine * inv_cp / jnp.maximum(pdf_b, 1e-20)
            tp_surface = [tp[i] * fs[i] * wscale for i in range(3)]

            medium = alive & ~surface
            if nee and grid_merge:
                def merged_nee_tr(ld_geo, wl_nee, t_nee):
                    """ONE canonical march attenuates both NEE shadow
                    rays — shade lanes the pLight ray (xs -> light),
                    medium lanes the cone sample (xt -> wl); the lanes
                    are exclusive, the march is the dominant grid cost."""
                    o_sel = pr.sel3(surface, xs, xt)
                    d_sel = pr.sel3(surface, wlight, wl_nee)
                    t_sel = jnp.where(surface, dist_l, t_nee)
                    tr_sel = jnp.exp(-pr.grid_tau_nonneg(
                        fc, sigma_t, o_sel, d_sel, t_sel))
                    return ([ld_geo[i] * tr_sel for i in range(3)],
                            tr_sel)
            u_p1, u_p2 = rng(), rng()
            if g_hg != 0.0:
                # HG importance sampling: phase/pdf == 1, so every
                # throughput weight below is unchanged from isotropic
                wi_m, _ = pr.hg_dir(d, g_hg, u_p1, u_p2)
            else:
                wi_m = pr.uniform_sphere(u_p1, u_p2)
            if distance == "free":
                if nee:
                    # explicit free: transmittance/pdf cancel analytically
                    # (the PBRT simplification, vptShadeMethods.h:1248) —
                    # only sigma_s/sigma_t survives
                    ld_med, wl_nee, t_nee = medium_nee(rng, d, xt, lc,
                                                       lrad, lr, lid)
                    if grid_merge:
                        ld_med, tr_sel = merged_nee_tr(
                            ld_med, wl_nee, t_nee)
                        for i in range(3):
                            ld = ldp[i] * (tr_sel * n_em_f) + ldm[i]
                            L[i] = L[i] + jnp.where(
                                shade, ld * tp[i] * inv_cp, 0.0)
                    med_c = n_em_f * albedo_ratio * inv_cp  # python const
                    for i in range(3):
                        L[i] = L[i] + jnp.where(
                            medium, ld_med[i] * tp[i] * med_c, 0.0)
                    tp_medium = [tp[i] * (albedo_ratio * inv_cp)
                                 for i in range(3)]
                elif physical:
                    # textbook weight (engine.IntegratorSpec.physical,
                    # quirk 2): sigma_s*T/ffProb = sigma_s/sigma_t
                    tp_medium = [tp[i] * (albedo_ratio * inv_cp)
                                 for i in range(3)]
                else:
                    # implicit free: sigma_s*T/(cp*ffProb*(1-Tr)) =
                    # (sigma_s/sigma_t)/(cp*(1-Tr))
                    # (vptShadeMethods.h:977,1006; engine.py free implicit)
                    w_med = albedo_ratio * inv_cp / jnp.maximum(
                        1.0 - tr_actual, 1e-20)
                    tp_medium = [tp[i] * w_med for i in range(3)]
            else:
                # equi-angular: T and pdf appear explicitly
                # (vptShadeMethods.h:1134-1146); one reciprocal of the
                # distance pdf serves both the throughput and the NEE scale
                inv_pdf_s = 1.0 / pdf_success
                w_med = (sc["sigma_s"] * inv_cp) * t_xt * inv_pdf_s
                if fc is not None:
                    # sigma_s(xt) = sigma_s * dens(xt)
                    w_med = w_med * pr.field_density(fc, xt)
                if nee:
                    ld_med, wl_nee, t_nee = medium_nee(rng, d, xt, lc,
                                                       lrad, lr, lid)
                    if grid_merge:
                        ld_med, tr_sel = merged_nee_tr(
                            ld_med, wl_nee, t_nee)
                        for i in range(3):
                            ld = ldp[i] * (tr_sel * n_em_f) + ldm[i]
                            L[i] = L[i] + jnp.where(
                                shade, ld * tp[i] * inv_cp, 0.0)
                    scale = w_med * n_em_f
                    for i in range(3):
                        L[i] = L[i] + jnp.where(
                            medium, ld_med[i] * scale * tp[i], 0.0)
                tp_medium = [tp[i] * w_med for i in range(3)]

            o = pr.sel3(shade, xs, pr.sel3(medium, xt, o))
            d = pr.sel3(shade, wi_s, pr.sel3(medium, wi_m, d))
            tp = pr.sel3(shade, tp_surface, pr.sel3(medium, tp_medium, tp))
            alive2 = (shade | medium) & (depth + 1 < max_bounces)
            depth = jnp.where(alive2, depth + 1, depth)
            return o, d, tp, L, alive2, depth, samples, it

        def loop_body(state):
            o, d, tp, L, alive_i, depth, samples, it, rngs = state
            alive = alive_i > 0      # carried as i32: Mosaic cannot yield i1
            rng = pr.Pcg(rngs)
            # regenerate dead lanes with samples remaining
            need = (~alive) & (samples < spp)
            nd = camera_ray(rng, samples)
            one = jnp.ones((R, 128), jnp.float32)
            o = pr.sel3(need, [jnp.float32(cam_o[i]) + jnp.zeros((R, 128), jnp.float32)
                               for i in range(3)], o)
            d = pr.sel3(need, nd, d)
            tp = pr.sel3(need, [one, one, one], tp)
            alive = alive | need
            depth = jnp.where(need, 0, depth)
            was_alive = alive
            o, d, tp, L, alive, depth, samples, it = bounce(
                rng, (o, d, tp, L, alive, depth, samples, it))
            finished = was_alive & ~alive
            samples = samples + finished.astype(jnp.int32)
            return (o, d, tp, L, alive.astype(jnp.int32), depth, samples,
                    it + 1, rng.s)

        def loop_cond(state):
            samples, it = state[6], state[7]
            return (it < max_iters) & jnp.any(samples < spp)

        z = jnp.zeros((R, 128), jnp.float32)
        # per-lane PCG seed: hash(global seed, global lane id); one warmup
        # step decorrelates the low-entropy init
        lane = base + row * 128 + col
        rngs0 = pr.pcg_seed(lane, seed_ref[0])
        state = (
            [z, z, z], [z, z, 1.0 + z], [z, z, z], [z, z, z],
            jnp.zeros((R, 128), jnp.int32),   # alive mask as i32 (see above)
            jnp.zeros((R, 128), jnp.int32),
            jnp.zeros((R, 128), jnp.int32),
            jnp.asarray(0, jnp.int32),
            rngs0,
        )
        state = jax.lax.while_loop(loop_cond, loop_body, state)
        L = state[3]
        out_r[:] = L[0]
        out_g[:] = L[1]
        out_b[:] = L[2]

    num_tiles = -(-npix // LANES)

    def _call(seeds, base, n_tiles):
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        ins = [seeds, base]
        if grid_mode:
            # the grid table rides along full (every program reads all of
            # it); ~C*512 bytes of VMEM (16^3 -> 16KB)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            ins.append(tab_host)
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles * R, 128), jnp.float32)
                for _ in range(3)
            ],
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(*ins)
        return jnp.stack([o.reshape(-1) for o in outs], axis=-1)

    @jax.jit
    def run(seed):
        if scatter:
            raise ValueError(
                "scatter_tiles=True renderer: use make_raw_scatter")
        seeds = jnp.asarray([seed], jnp.int32)
        base = jnp.asarray([0], jnp.int32)
        return _call(seeds, base, num_tiles)[:npix] / spp

    def make_raw(n_tiles: int):
        """fn(seed (i32 scalar), base_pixel (i32 scalar)) -> per-lane
        radiance SUMS, (n_tiles*LANES, 3). For sharded rendering: each
        device runs its contiguous tile range (dist/sharded_pallas.py);
        lanes past npix render a clamped duplicate of the last pixel and
        must be discarded by the caller."""

        def raw(seed, base_pixel):
            if scatter:
                raise ValueError(
                    "scatter_tiles=True renderer: use make_raw_scatter")
            return _call(jnp.reshape(seed, (1,)).astype(jnp.int32),
                         jnp.reshape(base_pixel, (1,)).astype(jnp.int32),
                         n_tiles)

        return raw

    def make_raw_scatter(n_tiles: int):
        """Requires scatter_tiles=True. fn(seed i32, bases (n_tiles,) i32)
        -> (n_tiles*LANES, 3) per-lane radiance SUMS, program i rendering
        the LANES pixels starting at bases[i] — an arbitrary tile set in
        one launch (adaptive sampling pass 2)."""
        if not scatter:
            raise ValueError("build with scatter_tiles=True first")

        def raw(seed, bases):
            return _call(jnp.reshape(seed, (1,)).astype(jnp.int32),
                         jnp.reshape(bases, (n_tiles,)).astype(jnp.int32),
                         n_tiles)

        return raw

    run.make_raw = make_raw
    run.make_raw_scatter = make_raw_scatter
    run.lanes_per_tile = LANES
    run.num_tiles = num_tiles
    run.npix = npix
    return run


# integrator name -> (nee, distance, physical) for the kernel's supported
# subset (physical: the textbook-unbiased modes, engine.IntegratorSpec)
PALLAS_INTEGRATORS = {
    "explicit_free": (True, "free", False),
    "iterative_vpt_free": (True, "free", False),
    "implicit_free": (False, "free", False),
    "explicit_equiangular": (True, "equiangular", False),
    "mis_hybrid": (True, "equiangular", False),
    "implicit_equiangular": (False, "ea_clamped", False),
    "explicit_free_physical": (True, "free", True),
    "implicit_free_physical": (False, "free", True),
}


def render_pallas(scene: Scene, camera, cfg, seed: int | None = None,
                  interpret: bool = False):
    """Render with the fused Pallas kernel; returns (H, W, 3)."""
    nee, distance, physical = PALLAS_INTEGRATORS[cfg.integrator]
    # grid fields: the march fori's live state scales with tile_rows *
    # n_march and Mosaic's scoped-vmem limit is 16MB (n16/march32 at R=32
    # measured 32.1MB -> compile OOM); shrink the tile for heavy marches
    tile_rows = 32
    fld = scene.medium.density
    if fld is not None and fld.kind == "grid":
        if fld.n_march >= 32:
            tile_rows = 8 if min(fld.params.shape) >= 32 else 16
        elif min(fld.params.shape) >= 32:
            tile_rows = 16
    run = build_tile_renderer(
        scene, camera, cfg.width, cfg.height, cfg.spp,
        nee=nee, distance=distance, physical=physical,
        continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
        jitter=cfg.jitter, sampler=getattr(cfg, "sampler", "random"),
        tile_rows=tile_rows, interpret=interpret,
    )
    out = run(cfg.seed if seed is None else seed)
    return out.reshape(cfg.height, cfg.width, 3)
