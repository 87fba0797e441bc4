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
  - RNG is the TPU-native PRNG (pltpu.prng_seed / prng_random_bits),
    seeded per (program, seed) — the counter-based replacement for the
    reference's racy shared erand48 state (Vector.cpp:8);
  - samplers are rewritten acos/atan-free: cos/sin of the polar angle come
    from algebra (e.g. Beckmann tan^2 = -a^2 ln(1-u) gives cos = 1/sqrt(1+t^2))
    — same distributions, far fewer transcendentals on the VPU;
  - the estimator is iterativeVPTracerFree / implicitVPTracerRecursiveFree
    (vptShadeMethods.h:1263-1340 / 940-1010) with the same weights as the
    XLA engine, including the PBRT cancellation and the point-NEE
    missing-else kill (media/nee.py).

The kernel is forward-only; differentiable renders use the XLA engine.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import DIELECTRIC, MICROFACET, Scene, VOLUME_BOUNDARY

__all__ = ["build_tile_renderer", "render_pallas"]

BIG = 1e8
EPS_T = 1e-4
F32EPS = float(np.finfo(np.float32).eps)
INV_4PI = 1.0 / (4.0 * math.pi)
TWO_PI = 2.0 * math.pi
GLASS_ETA_I, GLASS_ETA_T = 1.0, 1.5


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
        "emitters": tuple(scene.emitter_idx),
        "mis_lights": tuple(scene.mis_light_idx),
    }
    if any(m == VOLUME_BOUNDARY for m in s["mat"]):
        raise NotImplementedError(
            "pallas kernel: scenes with material==3 shells use the XLA engine"
        )
    return s


def build_tile_renderer(scene: Scene, camera, width: int, height: int,
                        spp: int, *, nee: bool = True,
                        distance: str = "free",
                        continue_prob: float = 0.6, max_bounces: int = 32,
                        tile_rows: int = 128, jitter: bool = True,
                        interpret: bool = False):
    """Build a jitted fn(seed:int32[num_tiles], base:int32[num_tiles])
    -> (num_tiles*R, 128, 3) radiance sums (divide by spp).

    Each grid program renders R*128 pixels to completion (spp samples each,
    path regeneration on death).
    """
    sc = _scene_consts(scene)
    S = len(sc["r"])
    cp = float(continue_prob)
    q = 1.0 - cp
    sigma_t = sc["sigma_a"] + sc["sigma_s"]
    albedo_ratio = sc["sigma_s"] / sigma_t if sigma_t > 0 else 0.0
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

    # --- small helpers on (R,128) arrays -------------------------------
    class Pcg:
        """Per-lane PCG-RXS-M-XS-32 stream carried through the while loop:
        identical on TPU and in interpret mode (the hardware PRNG,
        pltpu.prng_random_bits, is TPU-only), ~10 int VPU ops per draw —
        far cheaper than a threefry block per uniform. All math is int32
        (wrapping) because Mosaic has no uint32<->float32 casts; the uniform
        comes from a mantissa bitcast: 1.0 <= (0x3F8 | mantissa) < 2.0."""

        def __init__(self, state):
            self.s = state

        def __call__(self):
            shr = jax.lax.shift_right_logical
            s = self.s * jnp.int32(747796405) + jnp.int32(-1403630843)
            self.s = s
            w = (shr(s, shr(s, jnp.int32(28)) + jnp.int32(4)) ^ s) * jnp.int32(277803737)
            x = shr(w, jnp.int32(22)) ^ w
            mant = shr(x, jnp.int32(9)) | jnp.int32(0x3F800000)
            return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0

    def dot3(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def norm3(a):
        return jnp.sqrt(jnp.maximum(dot3(a, a), 1e-20))

    def normalize3(a):
        inv = jax.lax.rsqrt(jnp.maximum(dot3(a, a), 1e-20))
        return [a[0] * inv, a[1] * inv, a[2] * inv]

    def sel3(m, a, b):
        return [jnp.where(m, a[i], b[i]) for i in range(3)]

    def scale3(a, k):
        return [a[0] * k, a[1] * k, a[2] * k]

    def add3(a, b):
        return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]

    def mul3(a, b):
        return [a[0] * b[0], a[1] * b[1], a[2] * b[2]]

    def onb(n):
        """Branch-free coordinateSystem (mathUtilities.h:10-19)."""
        cond = jnp.abs(n[0]) > jnp.abs(n[1])
        inv_a = jax.lax.rsqrt(jnp.maximum(n[0] * n[0] + n[2] * n[2], 1e-20))
        inv_b = jax.lax.rsqrt(jnp.maximum(n[1] * n[1] + n[2] * n[2], 1e-20))
        z = jnp.zeros_like(n[0])
        t = [jnp.where(cond, n[2] * inv_a, z),
             jnp.where(cond, z, n[2] * inv_b),
             jnp.where(cond, -n[0] * inv_a, -n[1] * inv_b)]
        s = [t[1] * n[2] - t[2] * n[1],
             t[2] * n[0] - t[0] * n[2],
             t[0] * n[1] - t[1] * n[0]]
        return s, t

    def to_local(n, w):
        s, t = onb(n)
        return normalize3([dot3(w, s), dot3(w, t), dot3(w, n)])

    def from_local(n, w):
        s, t = onb(n)
        return [s[i] * w[0] + t[i] * w[1] + n[i] * w[2] for i in range(3)]

    def sphere_first_t(o, d, s):
        """Per-sphere nearest-root t with the reference's rescue rule
        (Sphere.h:27-37), stable quadratic like geometry/intersect.py."""
        ctr = sc["c"][s]
        r = float(sc["r"][s])
        oc = [o[0] - ctr[0], o[1] - ctr[1], o[2] - ctr[2]]
        b = dot3(oc, d)
        c0 = dot3(oc, oc) - r * r
        disc = r * r - (dot3(oc, oc) - b * b)
        pos = disc > 0.0
        sq = jnp.sqrt(jnp.where(pos, disc, 1.0)) * pos.astype(jnp.float32)
        sgn = jnp.where(b >= 0.0, 1.0, -1.0)
        qq = -(b + sgn * sq)
        other = c0 / jnp.where(qq != 0.0, qq, 1.0)
        t1 = jnp.minimum(qq, other)
        t2 = jnp.maximum(qq, other)
        eps = EPS_T + 16.0 * F32EPS * r
        t = jnp.where((t1 < 0.0) | (jnp.abs(t1) < eps), t2, t1)
        valid = pos & (t > 0.0) & (jnp.abs(t) > eps)
        return t, valid

    def nearest(o, d):
        """Unrolled scene intersect with branchless attribute select.
        Returns (hit, t, attrs dict of per-lane selected constants)."""
        t_min = jnp.full((R, 128), jnp.inf, jnp.float32)
        hit = jnp.zeros((R, 128), jnp.bool_)
        z = jnp.zeros((R, 128), jnp.float32)
        at = {
            "cx": z, "cy": z, "cz": z, "ar": z, "ag": z, "ab": z,
            "rr": z, "rg": z, "rb": z, "er": z, "eg": z, "eb": z,
            "kr": z, "kg": z, "kb": z, "alpha": z,
            # material/emitter flags as f32 0/1: Mosaic cannot lower the
            # i8->i1 truncation a bool-scalar select produces
            "em_f": z, "mic_f": z, "die_f": z,
            "sid": jnp.full((R, 128), -1, jnp.int32),
        }
        for s in range(S):
            t, valid = sphere_first_t(o, d, s)
            closer = valid & (t < t_min)
            t_min = jnp.where(closer, t, t_min)
            hit = hit | closer
            c = sc["c"][s]; alb = sc["alb"][s]; rad = sc["rad"][s]
            eta = sc["eta"][s]; kap = sc["kap"][s]
            w = lambda const, old: jnp.where(closer, jnp.float32(const), old)
            at["cx"] = w(c[0], at["cx"]); at["cy"] = w(c[1], at["cy"]); at["cz"] = w(c[2], at["cz"])
            at["ar"] = w(alb[0], at["ar"]); at["ag"] = w(alb[1], at["ag"]); at["ab"] = w(alb[2], at["ab"])
            at["rr"] = w(rad[0], at["rr"]); at["rg"] = w(rad[1], at["rg"]); at["rb"] = w(rad[2], at["rb"])
            at["er"] = w(eta[0], at["er"]); at["eg"] = w(eta[1], at["eg"]); at["eb"] = w(eta[2], at["eb"])
            at["kr"] = w(kap[0], at["kr"]); at["kg"] = w(kap[1], at["kg"]); at["kb"] = w(kap[2], at["kb"])
            at["alpha"] = w(sc["alpha"][s], at["alpha"])
            at["em_f"] = w(1.0 if any(v > 0 for v in sc["rad"][s]) else 0.0, at["em_f"])
            at["mic_f"] = w(1.0 if sc["mat"][s] == MICROFACET else 0.0, at["mic_f"])
            at["die_f"] = w(1.0 if sc["mat"][s] == DIELECTRIC else 0.0, at["die_f"])
            at["sid"] = jnp.where(closer, s, at["sid"])
        t_min = jnp.where(hit, t_min, 0.0)
        at["is_em"] = at["em_f"] > 0.5
        at["is_mic"] = at["mic_f"] > 0.5
        at["is_die"] = at["die_f"] > 0.5
        return hit, t_min, at

    def nearest_id_t(o, d):
        """Light trace: nearest id + t only."""
        t_min = jnp.full((R, 128), jnp.inf, jnp.float32)
        sid = jnp.full((R, 128), -1, jnp.int32)
        for s in range(S):
            t, valid = sphere_first_t(o, d, s)
            closer = valid & (t < t_min)
            t_min = jnp.where(closer, t, t_min)
            sid = jnp.where(closer, s, sid)
        hit = sid >= 0
        return hit, jnp.where(hit, t_min, 0.0), sid

    def visibility_from(light, x):
        """Reference visibility: cast FROM the light TOWARD x
        (pathTracingUtilities.h:39-53)."""
        lx = [x[0] - light[0], x[1] - light[1], x[2] - light[2]]
        dist = norm3(lx)
        d = scale3(lx, 1.0 / dist)
        hit, t, _ = nearest_id_t(light, d)
        return (t > dist * (1.0 - 1024.0 * F32EPS)) | ~hit, dist

    # Beckmann / Fresnel --------------------------------------------------
    def ndf_beckmann(cosine, alpha):
        c2 = cosine * cosine
        safe_c2 = jnp.maximum(c2, 1e-4)
        a2 = jnp.maximum(alpha * alpha, 1e-8)
        tan2 = jnp.maximum(1.0 - c2, 0.0) / safe_c2
        val = jnp.exp(-tan2 / a2) / (math.pi * a2 * safe_c2 * safe_c2)
        return jnp.where(cosine >= 0.0, val, 0.0)

    def g1(n, wv, wh, alpha):
        cos = dot3(n, wv)
        sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
        tan = sin / jnp.where(cos != 0.0, cos, 1e-12)
        a = 1.0 / (jnp.maximum(alpha, 1e-6) * jnp.where(tan != 0.0, tan, 1e-12))
        rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
        g = jnp.where(a < 1.6, rational, 1.0)
        same = (dot3(wv, wh) / jnp.where(cos != 0.0, cos, 1e-12)) > 0.0
        return jnp.where(same, g, 0.0)

    def fresnel_cond(cos_wh, eta, kappa):
        """Per-channel conductor Fresnel; eta/kappa per-lane scalars."""
        cos = cos_wh
        sin2 = jnp.maximum(1.0 - cos * cos, 1e-12)
        out = []
        for e, k in zip(eta, kappa):
            e2k2 = e * e - k * k - sin2
            a2b2 = jnp.sqrt(jnp.maximum(e2k2 * e2k2 + 4.0 * e * e * k * k, 1e-12))
            a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + e * e - k * k - sin2), 1e-12))
            perp = (a2b2 + cos * cos - 2.0 * a * cos) / (a2b2 + cos * cos + 2.0 * a * cos)
            sin4 = sin2 * sin2
            par = perp * (a2b2 * cos * cos + sin4 - 2.0 * a * cos * sin2) / (
                a2b2 * cos * cos + sin4 + 2.0 * a * cos * sin2)
            out.append(0.5 * (par + perp))
        return out

    def fr_microfacet(at, wi_l, wh_l, wo_l):
        """Cook-Torrance in the LOCAL frame (n = +z)."""
        nz = [jnp.zeros_like(wi_l[0]), jnp.zeros_like(wi_l[0]),
              jnp.ones_like(wi_l[0])]
        den = 4.0 * jnp.maximum(jnp.abs(wi_l[2]) * jnp.abs(wo_l[2]), 1e-12)
        f = fresnel_cond(dot3(wi_l, wh_l), (at["er"], at["eg"], at["eb"]),
                         (at["kr"], at["kg"], at["kb"]))
        dg = ndf_beckmann(wh_l[2], at["alpha"]) * g1(nz, wi_l, wh_l, at["alpha"]) \
            * g1(nz, wo_l, wh_l, at["alpha"]) / den
        return [f[0] * dg, f[1] * dg, f[2] * dg]

    def fresnel_die(cos_t, cos_i):
        par = (GLASS_ETA_T * cos_i - GLASS_ETA_I * cos_t) / (
            GLASS_ETA_T * cos_i + GLASS_ETA_I * cos_t)
        perp = (GLASS_ETA_I * cos_i - GLASS_ETA_T * cos_t) / (
            GLASS_ETA_I * cos_i + GLASS_ETA_T * cos_t)
        return 0.5 * (par * par + perp * perp)

    def refract_quirk(wo, n):
        """Reference refraction incl. the stray -1 (microFacetUtilities.h:123-141)."""
        wo_l = to_local(n, wo)
        cos_i = dot3(wo, n)
        inv_ratio = GLASS_ETA_I / GLASS_ETA_T
        s2 = jnp.maximum(1.0 - inv_ratio * inv_ratio * (1.0 - cos_i * cos_i), 1e-12)
        cos_t = jnp.sqrt(s2)
        ratio = -(GLASS_ETA_T / GLASS_ETA_I)
        wt_l = [wo_l[0] * ratio, wo_l[1] * ratio, cos_t - 1.0]
        return normalize3(from_local(n, wt_l)), cos_t

    def cone_dir(wc, cos_max, u1, u2):
        ct = jnp.clip((1.0 - u1) + u1 * cos_max, -1.0, 1.0)
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 1e-12))
        phi = TWO_PI * u2
        local = [st * jnp.cos(phi), st * jnp.sin(phi), ct]
        return normalize3(from_local(wc, local))

    def cone_pdf(cos_max):
        return 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_max, 1e-12))

    def atan_poly(z):
        """Minimax atan on |z| <= 1 (max err ~1e-5 rad) — Mosaic lowers no
        atan/atan2/tan primitives, so the equi-angular path builds its own
        from polynomial + sin/cos."""
        z2 = z * z
        return z * (0.99997726 + z2 * (-0.33262347 + z2 * (
            0.19354346 + z2 * (-0.11643287 + z2 * (
                0.05265332 + z2 * -0.01172120)))))

    def atan2_posx(y, x):
        """atan2(y, x) for x > 0 (the equi-angular D is floored positive)."""
        z = y / x
        inv = jnp.abs(z) > 1.0
        zz = jnp.where(inv, 1.0 / jnp.where(z != 0.0, z, 1.0), z)
        p = atan_poly(zz)
        sgn = jnp.where(z >= 0.0, 1.0, -1.0)
        return jnp.where(inv, sgn * (math.pi / 2.0) - p, p)

    def tan_sc(t):
        return jnp.sin(t) / jnp.cos(t)

    def cosine_hemi(n, u1, u2):
        ct = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        st = jnp.sqrt(jnp.maximum(u1, 0.0))
        phi = TWO_PI * u2
        return normalize3(from_local(n, [st * jnp.cos(phi), st * jnp.sin(phi), ct]))

    def uniform_sphere(u1, u2):
        ct = 1.0 - 2.0 * u1
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        phi = TWO_PI * u2
        return [st * jnp.cos(phi), st * jnp.sin(phi), ct]

    def beckmann_wh(alpha, u1, u2):
        t2 = jnp.maximum(-(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u1, 1e-20)),
                         1e-20)
        ct = jax.lax.rsqrt(1.0 + t2)
        st = jnp.sqrt(t2) * ct
        phi = TWO_PI * u2
        return [st * jnp.cos(phi), st * jnp.sin(phi), ct]

    def sample_bsdf(rng, at, d, n):
        """bdsf (vptShadeMethods.h:16-59): (fs, wi, pdf)."""
        wo = [-d[0], -d[1], -d[2]]
        u1, u2, u_choice = rng(), rng(), rng()
        # lambert
        wi_l = cosine_hemi(n, u1, u2)
        cos_l = dot3(n, wi_l)
        pdf_l = cos_l / math.pi
        fs_l = [at["ar"] / math.pi, at["ag"] / math.pi, at["ab"] / math.pi]
        # dielectric
        wt, _ = refract_quirk(wo, n)
        fres = fresnel_die(dot3(n, wt), dot3(n, wo))
        refl = u_choice < fres
        ndotwo = dot3(n, wo)
        wr = normalize3([2.0 * ndotwo * n[i] - wo[i] for i in range(3)])
        wi_d = sel3(refl, wr, wt)
        cos_d = dot3(n, wi_d)
        inv_cos = 1.0 / jnp.where(cos_d != 0.0, cos_d, 1e-12)
        fs_d_s = jnp.where(refl, inv_cos * fres,
                           inv_cos * (1.0 - fres) * GLASS_ETA_T * GLASS_ETA_T)
        pdf_d = jnp.where(refl, fres, 1.0 - fres)
        # microfacet
        wh = from_local(n, beckmann_wh(at["alpha"], u1, u2))
        wh_dot_wo = dot3(wh, wo)
        wi_m = [2.0 * wh_dot_wo * wh[i] - wo[i] for i in range(3)]
        fs_m = fr_microfacet_global(at, wi_m, wh, wo, n)
        pdf_m = ndf_beckmann(dot3(wh, n), at["alpha"]) * dot3(wh, n) / (
            4.0 * jnp.maximum(jnp.abs(wh_dot_wo), 1e-12))
        is_m, is_d = at["is_mic"], at["is_die"]
        fs = sel3(is_m, fs_m, sel3(is_d, [fs_d_s] * 3, fs_l))
        wi = sel3(is_m, wi_m, sel3(is_d, wi_d, wi_l))
        pdf = jnp.where(is_m, pdf_m, jnp.where(is_d, pdf_d, pdf_l))
        return fs, wi, pdf

    def fr_microfacet_global(at, wi, wh, wo, n):
        """Cook-Torrance in the GLOBAL frame (bdsf path uses world vectors)."""
        den = 4.0 * jnp.maximum(jnp.abs(dot3(n, wi)) * jnp.abs(dot3(n, wo)), 1e-12)
        f = fresnel_cond(dot3(wi, wh), (at["er"], at["eg"], at["eb"]),
                         (at["kr"], at["kg"], at["kb"]))
        dg = ndf_beckmann(dot3(n, wh), at["alpha"]) * g1(n, wi, wh, at["alpha"]) \
            * g1(n, wo, wh, at["alpha"]) / den
        return [f[0] * dg, f[1] * dg, f[2] * dg]

    def eval_fr_nee(at, n, wray, wi):
        """Light-strategy fr: lambert / 0 (dielectric) / local microfacet
        (samplingFunctions.h:163-194)."""
        wi_l = to_local(n, wi)
        wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
        wh = normalize3(add3(wi_l, wo_l))
        fr_m = fr_microfacet(at, wi_l, wh, wo_l)
        fr_lam = [at["ar"] / math.pi, at["ag"] / math.pi, at["ab"] / math.pi]
        zero = jnp.zeros_like(fr_lam[0])
        out = []
        for i in range(3):
            v = jnp.where(at["is_mic"], fr_m[i],
                          jnp.where(at["is_die"], zero, fr_lam[i]))
            out.append(v)
        return out

    def bsdf_pdf_for_dir(at, n, wo, wi, u_flip):
        pdf_l = dot3(n, wi) / math.pi
        wt, _ = refract_quirk(wo, n)
        fres = fresnel_die(dot3(n, wt), dot3(n, wo))
        pdf_d = jnp.where(u_flip > fres, 1.0 - fres, fres)
        wh = normalize3(add3(wi, wo))
        pdf_m = ndf_beckmann(dot3(wh, n), at["alpha"]) * dot3(wh, n) / (
            4.0 * jnp.maximum(jnp.abs(dot3(wo, wh)), 1e-12))
        return jnp.where(at["is_mic"], pdf_m,
                         jnp.where(at["is_die"], pdf_d, pdf_l))

    def power_h(f, g):
        fc = jnp.clip(f, 0.0, 1e12)
        gc = jnp.clip(g, 0.0, 1e12)
        ratio = gc / jnp.where(fc > 0.0, fc, 1.0)
        return jnp.where(fc > 0.0, 1.0 / (1.0 + ratio * ratio), 0.0)

    # ---------------- the kernel ----------------------------------------
    def kernel(seed_ref, base_ref, out_r, out_g, out_b):
        pid = pl.program_id(0)
        base = base_ref[0] + pid * LANES
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        pixel = jnp.minimum(base + row * 128 + col, npix - 1)
        px = (pixel % width).astype(jnp.float32)
        py = (height - 1 - pixel // width).astype(jnp.float32)

        def camera_ray(rng):
            u = rng() if jitter else jnp.full((R, 128), 0.5, jnp.float32)
            v = rng() if jitter else jnp.full((R, 128), 0.5, jnp.float32)
            sx = (px + u - 0.5) / width - 0.5
            sy = (py + v - 0.5) / height - 0.5
            d = [cx[i] * sx + cy[i] * sy + cam_d[i] for i in range(3)]
            return normalize3(d)

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
                lc = sel3(m, [jnp.float32(sc["c"][e][i]) + z for i in range(3)], lc)
                lrad = sel3(m, [jnp.float32(sc["rad"][e][i]) + z for i in range(3)], lrad)
                lr = jnp.where(m, jnp.float32(sc["r"][e]), lr)
                lid = jnp.where(m, e, lid)
            return lc, lrad, lr, lid

        def plight_term(at, xs, n, d, lc, lrad):
            """pLight (vptShadeMethods.h:62-91), no material-3 shells so the
            multipleT fallback reduces to visibilityVPT == visibility."""
            vis, dist = visibility_from(lc, xs)
            inv_d2 = 1.0 / jnp.maximum(dist * dist, 1e-20)
            le = [lrad[i] * jnp.where(vis, inv_d2, 0.0) for i in range(3)]
            wi = normalize3([lc[0] - xs[0], lc[1] - xs[1], lc[2] - xs[2]])
            fr = eval_fr_nee_plight(at, n, d, wi)
            cosw = dot3(n, wi)
            return [le[i] * fr[i] * cosw for i in range(3)]

        def eval_fr_nee_plight(at, n, wray, wi):
            """pLight's fr: microfacet local / lambert (NOT zero for
            dielectric — the reference's pLight has no dielectric branch,
            vptShadeMethods.h:83-87)."""
            wi_l = to_local(n, wi)
            wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
            wh = normalize3(add3(wi_l, wo_l))
            fr_m = fr_microfacet(at, wi_l, wh, wo_l)
            fr_lam = [at["ar"] / math.pi, at["ag"] / math.pi, at["ab"] / math.pi]
            return sel3(at["is_mic"], fr_m, fr_lam)

        def mis_v2(rng, at, xs, n, d):
            """MISv2 (misSamplingFunctions.h:96-170) over the static
            spherical-emitter set."""
            acc = [jnp.zeros((R, 128), jnp.float32) for _ in range(3)]
            wo = [-d[0], -d[1], -d[2]]
            for e in mis_lights:
                ec = sc["c"][e]; er = float(sc["r"][e]); erad = sc["rad"][e]
                cxv = [jnp.float32(ec[i]) - xs[i] for i in range(3)]
                normcx = norm3(cxv)
                wc = scale3(cxv, 1.0 / normcx)
                ratio = er / normcx
                cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
                wi = cone_dir(wc, cos_max, rng(), rng())
                hit, _, sid = nearest_id_t(xs, wi)
                visible = hit & (sid == e)
                fr = eval_fr_nee(at, n, d, wi)
                fpdf = cone_pdf(cos_max)
                tr = jnp.exp(-sigma_t * normcx)
                w_vis = jnp.where(visible, tr * dot3(n, wi) / fpdf, 0.0)
                gpdf = bsdf_pdf_for_dir(at, n, wo, wi, rng())
                wf = power_h(fpdf, gpdf)
                for i in range(3):
                    acc[i] += jnp.float32(erad[i]) * fr[i] * w_vis * wf
            # BSDF strategy: sample all lobes, ONE trace (mis.py rationale)
            u1, u2, u_choice = rng(), rng(), rng()
            wi_l = cosine_hemi(n, u1, u2)
            wt, _ = refract_quirk(wo, n)
            fres = fresnel_die(dot3(n, wt), dot3(n, wo))
            refl = u_choice < fres
            ndotwo = dot3(n, wo)
            wr = normalize3([2.0 * ndotwo * n[i] - wo[i] for i in range(3)])
            wi_d = sel3(refl, wr, wt)
            wh_loc = beckmann_wh(at["alpha"], u1, u2)
            wo_loc = to_local(n, wo)
            whw = 2.0 * dot3(wh_loc, wo_loc)
            wi_m_loc = normalize3([whw * wh_loc[i] - wo_loc[i] for i in range(3)])
            wi_m = normalize3(from_local(n, wi_m_loc))
            wi_sel = sel3(at["is_mic"], wi_m, sel3(at["is_die"], wi_d, wi_l))
            hit, _, sid = nearest_id_t(xs, wi_sel)
            # Le and cos_theta_max of whatever we hit (per-sphere selects)
            z = jnp.zeros((R, 128), jnp.float32)
            le = [z, z, z]
            hit_r = z
            hc = [z, z, z]
            for s in range(S):
                m = sid == s
                le = sel3(m, [jnp.float32(sc["rad"][s][i]) + z for i in range(3)], le)
                hit_r = jnp.where(m, jnp.float32(sc["r"][s]), hit_r)
                hc = sel3(m, [jnp.float32(sc["c"][s][i]) + z for i in range(3)], hc)
            cos_l = dot3(n, wi_l)
            gpdf_l = cos_l / math.pi
            g_l = [le[i] * (at["ar"], at["ag"], at["ab"])[i] / math.pi
                   * cos_l / jnp.where(gpdf_l != 0.0, gpdf_l, 1e-12) for i in range(3)]
            cos_d = jnp.abs(dot3(n, wi_d))
            scale_d = jnp.where(refl, 1.0, GLASS_ETA_T * GLASS_ETA_T) / jnp.maximum(cos_d, 1e-12)
            g_d = [le[i] * scale_d for i in range(3)]
            gpdf_d = jnp.where(refl, fres, 1.0 - fres)
            nz = [jnp.zeros_like(z), jnp.zeros_like(z), jnp.ones_like(z)]
            fr_m = fr_microfacet(at, wi_m_loc, wh_loc, wo_loc)
            gpdf_m = ndf_beckmann(wh_loc[2], at["alpha"]) * wh_loc[2] / (
                4.0 * jnp.maximum(jnp.abs(dot3(wo_loc, wh_loc)), 1e-12))
            g_m = [le[i] * fr_m[i] * wi_m_loc[2] / jnp.maximum(gpdf_m, 1e-20)
                   for i in range(3)]
            g = sel3(at["is_mic"], g_m, sel3(at["is_die"], g_d, g_l))
            gpdf = jnp.where(at["is_mic"], gpdf_m,
                             jnp.where(at["is_die"], gpdf_d, gpdf_l))
            pos_all = (g[0] > 0.0) & (g[1] > 0.0) & (g[2] > 0.0)
            # logical form: a bool-valued where lowers to an i8->i1 trunc
            # Mosaic rejects
            gate = (at["is_mic"] & (g[0] > 0.0)) | (~at["is_mic"] & pos_all)
            # cos_theta_max toward the hit sphere (cosinethetaMax)
            hcx = [hc[i] - xs[i] for i in range(3)]
            n2 = jnp.maximum(dot3(hcx, hcx), 1e-20)
            cmax = jnp.sqrt(jnp.maximum(1.0 - hit_r * hit_r / n2, 1e-12))
            fpdf_h = cone_pdf(cmax)
            wg = jnp.where(gate & hit, power_h(gpdf, fpdf_h), 0.0)
            for i in range(3):
                acc[i] += g[i] * wg
            return acc

        def medium_nee(rng, xt, lc, lrad, lr, lid):
            """freeSingleScattering (volumetricBasicFunctions.h:284-340)
            with the missing-else point kill => point sources contribute 0
            (media/nee.py); sphere sources: cone sample + id match."""
            wc = [lc[i] - xt[i] for i in range(3)]
            wc_mag = norm3(wc)
            wc_n = scale3(wc, 1.0 / wc_mag)
            ratio = lr / wc_mag
            cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
            wl = cone_dir(wc_n, cos_max, rng(), rng())
            hit, t, sid = nearest_id_t(xt, wl)
            visible = hit & (sid == lid) & (lr > 0.0)
            w = jnp.where(visible,
                          jnp.exp(-sigma_t * t) * INV_4PI / cone_pdf(cos_max),
                          0.0)
            return [lrad[i] * w for i in range(3)]

        def bounce(rng, state):
            o, d, tp, L, alive, depth, samples, it = state
            u_rr = rng()
            alive = alive & (u_rr >= q)
            hit, t, at = nearest(o, d)
            t_eff = jnp.where(hit, t, BIG)
            xs = [o[i] + t_eff * d[i] for i in range(3)]
            nrm = normalize3([xs[0] - at["cx"], xs[1] - at["cy"], xs[2] - at["cz"]])
            lc, lrad, lr, lid = light_attrs(rng())
            prob_source = 1.0 / n_em

            u_dist = rng()
            if distance == "free":
                d_s = -jnp.log1p(-u_dist) / sigma_t
                surface = (d_s > t_eff) & hit
                xt = [o[i] + d_s * d[i] for i in range(3)]
                pdf_success = None          # PBRT cancellation: not needed
                t_xt = None
            else:
                # equi-angular (equiAngularParams2 + sample/pdf,
                # volumetricBasicFunctions.h:209-223, vptSamplingFunctions.h:54-62)
                lo = [lc[i] - o[i] for i in range(3)]
                delta = dot3(lo, d)
                D = jnp.sqrt(jnp.maximum(dot3(lo, lo) - delta * delta, 1e-12))
                th_a = atan2_posx(-delta, D)
                th_b = atan2_posx(t_eff - delta, D)
                sample_t = D * tan_sc((1.0 - u_dist) * th_a + u_dist * th_b)
                d_along = sample_t + delta
                xt = [o[i] + d_along * d[i] for i in range(3)]
                dist_pdf = D / (jnp.maximum(jnp.abs(th_b - th_a), 1e-12)
                                * (sample_t * sample_t + D * D))
                tr_actual = jnp.where(hit, jnp.exp(-sigma_t * t), 0.0)
                u_ev = rng()
                surface = (u_ev <= tr_actual) & hit
                # pSuccess = pdf * (1 - Tr) (vptShadeMethods.h:1093)
                pdf_success = dist_pdf * jnp.maximum(1.0 - tr_actual, 1e-20)
                t_xt = jnp.exp(-sigma_t * jnp.abs(d_along))

            em_hit = surface & at["is_em"]
            credit = alive & em_hit & (depth == 0) if nee else alive & em_hit
            rad = [at["rr"], at["rg"], at["rb"]]
            for i in range(3):
                L[i] = L[i] + jnp.where(credit, rad[i] * tp[i], 0.0)
            shade = alive & surface & ~em_hit

            if nee:
                lxs = [xs[i] - lc[i] for i in range(3)]
                trs = jnp.exp(-sigma_t * norm3(lxs))
                ldp = plight_term(at, xs, nrm, d, lc, lrad)
                ldm = mis_v2(rng, at, xs, nrm, d)
                for i in range(3):
                    ld = ldp[i] * trs / prob_source + ldm[i]
                    L[i] = L[i] + jnp.where(shade, ld * tp[i] / cp, 0.0)

            fs, wi_s, pdf_b = sample_bsdf(rng, at, d, nrm)
            cosine = dot3(nrm, wi_s)
            wscale = cosine / (cp * jnp.maximum(pdf_b, 1e-20))
            tp_surface = [tp[i] * fs[i] * wscale for i in range(3)]

            medium = alive & ~surface
            u_p1, u_p2 = rng(), rng()
            wi_m = uniform_sphere(u_p1, u_p2)
            if distance == "free":
                # free-flight: transmittance/pdf cancel analytically (the
                # PBRT simplification, vptShadeMethods.h:1248) — only
                # sigma_s/sigma_t survives
                if nee:
                    ld_med = medium_nee(rng, xt, lc, lrad, lr, lid)
                    for i in range(3):
                        L[i] = L[i] + jnp.where(
                            medium,
                            ld_med[i] / prob_source * tp[i] * (albedo_ratio / cp),
                            0.0)
                tp_medium = [tp[i] * (albedo_ratio / cp) for i in range(3)]
            else:
                # equi-angular: T and pdf appear explicitly
                # (vptShadeMethods.h:1134-1146)
                w_med = sc["sigma_s"] * t_xt / (cp * pdf_success)
                if nee:
                    ld_med = medium_nee(rng, xt, lc, lrad, lr, lid)
                    scale = t_xt * sc["sigma_s"] / prob_source / (pdf_success * cp)
                    for i in range(3):
                        L[i] = L[i] + jnp.where(
                            medium, ld_med[i] * scale * tp[i], 0.0)
                tp_medium = [tp[i] * w_med for i in range(3)]

            o = sel3(shade, xs, sel3(medium, xt, o))
            d = sel3(shade, wi_s, sel3(medium, wi_m, d))
            tp = sel3(shade, tp_surface, sel3(medium, tp_medium, tp))
            alive2 = (shade | medium) & (depth + 1 < max_bounces)
            depth = jnp.where(alive2, depth + 1, depth)
            return o, d, tp, L, alive2, depth, samples, it

        def loop_body(state):
            o, d, tp, L, alive_i, depth, samples, it, rngs = state
            alive = alive_i > 0      # carried as i32: Mosaic cannot yield i1
            rng = Pcg(rngs)
            # regenerate dead lanes with samples remaining
            need = (~alive) & (samples < spp)
            nd = camera_ray(rng)
            one = jnp.ones((R, 128), jnp.float32)
            o = sel3(need, [jnp.float32(cam_o[i]) + jnp.zeros((R, 128), jnp.float32)
                            for i in range(3)], o)
            d = sel3(need, nd, d)
            tp = sel3(need, [one, one, one], tp)
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
        # golden-ratio and murmur3 odd constants as wrapped int32
        rngs0 = (lane * jnp.int32(-1640531527)) ^ (
            seed_ref[0] * jnp.int32(-2048144789) + jnp.int32(1))
        rngs0 = rngs0 * jnp.int32(747796405) + jnp.int32(-1403630843)
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

    @jax.jit
    def run(seed):
        seeds = jnp.asarray([seed], jnp.int32)
        base = jnp.asarray([0], jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles * R, 128), jnp.float32)
                for _ in range(3)
            ],
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(seeds, base)
        flat = jnp.stack([o.reshape(-1) for o in outs], axis=-1)
        return flat[:npix] / spp

    return run


# integrator name -> (nee, distance) for the kernel's supported subset
PALLAS_INTEGRATORS = {
    "explicit_free": (True, "free"),
    "iterative_vpt_free": (True, "free"),
    "implicit_free": (False, "free"),
    "explicit_equiangular": (True, "equiangular"),
    "mis_hybrid": (True, "equiangular"),
}


def render_pallas(scene: Scene, camera, cfg, seed: int | None = None,
                  interpret: bool = False):
    """Render with the fused Pallas kernel; returns (H, W, 3)."""
    nee, distance = PALLAS_INTEGRATORS[cfg.integrator]
    run = build_tile_renderer(
        scene, camera, cfg.width, cfg.height, cfg.spp,
        nee=nee, distance=distance,
        continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
        jitter=cfg.jitter, interpret=interpret,
    )
    out = run(cfg.seed if seed is None else seed)
    return out.reshape(cfg.height, cfg.width, 3)
