"""Shared Pallas-kernel primitives for the fused TPU renderers.

Everything here is shape-agnostic (works on any broadcastable f32 arrays, the
kernels use (R, 128) lane tiles) and Mosaic-lowerable: no atan/tan primitives
(polynomial atan instead), no uint32<->f32 casts (PCG draws via mantissa
bitcast), no i1 carries (callers keep masks as i32/f32 where needed).

Scene-dependent helpers take `sc` — the python-constant scene structure from
`wavefront._scene_consts` — plus, where material/emission VALUES must stay
differentiable (the diff kernel reads them from SMEM), explicit `alb`/`rad`
tables: nested tuples alb[s][c] of per-sphere-channel scalars that are python
floats in the baked kernels and traced SMEM reads in the differentiable ones.

Reference citations live with the algorithms: Sphere.h:27-37 (intersect
rescue), mathUtilities.h:10-19 (ONB), microFacetUtilities.h (Beckmann /
Fresnel / the stray -1 refraction quirk at :133), samplingFunctions.h
(cone/cosine/sphere samplers), pathTracingUtilities.h:39-53 (light->point
visibility), vptShadeMethods.h:16-59 (bdsf dispatcher).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e8
EPS_T = 1e-4
F32EPS = float(np.finfo(np.float32).eps)
INV_4PI = 1.0 / (4.0 * math.pi)
INV_PI = 1.0 / math.pi
TWO_PI = 2.0 * math.pi
GLASS_ETA_I, GLASS_ETA_T = 1.0, 1.5


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


def pcg_seed(lane, seed):
    """Per-lane initial PCG state: hash(global seed, lane id) + one warmup
    step to decorrelate the low-entropy init (golden-ratio + murmur3 odd
    constants as wrapped int32)."""
    s = (lane * jnp.int32(-1640531527)) ^ (
        seed * jnp.int32(-2048144789) + jnp.int32(1))
    return s * jnp.int32(747796405) + jnp.int32(-1403630843)


# ---- low-discrepancy sampler (sampler="ld"), shared by all three fused
# kernels (wavefront/diff/geom). ONE definition: the cross-kernel
# contracts (geom primal == wavefront forward draw-for-draw; CRN strata
# fixed across FD probes) require the constants and the offset-stream
# derivation to stay bit-identical everywhere.
#
# R5 Kronecker sequence: a_i = 1/g^i for the generalized plastic number g
# solving x^6 = x + 1. Dims: pixel u, pixel v, depth-0 distance, depth-0
# RR, depth-0 light pick.
LD_ALPHA = (0.8812714616335696, 0.7766393890897682, 0.6844301295853426,
            0.6031687406857282, 0.5315553977157913)


def ld_offsets(lane, seed):
    """Per-pixel Cranley-Patterson rotation offsets (5 uniforms) from a
    PCG stream decorrelated from the path stream."""
    rng_off = Pcg(pcg_seed(lane ^ jnp.int32(0x2545F491),
                           seed + jnp.int32(747796405)))
    return rng_off(), rng_off(), rng_off(), rng_off(), rng_off()


def ld_strat(a, off, s_f):
    """Stratified uniform: frac(a * sample_index + offset)."""
    x = a * s_f + off
    return x - jnp.floor(x)


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


# --- scene intersection over baked python-constant geometry ----------------

def sphere_first_t(sc, o, d, s):
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


def nearest(sc, o, d, alb, rad):
    """Unrolled scene intersect with branchless attribute select.
    `alb`/`rad` are nested per-sphere-channel scalar tables (python floats
    or traced SMEM reads). Returns (hit, t, attrs dict)."""
    from ..scene.scene import DIELECTRIC, MICROFACET

    S = len(sc["r"])
    z = jnp.zeros_like(o[0])
    t_min = z + jnp.inf
    hit = z > 1.0
    at = {
        "cx": z, "cy": z, "cz": z, "ar": z, "ag": z, "ab": z,
        "rr": z, "rg": z, "rb": z, "er": z, "eg": z, "eb": z,
        "kr": z, "kg": z, "kb": z, "alpha": z,
        # material/emitter flags as f32 0/1: Mosaic cannot lower the
        # i8->i1 truncation a bool-scalar select produces
        "em_f": z, "mic_f": z, "die_f": z,
        "sid": jnp.full(o[0].shape, -1, jnp.int32),
    }
    for s in range(S):
        t, valid = sphere_first_t(sc, o, d, s)
        closer = valid & (t < t_min)
        t_min = jnp.where(closer, t, t_min)
        hit = hit | closer
        c = sc["c"][s]
        eta = sc["eta"][s]; kap = sc["kap"][s]
        w = lambda const, old: jnp.where(closer, const, old)
        at["cx"] = w(c[0], at["cx"]); at["cy"] = w(c[1], at["cy"]); at["cz"] = w(c[2], at["cz"])
        at["ar"] = w(alb[s][0], at["ar"]); at["ag"] = w(alb[s][1], at["ag"]); at["ab"] = w(alb[s][2], at["ab"])
        at["rr"] = w(rad[s][0], at["rr"]); at["rg"] = w(rad[s][1], at["rg"]); at["rb"] = w(rad[s][2], at["rb"])
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


def nearest_id_t(sc, o, d, skip=()):
    """Light trace: nearest id + t only. `skip` is a static tuple of sphere
    indices excluded from the scan (intersectVPT skips material==3,
    volumetricBasicFunctions.h:64-89)."""
    S = len(sc["r"])
    z = jnp.zeros_like(o[0])
    t_min = z + jnp.inf
    sid = jnp.full(o[0].shape, -1, jnp.int32)
    for s in range(S):
        if s in skip:
            continue
        t, valid = sphere_first_t(sc, o, d, s)
        closer = valid & (t < t_min)
        t_min = jnp.where(closer, t, t_min)
        sid = jnp.where(closer, s, sid)
    hit = sid >= 0
    return hit, jnp.where(hit, t_min, 0.0), sid


def sphere_both_roots(sc, o, d, s):
    """Raw both-roots of sphere s (Sphere::intersectVPT, Sphere.h:39-45):
    (t1, t2), both 0 when det < 0."""
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
    z = jnp.zeros_like(t1)
    return jnp.where(pos, t1, z), jnp.where(pos, t2, z)


def visibility_from(sc, light, x):
    """Reference visibility: cast FROM the light TOWARD x
    (pathTracingUtilities.h:39-53). Returns (visible, dist, unit light->x
    direction) — callers reuse the direction (wi = -d) instead of paying a
    second normalize."""
    lx = [x[0] - light[0], x[1] - light[1], x[2] - light[2]]
    dist = norm3(lx)
    d = scale3(lx, 1.0 / dist)
    hit, t, _ = nearest_id_t(sc, light, d)
    return (t > dist * (1.0 - 1024.0 * F32EPS)) | ~hit, dist, d


def plight_le_scale(sc, lc, xs):
    """pLight's light-to-point attenuation (vptShadeMethods.h:62-91):
    visible -> 1/d^2; with material-3 shells in the scene the reference's
    cascade applies — visibilityVPT (shells ignored) -> attenuate by
    multipleT at the hardcoded sigma_t = 0.05 + 0.009 (vptShadeMethods.h:72)
    — else black. Shared by the fused forward kernel and the differentiable
    pair (the multipleT fallback's sigma is a baked reference constant, so
    this factor is theta-independent for every diff-kernel parameter).
    Returns (le_scale, dist, unit light->xs direction)."""
    lx = [xs[0] - lc[0], xs[1] - lc[1], xs[2] - lc[2]]
    dist = norm3(lx)
    inv_d = 1.0 / dist              # norm3 floors at 1e-10, so finite
    dl = scale3(lx, inv_d)
    hit, t, _ = nearest_id_t(sc, lc, dl)
    slack = 1.0 - 1024.0 * F32EPS
    vis = (t > dist * slack) | ~hit
    inv_d2 = inv_d * inv_d
    if not sc["vol"]:
        return jnp.where(vis, inv_d2, 0.0), dist, dl
    hit_v, t_v, _ = nearest_id_t(sc, lc, dl, skip=sc["vol"])
    vis_vpt = (t_v > dist * slack) | ~hit_v
    # multipleT on the reversed (xs -> light) ray: roots are dist-t2 /
    # dist-t1 (volumetricBasicFunctions.h:26-57)
    tau = jnp.zeros_like(dist)
    st_fb = 0.05 + 0.009            # vptShadeMethods.h:72
    for sv in sc["vol"]:
        t1, t2 = sphere_both_roots(sc, lc, dl, sv)
        r1 = dist - t2
        r2 = dist - t1
        tau = tau + jnp.where(r2 < 0.0, st_fb * r1, 0.0)
        tau = tau + jnp.where(r2 - r1 > 0.0, st_fb * (r2 - r1), 0.0)
    mt = jnp.exp(-tau)
    return jnp.where(vis, inv_d2, jnp.where(vis_vpt, inv_d2 * mt, 0.0)), \
        dist, dl


# --- Beckmann / Fresnel ----------------------------------------------------

def ndf_beckmann(cosine, alpha):
    # two reciprocals shared across the exponent and the prefactor (the
    # naive form spends three divs; div is ~3.6x an fma on the VPU)
    c2 = cosine * cosine
    inv_c2 = 1.0 / jnp.maximum(c2, 1e-4)
    inv_a2 = 1.0 / jnp.maximum(alpha * alpha, 1e-8)
    tan2 = jnp.maximum(1.0 - c2, 0.0) * inv_c2
    val = jnp.exp(-tan2 * inv_a2) * (inv_a2 * INV_PI) * (inv_c2 * inv_c2)
    return jnp.where(cosine >= 0.0, val, 0.0)


def g1(n, wv, wh, alpha):
    cos = dot3(n, wv)
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    # a = 1/(alpha*tan) = cos/(alpha*sin), one div; the sin floor reproduces
    # the old tan != 0 guard (sin >= 0, so sign still follows cos)
    cos_g = jnp.where(cos != 0.0, cos, 1e-12)
    a = cos_g / (jnp.maximum(alpha, 1e-6) *
                 jnp.where(sin != 0.0, sin, 1e-12 * cos_g))
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    g = jnp.where(a < 1.6, rational, 1.0)
    # dot/cos > 0  <=>  dot*cos > 0 (the old guard put 1e-12 > 0 in cos's
    # place when cos == 0, i.e. the test degenerated to dot > 0 — keep that)
    same = dot3(wv, wh) * cos_g > 0.0
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
        # perp = Pn/Pd, par = perp*Qn/Qd; 0.5*(par+perp) = 0.5*Pn*(Qn+Qd)
        # / (Pd*Qd) — one div per channel instead of two
        c2 = cos * cos
        pn = a2b2 + c2 - 2.0 * a * cos
        pd = a2b2 + c2 + 2.0 * a * cos
        sin4 = sin2 * sin2
        qn = a2b2 * c2 + sin4 - 2.0 * a * cos * sin2
        qd = a2b2 * c2 + sin4 + 2.0 * a * cos * sin2
        out.append(0.5 * pn * (qn + qd) / (pd * qd))
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


def fr_microfacet_global(at, wi, wh, wo, n):
    """Cook-Torrance in the GLOBAL frame (bdsf path uses world vectors)."""
    den = 4.0 * jnp.maximum(jnp.abs(dot3(n, wi)) * jnp.abs(dot3(n, wo)), 1e-12)
    f = fresnel_cond(dot3(wi, wh), (at["er"], at["eg"], at["eb"]),
                     (at["kr"], at["kg"], at["kb"]))
    dg = ndf_beckmann(dot3(n, wh), at["alpha"]) * g1(n, wi, wh, at["alpha"]) \
        * g1(n, wo, wh, at["alpha"]) / den
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


# --- samplers --------------------------------------------------------------

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


def hg_phase_const(cos_t, g):
    """Henyey-Greenstein phase value for a BUILD-TIME python-const g != 0
    (media/medium.hg_phase with the division replaced by rsqrt^3: 1/d^1.5 =
    rsqrt(d)^3 — division-free per the round-2 division diet)."""
    den = jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-12)
    rs = jax.lax.rsqrt(den)
    return (INV_4PI * (1.0 - g * g)) * rs * rs * rs


def hg_dir(d, g, u1, u2):
    """Sample a Henyey-Greenstein direction around the incoming propagation
    direction d for a BUILD-TIME python-const g != 0; the anisotropic branch
    of media/medium.phase_sample (same (u1, u2) -> direction mapping).
    phase/pdf == 1 exactly, so the caller's throughput weight is unchanged
    from the isotropic case. Returns (wi, cos_theta)."""
    s = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_t = jnp.clip((1.0 + g * g - s * s) * (1.0 / (2.0 * g)), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u2
    local = [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t]
    return normalize3(from_local(d, local)), cos_t


def hg_dir_traced(d, g, u1, u2):
    """HG scatter sampler for a TRACED scalar g (the diff kernel's
    diff_g mode), with the engine's isotropic snap at |g| <= 1e-3
    (media/medium.phase_sample: the inversion divides by 2g and loses all
    precision there). Returns the sampled direction."""
    aniso = jnp.abs(g) > 1e-3
    g_safe = jnp.where(aniso, g, 0.5)      # keep the unselected lane finite
    s = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_t = jnp.clip((1.0 + g_safe * g_safe - s * s) / (2.0 * g_safe),
                     -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u2
    local = [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t]
    hg = normalize3(from_local(d, local))
    iso = uniform_sphere(u1, u2)
    m = jnp.broadcast_to(aniso, u1.shape)
    return sel3(m, hg, iso)


def dlog_hg_dg(cos_t, g):
    """d/dg of log hg_phase(cos, g) = -2g/(1-g^2) - 3(g-cos)/(1+g^2-2g cos)
    — the phase-draw score factor of the unbiased dL/dg estimator
    (engine.IntegratorSpec(sigma_score=True) derives the same via autodiff
    of log p; exactly 3 cos at g == 0)."""
    den = jnp.maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-12)
    return (-2.0 * g / jnp.maximum(1.0 - g * g, 1e-6)
            - 3.0 * (g - cos_t) / den)


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
    pdf_l = cos_l * INV_PI
    fs_l = [at["ar"] * INV_PI, at["ag"] * INV_PI, at["ab"] * INV_PI]
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


def eval_fr_nee(at, n, wray, wi):
    """Light-strategy fr: lambert / 0 (dielectric) / local microfacet
    (samplingFunctions.h:163-194)."""
    wi_l = to_local(n, wi)
    wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
    wh = normalize3(add3(wi_l, wo_l))
    fr_m = fr_microfacet(at, wi_l, wh, wo_l)
    fr_lam = [at["ar"] * INV_PI, at["ag"] * INV_PI, at["ab"] * INV_PI]
    zero = jnp.zeros_like(fr_lam[0])
    out = []
    for i in range(3):
        v = jnp.where(at["is_mic"], fr_m[i],
                      jnp.where(at["is_die"], zero, fr_lam[i]))
        out.append(v)
    return out


def eval_fr_nee_plight(at, n, wray, wi):
    """pLight's fr: microfacet local / lambert (NOT zero for
    dielectric — the reference's pLight has no dielectric branch,
    vptShadeMethods.h:83-87)."""
    wi_l = to_local(n, wi)
    wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
    wh = normalize3(add3(wi_l, wo_l))
    fr_m = fr_microfacet(at, wi_l, wh, wo_l)
    fr_lam = [at["ar"] * INV_PI, at["ag"] * INV_PI, at["ab"] * INV_PI]
    return sel3(at["is_mic"], fr_m, fr_lam)


def bsdf_pdf_for_dir(at, n, wo, wi, u_flip):
    pdf_l = dot3(n, wi) * INV_PI
    wt, _ = refract_quirk(wo, n)
    fres = fresnel_die(dot3(n, wt), dot3(n, wo))
    pdf_d = jnp.where(u_flip > fres, 1.0 - fres, fres)
    wh = normalize3(add3(wi, wo))
    pdf_m = ndf_beckmann(dot3(wh, n), at["alpha"]) * dot3(wh, n) / (
        4.0 * jnp.maximum(jnp.abs(dot3(wo, wh)), 1e-12))
    return jnp.where(at["is_mic"], pdf_m,
                     jnp.where(at["is_die"], pdf_d, pdf_l))


# --- heterogeneous density fields (media/density.py, baked form) ----------
# fc is the python-const structure from wavefront._scene_consts:
#   {"kind": "exp_height", "params": (k, y0), "majorant": m, "max_null": n}
#   {"kind": "blobs", "params": ((cx,cy,cz,r,w), ...), ...}
# Same formulas as media/density.py (incl. the clamped-exponent difference
# form and the A&S erf polynomial), so kernel/engine parity is exact by
# construction.

def erf_poly(x):
    """A&S 7.1.26 erf (max abs err 1.5e-7); exp-only, Mosaic-lowerable."""
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429)))) * jnp.exp(-a * a)
    return s * y


def field_density(fc, x):
    """Density multiplier d(x); x is a list of 3 lane arrays."""
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        return jnp.exp(jnp.clip(-k * (x[1] - y0), -80.0, 80.0))
    if fc["kind"] == "grid":
        return grid_density(fc, x)
    dens = None
    for (cx, cy, cz, r, w) in fc["params"]:
        dx = [x[0] - cx, x[1] - cy, x[2] - cz]
        g = w * jnp.exp(-0.5 * dot3(dx, dx) * (1.0 / (r * r)))
        dens = g if dens is None else dens + g
    return dens


# --- voxel-grid field (round 4): chunked lane-gather trilinear ------------
# The grid's flat values live in a (C, 128) VMEM table (fc["tab"], a value
# loaded from a kernel operand — baked python consts would bloat the kernel
# and freeze the one thing tomography trains). A per-lane lookup decomposes
# the flat index into (chunk, lane) and runs Mosaic's within-vreg lane
# gather (take_along_axis axis=1) against each broadcast 128-entry chunk,
# selected by chunk id — measured 1.3G lookups/s / 780M trilinear/s (16^3)
# on one v5e (tools/grid_gather_study.py). Transport uses the SAME
# canonical piecewise-constant ray model as media/density.py round 4
# (march [0, t_far] in n_march segments + exact constant tail), so
# kernel/engine parity is by construction and the sampling inversion is
# exact for the same tau every weight uses.

def grid_lookup(tab, idx):
    """tab: (C, 128) f32 value; idx: int32 lanes (flat, in [0, T))."""
    C = tab.shape[0]
    hi = jax.lax.shift_right_logical(idx, jnp.int32(7))
    lo = jnp.bitwise_and(idx, jnp.int32(127))
    r = jnp.zeros(idx.shape, jnp.float32)
    for j in range(C):
        row = tab[j, :].reshape(1, 128)
        g = jnp.take_along_axis(jnp.broadcast_to(row, idx.shape), lo, axis=1)
        r = jnp.where(hi == j, g, r)
    return r


def grid_lookup_pair(tab, idx):
    """(g[idx], g[idx+1]) from the bf16 z-pair table (wavefront.
    grid_table): one chunked lane gather + a 6-op bit unpack. A bf16 bit
    pattern in the TOP 16 bits of an f32 IS that value as f32."""
    w = grid_lookup(tab, idx)
    iw = jax.lax.bitcast_convert_type(w, jnp.int32)
    hi_bits = jnp.bitwise_and(iw, jnp.int32(-65536))        # 0xFFFF0000
    lo_bits = jax.lax.shift_left(iw, jnp.int32(16))
    return (jax.lax.bitcast_convert_type(hi_bits, jnp.float32),
            jax.lax.bitcast_convert_type(lo_bits, jnp.float32))


def grid_cell(fc, x):
    """Clamped trilinear cell of x: (base flat index, fx, fy, fz)."""
    nx, ny, nz = fc["dims"]
    ox, oy, oz = fc["origin"]
    sx, sy, sz = fc["spacing"]
    ux = jnp.clip((x[0] - ox) * (1.0 / sx) - 0.5, 0.0, nx - 1.0)
    uy = jnp.clip((x[1] - oy) * (1.0 / sy) - 0.5, 0.0, ny - 1.0)
    uz = jnp.clip((x[2] - oz) * (1.0 / sz) - 0.5, 0.0, nz - 1.0)
    ix = jnp.minimum(ux.astype(jnp.int32), nx - 2)
    iy = jnp.minimum(uy.astype(jnp.int32), ny - 2)
    iz = jnp.minimum(uz.astype(jnp.int32), nz - 2)
    fx = jnp.clip(ux - ix.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(uy - iy.astype(jnp.float32), 0.0, 1.0)
    fz = jnp.clip(uz - iz.astype(jnp.float32), 0.0, 1.0)
    base = (ix * ny + iy) * nz + iz
    return base, fx, fy, fz


def grid_density(fc, x):
    """Trilinear clamp-to-edge density (media/density.py GRID branch),
    4 z-pair gathers against the packed table."""
    nz = fc["dims"][2]
    snx = fc["dims"][1] * nz
    base, fx, fy, fz = grid_cell(fc, x)
    tab = fc["tab"]
    c000, c001 = grid_lookup_pair(tab, base)
    c010, c011 = grid_lookup_pair(tab, base + nz)
    c100, c101 = grid_lookup_pair(tab, base + snx)
    c110, c111 = grid_lookup_pair(tab, base + snx + nz)
    c00 = c000 + (c001 - c000) * fz
    c01 = c010 + (c011 - c010) * fz
    c10 = c100 + (c101 - c100) * fz
    c11 = c110 + (c111 - c110) * fz
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fx


def grid_cell_nearest(fc, x):
    """(base flat index, fz) of the xy-NEAREST / z-linear transport
    interpolant (DensityField.transport_interp == "nearest"): x and y snap
    to the nearest voxel center, z keeps the pair lerp the packed table
    gives for free. ONE pair gather per evaluation instead of four — the
    round-5 answer to the n>=24 gather wall (every per-gather alternative
    is measured-refuted in tools/grid_lookup_v2_study.py; the pc transport
    model's own O(t_far/M) march discretization dominates the sub-voxel
    interpolation error this trades away)."""
    nx, ny, nz = fc["dims"]
    ox, oy, oz = fc["origin"]
    sx, sy, sz = fc["spacing"]
    ux = jnp.clip((x[0] - ox) * (1.0 / sx) - 0.5, 0.0, nx - 1.0)
    uy = jnp.clip((x[1] - oy) * (1.0 / sy) - 0.5, 0.0, ny - 1.0)
    uz = jnp.clip((x[2] - oz) * (1.0 / sz) - 0.5, 0.0, nz - 1.0)
    rx = jnp.minimum((ux + 0.5).astype(jnp.int32), nx - 1)
    ry = jnp.minimum((uy + 0.5).astype(jnp.int32), ny - 1)
    iz = jnp.minimum(uz.astype(jnp.int32), nz - 2)
    fz = jnp.clip(uz - iz.astype(jnp.float32), 0.0, 1.0)
    base = (rx * ny + ry) * nz + iz
    return base, fz


def grid_density_nearest(fc, x):
    """xy-nearest / z-linear density: one z-pair gather."""
    base, fz = grid_cell_nearest(fc, x)
    c0, c1 = grid_lookup_pair(fc["tab"], base)
    return c0 + (c1 - c0) * fz


def grid_pc_eval(fc, x):
    """Density evaluation used by the canonical pc TRANSPORT model (tau
    marches, the sampling inversion, pc score densities). The sampling pdf
    and every transmittance weight derive from the same pc tau whichever
    interpolant this picks, so the estimator stays self-consistent; only
    the pc model's approximation of the continuous field changes.
    APPEARANCE densities (sigma_s(xt) scale factors) stay trilinear
    (grid_density) regardless."""
    if fc.get("interp", "tri") == "nearest":
        return grid_density_nearest(fc, x)
    return grid_density(fc, x)


def grid_window(fc, o, d):
    """media/density._grid_window, baked consts: (t0, t1) — constant head
    before the slab entry t0, M marched segments to the railing distance
    t1 (window capped at march_extent diagonals, fc["cap"]), constant
    tail beyond."""
    t_rail = jnp.zeros_like(o[0])
    t_enter = jnp.full_like(o[0], -BIG)
    t_exit = jnp.full_like(o[0], BIG)
    for i in range(3):
        lo_r, hi_r = fc["rails"][i]
        di = d[i]
        oi = o[i]
        moving = jnp.abs(di) > 1e-12
        inv = 1.0 / jnp.where(moving, di, 1.0)
        rail = jnp.where(di > 0.0, hi_r, lo_r)
        t_rail = jnp.maximum(t_rail,
                             jnp.where(moving, (rail - oi) * inv, 0.0))
        ta = (lo_r - oi) * inv
        tb = (hi_r - oi) * inv
        inside = (oi >= lo_r) & (oi <= hi_r)
        near = jnp.where(moving, jnp.minimum(ta, tb),
                         jnp.where(inside, -BIG, BIG))
        far = jnp.where(moving, jnp.maximum(ta, tb),
                        jnp.where(inside, BIG, -BIG))
        t_enter = jnp.maximum(t_enter, near)
        t_exit = jnp.minimum(t_exit, far)
    cap = fc["cap"]
    box_hit = (t_enter <= t_exit) & (t_exit > 0.0)
    t0 = jnp.where(box_hit, jnp.maximum(t_enter, 0.0), 0.0)
    # two-region march (media/density._grid_window): region A resolves
    # the box crossing, region B the boundary-slide stretch to railing
    ta = jnp.where(box_hit,
                   jnp.minimum(jnp.minimum(t_exit, t_rail), t0 + cap),
                   jnp.minimum(t_rail, cap) * 0.75)
    ta = jnp.maximum(ta, t0 + 1e-6)
    tb = jnp.minimum(t_rail, ta + cap)
    tb = jnp.maximum(tb, ta + 1e-6)
    return t0, ta, tb


def grid_m_split(M: int):
    m2 = max(1, M // 4)
    return M - m2, m2


def _grid_seg(fc, t0, ta, tb, i):
    """(seg0, width) of canonical segment i (i a traced scalar)."""
    M1, _ = grid_m_split(fc["n_march"])
    M1f = float(M1)
    M2f = float(fc["n_march"] - M1)
    h1 = (ta - t0) * (1.0 / M1f)
    h2 = (tb - ta) * (1.0 / M2f)
    i_f = i.astype(jnp.float32)
    in_a = i < M1
    seg0 = jnp.where(in_a, t0 + i_f * h1, ta + (i_f - M1f) * h2)
    return seg0, jnp.where(in_a, h1, h2), h2


def grid_tau_nonneg(fc, sigma_t, o, d, t):
    """Canonical-model optical depth for t >= 0 (fori over n_march
    segments; the trilinear chunk loop is unrolled inside the body)."""
    M = fc["n_march"]
    t0, ta, tb = grid_window(fc, o, d)

    def body(i, acc):
        seg0, w, _ = _grid_seg(fc, t0, ta, tb, i)
        rho = grid_pc_eval(fc, [o[j] + (seg0 + 0.5 * w) * d[j]
                                for j in range(3)])
        return acc + rho * jnp.clip(t - seg0, 0.0, w)

    acc = jax.lax.fori_loop(0, M, body, jnp.zeros_like(o[0]))
    h2 = (tb - ta) * (1.0 / float(M - grid_m_split(M)[0]))
    rho_head = grid_pc_eval(fc, [o[j] + 0.5 * t0 * d[j] for j in range(3)])
    d_inf = grid_pc_eval(fc, [o[j] + (tb + h2) * d[j] for j in range(3)])
    return sigma_t * (rho_head * jnp.minimum(t, t0) + acc
                      + d_inf * jnp.maximum(t - tb, 0.0))


def grid_pc_density(fc, o, d, t):
    """The pc model's own density at ray parameter t >= 0 (the exact
    sampling-pdf density; media/density.grid_pc_density)."""
    M = fc["n_march"]
    M1, M2 = grid_m_split(M)
    t0, ta, tb = grid_window(fc, o, d)
    h1 = (ta - t0) * (1.0 / M1)
    h2 = (tb - ta) * (1.0 / M2)
    kA = jnp.clip(jnp.floor((t - t0) / h1), 0.0, M1 - 1.0)
    kB = jnp.clip(jnp.floor((t - ta) / h2), 0.0, M2 - 1.0)
    t_mid = jnp.where(t < ta, t0 + (kA + 0.5) * h1, ta + (kB + 0.5) * h2)
    t_s = jnp.where(t < t0, 0.5 * t0, jnp.where(t > tb, tb + h2, t_mid))
    return grid_pc_eval(fc, [o[j] + t_s * d[j] for j in range(3)])


def grid_tau(fc, sigma_t, o, d, t, nonneg=False):
    """Signed canonical tau: tau(t<0) = -tau_reverse(-t) (equi-angular
    samples behind the origin). nonneg=True skips the reverse march."""
    pos = grid_tau_nonneg(fc, sigma_t, o, d, jnp.maximum(t, 0.0))
    if nonneg:
        return pos
    neg = grid_tau_nonneg(fc, sigma_t, o, [-d[0], -d[1], -d[2]],
                          jnp.maximum(-t, 0.0))
    return jnp.where(t >= 0.0, pos, -neg)


def grid_sample_free_and_tau(fc, sigma_t, o, d, u, t_cap):
    """ONE canonical march yields BOTH the free-flight distance (exact
    closed-form inversion of the pc tau — deterministic in u, replayable)
    AND tau(t_cap) for the surface transmittance (media/density.
    _sample_grid_march + _grid_tau_nonneg fused; the free-flight bounce
    needs both every iteration). Returns (d_s, tau_at_t_cap); d_s == BIG
    when the flight escapes (tail density ~ 0)."""
    M = fc["n_march"]
    t0, ta, tb = grid_window(fc, o, d)
    tau_star = -jnp.log1p(-u)
    # constant head [0, t0] (slab approach): closed form
    rho_head = grid_pc_eval(fc, [o[j] + 0.5 * t0 * d[j] for j in range(3)])
    tau_head = sigma_t * rho_head * t0

    def body(i, carry):
        cum, tau_cap, d_found = carry
        seg0, w, _ = _grid_seg(fc, t0, ta, tb, i)
        rho = grid_pc_eval(fc, [o[j] + (seg0 + 0.5 * w) * d[j]
                                for j in range(3)])
        dtau = sigma_t * rho * w
        tau_cap = tau_cap + rho * jnp.clip(t_cap - seg0, 0.0, w)
        cross = (d_found < 0.0) & (cum + dtau > tau_star)
        d_i = seg0 + (tau_star - cum) / jnp.maximum(sigma_t * rho, 1e-30)
        d_found = jnp.where(cross, d_i, d_found)
        return cum + dtau, tau_cap, d_found

    z = jnp.zeros_like(o[0])
    cum, tau_cap, d_found = jax.lax.fori_loop(
        0, M, body, (tau_head, z, z - 1.0))
    h2 = (tb - ta) * (1.0 / float(M - grid_m_split(M)[0]))
    in_head = tau_star < tau_head
    d_head = jnp.minimum(
        tau_star / jnp.maximum(sigma_t * rho_head, 1e-30), t0)
    d_inf = grid_pc_eval(fc, [o[j] + (tb + h2) * d[j] for j in range(3)])
    rate = sigma_t * d_inf
    d_tail = tb + (tau_star - cum) / jnp.maximum(rate, 1e-30)
    d_nf = jnp.where(rate > 1e-20, jnp.minimum(d_tail, BIG), BIG)
    d_s = jnp.where(in_head, d_head,
                    jnp.where(d_found >= 0.0, d_found, d_nf))
    tau_at_cap = sigma_t * (rho_head * jnp.minimum(t_cap, t0) + tau_cap
                            + d_inf * jnp.maximum(t_cap - tb, 0.0))
    return d_s, tau_at_cap


_SQRT_HALF = math.sqrt(0.5)
_SQRT_HALF_PI = math.sqrt(0.5 * math.pi)
# unit-sigma optical-path magnitude cap: far past total extinction at the
# sigma >= 1e-6 physical floor (e^-30), far below f32 overflow even after
# the score chains' 1e20-scale Tr/(1-Tr) and wL products
_TAU_CAP = 3.0e7


def field_tau(fc, sigma_t, o, d, t, nonneg=False):
    """Optical depth sigma_t * int_0^t density along unit d
    (media/density.optical_depth, python-const field params): closed form
    for the analytic fields, canonical pc march for grids. nonneg=True
    (free-flight call sites: every t >= 0) skips the grid's reverse march
    for behind-the-origin equi-angular samples."""
    if fc["kind"] == "grid":
        return grid_tau(fc, sigma_t, o, d, t, nonneg=nonneg)
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        d0 = jnp.exp(jnp.clip(-k * (o[1] - y0), -80.0, 80.0))
        d_end = jnp.exp(jnp.clip(-k * (o[1] + t * d[1] - y0), -80.0, 80.0))
        m = k * d[1]
        const = jnp.abs(m) < 1e-6
        safe_m = jnp.where(const, 1.0, m)
        base = jnp.where(const, d0 * t, (d0 - d_end) / safe_m)
        # monotone lower bound |t| * min-endpoint-density: when BOTH
        # exponents clip at the same +-80 rail (a lane deep below/above
        # the fog plane) the difference form collapses to tau == 0 while
        # field_density still reports e^{80} — tau/density inconsistency
        # that turns w_med into e^{34}-scale throughput (NaN factory).
        # Density is monotone in t along a straight ray, so the min
        # endpoint bounds the segment from below; keep tau odd in t.
        lb = t * jnp.minimum(d0, d_end)
        tau = jnp.where(t >= 0.0, jnp.maximum(base, lb),
                        jnp.minimum(base, lb))
        # f32-inf rail: an equi-angular sample far below the fog plane on
        # a near-horizontal ray reaches d_end = e^80 with |m| ~ 1e-6 —
        # base ~ 5e40 overflows f32, and the backward's masked 0 * inf is
        # the NaN factory of the EA-hetero diff gates (round 4). Any lane
        # past the cap has exp(-sigma tau) == 0 identically (tau 3e7 at
        # the sigma >= 1e-6 domain floor is e^-30), so capping changes no
        # contributing value — it only keeps dead lanes' score factors
        # finite so their zero weight annihilates them.
        tau = jnp.clip(tau, -_TAU_CAP, _TAU_CAP)
        return sigma_t * tau
    tau = None
    for (cx, cy, cz, r, w) in fc["params"]:
        oc = [cx - o[0], cy - o[1], cz - o[2]]
        a = dot3(oc, d)
        b2 = jnp.maximum(dot3(oc, oc) - a * a, 0.0)
        inv_r = 1.0 / r
        amp = jnp.exp(-0.5 * b2 * (inv_r * inv_r)) * (r * _SQRT_HALF_PI * w)
        hi = erf_poly((t - a) * (inv_r * _SQRT_HALF))
        lo = erf_poly(a * (inv_r * _SQRT_HALF))
        g = amp * (hi + lo)
        tau = g if tau is None else tau + g
    return sigma_t * tau


def field_tau_dk(fc, o, d, t):
    """d/dk of the exp_height optical path per unit sigma,
    I(o,d,t) = (d0 - d_end)/m with m = k*dy, d0 = e^{-k a0}, a0 = oy - y0,
    a1 = oy + t*dy - y0 (the k-derivative the traced-k differentiable
    kernel needs; k may be a traced scalar). In the |m| < 1e-6 limit the
    baked I is d0*t, whose k-derivative is -(a0+a1)/2 * d0 * t — exact for
    dy == 0 (a1 == a0) and the correct k->0 series limit. exp_height only."""
    k, y0 = fc["params"]
    a0 = o[1] - y0
    a1 = o[1] + t * d[1] - y0
    d0 = jnp.exp(jnp.clip(-k * a0, -80.0, 80.0))
    d1 = jnp.exp(jnp.clip(-k * a1, -80.0, 80.0))
    m = k * d[1]
    const = jnp.abs(m) < 1e-6
    safe_m = jnp.where(const, 1.0, m)
    inv_m = 1.0 / safe_m
    # d/dk[(d0-d1)/m] = ((a1 d1 - a0 d0) - (d0-d1) dy/m) / m
    gen = ((a1 * d1 - a0 * d0) - (d0 - d1) * d[1] * inv_m) * inv_m
    lim = -0.5 * (a0 + a1) * d0 * t
    # same f32-inf rail as field_tau: a1*d1 can reach ~1e38 and /m another
    # 1e6 — dead lanes (zero transmittance) only; cap keeps 0 * dI finite
    return jnp.clip(jnp.where(const, lim, gen), -_TAU_CAP, _TAU_CAP)


_TWO_OVER_SQRTPI = 1.1283791670955126


def field_blob_tau_grads(params, o, d, t):
    """(I, dI) of the blobs optical path per unit sigma along unit d:
    I = sum_i w_i amp_i (erf_hi + erf_lo); dI = per-blob 5-tuples
    (d/dcx, d/dcy, d/dcz, d/dr, d/dw) of lane arrays — the closed-form
    parameter derivatives of the erf-pair line integral (media/density.
    optical_depth BLOBS), shared-subexpression form so the traced-blob
    diff kernel pays ~2x one tau evaluation. `params`: tuples of traced
    scalars ((cx, cy, cz, r, w), ...)."""
    I = None
    dI = []
    for (cx, cy, cz, r, w) in params:
        oc = [cx - o[0], cy - o[1], cz - o[2]]
        a = dot3(oc, d)
        b2 = jnp.maximum(dot3(oc, oc) - a * a, 0.0)
        inv_r = 1.0 / r
        g = jnp.exp(-0.5 * b2 * (inv_r * inv_r))
        amp = g * (r * _SQRT_HALF_PI)
        k = inv_r * _SQRT_HALF
        xh = (t - a) * k
        xl = a * k
        hi = erf_poly(xh)
        lo = erf_poly(xl)
        S = hi + lo
        Ii = w * amp * S
        I = Ii if I is None else I + Ii
        dphi_h = _TWO_OVER_SQRTPI * jnp.exp(-xh * xh)    # erf'(xh)
        dphi_l = _TWO_OVER_SQRTPI * jnp.exp(-xl * xl)
        dcs = []
        for j in range(3):
            db2 = 2.0 * oc[j] - 2.0 * a * d[j]
            damp = amp * (-0.5 * inv_r * inv_r) * db2
            dhi = -d[j] * k * dphi_h
            dlo = d[j] * k * dphi_l
            dcs.append(w * (damp * S + amp * (dhi + dlo)))
        dr = w * (amp * (inv_r + b2 * inv_r * inv_r * inv_r) * S
                  + amp * (dphi_h * (-xh * inv_r)
                           + dphi_l * (-xl * inv_r)))
        dw = amp * S
        dI.append((dcs[0], dcs[1], dcs[2], dr, dw))
    return I, dI


def field_blob_dens_grads(params, x):
    """(dens, ddens) of the blobs density at x: per-blob 5-tuples of
    parameter derivatives (for the event-score dlog dens/dtheta)."""
    dens = None
    dd = []
    for (cx, cy, cz, r, w) in params:
        dx = [x[0] - cx, x[1] - cy, x[2] - cz]
        q2 = dot3(dx, dx)
        inv_r2 = 1.0 / (r * r)
        e = jnp.exp(-0.5 * q2 * inv_r2)
        dens = w * e if dens is None else dens + w * e
        dd.append((w * e * (dx[0] * inv_r2), w * e * (dx[1] * inv_r2),
                   w * e * (dx[2] * inv_r2),
                   w * e * (q2 * inv_r2 / r), e))
    return dens, dd


def field_tr_toward(fc, sigma_t, x, target_dir, dist):
    """exp(-tau) from x along unit target_dir for dist — the heterogeneous
    replacement for exp(-sigma_t * dist) in NEE/MIS factors."""
    return jnp.exp(-field_tau(fc, sigma_t, x, target_dir, dist,
                              nonneg=True))


def field_sample_free(fc, sigma_t, o, d, u, rng, t_cap):
    """Heterogeneous free-flight distance (media/density.sample_distance,
    baked): closed-form CDF inversion for exp_height (uses the single
    uniform u); delta (Woodcock) tracking for blobs (consumes 2 PCG draws
    per null step from `rng`, a static fc["max_null"]-step fori with the
    stream threaded through the carry so all lanes stay lockstep); exact
    pc-tau inversion for grids (grid_sample_free_and_tau — callers on the
    free-flight hot path should use the fused variant directly to share
    the march with the surface transmittance)."""
    if fc["kind"] == "grid":
        d_s, _ = grid_sample_free_and_tau(fc, sigma_t, o, d, u, t_cap)
        return d_s
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        d0 = jnp.exp(jnp.clip(-k * (o[1] - y0), -80.0, 80.0))
        m = k * d[1]
        tau_star = -jnp.log1p(-u)
        a = jnp.maximum(sigma_t * d0, 1e-30)
        const = jnp.abs(m) < 1e-6
        safe_m = jnp.where(const, 1.0, m)
        arg = -tau_star * safe_m / a
        escapes = (~const) & (arg <= -1.0)
        t_gen = -jnp.log1p(jnp.where(escapes, -0.5, arg)) / safe_m
        t_const = tau_star / a
        t_fin = jnp.where(escapes, BIG, jnp.where(const, t_const, t_gen))
        return jnp.minimum(t_fin, BIG)

    maj = fc["majorant"]
    inv_maj_rate = 1.0 / (sigma_t * maj)
    inv_maj = 1.0 / maj

    def body(i, carry):
        t, done, s = carry
        r = Pcg(s)
        u1, u2 = r(), r()
        step = -jnp.log1p(-u1) * inv_maj_rate
        t_new = t + step
        x = [o[j] + t_new * d[j] for j in range(3)]
        accept = u2 < field_density(fc, x) * inv_maj
        alive_mask = done == 0
        done = jnp.where(accept | (t_new > t_cap), 1, done)
        t = jnp.where(alive_mask, t_new, t)
        return t, done, r.s

    z = jnp.zeros_like(o[0])
    t, done, s = jax.lax.fori_loop(
        0, int(fc["max_null"]), body,
        (z, jnp.zeros_like(o[0], jnp.int32), rng.s))
    rng.s = s
    # exhausted flights ESCAPE (media/density._sample_delta: a partial-t
    # vacuum scatter would be heavy-tailed); bias ~0 once max_null steps
    # span the dense region
    return jnp.where(done > 0, t, BIG)


# --- voxel-gradient scatter (round 4, diff_grid) ---------------------------
# The backward of a trilinear gather is a scatter — the one primitive the
# VPU lacks entirely (no lane scatter). We run it on the idle MXU: for a
# batch of per-lane (cell, weight) contributions, build the 128-column
# one-hot of the BASE corner's lane index once, stack the 8 corners'
# chunk-row weight matrices, and use the roll identity
#     W_c @ roll(onehot, s) == roll_cols(W_c @ onehot, s)
# so ONE (8C, R*128) @ (R*128, 128) matmul scatters all 8 corners; the
# per-corner column shift becomes a cheap roll of the (C, 128) product.
# Chunk-row wrap (lo + s >= 128) is exact: each corner's W rows use its
# OWN hi = (base + s) >> 7, and (base + s) & 127 == (lo + s) mod 128.

def grid_pc_point(fc, o, d, t):
    """(t_s, rho) of the pc model at ray parameter t >= 0: the sample
    point whose trilinear cell carries dlog rho_pc/dv, and its density."""
    M = fc["n_march"]
    M1, M2 = grid_m_split(M)
    t0, ta, tb = grid_window(fc, o, d)
    h1 = (ta - t0) * (1.0 / M1)
    h2 = (tb - ta) * (1.0 / M2)
    kA = jnp.clip(jnp.floor((t - t0) / h1), 0.0, M1 - 1.0)
    kB = jnp.clip(jnp.floor((t - ta) / h2), 0.0, M2 - 1.0)
    t_mid = jnp.where(t < ta, t0 + (kA + 0.5) * h1, ta + (kB + 0.5) * h2)
    t_s = jnp.where(t < t0, 0.5 * t0, jnp.where(t > tb, tb + h2, t_mid))
    x = [o[j] + t_s * d[j] for j in range(3)]
    return x, grid_pc_eval(fc, x)


def grid_scatter_point(fc, x, w, gacc, interp=None):
    """gacc (C, 128) += sum over lanes of w * d(interp(x))/d(voxels).

    x: 3 lane arrays (R, 128); w: per-lane weight (0 = masked out).
    One MXU matmul per call (see the block comment above). `interp`
    overrides fc["interp"] (pass "tri" when scattering an APPEARANCE
    trilinear factor in a nearest-transport scene); the pc-model chains
    must differentiate the interpolant the forward actually evaluated,
    so they default to the fc setting — under "nearest" only the z-pair
    of the snapped column carries weight (2 one-hot rows per chunk
    instead of 8: the backward matmul shrinks 4x with the gather count)."""
    C = gacc.shape[0]
    nz = fc["dims"][2]
    snx = fc["dims"][1] * nz
    R = x[0].shape[0]
    if interp is None:
        interp = fc.get("interp", "tri")
    if interp == "nearest":
        base, fz = grid_cell_nearest(fc, x)
        offs = (0, 1)
        cw = [w * (1.0 - fz), w * fz]
    else:
        base, fx, fy, fz = grid_cell(fc, x)
        offs = (0, 1, nz, nz + 1, snx, snx + 1, snx + nz, snx + nz + 1)
        cw = []
        for a in (0, 1):
            wa = fx if a else (1.0 - fx)
            for b in (0, 1):
                wb = fy if b else (1.0 - fy)
                for c in (0, 1):
                    wc_ = fz if c else (1.0 - fz)
                    cw.append(w * wa * wb * wc_)
    lo0 = jnp.bitwise_and(base, jnp.int32(127))
    # one-hot of the base lane index, per sublane row -> (R*128, 128)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    oh_rows = []
    for r in range(R):
        lo_r = lo0[r, :].reshape(128, 1)
        oh_rows.append((lo_r == col).astype(jnp.float32))
    onehot = jnp.concatenate(oh_rows, axis=0)            # (R*128, 128)
    # stacked per-corner chunk-row weights -> (8C, R*128)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    w_blocks = []
    for ci, off in enumerate(offs):
        hi_c = jax.lax.shift_right_logical(base + off, jnp.int32(7))
        row_blocks = []
        for r in range(R):
            m = (hi_c[r, :].reshape(1, 128) == jrow).astype(jnp.float32)
            row_blocks.append(m * cw[ci][r, :].reshape(1, 128))
        w_blocks.append(jnp.concatenate(row_blocks, axis=1))  # (C, R*128)
    w_stack = jnp.concatenate(w_blocks, axis=0)          # (8C, R*128)
    p = jax.lax.dot_general(
        w_stack, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (8C, 128)
    for ci, off in enumerate(offs):
        gacc = gacc + pltpu_roll(p[ci * C:(ci + 1) * C, :], off % 128)
    return gacc


def pltpu_roll(arr, shift):
    """Circular shift along the lane axis (static shift)."""
    if shift == 0:
        return arr
    from jax.experimental.pallas import tpu as _pltpu
    return _pltpu.roll(arr, shift, 1)


def grid_march_scatter(fc, o, d, wA, tA, wB, tB, gacc):
    """gacc += d/dv of (wA * I(tA) + wB * I(tB)) where I is the canonical
    optical path per unit sigma along (o, d): per-segment coefficients
    (overlap with [0, t]) at the midpoint corners, plus the constant head
    and tail terms. ~(n_march + 2) scatter matmuls per call."""
    t0, ta, tb = grid_window(fc, o, d)

    def body(i, g):
        seg0, w, _ = _grid_seg(fc, t0, ta, tb, i)
        xm = [o[j] + (seg0 + 0.5 * w) * d[j] for j in range(3)]
        cm = (wA * jnp.clip(tA - seg0, 0.0, w)
              + wB * jnp.clip(tB - seg0, 0.0, w))
        return grid_scatter_point(fc, xm, cm, g)

    gacc = jax.lax.fori_loop(0, fc["n_march"], body, gacc)
    h2 = (tb - ta) * (1.0 / float(fc["n_march"] - grid_m_split(fc["n_march"])[0]))
    xh = [o[j] + 0.5 * t0 * d[j] for j in range(3)]
    ch = wA * jnp.minimum(tA, t0) + wB * jnp.minimum(tB, t0)
    gacc = grid_scatter_point(fc, xh, ch, gacc)
    xt_ = [o[j] + (tb + h2) * d[j] for j in range(3)]
    ct = (wA * jnp.maximum(tA - tb, 0.0)
          + wB * jnp.maximum(tB - tb, 0.0))
    return grid_scatter_point(fc, xt_, ct, gacc)


def power_h(f, g):
    """f^2 / (f^2 + g^2), one division (div is ~3.6x an fma on the VPU,
    tools/vpu_microbench.py). Clips keep f^2+g^2 inside f32 range; the 1e-37
    floor only engages when BOTH pdfs underflow (weight 0 either way)."""
    fc = jnp.clip(f, 0.0, 1e12)
    gc = jnp.clip(g, 0.0, 1e12)
    f2 = fc * fc
    w = f2 / jnp.maximum(f2 + gc * gc, 1e-37)
    return jnp.where(fc > 0.0, w, 0.0)


def power_h_invf(f_inv, g):
    """power_h(1/f_inv, g) without materializing f: = 1/(1 + (g*f_inv)^2).
    Requires f_inv > 0 (f strictly positive), e.g. a cone pdf's reciprocal
    2*pi*(1-cos_max)."""
    r = jnp.clip(g, 0.0, 1e12) * f_inv
    return 1.0 / (1.0 + r * r)


def power_h_invg(f, g_inv):
    """power_h(f, 1/g_inv) = (f*g_inv)^2 / ((f*g_inv)^2 + 1); g strictly
    positive. One div, and it preserves power_h's f > 0 gate."""
    r = jnp.clip(f, 0.0, 1e12) * g_inv
    r2 = r * r
    return jnp.where(f > 0.0, r2 / (r2 + 1.0), 0.0)
