"""Forward-mode dual-number arithmetic for the geometric-gradient kernel.

`D` carries a primal value (an (R, 128) lane tile or a traced scalar) plus a
tuple of K tangent components — one per simultaneous directional derivative
(kernels/geom.py renders the image and K directional image-derivatives in a
single fused pass; K=3 covers a light position, K=7 light+camera origin+fov).

Tangent entries use `None` as a STRUCTURAL zero: quantities untouched by
geometry (RNG draws, sigma-only factors, baked material constants) carry no
tangent arithmetic at all, so the dual kernel only pays for the chains that
actually depend on the differentiated parameters.

Discrete-detachment contract (same estimator as integrators/engine.py's
differentiable path, which relies on JAX AD's identical conventions):
comparisons read primal values only — event masks (hit/miss, surface vs
medium, visibility, Russian roulette, light pick, lobe choice) are detached,
while every smooth factor (intersection distances, normals, transmittances,
cone pdfs, BxDF values, 1/d^2 falloffs) propagates tangents. `maximum`/
`minimum`/`clip` gate tangents like `jax.grad` does (no flow from the
clamped side), so eps-guards freeze gradients exactly as the engine's do.

The geometric helpers at the bottom mirror kernels/prims.py one-for-one
(same guard constants, same algebraic forms, same reference citations —
see prims.py) but accept D or plain operands anywhere.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .prims import F32EPS, GLASS_ETA_I, GLASS_ETA_T, INV_4PI, TWO_PI

__all__ = ["D", "val", "tan", "where", "sqrt", "rsqrt", "exp", "absd",
           "maximum", "minimum", "clip"]


def val(x):
    return x.v if isinstance(x, D) else x


def tan(x):
    return x.t if isinstance(x, D) else None


def _addt(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return tuple(
        y if x is None else (x if y is None else x + y)
        for x, y in zip(a, b)
    )


def _negt(a):
    if a is None:
        return None
    return tuple(None if x is None else -x for x in a)


def _scalet(t, k):
    """t * k where k is a PRIMAL value (array/scalar)."""
    if t is None:
        return None
    return tuple(None if x is None else x * k for x in t)


def _mapt(t, f):
    if t is None:
        return None
    return tuple(None if x is None else f(x) for x in t)


def _wheret(m, a, b):
    if a is None and b is None:
        return None
    if a is None:
        return tuple(None if y is None else jnp.where(m, 0.0, y) for y in b)
    if b is None:
        return tuple(None if x is None else jnp.where(m, x, 0.0) for x in a)
    return tuple(
        (None if x is None and y is None else
         jnp.where(m, 0.0 if x is None else x, 0.0 if y is None else y))
        for x, y in zip(a, b)
    )


class D:
    """Dual value: primal `v` plus tangent tuple `t` (or None == zero)."""

    __slots__ = ("v", "t")

    def __init__(self, v, t=None):
        self.v = v
        self.t = t

    # ---- arithmetic ------------------------------------------------------
    def __add__(self, o):
        return D(self.v + val(o), _addt(self.t, tan(o)))

    __radd__ = __add__

    def __sub__(self, o):
        return D(self.v - val(o), _addt(self.t, _negt(tan(o))))

    def __rsub__(self, o):
        return D(val(o) - self.v, _addt(tan(o), _negt(self.t)))

    def __mul__(self, o):
        ov, ot = val(o), tan(o)
        return D(self.v * ov,
                 _addt(_scalet(self.t, ov), _scalet(ot, self.v)))

    __rmul__ = __mul__

    def __truediv__(self, o):
        # one reciprocal serves the value and every tangent plane (div is
        # ~3.6x an fma on the VPU; the naive form pays 2+K divs)
        ov, ot = val(o), tan(o)
        inv = 1.0 / ov
        v = self.v * inv
        t = _scalet(self.t, inv)
        if ot is not None:
            t = _addt(t, _scalet(ot, -v * inv))
        return D(v, t)

    def __rtruediv__(self, o):
        ov, ot = val(o), tan(o)
        inv = 1.0 / self.v
        v = ov * inv
        t = _scalet(self.t, -v * inv)
        if ot is not None:
            t = _addt(t, _scalet(ot, inv))
        return D(v, t)

    def __neg__(self):
        return D(-self.v, _negt(self.t))

    # ---- comparisons: primal-valued, tangent-detached --------------------
    def __lt__(self, o):
        return self.v < val(o)

    def __le__(self, o):
        return self.v <= val(o)

    def __gt__(self, o):
        return self.v > val(o)

    def __ge__(self, o):
        return self.v >= val(o)

    def __ne__(self, o):          # noqa: D105 — value comparison by design
        return self.v != val(o)

    def __eq__(self, o):          # noqa: D105
        return self.v == val(o)

    __hash__ = None


def where(m, a, b):
    """Select with detached condition; a/b may be D or plain."""
    av, bv = val(a), val(b)
    at, bt = tan(a), tan(b)
    v = jnp.where(m, av, bv)
    t = _wheret(m, at, bt)
    return D(v, t) if t is not None else v if not (
        isinstance(a, D) or isinstance(b, D)) else D(v, None)


def sqrt(a):
    if not isinstance(a, D):
        return jnp.sqrt(a)
    s = jnp.sqrt(a.v)
    # guard: tangent frozen where v == 0 (all call sites clamp first)
    inv2s = 0.5 / jnp.where(s > 0.0, s, 1.0)
    return D(s, _scalet(_mapt(a.t, lambda x: x),
                        jnp.where(s > 0.0, inv2s, 0.0))
             if a.t is not None else None)


def rsqrt(a):
    if not isinstance(a, D):
        return jax.lax.rsqrt(a)
    r = jax.lax.rsqrt(a.v)
    return D(r, _scalet(a.t, -0.5 * r * r * r))


def exp(a):
    if not isinstance(a, D):
        return jnp.exp(a)
    e = jnp.exp(a.v)
    return D(e, _scalet(a.t, e))


def absd(a):
    if not isinstance(a, D):
        return jnp.abs(a)
    return D(jnp.abs(a.v),
             _scalet(a.t, jnp.where(a.v >= 0.0, 1.0, -1.0)))


def sin(a):
    if not isinstance(a, D):
        return jnp.sin(a)
    return D(jnp.sin(a.v), _scalet(a.t, jnp.cos(a.v)))


def cos(a):
    if not isinstance(a, D):
        return jnp.cos(a)
    return D(jnp.cos(a.v), _scalet(a.t, -jnp.sin(a.v)))


def maximum(a, b):
    """max with grad-to-the-max convention (ties -> first arg, like the
    engine's jnp.maximum eps-guards in effect: tangent freezes when the
    constant side wins)."""
    av, bv = val(a), val(b)
    m = av >= bv
    v = jnp.maximum(av, bv)
    t = _wheret(m, tan(a), tan(b))
    if t is None and not (isinstance(a, D) or isinstance(b, D)):
        return v
    return D(v, t)


def minimum(a, b):
    av, bv = val(a), val(b)
    m = av <= bv
    v = jnp.minimum(av, bv)
    t = _wheret(m, tan(a), tan(b))
    if t is None and not (isinstance(a, D) or isinstance(b, D)):
        return v
    return D(v, t)


def clip(a, lo, hi):
    return minimum(maximum(a, lo), hi)


# ---------------------------------------------------------------------------
# vec3 helpers over dual-or-plain components (mirror kernels/prims.py)
# ---------------------------------------------------------------------------

def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def norm3(a):
    return sqrt(maximum(dot3(a, a), 1e-20))


def normalize3(a):
    inv = rsqrt(maximum(dot3(a, a), 1e-20))
    return [a[0] * inv, a[1] * inv, a[2] * inv]


def sel3(m, a, b):
    return [where(m, a[i], b[i]) for i in range(3)]


def scale3(a, k):
    return [a[0] * k, a[1] * k, a[2] * k]


def add3(a, b):
    return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]


def onb(n):
    """Branch-free coordinateSystem (mathUtilities.h:10-19) — prims.onb."""
    cond = absd(n[0]) > absd(n[1])
    inv_a = rsqrt(maximum(n[0] * n[0] + n[2] * n[2], 1e-20))
    inv_b = rsqrt(maximum(n[1] * n[1] + n[2] * n[2], 1e-20))
    z = jnp.zeros_like(val(n[0]))
    t = [where(cond, n[2] * inv_a, z),
         where(cond, z, n[2] * inv_b),
         where(cond, -n[0] * inv_a, -n[1] * inv_b)]
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


def cone_dir(wc, cos_max, u1, u2):
    """prims.cone_dir with dual axis/aperture, detached uniforms."""
    ct = clip((1.0 - u1) + u1 * cos_max, -1.0, 1.0)
    st = sqrt(maximum(1.0 - ct * ct, 1e-12))
    phi = TWO_PI * u2
    local = [st * jnp.cos(phi), st * jnp.sin(phi), ct]
    return normalize3(from_local(wc, local))


def cone_pdf(cos_max):
    return 1.0 / (TWO_PI * maximum(1.0 - cos_max, 1e-12))


def cosine_hemi(n, u1, u2):
    ct = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    st = jnp.sqrt(jnp.maximum(u1, 0.0))
    phi = TWO_PI * u2
    return normalize3(from_local(
        n, [st * jnp.cos(phi), st * jnp.sin(phi), ct]))


def uniform_sphere(u1, u2):
    ct = 1.0 - 2.0 * u1
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = TWO_PI * u2
    return [st * jnp.cos(phi), st * jnp.sin(phi), ct]


def hg_phase(cos_t, g):
    """Henyey-Greenstein phase value for a BUILD-TIME python-const g != 0;
    cos_t is dual (the light direction moves with theta). Primal mirrors
    prims.hg_phase_const op-for-op (rsqrt^3 form) so the geom kernel's
    primal plane stays bit-identical to the forward kernel."""
    den = maximum(1.0 + g * g - 2.0 * g * cos_t, 1e-12)
    rs = rsqrt(den)
    return (INV_4PI * (1.0 - g * g)) * rs * rs * rs


def hg_dir(d, g, u1, u2):
    """HG scatter direction around the dual propagation direction d for a
    python-const g != 0 (prims.hg_dir): the local angles are detached
    (pure uniforms), the FRAME rotates with d — exactly the engine AD's
    detached-decision convention."""
    s = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
    cos_t = jnp.clip((1.0 + g * g - s * s) * (1.0 / (2.0 * g)), -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u2
    local = [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t]
    return normalize3(from_local(d, local))


def beckmann_wh(alpha, u1, u2):
    """Local-frame Beckmann wh: alpha plain, uniforms detached -> PLAIN."""
    t2 = jnp.maximum(
        -(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u1, 1e-20)), 1e-20)
    ct = jax.lax.rsqrt(1.0 + t2)
    st = jnp.sqrt(t2) * ct
    phi = TWO_PI * u2
    return [st * jnp.cos(phi), st * jnp.sin(phi), ct]


def ndf_beckmann(cosine, alpha):
    # shared reciprocals, mirroring prims.ndf_beckmann (2 divs, not 3)
    c2 = cosine * cosine
    inv_c2 = 1.0 / maximum(c2, 1e-4)
    inv_a2 = 1.0 / jnp.maximum(alpha * alpha, 1e-8)
    tan2 = maximum(1.0 - c2, 0.0) * inv_c2
    v = exp(-tan2 * inv_a2) * (inv_a2 * (1.0 / math.pi)) * (inv_c2 * inv_c2)
    return where(val(cosine) >= 0.0, v, jnp.zeros_like(val(cosine)))


def g1(n, wv, wh, alpha):
    cos = dot3(n, wv)
    sin = sqrt(maximum(1.0 - cos * cos, 1e-12))
    # a = cos/(alpha*sin), one dual div — mirrors prims.g1
    cos_g = where(cos != 0.0, cos, 1e-12 + jnp.zeros_like(val(cos)))
    a = cos_g / (jnp.maximum(alpha, 1e-6)
                 * where(sin != 0.0, sin, 1e-12 * cos_g))
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    g = where(val(a) < 1.6, rational, jnp.ones_like(val(cos)))
    # dot/cos > 0 <=> dot*cos > 0 (primal-valued gate, as before)
    same = val(dot3(wv, wh) * cos_g) > 0.0
    return where(same, g, jnp.zeros_like(val(cos)))


def fresnel_cond(cos_wh, eta, kappa):
    """Per-channel conductor Fresnel; eta/kappa plain per-lane scalars."""
    cos = cos_wh
    sin2 = maximum(1.0 - cos * cos, 1e-12)
    out = []
    for e, k in zip(eta, kappa):
        e2k2 = e * e - k * k - sin2
        a2b2 = sqrt(maximum(e2k2 * e2k2 + 4.0 * e * e * k * k, 1e-12))
        a = sqrt(maximum(0.5 * (a2b2 + e * e - k * k - sin2), 1e-12))
        # one dual div per channel: 0.5*(par+perp) = 0.5*Pn*(Qn+Qd)/(Pd*Qd)
        # (mirrors prims.fresnel_cond)
        c2 = cos * cos
        pn = a2b2 + c2 - 2.0 * a * cos
        pd = a2b2 + c2 + 2.0 * a * cos
        sin4 = sin2 * sin2
        qn = a2b2 * c2 + sin4 - 2.0 * a * cos * sin2
        qd = a2b2 * c2 + sin4 + 2.0 * a * cos * sin2
        out.append(0.5 * pn * (qn + qd) / (pd * qd))
    return out


def fr_microfacet(at, wi_l, wh_l, wo_l):
    """Cook-Torrance in the LOCAL frame (n = +z) — prims.fr_microfacet."""
    one = jnp.ones_like(val(wi_l[0]))
    z = jnp.zeros_like(val(wi_l[0]))
    nz = [z, z, one]
    den = 4.0 * maximum(absd(wi_l[2]) * absd(wo_l[2]), 1e-12)
    f = fresnel_cond(dot3(wi_l, wh_l), (at["er"], at["eg"], at["eb"]),
                     (at["kr"], at["kg"], at["kb"]))
    dg = ndf_beckmann(wh_l[2], at["alpha"]) * g1(nz, wi_l, wh_l, at["alpha"]) \
        * g1(nz, wo_l, wh_l, at["alpha"]) / den
    return [f[0] * dg, f[1] * dg, f[2] * dg]


def fr_microfacet_global(at, wi, wh, wo, n):
    den = 4.0 * maximum(absd(dot3(n, wi)) * absd(dot3(n, wo)), 1e-12)
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
    """Reference refraction incl. the stray -1 (microFacetUtilities.h:133)."""
    wo_l = to_local(n, wo)
    cos_i = dot3(wo, n)
    inv_ratio = GLASS_ETA_I / GLASS_ETA_T
    s2 = maximum(1.0 - inv_ratio * inv_ratio * (1.0 - cos_i * cos_i), 1e-12)
    cos_t = sqrt(s2)
    ratio = -(GLASS_ETA_T / GLASS_ETA_I)
    wt_l = [wo_l[0] * ratio, wo_l[1] * ratio, cos_t - 1.0]
    return normalize3(from_local(n, wt_l)), cos_t


def sample_bsdf(rng, at, d, n):
    """bdsf (vptShadeMethods.h:16-59) with dual normal: (fs, wi, pdf)."""
    wo = [-d[0], -d[1], -d[2]]
    u1, u2, u_choice = rng(), rng(), rng()
    z = jnp.zeros_like(u1)
    # lambert
    wi_l = cosine_hemi(n, u1, u2)
    cos_l = dot3(n, wi_l)
    pdf_l = cos_l * (1.0 / math.pi)
    fs_l = [at["ar"] * (1.0 / math.pi), at["ag"] * (1.0 / math.pi),
            at["ab"] * (1.0 / math.pi)]
    # dielectric
    wt, _ = refract_quirk(wo, n)
    fres = fresnel_die(dot3(n, wt), dot3(n, wo))
    refl = u_choice < val(fres)
    ndotwo = dot3(n, wo)
    wr = normalize3([2.0 * ndotwo * n[i] - wo[i] for i in range(3)])
    wi_d = sel3(refl, wr, wt)
    cos_d = dot3(n, wi_d)
    inv_cos = 1.0 / where(cos_d != 0.0, cos_d, 1e-12 + z)
    fs_d_s = where(refl, inv_cos * fres,
                   inv_cos * (1.0 - fres) * (GLASS_ETA_T * GLASS_ETA_T))
    pdf_d = where(refl, fres, 1.0 - fres)
    # microfacet
    wh = from_local(n, beckmann_wh(at["alpha"], u1, u2))
    wh_dot_wo = dot3(wh, wo)
    wi_m = [2.0 * wh_dot_wo * wh[i] - wo[i] for i in range(3)]
    fs_m = fr_microfacet_global(at, wi_m, wh, wo, n)
    pdf_m = ndf_beckmann(dot3(wh, n), at["alpha"]) * dot3(wh, n) / (
        4.0 * maximum(absd(wh_dot_wo), 1e-12))
    is_m, is_d = at["is_mic"], at["is_die"]
    fs = sel3(is_m, fs_m, sel3(is_d, [fs_d_s] * 3, fs_l))
    wi = sel3(is_m, wi_m, sel3(is_d, wi_d, wi_l))
    pdf = where(is_m, pdf_m, where(is_d, pdf_d, pdf_l))
    return fs, wi, pdf


def eval_fr_nee(at, n, wray, wi):
    wi_l = to_local(n, wi)
    wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
    wh = normalize3(add3(wi_l, wo_l))
    fr_m = fr_microfacet(at, wi_l, wh, wo_l)
    fr_lam = [at["ar"] * (1.0 / math.pi), at["ag"] * (1.0 / math.pi),
              at["ab"] * (1.0 / math.pi)]
    zero = jnp.zeros_like(val(fr_lam[0]) + val(wi[0]) * 0.0)
    return [where(at["is_mic"], fr_m[i],
                  where(at["is_die"], zero, fr_lam[i])) for i in range(3)]


def eval_fr_nee_plight(at, n, wray, wi):
    wi_l = to_local(n, wi)
    wo_l = to_local(n, [-wray[0], -wray[1], -wray[2]])
    wh = normalize3(add3(wi_l, wo_l))
    fr_m = fr_microfacet(at, wi_l, wh, wo_l)
    fr_lam = [at["ar"] * (1.0 / math.pi), at["ag"] * (1.0 / math.pi),
              at["ab"] * (1.0 / math.pi)]
    return sel3(at["is_mic"], fr_m, fr_lam)


def bsdf_pdf_for_dir(at, n, wo, wi, u_flip):
    pdf_l = dot3(n, wi) * (1.0 / math.pi)
    wt, _ = refract_quirk(wo, n)
    fres = fresnel_die(dot3(n, wt), dot3(n, wo))
    pdf_d = where(u_flip > val(fres), 1.0 - fres, fres)
    wh = normalize3(add3(wi, wo))
    pdf_m = ndf_beckmann(dot3(wh, n), at["alpha"]) * dot3(wh, n) / (
        4.0 * maximum(absd(dot3(wo, wh)), 1e-12))
    return where(at["is_mic"], pdf_m, where(at["is_die"], pdf_d, pdf_l))


def power_h(f, g):
    fc = clip(f, 0.0, 1e12)
    gc = clip(g, 0.0, 1e12)
    pos = val(fc) > 0.0
    one = jnp.ones_like(val(fc))
    z = jnp.zeros_like(val(fc))
    ratio = gc / where(pos, fc, one)
    return where(pos, 1.0 / (1.0 + ratio * ratio), z)


def power_h_invf(f_inv, g):
    """power_h(1/f_inv, g) = 1/(1 + (g*f_inv)^2); f_inv > 0 (see
    prims.power_h_invf) — one dual div instead of three."""
    r = clip(g, 0.0, 1e12) * f_inv
    return 1.0 / (1.0 + r * r)


def power_h_invg(f, g_inv):
    """power_h(f, 1/g_inv) = (f*g_inv)^2/((f*g_inv)^2 + 1); g > 0."""
    r = clip(f, 0.0, 1e12) * g_inv
    r2 = r * r
    z = jnp.zeros_like(val(r))
    return where(val(f) > 0.0, r2 / (r2 + 1.0), z)


# ---------------------------------------------------------------------------
# equi-angular trig (mirrors prims.atan_poly / atan2_posx / tan_sc)
# ---------------------------------------------------------------------------

def atan_poly(zz):
    z2 = zz * zz
    return zz * (0.99997726 + z2 * (-0.33262347 + z2 * (
        0.19354346 + z2 * (-0.11643287 + z2 * (
            0.05265332 + z2 * -0.01172120)))))


def atan2_posx(y, x):
    """atan2(y, x) for x > 0; dual through the polynomial + reciprocal."""
    zq = y / x
    inv = absd(zq) > 1.0
    one = jnp.ones_like(val(zq))
    zz = where(inv, 1.0 / where(zq != 0.0, zq, one), zq)
    p = atan_poly(zz)
    sgn = jnp.where(val(zq) >= 0.0, 1.0, -1.0)
    return where(inv, sgn * (math.pi / 2.0) - p, p)


def tan_sc(t):
    return sin(t) / cos(t)


# ---------------------------------------------------------------------------
# scene intersection with dual-capable sphere centers (mirrors prims)
#
# `ctr_tab[s]` is a length-3 list of per-sphere center components — python
# floats for baked spheres, D scalars for the differentiated one. Radii,
# materials, albedo/radiance stay python constants from `sc`
# (wavefront._scene_consts); the geometric kernel does not differentiate
# them (kernels/diff.py covers the material/medium set).
# ---------------------------------------------------------------------------

def sphere_first_t(sc, ctr_tab, o, d, s):
    """Nearest-root t with the Sphere.h:27-37 rescue — prims.sphere_first_t
    with dual origin/direction/center."""
    from .prims import EPS_T
    ctr = ctr_tab[s]
    r = float(sc["r"][s])
    oc = [o[0] - ctr[0], o[1] - ctr[1], o[2] - ctr[2]]
    b = dot3(oc, d)
    ococ = dot3(oc, oc)
    c0 = ococ - r * r
    disc = r * r - (ococ - b * b)
    pos = val(disc) > 0.0
    one = jnp.ones_like(val(disc))
    sq = sqrt(where(pos, disc, one)) * pos.astype(jnp.float32)
    sgn = jnp.where(val(b) >= 0.0, 1.0, -1.0)
    qq = -(b + sgn * sq)
    other = c0 / where(qq != 0.0, qq, one)
    t1 = minimum(qq, other)
    t2 = maximum(qq, other)
    eps = EPS_T + 16.0 * F32EPS * r
    t = where((t1 < 0.0) | (absd(t1) < eps), t2, t1)
    valid = pos & (val(t) > 0.0) & (jnp.abs(val(t)) > eps)
    return t, valid


def nearest(sc, ctr_tab, o, d):
    """prims.nearest with dual centers; albedo/radiance BAKED from sc."""
    from ..scene.scene import DIELECTRIC, MICROFACET
    S = len(sc["r"])
    z = jnp.zeros_like(val(o[0]))
    t_min = z + jnp.inf
    hit = z > 1.0
    at = {
        "cx": z, "cy": z, "cz": z, "ar": z, "ag": z, "ab": z,
        "rr": z, "rg": z, "rb": z, "er": z, "eg": z, "eb": z,
        "kr": z, "kg": z, "kb": z, "alpha": z,
        "em_f": z, "mic_f": z, "die_f": z,
        "sid": jnp.full(val(o[0]).shape, -1, jnp.int32),
    }
    for s in range(S):
        t, valid = sphere_first_t(sc, ctr_tab, o, d, s)
        closer = valid & (t < t_min)
        t_min = where(closer, t, t_min)
        hit = hit | closer
        eta = sc["eta"][s]; kap = sc["kap"][s]
        w = lambda const, old: jnp.where(closer, const, old)
        at["cx"] = where(closer, ctr_tab[s][0], at["cx"])
        at["cy"] = where(closer, ctr_tab[s][1], at["cy"])
        at["cz"] = where(closer, ctr_tab[s][2], at["cz"])
        at["ar"] = w(sc["alb"][s][0], at["ar"]); at["ag"] = w(sc["alb"][s][1], at["ag"]); at["ab"] = w(sc["alb"][s][2], at["ab"])
        at["rr"] = w(sc["rad"][s][0], at["rr"]); at["rg"] = w(sc["rad"][s][1], at["rg"]); at["rb"] = w(sc["rad"][s][2], at["rb"])
        at["er"] = w(eta[0], at["er"]); at["eg"] = w(eta[1], at["eg"]); at["eb"] = w(eta[2], at["eb"])
        at["kr"] = w(kap[0], at["kr"]); at["kg"] = w(kap[1], at["kg"]); at["kb"] = w(kap[2], at["kb"])
        at["alpha"] = w(sc["alpha"][s], at["alpha"])
        at["em_f"] = w(1.0 if any(v > 0 for v in sc["rad"][s]) else 0.0, at["em_f"])
        at["mic_f"] = w(1.0 if sc["mat"][s] == MICROFACET else 0.0, at["mic_f"])
        at["die_f"] = w(1.0 if sc["mat"][s] == DIELECTRIC else 0.0, at["die_f"])
        at["sid"] = jnp.where(closer, s, at["sid"])
    t_min = where(hit, t_min, z)
    at["is_em"] = at["em_f"] > 0.5
    at["is_mic"] = at["mic_f"] > 0.5
    at["is_die"] = at["die_f"] > 0.5
    return hit, t_min, at


def nearest_id_t(sc, ctr_tab, o, d, skip=()):
    """prims.nearest_id_t with dual centers: (hit, t, sid)."""
    S = len(sc["r"])
    z = jnp.zeros_like(val(o[0]))
    t_min = z + jnp.inf
    sid = jnp.full(val(o[0]).shape, -1, jnp.int32)
    for s in range(S):
        if s in skip:
            continue
        t, valid = sphere_first_t(sc, ctr_tab, o, d, s)
        closer = valid & (t < t_min)
        t_min = where(closer, t, t_min)
        sid = jnp.where(closer, s, sid)
    hit = sid >= 0
    return hit, where(hit, t_min, z), sid


def visibility_from(sc, ctr_tab, light, x):
    """Reference visibility (light -> x, pathTracingUtilities.h:39-53) with
    dual endpoints; the boolean is DETACHED, the distance is dual."""
    lx = [x[0] - light[0], x[1] - light[1], x[2] - light[2]]
    dist = norm3(lx)
    d = scale3(lx, 1.0 / dist)
    hit, t, _ = nearest_id_t(sc, ctr_tab, light, d)
    vis = (val(t) > val(dist) * (1.0 - 1024.0 * F32EPS)) | ~hit
    return vis, dist, d


def cross3(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


# ---------------------------------------------------------------------------
# heterogeneous density fields (mirror prims.field_* op-for-op on the primal
# so the geom kernel's primal plane stays bit-identical to the forward
# kernel; positions/directions carry dual tangents, field params are baked)
# ---------------------------------------------------------------------------

def log1p(a):
    if not isinstance(a, D):
        return jnp.log1p(a)
    return D(jnp.log1p(a.v), _scalet(a.t, 1.0 / (1.0 + a.v)))


def erf_poly(x):
    """A&S 7.1.26 erf (prims.erf_poly), dual: sign detached, rational +
    exp chains carry tangents."""
    s = jnp.where(val(x) >= 0.0, 1.0, -1.0)
    a = absd(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429)))) * exp(-a * a)
    return s * y


def field_density(fc, x):
    """Density multiplier d(x); x is a list of 3 dual-or-plain lanes.
    Voxel grids are PRIMAL-ONLY (geom.py guards dual builds): the
    inputs are plain lanes, so the call routes straight to the shared
    prims trilinear — exact arithmetic parity with the forward kernel."""
    if fc["kind"] == "grid":
        from . import prims as _pr
        return _pr.grid_density(fc, [val(c) for c in x])
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        return exp(clip(-k * (x[1] - y0), -80.0, 80.0))
    dens = None
    for (cx, cy, cz, r, w) in fc["params"]:
        dx = [x[0] - cx, x[1] - cy, x[2] - cz]
        g = w * exp(-0.5 * dot3(dx, dx) * (1.0 / (r * r)))
        dens = g if dens is None else dens + g
    return dens


def field_tau(fc, sigma_t, o, d, t):
    """Closed-form optical depth sigma_t * int_0^t density along unit d
    (prims.field_tau with dual o/d/t; sigma_t stays primal — the geom
    kernel duals carry GEOMETRY tangents only). Grids: primal-only
    (guarded at build), shared canonical pc march from prims."""
    import math as _math
    if fc["kind"] == "grid":
        from . import prims as _pr
        return _pr.field_tau(fc, val(sigma_t), [val(c) for c in o],
                             [val(c) for c in d], val(t))
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        d0 = exp(clip(-k * (o[1] - y0), -80.0, 80.0))
        d_end = exp(clip(-k * (o[1] + t * d[1] - y0), -80.0, 80.0))
        m = k * d[1]
        const = jnp.abs(val(m)) < 1e-6
        safe_m = where(const, 1.0, m)
        base = where(const, d0 * t, (d0 - d_end) / safe_m)
        # floor by |t| * min-endpoint-density (prims.field_tau guard:
        # both exponents clipping at one rail collapses the difference
        # form to 0 while density reports e^{80}); odd in t; magnitude
        # capped at the shared dead-lane rail (prims._TAU_CAP — the
        # f32-inf EA/near-horizontal overflow, round 4)
        from .prims import _TAU_CAP
        lb = t * minimum(d0, d_end)
        tau = where(val(t) >= 0.0, maximum(base, lb), minimum(base, lb))
        return sigma_t * clip(tau, -_TAU_CAP, _TAU_CAP)
    tau = None
    sqrt_half = _math.sqrt(0.5)
    sqrt_half_pi = _math.sqrt(0.5 * _math.pi)
    for (cx, cy, cz, r, w) in fc["params"]:
        oc = [cx - o[0], cy - o[1], cz - o[2]]
        a = dot3(oc, d)
        b2 = maximum(dot3(oc, oc) - a * a, 0.0)
        inv_r = 1.0 / r
        amp = exp(-0.5 * b2 * (inv_r * inv_r)) * (r * sqrt_half_pi * w)
        hi = erf_poly((t - a) * (inv_r * sqrt_half))
        lo = erf_poly(a * (inv_r * sqrt_half))
        g = amp * (hi + lo)
        tau = g if tau is None else tau + g
    return sigma_t * tau


def field_sample_free(fc, sigma_t, o, d, u, rng, t_cap):
    """Heterogeneous free-flight distance (prims.field_sample_free).
    exp_height: the closed-form CDF inversion REPARAMETERIZES — the
    sampled distance moves smoothly with the (dual) ray, matching the
    engine's AD through the analytic inversion. blobs: delta tracking's
    accept chain is event logic, so the distance is DETACHED (primal
    prims loop; same PCG draw count as the forward kernel)."""
    from .prims import BIG as _BIG
    from . import prims as _pr
    if fc["kind"] == "grid":
        # exact pc-tau inversion, deterministic in u (primal-only mode)
        return _pr.field_sample_free(
            fc, val(sigma_t), [val(c) for c in o], [val(c) for c in d],
            val(u), rng, val(t_cap))
    if fc["kind"] == "exp_height":
        k, y0 = fc["params"]
        d0 = exp(clip(-k * (o[1] - y0), -80.0, 80.0))
        m = k * d[1]
        tau_star = -log1p(-u)
        a = maximum(sigma_t * d0, 1e-30)
        const = jnp.abs(val(m)) < 1e-6
        safe_m = where(const, 1.0, m)
        arg = -tau_star * safe_m / a
        escapes = (~const) & (val(arg) <= -1.0)
        t_gen = -log1p(where(escapes, -0.5, arg)) / safe_m
        t_const = tau_star / a
        t_fin = where(escapes, _BIG, where(const, t_const, t_gen))
        return minimum(t_fin, _BIG)
    return _pr.field_sample_free(
        fc, val(sigma_t), [val(c) for c in o], [val(c) for c in d],
        val(u), rng, val(t_cap))
