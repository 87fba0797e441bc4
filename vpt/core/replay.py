"""Seed-matched reference replay: float64 scalar implementations of the
ACTIVE estimator (iterativeVPTracerFree, vptShadeMethods.h:1263-1340) and
the equi-angular explicit estimator (explicitVPTracerRecursive, :1014-1149)
that consume uniforms from an injected sequence in the reference's EXACT
draw order.

Why this exists (SURVEY §7.2): whole-path parity against the reference
binary cannot be asserted statistically with tight tolerances (its racy
shared erand48 makes its own renders non-reproducible, Vector.cpp:8).
Instead, both this tracer and the probe build of the unmodified reference
source (.refbuild/probe.cpp, whose erand48 is shadowed by a replayable
array) consume the SAME uniform sequence — the two must then agree to f64
rounding on every complete path. tests/test_replay_parity.py asserts
<= 1e-10 relative radiance error over thousands of seed-matched paths.

Every routine mirrors its reference twin's arithmetic and draw consumption,
including the quirks:
  - intersect leaves id untouched on a miss (pathTracingUtilities.h:33:
    only t is reset), so a missing camera ray shades with spheres[0]'s
    attributes in the emitter test;
  - depth-0 emitter hits OVERWRITE finalColor (vptShadeMethods.h:1310,
    `finalColor =` not `+=`);
  - freeSingleScattering's cone pass runs even for r==0 sources (the
    missing else, volumetricBasicFunctions.h:305-337), so the point value
    survives only when the degenerate center ray misses the point sphere;
  - MISv2's microfacet BSDF strategy reuses a STALE costhetaMax from the
    light loop when the strategy scores zero (misSamplingFunctions.h:160 —
    harmless, g is zero, but the pdf arithmetic replays identically);
  - the dielectric light-strategy gpdf consumes one extra draw
    (misSamplingFunctions.h:118-121).

This is an oracle (python scalars, ~10^4 paths/s); production paths are the
JAX engine and the Pallas kernels.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["Draws", "ReplayTracer"]

M_PI = math.pi
DBL_MAX = np.finfo(np.float64).max


class Draws:
    """Injected uniform sequence with a cursor — the replay analogue of the
    probe's shadowed erand48 (probe.cpp set_draws/draws_used)."""

    def __init__(self, us):
        self.us = np.asarray(us, np.float64)
        self.i = 0

    def __call__(self) -> float:
        if self.i < len(self.us):
            u = float(self.us[self.i])
        else:
            u = 0.5   # overrun sentinel, same as the probe
        self.i += 1
        return u

    @property
    def used(self) -> int:
        return self.i


def _v(x=0.0, y=0.0, z=0.0):
    return np.array([x, y, z], np.float64)


def _dot(a, b):
    """Vector::dot (Vector.h:27): strict left-to-right x*bx + y*by + z*bz."""
    return float(a[0]) * float(b[0]) + float(a[1]) * float(b[1]) \
        + float(a[2]) * float(b[2])


def _cross(a, b):
    """operator% (Vector.h:24)."""
    return _v(a[1] * b[2] - a[2] * b[1],
              a[2] * b[0] - a[0] * b[2],
              a[0] * b[1] - a[1] * b[0])


def _div(a, b):
    """IEEE division: C++ doubles give +-inf / nan on zero denominators
    (e.g. solidAngleProb of a point source, samplingFunctions.h:86);
    python floats raise instead."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.float64(a) / np.float64(b))


def _cabs(x):
    """The reference's unqualified `abs` on doubles resolves to the C
    INTEGER abs (only <cmath> is included; verified against the rebuilt
    reference TU: abs(0.869) == 0, abs(1.7) == 1). The argument truncates
    toward zero first, so every |x| < 1 becomes 0. This single quirk
    explains both the reference's effective ~1-unit intersection epsilon
    (Sphere.h:34, pathTracingUtilities.h:20) and its microfacet NaN factory
    (microFacetUtilities.h:91,98: 4*abs(cos) denominators truncate to 0).
    """
    return float(abs(int(x)))


def _norm(v):
    """Vector::normalize (Vector.h:33): multiply by 1/sqrt, not divide."""
    return v * (1.0 / math.sqrt(_dot(v, v)))


def _coordinate_system(n):
    """coordinateSystem (mathUtilities.h:10-19): returns (s, t)."""
    if abs(n[0]) > abs(n[1]):
        inv = 1.0 / math.sqrt(n[0] * n[0] + n[2] * n[2])
        t = _v(n[2] * inv, 0.0, -n[0] * inv)
    else:
        inv = 1.0 / math.sqrt(n[1] * n[1] + n[2] * n[2])
        t = _v(0.0, n[2] * inv, -n[1] * inv)
    s = _cross(t, n)
    return s, t


def _coordinate_traspose(n, w):
    """coordinateTraspose (mathUtilities.h:21-30): world -> local."""
    s, t = _coordinate_system(n)
    sinv = _v(s[0], t[0], n[0])
    tinv = _v(s[1], t[1], n[1])
    ninv = _v(s[2], t[2], n[2])
    return sinv * w[0] + tinv * w[1] + ninv * w[2]


def _from_local(n, w):
    s, t = _coordinate_system(n)
    return s * w[0] + t * w[1] + n * w[2]


class ReplayTracer:
    """Reference-replay tracer over an (S,) numpy scene (f64)."""

    def __init__(self, scene):
        self.r = np.asarray(scene.radius, np.float64)
        self.p = np.asarray(scene.center, np.float64)
        self.c = np.asarray(scene.albedo, np.float64)
        self.rad = np.asarray(scene.radiance, np.float64)
        self.mat = np.asarray(scene.material, np.int32)
        self.eta = np.asarray(scene.eta, np.float64)
        self.kappa = np.asarray(scene.kappa, np.float64)
        self.alpha = np.asarray(scene.alpha, np.float64)
        self.S = len(self.r)

    @classmethod
    def from_spheres(cls, spheres):
        """Build from a (radius, center, albedo, radiance, material, eta,
        kappa, alpha) tuple table (e.g. scene.CORNELL_VPT_SPHERES) with FULL
        f64 values — going through a jnp Scene without x64 enabled would
        silently truncate the 1e5-wall centers to f32 and shift every
        intersection distance by ~1e-2."""
        class _S:  # minimal attribute bag
            pass
        s = _S()
        s.radius = [row[0] for row in spheres]
        s.center = [row[1] for row in spheres]
        s.albedo = [row[2] for row in spheres]
        s.radiance = [row[3] for row in spheres]
        s.material = [row[4] for row in spheres]
        s.eta = [row[5] for row in spheres]
        s.kappa = [row[6] for row in spheres]
        s.alpha = [row[7] for row in spheres]
        return cls(s)

    # --- geometry (Sphere.h:27-37, pathTracingUtilities.h) ---------------
    def _sphere_intersect(self, i, o, d):
        oc = o - self.p[i]
        b = _dot(oc, d)
        det = b * b - _dot(oc, oc) + self.r[i] * self.r[i]
        if det < 0:
            return 0.0
        sq = math.sqrt(det)
        t2 = -b + sq
        t1 = -b - sq
        if t1 < 0 or _cabs(t1) < 1e-4:   # int-abs: any |t1| < 1 rescues
            return t2
        return t1

    def intersect(self, o, d, id0=0):
        """Returns (hit, t, id); id keeps its input value on a miss."""
        tmin = DBL_MAX
        idx = id0
        contact = 0
        for i in range(self.S):
            tact = self._sphere_intersect(i, o, d)
            if tact > 0 and _cabs(tact) > 1e-4:   # int-abs: t < 1 invisible
                contact += 1
                if tact < tmin:
                    tmin = tact
                    idx = i
        if contact > 0:
            return True, tmin, idx
        return False, 0.0, idx

    def visibility(self, light, x):
        lx = _norm(light - x) * -1.0
        distance = math.sqrt(_dot(light - x, light - x))
        _, t, _ = self.intersect(light, lx)
        return t > distance or t == 0.0

    def ray_tracer(self, x, wi):
        hit, _, idx = self.intersect(x, wi)
        if not hit:
            return _v(), 0
        return self.rad[idx].copy(), idx

    def cosine_theta_max(self, sourceid, x):
        radio = self.r[sourceid]
        cx = self.p[sourceid] - x
        normcx = math.sqrt(_dot(cx, cx))
        return math.sqrt(1.0 - (radio / normcx) * (radio / normcx))

    # --- media (volumetricBasicFunctions.h:14-21) ------------------------
    @staticmethod
    def transmitance(x1, x2, sigma_t):
        aux = x2 - x1
        return math.exp(-sigma_t * math.sqrt(_dot(aux, aux)))

    # --- microfacet / dielectric (microFacetUtilities.h) -----------------
    @staticmethod
    def _fresnel_spectre(cos, sin, eta, kappa):
        e2k2 = eta * eta - kappa * kappa - sin * sin
        a2b2 = math.sqrt(e2k2 * e2k2 + 4 * eta * eta * kappa * kappa)
        a = math.sqrt(0.5 * (a2b2 + eta * eta - kappa * kappa - sin * sin))
        perp = (a2b2 + cos * cos - 2 * a * cos) / (a2b2 + cos * cos + 2 * a * cos)
        par = perp * (a2b2 * cos * cos + sin ** 4 - 2 * a * cos * sin * sin) / (
            a2b2 * cos * cos + sin ** 4 + 2 * a * cos * sin * sin)
        return 0.5 * (par + perp)

    def _fresnel(self, cos_wh, eta, kappa):
        sin_wh = math.sqrt(1 - cos_wh * cos_wh)
        return _v(*(self._fresnel_spectre(cos_wh, sin_wh, eta[i], kappa[i])
                    for i in range(3)))

    @staticmethod
    def _ndf(cosine, alpha):
        if cosine >= 0:
            sine = math.sqrt(1 - cosine * cosine)
            fac1 = M_PI * alpha * alpha * cosine ** 4
            tang = _div(sine, cosine)
            return _div(1.0, fac1) * math.exp((-tang * tang) / (alpha * alpha))
        return 0.0

    @staticmethod
    def _gn(n, wv, wh, alpha):
        nv = _dot(n, wv)
        sin = math.sqrt(1 - nv * nv)
        tan = _div(sin, nv)
        a = _div(1.0, alpha * tan)
        if _dot(wv, wh) / nv > 0:
            if a < 1.6:
                return (3.535 * a + 2.181 * a * a) / (1 + 2.276 * a + 2.577 * a * a)
            return 1.0
        return 0.0

    def _fr_microfacet(self, eta, kappa, wi, wh, wo, alpha, n):
        # int-abs truncates the cosines to 0: den is 0 whenever both
        # |cos| < 1, making fr +-inf/nan — the reference NaN factory
        den = 4 * _cabs(_dot(n, wi)) * _cabs(_dot(n, wo))
        g = self._gn(n, wi, wh, alpha) * self._gn(n, wo, wh, alpha)
        with np.errstate(divide="ignore", invalid="ignore"):
            return self._fresnel(_dot(wi, wh), eta, kappa) * (
                self._ndf(_dot(n, wh), alpha) * g * _div(1.0, den))

    def _vector_facet(self, alpha, draws):
        theta = math.atan(math.sqrt(-alpha * alpha * math.log(1 - draws())))
        phi = 2 * M_PI * draws()
        return _norm(_v(math.sin(theta) * math.cos(phi),
                        math.sin(theta) * math.sin(phi), math.cos(theta)))

    def _microfacet_prob(self, wo, wh, alpha, n):
        # int-abs: |wo.wh| < 1 truncates to 0 => pdf is +-inf
        return _div(self._ndf(_dot(wh, n), alpha) * _dot(wh, n),
                    4 * _cabs(_dot(wo, wh)))

    @staticmethod
    def _fresnel_die(etai, etat, cos_t, cos_i):
        par = ((etat * cos_i - etai * cos_t) / (etat * cos_i + etai * cos_t)) ** 2
        perp = ((etai * cos_i - etat * cos_t) / (etai * cos_i + etat * cos_t)) ** 2
        return 0.5 * (par + perp)

    @staticmethod
    def _reflex_dielectric(wi, n):
        return wi * -1.0 + n * (_dot(n, wi)) * 2.0

    def _refrax_dielectric(self, etai, etat, wi, n):
        wilocal = _coordinate_traspose(n, wi)
        ratio = etat / etai * -1.0
        cos_i = _dot(wi, n)
        invratio = etai / etat
        cos_t = math.sqrt(1 - invratio * invratio * (1 - cos_i * cos_i)) - 1.0
        wtlocal = _v(wilocal[0] * ratio, wilocal[1] * ratio, cos_t)
        return _from_local(n, wtlocal)

    # --- samplers (samplingFunctions.h) ----------------------------------
    def _cosine_hemispheric(self, n, draws):
        theta = math.acos(math.sqrt(1 - draws()))
        phi = 2 * M_PI * draws()
        local = _v(math.sin(theta) * math.cos(phi),
                   math.sin(theta) * math.sin(phi), math.cos(theta))
        return _norm(_from_local(n, local))

    def _solid_angle_dir(self, wc, costheta_max, draws):
        e0 = draws()
        theta = math.acos((1 - e0) + e0 * costheta_max)
        phi = 2 * M_PI * draws()
        local = _v(math.sin(theta) * math.cos(phi),
                   math.sin(theta) * math.sin(phi), math.cos(theta))
        return _norm(_from_local(wc, local))

    @staticmethod
    def _solid_angle_prob(costheta_max):
        return _div(1.0, 2 * M_PI * (1 - costheta_max))

    # --- shading (samplingFunctions.h:163-261, vptShadeMethods.h:16-91) --
    def _solid_angle_L(self, n, cx, wray, costheta_max, x, indice, obj,
                       alpha, draws):
        """Shading overload of solidAngle (samplingFunctions.h:163-206);
        returns (L, wi) — the reference passes the sampled direction back
        through the `aux` out-param (:172)."""
        wi = self._solid_angle_dir(cx, costheta_max, draws)
        wilocal = _norm(_coordinate_traspose(n, wi))
        wolocal = _norm(_coordinate_traspose(n, wray * -1.0))
        wh = _norm(wilocal + wolocal)
        if self.mat[obj] == 0:
            fr = self.c[obj] / M_PI
        elif self.mat[obj] == 2:
            fr = _v()
        else:
            fr = self._fr_microfacet(self.eta[obj], self.kappa[obj], wilocal,
                                     wh, wolocal, alpha, _v(0, 0, 1))
        _, _, idx = self.intersect(x, wi)
        le = self.rad[idx].copy() if indice == idx else _v()
        L = le * fr * _dot(n, wi) * (1.0 / self._solid_angle_prob(costheta_max))
        return L, wi

    def _muestreo_sa(self, source, x, indice, obj, n, wray, alpha, draws):
        cx = self.p[source] - x
        normcx = math.sqrt(_dot(cx, cx))
        cx = cx * (1.0 / normcx)
        costheta_max = math.sqrt(
            1 - (self.r[source] / normcx) * (self.r[source] / normcx))
        L, wi = self._solid_angle_L(n, cx, wray, costheta_max, x, indice, obj,
                                    alpha, draws)
        return L, costheta_max, wi

    def _uniform(self, n, x, bdrf, draws):
        wi = _norm(self._cosine_hemispheric(n, draws))
        le, sourceid = self.ray_tracer(x, wi)
        L = le * (bdrf * (1 / M_PI)) * _dot(n, wi) * (1.0 / (_dot(n, wi) / M_PI))
        return L, wi, sourceid

    def _soft_dielectric(self, etat, etai, wi, n, x, draws):
        wt = _norm(self._refrax_dielectric(etai, etat, wi, n))
        F = self._fresnel_die(etai, etat, _dot(n, wt), _dot(n, wi))
        if draws() < F:
            wr = _norm(self._reflex_dielectric(wi, n))
            le, sourceid = self.ray_tracer(x, wr)
            return le * _div(1.0, _cabs(_dot(n, wr))), sourceid
        le, sourceid = self.ray_tracer(x, wt)
        ratio = etat / etai
        return le * _div(1.0, _cabs(_dot(n, wt))) * ratio * ratio, sourceid

    def _microfacet_strategy(self, x, wray, wh, n, obj, alpha, draws):
        """microfacet() (samplingFunctions.h:97-118); wh already drawn."""
        nlocal = _v(0, 0, 1)
        wo = _norm(_coordinate_traspose(n, wray * -1.0))
        wi = wo * -1.0 + wh * 2.0 * _dot(wh, wo)
        wi = _norm(wi)
        wiglobal = _norm(_from_local(n, wi))
        le, sourceid = self.ray_tracer(x, wiglobal)
        fr = self._fr_microfacet(self.eta[obj], self.kappa[obj], wi, wh, wo,
                                 alpha, nlocal)
        g = le * fr * _dot(nlocal, wi) * (1.0 / self._microfacet_prob(
            wo, wh, alpha, nlocal))
        return g, sourceid

    def mis_v2(self, obj, x, n, wray, alpha, sigma_t, draws):
        """MISv2 (misSamplingFunctions.h:96-170). `costheta_max` and `gpdf`
        are carried across branches like the reference's function-scope
        locals (the stale-value quirks at :148-153 and :158-160)."""
        montecarlo = _v()
        wo = wray * -1.0
        costheta_max = 0.0
        gpdf = 0.0
        for light in range(self.S):
            if self.r[light] > 0 and self.rad[light, 0] > 0:
                f, costheta_max, wi_light = self._muestreo_sa(
                    light, x, light, obj, n, wray, alpha, draws)
                f = f * self.transmitance(x, self.p[light], sigma_t)
                fpdf = self._solid_angle_prob(costheta_max)
                if self.mat[obj] == 0:
                    gpdf = _dot(n, wi_light) / M_PI
                elif self.mat[obj] == 2:
                    wt = _norm(self._refrax_dielectric(1.0, 1.5, wo, n))
                    gpdf = self._fresnel_die(1.0, 1.5, _dot(n, wt),
                                             _dot(n, wo))
                    if draws() > gpdf:
                        gpdf = 1 - gpdf
                else:
                    wh = _norm(wi_light + wo)
                    gpdf = self._microfacet_prob(wo, wh, alpha, n)
                wf = fpdf * fpdf / (fpdf * fpdf + gpdf * gpdf)
                montecarlo = montecarlo + f * wf
        # BSDF strategy
        if self.mat[obj] == 0:
            g, wiBDRF, sourceid = self._uniform(n, x, self.c[obj], draws)
            gpdf = _dot(n, wiBDRF) / M_PI
            if g[0] > 0 and g[1] > 0 and g[2] > 0:
                costheta_max = self.cosine_theta_max(sourceid, x)
                fpdf = self._solid_angle_prob(costheta_max)
                wg = gpdf * gpdf / (gpdf * gpdf + fpdf * fpdf)
            else:
                wg = 0.0
        elif self.mat[obj] == 2:
            g, sourceid = self._soft_dielectric(1.5, 1.0, wo, n, draws)
            # the reference uses the light-loop's leftover gpdf here
            if g[0] > 0 and g[1] > 0 and g[2] > 0:
                costheta_max = self.cosine_theta_max(sourceid, x)
                fpdf = self._solid_angle_prob(costheta_max)
                wg = gpdf * gpdf / (gpdf * gpdf + fpdf * fpdf)
            else:
                wg = 0.0
        else:
            wh = self._vector_facet(alpha, draws)
            wo_l = _norm(_coordinate_traspose(n, wo))
            g, sourceid2 = self._microfacet_strategy(x, wray, wh, n, obj,
                                                     alpha, draws)
            gpdf = self._microfacet_prob(wo_l, wh, alpha, _v(0, 0, 1))
            if g[0] > 0:
                costheta_max = self.cosine_theta_max(sourceid2, x)
            fpdf = self._solid_angle_prob(costheta_max)
            wg = gpdf * gpdf / (gpdf * gpdf + fpdf * fpdf)
        return montecarlo + g * wg

    # --- bdsf / pLight / medium NEE --------------------------------------
    def bdsf(self, wray, n, obj, draws):
        """bdsf (vptShadeMethods.h:16-59): (fs, wi, prob)."""
        wo = wray * -1.0
        m = self.mat[obj]
        if m == 0:
            wi = self._cosine_hemispheric(n, draws)
            fs = self.c[obj] * (1 / M_PI)
            prob = _dot(n, wi) / M_PI
        elif m == 2:
            wt = _norm(self._refrax_dielectric(1.0, 1.5, wo, n))
            F = self._fresnel_die(1.0, 1.5, _dot(n, wt), _dot(n, wo))
            if draws() < F:
                wi = _norm(self._reflex_dielectric(wo, n))
                fs = _v(1, 1, 1) / _dot(n, wi) * F
                prob = F
            else:
                wi = wt
                fs = _v(1, 1, 1) / _dot(n, wi) * (1 - F) * 1.5 * 1.5
                prob = 1 - F
        else:
            alpha = self.alpha[obj]
            wh_l = self._vector_facet(alpha, draws)
            wh = _from_local(n, wh_l)
            wi = wo * -1.0 + wh * 2.0 * _dot(wh, wo)
            fs = self._fr_microfacet(self.eta[obj], self.kappa[obj], wi, wh,
                                     wo, alpha, n)
            prob = self._microfacet_prob(wo, wh, alpha, n)
        return fs, wi, prob

    def plight(self, obj, x, n, wray, I, light, alpha):
        """pLight (vptShadeMethods.h:62-91); no material-3 spheres in the
        scenes we replay, so the multipleT fallback reduces to black."""
        if self.visibility(light, x):
            le = I * (1.0 / _dot(light - x, light - x))
        else:
            le = _v()
        wi = _norm(_coordinate_traspose(n, _norm(light - x)))
        wo = _norm(_coordinate_traspose(n, wray * -1.0))
        wh = _norm(wi + wo)
        if self.mat[obj] == 1:
            fr = self._fr_microfacet(self.eta[obj], self.kappa[obj], wi, wh,
                                     wo, alpha, _v(0, 0, 1))
        else:
            fr = self.c[obj] * (1 / M_PI)
        return le * fr * _dot(n, _norm(light - x))

    def free_single_scattering(self, xt, idsource, sigma_t, prob_source,
                               draws):
        """freeSingleScattering (volumetricBasicFunctions.h:284-340), incl.
        the unconditional cone pass after the point branch."""
        Ld = _v()
        if self.r[idsource] == 0:
            light = self.p[idsource]
            if self.visibility(light, xt):
                le = self.rad[idsource] * (1.0 / _dot(light - xt, light - xt))
                Ls = le * self.transmitance(xt, light, sigma_t) * (1 / (4 * M_PI))
                Ld = Ls * (1.0 / prob_source)
        wc = self.p[idsource] - xt
        wc_mag = math.sqrt(_dot(wc, wc))
        wc = wc * (1.0 / wc_mag)
        costheta_max = math.sqrt(
            1 - self.r[idsource] / wc_mag * (self.r[idsource] / wc_mag))
        wl = self._solid_angle_dir(wc, costheta_max, draws)
        prob_wl = self._solid_angle_prob(costheta_max)
        _, t_hit, id_hit = self.intersect(xt, wl)
        if idsource == id_hit:
            le = self.rad[idsource].copy()
            inter = math.exp(-sigma_t * t_hit)
            Ls = le * inter * (1 / (4 * M_PI))
            Ld = Ls * (1.0 / prob_wl) * (1.0 / prob_source)
        return Ld

    def single_scattering(self, xt, idsource, sigma_t, sigma_s, trans_xt,
                          prob_source, draws):
        """singleScattering (volumetricBasicFunctions.h:225-282): the
        equi-angular twin of freeSingleScattering — same branch structure,
        same missing-else cone pass, same draw consumption — with every
        contribution additionally scaled by transmitanceXT * sigma_s
        (:242, :277).

        NOT delegated to the free twin times that factor: the reference
        multiplies `Ls * T * sigma_s * (1/prob)` left-to-right, and this
        oracle's whole point is reproducing the reference's exact rounding —
        reassociating the product would cost the last ulp."""
        Ld = _v()
        if self.r[idsource] == 0:
            light = self.p[idsource]
            if self.visibility(light, xt):
                le = self.rad[idsource] * (1.0 / _dot(light - xt, light - xt))
                Ls = le * self.transmitance(xt, light, sigma_t) * (1 / (4 * M_PI))
                Ld = Ls * trans_xt * sigma_s * (1.0 / prob_source)
        wc = self.p[idsource] - xt
        wc_mag = math.sqrt(_dot(wc, wc))
        wc = wc * (1.0 / wc_mag)
        costheta_max = math.sqrt(
            1 - self.r[idsource] / wc_mag * (self.r[idsource] / wc_mag))
        wl = self._solid_angle_dir(wc, costheta_max, draws)
        prob_wl = self._solid_angle_prob(costheta_max)
        _, t_hit, id_hit = self.intersect(xt, wl)
        if idsource == id_hit:
            le = self.rad[idsource].copy()
            inter = math.exp(-sigma_t * t_hit)
            Ls = le * inter * (1 / (4 * M_PI))
            Ld = Ls * trans_xt * sigma_s * (1.0 / prob_wl) * (1.0 / prob_source)
        return Ld

    def equi_angular_params2(self, idsource, t_max, o, d, draws):
        """equiAngularParams2 (volumetricBasicFunctions.h:209-223): pivot
        projection, one xi draw; C's sqrt(negative) -> NaN preserved (the
        projection identity can go fractionally negative when the ray
        points at the light center)."""
        c = self.p[idsource]
        diff = c - o
        diff_norm = math.sqrt(_dot(diff, diff))
        proj = _dot(diff, d) / _dot(d, d)
        arg = diff_norm * diff_norm - proj * proj
        D = math.sqrt(arg) if arg >= 0 else float("nan")
        theta_a = math.atan2(0.0 - proj, D)
        theta_b = math.atan2(t_max - proj, D)
        xi = draws()
        sample_t = D * math.tan((1 - xi) * theta_a + xi * theta_b)
        return sample_t + proj, D, theta_a, theta_b, sample_t

    @staticmethod
    def equi_angular_prob(D, theta_a, theta_b, sample_t):
        """equiAngularProb (vptSamplingFunctions.h:60-62); fabs is the real
        double fabs here, not the int-abs quirk."""
        return D / abs(theta_b - theta_a) / (sample_t * sample_t + D * D)

    def isotropic_phase_sample(self, draws):
        xi1, xi2 = draws(), draws()
        theta = math.acos(1 - 2 * xi1)
        phi = 2 * M_PI * xi2
        return _norm(_v(math.sin(theta) * math.cos(phi),
                        math.sin(theta) * math.sin(phi), math.cos(theta)))

    # --- the active integrator ------------------------------------------
    def iterative_vpt_free(self, o, d, sigma_a, sigma_s, draws: Draws):
        """iterativeVPTracerFree (vptShadeMethods.h:1263-1340)."""
        stack = [(np.asarray(o, np.float64), np.asarray(d, np.float64), 0,
                  _v(1, 1, 1))]
        final = _v()
        sigma_t = sigma_a + sigma_s
        cp = 0.6
        q = 1 - cp

        while stack:
            co, cd, depth, tp = stack.pop()
            if draws() < q:
                continue
            hit, t, idx = self.intersect(co, cd, id0=0)
            if not hit:
                t = np.finfo(np.float32).max   # MAXFLOAT
            xs = co + cd * t
            normal = _norm(xs - self.p[idx])

            arr = [i for i in range(self.S) if (self.rad[i] > 0).any()][:4]
            count = len(arr)
            if count == 0:
                continue
            prob_source = 1.0 / count
            idsource = arr[int(draws() * count)]

            dist = -math.log(1 - draws()) / sigma_t

            if dist > t:
                if (self.rad[idx] > 0).any():
                    if depth == 0:
                        final = self.rad[idx] * tp        # OVERWRITE (:1310)
                    continue
                trs = self.transmitance(xs, self.p[idsource], sigma_t)
                ld_parcial = self.plight(idx, xs, normal, cd,
                                         self.rad[idsource], self.p[idsource],
                                         self.alpha[idx]) * trs * (1.0 / prob_source)
                ld = self.mis_v2(idx, xs, normal, cd, self.alpha[idx],
                                 sigma_t, draws)
                fs, wi, prob = self.bdsf(cd, normal, idx, draws)
                wi = _norm(wi)
                cosine = _dot(normal, wi)
                final = final + (ld_parcial + ld) * tp * (1.0 / cp)
                stack.append((xs, wi, depth + 1,
                              tp * fs * (1.0 / cp) * cosine * (1.0 / prob)))
            else:
                xt = co + cd * dist
                ld = self.free_single_scattering(xt, idsource, sigma_t,
                                                 prob_source, draws)
                wi_new = self.isotropic_phase_sample(draws)
                final = final + ld * tp * (sigma_s / sigma_t) * (1.0 / cp)
                stack.append((xt, wi_new, depth + 1,
                              tp * (sigma_s / sigma_t) * (1.0 / cp)))
        return final

    # --- the equi-angular explicit integrator ----------------------------
    def explicit_vpt_recursive(self, o, d, sigma_a, sigma_s, draws: Draws,
                               depth: int = 0):
        """explicitVPTracerRecursive (vptShadeMethods.h:1014-1149): the
        equi-angular explicit estimator, depth-first in the reference's
        exact draw order (RR, light pick, EA xi, event Bernoulli, then the
        branch's MISv2/bdsf or singleScattering/phase draws, then the
        recursive tail). Quirks preserved: miss keeps id=0 and TrActual=0
        (so a missing ray always takes the medium branch), depth>0 emitter
        hits return BLACK for the whole subtree (:1098-1104), and the
        terminal RR survival is uncompensated on the depth-0 credit."""
        o = np.asarray(o, np.float64)
        d = np.asarray(d, np.float64)
        sigma_t = sigma_a + sigma_s
        cp = 0.6
        q = 1 - cp
        if draws() < q:
            return _v()
        hit, t, idx = self.intersect(o, d, id0=0)
        if not hit:
            t = np.finfo(np.float32).max          # MAXFLOAT (:1034)
            tr_actual = 0.0
        else:
            tr_actual = self.transmitance(o, o + d * t, sigma_t)
        xs = o + d * t
        normal = _norm(xs - self.p[idx])

        arr = [i for i in range(self.S) if (self.rad[i] > 0).any()][:4]
        count = len(arr)
        if count == 0:
            return _v()
        prob_source = 1.0 / count
        idsource = arr[int(draws() * count)]

        d_final, D, theta_a, theta_b, sample_t = self.equi_angular_params2(
            idsource, t, o, d, draws)
        p_success = (self.equi_angular_prob(D, theta_a, theta_b, sample_t)
                     * (1.0 - tr_actual))

        if draws() <= tr_actual:
            if (self.rad[idx] > 0).any():
                if depth > 0:
                    return _v()
                return self.rad[idx].copy()
            trs = self.transmitance(xs, self.p[idsource], sigma_t)
            ld_parcial = self.plight(
                idx, xs, normal, d, self.rad[idsource], self.p[idsource],
                self.alpha[idx]) * trs * (1.0 / prob_source)
            ld = self.mis_v2(idx, xs, normal, d, self.alpha[idx],
                             sigma_t, draws)
            fs, wi, prob = self.bdsf(d, normal, idx, draws)
            wi = _norm(wi)
            cosine = _dot(normal, wi)
            rec = self.explicit_vpt_recursive(xs, wi, sigma_a, sigma_s,
                                              draws, depth + 1)
            return ((ld_parcial + ld) * (1.0 / cp)
                    + fs * rec * (1.0 / cp) * cosine * (1.0 / prob))
        else:
            xt = o + d * d_final
            T = self.transmitance(o, xt, sigma_t)
            ld = self.single_scattering(xt, idsource, sigma_t, sigma_s, T,
                                        prob_source, draws)
            wi_new = self.isotropic_phase_sample(draws)
            rec = self.explicit_vpt_recursive(xt, wi_new, sigma_a, sigma_s,
                                              draws, depth + 1)
            return (ld * (1.0 / p_success) * (1.0 / cp)
                    + rec * sigma_s * T * (1.0 / cp) * (1.0 / p_success))
