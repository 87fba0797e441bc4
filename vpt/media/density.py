"""Heterogeneous participating media: spatially-varying density fields.

NO reference counterpart — the reference medium is strictly homogeneous
(sigma_a/sigma_s constants at src/rt.cpp:794, closed-form Beer-Lambert at
volumetricBasicFunctions.h:14-21). This module extends the framework the
way a production volumetric renderer does, but designed TPU-first:

  - density fields are ANALYTIC (pure VPU arithmetic, no voxel gathers —
    TPU gathers across lanes are the one thing the hardware hates), with
    CLOSED-FORM line integrals, so transmittance along any segment is
    exact (zero extra variance) and costs a handful of exp/erf ops:

      * "exp_height":  d(x) = exp(-k * (x_y - y0))   (atmosphere / fog)
        optical depth along a ray is a single expm1; the free-flight
        distance CDF inverts in CLOSED FORM (one log1p) — heterogeneous
        distance sampling with zero rejection iterations;

      * "blobs":  d(x) = sum_i w_i exp(-|x - c_i|^2 / (2 r_i^2))
        (smoke puffs / clouds); optical depth is a sum of 1-D Gaussian
        integrals (erf pairs); distance sampling is unbiased DELTA
        (Woodcock) TRACKING against the majorant, a bounded masked loop —
        the classic null-collision scheme, which maps onto the persistent
        wavefront exactly like any other per-lane loop.

  - sigma_a(x) = sigma_a * d(x) and sigma_s(x) = sigma_s * d(x) share the
    density, so the single-scattering albedo sigma_s(x)/sigma_t(x) stays
    the constant sigma_s/sigma_t and the PBRT cancellation the reference's
    free-flight estimator relies on (vptShadeMethods.h:1248) carries over
    verbatim to the heterogeneous case: medium-event weight sigma_s/sigma_t,
    surface-event weight 1 — for BOTH the analytic inversion (pdf is
    sigma_t(x_t) e^{-tau(t)} exactly) and delta tracking (same law in
    expectation over null collisions).

Everything is batched over (..., 3) arrays and differentiable w.r.t. the
field params and sigma; the Pallas kernels bake the same formulas as
python consts (kernels/wavefront.py heterogeneous branch).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = [
    "DensityField",
    "exp_height",
    "blobs",
    "density",
    "optical_depth",
    "transmittance_between",
    "sample_distance",
    "erf_poly",
    "EXP_HEIGHT",
    "BLOBS",
]

EXP_HEIGHT = "exp_height"
BLOBS = "blobs"
GRID = "grid"

_BIG = 1e8          # "never scatters" distance, matches geometry.BIG
_M_EPS = 1e-6       # |k * d_y| below this uses the constant-density limit


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensityField:
    """Spatially-varying density multiplier d(x) >= 0.

    params: traced, differentiable —
      exp_height: (2,)  [k, y0]          d(x) = exp(-k (x_y - y0))
      blobs:      (K,5) [cx,cy,cz,r,w]   d(x) = sum w exp(-|x-c|^2/(2r^2))
    kind:     static field type.
    majorant: static upper bound sup_x d(x) over the region rays traverse
              (delta tracking's null-collision rate; for exp_height supply
              exp(-k (y_min - y0)) for the scene's lowest reachable y; for
              blobs sum(w) is always safe).
    max_null: static cap on delta-tracking null collisions per flight
              (P(exceed) ~ e^{-max_null * margin}; 64 is conservative).
    """

    params: jnp.ndarray
    kind: str = dataclasses.field(default=EXP_HEIGHT,
                                  metadata=dict(static=True))
    majorant: float = dataclasses.field(default=1.0,
                                        metadata=dict(static=True))
    max_null: int = dataclasses.field(default=64, metadata=dict(static=True))
    # grid-field geometry (kind == "grid" only): world-space min corner and
    # per-axis voxel spacing; static so the trilinear indexing folds
    grid_origin: tuple = dataclasses.field(default=(),
                                           metadata=dict(static=True))
    grid_spacing: tuple = dataclasses.field(default=(),
                                            metadata=dict(static=True))
    # marched-quadrature step count for the grid optical depth (the grid
    # has no closed form; constant-step marching is the reference's own
    # transmittance idiom, rayMarchingMethods.h)
    n_march: int = dataclasses.field(default=32, metadata=dict(static=True))
    # cap on the modeled variation window, in grid diagonals (see
    # _grid_t_far): beyond march_extent * diag the density is treated as
    # constant along the ray even if a slow coordinate has not railed yet
    march_extent: float = dataclasses.field(default=4.0,
                                            metadata=dict(static=True))
    # pc TRANSPORT model interpolant (kind == "grid"): "tri" = trilinear
    # (round-4 behavior), "nearest" = xy-nearest / z-linear — ONE table
    # gather per pc evaluation instead of four, the round-5 answer to the
    # n>=24 gather wall (tools/grid_lookup_v2_study.py). Appearance
    # densities (density(field, x)) stay trilinear either way; sampling
    # pdf and all transmittance weights share the pc tau, so the
    # estimator is self-consistent under both settings.
    transport_interp: str = dataclasses.field(default="tri",
                                              metadata=dict(static=True))


def exp_height(k: float, y0: float, majorant: float,
               dtype=jnp.float32) -> DensityField:
    return DensityField(params=jnp.asarray([k, y0], dtype), kind=EXP_HEIGHT,
                        majorant=float(majorant))


def blobs(rows, majorant: float | None = None,
          dtype=jnp.float32) -> DensityField:
    """rows: (K, 5) [cx, cy, cz, radius, weight]."""
    p = jnp.asarray(rows, dtype).reshape(-1, 5)
    if majorant is None:
        import numpy as np
        majorant = float(np.sum(np.asarray(p[:, 4], np.float64)))
    return DensityField(params=p, kind=BLOBS, majorant=float(majorant))


def grid(values, origin, spacing, majorant: float | None = None,
         max_null: int = 64, n_march: int = 32,
         transport_interp: str = "tri",
         dtype=jnp.float32) -> DensityField:
    """Voxel-grid density (the production field type: baked clouds/smoke).
    values: (nx, ny, nz) densities at voxel CENTERS, trilinearly
    interpolated, clamp-to-edge outside; origin: world min corner;
    spacing: per-axis voxel size. Differentiable w.r.t. `values`
    (inverse volume reconstruction). Transport uses the canonical
    piecewise-constant ray model (n_march segments over [0, t_far] +
    exact constant tail — see optical_depth/_sample_grid_march): optical
    depth and distance sampling derive from the SAME tau, in the engine
    and in the fused Pallas kernels (round 4: chunked lane-gather
    trilinear lookups, tools/grid_gather_study.py)."""
    import numpy as np

    v = jnp.asarray(values, dtype)
    if v.ndim != 3 or min(v.shape) < 2:
        raise ValueError(f"grid needs (nx, ny, nz) with every axis >= 2; "
                         f"got {v.shape}")
    if majorant is None:
        majorant = float(np.max(np.asarray(values, np.float64))) * 1.001
    if transport_interp not in ("tri", "nearest"):
        raise ValueError(f"transport_interp must be 'tri' or 'nearest', "
                         f"got {transport_interp!r}")
    return DensityField(
        params=v, kind=GRID, majorant=float(majorant), max_null=max_null,
        grid_origin=tuple(float(x) for x in origin),
        grid_spacing=tuple(float(x) for x in spacing), n_march=n_march,
        transport_interp=transport_interp)


def density(field: DensityField, x: jnp.ndarray) -> jnp.ndarray:
    """d(x) for x (..., 3) -> (...)."""
    if field.kind == EXP_HEIGHT:
        k, y0 = field.params[0], field.params[1]
        # exponent clipped to +-80 like optical_depth / kernels' prims
        # .field_density: an EA sample placed tens of thousands of units
        # below the fog plane (miss lanes) otherwise evaluates exp(+2000)
        # = inf, and 0 * inf against its (consistently huge-tau) T == 0
        # factor is NaN
        return jnp.exp(jnp.clip(-k * (x[..., 1] - y0), -80.0, 80.0))
    if field.kind == BLOBS:
        c = field.params[:, :3]                       # (K, 3)
        r = field.params[:, 3]                        # (K,)
        w = field.params[:, 4]
        dx = x[..., None, :] - c                      # (..., K, 3)
        d2 = jnp.sum(dx * dx, axis=-1)                # (..., K)
        return jnp.sum(w * jnp.exp(-0.5 * d2 / (r * r)), axis=-1)
    if field.kind == GRID:
        g = field.params                              # (nx, ny, nz)
        nx, ny, nz = g.shape
        org = jnp.asarray(field.grid_origin, g.dtype)
        spc = jnp.asarray(field.grid_spacing, g.dtype)
        # voxel centers at origin + (i + 0.5) * spacing; clamp-to-edge
        u = (x - org) / spc - 0.5
        u = jnp.clip(u, 0.0, jnp.asarray([nx - 1, ny - 1, nz - 1],
                                         g.dtype))
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32),
                      0, jnp.asarray([nx - 2, ny - 2, nz - 2]))
        f = jnp.clip(u - i0.astype(g.dtype), 0.0, 1.0)
        flat = g.reshape(-1)

        def corner(dx_, dy_, dz_):
            idx = ((i0[..., 0] + dx_) * ny + (i0[..., 1] + dy_)) * nz \
                + (i0[..., 2] + dz_)
            return jnp.take(flat, idx)

        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
        c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
        c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
        c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
        return ((c00 * (1 - fy) + c01 * fy) * (1 - fx)
                + (c10 * (1 - fy) + c11 * fy) * fx)
    raise ValueError(f"unknown density kind {field.kind!r}")


def erf_poly(x):
    """Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7), odd-extended.
    erf via exp only — Mosaic lowers no erf primitive, and the engine uses
    the same polynomial so kernel/engine parity is exact by construction."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    y = 1.0 - t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429)))) * jnp.exp(-a * a)
    return s * y


_SQRT_HALF = math.sqrt(0.5)
_SQRT_HALF_PI = math.sqrt(0.5 * math.pi)


def optical_depth(field: DensityField, sigma_t, o, d, t):
    """tau = sigma_t * int_0^t d(o + s*dir) ds, closed form. `d` must be
    unit-length; o (..., 3), t (...).

    ODD in t (all three closed forms are): a negative t means the segment
    [o + t d, o] and tau comes out negative — callers evaluating EA samples
    behind the ray origin take |tau| (engine.bounce_step t_xt). Do NOT
    clamp t to 0 here: that made tau(t<0) == 0 while density(o + t d) can
    be e^{80} deep below an exp_height fog plane, and the inconsistent
    pair (T == 1, sigma_s(xt) astronomically large) blew up EA medium
    weights into inf (NaN two bounces later)."""
    if field.kind == EXP_HEIGHT:
        k, y0 = field.params[0], field.params[1]
        # difference form tau = sigma_t (d(o) - d(o + t dir)) / m: the
        # product form d0 * (1-e^{-mt})/m is 0 * inf = NaN when a segment
        # spans the fp range of the exponential (e.g. NEE rays from a
        # lane that escaped far above the fog); endpoint densities are
        # evaluated directly with clamped exponents (e^{+-80} ~ f32 range,
        # far beyond any physically meaningful optical depth either way)
        e0 = jnp.clip(-k * (o[..., 1] - y0), -80.0, 80.0)
        e1 = jnp.clip(-k * (o[..., 1] + t * d[..., 1] - y0), -80.0, 80.0)
        d0 = jnp.exp(e0)
        d_end = jnp.exp(e1)
        m = k * d[..., 1]                             # decay rate along ray
        const = jnp.abs(m) < _M_EPS
        safe_m = jnp.where(const, 1.0, m)
        base = jnp.where(const, d0 * t, (d0 - d_end) / safe_m)
        # floor the magnitude by |t| * min-endpoint-density (valid: density
        # is monotone in t along a ray): when BOTH exponents clip at the
        # same rail the difference form collapses to 0 while density(x)
        # reports e^{80} — the inconsistency documented above (kernels/
        # prims.field_tau has the identical guard); keeps tau odd in t
        lb = t * jnp.minimum(d0, d_end)
        tau = jnp.where(t >= 0.0, jnp.maximum(base, lb),
                        jnp.minimum(base, lb))
        # dead-lane f32-inf rail (kernels/prims._TAU_CAP, round 4): an EA
        # sample far below the plane on a near-horizontal ray reaches
        # base ~ e^80 / 1e-6 > f32 max; any capped lane has zero
        # transmittance identically, the cap only keeps 0 * tau finite
        # in reverse mode
        return sigma_t * jnp.clip(tau, -3.0e7, 3.0e7)
    if field.kind == BLOBS:
        c = field.params[:, :3]
        r = field.params[:, 3]
        w = field.params[:, 4]
        oc = c - o[..., None, :]                      # (..., K, 3)
        a = jnp.sum(oc * d[..., None, :], axis=-1)    # foot along the ray
        b2 = jnp.maximum(jnp.sum(oc * oc, axis=-1) - a * a, 0.0)
        inv_r = 1.0 / r
        # int_0^t e^{-((s-a)^2+b^2)/(2 r^2)} ds
        #   = r sqrt(pi/2) e^{-b^2/2r^2} [erf((t-a)/(r sqrt2)) + erf(a/(r sqrt2))]
        amp = jnp.exp(-0.5 * b2 * inv_r * inv_r) * (r * _SQRT_HALF_PI)
        hi = erf_poly((t[..., None] - a) * (inv_r * _SQRT_HALF))
        lo = erf_poly(a * (inv_r * _SQRT_HALF))
        return sigma_t * jnp.sum(w * amp * (hi + lo), axis=-1)
    if field.kind == GRID:
        # canonical piecewise-constant ray model (round 4): march the FIXED
        # segmentation [0, t_far] in M midpoint segments (t_far = where
        # clamp-to-edge freezes every coordinate, so density is exactly
        # constant beyond) and add the closed-form constant tail. tau(t) is
        # then linear-in-t inside each canonical segment — ONE density
        # model per ray, shared exactly with sample_distance's inversion
        # (the sampling pdf sigma_t rho(t) e^{-tau(t)} and every
        # transmittance weight derive from the same tau: the estimator is
        # self-consistent, with only the O((t_far/M)^2) field-approximation
        # bias of the pc model itself). Replaces the round-3
        # midpoint-over-[0, min(t, 1e6)] rule whose segmentation changed
        # with the query t. Negative t (equi-angular samples behind the
        # origin) integrates the reversed ray's own canonical model —
        # keeps tau odd-ish (exactly: tau(t<0) = -tau_rev(-t)).
        pos = _grid_tau_nonneg(field, sigma_t, o, d, jnp.maximum(t, 0.0))
        neg = _grid_tau_nonneg(field, sigma_t, o, -d, jnp.maximum(-t, 0.0))
        return jnp.where(t >= 0.0, pos, -neg)
    raise ValueError(f"unknown density kind {field.kind!r}")


def _grid_rails(field: DensityField):
    """World-space clamp rails of the trilinear lattice: coordinates map to
    u_i = (x_i - org_i)/spc_i - 0.5 clipped to [0, n_i - 1], so the clamp
    engages at x = org + 0.5 spc (low) and org + (n - 0.5) spc (high)."""
    nx, ny, nz = field.params.shape
    # python floats: numpy scalars in grid_origin/spacing (fields built
    # by hand instead of df.grid()) are NOT weak-typed and would promote
    # the whole lane state to f64 under jax x64
    org = tuple(float(v) for v in field.grid_origin)
    spc = tuple(float(v) for v in field.grid_spacing)
    lo = tuple(org[i] + 0.5 * spc[i] for i in range(3))
    hi = tuple(org[i] + (n - 0.5) * spc[i]
               for i, n in enumerate((nx, ny, nz)))
    return lo, hi


def _grid_window(field: DensityField, o, d):
    """(t0, t1): the canonical model's marched variation window.

    t1 = railing distance — beyond it every coordinate is frozen by
    clamp-to-edge and the density is exactly constant (t_i =
    (rail_i - o_i)/d_i per axis; a coordinate with d_i ~ 0 never moves).
    t0 = slab entry into the rail box (0 when the origin is inside or the
    ray misses): the model treats [0, t0] as ONE constant-density head
    segment — outside the box only boundary-slide variation exists, and
    spending march segments on a camera's dead approach stretch starved
    the in-volume resolution (round-4 tomography regression: segments 3x
    the voxel size made the score density inconsistent with the field).
    The window length is CAPPED at march_extent grid diagonals: a
    near-face-parallel component otherwise rails at extent/|d_i| ~ 1e5
    units (residual variation beyond the cap is declared constant — a
    documented model choice affecting only such rays in open scenes).
    tau, the sampling inversion and the event pc density all share this
    window, so self-consistency is exact by construction."""
    lo, hi = _grid_rails(field)
    t_rail = jnp.zeros_like(o[..., 0])
    t_enter = jnp.full_like(o[..., 0], -_BIG)
    t_exit = jnp.full_like(o[..., 0], _BIG)
    for i in range(3):
        di = d[..., i]
        oi = o[..., i]
        moving = jnp.abs(di) > 1e-12
        inv = 1.0 / jnp.where(moving, di, 1.0)
        rail = jnp.where(di > 0.0, hi[i], lo[i])
        t_rail = jnp.maximum(t_rail,
                             jnp.where(moving, (rail - oi) * inv, 0.0))
        ta = (lo[i] - oi) * inv
        tb = (hi[i] - oi) * inv
        inside = (oi >= lo[i]) & (oi <= hi[i])
        near = jnp.where(moving, jnp.minimum(ta, tb),
                         jnp.where(inside, -_BIG, _BIG))
        far = jnp.where(moving, jnp.maximum(ta, tb),
                        jnp.where(inside, _BIG, -_BIG))
        t_enter = jnp.maximum(t_enter, near)
        t_exit = jnp.minimum(t_exit, far)
    diag = math.sqrt(sum((n * s) ** 2 for n, s in
                         zip(field.params.shape, field.grid_spacing)))
    cap = field.march_extent * diag
    box_hit = (t_enter <= t_exit) & (t_exit > 0.0)
    t0 = jnp.where(box_hit, jnp.clip(t_enter, 0.0, None), 0.0)
    # TWO-REGION march (round 4): region A [t0, ta] covers the box
    # crossing — at most one diagonal, where the field actually varies —
    # with ~3/4 of the segments; region B [ta, tb] covers the boundary-
    # slide stretch out to the railing distance with the rest. A single
    # window to t_rail starved the crossing of resolution (h of several
    # voxels — a visible n_march=8-vs-16 image bias on chip); a window
    # cut at the box exit mismodeled far-tail queries through the slide
    # region (2x tau errors on oblique rays). Rays that never enter the
    # box are all slide: A and B split the capped railing window.
    ta = jnp.where(box_hit,
                   jnp.minimum(jnp.minimum(t_exit, t_rail), t0 + cap),
                   jnp.minimum(t_rail, cap) * 0.75)
    ta = jnp.maximum(ta, t0 + 1e-6)
    tb = jnp.minimum(t_rail, ta + cap)
    tb = jnp.maximum(tb, ta + 1e-6)
    return t0, ta, tb


def _grid_m_split(M: int):
    """Static split of the n_march budget: ~3/4 to the crossing region A,
    the rest to the slide region B."""
    m2 = max(1, M // 4)
    return M - m2, m2


def _grid_segments(field: DensityField, o, d):
    """Per-segment (start, width) arrays of the canonical two-region
    segmentation, shape (M, ...)."""
    t0, ta, tb = _grid_window(field, o, d)
    M = field.n_march
    M1, M2 = _grid_m_split(M)
    h1 = (ta - t0) / M1
    h2 = (tb - ta) / M2
    i = jnp.arange(M, dtype=h1.dtype).reshape((M,) + (1,) * t0.ndim)
    in_a = i < M1
    seg0 = jnp.where(in_a, t0[None] + i * h1[None],
                     ta[None] + (i - M1) * h2[None])
    w = jnp.where(in_a, h1[None], h2[None])
    return t0, ta, tb, h2, seg0, w


def _grid_tau_nonneg(field: DensityField, sigma_t, o, d, t):
    """Canonical-model optical depth for t >= 0 (see optical_depth GRID):
    constant head on [0, t0], the two-region midpoint segmentation on
    [t0, tb], constant tail beyond tb."""
    t0, ta, tb, h2, seg0, w = _grid_segments(field, o, d)
    pts = o[None] + (seg0 + 0.5 * w)[..., None] * d[None]
    dens = _pc_eval(field, pts)                           # (M, ...)
    overlap = jnp.clip(t[None] - seg0, 0.0, w)
    tau_march = jnp.sum(dens * overlap, axis=0)
    rho_head = _pc_eval(field, o + (0.5 * t0)[..., None] * d)
    d_inf = _pc_eval(field, o + (tb + h2)[..., None] * d)
    return sigma_t * (rho_head * jnp.minimum(t, t0) + tau_march
                      + d_inf * jnp.maximum(t - tb, 0.0))


def grid_pc_density(field: DensityField, o, d, t):
    """The canonical pc model's OWN density at ray parameter t >= 0 —
    i.e. d tau/dt / sigma_t: the exact sampling-pdf density of
    _sample_grid_march (score terms must use THIS, not the trilinear
    point value, or the event log-density disagrees with the law the
    distance was actually drawn from)."""
    M = field.n_march
    M1, M2 = _grid_m_split(M)
    t0, ta, tb = _grid_window(field, o, d)
    h1 = (ta - t0) / M1
    h2 = (tb - ta) / M2
    kA = jnp.clip(jnp.floor((t - t0) / h1), 0, M1 - 1)
    kB = jnp.clip(jnp.floor((t - ta) / h2), 0, M2 - 1)
    t_mid = jnp.where(t < ta, t0 + (kA + 0.5) * h1, ta + (kB + 0.5) * h2)
    # head / body / tail sample point, one trilinear eval
    t_s = jnp.where(t < t0, 0.5 * t0, jnp.where(t > tb, tb + h2, t_mid))
    return _pc_eval(field, o + t_s[..., None] * d)


def _pc_eval(field: DensityField, x: jnp.ndarray) -> jnp.ndarray:
    """Density evaluation of the pc TRANSPORT model (kernels/prims.
    grid_pc_eval mirror): trilinear, or xy-nearest / z-linear under
    transport_interp == "nearest". Appearance densities use density()."""
    if field.kind != GRID or field.transport_interp != "nearest":
        return density(field, x)
    g = field.params
    nx, ny, nz = g.shape
    org = jnp.asarray(field.grid_origin, g.dtype)
    spc = jnp.asarray(field.grid_spacing, g.dtype)
    u = (x - org) / spc - 0.5
    u = jnp.clip(u, 0.0, jnp.asarray([nx - 1, ny - 1, nz - 1], g.dtype))
    rx = jnp.minimum((u[..., 0] + 0.5).astype(jnp.int32), nx - 1)
    ry = jnp.minimum((u[..., 1] + 0.5).astype(jnp.int32), ny - 1)
    iz = jnp.minimum(u[..., 2].astype(jnp.int32), nz - 2)
    fz = jnp.clip(u[..., 2] - iz.astype(g.dtype), 0.0, 1.0)
    flat = g.reshape(-1)
    base = (rx * ny + ry) * nz + iz
    c0 = jnp.take(flat, base)
    c1 = jnp.take(flat, base + 1)
    return c0 + (c1 - c0) * fz


def transmittance_between(field: DensityField, sigma_t, x1, x2,
                          eps: float = 1e-20):
    """exp(-tau) along the segment x1 -> x2 (heterogeneous Beer-Lambert;
    the drop-in for media.medium.transmittance)."""
    seg = x2 - x1
    dist = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-1), eps))
    w = seg / dist[..., None]
    return jnp.exp(-optical_depth(field, sigma_t, x1, w, dist))


def _sample_exp_height(field: DensityField, sigma_t, o, d, u):
    """Closed-form inversion of the heterogeneous free-flight CDF
    1 - e^{-tau(t)}: solve tau(t) = -log(1-u). Zero rejection steps; fully
    reparameterized (differentiable in sigma_t, k, y0). Returns the sampled
    distance, _BIG when the ray escapes to zero density before scattering
    (m > 0 and tau_max = sigma_t d0 / m < tau*)."""
    k, y0 = field.params[0], field.params[1]
    d0 = jnp.exp(jnp.clip(-k * (o[..., 1] - y0), -80.0, 80.0))
    m = k * d[..., 1]
    tau_star = -jnp.log1p(-u)                         # target optical depth
    a = sigma_t * d0                                  # d tau/dt at t=0
    const = jnp.abs(m) < _M_EPS
    safe_m = jnp.where(const, 1.0, m)
    # tau(t) = a (1 - e^{-m t})/m  =>  t = -log1p(-tau* m / a)/m
    arg = -tau_star * safe_m / jnp.maximum(a, 1e-30)
    escapes = (~const) & (arg <= -1.0)                # tau* beyond tau_max
    t_gen = -jnp.log1p(jnp.where(escapes, -0.5, arg)) / safe_m
    t_const = tau_star / jnp.maximum(a, 1e-30)
    t_fin = jnp.where(escapes, _BIG, jnp.where(const, t_const, t_gen))
    # deep-vacuum origins (d0 underflow) can push t_gen past fp range;
    # any t >= _BIG reads as "no scatter" to the integrator either way
    return jnp.minimum(t_fin, _BIG)


def _sample_delta(field: DensityField, sigma_t, o, d, key, t_cap):
    """Delta (Woodcock) tracking against sigma_maj = sigma_t * majorant:
    advance by homogeneous free flights at the majorant rate, accept a real
    collision with probability d(x)/majorant. Unbiased; bounded at
    field.max_null steps (overflow lanes return the current t, which by
    construction exceeds any t_cap of interest only with probability
    ~e^{-max_null * margin}). Returns the sampled distance (> t_cap when
    the flight reached the surface first)."""
    n = field.max_null
    shape = o[..., 1].shape
    us = jax.random.uniform(key, (n, 2) + shape, dtype=o.dtype)
    inv_maj_rate = 1.0 / (sigma_t * field.majorant)
    inv_maj = 1.0 / field.majorant

    def body(i, carry):
        t, done = carry
        step = -jnp.log1p(-us[i, 0]) * inv_maj_rate
        t_new = t + step
        x = o + t_new[..., None] * d
        accept = us[i, 1] < density(field, x) * inv_maj
        past = t_new > t_cap                  # surface reached: stop, the
        done_new = done | accept | past       # integrator sees d_s > t_cap
        t = jnp.where(done, t, t_new)
        return t, done_new

    t0 = jnp.zeros(shape, o.dtype)
    t, done = jax.lax.fori_loop(0, n, body, (t0, t0 > 1.0))
    # exhausted flights (no real collision, surface never reached — only
    # possible on open-scene rays with t_cap ~ inf) ESCAPE: returning the
    # partial t would fabricate a vacuum scatter whose albedo/cp throughput
    # weight is heavy-tailed. Bias = the unsampled tail's scatter mass,
    # ~zero once max_null * majorant-mean-free-path spans the dense region
    # (64 steps cover ~64/(sigma_t*majorant) scene units).
    return jnp.where(done, t, _BIG)


def _sample_grid_march(field: DensityField, sigma_t, o, d, u, t_cap):
    """Exact closed-form inversion of the canonical piecewise-constant tau
    (_grid_tau_nonneg): walk the SAME [0, t_far]/M segmentation
    accumulating tau until it crosses tau* = -log(1-u); inside the
    crossing segment the density is constant so the solve is linear; past
    t_far the density is exactly constant so the tail inverts like a
    homogeneous medium (escape to _BIG when the tail density ~ 0).
    Marginally P(d > T) = e^{-tau(T)} for the same tau every weight uses —
    the free-flight estimator is self-consistent by construction.
    Deterministic in `u` (replayable, reparameterizable), no tracking
    loop, no max_null escape bias."""
    t0, ta, tb, h2, seg0, w = _grid_segments(field, o, d)
    # cast: under jax x64 the engine's uniforms default to f64, which
    # would promote the whole lane state through d_s
    tau_star = -jnp.log1p(-u.astype(o.dtype))
    # constant head [0, t0]
    rho_head = _pc_eval(field, o + (0.5 * t0)[..., None] * d)
    tau_head = sigma_t * rho_head * t0
    pts = o[None] + (seg0 + 0.5 * w)[..., None] * d[None]
    dens = _pc_eval(field, pts)                           # (M, ...)
    dtau = sigma_t * dens * w
    cum = tau_head[None] + jnp.cumsum(dtau, axis=0)
    prev = cum - dtau
    # half-open (prev <= tau* < cum): exactly one segment matches even at
    # boundaries and zero-density segments are skipped
    cross = (cum > tau_star[None]) & (prev <= tau_star[None])
    d_seg = seg0 + (tau_star[None] - prev) / jnp.maximum(
        sigma_t * dens, 1e-30)
    d_found = jnp.sum(jnp.where(cross, d_seg, 0.0), axis=0)
    found = jnp.any(cross, axis=0)
    in_head = tau_star < tau_head
    d_head = tau_star / jnp.maximum(sigma_t * rho_head, 1e-30)
    # tail: constant density d_inf beyond tb
    d_inf = _pc_eval(field, o + (tb + h2)[..., None] * d)
    rate = sigma_t * d_inf
    tau_left = tau_star - cum[-1]
    d_tail = tb + tau_left / jnp.maximum(rate, 1e-30)
    d_nf = jnp.where(rate > 1e-20, jnp.minimum(d_tail, _BIG), _BIG)
    d_s = jnp.where(in_head, jnp.minimum(d_head, t0),
                    jnp.where(found, d_found, d_nf))
    del t_cap  # inversion is global; callers compare d_s > t_cap themselves
    return d_s


def sample_distance(field: DensityField, sigma_t, o, d, u, key, t_cap):
    """Heterogeneous free-flight distance along unit `d`: the drop-in for
    sampling.distance.free_flight_sample. Analytic inversion where the
    field admits one (exp_height), exact inversion of the canonical
    piecewise-constant tau for voxel grids (_sample_grid_march), delta
    tracking otherwise (blobs). `u` feeds the inversion paths; `key` the
    delta-tracking draws; `t_cap` (surface distance) lets delta tracking
    stop early."""
    if field.kind == EXP_HEIGHT:
        return _sample_exp_height(field, sigma_t, o, d, u)
    if field.kind == GRID:
        return _sample_grid_march(field, sigma_t, o, d, u, t_cap)
    if field.kind == BLOBS:
        return _sample_delta(field, sigma_t, o, d, key, t_cap)
    raise ValueError(f"unknown density kind {field.kind!r}")
