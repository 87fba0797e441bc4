"""Batched ray/sphere intersection and visibility.

TPU-native rebuild of the reference's intersection layer:
  - per-sphere quadratic with the "invalid first root" rescue
    (reference include/Sphere.h:27-45),
  - scene-wide nearest hit by linear scan (include/pathTracingUtilities.h:12-36),
  - the material==3-skipping variant (include/volumetricBasicFunctions.h:64-89),
  - both-roots nearest hit (include/volumetricBasicFunctions.h:109-134),
  - light->point visibility tests (pathTracingUtilities.h:39-53,
    volumetricBasicFunctions.h:92-106),
  - implicit light lookup rayTracer (pathTracingUtilities.h:56-64) and
    cone half-angle helper (pathTracingUtilities.h:66-73).

Instead of a per-ray loop over spheres, every function broadcasts rays (N,3)
against the scene's sphere SoA (S,) and reduces with a masked argmin — a pure
VPU pattern with no gathers and no data-dependent control flow.

Numerical notes (conscious divergence from the reference, which runs in f64):
the scene uses giant spheres (r = 1e5) as walls, so the naive quadratic
cancels catastrophically in f32. We (a) use the numerically stable form
disc = r^2 - |oc - (oc.d)d|^2 and q = -(b + sign(b)sqrt(disc)), t_other =
c0/q, and (b) scale the reference's fixed 1e-4 epsilon (Sphere.h:34,
pathTracingUtilities.h:20) by a per-sphere, dtype-aware term so the
self-intersection guard covers f32 root error (~radius * eps). In f64 the
scaled term vanishes and semantics match the reference exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import vecmath as vm
from ..scene.scene import Scene, VOLUME_BOUNDARY

__all__ = [
    "EPS_T",
    "hit_eps",
    "sphere_roots",
    "sphere_first_t",
    "nearest_hit",
    "nearest_hit_both",
    "visibility",
    "visibility_vpt",
    "ray_tracer",
    "cos_theta_max",
    "BIG",
]

# Reference epsilon for valid intersections (Sphere.h:34, pathTracingUtilities.h:20).
EPS_T = 1e-4
# Stand-in for MAXFLOAT when a ray escapes (src/rt.cpp:1287). Kept finite and
# f32-safe so downstream arithmetic (xs = o + t*d) stays finite.
BIG = 1e8


def _eps_factor(dtype) -> float:
    # ~16 ulps of headroom over the stable-quadratic root error.
    return 16.0 * float(jnp.finfo(dtype).eps)


def hit_eps(scene: Scene) -> jnp.ndarray:
    """Per-sphere minimum-|t| threshold: the reference's 1e-4 plus a term
    proportional to radius * machine-eps covering f32 root error."""
    return EPS_T + _eps_factor(scene.radius.dtype) * scene.radius


def sphere_roots(o: jnp.ndarray, d: jnp.ndarray, scene: Scene):
    """Both quadratic roots per (ray, sphere).

    o, d: (N, 3). Returns (t1, t2, has_det) each (N, S), where has_det is the
    det >= 0 mask; with has_det False, t1 = t2 = 0 exactly like
    Sphere::intersectVPT (include/Sphere.h:39-45).
    """
    oc = o[:, None, :] - scene.center[None, :, :]          # (N, S, 3)
    b = vm.dot(oc, d[:, None, :])                          # (N, S)
    perp = oc - b[..., None] * d[:, None, :]
    disc = scene.radius[None, :] ** 2 - vm.norm2(perp)     # (N, S)
    has_det = disc >= 0.0
    # double-where keeps reverse-mode AD NaN-free: sqrt' at 0 is inf, and a
    # missed sphere would otherwise contribute inf * 0 to the cotangent.
    # Strictly positive guard: disc == 0 happens EXACTLY for shadow rays
    # aimed at an r == 0 point light (the ray passes through the center), and
    # sqrt' at 0 is inf even when the primal is fine.
    pos = disc > 0.0
    s = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    # Stable root pairing: q is the well-conditioned root, the other is c0/q.
    # (sign must never be 0 — a ray from the exact center has b == 0.)
    sgn = jnp.where(b >= 0.0, 1.0, -1.0)
    q = -(b + sgn * s)
    c0 = vm.norm2(oc) - scene.radius[None, :] ** 2
    other = c0 / jnp.where(q != 0.0, q, 1.0)
    t1 = jnp.minimum(q, other)
    t2 = jnp.maximum(q, other)
    zero = jnp.zeros_like(t1)
    return (
        jnp.where(has_det, t1, zero),
        jnp.where(has_det, t2, zero),
        has_det,
    )


def sphere_first_t(o: jnp.ndarray, d: jnp.ndarray, scene: Scene) -> jnp.ndarray:
    """Per-sphere "first intersection" t with the reference's rescue rule
    (Sphere.h:34): if t1 < 0 or |t1| < eps, return t2; 0 when no real roots."""
    t1, t2, has_det = sphere_roots(o, d, scene)
    eps = hit_eps(scene)[None, :]
    t = jnp.where((t1 < 0.0) | (jnp.abs(t1) < eps), t2, t1)
    return jnp.where(has_det, t, 0.0)


def _nearest(t: jnp.ndarray, scene: Scene, extra_mask=None):
    """Masked argmin over the sphere axis with the reference's validity rule
    t > 0 && |t| > eps (pathTracingUtilities.h:20)."""
    eps = hit_eps(scene)[None, :]
    valid = (t > 0.0) & (jnp.abs(t) > eps)
    if extra_mask is not None:
        valid = valid & extra_mask
    t_masked = jnp.where(valid, t, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1)
    tmin = jnp.min(t_masked, axis=-1)
    hit = jnp.isfinite(tmin)
    # On miss the reference leaves t = 0 (pathTracingUtilities.h:33).
    return hit, jnp.where(hit, tmin, 0.0), idx.astype(jnp.int32)


def nearest_hit(o: jnp.ndarray, d: jnp.ndarray, scene: Scene,
                skip_volume: bool = False):
    """Scene-wide nearest hit.

    skip_volume=False -> `intersect` (pathTracingUtilities.h:12-36);
    skip_volume=True  -> `intersectVPT`, which ignores material==3 volumetric
    boundary spheres (volumetricBasicFunctions.h:64-89).
    Returns (hit(N,) bool, t(N,), id(N,) int32).
    """
    t = sphere_first_t(o, d, scene)
    mask = None
    if skip_volume:
        mask = (scene.material != VOLUME_BOUNDARY)[None, :]
    return _nearest(t, scene, mask)


def nearest_hit_both(o: jnp.ndarray, d: jnp.ndarray, scene: Scene):
    """Nearest hit keyed on the raw first root, returning both roots — the
    `intersectV2` used by ray marchers through sphere media
    (volumetricBasicFunctions.h:109-134). Returns (hit, t1, t2, id)."""
    t1, t2, _ = sphere_roots(o, d, scene)
    eps = hit_eps(scene)[None, :]
    valid = (t1 > 0.0) & (jnp.abs(t1) > eps)
    t_masked = jnp.where(valid, t1, jnp.inf)
    idx = jnp.argmin(t_masked, axis=-1)
    tmin = jnp.min(t_masked, axis=-1)
    hit = jnp.isfinite(tmin)
    lane = jnp.arange(t1.shape[0])
    t2_sel = t2[lane, idx]
    return (
        hit,
        jnp.where(hit, tmin, 0.0),
        jnp.where(hit, t2_sel, 0.0),
        idx.astype(jnp.int32),
    )


def _vis_slack(dtype) -> float:
    # Relative slack in the t-vs-distance comparison absorbing f32 hit error
    # on giant spheres; ~1e-13 in f64 (i.e. reference-exact).
    return 1024.0 * float(jnp.finfo(dtype).eps)


def visibility(light: jnp.ndarray, x: jnp.ndarray, scene: Scene,
               skip_volume: bool = False) -> jnp.ndarray:
    """Shadow test, cast FROM THE LIGHT TOWARD x (the reference's quirky
    direction, pathTracingUtilities.h:39-53): visible iff the first hit lies
    beyond x (t > distance) or nothing is hit at all (t == 0).

    light: (3,) or (N,3); x: (N,3). skip_volume=True gives `visibilityVPT`
    (volumetricBasicFunctions.h:92-106).
    """
    light = jnp.broadcast_to(light, x.shape)
    lx = x - light
    distance = vm.norm(lx)
    d = vm.normalize(lx, eps=1e-20)
    hit, t, _ = nearest_hit(light, d, scene, skip_volume=skip_volume)
    slack = _vis_slack(x.dtype)
    return (t > distance * (1.0 - slack)) | (~hit)


def visibility_vpt(light: jnp.ndarray, x: jnp.ndarray, scene: Scene) -> jnp.ndarray:
    return visibility(light, x, scene, skip_volume=True)


def ray_tracer(x: jnp.ndarray, wi: jnp.ndarray, scene: Scene):
    """Implicit light lookup: cast and return the hit sphere's radiance and
    id; black on miss (pathTracingUtilities.h:56-64). Returns (Le(N,3), id(N,))."""
    hit, _, idx = nearest_hit(x, wi, scene)
    le = scene.radiance[idx]
    le = jnp.where(hit[:, None], le, 0.0)
    return le, idx


def cos_theta_max(scene: Scene, source_id: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cone half-angle cosine for solid-angle sampling of a spherical light
    (pathTracingUtilities.h:66-73): sqrt(1 - (r/|c-x|)^2)."""
    r = scene.radius[source_id]
    cx = scene.center[source_id] - x
    n2 = vm.norm2(cx)
    ratio2 = (r * r) / jnp.maximum(n2, 1e-20)
    # floor keeps sqrt' finite for AD at ratio >= 1 (point inside the light)
    return jnp.sqrt(jnp.maximum(1.0 - ratio2, 1e-12))
