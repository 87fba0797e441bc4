"""Ray marchers — fixed-step volumetric single-scatter estimators.

Rebuild of reference include/rayMarchingMethods.h as masked fixed-length
scans (a TPU lane cannot run a data-dependent step count, so every lane
marches `max_steps` segments with an `i < t/step` mask — the compute is
uniform, the semantics match the reference loops exactly):

  ray_march_cone   == rayMarching2 (rayMarchingMethods.h:262-327):
                      constant step, cone-sampled NEE toward a spherical
                      source, emitter hit credited as radiance * Tr(o, x)
  ray_march_point  == rayMarching3 (:330-384): constant step, point source,
                      1/d^2 + visibility; NO emitter-hit credit (the block
                      is commented out, :340-346)
  ray_march_global == rayMarchingGlobal (:106-256): marching + a 10-bounce
                      cosine-sampled surface GI loop that recursively
                      marches (we reproduce its estimator; see quirks)
  punctual_single_scatter == punctualVolumetric (:12-31), the point-light
                      single-scatter helper with multipleT through
                      material-3 shells.

Reproduced quirks:
  - rayMarching/rayMarchingGlobal hardcode spheres[5] as the source
    (:64, :153, :217) — kept as spec.source_id default 5;
  - segment transmittance is measured from the SURFACE point x to the
    sample point xt, T = Tr(x, xt) (:283), not from the ray origin;
  - the loop `for(int i = 0; i < steps; i++)` with double steps runs
    ceil(steps) times unless steps is integral — the mask here is the same
    float comparison i < t/step;
  - rayMarching2's emitter branch keys on radiance.x > 0 (:273).
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
from ..sampling import directional as ds
from ..scene.scene import Scene

INV_4PI = med.INV_4PI


@dataclasses.dataclass(frozen=True)
class RayMarchSpec:
    variant: str = "cone"        # cone | point | global
    step: float = 1.0            # constant step length (variant cone/point)
    segments: float = 100.0      # segment count (variant global)
    source_id: int = 7           # light index (rt.cpp:790 uses 7)
    max_steps: int = 512         # static mask bound for the marching scan
    gi_bounces: int = 10         # rayMarchingGlobal's surface loop (:145)


RAYMARCH_INTEGRATORS: dict[str, RayMarchSpec] = {
    "ray_march_cone": RayMarchSpec("cone"),
    "ray_march_point": RayMarchSpec("point"),
    "ray_march_global": RayMarchSpec("global", source_id=5),
}


def punctual_single_scatter(scene: Scene, idsource, x, sigma_t, sigma_s):
    """punctualVolumetric (rayMarchingMethods.h:12-31): point-light
    single-scatter with visibilityVPT + multipleT through material-3
    spheres; sampling probability 1."""
    light = scene.center[idsource]
    vis = geo.visibility_vpt(light, x, scene)
    le = scene.radiance[idsource]
    d2 = jnp.maximum(vm.norm2(light - x), 1e-20)
    mt = med.multiple_transmittance(x, light, sigma_t, scene)
    ls = le * (INV_4PI * mt / d2)[..., None] * sigma_s
    return jnp.where(vis[..., None], ls, 0.0)


def _march(scene: Scene, spec: RayMarchSpec, o, d, t, x_surf, key, sigma_t,
           sigma_s, source_id, step_len, n_steps_f):
    """Shared segment loop of rayMarching/rayMarching2/rayMarching3:
    accumulate per-segment single scattering along [o, o + t*d)."""
    N = o.shape[0]
    dtype = o.dtype
    light_c = scene.center[source_id]
    light_r = scene.radius[source_id]
    light_le = scene.radiance[source_id]
    use_cone = spec.variant != "point"

    def seg(acc, i):
        xt = o + d * (step_len * i.astype(dtype))[:, None]   # step_len: (N,)
        active = i.astype(dtype) < n_steps_f
        tr_seg = med.transmittance(x_surf, xt, sigma_t)       # T = Tr(x, xt)
        if use_cone:
            # cone-sampled shadow ray, visibility by id match (:290-318)
            wc = light_c - xt
            normcx = jnp.sqrt(jnp.maximum(vm.norm2(wc), 1e-20))
            wc = wc / normcx[..., None]
            ratio = light_r / normcx
            cos_max = jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
            u1, u2 = rng.uniform(rng.fold(key, rng.Tag.MARCH, i), (2, N), dtype)
            wi = ds.cone(wc, cos_max, u1, u2)
            _, _, hit_id = geo.nearest_hit(xt, wi, scene)
            visible = hit_id == source_id
            ls = light_le * (INV_4PI * med.transmittance(xt, light_c, sigma_t))[..., None]
            contrib = ls * (tr_seg / ds.cone_pdf(cos_max) * sigma_s * step_len)[..., None]
        else:
            # point source: 1/d^2, visibility (:359-374)
            d2 = jnp.maximum(vm.norm2(light_c - xt), 1e-20)
            visible = geo.visibility(light_c, xt, scene)
            ls = light_le * (INV_4PI * med.transmittance(xt, light_c, sigma_t) / d2)[..., None]
            contrib = ls * (tr_seg * sigma_s * step_len)[..., None]
        acc = acc + jnp.where((active & visible)[..., None], contrib, 0.0)
        return acc, None

    acc, _ = jax.lax.scan(
        seg, jnp.zeros((N, 3), dtype), jnp.arange(spec.max_steps))
    return acc


def trace_raymarch(scene: Scene, spec: RayMarchSpec, o, d, key,
                   differentiable: bool = False) -> jnp.ndarray:
    """Ray-march a primary ray batch; returns radiance (N, 3)."""
    sigma_a = scene.medium.sigma_a
    sigma_s = scene.medium.sigma_s
    sigma_t = sigma_a + sigma_s
    dtype = o.dtype
    N = o.shape[0]
    key = rng.fold(key, 0x6d726368)

    hit, t, obj_id = geo.nearest_hit(o, d, scene)
    x = o + t[:, None] * d
    em_hit = hit & (scene.radiance[obj_id][..., 0] > 0.0)
    source_id = jnp.full((N,), spec.source_id, jnp.int32)

    if spec.variant == "global":
        return _global(scene, spec, o, d, key, hit, t, x, obj_id, em_hit,
                       sigma_t, sigma_s)

    step_len = jnp.full((N,), spec.step, dtype)
    n_steps_f = t / spec.step
    li = _march(scene, spec, o, d, t, x, key, sigma_t, sigma_s,
                source_id, step_len, n_steps_f)
    if spec.variant == "cone":
        # emitter hit: Lo = radiance * Tr(o, x) (rayMarchingMethods.h:273-276)
        lo = scene.radiance[obj_id] * med.transmittance(o, x, sigma_t)[..., None]
        li = li + jnp.where(em_hit[..., None], lo, 0.0)
    # rayMarching3 has no emitter term (:340-346 commented out)
    return jnp.where(hit[..., None], li, 0.0)


def _global(scene: Scene, spec: RayMarchSpec, o, d, key, hit, t, x, obj_id,
            em_hit, sigma_t, sigma_s):
    """rayMarchingGlobal (:106-256): emitter short-circuit, 10-bounce
    cosine GI loop whose inner rayMarching marches toward spheres[source_id],
    then a final primary-ray segment march referenced to the LAST GI point."""
    N = o.shape[0]
    dtype = o.dtype
    src = jnp.full((N,), spec.source_id, jnp.int32)
    light_c = scene.center[spec.source_id]
    light_r = scene.radius[spec.source_id]

    lo_emit = scene.radiance[obj_id] * med.transmittance(o, x, sigma_t)[..., None]

    lo = jnp.zeros((N, 3), dtype)
    fs = jnp.ones((N, 3), dtype)
    factor = jnp.ones((N,), dtype)
    alive = hit & ~em_hit
    x_cur, id_cur = x, obj_id
    early = jnp.zeros((N,), bool)   # Lm == 0 -> return Lo (skip final march)

    for b in range(spec.gi_bounces):
        kb = rng.fold(key, b)
        fr = scene.albedo[id_cur] * (1.0 / math.pi)
        n = vm.normalize(x_cur - scene.center[id_cur], eps=1e-20)
        # cone NEE toward the hardcoded source (:153-179)
        wc = light_c[None, :] - x_cur
        normcx = jnp.sqrt(jnp.maximum(vm.norm2(wc), 1e-20))
        wc = wc / normcx[..., None]
        cos_max = jnp.sqrt(jnp.maximum(1.0 - (light_r / normcx) ** 2, 1e-12))
        u1, u2 = rng.uniform(rng.fold(kb, rng.Tag.NEE_CONE), (2, N), dtype)
        wi = ds.cone(wc, cos_max, u1, u2)
        _, _, hid = geo.nearest_hit(x_cur, wi, scene)
        le = scene.radiance[spec.source_id] * med.transmittance(
            x_cur, light_c, sigma_t)[..., None]
        ld = le * fr * (vm.dot(n, wi) / ds.cone_pdf(cos_max))[..., None]
        ld = jnp.where((hid == src)[..., None], ld, 0.0)

        # cosine-sampled GI direction + inner rayMarching (:183-193)
        v1, v2 = rng.uniform(rng.fold(kb, rng.Tag.BSDF), (2, N), dtype)
        wray = ds.cosine_hemisphere(n, v1, v2)
        prob = ds.cosine_hemisphere_pdf(vm.dot(n, wray))
        ghit, gt, gid = geo.nearest_hit(x_cur, wray, scene)
        gx = x_cur + gt[:, None] * wray
        g_em = ghit & (scene.radiance[gid][..., 0] > 0.0)
        seg_len = gt / spec.segments
        lm = _march(scene, spec, x_cur, wray, gt, gx, rng.fold(kb, rng.Tag.MARCH),
                    sigma_t, sigma_s, src, seg_len,
                    jnp.full((N,), spec.segments, dtype))
        # inner rayMarching returns black on miss or emitter hit (:39-51)
        lm = jnp.where((ghit & ~g_em)[..., None], lm, 0.0)

        ld = ld + lm * fr * (vm.dot(n, wray) / jnp.maximum(prob, 1e-12))[..., None]
        tr0 = med.transmittance(o, x_cur, sigma_t)
        lo = lo + jnp.where(
            alive[..., None], ld * fs * (tr0 * factor)[..., None], 0.0)

        lm_zero = jnp.all(lm == 0.0, axis=-1)
        early = early | (alive & lm_zero)
        alive = alive & ~lm_zero & ghit
        fs = jnp.where(alive[..., None], fs * fr, fs)
        factor = jnp.where(
            alive, factor * vm.dot(n, wray) / jnp.maximum(prob, 1e-12), factor)
        x_cur = jnp.where(alive[..., None], gx, x_cur)
        id_cur = jnp.where(alive, gid, id_cur)

    # final primary-ray march, T referenced to the LAST GI point (:206-254)
    seg_len = t / spec.segments
    li = _march(scene, spec, o, d, t, x_cur, rng.fold(key, rng.Tag.MARCH, 99),
                sigma_t, sigma_s, src, seg_len,
                jnp.full((N,), spec.segments, dtype))
    li = jnp.where(early[..., None], 0.0, li)   # early return skips Li (:197)

    out = jnp.where(em_hit[..., None], lo_emit, li + lo)
    return jnp.where(hit[..., None], out, 0.0)
