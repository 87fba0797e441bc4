"""Top-level rendering API.

Replaces the reference's main-loop driver (src/rt.cpp:744-830): pixel/sample
iteration, jittered camera rays, integrator dispatch and averaging. The
pixel x sample grid is flattened into fixed-size lane chunks and consumed by
one `lax.scan` inside a single jit, so XLA pipelines ray generation, the
bounce loop and accumulation without host round-trips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng
from ..integrators import engine
from ..integrators.volume import VOLUME_INTEGRATORS
from ..integrators.legacy import LEGACY_INTEGRATORS, LegacySpec, trace_legacy
from ..integrators.surface import SURFACE_INTEGRATORS, trace_surface
from ..integrators.raymarch import RAYMARCH_INTEGRATORS, trace_raymarch
from ..scene import camera as cam
from ..scene.scene import Scene
from .config import RenderConfig

__all__ = ["render", "trace_rays", "resolve_spec", "resolve_tracer"]


def resolve_spec(cfg: RenderConfig) -> engine.IntegratorSpec:
    """Resolve a VOLUME integrator spec (cfg knobs applied). Surface/marcher
    integrators carry their own fixed parameters — see resolve_tracer.

    Delegates to resolve_tracer so every registered spec field
    (nee_all_lights, physical, fixed_light, ...) survives — a hand-copied
    field list here once silently dropped them."""
    if cfg.integrator not in VOLUME_INTEGRATORS:
        raise ValueError(
            f"unknown integrator {cfg.integrator!r}; "
            f"available: {sorted(VOLUME_INTEGRATORS)}"
        )
    _, spec, _ = resolve_tracer(cfg.integrator, cfg.continue_prob,
                                cfg.max_bounces)
    return spec


def resolve_tracer(integrator: str, continue_prob: float, max_bounces: int):
    """(family, spec, trace_fn) for any registered integrator name.

    cfg knobs override only fields the named variant leaves at their
    defaults — variants that PIN an RR probability or depth limit (e.g.
    vpt_minimal_implicit's max depth 5, src/rt.cpp:329) keep it.
    """
    import dataclasses as _dc

    if integrator in VOLUME_INTEGRATORS:
        s = VOLUME_INTEGRATORS[integrator]
        defaults = engine.IntegratorSpec()
        spec = _dc.replace(
            s,
            continue_prob=(continue_prob if s.continue_prob == defaults.continue_prob
                           else s.continue_prob),
            max_bounces=(max_bounces if s.max_bounces == defaults.max_bounces
                         else s.max_bounces),
        )
        return "volume", spec, engine.trace
    if integrator in LEGACY_INTEGRATORS:
        # legacy variants PIN their reference RR/depth constants; only the
        # depth bound can be widened for variants that had none
        s = LEGACY_INTEGRATORS[integrator]
        if s.max_bounces == LegacySpec("x").max_bounces:
            s = _dc.replace(s, max_bounces=max_bounces)
        return "legacy", s, trace_legacy
    if integrator in SURFACE_INTEGRATORS:
        return "surface", SURFACE_INTEGRATORS[integrator], trace_surface
    if integrator in RAYMARCH_INTEGRATORS:
        return "raymarch", RAYMARCH_INTEGRATORS[integrator], trace_raymarch
    raise ValueError(
        f"unknown integrator {integrator!r}; available: "
        f"{sorted({**VOLUME_INTEGRATORS, **LEGACY_INTEGRATORS, **SURFACE_INTEGRATORS, **RAYMARCH_INTEGRATORS})}"
    )


def trace_rays(scene: Scene, spec: engine.IntegratorSpec, o, d, key,
               differentiable: bool = False):
    """Trace a flat ray batch; thin alias of the engine entry point."""
    return engine.trace(scene, spec, o, d, key, differentiable=differentiable)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "chunk", "jitter", "integrator",
        "continue_prob", "max_bounces", "differentiable",
    ),
)
def _render_flat(
    scene: Scene,
    camera: cam.Camera,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    chunk: int,
    jitter: bool,
    integrator: str,
    continue_prob: float,
    max_bounces: int,
    differentiable: bool,
):
    _, spec, trace_fn = resolve_tracer(integrator, continue_prob, max_bounces)
    npix = width * height
    n_chunks = -(-npix // chunk)
    padded = n_chunks * chunk
    acc = jnp.zeros((padded, 3), scene.radius.dtype)

    def body(acc, step):
        step_key = rng.fold(key, step)
        c = step % n_chunks
        base = c * chunk
        ids = base + jnp.arange(chunk, dtype=jnp.int32)
        valid = ids < npix
        ids_c = jnp.minimum(ids, npix - 1)
        o, d = cam.rays_for_pixels(camera, width, height, ids_c, step_key, jitter)
        radiance = trace_fn(
            scene, spec, o, d, step_key, differentiable=differentiable
        )
        radiance = jnp.where(valid[:, None], radiance, 0.0)
        zero = jnp.zeros((), base.dtype)   # match index dtypes under x64
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (base, zero), (chunk, 3)) + radiance,
            (base, zero),
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(spp * n_chunks, dtype=jnp.int32))
    return acc[:npix] / spp


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "chunk", "jitter", "integrator",
                     "continue_prob", "max_bounces"),
)
def _render_persistent_flat(
    scene: Scene,
    camera: cam.Camera,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    chunk: int,
    jitter: bool,
    integrator: str,
    continue_prob: float,
    max_bounces: int,
):
    _, spec, _ = resolve_tracer(integrator, continue_prob, max_bounces)
    npix = width * height
    n_chunks = -(-npix // chunk)
    padded = n_chunks * chunk
    acc = jnp.zeros((padded, 3), scene.radius.dtype)

    def body(acc, c):
        base = c * chunk
        ids = jnp.minimum(base + jnp.arange(chunk, dtype=jnp.int32), npix - 1)
        L = engine.render_persistent(
            scene, spec, camera, width, height, ids, spp, rng.fold(key, c),
            jitter=jitter,
        )
        zero = jnp.zeros((), base.dtype)
        acc = jax.lax.dynamic_update_slice(acc, L, (base, zero))
        return acc, None

    acc, _ = jax.lax.scan(body, acc, jnp.arange(n_chunks, dtype=jnp.int32))
    return acc[:npix] / spp


def render(scene: Scene, camera: cam.Camera, cfg: RenderConfig,
           key=None, differentiable: bool = False) -> jnp.ndarray:
    """Render an (H, W, 3) linear-radiance image, averaged over cfg.spp
    jittered samples per pixel (the per-pixel mean of src/rt.cpp:786-800,
    without the clamp — tone mapping lives in vpt.io)."""
    from ..integrators.volume import VOLUME_INTEGRATORS as _VOL

    if (scene.medium.density is not None
            and cfg.integrator not in _VOL):
        raise NotImplementedError(
            "heterogeneous media (Medium.density) are supported by the "
            "free-flight volume family; the legacy/surface/marcher "
            "reference-parity integrators are homogeneous by definition")

    if cfg.renderer == "pallas":
        if differentiable:
            raise ValueError(
                "the fused pallas kernel is forward-only; use renderer='scan' "
                "for differentiable renders")
        from ..kernels.wavefront import render_pallas

        return render_pallas(scene, camera, cfg)

    if (cfg.renderer == "auto" and not differentiable and key is None
            and jax.default_backend() in ("tpu", "axon")):
        # on real TPU hardware, auto means the fused kernel whenever it
        # covers the integrator (~100x the persistent engine). Only when
        # the caller did not pass an explicit PRNG key: the kernel seeds
        # from cfg.seed (its PCG streams), not from a threefry key.
        from ..kernels import wavefront as _wf

        grid_field = (scene.medium.density is not None
                      and scene.medium.density.kind == "grid")
        if cfg.integrator in _wf.PALLAS_INTEGRATORS and not grid_field:
            # voxel-grid fields are engine-only (per-lane gathers);
            # renderer='pallas' explicitly still raises in the kernel
            return _wf.render_pallas(scene, camera, cfg)

    if key is None:
        key = jax.random.PRNGKey(cfg.seed)

    use_persistent = cfg.renderer == "persistent" or (
        cfg.renderer == "auto"
        and not differentiable
        and cfg.integrator in _VOL
    )
    if use_persistent:
        flat = _render_persistent_flat(
            scene, camera, key,
            width=cfg.width, height=cfg.height, spp=cfg.spp,
            chunk=min(cfg.chunk_pixels, cfg.width * cfg.height),
            jitter=cfg.jitter, integrator=cfg.integrator,
            continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
        )
        return flat.reshape(cfg.height, cfg.width, 3)
    flat = _render_flat(
        scene, camera, key,
        width=cfg.width, height=cfg.height, spp=cfg.spp,
        chunk=min(cfg.chunk_pixels, cfg.width * cfg.height),
        jitter=cfg.jitter,
        integrator=cfg.integrator,
        continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
        differentiable=differentiable,
    )
    return flat.reshape(cfg.height, cfg.width, 3)
