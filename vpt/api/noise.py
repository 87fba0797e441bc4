"""Render-to-noise-target: accumulate sample batches until the image's
Monte-Carlo error estimate falls below a requested level.

The reference exposes exactly one quality knob — raw spp (src/rt.cpp:784) —
and its author picks the number by eye. Here the stopping rule is the
estimator's own variance: batches of `batch_spp` samples are rendered with
independent seeds, a Welford accumulator over batch means yields a per-pixel
standard error of the running mean, and rendering stops when the median
relative SE (luminance SE / luminance) reaches the target.

On TPU backends the fused Pallas kernel is built ONCE and re-seeded per
batch (seeds are traced operands, so there is no per-batch recompile); on
other backends the jitted engine paths are reused the same way.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["render_to_noise"]


def render_to_noise(scene, camera, cfg, *, target_rel_se: float = 0.02,
                    batch_spp: int | None = None, max_spp: int = 4096,
                    min_batches: int = 3, log=None, interpret: bool = False):
    """Render until the median per-pixel relative standard error of the
    mean is <= target_rel_se, in batches of batch_spp (default cfg.spp).

    Returns (image (H, W, 3), spp_used, achieved_rel_se). Stops at max_spp
    total samples per pixel even if the target is not reached."""
    import jax

    b = int(batch_spp or cfg.spp)
    npix = cfg.width * cfg.height
    bcfg = dataclasses.replace(cfg, spp=b)

    run = None
    if cfg.renderer == "pallas" or (
        cfg.renderer == "auto"
        and jax.default_backend() in ("tpu", "axon")
    ):
        from ..kernels import wavefront as wf

        if cfg.integrator in wf.PALLAS_INTEGRATORS:
            nee, distance, physical = wf.PALLAS_INTEGRATORS[cfg.integrator]
            run = wf.build_tile_renderer(
                scene, camera, cfg.width, cfg.height, b,
                nee=nee, distance=distance, physical=physical,
                continue_prob=cfg.continue_prob, max_bounces=cfg.max_bounces,
                jitter=cfg.jitter, sampler=cfg.sampler, interpret=interpret,
            )

    def batch(k: int) -> np.ndarray:
        if run is not None:
            # distinct PCG seed space per batch (hash keeps streams apart
            # even for adjacent base seeds)
            return np.asarray(run(np.int32(cfg.seed + 0x9E3779B1 * (k + 1)
                                           & 0x7FFFFFFF))).reshape(npix, 3)
        from .render import render as _render

        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), k)
        return np.asarray(_render(scene, camera, bcfg, key=key),
                          np.float64).reshape(npix, 3)

    n = 0
    mean = np.zeros((npix, 3), np.float64)
    m2 = np.zeros((npix, 3), np.float64)
    achieved = np.inf
    while n * b < max_spp:
        x = np.asarray(batch(n), np.float64)
        n += 1
        delta = x - mean
        mean += delta / n
        m2 += delta * (x - mean)
        if n >= max(min_batches, 2):
            se = np.sqrt(m2.mean(axis=1) / (n - 1) / n)   # luminance SE
            lum = mean.mean(axis=1)
            achieved = float(np.median(se / np.maximum(lum, 1e-4)))
            if log:
                log(f"render_to_noise: {n * b} spp, median rel SE "
                    f"{achieved:.4f} (target {target_rel_se})")
            if achieved <= target_rel_se:
                break
    return mean.reshape(cfg.height, cfg.width, 3), n * b, achieved
