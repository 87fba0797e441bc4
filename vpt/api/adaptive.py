"""Two-pass variance-guided ADAPTIVE SAMPLING on the fused kernel.

Ours (the reference renders every pixel at the same spp, src/rt.cpp:786).
Monte-Carlo variance in the reference scene is concentrated — emitter
disks, the microfacet sphere, penumbrae — so spending the sample budget
uniformly wastes most of it on the smooth glow. Scheme:

pass 1   two independent half-budget renders A, B of the whole frame
         (these are the same two renders the A/B product loss uses);
         Var per pixel is estimated by (A-B)^2 / 2, averaged per TILE
         (the kernel's native work unit: tile_rows x 128 pixels)
pass 2   the top `frac` tiles by variance render `boost * spp/2` extra
         samples, gathered into ONE kernel launch via the scatter-tile
         mode (kernels/wavefront.py: per-program base pixel from SMEM)
combine  per-pixel sample-count-weighted mean of the pass sums

Estimator properties: conditional on the tile selection, every retained
sample mean is unbiased and the weights equal the true counts. The
selection itself is driven by the SAME pass-1 samples that stay in the
estimate, which correlates allocation with the retained values — tiles
are picked when their A/B draws are extreme, so right-skewed radiance
gives a small positive bias on selected tiles (Cov((A-B)^2, A+B) =
2 E[(X-mu)^3] per sample). The selection statistic pools tile_rows*128
pixels x spp samples, so the per-pixel correlation is diluted by the
tile's sample count; it vanishes as tiles grow and is invisible next to
MC noise at practical budgets — but it is NOT exactly zero. For a
strictly unbiased combination, discard pass 1 from the estimate (not
offered: it wastes half the budget to remove a O(1/tile_samples) bias).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.scene import Scene

__all__ = ["make_adaptive_renderer", "render_adaptive"]


def make_adaptive_renderer(scene: Scene, camera, cfg, *, boost: float = 3.0,
                           frac: float = 0.25, interpret: bool = False):
    """Build go(seed:int32) -> (H, W, 3). Building compiles two kernels
    (full-frame at spp/2 and the scatter pass); reuse the returned
    callable across seeds/frames to render compile-free.

    The base pass renders 2*(cfg.spp//2) samples per pixel (cfg.spp must
    be even and >= 2 — the A/B halves must be equal); the top `frac` of
    tiles get round(boost*spp/2) extra samples."""
    from ..kernels import wavefront as wf

    if cfg.spp < 2 or cfg.spp % 2:
        raise ValueError(f"adaptive sampling needs even spp >= 2 "
                         f"(A/B halves), got {cfg.spp}")
    nee, distance, physical = wf.PALLAS_INTEGRATORS[cfg.integrator]
    half = cfg.spp // 2
    kw = dict(nee=nee, distance=distance, physical=physical,
              continue_prob=cfg.continue_prob,
              max_bounces=cfg.max_bounces, jitter=cfg.jitter,
              sampler=getattr(cfg, "sampler", "random"))
    run1 = wf.build_tile_renderer(scene, camera, cfg.width, cfg.height,
                                  half, **kw, interpret=interpret)
    raw1 = run1.make_raw(run1.num_tiles)
    lanes = run1.lanes_per_tile
    n_tiles = run1.num_tiles
    npix = cfg.width * cfg.height

    k = min(max(int(round(frac * n_tiles)), 1), n_tiles)
    spp2 = max(int(round(boost * half)), 1)
    run2 = wf.build_tile_renderer(scene, camera, cfg.width, cfg.height,
                                  spp2, **kw, scatter_tiles=True,
                                  interpret=interpret)
    raw2 = run2.make_raw_scatter(k)
    valid = (jnp.arange(n_tiles * lanes) < npix)[:, None]
    # real (non-padding) lanes per tile: the last tile may be partial and
    # its variance must not be diluted by the zeroed padding lanes
    real = np.minimum(np.maximum(npix - np.arange(n_tiles) * lanes, 1),
                      lanes).astype(np.float32)
    inv_real = jnp.asarray(1.0 / real)

    @jax.jit
    def go(s):
        a = raw1(s * 2, jnp.int32(0))          # (n_tiles*lanes, 3) sums
        b = raw1(s * 2 + 1, jnp.int32(0))
        resid = jnp.where(valid, (a - b) * (1.0 / half), 0.0)
        var = jnp.sum(resid * resid, axis=-1).reshape(n_tiles, lanes)
        var = jnp.sum(var, axis=-1) * inv_real  # per-tile variance proxy
        _, sel = jax.lax.top_k(var, k)
        bases = (sel * lanes).astype(jnp.int32)
        extra = raw2(s * 2 + 0x5E11, bases)    # (k*lanes, 3) sums
        sums = (a + b).reshape(n_tiles, lanes, 3)
        sums = sums.at[sel].add(extra.reshape(k, lanes, 3))
        counts = jnp.full((n_tiles, 1, 1), 2.0 * half,
                          jnp.float32).at[sel].add(float(spp2))
        img = (sums / counts).reshape(n_tiles * lanes, 3)[:npix]
        return img.reshape(cfg.height, cfg.width, 3)

    return go


def render_adaptive(scene: Scene, camera, cfg, *, boost: float = 3.0,
                    frac: float = 0.25, seed: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """One-shot adaptive render (builds + compiles the kernels each call —
    use make_adaptive_renderer for repeated frames). cfg.integrator must
    be a fused-kernel integrator (kernels.wavefront.PALLAS_INTEGRATORS)."""
    go = make_adaptive_renderer(scene, camera, cfg, boost=boost, frac=frac,
                                interpret=interpret)
    s = cfg.seed if seed is None else seed
    return go(jnp.asarray(s, jnp.int32))
