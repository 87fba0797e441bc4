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

Unbiasedness: conditional on the tile selection, every sample mean is
unbiased and the weights equal the true counts, so the combined estimator
is unbiased given the allocation. Reusing the pass-1 samples in the final
estimate correlates the allocation with the estimate (the standard
two-pass adaptive caveat); the alternative — discarding pass 1 — costs
more than the correlation is worth at these budgets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.scene import Scene

__all__ = ["render_adaptive"]


def render_adaptive(scene: Scene, camera, cfg, *, boost: float = 3.0,
                    frac: float = 0.25, seed: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Render (H, W, 3) with cfg.spp base samples per pixel plus
    boost*cfg.spp/2 extra samples on the highest-variance `frac` of tiles.
    cfg.integrator must be a fused-kernel integrator
    (kernels.wavefront.PALLAS_INTEGRATORS)."""
    from ..kernels import wavefront as wf

    nee, distance = wf.PALLAS_INTEGRATORS[cfg.integrator]
    half = max(cfg.spp // 2, 1)
    kw = dict(nee=nee, distance=distance, continue_prob=cfg.continue_prob,
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

    @jax.jit
    def go(s):
        a = raw1(s * 2, jnp.int32(0))          # (n_tiles*lanes, 3) sums
        b = raw1(s * 2 + 1, jnp.int32(0))
        resid = jnp.where(valid, (a - b) * (1.0 / half), 0.0)
        var = jnp.sum(resid * resid, axis=-1).reshape(n_tiles, lanes)
        var = jnp.mean(var, axis=-1)           # per-tile variance proxy
        _, sel = jax.lax.top_k(var, k)
        bases = (sel * lanes).astype(jnp.int32)
        extra = raw2(s * 2 + 0x5E11, bases)    # (k*lanes, 3) sums
        sums = (a + b).reshape(n_tiles, lanes, 3)
        counts = jnp.full((n_tiles, 1, 1), 2.0 * half, jnp.float32)
        sums = sums.at[sel].add(extra.reshape(k, lanes, 3))
        counts = counts + jnp.zeros((n_tiles, lanes, 1)).at[sel].add(
            float(spp2))
        img = (sums / counts).reshape(n_tiles * lanes, 3)[:npix]
        return img.reshape(cfg.height, cfg.width, 3)

    s = cfg.seed if seed is None else seed
    return go(jnp.asarray(s, jnp.int32))
