"""Multi-chip FAST forward rendering: the fused Pallas kernel under shard_map.

Round-1's `render_sharded` traced the slow differentiable scan engine on
every device; this module instead gives each device its contiguous range of
the fused kernel's pixel tiles (the kernel is tiled by flat pixel base,
kernels/wavefront.py) so a pod render runs at single-chip-Pallas throughput
per chip. Axes of the (data, sample) mesh (dist/mesh.py):

  data   — pixel tiles: device d renders tiles [d*T, (d+1)*T); no
           communication (the reference's OpenMP row split, src/rt.cpp:767,
           minus the shared-RNG race);
  sample — spp split: each sample shard renders spp/n_sample samples with a
           decorrelated seed, reduced with one `pmean` over ICI.

The per-lane PCG streams are seeded by (global flat pixel, seed'), with
seed' = seed + shard-salt, so shards never share a stream and the result is
deterministic for a fixed (mesh, seed) regardless of device count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..scene.scene import Scene
from .mesh import DATA_AXIS, SAMPLE_AXIS

__all__ = ["render_pallas_sharded"]


def build_sharded_pallas(scene: Scene, camera, cfg, mesh: Mesh,
                         interpret: bool = False):
    """Build fn(seed:int) -> (npix, 3) running the fused kernel over the
    mesh. cfg.integrator must be in kernels.wavefront.PALLAS_INTEGRATORS."""
    from ..kernels import wavefront as wf

    nee, distance, physical = wf.PALLAS_INTEGRATORS[cfg.integrator]
    n_data = mesh.shape[DATA_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if cfg.spp % n_sample:
        raise ValueError(
            f"spp={cfg.spp} not divisible by sample shards={n_sample}")
    spp_local = cfg.spp // n_sample
    npix = cfg.width * cfg.height

    run = wf.build_tile_renderer(
        scene, camera, cfg.width, cfg.height, spp_local,
        nee=nee, distance=distance, physical=physical,
        continue_prob=cfg.continue_prob,
        max_bounces=cfg.max_bounces, jitter=cfg.jitter,
        sampler=getattr(cfg, "sampler", "random"), interpret=interpret,
    )
    lanes = run.lanes_per_tile
    tiles_per_shard = -(-npix // (lanes * n_data))
    raw = run.make_raw(tiles_per_shard)
    shard_pixels = tiles_per_shard * lanes

    def body(seed):
        di = jax.lax.axis_index(DATA_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        # decorrelate sample shards (same lanes, different draws); data
        # shards are decorrelated by the per-lane (pixel-keyed) streams
        seed_local = seed[0] + si.astype(jnp.int32) * jnp.int32(0x9E37)
        base = di.astype(jnp.int32) * jnp.int32(shard_pixels)
        sums = raw(seed_local, base)              # (shard_pixels, 3) sums
        return jax.lax.pmean(sums / spp_local, SAMPLE_AXIS)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(),),
        out_specs=P(DATA_AXIS, None),
        check_vma=False,
    )

    @jax.jit
    def go(seed):
        flat = fn(jnp.asarray([seed], jnp.int32))
        return flat[:npix]

    return go


def render_pallas_sharded(scene: Scene, camera, cfg, mesh: Mesh,
                          seed: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Render an (H, W, 3) frame with the fused Pallas kernel sharded over
    `mesh`. See build_sharded_pallas."""
    go = build_sharded_pallas(scene, camera, cfg, mesh, interpret=interpret)
    flat = go(cfg.seed if seed is None else seed)
    return flat.reshape(cfg.height, cfg.width, 3)
