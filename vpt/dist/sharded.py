"""Sharded (multi-chip) forward rendering via shard_map.

Replaces the reference's OpenMP row loop (src/rt.cpp:767-768) with an SPMD
program over a (data, sample) device mesh: every device renders its pixel
shard for its sample shard, the sample axis is reduced with a `pmean`
collective over ICI, and the pixel axis stays sharded until the host gathers
the frame. No other communication exists — the scene pytree is tiny and
replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng
from ..integrators import engine
from ..scene import camera as cam
from ..scene.scene import Scene
from .mesh import DATA_AXIS, SAMPLE_AXIS

__all__ = ["render_sharded"]


def _replicated_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def shard_trace_fn(spec: engine.IntegratorSpec, width: int, height: int,
                   spp_per_shard: int, jitter: bool = True):
    """Per-shard body: render `spp_per_shard` samples for the local pixel ids
    and pmean the estimate over the sample axis. Runs under shard_map.

    Uses the differentiable fixed-length trace so the same body serves
    forward AND gradient work; pure forward multi-chip renders should go
    through the fused-kernel path instead (dist/sharded_pallas.py, reached
    via render_sharded(backend='auto'))."""

    def body(scene: Scene, camera: cam.Camera, key, pixel_ids):
        sidx = jax.lax.axis_index(SAMPLE_AXIS)
        kshard = rng.fold(key, sidx)
        # promote to varying over BOTH mesh axes (camera origin is replicated;
        # pixel ids vary only over data) so the scan carry type is stable
        vary = (jax.lax.axis_index(DATA_AXIS) + sidx).astype(
            scene.radius.dtype) * 0.0

        def one_sample(acc, s):
            ks = rng.fold(kshard, s)
            o, d = cam.rays_for_pixels(camera, width, height, pixel_ids, ks, jitter)
            L = engine.trace(scene, spec, o + vary, d + vary, ks,
                             differentiable=True)
            return acc + L, None

        acc, _ = jax.lax.scan(
            one_sample,
            jnp.zeros((pixel_ids.shape[0], 3), scene.radius.dtype) + vary,
            jnp.arange(spp_per_shard, dtype=jnp.int32),
        )
        est = acc / spp_per_shard
        # reduce the SP axis: every sample shard contributes 1/S of the pixel
        return jax.lax.pmean(est, SAMPLE_AXIS)

    return body


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "spp", "distance", "nee",
                     "clamped_ea", "continue_prob", "max_bounces", "jitter"),
)
def _render_sharded_jit(scene, camera, key, *, mesh, width, height, spp,
                        distance, nee, clamped_ea, continue_prob, max_bounces,
                        jitter):
    spec = engine.IntegratorSpec(
        distance=distance, nee=nee, clamped_ea=clamped_ea,
        continue_prob=continue_prob, max_bounces=max_bounces,
    )
    n_data = mesh.shape[DATA_AXIS]
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample:
        raise ValueError(f"spp={spp} not divisible by sample shards={n_sample}")
    npix = width * height
    padded = -(-npix // n_data) * n_data
    pixel_ids = jnp.minimum(jnp.arange(padded, dtype=jnp.int32), npix - 1)

    body = shard_trace_fn(spec, width, height, spp // n_sample, jitter)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            _replicated_specs(scene),
            _replicated_specs(camera),
            P(),
            P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS, None),
    )
    flat = fn(scene, camera, key, pixel_ids)
    return flat[:npix]


def render_sharded(scene: Scene, camera: cam.Camera, cfg, mesh: Mesh,
                   key=None, backend: str = "auto",
                   interpret: bool = False) -> jnp.ndarray:
    """Render an (H, W, 3) frame sharded over `mesh`. cfg is a RenderConfig.

    backend='auto' uses the fused Pallas kernel per device when the
    integrator supports it (kernels/wavefront.PALLAS_INTEGRATORS) — the fast
    path, ~50x the engine's throughput per chip; 'engine' forces the XLA
    wavefront engine (any integrator, and the body gradients flow through);
    'pallas' requires kernel support. `interpret` runs the kernel in
    interpret mode (CPU-mesh tests)."""
    from ..api.render import resolve_spec
    from ..kernels.wavefront import PALLAS_INTEGRATORS
    from .sharded_pallas import render_pallas_sharded

    if backend not in ("auto", "engine", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    use_pallas = backend == "pallas" or (
        backend == "auto" and cfg.integrator in PALLAS_INTEGRATORS
        and (interpret or mesh.devices.flat[0].platform == "tpu"))
    if use_pallas:
        return render_pallas_sharded(scene, camera, cfg, mesh,
                                     interpret=interpret)

    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    spec = resolve_spec(cfg)
    flat = _render_sharded_jit(
        scene, camera, key, mesh=mesh, width=cfg.width, height=cfg.height,
        spp=cfg.spp, distance=spec.distance, nee=spec.nee,
        clamped_ea=spec.clamped_ea, continue_prob=spec.continue_prob,
        max_bounces=spec.max_bounces, jitter=cfg.jitter,
    )
    return flat.reshape(cfg.height, cfg.width, 3)
