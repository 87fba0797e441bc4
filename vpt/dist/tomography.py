"""Multi-view voxel tomography on the engine path.

Recovers a voxel-grid density field (`vpt.media.density.grid`) from V
target renders — differentiable volume reconstruction, the capability the
reference's medium-coefficient estimators (src/rt.cpp:794) point toward
but cannot express (its medium is a single homogeneous (sigma_a, sigma_s)
pair; here the unknown is the whole density field).

Grids are engine-only by hardware necessity (per-lane table gathers are
the one access pattern the VPU tiles can't do — Mosaic's
`tpu.dynamic_gather` is limited to one 8-sublane vreg, measured in
round 3), so this trains through `engine.trace` with
`IntegratorSpec(sigma_score=True)`: sampled distances/events are detached
and re-weighted by their accumulated log-densities, which makes the voxel
gradients unbiased under plain `jax.grad` UP TO the grid's marched-
quadrature transmittance — the grid field has no closed-form optical
depth, so tau is midpoint-rule marching with O((t/n_march)^2) bias
(media/density.py GRID branch), unlike exp_height/blobs where the closed
forms make the estimator exact. Event probabilities and trilinear
pathwise terms are exact; cross-validated against the diff-kernel
estimator in tests/test_hetero.py.

Estimator notes (shared with `dist.train_fast.make_multiview_train_step`):
  * A/B-MSE — two independent renders per view, loss mean((A-t)(B-t)):
    E[(A-t)(B-t)] = (E[render]-t)^2, so the Monte-Carlo variance term
    that biases single-render MSE gradients cancels.
  * fixed target-relMSE pixel weights keep direct-emitter pixels from
    dominating the loss (weights must NOT depend on the renders).
  * projection, not penalties: voxels live in [0, majorant] — the
    majorant is STATIC (it is delta tracking's null-collision rate), so
    clipping to it keeps the tracker unbiased throughout the fit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vpt.integrators import engine
from vpt.scene import camera as cam_mod
from vpt.scene.scene import Medium, Scene


def _grid_scene(scene: Scene, values: jnp.ndarray) -> Scene:
    field = dataclasses.replace(scene.medium.density, params=values)
    return dataclasses.replace(
        scene, medium=Medium(scene.medium.sigma_a, scene.medium.sigma_s,
                             scene.medium.g, field))


def make_grid_train_step(scene: Scene, cameras, width: int, height: int,
                         spp: int, optimizer: optax.GradientTransformation,
                         *, max_bounces: int = 8):
    """step(values, opt_state, targets_flat, weights, key) ->
    (values, opt_state, loss).

    values: (nx, ny, nz) voxel densities (the optimized pytree).
    targets_flat: (V, width*height, 3); weights: None or (V, npix, 1).
    spp is the PER-RENDER sample count (each step renders 2 per view).
    """
    if scene.medium.density is None or scene.medium.density.kind != "grid":
        raise ValueError("make_grid_train_step needs a voxel-grid scene "
                         "(scene.medium.density.kind == 'grid')")
    V = len(cameras)
    vmax = float(scene.medium.density.majorant) / 1.001
    spec = engine.IntegratorSpec(max_bounces=max_bounces, sigma_score=True)
    ids = jnp.arange(width * height, dtype=jnp.int32)

    def render(values, camera, key):
        sc = _grid_scene(scene, values)

        def one(acc, s):
            ks = jax.random.fold_in(key, s)
            o, d = cam_mod.rays_for_pixels(camera, width, height, ids, ks,
                                           True)
            return acc + engine.trace(sc, spec, o, d, ks,
                                      differentiable=True), None

        acc, _ = jax.lax.scan(one, jnp.zeros((width * height, 3)),
                              jnp.arange(spp))
        return acc / spp

    @jax.jit
    def step(values, opt_state, targets_flat, weights, key):
        def loss_fn(v):
            tot = 0.0
            for i, camera in enumerate(cameras):
                ka, kb = jax.random.split(jax.random.fold_in(key, i))
                a = render(v, camera, ka)
                b = render(v, camera, kb)
                e = (a - targets_flat[i]) * (b - targets_flat[i])
                if weights is not None:
                    e = e * weights[i]
                tot = tot + jnp.mean(e)
            return tot / V

        loss, grads = jax.value_and_grad(loss_fn)(values)
        updates, opt_state = optimizer.update(grads, opt_state, values)
        values = optax.apply_updates(values, updates)
        # majorant is static (the delta tracker's null rate): projecting
        # into [0, majorant] keeps the tracker unbiased for every iterate
        values = jnp.clip(values, 0.0, vmax)
        return values, opt_state, loss

    return step


def fit_grid(scene: Scene, cameras, targets, *, steps: int = 100,
             spp: int = 4, learning_rate=2e-2, max_bounces: int = 8,
             seed: int = 0, relmse_weights: bool = True,
             relmse_eps: float = 0.05, log_every: int = 0):
    """Recover scene.medium.density.params (voxel values) from V target
    views. scene carries the INITIAL grid (its shape/origin/spacing/
    majorant are the reconstruction's fixed geometry — majorant bounds
    every iterate, so size it for the densities you expect to recover,
    not the initial guess). Returns (values, losses)."""
    if len(cameras) != len(targets):
        raise ValueError("one target image per camera")
    height, width = np.asarray(targets[0]).shape[:2]
    optimizer = optax.adam(learning_rate)
    step = make_grid_train_step(scene, cameras, width, height, spp,
                                optimizer, max_bounces=max_bounces)
    targets_flat = jnp.stack([
        jnp.asarray(t, jnp.float32).reshape(width * height, 3)
        for t in targets
    ])
    weights = ((1.0 / (jnp.mean(targets_flat, axis=-1, keepdims=True)
                       + relmse_eps) ** 2)
               if relmse_weights else None)
    values = jnp.asarray(scene.medium.density.params, jnp.float32)
    opt_state = optimizer.init(values)
    losses = []
    for i in range(steps):
        values, opt_state, loss = step(values, opt_state, targets_flat,
                                       weights,
                                       jax.random.PRNGKey(seed + i))
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"step {i:4d}  loss {losses[-1]:.6g}")
    return values, losses
