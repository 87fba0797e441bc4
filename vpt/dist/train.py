"""Distributed inverse-rendering training step.

The reference has no training of any kind — BASELINE.json config #5 defines
the capability: recover (sigma_t, sigma_s, albedo, light position/power,
camera) from a target image by pixel-gradient descent. The TPU-native design
is pure data parallelism over pixels plus sample parallelism over spp
(SURVEY.md §2.12): every device renders its (pixel shard x sample shard) of
the estimate with the differentiable fixed-length integrator, computes the
local MSE-vs-target gradient w.r.t. the replicated parameter pytree, and the
gradients are all-reduced with one `psum` over both mesh axes (XLA overlaps
the collective with the remaining backward work). The optimizer update is
replicated — the parameter pytree is a few hundred floats.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core import rng
from ..integrators import engine
from ..scene import camera as cam
from ..scene.scene import Medium, Scene
from .mesh import DATA_AXIS, SAMPLE_AXIS

__all__ = ["scene_params", "apply_params", "project_params",
           "make_train_step", "fit"]

# physical-domain bounds applied after each optimizer update; keys absent
# from a params pytree are simply not constrained
_DOMAIN = {
    # strictly positive: the score-function sigma estimator differentiates
    # log(sigma_t) (engine sigma_score), and free-flight sampling assumes a
    # non-negative extinction — one Adam step with lr ~ 1e-2 from the
    # reference's sigma ~ 1e-3 otherwise lands NEGATIVE and every later
    # gradient is NaN (found by the 2-process DCN rehearsal, round 2)
    "sigma_a": (1e-6, None),
    "sigma_s": (1e-6, None),
    "albedo": (0.0, 1.0),
    "radiance": (0.0, None),
    # HG anisotropy: the score noise grows as |g| -> 1 and the HG inversion
    # degenerates at |g| == 1 (docs/INVERSE_RENDERING.md clips the same)
    "g": (-0.95, 0.95),
    # exp_height falloff: fits assume ground fog decaying upward; the tiny
    # floor keeps log-space reparameterizations (train_fast.fit_multiview
    # log_medium) well-defined and costs nothing against real targets
    "fog_k": (1e-6, None),
}


def project_params(params: dict) -> dict:
    """Project a parameter pytree onto its physical domain (see _DOMAIN).

    Applied inside every train step (projected gradient descent): plain
    unconstrained updates can leave the domain in one step, after which the
    loss may stay finite while the gradients are NaN — silent divergence."""
    out = dict(params)
    for k, (lo, hi) in _DOMAIN.items():
        if k in out:
            out[k] = jnp.clip(out[k], lo, hi)
    if "blobs" in out:
        # (K, 5) [cx, cy, cz, r, w]: centers free; radius strictly
        # positive (every term carries 1/r); weight non-negative
        b = out["blobs"]
        out["blobs"] = jnp.concatenate(
            [b[:, :3], jnp.clip(b[:, 3:4], 1e-2, None),
             jnp.clip(b[:, 4:5], 0.0, None)], axis=1)
    if "grid" in out:
        # voxel densities stay non-negative; the majorant cap is applied
        # by grid-specific trainers (dist/tomography.py) which know it
        out["grid"] = jnp.clip(out["grid"], 0.0, None)
    return out


def scene_params(scene: Scene, camera: cam.Camera) -> dict:
    """The differentiable parameter pytree of BASELINE.json config #5:
    medium coefficients, surface albedos, light radiance + positions, and
    camera pose/fov."""
    return {
        "sigma_a": scene.medium.sigma_a,
        "sigma_s": scene.medium.sigma_s,
        "albedo": scene.albedo,
        "radiance": scene.radiance,
        "center": scene.center,
        "cam_origin": camera.origin,
        "cam_direction": camera.direction,
        "cam_fov": camera.fov_scale,
    }


def apply_params(scene: Scene, camera: cam.Camera, p: dict):
    scene = dataclasses.replace(
        scene,
        albedo=p["albedo"],
        radiance=p["radiance"],
        center=p["center"],
        medium=Medium(p["sigma_a"], p["sigma_s"], scene.medium.g,
                      scene.medium.density),
    )
    camera = dataclasses.replace(
        camera,
        origin=p["cam_origin"],
        direction=p["cam_direction"],
        fov_scale=p["cam_fov"],
    )
    return scene, camera


def _replicated_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def make_train_step(
    mesh: Mesh,
    spec: engine.IntegratorSpec,
    width: int,
    height: int,
    spp: int,
    optimizer: optax.GradientTransformation,
):
    """Build a jitted SPMD train step.

    step(params, opt_state, scene, camera, target_flat, pixel_ids, key)
      -> (params, opt_state, loss)

    target_flat: (padded_npix, 3) sharded over DATA_AXIS (padding pixels must
    duplicate real ones so the loss mean stays unbiased enough for training).
    pixel_ids:   (padded_npix,) int32, the flat pixel index each row renders.
    scene/camera provide the non-differentiable structure; the differentiable
    leaves come from `params`.
    """
    n_sample = mesh.shape[SAMPLE_AXIS]
    if spp % n_sample:
        raise ValueError(f"spp={spp} not divisible by sample shards={n_sample}")
    spp_local = spp // n_sample

    def shard_body(params, opt_state, scene, camera, target, pixel_ids, key):
        sidx = jax.lax.axis_index(SAMPLE_AXIS)
        kshard = rng.fold(key, sidx)
        vary = (jax.lax.axis_index(DATA_AXIS) + sidx).astype(
            target.dtype) * 0.0

        def loss_fn(params):
            sc, cm = apply_params(scene, camera, params)

            def estimate(salt, n):
                def one_sample(acc, s):
                    ks = rng.fold(kshard, salt, s)
                    o, d = cam.rays_for_pixels(cm, width, height, pixel_ids,
                                               ks, True)
                    L = engine.trace(sc, spec, o + vary, d + vary, ks,
                                     differentiable=True)
                    return acc + L, None

                acc, _ = jax.lax.scan(
                    one_sample,
                    jnp.zeros((pixel_ids.shape[0], 3), target.dtype) + vary,
                    jnp.arange(n, dtype=jnp.int32),
                )
                # cross-shard pixel estimate: the mean over the sample axis
                # is INSIDE the loss so its gradient reaches every shard
                return jax.lax.pmean(acc / n, SAMPLE_AXIS)

            # A/B unbiased MSE: E[(A - t)(B - t)] = (E[est] - t)^2 exactly —
            # a single-estimate squared error also descends on the
            # ESTIMATOR'S VARIANCE (E[(A-t)^2] = bias^2 + Var/n), which at
            # low spp can dominate and pull parameters AWAY from the truth
            n_a = max(spp_local // 2, 1)
            n_b = max(spp_local - n_a, 1)
            est_a = estimate(0x0A, n_a)
            est_b = estimate(0x0B, n_b)
            err = jnp.mean((est_a - target) * (est_b - target))
            return jax.lax.pmean(err, DATA_AXIS)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # all-reduce partial grads over both mesh axes -> replicated grads
        grads = jax.lax.psum(grads, (DATA_AXIS, SAMPLE_AXIS))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = project_params(optax.apply_updates(params, updates))
        return params, opt_state, loss

    def jitted(params, opt_state, scene, camera, target_flat, pixel_ids, key):
        fn = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(
                _replicated_specs(params),
                _replicated_specs(opt_state),
                _replicated_specs(scene),
                _replicated_specs(camera),
                P(DATA_AXIS, None),
                P(DATA_AXIS),
                P(),
            ),
            out_specs=(
                _replicated_specs(params),
                _replicated_specs(opt_state),
                P(),
            ),
            check_vma=False,
        )
        return fn(params, opt_state, scene, camera, target_flat, pixel_ids, key)

    return jax.jit(jitted)


def fit(
    scene: Scene,
    camera: cam.Camera,
    target: jnp.ndarray,
    mesh: Mesh,
    spec: engine.IntegratorSpec | None = None,
    steps: int = 100,
    spp: int = 4,
    learning_rate: float = 1e-2,
    key=None,
    log_every: int = 0,
):
    """Gradient-descent recovery of scene/camera parameters from a target
    (H, W, 3) image. Returns (scene, camera, losses)."""
    if spec is None:
        spec = engine.IntegratorSpec(max_bounces=8)
    if key is None:
        key = jax.random.PRNGKey(0)
    height, width = target.shape[:2]
    npix = width * height
    n_data = mesh.shape[DATA_AXIS]
    padded = -(-npix // n_data) * n_data
    pixel_ids = jnp.minimum(jnp.arange(padded, dtype=jnp.int32), npix - 1)
    target_flat = target.reshape(npix, 3)[pixel_ids]

    optimizer = optax.adam(learning_rate)
    params = scene_params(scene, camera)
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, spec, width, height, spp, optimizer)

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, scene, camera, target_flat, pixel_ids,
            rng.fold(key, i),
        )
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"step {i:4d}  loss {losses[-1]:.6g}")
    scene, camera = apply_params(scene, camera, params)
    return scene, camera, losses
