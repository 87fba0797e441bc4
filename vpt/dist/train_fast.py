"""Fast inverse-rendering training on the differentiable fused kernel.

The engine-based SPMD step (dist/train.py) differentiates EVERY scene and
camera parameter but pays the XLA scan engine's throughput; this step
optimizes the medium/material subset {sigma_a, sigma_s, albedo, radiance}
— the reference's actual estimation targets (src/rt.cpp:794) — through the
custom-VJP kernel pair (kernels/diff.py) at fused-kernel speed
(~71M paths/s fwd+bwd on one v5e chip vs ~0.3M for the engine).

The loss is the same A/B unbiased MSE as dist/train.py: two independent
half-budget renders A and B give E[(A-t)(B-t)] = (E[est]-t)^2 exactly, so
low-spp steps do not descend on estimator variance.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
import optax

from ..kernels.diff import make_diff_renderer, pack_params
from ..kernels.geom import make_geom_renderer, pack_theta
from ..scene.scene import Scene
from .train import project_params

__all__ = ["make_kernel_train_step", "fit_kernel", "make_geom_train_step",
           "fit_geom", "make_fd_geom_train_step", "fit_geom_fd",
           "make_sharded_kernel_train_step",
           "make_sharded_fd_geom_train_step",
           "make_multiview_train_step", "fit_multiview"]


def make_kernel_train_step(scene: Scene, camera, width: int, height: int,
                           spp: int, optimizer: optax.GradientTransformation,
                           *, distance: str = "free", max_bounces: int = 32,
                           tile_rows: int = 32, sampler: str = "random",
                           diff_g: bool = False,
                           diff_field: bool = False,
                           diff_blobs: bool = False,
                           diff_grid: bool = False,
                           interpret: bool = False):
    """Build step(params, opt_state, target_flat, seed) ->
    (params, opt_state, loss). `params` is the kernels.diff pytree
    (pack_params; pack with with_g=True when diff_g — the HG anisotropy
    then trains jointly with the medium set — and with_field=True when
    diff_field — the exp_height fog falloff "fog_k" then trains jointly,
    kernels/diff.py); target_flat is (npix, 3). Geometry/camera are
    baked."""
    if diff_grid:
        tile_rows = 8       # the scatter one-hot needs R=8 (kernels/diff)
    render = make_diff_renderer(
        scene, camera, width, height, max(spp // 2, 1), distance=distance,
        max_bounces=max_bounces, tile_rows=tile_rows, sampler=sampler,
        diff_g=diff_g, diff_field=diff_field, diff_blobs=diff_blobs,
        diff_grid=diff_grid, interpret=interpret)

    @jax.jit
    def step(params, opt_state, target_flat, seed):
        def loss_fn(p):
            a = render(p, seed * 2)
            b = render(p, seed * 2 + 1)
            return jnp.mean((a - target_flat) * (b - target_flat))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = project_params(optax.apply_updates(params, updates))
        return params, opt_state, loss

    return step


def make_sharded_kernel_train_step(scene: Scene, camera, width: int,
                                   height: int, spp: int,
                                   optimizer: optax.GradientTransformation,
                                   mesh, *, distance: str = "free",
                                   max_bounces: int = 32,
                                   tile_rows: int = 32,
                                   sampler: str = "random",
                                   diff_g: bool = False,
                                   diff_field: bool = False,
                                   diff_blobs: bool = False,
                                   diff_grid: bool = False,
                                   interpret: bool = False):
    """Multi-chip kernel training: each device runs the fused fwd/bwd pair
    over its contiguous pixel-tile range (the backward kernel masks lanes
    past the frame), losses and parameter gradients are reduced with one
    psum over the data axis. step(params, opt_state, target_flat, seed) ->
    (params, opt_state, loss); target_flat is the full (npix, 3) frame,
    sharded over the mesh's data axis by shard_map. diff_grid (round 4)
    additionally psums each shard's voxel grad table — multi-chip
    differentiable tomography."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from .mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    if diff_grid:
        tile_rows = 8       # the scatter one-hot needs R=8 (kernels/diff)
    render = make_diff_renderer(
        scene, camera, width, height, max(spp // 2, 1), distance=distance,
        max_bounces=max_bounces, tile_rows=tile_rows, sampler=sampler,
        diff_g=diff_g, diff_field=diff_field, diff_blobs=diff_blobs,
        diff_grid=diff_grid, interpret=interpret)
    lanes = render.lanes_per_tile
    npix = render.npix
    tiles_per_shard = -(-render.num_tiles // n_data)
    shard_pixels = tiles_per_shard * lanes
    render_shard = render.make_shard(tiles_per_shard)
    padded = n_data * shard_pixels

    def body(params, opt_state, target, seed):
        di = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
        base = di * jnp.int32(shard_pixels)
        lane = base + jnp.arange(shard_pixels, dtype=jnp.int32)
        valid = (lane < npix)[:, None]

        def loss_fn(p):
            a = render_shard(p, seed * 2, base)
            b = render_shard(p, seed * 2 + 1, base)
            err = jnp.where(valid, (a - target) * (b - target), 0.0)
            return jax.lax.psum(jnp.sum(err), DATA_AXIS) / (npix * 3)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # loss_fn psums the LOSS, but under check_vma=False the transpose
        # of that psum does NOT re-reduce the cotangents: each device's
        # value_and_grad returns only its own shard's partial gradient
        # d(s_d)/d(theta). Without this explicit all-reduce every device
        # applies a different update and the replicas silently diverge
        # (caught by the round-5 two-process rehearsal, where the
        # pixel-less shards' replicas never moved at all; invisible to
        # any test whose frame fits one shard's tile).
        grads = jax.lax.psum(grads, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = project_params(optax.apply_updates(params, updates))
        return params, opt_state, loss

    repl = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

    @jax.jit
    def step(params, opt_state, target_flat, seed):
        pad = padded - npix
        tgt = jnp.pad(target_flat, ((0, pad), (0, 0)))
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(repl(params), repl(opt_state), P(DATA_AXIS, None), P()),
            out_specs=(repl(params), repl(opt_state), P()),
            check_vma=False,
        )
        return fn(params, opt_state, tgt, jnp.asarray(seed, jnp.int32))

    return step


def make_geom_train_step(scene: Scene, camera, width: int, height: int,
                         spp: int, optimizer: optax.GradientTransformation,
                         *, sphere: int | None, cam_grads: bool = True,
                         dir_grads: bool = False,
                         distance: str = "free", max_bounces: int = 32,
                         tile_rows: int = 8, interpret: bool = False):
    """Geometric inverse rendering at kernel speed: optimize a sphere
    (light) center and/or the full camera pose (origin+fov, look
    direction with dir_grads=True) through the forward-mode dual kernel
    (kernels/geom.py). Same A/B unbiased MSE as the other steps; theta is
    the kernels.geom pytree (pack_theta).

    step(theta, opt_state, target_flat, seed) -> (theta, opt_state, loss).
    """
    render = make_geom_renderer(
        scene, camera, width, height, max(spp // 2, 1), sphere=sphere,
        cam_grads=cam_grads, dir_grads=dir_grads, distance=distance,
        max_bounces=max_bounces,
        tile_rows=tile_rows, interpret=interpret)
    gr = render.grad_render

    @jax.jit
    def step(theta, opt_state, target_flat, seed):
        def loss_fn(th):
            a = gr(th, seed * 2)
            b = gr(th, seed * 2 + 1)
            return jnp.mean((a - target_flat) * (b - target_flat))

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    return step


def _fit_loop(step, params, optimizer, target, width, height, steps, seed,
              param_filter, log_every):
    """Shared training loop: init, per-step seed, optional freeze filter,
    loss log. Returns (params, losses)."""
    init = dict(params)
    opt_state = optimizer.init(params)
    target_flat = jnp.asarray(target).reshape(width * height, 3)
    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, target_flat,
                                       jnp.int32(seed + i))
        if param_filter is not None:
            params = param_filter(params, init)
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"step {i:4d}  loss {losses[-1]:.6g}")
    return params, losses


def _fd_dims(sphere, cam_grads, sigma, dir_grads=False):
    dims = (([0, 1, 2] if sphere is not None else [])
            + ([3, 4, 5, 6] if cam_grads else [])
            + ([7, 8] if sigma else [])
            + ([9, 10, 11] if dir_grads else []))
    if not dims:
        raise ValueError("no differentiated block enabled")
    return dims


def _phys_probe(v):
    """Clamp an FD probe's sigma block (dims 7-8) into the physical domain.
    Projection after the Adam update keeps THETA >= 1e-6, but the minus
    probe theta - h_sigma can still cross zero and render a negative
    extinction (negative free-flight distances, garbage secant). At the
    floor this makes lp == lm => zero gradient: the correct projected-GD
    boundary behavior. (Only dims 7-8: the cam_dir block at 9-11 is
    unconstrained.)"""
    return v.at[7:9].set(jnp.maximum(v[7:9], 1e-6))


def make_fd_geom_train_step(scene: Scene, camera, width: int, height: int,
                            spp: int, optimizer, *, sphere: int | None,
                            cam_grads: bool = True, sigma: bool = False,
                            dir_grads: bool = False,
                            h: float = 0.5, h_fov: float = 2e-3,
                            h_sigma: float = 5e-4, h_dir: float = 1e-3,
                            distance: str = "free",
                            max_bounces: int = 32, tile_rows: int = 8,
                            sampler: str = "random",
                            interpret: bool = False):
    """Geometric training via common-random-number CENTRAL DIFFERENCES on
    the theta-parameterized fused forward kernel (kernels/geom.py,
    primal_only=True).

    Why this exists: the dual kernel (and the engine's AD) detach discrete
    events, which drops the BOUNDARY terms of geometric derivatives —
    silhouette/shadow-edge sweeps and the emitter's own visible disk. A
    central difference of the estimator at the SAME seed keeps the smooth
    chains' noise correlated (it cancels to O(h)) while the decision flips
    between theta-h and theta+h contribute exactly the missing boundary
    mass, so E[g_fd] -> the TRUE gradient as h -> 0 (at O(p_flip/h)
    variance — pick h at the scale of a pixel footprint; the default 0.5
    scene units ~ 1 pixel at the reference camera).

    Cost: 4 kernel launches per enabled dimension per step (A/B pair at
    each of theta+h/theta-h; all 9 dims enabled -> 36 forward passes, each
    at full fused-kernel speed at spp/2). step(theta, opt_state,
    target_flat, seed) -> (theta, opt_state, loss)."""
    render = make_geom_renderer(
        scene, camera, width, height, max(spp // 2, 1), sphere=sphere,
        cam_grads=cam_grads, distance=distance, max_bounces=max_bounces,
        tile_rows=tile_rows, sampler=sampler, primal_only=True,
        interpret=interpret)
    run, flatten = render.run_vec, render.flatten
    dims = _fd_dims(sphere, cam_grads, sigma, dir_grads)
    hs = [h, h, h, h, h, h, h_fov, h_sigma, h_sigma, h_dir, h_dir, h_dir]

    @jax.jit
    def step(theta, opt_state, target_flat, seed):
        vec = flatten(theta)

        def loss_of(v, s):
            # A/B product loss (same unbiased-MSE estimator as the dual
            # step): E[(Ia-T)(Ib-T)] = (E[I]-T)^2 — its theta-gradient has
            # no Var(I_theta) term, so the FD secant doesn't chase noise
            # shrinkage. CRN: both seeds are the SAME at v+e and v-e.
            a, _ = run(_phys_probe(v), s * 2)
            b, _ = run(_phys_probe(v), s * 2 + 1)
            return jnp.mean((a - target_flat) * (b - target_flat))

        g = jnp.zeros(12, jnp.float32)
        loss = None
        for k in dims:
            e = jnp.zeros(12, jnp.float32).at[k].set(hs[k])
            lp = loss_of(vec + e, seed)
            lm = loss_of(vec - e, seed)
            g = g.at[k].set((lp - lm) / (2.0 * hs[k]))
            if loss is None:
                loss = 0.5 * (lp + lm)   # O(h^2) from the center value
        grads = {"center": g[:3], "cam_origin": g[3:6], "fov": g[6],
                 "sigma_a": g[7], "sigma_s": g[8], "cam_dir": g[9:12]}
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        if sigma:
            # projected GD: keep the medium physical (FD at sigma<=0 is
            # meaningless and h_sigma-sized Adam steps can cross zero)
            theta = dict(theta)
            theta["sigma_a"] = jnp.maximum(theta["sigma_a"], 1e-6)
            theta["sigma_s"] = jnp.maximum(theta["sigma_s"], 1e-6)
        return theta, opt_state, loss

    return step


def make_sharded_fd_geom_train_step(scene: Scene, camera, width: int,
                                    height: int, spp: int, optimizer,
                                    mesh, *, sphere: int | None,
                                    cam_grads: bool = True,
                                    sigma: bool = False,
                                    dir_grads: bool = False,
                                    h: float = 0.5,
                                    h_fov: float = 2e-3,
                                    h_sigma: float = 5e-4,
                                    h_dir: float = 1e-3,
                                    distance: str = "free",
                                    max_bounces: int = 32,
                                    tile_rows: int = 8,
                                    sampler: str = "random",
                                    interpret: bool = False):
    """Multi-chip boundary-aware geometric/medium training: each device
    runs the theta-traced primal kernel over its contiguous pixel-tile
    range, the A/B product losses at theta+-h are reduced with one psum
    over the data axis, and every device forms the identical FD gradient.
    Sample-axis shards render at DECORRELATED seeds and the losses are
    pmean'd over the sample axis — n_sample independent CRN secants
    averaged, so those chips buy gradient-variance reduction instead of
    redundant work. With n_sample == 1 the loss equals the single-device
    loss up to summation order (per-lane PCG streams are
    global-lane-keyed). step(theta, opt_state, target_flat (npix,3),
    seed) -> (theta, opt_state, loss)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .mesh import DATA_AXIS, SAMPLE_AXIS

    n_data = mesh.shape[DATA_AXIS]
    render = make_geom_renderer(
        scene, camera, width, height, max(spp // 2, 1), sphere=sphere,
        cam_grads=cam_grads, distance=distance, max_bounces=max_bounces,
        tile_rows=tile_rows, sampler=sampler, primal_only=True,
        interpret=interpret)
    flatten = render.flatten
    lanes = render.lanes_per_tile
    npix = render.npix
    tiles_per_shard = -(-render.num_tiles // n_data)
    shard_pixels = tiles_per_shard * lanes
    raw = render.make_raw(tiles_per_shard)
    padded = n_data * shard_pixels
    spp_half = max(spp // 2, 1)

    dims = _fd_dims(sphere, cam_grads, sigma, dir_grads)
    hs = [h, h, h, h, h, h, h_fov, h_sigma, h_sigma, h_dir, h_dir, h_dir]

    def body(theta, opt_state, target, seed):
        di = jax.lax.axis_index(DATA_AXIS).astype(jnp.int32)
        si = jax.lax.axis_index(SAMPLE_AXIS).astype(jnp.int32)
        base = di * jnp.int32(shard_pixels)
        lane = base + jnp.arange(shard_pixels, dtype=jnp.int32)
        valid = (lane < npix)[:, None]
        vec = flatten(theta)

        def loss_of(v, s):
            # sample shards draw decorrelated seeds; CRN still holds WITHIN
            # each shard (same s at v+e and v-e), so the pmean averages
            # n_sample independent secants
            s = s + si * jnp.int32(0x9E37)
            a, _ = raw(_phys_probe(v), s * 2, base)
            b, _ = raw(_phys_probe(v), s * 2 + 1, base)
            scale = 1.0 / spp_half
            err = jnp.where(valid, (a * scale - target) * (b * scale - target),
                            0.0)
            part = jax.lax.psum(jnp.sum(err), DATA_AXIS) / (npix * 3)
            return jax.lax.pmean(part, SAMPLE_AXIS)

        g = jnp.zeros(12, jnp.float32)
        loss = None
        for k in dims:
            e = jnp.zeros(12, jnp.float32).at[k].set(hs[k])
            lp = loss_of(vec + e, seed)
            lm = loss_of(vec - e, seed)
            g = g.at[k].set((lp - lm) / (2.0 * hs[k]))
            if loss is None:
                loss = 0.5 * (lp + lm)
        grads = {"center": g[:3], "cam_origin": g[3:6], "fov": g[6],
                 "sigma_a": g[7], "sigma_s": g[8], "cam_dir": g[9:12]}
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        if sigma:
            theta = dict(theta)
            theta["sigma_a"] = jnp.maximum(theta["sigma_a"], 1e-6)
            theta["sigma_s"] = jnp.maximum(theta["sigma_s"], 1e-6)
        return theta, opt_state, loss

    repl = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)

    @jax.jit
    def step(theta, opt_state, target_flat, seed):
        pad = padded - npix
        tgt = jnp.pad(target_flat, ((0, pad), (0, 0)))
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(repl(theta), repl(opt_state), P(DATA_AXIS, None), P()),
            out_specs=(repl(theta), repl(opt_state), P()),
            check_vma=False,
        )
        return fn(theta, opt_state, tgt, jnp.asarray(seed, jnp.int32))

    return step


def fit_geom_fd(scene: Scene, camera, target, *, sphere: int | None,
                cam_grads: bool = True, sigma: bool = False,
                dir_grads: bool = False,
                steps: int = 60, spp: int = 16,
                learning_rate=2e-1, h: float = 0.5, h_fov: float = 2e-3,
                h_sigma: float = 5e-4, h_dir: float = 1e-3,
                distance: str = "free",
                max_bounces: int = 32, sampler: str = "random",
                tile_rows: int = 8, seed: int = 0, interpret: bool = False,
                param_filter=None, log_every: int = 0):
    """fit_geom with boundary-aware CRN finite-difference gradients
    (make_fd_geom_train_step) instead of the detached dual estimator.
    sigma=True additionally recovers the medium coefficients (joint
    geometry + medium inverse rendering on one kernel; pass a per-block
    optimizer via make_fd_geom_train_step directly if sigma needs its own
    learning rate, which it usually does — sigma ~1e-3 vs positions ~1e1).
    Returns (theta, losses)."""
    height, width = target.shape[:2]
    optimizer = optax.adam(learning_rate)
    theta = pack_theta(scene, camera, sphere)
    step = make_fd_geom_train_step(
        scene, camera, width, height, spp, optimizer, sphere=sphere,
        cam_grads=cam_grads, sigma=sigma, dir_grads=dir_grads, h=h,
        h_fov=h_fov, h_sigma=h_sigma, h_dir=h_dir, distance=distance,
        max_bounces=max_bounces,
        tile_rows=tile_rows, sampler=sampler, interpret=interpret)
    return _fit_loop(step, theta, optimizer, target, width, height, steps,
                     seed, param_filter, log_every)


def fit_geom(scene: Scene, camera, target, *, sphere: int | None,
             cam_grads: bool = True, dir_grads: bool = False,
             steps: int = 60, spp: int = 16,
             learning_rate=2e-1, distance: str = "free",
             max_bounces: int = 32, tile_rows: int = 8, seed: int = 0,
             interpret: bool = False, param_filter=None, log_every: int = 0):
    """Recover geometric parameters (light position / camera) from a target
    (H, W, 3) image with the dual kernel. Returns (theta, losses)."""
    height, width = target.shape[:2]
    optimizer = optax.adam(learning_rate)
    theta = pack_theta(scene, camera, sphere)
    step = make_geom_train_step(scene, camera, width, height, spp, optimizer,
                                sphere=sphere, cam_grads=cam_grads,
                                dir_grads=dir_grads,
                                distance=distance, max_bounces=max_bounces,
                                tile_rows=tile_rows, interpret=interpret)
    return _fit_loop(step, theta, optimizer, target, width, height, steps,
                     seed, param_filter, log_every)


# log-reparameterized medium leaves (fit_multiview log_medium=True):
# Adam's unit-scale steps become MULTIPLICATIVE for the positive medium
# block — a 4e-3 step is x1.004 — which cannot blast a sigma ~ 1e-3 across
# orders of magnitude into the vanishing-gradient thick-fog basin the raw
# parameterization reaches in one early step (round-3 multi-view study)
_LOG_LEAVES = ("sigma_a", "sigma_s", "fog_k")


def _to_log(p):
    q = dict(p)
    for k in _LOG_LEAVES:
        if k in q:
            q[k] = jnp.log(jnp.maximum(q[k], 1e-8))
    return q


def _from_log(q):
    p = dict(q)
    for k in _LOG_LEAVES:
        if k in p:
            p[k] = jnp.exp(p[k])
    return p


def make_multiview_train_step(scene: Scene, cameras, width: int, height: int,
                              spp: int,
                              optimizer: optax.GradientTransformation, *,
                              distance: str = "free", max_bounces: int = 32,
                              tile_rows: int = 32, sampler: str = "random",
                              diff_g: bool = False, diff_field: bool = False,
                              log_medium: bool = False,
                              interpret: bool = False):
    """Joint medium/material fit over V cameras observing ONE scene.

    Single-view fog estimation is weakly identifiable (similarity theory:
    appearance constrains sigma_s(1-g) and the profile jointly —
    BASELINE.md round-3 notes); extra views tighten it without any new
    estimator machinery: V diff-kernel pairs (kernels/diff.py) share the
    parameter pytree and their A/B-MSE losses average per step.

    Returns step(qparams, opt_state, targets_flat, weights, seed) ->
    (qparams, opt_state, loss) with:
      * qparams — the pytree in OPTIMIZER space (identity by default;
        log-space medium block when log_medium=True). step.to_opt /
        step.from_opt convert; fit_multiview handles this for you.
      * targets_flat — (V, width*height, 3) stacked per-view targets.
      * weights — None, or (V, npix, 1) fixed per-pixel loss weights.
        Weights must NOT depend on the renders: E[w (A-t)(B-t)] =
        w (E-t)^2 holds only for fixed w (relMSE weights from the TARGET
        keep direct-emitter pixels from dominating — fit_multiview).
      * per-view decorrelated seed pairs (seed*2V + 2v, +1).
    """
    renders = [
        make_diff_renderer(scene, c, width, height, max(spp // 2, 1),
                           distance=distance, max_bounces=max_bounces,
                           tile_rows=tile_rows, sampler=sampler,
                           diff_g=diff_g, diff_field=diff_field,
                           interpret=interpret)
        for c in cameras
    ]
    V = len(renders)
    to_opt = _to_log if log_medium else (lambda p: dict(p))
    from_opt = _from_log if log_medium else (lambda q: dict(q))

    @jax.jit
    def step(qp, opt_state, targets_flat, weights, seed):
        def loss_fn(q):
            p = from_opt(q)
            tot = 0.0
            for v, render in enumerate(renders):
                a = render(p, seed * (2 * V) + 2 * v)
                b = render(p, seed * (2 * V) + 2 * v + 1)
                e = (a - targets_flat[v]) * (b - targets_flat[v])
                if weights is not None:
                    e = e * weights[v]
                tot = tot + jnp.mean(e)
            return tot / V

        loss, grads = jax.value_and_grad(loss_fn)(qp)
        updates, opt_state = optimizer.update(grads, opt_state, qp)
        qp = optax.apply_updates(qp, updates)
        # project in RAW space (log leaves are positive by construction,
        # but albedo/radiance/g still need their physical domain)
        qp = to_opt(project_params(from_opt(qp)))
        return qp, opt_state, loss

    step.to_opt = to_opt
    step.from_opt = from_opt
    return step


def fit_multiview(scene: Scene, cameras, targets, *, steps: int = 200,
                  spp: int = 16, learning_rate=6e-3, distance: str = "free",
                  max_bounces: int = 32, sampler: str = "random",
                  seed: int = 0, diff_g: bool = False,
                  diff_field: bool = False, log_medium: bool = True,
                  relmse_weights: bool = True, relmse_eps: float = 0.05,
                  polyak_tail: int = 0, interpret: bool = False,
                  param_filter=None, log_every: int = 0):
    """Recover the medium/material pytree from V target views (one per
    camera). Defaults carry the round-3 multi-view study's lessons:
    log-space medium block and target-relMSE pixel weights (both
    documented in make_multiview_train_step). polyak_tail > 0 averages
    the last N iterates (tail averaging beats the last noisy iterate on
    MC losses). Returns (params, losses)."""
    if len(cameras) != len(targets):
        raise ValueError("one target image per camera")
    height, width = np.asarray(targets[0]).shape[:2]
    optimizer = optax.adam(learning_rate)
    params = pack_params(scene, with_g=diff_g, with_field=diff_field)
    step = make_multiview_train_step(
        scene, cameras, width, height, spp, optimizer, distance=distance,
        max_bounces=max_bounces, sampler=sampler, diff_g=diff_g,
        diff_field=diff_field, log_medium=log_medium, interpret=interpret)
    targets_flat = jnp.stack([
        jnp.asarray(t, jnp.float32).reshape(width * height, 3)
        for t in targets
    ])
    weights = ((1.0 / (jnp.mean(targets_flat, axis=-1, keepdims=True)
                       + relmse_eps) ** 2)
               if relmse_weights else None)
    init = dict(params)
    qp = step.to_opt(params)
    opt_state = optimizer.init(qp)
    losses, tail = [], []
    for i in range(steps):
        qp, opt_state, loss = step(qp, opt_state, targets_flat, weights,
                                   jnp.int32(seed + i))
        if param_filter is not None:
            qp = step.to_opt(param_filter(step.from_opt(qp), init))
        losses.append(float(loss))
        if polyak_tail and i >= steps - polyak_tail:
            tail.append(step.from_opt(qp))
        if log_every and i % log_every == 0:
            print(f"step {i:4d}  loss {losses[-1]:.6g}")
    out = step.from_opt(qp)
    if tail:
        out = jax.tree.map(lambda *xs: sum(xs) / len(xs), *tail)
    return out, losses


def fit_kernel(scene: Scene, camera, target, *, steps: int = 100,
               spp: int = 16, learning_rate=1.5e-3, distance: str = "free",
               max_bounces: int = 32, sampler: str = "random",
               seed: int = 0, diff_g: bool = False,
               diff_field: bool = False, diff_blobs: bool = False,
               diff_grid: bool = False,
               interpret: bool = False,
               param_filter=None, log_every: int = 0):
    """Recover {sigma_a, sigma_s, albedo, radiance} — plus the HG
    anisotropy g when diff_g=True, plus the exp_height fog falloff "fog_k"
    when diff_field=True, plus the Gaussian-blob field parameters "blobs"
    (K, 5) when diff_blobs=True, plus the voxel table "grid" when
    diff_grid=True (single-view; multi-view tomography wants
    vpt.dist.fit_grid(backend="kernel")) — from a target (H, W, 3) image
    with the fused kernel. `param_filter(updated, initial) -> params` can
    freeze leaves (e.g. keep everything but sigma_s fixed). Returns
    (params, losses)."""
    height, width = target.shape[:2]
    optimizer = optax.adam(learning_rate)
    params = pack_params(scene, with_g=diff_g, with_field=diff_field,
                         with_blobs=diff_blobs, with_grid=diff_grid)
    step = make_kernel_train_step(scene, camera, width, height, spp,
                                  optimizer, distance=distance,
                                  max_bounces=max_bounces, sampler=sampler,
                                  diff_g=diff_g, diff_field=diff_field,
                                  diff_blobs=diff_blobs,
                                  diff_grid=diff_grid,
                                  interpret=interpret)
    return _fit_loop(step, params, optimizer, target, width, height, steps,
                     seed, param_filter, log_every)
