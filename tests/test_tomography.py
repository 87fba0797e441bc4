"""Tests for the public tomography trainer (vpt.dist.fit_grid /
make_grid_train_step) — the multi-view voxel reconstruction API.

Coverage the grid-FIELD tests (test_hetero.py) don't give: the trainer
itself — its A/B-MSE loss wiring, optimizer step, majorant projection,
and that the voxel gradient at a wrong init actually points toward the
truth (the signal the whole fit rides on). The fast test uses a 4^3 grid;
the statistical direction/convergence tests replicate the round-3 probe
study's configuration (8^3, 3 views, relMSE weights — measured
cos(-grad, truth-init) ~ 0.5 there) and are marked slow.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vpt.dist.tomography import fit_grid, make_grid_train_step
from vpt.integrators import engine
from vpt.media import density as df
from vpt.scene import camera as cam_mod
from vpt.scene.scene import Medium, blob_cloud

W, H = 16, 12


def _grid_scene(values, majorant, n):
    base = blob_cloud()
    # grid volume around the blob cloud's bounding region (tomo geometry
    # fixed a priori, as in examples/recover_grid.py)
    xs = np.linspace(-28, 28, n)
    ys = np.linspace(-18, 24, n)
    zs = np.linspace(150, 195, n)
    sp = (xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0])
    org = (xs[0] - sp[0] / 2, ys[0] - sp[1] / 2, zs[0] - sp[2] / 2)
    f = df.DensityField(params=jnp.asarray(values, jnp.float32), kind="grid",
                        majorant=majorant, grid_origin=org, grid_spacing=sp,
                        n_march=16)
    return dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0, f))


def _truth_values(n):
    base = blob_cloud()
    xs = np.linspace(-28, 28, n)
    ys = np.linspace(-18, 24, n)
    zs = np.linspace(150, 195, n)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1))
    return np.asarray(df.density(base.medium.density, pts), np.float32)


def _render(scene, camera, key, spp):
    spec = engine.IntegratorSpec(max_bounces=4)
    ids = jnp.arange(W * H, dtype=jnp.int32)

    def one(acc, s):
        ks = jax.random.fold_in(key, s)
        o, d = cam_mod.rays_for_pixels(camera, W, H, ids, ks, True)
        return acc + engine.trace(scene, spec, o, d, ks), None

    acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)), jnp.arange(spp))
    return np.asarray(acc / spp).reshape(H, W, 3)


def _cams(v):
    return [cam_mod.default_camera(),
            cam_mod.look_at((150, 30, 170), (0, 0, 170)),
            cam_mod.look_at((-140, -20, 175), (0, 0, 170))][:v]


def test_tv_prior_value_and_gradient():
    """Round 5: anisotropic TV prior. Value on a hand case (a single
    interior spike in a zero 4^3 grid has 6 unit jumps, 2 per axis over
    48 forward differences) and gradient direction (TV's subgradient at
    the spike is positive — the prior pulls isolated voxels down)."""
    from vpt.dist.tomography import _tv

    v = jnp.zeros((4, 4, 4)).at[2, 2, 2].set(1.0)
    want = (2 / 48 + 2 / 48 + 2 / 48) / 3.0
    assert np.isclose(float(_tv(v)), want, rtol=1e-6)
    g = np.asarray(jax.grad(_tv)(v))
    assert g[2, 2, 2] > 0.0
    # smooth ramp has constant differences: TV == mean |slope|, and its
    # gradient vanishes at fully-interior voxels (edge-preserving; grid
    # boundaries keep JAX's abs-at-zero subgradient +1, which is fine —
    # only the interior cancellation matters for smooth structure)
    ramp = jnp.broadcast_to(jnp.arange(4.0).reshape(4, 1, 1), (4, 4, 4))
    assert np.isclose(float(_tv(ramp)), 1.0 / 3.0, rtol=1e-6)
    gr = np.asarray(jax.grad(_tv)(ramp))
    assert np.abs(gr[1:3, 1:3, 1:3]).max() < 1e-6


@pytest.mark.slow  # ~390s interpret compile (engine AD over the grid)
def test_grid_train_step_runs_and_projects():
    n = 4
    truth = _truth_values(n)
    maj = float(truth.max()) * 1.3
    cams = _cams(2)
    targets = [_render(_grid_scene(truth, maj, n), c,
                       jax.random.PRNGKey(7 + i), spp=4)
               for i, c in enumerate(cams)]
    init = np.full((n, n, n), 0.3, np.float32)
    scene = _grid_scene(init, maj, n)
    opt = optax.adam(5e-2)
    step = make_grid_train_step(scene, cams, W, H, spp=1, optimizer=opt,
                                max_bounces=4, reg_l1=1e-3, reg_tv=1e-3)
    tf = jnp.stack([jnp.asarray(t, jnp.float32).reshape(W * H, 3)
                    for t in targets])
    values = jnp.asarray(init)
    opt_state = opt.init(values)
    for i in range(3):
        values, opt_state, loss = step(values, opt_state, tf, None,
                                       jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))
    v = np.asarray(values)
    assert np.isfinite(v).all()
    # majorant projection: every iterate stays in [0, majorant]
    assert v.min() >= 0.0 and v.max() <= maj / 1.001 + 1e-6


@pytest.fixture(scope="module")
def tomo8():
    """Round-3 probe configuration: 8^3 grid, 3 views, spp-8 targets."""
    n = 8
    truth = _truth_values(n)
    maj = float(truth.max()) * 1.3
    cams = _cams(3)
    targets = [_render(_grid_scene(truth, maj, n), c,
                       jax.random.PRNGKey(100 + i), spp=8)
               for i, c in enumerate(cams)]
    return n, truth, maj, cams, targets


@pytest.mark.slow
def test_grid_score_gradient_matches_crn_fd(tomo8):
    """Estimator correctness: the sigma_score voxel gradient agrees with
    common-random-number central finite differences of the same loss
    within combined standard error. (A gradient-DIRECTION gate toward the
    truth is not testable here: the round-4 SNR study measured median
    per-voxel SNR ~ 1 at any CI-feasible budget, and 3-view 16x12
    tomography is genuinely under-determined — descending the photometric
    loss does not descend voxel L2. This test pins what the estimator
    actually guarantees: the gradient of the loss it optimizes.)"""
    n, truth, maj, cams, targets = tomo8
    del targets
    spec = engine.IntegratorSpec(max_bounces=4, sigma_score=True)
    ids = jnp.arange(W * H, dtype=jnp.int32)

    def render(v, key, spp=4):
        sc = _grid_scene(v, maj, n)

        def one(acc, s):
            ks = jax.random.fold_in(key, s)
            o, d = cam_mod.rays_for_pixels(cams[0], W, H, ids, ks, True)
            return acc + engine.trace(sc, spec, o, d, ks,
                                      differentiable=True), None

        acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)), jnp.arange(spp))
        return acc / spp

    mloss = jax.jit(lambda v, k: jnp.mean(render(v, k)))
    gf = jax.jit(jax.grad(mloss))
    init = jnp.asarray(np.full((n, n, n), 0.3, np.float32))
    # pick the largest-|g| voxel from a cheap pre-pass
    g0 = np.asarray(gf(init, jax.random.PRNGKey(7)))
    vox = np.unravel_index(np.argmax(np.abs(g0)), g0.shape)
    h, K = 0.1, 24
    gs, fds = [], []
    for k in range(K):
        ky = jax.random.PRNGKey(1000 + k)
        gs.append(float(gf(init, ky)[vox]))
        vp = init.at[vox].add(h)
        vm = init.at[vox].add(-h)
        fds.append((float(mloss(vp, ky)) - float(mloss(vm, ky))) / (2 * h))
    gm, gse = np.mean(gs), np.std(gs) / np.sqrt(K)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(K)
    tol = 4.0 * np.hypot(gse, fse) + 0.1 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (vox, gm, gse, fm, fse)


@pytest.mark.slow
def test_fit_grid_decreases_loss(tomo8):
    """fit_grid descends its photometric loss in expectation (voxel-L2
    convergence needs a better-posed setup — see the docstring above and
    examples/recover_grid.py for the multi-view demo)."""
    n, truth, maj, cams, targets = tomo8
    init = np.asarray(0.5 * truth)
    scene = _grid_scene(init, maj, n)
    values, losses = fit_grid(scene, cams, targets, steps=30, spp=4,
                              learning_rate=4e-2, max_bounces=4, seed=3)
    assert len(losses) == 30 and np.isfinite(losses).all()
    v = np.asarray(values)
    assert np.isfinite(v).all() and v.min() >= 0.0
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first, f"loss did not decrease: {first:.5f} -> {last:.5f}"


@pytest.mark.slow
def test_fit_grid_polyak_and_schedule(tomo8):
    """Round 5: learning_rate as an optax schedule + polyak_from tail
    averaging. The averaged result must equal the running mean of the
    post-polyak_from projected iterates (replayed with the identical
    seeded step sequence) and stay inside [0, majorant]."""
    import optax

    n, truth, maj, cams, targets = tomo8
    init = np.asarray(0.5 * truth)
    scene = _grid_scene(init, maj, n)
    sched = optax.exponential_decay(4e-2, 12, 0.1)
    avg, losses = fit_grid(scene, cams, targets, steps=12, spp=2,
                           learning_rate=sched, max_bounces=4, seed=3,
                           polyak_from=8)
    last, losses2 = fit_grid(scene, cams, targets, steps=12, spp=2,
                             learning_rate=sched, max_bounces=4, seed=3)
    assert losses == losses2  # identical seeded trajectory
    a = np.asarray(avg)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= maj
    # the tail average is NOT the last iterate (it mixes steps 8..12)
    assert not np.allclose(a, np.asarray(last))


@pytest.mark.slow
def test_grid_train_step_kernel_backend_runs_and_projects():
    """Round 4: the same trainer through the fused diff pair
    (backend="kernel", diff_grid voxel gradients) — interpret mode on the
    tiny config. Pins the A/B wiring, the int-seed path, and the
    majorant projection on the kernel backend."""
    n = 4
    truth = _truth_values(n)
    maj = float(truth.max()) * 1.3
    cams = _cams(2)
    targets = [_render(_grid_scene(truth, maj, n), c,
                       jax.random.PRNGKey(7 + i), spp=2)
               for i, c in enumerate(cams)]
    init = np.full((n, n, n), 0.3, np.float32)
    scene = _grid_scene(init, maj, n)
    opt = optax.adam(5e-2)
    step = make_grid_train_step(scene, cams, W, H, spp=1, optimizer=opt,
                                max_bounces=3, backend="kernel",
                                interpret=True)
    tf = jnp.stack([jnp.asarray(t, jnp.float32).reshape(W * H, 3)
                    for t in targets])
    values = jnp.asarray(init)
    opt_state = opt.init(values)
    for i in range(2):
        values, opt_state, loss = step(values, opt_state, tf, None,
                                       jnp.int32(i))
        assert np.isfinite(float(loss))
    v = np.asarray(values)
    assert np.isfinite(v).all()
    assert v.min() >= 0.0 and v.max() <= maj / 1.001 + 1e-6
    # the step must actually move the voxels (gradients reach the table)
    assert np.abs(v - init).max() > 0
