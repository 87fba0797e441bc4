"""Gradient tests (BASELINE.json config #5): finite-difference validation of
d(image)/d{sigma_a, sigma_s, albedo, light position/power, camera}, and
NaN-freeness across integrators and scenes.

The estimator is differentiated with detached discrete decisions (RR,
surface/medium event, light pick, direction samples) — the same random
numbers are replayed at perturbed parameters, so FD of the *fixed-seed*
estimator is well-defined and must match AD exactly up to FD truncation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpt
from vpt.dist import scene_params, apply_params
from vpt.dist import train as tr
from vpt.integrators import engine
from vpt.scene import camera as cam

SCENE = vpt.cornell_vpt()
CAM = vpt.default_camera()
KEY = jax.random.PRNGKey(11)
IDS = jnp.arange(96, dtype=jnp.int32)
SPEC = engine.IntegratorSpec(max_bounces=6)


def _loss(params, spec=SPEC):
    sc, cm = apply_params(SCENE, CAM, params)
    o, d = cam.rays_for_pixels(cm, 12, 8, IDS, KEY, True)
    L = engine.trace(sc, spec, o, d, KEY, differentiable=True)
    return jnp.mean(L)


# Scene with (almost) no surface events: one area light floating in the
# medium. The sigma chain is then continuous in the parameters — the FD of
# the fixed-seed estimator is free of the surface/medium branch-flip
# boundary terms that the detached-decision AD deliberately drops (see
# engine docstring), so FD must match AD tightly.
MEDIUM_SCENE = vpt.make_scene(
    [(2.0, (0.0, 0.0, -50.0), (0, 0, 0), (60, 50, 40), 0, (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.002, sigma_s=0.015,
)


def _loss_medium(params, spec=SPEC):
    sc, cm = apply_params(MEDIUM_SCENE, CAM, params)
    o, d = cam.rays_for_pixels(cm, 12, 8, IDS, KEY, True)
    L = engine.trace(sc, spec, o, d, KEY, differentiable=True)
    return jnp.mean(L)


@pytest.mark.parametrize("leaf,eps", [
    ("sigma_a", 1e-6),
    ("sigma_s", 1e-6),
    ("cam_fov", 5e-4),   # big enough to rise above f32 loss quantization
])
def test_fd_matches_ad_scalar(leaf, eps):
    params = scene_params(MEDIUM_SCENE, CAM)
    g = jax.grad(_loss_medium)(params)[leaf]
    p_plus = {**params, leaf: params[leaf] + eps}
    p_minus = {**params, leaf: params[leaf] - eps}
    fd = (_loss_medium(p_plus) - _loss_medium(p_minus)) / (2 * eps)
    g, fd = float(g), float(fd)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=5e-2, atol=5e-5), (g, fd)


@pytest.mark.parametrize("leaf,index,eps", [
    ("albedo", (6, 2), 1e-4),        # blue sphere's blue channel
    ("radiance", (9, 0), 1e-2),      # area light power
    ("center", (9, 1), 1e-3),        # light y position
    ("cam_origin", (2,), 1e-4),
])
def test_fd_matches_ad_elementwise(leaf, index, eps):
    params = scene_params(SCENE, CAM)
    g = np.asarray(jax.grad(_loss)(params)[leaf])[index]
    bump = jnp.zeros_like(params[leaf]).at[index].set(eps)
    fd = float((_loss({**params, leaf: params[leaf] + bump})
                - _loss({**params, leaf: params[leaf] - bump})) / (2 * eps))
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=6e-2, atol=1e-4), (g, fd)


@pytest.mark.parametrize("spec", [
    engine.IntegratorSpec(nee=False, max_bounces=5),
    engine.IntegratorSpec(distance=engine.EQUIANGULAR, nee=True, max_bounces=5),
    engine.IntegratorSpec(distance=engine.EQUIANGULAR, nee=False,
                          clamped_ea=True, max_bounces=5),
])
def test_grads_finite_all_volume_specs(spec):
    params = scene_params(SCENE, CAM)
    grads = jax.grad(lambda p: _loss(p, spec))(params)
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"


@pytest.mark.slow
def test_inverse_rendering_recovers_albedo():
    """End-to-end BASELINE.json config #5: gradient descent recovers a
    perturbed surface albedo from a rendered target via the SPMD train step
    (A/B unbiased MSE). Albedo has a clean pathwise gradient; sigma recovery
    additionally needs the surface/medium boundary terms the detached
    estimator drops (see engine docstring) — a documented limitation."""
    import optax
    from vpt.dist import make_mesh, make_train_step

    mesh = make_mesh(jax.devices()[:2], sample_shards=1)
    spec = engine.IntegratorSpec(max_bounces=5)
    W = H = 12
    cfg_target = vpt.RenderConfig(width=W, height=H, spp=64, max_bounces=5,
                                  chunk_pixels=W * H)
    target = vpt.render(SCENE, CAM, cfg_target)

    true_albedo = float(SCENE.albedo[6, 2])          # blue sphere, B channel
    wrong = dataclasses.replace(
        SCENE, albedo=SCENE.albedo.at[6, 2].set(0.2))
    npix = W * H
    pixel_ids = jnp.arange(npix, dtype=jnp.int32)
    target_flat = target.reshape(npix, 3)

    optimizer = optax.adam(2e-2)
    params = scene_params(wrong, CAM)
    frozen = {k: v for k, v in params.items()}
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, spec, W, H, 8, optimizer)
    for i in range(40):
        params, opt_state, loss = step(
            params, opt_state, wrong, CAM, target_flat, pixel_ids,
            jax.random.fold_in(KEY, i))
        params = {**frozen, "albedo": params["albedo"]}
    start_err = abs(0.2 - true_albedo)
    end_err = abs(float(params["albedo"][6, 2]) - true_albedo)
    assert end_err < 0.6 * start_err, (
        f"albedo {float(params['albedo'][6, 2]):.4f} did not move toward "
        f"{true_albedo:.4f}")


def test_sigma_score_value_invariant():
    """sigma_score multiplies contributions by 1 + S - stop_grad(S): the
    VALUE must be bit-identical to the plain estimator."""
    params = scene_params(SCENE, CAM)
    a = float(_loss(params, engine.IntegratorSpec(max_bounces=6)))
    b = float(_loss(params, engine.IntegratorSpec(max_bounces=6,
                                                  sigma_score=True)))
    assert a == b


@pytest.mark.slow
def test_sigma_grad_statistical_fd_cornell():
    """FD check of dL/d sigma_s in a scene WITH surfaces (the Cornell
    scene): the detached estimator drops the surface/medium boundary terms
    (biased), the score estimator keeps them. Compared statistically —
    E[grad] over K seeds vs central FD of the seed-averaged loss with
    common random numbers (per-seed FD is ill-defined: a sigma bump flips
    discrete events)."""
    import dataclasses
    from vpt.scene.scene import Medium

    spec = engine.IntegratorSpec(max_bounces=8, sigma_score=True)
    ids = jnp.arange(1024, dtype=jnp.int32)
    s0 = float(SCENE.medium.sigma_s)

    def loss(sigma_s, key):
        sc = dataclasses.replace(
            SCENE, medium=Medium(SCENE.medium.sigma_a, sigma_s))
        o, d = cam.rays_for_pixels(CAM, 32, 32, ids, key, True)
        return jnp.mean(engine.trace(sc, spec, o, d, key,
                                     differentiable=True))

    gfn = jax.jit(jax.grad(loss))
    lfn = jax.jit(loss)
    K, eps = 150, 2e-3
    gs, fds = [], []
    for i in range(K):
        k = jax.random.PRNGKey(300 + i)
        gs.append(float(gfn(s0, k)))
        fds.append((float(lfn(s0 + eps, k)) - float(lfn(s0 - eps, k)))
                   / (2 * eps))
    g, se_g = np.mean(gs), np.std(gs) / np.sqrt(K)
    fd, se_fd = np.mean(fds), np.std(fds) / np.sqrt(K)
    assert np.isfinite(g) and np.isfinite(fd)
    tol = 4.0 * np.hypot(se_g, se_fd) + 0.05 * abs(fd)
    assert abs(g - fd) < tol, (g, se_g, fd, se_fd)


@pytest.mark.slow
def test_inverse_rendering_recovers_sigma():
    """End-to-end BASELINE.json config #5 flagship: recover the scattering
    coefficient (the reference's whole reason to exist — sigma estimation,
    src/rt.cpp:794) from a rendered target in the CORNELL scene via the SPMD
    train step with score-function sigma gradients (sigma_score=True).
    Decaying LR + Polyak tail-averaging tame the score-estimator noise."""
    import optax
    from vpt.dist import make_mesh, make_train_step

    mesh = make_mesh(jax.devices()[:2], sample_shards=1)
    spec = engine.IntegratorSpec(max_bounces=5, sigma_score=True)
    W = H = 16
    cfg_target = vpt.RenderConfig(width=W, height=H, spp=128, max_bounces=5,
                                  chunk_pixels=W * H)
    target = vpt.render(SCENE, CAM, cfg_target)

    true_ss = float(SCENE.medium.sigma_s)        # 0.009
    start = 0.025                                # ~3x too high
    npix = W * H
    pixel_ids = jnp.arange(npix, dtype=jnp.int32)
    target_flat = jnp.asarray(np.asarray(target).reshape(npix, 3))

    optimizer = optax.adam(optax.exponential_decay(1.5e-3, 10, 0.8))
    params = scene_params(SCENE, CAM)
    params["sigma_s"] = jnp.asarray(start, jnp.float32)
    frozen = dict(params)
    opt_state = optimizer.init(params)
    step = make_train_step(mesh, spec, W, H, 32, optimizer)
    hist = []
    for i in range(120):
        params, opt_state, _ = step(
            params, opt_state, SCENE, CAM, target_flat, pixel_ids,
            jax.random.fold_in(KEY, i))
        params = {**frozen,
                  "sigma_s": jnp.clip(params["sigma_s"], 1e-4, 0.2)}
        hist.append(float(params["sigma_s"]))
    recovered = float(np.mean(hist[-20:]))
    start_err = abs(start - true_ss)
    end_err = abs(recovered - true_ss)
    assert end_err < 0.4 * start_err, (
        f"sigma_s {recovered:.5f} did not recover toward {true_ss:.5f} "
        f"(start err {start_err:.5f}, end err {end_err:.5f})")


def test_differentiable_persistent_matches_while_loop():
    """The fixed-iteration differentiable persistent renderer is the same
    estimator as the while_loop one (identical RNG streams when the
    iteration budget covers the tail), and is reverse-differentiable."""
    from vpt.scene import camera as cam2

    spec = engine.IntegratorSpec(max_bounces=10)
    pix = jnp.arange(96, dtype=jnp.int32)
    key = jax.random.PRNGKey(2)
    a = engine.render_persistent(SCENE, spec, CAM, 12, 8, pix, 8, key,
                                 differentiable=True)
    b = engine.render_persistent(SCENE, spec, CAM, 12, 8, pix, 8, key)
    assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def loss(albedo):
        sc = dataclasses.replace(SCENE, albedo=albedo)
        L = engine.render_persistent(sc, spec, CAM, 12, 8, pix, 4, key,
                                     differentiable=True)
        return jnp.mean(L)

    g = np.asarray(jax.grad(loss)(SCENE.albedo))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
