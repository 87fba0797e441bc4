"""Geometric-gradient fused kernel (kernels/geom.py): forward-mode dual
tangents for light position / camera origin / fov, in interpret mode.

Contracts:
  1. the primal plane reproduces the baked forward kernel at the scene's own
     geometry (same PCG draw order as kernels/diff.py — both mirror the
     fused wavefront kernel);
  2. tangents are the fixed-seed directional derivatives of the kernel's own
     primal: central finite differences at the SAME seed match (detached
     events replay identically for small bumps; tolerance covers the rare
     event flip at these sizes);
  3. tangents statistically match the XLA engine's AD gradients for the
     same estimator (different RNG backends — compared in expectation).

Interpret-mode compiles here cost minutes of XLA-CPU time each (the dual
body is ~K+1 forward kernels fused); configs are kept tiny and split into a
sphere-block renderer (K=3) and a camera-block renderer (K=4) so the
persistent compile cache amortizes them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpt
from vpt.dist import apply_params, scene_params
from vpt.integrators import engine
from vpt.kernels.geom import make_geom_renderer, pack_theta
from vpt.kernels.wavefront import build_tile_renderer
from vpt.scene import camera as cam

SCENE = vpt.cornell_vpt()
CAM = vpt.default_camera()
W, H, SPP, MB = 12, 8, 2, 5
LIGHT = 9          # the (75,75,60) area light of Sphere.cpp:22
SEED = jnp.asarray(3)
THETA = pack_theta(SCENE, CAM, LIGHT)


@pytest.fixture(scope="module")
def render_light():
    """K=3: the light sphere's center block only."""
    return make_geom_renderer(SCENE, CAM, W, H, SPP, sphere=LIGHT,
                              cam_grads=False, max_bounces=MB, tile_rows=8,
                              interpret=True)


# Scene with (almost) no geometric discontinuities: one emitter sphere in
# the medium (mirrors tests/test_grad.py's MEDIUM_SCENE). Camera motion in
# the Cornell scene sweeps every silhouette across pixels, so fixed-seed FD
# is dominated by the boundary terms the detached-decision estimator drops
# BY DESIGN (the engine's own AD-vs-FD fails identically there — FD is not
# even sign-stable in eps). Here the only discrete boundary is one small
# sphere, and FD must match the tangents.
MEDIUM_SCENE = vpt.make_scene(
    [(2.0, (0.0, 0.0, -50.0), (0, 0, 0), (60, 50, 40), 0, (0, 0, 0),
      (0, 0, 0), 0.0)],
    sigma_a=0.002, sigma_s=0.015,
)


@pytest.fixture(scope="module")
def render_cam():
    """K=4: camera origin + fov block only, boundary-free medium scene."""
    return make_geom_renderer(MEDIUM_SCENE, CAM, W, H, SPP, sphere=None,
                              cam_grads=True, max_bounces=MB, tile_rows=8,
                              interpret=True)


def test_primal_matches_baked_kernel(render_light):
    img, tang = render_light(THETA, SEED)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert np.isfinite(np.asarray(tang)).all()
    assert tang.shape == (3, W * H, 3)
    run_ref = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=MB,
                                  tile_rows=8, interpret=True)
    ref = np.asarray(run_ref(3))
    # in-kernel f32 camera basis vs the baked kernel's float64-precomputed
    # one: directions differ at ~1e-7, so a handful of pixels may flip a
    # discrete event — compare the bulk, not the max
    rel = np.abs(img - ref) / max(1.0, np.abs(ref).max())
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)


def _fd(render, theta, block, index, eps, k):
    def bump(e):
        th = dict(theta)
        if index is None:
            th[block] = theta[block] + e
        else:
            th[block] = theta[block].at[index].set(theta[block][index] + e)
        return float(jnp.mean(render(th, SEED)[0]))

    img, tang = render(theta, SEED)
    g = float(jnp.mean(tang[k]))
    fd = (bump(eps) - bump(-eps)) / (2 * eps)
    return g, fd


def test_tangent_matches_fixed_seed_fd_light_y(render_light):
    g, fd = _fd(render_light, THETA, "center", 1, 1e-2, 1)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=8e-2, atol=1e-6), (g, fd)


@pytest.mark.parametrize("k,block,index,eps", [
    (1, "cam_origin", 1, 1e-2),
    (3, "fov", None, 1e-4),
])
def test_tangent_matches_fixed_seed_fd_camera(render_cam, k, block, index,
                                              eps):
    theta_m = pack_theta(MEDIUM_SCENE, CAM, None)
    g, fd = _fd(render_cam, theta_m, block, index, eps, k)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=8e-2, atol=1e-6), (g, fd)


@pytest.fixture(scope="module")
def render_dir():
    """K=3: camera LOOK-DIRECTION block only (round 4), boundary-free
    medium scene."""
    return make_geom_renderer(MEDIUM_SCENE, CAM, W, H, SPP, sphere=None,
                              cam_grads=False, dir_grads=True,
                              max_bounces=MB, tile_rows=8, interpret=True)


@pytest.mark.parametrize("k,index,eps", [(0, 0, 2e-3), (1, 1, 2e-3)])
def test_tangent_matches_fixed_seed_fd_cam_dir(render_dir, k, index, eps):
    """Round 4: look-direction tangents (theta[\"cam_dir\"], dims 9-11)
    are the fixed-seed directional derivatives of the kernel's own
    primal — the dual chain through cy = normalize(cx x d) and the ray
    sum matches CRN central FD on the raw direction components."""
    theta_m = pack_theta(MEDIUM_SCENE, CAM, None)
    g, fd = _fd(render_dir, theta_m, "cam_dir", index, eps, k)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=8e-2, atol=1e-6), (g, fd)


def test_dir_grad_render_contracts_tangents(render_dir):
    """grad_render routes the cam_dir block; disabled blocks stay zero."""
    theta_m = pack_theta(MEDIUM_SCENE, CAM, None)
    g = jax.grad(
        lambda th: jnp.mean(render_dir.grad_render(th, SEED)))(theta_m)
    img, tang = render_dir(theta_m, SEED)
    want = np.asarray(jnp.sum(tang, axis=(1, 2)) / (3.0 * W * H))
    assert np.allclose(np.asarray(g["cam_dir"]), want, rtol=1e-5,
                       atol=1e-8), (g["cam_dir"], want)
    assert np.all(np.asarray(g["cam_origin"]) == 0.0)
    assert float(g["fov"]) == 0.0


def test_grad_render_contracts_tangents(render_light):
    """grad_render's custom VJP = tangent contraction with the cotangent."""
    g = jax.grad(
        lambda th: jnp.mean(render_light.grad_render(th, SEED)))(THETA)
    img, tang = render_light(THETA, SEED)
    want = np.asarray(jnp.sum(tang, axis=(1, 2)) / (3.0 * W * H))
    assert np.allclose(np.asarray(g["center"]), want, rtol=1e-5,
                       atol=1e-8), (g["center"], want)
    assert np.all(np.asarray(g["cam_origin"]) == 0.0)
    assert float(g["fov"]) == 0.0


@pytest.mark.slow
def test_tangents_match_engine_ad_statistically(render_light):
    """E[dL/d(light y)] agrees between the dual kernel and the XLA engine's
    detached-decision AD within combined standard error."""
    spec = engine.IntegratorSpec(max_bounces=MB)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    params0 = scene_params(SCENE, CAM)

    def eng_loss(params, key):
        sc, cm = apply_params(SCENE, CAM, params)
        o, d = cam.rays_for_pixels(cm, W, H, ids, key, True)
        L = engine.trace(sc, spec, o, d, key, differentiable=True)
        return jnp.mean(L)

    eng_grad = jax.jit(jax.grad(eng_loss))
    kf = jax.jit(lambda th, s: jnp.mean(render_light(th, s)[1], axis=(1, 2)))

    K = 12
    eng_ly, ker_ly = [], []
    for i in range(K):
        g = eng_grad(params0, jax.random.PRNGKey(500 + i))
        eng_ly.append(float(g["center"][LIGHT, 1]))
        ker_ly.append(float(np.asarray(kf(THETA, jnp.asarray(900 + i)))[1]))

    e, se_e = np.mean(eng_ly), np.std(eng_ly) / np.sqrt(K)
    m, se_m = np.mean(ker_ly), np.std(ker_ly) / np.sqrt(K)
    tol = 4.0 * np.hypot(se_e, se_m) + 0.1 * abs(e)
    assert abs(e - m) < tol, (e, se_e, m, se_m)


@pytest.mark.slow
def test_camera_tangents_match_engine_ad_statistically(render_cam):
    """E[dL/d cam_origin.y] and E[dL/d fov] agree between the dual kernel
    and the engine's AD in the medium scene."""
    spec = engine.IntegratorSpec(max_bounces=MB)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    params0 = scene_params(MEDIUM_SCENE, CAM)
    theta_m = pack_theta(MEDIUM_SCENE, CAM, None)

    def eng_loss(params, key):
        sc, cm = apply_params(MEDIUM_SCENE, CAM, params)
        o, d = cam.rays_for_pixels(cm, W, H, ids, key, True)
        L = engine.trace(sc, spec, o, d, key, differentiable=True)
        return jnp.mean(L)

    eng_grad = jax.jit(jax.grad(eng_loss))
    kf = jax.jit(lambda th, s: jnp.mean(render_cam(th, s)[1], axis=(1, 2)))

    K = 16
    eng_cy, eng_fv, ker_cy, ker_fv = [], [], [], []
    for i in range(K):
        g = eng_grad(params0, jax.random.PRNGKey(700 + i))
        eng_cy.append(float(g["cam_origin"][1]))
        eng_fv.append(float(g["cam_fov"]))
        t = np.asarray(kf(theta_m, jnp.asarray(1300 + i)))
        ker_cy.append(float(t[1]))
        ker_fv.append(float(t[3]))

    for ev, kv, name in [(eng_cy, ker_cy, "cam.y"), (eng_fv, ker_fv, "fov")]:
        e, se_e = np.mean(ev), np.std(ev) / np.sqrt(K)
        m, se_m = np.mean(kv), np.std(kv) / np.sqrt(K)
        tol = 4.0 * np.hypot(se_e, se_m) + 0.1 * abs(e)
        assert abs(e - m) < tol, (name, e, se_e, m, se_m)


@pytest.mark.slow
def test_geom_train_step_moves_light():
    """One A/B-loss gradient step on a perturbed light position moves the
    light parameter and leaves the frozen camera block untouched."""
    import optax

    from vpt.dist import make_geom_train_step

    target = np.asarray(
        build_tile_renderer(SCENE, CAM, W, H, 8, max_bounces=MB,
                            tile_rows=8, interpret=True)(17))
    optimizer = optax.adam(0.5)
    step = make_geom_train_step(SCENE, CAM, W, H, 4, optimizer,
                                sphere=LIGHT, cam_grads=False,
                                max_bounces=MB, tile_rows=8, interpret=True)
    theta = dict(THETA)
    theta["center"] = THETA["center"] + jnp.asarray([0.0, 8.0, 0.0])
    opt_state = optimizer.init(theta)
    theta2, opt_state, loss = step(theta, opt_state,
                                   jnp.asarray(target), jnp.int32(5))
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(theta2["center"]),
                           np.asarray(theta["center"]))
    assert np.allclose(np.asarray(theta2["cam_origin"]),
                       np.asarray(theta["cam_origin"]))


@pytest.fixture(scope="module")
def render_primal_only():
    """K=0: theta traced from SMEM but every tangent plane dropped."""
    return make_geom_renderer(SCENE, CAM, W, H, SPP, sphere=LIGHT,
                              cam_grads=False, max_bounces=MB, tile_rows=8,
                              primal_only=True, interpret=True)


def test_primal_only_matches_dual_primal(render_primal_only, render_light):
    """primal_only=True must render the SAME estimator as the dual kernel's
    primal plane (identical PCG draws; only the dual arithmetic's division
    reassociation — x*(1/y) vs x/y — may flip a rare discrete event)."""
    img_p, tang_p = render_primal_only(THETA, SEED)
    img_d, _ = render_light(THETA, SEED)
    assert tang_p.shape == (0, W * H, 3)
    rel = np.abs(np.asarray(img_p) - np.asarray(img_d))
    rel /= max(1.0, float(np.abs(np.asarray(img_d)).max()))
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)


@pytest.mark.slow
def test_fd_geom_train_step_moves_light_only():
    """CRN central-difference step (boundary-aware): moves the enabled
    center block, leaves the frozen camera block untouched, finite loss."""
    import optax

    from vpt.dist import make_fd_geom_train_step

    target = np.asarray(
        build_tile_renderer(SCENE, CAM, W, H, 8, max_bounces=MB,
                            tile_rows=8, interpret=True)(17))
    optimizer = optax.adam(0.5)
    step = make_fd_geom_train_step(SCENE, CAM, W, H, 4, optimizer,
                                   sphere=LIGHT, cam_grads=False,
                                   max_bounces=MB, tile_rows=8,
                                   interpret=True)
    theta = dict(THETA)
    theta["center"] = THETA["center"] + jnp.asarray([0.0, 8.0, 0.0])
    opt_state = optimizer.init(theta)
    theta2, opt_state, loss = step(theta, opt_state, jnp.asarray(target),
                                   jnp.int32(5))
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(theta2["center"]),
                           np.asarray(theta["center"]))
    assert np.allclose(np.asarray(theta2["cam_origin"]),
                       np.asarray(theta["cam_origin"]))


def test_geom_ld_sampler_deterministic_and_finite(render_primal_only):
    """sampler='ld' on the geom kernel (FD substrate): deterministic per
    seed, seed-sensitive, finite, and statistically consistent with the
    PCG sampler (same CP-rotation unbiasedness as the other kernels)."""
    r = make_geom_renderer(SCENE, CAM, W, H, SPP, sphere=LIGHT,
                           cam_grads=False, max_bounces=MB, tile_rows=8,
                           sampler="ld", primal_only=True, interpret=True)
    a = np.asarray(r(THETA, SEED)[0])
    assert np.array_equal(a, np.asarray(r(THETA, SEED)[0]))
    assert not np.array_equal(a, np.asarray(r(THETA, jnp.asarray(4))[0]))
    assert np.isfinite(a).all() and (a >= 0).all()
    lm = [float(np.clip(np.asarray(r(THETA, jnp.asarray(s))[0]), 0, 1).mean())
          for s in range(6)]
    rm = [float(np.clip(np.asarray(
        render_primal_only(THETA, jnp.asarray(s))[0]), 0, 1).mean())
        for s in range(6)]
    ml, mr = np.mean(lm), np.mean(rm)
    se = np.hypot(np.std(lm), np.std(rm)) / np.sqrt(6)
    assert abs(ml - mr) < 4.0 * se + 0.05 * mr, (ml, mr, se)


@pytest.mark.slow
def test_fd_sigma_step_joint_kernel():
    """sigma=True FD step on the theta-traced kernel: the sigma block gets
    a nonzero CRN-FD gradient (Adam moves it), the frozen geometric blocks
    stay untouched, and the projection keeps the medium physical. (The
    descent DIRECTION is asserted by the on-chip study in BASELINE.md —
    one FD step at 12x8 @ 2spp is deterministic but sign-noisy.)"""
    import optax

    from vpt.dist import make_fd_geom_train_step

    target, _ = make_geom_renderer(
        SCENE, CAM, W, H, 4, sphere=LIGHT, cam_grads=False, max_bounces=MB,
        tile_rows=8, primal_only=True, interpret=True,
    )(THETA, jnp.int32(3))
    optimizer = optax.adam(1e-3)
    step = make_fd_geom_train_step(SCENE, CAM, W, H, 4, optimizer,
                                   sphere=None, cam_grads=False, sigma=True,
                                   max_bounces=MB, tile_rows=8,
                                   interpret=True)
    theta = dict(pack_theta(SCENE, CAM, None))
    theta["sigma_s"] = theta["sigma_s"] * 2.5
    opt_state = optimizer.init(theta)
    theta2, _, loss = step(theta, opt_state, jnp.asarray(np.asarray(target)),
                           jnp.int32(5))
    assert np.isfinite(float(loss))
    assert float(theta2["sigma_s"]) != float(theta["sigma_s"])
    assert float(theta2["sigma_a"]) != float(theta["sigma_a"])
    assert float(theta2["sigma_s"]) >= 1e-6
    assert float(theta2["sigma_a"]) >= 1e-6
    assert np.allclose(np.asarray(theta2["center"]),
                       np.asarray(theta["center"]))
    assert np.allclose(np.asarray(theta2["cam_origin"]),
                       np.asarray(theta["cam_origin"]))


@pytest.mark.slow
def test_equiangular_family_finite():
    r = make_geom_renderer(SCENE, CAM, 8, 8, 2, sphere=LIGHT,
                           cam_grads=False, distance="equiangular",
                           max_bounces=4, tile_rows=8, interpret=True)
    img, tang = r(THETA, SEED)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(tang)).all()
    assert float(np.abs(np.asarray(tang)).max()) > 0.0


# ---------------- Henyey-Greenstein anisotropy (g != 0) --------------------
# The dual kernel carries the HG phase value toward the theta-dependent
# light direction (kernels/dual.hg_phase) and rotates the HG scatter frame
# with the dual propagation direction (dual.hg_dir) — round 3; previously
# the geom kernel was isotropic-only and raised.

import dataclasses as _dc

ANISO_SCENE = _dc.replace(
    SCENE, medium=_dc.replace(SCENE.medium, g=0.7))
ANISO_MEDIUM_SCENE = _dc.replace(
    MEDIUM_SCENE, medium=_dc.replace(MEDIUM_SCENE.medium, g=0.6))


@pytest.mark.slow  # ~400s interpret compile; the grid + light-block
# primal parity gates stay in the fast tier
def test_hg_primal_matches_baked_kernel():
    r = make_geom_renderer(ANISO_SCENE, CAM, W, H, SPP, sphere=LIGHT,
                           cam_grads=False, max_bounces=MB, tile_rows=8,
                           interpret=True)
    img, tang = r(pack_theta(ANISO_SCENE, CAM, LIGHT), SEED)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert np.isfinite(np.asarray(tang)).all()
    run_ref = build_tile_renderer(ANISO_SCENE, CAM, W, H, SPP,
                                  max_bounces=MB, tile_rows=8,
                                  interpret=True)
    ref = np.asarray(run_ref(3))
    rel = np.abs(img - ref) / max(1.0, np.abs(ref).max())
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)


def test_hg_tangent_matches_fixed_seed_fd_light_y():
    """Boundary-free anisotropic medium scene: the HG phase toward the
    moving light center is a smooth chain, so fixed-seed FD must match
    the dual tangent (the detached local scatter angles cancel under CRN)."""
    r = make_geom_renderer(ANISO_MEDIUM_SCENE, CAM, W, H, SPP, sphere=0,
                           cam_grads=False, max_bounces=MB, tile_rows=8,
                           interpret=True)
    th = pack_theta(ANISO_MEDIUM_SCENE, CAM, 0)
    g, fd = _fd(r, th, "center", 1, 1e-2, 1)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=8e-2, atol=1e-6), (g, fd)


# ---------------- heterogeneous media (free-flight family) -----------------
# Round 3: dual.field_tau / field_sample_free carry geometry tangents
# through the analytic fields (exp_height reparameterized inversion; blobs
# delta tracking detached). Previously the geom kernel raised on
# Medium.density.

from vpt.scene.scene import blob_cloud, foggy_cornell

from vpt.media.density import exp_height as _exp_height

FOG_MEDIUM_SCENE = _dc.replace(
    MEDIUM_SCENE, medium=_dc.replace(
        MEDIUM_SCENE.medium,
        density=_exp_height(k=0.03, y0=-30.0, majorant=2.5)))


@pytest.mark.parametrize("mk,distance", [
    (foggy_cornell, "free"), (blob_cloud, "free"),
    (foggy_cornell, "equiangular"),     # round 3: hetero EA duals
])
@pytest.mark.slow  # ~300s each; hetero primal parity also covered by
# the (faster) tangent/FD gates and the grid parity test
def test_hetero_primal_matches_baked_kernel(mk, distance):
    sc_h = mk()
    r = make_geom_renderer(sc_h, CAM, W, H, SPP, sphere=LIGHT if mk is
                           foggy_cornell else 2, cam_grads=False,
                           distance=distance,
                           max_bounces=MB, tile_rows=8, interpret=True)
    th = pack_theta(sc_h, CAM, LIGHT if mk is foggy_cornell else 2)
    img, tang = r(th, SEED)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert np.isfinite(np.asarray(tang)).all()
    run_ref = build_tile_renderer(sc_h, CAM, W, H, SPP, max_bounces=MB,
                                  distance=distance,
                                  tile_rows=8, interpret=True)
    ref = np.asarray(run_ref(3))
    rel = np.abs(img - ref) / max(1.0, np.abs(ref).max())
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)


def test_hetero_tangent_matches_fixed_seed_fd_light_y():
    """Boundary-free foggy medium scene (exp_height): the light's motion
    changes the heterogeneous optical depth toward it smoothly, and the
    analytic free-flight inversion reparameterizes — fixed-seed FD must
    match the dual tangent."""
    r = make_geom_renderer(FOG_MEDIUM_SCENE, CAM, W, H, SPP, sphere=0,
                           cam_grads=False, max_bounces=MB, tile_rows=8,
                           interpret=True)
    th = pack_theta(FOG_MEDIUM_SCENE, CAM, 0)
    g, fd = _fd(r, th, "center", 1, 1e-2, 1)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=8e-2, atol=1e-6), (g, fd)
