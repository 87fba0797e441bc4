"""Closed-form "white furnace" validation (no reference counterpart — the
reference validates visually, SURVEY.md §4; these tests validate the whole
integrator pipeline against analytic RTE solutions).

Scene A (absorbing shell): the camera sits at the exact center of an
emitting sphere of radius R with sigma_s = 0, sigma_a = a. Every camera
ray's hit distance is exactly R, so the physical answer for every pixel is
Le * exp(-a*R) in closed form.

Scene B (conservative-scattering furnace): sigma_a = 0, sigma_s > 0 inside
an emitting enclosure. L(x, w) = Le solves the RTE exactly (the boundary
radiates Le isotropically and conservative isotropic scattering preserves a
uniform field), so every pixel is exactly Le through ANY number of medium
scatters.

The reference's own estimators carry two quirks that show up against these
closed forms (documented on IntegratorSpec.physical, engine.py):
 1. terminal-RR factor: every emitter-hit credit is scaled by one
    uncompensated continue_prob (vptShadeMethods.h:951-953 + 981-983,
    1282 + 1308-1313) — the image of a directly-visible emitter is cp-dark;
 2. the implicit free-flight medium weight divides by (1 - TrActual)
    although the medium event is decided by the SAME exponential draw
    (vptShadeMethods.h:977, 1006), so in enclosed scattering scenes the
    estimator's expectation grows with max_bounces.
The quirk modes pin those factors; the `*_physical` variants must match the
closed forms exactly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import vpt
from vpt.core import vecmath as vm
from vpt.scene.camera import Camera

R = 50.0
CAM = Camera(origin=jnp.zeros(3, jnp.float32),
             direction=vm.normalize(jnp.asarray([0.0, 0.0, -1.0], jnp.float32)),
             fov_scale=jnp.asarray(0.5095, jnp.float32))

SIGMA_A = 0.01                      # sigma_a * R = 0.5
LE_A = (2.0, 1.0, 0.5)
SHELL_ABS = vpt.make_scene(
    [(R, (0.0, 0.0, 0.0), (0, 0, 0), LE_A, 0, (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=SIGMA_A, sigma_s=0.0,
)
WANT_A = np.asarray(LE_A) * np.exp(-SIGMA_A * R)

LE_B = (0.5, 1.0, 1.5)
SHELL_SCAT = vpt.make_scene(     # sigma_s * R = 1: substantial multi-scatter
    [(R, (0.0, 0.0, 0.0), (0.3, 0.3, 0.3), LE_B, 0, (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.0, sigma_s=0.02,
)


def _render(scene, integrator, cp, spp=256, max_bounces=8, seed=0):
    cfg = vpt.RenderConfig(width=16, height=12, spp=spp, integrator=integrator,
                           max_bounces=max_bounces, continue_prob=cp,
                           chunk_pixels=192 * 8, renderer="scan", seed=seed)
    return np.asarray(vpt.render(scene, CAM, cfg))


def test_absorbing_shell_closed_form():
    """At cp=1 (no RR) the faithful implicit estimator IS the textbook one
    for a non-scattering medium: pixel = Le * exp(-sigma_a * R)."""
    img = _render(SHELL_ABS, "implicit_free", cp=1.0)
    ratio = img.reshape(-1, 3).mean(0) / WANT_A
    np.testing.assert_allclose(ratio, 1.0, rtol=0.02)
    # per-pixel: Bernoulli(exp(-a R)) noise only
    assert np.abs(img / WANT_A - 1.0).max() < 0.4


def test_terminal_rr_quirk_is_exactly_cp():
    """Reference quirk 1: at cp<1 every emitter-hit credit pays one
    uncompensated RR survival, so the whole implicit image (and the
    directly-visible emitter in the explicit image) is cp-dark."""
    for name in ("implicit_free", "explicit_free"):
        img = _render(SHELL_ABS, name, cp=0.6)
        ratio = img.reshape(-1, 3).mean(0) / WANT_A
        np.testing.assert_allclose(ratio, 0.6, rtol=0.05, err_msg=name)


def test_physical_mode_restores_closed_form():
    for name in ("implicit_free_physical", "explicit_free_physical"):
        img = _render(SHELL_ABS, name, cp=0.6)
        ratio = img.reshape(-1, 3).mean(0) / WANT_A
        np.testing.assert_allclose(ratio, 1.0, rtol=0.05, err_msg=name)


def test_scattering_furnace_equilibrium_exact():
    """sigma_a=0, cp=1: the physical implicit estimator's weights are all
    exactly 1 (albedo_ratio = 1, no RR), every path terminates on the
    enclosure, and each pixel equals Le to float32 round-off — the
    strongest wiring test in the suite: any stray weight factor anywhere in
    the engine's medium path breaks it."""
    img = _render(SHELL_SCAT, "implicit_free_physical", cp=1.0,
                  spp=64, max_bounces=64)
    np.testing.assert_allclose(img, np.broadcast_to(LE_B, img.shape),
                               rtol=1e-5)


def test_scattering_furnace_equilibrium_with_rr():
    """cp<1 makes the estimator stochastic ((1/cp)^k weights against cp^k
    survival); expectation must stay exactly Le through the RR machinery."""
    img = _render(SHELL_SCAT, "implicit_free_physical", cp=0.9,
                  spp=512, max_bounces=64)
    ratio = img.reshape(-1, 3).mean(0) / np.asarray(LE_B)
    np.testing.assert_allclose(ratio, 1.0, rtol=0.05)


def test_reference_implicit_free_diverges_in_enclosed_scattering():
    """Reference quirk 2 pinned: the faithful implicit free-flight weight
    double-counts (1 - TrActual), so in an enclosed scattering scene its
    expectation GROWS with max_bounces instead of converging to Le."""
    lo = _render(SHELL_SCAT, "implicit_free", cp=1.0, spp=256, max_bounces=8)
    hi = _render(SHELL_SCAT, "implicit_free", cp=1.0, spp=256, max_bounces=48)
    r_lo = lo.mean() / np.asarray(LE_B).mean()
    r_hi = hi.mean() / np.asarray(LE_B).mean()
    assert r_lo > 1.5, r_lo                     # already hot at 8 bounces
    assert r_hi > r_lo * 1.5, (r_lo, r_hi)      # and grows with the bound


def test_equiangular_absorbing_shell_closed_form():
    """EA family against a per-pixel closed form: camera OFF-center inside
    the absorbing shell, so every pixel ray's hit distance
    t(d) = -(o.d) + sqrt((o.d)^2 + R^2 - |o|^2) and the physical answer is
    Le * exp(-sigma_a * t(d)) per pixel. Exercises equi-angular distance
    sampling, the surface/medium Bernoulli (engine EQUIANGULAR branch) and
    the pdf_success wiring — none of which the on-axis tests touch."""
    from vpt.scene import camera as cam_mod
    import jax

    W, H, SPP = 16, 12, 256
    origin = np.array([0.3 * R, 0.1 * R, 0.2 * R], np.float32)
    look = np.asarray([-0.1, 0.05, -1.0], np.float32)
    cam = Camera(origin=jnp.asarray(origin),
                 direction=vm.normalize(jnp.asarray(look)),
                 fov_scale=jnp.asarray(0.5095, jnp.float32))
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="implicit_equiangular", max_bounces=8,
                           continue_prob=1.0, chunk_pixels=W * H,
                           renderer="scan", jitter=False)
    img = np.asarray(vpt.render(SHELL_ABS, cam, cfg)).reshape(-1, 3)

    ids = jnp.arange(W * H, dtype=jnp.int32)
    o, d = cam_mod.rays_for_pixels(cam, W, H, ids, jax.random.PRNGKey(0),
                                   jitter=False)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    od = (o * d).sum(-1)
    t = -od + np.sqrt(od ** 2 + R ** 2 - (o * o).sum(-1))
    want = np.asarray(LE_A)[None, :] * np.exp(-SIGMA_A * t)[:, None]

    ratio = (img / want).mean(0)
    np.testing.assert_allclose(ratio, 1.0, rtol=0.03)
    # per-pixel: Bernoulli(exp(-a t)) noise only
    assert np.abs(img / want - 1.0).max() < 0.45

    # the physical variant restores the closed form at cp<1 too (EA's
    # medium weight is already correct; only the credit needed 1/cp)
    cfg_p = vpt.RenderConfig(width=W, height=H, spp=SPP,
                             integrator="implicit_equiangular_physical",
                             max_bounces=8, continue_prob=0.6,
                             chunk_pixels=W * H, renderer="scan",
                             jitter=False)
    img_p = np.asarray(vpt.render(SHELL_ABS, cam, cfg_p)).reshape(-1, 3)
    np.testing.assert_allclose((img_p / want).mean(0), 1.0, rtol=0.04)


@pytest.mark.slow
def test_fused_kernel_absorbing_shell_closed_form():
    """The fused Pallas kernel (implicit free, cp=1) against the analytic
    answer — ground-truth validation, not just engine agreement."""
    from vpt.kernels.wavefront import build_tile_renderer

    W = H = 16
    run = build_tile_renderer(SHELL_ABS, CAM, W, H, 128, nee=False,
                              max_bounces=8, continue_prob=1.0,
                              tile_rows=2, interpret=True)
    # implicit: the depth-0 emitter hit is the only nonzero credit
    # (sigma_s = 0 zeroes every medium continuation)
    img = np.asarray(run(0)).reshape(H, W, 3)
    ratio = img.reshape(-1, 3).mean(0) / WANT_A
    np.testing.assert_allclose(ratio, 1.0, rtol=0.03)


@pytest.mark.slow
def test_fused_kernel_equiangular_closed_form():
    """The kernel's clamped-EA branch (implicit_equiangular) against the
    off-center per-pixel closed form: with sigma_s = 0 only the
    surface-event Bernoulli credit survives, whose expectation is
    Le * exp(-sigma_a * t(d)) regardless of the EA distance pdf."""
    import jax
    from vpt.kernels.wavefront import build_tile_renderer
    from vpt.scene import camera as cam_mod

    W = H = 16
    origin = np.array([0.3 * R, 0.1 * R, 0.2 * R], np.float32)
    look = np.asarray([-0.1, 0.05, -1.0], np.float32)
    cam = Camera(origin=jnp.asarray(origin),
                 direction=vm.normalize(jnp.asarray(look)),
                 fov_scale=jnp.asarray(0.5095, jnp.float32))
    run = build_tile_renderer(SHELL_ABS, cam, W, H, 192, nee=False,
                              distance="ea_clamped", max_bounces=8,
                              continue_prob=1.0, tile_rows=2, jitter=False,
                              interpret=True)
    img = np.asarray(run(0)).reshape(-1, 3)

    ids = jnp.arange(W * H, dtype=jnp.int32)
    o, d = cam_mod.rays_for_pixels(cam, W, H, ids, jax.random.PRNGKey(0),
                                   jitter=False)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    od = (o * d).sum(-1)
    t = -od + np.sqrt(od ** 2 + R ** 2 - (o * o).sum(-1))
    want = np.asarray(LE_A)[None, :] * np.exp(-SIGMA_A * t)[:, None]
    ratio = (img / want).mean(0)
    np.testing.assert_allclose(ratio, 1.0, rtol=0.04)


@pytest.mark.slow
def test_diff_kernel_physical_mode():
    """physical=True in the differentiable kernel pair: the forward matches
    the closed form at cp<1, and the hand-accumulated radiance gradient
    stays exact per-seed (img is linear in Le through the credit path, so
    d mean(img) / d Le_c == mean(img[:, c]) / Le_c / 3 for the same seed)."""
    import jax
    from vpt.kernels.diff import make_diff_renderer, pack_params

    W = H = 16
    render = make_diff_renderer(SHELL_ABS, CAM, W, H, 128, nee=False,
                                max_bounces=8, continue_prob=0.6,
                                physical=True, tile_rows=2, interpret=True)
    params = pack_params(SHELL_ABS)
    img = np.asarray(render(params, 5))
    ratio = img.mean(0) / WANT_A
    np.testing.assert_allclose(ratio, 1.0, rtol=0.05)

    g = jax.grad(lambda p: jnp.mean(render(p, 5)))(params)
    g_rad = np.asarray(g["radiance"])[0]
    want_g = img.mean(0) / np.asarray(LE_A) / 3.0
    np.testing.assert_allclose(g_rad, want_g, rtol=1e-4)


@pytest.mark.slow
def test_fused_kernel_physical_mode_at_rr():
    """physical=True in the kernel: the credit's 1/cp compensation must
    cancel the cp<1 terminal-RR factor back to the closed form."""
    from vpt.kernels.wavefront import build_tile_renderer

    W = H = 16
    run = build_tile_renderer(SHELL_ABS, CAM, W, H, 192, nee=False,
                              max_bounces=8, continue_prob=0.6,
                              physical=True, tile_rows=2, interpret=True)
    img = np.asarray(run(0)).reshape(H, W, 3)
    ratio = img.reshape(-1, 3).mean(0) / WANT_A
    np.testing.assert_allclose(ratio, 1.0, rtol=0.05)
