"""Heterogeneous-media tests: density fields, closed-form optical depths,
analytic/delta distance sampling, and (added with the integrator work)
engine + kernel renders.

The homogeneous reference has no counterpart for any of this
(volumetricBasicFunctions.h:14-21 is constant-sigma Beer-Lambert); the
contracts tested here are mathematical: quadrature agreement, survival-law
agreement, and the homogeneous limit reducing to the reference formulas.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt.media import density as df


def _rand_rays(n, rs):
    o = jnp.asarray(rs.uniform(-30, 30, (n, 3)))
    d = jnp.asarray(rs.normal(size=(n, 3)))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.asarray(rs.uniform(0.5, 120.0, (n,)))
    return o, d, t


FIELDS = {
    "exp_height": df.exp_height(k=0.06, y0=-40.8, majorant=1.2),
    "blobs": df.blobs([(-18.0, 4.0, -12.0, 10.0, 0.9),
                       (12.0, -6.0, -2.0, 14.0, 0.7),
                       (2.0, 14.0, -8.0, 8.0, 1.0)]),
}


@pytest.mark.parametrize("kind", list(FIELDS))
def test_optical_depth_matches_quadrature(kind):
    """Closed-form tau == composite-Simpson quadrature of sigma_t*d(x)."""
    field = FIELDS[kind]
    rs = np.random.RandomState(7)
    o, d, t = _rand_rays(64, rs)
    sigma_t = 0.05
    tau = np.asarray(df.optical_depth(field, sigma_t, o, d, t))
    # quadrature (dense trapezoid; f64 on the density evals via x64 flag)
    M = 4001
    s = np.linspace(0.0, 1.0, M)[:, None] * np.asarray(t)[None, :]
    x = np.asarray(o)[None, :, :] + s[..., None] * np.asarray(d)[None, :, :]
    dens = np.asarray(df.density(field, jnp.asarray(x)))
    ref = sigma_t * np.trapezoid(dens, s, axis=0)
    # erf_poly has 1.5e-7 abs err per term; quadrature its own O(h^2)
    np.testing.assert_allclose(tau, ref, rtol=5e-4, atol=5e-5)


def test_transmittance_between_symmetry_and_limit():
    field = FIELDS["blobs"]
    rs = np.random.RandomState(3)
    x1 = jnp.asarray(rs.uniform(-30, 30, (32, 3)))
    x2 = jnp.asarray(rs.uniform(-30, 30, (32, 3)))
    tr12 = np.asarray(df.transmittance_between(field, 0.04, x1, x2))
    tr21 = np.asarray(df.transmittance_between(field, 0.04, x2, x1))
    np.testing.assert_allclose(tr12, tr21, rtol=1e-5)
    assert (tr12 > 0).all() and (tr12 <= 1.0 + 1e-6).all()


def test_exp_height_k0_is_homogeneous():
    """k == 0 collapses to the reference's constant-sigma formulas exactly:
    tau = sigma_t * t and the analytic inversion = -log1p(-u)/sigma_t
    (vptSamplingFunctions.h:11-16)."""
    field = df.exp_height(k=0.0, y0=-40.8, majorant=1.0)
    rs = np.random.RandomState(11)
    o, d, t = _rand_rays(128, rs)
    sigma_t = 0.01
    tau = np.asarray(df.optical_depth(field, sigma_t, o, d, t))
    np.testing.assert_allclose(tau, sigma_t * np.asarray(t), rtol=1e-6)
    u = jnp.asarray(rs.uniform(0, 1, (128,)).astype(np.float32))
    d_s = np.asarray(df.sample_distance(field, sigma_t, o, d, u, None, None))
    np.testing.assert_allclose(
        d_s, np.asarray(-jnp.log1p(-u)) / sigma_t, rtol=1e-5)


@pytest.mark.parametrize("kind", list(FIELDS))
def test_distance_sampling_survival_law(kind):
    """P(d_s > T) == exp(-tau(T)) — the defining property of heterogeneous
    free-flight sampling, for BOTH the closed-form inversion (exp_height)
    and delta tracking (blobs)."""
    field = FIELDS[kind]
    sigma_t = 0.08
    n = 40000
    rs = np.random.RandomState(5)
    # one fixed ray through interesting density, many draws
    o = jnp.broadcast_to(jnp.asarray([0.0, -20.0, 0.0]), (n, 3))
    dvec = jnp.asarray([0.3, 0.9, 0.2])
    dvec = dvec / jnp.linalg.norm(dvec)
    d = jnp.broadcast_to(dvec, (n, 3))
    u = jnp.asarray(rs.uniform(0, 1, (n,)).astype(np.float32))
    key = jax.random.PRNGKey(42)
    t_cap = jnp.full((n,), 1e7, jnp.float32)
    d_s = np.asarray(df.sample_distance(field, sigma_t, o, d, u, key, t_cap))
    for T in (5.0, 15.0, 40.0, 80.0):
        emp = float((d_s > T).mean())
        tau = float(df.optical_depth(
            field, sigma_t, o[:1], d[:1], jnp.asarray([T]))[0])
        want = math.exp(-tau)
        se = math.sqrt(max(want * (1 - want), 1e-9) / n)
        assert abs(emp - want) < max(5 * se, 0.006), (kind, T, emp, want)


def test_delta_tracking_respects_t_cap_semantics():
    """Flights that pass t_cap report d_s > t_cap (surface event) without
    needing more null-collision steps."""
    field = FIELDS["blobs"]
    n = 4096
    o = jnp.broadcast_to(jnp.asarray([0.0, -20.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
    t_cap = jnp.full((n,), 3.0, jnp.float32)
    d_s = np.asarray(df.sample_distance(
        field, 0.08, o, d, jnp.zeros((n,)), jax.random.PRNGKey(0), t_cap))
    # every lane either scattered before the cap or reports beyond it
    assert ((d_s <= 3.0) | (d_s > 3.0)).all()
    assert (d_s > 0).all()
    # with this thin medium most lanes reach the 3-unit cap
    assert float((d_s > 3.0).mean()) > 0.5


def test_erf_poly_accuracy():
    from scipy.special import erf as scipy_erf  # available in the image?
    x = np.linspace(-4, 4, 2001)
    got = np.asarray(df.erf_poly(jnp.asarray(x)))
    np.testing.assert_allclose(got, scipy_erf(x), atol=2e-7)


# --------------------------------------------------------------------------
# Engine integration (free-flight family over Medium.density)
# --------------------------------------------------------------------------
import dataclasses

import vpt
from vpt.scene.scene import Medium, cornell_vpt, foggy_cornell, blob_cloud


def _render(scene, integrator="explicit_free", w=24, h=18, spp=16, seed=7,
            **kw):
    cfg = vpt.RenderConfig(width=w, height=h, spp=spp, integrator=integrator,
                           renderer="persistent", max_bounces=16, seed=seed,
                           **kw)
    return np.asarray(vpt.render(scene, vpt.default_camera(), cfg))


def test_engine_exp_height_k0_matches_homogeneous():
    """A k == 0 exp_height field IS the homogeneous medium: the analytic
    inversion, every transmittance and every weight collapse to the
    reference formulas, so the rendered image must match the homogeneous
    render to fp tolerance (same draws, same estimator)."""
    base = cornell_vpt()
    hetero = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            df.exp_height(k=0.0, y0=0.0, majorant=1.0)))
    img_h = _render(base)
    img_f = _render(hetero)
    np.testing.assert_allclose(img_f, img_h, rtol=2e-4, atol=2e-6)


def test_engine_foggy_cornell_renders_finite():
    img = _render(foggy_cornell(), spp=8)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 0


def test_engine_blob_cloud_delta_tracking_renders_finite():
    img = _render(blob_cloud(), spp=8)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.mean() > 0


@pytest.mark.slow
def test_engine_hetero_explicit_implicit_agree():
    """The reference's own validation idiom (SURVEY §4): the explicit (NEE)
    and implicit estimators must agree in expectation — here on a
    HETEROGENEOUS medium, exercising the closed-form optical depths, the
    analytic inversion and every hetero weight at once. Same open scene as
    test_integrators.test_estimator_agreement_free (a big area light; the
    Cornell scene's point light is measure-zero for implicit estimators and
    its enclosed geometry gives the implicit estimator a heavy throughput
    tail — see that test's docstring), now sunk in exp_height fog."""
    open_scene = vpt.make_scene(
        [(30.0, (0.0, 11.0, 120.0), (0, 0, 0), (8, 7, 6), 0,
          (0, 0, 0), (0, 0, 0), 0.0)],
        sigma_a=0.002, sigma_s=0.012,
        density=df.exp_height(k=0.04, y0=-20.0, majorant=5.0),
    )
    exp_img = _render(open_scene, "explicit_free", w=24, h=18, spp=64,
                      seed=3)
    imp_img = _render(open_scene, "implicit_free", w=24, h=18, spp=512,
                      seed=11)
    m_e, m_i = float(exp_img.mean()), float(imp_img.mean())
    assert abs(m_e - m_i) / max(m_e, m_i) < 0.2, (m_e, m_i)


def test_hetero_rejects_legacy():
    # legacy/surface/marcher reference-parity integrators stay homogeneous
    # by definition; the EA volume family now supports fields (round 3)
    scene = foggy_cornell()
    with pytest.raises(NotImplementedError):
        _render(scene, "vpt3", spp=2)


def test_engine_hetero_equiangular_renders_and_agrees_with_free():
    """Round 3: the equi-angular family runs on heterogeneous media (the
    EA transform is pure geometry; Bernoulli(Tr), the explicit T factor
    and sigma_s(xt) take the field forms). Same-estimand check: EA and
    free-flight explicit must agree in expectation in fog."""
    scene = foggy_cornell()
    ea = _render(scene, "explicit_equiangular", w=20, h=15, spp=48, seed=5)
    fr = _render(scene, "explicit_free", w=20, h=15, spp=48, seed=9)
    assert np.isfinite(ea).all() and (ea >= 0).all()
    m_e, m_f = float(np.clip(ea, 0, 1).mean()), float(np.clip(fr, 0, 1).mean())
    assert abs(m_e - m_f) / max(m_e, m_f) < 0.15, (m_e, m_f)
    # k -> 0 limit: hetero-EA == homogeneous EA formulas on the same draws
    import dataclasses as _dc
    sc0 = _dc.replace(scene, medium=Medium(
        scene.medium.sigma_a, scene.medium.sigma_s, 0.0,
        df.exp_height(k=0.0, y0=-40.8, majorant=1.01)))
    sch = _dc.replace(scene, medium=Medium(
        scene.medium.sigma_a, scene.medium.sigma_s, 0.0, None))
    i0 = _render(sc0, "explicit_equiangular", w=12, h=9, spp=4, seed=2)
    ih = _render(sch, "explicit_equiangular", w=12, h=9, spp=4, seed=2)
    np.testing.assert_allclose(i0, ih, rtol=2e-4, atol=2e-6)


# --------------------------------------------------------------------------
# Fused Pallas kernel (interpret mode; the engine is the reference impl)
# --------------------------------------------------------------------------
from vpt.kernels.wavefront import build_tile_renderer


@pytest.mark.slow
@pytest.mark.parametrize("scene_name", ["foggy_cornell", "blob_cloud"])
def test_pallas_hetero_matches_engine_statistically(scene_name):
    """Kernel and engine implement the same heterogeneous estimator
    (closed-form tau / analytic inversion / delta tracking baked vs
    traced): clipped means agree within MC tolerance."""
    scene = vpt.SCENES[scene_name]()
    W, H, SPP = 32, 16, 48
    run = build_tile_renderer(scene, vpt.default_camera(), W, H, SPP,
                              nee=True, max_bounces=12, interpret=True)
    img = np.clip(np.asarray(run(0)).reshape(H, W, 3), 0, 1)
    assert np.isfinite(img).all() and (img >= 0).all()
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="explicit_free", max_bounces=12,
                           chunk_pixels=W * H, renderer="scan")
    ref = np.clip(np.asarray(vpt.render(scene, vpt.default_camera(), cfg)),
                  0, 1)
    assert np.isclose(img.mean(), ref.mean(), rtol=0.2), (img.mean(), ref.mean())
    c = np.corrcoef(img.ravel(), ref.ravel())[0, 1]
    assert c > 0.5, c


def test_pallas_hetero_smoke_and_determinism():
    scene = foggy_cornell()
    run = build_tile_renderer(scene, vpt.default_camera(), 16, 8, 4,
                              nee=True, max_bounces=6, interpret=True)
    a = np.asarray(run(3))
    b = np.asarray(run(3))
    assert np.isfinite(a).all() and (a >= 0).all()
    assert np.array_equal(a, b)
    c = np.asarray(run(4))
    assert not np.array_equal(a, c)


@pytest.mark.slow
def test_pallas_hetero_equiangular_matches_engine_statistically():
    """Round 3: the fused kernel's EA branch takes heterogeneous fields;
    kernel-vs-engine mean parity in fog (different RNG backends)."""
    scene = foggy_cornell()
    w, h = 16, 12
    run = build_tile_renderer(scene, vpt.default_camera(), w, h, 48,
                              distance="equiangular", max_bounces=10,
                              tile_rows=8, interpret=True)
    img_k = np.clip(np.asarray(run(3)).reshape(-1, 3), 0, 1)
    img_e = np.clip(np.asarray(_render(scene, "explicit_equiangular",
                                       w=w, h=h, spp=48,
                                       seed=7)).reshape(-1, 3), 0, 1)
    m_k, m_e = img_k.mean(), img_e.mean()
    assert np.isfinite(img_k).all()
    assert abs(m_k - m_e) / max(m_k, m_e) < 0.12, (m_k, m_e)


def test_engine_hetero_field_params_differentiable():
    """dL/d(k, y0, sigma_s) through the heterogeneous engine: the analytic
    exp_height inversion is fully reparameterized, so reverse-mode AD flows
    through distance sampling and every closed-form tau (detached-event
    boundary caveat as for homogeneous sigma, engine.py docstring).
    Denser fog (larger k at y0 anchored BELOW the scene => thinner medium..
    the sign depends on geometry, so assert finite and nonzero only)."""
    base = foggy_cornell()

    def loss(params):
        field = df.DensityField(params=params, kind="exp_height",
                                majorant=1.01)
        scene = dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, field))
        cfg = vpt.RenderConfig(width=12, height=8, spp=4, max_bounces=8,
                               renderer="scan")
        img = vpt.render(scene, vpt.default_camera(), cfg,
                         key=jax.random.PRNGKey(5), differentiable=True)
        return jnp.mean(img)

    g = jax.grad(loss)(jnp.asarray([0.06, -40.8], jnp.float32))
    g = np.asarray(g)
    assert np.isfinite(g).all(), g
    assert (np.abs(g) > 0).any(), g


@pytest.mark.slow
def test_recover_fog_falloff_crn_fd():
    """Heterogeneous INVERSE rendering: recover the exp_height fog falloff
    rate k from images. CRN central differences on the engine (same PRNG
    key at k-h and k+h: the smooth-chain MC noise cancels to O(h) and the
    event flips between the probes carry the boundary terms — the round-2
    fit_geom_fd recipe, BASELINE.md 'Boundary terms'), Adam on an A/B MSE
    against a fixed-k target render."""
    import optax

    base = foggy_cornell()
    K_TRUE = 0.06

    def render_k(k, seed):
        field = df.DensityField(params=jnp.stack([k, jnp.float32(-40.8)]),
                                kind="exp_height", majorant=1.01)
        scene = dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, field))
        cfg = vpt.RenderConfig(width=24, height=18, spp=32, max_bounces=10,
                               renderer="scan", seed=0)
        img = vpt.render(scene, vpt.default_camera(), cfg,
                         key=jax.random.PRNGKey(seed))
        # clamped MSE (the round-2 study loss): unclamped MSE is dominated
        # by emitter-hit speckle and buries the fog signal in noise
        return jnp.clip(img, 0.0, 1.0)

    target = render_k(jnp.float32(K_TRUE), 1000)

    @jax.jit
    def fd_grad(k, seed):
        h = 0.008
        lp = jnp.mean((render_k(k + h, seed) - target) ** 2)
        lm = jnp.mean((render_k(k - h, seed) - target) ** 2)
        return (lp - lm) / (2 * h)

    k = jnp.float32(0.12)
    opt = optax.adam(optax.exponential_decay(0.01, 10, 0.8))
    state = opt.init(k)
    tail = []
    for step in range(100):
        g = fd_grad(k, step)
        upd, state = opt.update(g, state)
        k = jnp.clip(k + upd, 1e-4, 0.5)
        if step >= 70:
            tail.append(float(k))
    k_rec = float(np.mean(tail))
    # measured: 0.069 over the Polyak tail (flat curvature near the
    # optimum bounds the achievable residual at this budget)
    assert abs(k_rec - K_TRUE) < 0.02, k_rec


# --------------------------------------------------------------------------
# Voxel-grid density field (engine-only; media/density.grid)
# --------------------------------------------------------------------------

def _blob_grid(n=32, lo=-35.0, hi=35.0):
    """Rasterize the FIELDS['blobs'] analytic field onto an n^3 grid over
    [lo, hi]^3 — lets every grid test compare against the analytic oracle."""
    xs = np.linspace(lo, hi, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1))
    vals = np.asarray(df.density(FIELDS["blobs"], pts))
    spacing = (hi - lo) / (n - 1)     # linspace sample spacing
    # voxel CENTERS sit at origin + (i+0.5)*spacing == lo + i*spacing
    origin = lo - 0.5 * spacing
    return df.grid(vals, origin=(origin,) * 3, spacing=(spacing,) * 3)


def test_grid_trilinear_constant_and_clamp():
    g = df.grid(np.full((4, 5, 6), 0.7), origin=(0, 0, 0),
                spacing=(1, 1, 1))
    pts = jnp.asarray([[1.5, 2.5, 3.0], [0.0, 0.0, 0.0],
                       [100.0, -100.0, 2.0]])     # inside, corner, outside
    np.testing.assert_allclose(np.asarray(df.density(g, pts)), 0.7,
                               rtol=1e-6)


def test_grid_density_matches_rasterized_blobs():
    """Trilinear reconstruction of a smooth field tracks the analytic
    values inside the grid."""
    g = _blob_grid(48)
    rs = np.random.RandomState(2)
    pts = jnp.asarray(rs.uniform(-30, 30, (256, 3)))
    got = np.asarray(df.density(g, pts))
    want = np.asarray(df.density(FIELDS["blobs"], pts))
    np.testing.assert_allclose(got, want, atol=0.02)


def test_grid_optical_depth_matches_quadrature():
    """The canonical pc-model tau converges to the true line integral of
    the trilinear field as n_march resolves the voxel scale (the grid
    spans ~140 units of t_far, so n_march=192 marches at ~sub-voxel h)."""
    g = dataclasses.replace(_blob_grid(48), n_march=192)
    rs = np.random.RandomState(9)
    o, d, t = _rand_rays(32, rs)
    sigma_t = 0.05
    tau = np.asarray(df.optical_depth(g, sigma_t, o, d, t))
    M = 2001
    s = np.linspace(0.0, 1.0, M)[:, None] * np.asarray(t)[None, :]
    x = np.asarray(o)[None] + s[..., None] * np.asarray(d)[None]
    dens = np.asarray(df.density(g, jnp.asarray(x)))
    ref = sigma_t * np.trapezoid(dens, s, axis=0)
    np.testing.assert_allclose(tau, ref, rtol=0.03, atol=5e-3)


def test_grid_tau_linear_within_canonical_segments():
    """tau(t) must be exactly linear in t inside one canonical segment
    (the property the closed-form sampling inversion relies on)."""
    g = _blob_grid(16)
    o = jnp.asarray([[0.0, -20.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    t0w, taw, _tbw = (float(v[0]) for v in df._grid_window(g, o, d))
    m1, _ = df._grid_m_split(g.n_march)
    h = (taw - t0w) / m1
    ta, tb = t0w + 3.2 * h, t0w + 3.9 * h    # both inside segment 3
    tm = 0.5 * (ta + tb)
    taus = [float(df.optical_depth(g, 0.07, o, d, jnp.asarray([t]))[0])
            for t in (ta, tm, tb)]
    np.testing.assert_allclose(taus[1], 0.5 * (taus[0] + taus[2]),
                               rtol=1e-5)


def test_grid_distance_sampling_survival_law():
    """P(d > T) == exp(-tau(T)) for the SAME canonical tau every weight
    uses — exact self-consistency of the pc inversion (up to MC error) —
    and approximately the analytic oracle the grid rasterizes."""
    g = _blob_grid(48)
    sigma_t = 0.08
    n = 40000
    o = jnp.broadcast_to(jnp.asarray([0.0, -20.0, 0.0]), (n, 3))
    dvec = jnp.asarray([0.3, 0.9, 0.2])
    dvec = dvec / jnp.linalg.norm(dvec)
    d = jnp.broadcast_to(dvec, (n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(4), (n,))
    d_s = np.asarray(df.sample_distance(
        g, sigma_t, o, d, u, jax.random.PRNGKey(4),
        jnp.full((n,), 1e7, jnp.float32)))
    for T in (5.0, 15.0, 40.0):
        emp = float((d_s > T).mean())
        tau_self = float(df.optical_depth(
            g, sigma_t, o[:1], d[:1], jnp.asarray([T]))[0])
        assert abs(emp - math.exp(-tau_self)) < 0.01, (T, emp, tau_self)
        # analytic-oracle tau (the grid approximates the blobs field):
        # pc-model bias at n_march=32 over ~165 units of t_far is visible
        # but bounded
        tau = float(df.optical_depth(
            FIELDS["blobs"], sigma_t, o[:1], d[:1], jnp.asarray([T]))[0])
        assert abs(emp - math.exp(-tau)) < 0.05, (T, emp, tau)


@pytest.mark.slow
def test_engine_grid_render_matches_blobs_render():
    """End-to-end: rendering with the rasterized grid approximates the
    analytic blobs render (same scene geometry)."""
    base = blob_cloud()
    vals_field = base.medium.density
    # rasterize the scene's own blob field over its bounding region
    xs = np.linspace(-40, 40, 48)
    zs = np.linspace(130, 220, 48)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1))
    vals = np.asarray(df.density(vals_field, pts))
    sx, sz = 80 / 47, 90 / 47          # linspace sample spacing
    gfield = df.grid(vals, origin=(-40 - sx / 2, -40 - sx / 2,
                                   130 - sz / 2),
                     spacing=(sx, sx, sz))
    gscene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            gfield))
    a = _render(base, w=24, h=18, spp=32, seed=5)
    b = _render(gscene, w=24, h=18, spp=32, seed=9)
    assert np.isfinite(b).all() and (b >= 0).all()
    assert np.isclose(a.mean(), b.mean(), rtol=0.15), (a.mean(), b.mean())


def test_grid_voxel_gradients_flow():
    """d(render)/d(voxel values) through the engine — differentiable
    volume reconstruction. Finite and nonzero somewhere."""
    base = blob_cloud()
    g0 = _blob_grid(12, lo=-30.0, hi=30.0)

    def loss(vals):
        field = dataclasses.replace(g0, params=vals)
        scene = dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, field))
        cfg = vpt.RenderConfig(width=8, height=6, spp=2, max_bounces=6,
                               renderer="scan")
        img = vpt.render(scene, vpt.default_camera(), cfg,
                         key=jax.random.PRNGKey(2), differentiable=True)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(g0.params))
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()


def test_grid_scene_io_round_trip(tmp_path):
    from vpt.scene.io import save_scene, load_scene

    base = blob_cloud()
    gfield = _blob_grid(8)
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            gfield))
    p = tmp_path / "grid_scene.json"
    save_scene(str(p), scene)
    loaded, _ = load_scene(str(p))
    f1 = loaded.medium.density
    assert f1.kind == "grid" and f1.params.shape == gfield.params.shape
    assert f1.grid_origin == gfield.grid_origin
    assert f1.grid_spacing == gfield.grid_spacing
    np.testing.assert_allclose(np.asarray(f1.params),
                               np.asarray(gfield.params), rtol=1e-6)


@pytest.mark.parametrize("interp", ["tri", "nearest"])
def test_grid_fused_kernel_matches_engine(interp):
    """Round 4: voxel grids RUN in the fused kernel (chunked lane-gather
    trilinear + the canonical pc march shared with media/density.py).
    Kernel and engine estimate the same transport solution — their means
    agree within MC error (variance-scaled gate, the test_hg idiom).
    Round 5: also under the xy-nearest/z-linear transport interpolant
    (the n>=24 gather-wall answer): both sides swap the SAME pc-model
    evaluation, so parity must hold identically."""
    base = blob_cloud()
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            dataclasses.replace(
                                _blob_grid(8), n_march=8,
                                transport_interp=interp)))
    W, H, spp = 16, 8, 24
    run = build_tile_renderer(scene, vpt.default_camera(), W, H, spp,
                              nee=True, max_bounces=8, tile_rows=8,
                              interpret=True)
    img = np.asarray(run(11)).reshape(H, W, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.max() > 0.0
    cfg = vpt.RenderConfig(width=W, height=H, spp=spp,
                           integrator="explicit_free", max_bounces=8,
                           chunk_pixels=W * H, renderer="scan")
    ref = np.asarray(vpt.render(scene, vpt.default_camera(), cfg,
                                key=jax.random.PRNGKey(3)))
    diff = np.clip(img, 0, 1) - np.clip(ref, 0, 1)
    se = diff.std() / np.sqrt(diff.size)
    assert abs(diff.mean()) < 6.0 * se + 0.01, (img.mean(), ref.mean(), se)


def test_grid_rejected_by_geom_dual_kernel():
    """Grids run in the forward kernel and the diff pair (round 4); the
    geometric DUAL planes still refuse loudly (use CRN FD there), but
    the primal_only FD substrate accepts grids and matches the forward
    kernel's render (shared prims arithmetic)."""
    from vpt.kernels.geom import make_geom_renderer, pack_theta
    from vpt.kernels.wavefront import build_tile_renderer

    base = blob_cloud()
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            _blob_grid(8)))
    with pytest.raises(NotImplementedError):
        make_geom_renderer(scene, vpt.default_camera(), 16, 8, 2,
                           sphere=8, interpret=True)

    W, H, SPP, MB = 16, 8, 2, 4
    r = make_geom_renderer(scene, vpt.default_camera(), W, H, SPP,
                           sphere=None, cam_grads=False, primal_only=True,
                           max_bounces=MB, tile_rows=8, interpret=True)
    img, tang = r(pack_theta(scene, vpt.default_camera(), None),
                  jnp.asarray(3))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert tang.shape[0] == 0
    ref = np.asarray(build_tile_renderer(
        scene, vpt.default_camera(), W, H, SPP, max_bounces=MB,
        tile_rows=8, interpret=True)(3))
    rel = np.abs(img - ref) / max(1.0, np.abs(ref).max())
    assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)


@pytest.mark.slow
def test_engine_hetero_sigma_score_matches_kernel():
    """Round 3: engine.IntegratorSpec(sigma_score=True) supports
    heterogeneous media — the event log-densities swap the homogeneous
    closed forms for the field optical depth + local density, so sigma AND
    field-param event gradients are unbiased under AD. Cross-validate
    E[dL/d(sigma_a, sigma_s, fog_k)] against the independently-derived
    diff-kernel estimator (diff_field=True): different RNG backends
    (threefry vs PCG), different autodiff modes (AD surrogate vs
    hand-accumulated replay), same derivative."""
    import vpt
    from vpt.integrators import engine
    from vpt.kernels.diff import make_diff_renderer, pack_params
    from vpt.scene import camera as cam_mod

    base = foggy_cornell()
    CAM = vpt.default_camera()
    W, H, SPP = 12, 8, 4
    spec = engine.IntegratorSpec(max_bounces=8, sigma_score=True)
    ids = jnp.arange(W * H, dtype=jnp.int32)

    @jax.jit
    def eng_grad(key):
        def loss(vec):
            field = df.DensityField(
                params=jnp.stack([vec[2], jnp.float32(-40.8)]),
                kind="exp_height", majorant=1.01)
            sc = dataclasses.replace(
                base, medium=Medium(vec[0], vec[1], 0.0, field))

            def one(acc, s):
                ks = jax.random.fold_in(key, s)
                o, d = cam_mod.rays_for_pixels(CAM, W, H, ids, ks, True)
                return acc + engine.trace(sc, spec, o, d, ks,
                                          differentiable=True), None

            acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)),
                                  jnp.arange(SPP))
            return jnp.mean(acc / SPP)

        return jax.grad(loss)(jnp.asarray(
            [base.medium.sigma_a, base.medium.sigma_s, 0.06], jnp.float32))

    n = 16
    eng = np.stack([np.asarray(eng_grad(jax.random.PRNGKey(600 + i)))
                    for i in range(n)])

    render = make_diff_renderer(base, CAM, W, H, SPP, max_bounces=8,
                                tile_rows=8, diff_field=True, interpret=True)
    params = pack_params(base, with_field=True)
    gk = jax.jit(jax.grad(lambda p, s: jnp.mean(render(p, s))))
    ker = np.stack([
        np.asarray([float(g["sigma_a"]), float(g["sigma_s"]),
                    float(g["fog_k"])])
        for g in (gk(params, jnp.int32(800 + i)) for i in range(n))])

    for j, name in enumerate(("sigma_a", "sigma_s", "fog_k")):
        em, es = eng[:, j].mean(), eng[:, j].std() / np.sqrt(n)
        km, ks_ = ker[:, j].mean(), ker[:, j].std() / np.sqrt(n)
        tol = 4.0 * np.hypot(es, ks_) + 0.08 * max(abs(em), abs(km))
        assert np.isfinite([em, km]).all(), name
        assert abs(em - km) < tol, (name, em, es, km, ks_)


# --------------------------------------------------------------------------
# exp_height closed-form consistency (regression: the hetero-EA NaN)
# --------------------------------------------------------------------------
# Post-mortem (fixed in the same commit as these tests): three mutually
# inconsistent exp_height evaluations — the difference form of tau
# collapsing to 0 when BOTH endpoint exponents clip at one +-80 rail,
# optical_depth clamping t < 0 to 0 while engine.bounce_step takes |tau|
# of an odd function, and density() with no exponent clip (exp(+2000) =
# inf). The signature failure: an EA sample tens of thousands of units
# below the fog plane got T == 1 against a e^{34}-scale local sigma_s,
# throughput went inf, masked 0 * inf turned NaN at the next bounce.


def test_optical_depth_is_odd_in_t():
    """tau(o, d, -t) == -tau(o, -d, t): integrating backward over the same
    segment flips the sign. engine.bounce_step relies on this (|tau| for
    EA samples behind the ray origin)."""
    rs = np.random.default_rng(3)
    for kind, fld in FIELDS.items():
        o, d, t = _rand_rays(64, rs)
        fwd = df.optical_depth(fld, 0.02, o, d, -t)
        rev = df.optical_depth(fld, 0.02, o, -d, t)
        np.testing.assert_allclose(np.asarray(fwd), -np.asarray(rev),
                                   rtol=1e-4, atol=1e-9, err_msg=kind)


def test_optical_depth_rail_clip_keeps_tau_density_consistent():
    """Deep below the fog plane both endpoint exponents clip at +80; the
    difference form then reads 0 while density(x) reads e^{80}. The
    monotone lower bound |t| * min-endpoint-density must keep the pair
    consistent: T == exp(-tau) == 0 wherever density is astronomically
    large (and the clipped density itself must be finite)."""
    fld = FIELDS["exp_height"]
    k, y0 = float(fld.params[0]), float(fld.params[1])
    o = jnp.asarray([[0.0, y0 - 5000.0, 0.0]])      # -k(y-y0) = 300 >> 80
    d = jnp.asarray([[1.0, 0.0, 0.0]])              # horizontal: both clip
    t = jnp.asarray([10.0])
    dens = np.asarray(df.density(fld, o))
    assert np.isfinite(dens).all() and dens[0] > 1e30   # clipped e^{80}
    tau = np.asarray(df.optical_depth(fld, 0.02, o, d, t))
    assert np.isfinite(tau).all() or np.isposinf(tau).all()
    assert float(np.exp(-tau[0])) == 0.0
    # odd-in-t rail case: same magnitude, opposite sign
    tau_n = np.asarray(df.optical_depth(fld, 0.02, o, d, -t))
    assert float(np.exp(-abs(tau_n[0]))) == 0.0 and tau_n[0] < 0


def test_prims_field_tau_matches_engine_closed_form():
    """kernels/prims.field_tau (the fused kernels' baked form) and
    media/density.optical_depth are the same closed forms — including the
    odd-in-t extension and the rail lower bound."""
    from vpt.kernels import prims as pr

    rs = np.random.default_rng(11)
    fld = FIELDS["exp_height"]
    fc = {"kind": "exp_height",
          "params": (float(fld.params[0]), float(fld.params[1]))}
    o, d, t = _rand_rays(64, rs)
    for tt in (t, -t):
        eng = np.asarray(df.optical_depth(fld, 0.02, o, d, tt))
        ker = np.asarray(pr.field_tau(
            fc, 0.02, [o[:, 0], o[:, 1], o[:, 2]],
            [d[:, 0], d[:, 1], d[:, 2]], tt))
        np.testing.assert_allclose(ker, eng, rtol=1e-4, atol=1e-9)
    # rail case
    y0 = fc["params"][1]
    orail = [jnp.zeros(1), jnp.full(1, y0 - 5000.0), jnp.zeros(1)]
    drail = [jnp.ones(1), jnp.zeros(1), jnp.zeros(1)]
    tau = np.asarray(pr.field_tau(fc, 0.02, orail, drail, jnp.full(1, 10.0)))
    assert float(np.exp(-tau[0])) == 0.0
    dens = np.asarray(pr.field_density(fc, orail))
    assert np.isfinite(dens).all()


def test_engine_hetero_ea_deep_miss_lanes_finite():
    """The exact failing configuration of the hetero-EA NaN (foggy_cornell,
    explicit_equiangular, miss lanes diving far below the fog plane at
    bounce >= 5): 96x72 at seed 0 — the repro is lane-position-keyed, so
    the geometry must match. Was 1 NaN pixel before the consistency fix."""
    cfg = vpt.RenderConfig(width=96, height=72, spp=2, max_bounces=8,
                           integrator="explicit_equiangular", seed=0)
    img = np.asarray(vpt.render(foggy_cornell(), vpt.default_camera(), cfg))
    assert np.isfinite(img).all() and (img >= 0).all()


@pytest.mark.slow
def test_fd_geom_step_runs_in_grid_media():
    """Round 4: boundary-aware CRN-FD geometry training works in voxel-
    grid media (the geom kernel's primal_only mode accepts grids; the FD
    probes re-march the shared prims canonical model at theta +- h).
    Pins: step runs, loss finite, only the enabled block moves."""
    import optax

    from vpt.dist.train_fast import make_fd_geom_train_step
    from vpt.kernels.geom import pack_theta

    base = blob_cloud()
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            _blob_grid(6)))
    cam = vpt.default_camera()
    W, H, SPP, MB, LIGHT = 16, 8, 4, 4, 8
    target = np.zeros((W * H, 3), np.float32) + 0.05
    opt = optax.adam(0.3)
    theta = dict(pack_theta(scene, cam, LIGHT))
    theta["center"] = theta["center"] + jnp.asarray([0.0, 4.0, 0.0])
    step = make_fd_geom_train_step(scene, cam, W, H, SPP, opt,
                                   sphere=LIGHT, cam_grads=False,
                                   max_bounces=MB, interpret=True)
    st = opt.init(theta)
    t2, st, loss = step(theta, st, jnp.asarray(target), jnp.int32(5))
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(t2["center"]),
                           np.asarray(theta["center"]))
    assert np.allclose(np.asarray(t2["cam_origin"]),
                       np.asarray(theta["cam_origin"]))


def test_grid_table_rows_are_8_aligned():
    """Mosaic requires 8-divisible VMEM block rows; the diff_grid backward
    emits the voxel-grad table as a (C, 128) block, so grid_table must pad
    C up (n=24 -> C=108 failed the compiled lowering before the round-4
    fix; interpret mode masked it). The packed z-pair values themselves
    must be unaffected by the padding."""
    from vpt.kernels.wavefront import grid_table

    for n in (4, 6, 16, 24, 32):
        vals = np.linspace(0.0, 1.0, n ** 3, dtype=np.float32).reshape(
            n, n, n)
        tab = grid_table(jnp.asarray(vals))
        C = tab.shape[0]
        assert tab.shape[1] == 128
        assert C % 8 == 0, (n, C)
        assert C * 128 >= n ** 3
        # unpack word 0: high 16 bits bf16(g[0]), low bf16(g[1])
        w0 = np.asarray(tab).ravel()[:2]
        iw = w0.view(np.int32)
        hi = (iw & np.int32(-65536)).view(np.float32)
        flat = vals.ravel()
        assert np.allclose(hi[0], flat[0], atol=4e-3)


def test_exp_height_tau_inf_rail_capped():
    """Round 4: the f32-inf rail — an EA-style sample far below the fog
    plane on a near-horizontal ray drives the difference form
    (d0 - d_end)/m past f32 max (e^80 / 1e-6). All four tau forms must
    return FINITE (capped) values there, and the k-derivative too; the
    backward through exp(-sigma*tau) must be finite (the 0 * inf NaN
    factory of the EA-hetero diff gates)."""
    import jax

    from vpt.kernels import prims as pr

    field = df.exp_height(k=0.06, y0=-40.8, majorant=1.2)
    fck = {"kind": "exp_height", "params": (0.06, -40.8)}
    o = jnp.asarray([[0.0, 10.0, 170.0]])
    d = jnp.asarray([[0.9999999, -2e-5, 0.0]])
    d = d / jnp.linalg.norm(d)
    t = jnp.asarray([9.0e7])

    tau_e = np.asarray(df.optical_depth(field, 1.0, o, d, t))
    assert np.isfinite(tau_e).all() and tau_e[0] > 1e6

    ol = [o[:, i] for i in range(3)]
    dl = [d[:, i] for i in range(3)]
    tau_k = np.asarray(pr.field_tau(fck, 1.0, ol, dl, t))
    assert np.isfinite(tau_k).all()
    dk = np.asarray(pr.field_tau_dk(fck, ol, dl, t))
    assert np.isfinite(dk).all()

    # the exact failure shape: d(exp(-sigma*tau))/dsigma with tau at the
    # rail must not be NaN (pre-fix: tau == inf, masked 0 * inf)
    g = jax.grad(
        lambda s: float(0) + jnp.sum(
            jnp.exp(-s * df.optical_depth(field, 1.0, o, d, t))))(
                jnp.float32(0.01))
    assert np.isfinite(float(g))
