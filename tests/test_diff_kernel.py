"""Differentiable fused Pallas kernel (kernels/diff.py): correctness of the
custom-VJP forward/backward pair in interpret mode.

Contracts:
  1. the diff forward (params from SMEM) reproduces the baked forward kernel
     bit-near-exactly at the scene's own parameter values (same PCG streams);
  2. albedo/radiance gradients are EXACT per-seed: no sampling decision
     depends on them, so fixed-seed finite differences of the kernel itself
     must match the hand-accumulated backward;
  3. sigma gradients match the XLA engine's sigma_score estimator
     (engine.IntegratorSpec(sigma_score=True)) statistically — both are
     unbiased estimators of the same derivative (detached geometry +
     score-function event terms, see kernels/diff.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpt
from vpt.integrators import engine
from vpt.kernels.diff import make_diff_renderer, pack_params
from vpt.kernels.wavefront import build_tile_renderer
from vpt.scene import camera as cam

SCENE = vpt.cornell_vpt()
CAM = vpt.default_camera()
W, H, SPP = 16, 12, 4


@pytest.fixture(scope="module")
def render():
    return make_diff_renderer(SCENE, CAM, W, H, SPP, max_bounces=8,
                              tile_rows=8, interpret=True)


def test_diff_fwd_matches_baked_kernel(render):
    img = np.asarray(render(pack_params(SCENE), 3))
    run_ref = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=8,
                                  tile_rows=8, interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("leaf,index,eps", [
    ("albedo", (6, 2), 1e-3),     # blue sphere blue channel
    ("albedo", (0, 0), 1e-3),     # left wall
    ("radiance", (9, 0), 1e-2),   # area light power
    ("radiance", (7, 0), 1.0),    # the (6000,0,0) point light
])
def test_albedo_radiance_grads_exact_per_seed(render, leaf, index, eps):
    params = pack_params(SCENE)

    def loss(p):
        return jnp.mean(render(p, 3))

    g = float(np.asarray(jax.grad(loss)(params)[leaf])[index])

    def bump(e):
        p = dict(params)
        p[leaf] = params[leaf].at[index].set(params[leaf][index] + e)
        return float(loss(p))

    fd = (bump(eps) - bump(-eps)) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=3e-2, atol=1e-7), (g, fd)


@pytest.mark.slow
def test_sigma_grads_match_engine_score_estimator(render):
    """E[d(mean image)/d sigma] agrees between the fused backward kernel and
    the XLA engine's sigma_score estimator within combined standard error.
    Different RNG backends (PCG vs threefry), same estimator — statistical."""
    params = pack_params(SCENE)

    # seed must stay a TRACED arg: a static seed would recompile the
    # interpret-mode backward kernel for every sample (~100s each)
    gk = jax.jit(jax.grad(lambda p, s: jnp.mean(render(p, s))))
    kernel_sa, kernel_ss = [], []
    for i in range(24):
        g = gk(params, jnp.int32(1000 + i))
        kernel_sa.append(float(g["sigma_a"]))
        kernel_ss.append(float(g["sigma_s"]))

    spec = engine.IntegratorSpec(max_bounces=8, sigma_score=True)
    ids = jnp.arange(W * H, dtype=jnp.int32)

    @jax.jit
    def eng_grad(key):
        def loss(sig):
            import dataclasses
            from vpt.scene.scene import Medium
            sc = dataclasses.replace(SCENE, medium=Medium(sig[0], sig[1]))
            # SPP camera samples per pixel like the kernel
            def one(acc, s):
                ks = jax.random.fold_in(key, s)
                o, d = cam.rays_for_pixels(CAM, W, H, ids, ks, True)
                return acc + engine.trace(sc, spec, o, d, ks,
                                          differentiable=True), None
            acc, _ = jax.lax.scan(one, jnp.zeros((W * H, 3)),
                                  jnp.arange(SPP))
            return jnp.mean(acc / SPP)
        return jax.grad(loss)(jnp.asarray(
            [SCENE.medium.sigma_a, SCENE.medium.sigma_s]))

    eng_sa, eng_ss = [], []
    for i in range(24):
        g = np.asarray(eng_grad(jax.random.PRNGKey(500 + i)))
        eng_sa.append(g[0])
        eng_ss.append(g[1])

    for k_vals, e_vals, name in ((kernel_sa, eng_sa, "sigma_a"),
                                 (kernel_ss, eng_ss, "sigma_s")):
        km, ks_ = np.mean(k_vals), np.std(k_vals) / np.sqrt(len(k_vals))
        em, es = np.mean(e_vals), np.std(e_vals) / np.sqrt(len(e_vals))
        tol = 4.0 * np.hypot(ks_, es) + 0.05 * max(abs(km), abs(em))
        assert abs(km - em) < tol, (name, km, ks_, em, es)


@pytest.fixture(scope="module")
def render_ea():
    return make_diff_renderer(SCENE, CAM, W, H, SPP, max_bounces=8,
                              distance="equiangular", tile_rows=8,
                              interpret=True)


def test_diff_ea_fwd_matches_baked_kernel(render_ea):
    img = np.asarray(render_ea(pack_params(SCENE), 3))
    run_ref = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=8,
                                  distance="equiangular", tile_rows=8,
                                  interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("leaf,index,eps", [
    ("albedo", (0, 0), 1e-3),
    ("radiance", (9, 0), 1e-2),
])
def test_ea_albedo_radiance_grads_exact_per_seed(render_ea, leaf, index, eps):
    """Equi-angular family: albedo/radiance stay event-independent, so
    per-seed FD of the kernel must match the hand-accumulated backward."""
    params = pack_params(SCENE)

    def loss(p):
        return jnp.mean(render_ea(p, 3))

    g = float(np.asarray(jax.grad(loss)(params)[leaf])[index])

    def bump(e):
        p = dict(params)
        p[leaf] = params[leaf].at[index].set(params[leaf][index] + e)
        return float(loss(p))

    fd = (bump(eps) - bump(-eps)) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=3e-2, atol=1e-7), (g, fd)


@pytest.mark.slow
def test_kernel_train_step_recovers_albedo():
    """End-to-end inverse rendering on the fused kernel pair
    (dist/train_fast.py): recover a perturbed wall albedo from a rendered
    target. Sigma recovery at CI scale stays with the engine test
    (score-gradient noise needs more steps than interpret mode affords);
    the kernel's sigma gradients are validated statistically above."""
    import dataclasses
    from vpt.dist.train_fast import fit_kernel
    from vpt.kernels.wavefront import build_tile_renderer

    Wt = Ht = 16
    run = build_tile_renderer(SCENE, CAM, Wt, Ht, 64, max_bounces=8,
                              tile_rows=8, interpret=True)
    target = np.asarray(run(11)).reshape(Ht, Wt, 3)

    # the blue sphere's blue channel has a strong direct-view gradient
    # (far-wall entries move too slowly for a 40-step CI budget)
    wrong = dataclasses.replace(SCENE, albedo=SCENE.albedo.at[6, 2].set(0.2))
    true_a = float(SCENE.albedo[6, 2])           # 0.9

    def only_albedo(p, init):
        return {**init, "albedo": p["albedo"]}

    params, losses = fit_kernel(
        wrong, CAM, target, steps=40, spp=8, learning_rate=3e-2,
        max_bounces=8, interpret=True, param_filter=only_albedo)
    rec = float(params["albedo"][6, 2])
    assert abs(rec - true_a) < 0.6 * abs(0.2 - true_a), (rec, true_a)


# ---- low-discrepancy sampler (sampler="ld") -------------------------------

@pytest.fixture(scope="module")
def render_ld():
    return make_diff_renderer(SCENE, CAM, W, H, SPP, max_bounces=8,
                              tile_rows=8, sampler="ld", interpret=True)


def test_ld_albedo_grad_exact_per_seed(render_ld):
    """The replay-backward regenerates the identical stratified draws, so
    the pathwise albedo gradient stays EXACT for the LD estimator: AD
    matches fixed-seed central differences of the LD renderer itself."""
    params = pack_params(SCENE)

    def loss(p):
        return jnp.mean(render_ld(p, 3))

    g = float(np.asarray(jax.grad(loss)(params)["albedo"])[6, 2])

    def bump(e):
        p = dict(params)
        p["albedo"] = params["albedo"].at[6, 2].set(params["albedo"][6, 2] + e)
        return float(loss(p))

    fd = (bump(1e-3) - bump(-1e-3)) / 2e-3
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=3e-2, atol=1e-7), (g, fd)


def test_ld_deterministic_and_unbiased_vs_random(render_ld, render):
    params = pack_params(SCENE)
    a = np.asarray(render_ld(params, 3))
    assert np.array_equal(a, np.asarray(render_ld(params, 3)))
    assert not np.array_equal(a, np.asarray(render_ld(params, 4)))
    assert np.isfinite(a).all()
    lm = [float(np.clip(np.asarray(render_ld(params, s)), 0, 1).mean())
          for s in range(8)]
    rm = [float(np.clip(np.asarray(render(params, s)), 0, 1).mean())
          for s in range(8)]
    ml, mr = np.mean(lm), np.mean(rm)
    se = np.hypot(np.std(lm), np.std(rm)) / np.sqrt(8)
    assert abs(ml - mr) < 4.0 * se + 0.03 * mr, (ml, mr, se)


# ------------- heterogeneous media (free-flight family) --------------------
# Medium.density support (ours; the reference medium is homogeneous): the
# field SHAPE is baked, sigma_a/sigma_s/albedo/radiance stay traced. Same
# three contracts as the homogeneous pair (module docstring), plus the
# material-3 shell scene through the shared pLight cascade.

from vpt.scene.scene import Medium, blob_cloud, foggy_cornell, medium_shell


def grid_cloud(interp="tri"):
    """blob_cloud rasterized onto an 8^3 voxel grid (round 4: grids run in
    the diff pair — chunked lane-gather trilinear, canonical pc march;
    round 5: the xy-nearest/z-linear transport interpolant option)."""
    import dataclasses

    from vpt.media import density as df

    base = blob_cloud()
    n = 8
    xs = np.linspace(-40, 40, n)
    zs = np.linspace(130, 220, n)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1))
    vals = np.asarray(df.density(base.medium.density, pts))
    sx, sz = 80 / (n - 1), 90 / (n - 1)
    f = dataclasses.replace(
        df.grid(vals, origin=(-40 - sx / 2, -40 - sx / 2, 130 - sz / 2),
                spacing=(sx, sx, sz), transport_interp=interp), n_march=8)
    return dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            f))


def grid_cloud_nearest():
    return grid_cloud(interp="nearest")


@pytest.mark.parametrize("make_scene,distance", [
    (foggy_cornell, "free"), (blob_cloud, "free"), (medium_shell, "free"),
    (foggy_cornell, "equiangular"),     # round 3: hetero EA family
    (grid_cloud, "free"),               # round 4: voxel grids
    (grid_cloud, "equiangular"),
])
def test_diff_hetero_fwd_matches_baked_kernel(make_scene, distance):
    """Contract 1 for the heterogeneous fields (exp_height analytic
    inversion; blobs delta tracking — the replay consumes the same PCG
    subsequence), for material-3 shells (prims.plight_le_scale shared
    cascade), and for the heterogeneous equi-angular family."""
    sc = make_scene()
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                           distance=distance, tile_rows=8, interpret=True)
    img = np.asarray(r(pack_params(sc), 3))
    run_ref = build_tile_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                                  distance=distance, tile_rows=8,
                                  interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


@pytest.fixture(scope="module")
def render_fog():
    return make_diff_renderer(foggy_cornell(), CAM, W, H, SPP, max_bounces=8,
                              tile_rows=8, interpret=True)


@pytest.mark.parametrize("leaf,index,eps", [
    ("albedo", (6, 2), 1e-3),     # blue sphere blue channel
    ("radiance", (9, 0), 1e-2),   # area light power
])
def test_hetero_albedo_radiance_grads_exact_per_seed(render_fog, leaf,
                                                     index, eps):
    """Contract 2 in fog: no sampling decision (incl. the heterogeneous
    distance draws) depends on albedo/radiance, so fixed-seed FD of the
    kernel matches the hand-accumulated backward."""
    sc = foggy_cornell()
    params = pack_params(sc)

    def loss(p):
        return jnp.mean(render_fog(p, 3))

    g = float(np.asarray(jax.grad(loss)(params)[leaf])[index])

    def bump(e):
        p = dict(params)
        p[leaf] = params[leaf].at[index].set(params[leaf][index] + e)
        return float(loss(p))

    fd = (bump(eps) - bump(-eps)) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    assert np.isclose(g, fd, rtol=3e-2, atol=1e-7), (g, fd)


@pytest.mark.slow
@pytest.mark.parametrize("make_scene,h,distance", [
    (foggy_cornell, 2e-3, "free"),
    (blob_cloud, 2e-3, "free"),
    (foggy_cornell, 2e-3, "equiangular"),   # round 3: hetero EA scores
    (grid_cloud, 2e-3, "free"),             # round 4: grid scores
])
def test_hetero_sigma_grads_match_crn_fd(make_scene, h, distance):
    """Contract 3 for heterogeneous media: E[d mean(img) / d sigma] from the
    score-function backward agrees with common-random-number central finite
    differences of the pair's own forward (same PCG streams at theta +- h,
    so the smooth chains cancel and event flips supply the event-probability
    mass) within combined standard error."""
    sc = make_scene()
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                           distance=distance, tile_rows=8, interpret=True)
    params = pack_params(sc)

    # seed stays traced: a static seed would recompile the interpret-mode
    # kernels per sample
    loss = jax.jit(lambda p, s: jnp.mean(r(p, s)))
    gk = jax.jit(jax.grad(lambda p, s: jnp.mean(r(p, s))))

    def bumped(leaf, e):
        p = dict(params)
        p[leaf] = params[leaf] + e
        return p

    n = 16
    for leaf in ("sigma_a", "sigma_s"):
        gs, fds = [], []
        pp, pm = bumped(leaf, h), bumped(leaf, -h)
        for i in range(n):
            s = jnp.int32(7000 + i)
            gs.append(float(gk(params, s)[leaf]))
            fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
        gm, gse = np.mean(gs), np.std(gs) / np.sqrt(n)
        fm, fse = np.mean(fds), np.std(fds) / np.sqrt(n)
        tol = 4.0 * np.hypot(gse, fse) + 0.08 * max(abs(gm), abs(fm))
        assert np.isfinite([gm, fm]).all()
        assert abs(gm - fm) < tol, (leaf, gm, gse, fm, fse)


def test_diff_hetero_guards():
    sc = foggy_cornell()
    # round 4: EA + diff_field is SUPPORTED (the Tr/T/pSuccess/dens(xt)
    # dI/dtheta chains landed with the generic field-param mechanism)
    r = make_diff_renderer(sc, CAM, W, H, SPP, distance="equiangular",
                           diff_field=True, tile_rows=8, interpret=True)
    g = jax.grad(lambda p, s: jnp.mean(r(p, s)))(
        pack_params(sc, with_field=True), jnp.int32(3))
    assert np.isfinite(float(g["fog_k"]))
    with pytest.raises(NotImplementedError, match="implicit"):
        make_diff_renderer(SCENE, CAM, W, H, SPP, nee=False, physical=False,
                           interpret=True)
    with pytest.raises(NotImplementedError, match="blobs"):
        make_diff_renderer(sc, CAM, W, H, SPP, diff_blobs=True,
                           interpret=True)   # exp_height scene
    with pytest.raises(ValueError, match="blobs"):
        pack_params(sc, with_blobs=True)


@pytest.mark.slow
def test_fog_k_grad_matches_crn_fd():
    """diff_field=True: dL/d(fog_k) from the traced-k backward (pathwise
    transmittance dI/dk terms + the free-flight event scores) agrees with
    CRN central FD of the pair's own forward within combined standard
    error. Forward parity with the baked kernel at the scene's own k is
    bit-near-exact (the traced scalar reads the same value from SMEM)."""
    sc = foggy_cornell()
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8, tile_rows=8,
                           diff_field=True, interpret=True)
    params = pack_params(sc, with_field=True)

    img = np.asarray(r(params, 3))
    run_ref = build_tile_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                                  tile_rows=8, interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.abs(img - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())

    loss = jax.jit(lambda p, s: jnp.mean(r(p, s)))
    gk = jax.jit(jax.grad(lambda p, s: jnp.mean(r(p, s))))
    h = 4e-3
    pp = dict(params); pp["fog_k"] = params["fog_k"] + h
    pm = dict(params); pm["fog_k"] = params["fog_k"] - h
    n = 16
    gs, fds = [], []
    for i in range(n):
        s = jnp.int32(9000 + i)
        gs.append(float(gk(params, s)["fog_k"]))
        fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
    gm, gse = np.mean(gs), np.std(gs) / np.sqrt(n)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(n)
    tol = 4.0 * np.hypot(gse, fse) + 0.08 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (gm, gse, fm, fse)


def test_fog_k_leaf_validation_and_guards():
    sc = foggy_cornell()
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8, tile_rows=8,
                           diff_field=True, interpret=True)
    with pytest.raises(ValueError, match="fog_k"):
        r(pack_params(sc), 3)            # missing leaf
    with pytest.raises(NotImplementedError, match="exp_height"):
        make_diff_renderer(SCENE, CAM, W, H, SPP, diff_field=True,
                           interpret=True)   # homogeneous scene
    with pytest.raises(NotImplementedError, match="exp_height"):
        make_diff_renderer(blob_cloud(), CAM, W, H, SPP, diff_field=True,
                           interpret=True)   # blob field params stay baked
    with pytest.raises(ValueError, match="exp_height"):
        pack_params(SCENE, with_field=True)


# ------------- voxel-grid gradients (diff_grid, round 4) -------------------
# The flagship beyond-reference capability: d(render)/d(voxel values) at
# kernel speed. Backward = per-sample two-phase replay (phase A learns the
# sample's weighted total radiance, phase B replays the identical PCG
# stream and scatters score + pathwise tau gradients immediately) with an
# MXU one-hot scatter (prims.grid_scatter_point roll identity).


@pytest.fixture(scope="module", params=["tri", "nearest"])
def grid_pair(request):
    sc = grid_cloud(interp=request.param)
    rg = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8, tile_rows=8,
                            interpret=True, diff_grid=True)
    return sc, rg


def test_diff_grid_fwd_matches_baked_kernel(grid_pair):
    """diff_grid's forward must stay BIT-IDENTICAL to the baked grid
    kernel (same packed table, same draws)."""
    sc, rg = grid_pair
    img = np.asarray(rg(pack_params(sc, with_grid=True), 3))
    run_ref = build_tile_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                                  tile_rows=8, interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-6


def test_diff_grid_guards():
    sc = grid_cloud()
    with pytest.raises(ValueError, match="tile_rows"):
        make_diff_renderer(sc, CAM, W, H, SPP, diff_grid=True,
                           tile_rows=32, interpret=True)
    with pytest.raises(ValueError, match="voxel-grid"):
        make_diff_renderer(SCENE, CAM, W, H, SPP, diff_grid=True,
                           tile_rows=8, interpret=True)
    r = make_diff_renderer(sc, CAM, W, H, SPP, tile_rows=8, diff_grid=True,
                           interpret=True)
    with pytest.raises(ValueError, match="grid"):
        r(pack_params(sc), 3)            # missing leaf
    with pytest.raises(ValueError, match="grid"):
        pack_params(SCENE, with_grid=True)


@pytest.mark.slow
def test_diff_grid_voxel_grads_match_crn_fd(grid_pair):
    """E[dL/dv] from the scatter backward agrees with common-random-number
    central FD of the pair's own forward (event flips supply the score
    mass; smooth chains cancel at matched seeds) on the highest-|g|
    voxel."""
    sc, rg = grid_pair
    pg = pack_params(sc, with_grid=True)
    loss = jax.jit(lambda pp, s: jnp.mean(rg(pp, s)))
    gfn = jax.jit(jax.grad(lambda pp, s: jnp.mean(rg(pp, s))))
    g0 = np.asarray(gfn(pg, jnp.int32(11))["grid"])
    vox = np.unravel_index(np.argmax(np.abs(g0)), g0.shape)
    h, K = 0.1, 20
    gs_, fds = [], []
    for k in range(K):
        s = jnp.int32(4000 + k)
        gs_.append(float(gfn(pg, s)["grid"][vox]))
        pp = dict(pg)
        pm = dict(pg)
        pp["grid"] = pg["grid"].at[vox].add(h)
        pm["grid"] = pg["grid"].at[vox].add(-h)
        fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
    gm, gse = np.mean(gs_), np.std(gs_) / np.sqrt(K)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(K)
    tol = 4.0 * np.hypot(gse, fse) + 0.1 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (vox, gm, gse, fm, fse)


@pytest.fixture(scope="module")
def grid_pair_ea():
    """diff_grid through the EQUI-ANGULAR family (round 5): Bernoulli(Tr)
    event scores + the explicit T/pSuccess/dens(xt) value chains."""
    sc = grid_cloud()
    rg = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8, tile_rows=8,
                            interpret=True, diff_grid=True,
                            distance="equiangular")
    return sc, rg


def test_diff_grid_ea_fwd_matches_baked_kernel(grid_pair_ea):
    sc, rg = grid_pair_ea
    img = np.asarray(rg(pack_params(sc, with_grid=True), 3))
    run_ref = build_tile_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                                  tile_rows=8, distance="equiangular",
                                  interpret=True)
    ref = np.asarray(run_ref(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-6


@pytest.mark.slow
def test_diff_grid_ea_voxel_grads_match_crn_fd(grid_pair_ea):
    """EA voxel gradients vs CRN central FD of the pair's own forward
    (the free-flight gate's idiom; Bernoulli flips supply the score mass,
    the T/pSuccess/dens chains the smooth mass)."""
    sc, rg = grid_pair_ea
    pg = pack_params(sc, with_grid=True)
    loss = jax.jit(lambda pp, s: jnp.mean(rg(pp, s)))
    gfn = jax.jit(jax.grad(lambda pp, s: jnp.mean(rg(pp, s))))
    g0 = np.asarray(gfn(pg, jnp.int32(11))["grid"])
    assert np.isfinite(g0).all()
    vox = np.unravel_index(np.argmax(np.abs(g0)), g0.shape)
    h, K = 0.1, 20
    gs_, fds = [], []
    for k in range(K):
        s = jnp.int32(4000 + k)
        gs_.append(float(gfn(pg, s)["grid"][vox]))
        pp = dict(pg)
        pm = dict(pg)
        pp["grid"] = pg["grid"].at[vox].add(h)
        pm["grid"] = pg["grid"].at[vox].add(-h)
        fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
    gm, gse = np.mean(gs_), np.std(gs_) / np.sqrt(K)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(K)
    tol = 4.0 * np.hypot(gse, fse) + 0.1 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (vox, gm, gse, fm, fse)


# ------------- traced blob parameters (diff_blobs, round 4) ----------------


@pytest.fixture(scope="module")
def render_blobs():
    return make_diff_renderer(blob_cloud(), CAM, W, H, SPP, max_bounces=8,
                              tile_rows=8, interpret=True, diff_blobs=True)


def test_diff_blobs_fwd_matches_baked_kernel(render_blobs):
    sc = blob_cloud()
    img = np.asarray(render_blobs(pack_params(sc, with_blobs=True), 3))
    ref = np.asarray(build_tile_renderer(sc, CAM, W, H, SPP, max_bounces=8,
                                         tile_rows=8, interpret=True)(3))
    assert np.isfinite(img).all()
    assert np.abs(img - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


@pytest.mark.slow
@pytest.mark.parametrize("bi,ci,h", [
    (0, 4, 0.05),    # blob weight
    (0, 1, 0.5),     # center y
    (1, 3, 0.3),     # radius
])
def test_blob_param_grads_match_crn_fd(render_blobs, bi, ci, h):
    """dL/d(blob param) from the closed-form erf-pair derivatives
    (prims.field_blob_tau_grads) + event scores agrees with CRN central
    FD of the pair's own forward."""
    pb = pack_params(blob_cloud(), with_blobs=True)
    loss = jax.jit(lambda p, s: jnp.mean(render_blobs(p, s)))
    gfn = jax.jit(jax.grad(lambda p, s: jnp.mean(render_blobs(p, s))))
    K = 16
    gs_, fds = [], []
    for k in range(K):
        s = jnp.int32(900 + k)
        gs_.append(float(gfn(pb, s)["blobs"][bi, ci]))
        pp = dict(pb)
        pm = dict(pb)
        pp["blobs"] = pb["blobs"].at[bi, ci].add(h)
        pm["blobs"] = pb["blobs"].at[bi, ci].add(-h)
        fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
    gm, gse = np.mean(gs_), np.std(gs_) / np.sqrt(K)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(K)
    tol = 4.0 * np.hypot(gse, fse) + 0.1 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (bi, ci, gm, gse, fm, fse)


@pytest.mark.slow
def test_fog_k_grad_matches_crn_fd_equiangular():
    """Round 4: fog_k through the EQUI-ANGULAR family — the Bernoulli(Tr)
    event scores and the t_xt / pSuccess / dens(xt) pathwise dI/dk chains
    agree with CRN central FD."""
    sc = foggy_cornell()
    r = make_diff_renderer(sc, CAM, W, H, SPP, max_bounces=8, tile_rows=8,
                           distance="equiangular", diff_field=True,
                           interpret=True)
    params = pack_params(sc, with_field=True)
    loss = jax.jit(lambda p, s: jnp.mean(r(p, s)))
    gfn = jax.jit(jax.grad(lambda p, s: jnp.mean(r(p, s))))
    h, K = 5e-3, 16
    gs_, fds = [], []
    for k in range(K):
        s = jnp.int32(3100 + k)
        gs_.append(float(gfn(params, s)["fog_k"]))
        pp = dict(params)
        pm = dict(params)
        pp["fog_k"] = params["fog_k"] + h
        pm["fog_k"] = params["fog_k"] - h
        fds.append((float(loss(pp, s)) - float(loss(pm, s))) / (2 * h))
    gm, gse = np.mean(gs_), np.std(gs_) / np.sqrt(K)
    fm, fse = np.mean(fds), np.std(fds) / np.sqrt(K)
    tol = 4.0 * np.hypot(gse, fse) + 0.1 * max(abs(gm), abs(fm))
    assert np.isfinite([gm, fm]).all()
    assert abs(gm - fm) < tol, (gm, gse, fm, fse)
