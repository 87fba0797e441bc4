"""Fused Pallas kernel tests (interpret mode on CPU — SURVEY §7.6 keeps the
XLA engine as the reference implementation for the kernel's tests)."""
import numpy as np
import pytest

import vpt
from vpt.kernels.wavefront import build_tile_renderer

SCENE = vpt.cornell_vpt()
CAM = vpt.default_camera()


@pytest.mark.slow
def test_pallas_explicit_matches_engine_statistically():
    W, H, SPP = 32, 16, 64
    run = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=True,
                              max_bounces=16, interpret=True)
    img = np.clip(np.asarray(run(0)).reshape(H, W, 3), 0, 1)
    assert np.isfinite(img).all() and (img >= 0).all()
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="explicit_free", max_bounces=16,
                           chunk_pixels=W * H, renderer="scan")
    ref = np.clip(np.asarray(vpt.render(SCENE, CAM, cfg)), 0, 1)
    assert np.isclose(img.mean(), ref.mean(), rtol=0.2), (img.mean(), ref.mean())
    # structural agreement within the estimator's own noise ceiling
    c = np.corrcoef(img.ravel(), ref.ravel())[0, 1]
    assert c > 0.5, c


def test_pallas_deterministic_and_seed_sensitive():
    W, H, SPP = 16, 8, 4
    run = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=True,
                              max_bounces=6, interpret=True)
    a = np.asarray(run(3))
    b = np.asarray(run(3))
    c = np.asarray(run(4))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert np.isfinite(a).all()


def test_pallas_ld_sampler_deterministic_and_unbiased():
    """sampler="ld" (CP-rotated R3 stratification of pixel jitter + the
    depth-0 distance draw): still seed-deterministic/seed-sensitive, and
    the Cranley-Patterson rotation keeps the estimator's expectation equal
    to the PCG sampler's — means agree over a small seed ensemble."""
    W, H, SPP = 16, 8, 16
    run_r = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=True,
                                max_bounces=6, interpret=True)
    run_l = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=True,
                                max_bounces=6, sampler="ld", interpret=True)
    a = np.asarray(run_l(3))
    assert np.array_equal(a, np.asarray(run_l(3)))
    assert not np.array_equal(a, np.asarray(run_l(4)))
    assert np.isfinite(a).all() and (a >= 0).all()
    # clamped means (identical estimator both modes — clipping commutes
    # with the expectation equality) tame the RR-boosted radiance tail;
    # tolerance from the random sampler's own seed spread
    lm = [float(np.clip(np.asarray(run_l(s)), 0, 1).mean()) for s in range(8)]
    rm = [float(np.clip(np.asarray(run_r(s)), 0, 1).mean()) for s in range(8)]
    ml, mr = np.mean(lm), np.mean(rm)
    se = np.hypot(np.std(lm), np.std(rm)) / np.sqrt(8)
    assert abs(ml - mr) < 4.0 * se + 0.03 * mr, (ml, mr, se)


def test_scatter_tiles_bit_exact():
    """scatter_tiles mode: per-program bases reproduce the contiguous
    renderer BIT-exactly, in any tile order (PCG streams are keyed by
    global pixel id, not by program id)."""
    import jax.numpy as jnp

    W, H, SPP = 64, 32, 4
    rn = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=5,
                             tile_rows=8, interpret=True)
    rs = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=5,
                             tile_rows=8, scatter_tiles=True, interpret=True)
    n_tiles, lanes = rn.num_tiles, rn.lanes_per_tile
    assert n_tiles >= 2
    full = np.asarray(rn.make_raw(n_tiles)(jnp.int32(3), jnp.int32(0)))
    bases = (jnp.arange(n_tiles) * lanes).astype(jnp.int32)
    scat = np.asarray(rs.make_raw_scatter(n_tiles)(jnp.int32(3), bases))
    assert np.array_equal(full, scat)
    rev = np.asarray(rs.make_raw_scatter(n_tiles)(jnp.int32(3), bases[::-1]))
    assert np.array_equal(full,
                          rev.reshape(n_tiles, lanes, 3)[::-1].reshape(-1, 3))


@pytest.mark.slow  # ~400s: two interpret compiles (scatter + dense)
def test_render_adaptive_unbiased_and_finite():
    """render_adaptive: finite, right shape, deterministic per seed, and
    the clamped mean agrees with the plain renderer over a seed ensemble
    (the count-weighted combination is unbiased up to the documented
    two-pass reuse correlation — far below this tolerance)."""
    W, H, SPP = 64, 32, 4
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP, max_bounces=5)
    a = np.asarray(vpt.render_adaptive(SCENE, CAM, cfg, boost=2.0, frac=0.5,
                                       interpret=True))
    assert a.shape == (H, W, 3) and np.isfinite(a).all() and (a >= 0).all()
    b = np.asarray(vpt.render_adaptive(SCENE, CAM, cfg, boost=2.0, frac=0.5,
                                       interpret=True))
    assert np.array_equal(a, b)
    run = build_tile_renderer(SCENE, CAM, W, H, SPP, max_bounces=5,
                              interpret=True)
    am = [float(np.clip(np.asarray(
        vpt.render_adaptive(SCENE, CAM, cfg, boost=2.0, frac=0.5, seed=s,
                            interpret=True)), 0, 1).mean())
        for s in range(6)]
    rm = [float(np.clip(np.asarray(run(s)), 0, 1).mean()) for s in range(6)]
    ml, mr = np.mean(am), np.mean(rm)
    se = np.hypot(np.std(am), np.std(rm)) / np.sqrt(6)
    assert abs(ml - mr) < 4.0 * se + 0.05 * mr, (ml, mr, se)


@pytest.mark.slow
def test_pallas_equiangular_matches_engine_statistically():
    W, H, SPP = 32, 16, 96
    run = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=True,
                              distance="equiangular", max_bounces=12,
                              interpret=True)
    img = np.clip(np.asarray(run(0)).reshape(H, W, 3), 0, 1)
    assert np.isfinite(img).all() and (img >= 0).all()
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="explicit_equiangular", max_bounces=12,
                           chunk_pixels=W * H, renderer="scan")
    ref = np.clip(np.asarray(vpt.render(SCENE, CAM, cfg)), 0, 1)
    assert np.isclose(img.mean(), ref.mean(), rtol=0.3), (img.mean(), ref.mean())
    c = np.corrcoef(img.ravel(), ref.ravel())[0, 1]
    assert c > 0.45, c


@pytest.mark.slow
def test_pallas_implicit_free_matches_engine_statistically():
    """The implicit (no-NEE) kernel estimator carries the reference's
    sigma_s*T/(ffProb*(1-Tr)) weighting (vptShadeMethods.h:977,1006) —
    round 1 silently used the explicit family's PBRT-cancelled weight."""
    import jax
    W, H, SPP = 24, 16, 128
    run = build_tile_renderer(SCENE, CAM, W, H, SPP, nee=False,
                              max_bounces=12, interpret=True)
    imgs = [np.clip(np.asarray(run(s)).reshape(H, W, 3), 0, 1)
            for s in (0, 1, 2)]
    assert all(np.isfinite(i).all() for i in imgs)
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="implicit_free", max_bounces=12,
                           chunk_pixels=W * H, renderer="scan")
    refs = [np.clip(np.asarray(vpt.render(SCENE, CAM, cfg,
                                          key=jax.random.PRNGKey(s))), 0, 1)
            for s in (0, 1, 2)]
    # the implicit estimator is emitter-hit-only: clipped means carry real
    # seed-to-seed spread even at 3x128 spp, hence the averaged comparison
    a, b = np.mean([i.mean() for i in imgs]), np.mean([r.mean() for r in refs])
    assert np.isclose(a, b, rtol=0.35), (a, b)


@pytest.mark.slow
def test_pallas_clamped_ea_matches_engine_statistically():
    """implicit_equiangular (clamped foot-point parameterization,
    volumetricBasicFunctions.h:180-207) through renderer='pallas'."""
    W, H, SPP = 24, 16, 128
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="implicit_equiangular", max_bounces=12,
                           chunk_pixels=W * H)
    from vpt.kernels.wavefront import render_pallas
    img = np.clip(np.asarray(render_pallas(SCENE, CAM, cfg, interpret=True)),
                  0, 1)
    assert np.isfinite(img).all()
    import dataclasses
    ref = np.clip(np.asarray(vpt.render(
        SCENE, CAM, dataclasses.replace(cfg, renderer="scan"))), 0, 1)
    assert np.isclose(img.mean(), ref.mean(), rtol=0.3), (img.mean(), ref.mean())


@pytest.mark.slow
def test_pallas_medium_shell_matches_engine_statistically():
    """material-3 shells: the pLight multipleT visibility cascade runs
    in-kernel (vptShadeMethods.h:66-72); medium_shell via renderer='pallas'
    agrees with the XLA engine."""
    from vpt.scene.scene import medium_shell
    scene = medium_shell()
    W, H, SPP = 24, 16, 64
    cfg = vpt.RenderConfig(width=W, height=H, spp=SPP,
                           integrator="explicit_free", max_bounces=10,
                           chunk_pixels=W * H)
    from vpt.kernels.wavefront import render_pallas
    img = np.clip(np.asarray(render_pallas(scene, CAM, cfg, interpret=True)),
                  0, 1)
    assert np.isfinite(img).all()
    import dataclasses
    ref = np.clip(np.asarray(vpt.render(
        scene, CAM, dataclasses.replace(cfg, renderer="scan"))), 0, 1)
    assert np.isclose(img.mean(), ref.mean(), rtol=0.25), (img.mean(), ref.mean())
    # per-pixel correlation is firefly-dominated at this spp (the 4000-power
    # point light); compare coarse block means instead
    bi = img.reshape(4, 4, 6, 4, 3).mean(axis=(1, 3))
    br = ref.reshape(4, 4, 6, 4, 3).mean(axis=(1, 3))
    rel = np.abs(bi - br) / (np.abs(br) + 5e-3)
    assert np.median(rel) < 0.35, np.median(rel)
