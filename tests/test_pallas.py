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
