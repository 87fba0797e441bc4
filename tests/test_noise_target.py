"""render_to_noise: variance-targeted stopping (vpt/api/noise.py).

Statistical contracts on a tiny scene: the Welford SE estimate tracks the
true 1/sqrt(n) Monte-Carlo decay, tighter targets consume more samples,
and the budget cap is honored.
"""
import numpy as np

import vpt

SCENE = vpt.make_scene(
    [(30.0, (0.0, 11.0, 120.0), (0, 0, 0), (8, 7, 6), 0,
      (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.002, sigma_s=0.012,
)
CAM = vpt.default_camera()
CFG = vpt.RenderConfig(width=16, height=12, spp=8, max_bounces=8,
                       integrator="explicit_free", renderer="scan",
                       chunk_pixels=192)


def test_stops_when_target_reached():
    img, spp, achieved = vpt.render_to_noise(
        SCENE, CAM, CFG, target_rel_se=0.08, max_spp=1024)
    assert achieved <= 0.08
    assert spp < 1024                      # converged before the cap
    assert np.isfinite(img).all() and img.shape == (12, 16, 3)


def test_tighter_target_needs_more_samples():
    _, spp_loose, _ = vpt.render_to_noise(
        SCENE, CAM, CFG, target_rel_se=0.10, max_spp=1024)
    _, spp_tight, _ = vpt.render_to_noise(
        SCENE, CAM, CFG, target_rel_se=0.03, max_spp=1024)
    assert spp_tight > spp_loose, (spp_loose, spp_tight)


def test_budget_cap_honored():
    _, spp, achieved = vpt.render_to_noise(
        SCENE, CAM, CFG, target_rel_se=1e-5, max_spp=64)
    assert spp <= 64
    assert achieved > 1e-5                 # impossible target, capped out


def test_cli_target_noise(tmp_path):
    from vpt.cli import main

    out = tmp_path / "n.ppm"
    rc = main(["8", "--width", "16", "--height", "12", "--max-bounces", "4",
               "--renderer", "scan", "--chunk-pixels", "192",
               "--target-noise", "0.1", "--max-spp", "256",
               "-o", str(out)])
    assert rc == 0 and out.exists()


def test_fused_kernel_path_interpret():
    import dataclasses

    cfg = dataclasses.replace(CFG, renderer="pallas", spp=16,
                              width=16, height=8)
    img, spp, achieved = vpt.render_to_noise(
        SCENE, CAM, cfg, target_rel_se=1.0, max_spp=48, interpret=True)
    assert np.isfinite(img).all() and img.shape == (8, 16, 3)
    assert spp <= 48 and achieved < 1.0
