"""Golden-image comparison against the rebuilt reference renderer.

tests/data/golden_cornell_linear.npz holds the NaN-masked linear mean of
32 independent 4-spp reference renders (1024x768, active integrator
iterativeVPTracerFree, sigma_a=0.001 sigma_s=0.009), block-downsampled 16x
(ds16: 48x64) and 8x (ds8: 96x128). "NaN-masked" matters: the reference
binary emits NaN samples at ~0.5%/sample — concentrated on the microfacet
sphere where its Beckmann NDF divides 0/0 (microFacetUtilities.h:42-44) —
so its own high-spp renders are mostly NaN pixels and the golden keeps the
finite samples only. That masking plus the point-NEE fp-lottery residual
(media/nee.py) bounds achievable agreement at a few percent; tolerances
below reflect that, not looseness in the port.

Round-2 update: the NaN mechanism is now fully understood — the reference's
unqualified `abs` on doubles is the C INTEGER abs (see core/replay._cabs),
so every microfacet fr/pdf denominator truncates to 0. Whole-path
correctness is no longer carried by this statistical golden at all:
tests/test_replay_parity.py proves BIT-EXACT seed-matched agreement of
complete paths against the rebuilt reference (max rel err 0 over 1200
paths). This golden remains as an end-to-end image-level smoke against an
estimator that deliberately diverges from the broken int-abs semantics
(true-abs epsilon 1e-4, finite microfacet math).
"""
import os

import numpy as np
import pytest

import vpt
from vpt.io.ppm import tonemap

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "golden_cornell_linear.npz")


@pytest.mark.slow
@pytest.mark.golden
@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden ensemble not generated — "
                           "tools/make_golden.py")
def test_matches_reference_render_structure():
    """Image-level agreement with the reference's own renderer.

    Why the thresholds stop here (round-4 measurement,
    .scratch/golden_probe.py): the agreement ASYMPTOTE is corr ~= 0.923
    / median rel ~= 0.068 / mean ratio 1.14 — flat from 28 to 40
    effective spp on our side, so it is NOT Monte-Carlo noise. The gap
    is the reference's int-abs microfacet NaN factory (~0.5% of samples
    NaN and get masked out of the golden, biasing it DARK in every
    microfacet-lit block; BASELINE.md round-2 discovery). Tightening to
    corr > 0.97 would require reproducing the NaN deletions, i.e.
    shipping the reference's bug in the production renderer — whole-path
    correctness is instead pinned bit-exactly by the replay oracle
    (tests/test_replay_parity.py), which DOES reproduce the broken
    semantics where they belong: in the test oracle."""
    g = np.load(GOLDEN)["ds16"]
    scene = vpt.cornell_vpt()
    cam = vpt.default_camera()
    # identical pipeline to the golden: per-run 4-spp mean, clamp+gamma
    # quantize, decode, average, downsample
    acc = np.zeros((768, 1024, 3))
    runs = 3
    for i in range(runs):
        cfg = vpt.RenderConfig(width=1024, height=768, spp=4, max_bounces=32,
                               chunk_pixels=98304, seed=500 + i)
        img = np.asarray(vpt.render(scene, cam, cfg))
        acc += np.power(tonemap(img) / 255.0, 2.2)
    ours = (acc / runs).reshape(48, 16, 64, 16, 3).mean(axis=(1, 3))

    # overall energy within 20% (ours keeps samples the reference NaNs away)
    assert np.isclose(ours.mean(), g.mean(), rtol=0.20), (ours.mean(), g.mean())
    # per-block structure (measured at 3 runs: med ~0.092, p95 ~0.53)
    rel = np.abs(ours - g) / (np.abs(g) + 1e-3)
    assert np.percentile(rel, 50) < 0.12, np.percentile(rel, 50)
    assert np.percentile(rel, 95) < 0.65, np.percentile(rel, 95)
    # spatial correlation: the images are the same picture
    c = np.corrcoef(ours.ravel(), g.ravel())[0, 1]
    assert c > 0.90, c   # ~12 effective spp here; 40-spp runs reach ~0.93
