"""Henyey-Greenstein anisotropic phase function (media/medium.py — no
reference counterpart; the reference medium is strictly isotropic).

Contracts:
  * hg_phase is a normalized pdf for any g, and hg_phase(., 0) is
    bit-identical to the isotropic 1/4pi;
  * phase_sample importance-samples hg_phase exactly: the sufficient
    statistic E[cos theta] equals g (the defining property of HG), and at
    g == 0 the draws reproduce the reference isotropic sampler bit-for-bit
    (so g == 0 scenes render byte-identically through the engine);
  * explicit (NEE with the hg value toward the light) and implicit
    (phase-sampling only) estimators agree in an anisotropic medium — the
    cross-check that ties hg_phase and phase_sample to the SAME transport
    solution;
  * the fused Pallas kernels reject g != 0 and the auto renderer falls
    back to the engine.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

import vpt
from vpt.media.medium import (INV_4PI, hg_phase, isotropic_phase_sample,
                              phase_sample)

CAM = vpt.default_camera()


@pytest.mark.parametrize("g", [0.0, 0.3, 0.7, -0.5, 0.9])
def test_hg_phase_normalized(g):
    c = np.linspace(-1.0, 1.0, 100001)
    p = np.asarray(hg_phase(jnp.asarray(c), g), np.float64)
    norm = 2.0 * math.pi * np.trapezoid(p, c)
    assert abs(norm - 1.0) < 2e-3, (g, norm)


def test_hg_phase_g0_is_exactly_inv4pi():
    c = jnp.linspace(-1.0, 1.0, 1001)
    assert bool(jnp.all(hg_phase(c, 0.0) == INV_4PI))


@pytest.mark.parametrize("g", [0.7, -0.5, 0.3])
def test_phase_sample_mean_cosine_is_g(g):
    rng = np.random.default_rng(1)
    n = 200000
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.6, -0.48, 0.64]), (n, 3))  # unit
    wi, pdf = phase_sample(d, jnp.float32(g), u1, u2)
    cos = np.asarray((wi * d).sum(-1))
    se = cos.std() / math.sqrt(n)
    assert abs(cos.mean() - g) < 5 * se + 1e-3, (g, cos.mean())
    # returned pdf is the phase value at the sampled direction
    np.testing.assert_allclose(np.asarray(pdf),
                               np.asarray(hg_phase(jnp.asarray(cos), g)),
                               rtol=2e-3, atol=1e-6)


def test_phase_sample_g0_bitwise_isotropic():
    rng = np.random.default_rng(2)
    u1 = jnp.asarray(rng.uniform(size=4096), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=4096), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4096, 3))
    wi, pdf = phase_sample(d, jnp.float32(0.0), u1, u2)
    iso, _ = isotropic_phase_sample(u1, u2)
    assert bool(jnp.all(wi == iso))
    assert bool(jnp.all(pdf == INV_4PI))


OPEN_FOG = dict(
    spheres=[(30.0, (0.0, 11.0, 120.0), (0, 0, 0), (8, 7, 6), 0,
              (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.001, sigma_s=0.02,
)


@pytest.mark.slow
def test_estimator_agreement_anisotropic():
    """explicit (hg value at the NEE direction) vs implicit (hg sampling
    only) must estimate the same integral — a mismatch between hg_phase
    and phase_sample would push them apart. Uses the PHYSICAL pair: the
    quirk modes differ from each other by design (terminal-RR cp on the
    explicit's visible emitter; the implicit's (1-Tr) inflation, which
    forward scattering toward the light sphere amplifies — measured 2.44
    vs 3.64 where the physical pair gives 2.99 vs 2.97)."""
    scene = vpt.make_scene(g=0.7, **OPEN_FOG)

    def probe(integrator, spp):
        cfg = vpt.RenderConfig(width=24, height=18, spp=spp,
                               integrator=integrator, max_bounces=24,
                               chunk_pixels=432, renderer="scan")
        return np.asarray(vpt.render(scene, CAM, cfg))

    a = probe("explicit_free_physical", 128)
    b = probe("implicit_free_physical", 512)
    assert np.isclose(a.mean(), b.mean(), rtol=0.1), (a.mean(), b.mean())


def test_anisotropy_changes_the_image():
    imgs = {}
    for g in (0.8, 0.0, -0.8):
        scene = vpt.make_scene(g=g, **OPEN_FOG)
        cfg = vpt.RenderConfig(width=24, height=18, spp=32,
                               integrator="explicit_free", max_bounces=12,
                               chunk_pixels=432, renderer="scan")
        imgs[g] = np.asarray(vpt.render(scene, CAM, cfg))
    # forward vs backward scattering redistribute the in-scattered glow
    assert not np.allclose(imgs[0.8], imgs[-0.8], rtol=0.05)
    assert not np.allclose(imgs[0.8], imgs[0.0], rtol=0.05)


def test_fused_kernel_rejects_anisotropy():
    from vpt.kernels.wavefront import build_tile_renderer

    scene = vpt.make_scene(g=0.5, **OPEN_FOG)
    with pytest.raises(NotImplementedError, match="isotropic-only"):
        build_tile_renderer(scene, CAM, 16, 8, 4, interpret=True)
    # the auto renderer must fall back to the engine, not raise
    cfg = vpt.RenderConfig(width=16, height=8, spp=2, max_bounces=4,
                           integrator="explicit_free", chunk_pixels=128)
    img = np.asarray(vpt.render(scene, CAM, cfg))
    assert np.isfinite(img).all()
