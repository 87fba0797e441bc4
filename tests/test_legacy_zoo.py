"""Per-variant fidelity tests for the legacy integrator zoo
(integrators/legacy.py). Each test asserts a DISTINGUISHING behavior of the
reference estimator, not just finiteness (VERDICT r1 §2.9 / next-round #4).

Scene tricks: with sigma_s = 0 every medium term vanishes (NEE carries a
sigma_s factor, continuations carry sigma_s/sigma_t), so surface behavior is
isolated; emitter-credit rules then show up exactly on camera rays that hit
a light directly.
"""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpt
from vpt.integrators.legacy import (LEGACY_INTEGRATORS, LegacySpec,
                                    trace_legacy)
from vpt.integrators import engine
from vpt.scene import camera as cam

KEY = jax.random.PRNGKey(5)


def _rays_at(origin, target, n):
    o = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (n, 3))
    d = jnp.asarray(target, jnp.float32) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


# one emitter sphere straight ahead, absorbing medium, nothing else
LIGHT_AHEAD = vpt.make_scene(
    [(10.0, (0.0, 0.0, -100.0), (0, 0, 0), (50.0, 40.0, 30.0), 0,
      (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.01, sigma_s=0.0,
)

# a lit wall: big lambert wall ahead + one point light between camera & wall
WALL_POINT = vpt.make_scene(
    [(1e4, (0.0, 0.0, -1e4 - 120.0), (0.7, 0.7, 0.7), (0, 0, 0), 0,
      (0, 0, 0), (0, 0, 0), 0.0),
     (0.0, (30.0, 30.0, -60.0), (0, 0, 0), (5000.0, 4000.0, 3000.0), 0,
      (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.004, sigma_s=0.0,
)

# sphere (area) lights ONLY — the legacy point-only NEE sees nothing
WALL_SPHERELIGHT = vpt.make_scene(
    [(1e4, (0.0, 0.0, -1e4 - 120.0), (0.7, 0.7, 0.7), (0, 0, 0), 0,
      (0, 0, 0), (0, 0, 0), 0.0),
     (5.0, (30.0, 30.0, -60.0), (0, 0, 0), (60.0, 60.0, 60.0), 0,
      (0, 0, 0), (0, 0, 0), 0.0)],
    sigma_a=0.004, sigma_s=0.0,
)


def _render(scene, name, o, d, key=KEY, **spec_kw):
    spec = dataclasses.replace(LEGACY_INTEGRATORS[name], **spec_kw)
    return np.asarray(trace_legacy(scene, spec, o, d, key))


def test_minimal_implicit_credits_radiance_times_T():
    """rt.cpp:312-314: Lo = radiance * exp(-sigma_t t) — the engine-style
    credit WITHOUT T would return the raw radiance."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -100.0), 8)
    L = _render(LIGHT_AHEAD, "vpt_minimal_implicit", o, d)
    t_hit = 90.0                      # sphere r=10 centered at z=-100
    expect = np.asarray(LIGHT_AHEAD.radiance[0]) * math.exp(-0.01 * t_hit)
    assert np.allclose(L, expect[None, :], rtol=1e-4), (L[0], expect)


def test_minimal_implicit_kills_at_non_emitter_surface():
    """rt.cpp:333-336: reaching a non-emitter surface returns black — no
    surface shading exists in this estimator."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -120.0), 64)
    L = _render(WALL_POINT, "vpt_minimal_implicit", o, d)
    assert np.all(L == 0.0)


def test_explicit_single_light_credit_is_depth0_with_Tr():
    """rt.cpp:377-380: depth-0 emitter hit returns radiance * Tr(o, x) —
    round 1 credited without the transmittance factor."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -100.0), 8)
    L = _render(LIGHT_AHEAD, "explicit_single_light", o, d, fixed_light=0)
    expect = np.asarray(LIGHT_AHEAD.radiance[0]) * math.exp(-0.01 * 90.0)
    assert np.allclose(L, expect[None, :], rtol=1e-4)


def test_explicit_single_light_surface_is_black_without_scattering():
    """rt.cpp:395-401: d >= t returns black — a lit wall renders 0 when
    sigma_s = 0 (all contributions are medium NEE)."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -120.0), 64)
    L = _render(WALL_POINT, "explicit_single_light", o, d, fixed_light=1)
    assert np.all(L == 0.0)


def test_explicit_single_light2_never_credits_emitters():
    """rt.cpp:603-740 has NO radiance check at all: staring into the light
    gives 0 (vs explicit_single_light's depth-0 credit)."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -100.0), 8)
    L = _render(LIGHT_AHEAD, "explicit_single_light2", o, d, fixed_light=0)
    assert np.all(L == 0.0)


@pytest.mark.slow
def test_explicit_single_light2_rr_double_counts_nee():
    """rt.cpp:716 weights the NEE term 1/q on RR-kill AND 1/cp on continue
    (:736): E[weight] = 2 — the estimator converges to TWICE the
    single-scatter integral. Checked against numpy quadrature."""
    scene = vpt.make_scene(
        [(1e4, (0.0, 0.0, -1e4 - 200.0), (0, 0, 0), (0, 0, 0), 0,
          (0, 0, 0), (0, 0, 0), 0.0),
         (0.0, (0.0, 60.0, -100.0), (0, 0, 0), (8000.0, 8000.0, 8000.0), 0,
          (0, 0, 0), (0, 0, 0), 0.0)],
        sigma_a=0.002, sigma_s=0.004,
    )
    st = 0.006
    n = 120000
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -200.0), n)
    keys = jax.random.split(KEY, 6)
    Ls = [np.asarray(trace_legacy(
        scene, dataclasses.replace(LEGACY_INTEGRATORS["explicit_single_light2"],
                                   fixed_light=1), o[:20000], d[:20000], k))
        for k in keys]
    est = np.mean(np.concatenate(Ls), axis=0)

    # quadrature of the single-scatter integral along the ray
    s = np.linspace(0.0, 200.0, 4001)
    light = np.array([0.0, 60.0, -100.0])
    x = np.stack([np.zeros_like(s), np.zeros_like(s), -s], -1)
    dl = np.linalg.norm(light - x, axis=-1)
    integrand = (np.exp(-st * s) * 0.004 * np.exp(-st * dl)
                 / (4 * math.pi * dl * dl))
    single = np.trapezoid(integrand, s) * 8000.0
    ratio = est[0] / (2.0 * single)
    # multi-scatter adds a small positive tail; the quirk factor 2 dominates
    assert 0.9 < ratio < 1.25, (est[0], single, ratio)


def test_vpt3alt_stale_ld_double_adds_point_light():
    """vptShadeMethods.h:357-380: the spherical-source loop iteration has no
    body, so the previous POINT source's Ld is added again. A negligible
    sphere light AFTER the point light in scene order ~doubles the image."""
    base = [(1e4, (0.0, 0.0, -1e4 - 200.0), (0, 0, 0), (0, 0, 0), 0,
             (0, 0, 0), (0, 0, 0), 0.0),
            (0.0, (0.0, 60.0, -100.0), (0, 0, 0), (8000.0, 8000.0, 8000.0),
             0, (0, 0, 0), (0, 0, 0), 0.0)]
    ghost = base + [(4.0, (500.0, 500.0, -100.0), (0, 0, 0),
                     (1e-6, 1e-6, 1e-6), 0, (0, 0, 0), (0, 0, 0), 0.0)]
    sa, ss = 0.002, 0.004
    A = vpt.make_scene(base, sigma_a=sa, sigma_s=ss)
    B = vpt.make_scene(ghost, sigma_a=sa, sigma_s=ss)
    n = 40000
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -200.0), n)
    la = _render(A, "vpt3_all_lights", o, d).mean(0)
    lb = _render(B, "vpt3_all_lights", o, d,
                 key=jax.random.PRNGKey(17)).mean(0)
    # with the ghost sphere light present, the point term is added twice
    # (prob_source does not divide in 3alt — all sources iterated)
    ratio = lb[0] / la[0]
    assert 1.7 < ratio < 2.3, (la[0], lb[0], ratio)


def test_recursive_and_iterative_are_blind_to_sphere_lights():
    """vptShadeMethods.h:585-591/752-758 (surface NEE) and :637/:793 (medium
    NEE) handle POINT sources only, and neither credits emitter hits: a
    sphere-light-only scene renders exactly black."""
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -120.0), 256)
    for name in ("vpt_recursive", "vpt_iterative"):
        L = _render(WALL_SPHERELIGHT, name, o, d)
        assert np.all(L == 0.0), name
    # sanity: the modern engine DOES see the sphere light on the same rays
    spec = engine.IntegratorSpec(max_bounces=8)
    Le = np.asarray(engine.trace(WALL_SPHERELIGHT, spec, o, d, KEY))
    assert Le.mean() > 0


def test_vpt3_plight_without_trs_brightens_vs_recursive():
    """vpt3's surface NEE omits the Trs transmittance (vptShadeMethods.h:137
    has no Trs factor; :588 in the iterative family multiplies it). With a
    thick absorbing medium the vpt3 wall is brighter by ~exp(sigma_t *
    light distance)."""
    sa = 0.01
    scene = vpt.make_scene(
        [(1e4, (0.0, 0.0, -1e4 - 120.0), (0.7, 0.7, 0.7), (0, 0, 0), 0,
          (0, 0, 0), (0, 0, 0), 0.0),
         (0.0, (0.0, 40.0, -80.0), (0, 0, 0), (5000.0, 5000.0, 5000.0), 0,
          (0, 0, 0), (0, 0, 0), 0.0)],
        sigma_a=sa, sigma_s=0.0,
    )
    n = 4096
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -120.0), n)
    l3 = _render(scene, "vpt3", o, d).mean()
    lr = _render(scene, "vpt_recursive", o, d).mean()
    # Trs over the ~57-unit light->wall distance: e^{0.01*57} ~ 1.77; the
    # estimators also differ in RR/continuation weights, so assert a loose
    # but directional separation
    assert l3 > 1.3 * lr, (l3, lr)


def test_vpt3_no_emitter_credit():
    o, d = _rays_at((0.0, 0.0, 0.0), (0.0, 0.0, -100.0), 16)
    L = _render(LIGHT_AHEAD, "vpt3", o, d)
    # staring into the light: no radiance credit exists in vpt3
    assert np.all(L[:, 0] < 1.0), L[:5]


@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n == "vpt3" else n
     for n in sorted(LEGACY_INTEGRATORS)])
def test_legacy_smoke_cornell(name):
    """Every legacy name runs on the Cornell scene through the public API
    and produces finite output."""
    cfg = vpt.RenderConfig(width=12, height=8, spp=4, max_bounces=8,
                           integrator=name, chunk_pixels=96)
    img = np.asarray(vpt.render(vpt.cornell_vpt(), vpt.default_camera(), cfg))
    assert img.shape == (8, 12, 3)
    assert np.isfinite(img).all(), name
