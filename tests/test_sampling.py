"""Statistical unit tests for samplers and pdfs (SURVEY.md §4.1-.2).

Closed-form checks: free-flight mean = 1/sigma_t, equi-angular pdf
normalization, Beckmann NDF projected-area normalization, cone pdf solid
angle, cosine-hemisphere moments, Fresnel limits, transmittance symmetry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt.sampling import directional as ds
from vpt.sampling import distance as dist
from vpt.bxdf import microfacet as mf
from vpt.bxdf import dielectric as dl
from vpt.media import medium as med

KEY = jax.random.PRNGKey(7)
N = 200_000


def _u(k, n=N):
    return jax.random.uniform(jax.random.fold_in(KEY, k), (n,))


def test_free_flight_mean_and_pdf():
    sigma_t = 0.25
    d = dist.free_flight_sample(sigma_t, _u(0))
    assert np.isclose(float(d.mean()), 1.0 / sigma_t, rtol=2e-2)
    # pdf integrates to 1 on a grid
    x = jnp.linspace(0.0, 80.0, 20001)
    p = dist.free_flight_pdf(sigma_t, x)
    assert np.isclose(float(jnp.trapezoid(p, x)), 1.0, atol=1e-3)
    # success + failure partition (vptSamplingFunctions.h:24-31)
    assert np.isclose(
        float(dist.pdf_success(sigma_t, 3.0) + dist.pdf_failure(sigma_t, 3.0)),
        1.0, atol=1e-6)


def test_equi_angular_pdf_normalizes():
    D, ta, tb = 2.0, -0.7, 1.1
    t = jnp.linspace(D * np.tan(ta), D * np.tan(tb), 40001)
    p = dist.equi_angular_pdf(D, ta, tb, t)
    assert np.isclose(float(jnp.trapezoid(p, t)), 1.0, atol=1e-3)
    # sampled points follow the pdf: mean of t matches numeric expectation
    s = dist.equi_angular_sample(D, ta, tb, _u(1))
    num_mean = float(jnp.trapezoid(p * t, t))
    assert np.isclose(float(s.mean()), num_mean, atol=3e-2 * (1 + abs(num_mean)))


def test_cone_sampler_matches_pdf():
    cos_max = 0.9
    wc = jnp.asarray([0.0, 0.0, 1.0])
    wi = ds.cone(wc, cos_max, _u(2), _u(3))
    cos = wi[..., 2]
    assert float(cos.min()) >= cos_max - 1e-4
    # uniform in cos over [cos_max, 1]
    assert np.isclose(float(cos.mean()), 0.5 * (1 + cos_max), atol=1e-3)
    # pdf = 1/solid angle
    assert np.isclose(
        float(ds.cone_pdf(cos_max)), 1.0 / (2 * np.pi * (1 - cos_max)), rtol=1e-6)


def test_cosine_hemisphere_moments():
    n = jnp.asarray([0.0, 0.0, 1.0])
    wi = ds.cosine_hemisphere(n, _u(4), _u(5))
    cos = wi[..., 2]
    # E[cos] = 2/3 under pdf cos/pi
    assert np.isclose(float(cos.mean()), 2.0 / 3.0, atol=2e-3)
    assert float(cos.min()) >= 0.0


def test_uniform_sphere_is_uniform():
    wi = ds.uniform_sphere(_u(6), _u(7))
    assert np.allclose(np.asarray(jnp.mean(wi, 0)), 0.0, atol=6e-3)
    assert np.isclose(float(vm_norm(wi).mean()), 1.0, atol=1e-5)


def vm_norm(a):
    return jnp.sqrt(jnp.sum(a * a, -1))


def test_beckmann_ndf_normalization():
    """∫ D(wh) cos(theta_h) dwh = 1 over the hemisphere."""
    alpha = 0.3
    t = jnp.linspace(0.0, np.pi / 2 - 1e-4, 20001)
    integrand = mf.ndf_beckmann(jnp.cos(t), alpha) * jnp.cos(t) * jnp.sin(t) * 2 * np.pi
    assert np.isclose(float(jnp.trapezoid(integrand, t)), 1.0, atol=5e-3)


def test_beckmann_sampler_matches_pdf_mean():
    alpha = 0.2
    wh = ds.beckmann_half_vector(alpha, _u(8), _u(9))
    # theta = atan(alpha sqrt(-ln(1-u))): check E[cos] numerically
    t = jnp.linspace(0, np.pi / 2 - 1e-4, 20001)
    pdf_t = (mf.ndf_beckmann(jnp.cos(t), alpha) * jnp.cos(t)
             * jnp.sin(t) * 2 * np.pi)
    expect = float(jnp.trapezoid(pdf_t * jnp.cos(t), t))
    assert np.isclose(float(wh[..., 2].mean()), expect, atol=2e-3)


def test_fresnel_limits():
    # conductor at normal incidence matches (eta-1)^2+k^2 / (eta+1)^2+k^2
    eta = jnp.asarray([1.5, 1.5, 1.5])
    kappa = jnp.asarray([2.0, 2.0, 2.0])
    f0 = mf.fresnel_conductor(jnp.asarray(1.0), eta, kappa)
    expect = ((1.5 - 1) ** 2 + 4.0) / ((1.5 + 1) ** 2 + 4.0)
    assert np.allclose(np.asarray(f0), expect, atol=1e-3)
    # dielectric normal incidence: ((n1-n2)/(n1+n2))^2
    fd = dl.fresnel_dielectric(1.0, 1.5, jnp.asarray(1.0), jnp.asarray(1.0))
    assert np.isclose(float(fd), ((1.5 - 1.0) / (2.5)) ** 2, atol=1e-6)


def test_transmittance_symmetry_and_product():
    a = jnp.asarray([[0.0, 0.0, 0.0]])
    b = jnp.asarray([[3.0, 4.0, 0.0]])
    s = 0.11
    t_ab = med.transmittance(a, b, s)
    t_ba = med.transmittance(b, a, s)
    assert np.allclose(np.asarray(t_ab), np.asarray(t_ba))
    assert np.isclose(float(t_ab[0]), np.exp(-s * 5.0), rtol=1e-6)


def test_phase_function_ratio_cancels():
    wi, pdf = med.isotropic_phase_sample(_u(10, 100), _u(11, 100))
    assert np.isclose(pdf, med.isotropic_phase())
    assert np.allclose(np.asarray(vm_norm(wi)), 1.0, atol=1e-5)
