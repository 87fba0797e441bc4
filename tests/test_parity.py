"""Function-level parity against the REBUILT reference binary (SURVEY §4.3).

A probe shared library (built from the unmodified reference sources with a
deterministic, replayable erand48 shadow — see .refbuild/probe.cpp) exposes
pLight / freeSingleScattering / MISv2 / bdsf. These tests drive both
implementations with identical uniforms in f64 and compare:

  - pLight: exact (no RNG)
  - freeSingleScattering, sphere sources: exact given the same 2 draws
  - bdsf, Lambert: exact given the same 2 draws
  - MISv2: expectation-level (draw orders differ by design)

Skipped when the probe library hasn't been built on this machine
(tests/ must stay runnable without the reference checkout).
"""
import ctypes
import os

import numpy as np
import pytest

PROBE = "/root/repo/.refbuild/libprobe.so"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROBE), reason="reference probe lib not built"
)


@pytest.fixture(scope="module")
def lib():
    lib = ctypes.CDLL(PROBE, mode=os.RTLD_LOCAL | os.RTLD_DEEPBIND)
    D, I, P = ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double)
    lib.set_draws.argtypes = [P, I]
    lib.probe_plight.argtypes = [I, P, P, P, I, D, P]
    lib.probe_free_ss.argtypes = [P, I, D, D, P]
    lib.probe_bdsf.argtypes = [I, P, P, P]
    lib.probe_misv2.argtypes = [I, P, P, P, D, D, P]
    return lib


def _dp(a):
    return np.ascontiguousarray(a, np.float64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_double))


@pytest.fixture(scope="module")
def scene64():
    import jax.numpy as jnp
    from vpt.scene.scene import cornell_vpt
    return cornell_vpt(dtype=jnp.float64)


def test_plight_exact(lib, scene64):
    import jax.numpy as jnp
    from vpt.media import nee as nee_mod

    rng = np.random.default_rng(0)
    out = np.zeros(3)
    keep = np.zeros(0)
    lib.set_draws(_dp(keep), 0)
    for _ in range(40):
        objid = int(rng.integers(0, 7))
        c = np.asarray(scene64.center[objid])
        r = float(scene64.radius[objid])
        dirn = rng.normal(size=3); dirn /= np.linalg.norm(dirn)
        x = c + dirn * r
        wray = rng.normal(size=3); wray /= np.linalg.norm(wray)
        lightid = int(rng.choice([7, 8, 9]))
        alpha = float(scene64.alpha[objid])
        lib.probe_plight(objid, _dp(x), _dp(dirn), _dp(wray), lightid,
                         alpha, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        mine = np.asarray(nee_mod.plight(
            scene64, jnp.asarray([objid]), jnp.asarray([x]), jnp.asarray([dirn]),
            jnp.asarray([wray]), scene64.radiance[lightid],
            scene64.center[lightid], jnp.asarray([alpha]))[0])
        if not np.isfinite(out).all():
            # reference NaN factory: its Beckmann NDF divides 0/0 at grazing
            # half-vectors (microFacetUtilities.h:42-44); ours is floored and
            # returns the finite limit 0 — documented divergence
            assert np.isfinite(mine).all()
            continue
        assert np.allclose(mine, out, rtol=1e-10, atol=1e-12), (objid, lightid)


def test_free_single_scattering_sphere_sources_exact(lib, scene64):
    import jax.numpy as jnp
    from vpt.media import nee as nee_mod

    rng = np.random.default_rng(1)
    out = np.zeros(3)
    for _ in range(80):
        xt = rng.uniform([-40, -35, -70], [40, 35, 150])
        ids = int(rng.choice([7, 9]))        # sphere (r > 0) sources
        u = rng.uniform(size=2)
        lib.set_draws(_dp(u), 2)
        lib.probe_free_ss(_dp(xt), ids, 0.01, 1 / 3,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        mine = np.asarray(nee_mod.free_single_scattering(
            scene64, jnp.asarray([xt]), jnp.asarray([ids]), 0.01, 1 / 3.,
            jnp.asarray([u[0]]), jnp.asarray([u[1]]))[0])
        assert np.allclose(mine, out, rtol=1e-9, atol=1e-14), (ids, out, mine)


def test_bdsf_lambert_exact(lib, scene64):
    import jax.numpy as jnp
    from vpt.bxdf import dispatch as bx

    rng = np.random.default_rng(2)
    out = np.zeros(7)
    for _ in range(60):
        objid = int(rng.choice([0, 1, 2, 3, 4, 6]))   # Lambert spheres
        nrm = rng.normal(size=3); nrm /= np.linalg.norm(nrm)
        wray = rng.normal(size=3); wray /= np.linalg.norm(wray)
        if np.dot(wray, nrm) > 0:
            wray = -wray
        u = rng.uniform(size=2)
        lib.set_draws(_dp(u), 2)
        lib.probe_bdsf(objid, _dp(wray), _dp(nrm),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        fs, wi, pdf = bx.sample_bsdf(
            scene64, jnp.asarray([objid]), jnp.asarray([wray]),
            jnp.asarray([nrm]), jnp.asarray([0.5]),
            jnp.asarray([u[0]]), jnp.asarray([u[1]]))
        assert np.allclose(np.asarray(fs[0]), out[:3], rtol=1e-10)
        assert np.allclose(np.asarray(wi[0]), out[3:6], rtol=1e-9, atol=1e-12)
        assert np.isclose(float(pdf[0]), out[6], rtol=1e-9)


@pytest.mark.slow
def test_misv2_expectation(lib, scene64):
    import jax
    import jax.numpy as jnp
    from vpt.media import mis as mis_mod

    rng = np.random.default_rng(3)
    out = np.zeros(3)
    x = np.array([5.0, -40.8, -20.0]); n = np.array([0.0, 1.0, 0.0])
    wray = np.array([0.1, -0.6, -0.79]); wray /= np.linalg.norm(wray)
    objid = 3
    alpha = float(scene64.alpha[objid])
    K = 2000
    acc = np.zeros(3); nn = 0
    for k in range(K):
        lib.set_draws(_dp(rng.uniform(size=16)), 16)
        lib.probe_misv2(objid, _dp(x), _dp(n), _dp(wray), alpha, 0.01,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if np.isfinite(out).all():
            acc += out; nn += 1
    ref = acc / nn

    f = jax.jit(lambda key: mis_mod.mis_v2(
        scene64, jnp.asarray([objid]), jnp.asarray([x]), jnp.asarray([n]),
        jnp.asarray([wray]), jnp.asarray([alpha]), key, 0.01)[0])
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    mine = np.asarray(jax.vmap(f)(keys)).mean(0)
    assert np.allclose(mine, ref, rtol=0.05, atol=1e-4), (ref, mine)
