"""Seed-matched END-TO-END path parity (SURVEY §7.2, VERDICT r1 #5).

The probe build (.refbuild/probe.cpp) runs the UNMODIFIED reference
`iterativeVPTracerFree` with its erand48 shadowed by an injected uniform
array; vpt.core.replay.ReplayTracer consumes the SAME array in the same
draw order. Complete camera paths must then agree to f64 rounding — this is
the strongest whole-path correctness statement the racy reference binary
admits (its own renders are not reproducible, Vector.cpp:8).

Asserts <= 1e-10 relative radiance error AND identical draw-consumption
counts over >= 16000 seed-matched paths (measured: bit-exact, max rel err 0
over 20000 paths / 10593 non-zero, including reproduction of the
reference's int-abs NaN paths — see core/replay._cabs).

Probe build recipe (libprobe.so is gitignored):
  cd .refbuild && g++ -std=c++20 -O2 -fPIC -shared -ffp-contract=off \
    -I/root/reference/include probe.cpp \
    /root/reference/include/{Sphere,Ray,Vector}.cpp -o libprobe.so
-ffp-contract=off keeps the compiled reference at strict per-op IEEE
rounding (no compiler-introduced FMA) so python/numpy arithmetic can match
it bitwise; the reference SOURCE semantics are unchanged.
"""
import ctypes
import os

import numpy as np
import pytest

PROBE = "/root/repo/.refbuild/libprobe.so"

pytestmark = [
    pytest.mark.golden,
    pytest.mark.skipif(not os.path.exists(PROBE),
                       reason="reference probe lib not built"),
]


@pytest.fixture(scope="module")
def lib():
    lib = ctypes.CDLL(PROBE, mode=os.RTLD_LOCAL | os.RTLD_DEEPBIND)
    D, I, P = ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double)
    lib.set_draws.argtypes = [P, I]
    lib.probe_iterative_free.argtypes = [P, P, D, D, P]
    lib.draws_used.restype = I
    return lib


def _dp(a):
    return np.ascontiguousarray(a, np.float64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_double))


@pytest.mark.slow
def test_seed_matched_paths_bit_near_exact(lib):
    from vpt.core.replay import Draws, ReplayTracer
    from vpt.scene.scene import CORNELL_VPT_SPHERES

    tracer = ReplayTracer.from_spheres(CORNELL_VPT_SPHERES)
    rng = np.random.default_rng(42)

    # reference camera geometry (src/rt.cpp:755-759) in f64
    w, h = 1024, 768
    cam_o = np.array([0.0, 11.2, 214.0])
    cam_d = np.array([0.0, -0.042612, -1.0])
    cam_d = cam_d / np.linalg.norm(cam_d)
    cx = np.array([w * 0.5095 / h, 0.0, 0.0])
    cy = np.cross(cx, cam_d)
    cy = cy / np.linalg.norm(cy) * 0.5095

    n_paths = 20000   # ~1.7k oracle paths/s: still well under a minute
    out = np.zeros(3)
    max_rel = 0.0
    checked = 0
    nonzero = 0
    for k in range(n_paths):
        px, py = rng.uniform(0, w), rng.uniform(0, h)
        d = cx * (px / w - 0.5) + cy * (py / h - 0.5) + cam_d
        d = d / np.linalg.norm(d)
        us = rng.uniform(size=4096)

        lib.set_draws(_dp(us), len(us))
        lib.probe_iterative_free(_dp(cam_o), _dp(d), 0.001, 0.009, _dp(out))
        used_ref = lib.draws_used()
        if used_ref > len(us):
            continue   # pathological path exhausted the budget; skip

        draws = Draws(us)
        ours = tracer.iterative_vpt_free(cam_o, d, 0.001, 0.009, draws)

        assert draws.used == used_ref, (
            f"path {k}: draw counts diverge (ours {draws.used}, "
            f"reference {used_ref})")
        ref = out.copy()
        ours = np.asarray(ours)
        # the reference emits NaN/inf paths through its int-abs microfacet
        # denominators (see core/replay._cabs) — the replay must reproduce
        # the same non-finite classification per channel
        finite = np.isfinite(ref)
        assert np.array_equal(finite, np.isfinite(ours)), (k, ours, ref)
        if finite.any():
            scale = max(np.abs(ref[finite]).max(), 1e-30)
            rel = np.abs(ours[finite] - ref[finite]).max() / scale
            max_rel = max(max_rel, rel)
            assert rel <= 1e-10, (k, ours, ref, rel)
        checked += 1
        if np.abs(ref[finite]).max(initial=0.0) > 0 or not finite.all():
            nonzero += 1

    assert checked >= 16000, f"only {checked} paths checked"
    assert nonzero >= 3000, f"only {nonzero} non-zero paths — weak coverage"
    print(f"seed-matched paths: {checked} checked, {nonzero} non-zero, "
          f"max rel err {max_rel:.3e}")


@pytest.mark.slow
def test_seed_matched_paths_equiangular(lib):
    """Same seed-matched whole-path parity for the EQUI-ANGULAR family:
    explicitVPTracerRecursive (vptShadeMethods.h:1014-1149) vs the
    recursive replay (core/replay.explicit_vpt_recursive). Exercises
    equiAngularParams2/Prob, the event Bernoulli, singleScattering and the
    depth>0 emitter-kill quirk draw-for-draw."""
    from vpt.core.replay import Draws, ReplayTracer
    from vpt.scene.scene import CORNELL_VPT_SPHERES

    lib.probe_explicit_ea.argtypes = lib.probe_iterative_free.argtypes
    tracer = ReplayTracer.from_spheres(CORNELL_VPT_SPHERES)
    rng = np.random.default_rng(1234)

    w, h = 1024, 768
    cam_o = np.array([0.0, 11.2, 214.0])
    cam_d = np.array([0.0, -0.042612, -1.0])
    cam_d = cam_d / np.linalg.norm(cam_d)
    cx = np.array([w * 0.5095 / h, 0.0, 0.0])
    cy = np.cross(cx, cam_d)
    cy = cy / np.linalg.norm(cy) * 0.5095

    n_paths = 8000
    out = np.zeros(3)
    max_rel = 0.0
    checked = nonzero = 0
    for k in range(n_paths):
        px, py = rng.uniform(0, w), rng.uniform(0, h)
        d = cx * (px / w - 0.5) + cy * (py / h - 0.5) + cam_d
        d = d / np.linalg.norm(d)
        us = rng.uniform(size=4096)

        lib.set_draws(_dp(us), len(us))
        lib.probe_explicit_ea(_dp(cam_o), _dp(d), 0.001, 0.009, _dp(out))
        used_ref = lib.draws_used()
        if used_ref > len(us):
            continue

        draws = Draws(us)
        ours = np.asarray(tracer.explicit_vpt_recursive(
            cam_o, d, 0.001, 0.009, draws))
        assert draws.used == used_ref, (
            f"path {k}: draw counts diverge (ours {draws.used}, "
            f"reference {used_ref})")
        ref = out.copy()
        finite = np.isfinite(ref)
        assert np.array_equal(finite, np.isfinite(ours)), (k, ours, ref)
        if finite.any():
            scale = max(np.abs(ref[finite]).max(), 1e-30)
            rel = np.abs(ours[finite] - ref[finite]).max() / scale
            max_rel = max(max_rel, rel)
            assert rel <= 1e-10, (k, ours, ref, rel)
        checked += 1
        if np.abs(ref[finite]).max(initial=0.0) > 0 or not finite.all():
            nonzero += 1

    assert checked >= 6000, f"only {checked} paths checked"
    assert nonzero >= 1500, f"only {nonzero} non-zero paths — weak coverage"
    print(f"EA seed-matched paths: {checked} checked, {nonzero} non-zero, "
          f"max rel err {max_rel:.3e}")
