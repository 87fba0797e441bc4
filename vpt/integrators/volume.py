"""Named volume integrators — the reference "model zoo" (SURVEY §2.9).

Two families:

* the ACTIVE estimator family maps onto IntegratorSpecs of the wavefront
  engine (integrators/engine.py):

  explicit_free          == iterativeVPTracerFree / explicitVPTracerRecursiveFree
                            (vptShadeMethods.h:1263-1340 / 1153-1261) — ACTIVE
  implicit_free          == implicitVPTracerRecursiveFree (:940-1010)
  explicit_equiangular   == explicitVPTracerRecursive (:1014-1149)
  implicit_equiangular   == implicitVPTracerRecursive (:816-937)
  mis_hybrid             == MISVPTTracerRecursive (:1345-1481) — identical
                            estimator to explicit_equiangular with the
                            Bernoulli expressed as psurf = exp(-sigma_t t),
                            which equals TrActual on hit and 0 on miss, so
                            the two share one spec here (divergence: the
                            reference uses `< psurf` vs `<= TrActual`, a
                            measure-zero difference).
  explicit_free_all_lights  NEE over EVERY emitter per bounce on the active
                            free-flight estimator (engine nee_all_lights —
                            the volumetricPathTracer3alt strategy applied to
                            the modern estimator; the faithful 3alt lives in
                            integrators/legacy.py as vpt3_all_lights).

* the LEGACY family (older vptShadeMethods tracers + the rt.cpp tracers)
  has observably different estimators — miss-is-black, surface kills,
  point-only NEE, stale accumulators, RR double-count quirks — and is
  implemented faithfully in integrators/legacy.py:

  vpt_recursive, vpt_iterative, vpt3, vpt3_all_lights,
  vpt_minimal_implicit, explicit_single_light, explicit_single_light2,
  explicit_single_light_ea.
"""
from __future__ import annotations

from .engine import FREE, EQUIANGULAR, IntegratorSpec
from .legacy import LEGACY_INTEGRATORS

VOLUME_INTEGRATORS: dict[str, IntegratorSpec] = {
    "explicit_free": IntegratorSpec(distance=FREE, nee=True),
    "implicit_free": IntegratorSpec(distance=FREE, nee=False),
    "explicit_equiangular": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    "implicit_equiangular": IntegratorSpec(distance=EQUIANGULAR, nee=False, clamped_ea=True),
    "mis_hybrid": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    # alias for the reference's active entry point (src/rt.cpp:794)
    "iterative_vpt_free": IntegratorSpec(distance=FREE, nee=True),
    "explicit_free_all_lights": IntegratorSpec(
        distance=FREE, nee=True, nee_all_lights=True),
    # Textbook-unbiased modes (no reference counterpart — see the `physical`
    # knob on IntegratorSpec for the two reference quirks they remove).
    # Validated against closed-form shell/furnace scenes in
    # tests/test_furnace.py.
    "implicit_free_physical": IntegratorSpec(
        distance=FREE, nee=False, physical=True),
    "explicit_free_physical": IntegratorSpec(
        distance=FREE, nee=True, physical=True),
    # EA implicit's medium weight is already correct (its surface/medium
    # choice is a genuine independent Bernoulli) — physical only restores
    # the terminal-RR credit compensation.
    "implicit_equiangular_physical": IntegratorSpec(
        distance=EQUIANGULAR, nee=False, clamped_ea=True, physical=True),
}

ALL_VOLUME_NAMES = tuple(VOLUME_INTEGRATORS) + tuple(LEGACY_INTEGRATORS)
