"""Named volume integrators — the reference "model zoo" (SURVEY §2.9).

Each entry maps a reference integrator to an IntegratorSpec of the wavefront
engine:

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
  vpt_recursive          == volumetricPathTracerRecursive (:662-812), the
                            older explicit recursive equi-angular tracer
                            (same estimator family as explicit_equiangular)
  vpt_iterative          == volumetricPathTracerIterative (:500-659), its
                            stack-based twin with the Tr Bernoulli
  vpt3                   == volumetricPathTracer3 (:98-282), explicit
                            recursive multi-light
  vpt3_all_lights        == volumetricPathTracer3alt (:285-395): NEE over
                            EVERY emitter per bounce instead of sampling one
  explicit_free_all_lights  same all-lights strategy on the free-flight
                            distance sampler
  vpt_minimal_implicit   == volumetricPathTracer (src/rt.cpp:297-358):
                            minimal implicit free-flight VPT, max depth 5
  explicit_single_light  == volumetricPathTracerExplicit / ...Explicit2
                            (src/rt.cpp:361-468, 603-740): NEE toward ONE
                            caller-chosen source (cfg/spec fixed_light;
                            default here is sphere 7 like the commented
                            driver call src/rt.cpp:790)
  explicit_single_light_ea == volumetricPathTracerExplicitEquiAngular
                            (src/rt.cpp:472-600)
"""
from __future__ import annotations

from .engine import FREE, EQUIANGULAR, IntegratorSpec

VOLUME_INTEGRATORS: dict[str, IntegratorSpec] = {
    "explicit_free": IntegratorSpec(distance=FREE, nee=True),
    "implicit_free": IntegratorSpec(distance=FREE, nee=False),
    "explicit_equiangular": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    "implicit_equiangular": IntegratorSpec(distance=EQUIANGULAR, nee=False, clamped_ea=True),
    "mis_hybrid": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    # alias for the reference's active entry point (src/rt.cpp:794)
    "iterative_vpt_free": IntegratorSpec(distance=FREE, nee=True),
    # older equi-angular family (SURVEY §2.9; estimator-equivalent forms)
    "vpt_recursive": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    "vpt_iterative": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    "vpt3": IntegratorSpec(distance=EQUIANGULAR, nee=True),
    "vpt3_all_lights": IntegratorSpec(
        distance=EQUIANGULAR, nee=True, nee_all_lights=True),
    "explicit_free_all_lights": IntegratorSpec(
        distance=FREE, nee=True, nee_all_lights=True),
    # rt.cpp legacy volume tracers
    "vpt_minimal_implicit": IntegratorSpec(
        distance=FREE, nee=False, max_bounces=5, continue_prob=0.9),
    "explicit_single_light": IntegratorSpec(
        distance=FREE, nee=True, fixed_light=7, continue_prob=0.9),
    "explicit_single_light_ea": IntegratorSpec(
        distance=EQUIANGULAR, nee=True, fixed_light=7, continue_prob=0.9),
}
