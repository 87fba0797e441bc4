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
}
