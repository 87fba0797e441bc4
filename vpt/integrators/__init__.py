"""Integrator registry: volume wavefront engine, surface path tracers, ray
marchers — the full capability surface of the reference's ~24 variants
(SURVEY.md §2.9), addressable by name from RenderConfig.integrator.
"""
from . import engine
from .volume import VOLUME_INTEGRATORS
from .surface import SURFACE_INTEGRATORS, SurfaceSpec, trace_surface
from .raymarch import RAYMARCH_INTEGRATORS, RayMarchSpec, trace_raymarch

ALL_INTEGRATORS = {
    **{k: ("volume", v) for k, v in VOLUME_INTEGRATORS.items()},
    **{k: ("surface", v) for k, v in SURFACE_INTEGRATORS.items()},
    **{k: ("raymarch", v) for k, v in RAYMARCH_INTEGRATORS.items()},
}

__all__ = [
    "engine", "VOLUME_INTEGRATORS", "SURFACE_INTEGRATORS",
    "RAYMARCH_INTEGRATORS", "ALL_INTEGRATORS", "SurfaceSpec", "RayMarchSpec",
    "trace_surface", "trace_raymarch",
]
