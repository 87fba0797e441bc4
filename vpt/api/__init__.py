"""Public API: render, config, inverse rendering."""
from .config import RenderConfig
from .render import render, resolve_spec, resolve_tracer, trace_rays

__all__ = ["RenderConfig", "render", "resolve_spec", "resolve_tracer",
           "trace_rays"]
