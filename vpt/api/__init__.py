"""Public API: render, config, inverse rendering."""
from .adaptive import make_adaptive_renderer, render_adaptive
from .config import RenderConfig
from .render import render, resolve_spec, resolve_tracer, trace_rays

__all__ = ["RenderConfig", "make_adaptive_renderer", "render",
           "render_adaptive", "resolve_spec",
           "resolve_tracer", "trace_rays"]
