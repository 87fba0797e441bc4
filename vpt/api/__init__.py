from .config import RenderConfig
from .render import render, trace_rays, resolve_spec
