"""vpt — TPU-native differentiable volumetric path tracer (JAX/Pallas).

A from-scratch rebuild of the capabilities of
gabo99cas/minimal_volumetric_path_tracer (CPU C++ renderer) as a TPU-first
framework: batched wavefront integrators under jit, Pallas fused render
kernels, sharded multi-chip rendering via jax.sharding, and end-to-end
differentiability for inverse rendering.

Layer map (SURVEY.md §7): core / scene / geometry / sampling / bxdf / media /
integrators / kernels / dist / api / io / utils.
"""
from .api.config import RenderConfig
from .api.adaptive import make_adaptive_renderer, render_adaptive
from .api.noise import render_to_noise
from .api.render import render, trace_rays
from .scene.scene import Scene, Medium, SCENES, cornell_vpt, make_scene
from .scene.camera import Camera, default_camera, look_at
from .scene.io import save_scene, load_scene
from .dist import fit  # inverse rendering

__version__ = "0.1.0"
