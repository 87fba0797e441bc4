"""Render configuration — the framework's single config surface.

The reference's "config system" is one positional CLI arg (spp, src/rt.cpp:784)
plus hardcoded constants: resolution (src/rt.cpp:752), camera (:755-759),
sigma_a/sigma_s (:794), RR continue prob (vptShadeMethods.h:1275), the scene
(Sphere.cpp:7-23) and an edit-and-recompile integrator choice (:791-796).
Here all of that is one dataclass consumable from both the Python API and the
CLI.
"""
from __future__ import annotations

import dataclasses

__all__ = ["RenderConfig"]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 1024            # reference default 1024x768 (src/rt.cpp:752)
    height: int = 768
    spp: int = 16                # argv[1] in the reference (src/rt.cpp:784)
    integrator: str = "explicit_free"   # the active iterativeVPTracerFree
    max_bounces: int = 32
    continue_prob: float = 0.6
    seed: int = 0
    scene: str = "cornell_vpt"
    sigma_a: float = 0.001       # src/rt.cpp:794
    sigma_s: float = 0.009
    # pixels per device dispatch chunk; keeps (N*S*S) MIS intermediates in a
    # few tens of MB
    chunk_pixels: int = 65536
    dtype: str = "float32"       # "float64" for CPU oracle-parity runs
    jitter: bool = True
    # "random": pure PCG (reference semantics — erand48 everywhere);
    # "ld": low-discrepancy first-5-dimension stratification (pixel jitter
    # u,v; depth-0 distance, RR and light-pick draws) via a
    # Cranley-Patterson-rotated R5 Kronecker sequence. Unbiased; fused
    # (pallas) renderers only — the engine paths ignore it.
    sampler: str = "random"
    # "pallas": the fused TPU kernel (fastest; free-flight/equi-angular
    # families, forward-only); "persistent": path-regeneration wavefront
    # (fast, volume integrators); "scan": per-sample masked wavefront (all
    # integrators, reverse-mode friendly); "auto" picks persistent when
    # eligible.
    renderer: str = "auto"
