"""Benchmark: camera-paths/sec on the flagship integrator (explicit_free ==
the reference's active iterativeVPTracerFree) on one chip, using the
persistent-wavefront (path-regeneration) renderer.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the rebuilt reference renderer's measured CPU
throughput on this machine (g++ -O3 -fopenmp, 4 threads; 1024*768*32 spp in
19.09 s = 1.318e6 camera paths/s — see BASELINE.md).

Usage: python bench.py [--quick]
  --quick: 512x512 @ 16 spp (compile-cache-friendly smoke)
  default: the north-star workload, 1024x1024 @ 64 spp
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_PATHS_PER_SEC = 1.318e6


def main():
    import jax

    try:  # persistent compile cache: tunnel compiles take minutes
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import vpt

    quick = "--quick" in sys.argv
    width = int(os.environ.get("BENCH_WIDTH", 512 if quick else 1024))
    height = int(os.environ.get("BENCH_HEIGHT", 512 if quick else 1024))
    spp = int(os.environ.get("BENCH_SPP", 16 if quick else 64))

    scene = vpt.cornell_vpt()
    camera = vpt.default_camera()

    render = None
    if os.environ.get("BENCH_BACKEND", "pallas") == "pallas":
        try:
            from vpt.kernels.wavefront import build_tile_renderer

            run = build_tile_renderer(scene, camera, width, height, spp,
                                      nee=True, max_bounces=32)
            render = lambda seed: np.asarray(run(seed))
        except Exception as e:  # Mosaic/platform issues -> XLA engine
            print(f"# pallas unavailable ({type(e).__name__}), "
                  "falling back to XLA engine", file=sys.stderr)
    if render is None:
        cfg = vpt.RenderConfig(
            width=width, height=height, spp=spp,
            integrator="explicit_free", renderer="persistent",
            chunk_pixels=262144, max_bounces=32,
        )
        render = lambda seed: np.asarray(
            vpt.render(scene, camera, cfg, key=jax.random.PRNGKey(seed)))

    # warmup / compile (same shapes as the timed run); the axon tunnel adds
    # multi-second first-dispatch latency, so warm twice and take the best
    # of three timed runs
    img = render(0)
    assert np.isfinite(img).all(), "non-finite pixels"
    render(1)

    dt = min(
        (lambda t0: (render(2 + i), time.time() - t0)[1])(time.time())
        for i in range(3)
    )

    n_paths = width * height * spp
    value = n_paths / dt
    print(json.dumps({
        "metric": "render_throughput_fwd",
        "value": round(value, 1),
        "unit": "camera_paths/sec/chip",
        "vs_baseline": round(value / REF_PATHS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
