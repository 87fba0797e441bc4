"""Voxel-grid fused-kernel throughput on the real chip (round 4).

Rasterizes blob_cloud's analytic field onto n^3 grids and measures the
fused Pallas forward kernel (kernels/wavefront.py grid path: chunked
lane-gather trilinear + canonical pc march) at the bench protocol
(1024x1024 @ 64 spp, sampler="ld", BENCH_CHAIN=4 chained launches), vs the
same scene with the analytic blobs field (delta tracking) as the
cost-of-grids reference point.

Usage: python tools/grid_kernel_bench.py [--quick]
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import vpt
    from vpt.media import density as df
    from vpt.scene.scene import Medium, blob_cloud
    from vpt.kernels.wavefront import build_tile_renderer

    quick = "--quick" in sys.argv
    W = H = 512 if quick else 1024
    spp = 16 if quick else 64
    chain = 2 if quick else 4
    n_paths = W * H * spp
    interp = "tri"
    if "--interp" in sys.argv:
        interp = sys.argv[sys.argv.index("--interp") + 1]
    sizes = ((16, 8, 32), (16, 16, 32))
    if "--sizes" in sys.argv:
        # "24" or "24:16" (n:tile_rows); march fixed at 8
        def _parse(v):
            n_, _, r_ = v.partition(":")
            return (int(n_), 8, int(r_) if r_ else 32)
        sizes = tuple(_parse(v) for v in
                      sys.argv[sys.argv.index("--sizes") + 1].split(","))

    base = blob_cloud()
    camera = vpt.default_camera()

    def rasterize(n):
        xs = np.linspace(-40, 40, n)
        zs = np.linspace(130, 220, n)
        gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
        pts = jnp.asarray(np.stack([gx, gy, gz], -1))
        vals = np.asarray(df.density(base.medium.density, pts))
        sx, sz = 80 / (n - 1), 90 / (n - 1)
        return df.grid(vals, origin=(-40 - sx / 2, -40 - sx / 2,
                                     130 - sz / 2),
                       spacing=(sx, sx, sz), transport_interp=interp)

    def grid_scene(n, n_march):
        f = dataclasses.replace(rasterize(n), n_march=n_march)
        return dataclasses.replace(
            base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s,
                                0.0, f))

    def measure(scene, label, tile_rows=32):
        run = build_tile_renderer(scene, camera, W, H, spp, nee=True,
                                  max_bounces=32, sampler="ld",
                                  tile_rows=tile_rows)

        @jax.jit
        def reduced(s):
            acc = jnp.zeros((3,), jnp.float32)
            for k in range(chain):
                acc = acc + jnp.mean(run(s + k), axis=0)
            return acc / chain

        out = np.asarray(reduced(jnp.int32(1)))   # compile + sanity
        assert np.isfinite(out).all(), (label, out)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            np.asarray(reduced(jnp.int32(2 + i)))
            best = min(best, time.time() - t0)
        rate = chain * n_paths / best
        print(json.dumps({"case": label, "paths_per_sec": rate,
                          "mean_rgb": [float(v) for v in out],
                          "t_chain": best}))
        return rate

    measure(base, "blobs_analytic_delta_tracking")
    # tile_rows shrinks with the march state: the fori body's live values
    # scale with R * n_march and the scoped-vmem limit is 16MB (measured:
    # n16/march32 at R=32 wants 32.1MB and the remote compile 500s)
    # n=16 at march 8/16 is the flagship envelope (matches the analytic
    # render to 3-4 decimals at march8 already); march32 / 32^3 kernels
    # compile into huge Mosaic programs (the unrolled C-chunk trilinear
    # inside the march fori; C=256 at 32^3) with 25min+ remote compiles —
    # the measured lookup-rate scaling (tools/grid_gather_study.py: 780M
    # trilinear/s at 16^3 vs 229M at 32^3) extrapolates a 32^3 kernel to
    # ~3-6M paths/s
    for n, m, r in sizes:
        measure(grid_scene(n, m),
                f"grid_n{n}_march{m}_r{r}_{interp}", tile_rows=r)


if __name__ == "__main__":
    main()
