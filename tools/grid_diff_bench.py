"""Grid diff-pair throughput on the real chip (round 4, VERDICT #1 gate):
fwd+bwd paths/s for (a) sigma/albedo/radiance gradients in a 16^3 grid
scene and (b) diff_grid voxel-value gradients (two-phase replay + MXU
scatter backward).

Usage: python tools/grid_diff_bench.py [--quick]
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
    from vpt.kernels.diff import make_diff_renderer, pack_params

    quick = "--quick" in sys.argv
    W = H = 512 if quick else 1024
    spp = 16 if quick else 64
    chain = 2 if quick else 4
    n_paths = W * H * spp

    base = blob_cloud()
    camera = vpt.default_camera()
    n, n_march = 16, 8
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    interp = "tri"
    if "--interp" in sys.argv:
        interp = sys.argv[sys.argv.index("--interp") + 1]
    xs = np.linspace(-40, 40, n)
    zs = np.linspace(130, 220, n)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    pts = jnp.asarray(np.stack([gx, gy, gz], -1))
    vals = np.asarray(df.density(base.medium.density, pts))
    sx, sz = 80 / (n - 1), 90 / (n - 1)
    f = dataclasses.replace(
        df.grid(vals, origin=(-40 - sx / 2, -40 - sx / 2, 130 - sz / 2),
                spacing=(sx, sx, sz), transport_interp=interp),
        n_march=n_march)
    scene = dataclasses.replace(
        base, medium=Medium(base.medium.sigma_a, base.medium.sigma_s, 0.0,
                            f))

    def measure(label, **kw):
        tile_rows = 8 if kw.get("diff_grid") else 16
        render = make_diff_renderer(scene, camera, W, H, spp,
                                    max_bounces=32, sampler="ld",
                                    tile_rows=tile_rows, **kw)
        params = pack_params(scene, with_grid=kw.get("diff_grid", False))

        @jax.jit
        def vg(p, s):
            acc = jnp.float32(0)
            g = None
            for k in range(chain):
                def loss_fn(pp):
                    return jnp.mean(render(pp, s + k))

                l, gk = jax.value_and_grad(loss_fn)(p)
                acc = acc + l
                g = gk if g is None else jax.tree.map(jnp.add, g, gk)
            return acc, g["sigma_s"]

        out = vg(params, jnp.int32(1))
        l0 = float(np.asarray(out[0]))
        assert np.isfinite(l0), (label, l0)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            jax.tree_util.tree_map(np.asarray, vg(params, jnp.int32(5 + i)))
            best = min(best, time.time() - t0)
        rate = chain * n_paths / best
        print(json.dumps({"case": label, "fwd_bwd_paths_per_sec": rate,
                          "t_chain": best, "loss": l0 / chain}))

    measure(f"grid{n}_march8_{interp}_sigma_albedo_radiance")
    measure(f"grid{n}_march8_{interp}_voxel_grads", diff_grid=True)


if __name__ == "__main__":
    main()
