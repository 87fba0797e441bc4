"""On-chip throughput: geom dual kernel on hetero/HG scenes (round 3)."""
import dataclasses, time
import numpy as np
import jax.numpy as jnp
import vpt
from vpt.kernels.geom import make_geom_renderer, pack_theta

cam = vpt.default_camera()
W = H = 1024; SPP = 16; CHAIN = 4

def measure(name, sc, sphere):
    r = make_geom_renderer(sc, cam, W, H, SPP, sphere=sphere,
                           cam_grads=True, max_bounces=32, tile_rows=8,
                           sampler="ld")
    th = pack_theta(sc, cam, sphere)
    import jax
    @jax.jit
    def chain(t, seed):
        def one(c, s):
            img, tang = r(t, s)
            return c + jnp.mean(img) + jnp.mean(tang), None
        acc, _ = jax.lax.scan(one, jnp.float32(0.0),
                              seed + jnp.arange(CHAIN))
        return acc
    _ = np.asarray(chain(th, jnp.int32(1)))
    best = 0.0
    for i in range(3):
        t0 = time.time()
        _ = np.asarray(chain(th, jnp.int32(10 + i)))
        dt = (time.time() - t0) / CHAIN
        best = max(best, W * H * SPP / dt)
    print("%s: %.1fM paths/s (K=7 duals)" % (name, best / 1e6), flush=True)

aniso = dataclasses.replace(
    vpt.cornell_vpt(), medium=dataclasses.replace(
        vpt.cornell_vpt().medium, g=0.7))
measure("cornell g=0.7", aniso, 9)
measure("foggy_cornell", vpt.scene.scene.foggy_cornell(), 9)
measure("blob_cloud", vpt.scene.scene.blob_cloud(), 2)
